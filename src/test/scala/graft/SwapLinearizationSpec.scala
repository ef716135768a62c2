package graft

import graft.ml.IvfIndex
import graft.text.IncrementalDedup
import graft.util.TableIndex
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The generation swap LINEARIZED against concurrent writers — the
  * second half of the r14 pointer work. The pointer alone left two
  * silent-loss races open:
  *
  *  - publisher-side: a batch committed to the old generation after
  *    the rewrite read its tables but before the pointer swap was
  *    simply absent from the new generation (lost at cutover);
  *  - appender-side: a writer that resolved the pointer just before a
  *    swap committed into the superseded directory (invisible to every
  *    post-swap root reader).
  *
  * Both close on the source generation's writer lease:
  * [[graft.util.TableIndex.catchUpAndPublish]] holds it from the
  * late-bid listing through the rename (copying any late batch into
  * the new generation first, SAME bids), and every root-addressed
  * [[graft.util.TableIndex.commitBatch]] re-validates the pointer
  * under that same lease ([[graft.util.TableIndex.mutateCurrent]]
  * retries the loser against the new generation). A third hazard —
  * a stream replaying a pre-swap micro-batch against the root after
  * the swap, finding no marker in the re-filed generation, and
  * re-appending — closes with
  * [[graft.util.TableIndex.seedCommittedHistory]]. These specs pin
  * every interleaving deterministically, plus one true-concurrency
  * race (live appender thread vs a publishing compactor).
  */
class SwapLinearizationSpec extends SparkSpec {

  private def docsDf: DataFrame =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  private def embsDf = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    .select(col("vec_id").as("id"), expr("transform(embedding, x -> cast(x as double))").as("vec"))

  private def rowsOf(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  /** Driver-side exact cosine pairs — the oracle every index result is
    * held to (the IvfIndexSpec discipline). */
  private def brutePairs(corpus: DataFrame, queries: DataFrame, tau: Double): Set[(Long, Long)] = {
    val vs = corpus.collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val qs = queries.collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toSeq
    (for {
      (qid, qv) <- qs; (nid, nv) <- vs if qid != nid
      d = qv.indices.map(i => qv(i) * nv(i)).sum
      s = d / (math.sqrt(qv.map(x => x * x).sum) * math.sqrt(nv.map(x => x * x).sum))
      if s >= tau
    } yield (qid, nid)).toSet
  }

  private def pairsOf(df: DataFrame): Set[(Long, Long)] =
    df.select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  // ----------------------------------------------------------------
  // Publisher-side catch-up (dedup index, deterministic interleaving)
  // ----------------------------------------------------------------

  test("dedup compact catch-up: batches committed after the pin survive the swap, same bids") {
    val root = graft.util.TempDirs.scratch("swap_dedup").toString
    val d = docsDf
    val base = d.filter(pmod(col("doc_id"), lit(4)).isin(2, 3))
    val lateShard = d.filter(pmod(col("doc_id"), lit(4)) === 1).limit(40)
    val probe = d.filter(pmod(col("doc_id"), lit(4)) === 0).limit(30)

    IncrementalDedup.buildIndex(base, "doc_id", "text", s"$root/g0")
    TableIndex.publishGeneration(spark, root, "g0")
    val cur = s"$root/g0"
    val snap = TableIndex.openSnapshot(spark, cur)
    // the rewrite reads the PINNED view...
    IncrementalDedup.compactIndex(spark, cur, s"$root/g1", at = Some(snap))
    // ...and two writers land on the root between the pin and the swap
    IncrementalDedup.updateIndexInPlace(spark, root, lateShard, "doc_id", "text",
      batchId = Some("late-app"))
    val delId = base.select("doc_id").orderBy("doc_id").limit(1)
      .collect()(0).getLong(0)
    IncrementalDedup.deleteInPlace(spark, root, lateShard.sparkSession.range(delId, delId + 1)
      .select(col("id")))
    val late = TableIndex.catchUpAndPublish(spark, root, cur, "g1", snap.bids)
    assert(late.contains("late-app"), s"late append not carried over (carried: $late)")
    assert(late.size == 2, s"expected the append and the delete to be late, got $late")
    assert(TableIndex.resolveDir(spark, root) == s"$root/g1")
    assert(TableIndex.isCommitted(spark, s"$root/g1", "late-app"),
      "the carried batch must be committed UNDER ITS OWN BID in the new generation")

    // decisions from the root ≡ a from-scratch index over the same live docs
    val fresh = graft.util.TempDirs.scratch("swap_dedup_fresh").toString
    IncrementalDedup.buildIndex(
      base.filter(col("doc_id") =!= delId).unionByName(lateShard), "doc_id", "text", fresh)
    val got = IncrementalDedup.processShard(spark, root, probe, "doc_id", "text", tau = 0.8)
    val want = IncrementalDedup.processShard(spark, fresh, probe, "doc_id", "text", tau = 0.8)
    assert(rowsOf(got) == rowsOf(want),
      "post-swap root probe diverged from the from-scratch oracle over (base ∪ late ∖ deleted)")
  }

  test("replay stays exactly-once ACROSS the swap: pre-pin bids (seeded history) and late bids both skip") {
    val root = graft.util.TempDirs.scratch("swap_replay").toString
    val d = docsDf
    val base = d.filter(pmod(col("doc_id"), lit(4)) === 2)
    val preShard = d.filter(pmod(col("doc_id"), lit(4)) === 3).limit(30)
    val lateShard = d.filter(pmod(col("doc_id"), lit(4)) === 1).limit(30)

    IncrementalDedup.buildIndex(base, "doc_id", "text", s"$root/g0")
    TableIndex.publishGeneration(spark, root, "g0")
    // a pre-pin shard under an explicit bid — its marker will be FOLDED
    // into the compacted generation's single batch
    IncrementalDedup.updateIndexInPlace(spark, root, preShard, "doc_id", "text",
      batchId = Some("pre-bid"))
    val cur = s"$root/g0"
    val snap = TableIndex.openSnapshot(spark, cur)
    IncrementalDedup.compactIndex(spark, cur, s"$root/g1", at = Some(snap))
    IncrementalDedup.updateIndexInPlace(spark, root, lateShard, "doc_id", "text",
      batchId = Some("late-bid"))
    TableIndex.catchUpAndPublish(spark, root, cur, "g1", snap.bids)

    val hashes = s"${TableIndex.resolveDir(spark, root)}/hashes.parquet"
    val before = spark.read.parquet(hashes).count()
    // replayed PRE-PIN micro-batch: no marker of its own in g1 — the
    // seeded history must answer "committed" or the rows double
    IncrementalDedup.updateIndexInPlace(spark, root, preShard, "doc_id", "text",
      batchId = Some("pre-bid"))
    // replayed LATE micro-batch: carried with its own marker
    IncrementalDedup.updateIndexInPlace(spark, root, lateShard, "doc_id", "text",
      batchId = Some("late-bid"))
    val after = spark.read.parquet(hashes).count()
    assert(after == before,
      s"a replayed micro-batch re-appended across the swap ($before -> $after rows)")
  }

  // ----------------------------------------------------------------
  // Appender-side: pointer re-validation under the commit lease
  // ----------------------------------------------------------------

  test("a root-addressed commit into a superseded generation throws; mutateCurrent retries into the new one") {
    import spark.implicits._
    val root = graft.util.TempDirs.scratch("swap_append").toString
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    TableIndex.commitBatch(spark, s"$root/g0", "seed0", Seq(("t.parquet", df, Seq.empty)))
    TableIndex.publishGeneration(spark, root, "g0")
    TableIndex.commitBatch(spark, s"$root/g1", "seed1", Seq(("t.parquet", df, Seq.empty)))

    // raw commit that resolved g0, with the swap landing first: THROWS
    TableIndex.publishGeneration(spark, root, "g1")
    intercept[TableIndex.GenerationSupersededException] {
      TableIndex.commitBatch(spark, s"$root/g0", "lostb", Seq(("t.parquet", df, Seq.empty)),
        requireCurrentOf = Some(root))
    }
    assert(!TableIndex.isCommitted(spark, s"$root/g0", "lostb"),
      "the losing commit must not land in the superseded generation")

    // mutateCurrent: the swap lands MID-MUTATION (after the resolve,
    // before the commit) — first attempt throws, the retry resolves the
    // new generation and commits there
    TableIndex.publishGeneration(spark, root, "g0") // reset pointer
    var first = true
    TableIndex.mutateCurrent(spark, root) { (dir, reqCur) =>
      if (first) { first = false; TableIndex.publishGeneration(spark, root, "g1") }
      TableIndex.commitBatch(spark, dir, "raceb", Seq(("t.parquet", df, Seq.empty)),
        requireCurrentOf = reqCur)
    }
    assert(TableIndex.isCommitted(spark, s"$root/g1", "raceb"),
      "the retried commit must land in the CURRENT generation")
    assert(!TableIndex.isCommitted(spark, s"$root/g0", "raceb"),
      "the retried commit must not also land in the superseded generation")
  }

  // ----------------------------------------------------------------
  // seedCommittedHistory / copyBatches contracts
  // ----------------------------------------------------------------

  test("seedCommittedHistory: seeded bids answer committed; a torn generation cannot be seeded") {
    import spark.implicits._
    val dir = graft.util.TempDirs.scratch("swap_seed").toString
    val df = Seq((1L, "x")).toDF("id", "v")
    TableIndex.commitBatch(spark, dir, "own1", Seq(("t.parquet", df, Seq.empty)))
    TableIndex.seedCommittedHistory(spark, dir, Set("folded1", "folded2"))
    assert(TableIndex.isCommitted(spark, dir, "folded1"))
    assert(TableIndex.isCommitted(spark, dir, "own1"))
    assert(!TableIndex.isCommitted(spark, dir, "folded3"))
    // a seeded bid is a committed FACT: a replayed commit under it skips
    assert(!TableIndex.commitBatch(spark, dir, "folded2", Seq(("t.parquet", df, Seq.empty))))
    // additive across calls (unions with the existing base)
    TableIndex.seedCommittedHistory(spark, dir, Set("folded3"))
    assert(TableIndex.isCommitted(spark, dir, "folded1") &&
      TableIndex.isCommitted(spark, dir, "folded3"))
    // survives a marker fold
    TableIndex.checkpointCommits(spark, dir)
    assert(TableIndex.isCommitted(spark, dir, "folded1") &&
      TableIndex.isCommitted(spark, dir, "own1"))
    // a TORN build (no committed batch of its own) refuses the seed —
    // history must never make a torn generation pass the publish guard
    val torn = graft.util.TempDirs.scratch("swap_seed_torn").toString
    new java.io.File(torn).mkdirs()
    intercept[IllegalArgumentException] {
      TableIndex.seedCommittedHistory(spark, torn, Set("ghost"))
    }
  }

  test("copyBatches: bit-identical files, idempotent, partition layout preserved") {
    import spark.implicits._
    val src = graft.util.TempDirs.scratch("swap_copy_src").toString
    val dst = graft.util.TempDirs.scratch("swap_copy_dst").toString
    val part = Seq((1L, 10L, "a"), (2L, 11L, "b"), (3L, 10L, "c")).toDF("id", "cell", "v")
    TableIndex.commitBatch(spark, src, "cb1", Seq(("t.parquet", part, Seq("cell"))))
    TableIndex.commitBatch(spark, dst, "own", Seq(("t.parquet", part.limit(1), Seq("cell"))))
    TableIndex.copyBatches(spark, src, dst, Seq("cb1"))
    assert(TableIndex.isCommitted(spark, dst, "cb1"))
    // same rows, partition dirs intact
    val got = spark.read.parquet(s"$dst/t.parquet")
      .filter(input_file_name().contains("b_cb1__"))
    assert(rowsOf(got.select("id", "cell", "v")) == rowsOf(part))
    assert(new java.io.File(s"$dst/t.parquet/cell=10").exists(),
      "partition directories must carry over")
    // bit-identical: every copied file's bytes equal its source's
    def filesOf(d: String) = {
      val out = scala.collection.mutable.ArrayBuffer[java.io.File]()
      def rec(f: java.io.File): Unit =
        if (f.isDirectory) f.listFiles().foreach(rec)
        else if (f.getName.startsWith("b_cb1__")) out += f
      rec(new java.io.File(d)); out.sortBy(_.getName)
    }
    val srcFiles = filesOf(s"$src/t.parquet")
    val dstFiles = filesOf(s"$dst/t.parquet")
    assert(srcFiles.nonEmpty && srcFiles.map(_.getName) == dstFiles.map(_.getName))
    for ((s, d) <- srcFiles.zip(dstFiles))
      assert(java.util.Arrays.equals(
        java.nio.file.Files.readAllBytes(s.toPath),
        java.nio.file.Files.readAllBytes(d.toPath)), s"bytes differ: ${s.getName}")
    // idempotent: a re-copy skips (no duplicate rows)
    val n = spark.read.parquet(s"$dst/t.parquet").count()
    TableIndex.copyBatches(spark, src, dst, Seq("cb1"))
    assert(spark.read.parquet(s"$dst/t.parquet").count() == n)
  }

  // ----------------------------------------------------------------
  // IVF: compact catch-up (file copy) and recluster catch-up (re-encode)
  // ----------------------------------------------------------------

  private def buildIvfRoot(root: String, vecs: DataFrame, storeFloats: Boolean): Unit = {
    val centroids = graft.ml.AnnSearch.kmeansCentroidsExact(vecs, stride = 7, iters = 2)
    val book = graft.ml.AnnSearch.pqBook(vecs, m = 4, stride = 7)
    IvfIndex.build(vecs, centroids, book, s"$root/g0", storeFloats = storeFloats)
    TableIndex.publishGeneration(spark, root, "g0")
  }

  test("ivf compact catch-up: a late append and a late delete survive the swap; search ≡ brute force") {
    val all = embsDf.localCheckpoint(true)
    val base = all.filter(col("id") % 3 =!= 0)
    val lateVecs = all.filter(col("id") % 3 === 0).limit(25).localCheckpoint(true)
    val root = graft.util.TempDirs.scratch("swap_ivf").toString
    buildIvfRoot(root, base, storeFloats = true)

    val cur = s"$root/g0"
    val snap = TableIndex.openSnapshot(spark, cur)
    IvfIndex.compact(spark, cur, s"$root/g1", at = Some(snap))
    IvfIndex.appendInPlace(spark, root, lateVecs, batchId = Some("ivf-late"))
    val delId = base.select("id").orderBy("id").limit(1).collect()(0).getLong(0)
    IvfIndex.deleteInPlace(spark, root, spark.range(delId, delId + 1).select(col("id")))
    val late = TableIndex.catchUpAndPublish(spark, root, cur, "g1", snap.bids)
    assert(late.contains("ivf-late") && late.size == 2, s"late set wrong: $late")
    assert(TableIndex.resolveDir(spark, root) == s"$root/g1")

    // exactness against brute force over the live corpus, addressed by root
    val live = base.filter(col("id") =!= delId).unionByName(lateVecs).localCheckpoint(true)
    val queries = all.limit(12)
    assert(pairsOf(IvfIndex.nearDupsExact(spark, root, queries, tau = 0.85)) ==
      brutePairs(live, queries, tau = 0.85),
      "post-swap root probe diverged from brute force over (base ∪ late ∖ deleted)")
    // replay of the carried bid skips in the new generation
    val enc = s"${TableIndex.resolveDir(spark, root)}/encoded.parquet"
    val before = spark.read.parquet(enc).count()
    IvfIndex.appendInPlace(spark, root, lateVecs, batchId = Some("ivf-late"))
    assert(spark.read.parquet(enc).count() == before, "carried bid replayed as new rows")
  }

  test("recluster catch-up RE-ENCODES late appends (floats-bearing); plain index fails loud") {
    val all = embsDf.localCheckpoint(true)
    val base = all.filter(col("id") % 4 =!= 0)
    val lateVecs = all.filter(col("id") % 4 === 0).limit(20).localCheckpoint(true)

    // floats-bearing: the late shard re-encodes against the retrained
    // centroids under its original bid
    val root = graft.util.TempDirs.scratch("swap_recl").toString
    buildIvfRoot(root, base, storeFloats = true)
    val cur = s"$root/g0"
    val snap = TableIndex.openSnapshot(spark, cur)
    IvfIndex.recluster(spark, cur, spark.emptyDataFrame, s"$root/g1", stride = 5,
      at = Some(snap))
    IvfIndex.appendInPlace(spark, root, lateVecs, batchId = Some("recl-late"))
    TableIndex.catchUpAndPublishWith(spark, root, cur, "g1", snap.bids)(
      bids => IvfIndex.carryReencoded(spark, cur, s"$root/g1", bids))
    assert(TableIndex.resolveDir(spark, root) == s"$root/g1")
    assert(TableIndex.isCommitted(spark, s"$root/g1", "recl-late"))
    val live = base.unionByName(lateVecs).localCheckpoint(true)
    val queries = all.limit(12)
    assert(pairsOf(IvfIndex.nearDupsExact(spark, root, queries, tau = 0.85)) ==
      brutePairs(live, queries, tau = 0.85),
      "re-encoded late shard lost or mis-assigned rows vs brute force")
    // the re-encoded rows must use the NEW generation's cell space:
    // every encoded cell (the carried batch's included) names one of
    // the RETRAINED centroids
    val newCells = spark.read.parquet(s"$root/g1/centroids.parquet")
      .select(col("c_id").cast("long")).collect().map(_.getLong(0)).toSet
    val usedCells = spark.read.parquet(s"$root/g1/encoded.parquet")
      .select(col("cell").cast("long")).distinct().collect().map(_.getLong(0)).toSet
    assert(usedCells.subsetOf(newCells),
      s"late rows encoded against the OLD generation's cells: ${usedCells -- newCells}")

    // plain index (no floats): a late append cannot re-encode — loud
    val root2 = graft.util.TempDirs.scratch("swap_recl_plain").toString
    buildIvfRoot(root2, base, storeFloats = false)
    val cur2 = s"$root2/g0"
    val snap2 = TableIndex.openSnapshot(spark, cur2)
    IvfIndex.recluster(spark, cur2, base, s"$root2/g1", stride = 5, at = Some(snap2))
    IvfIndex.appendInPlace(spark, root2, lateVecs, batchId = Some("recl-late2"))
    val e = intercept[IllegalStateException] {
      TableIndex.catchUpAndPublishWith(spark, root2, cur2, "g1", snap2.bids)(
        bids => IvfIndex.carryReencoded(spark, cur2, s"$root2/g1", bids))
    }
    assert(e.getMessage.contains("storeFloats"),
      "the failure must name the remedy (storeFloats = true)")
    assert(TableIndex.resolveDir(spark, root2) == s"$root2/g0",
      "a failed catch-up must leave the OLD generation authoritative")
  }

  test("concurrent DOUBLE-PUBLISH: the losing publisher fails loud instead of dropping the winner's appends") {
    import spark.implicits._
    val root = graft.util.TempDirs.scratch("swap_dblpub").toString
    val df = Seq((1L, "a")).toDF("id", "v")
    TableIndex.commitBatch(spark, s"$root/g0", "dp0", Seq(("t.parquet", df, Seq.empty)))
    TableIndex.publishGeneration(spark, root, "g0")
    // two publishers both pin g0 and build successors
    val snap = TableIndex.openSnapshot(spark, s"$root/g0")
    TableIndex.commitBatch(spark, s"$root/gA", "dpA", Seq(("t.parquet", df, Seq.empty)))
    TableIndex.commitBatch(spark, s"$root/gB", "dpB", Seq(("t.parquet", df, Seq.empty)))
    // publisher A wins the swap...
    TableIndex.catchUpAndPublish(spark, root, s"$root/g0", "gA", snap.bids)
    // ...an append lands on the new current generation...
    TableIndex.commitBatch(spark, s"$root/gA", "dpX", Seq(("t.parquet", df, Seq.empty)),
      requireCurrentOf = Some(root))
    // ...and publisher B (still built from g0) must FAIL LOUD — its
    // swap would silently drop dpX from every root reader
    intercept[TableIndex.GenerationSupersededException] {
      TableIndex.catchUpAndPublish(spark, root, s"$root/g0", "gB", snap.bids)
    }
    assert(TableIndex.resolveDir(spark, root) == s"$root/gA",
      "the losing publish must not move the pointer")
    assert(TableIndex.isCommitted(spark, s"$root/gA", "dpX"))
  }

  test("generation-copy forms carry the source's bid history: replayed pre-copy bids skip in the new generation") {
    val d = docsDf
    val base = d.filter(pmod(col("doc_id"), lit(3)) === 0)
    val shardA = d.filter(pmod(col("doc_id"), lit(3)) === 1).limit(30)
    val shardB = d.filter(pmod(col("doc_id"), lit(3)) === 2).limit(30)
    val g0 = graft.util.TempDirs.scratch("swap_copyhist_g0").toString
    val g1 = graft.util.TempDirs.scratch("swap_copyhist_g1").toString
    IncrementalDedup.buildIndex(base, "doc_id", "text", g0)
    IncrementalDedup.updateIndexInPlace(spark, g0, shardA, "doc_id", "text",
      batchId = Some("copyhist-a"))
    // the generation-copy append re-files everything under one new bid
    IncrementalDedup.updateIndex(spark, g0, shardB, "doc_id", "text", g1)
    assert(TableIndex.isCommitted(spark, g1, "copyhist-a"),
      "the generation copy must carry the source's committed-bid history")
    // a stream replaying the pre-copy micro-batch against the NEW
    // generation must skip — without the seeded history it re-appends
    val before = spark.read.parquet(s"$g1/hashes.parquet").count()
    IncrementalDedup.updateIndexInPlace(spark, g1, shardA, "doc_id", "text",
      batchId = Some("copyhist-a"))
    assert(spark.read.parquet(s"$g1/hashes.parquet").count() == before,
      "replayed pre-copy batch re-appended into the generation copy")
  }

  // ----------------------------------------------------------------
  // Retirement: vacuumGenerations + pointer-tmp fsck finding
  // ----------------------------------------------------------------

  test("vacuumGenerations: age-gated sweep of superseded generations and crashed pointer temps; current untouchable") {
    import spark.implicits._
    val root = graft.util.TempDirs.scratch("swap_vacuum").toString
    val df = Seq((1L, "a")).toDF("id", "v")
    TableIndex.commitBatch(spark, s"$root/g0", "v0", Seq(("t.parquet", df, Seq.empty)))
    TableIndex.publishGeneration(spark, root, "g0")
    TableIndex.commitBatch(spark, s"$root/g1", "v1", Seq(("t.parquet", df, Seq.empty)))
    TableIndex.publishGeneration(spark, root, "g1") // g0 superseded
    // a publisher that crashed between its temp write and the rename
    val tmp = new java.io.File(s"$root/_generation.tmp.deadbeef")
    java.nio.file.Files.write(tmp.toPath, "gx".getBytes)
    // fsck names both residual states
    val kinds = TableIndex.rootFindings(spark, root).map(_.kind).toSet
    assert(kinds == Set("unpublished-generation", "pointer-tmp"),
      s"rootFindings missed a residual state: $kinds")
    // inside the grace window: NOTHING is deleted (pinned readers may
    // still be draining on the superseded generation)
    assert(TableIndex.vacuumGenerations(spark, root, graceMs = 60L * 60 * 1000).isEmpty)
    assert(new java.io.File(s"$root/g0").exists() && tmp.exists())
    // past the grace: the superseded generation and the temp go, the
    // CURRENT generation stays — even with a grace in the future
    val deleted = TableIndex.vacuumGenerations(spark, root, graceMs = -60000L)
    assert(deleted.toSet == Set("g0", "_generation.tmp.deadbeef"), s"deleted: $deleted")
    assert(!new java.io.File(s"$root/g0").exists() && !tmp.exists())
    assert(new java.io.File(s"$root/g1").exists(),
      "vacuum must never touch the generation the pointer names")
    assert(TableIndex.resolveDir(spark, root) == s"$root/g1")
    assert(TableIndex.rootFindings(spark, root).isEmpty, "post-vacuum root must audit clean")
    // a plain (pointer-less) directory refuses the op outright
    intercept[IllegalStateException] {
      TableIndex.vacuumGenerations(spark, graft.util.TempDirs.scratch("swap_vac_plain").toString,
        graceMs = 0L)
    }
  }

  // ----------------------------------------------------------------
  // Streaming patience: a held lease delays a micro-batch, not the query
  // ----------------------------------------------------------------

  test("a streaming micro-batch WAITS OUT a maintenance-held writer lease instead of failing the query") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val d = docsDf
    val initial = d.filter(pmod(col("doc_id"), lit(4)) =!= 0)
    val arriving = d.filter(pmod(col("doc_id"), lit(4)) === 0).limit(20)
      .select(col("doc_id").cast("long"), col("text")).as[(Long, String)].collect()
    val idx = graft.util.TempDirs.scratch("lease_wait_idx").toString
    IncrementalDedup.buildIndex(initial, "doc_id", "text", idx)
    // a maintenance op (publisher catch-up window) holds the lease...
    val token = TableIndex.acquireLease(spark, idx)
    val released = new java.util.concurrent.atomic.AtomicBoolean(false)
    val releaser = new Thread(() => {
      Thread.sleep(2500)
      released.set(true)
      TableIndex.releaseLease(spark, idx, token)
    })
    releaser.setDaemon(true)
    val mem = MemoryStream[(Long, String)]
    val decDir = graft.util.TempDirs.scratch("lease_wait_dec").toString
    val q = IncrementalDedup.dedupStream(idx, mem.toDF().toDF("doc_id", "text"),
      "doc_id", "text", decDir, graft.util.TempDirs.scratch("lease_wait_ckpt").toString,
      tau = 0.8)
    try {
      // ...and the micro-batch firing inside the window must DELAY
      // (awaitingLease re-runs the batch body; already-committed
      // decisions skip by bid), not fail the query
      releaser.start()
      mem.addData(arriving.toIndexedSeq)
      q.processAllAvailable()
      assert(q.exception.isEmpty,
        s"stream failed on a transiently held lease: ${q.exception}")
      assert(released.get(), "the batch completed before the lease was even released?")
      assert(spark.read.parquet(s"$decDir/decisions.parquet").count() == arriving.length,
        "the delayed micro-batch's decisions did not land")
    } finally q.stop()
  }

  // ----------------------------------------------------------------
  // True concurrency: a live appender thread vs a publishing compactor
  // ----------------------------------------------------------------

  test("TRUE RACE: root-addressed appender thread vs compactPublish — no batch lost, search stays exact") {
    val all = embsDf.localCheckpoint(true)
    val base = all.filter(col("id") < 440L)
    val shards = all.filter(col("id") >= 440L).localCheckpoint(true)
      .collect().grouped(10).toSeq
    assert(shards.size >= 4, s"fixture too small for a race: ${shards.size} shards")
    val root = graft.util.TempDirs.scratch("swap_race").toString
    buildIvfRoot(root, base, storeFloats = true)

    import spark.implicits._
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val appended = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val writer = new Thread(() => {
      try {
        for ((rows, i) <- shards.zipWithIndex) {
          val bid = s"race-$i"
          val df = rows.toSeq.map(r => (r.getLong(0), r.getSeq[Double](1)))
            .toDF("id", "vec").select(col("id"), col("vec").cast("array<double>"))
          var done = false
          var tries = 0
          while (!done) {
            try { IvfIndex.appendInPlace(spark, root, df, batchId = Some(bid)); done = true }
            catch {
              case e: IllegalStateException if e.getMessage.contains("lease") && tries < 200 =>
                tries += 1; Thread.sleep(25) // publisher holds the source lease: retry
            }
          }
          appended.add(bid)
        }
      } catch { case t: Throwable => failures.add(t) }
    })
    writer.setDaemon(true)
    writer.start()
    // two publishes while the appender runs — each pins, rewrites,
    // catches up and swaps under the source lease
    IvfIndex.compactPublish(spark, root)
    IvfIndex.compactPublish(spark, root)
    writer.join(120000)
    assert(!writer.isAlive, "appender thread wedged")
    assert(failures.isEmpty, s"appender failed: ${failures.peek()}")

    // every appended bid must be committed-visible through the root
    val curDir = TableIndex.resolveDir(spark, root)
    val missing = appended.toArray(Array.empty[String])
      .filterNot(bid => TableIndex.isCommitted(spark, curDir, bid))
    assert(missing.isEmpty, s"batches lost across the swaps: ${missing.mkString(", ")}")
    // no duplicates either: one encoded row per distinct id
    val enc = spark.read.parquet(s"$curDir/encoded.parquet")
    assert(enc.count() == enc.select("n_id").distinct().count(),
      "duplicate rows — a batch was both folded and re-appended")
    // and the index answers exactly, addressed by root
    val live = base.unionByName(shards.flatten.toSeq
      .map(r => (r.getLong(0), r.getSeq[Double](1))).toDF("id", "vec")
      .select(col("id"), col("vec").cast("array<double>"))).localCheckpoint(true)
    val queries = all.limit(10)
    assert(pairsOf(IvfIndex.nearDupsExact(spark, root, queries, tau = 0.85)) ==
      brutePairs(live, queries, tau = 0.85),
      "post-race probe diverged from brute force")
  }
}
