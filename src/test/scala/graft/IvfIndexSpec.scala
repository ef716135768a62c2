package graft

import graft.ml.{AnnSearch, IvfIndex}
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** Persisted IVF+PQ index: search parity with the in-session operator
  * and append ≡ rebuild — the generation-loop soundness property. */
class IvfIndexSpec extends SparkSpec {

  private def embsDf = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    .select(col("vec_id").as("id"), expr("transform(embedding, x -> cast(x as double))").as("vec"))

  test("search against the persisted index equals the in-session ivfPqTopK") {
    val corpus = embsDf
    val centroids = AnnSearch.kmeansCentroidsExact(corpus, 15, iters = 2)
    val book = AnnSearch.pqBook(corpus, m = 32, stride = 10)
    val idx = graft.util.TempDirs.scratch("ivf_idx_spec").toString
    IvfIndex.build(corpus, centroids, book, idx)
    val queries = corpus.filter(pmod(col("id"), lit(50)) === 0)
    val nprobe = math.ceil(0.5 * centroids.count()).toInt
    def rowsOf(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).sorted.toSeq
    val direct = rowsOf(AnnSearch.ivfPqTopK(queries, corpus, centroids, book,
      k = 5, nprobe = nprobe, shortlist = 40))
    val viaIndex = rowsOf(IvfIndex.search(spark, idx, corpus, queries,
      k = 5, nprobe = nprobe, shortlist = 40))
    assert(viaIndex == direct,
      "persisted-index search diverged from the in-session operator — persistence lost information")
  }

  test("append(new vectors) is bit-identical to rebuilding the index over the union") {
    val all = embsDf
    // split modulus coprime with the seeding stride (15), so the old
    // generation still contains seed ids
    val old = all.filter(pmod(col("id"), lit(7)) =!= 0)
    val fresh = all.filter(pmod(col("id"), lit(7)) === 0)
    // seed centroids/book from the OLD generation only — append must
    // reuse them, never re-seed (re-seeding re-keys every code)
    val centroids = AnnSearch.kmeansCentroidsExact(old, 15, iters = 2)
    val book = AnnSearch.pqBook(old, m = 32, stride = 10)
    val gen1 = graft.util.TempDirs.scratch("ivf_gen1").toString
    IvfIndex.build(old, centroids, book, gen1)
    val gen2 = graft.util.TempDirs.scratch("ivf_gen2").toString
    IvfIndex.append(spark, gen1, fresh, gen2)
    val rebuilt = graft.util.TempDirs.scratch("ivf_rebuilt").toString
    IvfIndex.build(old.unionByName(fresh), centroids, book, rebuilt)
    def tableSorted(path: String): Seq[String] =
      spark.read.parquet(path).collect().map(_.toString).sorted.toSeq
    for (t <- Seq("centroids", "book", "encoded")) {
      assert(tableSorted(s"$gen2/$t.parquet") == tableSorted(s"$rebuilt/$t.parquet"),
        s"appended index table $t diverged from the from-scratch rebuild")
    }
    assert(fresh.count() > 0 && old.count() > 0)

    // compaction: pure layout rewrite — bit-identical rows, strictly
    // fewer data files (gen2 holds two file waves per touched cell)
    def dataFiles(path: String): Int = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(path)).count(_.getName.endsWith(".parquet"))
    }
    val compacted = graft.util.TempDirs.scratch("ivf_compacted").toString
    IvfIndex.compact(spark, gen2, compacted)
    assert(tableSorted(s"$compacted/encoded.parquet") == tableSorted(s"$gen2/encoded.parquet"),
      "compaction changed the encoded rows")
    assert(dataFiles(s"$compacted/encoded.parquet") < dataFiles(s"$gen2/encoded.parquet"),
      s"compaction did not reduce the file count " +
        s"(${dataFiles(s"$compacted/encoded.parquet")} vs ${dataFiles(s"$gen2/encoded.parquet")})")
  }

  test("appendInPlace adds the shard's rows without touching existing files") {
    val all = embsDf
    val old = all.filter(pmod(col("id"), lit(7)) =!= 0)
    val fresh = all.filter(pmod(col("id"), lit(7)) === 0)
    val centroids = AnnSearch.kmeansCentroidsExact(old, 15, iters = 2)
    val book = AnnSearch.pqBook(old, m = 32, stride = 10)
    val idx = graft.util.TempDirs.scratch("ivf_inplace").toString
    IvfIndex.build(old, centroids, book, idx)
    def dataFiles(path: String): Set[String] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(path)).filter(_.getName.endsWith(".parquet"))
        .map(f => f.getPath + ":" + f.lastModified() + ":" + f.length()).toSet
    }
    val before = dataFiles(s"$idx/encoded.parquet")
    IvfIndex.appendInPlace(spark, idx, fresh)
    // O(new-shard) contract: every pre-append file survives byte-for-byte
    assert(before.subsetOf(dataFiles(s"$idx/encoded.parquet")),
      "appendInPlace rewrote or removed existing encoded files")
    val rebuilt = graft.util.TempDirs.scratch("ivf_inplace_rebuilt").toString
    IvfIndex.build(old.unionByName(fresh), centroids, book, rebuilt)
    def tableSorted(path: String): Seq[String] =
      spark.read.parquet(path).collect().map(_.toString).sorted.toSeq
    assert(tableSorted(s"$idx/encoded.parquet") == tableSorted(s"$rebuilt/encoded.parquet"),
      "in-place append rows diverged from the from-scratch rebuild")
  }

  test("ingestStream: a 3-batch feed builds the same index rows as one batch build") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val all = embsDf
    val seedCorpus = all.filter(pmod(col("id"), lit(4)) === 0)
    val arriving = all.filter(pmod(col("id"), lit(4)) =!= 0)
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    val centroids = AnnSearch.kmeansCentroidsExact(seedCorpus, 15, iters = 2)
    val book = AnnSearch.pqBook(seedCorpus, m = 32, stride = 4)
    val idx = graft.util.TempDirs.scratch("ivf_stream").toString
    IvfIndex.build(seedCorpus, centroids, book, idx)
    val mem = MemoryStream[(Long, Array[Double])]
    val q = IvfIndex.ingestStream(idx, mem.toDF().toDF("id", "vec"),
      graft.util.TempDirs.scratch("ivf_stream_ckpt").toString)
    try {
      arriving.grouped(math.max(1, arriving.length / 3 + 1)).foreach { batch =>
        mem.addData(batch.toIndexedSeq)
        q.processAllAvailable()
      }
    } finally q.stop()
    val rebuilt = graft.util.TempDirs.scratch("ivf_stream_rebuilt").toString
    IvfIndex.build(seedCorpus.unionByName(all.filter(pmod(col("id"), lit(4)) =!= 0)),
      centroids, book, rebuilt)
    def tableSorted(path: String): Seq[String] =
      spark.read.parquet(path).collect().map(_.toString).sorted.toSeq
    assert(tableSorted(s"$idx/encoded.parquet") == tableSorted(s"$rebuilt/encoded.parquet"),
      "streamed index rows depend on micro-batch boundaries or lost a batch")
  }

  test("dedupStream: decisions match the batch-semantics model, index equals a rebuild over the survivors") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // two clusters 45° apart (the TableIndexSpec geometry) so τ=0.9
    // within-cluster pairs are guaranteed and cross pairs are absent
    val dim = 8
    val inv = 1.0 / math.sqrt(2.0)
    def mkVec(id: Long): Array[Double] = {
      // ids >= 100 with id % 5 == 0 form a THIRD cluster (e2) absent
      // from the seed — genuinely novel arrivals the loop must KEEP
      // (first of them per batch) while rejecting their later dups
      val c = if (id >= 100 && id % 5 == 0) Array.tabulate(dim)(i => if (i == 2) 1.0 else 0.0)
      else if (id % 2 == 0) Array.tabulate(dim)(i => if (i == 0) 1.0 else 0.0)
      else Array.tabulate(dim)(i => if (i == 0 || i == 1) inv else 0.0)
      c.indices.map(i => c(i) + 0.06 * math.sin(id * 13.7 + i * 2.1)).toArray
    }
    val seed = (0L until 20L).map(id => (id, mkVec(id)))
    val arriving = (100L until 130L).map(id => (id, mkVec(id)))
    val cents = Seq(
      (0L, Seq(1.0, 0, 0, 0, 0, 0, 0, 0)),
      (1L, Seq(inv, inv, 0, 0, 0, 0, 0, 0))).toDF("c_id", "c_vec")
    val book = AnnSearch.pqBook(seed.toDF("id", "vec"), m = 8, stride = 2)
    val idx = graft.util.TempDirs.scratch("ivf_dstream").toString
    IvfIndex.build(seed.toDF("id", "vec"), cents, book, idx)
    val corpusDir = graft.util.TempDirs.scratch("ivf_dstream_corpus").toString
    graft.util.TableIndex.commitBatch(spark, corpusDir, "seed",
      Seq(("vectors.parquet", seed.toDF("id", "vec"), Seq.empty)))
    val decDir = graft.util.TempDirs.scratch("ivf_dstream_dec").toString
    val mem = MemoryStream[(Long, Array[Double])]
    val q = IvfIndex.dedupStream(idx, corpusDir, mem.toDF().toDF("id", "vec"),
      decDir, graft.util.TempDirs.scratch("ivf_dstream_ckpt").toString, tau = 0.9)
    val batches = arriving.grouped(10).toSeq
    try {
      batches.foreach { b => mem.addData(b.toIndexedSeq); q.processAllAvailable() }
    } finally q.stop()
    // model: kept(v) iff no cosine>=τ match in (accepted-so-far index)
    // and no earlier-id match WITHIN ITS OWN BATCH (regardless of that
    // earlier vector's own fate) — the documented batch semantics
    def sim(a: Array[Double], b: Array[Double]): Double = {
      val d = a.indices.map(i => a(i) * b(i)).sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    var accepted = seed.toVector
    val model = scala.collection.mutable.Map.empty[Long, Boolean]
    for (b <- batches) {
      val kept = b.filter { case (id, v) =>
        val dupIdx = accepted.exists { case (aid, av) => aid != id && sim(av, v) >= 0.9 }
        val dupBatch = b.exists { case (wid, wv) => wid < id && sim(wv, v) >= 0.9 }
        val k = !dupIdx && !dupBatch
        model(id) = k
        k
      }
      accepted ++= kept
    }
    val got = spark.read.parquet(s"$decDir/decisions.parquet")
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(got == model.toMap,
      s"streamed dedup decisions diverged from the batch-semantics model\n$got\nvs\n${model.toMap}")
    assert(model.values.exists(identity) && model.values.exists(!_),
      "degenerate fixture: decisions are all-kept or all-rejected")
    // the loop's output state is replayable: index rows == a build over
    // (seed ∪ stream survivors), float corpus == the accepted set
    val rebuilt = graft.util.TempDirs.scratch("ivf_dstream_rebuilt").toString
    IvfIndex.build(accepted.toDF("id", "vec"), cents, book, rebuilt)
    def tableSorted(path: String): Seq[String] =
      spark.read.parquet(path).collect().map(_.toString).sorted.toSeq
    assert(tableSorted(s"$idx/encoded.parquet") == tableSorted(s"$rebuilt/encoded.parquet"),
      "streamed index rows are not replayable from scratch over the survivors")
    assert(spark.read.parquet(s"$corpusDir/vectors.parquet").count() == accepted.length,
      "float corpus table diverged from the accepted set")
  }

  test("self-contained dedupStream (floats-bearing, no corpus dir) matches the corpus-backed form") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dim = 8
    val inv = 1.0 / math.sqrt(2.0)
    def mkVec(id: Long): Array[Double] = {
      val c = if (id >= 100 && id % 5 == 0) Array.tabulate(dim)(i => if (i == 2) 1.0 else 0.0)
      else if (id % 2 == 0) Array.tabulate(dim)(i => if (i == 0) 1.0 else 0.0)
      else Array.tabulate(dim)(i => if (i == 0 || i == 1) inv else 0.0)
      c.indices.map(i => c(i) + 0.06 * math.sin(id * 13.7 + i * 2.1)).toArray
    }
    val seed = (0L until 20L).map(id => (id, mkVec(id)))
    val arriving = (100L until 130L).map(id => (id, mkVec(id)))
    val cents = Seq(
      (0L, Seq(1.0, 0, 0, 0, 0, 0, 0, 0)),
      (1L, Seq(inv, inv, 0, 0, 0, 0, 0, 0))).toDF("c_id", "c_vec")
    val book = AnnSearch.pqBook(seed.toDF("id", "vec"), m = 8, stride = 2)
    // corpus-backed run
    val idxA = graft.util.TempDirs.scratch("ivf_ds_a").toString
    IvfIndex.build(seed.toDF("id", "vec"), cents, book, idxA)
    val corpusDir = graft.util.TempDirs.scratch("ivf_ds_a_corpus").toString
    graft.util.TableIndex.commitBatch(spark, corpusDir, "seed",
      Seq(("vectors.parquet", seed.toDF("id", "vec"), Seq.empty)))
    val decA = graft.util.TempDirs.scratch("ivf_ds_a_dec").toString
    // self-contained run
    val idxB = graft.util.TempDirs.scratch("ivf_ds_b").toString
    IvfIndex.build(seed.toDF("id", "vec"), cents, book, idxB, storeFloats = true)
    val decB = graft.util.TempDirs.scratch("ivf_ds_b_dec").toString
    def feed(start: (MemoryStream[(Long, Array[Double])]) => org.apache.spark.sql.streaming.StreamingQuery): Unit = {
      val mem = MemoryStream[(Long, Array[Double])]
      val q = start(mem)
      try arriving.grouped(10).foreach { b => mem.addData(b.toIndexedSeq); q.processAllAvailable() }
      finally q.stop()
    }
    feed(mem => IvfIndex.dedupStream(idxA, corpusDir, mem.toDF().toDF("id", "vec"),
      decA, graft.util.TempDirs.scratch("ivf_ds_a_ck").toString, tau = 0.9))
    feed(mem => IvfIndex.dedupStream(idxB, mem.toDF().toDF("id", "vec"),
      decB, graft.util.TempDirs.scratch("ivf_ds_b_ck").toString, tau = 0.9))
    def rows(p: String) = spark.read.parquet(p).collect().map(_.toString).sorted.toSeq
    assert(rows(s"$decA/decisions.parquet") == rows(s"$decB/decisions.parquet"),
      "self-contained dedupStream decisions diverged from the corpus-backed form")
    assert(rows(s"$idxA/encoded.parquet") == rows(s"$idxB/encoded.parquet"),
      "self-contained dedupStream index rows diverged from the corpus-backed form")
    // and the float table tracked the survivors exactly
    val keptIds = spark.read.parquet(s"$decB/decisions.parquet")
      .filter(col("kept")).select("id").as[Long].collect().toSet
    val floatIds = spark.read.parquet(s"$idxB/floats.parquet")
      .select("n_id").as[Long].collect().toSet
    assert(floatIds == (seed.map(_._1).toSet ++ keptIds),
      "float table diverged from seed ∪ survivors")
  }

  test("delete(ids) is bit-identical to rebuilding over the remaining corpus") {
    val all = embsDf
    val centroids = AnnSearch.kmeansCentroidsExact(all, 15, iters = 2)
    val book = AnnSearch.pqBook(all, m = 32, stride = 10)
    val full = graft.util.TempDirs.scratch("ivf_del_full").toString
    IvfIndex.build(all, centroids, book, full)
    val dropped = all.filter(pmod(col("id"), lit(3)) === 0).select("id")
    val afterDel = graft.util.TempDirs.scratch("ivf_del_out").toString
    IvfIndex.delete(spark, full, dropped, afterDel)
    val rebuilt = graft.util.TempDirs.scratch("ivf_del_rebuilt").toString
    IvfIndex.build(all.filter(pmod(col("id"), lit(3)) =!= 0), centroids, book, rebuilt)
    def tableSorted(path: String): Seq[String] =
      spark.read.parquet(path).collect().map(_.toString).sorted.toSeq
    for (t <- Seq("centroids", "book", "encoded")) {
      assert(tableSorted(s"$afterDel/$t.parquet") == tableSorted(s"$rebuilt/$t.parquet"),
        s"post-delete index table $t diverged from the from-scratch rebuild")
    }
    // a probe of the post-delete index never surfaces a deleted id
    val deletedIds = dropped.collect().map(_.getLong(0)).toSet
    val queries = all.filter(pmod(col("id"), lit(50)) === 1)
    val hits = IvfIndex.search(spark, afterDel, all, queries,
      k = 5, nprobe = 8, shortlist = 40)
      .select("n_id").collect().map(_.getLong(0))
    assert(hits.nonEmpty && hits.forall(id => !deletedIds.contains(id)),
      "post-delete probe re-surfaced a deleted vector")
  }

  test("deleteInPlace: same search as the rewrite delete, zero encoded files touched, compact folds the tombstones") {
    val all = embsDf
    val centroids = AnnSearch.kmeansCentroidsExact(all, 15, iters = 2)
    val book = AnnSearch.pqBook(all, m = 32, stride = 10)
    val idx = graft.util.TempDirs.scratch("ivf_tomb").toString
    IvfIndex.build(all, centroids, book, idx)
    val dropped = all.filter(pmod(col("id"), lit(3)) === 0).select("id")
    def dataFiles(path: String): Set[String] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(path)).filter(_.getName.endsWith(".parquet"))
        .map(f => f.getPath + ":" + f.lastModified() + ":" + f.length()).toSet
    }
    val before = dataFiles(s"$idx/encoded.parquet")
    IvfIndex.deleteInPlace(spark, idx, dropped)
    // O(delete-list) contract: the corpus-sized table is untouched
    assert(dataFiles(s"$idx/encoded.parquet") == before,
      "deleteInPlace rewrote the encoded table")
    // merge-on-read: search through the tombstones equals search after
    // the full rewrite delete
    val rewritten = graft.util.TempDirs.scratch("ivf_tomb_rewrite").toString
    IvfIndex.delete(spark, idx, dropped, rewritten)
    val queries = all.filter(pmod(col("id"), lit(50)) === 1)
    def rowsOf(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toString).sorted.toSeq
    assert(
      rowsOf(IvfIndex.search(spark, idx, all, queries, k = 5, nprobe = 8, shortlist = 40)) ==
      rowsOf(IvfIndex.search(spark, rewritten, all, queries, k = 5, nprobe = 8, shortlist = 40)),
      "tombstoned search diverged from the rewrite-delete search")
    // compaction is the fold point: encoded rows == rebuild-over-
    // remaining, and the tombstone table does not carry over
    val folded = graft.util.TempDirs.scratch("ivf_tomb_folded").toString
    IvfIndex.compact(spark, idx, folded)
    val rebuilt = graft.util.TempDirs.scratch("ivf_tomb_rebuilt").toString
    IvfIndex.build(all.filter(pmod(col("id"), lit(3)) =!= 0), centroids, book, rebuilt)
    def tableSorted(path: String): Seq[String] =
      spark.read.parquet(path).collect().map(_.toString).sorted.toSeq
    assert(tableSorted(s"$folded/encoded.parquet") == tableSorted(s"$rebuilt/encoded.parquet"),
      "compaction did not fold the tombstones into the encoded rows")
    assert(!new java.io.File(s"$folded/tombstones.parquet").exists(),
      "compaction carried the tombstone table into the new generation")
  }

  test("nearDupsExact == brute force, through in-place append and after a tombstone delete") {
    import spark.implicits._
    // clustered derivation (the QueriesText fixture rule): guaranteed
    // tau=0.8 cross pairs under any coprime split
    val raw = embsDf.collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val centers = (0L until 20L).map(k => raw(k))
    val derived = raw.toSeq.sortBy(_._1).map { case (id, v) =>
      (id, v.indices.map(i => centers((id % 20).toInt)(i) + 0.15 * v(i)).toArray)
    }
    val all = derived.toDF("id", "vec")
    val genA = all.filter(pmod(col("id"), lit(3)) === 1)
    val genB = all.filter(pmod(col("id"), lit(3)) === 2)
    val shard = all.filter(pmod(col("id"), lit(3)) === 0)
    val idx = graft.util.TempDirs.scratch("ivf_neardup").toString
    val centroids = AnnSearch.kmeansCentroidsExact(genA, 14, iters = 2)
    val book = AnnSearch.pqBook(genA, m = 32, stride = 10)
    graft.ml.IvfIndex.build(genA, centroids, book, idx)
    IvfIndex.appendInPlace(spark, idx, genB) // appended geometry rows in play
    val indexed = genA.unionByName(genB)
    def brute(vs: Map[Long, Array[Double]], qs: Seq[(Long, Array[Double])], tau: Double) =
      (for {
        (qid, qv) <- qs; (nid, nv) <- vs if qid != nid
        d = qv.indices.map(i => qv(i) * nv(i)).sum
        s = d / (math.sqrt(qv.map(x => x * x).sum) * math.sqrt(nv.map(x => x * x).sum))
        if s >= tau
      } yield (qid, nid)).toSet
    val idxVecs = indexed.collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val shardVecs = shard.collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toSeq
    val want = brute(idxVecs, shardVecs, 0.8)
    assert(want.nonEmpty, "degenerate fixture: no cross pairs to find")
    def got() = IvfIndex.nearDupsExact(spark, idx, indexed, shard, tau = 0.8)
      .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got() == want, "nearDupsExact diverged from brute force after append")
    // tombstone delete: radii go stale (upper bounds) — results must
    // still be EXACT against the remaining corpus
    val dropped = indexed.filter(pmod(col("id"), lit(5)) === 0).select("id")
    IvfIndex.deleteInPlace(spark, idx, dropped)
    val remainingVecs = idxVecs.view.filterKeys(_ % 5 != 0).toMap
    val wantAfter = brute(remainingVecs, shardVecs, 0.8)
    val gotAfter = IvfIndex.nearDupsExact(spark, idx,
        indexed.filter(pmod(col("id"), lit(5)) =!= 0), shard, tau = 0.8)
      .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(gotAfter == wantAfter,
      "nearDupsExact lost exactness under stale post-delete radii")
    assert(wantAfter != want, "delete removed no relevant pair — the staleness case is untested")
  }

  test("a probe's encoded scan is partition-pruned to the probed cells") {
    val corpus = embsDf
    val centroids = AnnSearch.kmeansCentroidsExact(corpus, 15, iters = 2)
    val book = AnnSearch.pqBook(corpus, m = 32, stride = 10)
    val idx = graft.util.TempDirs.scratch("ivf_prune_spec").toString
    IvfIndex.build(corpus, centroids, book, idx)
    val perCell = IvfIndex.loadEncoded(spark, idx)
      .groupBy("cell").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(perCell.size >= 4, s"fixture produced too few cells (${perCell.size}) to prove pruning")
    val probed = perCell.keys.toSeq.sorted.take(2)
    val df = IvfIndex.probedEncoded(spark, idx, probed)
    df.collect()
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case s: FileSourceScanExec    => Seq(s)
      case other                    => other.children.flatMap(scans)
    }
    val scan = scans(df.queryExecution.executedPlan)
    assert(scan.nonEmpty, s"no parquet scan in:\n${df.queryExecution.executedPlan}")
    // the cell filter must land as a PARTITION filter (directory-level
    // pruning), not a post-read data filter
    assert(scan.head.metadata.getOrElse("PartitionFilters", "").contains("cell"),
      s"cell filter not applied at partition level: ${scan.head.metadata}")
    val read = scan.map(_.metrics("numOutputRows").value).sum
    val want = probed.map(perCell).sum
    val total = perCell.values.sum
    assert(read === want,
      s"scan materialized $read rows; probed cells hold $want of $total — pruning failed")
    assert(want < total, "probe set unexpectedly covers the whole corpus")

    // the SNAPSHOT path reads an explicit committed-file list (via
    // basePath) — partition pruning must survive that shape too, or
    // every concurrent-safe probe silently scans the whole index
    val snap = Some(graft.util.TableIndex.openSnapshot(spark, idx))
    val sdf = IvfIndex.probedEncoded(spark, idx, probed, snap)
    sdf.collect()
    val sscan = scans(sdf.queryExecution.executedPlan)
    assert(sscan.nonEmpty, s"no parquet scan in:\n${sdf.queryExecution.executedPlan}")
    assert(sscan.head.metadata.getOrElse("PartitionFilters", "").contains("cell"),
      s"snapshot read lost directory-level pruning: ${sscan.head.metadata}")
    val sread = sscan.map(_.metrics("numOutputRows").value).sum
    assert(sread === want,
      s"snapshot scan materialized $sread rows; probed cells hold $want — pruning failed")
  }
}
