package graft

import graft.ml.{AnnSearch, IvfIndex}
import graft.text.IncrementalDedup
import graft.util.TableIndex
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The persisted indexes' durability contracts: crash-consistent
  * multi-table commits (kill-replay ≡ clean run), idempotent batch
  * replay, the enforced tombstone re-append guard, distributed
  * compaction, geometry refresh after churn, and the legacy/partial-
  * geometry π fallback. */
class TableIndexSpec extends SparkSpec {

  private def docsDf: DataFrame =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  private def tableRows(path: String): Seq[String] =
    spark.read.parquet(path).collect().map(_.toString).sorted.toSeq

  private def parquetFiles(path: String): Seq[java.io.File] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    val root = new java.io.File(path)
    if (!root.exists()) Seq.empty else walk(root).filter(_.getName.endsWith(".parquet"))
  }

  /** Simulate a mid-append crash: some of the batch's files already
    * moved live (bid-prefixed), the staging record present, NO commit
    * marker — the exact on-disk state a kill between table writes
    * leaves behind. */
  private def tearBatch(indexDir: String, bid: String, table: String, rows: DataFrame): Unit = {
    val tmp = graft.util.TempDirs.scratch("torn_rows").toString + "/t"
    rows.write.mode("overwrite").parquet(tmp)
    new java.io.File(s"$indexDir/_staging/$bid").mkdirs()
    val part = parquetFiles(tmp).head
    val dst = new java.io.File(s"$indexDir/$table/b_${bid}__${part.getName}")
    dst.getParentFile.mkdirs()
    assert(part.renameTo(dst), "test setup: could not plant the torn file")
  }

  test("dedup index kill-replay: a torn append rolls back and the redo equals the clean run") {
    val d = docsDf
    val old = d.filter(pmod(col("doc_id"), lit(4)) =!= 0)
    val shard = d.filter(pmod(col("doc_id"), lit(4)) === 0)
    val clean = graft.util.TempDirs.scratch("ti_clean").toString
    val torn = graft.util.TempDirs.scratch("ti_torn").toString
    IncrementalDedup.buildIndex(old, "doc_id", "text", clean)
    IncrementalDedup.buildIndex(old, "doc_id", "text", torn)
    val bid = "s_killreplay_0001"
    IncrementalDedup.updateIndexInPlace(spark, clean, shard, "doc_id", "text", batchId = Some(bid))
    // crash mid-append on the torn index: hashes moved live, the other
    // three tables never written, no marker
    // only a SLICE of the shard's hash rows landed before the kill —
    // the torn raw state must differ from BOTH the pre-append and the
    // clean post-append tables
    tearBatch(torn, bid,
      "hashes.parquet",
      shard.limit(7).select(col("doc_id").cast("long").as("id"),
        xxhash64(graft.text.TextOps.normText(col("text"))).as("h")))
    // the torn rows are visible to a RAW read but must never reach a
    // protocol reader: processShard repairs first
    assert(tableRows(s"$torn/hashes.parquet") != tableRows(s"$clean/hashes.parquet"),
      "test setup: the tear left no observable partial state")
    // replay the batch (what a restarted stream does)
    IncrementalDedup.updateIndexInPlace(spark, torn, shard, "doc_id", "text", batchId = Some(bid))
    for (t <- Seq("hashes", "sigs", "bands", "shingles")) {
      assert(tableRows(s"$torn/$t.parquet") == tableRows(s"$clean/$t.parquet"),
        s"table $t after kill-replay diverged from the clean run")
    }
  }

  test("dedup index replayed batch id is skipped: double append adds nothing") {
    val d = docsDf
    val old = d.filter(pmod(col("doc_id"), lit(4)) =!= 0)
    val shard = d.filter(pmod(col("doc_id"), lit(4)) === 0)
    val idx = graft.util.TempDirs.scratch("ti_replay").toString
    IncrementalDedup.buildIndex(old, "doc_id", "text", idx)
    val bid = "s_replay_0001"
    IncrementalDedup.updateIndexInPlace(spark, idx, shard, "doc_id", "text", batchId = Some(bid))
    val after = tableRows(s"$idx/hashes.parquet")
    IncrementalDedup.updateIndexInPlace(spark, idx, shard, "doc_id", "text", batchId = Some(bid))
    assert(tableRows(s"$idx/hashes.parquet") == after,
      "a replayed committed batch duplicated index rows")
  }

  private def embsDf = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    .select(col("vec_id").as("id"), expr("transform(embedding, x -> cast(x as double))").as("vec"))

  test("ivf index kill-replay: torn encoded-only append rolls back; redo equals clean; replay skipped") {
    val all = embsDf
    val old = all.filter(pmod(col("id"), lit(7)) =!= 0)
    val fresh = all.filter(pmod(col("id"), lit(7)) === 0)
    val centroids = AnnSearch.kmeansCentroidsExact(old, 15, iters = 2)
    val book = AnnSearch.pqBook(old, m = 32, stride = 10)
    val clean = graft.util.TempDirs.scratch("ti_ivf_clean").toString
    val torn = graft.util.TempDirs.scratch("ti_ivf_torn").toString
    IvfIndex.build(old, centroids, book, clean)
    IvfIndex.build(old, centroids, book, torn)
    val bid = "s_ivf_kill_0001"
    IvfIndex.appendInPlace(spark, clean, fresh, batchId = Some(bid))
    // crash state: a slice of the shard's encoded rows moved live
    // (under one cell dir), geometry rows absent, no marker — exactly
    // the tear that would break the triangle bound if it were visible
    tearBatch(torn, bid, "encoded.parquet/cell=0",
      fresh.limit(3).select(col("id").as("n_id"), lit(Array[Byte](0, 0)).as("codes"),
        lit(1.0).as("n_norm")))
    IvfIndex.appendInPlace(spark, torn, fresh, batchId = Some(bid))
    def norm(p: String) = tableRows(p)
    assert(norm(s"$torn/encoded.parquet") == norm(s"$clean/encoded.parquet"),
      "encoded rows after kill-replay diverged from the clean run")
    assert(norm(s"$torn/geometry.parquet") == norm(s"$clean/geometry.parquet"),
      "geometry rows after kill-replay diverged from the clean run")
    // replaying the committed id is a no-op
    IvfIndex.appendInPlace(spark, torn, fresh, batchId = Some(bid))
    assert(norm(s"$torn/encoded.parquet") == norm(s"$clean/encoded.parquet"),
      "a replayed committed batch duplicated encoded rows")
  }

  test("re-appending a tombstoned id throws until the index is compacted (both indexes)") {
    import spark.implicits._
    val old = Seq((1L, "some document body kept in the index for a while"),
      (2L, "another unrelated body of text entirely")).toDF("doc_id", "text")
    val idx = graft.util.TempDirs.scratch("ti_tomb_guard").toString
    IncrementalDedup.buildIndex(old, "doc_id", "text", idx)
    IncrementalDedup.deleteInPlace(spark, idx, Seq(1L).toDF("id"))
    val again = Seq((1L, "a new life for a previously deleted id")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      IncrementalDedup.updateIndexInPlace(spark, idx, again, "doc_id", "text")
    }
    // after the compact fold the id space is free again
    val folded = graft.util.TempDirs.scratch("ti_tomb_guard_folded").toString
    IncrementalDedup.compactIndex(spark, idx, folded)
    IncrementalDedup.updateIndexInPlace(spark, folded, again, "doc_id", "text")
    assert(spark.read.parquet(s"$folded/hashes.parquet").filter(col("id") === 1L).count() == 1)

    val vecs = embsDf.limit(40)
    val centroids = AnnSearch.kmeansCentroidsExact(vecs, 5, iters = 1)
    val book = AnnSearch.pqBook(vecs, m = 32, stride = 3)
    val ivf = graft.util.TempDirs.scratch("ti_tomb_guard_ivf").toString
    IvfIndex.build(vecs, centroids, book, ivf)
    IvfIndex.deleteInPlace(spark, ivf, vecs.limit(2).select("id"))
    intercept[IllegalArgumentException] {
      IvfIndex.appendInPlace(spark, ivf, vecs.limit(1))
    }
  }

  test("ivf generation-copy append is a tombstone fold point: deleted vectors do not resurrect") {
    import spark.implicits._
    val all = embsDf
    val old = all.filter(pmod(col("id"), lit(7)) =!= 0)
    val fresh = all.filter(pmod(col("id"), lit(7)) === 0)
    val centroids = AnnSearch.kmeansCentroidsExact(old, 15, iters = 2)
    val book = AnnSearch.pqBook(old, m = 32, stride = 10)
    val gen1 = graft.util.TempDirs.scratch("ti_fold_gen1").toString
    IvfIndex.build(old, centroids, book, gen1)
    val dropped = old.filter(pmod(col("id"), lit(3)) === 0).select("id")
    IvfIndex.deleteInPlace(spark, gen1, dropped)
    val gen2 = graft.util.TempDirs.scratch("ti_fold_gen2").toString
    IvfIndex.append(spark, gen1, fresh, gen2)
    assert(!new java.io.File(s"$gen2/tombstones.parquet").exists(),
      "generation copy carried the tombstone table forward")
    val droppedIds = dropped.as[Long].collect().toSet
    val gen2Ids = spark.read.parquet(s"$gen2/encoded.parquet")
      .select("n_id").as[Long].collect().toSet
    assert(droppedIds.nonEmpty && droppedIds.forall(!gen2Ids.contains(_)),
      "generation copy resurrected tombstoned vectors")
    // rows == rebuild over (live old ∪ fresh)
    val rebuilt = graft.util.TempDirs.scratch("ti_fold_rebuilt").toString
    IvfIndex.build(old.filter(pmod(col("id"), lit(3)) =!= 0).unionByName(fresh),
      centroids, book, rebuilt)
    assert(tableRows(s"$gen2/encoded.parquet") == tableRows(s"$rebuilt/encoded.parquet"),
      "folded generation encoded rows diverged from the rebuild over live vectors")
  }

  test("compactIndex rewrites the corpus tables distributed: >1 files and >1 write tasks per table") {
    val d = docsDf
    val idx = graft.util.TempDirs.scratch("ti_compact").toString
    IncrementalDedup.buildIndex(d, "doc_id", "text", idx)
    import spark.implicits._
    IncrementalDedup.deleteInPlace(spark, idx,
      d.select(col("doc_id").cast("long").as("id")).limit(5))
    val out = graft.util.TempDirs.scratch("ti_compact_out").toString
    IncrementalDedup.compactIndex(spark, idx, out)
    for (t <- Seq("hashes", "sigs", "shingles")) {
      val files = parquetFiles(s"$out/$t.parquet")
      // a single-task funnel (the pre-r12 coalesce(1)) produces exactly
      // one file; the size-targeted repartition writes one per
      // non-empty shuffle partition — the 100 TB-survivable shape
      assert(files.size > 1,
        s"compacted $t.parquet written by a single task (${files.size} file)")
    }
    // rows ≡ rebuild-over-remaining is pinned by IncrementalDedupSpec;
    // re-assert here on the multi-file layout to tie the two together
    val rebuilt = graft.util.TempDirs.scratch("ti_compact_rebuilt").toString
    val removed = d.select(col("doc_id").cast("long").as("id")).limit(5)
    IncrementalDedup.buildIndex(
      d.join(removed.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left_anti"),
      "doc_id", "text", rebuilt)
    assert(tableRows(s"$out/hashes.parquet") == tableRows(s"$rebuilt/hashes.parquet"),
      "distributed compaction changed the surviving rows")
  }

  /** Two clusters 45° apart in dim 8; cluster 0 carries two OUTLIERS
    * rotated 30° off its centroid AWAY from cluster 1 (so they stay
    * assigned to cell 0 — 75° from c1 — while inflating cell 0's
    * angular radius to ~0.52 rad). With θ(τ=0.9) ≈ 0.45 the stale
    * triangle bound 0.785 ≤ r₀ + θτ then makes cell 0 a candidate for
    * every cluster-1 query; the refreshed tight radius (~0.1) prunes
    * it. Deterministic (id-keyed trig noise). */
  private def clusteredFixture: (DataFrame, DataFrame) = {
    import spark.implicits._
    val dim = 8
    val inv = 1.0 / math.sqrt(2.0)
    val c0 = Array.tabulate(dim)(i => if (i == 0) 1.0 else 0.0)
    val c1 = Array.tabulate(dim)(i => if (i == 0 || i == 1) inv else 0.0)
    val out = Array.tabulate(dim)(i =>
      if (i == 0) math.cos(math.Pi / 6) else if (i == 1) -math.sin(math.Pi / 6) else 0.0)
    val rows = (0L until 60L).map { id =>
      // 40%3=1, 44%3=2: both outliers land in the indexed generation
      val base = if (id == 40L || id == 44L) out else if (id % 2 == 0) c0 else c1
      val noise = if (id == 40L || id == 44L) 0.002 else 0.05
      val v = base.indices.map(i => base(i) + noise * math.sin(id * 13.7 + i * 2.1)).toArray
      (id, v)
    }
    val corpus = rows.toDF("id", "vec")
    val cents = Seq((0L, c0.toSeq), (1L, c1.toSeq)).toDF("c_id", "c_vec")
    (corpus, cents)
  }

  test("refreshGeometry re-tightens post-delete radii: candidates shrink, exactness carries") {
    import spark.implicits._
    val (corpus, cents) = clusteredFixture
    val indexed = corpus.filter(pmod(col("id"), lit(3)) =!= 0)
    val shard = corpus.filter(pmod(col("id"), lit(3)) === 0)
    val book = AnnSearch.pqBook(indexed, m = 8, stride = 2)
    val idx = graft.util.TempDirs.scratch("ti_geo").toString
    IvfIndex.build(indexed, cents, book, idx)
    // take down the outliers (both in the indexed generation)
    IvfIndex.deleteInPlace(spark, idx, Seq(40L, 44L).toDF("id"))
    val remaining = indexed.filter(!col("id").isin(40L, 44L))
    def maxRadius(): Double = spark.read.parquet(s"$idx/geometry.parquet")
      .agg(max("r")).collect()(0).getDouble(0)
    def candCells(): Long =
      IvfIndex.candidateCells(spark, idx, shard, tau = 0.9).count()
    def brute(tau: Double): Set[(Long, Long)] = {
      val vs = remaining.collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
      val qs = shard.collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
      (for {
        (qid, qv) <- qs; (nid, nv) <- vs if qid != nid
        d = qv.indices.map(i => qv(i) * nv(i)).sum
        s = d / (math.sqrt(qv.map(x => x * x).sum) * math.sqrt(nv.map(x => x * x).sum))
        if s >= 0.9
      } yield (qid, nid)).toSet
    }
    def got(): Set[(Long, Long)] =
      IvfIndex.nearDupsExact(spark, idx, remaining, shard, tau = 0.9)
        .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val staleR = maxRadius()
    val staleCand = candCells()
    val want = brute(0.9)
    assert(want.nonEmpty, "degenerate fixture: no near pairs at tau=0.9")
    assert(got() == want, "nearDupsExact wrong under stale radii")
    IvfIndex.refreshGeometry(spark, idx, remaining)
    assert(maxRadius() < staleR,
      s"refresh did not tighten the outlier-inflated radius ($staleR -> ${maxRadius()})")
    assert(candCells() < staleCand,
      s"refresh did not shrink the candidate cell set ($staleCand -> ${candCells()})")
    assert(got() == want, "nearDupsExact wrong after refreshGeometry")
  }

  test("floats-bearing index is self-contained: no corpus scan, lifecycle carries floats, scan pruned") {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import spark.implicits._
    val (corpus, cents) = clusteredFixture
    val gen1 = corpus.filter(pmod(col("id"), lit(3)) === 1)
    val gen2 = corpus.filter(pmod(col("id"), lit(3)) === 2)
    val shard = corpus.filter(pmod(col("id"), lit(3)) === 0)
    val book = AnnSearch.pqBook(gen1, m = 8, stride = 2)
    val idx = graft.util.TempDirs.scratch("ti_floats").toString
    IvfIndex.build(gen1, cents, book, idx, storeFloats = true)
    IvfIndex.appendInPlace(spark, idx, gen2) // floats must ride the same commit
    val emptyCorpus = Seq.empty[(Long, Array[Double])].toDF("id", "vec")
    def brute(liveIds: Long => Boolean): Set[(Long, Long)] = {
      val vs = corpus.collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
        .filter { case (id, _) => id % 3 != 0 && liveIds(id) }.toMap
      val qs = shard.collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
      (for {
        (qid, qv) <- qs; (nid, nv) <- vs if qid != nid
        d = qv.indices.map(i => qv(i) * nv(i)).sum
        s = d / (math.sqrt(qv.map(x => x * x).sum) * math.sqrt(nv.map(x => x * x).sum))
        if s >= 0.9
      } yield (qid, nid)).toSet
    }
    // the corpus argument is IGNORED: exact answers from the index alone
    val got = IvfIndex.nearDupsExact(spark, idx, emptyCorpus, shard, tau = 0.9)
    val gotSet = got.select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(gotSet == brute(_ => true),
      "floats-bearing nearDupsExact with an empty corpus diverged from brute force")
    assert(gotSet.nonEmpty)
    // the float scan is partition-pruned by the candidate cells
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => scans(q.plan)
      case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => scans(r.child)
      case s: FileSourceScanExec    => Seq(s)
      case other                    => other.children.flatMap(scans)
    }
    val floatScans = scans(got.queryExecution.executedPlan)
      .filter(_.metadata.getOrElse("Location", "").contains("floats.parquet"))
    assert(floatScans.nonEmpty, "no floats.parquet scan in the self-contained probe")
    assert(floatScans.forall(_.metadata.getOrElse("PartitionFilters", "").contains("cell")),
      s"float scan not partition-pruned: ${floatScans.map(_.metadata)}")
    // tombstones apply to the float path too
    IvfIndex.deleteInPlace(spark, idx, Seq(40L).toDF("id")) // indexed outlier (40 % 3 == 1)
    val gotAfter = IvfIndex.nearDupsExact(spark, idx, emptyCorpus, shard, tau = 0.9)
      .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(gotAfter == brute(_ != 40L),
      "tombstone not applied on the float path")
    // search: self-contained result == a plain index's corpus-backed result
    val plain = graft.util.TempDirs.scratch("ti_floats_plain").toString
    IvfIndex.build(gen1, cents, book, plain)
    IvfIndex.appendInPlace(spark, plain, gen2)
    IvfIndex.deleteInPlace(spark, plain, Seq(40L).toDF("id"))
    val indexed = gen1.unionByName(gen2).filter(col("id") =!= 40L)
    def rowsOf(df: org.apache.spark.sql.DataFrame) = df.collect().map(_.toString).sorted.toSeq
    assert(
      rowsOf(IvfIndex.search(spark, idx, emptyCorpus, shard, k = 3, nprobe = 2, shortlist = 20)) ==
        rowsOf(IvfIndex.search(spark, plain, indexed, shard, k = 3, nprobe = 2, shortlist = 20)),
      "self-contained search diverged from the corpus-backed search")
    // compact carries the float table (rows identical, tombstones folded)
    val folded = graft.util.TempDirs.scratch("ti_floats_folded").toString
    IvfIndex.compact(spark, idx, folded)
    val foldedFloats = spark.read.parquet(s"$folded/floats.parquet")
      .select("n_id").as[Long].collect().toSet
    assert(!foldedFloats.contains(40L) && foldedFloats.nonEmpty,
      "compaction lost or failed to fold the float table")
  }

  /** Drift fixture for [[IvfIndex.recluster]]: clusters A (e0) and B
    * ((e0+e1)/√2) are the TRAINED generation; cluster C (e2,
    * orthogonal to both) arrives later — its members assign ~90° from
    * whichever centroid wins the noise, inflating that cell's radius
    * toward π/2, so C-directed queries stop pruning anything. Ids laid
    * out so stride-20 reclustering seeds one member of each cluster. */
  private def driftFixture: (DataFrame, DataFrame, DataFrame) = {
    import spark.implicits._
    val dim = 8
    val inv = 1.0 / math.sqrt(2.0)
    def base(id: Long): Array[Double] =
      if (id < 20) Array.tabulate(dim)(i => if (i == 0) 1.0 else 0.0)
      else if (id < 40) Array.tabulate(dim)(i => if (i == 0 || i == 1) inv else 0.0)
      else Array.tabulate(dim)(i => if (i == 2) 1.0 else 0.0)
    def noisy(id: Long, b: Array[Double]): Array[Double] =
      b.indices.map(i => b(i) + 0.05 * math.sin(id * 13.7 + i * 2.1)).toArray
    val corpus = (0L until 60L).map(id => (id, noisy(id, base(id)))).toDF("id", "vec")
    val queries = (100L until 106L).map(id =>
      (id, noisy(id, Array.tabulate(dim)(i => if (i == 2) 1.0 else 0.0)))).toDF("id", "vec")
    val cents = Seq(
      (0L, Array.tabulate(dim)(i => if (i == 0) 1.0 else 0.0).toSeq),
      (1L, Array.tabulate(dim)(i => if (i == 0 || i == 1) inv else 0.0).toSeq)).toDF("c_id", "c_vec")
    (corpus, queries, cents)
  }

  test("recluster restores centroid placement after drifted appends: pruning recovers, exactness carries") {
    val (corpus, queries, cents) = driftFixture
    val gen1 = corpus.filter(col("id") < 40)   // clusters A, B — what the centroids fit
    val drift = corpus.filter(col("id") >= 40) // cluster C — orthogonal to both centroids
    val book = AnnSearch.pqBook(gen1, m = 8, stride = 2)
    val idx = graft.util.TempDirs.scratch("recl_idx").toString
    IvfIndex.build(gen1, cents, book, idx)
    IvfIndex.appendInPlace(spark, idx, drift)
    def brute(): Set[(Long, Long)] = {
      val vs = corpus.collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
      val qs = queries.collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
      (for {
        (qid, qv) <- qs; (nid, nv) <- vs
        d = qv.indices.map(i => qv(i) * nv(i)).sum
        s = d / (math.sqrt(qv.map(x => x * x).sum) * math.sqrt(nv.map(x => x * x).sum))
        if s >= 0.9
      } yield (qid, nid)).toSet
    }
    def got(dir: String): Set[(Long, Long)] =
      IvfIndex.nearDupsExact(spark, dir, corpus, queries, tau = 0.9)
        .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = brute()
    assert(want.nonEmpty, "degenerate fixture: C queries found no near-dups")
    // exactness is UNCONDITIONAL — it must hold on the drifted index too
    assert(got(idx) == want, "nearDupsExact wrong on the drifted index")
    val staleCand = IvfIndex.candidateCells(spark, idx, queries, tau = 0.9).count()
    // recluster: stride 20 seeds ids 0 (A), 20 (B), 40 (C)
    val recl = graft.util.TempDirs.scratch("recl_out").toString
    IvfIndex.recluster(spark, idx, corpus, recl, stride = 20, iters = 2)
    val reclCand = IvfIndex.candidateCells(spark, recl, queries, tau = 0.9).count()
    assert(reclCand < staleCand,
      s"recluster did not restore pruning (candidate pairs $staleCand -> $reclCand)")
    assert(reclCand == queries.count(),
      s"reclustered index should candidate exactly the C cell per query (got $reclCand)")
    assert(got(recl) == want, "nearDupsExact wrong after recluster")
    // recluster ≡ build over the live corpus with the retrained tables
    val direct = graft.util.TempDirs.scratch("recl_direct").toString
    IvfIndex.build(corpus, AnnSearch.kmeansCentroidsExact(corpus, 20, 2), book, direct)
    for (t <- Seq("encoded", "geometry", "centroids"))
      assert(tableRows(s"$recl/$t.parquet") == tableRows(s"$direct/$t.parquet"),
        s"reclustered $t diverged from the direct rebuild")
    // tombstones FOLD through a recluster (it rewrites from live rows)
    import spark.implicits._
    IvfIndex.deleteInPlace(spark, idx, Seq(41L).toDF("id"))
    val recl2 = graft.util.TempDirs.scratch("recl_tomb").toString
    IvfIndex.recluster(spark, idx, corpus, recl2, stride = 20, iters = 2)
    assert(!new java.io.File(s"$recl2/tombstones.parquet").exists(),
      "recluster carried the tombstone table forward")
    assert(got(recl2) == want.filter(_._2 != 41L), "tombstone leaked through recluster")
    // retrainBook: exactness carries with a refitted codebook too (PQ
    // codes re-key; the exact re-rank contract is book-independent)
    val reclBook = graft.util.TempDirs.scratch("recl_book").toString
    IvfIndex.recluster(spark, idx, corpus, reclBook, stride = 20, iters = 2,
      retrainBook = true, bookStride = 2)
    assert(got(reclBook) == want.filter(_._2 != 41L),
      "nearDupsExact wrong after recluster with a retrained codebook")
  }

  test("geometry is an accelerator, never a gate: a geometry-less index stays exact (pi fallback)") {
    import spark.implicits._
    val (corpus, cents) = clusteredFixture
    val indexed = corpus.filter(pmod(col("id"), lit(3)) =!= 0)
    val shard = corpus.filter(pmod(col("id"), lit(3)) === 0)
    val book = AnnSearch.pqBook(indexed, m = 8, stride = 2)
    val idx = graft.util.TempDirs.scratch("ti_nogeo").toString
    IvfIndex.build(indexed, cents, book, idx)
    // simulate a pre-geometry legacy index / the refresh crash window
    def rmrf(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rmrf); f.delete(); ()
    }
    rmrf(new java.io.File(s"$idx/geometry.parquet"))
    val vs = indexed.collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val qs = shard.collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
    val want = (for {
      (qid, qv) <- qs; (nid, nv) <- vs if qid != nid
      d = qv.indices.map(i => qv(i) * nv(i)).sum
      s = d / (math.sqrt(qv.map(x => x * x).sum) * math.sqrt(nv.map(x => x * x).sum))
      if s >= 0.9
    } yield (qid, nid)).toSet
    val got = IvfIndex.nearDupsExact(spark, idx, indexed, shard, tau = 0.9)
      .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want, "geometry-less index lost exactness (pi fallback broken)")
    // and maintenance ops on the geometry-less index must not throw
    val out = graft.util.TempDirs.scratch("ti_nogeo_compact").toString
    IvfIndex.compact(spark, idx, out)
    assert(tableRows(s"$out/encoded.parquet") == tableRows(s"$idx/encoded.parquet"))
  }

  test("probe banding comes from index metadata: a mismatched caller parameter changes nothing") {
    val d = docsDf
    val old = d.filter(pmod(col("doc_id"), lit(4)) =!= 0)
    val shard = d.filter(pmod(col("doc_id"), lit(4)) === 0)
    val idx = graft.util.TempDirs.scratch("ti_meta").toString
    IncrementalDedup.buildIndex(old, "doc_id", "text", idx, k = 32, n = 3, bands = 8)
    def rows(df: DataFrame) = df.collect().map(_.toString).sorted.toSeq
    val right = rows(IncrementalDedup.processShard(spark, idx, shard, "doc_id", "text",
      tau = 0.8, k = 32, bands = 8, n = 3))
    // pre-r12 this silently mis-keyed the (band, bucket) join and lost
    // near-dup candidates; now the index metadata wins
    val mismatched = rows(IncrementalDedup.processShard(spark, idx, shard, "doc_id", "text",
      tau = 0.8, k = 16, bands = 4, n = 2))
    assert(mismatched == right,
      "a caller's mismatched banding parameters leaked past the index metadata")
  }

  test("ivf compact splits a HOT cell across multiple write tasks/files") {
    import spark.implicits._
    val dim = 8
    // 90% of vectors in cell 0 — the skewed-semantic-cluster shape the
    // pre-r14 repartition(col("cell")) serialized into ONE task forever
    val rows = (0L until 200L).map { id =>
      val base = if (id < 180) 0 else 1
      val v = Array.tabulate(dim)(i =>
        (if (i == base) 1.0 else 0.0) + (if (i == 7) 0.001 * (id % 17) else 0.0))
      (id, v)
    }
    val corpus = rows.toDF("id", "vec")
    val centroids = Seq(
      (0L, Array.tabulate(dim)(i => if (i == 0) 1.0 else 0.0).toSeq),
      (1L, Array.tabulate(dim)(i => if (i == 1) 1.0 else 0.0).toSeq)).toDF("c_id", "c_vec")
    val book = AnnSearch.pqBook(corpus, m = 2, stride = 3)
    val idx = graft.util.TempDirs.scratch("ti_skew_ivf").toString
    IvfIndex.build(corpus, centroids, book, idx)
    IvfIndex.deleteInPlace(spark, idx, Seq(5L, 6L).toDF("id"))
    val out = graft.util.TempDirs.scratch("ti_skew_ivf_out").toString
    IvfIndex.compact(spark, idx, out)
    // each write task emits at most one file per partition directory,
    // so >1 files under the hot cell == >1 write tasks rewrote it —
    // the range repartition on (cell, n_id) splits the hot key by id
    val hotFiles = parquetFiles(s"$out/encoded.parquet/cell=0")
    assert(hotFiles.size > 1,
      s"hot cell rewritten by a single task (${hotFiles.size} file) — the " +
        "partition-value-bounded funnel is back")
    // rows ≡ rebuild-over-remaining, unchanged by the parallel layout
    val rebuilt = graft.util.TempDirs.scratch("ti_skew_ivf_rebuilt").toString
    IvfIndex.build(corpus.filter(!col("id").isin(5L, 6L)), centroids, book, rebuilt)
    assert(tableRows(s"$out/encoded.parquet") == tableRows(s"$rebuilt/encoded.parquet"),
      "skew-parallel compaction changed the surviving encoded rows")
  }

  test("dedup compactIndex splits a HOT band partition across multiple write tasks/files") {
    import spark.implicits._
    // 5,000 verbatim-identical docs: one signature, so with bands = 2
    // the band table concentrates its rows in ≤2 (band, bucket) keys —
    // a deliberately hot bp. The count matters: salt widths derive
    // from per-directory BYTES, and at tiny scale parquet's per-file
    // metadata floor (~1 KB) swamps the data — 5k distinct ids make
    // the hot directories byte-dominant the way any real corpus's are
    val docs = (0L until 5010L).map { id =>
      val text =
        if (id < 5000L) "the same exact document body repeated verbatim across the corpus many times"
        else s"unique filler document number $id with entirely different words ${id * 7} here"
      (id, text)
    }.toDF("doc_id", "text")
    val idx = graft.util.TempDirs.scratch("ti_skew_bands").toString
    IncrementalDedup.buildIndex(docs, "doc_id", "text", idx, bands = 2)
    IncrementalDedup.deleteInPlace(spark, idx, Seq(0L).toDF("id"))
    val out = graft.util.TempDirs.scratch("ti_skew_bands_out").toString
    IncrementalDedup.compactIndex(spark, idx, out)
    val bpDirs = new java.io.File(s"$out/bands.parquet").listFiles()
      .filter(d => d.isDirectory && d.getName.startsWith("bp="))
    assert(bpDirs.nonEmpty, "no bp partition directories after compaction")
    val hot = bpDirs.map(d => parquetFiles(d.getPath).size).max
    assert(hot > 1,
      s"hot bp rewritten by a single task ($hot file) — the BandParts-bounded funnel is back")
    val rebuilt = graft.util.TempDirs.scratch("ti_skew_bands_rebuilt").toString
    IncrementalDedup.buildIndex(docs.filter(col("doc_id") =!= 0L), "doc_id", "text",
      rebuilt, bands = 2)
    assert(tableRows(s"$out/bands.parquet") == tableRows(s"$rebuilt/bands.parquet"),
      "skew-parallel band compaction changed the surviving rows")
  }

  test("auto-fold cadence survives writer-JVM turnover (persisted _fold_count)") {
    import spark.implicits._
    val dir = graft.util.TempDirs.scratch("ti_cadence").toString
    // the counter is _commits/_fold_count, not process memory — each
    // loop iteration stands in for a fresh one-commit writer JVM (the
    // hourly-cron cadence that never reaches 32 in-process commits)
    for (i <- 1 to TableIndex.AutoFoldEvery + 3)
      TableIndex.commitBatch(spark, dir, f"cad$i%04d",
        Seq(("t.parquet", Seq((i.toLong, i.toString)).toDF("id", "v"), Seq.empty)))
    val entries = new java.io.File(s"$dir/_commits").listFiles().map(_.getName)
    assert(entries.exists(_.startsWith("_base.")),
      "no base checkpoint after AutoFoldEvery single-commit writers — _commits unbounded")
    val markers = entries.filterNot(n => n.startsWith("_") || n.startsWith("."))
    assert(markers.length < TableIndex.AutoFoldEvery,
      s"markers not folded (${markers.length} remain)")
    // nothing un-commits: every bid still resolves, folded or not
    assert(TableIndex.committedBids(spark, dir).size == TableIndex.AutoFoldEvery + 3)
    assert(TableIndex.isCommitted(spark, dir, "cad0001"))
  }

  test("replaceTable feeds the same fold cadence") {
    import spark.implicits._
    val dir = graft.util.TempDirs.scratch("ti_cadence_repl").toString
    for (i <- 1 to TableIndex.AutoFoldEvery + 1)
      TableIndex.replaceTable(spark, dir, f"rep$i%04d", "t.parquet",
        Seq((i.toLong, i.toString)).toDF("id", "v"))
    val entries = new java.io.File(s"$dir/_commits").listFiles().map(_.getName)
    assert(entries.exists(_.startsWith("_base.")),
      "a geometry-refresh-heavy cadence never folded — replaceTable bypasses the bound")
    assert(TableIndex.committedBids(spark, dir).size == TableIndex.AutoFoldEvery + 1)
  }

  test("wipe + rebuild at the same path serves the NEW generation's folded bids") {
    import spark.implicits._
    val dir = graft.util.TempDirs.scratch("ti_cache_gen").toString
    TableIndex.commitBatch(spark, dir, "gen1a",
      Seq(("t.parquet", Seq((1L, "a")).toDF("id", "v"), Seq.empty)))
    TableIndex.checkpointCommits(spark, dir) // _base.…001 caches {gen1a}
    assert(TableIndex.committedBids(spark, dir) == Set("gen1a"))
    TableIndex.wipe(spark, dir)
    // rebuild at the SAME path: base versioning restarts at _base.…001 —
    // the same qualified path, a different generation's bids. A stale
    // cache here hid new commits from snapshot readers and let replayed
    // bids re-append rows (the r13 ADVICE high).
    TableIndex.commitBatch(spark, dir, "gen2a",
      Seq(("t.parquet", Seq((2L, "b")).toDF("id", "v"), Seq.empty)))
    TableIndex.checkpointCommits(spark, dir)
    assert(TableIndex.committedBids(spark, dir) == Set("gen2a"),
      "stale cached base bids served for the rebuilt generation")
    assert(!TableIndex.isCommitted(spark, dir, "gen1a"))
    assert(TableIndex.isCommitted(spark, dir, "gen2a"))
    // and a replay-guarded append under a fresh bid still lands
    assert(TableIndex.commitBatch(spark, dir, "gen2b",
      Seq(("t.parquet", Seq((3L, "c")).toDF("id", "v"), Seq.empty))))
  }

  test("repair tolerates invalid-named staging entries (restore damage / foreign writer)") {
    import spark.implicits._
    val dir = graft.util.TempDirs.scratch("ti_badstage").toString
    TableIndex.commitBatch(spark, dir, "good1",
      Seq(("t.parquet", Seq((1L, "a")).toDF("id", "v"), Seq.empty)))
    for (bad <- Seq("__rollback_alias", "_leadunder", "has space")) {
      val f = new java.io.File(s"$dir/_staging/$bad")
      f.mkdirs()
      java.nio.file.Files.writeString(f.toPath.resolve("junk.txt"), "x")
    }
    TableIndex.repair(spark, dir) // pre-r14: threw IllegalArgumentException from every read
    assert(!new java.io.File(s"$dir/_staging").exists(), "staging junk not swept")
    assert(spark.read.parquet(s"$dir/t.parquet").count() == 1,
      "repair of foreign staging entries damaged committed data")
  }
}
