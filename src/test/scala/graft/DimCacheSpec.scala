package graft

import graft.ml.{AnnSearch, IvfIndex}
import graft.util.TableIndex
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The collected-dim-table cache ([[graft.util.TableIndex.cachedDim]]):
  * centroids, PQ books and aggregated radii are written once per
  * generation but were re-read and re-collected on EVERY probe /
  * search / append — a ~0.14–0.4 s driver-side constant per call
  * (measured, dev/EmbStageProbe; before/after in SCALE.md). The cache
  * keys on the table's visible-file fingerprint (qualified path +
  * per-file name/mtime/length), so these specs pin the invalidation
  * axes that could silently serve stale dims:
  *  - a mutation that ADDS files (appendInPlace's geometry wave) re-keys;
  *  - a mutation that REPLACES files (refreshGeometry) re-keys;
  *  - wipe() + rebuild at the same path re-keys (the baseBidsCache
  *    lesson — mtime granularity covered by the eager wipe purge);
  *  - a SNAPSHOT pinned before a mutation keys on its committed subset
  *    and keeps serving the pre-mutation dims.
  */
class DimCacheSpec extends SparkSpec {

  private def embs: DataFrame =
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id").as("id"), expr("transform(embedding, x -> cast(x as double))").as("vec"))

  private def radiiOf(idx: String, snap: Option[TableIndex.Snapshot] = None): Map[Long, Double] =
    IvfIndex.cellGeometry(spark, idx, snap)
      .select(col("cell").cast("long"), col("r").cast("double"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

  test("dim cache re-keys on append (new geometry files), refresh (replaced files), and wipe+rebuild") {
    val all = embs.localCheckpoint(true)
    val base = all.filter(col("id") % 2 === 0)
    val shard = all.filter(col("id") % 2 =!= 0).limit(60).localCheckpoint(true)
    val idx = graft.util.TempDirs.scratch("dimcache").toString
    val centroids = AnnSearch.kmeansCentroidsExact(base, stride = 7, iters = 1)
    val book = AnnSearch.pqBook(base, m = 4, stride = 7)
    IvfIndex.build(base, centroids, book, idx, storeFloats = true)

    val before = radiiOf(idx) // warm the cache
    assert(radiiOf(idx) == before, "repeat read must serve the cached dims unchanged")

    // a snapshot pinned BEFORE the append keeps the pre-append geometry
    val pin = TableIndex.openSnapshot(spark, idx)

    // append: per-shard radius rows land as NEW files — the fingerprint
    // must re-key, and merged radii can only grow (max over rows)
    IvfIndex.appendInPlace(spark, idx, shard, batchId = Some("dim-app"))
    val after = radiiOf(idx)
    assert(after != before, "appended geometry rows invisible — stale cached radii served")
    assert(before.forall { case (c, r) => after.getOrElse(c, math.Pi) >= r - 1e-12 },
      "radii shrank under append — merge must be max over rows")
    assert(radiiOf(idx, Some(pin)) == before,
      "a pre-append snapshot pin must keep serving the pre-append dims")

    // refreshGeometry REPLACES the radius files (tightening them) —
    // the fingerprint must re-key again
    IvfIndex.refreshGeometry(spark, idx, spark.emptyDataFrame) // floats-bearing: own table
    val refreshed = radiiOf(idx)
    assert(refreshed.forall { case (c, r) => r <= after.getOrElse(c, math.Pi) + 1e-12 },
      "refresh must tighten (or keep) every radius")
    // the cache served the REFRESHED table, not a stale entry: compare
    // against a from-parquet groupBy-max recomputation (cache-free)
    val fromDisk = spark.read.parquet(s"$idx/geometry.parquet")
      .groupBy("cell").agg(max("r").as("r"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(refreshed == fromDisk,
      s"cached radii diverged from the on-disk geometry after refresh: " +
        s"cached=$refreshed disk=$fromDisk")

    // wipe + rebuild at the SAME path with DIFFERENT centroids: every
    // cached dim (centroids, book, radii) must re-key — a stale
    // centroid set would mis-assign every probe with no error
    val cells1 = IvfIndex.cellGeometry(spark, idx).select("cell")
      .collect().map(_.getLong(0)).toSet
    TableIndex.wipe(spark, idx)
    IvfIndex.build(base, AnnSearch.kmeansCentroidsExact(base, stride = 11, iters = 1),
      AnnSearch.pqBook(base, m = 4, stride = 11), idx, storeFloats = true)
    val cells2 = IvfIndex.cellGeometry(spark, idx).select("cell")
      .collect().map(_.getLong(0)).toSet
    assert(cells1 != cells2,
      "rebuild with a different stride must surface its own centroid set " +
        "(equal sets would mean the dead generation's dims were served)")
  }

  test("dim cache keeps ONE live entry per (tag, table) across repeated mutations") {
    val all = embs.localCheckpoint(true)
    val base = all.filter(col("id") % 5 === 0)
    val idx = graft.util.TempDirs.scratch("dimcache_evict").toString
    IvfIndex.build(base,
      AnnSearch.kmeansCentroidsExact(base, stride = 7, iters = 1),
      AnnSearch.pqBook(base, m = 4, stride = 7), idx)
    def radiiKeys() = TableIndex.dimCacheKeys
      .filter(k => k.startsWith("radii|") && k.contains(idx))
    radiiOf(idx) // warm
    assert(radiiKeys().size == 1)
    // every appended geometry wave re-keys the fingerprint — without
    // insert-time eviction a long-lived streaming driver at per-shard
    // cadence accumulates one dead entry per shard for the session
    for (m <- 1 to 3) {
      val shard = all.filter(col("id") % 5 === m).limit(20)
      IvfIndex.appendInPlace(spark, idx, shard, batchId = Some(s"evict-$m"))
      radiiOf(idx)
      assert(radiiKeys().size == 1,
        s"superseded dim-cache entries accumulated after mutation $m: ${radiiKeys()}")
    }
  }

  test("cached dims leave results ≡ brute force across a mutate-probe-mutate sequence") {
    val all = embs.localCheckpoint(true)
    val base = all.filter(col("id") % 3 === 0)
    val shard = all.filter(col("id") % 3 === 1).limit(40).localCheckpoint(true)
    val queries = all.filter(col("id") % 3 === 2).limit(15).localCheckpoint(true)
    val idx = graft.util.TempDirs.scratch("dimcache_exact").toString
    IvfIndex.build(base,
      AnnSearch.kmeansCentroidsExact(base, stride = 7, iters = 1),
      AnnSearch.pqBook(base, m = 4, stride = 7), idx, storeFloats = true)

    def brute(corpus: DataFrame): Set[(Long, Long)] = {
      val vs = corpus.collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
      val qs = queries.collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toSeq
      (for {
        (qid, qv) <- qs; (nid, nv) <- vs if qid != nid
        d = qv.indices.map(i => qv(i) * nv(i)).sum
        s = d / (math.sqrt(qv.map(x => x * x).sum) * math.sqrt(nv.map(x => x * x).sum))
        if s >= 0.85
      } yield (qid, nid)).toSet
    }
    def got(): Set[(Long, Long)] =
      IvfIndex.nearDupsExact(spark, idx, queries, tau = 0.85)
        .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    assert(got() == brute(base), "pre-mutation probe diverged")
    IvfIndex.appendInPlace(spark, idx, shard, batchId = Some("dim-exact"))
    assert(got() == brute(base.unionByName(shard)),
      "post-append probe diverged — stale cached dims would lose the appended rows' cells")
    val delId = shard.select("id").orderBy("id").limit(1).collect()(0).getLong(0)
    IvfIndex.deleteInPlace(spark, idx, spark.range(delId, delId + 1).select(col("id")))
    assert(got() == brute(base.unionByName(shard).filter(col("id") =!= delId)),
      "post-delete probe diverged")
  }
}
