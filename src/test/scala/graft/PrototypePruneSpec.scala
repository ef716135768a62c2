package graft

import graft.ml.AnnSearch
import org.apache.spark.sql.functions._

/** Semantics + plan shape of SSL-prototypes pruning: per-cluster
  * prototypicality ranks, drop-fraction cutoff, and the
  * one-exchange plan (map-side assignment + broadcast centroid join
  * + cell-keyed window). */
class PrototypePruneSpec extends SparkSpec {
  import spark.implicits._

  // Two well-separated clusters on the axes of R^2; centroids are the
  // stride-4 rows (ids 0 and 4). Within each cluster, vectors are
  // progressively rotated away from the centroid, so prototypicality
  // order is by construction.
  private lazy val corpus = Seq(
    (0L, Array(1.0f, 0.0f)),    // centroid A
    (1L, Array(0.99f, 0.14f)),  // near A
    (2L, Array(0.9f, 0.44f)),   // further
    (3L, Array(0.8f, 0.6f)),    // furthest in A
    (4L, Array(0.0f, 1.0f)),    // centroid B
    (5L, Array(0.14f, 0.99f)),
    (6L, Array(0.44f, 0.9f)),
    (7L, Array(0.6f, 0.8f))
  ).toDF("id", "vec")

  private lazy val centroids = AnnSearch.strideCentroids(corpus, 4)

  private lazy val ranked =
    AnnSearch.prototypeRanks(corpus, centroids, dropFrac = 0.3)
      .collect()
      .map(r => r.getLong(0) -> r)
      .toMap

  test("every vector is ranked exactly once, in its nearest cluster") {
    assert(ranked.size === 8)
    Seq(0L, 1L, 2L, 3L).foreach(id => assert(ranked(id).getLong(1) === 0L, s"id $id cell"))
    Seq(4L, 5L, 6L, 7L).foreach(id => assert(ranked(id).getLong(1) === 4L, s"id $id cell"))
  }

  test("prototypicality rank follows cosine-to-centroid order") {
    assert(ranked(0L).getLong(2) === 1L) // the centroid itself is most prototypical
    assert(ranked(1L).getLong(2) === 2L)
    assert(ranked(2L).getLong(2) === 3L)
    assert(ranked(3L).getLong(2) === 4L)
  }

  test("drop cutoff removes floor(n * dropFrac) most-prototypical per cluster") {
    // n=4, dropFrac=0.3 → floor(1.2)=1 dropped: exactly rank 1
    Seq(0L, 4L).foreach(id => assert(!ranked(id).getBoolean(4), s"id $id should drop"))
    Seq(1L, 2L, 3L, 5L, 6L, 7L).foreach(id => assert(ranked(id).getBoolean(4), s"id $id should keep"))
  }

  test("plan: one hash exchange (the cell window); centroid join broadcasts") {
    val df = AnnSearch.prototypeRanks(corpus, centroids, dropFrac = 0.3)
    val plan = df.queryExecution.executedPlan.toString
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(shuffles === 1, s"prototype ranking has $shuffles hash exchanges, want 1:\n$plan")
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
      s"centroid join is not a broadcast:\n$plan")
  }
}
