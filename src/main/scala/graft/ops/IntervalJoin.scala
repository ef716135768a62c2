package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed point-in-interval (range) join via BUCKET REPLICATION —
  * the same trick the spatial grid join uses, in one dimension.
  *
  * A naive range join (`p.key = i.key AND i.lo <= p.t AND p.t <= i.hi`)
  * gives Spark only the key equi-predicate; within hot keys the range
  * predicate runs as a post-join filter over the full per-key product.
  * Here both sides get an explicit bucket column: points map to exactly
  * ONE bucket (`t div B`), intervals replicate to the ~(width/B + 1)
  * buckets they overlap, and the join is a plain hash equi-join on
  * (key, bucket) with the exact range predicate as a residual. Work is
  * proportional to true matches plus bucket co-residency, never to the
  * per-key product. Pick `bucket` near the typical interval width: the
  * replication factor stays O(1) and each point meets only intervals
  * within one bucket of its own.
  */
object IntervalJoin {

  /** points:    (key, t, id);
    * intervals: (key, lo, hi, id), lo ≤ hi, inclusive on both ends.
    * Returns one row per (point ∈ interval) pair:
    * (p_id, i_id, key, t, lo, hi). */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      keyCol: String, bucket: Long): DataFrame = {
    require(bucket > 0, s"bucket width must be positive, got $bucket")
    def bucketOf(c: org.apache.spark.sql.Column) =
      floor(c.cast("long") / bucket).cast("long") // true floor: negative ts safe
    val p = points.select(
      col(keyCol).as("k"), col("t").cast("long").as("t"),
      col("id").cast("long").as("p_id"),
      bucketOf(col("t")).as("bk"))
    val i = intervals.select(
      col(keyCol).as("k"), col("lo").cast("long").as("lo"),
      col("hi").cast("long").as("hi"), col("id").cast("long").as("i_id"))
      .withColumn("bk", explode(sequence(bucketOf(col("lo")), bucketOf(col("hi")))))
    p.join(i, Seq("k", "bk"))
      .filter(col("t") >= col("lo") && col("t") <= col("hi"))
      .select("p_id", "i_id", "k", "t", "lo", "hi")
  }
}
