package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-rectangle spatial join (SURVEY §2.4 J1/J2, §2.3 F1; reference
  * ETL.py:752-776, dee_geometry.py:593-608).
  *
  * The reference brute-forces every particle against every sensor
  * rectangle (O(points × rects) with an `.any()` early exit). A naive
  * Spark translation of the non-equi predicate becomes a
  * BroadcastNestedLoopJoin — correct, but O(n·m) per partition and not
  * codegen-friendly.
  *
  * Instead we grid-bucket: each rectangle is replicated to the coarse
  * grid cells it covers (a handful of copies for sensor-sized rects),
  * each point maps to exactly one cell, and the join becomes a hash
  * equi-join on (keys…, cx, cy) with the exact strict-inequality range
  * predicate applied as a residual filter. With the rect side broadcast
  * this is a map-side-only plan: no shuffle of the (arbitrarily large)
  * point side, whole-stage codegen throughout — the shape that survives
  * a 100 TB point table on a 1000-executor cluster.
  */
object SpatialJoin {

  /** Replicate rects to all covered grid cells. Rect columns:
    * ax1 < ax2, ay1 < ay2. */
  def gridRects(rects: DataFrame, cell: Double): DataFrame =
    rects
      .withColumn("cx", explode(sequence(floor(col("ax1") / cell).cast("long"), floor(col("ax2") / cell).cast("long"))))
      .withColumn("cy", explode(sequence(floor(col("ay1") / cell).cast("long"), floor(col("ay2") / cell).cast("long"))))

  /** Inner join of points (with `px`,`py` columns) against rects on
    * (extraKeys…, grid cell) + strict containment (ETL.py:772-776:
    * ax1 < x < ax2, ay1 < y < ay2).
    *
    * `broadcastRects = true` (default): rect side broadcast, zero
    * shuffle of the point side — right whenever the gridded rect
    * table fits an executor (detector geometries: always).
    * `broadcastRects = false`: BOTH sides shuffle on the
    * (extraKeys…, cell) equi-key into a shuffled hash join — the plan
    * for a rect side too large to broadcast (the SHUFFLE_HASH hint
    * pins the shape; without it the optimizer would re-broadcast
    * whichever side happens to be small at test scale, silently
    * un-testing the large-side path). Both plans return the
    * identical hit set — asserted by PlanShapeSpec. */
  def hitJoin(
      points: DataFrame,
      rects: DataFrame,
      extraKeys: Seq[String],
      cell: Double,
      broadcastRects: Boolean = true
  ): DataFrame = {
    val gridded = gridRects(rects, cell)
    val right = if (broadcastRects) broadcast(gridded) else gridded.hint("shuffle_hash")
    val p = points
      .withColumn("cx", floor(col("px") / cell).cast("long"))
      .withColumn("cy", floor(col("py") / cell).cast("long"))
    p.join(right, extraKeys ++ Seq("cx", "cy"))
      .filter(
        col("ax1") < col("px") && col("px") < col("ax2") &&
          col("ay1") < col("py") && col("py") < col("ay2")
      )
  }

  /** Existence semantics (the reference's `.any()`): distinct point keys
    * that hit at least one rect. */
  def semiJoin(
      points: DataFrame,
      rects: DataFrame,
      pointKeys: Seq[String],
      extraKeys: Seq[String],
      cell: Double
  ): DataFrame =
    hitJoin(points, rects, extraKeys, cell)
      .select(pointKeys.map(col): _*)
      .distinct()
}
