package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sensor-table construction (SURVEY §2.8 X4 `fromCenters`, §2.2 P5–P7;
  * reference ETL.py:90-120, 717-746).
  *
  * Sensors are rows, not objects: a center table `(x, y, ...)` gains
  * outline corners (x1,x2,y1,y2) and active-area corners (ax1,ax2,ay1,ay2)
  * as plain arithmetic columns. Expression order replicates the reference
  * (`(x − h/2) + deadspace`, ETL.py:109-120) so downstream threshold
  * comparisons are bit-identical.
  */
object SensorTable {

  /** Add outline + active-area corner columns to a center table.
    * `cm=true` divides centers by 10 first (mm → cm, ETL.py:722). */
  def fromCenters(
      centers: DataFrame,
      height: Double,
      width: Double,
      deadspace: Double,
      cm: Boolean = false
  ): DataFrame = {
    val scaled =
      if (cm) centers.withColumn("x", col("x") / 10.0).withColumn("y", col("y") / 10.0)
      else centers
    withCorners(scaled, height, width, deadspace)
  }

  /** Corner derivation only (assumes `x`/`y` center columns present). */
  def withCorners(df: DataFrame, height: Double, width: Double, deadspace: Double): DataFrame = {
    val h2 = height / 2.0
    val w2 = width / 2.0
    df.withColumn("x1", col("x") - h2)
      .withColumn("x2", col("x") + h2)
      .withColumn("y1", col("y") - w2)
      .withColumn("y2", col("y") + w2)
      .withColumn("ax1", (col("x") - h2) + deadspace)
      .withColumn("ax2", (col("x") + h2) - deadspace)
      .withColumn("ay1", (col("y") - w2) + deadspace)
      .withColumn("ay2", (col("y") + w2) - deadspace)
  }

  /** |(ax2−ax1)·(ay2−ay1)| (P7, ETL.py:122-123). */
  def withActiveArea(df: DataFrame): DataFrame =
    df.withColumn("active_area", abs((col("ax2") - col("ax1")) * (col("ay2") - col("ay1"))))
}
