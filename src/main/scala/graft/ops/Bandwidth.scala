package graft.ops

import graft.domain.EtlConfig
import graft.physics.Physics
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-ETROC occupancy collection + readout-bandwidth rollup (SURVEY
  * §2.2 P13/P20, §2.5 A12; reference ETL.py:154-161, occupancy.py:243-268).
  *
  * Each sensor contributes two ETROC occupancies (left/right half at
  * x ∓ h/2); these fill a 20-bin histogram over [0,1) whose bin centers
  * weight the payload term of four header/calibration variants.
  */
object Bandwidth {
  import EtlConfig._

  /** Explode sensors (x, y columns) into per-ETROC occupancy rows (P13). */
  def perEtrocOccupancy(sensors: DataFrame, height: Double = sensorHeight): DataFrame = {
    val h2 = height / 2.0
    val rLeft = sqrt((col("x") - h2) * (col("x") - h2) + col("y") * col("y"))
    val rRight = sqrt((col("x") + h2) * (col("x") + h2) + col("y") * col("y"))
    sensors.select(
      explode(array(Physics.sensorOccupancyCol(rLeft), Physics.sensorOccupancyCol(rRight))).as("occ")
    )
  }

  /** Bandwidth rollup (occupancy.py:254-268): one row, four Tbps columns.
    * rate = header·nETROC·l1a + Σ_bins center·(hitBits·256/100)·count·16·l1a.
    */
  def rollup(spark: SparkSession, occ: DataFrame, l1a: Double = l1aRate, nEtroc: Double = nEtrocs): DataFrame = {
    val h = HistogramOps.hist1d(occ, col("occ"), HistogramOps.BinSpec(20, 0.0, 1.0))
    val payload40 = sum(col("center") * 40 * 256 / 100 * col("n") * 16 * l1a / 1e12)
    val payload32 = sum(col("center") * 32 * 256 / 100 * col("n") * 16 * l1a / 1e12)
    h.agg(
      (lit(80 * nEtroc * l1a / 1e12) + payload40).as("bw_tdr"),
      (lit(16 * nEtroc * l1a / 1e12) + payload40).as("bw_mini_hdr"),
      (lit(16 * nEtroc * l1a / 1e12) + payload32).as("bw_mini_hdr_nocal"),
      payload32.as("bw_no_hdr_nocal")
    )
  }
}
