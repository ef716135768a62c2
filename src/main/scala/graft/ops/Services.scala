package graft.ops

import graft.ops.DeeTiling.Config
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Service-board placement and related small operators:
  * P17 VTRX placement (ETL.py:193-203), P18 power-board split
  * (ETL.py:506-532), A4 supermodule occupancy (ETL.py:495-500),
  * O7 BV-ladder ring iteration (bias_voltage.ipynb `while r>315`),
  * and the TSV→sensor-center derivation of
  * realistic_layout_export.ipynb (`makeModule_full`).
  */
object Services {

  /** Add RB / PB / VTRX geometry columns to a tiled supermodule table
    * (x_sm, y_sm, n_mod). Positions replicate SuperModule.__init__ +
    * VTRX.__init__ for the face's orientation. */
  def withServiceBoards(sms: DataFrame, cfg: Config): DataFrame = {
    val smHeight = col("n_mod") * cfg.moduleHeight + (col("n_mod") - 1) * cfg.moduleGap
    val sign = if (cfg.orientation == "above") 1.0 else -1.0
    val rbY = col("y_sm") - lit(sign) * (cfg.pbWidth / 2.0)
    sms
      .withColumn("sm_height", smHeight)
      .withColumn("rb_x", col("x_sm"))
      .withColumn("rb_y", rbY)
      .withColumn("pb_x", col("x_sm"))
      .withColumn("pb_y", col("y_sm") + lit(sign) * (cfg.rbWidth / 2.0))
      // VTRX: x = RB.x2 − 32.5, y = RB.y + 6  (ETL.py:198-199)
      .withColumn("vtrx_x", col("rb_x") + smHeight / 2.0 - 32.5)
      .withColumn("vtrx_y", rbY + 6.0)
  }

  /** P18: split the PB of 6/7-module supermodules into two (one row
    * per resulting power board, `pb_i` ∈ {0,1}; ≤5 modules keep one).
    * PB_height = 3·module_height + 2·gap; the 7-module split shifts by
    * ±(module_height/2 + gap) ('right' alignment), 6-module by 0. */
  def splitPB(sms: DataFrame, cfg: Config): DataFrame = {
    val pbHeight = 3 * cfg.moduleHeight + 2 * cfg.moduleGap
    val shifter = when(col("n_mod") === 6, 0.0).otherwise(1.0)
    val shift = shifter * (cfg.moduleHeight / 2.0 + cfg.moduleGap)
    sms
      .withColumn(
        "pb_xs",
        when(
          col("n_mod") > 5,
          array(
            col("pb_x") + pbHeight / 2.0 + shift,
            col("pb_x") - pbHeight / 2.0 + shift
          )
        ).otherwise(array(col("pb_x")))
      )
      .select(col("*"), posexplode(col("pb_xs")).as(Seq("pb_i", "pb_split_x")))
      .drop("pb_xs")
  }

  /** A4: supermodule occupancy = scale · mean(module occupancy). */
  def smOccupancy(moduleStats: DataFrame, scale: Double = 1.0): DataFrame =
    moduleStats
      .groupBy("sm_id")
      .agg((avg("occupancy") * scale).as("sm_occupancy"), count(lit(1)).as("n_mod"))

  /** O7: BV-ladder ring radii — iterate r ← curve(r) from rOuter until
    * r ≤ rMin (driver-side, ≤ ~10 iterations), returning the ring
    * boundary table (ring index, r_outer, r_inner). */
  def ladderRings(
      spark: SparkSession,
      curveName: String,
      rStart: Double = 1185.0,
      rMin: Double = 315.0
  ): DataFrame = {
    import spark.implicits._
    val curve = graft.physics.Physics.bvCurve(curveName) _
    val bounds = Iterator.iterate(rStart)(curve).takeWhile(_ > rMin).take(64).toSeq
    bounds.zipWithIndex.map { case (rOut, i) =>
      val rIn = curve(rOut)
      (i, rOut, math.max(rIn, rMin))
    }.toDF("ring", "r_outer", "r_inner")
  }

  /** realistic_layout_export.ipynb `makeModule_full`: module centers →
    * two sensor centers at y ± (gap + sensor_y/2), replicating the
    * reference's addition order ((y + 0.25) + 11.0). */
  def sensorCentersFromModules(modules: DataFrame): DataFrame =
    modules.select(
      col("*"),
      explode(array(
        (col("y") + 0.25) + 11.0,
        (col("y") - 0.25) - 11.0
      )).as("center_y")
    ).withColumn("center_x", col("x"))
}
