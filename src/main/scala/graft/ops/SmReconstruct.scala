package graft.ops

import graft.domain.EtlConfig
import graft.physics.Physics
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Supermodule reconstruction from sensor centers (SURVEY §2.8 X8, §2.4
  * J3/J4, §2.6 O8; reference occupancy.py:71-133, bias_voltage.py:52-115).
  *
  * The reference groups a face's sensor centers into module rows by
  * pairing consecutive distinct y positions (descending), then walks a
  * static partition table to place supermodules at the mean x of each
  * consecutive run of module columns. The reference's float-equality `y
  * in y_positions` lookups are re-expressed rank-based (SURVEY §4
  * "semantic hazard"), which is both exact and scale-safe.
  *
  * Everything is window/groupBy DataFrame logic; float expression order
  * replicates the reference move_by chains so that module/sensor
  * coordinates — and therefore every downstream threshold decision
  * (BV feasibility, vendor split, 20 mA cap) — are bit-identical.
  */
object SmReconstruct {
  import EtlConfig._

  /** Build the supermodule table from a half-face center table `(x, y)`
    * (pre-filtered to x>0) and per-row flavor lists (y-descending order).
    *
    * Output: one row per supermodule:
    * (sm_id, row_idx, sm_seq, n_mod, x_sm, y_row).
    */
  def supermodules(spark: SparkSession, halfCenters: DataFrame, flavorRows: Seq[Seq[Int]]): DataFrame = {
    import spark.implicits._

    // distinct y positions, descending; pair rank k → module row pair=k/2 (J3)
    val ys = halfCenters
      .select("y").distinct()
      .withColumn("k", row_number().over(Window.orderBy(desc("y"))) - 1)
      .withColumn("pair", ($"k" / 2).cast("int"))
      .withColumn("parity", ($"k" % 2).cast("int"))

    // module-row y = (upper + lower)/2, replicating numpy's evens+odds ordering
    val yRows = ys.groupBy("pair").agg(
      ((max(when($"parity" === 0, $"y")) + max(when($"parity" === 1, $"y"))) / 2.0).as("y_row"),
      max(when($"parity" === 0, $"y")).as("y_upper")
    )

    // module x columns = x of sensors on the upper y of each pair, ascending (O8)
    val uppers = halfCenters
      .join(yRows.select("pair", "y_upper"), halfCenters("y") === yRows("y_upper"))
      .select($"pair", $"x")
      .withColumn("x_rank", row_number().over(Window.partitionBy("pair").orderBy("x")))

    // partition table join (J4): explode flavors with running start offsets
    val parts = flavorRows.zipWithIndex
      .map { case (fl, i) => (i, fl) }
      .toDF("pair", "flavors")
      .select($"pair", posexplode($"flavors").as(Seq("sm_seq", "n_mod")))
      .withColumn(
        "start",
        coalesce(
          sum($"n_mod").over(
            Window.partitionBy("pair").orderBy("sm_seq").rowsBetween(Window.unboundedPreceding, -1)
          ),
          lit(0L)
        )
      )

    // x_sm = mean of the run's x columns, summed in ascending order (bit-exact
    // vs the reference's sum(xs[start:start+n])/n over an ascending list)
    parts
      .join(uppers, Seq("pair"))
      .filter($"x_rank" > $"start" && $"x_rank" <= $"start" + $"n_mod")
      .groupBy($"pair", $"sm_seq", $"n_mod")
      .agg(
        aggregate(array_sort(collect_list($"x")), lit(0.0), (acc, v) => acc + v).as("x_sum")
      )
      .withColumn("x_sm", $"x_sum" / $"n_mod")
      .join(yRows.select("pair", "y_row"), Seq("pair"))
      .withColumn("row_idx", $"pair")
      .withColumn("sm_id", row_number().over(Window.orderBy($"pair", $"sm_seq")))
      .select("sm_id", "row_idx", "sm_seq", "n_mod", "x_sm", "y_row")
  }

  /** Expand supermodules → modules (one row per module).
    *
    * Module placement replicates SuperModule.__init__ + move_by
    * (ETL.py:338-357, 383-391): x = x_sm + (−(n−1)/2 + i)·(h+gap),
    * y = −pb/2 + (y_row + pb/2).
    */
  def modules(sms: DataFrame): DataFrame = {
    val pitch = moduleHeight + moduleGap
    val pb2 = pbWidth / 2.0
    sms
      .withColumn("mod_i", explode(sequence(lit(0), col("n_mod") - 1)))
      .withColumn(
        "x_mod",
        col("x_sm") + ((lit(0) - (col("n_mod") - 1)) / 2.0 + col("mod_i")) * pitch
      )
      .withColumn("y_mod", lit(-pb2) + (col("y_row") + lit(pb2)))
  }

  /** Expand modules → sensors (two per module, P5/P6 corners, physics
    * columns). Sensor y replicates the move chain: (±dy/2 − pb/2) +
    * (y_row + pb/2)  (ETL.py:264-269, 341, 383-391).
    */
  def sensors(mods: DataFrame): DataFrame = {
    val pb2 = pbWidth / 2.0
    val yBase0 = (-(sensorDistY / 2.0)) + (-pb2) // iy=0 → -26.0
    val yBase1 = (sensorDistY / 2.0) + (-pb2)    // iy=1 → -3.5
    val withSensors = mods
      .select(
        col("*"),
        posexplode(array(lit(yBase0), lit(yBase1))).as(Seq("sensor_iy", "y_base"))
      )
      .withColumn("x", col("x_mod"))
      .withColumn("y", col("y_base") + (col("y_row") + lit(pb2)))
      .drop("y_base")
    SensorTable.withCorners(withSensors, sensorHeight, sensorWidth, sensorDeadspace)
      .withColumn("r_center", sqrt(col("x") * col("x") + col("y") * col("y")))
      .withColumn("current", Physics.getCurrentCol(col("r_center"), addCurrent = addCurrent))
      .withColumn("occupancy", Physics.sensorOccupancyCol(col("r_center")))
  }

  /** Module-level rollup (A1/A2/A3): r_min/r_max over the 8 active-area
    * corners, Σcurrent, mean occupancy. */
  def moduleStats(sensorDf: DataFrame): DataFrame = {
    val corners = sensorDf
      .withColumn("r_c1", sqrt(col("ax1") * col("ax1") + col("ay1") * col("ay1")))
      .withColumn("r_c2", sqrt(col("ax1") * col("ax1") + col("ay2") * col("ay2")))
      .withColumn("r_c3", sqrt(col("ax2") * col("ax2") + col("ay1") * col("ay1")))
      .withColumn("r_c4", sqrt(col("ax2") * col("ax2") + col("ay2") * col("ay2")))
    corners
      .groupBy("sm_id", "n_mod", "mod_i")
      .agg(
        first("x_mod").as("x_mod"),
        first("y_mod").as("y_mod"),
        min(least(col("r_c1"), col("r_c2"), col("r_c3"), col("r_c4"))).as("r_min"),
        max(greatest(col("r_c1"), col("r_c2"), col("r_c3"), col("r_c4"))).as("r_max"),
        sum("current").as("current"),
        avg("occupancy").as("occupancy")
      )
      .withColumn("r_mod", sqrt(col("x_mod") * col("x_mod") + col("y_mod") * col("y_mod")))
  }

  /** Convenience: full chain for the default config (D2 half, x>0). */
  def reconstruct(spark: SparkSession, centers: DataFrame): DataFrame = {
    val half = centers.filter(col("x") > 0)
    val sms = supermodules(spark, half, modPartitions.map(_._3))
    sensors(modules(sms))
  }
}
