package graft.ops

import graft.domain.EtlConfig
import graft.physics.Physics
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import scala.collection.mutable.ArrayBuffer

/** Greedy radial BV grouping (SURVEY §2.6 O4; reference
  * dee_geometry.py:496-538 and its duplicate bias_voltage.py:449-493).
  *
  * Walk modules from large r to small r per vendor; start a new group
  * when the running current would exceed the 20 mA cap OR the module's
  * r_min falls at/below the vendor ladder curve evaluated at the group's
  * opening r_max. Sequential state with data-dependent resets — not
  * window-expressible — so it runs as `flatMapGroups` over per-vendor
  * sorted iterators (vendor groups are independent ⇒ parallel; each
  * group is tiny).
  *
  * The two reference copies differ subtly: the hpk loop adds the
  * module's current before the cap check, the fbk loop checks before
  * adding. Both are preserved via `checkBeforeAdd`.
  */
object GreedyGrouping {

  final case class ModuleIn(vendor: String, ord: Long, r_min: Double, r_max: Double, current: Double)
  final case class Grouped(vendor: String, ord: Long, group: Int)

  /** One vendor's walk; input must be sorted by descending module radius
    * (with a deterministic tiebreak — SURVEY §7.3). Returns the group
    * index per module, replicating reference group indexing (an empty
    * leading group is possible, exactly as in the reference). */
  def walk(
      mods: Seq[ModuleIn],
      curve: Double => Double,
      cap: Double,
      checkBeforeAdd: Boolean
  ): Seq[(ModuleIn, Int)] = {
    val out = ArrayBuffer.empty[(ModuleIn, Int)]
    var nGroups = 0
    var first = true
    var current = 0.0
    var newGroup = false
    var rminForReal = 0.0
    for (m <- mods) {
      if (checkBeforeAdd) {
        if (current + m.current > cap) newGroup = true
        else current += m.current
      } else {
        current += m.current
        if (current > cap) newGroup = true
      }
      if (first) {
        rminForReal = curve(m.r_max)
        nGroups += 1 // the reference appends an (initially empty) first group
        first = false
      }
      if (m.r_min > rminForReal && !newGroup) {
        out += ((m, nGroups - 1))
      } else {
        newGroup = false
        current = m.current
        rminForReal = curve(m.r_max)
        nGroups += 1
        out += ((m, nGroups - 1))
      }
    }
    out.toSeq
  }

  /** Distributed form. `modules` columns: vendor, ord (descending-radius
    * rank, 0-based, per vendor), r_min, r_max, current. `curves` maps
    * vendor → ladder curve name; `checkBeforeAdd` per vendor. */
  def run(
      spark: SparkSession,
      modules: DataFrame,
      curves: Map[String, String],
      checkBeforeAdd: Map[String, Boolean],
      cap: Double = 20.0
  ): DataFrame = {
    import spark.implicits._
    modules
      .selectExpr("vendor", "cast(ord as long) ord", "r_min", "r_max", "current")
      .as[ModuleIn]
      .groupByKey(_.vendor)
      .flatMapGroups { (vendor, it) =>
        val sorted = it.toSeq.sortBy(_.ord)
        val curve = Physics.bvCurve(curves(vendor)) _
        walk(sorted, curve, cap, checkBeforeAdd(vendor)).map { case (m, g) =>
          Grouped(vendor, m.ord, g)
        }
      }
      .toDF()
  }

  /** End-to-end wiring from the reconstructed module table (SURVEY F5 +
    * O1 + O4; reference dee_geometry.py:479-538, bias_voltage.py:431-493):
    * vendor split at r_min < 520 mm (FBK inside, HPK outside), modules
    * ranked by descending module-center radius per vendor, then the
    * greedy walk with the reference's per-vendor curve and cap
    * semantics (hpk adds-then-checks, fbk checks-then-adds).
    *
    * Input: `moduleStats` rows (sm_id, mod_i, r_min, r_max, r_mod,
    * current, …). Output: one row per module with its vendor, walk
    * rank and group index. */
  def fromModuleStats(spark: SparkSession, moduleStats: DataFrame): DataFrame = {
    val vendorized = moduleStats
      .withColumn("vendor", when(col("r_min") < EtlConfig.vendorSplitR, "fbk").otherwise("hpk"))
      .withColumn(
        "ord",
        row_number().over(
          Window.partitionBy("vendor").orderBy(desc("r_mod"), col("sm_id"), col("mod_i"))
        ).cast("long") - 1
      )
    val grouped = run(
      spark,
      vendorized,
      curves = Map("hpk" -> "hpk_split4_10fc", "fbk" -> "fbk_w13_10fc"),
      checkBeforeAdd = Map("hpk" -> false, "fbk" -> true)
    )
    vendorized.join(grouped, Seq("vendor", "ord"))
  }

  /** Per-group rollup with the 20 mA cap report (F7). */
  def groupSummary(grouped: DataFrame, cap: Double = EtlConfig.currentCap): DataFrame =
    grouped
      .groupBy("vendor", "group")
      .agg(
        count(lit(1)).as("n_mods"),
        sum("current").as("group_current")
      )
      .withColumn("over_cap", col("group_current") > cap)
}
