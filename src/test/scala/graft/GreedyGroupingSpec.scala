package graft

import graft.ops.{GreedyGrouping, SmReconstruct}
import graft.pipelines.Layouts
import org.apache.spark.sql.functions._

/** End-to-end greedy BV grouping vs goldens captured from a fresh run
  * of the reference driver (bias_voltage.py:423-500 greedy section,
  * executed with plotting stubbed; fixtures/greedy_golden.json). */
class GreedyGroupingSpec extends SparkSpec {

  private lazy val grouped = {
    val sensors = SmReconstruct.reconstruct(spark, Layouts.faceCenters(spark, "disk1", "back"))
    val mods = SmReconstruct.moduleStats(sensors)
    GreedyGrouping.fromModuleStats(spark, mods).cache()
  }

  // goldens from fixtures/greedy_golden.json (reference run 2026-08-12)
  private val hpkSizes = Seq(12, 12, 12, 12, 12, 12, 12, 12, 12, 12, 12, 12, 12, 12, 12, 12, 12,
    12, 12, 12, 12, 12, 12, 12, 12, 12, 12, 12, 12, 7, 11, 8, 4, 6, 5)
  private val fbkSizes = Seq(11, 11, 9, 5, 8, 5, 2, 2, 1, 2, 1, 1)

  test("vendor split matches reference (389 hpk / 58 fbk)") {
    val counts = grouped.groupBy("vendor").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map("hpk" -> 389L, "fbk" -> 58L))
  }

  test("greedy group sizes match the reference walk exactly") {
    def sizes(vendor: String): Seq[Long] =
      grouped.filter(col("vendor") === vendor)
        .groupBy("group").count().orderBy("group")
        .collect().map(_.getLong(1)).toSeq
    assert(sizes("hpk") == hpkSizes.map(_.toLong))
    assert(sizes("fbk") == fbkSizes.map(_.toLong))
  }

  test("group currents match reference sums to 1e-9 and respect the cap report") {
    val golden = ujsonLite()
    val sums = GreedyGrouping.groupSummary(grouped)
      .orderBy(col("vendor").desc, col("group")) // hpk first, then fbk (as reference list)
      .collect().map(r => (r.getString(0), r.getLong(3 - 1) /*n_mods*/, r.getDouble(3), r.getBoolean(4)))
    val refCurrents = golden
    val hpk = sums.filter(_._1 == "hpk").map(_._3)
    val fbk = sums.filter(_._1 == "fbk").map(_._3)
    assert(hpk.length == hpkSizes.length && fbk.length == fbkSizes.length)
    hpk.zip(refCurrents._1).foreach { case (a, b) => assert(math.abs(a - b) < 1e-9, s"$a vs $b") }
    fbk.zip(refCurrents._2).foreach { case (a, b) => assert(math.abs(a - b) < 1e-9, s"$a vs $b") }
    assert(sums.forall(!_._4), "no group may exceed the 20 mA cap on this layout")
  }

  /** Parse the golden JSON (flat structure, no external deps). */
  private def ujsonLite(): (Seq[Double], Seq[Double]) = {
    val txt = scala.io.Source.fromFile(Layouts.resolveFixture("greedy_golden.json")).mkString
    def currents(vendor: String): Seq[Double] = {
      val sec = txt.split("\"" + vendor + "\"")(1).split("\"currents\":")(1).split("]")(0)
      sec.replace("[", "").split(",").map(_.trim).filter(_.nonEmpty).map(_.toDouble).toSeq
    }
    (currents("hpk"), currents("fbk"))
  }
}
