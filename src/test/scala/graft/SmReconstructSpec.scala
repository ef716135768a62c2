package graft

import graft.domain.EtlConfig
import graft.ops.{Bandwidth, BvSearch, SmReconstruct}
import graft.pipelines.Layouts
import org.apache.spark.sql.functions._

/** X8 + A12 + X2 goldens (fixtures/occupancy_bv_golden.json, measured by
  * running the reference drivers — see BASELINE.md):
  * 78 supermodules / 447 modules / 1,788 ETROC entries, four bandwidth
  * numbers, eight BV-config lead/channel counts, total module current.
  */
class SmReconstructSpec extends SparkSpec {

  private lazy val centers = Layouts.faceCenters(spark, "disk1", "back").cache()
  private lazy val sensorDf = SmReconstruct.reconstruct(spark, centers).cache()
  private lazy val mods = SmReconstruct.moduleStats(sensorDf).cache()

  test("supermodule / module / sensor counts match reference (78 / 447 / 894)") {
    val sms = SmReconstruct.supermodules(
      spark, centers.filter(col("x") > 0), EtlConfig.modPartitions.map(_._3))
    assert(sms.count() == 78)
    assert(sms.agg(sum("n_mod")).head().getLong(0) == 447)
    assert(sensorDf.count() == 894)
  }

  test("reconstructed sensors land back on the original sensor rows") {
    // module rows sit at the mean of each sensor-y pair, so expanding
    // modules → sensors must reproduce the original 52 distinct y values
    val originalYs = centers.filter(col("x") > 0)
      .select("y").distinct().collect().map(_.getDouble(0)).sorted
    val rebuiltYs = sensorDf.select("y").distinct().collect().map(_.getDouble(0)).sorted
    assert(rebuiltYs.length == originalYs.length)
    for ((a, b) <- rebuiltYs.zip(originalYs))
      assert(math.abs(a - b) < 1e-9, s"$a vs $b")
    // per-row supermodule multiplicities follow the partition table
    val sms = SmReconstruct.supermodules(
      spark, centers.filter(col("x") > 0), EtlConfig.modPartitions.map(_._3))
    val nByRow = sms.groupBy("row_idx").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    for (((_, nSm, _), i) <- EtlConfig.modPartitions.zipWithIndex)
      assert(nByRow(i) == nSm.toLong, s"row $i")
  }

  test("bandwidth rollup matches reference to 1e-9 (2.3374656 / 0.9646656 / 0.84037248 / 0.49717248 Tbps)") {
    val occ = Bandwidth.perEtrocOccupancy(sensorDf)
    assert(occ.count() == 1788)
    val row = Bandwidth.rollup(spark, occ).head()
    assert(math.abs(row.getDouble(0) - 2.3374656) < 1e-9)
    assert(math.abs(row.getDouble(1) - 0.9646656) < 1e-9)
    assert(math.abs(row.getDouble(2) - 0.8403724800000001) < 1e-9)
    assert(math.abs(row.getDouble(3) - 0.4971724800000001) < 1e-9)
  }

  test("total module current matches reference (723.9203843 mA)") {
    val total = mods.agg(sum("current")).head().getDouble(0)
    assert(math.abs(total - 723.9203843058484) < 1e-6)
  }

  test("BV study leads/channels match reference for all 8 configs") {
    val expected = Map(
      "HPK_split4_2p5fC" -> (399L, 321L),
      "HPK_split4_5fC"   -> (336L, 258L),
      "HPK_split4_10fC"  -> (267L, 189L),
      "HPK_split4_15fC"  -> (234L, 156L),
      "FBK_w13_2p5fC"    -> (333L, 255L),
      "FBK_w13_5fC"      -> (258L, 180L),
      "FBK_w13_10fC"     -> (202L, 124L),
      "FBK_w13_15fC"     -> (180L, 102L)
    )
    val bvIn = mods.cache()
    for ((cfgName, curve) <- EtlConfig.bvConfigs) {
      val (leads, channels) = BvSearch.study(spark, bvIn, curve)
      assert((leads, channels) == expected(cfgName), s"config $cfgName")
    }
  }
}
