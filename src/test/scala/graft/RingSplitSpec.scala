package graft

import graft.domain.EtlConfig
import graft.ops.{RingSplit, SmReconstruct}
import graft.pipelines.Layouts
import org.apache.spark.sql.functions._

/** O5 ring split vs goldens from a fresh reference run
  * (fixtures/ring_golden.json; bias_voltage.py:169-191). */
class RingSplitSpec extends SparkSpec {

  private lazy val ringed = {
    val half = Layouts.faceCenters(spark, "disk1", "back").filter(col("x") > 0)
    RingSplit.classify(
      SmReconstruct.supermodules(spark, half, EtlConfig.modPartitions.map(_._3))
    ).cache()
  }

  test("ring sizes and module counts match reference (20/32/26 SMs, 130/204/113 modules)") {
    val m = ringed.groupBy("ring")
      .agg(count(lit(1)).as("n"), sum("n_mod").as("nm"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(m == Map("inner" -> ((20L, 130L)), "middle" -> ((32L, 204L)), "outer" -> ((26L, 113L))))
  }

  test("A16 invariance: split partitions the SM set") {
    RingSplit.checkInvariance(ringed.select("sm_id"), ringed)
  }

  test("boundary row at sm.y = 614.65 classifies as |y| >= 600 (two middles)") {
    val row5 = ringed.filter(col("row_idx") === 5).orderBy("sm_seq")
      .select("ring").collect().map(_.getString(0)).toSeq
    assert(row5 == Seq("inner", "middle", "middle", "outer"))
  }
}
