package graft

import graft.geom.Transforms
import graft.physics.Physics
import org.apache.spark.sql.functions._

/** P1–P4 and P9–P14 unit tests. */
class TransformsSpec extends SparkSpec {

  test("eta → (x,y,z) → eta round-trips") {
    import spark.implicits._
    val df = (1 to 100).map(i => (i.toLong, 1.7 + i * 0.012, -1.5 + i * 0.03)).toDF("id", "eta", "phi")
    val fwd = Transforms.withCartesian(df, zMm = 3000.0)
      .drop("theta", "r")
    val back = Transforms.withKinematics(fwd.withColumn("z", lit(3000.0)), "x", "y", "z")
    // withKinematics overwrites eta — recompute diff against original columns
    val joined = back.select(col("id"), col("eta").as("eta2"))
      .join(df.select(col("id"), col("eta").as("eta1")), "id")
      .filter(abs(col("eta1") - col("eta2")) > 1e-10)
    assert(joined.count() == 0)
  }

  test("physics scalar vs column forms agree") {
    import spark.implicits._
    val rs = Seq(320.0, 520.0, 800.0, 1185.0)
    val df = rs.toDF("r")
      .withColumn("irr", Physics.irradiationCol(col("r")))
      .withColumn("cur", Physics.getCurrentCol(col("r")))
      .withColumn("occ", Physics.sensorOccupancyCol(col("r")))
      .collect()
    for (row <- df) {
      val r = row.getDouble(0)
      assert(row.getDouble(1) == Physics.irradiation(r))
      assert(row.getDouble(2) == Physics.getCurrent(r))
      assert(row.getDouble(3) == Physics.sensorOccupancy(r))
    }
  }

  test("BV curve spot values (FIXTURES.md §5)") {
    assert(math.abs(Physics.bvCurve("fbk_w13_10fc")(520.0) - (363.91 * math.log(520.0) - 1834.6)) == 0.0)
    assert(math.abs(Physics.bvCurve("hpk_split4_10fc")(800.0) - (481.91 * math.log(800.0) - 2544.6)) == 0.0)
  }
}
