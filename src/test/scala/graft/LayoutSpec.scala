package graft

import graft.pipelines.Layouts
import org.apache.spark.sql.functions._

/** S2 + X4: YAML layout ingestion goldens (BASELINE.md: 1,804 / 1,786 /
  * 1,804 / 1,786 sensors per face for database_new). */
class LayoutSpec extends SparkSpec {

  test("database_new face sensor counts match reference") {
    val df = Layouts.faceSensors(spark).cache()
    val counts = df.groupBy("face").count().collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(counts == Map(0 -> 1804L, 1 -> 1786L, 2 -> 1804L, 3 -> 1786L))
  }

  test("corner derivation: active area shrunk by deadspace") {
    val row = Layouts.faceSensors(spark)
      .select("x", "y", "x1", "ax1", "ax2", "ay1", "ay2")
      .head()
    val x = row.getDouble(0); val y = row.getDouble(1)
    assert(row.getDouble(2) == x - 21.25)
    assert(row.getDouble(3) == (x - 21.25) + 0.5)
    assert(row.getDouble(4) == (x + 21.25) - 0.5)
    assert(row.getDouble(5) == (y - 11.0) + 0.5)
    assert(row.getDouble(6) == (y + 11.0) - 0.5)
  }

  test("TDR layout parses too (database_TDR.yaml)") {
    val tdr = graft.io.LayoutYaml.read(spark, graft.pipelines.Layouts.resolveFixture("database_TDR.yaml"))
    assert(tdr.count() > 5000)
    assert(tdr.select("layout").distinct().collect().map(_.getString(0)).toSet == Set("TDR"))
  }
}
