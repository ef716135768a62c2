package graft

import org.apache.spark.sql.functions._

/** The docs point large-scale users at Spark's approximate analytics
  * (percentile_approx, approx_count_distinct) where the exact forms
  * sort or shuffle too much. These tests bound the approximations
  * against the exact conformance queries on real fixture data, so the
  * "use the sketch at scale" advice stays demonstrably sound. */
class ApproxBoundsSpec extends SparkSpec {

  test("percentile_approx brackets the exact rank-arithmetic percentiles") {
    val li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
      .select("l_returnflag", "l_extendedprice")
    val approx = li.groupBy("l_returnflag")
      .agg(percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000)).as("p50a"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val exact = SparkEntry.queries("percentiles_price")(spark, "/root/testdata/sf0.01")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    exact.foreach { case (flag, p50) =>
      val a = approx(flag)
      val rel = math.abs(a - p50) / p50
      assert(rel < 0.01, s"approx p50 for $flag off by ${rel * 100}%: $a vs $p50")
    }
  }

  test("approx_count_distinct stays within its advertised error on real keys") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    try {
      val events = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
      val exact = events.agg(countDistinct("user_id")).head().getLong(0)
      val approx = events.agg(approx_count_distinct(col("user_id"), 0.02)).head().getLong(0)
      val rel = math.abs(approx - exact).toDouble / exact
      assert(rel < 0.05, s"HLL++ estimate $approx vs exact $exact (rel err $rel)")
    } finally spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
  }
}
