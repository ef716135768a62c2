package graft

import org.apache.spark.sql.functions._

/** Bucketing: the co-located fact-fact join SCALE.md promises. Writing
  * both sides bucketed by the join key lets the join run with ZERO
  * exchanges — the pre-shuffle is paid once at write time, then every
  * subsequent join on that key is shuffle-free. This spec proves the
  * claim on real fixture data instead of leaving it prose. */
class BucketedJoinSpec extends SparkSpec {

  test("joins on bucketed tables plan zero exchanges") {
    // external tables with explicit paths — the static warehouse dir is
    // never touched, data lands in this temp dir
    val wh = java.nio.file.Files.createTempDirectory("graft_bucketed").toString
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    try {
      val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
        .select("o_orderkey", "o_totalprice")
      val lineitem = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
        .select("l_orderkey", "l_quantity")
      orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .option("path", s"$wh/b_orders").saveAsTable("b_orders")
      lineitem.withColumnRenamed("l_orderkey", "o_orderkey")
        .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .option("path", s"$wh/b_lineitem").saveAsTable("b_lineitem")
      // bucketed join must not exchange either side
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force the non-broadcast path
      try {
        val joined = spark.table("b_orders").join(spark.table("b_lineitem"), "o_orderkey")
        val plan = joined.queryExecution.executedPlan.toString
        assert(!plan.contains("Exchange"), s"bucketed join still exchanges:\n$plan")
        assert(plan.contains("SortMergeJoin"), s"expected sort-merge over buckets:\n$plan")
        // and it computes the same result as the plain shuffle join
        val expect = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
          .select("o_orderkey", "o_totalprice")
          .join(
            spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
              .select(col("l_orderkey").as("o_orderkey"), col("l_quantity")),
            "o_orderkey")
          .count()
        assert(joined.count() == expect)
      } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }
}
