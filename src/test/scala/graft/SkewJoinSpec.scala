package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** AQE skew-join handling: the engine's second skew tool (salting is
  * the first, proven exact in PlanShapeSpec). A hot key that would pin
  * one reducer for hours at 100 TB is split by AQE into multiple
  * reader tasks at runtime — no code change in the query. This spec
  * pins that OptimizeSkewedJoin actually fires on the engine's join
  * shape and that the result stays exact. */
class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  test("AQE splits a skewed shuffle-join partition and keeps the join exact") {
    val dir = java.nio.file.Files.createTempDirectory("graft_skew").toString
    // one pathological key carrying ~100k rows, 9 keys with 100 each
    spark.range(0, 100000).select(lit(0L).as("k"), col("id").as("v"))
      .union(spark.range(0, 900).select((col("id") % 9 + 1).as("k"), col("id").as("v")))
      .write.parquet(s"$dir/fact")
    spark.range(0, 10).select(col("id").as("k"), (col("id") * 10).as("w"))
      .write.parquet(s"$dir/dim")

    val prev = Seq(
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.autoBroadcastJoinThreshold"
    ).map(k => k -> scala.util.Try(spark.conf.get(k)).toOption)
    try {
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      // tiny test data: lower the size gates so the skew rule can fire
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

      val fact = spark.read.parquet(s"$dir/fact")
      val dim = spark.read.parquet(s"$dir/dim")
      val q = fact.join(dim, "k").select(sum(col("v") + col("w")).as("s"))
      // materialize THIS dataset: AQE finalizes q.queryExecution itself
      val got = q.collect()(0).getLong(0)
      val plan = q.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan.toString
        case p => p.toString
      }
      assert(plan.contains("skew=true"), s"skew join did not fire:\n$plan")
      val expectHot = (0L until 100000L).sum // w(k=0) = 0
      val expectRest = (0L until 900L).map(i => i + (i % 9 + 1) * 10).sum
      assert(got === expectHot + expectRest)
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
