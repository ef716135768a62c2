package graft

import org.apache.spark.sql.functions._

/** Runtime bloom-filter join pruning: when a selective dimension
  * filter feeds a shuffle join, Catalyst injects a bloom filter built
  * from the dim keys into the fact side, so fact rows that cannot
  * match are dropped AT THE SCAN, before the shuffle — on a 100 TB
  * fact table this is the difference between shuffling the corpus and
  * shuffling the matching slice. The engine leans on this instead of
  * hand-rolled semi-join pre-filters; this spec pins that the
  * injection actually fires on the engine's join shape.
  */
class RuntimeFilterSpec extends SparkSpec {
  import spark.implicits._

  test("a selective dim filter injects a bloom filter into the fact side") {
    val dir = java.nio.file.Files.createTempDirectory("graft_rtf").toString
    spark.range(0, 200000).select(
      col("id").as("k"),
      (col("id") % 1000).as("g")
    ).write.parquet(s"$dir/fact")
    spark.range(0, 2000).select(
      col("id").as("k"),
      (col("id") % 7).as("cat")
    ).write.parquet(s"$dir/dim")

    val prev = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
      "spark.sql.autoBroadcastJoinThreshold"
    ).map(k => k -> scala.util.Try(spark.conf.get(k)).toOption)
    try {
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      // tiny test tables: drop the size gates so the rule can fire
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "1B")
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB")
      // force a shuffle join — a broadcast join prunes via reuse instead
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

      val fact = spark.read.parquet(s"$dir/fact")
      val dim = spark.read.parquet(s"$dir/dim").filter(col("cat") === 3)
      val q = fact.join(dim, "k").groupBy("g").agg(count(lit(1)).as("n"))
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.toLowerCase.contains("might_contain"),
        s"no runtime bloom filter injected:\n$plan")
      // and the pruned plan still computes the right answer
      val expect = 2000 / 7 + (if (3 < 2000 % 7) 1 else 0)
      assert(q.agg(sum("n")).as[Long].head() === expect.toLong)
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
