package graft

import org.apache.spark.sql.functions._

/** Partition pruning — the other half of the "don't read 100 TB to
  * answer a 1-partition question" story. Static pruning: a literal
  * filter on the partition column must reach the scan as a
  * PartitionFilter (no data files of other partitions opened). Dynamic
  * partition pruning (DPP): a selective dimension-side filter must
  * prune fact partitions at runtime through the join. */
class PartitionPruningSpec extends SparkSpec {

  private lazy val factDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_part").toString
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    try {
      spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .select(col("event_id"), col("user_id"), col("value"), col("event_type"))
        .write.partitionBy("event_type").parquet(s"$dir/events_p")
    } finally spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
    s"$dir/events_p"
  }

  test("a partition-column filter prunes statically at the scan") {
    val q = spark.read.parquet(factDir).filter(col("event_type") === "click")
    val scan = q.queryExecution.executedPlan.toString
      .linesIterator.find(_.contains("FileScan")).getOrElse("")
    assert(scan.contains("PartitionFilters:") && scan.contains("event_type"),
      s"no partition filter reached the scan: $scan")
    // count must come from the one partition only — and be correct
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    try {
      val expect = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .filter(col("event_type") === "click").count()
      assert(q.count() == expect)
    } finally spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
  }

  test("a selective dimension filter prunes fact partitions dynamically (DPP)") {
    import spark.implicits._
    // the dim must be a real source with a live Filter node — a literal
    // LocalRelation constant-folds the predicate away and the DPP rule
    // sees no selective filter to reuse
    val dimDir = java.nio.file.Files.createTempDirectory("graft_dim").toString
    Seq(("click", 1), ("view", 2)).toDF("t_name", "t_group")
      .write.parquet(s"$dimDir/types")
    val dim = spark.read.parquet(s"$dimDir/types")
    val q = spark.read.parquet(factDir)
      .join(dim.filter(col("t_group") === 1), col("event_type") === col("t_name"))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruningexpression"),
      s"no dynamic partition pruning in plan:\n$plan")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    try {
      val expect = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .filter(col("event_type") === "click").count()
      assert(q.count() == expect)
    } finally spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
  }
}
