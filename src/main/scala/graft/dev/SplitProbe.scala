package graft.dev

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Dev diagnostic (not part of the driver contract): A/B the
  * file-split session settings against a named query, N repeats each,
  * reporting per-run seconds, min, and the scan partition count. Used
  * to pin the q1_agg round-4 bench regression to its cause.
  * `runMain graft.dev.SplitProbe <query> [sfDir] [repeats]` */
object SplitProbe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 5
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fn = SparkEntry.queries(name)

    def run(): Double = {
      val t0 = System.nanoTime(); fn(spark, sfDir).count(); (System.nanoTime() - t0) / 1e9
    }
    def scanParts(): Int = fn(spark, sfDir).rdd.getNumPartitions

    // JIT/codegen warmup under default settings
    (1 to 3).foreach(_ => run())

    val configs = Seq(
      "r4 (min=32, open=1MB)" -> Seq(
        "spark.sql.files.minPartitionNum" -> "32",
        "spark.sql.files.openCostInBytes" -> "1048576"),
      "defaults (min unset, open=4MB)" -> Seq(
        "spark.sql.files.minPartitionNum" -> "",
        "spark.sql.files.openCostInBytes" -> "4194304"),
      "maxPartitionBytes=8MB" -> Seq(
        "spark.sql.files.minPartitionNum" -> "",
        "spark.sql.files.openCostInBytes" -> "4194304",
        "spark.sql.files.maxPartitionBytes" -> "8388608")
    )
    configs.foreach { case (label, settings) =>
      settings.foreach { case (k, v) =>
        if (v.isEmpty) spark.conf.unset(k) else spark.conf.set(k, v)
      }
      val times = (1 to reps).map(_ => run())
      println(f"[splitprobe] $label%-32s parts=${scanParts()}%3d min=${times.min}%.3f runs=${times.map(t => f"$t%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
