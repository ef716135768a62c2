package graft.dev

import org.apache.spark.sql.SparkSession

/** Times one catalog query once (bench-style: one count action, warm
  * session) — for adjudicating single-cell changes without a full
  * bench run. Usage: runMain graft.dev.MiniTime <query> <sfDir> [reps] */
object MiniTime {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = args(1)
    val reps = if (args.length > 2) args(2).toInt else 2
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // mirror the bench's local-parallelism conf — without the
      // advisory minimum a few-MB fixture is ONE split and a
      // 360M-candidate scoring loop runs on one core (this probe's
      // first readings were 7× off the bench's for exactly that)
      .config("spark.sql.files.minPartitionNum", "32")
      .config("spark.sql.files.openCostInBytes", "1048576")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.GraftSession.attach(spark)
    val fn = graft.SparkEntry.queries(name)
    for (r <- 1 to reps) {
      val t0 = System.nanoTime()
      val n = fn(spark, dir).count()
      println(f"MINITIME $name rep$r: ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$n")
    }
    spark.stop()
  }
}
