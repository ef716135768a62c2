package graft.dev

import org.apache.spark.sql.SparkSession

/** Dev utility: wall-time one SparkEntry query (count only, warm
  * session, min of `reps`). `runMain graft.dev.MiniTime <name> [sfDir] [reps]` */
object MiniTime {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val reps = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.files.minPartitionNum", cpus)
      .config("spark.sql.files.openCostInBytes", "1048576")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.GraftSession.attach(spark)
    var best = Double.MaxValue
    for (r <- 1 to reps) {
      val t0 = System.nanoTime()
      val n = graft.Bench.catalog(name)(spark, sfDir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"MINITIME $name rep$r: $sec%.3f s, rows=$n")
      best = math.min(best, sec)
    }
    println(f"MINITIME $name best: $best%.3f s")
    spark.stop()
  }
}
