package graft.dev

import org.apache.spark.sql.SparkSession

/** Times corpus_pipeline_v7 (plus v8/v9/dsir_select) bench-style for a
  * same-minute tree race — identical source in both trees. */
object V7Race {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .appName("v7-race")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.files.minPartitionNum", 32)
      .config("spark.sql.files.openCostInBytes", "1048576")
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    println(f"cal: ${graft.Bench.calibration(spark)}%.2f  drv: ${graft.Bench.driverCalibration()}%.2f")
    for (name <- Seq("corpus_pipeline_v7", "corpus_pipeline_v8", "corpus_pipeline_v9", "dsir_select")) {
      val fn = graft.Bench.catalog(name)
      for (i <- 1 to 3) {
        System.gc()
        val t0 = System.nanoTime()
        val n = fn(spark, dir).count()
        println(f"$name pass $i: ${(System.nanoTime() - t0) / 1e9}%.2f s (rows=$n)")
      }
    }
    println(f"cal_post: ${graft.Bench.calibration(spark)}%.2f")
    spark.stop()
  }
}
