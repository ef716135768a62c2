package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Per-stage attribution for stream_distinct_hll (15.8 s driver /
  * 8.9 s local at sf0.1 in r14 — the heaviest streaming cell): the
  * cell's phases are (1) the events collect+sort feeding the
  * MemoryStream, (2) the 4-micro-batch streaming query itself
  * (flatMapGroupsWithState over ~1M typed rows), (3) the batch-exact
  * countDistinct side, (4) the final join. Timed separately so an
  * optimization targets the measured phase, not a guess. */
object StreamHllProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .appName("stream-hll-probe")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.files.minPartitionNum", 32)
      .config("spark.sql.files.openCostInBytes", "1048576")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    def time[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val a = body
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      a
    }
    println(f"cal: ${graft.Bench.calibration(spark)}%.2f s  drv: ${graft.Bench.driverCalibration()}%.2f s")
    val events = graft.util.EventTime.withEpochSec(
      spark.read.parquet(s"$dir/events.parquet"))
    for (pass <- 1 to 2) {
      System.gc()
      val rows = time(s"collect+sort p$pass") {
        events.select(col("user_id"), col("sec"), col("event_type"))
          .orderBy("sec", "user_id")
          .as[(Long, Long, String)]
          .collect()
      }
      println(s"  rows: ${rows.length}")
      val maxSec = rows.iterator.map(_._2).max
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      implicit val sqlCtx = spark.sqlContext
      val mem = MemoryStream[(java.sql.Timestamp, Long, String)]
      val df = mem.toDF().toDF("ts", "user_id", "event_type")
      val qn = "probe_hll_" + pass
      val q = graft.streaming.EventStreams.distinctUsersApprox(spark, df)
        .writeStream.format("memory").queryName(qn).outputMode("append").start()
      try {
        val data = rows.map { case (u, sec, et) => (new java.sql.Timestamp(sec * 1000), u, et) }
        val (h1, h2) = data.splitAt(data.length / 2)
        time("  batch1 (h1)") { mem.addData(h1.toIndexedSeq); q.processAllAvailable() }
        time("  batch2 (h2)") { mem.addData(h2.toIndexedSeq); q.processAllAvailable() }
        time("  bump1") {
          mem.addData(Seq((new java.sql.Timestamp((maxSec + 1200) * 1000), -1L, "s")))
          q.processAllAvailable()
        }
        time("  bump2") {
          mem.addData(Seq((new java.sql.Timestamp((maxSec + 3000) * 1000), -1L, "s")))
          q.processAllAvailable()
        }
        time("  sink read+checkpoint") {
          spark.table(qn).filter(col("window_start") <= maxSec)
            .select(col("window_start"), col("event_type"), col("n_users").as("n_approx"))
            .localCheckpoint(eager = true).count()
        }
      } finally q.stop()
      time("exact side") {
        events.groupBy((floor(col("sec") / 300) * 300).cast("long").as("window_start"), col("event_type"))
          .agg(countDistinct("user_id").as("n_users")).count()
      }
      time("full cell") { graft.Bench.catalog("stream_distinct_hll")(spark, dir).count() }
    }
    println(f"cal_post: ${graft.Bench.calibration(spark)}%.2f s")
    spark.stop()
  }
}
