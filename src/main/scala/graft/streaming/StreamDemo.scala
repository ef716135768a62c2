package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** End-to-end streaming demo over the events table: replays the static
  * parquet as a file-source stream (one batch), runs the watermarked
  * windowed counts, and prints the top windows. Usage:
  * `runMain graft.streaming.StreamDemo [sfDir]`. */
object StreamDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val schema = spark.read.parquet(s"$sfDir/events.parquet").schema
    // the file source streams a DIRECTORY: stage the events file alone
    val stageDir = java.nio.file.Files.createTempDirectory("stream-events")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      stageDir.resolve("events.parquet")
    )
    val stream0 = spark.readStream.schema(schema).parquet(stageDir.toString)
    // normalize ts (long nanos or timestamp micros, fixture-dependent)
    // to whole-second event time — see graft.util.EventTime
    val stream = stream0
      .withColumn("ts", timestamp_seconds(graft.util.EventTime.epochSec(stream0)))

    val counts = EventStreams.windowedCounts(stream, window_ = "1 hour", watermark = "2 hours")
    val q = counts.writeStream.format("memory").queryName("demo").outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    val out = spark.table("demo").orderBy(desc("n")).limit(10)
    out.show(10, truncate = false)
    println(s"windows=${spark.table("demo").count()}")
    spark.stop()
  }
}
