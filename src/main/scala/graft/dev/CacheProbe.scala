package graft.dev

import graft.pipelines.Layouts
import graft.pipelines.Acceptance
import org.apache.spark.sql.SparkSession

/** Dev diagnostic (not part of the driver contract): A/B the
  * tiled_acc_hist fixture-cache decision under bench conditions
  * (local[32], minPartitionNum=32, warm first pass, GC barrier,
  * min-of-2 steady) — r4 cached the 1e6-event fixture (2.89 s), r6
  * dropped the cache citing a 0.3 s vs 1.4 s micro-measure yet the
  * cell got ~1 s SLOWER; this probe decides with the same harness the
  * bench uses. `runMain graft.dev.CacheProbe [repeats]` */
object CacheProbe {
  def main(args: Array[String]): Unit = {
    val reps = if (args.nonEmpty) args(0).toInt else 3
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.files.minPartitionNum", "32")
      .config("spark.sql.files.openCostInBytes", "1048576")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val sensors = graft.ops.DeeTiling.layoutFaceSensors(spark, "updated")
    val fixture = Layouts.resolveFixture("tiled_acceptance_seed42.parquet")

    def uncached(): Long = {
      val p = spark.read.parquet(fixture)
        .select("event_id", "x", "y", "theta", "phi", "eta")
      Acceptance.histSparse(spark, Acceptance.hitCountsKin(spark, p, sensors), p.count()).count()
    }
    def cached(): Long = {
      val p = spark.read.parquet(fixture)
        .select("event_id", "x", "y", "theta", "phi", "eta")
        .cache()
      try Acceptance.histSparse(spark, Acceptance.hitCountsKin(spark, p, sensors), p.count()).count()
      finally p.unpersist(blocking = true)
    }
    def countFirstUncached(): Long = {
      // count() before the join, so the count scan warms the OS page
      // cache for the join scan (ordering effect isolated)
      val p = spark.read.parquet(fixture)
        .select("event_id", "x", "y", "theta", "phi", "eta")
      val n = p.count()
      Acceptance.histSparse(spark, Acceptance.hitCountsKin(spark, p, sensors), n).count()
    }

    def time(label: String, f: () => Long): Unit = {
      f() // warm
      System.gc()
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); f(); (System.nanoTime() - t0) / 1e9
      }
      println(f"[cacheprobe] $label%-24s min=${times.min}%.3f runs=${times.map(t => f"$t%.3f").mkString(",")}")
    }

    time("uncached (r6 current)", () => uncached())
    time("cached (r4 shape)", () => cached())
    time("uncached count-first", () => countFirstUncached())
    spark.stop()
  }
}
