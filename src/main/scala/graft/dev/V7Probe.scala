package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Per-stage attribution for corpus_pipeline_v7 — the one r14 tree
  * race that did not come back equal (12.0 vs 10.5 s local, a 1.14×
  * residual the day's host band could not fully absorb). v7's chain is
  * INDEX-FREE (curation → memoized classifier training → map-side
  * scoring → rollup; none of the r14 pointer/cachedDim paths), so the
  * candidate stages are:
  *   1. the curation subtree (quality/langId gate, rep filter, exact
  *      dedup, LSH verify, components, Pin materialization),
  *   2. classifier training (first call only — memoized per dir),
  *   3. scoring + join + rollup over the pinned survivors.
  * Each stage is timed separately with a fixed-work calibration
  * bracket, bench-style (GC barrier, min-of-2 steady), so a v7 uptick
  * decomposes into a NAMED stage or reads as host. */
object V7Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .appName("v7-probe")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.files.minPartitionNum", 32)
      .config("spark.sql.files.openCostInBytes", "1048576")
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    def time[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val a = body
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      a
    }
    println(f"cal: ${graft.Bench.calibration(spark)}%.2f s  drv: ${graft.Bench.driverCalibration()}%.2f s")
    // stage 1: the curation subtree alone (Pin re-materializes per call)
    for (i <- 1 to 3) {
      System.gc()
      time(s"curationKept pass $i") {
        graft.QueriesText.curationKept(spark, dir).count()
      }
    }
    // stages 2+3 ride the full cell: pass 1 = curation + TRAINING +
    // score (training memoizes), passes 2-3 = curation + score only;
    // (pass1 - pass2) - (curation alone) ≈ training, pass2 - curation
    // ≈ score+rollup
    val fn = graft.Bench.catalog("corpus_pipeline_v7")
    for (i <- 1 to 3) {
      System.gc()
      time(s"v7 cell pass $i") { fn(spark, dir).count() }
    }
    println(f"cal_post: ${graft.Bench.calibration(spark)}%.2f s")
    spark.stop()
  }
}
