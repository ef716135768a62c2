package graft.dev

import graft.text.IncrementalDedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Isolates corpus_pipeline_v8's steady-pass stages at the synth scale
  * step (the r13 ×1.82 cell): index-probe (processShard — the one v8
  * stage whose read path changed in r13) vs classifier scoring+rollup
  * (unchanged code), each timed separately over repeated runs. */
object V8Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .appName("v8-probe")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.files.minPartitionNum", 32)
      .config("spark.sql.files.openCostInBytes", "1048576")
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = if (args.nonEmpty) args(0) else "/tmp/graft_sf1_synth"
    val d = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"), col("source"))
    val old = d.filter(pmod(col("doc_id"), lit(4)) =!= 0)
    val shard = d.filter(pmod(col("doc_id"), lit(4)) === 0)
    val idx = graft.util.TempDirs.scratch("v8probe_idx").toString
    var t0 = System.nanoTime()
    IncrementalDedup.buildIndex(old, "doc_id", "text", idx)
    println(f"build: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    for (i <- 1 to 3) {
      t0 = System.nanoTime()
      val n = IncrementalDedup.processShard(spark, idx, shard, "doc_id", "text", tau = 0.8)
        .filter(col("kept")).count()
      println(f"processShard pass $i: ${(System.nanoTime() - t0) / 1e9}%.2f s (kept=$n)")
    }
    // micro: the two band-table open forms
    for (i <- 1 to 3) {
      t0 = System.nanoTime()
      val a = graft.util.TableIndex.readTableIfExists(spark, idx, "bands.parquet")
      println(f"readTableIfExists: ${(System.nanoTime() - t0) / 1e6}%.1f ms (defined=${a.isDefined})")
      t0 = System.nanoTime()
      val p = new org.apache.hadoop.fs.Path(s"$idx/bands.parquet")
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val b = if (fs.exists(p)) Some(spark.read.parquet(p.toString)) else None
      println(f"exists+read:       ${(System.nanoTime() - t0) / 1e6}%.1f ms (defined=${b.isDefined})")
    }
    // the full bench cell, bench-style (first + min-of-2 steady)
    val fn = graft.Bench.catalog("corpus_pipeline_v8")
    for (i <- 1 to 3) {
      System.gc()
      t0 = System.nanoTime()
      val n = fn(spark, dir).count()
      println(f"v8 cell pass $i: ${(System.nanoTime() - t0) / 1e9}%.2f s (rows=$n)")
    }
    spark.stop()
  }
}
