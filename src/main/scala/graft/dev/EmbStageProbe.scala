package graft.dev

import graft.ml.{AnnSearch, IvfIndex}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Per-stage attribution for the `dedup_incremental_emb` bench cell
  * (the r13 watch: +51% local at sf0.1 while its path took the
  * snapshot plumbing and listing changes). Splits the probe into its
  * stages — candidate-cell bound filter, candidate-cell collect,
  * partition-pruned encoded scan, float fetch + exact scoring (the
  * full probe) — each timed over repeated passes after a warm first,
  * plus the bench cell itself. Run at sf0.1 and sf1_synth; a stage
  * ratio that tracks the host calibration is host, one that does not
  * names the code. */
object EmbStageProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .appName("emb-stage-probe")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.files.minPartitionNum", 32)
      .config("spark.sql.files.openCostInBytes", "1048576")
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    println(f"cal: ${graft.Bench.calibration(spark)}%.2f drv_cal: ${graft.Bench.driverCalibration()}%.2f")
    val corpus = graft.QueriesText.clusteredEmbs(spark, dir)
    val old = corpus.filter(pmod(col("id"), lit(3)) =!= 0)
    val shard = corpus.filter(pmod(col("id"), lit(3)) === 0).localCheckpoint(true)
    val idx = graft.util.TempDirs.scratch("embprobe_idx").toString
    var t0 = System.nanoTime()
    val centroids = AnnSearch.kmeansCentroidsExact(old, 14, iters = 2)
    val book = AnnSearch.pqBook(old, m = 32, stride = 10)
    IvfIndex.build(old, centroids, book, idx)
    println(f"build: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    val oldCp = old.localCheckpoint(true)
    def time(label: String)(body: => Long): Unit =
      for (i <- 1 to 3) {
        val s = System.nanoTime()
        val n = body
        println(f"$label pass $i: ${(System.nanoTime() - s) / 1e9}%.3f s (n=$n)")
      }
    // micro-stages: the per-call constant costs candidateCells pays
    time("micro repair") {
      graft.util.TableIndex.repair(spark, idx); 0L
    }
    time("micro loadFloats miss") {
      IvfIndex.loadFloats(spark, idx).isDefined; 0L
    }
    time("micro cellGeometry") {
      IvfIndex.cellGeometry(spark, idx).count()
    }
    time("micro raw centroid read") {
      spark.read.parquet(s"$idx/centroids.parquet").count()
    }
    time("stage candidateCells") {
      IvfIndex.candidateCells(spark, idx, shard, 0.8).count()
    }
    val cand = IvfIndex.candidateCells(spark, idx, shard, 0.8).localCheckpoint(true)
    time("stage candCells collect") {
      cand.select("cell").distinct().collect().length.toLong
    }
    val candCells = cand.select("cell").distinct().collect().map(_.getLong(0)).toSeq
    time("stage probedEncoded") {
      IvfIndex.probedEncoded(spark, idx, candCells).count()
    }
    time("stage full nearDupsExact") {
      IvfIndex.nearDupsExact(spark, idx, oldCp, shard, tau = 0.8).count()
    }
    // the bench cell end-to-end (memoized index inside — first pass
    // pays its own build)
    val fn = graft.Bench.catalog("dedup_incremental_emb")
    for (i <- 1 to 3) {
      System.gc()
      t0 = System.nanoTime()
      val n = fn(spark, dir).count()
      println(f"cell pass $i: ${(System.nanoTime() - t0) / 1e9}%.3f s (rows=$n)")
    }
    println(f"cal end: ${graft.Bench.calibration(spark)}%.2f")
    spark.stop()
  }
}
