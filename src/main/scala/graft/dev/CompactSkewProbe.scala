package graft.dev

import graft.ml.{AnnSearch, IvfIndex}
import graft.util.TableIndex
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the r14 partitioned-compaction rewrite under deliberate
  * skew: a corpus with ~90% of its vectors in ONE cell, compacted via
  * the byte-derived per-key salt. Reports the write-task count
  * (distinct part numbers across the rewritten table — each task
  * writes at most one file per partition directory), the file count
  * under the hot cell, and wall time. The pre-r14
  * `repartition(col("cell"))` shape would show exactly ONE file and
  * one task for the hot cell regardless of data size — the
  * straggler-wall the rewrite removes. Numbers land in SCALE.md. */
object CompactSkewProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .appName("compact-skew-probe")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val n = if (args.nonEmpty) args(0).toLong else 2000000L
    // dim-8 synthetic: 90% of ids in cluster 0 (basis e0), 10% in
    // cluster 1 (e1), deterministic hash jitter so rows are distinct
    val corpus = spark.range(n).select(col("id"),
      expr("""transform(sequence(0, 7), i ->
             |  CASE WHEN i = CASE WHEN id % 10 < 9 THEN 0 ELSE 1 END
             |       THEN 1.0 + 0.0001 * cast(id % 13 AS double)
             |       ELSE 0.0001 * cast(pmod(xxhash64(id, i), 7) AS double) END)""".stripMargin)
        .as("vec"))
    import spark.implicits._
    val centroids = Seq(
      (0L, Seq(1.0, 0, 0, 0, 0, 0, 0, 0)),
      (1L, Seq(0, 1.0, 0, 0, 0, 0, 0, 0))).toDF("c_id", "c_vec")
    val book = AnnSearch.pqBook(corpus.limit(5000), m = 2, stride = 7)
    val idx = graft.util.TempDirs.scratch("cskew_idx").toString
    var t0 = System.nanoTime()
    IvfIndex.build(corpus, centroids, book, idx)
    println(f"build ($n rows): ${(System.nanoTime() - t0) / 1e9}%.1f s")
    IvfIndex.deleteInPlace(spark, idx, spark.range(0, 100).toDF("id"))
    val out = graft.util.TempDirs.scratch("cskew_out").toString
    t0 = System.nanoTime()
    IvfIndex.compact(spark, idx, out)
    println(f"compact: ${(System.nanoTime() - t0) / 1e9}%.1f s")
    def files(path: String): Seq[java.io.File] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(path)).filter(_.getName.endsWith(".parquet"))
    }
    val enc = files(s"$out/encoded.parquet")
    val hot = files(s"$out/encoded.parquet/cell=0")
    // part-XXXXX prefix identifies the writing task
    val tasks = enc.map(_.getName.split("-")(1)).distinct.size
    println(s"encoded: ${enc.size} files, $tasks write tasks, hot cell=0: ${hot.size} files " +
      s"(pre-r14 shape: 1 file / 1 task per cell)")
    val sizes = hot.map(_.length() / 1048576.0)
    if (sizes.nonEmpty)
      println(f"hot-cell file sizes MiB: min=${sizes.min}%.1f max=${sizes.max}%.1f")
    spark.stop()
  }
}
