package graft.dev

import graft.ml.AnnSearch
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measure the closure's compiled scoring kernel (CellPairSims) and
  * chunk-row geometry at 64 vs 256 dims — the SCALE.md evidence for
  * the wide-dim re-gate: bytes per chunk row, candidate pairs scored,
  * and pairs/second through the kernel at each width. */
object WideKernelProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // dim-1024 corpus: the wideEmbs shift+scale map with 16 blocks
    // instead of 4 — same linear well-conditioned structure, so the
    // planted clusters (and the tau=0.8 closure semantics) survive
    val wide1024 = graft.QueriesText.clusteredEmbs(spark, dir).select(col("id"),
      expr("""transform(sequence(0, 1023), j ->
             |  element_at(vec, cast(((j % 64 + 7 * (j div 64)) % 64) + 1 AS int))
             |    * (1.0d + 0.25d * cast((31 * (j % 64) + 17 * (j div 64)) % 5 AS double)))""".stripMargin)
        .as("vec"))
    for ((label, corpus) <- Seq(
      "clu64" -> graft.QueriesText.clusteredEmbs(spark, dir),
      "wide256" -> graft.QueriesText.wideEmbs(spark, dir),
      "wide1024" -> wide1024)) {
      val c = corpus.cache(); c.count()
      val centroids = AnnSearch.kmeansCentroidsExact(c, 15, iters = 2)
      val dim = c.selectExpr("size(vec)").head().getInt(0)
      val n = c.count()
      val (kept, total) = AnnSearch.closureCellPairStats(c, centroids, tau = 0.8)
      // candidate volume = pairs the kernel actually scores: sum over
      // kept cell pairs of |A|·|B| (same-cell: n(n-1)/2)
      val sizes = AnnSearch.ivfAssign(c, centroids).groupBy("cell").count()
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      def warmAndTime(): (Double, Long) = {
        val t0 = System.nanoTime()
        val out = AnnSearch.cosineNearPairs(c, centroids, tau = 0.8).count()
        ((System.nanoTime() - t0) / 1e9, out)
      }
      warmAndTime()
      val (sec, outPairs) = Seq(warmAndTime(), warmAndTime()).minBy(_._1)
      val bytesPerMember = 8L * dim + 48L
      println(f"$label%8s dim=$dim%4d n=$n%6d cells=${sizes.size}%4d " +
        f"kept=$kept/$total chunkRowBytes(512)=${512 * bytesPerMember}%9d " +
        f"outPairs=$outPairs%8d wall=$sec%7.2fs")
    }
    spark.stop()
  }
}
