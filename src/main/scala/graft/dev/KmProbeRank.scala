package graft.dev

import graft.ml.AnnSearch
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic: for the refined-centroid (kmeansCentroidsExact) IVF
  * retrieval, the probe rank each true top-10 neighbor's home cell
  * occupies in its query's centroid ordering — i.e. the nprobe needed
  * for EXACT top-10 at a given sf. Run:
  * `sbt "runMain graft.dev.KmProbeRank /root/testdata/sf0.1"` */
object KmProbeRank {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding").as("vec")).cache()
    for ((label, cents) <- Seq(
        "stride" -> AnnSearch.strideCentroids(emb, 25),
        "kmeans2" -> AnnSearch.kmeansCentroidsExact(emb, 25, iters = 2))) {
      val cs = AnnSearch.collectCentroids(cents)
      val nlist = cs.ids.length
      val v = emb.selectExpr("id", "cast(vec as array<double>) vec")
        .as[(Long, Seq[Double])].collect().map { case (i, x) => i -> x.toArray }.toMap
      def cos(a: Array[Double], b: Array[Double]): Double = {
        var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
        while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
        d / (math.sqrt(na) * math.sqrt(nb))
      }
      // centroid order per vector: cosine desc, id asc (the engine's)
      def cellOrder(x: Array[Double]): Array[Long] =
        cs.ids.zip(cs.vecs).map { case (cid, cv) => (cos(x, cv), cid) }
          .sortBy { case (c, cid) => (-c, cid) }.map(_._2)
      def homeCell(x: Array[Double]): Long = cellOrder(x).head
      val ids = v.keys.toArray.sorted
      val queries = ids.filter(_ % 50 == 0)
      var worst = 0
      var worstPair = (0L, 0L)
      for (q <- queries) {
        val qv = v(q)
        val top10 = ids.filter(_ != q).map(i => (cos(qv, v(i)), i))
          .sortBy { case (c, i) => (-c, i) }.take(10)
        val order = cellOrder(qv)
        val rankOf = order.zipWithIndex.toMap
        for ((_, n) <- top10) {
          val r = rankOf(homeCell(v(n))) + 1
          if (r > worst) { worst = r; worstPair = (q, n) }
        }
      }
      println(s"== $label: nlist=$nlist, worst probe rank needed for exact top-10: " +
        s"$worst (pair $worstPair), fraction ${worst.toDouble / nlist}")
    }
    spark.stop()
  }
}
