package graft.dev

import graft.ml.AnnSearch
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic: EXACTNESS of the cell-pair-blocked cosine near-pair
  * closure vs brute-force all-pairs ground truth, plus the triangle-
  * inequality pruning stats. Historical note: in r9 this probe (then
  * an nprobe sweep) found the fixed-nprobe recall bug (145/920 true
  * pairs silently dropped at sf0.1); r10 replaced the probe heuristic
  * with the exact triangle-inequality blocking, so the probe now
  * verifies the zero-miss contract directly and reports how much the
  * bound pruned. Run:
  * `sbt "runMain graft.dev.RecallProbe /root/testdata/sf0.1 [full]"` */
object RecallProbe {
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

    // default: the capstone front's embedding subset (curation
    // survivors); `full` as the second arg probes the whole corpus
    // (the standalone dedup_embedding / emb_near_pairs setting)
    val full = args.length > 1 && args(1) == "full"
    val base = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val emb = (if (full) base
      else base.join(
        graft.QueriesText.curationKept(spark, dir).select(col("doc_id").as("id")), Seq("id")))
      .cache()
    val n = emb.count()
    val centroids = AnnSearch.strideCentroids(emb, 25).cache()
    val nlist = centroids.count().toInt
    println(s"== corpus $n vectors, $nlist cells")

    // exact all-pairs ground truth (tau = 0.4, the capstone setting)
    val v = emb.selectExpr("id", "cast(vec as array<double>) vec")
      .as[(Long, Seq[Double])].collect().map { case (i, x) => i -> x.toArray }.toMap
    val ids = v.keys.toArray.sorted
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val truePairs = (for {
      i <- ids.indices.iterator
      j <- (i + 1) until ids.length
      if cos(v(ids(i)), v(ids(j))) >= 0.4
    } yield (ids(i), ids(j))).toSet
    println(s"== ${truePairs.size} true tau>=0.4 pairs")

    val (kept, total) = AnnSearch.closureCellPairStats(emb, centroids, tau = 0.4)
    println(f"== cell pairs kept by the triangle bound: $kept of $total (${kept.toDouble / total}%.3f)")

    val t0 = System.nanoTime()
    val got = AnnSearch.cosineNearPairs(emb, centroids, tau = 0.4)
      .select("a", "b").as[(Long, Long)].collect().toSet
    val sec = (System.nanoTime() - t0) / 1e9
    val missed = truePairs -- got
    val spurious = got -- truePairs
    println(f"== closure: ${got.size} pairs in $sec%.2f s; missed ${missed.size}, spurious ${spurious.size}" +
      (if (missed.nonEmpty && missed.size <= 5) s"  $missed" else ""))
    spark.stop()
  }
}
