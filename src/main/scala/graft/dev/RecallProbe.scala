package graft.dev

import graft.ml.AnnSearch
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic: recall of the cell-blocked cosine near-pair search vs
  * exact all-pairs ground truth, as a function of nprobe, over the
  * CAPSTONE's embedding subset (embeddings joined to the curation
  * survivors) at a given sf dir — the measurement behind the r9
  * fraction fix for the capstone semantic-closure stage (the fixed
  * nprobe=17 was exhaustive at sf0.01's handful of cells but a ~28%
  * probe at sf0.1's ~60, where it missed true pairs and made the
  * capstone oracles diverge). Run:
  * `sbt "runMain graft.dev.RecallProbe /root/testdata/sf0.1"` */
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

    for (np <- Seq(17, (0.5 * nlist).ceil.toInt, (0.7 * nlist).ceil.toInt,
                   (0.85 * nlist).ceil.toInt, (0.9 * nlist).ceil.toInt,
                   (0.95 * nlist).ceil.toInt, nlist).distinct.sorted) {
      val got = AnnSearch.cosineNearPairs(emb, centroids, tau = 0.4, nprobe = np)
        .select("a", "b").as[(Long, Long)].collect().toSet
      val missed = truePairs -- got
      println(f"nprobe=$np%3d (${np.toDouble / nlist}%.2f of nlist): missed ${missed.size}%3d" +
        (if (missed.nonEmpty && missed.size <= 5) s"  $missed" else ""))
    }
    spark.stop()
  }
}
