package graft.dev

import graft.ml.AnnSearch
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic: measurements behind the clustered-fixture guards —
  * closure cell-pair pruning fraction and IVF retrieval recall vs
  * probe fraction on the derived clustered corpus.
  * `runMain graft.dev.CluProbe [sfDir]` */
object CluProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val corpus = graft.QueriesText.clusteredEmbs(spark, dir).cache()
    val n = corpus.count()
    val stride = if (args.length > 1) args(1).toInt else 25
    val iters = if (args.length > 2) args(2).toInt else 2
    val refined = AnnSearch.kmeansCentroidsExact(corpus, stride, iters).cache()
    val nlist = refined.count()
    val (kept, total) = AnnSearch.closureCellPairStats(corpus, refined, tau = 0.8)
    println(f"== n=$n nlist=$nlist closure kept $kept/$total (${kept.toDouble / total}%.3f)")

    // ground truth top-10 (rounded-cosine rank, as the oracle)
    val v = corpus.selectExpr("id", "vec").as[(Long, Seq[Double])].collect()
      .map { case (i, x) => i -> x.toArray }.toMap
    val ids = v.keys.toArray.sorted
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val queries = ids.filter(_ % 50 == 0)
    val trueTop = queries.map { q =>
      q -> ids.filter(_ != q)
        .map(o => (o, math.rint(cos(v(q), v(o)) * 1e6) / 1e6))
        .sortBy { case (o, s) => (-s, o) }.take(10).map(_._1).toSet
    }.toMap
    // IVFADC coverage: within the frac-0.2 probed cells, what ADC
    // shortlist fraction covers every true top-10 neighbor?
    locally {
      val book = AnnSearch.pqBook(corpus, m = 32, stride = 10)
      val cents = AnnSearch.collectCentroids(refined)
      val nprobe = math.ceil(0.2 * nlist).toInt
      val probes = corpus.filter(pmod(col("id"), lit(50)) === 0)
        .select(col("id").as("q_id"), col("vec").as("q_vec"), AnnSearch.norm(col("vec")).as("q_norm"))
        .withColumn("cell", explode(graft.functions.NearestCells.topCells(col("q_vec"), cents, nprobe)))
      val encodedCells = corpus.select(
        graft.functions.NearestCells.topCells(col("vec"), cents, 1).getItem(0).as("cell"),
        col("id").as("n_id"),
        graft.functions.PqOps.codes(col("vec"), book).as("codes"),
        AnnSearch.norm(col("vec")).as("n_norm")).localCheckpoint(false)
      import org.apache.spark.sql.expressions.Window
      val ranked = probes.join(encodedCells, Seq("cell"))
        .filter(col("q_id") =!= col("n_id"))
        .select(col("q_id"), col("n_id"),
          (graft.functions.PqOps.adc(col("q_vec"), col("codes"), book) / (col("q_norm") * col("n_norm"))).as("adc"))
        .withColumn("arank", row_number().over(Window.partitionBy("q_id").orderBy(desc("adc"), col("n_id"))))
        .select("q_id", "n_id", "arank").collect()
        .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(r => r.getLong(1) -> r.getInt(2)).toMap }
      var worst = 0
      var missing = 0
      for (q <- queries; t <- trueTop(q)) ranked.get(q).flatMap(_.get(t)) match {
        case Some(r) => worst = math.max(worst, r)
        case None => missing += 1
      }
      println(f"== IVFADC at frac 0.2: worst true-neighbor ADC rank $worst of $n (${worst.toDouble / n.toDouble}%.4f), missing-from-probe $missing")
    }
    for (frac <- Seq(0.05, 0.1, 0.15, 0.2)) {
      val got = graft.QueriesText.ivfTop10Of(corpus, refined, frac)
        .select("q_id", "n_id").collect()
        .groupBy(_.getLong(0)).map { case (k, rs) => k -> rs.map(_.getLong(1)).toSet }
      val missed = queries.map(q => (trueTop(q) -- got.getOrElse(q, Set.empty)).size).sum
      println(f"frac=$frac%.2f (nprobe=${math.ceil(frac * nlist).toInt}): missed $missed true neighbors")
    }
    spark.stop()
  }
}
