package graft.dev

import graft.ml.AnnSearch
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Times the IVFADC stages separately to locate the synth-scale cost:
  * codebook build, encode scan, probe selection, ADC+window shortlist,
  * full query. Run: runMain graft.dev.PqStageProbe /tmp/graft_sf1_synth */
object PqStageProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_sf1_synth")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.expressions.Window

    def t[A](label: String)(f: => A): A = {
      val s = System.nanoTime(); val r = f
      println(f"STAGE $label: ${(System.nanoTime() - s) / 1e9}%.2f s"); r
    }

    val corpus = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val n = t("corpus.count")(corpus.count())
    println(s"n=$n")
    val queries = corpus.filter(pmod(col("id"), lit(50)) === 0)
    val centroids = AnnSearch.strideCentroids(corpus, 25)
    val book = t("pqBook")(AnnSearch.pqBook(corpus, m = 32, stride = 10))
    val cents = t("collectCentroids")(AnnSearch.collectCentroids(centroids))
    val nprobe = math.ceil(0.85 * cents.ids.length).toInt
    val shortlist = math.ceil(0.16 * n).toInt
    println(s"nlist=${cents.ids.length} nprobe=$nprobe shortlist=$shortlist ksub=${book.ksub}")

    val encodedCells = corpus.select(
      graft.functions.NearestCells.topCells(col("vec"), cents, 1).getItem(0).as("cell"),
      col("id").as("n_id"),
      graft.functions.PqOps.codes(col("vec"), book).as("codes"),
      AnnSearch.norm(col("vec")).as("n_norm"))
    t("encode scan (count)")(encodedCells.count())

    val probes = queries
      .select(col("id").as("q_id"), col("vec").as("q_vec"), AnnSearch.norm(col("vec")).as("q_norm"))
      .withColumn("cell", explode(graft.functions.NearestCells.topCells(col("q_vec"), cents, nprobe)))
    t("probe selection (count)")(probes.count())

    val joined = probes.join(encodedCells, Seq("cell")).filter(col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("n_id"),
        (graft.functions.PqOps.adc(col("q_vec"), col("codes"), book)
          / (col("q_norm") * col("n_norm"))).as("adc"))
    t("cell join + ADC (count)")(joined.count())

    t("ADC full evaluation (sum)")(joined.agg(sum("adc")).collect())
    println(joined.agg(sum("adc")).queryExecution.executedPlan.toString.take(3000))

    // variant: q_vec pre-cast to array<double> at the probe projection
    val probesD = queries
      .select(col("id").as("q_id"), col("vec").cast("array<double>").as("q_vec"),
        AnnSearch.norm(col("vec")).as("q_norm"))
      .withColumn("cell", explode(graft.functions.NearestCells.topCells(col("q_vec"), cents, nprobe)))
    val joinedD = probesD.join(encodedCells, Seq("cell")).filter(col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("n_id"),
        (graft.functions.PqOps.adc(col("q_vec"), col("codes"), book)
          / (col("q_norm") * col("n_norm"))).as("adc"))
    t("ADC full evaluation PRE-CAST (sum)")(joinedD.agg(sum("adc")).collect())

    // variant: score with DotProduct against the float corpus (the IVF
    // shape) on the SAME join, for a direct apples-to-apples cost
    val joinedDot = probesD.join(
      corpus.select(
        graft.functions.NearestCells.topCells(col("vec"), cents, 1).getItem(0).as("cell"),
        col("id").as("n_id"), col("vec").as("n_vec")), Seq("cell"))
      .filter(col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("n_id"),
        (AnnSearch.dot(col("q_vec"), col("n_vec"))).as("adc"))
    t("DotProduct same-join evaluation (sum)")(joinedDot.agg(sum("adc")).collect())
    val noAdc = probes.join(encodedCells, Seq("cell")).filter(col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("n_id"), col("n_norm").as("adc"))
      .withColumn("arank", row_number().over(Window.partitionBy("q_id").orderBy(desc("adc"), col("n_id"))))
      .filter(col("arank") <= shortlist)
    t("window WITHOUT ADC (count)")(noAdc.count())

    val shortIds = joined
      .withColumn("arank", row_number().over(Window.partitionBy("q_id").orderBy(desc("adc"), col("n_id"))))
      .filter(col("arank") <= shortlist)
      .select("q_id", "n_id")
    t("shortlist window (count)")(shortIds.count())

    val full = AnnSearch.ivfPqTopK(queries, corpus, centroids, book, 10, nprobe, shortlist)
    t("full ivfPqTopK (count)")(full.count())
    spark.stop()
  }
}
