package graft.dev

import graft.ml.AnnSearch
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the ADC-cosine rank that PQ retrieval needs to cover the
  * TRUE top-10 of every query on a fixture dir — the empirical basis
  * for the `shortlist` fraction in `ann_topk_pq` (same method as
  * KmProbeRank for the IVF probe fraction).
  *
  * Usage: runMain graft.dev.PqProbe /root/testdata/sf0.01 [m] [stride] [iters]
  */
object PqProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val m = if (args.length > 1) args(1).toInt else 8
    val stride = if (args.length > 2) args(2).toInt else 25
    val iters = if (args.length > 3) args(3).toInt else 0
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import org.apache.spark.sql.expressions.Window

    val corpus = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val n = corpus.count()
    val queries = corpus.filter(pmod(col("id"), lit(50)) === 0)

    // true top-10 per query (rounded-cosine ordering, the oracle's)
    val qb = broadcast(queries.select(col("id").as("q_id"), col("vec").as("q_vec")))
    val truth = corpus.select(col("id").as("n_id"), col("vec").as("n_vec"))
      .join(qb, col("q_id") =!= col("n_id"))
      .withColumn("sim", round(AnnSearch.cosine(col("q_vec"), col("n_vec")), 6))
      .withColumn("rank", row_number().over(Window.partitionBy("q_id").orderBy(desc("sim"), col("n_id"))))
      .filter(col("rank") <= 10)
      .select("q_id", "n_id")

    val book =
      if (iters == 0) AnnSearch.pqBook(corpus, m, stride)
      else AnnSearch.pqBookRefined(corpus, m, stride, iters)
    val encoded = AnnSearch.pqEncode(corpus, book)
    val adc = encoded
      .join(broadcast(queries.select(
        col("id").as("q_id"), col("vec").as("q_vec"),
        AnnSearch.norm(col("vec")).as("q_norm"))), col("q_id") =!= col("n_id"))
      .withColumn("adc", graft.functions.PqOps.adc(col("q_vec"), col("codes"), book)
        / (col("q_norm") * col("n_norm")))
      .withColumn("arank", row_number().over(Window.partitionBy("q_id").orderBy(desc("adc"), col("n_id"))))
      .select("q_id", "n_id", "arank")

    val joined = truth.join(adc, Seq("q_id", "n_id"))
    val worst = joined.agg(max("arank")).collect()(0).getInt(0)
    val dist = joined.groupBy().agg(
      expr("percentile(arank, 0.5)").as("p50"),
      expr("percentile(arank, 0.9)").as("p90"),
      max("arank").as("max")).collect()(0)
    println(s"PQPROBE dir=$dir n=$n m=$m stride=$stride iters=$iters ksub=${book.ksub} " +
      s"worstRank=$worst frac=${worst.toDouble / n} p50=${dist.get(0)} p90=${dist.get(1)}")
    spark.stop()
  }
}
