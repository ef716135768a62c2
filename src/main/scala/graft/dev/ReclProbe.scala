package graft.dev

import graft.ml.{AnnSearch, IvfIndex}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Measures what [[graft.ml.IvfIndex.recluster]] RECOVERS on the real
  * sf0.1 clustered corpus (the driver-row lifecycle: centroids+book
  * trained on clusters 0–11 of gen-1, clusters 12–19 appended after
  * training): per index generation,
  *  - candidate-cell pairs of a τ=0.8 probe (the triangle-bound
  *    pruning the drift erodes) as a fraction of queries × nlist,
  *  - the ADC rank of each query's true exact top-1 neighbor (worst
  *    and p50) — the shortlist size a search would need to never miss
  *    the true NN; book staleness shows up here.
  * Three states: drifted (stale centroids+book), reclustered
  * (centroids retrained, book carried), reclustered+retrainBook.
  * Numbers go to SCALE.md. */
object ReclProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .appName("recl-probe")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val corpus = graft.QueriesText.clusteredEmbs(spark, dir).localCheckpoint(true)
    val old = corpus.filter(pmod(col("id"), lit(3)) =!= 0)
    val shard = corpus.filter(pmod(col("id"), lit(3)) === 0)
    val seed = old.filter(pmod(col("id"), lit(20)) < 12)
    val drift = old.filter(pmod(col("id"), lit(20)) >= 12)

    val gen1 = graft.util.TempDirs.scratch("reclprobe_gen1").toString
    IvfIndex.build(seed,
      AnnSearch.kmeansCentroidsExact(seed, 14, iters = 2),
      AnnSearch.pqBook(seed, m = 32, stride = 10), gen1)
    IvfIndex.appendInPlace(spark, gen1, drift)
    val recl = graft.util.TempDirs.scratch("reclprobe_recl").toString
    IvfIndex.recluster(spark, gen1, old, recl, stride = 14, iters = 2)
    // bookStride must hit the DRIFTED clusters: multiples of 10 land
    // only in clusters 0 and 10 (both seed clusters — retrain would be
    // a no-op sample-wise); multiples of 7 sweep all 20 residues
    val reclB = graft.util.TempDirs.scratch("reclprobe_reclb").toString
    IvfIndex.recluster(spark, gen1, old, reclB, stride = 14, iters = 2,
      retrainBook = true, bookStride = 7)

    // exact top-1 neighbor per query (the re-rank ground truth)
    val o = old.select(col("id").as("n_id"), col("vec").cast("array<double>").as("n_vec"),
      AnnSearch.norm(col("vec")).as("n_nrm"))
    val q = shard.select(col("id").as("q_id"), col("vec").cast("array<double>").as("q_vec"),
      AnnSearch.norm(col("vec")).as("q_nrm"))
    val trueNn = q.join(o, col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("n_id"),
        try_divide(AnnSearch.dot(col("q_vec"), col("n_vec")), col("q_nrm") * col("n_nrm")).as("sim"))
      .withColumn("r", row_number().over(Window.partitionBy("q_id").orderBy(desc("sim"), col("n_id"))))
      .filter(col("r") === 1).select(col("q_id"), col("n_id"))
      .localCheckpoint(true)

    def metrics(idx: String, label: String): Unit = {
      val nlist = spark.read.parquet(s"$idx/centroids.parquet").count()
      val nq = shard.count()
      val candPairs = IvfIndex.candidateCells(spark, idx, shard, tau = 0.8).count()
      // ADC ordering over ALL cells (nprobe = nlist): rank of the true NN
      val book = IvfIndex.loadBook(spark, idx)
      val cents = AnnSearch.collectCentroids(spark.read.parquet(s"$idx/centroids.parquet"))
      val enc = IvfIndex.loadEncoded(spark, idx)
      val adcRanks = q
        .join(enc, col("q_id") =!= col("n_id"))
        .select(col("q_id"), col("n_id"),
          (graft.functions.PqOps.adc(col("q_vec"), col("codes"), book)
            / (col("q_nrm") * col("n_norm"))).as("adc"))
        .withColumn("arank", row_number().over(Window.partitionBy("q_id").orderBy(desc("adc"), col("n_id"))))
        .join(trueNn, Seq("q_id", "n_id"))
        .select(col("arank").cast("long"))
        .collect().map(_.getLong(0)).sorted
      val worst = adcRanks.last
      val p50 = adcRanks(adcRanks.length / 2)
      println(f"$label%-18s nlist=$nlist%3d  candPairs=$candPairs%6d (${candPairs.toDouble / (nq * nlist)}%5.3f of qxnlist)  adcRank p50=$p50%4d worst=$worst%5d")
      val _ = cents // centroids collected only to pin the nlist read path
    }
    metrics(gen1, "drifted")
    metrics(recl, "recluster")
    metrics(reclB, "recluster+book")
    spark.stop()
  }
}
