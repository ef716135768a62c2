package graft.dev

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-stage attribution for the capstone chain (r15 optimization
  * round): the four heaviest bench cells (corpus_pipeline_v4..v7,
  * 14–19 s driver-record at sf0.1) all ride the shared
  * curation → embedding-closure → span-removal → (BPE) → packing
  * chain, and the committed explain files only show the post-Pin tail,
  * so stage cost must be MEASURED, not read off a plan. Each stage is
  * timed in isolation with a noop-style count, GC barrier, min-of-2
  * steady after one warm pass — the Bench discipline. */
object CapstoneProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .appName("capstone-probe")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.files.minPartitionNum", 32)
      .config("spark.sql.files.openCostInBytes", "1048576")
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    def steady(label: String)(body: => Long): Unit = {
      def once(): Double = {
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
      }
      once(); System.gc()
      val t = math.min(once(), once())
      println(f"$label%-28s ${t}%.2f s")
    }
    println(f"cal: ${graft.Bench.calibration(spark)}%.2f s  drv: ${graft.Bench.driverCalibration()}%.2f s")

    import graft.QueriesText.{docs, embs, curationKept, tokenizerCapstoneFront, capstoneMerges}
    import graft.text.{ExactSubstr, MinHashLsh, TextOps}
    import graft.ml.AnnSearch


    // --- curation sub-stages (replicated from curationKept, same code) ---
    val d = docs(spark, dir)
    steady("docs scan")(d.count())
    def qDf = TextOps.withQuality(d, col("text"))
      .withColumn("lang_pred", TextOps.langId(col("text")))
      .filter(col("lang_pred") === "en" && col("quality") > 0.5 && col("n_tokens") >= 30)
      .select("doc_id", "source", "text")
    steady("q (quality+lang filter)")(qDf.count())
    def qw = qDf.withColumn("w", TextOps.tokens(col("text")))
    def repKeep = qw.select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(w)-2), i -> concat(w[i], ' ', w[i+1]))")).as("g"))
      .groupBy("doc_id", "g").agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(max("c").as("mx"), sum("c").as("nb"))
      .filter(col("mx") * 50 <= col("nb") * 3)
      .select("doc_id")
    steady("repKeep (bigram gate)")(repKeep.count())
    def q2 = qDf.join(repKeep, Seq("doc_id"))
    def exactKept = q2.groupBy(TextOps.normText(col("text")).as("t"))
      .agg(min("doc_id").as("doc_id")).select("doc_id")
    steady("q2+exactKept")(exactKept.count())
    def kept1 = q2.join(exactKept, Seq("doc_id"))
    // LSH decomposition
    def sets = MinHashLsh.shingleSets(kept1, "doc_id", "text")
    steady("shingleSets")(sets.count())
    val setsM = sets.localCheckpoint(false)
    steady("signatures")(MinHashLsh.signaturesFromSets(setsM, "doc_id").count())
    val sigsM = MinHashLsh.signaturesFromSets(setsM, "doc_id").localCheckpoint(false)
    steady("candidatePairs")(MinHashLsh.candidatePairs(sigsM, "doc_id", bands = 8).count())
    def pairs = MinHashLsh.verifiedPairs(kept1, "doc_id", "text", tau = 0.8)
    steady("verifiedPairs (full)")(pairs.count())
    val pairsM = pairs.localCheckpoint(false)
    steady("components(pairs)")(MinHashLsh.components(pairsM).count())
    steady("curationKept (full)")(curationKept(spark, dir).count())

    // --- embedding closure (v3+ front half) ---
    val kept = curationKept(spark, dir)
    val emb = embs(spark, dir).join(kept.select(col("doc_id").as("id")), Seq("id"))
    val centroids = AnnSearch.strideCentroids(emb, 25)
    def nearPairs = AnnSearch.cosineNearPairs(emb, centroids, tau = 0.4)
    steady("cosineNearPairs")(nearPairs.count())
    val npM = nearPairs.select("a", "b").localCheckpoint(false)
    steady("componentsStar(np)")(MinHashLsh.componentsStar(npM).count())

    // --- span removal over the front-half survivors ---
    val (k2, spanned) = tokenizerCapstoneFront(spark, dir)
    steady("front half (k2)")(k2.count())
    steady("removeDuplicateSpans")(spanned.count())

    // --- BPE learn + encode (v5/v6 additions) ---
    steady("capstoneMerges (learn)") { capstoneMerges(spark, dir).length.toLong }
    val merges = capstoneMerges(spark, dir)
    val spannedM = spanned.localCheckpoint(false)
    steady("encodeCounts(spanned)")(
      graft.text.Bpe.encodeCounts(spannedM, "doc_id", "kept_text", merges).count())

    // --- r16: the pieces the materialized-input cells above hide ---
    // fresh front: re-runs curationKept + closure + pins per rep, the
    // cost every capstone actually pays before its back half
    steady("front fresh (k2 only)")(tokenizerCapstoneFront(spark, dir)._1.count())
    steady("front fresh (+spans)")(tokenizerCapstoneFront(spark, dir)._2.count())
    // v6 stages on the materialized spanned table
    val wcDf = graft.text.Bpe.wordCounts(docs(spark, dir), "text")
    steady("v6 vocab (wc+baseSyms)") {
      graft.text.Bpe.vocabEntries(graft.text.Bpe.baseSymbols(wcDf), merges).length.toLong
    }
    val vocab = graft.text.Bpe.vocabEntries(graft.text.Bpe.baseSymbols(wcDf), merges)
    steady("encodeIds(spanned)")(
      graft.text.Bpe.encodeIds(spannedM, "doc_id",
        regexp_extract_all(lower(col("kept_text")), lit("[a-z]+"), lit(0)), merges, vocab)
        .count())
    steady("encodeIds+idsum(spanned)")(
      graft.text.Bpe.encodeIds(spannedM, "doc_id",
        regexp_extract_all(lower(col("kept_text")), lit("[a-z]+"), lit(0)), merges, vocab)
        .filter(size(col("ids")) > 0)
        .select(col("doc_id"), size(col("ids")).cast("long").as("n_subwords"),
          expr("aggregate(ids, 0L, (a, x) -> a + x)").as("doc_id_sum"))
        .count())
    // v4 back half: packing + rollup over a materialized slim table
    val k2M = k2.localCheckpoint(false)
    val slimM = k2M.select("doc_id", "source")
      .join(spannedM.select(col("doc_id"),
        (col("n_tokens") - col("n_removed")).as("n_toks")), Seq("doc_id"))
      .localCheckpoint(false)
    steady("pack+rollup(slim)") {
      val parts = spark.sessionState.conf.numShufflePartitions
      val packed = graft.text.Packing.packSequences(slimM, "doc_id", "n_toks",
        budget = 512, parts = parts)
      val spansC = packed.groupBy(col("id").as("doc_id")).agg(count(lit(1)).as("n_spans"))
      slimM.join(spansC, Seq("doc_id")).groupBy("source")
        .agg(count(lit(1)).as("n_docs")).count()
    }

    // --- full cells for reference ---
    for (cell <- Seq("corpus_pipeline_v4", "corpus_pipeline_v5", "corpus_pipeline_v6",
                     "corpus_pipeline_v7")) {
      val fn = graft.Bench.catalog(cell)
      steady(cell)(fn(spark, dir).count())
    }
    println(f"cal_post: ${graft.Bench.calibration(spark)}%.2f s")
    spark.stop()
  }
}
