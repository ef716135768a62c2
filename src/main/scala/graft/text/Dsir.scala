package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** DSIR-style data selection — importance resampling over hashed
  * n-gram features (Xie et al. 2023, "Data Selection for Language
  * Models via Importance Resampling"): fit two smoothed bag-of-hashed-
  * n-grams multinomials — p over a TARGET corpus (the distribution you
  * want more of) and q over the RAW pool — and rank raw documents by
  * the importance log-weight log p(x) − log q(x) = Σ_j x_j·(log p_j −
  * log q_j). The learned-curation stage between the heuristic gates
  * (quality/lang-id/perplexity) and the trained classifier: no labels
  * needed, only an exemplar corpus.
  *
  * Float discipline (the `perplexity_filter` rule): the per-bucket log
  * ratio is rounded ONCE to micro-units and stored as a long; every
  * downstream weight is then Σ x_j·lr_j in EXACT long arithmetic —
  * order-independent, partition-independent, and replayable by a
  * DuckDB oracle that rounds the same expression once at the same
  * point. Ranking happens on the integer weights (ties by doc id), so
  * selection is bit-deterministic in both engines.
  *
  * Features are hashed unigram + bigram counts into [[Buckets]]
  * buckets via the portable md5 token hash ([[SimHash.tokenHash]] —
  * the [[QualityClassifier]] bucket discipline; bigrams join their
  * tokens with '_').
  *
  * Scale shape: feature extraction is one map-side explode +
  * partial-aggregated groupBy per corpus; each model is ONE aggregate
  * to ≤ Buckets rows (a dim table, broadcast everywhere after);
  * weighing is a broadcast join + per-doc sum — no corpus exchange
  * beyond the (id, j) feature aggregate; top-k selection is
  * TakeOrdered, not a global sort. Nothing is quadratic; the target
  * corpus is typically tiny (an exemplar set) and the raw pool is
  * touched twice (features, weigh).
  */
object Dsir {

  val Buckets = 1024

  /** Hashed unigram+bigram count features: (id, j, x), j ∈ [0, Buckets).
    * Gram surface: [[TextOps.grams12]], shared with
    * [[QualityClassifier.features]]. */
  def features(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val base = docs.select(col(idCol).cast("long").as("id"),
      TextOps.tokens(col(textCol)).as("w"))
    val grams = base.select(col("id"), explode(TextOps.grams12(col("w"))).as("g"))
    grams
      .select(col("id"), pmod(SimHash.tokenHash(col("g")), lit(Buckets.toLong)).as("j"))
      .groupBy("id", "j").agg(count(lit(1)).as("x"))
  }

  /** Per-bucket importance log-ratio in micro-units:
    * lr_j = round((ln(ct_j+1) − ln(Tt+B) − ln(cr_j+1) + ln(Tr+B))·1e6)
    * with add-1 smoothing over the full bucket range (buckets unseen in
    * either corpus still get a defined ratio). `targetFeats`/`rawFeats`
    * are [[features]] outputs; each side reduces to ≤ Buckets rows
    * before the tiny range join. */
  def logRatioMicro(targetFeats: DataFrame, rawFeats: DataFrame): DataFrame = {
    val spark = targetFeats.sparkSession
    def bucketCounts(f: DataFrame, cName: String): DataFrame =
      f.groupBy("j").agg(sum("x").as(cName))
    val ct = bucketCounts(targetFeats, "ct")
    val cr = bucketCounts(rawFeats, "cr")
    val all = spark.range(Buckets).select(col("id").as("j"))
      .join(broadcast(ct), Seq("j"), "left")
      .join(broadcast(cr), Seq("j"), "left")
      .select(col("j"),
        coalesce(col("ct"), lit(0L)).as("ct"),
        coalesce(col("cr"), lit(0L)).as("cr"))
    val totals = broadcast(all.agg(sum("ct").as("tt"), sum("cr").as("tr")))
    all.crossJoin(totals)
      .select(col("j"),
        round((log(col("ct") + 1.0) - log(col("tt") + lit(Buckets.toDouble))
          - log(col("cr") + 1.0) + log(col("tr") + lit(Buckets.toDouble))) * 1e6, 0)
          .cast("long").as("lr_micro"))
  }

  /** Per-document importance weight: (id, w_micro = Σ x_j·lr_j) —
    * exact long arithmetic over the broadcast ratio table. */
  def weigh(feats: DataFrame, lrMicro: DataFrame): DataFrame =
    feats.join(broadcast(lrMicro), Seq("j"))
      .groupBy("id").agg(sum(col("x") * col("lr_micro")).as("w_micro"))
}
