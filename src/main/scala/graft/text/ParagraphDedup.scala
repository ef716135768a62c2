package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-wide paragraph-level deduplication, the CCNet / Dolma shape:
  * segment every document into paragraphs, keep only the globally
  * FIRST occurrence of each distinct paragraph (ordered by
  * (doc_id, paragraph index)), and reassemble documents from their
  * surviving paragraphs. Repeated boilerplate (headers, footers,
  * license blocks) and intra-document repetition both disappear in the
  * same pass.
  *
  * Scale design — one wide exchange, no joins:
  *  1. paragraphs are cut per-row with codegen'd array expressions
  *     (`slice` over the token array; no UDF, no explode of tokens);
  *  2. each paragraph is keyed by a 60-bit portable hash
  *     ([[SimHash.tokenHash]]: md5-derived, so DuckDB recomputes it
  *     verbatim) — the shuffle moves a (hash, doc_id, idx) triple plus
  *     the paragraph text once;
  *  3. the global first-occurrence winner per hash is a window
  *     `first_value` over (PARTITION BY hash ORDER BY doc_id, idx):
  *     ONE hash-partitioned exchange, per-key sort of tiny groups —
  *     instead of the groupBy-winners + shuffle-join-back plan, which
  *     pays the same exchange twice. Hash partitioning spreads
  *     paragraphs uniformly regardless of document skew; a hot
  *     paragraph (the same footer a billion times) lands on one
  *     partition but costs only a count-and-discard scan, not a
  *     quadratic join.
  *  4. reassembly is a groupBy(doc_id) of the kept paragraphs —
  *     the second and last exchange, keyed by the natural output key.
  *
  * Collision note: a 60-bit hash over 10^12 paragraphs has a ~3e-5
  * birthday collision probability corpus-wide; a collision deletes one
  * innocent paragraph. Public pipelines accept this class of risk
  * (CCNet uses 64-bit SHA-1 prefixes for exactly this job).
  */
object ParagraphDedup {

  /** Fixed-width word paragraphs as an array column: consecutive
    * groups of `width` tokens from the normalized text (the synthetic
    * corpus carries no newlines, so segmentation is positional; on
    * real corpora swap in `split(text, "\n\n")` — every downstream
    * stage is segmentation-agnostic). */
  def paragraphs(text: Column, width: Int): Column = {
    val w = TextOps.tokens(text)
    val n = ceil(size(w).cast("double") / width).cast("int")
    // Null/blank text → empty array (split("", " ") is [""], one
    // empty token, and sequence(0, -1) would descend — guard both).
    when(text.isNull || trim(text) === "" || w.isNull || size(w) <= 0,
      array().cast("array<string>"))
      .otherwise(
        transform(sequence(lit(0), n - 1), i => concat_ws(" ", slice(w, i * width + 1, lit(width)))))
  }

  /** Per-document paragraph survival after global first-occurrence
    * dedup: `(doc_id, n_paras, n_kept, kept_text)` — `kept_text` is
    * the document reassembled from its surviving paragraphs in
    * original order ("" when every paragraph lost its race). */
  def dedupByParagraph(docs: DataFrame, idCol: String, textCol: String, width: Int = 8): DataFrame = {
    // posexplode_outer keeps a (null pidx, null para) row for docs
    // whose text is null/empty, so every input document surfaces in
    // the output — null-text docs as an explicit (doc_id, 0, 0, "")
    // row rather than silently vanishing.
    val paras = docs
      .select(col(idCol), posexplode_outer(paragraphs(col(textCol), width)).as(Seq("pidx", "para")))
      .withColumn("ph", when(col("para").isNotNull, SimHash.tokenHash(col("para"))))
    val firstSeen = Window.partitionBy("ph").orderBy(col(idCol), col("pidx"))
    val marked = paras
      .withColumn("wdoc", first(col(idCol)).over(firstSeen))
      .withColumn("widx", first(col("pidx")).over(firstSeen))
      .withColumn("kept",
        col("para").isNotNull && col("wdoc") === col(idCol) && col("widx") === col("pidx"))
    marked
      .groupBy(col(idCol))
      .agg(
        count(col("para")).as("n_paras"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
        array_join(
          transform(
            array_sort(collect_list(when(col("kept"), struct(col("pidx"), col("para"))))),
            s => s.getField("para")),
          " ").as("kept_text")
      )
  }
}
