package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ExactSubstr-style duplicate-SPAN removal (Lee et al. 2022,
  * "Deduplicating Training Data Makes Language Models Better" — the
  * surgical half that [[graft.QueriesText]]'s `shared_substrings`
  * diagnostics only measure): any k-token window whose text occurs
  * anywhere else in the corpus keeps its globally FIRST occurrence
  * (ordered by (doc_id, window index)) and is CUT everywhere else;
  * overlapping duplicated windows merge into maximal variable-length
  * spans (the interval union is computed as a covered-position set,
  * which is the same thing), and each document is reassembled from
  * its surviving tokens in order.
  *
  * Scale shape (everything keyed high-cardinality, nothing
  * quadratic — the `shared_substrings` / `dedup_paragraph` family):
  *  1. window occurrences are cut per-row with codegen array
  *     expressions and keyed by the window text: ONE gram exchange
  *     for the winner aggregate (`min(struct(doc_id, idx))`
  *     partial-aggregates map-side, so a footer gram repeated a
  *     billion times costs a per-partition min, not a hot reduce);
  *  2. the winner join back to occurrences reuses the same gram
  *     partitioning; fan-out is one row per occurrence — linear in
  *     corpus tokens, never pairs;
  *  3. covered positions collapse per document
  *     (`array_distinct(flatten(collect_list(...)))` over the doc
  *     key): the per-doc state is at most k × doc_tokens ints,
  *     bounded by document length, not corpus size;
  *  4. reassembly filters the token array against the sorted covered
  *     set per row (O(tokens × removed) int compares worst-case —
  *     a fully-duplicated chunk-sized doc costs ~10^6 cheap compares,
  *     microseconds — and zero extra exchanges).
  *
  * The reference method builds a corpus-global suffix array; that is
  * a single-node formulation. Windowed grams at the same k give the
  * identical removed-span set for spans ≥ k (every duplicated region
  * of length ≥ k is a union of duplicated k-windows) and shard
  * naturally over the gram key, which is the formulation that
  * survives 100 TB.
  */
object ExactSubstr {

  /** Per-document span-removal result:
    * `(doc_id, n_tokens, n_removed, kept_text)` — `n_removed` counts
    * tokens cut, `kept_text` is the surviving tokens joined in
    * original order ("" when the whole document was duplicated). */
  def removeDuplicateSpans(docs: DataFrame, idCol: String, textCol: String,
                           k: Int = 8): DataFrame = {
    require(k >= 2, s"window width k must be >= 2, got $k")
    val toks = docs
      .select(col(idCol).cast("long").as("doc_id"), TextOps.tokens(col(textCol)).as("w"))
    val occ = toks
      .filter(size(col("w")) >= k)
      .select(col("doc_id"), posexplode(expr(
        s"transform(sequence(0, size(w) - $k), i -> array_join(slice(w, i + 1, $k), ' '))"))
        .as(Seq("i", "g")))
    val winners = occ
      .groupBy("g")
      .agg(min(struct(col("doc_id"), col("i"))).as("win"), count(lit(1)).as("cnt"))
      .filter(col("cnt") >= 2) // unique windows can't mark anything
      .select(col("g"), col("win.doc_id").as("wdoc"), col("win.i").as("wi"))
    val covered = occ
      .join(winners, Seq("g"))
      .filter(!(col("doc_id") === col("wdoc") && col("i") === col("wi")))
      .groupBy("doc_id")
      .agg(array_sort(array_distinct(flatten(
        collect_list(sequence(col("i"), col("i") + (k - 1)))))).as("cov"))
    toks
      .join(covered, Seq("doc_id"), "left")
      .withColumn("cov", coalesce(col("cov"), expr("array()").cast("array<int>")))
      .select(
        col("doc_id"),
        size(col("w")).cast("long").as("n_tokens"),
        size(col("cov")).cast("long").as("n_removed"),
        array_join(
          expr("transform(filter(transform(w, (t, p) -> named_struct('p', p, 't', t))," +
            " s -> NOT array_contains(cov, s.p)), s -> s.t)"),
          " ").as("kept_text"))
  }
}
