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
  *  2. the winner join back to occurrences is SALTED on
  *     `hash(doc_id, idx) % saltBuckets` with the winner side
  *     replicated across the buckets: a billion-copy boilerplate gram
  *     spreads over `saltBuckets` reduce tasks BY CONSTRUCTION. The
  *     spread must be structural because AQE's OptimizeSkewedJoin
  *     cannot fire on this join — its pattern requires bare
  *     Sort(ShuffleQueryStage) children and the winner side is an
  *     aggregate (verified empirically; an explicit repartition gets
  *     elided as redundant). Replication cost: saltBuckets × one row
  *     per duplicated gram — at any scale a small fraction of the
  *     occurrence exchange it de-skews. Fan-out stays one row per
  *     occurrence — linear in corpus tokens, never pairs;
  *  3. marked occurrences explode to (doc_id, position) rows — k rows
  *     per occurrence, spread across partitions — and deduplicate on
  *     the composite key (partial-aggregated map-side, so a
  *     heavily-duplicated document's positions collapse before the
  *     exchange and no aggregation buffer ever holds the k-fold
  *     overlap);
  *  4. reassembly is a positional ANTI-JOIN: tokens explode to
  *     (doc_id, position, token), anti-join the covered positions on
  *     the same (doc_id, position) key the dedup just partitioned on,
  *     and the survivors collapse back per document (sorted-struct
  *     collect — the one place a whole document sits in a buffer,
  *     O(doc tokens)). Everything is linear in corpus tokens; an
  *     earlier formulation filtered the token array against the
  *     covered set with per-token array_contains, which is
  *     O(tokens × removed) per document and stalled on a 400k-token
  *     half-duplicated doc — the mega-doc spec now pins the linear
  *     shape.
  *
  * The reference method builds a corpus-global suffix array; that is
  * a single-node formulation. Windowed grams at the same k give the
  * identical removed-span set for spans ≥ k (every duplicated region
  * of length ≥ k is a union of duplicated k-windows) and shard
  * naturally over the gram key, which is the formulation that
  * survives 100 TB.
  */
object ExactSubstr {

  /** Session conf key for the winner-join salt-bucket count, so a
    * cluster run can raise the spread without a code change
    * (`spark.conf.set(SaltBucketsConfKey, "256")`).
    *
    * SIZING: the salt bounds a single reduce task's share of the
    * hottest gram at `copies / saltBuckets` occurrence rows. Pick
    * `saltBuckets ≥ hottest-gram copies / target-rows-per-task` —
    * the default 16 keeps a 2.7M-copy boilerplate footer (the spec's
    * pinned case) at ~170k rows per task; a 100 TB corpus whose worst
    * footer approaches billions of copies wants 256–1024. Cost is
    * linear in the salt: saltBuckets × one replicated winner row per
    * DUPLICATED gram (winners with cnt < 2 are filtered before
    * replication), a small fraction of the occurrence exchange it
    * de-skews. */
  val SaltBucketsConfKey = "spark.graft.exactsubstr.saltBuckets"

  def saltBucketsFromConf(spark: org.apache.spark.sql.SparkSession): Int =
    spark.conf.getOption(SaltBucketsConfKey).map(_.toInt).getOrElse(16)

  /** Per-document span-removal result:
    * `(doc_id, n_tokens, n_removed, kept_text)` — `n_removed` counts
    * tokens cut, `kept_text` is the surviving tokens joined in
    * original order ("" when the whole document was duplicated).
    *
    * Document-length bound: the widest single-row state anywhere in
    * the plan is one document's distinct covered-position set plus its
    * token array — O(doc tokens) ints/strings, independent of how MANY
    * times its windows are duplicated elsewhere ([[graft.ExactSubstrSpec]]
    * pins a 400k-token doc). Documents beyond ~10M tokens (~40 MB of
    * positions in one aggregation buffer) should be pre-chunked, as
    * every curation pipeline here does anyway (`chunk_docs`). */
  def removeDuplicateSpans(docs: DataFrame, idCol: String, textCol: String,
                           k: Int = 8, saltBuckets: Int = 16): DataFrame = {
    require(k >= 2, s"window width k must be >= 2, got $k")
    require(saltBuckets >= 1, s"saltBuckets must be >= 1, got $saltBuckets")
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
      // winner replicated once per salt bucket (see scaladoc step 2)
      .withColumn("salt", explode(expr(s"sequence(0, ${saltBuckets - 1})")))
    // covered-position set at (doc_id, p) granularity: dedup on the
    // composite key — partial aggregation collapses the k-fold window
    // overlap map-side; a hot doc's positions spread over partitions
    val coveredPos = occ
      .withColumn("salt",
        pmod(xxhash64(col("doc_id"), col("i")), lit(saltBuckets.toLong)).cast("int"))
      .join(winners, Seq("g", "salt"))
      .filter(!(col("doc_id") === col("wdoc") && col("i") === col("wi")))
      .select(col("doc_id"), explode(sequence(col("i"), col("i") + (k - 1))).as("p"))
      .distinct()
    // positional anti-join reassembly: linear in corpus tokens, reuses
    // the (doc_id, p) partitioning the dedup just produced
    val kept = toks
      .select(col("doc_id"), posexplode(col("w")).as(Seq("p", "t")))
      .join(coveredPos, Seq("doc_id", "p"), "left_anti")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_kept"),
        array_sort(collect_list(struct(col("p"), col("t")))).as("ks"))
      .select(col("doc_id"), col("n_kept"),
        expr("array_join(transform(ks, s -> s.t), ' ')").as("kt"))
    toks
      .select(col("doc_id"), size(col("w")).cast("long").as("n_tokens"))
      .join(kept, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        col("n_tokens"),
        (col("n_tokens") - coalesce(col("n_kept"), lit(0L))).as("n_removed"),
        coalesce(col("kt"), lit("")).as("kept_text"))
  }
}
