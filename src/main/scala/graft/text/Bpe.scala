package graft.text

import graft.util.Pin
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Distributed byte-pair-encoding vocabulary learning (Sennrich et al.
  * 2016, "Neural Machine Translation of Rare Words with Subword
  * Units") — the capstone of the tokenizer family that
  * `bpeTokenCount` / `vocab_coverage` started.
  *
  * The classic algorithm is inherently iterative (each merge depends on
  * the counts AFTER the previous merge), so the driver loops over
  * merges; everything inside an iteration is a distributed aggregate:
  *
  *  1. word counts: one `groupBy(word)` over the corpus — the only
  *     pass that touches the full 100 TB input. Everything after runs
  *     on the distinct-word table (a few million rows for web text —
  *     thousands of times smaller than the corpus).
  *  2. adjacent-symbol pair counts: per-word `transform` over the
  *     symbol array weighted by the word count, then a `groupBy(l, r)`
  *     partial-aggregated sum — map-side combine does the heavy
  *     lifting because the pair vocabulary is tiny.
  *  3. argmax: `ORDER BY count DESC, l, r LIMIT 1` —
  *     TakeOrderedAndProject, one row to the driver per iteration.
  *     The (count desc, pair asc) total order makes the merge sequence
  *     deterministic across engines and partitionings.
  *  4. merge application: a NARROW per-row string replace on the
  *     vocabulary table — no shuffle; the driver's chosen pair rides
  *     into the plan as a literal (the "broadcast merge table" of one).
  *
  * Symbol sequences are encoded as delimited strings rather than
  * arrays: `"low" → "|l||o||w||</w>|"` — every symbol is wrapped in
  * `|…|` and neighbours share a `||`. Applying a merge `(l, r)` is then
  * the literal replace `"|l||r|" → "|lr|"`, whose leftmost
  * non-overlapping semantics (identical in Java and DuckDB) are
  * EXACTLY BPE's greedy left-to-right merge application — e.g.
  * `a a a` + merge (a,a) → `aa a`, not `a aa`. The double delimiter
  * makes adjacent matches non-overlapping at the string level
  * (`|a||b||a||b|` → `|ab||ab|` in one pass) while the flanking `|`
  * prevents partial-symbol matches (`|xa||by|` never matches
  * `|a||b|`). This keeps the hot inner loop a codegen'd string op and
  * the whole derivation replayable in ANSI SQL for the oracle.
  *
  * Words are `[a-z]+` runs of the lower-cased text (the engine's
  * BPE-ish pre-tokenizer, [[TextOps.bpeTokenCount]]); each word ends
  * with the standard `</w>` end-of-word marker so merges distinguish
  * word-final from word-internal pairs.
  */
object Bpe {

  val EndOfWord = "</w>"

  final case class Merge(step: Long, lhs: String, rhs: String, merged: String, pair_count: Long)

  /** Corpus word counts: the single full-corpus pass. */
  def wordCounts(docs: DataFrame, textCol: String): DataFrame =
    docs
      .select(explode(regexp_extract_all(lower(col(textCol)), lit("[a-z]+"), lit(0))).as("word"))
      .groupBy("word")
      .agg(count(lit(1)).as("cnt"))

  /** Initial symbol sequences: one character per symbol plus the
    * end-of-word marker, in the delimited-string encoding. */
  private def initSeqs(words: DataFrame): DataFrame =
    words.select(
      col("cnt"),
      concat(lit("|"), regexp_replace(col("word"), "(.)", "$1||"), lit(EndOfWord + "|")).as("seq"))

  /** Weighted adjacent-pair counts over the current vocabulary. */
  private def pairCounts(vocab: DataFrame): DataFrame =
    vocab
      .select(col("cnt"), split(expr("trim(BOTH '|' FROM seq)"), "\\|\\|").as("sy"))
      .filter(size(col("sy")) >= 2)
      .select(col("cnt"), explode(expr(
        "transform(sequence(1, size(sy) - 1), j -> named_struct('l', sy[j-1], 'r', sy[j]))")).as("p"))
      .groupBy(col("p.l").as("l"), col("p.r").as("r"))
      .agg(sum("cnt").as("c"))

  /** Learn up to `nMerges` merges; stops early when no pair is left
    * (every word fully merged to a single symbol). `pinEvery` cuts the
    * replace-chain lineage on the vocabulary table so arbitrarily long
    * merge runs keep O(pinEvery) plan depth (mode per
    * [[graft.util.Pin]] — reliable on clusters via conf). */
  def learnMerges(docs: DataFrame, textCol: String, nMerges: Int,
                  pinEvery: Int = 16): Seq[Merge] = {
    require(nMerges >= 1, s"nMerges must be >= 1, got $nMerges")
    var vocab = initSeqs(wordCounts(docs, textCol)).cache()
    vocab.count()
    val merges = Seq.newBuilder[Merge]
    var step = 1
    var exhausted = false
    while (step <= nMerges && !exhausted) {
      val best = pairCounts(vocab).orderBy(desc("c"), col("l"), col("r")).limit(1).collect()
      best match {
        case Array(Row(l: String, r: String, c: Long)) =>
          merges += Merge(step.toLong, l, r, l + r, c)
          val prev = vocab
          val applied = vocab.withColumn(
            "seq", replace(col("seq"), lit(s"|$l||$r|"), lit(s"|$l$r|")))
          vocab = (if (step % pinEvery == 0) Pin(applied) else applied).cache()
          vocab.count()
          prev.unpersist(blocking = false)
        case _ => exhausted = true
      }
      step += 1
    }
    vocab.unpersist(blocking = false)
    merges.result()
  }

  /** The learned merge table as a DataFrame:
    * `(step, lhs, rhs, merged, pair_count)`. */
  def learn(docs: DataFrame, textCol: String, nMerges: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    learnMerges(docs, textCol, nMerges).toDF()
  }
}
