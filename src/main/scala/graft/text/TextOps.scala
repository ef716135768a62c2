package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * normalization, tokenization, shingling, token counting, quality
  * scoring, language identification, and document fingerprinting.
  *
  * Everything here is a plain Catalyst column expression (no UDFs) so it
  * whole-stage-codegens and fuses with the surrounding scan — the shape
  * that holds on a 100 TB `documents` table: one pass, no shuffle, all
  * per-row work.
  *
  * Exact formulas are deliberately SQL-expressible so the driver's
  * DuckDB oracle can recompute them verbatim (see Queries).
  */
object TextOps {

  /** Whitespace-collapsed, trimmed, lower-cased text. */
  def normText(text: Column): Column =
    regexp_replace(lower(trim(text)), "\\s+", " ")

  /** Whitespace tokens of the normalized text. */
  def tokens(text: Column): Column = split(normText(text), " ")

  /** Unigrams ++ '_'-joined bigrams of a token-array column — the
    * shared hashed-feature gram surface of [[Dsir.features]] and
    * [[QualityClassifier.features]] (fastText's discriminative power
    * is largely bigrams; unigrams alone can't see word order). The
    * size guard keeps 1-token docs off an empty-slice zip (and
    * mirrors the `sequence(0, -1)` descending-enumeration seam the
    * expr-based form guarded). Pure column expression: codegens, and
    * the DuckDB oracle replays it as
    * `list_concat(w, list_transform(range(1, len(w)), i -> w[i] || '_' || w[i+1]))`. */
  def grams12(w: Column): Column =
    concat(w, when(size(w) >= 2,
      zip_with(slice(w, lit(1), size(w) - 1), slice(w, lit(2), size(w) - 1),
        (a, b) => concat(a, lit("_"), b)))
      .otherwise(array().cast("array<string>")))

  /** Distinct word n-gram shingles from a MATERIALIZED token-array
    * column. Callers must project `tokens(text)` into a column first —
    * referencing the split expression directly would re-evaluate the
    * regex tokenization inside every `element_at` of the lambda
    * (measured ~10× slowdown on the shingling stage). */
  def shinglesFromTokens(w: Column, n: Int = 3): Column = {
    val grams = transform(
      sequence(lit(0), size(w) - n),
      i => concat_ws(" ", (0 until n).map(j => element_at(w, i + j + 1)): _*)
    )
    when(size(w) >= n, array_distinct(grams)).otherwise(array().cast("array<string>"))
  }

  /** Distinct word n-gram shingles (default 3), joined by single
    * spaces; documents shorter than n words yield an empty set.
    * Convenience form for small inputs — hot paths should materialize
    * tokens and use [[shinglesFromTokens]]. */
  def shingles(text: Column, n: Int = 3): Column = shinglesFromTokens(tokens(text), n)

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword token count: letter runs, digit runs, and single
    * non-alphanumeric symbols each count as one token. */
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(lower(text), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0)))

  /** English stopwords used by the quality model (fixed, tiny). */
  val enStopwords: Seq[String] =
    Seq("the", "a", "and", "of", "to", "in", "is", "it", "that", "for")

  /** Per-language marker stopword lists for the n-gram/stopword
    * language-ID heuristic. Order fixes argmax tie-breaking. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "and", "of", "to", "in", "is", "it", "that", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "den"),
    "fr" -> Seq("le", "la", "les", "et", "est", "pas", "pour", "dans", "un", "une"),
    "es" -> Seq("el", "la", "los", "y", "es", "no", "por", "para", "un", "una")
  )

  /** Language prediction: 'zh' if any CJK codepoint is present, else the
    * marker language with the highest distinct-token overlap ('und' when
    * all scores are zero; earlier list order wins ties). */
  def langId(text: Column): Column = {
    val toks = array_distinct(tokens(text))
    val scores = langMarkers.map { case (lang, words) =>
      lang -> size(array_intersect(toks, array(words.map(lit): _*)))
    }
    // argmax with first-wins ties: fold right so earlier entries override
    val best = scores.reverse.foldLeft(lit("und")) { case (acc, (lang, s)) =>
      when(s >= greatest(scores.map(_._2): _*) && s > 0, lit(lang)).otherwise(acc)
    }
    when(regexp_count(text, lit("[\\x{4e00}-\\x{9fff}]")) > 0, lit("zh")).otherwise(best)
  }

  /** Quality features + composite score. Adds columns:
    * n_tokens, avg_token_len, punct_ratio, stop_ratio, quality. */
  def withQuality(df: DataFrame, text: Column): DataFrame = {
    val toks = tokens(text)
    val norm = normText(text)
    val nTok = size(toks)
    val nChar = length(norm)
    val punct = length(regexp_replace(norm, "[^.!?,;:]", ""))
    val stops = size(filter(toks, t => t.isin(enStopwords: _*)))
    df.withColumn("n_tokens", nTok)
      .withColumn("avg_token_len", (nChar - (nTok - 1)).cast("double") / nTok)
      .withColumn("punct_ratio", punct.cast("double") / nChar)
      .withColumn("stop_ratio", stops.cast("double") / nTok)
      .withColumn(
        "quality",
        round(
          lit(0.5) * least(col("stop_ratio") * 3, lit(1.0)) +
            lit(0.3) * (lit(1.0) - least(col("punct_ratio") * 10, lit(1.0))) +
            lit(0.2) * least(nTok.cast("double") / 100.0, lit(1.0)),
          6
        )
      )
  }

  /** Deterministic document fingerprint: md5 over (normalized prefix,
    * length, suffix) — a cheap structural signature for grouping. */
  def fingerprint(text: Column): Column = {
    val norm = normText(text)
    md5(concat(substring(norm, 1, 100), lit("|"), length(norm).cast("string"), lit("|"),
      substring(reverse(norm), 1, 50)))
  }

  /** TRUE polynomial rolling hash (Rabin–Karp) over the normalized
    * text's UTF-8 bytes: h = fold(h·31 + byte) mod 1e9+7, seeded with
    * the first byte — the incremental-update fingerprint family a
    * dedup pipeline slides over windows (vs [[fingerprint]]'s
    * structural md5). Runs as a typed map (one byte pass per row, all
    * Long arithmetic, overflow-free under ANSI: h < 1e9+7 so
    * h·31 + 255 < 2^35). Empty text hashes to 0. The oracle replicates
    * the identical fold with DuckDB `list_reduce`. */
  def rollingHash(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val M = 1000000007L
    df.select(col(idCol).cast("long"), col(textCol).cast("string"))
      .as[(Long, String)]
      .map { case (id, text) =>
        val stripped = text.dropWhile(_ == ' ').reverse.dropWhile(_ == ' ').reverse
        val norm = stripped.toLowerCase(java.util.Locale.ROOT).replaceAll("\\s+", " ")
        val bytes = norm.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        var h = 0L
        var started = false
        var i = 0
        while (i < bytes.length) {
          val v = bytes(i) & 0xffL
          h = if (!started) { started = true; v % M } else (h * 31 + v) % M
          i += 1
        }
        (id, h)
      }
      .toDF(idCol, "rh")
  }

  /** Deterministic per-mille hash bucket in [0, 1000) for sampling:
    * the top 60 bits of md5(id ‖ salt) mod 1000. Unlike `rand()`-based
    * sampling this is reproducible across runs, engines, partitionings,
    * AND re-ingestions of the same ids — the property a training-corpus
    * sample must have so downstream dedup/eval splits stay stable.
    * Map-side arithmetic; the sample filter fuses with the scan. */
  def hashBucket(id: Column, salt: String): Column =
    conv(substring(md5(concat(id.cast("string"), lit(salt))), 1, 15), 16, 10)
      .cast("long") % 1000

  /** Keep rows whose [[hashBucket]] falls below `permille`. */
  def hashSample(id: Column, permille: Column, salt: String): Column =
    hashBucket(id, salt) < permille

  /** Sliding-window token chunks for training-data preparation: windows
    * of `size` tokens advancing by `stride` (= size − overlap), the last
    * window shortened to the document tail; a window starts only if the
    * previous one did not already reach the end, so every token lands in
    * ≥1 chunk and no fully-redundant tail chunk is emitted. Emits
    * (id, chunk_idx, n_tokens, chunk_hash) — the hash is md5 of the
    * space-joined chunk, so an oracle can recompute it from the text.
    * Runs as a typed map (one tokenization per document — the Catalyst
    * lambda form would re-tokenize per chunk via CollapseProject
    * re-inlining, see [[shinglesFromTokens]]); per-row work only, no
    * shuffle. */
  def chunk(df: DataFrame, idCol: String, textCol: String,
            size: Int = 60, overlap: Int = 15): DataFrame = {
    require(size > overlap && overlap >= 0, s"need size > overlap >= 0, got $size/$overlap")
    val stride = size - overlap
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(textCol).cast("string"))
      .as[(Long, String)]
      .flatMap { case (id, text) =>
        val stripped = text.dropWhile(_ == ' ').reverse.dropWhile(_ == ' ').reverse
        val norm = stripped.toLowerCase(java.util.Locale.ROOT).replaceAll("\\s+", " ")
        val toks = norm.split(" ", -1)
        val n = toks.length
        Iterator.from(0)
          .takeWhile(i => i * stride < n && (i == 0 || (i - 1) * stride + size < n))
          .map { i =>
            val slice = toks.slice(i * stride, math.min(i * stride + size, n))
            val joined = slice.mkString(" ")
            val hash = java.security.MessageDigest.getInstance("MD5")
              .digest(joined.getBytes(java.nio.charset.StandardCharsets.UTF_8))
              .map("%02x".format(_)).mkString
            (id, i.toLong, slice.length.toLong, hash)
          }
      }
      .toDF(idCol, "chunk_idx", "n_tokens", "chunk_hash")
  }

  /** Per-document distinctive terms: score = tf / df (term frequency in
    * the doc over the number of docs containing the term) — monotone in
    * tf-idf but log-free. Scored in integer PARTS-PER-MILLION via
    * `floor(tf·1e6/df + 0.5)` (bit-deterministic in both engines,
    * unlike `round`/`ln` — see Int8Quantize for the same trick), so
    * ranking and values are exactly oracle-reproducible. Top `k` per
    * doc by (score desc, term asc). Plan shape: token explode →
    * (doc, term) hash aggregate → term-keyed df join → per-doc top-k
    * window — every exchange keyed by doc or term, both
    * high-cardinality; no stage is quadratic in the corpus. */
  def distinctiveTerms(df: DataFrame, idCol: String, textCol: String, k: Int = 5): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(idCol).orderBy(desc("score_ppm"), col("term"))
    val tf = df
      .select(col(idCol), explode(tokens(col(textCol))).as("term"))
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    tf.join(dfreq, Seq("term"))
      .withColumn("score_ppm", floor(col("tf") * 1000000.0 / col("df") + 0.5).cast("long"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(idCol), col("rank").cast("long").as("rank"), col("term"),
        col("tf"), col("df"), col("score_ppm"))
  }
}
