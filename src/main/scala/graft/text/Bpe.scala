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

  /** Cap on the typed encode paths' per-partition word→encoding memo
    * (see [[encodeCountsOf]]): ~1M entries of short strings is tens of
    * MB per task — cheap insurance; a vocabulary that overflows it
    * degrades gracefully to unmemoized sweeps for the cold tail. */
  private[text] val memoMaxEntries = 1 << 20

  final case class Merge(step: Long, lhs: String, rhs: String, merged: String, pair_count: Long)

  /** One vocabulary row: dense `token_id`, the symbol's surface string,
    * and whether it is a base symbol or the product of merge
    * `token_id - nBase + 1`. */
  final case class VocabEntry(token_id: Long, symbol: String, kind: String)

  /** Corpus word counts: the single full-corpus pass. */
  def wordCounts(docs: DataFrame, textCol: String): DataFrame =
    docs
      .select(explode(regexp_extract_all(lower(col(textCol)), lit("[a-z]+"), lit(0))).as("word"))
      .groupBy("word")
      .agg(count(lit(1)).as("cnt"))

  /** Corpus counts at a COARSER pre-tokenization unit: overlapping
    * n-token shingles joined by `_`. Same full-corpus-pass shape as
    * [[wordCounts]]; exists because a corpus whose word vocabulary is
    * tiny (this repo's synthetic fixtures carry 31 distinct words)
    * still presents the merge loop with a realistic many-thousand-entry
    * word table at shingle granularity. */
  def shingleCounts(docs: DataFrame, textCol: String, n: Int): DataFrame = {
    require(n >= 1, s"shingle width must be >= 1, got $n")
    docs
      .select(regexp_extract_all(lower(col(textCol)), lit("[a-z]+"), lit(0)).as("w"))
      .filter(size(col("w")) >= n)
      .select(explode(expr(
        s"transform(sequence(0, size(w) - $n), i -> array_join(slice(w, i + 1, $n), '_'))")).as("word"))
      .groupBy("word")
      .agg(count(lit(1)).as("cnt"))
  }

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
                  pinEvery: Int = 16): Seq[Merge] =
    learnMergesFromCounts(wordCounts(docs, textCol), nMerges, pinEvery)

  /** Distributed merge loop over an explicit `(word, cnt)` table —
    * [[learnMerges]] with the pre-tokenization factored out so the
    * shingle-granularity path shares it. Kept as the ORACLE-PARITY
    * path: every stage is replayable in ANSI SQL, but each merge costs
    * one-to-two Spark job waves, so use [[learnMergesLocal]] beyond a
    * few dozen merges (the r7 verdict's named scale ceiling). */
  def learnMergesFromCounts(words: DataFrame, nMerges: Int,
                            pinEvery: Int = 16): Seq[Merge] = {
    require(nMerges >= 1, s"nMerges must be >= 1, got $nMerges")
    // ONE Spark action per merge: the pairCounts collect below both
    // picks the best pair AND (as a side effect of reading `vocab`)
    // materializes the current generation's cache, so the explicit
    // per-merge `vocab.count()` the loop used to run is redundant work
    // (measured: it doubled the job waves of a loop whose cost is
    // almost entirely job-wave scheduling — the vocabulary table is
    // tiny next to the corpus at every scale). The previous
    // generation's cache must stay alive until the CURRENT one is
    // materialized (the new cache computes from it), so unpersist runs
    // one generation behind.
    var vocab = initSeqs(words).cache()
    var prev: Option[DataFrame] = None
    val merges = Seq.newBuilder[Merge]
    var step = 1
    var exhausted = false
    while (step <= nMerges && !exhausted) {
      val best = pairCounts(vocab).orderBy(desc("c"), col("l"), col("r")).limit(1).collect()
      // `vocab` is materialized now — its parent cache can go
      prev.foreach(_.unpersist(blocking = false))
      prev = None
      best match {
        case Array(Row(l: String, r: String, c: Long)) =>
          merges += Merge(step.toLong, l, r, l + r, c)
          val applied = vocab.withColumn(
            "seq", replace(col("seq"), lit(s"|$l||$r|"), lit(s"|$l$r|")))
          prev = Some(vocab)
          vocab = (if (step % pinEvery == 0) Pin(applied) else applied).cache()
        case _ => exhausted = true
      }
      step += 1
    }
    prev.foreach(_.unpersist(blocking = false))
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

  /** SCALE path for realistic vocabulary sizes: ONE distributed
    * word-count pass over the corpus (the only pass that touches the
    * 100 TB input), collect the distinct-word table — thousands of
    * times smaller than the corpus; a few million rows for web text —
    * and run the classic in-memory pair-heap merge loop (Sennrich et
    * al. 2016's actual algorithm) on the driver. Emits the IDENTICAL
    * deterministic (count desc, pair asc) merge sequence as the
    * distributed loop ([[graft.BpeSpec]] proves equality), without the
    * one-to-two Spark job waves per merge that make the distributed
    * loop a ~50k-job non-starter at a 32k-merge vocabulary.
    *
    * The collect is GUARDED (`maxWords`): the distinct-word table is
    * normally thousands of times smaller than the corpus, but a
    * pathological tokenization (unsplit CJK, binary noise, URLs kept
    * whole) can make it corpus-sized, and an unguarded collect then
    * OOMs the driver with an opaque heap dump instead of a named
    * error. One cheap count over the (already tiny relative to the
    * corpus) word table buys a diagnosable failure: filter low-count
    * words first — a frequency floor is standard BPE practice and
    * words below it can't win early merges at web scale — or raise
    * the cap knowingly on a driver sized for it. */
  def learnLocal(words: DataFrame, nMerges: Int, maxWords: Long = 20000000L): DataFrame = {
    val spark = words.sparkSession
    import spark.implicits._
    learnLocalMerges(words, nMerges, maxWords).toDF()
  }

  /** [[learnLocal]] returning the merge sequence directly — the form
    * pipelines compose with [[encodeCountsOf]]/[[encodeIds]] without a
    * DataFrame round-trip. This IS the guarded path: callers that
    * collect the word table themselves bypass the cap. */
  def learnLocalMerges(words: DataFrame, nMerges: Int,
                       maxWords: Long = 20000000L): Seq[Merge] =
    learnMergesLocal(collectWordsGuarded(words, maxWords), nMerges)

  /** The guarded word-table collect behind [[learnLocal]]: ONE pass —
    * the probe is a `limit(maxWords + 1)` on the fetch itself, so a
    * within-cap table is collected by the same job that checks the
    * cap (the pre-r13 guard ran `count()` first, RE-EXECUTING the
    * word aggregate — a second full corpus pass per training run),
    * and an over-cap table surfaces as length == maxWords + 1 without
    * ever materializing past the cap. The merge loop is order-
    * insensitive (it aggregates the rows into a pair-count heap), so
    * the limit's partition-order nondeterminism is invisible. */
  def collectWordsGuarded(words: DataFrame, maxWords: Long = 20000000L): Array[(String, Long)] = {
    require(maxWords > 0 && maxWords < Int.MaxValue,
      s"maxWords=$maxWords out of range (0, Int.MaxValue)")
    val spark = words.sparkSession
    import spark.implicits._
    val wc = words.select(col("word").cast("string"), col("cnt").cast("long"))
      .as[(String, Long)].limit(maxWords.toInt + 1).collect()
    require(wc.length <= maxWords,
      s"learnLocal: distinct-word table exceeds maxWords=$maxWords rows — the driver-heap " +
        "merge loop would OOM. Apply a frequency floor (cnt >= k) to the word table first, " +
        "or raise maxWords on a driver provisioned for it.")
    wc
  }

  /** ENCODE: apply a learned merge sequence to the corpus, reporting
    * per-document word and subword counts — the tokenizer's forward
    * pass (train → encode → coverage completes the family).
    *
    * Merges apply SEQUENTIALLY in learned order (merge 1 everywhere,
    * then merge 2, ...), exactly the evolution the training corpus
    * underwent — so a training word always encodes to its final
    * training-time symbols. (Rank-priority re-scan encoders differ
    * only on symbol contexts never seen at that point of training;
    * sequential is the replayable-in-SQL semantics this engine's
    * oracles need, and is deterministic either way.)
    *
    * Two paths, bit-identical (BpeSpec proves equality):
    *  - `maxExprMerges` or fewer merges → a chain of nested codegen
    *    `replace` calls inside one `transform`/`aggregate` column
    *    expression: ZERO exchanges, fused with the scan (the
    *    conformance path — the DuckDB oracle replays the same chain);
    *  - more merges → a typed per-partition map with a broadcast-style
    *    rank table (a 32k-entry map in the closure): per word, scan
    *    for the lowest applicable rank at-or-after the sequential
    *    cursor, apply greedily left-to-right, advance the cursor —
    *    O(word² ) worst case on tiny strings, still zero exchanges.
    */
  def encodeCounts(docs: DataFrame, idCol: String, textCol: String,
                   merges: Seq[Merge], maxExprMerges: Int = 64): DataFrame =
    encodeCountsOf(docs, idCol,
      regexp_extract_all(lower(col(textCol)), lit("[a-z]+"), lit(0)), merges, maxExprMerges)

  /** [[encodeCounts]] over an explicit words-array column — the seam
    * that lets callers encode at a different pre-tokenization
    * granularity than `[a-z]+` runs (e.g. the shingle vocabulary
    * `bpe_train_1k` learns on). */
  def encodeCountsOf(docs: DataFrame, idCol: String, words: org.apache.spark.sql.Column,
                     merges: Seq[Merge], maxExprMerges: Int = 64): DataFrame = {
    // null text → null words array: size() would report -1 on the expr
    // path and the typed path would NPE, while the oracle's left join
    // contracts (0, 0) — coalesce to the empty array so both paths and
    // the oracle agree on null input.
    val base = docs.select(
      col(idCol).cast("long").as("doc_id"),
      coalesce(words, expr("cast(array() AS array<string>)")).as("ws"))
    if (merges.size <= maxExprMerges) {
      val chain = merges.foldLeft(
        "concat('|', regexp_replace(w, '(.)', '$1||'), '</w>|')") { (acc, m) =>
        s"replace($acc, '|${m.lhs}||${m.rhs}|', '|${m.merged}|')"
      }
      base.select(
        col("doc_id"),
        size(col("ws")).cast("long").as("n_words"),
        expr(s"aggregate(transform(ws, w -> size(split(btrim($chain, '|'), '\\\\|\\\\|'))), " +
          "0L, (a, x) -> a + x)").as("n_subwords"))
    } else {
      val spark = docs.sparkSession
      import spark.implicits._
      val ranked: Map[(String, String), Int] =
        merges.map(m => (m.lhs, m.rhs) -> m.step.toInt).toMap
      // A learned sequence CAN in principle re-choose a (lhs, rhs) pair
      // at a later step (a multi-char lhs recreated by a different
      // parenthesization — e.g. ("a","bc") after ("ab","c") both yield
      // "abc" — makes new adjacencies of an already-merged pair). The
      // pair-keyed map cannot represent two ranks for one pair, and
      // .toMap would silently keep the LAST, diverging from the
      // expression path's literal step-by-step replay — so fail loudly.
      require(ranked.size == merges.size,
        s"duplicate (lhs, rhs) pair in merge sequence: the rank-map encode " +
          s"path cannot replay a pair merged at two steps (${merges.size} merges, " +
          s"${ranked.size} distinct pairs)")
      // Per-PARTITION word→count memo: the encode kernel is a pure
      // function of (word, merge table), and natural corpora are
      // Zipfian — the same words recur millions of times — so
      // re-running the O(merges-applied × word length) sweep per
      // OCCURRENCE wastes almost every call. Bounded (memoMaxEntries)
      // so a pathological vocabulary (unsplit CJK, binary noise)
      // degrades to the unmemoized sweep instead of an executor OOM;
      // Zipf puts the hot words in the memo long before any bound
      // binds. Bit-identical output (BpeSpec pins memo ≡ direct).
      base.select(col("doc_id"), col("ws"))
        .as[(Long, Seq[String])]
        .mapPartitions { it =>
          val memo = new java.util.HashMap[String, java.lang.Long]()
          it.map { case (id, ws) =>
            var total = 0L
            val wi = ws.iterator
            while (wi.hasNext) {
              val w = wi.next()
              var c = memo.get(w)
              if (c == null) {
                c = java.lang.Long.valueOf(encodeWordSeq(w, ranked))
                if (memo.size < memoMaxEntries) memo.put(w, c)
              }
              total += c.longValue()
            }
            (id, ws.size.toLong, total)
          }
        }
        .toDF("doc_id", "n_words", "n_subwords")
    }
  }

  /** Base symbol inventory of a word table: the distinct single
    * characters across the distinct words plus the end-of-word marker,
    * sorted — the deterministic id-0..B-1 prefix of the vocabulary.
    * One tiny aggregate over the (already small) distinct-word table;
    * collected because the alphabet is dim-table-sized by nature. */
  def baseSymbols(words: DataFrame): Seq[String] = {
    val chars = words
      .select(explode(expr("regexp_extract_all(word, '.', 0)")).as("sym"))
      .distinct()
      .collect()
      .map(_.getString(0))
    (chars.toSeq :+ EndOfWord).distinct.sorted
  }

  /** [[baseSymbols]] computed locally from an already-collected word
    * iterator (r16): same inventory — per-codepoint symbols (the
    * aggregate form's `regexp_extract_all(word, '.', 0)` splits on
    * codepoints) plus the end-of-word marker, distinct, sorted. Lets a
    * caller that already holds the guarded word-table collect (the
    * learnLocal path) derive the alphabet without a second corpus
    * pass. BpeSpec pins equality with the aggregate form. */
  def baseSymbolsLocal(words: Iterator[String]): Seq[String] = {
    val set = scala.collection.mutable.SortedSet.empty[String]
    words.foreach { w =>
      var i = 0
      while (i < w.length) {
        val cp = w.codePointAt(i)
        set += new String(Character.toChars(cp))
        i += Character.charCount(cp)
      }
    }
    set += EndOfWord
    set.toSeq
  }

  /** Dense token-id vocabulary: base symbols (sorted) take ids 0..B-1,
    * merge i's merged symbol takes id B+i-1 — the standard BPE vocab
    * layout (one new symbol per merge). Two different merges CAN
    * produce the same surface string (("a","bc") and ("ab","c") both
    * yield "abc"); both keep their dense ids here, and [[encodeIds]]
    * resolves a string to its SMALLEST id, so the id stream is
    * deterministic. */
  def vocabEntries(baseSyms: Seq[String], merges: Seq[Merge]): Seq[VocabEntry] = {
    val base = baseSyms.zipWithIndex.map { case (s, i) => VocabEntry(i.toLong, s, "base") }
    val nBase = baseSyms.size.toLong
    base ++ merges.map(m => VocabEntry(nBase + m.step - 1, m.merged, "merge"))
  }

  /** ENCODE to token ids: the [[encodeCountsOf]] pipeline emitting the
    * actual id sequence — `(doc_id, ids array<int>)`, ids in document
    * order (words in order, each word's subwords in order, every word
    * closed by its `</w>`-bearing final symbol). Symbols outside the
    * vocabulary (a character the training corpus never saw) map to -1,
    * the explicit UNK contract — the oracle replays the same coalesce.
    *
    * Same dual path as the counts: ≤`maxExprMerges` merges → the
    * zero-exchange nested-replace chain with a literal symbol→id map
    * (`element_at` on a map literal — codegen, fused with the scan);
    * beyond → the typed per-partition rank-cursor sweep with the same
    * map in the closure. BpeSpec proves the paths emit identical ids. */
  def encodeIds(docs: DataFrame, idCol: String, words: org.apache.spark.sql.Column,
                merges: Seq[Merge], vocab: Seq[VocabEntry],
                maxExprMerges: Int = 64): DataFrame = {
    val idByString: Map[String, Int] =
      vocab.groupBy(_.symbol).view.mapValues(_.map(_.token_id).min.toInt).toMap
    val base = docs.select(
      col(idCol).cast("long").as("doc_id"),
      coalesce(words, expr("cast(array() AS array<string>)")).as("ws"))
    if (merges.size <= maxExprMerges) {
      val chain = merges.foldLeft(
        "concat('|', regexp_replace(w, '(.)', '$1||'), '</w>|')") { (acc, m) =>
        s"replace($acc, '|${m.lhs}||${m.rhs}|', '|${m.merged}|')"
      }
      val symMap = typedLit(idByString)
      base
        .select(col("doc_id"),
          flatten(expr(s"transform(ws, w -> split(btrim($chain, '|'), '\\\\|\\\\|'))")).as("syms"))
        .select(col("doc_id"),
          transform(col("syms"), s => coalesce(element_at(symMap, s), lit(-1))).as("ids"))
    } else {
      val spark = docs.sparkSession
      import spark.implicits._
      val ranked: Map[(String, String), Int] =
        merges.map(m => (m.lhs, m.rhs) -> m.step.toInt).toMap
      require(ranked.size == merges.size,
        s"duplicate (lhs, rhs) pair in merge sequence (${merges.size} merges, " +
          s"${ranked.size} distinct pairs)")
      // same per-partition word→ids memo as the counts path (see
      // encodeCountsOf): pure kernel + Zipfian reuse, bounded fallback
      base.as[(Long, Seq[String])]
        .mapPartitions { it =>
          val memo = new java.util.HashMap[String, Array[Int]]()
          it.map { case (id, ws) =>
            val out = Seq.newBuilder[Int]
            val wi = ws.iterator
            while (wi.hasNext) {
              val w = wi.next()
              var ids = memo.get(w)
              if (ids == null) {
                ids = encodeWordSymbols(w, ranked).map(s => idByString.getOrElse(s, -1))
                if (memo.size < memoMaxEntries) memo.put(w, ids)
              }
              out ++= ids
            }
            (id, out.result())
          }
        }
        .toDF("doc_id", "ids")
    }
  }

  /** Inverse of [[encodeIds]] at the word-stream level: map each id
    * back to its vocabulary symbol (the id→symbol direction is
    * injective even when two merges share a surface string),
    * concatenate, and split on the end-of-word marker — every word
    * ends with exactly one `</w>`-bearing symbol and merges never
    * cross word boundaries, so this reproduces the lower-cased word
    * stream the encoder consumed, space-joined. Lossless by
    * construction; the `bpe_roundtrip` query gates
    * decode(encode(text)) == the original word stream through the
    * driver oracle. Pure codegen column (literal map + string ops) —
    * zero exchanges, like the encode chain it inverts. */
  def decodeIdsToText(ids: org.apache.spark.sql.Column,
                      vocab: Seq[VocabEntry]): org.apache.spark.sql.Column = {
    val symById: Map[Int, String] = vocab.map(v => v.token_id.toInt -> v.symbol).toMap
    val m = typedLit(symById)
    val joined = array_join(transform(ids, i => coalesce(element_at(m, i), lit(""))), "")
    rtrim(replace(joined, lit(EndOfWord), lit(" ")))
  }

  /** Subword count of one word under sequential merge application —
    * the typed-path kernel. Emulates "apply merge 1 everywhere, then
    * merge 2, ..." without touching absent ranks: repeatedly find the
    * LOWEST present rank at-or-after the cursor, apply it greedily
    * left-to-right, move the cursor past it (pairs formed with ranks
    * behind the cursor were already passed by the sequential sweep and
    * must not apply). */
  private[text] def encodeWordSeq(word: String, rank: Map[(String, String), Int]): Long =
    encodeWordSymbols(word, rank).length.toLong

  /** The final symbol sequence of one word under the same sequential
    * sweep — the kernel behind both the typed count and typed id
    * paths. */
  private[text] def encodeWordSymbols(word: String, rank: Map[(String, String), Int]): Array[String] = {
    var syms: Array[String] = {
      val a = new Array[String](word.length + 1)
      var i = 0
      while (i < word.length) { a(i) = word.substring(i, i + 1); i += 1 }
      a(word.length) = EndOfWord
      a
    }
    var cursor = 1
    var continue = true
    while (continue && syms.length >= 2) {
      var best = Int.MaxValue
      var j = 0
      while (j + 1 < syms.length) {
        rank.get((syms(j), syms(j + 1))) match {
          case Some(r) if r >= cursor && r < best => best = r
          case _ => ()
        }
        j += 1
      }
      if (best == Int.MaxValue) continue = false
      else {
        val m = merged(syms, best, rank)
        syms = m
        cursor = best + 1
      }
    }
    syms
  }

  /** Greedy left-to-right application of the single merge with rank
    * `r` (identified by looking the pair back up in `rank`). */
  private def merged(syms: Array[String], r: Int,
                     rank: Map[(String, String), Int]): Array[String] = {
    val b = Array.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && rank.get((syms(i), syms(i + 1))).contains(r)) {
        b += syms(i) + syms(i + 1); i += 2
      } else { b += syms(i); i += 1 }
    }
    b.result()
  }

  /** In-memory merge loop: pair-heap with lazy deletion + an inverted
    * pair→words index, so each merge touches only the words containing
    * the chosen pair. O(total symbols) init; each merge is
    * O(affected-word lengths + log-heap). Tie-break and greedy
    * left-to-right application are bit-identical to the distributed
    * delimited-string formulation. */
  def learnMergesLocal(wordCounts: Array[(String, Long)], nMerges: Int): Seq[Merge] = {
    require(nMerges >= 1, s"nMerges must be >= 1, got $nMerges")
    import scala.collection.mutable
    val syms: Array[Array[String]] =
      wordCounts.map { case (w, _) => (w.map(_.toString) :+ EndOfWord).toArray }
    val cnt: Array[Long] = wordCounts.map(_._2)
    val pairCount = mutable.HashMap.empty[(String, String), Long]
    val pairWords = mutable.HashMap.empty[(String, String), mutable.ArrayBuffer[Int]]
    val touched = mutable.HashSet.empty[(String, String)]
    def indexWord(i: Int, sign: Long): Unit = {
      val s = syms(i); val c = cnt(i) * sign
      var j = 0
      while (j + 1 < s.length) {
        val p = (s(j), s(j + 1))
        val nc = pairCount.getOrElse(p, 0L) + c
        if (nc == 0L) pairCount.remove(p) else pairCount(p) = nc
        touched += p
        if (sign > 0L) pairWords.getOrElseUpdate(p, mutable.ArrayBuffer.empty) += i
        j += 1
      }
    }
    syms.indices.foreach(indexWord(_, 1L))
    // max-heap on (count, pair) with the pair order REVERSED so equal
    // counts pop the lexicographically smallest (l, r) first — the
    // engine's deterministic total order. Stale entries (superseded
    // counts) are skipped on pop by validating against pairCount.
    implicit val ord: Ordering[(Long, String, String)] =
      (a, b) => {
        val byCount = java.lang.Long.compare(a._1, b._1)
        if (byCount != 0) byCount
        else {
          val byL = b._2.compareTo(a._2)
          if (byL != 0) byL else b._3.compareTo(a._3)
        }
      }
    val heap = mutable.PriorityQueue.empty[(Long, String, String)]
    pairCount.foreach { case ((l, r), c) => heap.enqueue((c, l, r)) }
    val merges = Seq.newBuilder[Merge]
    var step = 1
    var exhausted = false
    while (step <= nMerges && !exhausted) {
      var best: Option[(Long, String, String)] = None
      while (best.isEmpty && heap.nonEmpty) {
        val e = heap.dequeue()
        if (pairCount.get((e._2, e._3)).contains(e._1)) best = Some(e)
      }
      best match {
        case Some((c, l, r)) =>
          merges += Merge(step.toLong, l, r, l + r, c)
          touched.clear()
          // re-index each affected word around the greedy replace; the
          // inverted index may hold stale ids — skip words where the
          // adjacency no longer exists
          val affected = pairWords.remove((l, r)).getOrElse(mutable.ArrayBuffer.empty)
          affected.distinct.foreach { i =>
            val s = syms(i)
            var has = false
            var j = 0
            while (!has && j + 1 < s.length) { has = s(j) == l && s(j + 1) == r; j += 1 }
            if (has) {
              indexWord(i, -1L)
              val b = Array.newBuilder[String]
              var p = 0
              while (p < s.length) {
                if (p + 1 < s.length && s(p) == l && s(p + 1) == r) { b += l + r; p += 2 }
                else { b += s(p); p += 1 }
              }
              syms(i) = b.result()
              indexWord(i, 1L)
            }
          }
          touched.foreach { p =>
            pairCount.get(p).foreach(c2 => heap.enqueue((c2, p._1, p._2)))
          }
        case None => exhausted = true
      }
      step += 1
    }
    merges.result()
  }
}
