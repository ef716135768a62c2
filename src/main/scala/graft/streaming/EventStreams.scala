package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface over the `events` schema (engine
  * extension — SURVEY §2.10 notes the reference is batch-only; the
  * TESTDATA `events` table motivates the streaming analog of the same
  * aggregations).
  *
  * Shapes provided:
  *  - windowed per-type counts with a watermark (the streaming A9),
  *  - sessionization via `flatMapGroupsWithState` (the streaming
  *    equivalent of the batch gaps-and-islands `sessionize` query),
  *  - first-seen-wins exact dedup keyed by content hash (the streaming
  *    analog of the batch `dedup_exact`),
  *  - exact windowed COUNT(DISTINCT) via stateful sets (built-in
  *    streaming aggregates refuse distinct),
  * over any streaming DataFrame with the matching columns — file,
  * rate, or MemoryStream sources.
  *
  * Scale notes: the windowed count is a standard partial-aggregated
  * stateful op keyed by (window, event_type); sessionization keys state
  * by user_id — state size is bounded by the watermark/timeout, so a
  * 1000-executor cluster shards state linearly with users.
  */
object EventStreams {

  /** 5-minute tumbling-window counts per event type, 10-minute
    * watermark; late rows beyond the watermark are dropped. */
  def windowedCounts(events: DataFrame, window_ : String = "5 minutes", watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("value_sum"))
      .select(
        col("window.start").as("window_start"),
        col("event_type"),
        col("n"),
        col("value_sum")
      )

  final case class DocIn(doc_id: Long, h: Long)
  final case class KeepOut(doc_id: Long, h: Long)

  /** Streaming exact dedup, first-seen-wins: one output row per
    * distinct normalized-content hash, emitted when the hash first
    * appears; every later duplicate is dropped. Within a micro-batch
    * the smallest doc_id wins (deterministic), so a feed ordered by
    * doc_id reproduces the batch `min(doc_id) GROUP BY content`
    * exactly. State is one boolean per distinct content hash, sharded
    * by the hash key — at pipeline scale use the RocksDB state store;
    * content-hash state is the canonical streaming-dedup trade and can
    * be TTL'd with an event-time timeout where re-crawl windows allow.
    * Content is keyed by `xxhash64(normText(text))` — the engine's
    * standard exact-dedup key ([[graft.text.TextOps]]). */
  def dedupFirstSeen(spark: SparkSession, docs: DataFrame): Dataset[KeepOut] = {
    import spark.implicits._
    docs
      .selectExpr("cast(doc_id as long) doc_id", "cast(h as long) h")
      .as[DocIn]
      .groupByKey(_.h)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        (h: Long, rows: Iterator[DocIn], state: GroupState[Boolean]) => {
          if (state.exists) Iterator.empty
          else {
            state.update(true)
            Iterator.single(KeepOut(rows.minBy(_.doc_id).doc_id, h))
          }
        }
      )
  }

  final case class ParaIn(doc_id: Long, pidx: Long, ph: Long, para: String)
  final case class ParaKeep(doc_id: Long, pidx: Long, para: String)

  /** Streaming PARAGRAPH dedup, first-seen-wins per paragraph hash —
    * the streaming port of [[graft.text.ParagraphDedup]]'s global
    * first-occurrence rule. Input is the already-segmented paragraph
    * stream `(doc_id, pidx, ph, para)` (segmentation is a stateless
    * per-row map — [[graft.text.ParagraphDedup.paragraphs]] — so it
    * runs on the stream before the stateful hop); output is one row
    * per distinct paragraph hash, emitted in its arrival micro-batch.
    * Within a micro-batch the (doc_id, pidx)-smallest occurrence wins,
    * so a feed in (doc_id, pidx) order reproduces the batch
    * `first_value OVER (PARTITION BY ph ORDER BY doc_id, pidx)`
    * winner EXACTLY regardless of where micro-batch boundaries fall —
    * the cross-batch case reduces to first-seen, the intra-batch case
    * to the explicit minBy. State is one boolean per distinct
    * paragraph hash, sharded by hash — same scale shape as
    * [[dedupFirstSeen]]; on a 100 TB corpus this is the path that
    * wants RocksDB (state = distinct-paragraph cardinality) and an
    * event-time TTL where the boilerplate horizon allows. Document
    * reassembly stays a batch `groupBy(doc_id)` over the kept rows —
    * it needs per-doc completeness, which only the consumer of the
    * stream (sink table) can decide. */
  def dedupParagraphFirstSeen(spark: SparkSession, paras: DataFrame): Dataset[ParaKeep] = {
    import spark.implicits._
    paras
      .selectExpr("cast(doc_id as long) doc_id", "cast(pidx as long) pidx",
        "cast(ph as long) ph", "para")
      .as[ParaIn]
      .groupByKey(_.ph)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        (ph: Long, rows: Iterator[ParaIn], state: GroupState[Boolean]) => {
          if (state.exists) Iterator.empty
          else {
            state.update(true)
            val w = rows.minBy(r => (r.doc_id, r.pidx))
            Iterator.single(ParaKeep(w.doc_id, w.pidx, w.para))
          }
        }
      )
  }

  final case class ThrottleIn(ts: java.sql.Timestamp, user_id: Long, event_type: String, event_id: Long)
  final case class ThrottleOut(event_id: Long, user_id: Long, event_type: String, sec: Long)

  /** TTL-BOUNDED first-seen dedup over an event stream — the
    * horizon-limited form of [[dedupFirstSeen]]'s exact-forever
    * semantics, keyed by (user_id, event_type): an event is emitted
    * iff NO occurrence of its key arrived within `horizonSec` of it
    * (event time, sliding from the LAST occurrence); copies inside the
    * horizon are suppressed, and a key going quiet for more than the
    * horizon re-emits on return. This is "exact within horizon": the
    * suppression decision compares EVENT TIMES held in state, never
    * the watermark, so for an in-order feed the output equals the
    * batch rule `keep iff gap to previous occurrence > horizon`
    * (a lag window in SQL — the oracle) regardless of micro-batch
    * boundaries.
    *
    * The 100 TB point vs the NoTimeout paths: state per key is ONE
    * long (last-seen MILLISECOND — suppression, eviction, and late-row
    * filtering all operate at the same ms granularity, so "GC never
    * changes semantics" holds for sub-second timestamps too: the r10
    * form floored state to seconds, and a survivor with tsMs in
    * ((last+horizon)·1000, (last+horizon)·1000+999] had integer-second
    * gap == horizon — suppressed by the batch lag oracle but re-emitted
    * by the stream once eviction had dropped the state) and is
    * GARBAGE-COLLECTED by an event-time timeout once the watermark
    * passes last-seen + horizon — total state is bounded by the number
    * of keys ACTIVE within one horizon, not by lifetime key
    * cardinality, so it plateaus on an unbounded stream (spec-pinned
    * by EventStreamsSpec). GC never changes semantics: any row
    * arriving after its key's state expired necessarily has an
    * event-time gap > horizon (the watermark already passed
    * lastMs + horizon·1000, and non-late rows sit at or above the
    * watermark), so it would re-emit either way. */
  def dedupFirstSeenTtl(spark: SparkSession, events: DataFrame, horizonSec: Long,
                        watermark: String = "10 minutes"): Dataset[ThrottleOut] = {
    import spark.implicits._
    events
      .withWatermark("ts", watermark)
      .selectExpr("ts", "cast(user_id as long) user_id", "event_type", "cast(event_id as long) event_id")
      .as[ThrottleIn]
      .groupByKey(e => (e.user_id, e.event_type))
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(
        (key: (Long, String), rows: Iterator[ThrottleIn], state: GroupState[Long]) => {
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            var last: Option[Long] = state.getOption // last-seen ms
            val out = Vector.newBuilder[ThrottleOut]
            // (ts, event_id) order = deterministic arrival order, the
            // oracle's window ordering
            for (r <- rows.toSeq.sortBy(r => (r.ts.getTime, r.event_id))) {
              val ms = r.ts.getTime
              if (last.forall(l => ms - l > horizonSec * 1000))
                out += ThrottleOut(r.event_id, key._1, key._2, ms / 1000)
              last = Some(last.fold(ms)(math.max(_, ms)))
            }
            state.update(last.get)
            state.setTimeoutTimestamp(
              math.max(last.get + horizonSec * 1000 + 1, state.getCurrentWatermarkMs + 1))
            out.result().iterator
          }
        }
      )
  }

  final case class ParaTtlIn(ts: java.sql.Timestamp, doc_id: Long, pidx: Long, ph: Long, para: String)

  /** TTL-bounded form of [[dedupParagraphFirstSeen]]: a paragraph hash
    * suppresses copies only within `horizonSec` (event time, sliding
    * from the last occurrence) — the re-crawl-window semantics a
    * perpetual 100 TB crawl needs, where boilerplate must stay deduped
    * while a paragraph genuinely re-entering the corpus after the
    * horizon is fresh content. Same state/GC contract as
    * [[dedupFirstSeenTtl]]: one long per hash, evicted once the
    * watermark passes last-seen + horizon, so state plateaus at the
    * horizon's distinct-paragraph cardinality instead of growing with
    * the stream. Winner per emission is the (ts, doc_id, pidx)-least
    * occurrence in its arrival batch. */
  def dedupParagraphFirstSeenTtl(spark: SparkSession, paras: DataFrame, horizonSec: Long,
                                 watermark: String = "10 minutes"): Dataset[ParaKeep] = {
    import spark.implicits._
    paras
      .withWatermark("ts", watermark)
      .selectExpr("ts", "cast(doc_id as long) doc_id", "cast(pidx as long) pidx",
        "cast(ph as long) ph", "para")
      .as[ParaTtlIn]
      .groupByKey(_.ph)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(
        (_: Long, rows: Iterator[ParaTtlIn], state: GroupState[Long]) => {
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            var last: Option[Long] = state.getOption // last-seen ms (see dedupFirstSeenTtl)
            val out = Vector.newBuilder[ParaKeep]
            for (r <- rows.toSeq.sortBy(r => (r.ts.getTime, r.doc_id, r.pidx))) {
              val ms = r.ts.getTime
              if (last.forall(l => ms - l > horizonSec * 1000))
                out += ParaKeep(r.doc_id, r.pidx, r.para)
              last = Some(last.fold(ms)(math.max(_, ms)))
            }
            state.update(last.get)
            state.setTimeoutTimestamp(
              math.max(last.get + horizonSec * 1000 + 1, state.getCurrentWatermarkMs + 1))
            out.result().iterator
          }
        }
      )
  }

  final case class BandTtlIn(ts: java.sql.Timestamp, doc_id: Long, band: Int, bucket: Long)

  /** TTL-bounded form of [[lshCandidatesFirstSeen]]: a new arrival
    * pairs only against bucket residents whose last occurrence is
    * within `horizonSec` of it (event time) — the horizon-limited
    * near-dedup a perpetual crawl runs, where a document only needs
    * checking against the recent corpus. Residents carry their
    * last-seen MILLISECOND (the [[dedupFirstSeenTtl]] granularity
    * rule); each call prunes residents older than the
    * newest arrival's horizon, and the whole bucket's state is
    * GC'd by event-time timeout once the watermark passes the
    * newest resident + horizon — state is bounded by per-bucket
    * occupancy WITHIN the horizon (further capped by `maxBucket`),
    * the plateau EventStreamsSpec pins. A re-arriving resident
    * refreshes its timestamp without re-pairing (it is not fresh
    * content, the batch first-seen rule). */
  def lshCandidatesFirstSeenTtl(spark: SparkSession, bandRows: DataFrame, horizonSec: Long,
                                maxBucket: Int = 1000,
                                watermark: String = "10 minutes"): Dataset[CandOut] = {
    import spark.implicits._
    bandRows
      .withWatermark("ts", watermark)
      .selectExpr("ts", "cast(doc_id as long) doc_id", "cast(band as int) band",
        "cast(bucket as long) bucket")
      .as[BandTtlIn]
      .groupByKey(r => (r.band, r.bucket))
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(
        (_: (Int, Long), rows: Iterator[BandTtlIn], state: GroupState[List[(Long, Long)]]) => {
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            var residents = state.getOption.getOrElse(Nil) // (doc_id, last-seen ms)
            val out = Vector.newBuilder[CandOut]
            for (r <- rows.toSeq.sortBy(r => (r.ts.getTime, r.doc_id))) {
              val ms = r.ts.getTime
              residents = residents.filter(_._2 >= ms - horizonSec * 1000)
              residents.find(_._1 == r.doc_id) match {
                case Some(_) =>
                  residents = residents.map(p => if (p._1 == r.doc_id) (p._1, ms) else p)
                case None if residents.length < maxBucket =>
                  for ((earlier, _) <- residents)
                    out += (if (earlier < r.doc_id) CandOut(earlier, r.doc_id)
                            else CandOut(r.doc_id, earlier))
                  residents = (r.doc_id, ms) :: residents
                case None => // capped: count-and-discard, the prospective maxBucket rule
              }
            }
            if (residents.isEmpty) state.remove()
            else {
              state.update(residents)
              state.setTimeoutTimestamp(math.max(
                residents.map(_._2).max + horizonSec * 1000 + 1,
                state.getCurrentWatermarkMs + 1))
            }
            out.result().iterator
          }
        }
      )
  }

  final case class BandIn(doc_id: Long, band: Int, bucket: Long)
  final case class CandOut(a: Long, b: Long)

  /** Streaming MinHash-LSH CANDIDATE pairs, first-collision-wins: the
    * stateful half of near-dedup on a stream. Input is the band-bucket
    * stream `(doc_id, band, bucket)` — signature + banding is a
    * stateless per-doc map ([[graft.text.MinHashLsh.signaturesFromSets]]
    * + the codegen band hash), so it runs on the stream ahead of this
    * hop, exactly as paragraph segmentation does for
    * [[dedupParagraphFirstSeen]]. State per (band, bucket) key is the
    * doc ids seen in that bucket; a new arrival emits one candidate
    * pair per resident (earlier-id first) and joins the residency.
    * Within a micro-batch, rows apply in doc_id order, so a feed
    * ordered by doc_id reproduces the batch candidate set exactly,
    * wherever the micro-batch boundary falls.
    *
    * `maxBucket` is the skew guard, mirroring the batch
    * [[graft.text.MinHashLsh.candidatePairs]] cap with the PROSPECTIVE
    * streaming semantics: once a bucket holds `maxBucket` residents it
    * stops emitting and admitting (count-and-discard — the
    * [[graft.text.ParagraphDedup]] hot-footer rule), whereas the batch
    * form drops the whole pathological bucket retroactively. On
    * healthy corpora the cap never binds and the two agree (the
    * conformance fixture is spec-checked to stay far below it);
    * pathological buckets degrade to bounded state either way, which
    * is what matters at 100 TB: state is O(resident ids per bucket),
    * sharded by (band, bucket), RocksDB-ready, capped.
    *
    * Exact-Jaccard verification of the emitted candidates is the
    * downstream batch join against the shingle-set table — same
    * decomposition as the batch path (candidates ≫ verify), so the
    * VERIFIED output of the composed pipeline matches
    * `dedup_minhash_lsh` whenever banded recall is complete
    * (machine-checked by RecallGuardSpec). */
  def lshCandidatesFirstSeen(spark: SparkSession, bandRows: DataFrame,
                             maxBucket: Int = 1000): Dataset[CandOut] = {
    import spark.implicits._
    bandRows
      .selectExpr("cast(doc_id as long) doc_id", "cast(band as int) band", "cast(bucket as long) bucket")
      .as[BandIn]
      .groupByKey(r => (r.band, r.bucket))
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        (_: (Int, Long), rows: Iterator[BandIn], state: GroupState[List[Long]]) => {
          var residents = state.getOption.getOrElse(Nil)
          val out = Vector.newBuilder[CandOut]
          // doc_id order within the batch = deterministic arrival order
          for (r <- rows.toSeq.sortBy(_.doc_id)) {
            if (residents.length < maxBucket && !residents.contains(r.doc_id)) {
              for (earlier <- residents)
                out += (if (earlier < r.doc_id) CandOut(earlier, r.doc_id)
                        else CandOut(r.doc_id, earlier))
              residents = r.doc_id :: residents
            }
          }
          state.update(residents)
          out.result().iterator
        }
      )
  }

  final case class WinEv(ts: java.sql.Timestamp, event_type: String, user_id: Long)
  final case class DistinctOut(window_start: Long, event_type: String, n_users: Long)

  /** EXACT distinct users per (tumbling window, event type) — the
    * streaming COUNT(DISTINCT) Spark's built-in streaming aggregates
    * refuse (distinct aggregation is unsupported on streams). State is
    * the per-(window, type) user-id set, held until the watermark
    * passes the window end (event-time timeout), then emitted once as
    * a final count — so results are append-mode final, not retracting
    * partials. State shards by (window, type) key; at very high
    * per-window cardinality the same hook takes a sketch (HLL) instead
    * of the exact set — the exact form is the conformance pin. */
  def distinctUsers(spark: SparkSession, events: DataFrame, windowSec: Long = 300,
                    watermark: String = "10 minutes"): Dataset[DistinctOut] = {
    import spark.implicits._
    events
      .withWatermark("ts", watermark)
      // the watermarked ts column must flow INTO the stateful operator
      // (a derived column loses the watermark metadata and the
      // event-time-timeout checker rejects the plan)
      .selectExpr("ts", "event_type", "cast(user_id as long) user_id")
      .as[WinEv]
      .groupByKey(e => (e.ts.getTime / 1000 / windowSec * windowSec, e.event_type))
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(
        (key: (Long, String), rows: Iterator[WinEv], state: GroupState[Set[Long]]) => {
          if (state.hasTimedOut) {
            val users = state.get
            state.remove()
            Iterator.single(DistinctOut(key._1, key._2, users.size.toLong))
          } else {
            // Set state: per-batch work is O(|batch|) hash inserts, not a
            // full re-dedup of the accumulated seq on every micro-batch
            val merged = state.getOption.getOrElse(Set.empty[Long]) ++ rows.map(_.user_id)
            state.update(merged)
            // fire once the watermark passes the window end; a timeout
            // in the past is illegal, so clamp just above the watermark
            val endMs = (key._1 + windowSec) * 1000
            state.setTimeoutTimestamp(math.max(endMs, state.getCurrentWatermarkMs() + 1))
            Iterator.empty
          }
        }
      )
  }

  /** APPROXIMATE distinct users per (tumbling window, event type) via
    * a HyperLogLog sketch held in state — the high-cardinality form of
    * [[distinctUsers]] (whose exact per-key user-id SET grows with the
    * true cardinality; the sketch is a CONSTANT 2^p bytes per key
    * regardless — at 10^9 users per window the exact set is gigabytes
    * of state per key, the p=12 sketch is 4 KB for ~1.6% standard
    * error). Same keying, watermark, and emit-on-event-time-timeout
    * contract; registers merge associatively so micro-batch boundaries
    * cannot affect the final estimate. Hashing is the deterministic
    * XXH64 the engine uses everywhere, so estimates are reproducible
    * run-to-run and spec-pinnable (EventStreamsSpec bounds the
    * relative error against the exact count on a 5k-user feed). */
  def distinctUsersApprox(spark: SparkSession, events: DataFrame, windowSec: Long = 300,
                          watermark: String = "10 minutes", p: Int = 12): Dataset[DistinctOut] = {
    import spark.implicits._
    require(p >= 4 && p <= 16, s"HLL precision p must be in [4, 16], got $p")
    val m = 1 << p
    events
      .withWatermark("ts", watermark)
      .selectExpr("ts", "event_type", "cast(user_id as long) user_id")
      .as[WinEv]
      .groupByKey(e => (e.ts.getTime / 1000 / windowSec * windowSec, e.event_type))
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(
        (key: (Long, String), rows: Iterator[WinEv], state: GroupState[Array[Byte]]) => {
          if (state.hasTimedOut) {
            val regs = state.get
            state.remove()
            // standard HLL estimator + linear-counting small-range
            // correction (Flajolet et al. 2007)
            val alpha = m match {
              case 16 => 0.673
              case 32 => 0.697
              case 64 => 0.709
              case _  => 0.7213 / (1 + 1.079 / m)
            }
            var sum = 0.0
            var zeros = 0
            var i = 0
            while (i < m) {
              sum += java.lang.Math.scalb(1.0, -regs(i))
              if (regs(i) == 0) zeros += 1
              i += 1
            }
            val raw = alpha * m * m / sum
            val est =
              if (raw <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros)
              else raw
            Iterator.single(DistinctOut(key._1, key._2, math.rint(est).toLong))
          } else {
            val regs = state.getOption.getOrElse(new Array[Byte](m))
            for (e <- rows) {
              val h = org.apache.spark.sql.catalyst.expressions.XXH64.hashLong(e.user_id, 42L)
              val idx = (h >>> (64 - p)).toInt
              // rank of the first set bit in the remaining 64-p bits
              val rest = h << p
              val rank = (if (rest == 0L) 64 - p else java.lang.Long.numberOfLeadingZeros(rest)) + 1
              if (rank > regs(idx)) regs(idx) = rank.toByte
            }
            state.update(regs)
            val endMs = (key._1 + windowSec) * 1000
            state.setTimeoutTimestamp(math.max(endMs, state.getCurrentWatermarkMs() + 1))
            Iterator.empty
          }
        }
      )
  }

  /** STREAM-STREAM inner join with event-time bounds: every (click,
    * purchase) pair of the same user within ±`rangeSec` seconds — the
    * streaming form of the batch interval join. Both sides carry
    * watermarks and the join condition bounds purchase time relative
    * to click time, so Spark derives state-eviction watermarks for
    * BOTH join buffers (unbounded state otherwise); matches emit as
    * soon as both sides arrive. At scale, state shards by user_id and
    * is bounded by watermark × arrival rate. */
  def intervalJoin(clicks: DataFrame, purchases: DataFrame, rangeSec: Long = 300,
                   watermark: String = "10 minutes"): DataFrame = {
    val c = clicks
      .selectExpr("ts AS c_ts", "cast(user_id as long) AS user_id", "cast(event_id as long) AS click_id")
      .withWatermark("c_ts", watermark)
    val p = purchases
      .selectExpr("ts AS p_ts", "cast(user_id as long) AS p_user_id", "cast(event_id as long) AS purchase_id")
      .withWatermark("p_ts", watermark)
    c.join(
        p,
        expr(s"""user_id = p_user_id AND
                |p_ts BETWEEN c_ts - INTERVAL $rangeSec seconds
                |         AND c_ts + INTERVAL $rangeSec seconds""".stripMargin))
      .select(
        col("click_id"), col("purchase_id"), col("user_id"),
        ((unix_timestamp(col("c_ts")) - unix_timestamp(col("p_ts")))).as("dt_sec"))
  }

  final case class AsOfIn(user_id: Long, ts: java.sql.Timestamp, event_id: Long, is_right: Boolean)
  final case class AsOfState(rights: List[(Long, Long)], pending: List[(Long, Long)])
  final case class AsOfOut(event_id: Long, user_id: Long, sec: Long,
                           asof_id: Option[Long], gap_sec: Option[Long])

  /** STREAMING as-of join — the trade/quote classic: for every left
    * event, the right event of the same key with the greatest
    * timestamp ≤ the left's (inclusive, rights unique per (key, sec)
    * with max-id dedup — the exact contract of the batch
    * [[graft.ops.AsOfJoin.lastPrior]], so the two are
    * parity-comparable). Spark has no native stream-stream as-of; the
    * stream-stream interval join cannot express "latest prior"
    * (argmax needs closure, not a range predicate). This runs as ONE
    * `flatMapGroupsWithState` over the tagged union of both streams:
    *
    *  - a left emits only once the EVENT-TIME WATERMARK passes its
    *    timestamp — the moment no earlier-or-equal right can still
    *    arrive — so results are exact, not best-effort;
    *  - state per key is the pending (unmatured) lefts plus only the
    *    rights still reachable by some future left: everything before
    *    the latest right ≤ the oldest pending left is pruned each
    *    call, so state is bounded by watermark lag × arrival rate;
    *  - an event-time timeout re-fires the group when the watermark
    *    passes the oldest pending left with no new data, flushing
    *    idle users' matured lefts.
    *
    * At scale: one exchange keyed by user (high-cardinality), state
    * store sharded the same way — the sessionize shape. */
  def asOfJoin(spark: SparkSession, lefts: DataFrame, rights: DataFrame,
               watermark: String = "10 minutes"): Dataset[AsOfOut] = {
    import spark.implicits._
    val tagged = lefts
      .selectExpr("ts", "cast(user_id as long) AS user_id", "cast(event_id as long) AS event_id",
        "false AS is_right")
      .unionByName(rights.selectExpr(
        "ts", "cast(user_id as long) AS user_id", "cast(event_id as long) AS event_id",
        "true AS is_right"))
      .withWatermark("ts", watermark)
      .as[AsOfIn]
    tagged
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(
        (userId: Long, rows: Iterator[AsOfIn], state: GroupState[AsOfState]) => {
          val s = state.getOption.getOrElse(AsOfState(Nil, Nil))
          val newRows = rows.toSeq
          // rights unique per (key, sec), keep max id (batch contract)
          val rightsBuf = (s.rights ++ newRows.collect {
              case e if e.is_right => (e.ts.getTime / 1000, e.event_id)
            })
            .groupBy(_._1).map { case (t, xs) => (t, xs.map(_._2).max) }
            .toList.sorted
          val pending = (s.pending ++ newRows.collect {
              case e if !e.is_right => (e.ts.getTime / 1000, e.event_id)
            }).sorted
          val wmMs = state.getCurrentWatermarkMs
          // inclusive asof: a right at rt == lt qualifies, so a left is
          // safe only once the watermark is STRICTLY past it
          val (matured, stillPending) = pending.partition(_._1 * 1000 < wmMs)
          val out = matured.map { case (lt, lid) =>
            rightsBuf.takeWhile(_._1 <= lt).lastOption match {
              case Some((rt, rid)) => AsOfOut(lid, userId, lt, Some(rid), Some(lt - rt))
              case None            => AsOfOut(lid, userId, lt, None, None)
            }
          }
          // prune rights unreachable by every future left: future lefts
          // have lt >= oldest pending (or >= watermark when none pend)
          val cutoff = stillPending.headOption.map(_._1).getOrElse(wmMs / 1000)
          val keepFrom = rightsBuf.takeWhile(_._1 <= cutoff).lastOption
            .map(_._1).getOrElse(Long.MinValue)
          val keptRights = rightsBuf.dropWhile(_._1 < keepFrom)
          if (stillPending.isEmpty && keptRights.isEmpty) state.remove()
          else {
            state.update(AsOfState(keptRights, stillPending))
            // matured lefts satisfy lt·1000 < wm, so the survivors'
            // timeout lt·1000 + 1 > wm — always a valid (future) stamp
            stillPending.headOption.foreach(p => state.setTimeoutTimestamp(p._1 * 1000 + 1))
          }
          out.iterator
        }
      )
  }

  final case class Ev(user_id: Long, ts: java.sql.Timestamp, event_type: String, value: Double)
  final case class SessionState(start: Long, last: Long, n: Int, valueSum: Double)
  final case class SessionOut(user_id: Long, session_start: Long, session_end: Long, n_events: Int, value_sum: Double)

  /** Streaming sessionization: sessions close after `gapSec` of
    * event-time inactivity. The event-time timeout (watermark-driven)
    * closes the final open session of an idle user; batches trigger
    * only on data, never continuously. Emits one row per closed
    * session. */
  def sessionize(spark: SparkSession, events: DataFrame, gapSec: Long = 1800,
                 watermark: String = "10 minutes"): Dataset[SessionOut] = {
    import spark.implicits._
    events
      .selectExpr("user_id", "ts", "event_type", "cast(value as double) value")
      .withWatermark("ts", watermark)
      .as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(
        (userId: Long, rows: Iterator[Ev], state: GroupState[SessionState]) => {
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(SessionOut(userId, s.start, s.last, s.n, s.valueSum))
          } else {
            val sorted = rows.toSeq.sortBy(_.ts.getTime)
            var closed = List.empty[SessionOut]
            var cur = state.getOption
            for (e <- sorted) {
              val sec = e.ts.getTime / 1000
              cur match {
                case Some(s) if sec - s.last <= gapSec =>
                  cur = Some(SessionState(s.start, sec, s.n + 1, s.valueSum + e.value))
                case Some(s) =>
                  closed = SessionOut(userId, s.start, s.last, s.n, s.valueSum) :: closed
                  cur = Some(SessionState(sec, sec, 1, e.value))
                case None =>
                  cur = Some(SessionState(sec, sec, 1, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp((s.last + gapSec) * 1000)
            }
            closed.reverseIterator
          }
        }
      )
  }
}
