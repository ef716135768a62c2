package graft

import graft.streaming.EventStreams
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Structured Streaming specs driven through MemoryStream micro-batches. */
class EventStreamsSpec extends SparkSpec {

  private def ts(min: Int): java.sql.Timestamp =
    new java.sql.Timestamp(1700000000000L + min * 60000L)

  test("windowed counts aggregate per 5-minute window and drop late rows past the watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, Long, String, Double)]
    val df = mem.toDF().toDF("ts", "user_id", "event_type", "value")
    val q = EventStreams.windowedCounts(df)
      .writeStream.format("memory").queryName("wc").outputMode("append").start()
    try {
      mem.addData((ts(0), 1L, "click", 1.0), (ts(1), 2L, "click", 2.0), (ts(2), 1L, "view", 3.0))
      q.processAllAvailable()
      // advance event time far enough to close the first window
      mem.addData((ts(60), 1L, "click", 1.0))
      q.processAllAvailable()
      val rows = spark.table("wc").select("event_type", "n", "value_sum")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
      assert(rows.contains(("click", 2L, 3.0)))
      assert(rows.contains(("view", 1L, 3.0)))
    } finally q.stop()
  }

  // offset well past epoch 0: a first-batch row AT the initial
  // watermark (0) is dropped as late (the filter is strict), which is
  // a feed artifact, not kernel semantics
  private def sec(s: Long): java.sql.Timestamp =
    new java.sql.Timestamp((1700000000L + s) * 1000L)

  test("TTL dedup: sliding horizon suppresses within, re-emits beyond, across micro-batch boundaries") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, Long, String, Long)]
    val df = mem.toDF().toDF("ts", "user_id", "event_type", "event_id")
    val q = EventStreams.dedupFirstSeenTtl(spark, df, horizonSec = 100, watermark = "10 seconds")
      .writeStream.format("memory").queryName("ttl_sem").outputMode("append").start()
    try {
      // key (1, a): t=0 emits; t=50 suppressed (gap 50 <= 100)
      mem.addData((sec(0), 1L, "a", 10L), (sec(50), 1L, "a", 11L))
      q.processAllAvailable()
      // t=120: gap from the LAST occurrence (50) is 70 <= 100 →
      // suppressed — this pins the SLIDING horizon (a fixed-from-first
      // rule would emit: 120 - 0 > 100). Cross-batch state.
      mem.addData((sec(120), 1L, "a", 12L))
      q.processAllAvailable()
      // t=260: gap 140 > 100 → re-emits (exact-within-horizon, not
      // exact-forever)
      mem.addData((sec(260), 1L, "a", 13L))
      q.processAllAvailable()
      val got = spark.table("ttl_sem").select("event_id").collect().map(_.getLong(0)).toSet
      assert(got == Set(10L, 13L), s"TTL dedup emitted $got, want {10, 13}")
    } finally q.stop()
  }

  test("TTL dedup: sub-second timestamps compare at millisecond granularity (suppression == eviction bound)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, Long, String, Long)]
    val df = mem.toDF().toDF("ts", "user_id", "event_type", "event_id")
    def ms(m: Long): java.sql.Timestamp = new java.sql.Timestamp(1700000000000L + m)
    val q = EventStreams.dedupFirstSeenTtl(spark, df, horizonSec = 100, watermark = "10 seconds")
      .writeStream.format("memory").queryName("ttl_ms").outputMode("append").start()
    try {
      // t=0.500s emits; t=100.400s has ms-gap 99_900 <= 100_000 →
      // suppressed. The r10 floor-seconds state compared integer-second
      // gap 100 <= 100 → also suppressed, BUT only while state
      // survived: after eviction the two granularities disagreed for
      // gaps in (horizon·1000, horizon·1000+999]. Pin the ms rule
      // directly: t=100.400 suppressed, t=200.600 (gap 100_200 ms from
      // 100.4 s) > 100_000 → re-emits even though its integer-second
      // gap (200-100=100) would NOT re-emit under the old second rule.
      mem.addData((ms(500), 1L, "a", 20L), (ms(100400), 1L, "a", 21L))
      q.processAllAvailable()
      mem.addData((ms(200600), 1L, "a", 22L))
      q.processAllAvailable()
      val got = spark.table("ttl_ms").select("event_id").collect().map(_.getLong(0)).toSet
      assert(got == Set(20L, 22L), s"ms-granularity TTL emitted $got, want {20, 22}")
    } finally q.stop()
  }

  test("TTL dedup: state is evicted by the event-time timeout — rows plateau instead of growing with the stream") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, Long, String, Long)]
    val df = mem.toDF().toDF("ts", "user_id", "event_type", "event_id")
    val q = EventStreams.dedupFirstSeenTtl(spark, df, horizonSec = 100, watermark = "10 seconds")
      .writeStream.format("memory").queryName("ttl_plateau").outputMode("append").start()
    try {
      // 10 batches, 10 FRESH keys each, event time advancing 1000 s per
      // batch (far past horizon + watermark): with NoTimeout semantics
      // state would reach 100 rows; with eviction it plateaus at the
      // keys of the last couple of batches (timeouts fire one batch
      // after the watermark passes last-seen + horizon)
      for (b <- 0 until 10) {
        mem.addData((0 until 10).map(j => (sec(b * 1000L), b * 10L + j, "a", b * 10L + j)): _*)
        q.processAllAvailable()
      }
      val stateRows = q.lastProgress.stateOperators.head.numRowsTotal
      assert(stateRows <= 30,
        s"TTL state grew to $stateRows rows over 100 keys — eviction not firing (plateau broken)")
      // every event was a first occurrence of its key → all 100 emitted
      assert(spark.table("ttl_plateau").count() == 100)
    } finally q.stop()
  }

  test("TTL paragraph dedup: horizon-bounded suppression with re-emission") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, Long, Long, Long, String)]
    val df = mem.toDF().toDF("ts", "doc_id", "pidx", "ph", "para")
    val q = EventStreams.dedupParagraphFirstSeenTtl(spark, df, horizonSec = 100, watermark = "10 seconds")
      .writeStream.format("memory").queryName("ttl_para").outputMode("append").start()
    try {
      mem.addData((sec(0), 1L, 0L, 77L, "p"), (sec(50), 2L, 1L, 77L, "p"))
      q.processAllAvailable()
      mem.addData((sec(200), 3L, 2L, 77L, "p")) // gap 150 > 100: fresh again
      q.processAllAvailable()
      val got = spark.table("ttl_para").select("doc_id").collect().map(_.getLong(0)).toSet
      assert(got == Set(1L, 3L), s"TTL paragraph dedup kept $got, want {1, 3}")
    } finally q.stop()
  }

  test("TTL LSH candidates: a new arrival pairs only against residents within the horizon") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, Long, Int, Long)]
    val df = mem.toDF().toDF("ts", "doc_id", "band", "bucket")
    val q = EventStreams.lshCandidatesFirstSeenTtl(spark, df, horizonSec = 100, watermark = "10 seconds")
      .writeStream.format("memory").queryName("ttl_lsh").outputMode("append").start()
    try {
      mem.addData((sec(0), 1L, 0, 9L), (sec(50), 2L, 0, 9L)) // pair (1,2)
      q.processAllAvailable()
      // doc 3 at t=200: residents 1 (t=0) and 2 (t=50) are both older
      // than 200-100 → pruned, no pairs emitted
      mem.addData((sec(200), 3L, 0, 9L))
      q.processAllAvailable()
      // doc 4 at t=250: only doc 3 is within the horizon → pair (3,4)
      mem.addData((sec(250), 4L, 0, 9L))
      q.processAllAvailable()
      val got = spark.table("ttl_lsh").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == Set((1L, 2L), (3L, 4L)), s"TTL LSH candidates $got, want {(1,2),(3,4)}")
    } finally q.stop()
  }

  test("streaming paragraph dedup reproduces the batch global-first-occurrence result on the fixture") {
    val batch = graft.text.ParagraphDedup
      .dedupByParagraph(spark.read.parquet("/root/testdata/sf0.001/documents.parquet"),
        "doc_id", "text", width = 8)
      .select(col("doc_id").cast("long"), col("n_paras"), col("n_kept"), col("kept_text"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
    val streamed = SparkEntry.queries("stream_dedup_paragraph")(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
    assert(streamed === batch)
  }

  test("streaming LSH candidates: cross-batch bucket state, first-collision pairs, maxBucket cap") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Int, Long)]
    val df = mem.toDF().toDF("doc_id", "band", "bucket")
    val q = EventStreams.lshCandidatesFirstSeen(spark, df, maxBucket = 3)
      .writeStream.format("memory").queryName("lsh_cand").outputMode("append").start()
    try {
      // batch 1: docs 1,2 share (0,100) → pair (1,2); doc 5 alone in (1,200)
      mem.addData((2L, 0, 100L), (1L, 0, 100L), (5L, 1, 200L))
      q.processAllAvailable()
      // batch 2: doc 3 joins bucket (0,100) ACROSS the batch boundary →
      // pairs (1,3),(2,3); the 4th member hits the maxBucket=3 cap and
      // must emit nothing; doc 7 joins (1,200) → (5,7)
      mem.addData((3L, 0, 100L), (4L, 0, 100L), (7L, 1, 200L))
      q.processAllAvailable()
      val pairs = spark.table("lsh_cand").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(pairs === Set((1L, 2L), (1L, 3L), (2L, 3L), (5L, 7L)),
        s"unexpected candidate set: $pairs")
    } finally q.stop()
  }

  test("streaming minhash dedup reproduces the batch verified near-dup pairs on the fixture") {
    val batch = SparkEntry.queries("dedup_minhash_lsh")(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val streamed = SparkEntry.queries("stream_dedup_minhash")(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(streamed === batch)
  }

  test("streaming distinct users: per-window sets dedup across micro-batches, emit on watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, Long, String)]
    val df = mem.toDF().toDF("ts", "user_id", "event_type")
    val q = EventStreams.distinctUsers(spark, df)
      .writeStream.format("memory").queryName("du").outputMode("append").start()
    try {
      // same user twice in one batch + again in a second batch, same
      // 5-minute window → must count once; a second user counts too
      mem.addData((ts(0), 1L, "click"), (ts(1), 1L, "click"), (ts(2), 2L, "click"))
      q.processAllAvailable()
      mem.addData((ts(3), 1L, "click"), (ts(4), 3L, "view"))
      q.processAllAvailable()
      // push the watermark (10 min) past the window ends, then trigger
      mem.addData((ts(60), 9L, "s")); q.processAllAvailable()
      mem.addData((ts(120), 9L, "s")); q.processAllAvailable()
      val rows = spark.table("du").select("event_type", "n_users")
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      assert(rows.contains(("click", 2L)), s"got $rows")
      assert(rows.contains(("view", 1L)), s"got $rows")
    } finally q.stop()
  }

  test("HLL distinct users: constant-size sketch state, <5% error at 5k users, batch-boundary-independent") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def run(splits: Int): (Long, Long) = {
      val mem = MemoryStream[(java.sql.Timestamp, Long, String)]
      val df = mem.toDF().toDF("ts", "user_id", "event_type")
      val name = "hll_" + splits
      val q = EventStreams.distinctUsersApprox(spark, df, windowSec = 300)
        .writeStream.format("memory").queryName(name).outputMode("append").start()
      try {
        // 5,000 distinct users (each appearing twice) inside ONE
        // 5-minute window, fed in `splits` micro-batches. The sec()
        // base is not 300-aligned, so anchor on the next window start
        // to keep every event in a single tumbling window.
        val base = ((1700000000L / 300) + 1) * 300 - 1700000000L
        val rows = (0 until 5000).flatMap(u => Seq(
          (sec(base + 60 + u % 200), u.toLong, "click"),
          (sec(base + 61 + u % 200), u.toLong, "click")))
        val per = math.max(1, rows.length / splits)
        rows.grouped(per).foreach { g => mem.addData(g); q.processAllAvailable() }
        // advance the watermark past the window end, twice (advance,
        // then the batch that fires the timeout)
        mem.addData((sec(base + 5000), -1L, "s")); q.processAllAvailable()
        mem.addData((sec(base + 9000), -1L, "s")); q.processAllAvailable()
        val est = spark.table(name).filter(col("event_type") === "click")
          .select("n_users").collect().map(_.getLong(0))
        assert(est.length == 1, s"expected one finalized window, got ${est.length}")
        val stateRows = q.lastProgress.stateOperators.head.numRowsTotal
        (est.head, stateRows)
      } finally q.stop()
    }
    val (e1, _) = run(1)
    val (e3, _) = run(3)
    // register merges are associative: identical estimate however the
    // feed is micro-batched
    assert(e1 == e3, s"HLL estimate depends on micro-batch boundaries: $e1 vs $e3")
    // p=12 → ~1.6% standard error; 5% is a >3σ bound
    assert(math.abs(e1 - 5000.0) / 5000.0 < 0.05,
      s"HLL estimate $e1 is more than 5% off the exact 5000")
  }

  test("stream-stream interval join matches pairs across micro-batch boundaries") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val memC = MemoryStream[(java.sql.Timestamp, Long, Long)]
    val memP = MemoryStream[(java.sql.Timestamp, Long, Long)]
    val q = EventStreams.intervalJoin(
        memC.toDF().toDF("ts", "user_id", "event_id"),
        memP.toDF().toDF("ts", "user_id", "event_id"), rangeSec = 300)
      .writeStream.format("memory").queryName("sij").outputMode("append").start()
    try {
      // click arrives FIRST, its matching purchase a batch later: the
      // join must buffer and still match; user 2's purchase is out of
      // range (+400 s) and user 3's is another user entirely
      memC.addData((ts(10), 1L, 100L), (ts(10), 2L, 101L))
      q.processAllAvailable()
      memP.addData((ts(12), 1L, 200L), (ts(10 + 7), 2L, 201L), (ts(12), 3L, 202L))
      q.processAllAvailable()
      val got = spark.table("sij")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      assert(got == Set((100L, 200L, 1L, -120L)), s"got $got")
    } finally q.stop()
  }

  test("streaming as-of join emits latest-prior matches once the watermark matures them") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val memL = MemoryStream[(java.sql.Timestamp, Long, Long)]
    val memR = MemoryStream[(java.sql.Timestamp, Long, Long)]
    val q = EventStreams.asOfJoin(
        spark,
        memL.toDF().toDF("ts", "user_id", "event_id"),
        memR.toDF().toDF("ts", "user_id", "event_id"))
      .writeStream.format("memory").queryName("saj").outputMode("append").start()
    try {
      // user 1: rights at t2/t8 (t8 arrives LATE, in batch 2), lefts at
      // t5/t10 — t5 must wait for the watermark and still match t2
      // (not the late t8); t10 matches t8. user 2: left with no right.
      memL.addData((ts(5), 1L, 100L), (ts(10), 1L, 101L), (ts(6), 2L, 102L))
      memR.addData((ts(2), 1L, 200L))
      q.processAllAvailable()
      memR.addData((ts(8), 1L, 201L))
      q.processAllAvailable()
      // push the watermark (10 min) far past every left, then trigger twice
      memL.addData((ts(60), 9L, 999L)); q.processAllAvailable()
      memL.addData((ts(120), 9L, 998L)); q.processAllAvailable()
      val got = spark.table("saj").filter($"user_id" < 9)
        .collect().map(r => (r.getLong(0), r.getLong(1),
          Option(r.get(3)).map(_.asInstanceOf[Long]), Option(r.get(4)).map(_.asInstanceOf[Long]))).toSet
      assert(got == Set(
        (100L, 1L, Some(200L), Some(3L * 60)),  // t5 ← right at t2 (late t8 NOT matched)
        (101L, 1L, Some(201L), Some(2L * 60)),  // t10 ← late-arriving right at t8
        (102L, 2L, None, None)                  // no prior right
      ), s"got $got")
    } finally q.stop()
  }

  test("streaming sessionization closes sessions on gap and emits rollups") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, java.sql.Timestamp, String, Double)]
    val df = mem.toDF().toDF("user_id", "ts", "event_type", "value")
    val q = EventStreams.sessionize(spark, df, gapSec = 600)
      .writeStream.format("memory").queryName("sess").outputMode("append").start()
    try {
      // user 7: two events 2 min apart, then a 40-min gap, then one more
      mem.addData((7L, ts(0), "a", 1.0), (7L, ts(2), "b", 2.0))
      q.processAllAvailable()
      mem.addData((7L, ts(42), "c", 4.0))
      q.processAllAvailable()
      val closed = spark.table("sess")
        .select("user_id", "n_events", "value_sum")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSet
      // the first session (2 events, Σ=3.0) must have closed when the gap arrived
      assert(closed.contains((7L, 2, 3.0)), s"got $closed")
    } finally q.stop()
  }
}
