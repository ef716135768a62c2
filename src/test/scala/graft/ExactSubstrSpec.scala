package graft

import graft.text.ExactSubstr
import org.apache.spark.sql.functions._

/** Semantics + plan-shape guards for ExactSubstr span removal: first
  * occurrence survives, overlapping duplicated windows merge into one
  * maximal span, unique text is untouched, and the plan stays
  * gram-keyed (no cartesian, no corpus nested-loop). */
class ExactSubstrSpec extends SparkSpec {
  import spark.implicits._

  // k=3 windows; "d1 d2 d3 d4" is the duplicated region (two
  // overlapping 3-windows that must merge into ONE 4-token span).
  private lazy val docsDf = Seq(
    (1L, "d1 d2 d3 d4 a1 a2 a3"),     // first occurrence → untouched
    (2L, "b1 b2 d1 d2 d3 d4 b3"),     // loses the span: 4 tokens cut
    (3L, "c1 c2 c3 c4 c5"),           // unique → untouched
    (4L, "d1 d2 d3 d4")               // fully duplicated → emptied
  ).toDF("doc_id", "text")

  private lazy val out =
    ExactSubstr.removeDuplicateSpans(docsDf, "doc_id", "text", k = 3)
      .collect().map(r => r.getLong(0) -> r).toMap

  test("global first occurrence keeps its span; unique docs untouched") {
    assert(out(1L).getLong(2) === 0L)
    assert(out(1L).getString(3) === "d1 d2 d3 d4 a1 a2 a3")
    assert(out(3L).getLong(2) === 0L)
    assert(out(3L).getString(3) === "c1 c2 c3 c4 c5")
  }

  test("overlapping duplicated windows merge into one maximal span") {
    // doc 2: windows (d1 d2 d3) at i=2 and (d2 d3 d4) at i=3 overlap;
    // the union covers exactly tokens 2..5 — four tokens, one span.
    assert(out(2L).getLong(1) === 7L)
    assert(out(2L).getLong(2) === 4L)
    assert(out(2L).getString(3) === "b1 b2 b3")
  }

  test("a fully-duplicated document is emptied, not dropped") {
    assert(out(4L).getLong(1) === 4L && out(4L).getLong(2) === 4L)
    assert(out(4L).getString(3) === "")
  }

  test("intra-document repetition: the second copy in the SAME doc is cut") {
    val rep = Seq(
      (1L, "r1 r2 r3 x1 r1 r2 r3"),  // window repeats within one doc
      (2L, "y1 y2 y3 y4")
    ).toDF("doc_id", "text")
    val o = ExactSubstr.removeDuplicateSpans(rep, "doc_id", "text", k = 3)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(o(1L).getLong(2) === 3L)
    assert(o(1L).getString(3) === "r1 r2 r3 x1")
  }

  test("token conservation: n_tokens - n_removed equals kept token count") {
    out.values.foreach { r =>
      val keptToks = if (r.getString(3).isEmpty) 0L else r.getString(3).split(" ").length.toLong
      assert(r.getLong(1) - r.getLong(2) === keptToks, s"doc ${r.getLong(0)}")
    }
  }

  test("mega-doc bound: a 400k-token self-duplicated document resolves with per-doc state ≤ doc length") {
    // doc 1 = 200k distinct tokens followed by the same 200k again: every
    // second-half window duplicates its first-half twin (straddle windows
    // are unique), so exactly the second half must be cut. The two-phase
    // covered aggregation buffers the distinct position set (200k ints),
    // never k × occurrences.
    val n = 200000
    val k = 8
    val half = (0 until n).map(i => s"t$i").mkString(" ")
    val mega = Seq(
      (1L, half + " " + half),
      (2L, "u1 u2 u3 u4 u5 u6 u7 u8 u9")
    ).toDF("doc_id", "text")
    val o = ExactSubstr.removeDuplicateSpans(mega, "doc_id", "text", k = k)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(o(1L).getLong(1) === 2L * n)
    assert(o(1L).getLong(2) === n.toLong, "exactly the second copy must be cut")
    assert(o(1L).getString(3) === half)
    assert(o(2L).getLong(2) === 0L)
  }

  test("salted winner join spreads a 2e6-copy hot gram: no task reads it whole, result exact") {
    // the r7 watch item (ExactSubstr winner join): unsalted, every
    // occurrence of one gram lands in ONE reduce partition — a
    // billion-copy boilerplate footer at 100 TB — and AQE cannot
    // rescue it (OptimizeSkewedJoin needs bare Sort(ShuffleQueryStage)
    // children; the winner side is an aggregate, and an explicit
    // repartition gets elided as redundant — verified empirically
    // before the salt landed). The salt makes the spread structural;
    // this pins it with direct task metrics: 1M docs of PURE hot
    // boilerplate (two 3-grams × 1M occurrences) + 1k unique docs,
    // asserting no task's shuffle read approaches one hot gram's 1M
    // rows.
    val maxRecords = new java.util.concurrent.atomic.AtomicLong(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          val r = m.shuffleReadMetrics.recordsRead
          maxRecords.getAndUpdate(cur => math.max(cur, r))
        }
      }
    }
    // at-scale join shape: the winner table won't broadcast at 100 TB
    // (one row per duplicated gram), and partitions won't sit under the
    // coalesce advisory — disable both so the fixture exercises the
    // shuffled salted join, not a broadcast that makes salt moot, and
    // so AQE's benign small-partition coalescing (which funnels this
    // tiny fixture into one reader task) doesn't pollute the metric.
    val prev = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.coalescePartitions.enabled"
    ).map(kk => kk -> scala.util.Try(spark.conf.get(kk)).toOption)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    spark.sparkContext.addSparkListener(listener)
    try {
      // 150k docs of the SAME token ×20 → every window is ONE mega-gram
      // ("hot hot hot") with 18 × 150k = 2.7M occurrences. Unsalted,
      // the winner join funnels all 2.7M into one reduce task; salted,
      // the heaviest task anywhere in the query stays ≈ the benign
      // per-stage share (~1M combined join-input reads). The 1.5M
      // threshold separates the two with ~2× margin on both sides.
      val hot = spark.range(0, 150000).selectExpr(
        "id AS doc_id",
        "array_join(array_repeat('hot', 20), ' ') AS text")
        .union(spark.range(150000, 151000).selectExpr(
          "id AS doc_id", "concat('u', id, 'a u', id, 'b u', id, 'c u', id, 'd') AS text"))
      val row = ExactSubstr.removeDuplicateSpans(hot, "doc_id", "text", k = 3)
        .agg(count(lit(1)).as("docs"), sum("n_removed").as("cut"))
        .collect()(0)
      assert(row.getLong(0) === 151000L)
      // winner doc 0 keeps only its first token (positions 1..19 are
      // covered by its own later duplicate windows); every other hot
      // doc is fully cut; unique fillers are untouched
      assert(row.getLong(1) === 19L + 20L * 149999L)
      Thread.sleep(2000) // listener bus drain
      val mx = maxRecords.get()
      assert(mx > 0L, "listener saw no shuffle reads — measurement broken")
      assert(mx < 1500000L,
        s"one task read $mx shuffle records — the 2.7M-copy hot gram was not spread")
    } finally {
      spark.sparkContext.removeSparkListener(listener)
      prev.foreach {
        case (kk, Some(v)) => spark.conf.set(kk, v)
        case (kk, None) => spark.conf.unset(kk)
      }
    }
  }

  test("plan is gram-keyed: no cartesian, no nested-loop over the corpus") {
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val plan = ExactSubstr.removeDuplicateSpans(real, "doc_id", "text", k = 8)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"cartesian in span-dedup plan:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"BNLJ in span-dedup plan:\n$plan")
  }
}
