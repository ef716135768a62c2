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

  test("plan is gram-keyed: no cartesian, no nested-loop over the corpus") {
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val plan = ExactSubstr.removeDuplicateSpans(real, "doc_id", "text", k = 8)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"cartesian in span-dedup plan:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"BNLJ in span-dedup plan:\n$plan")
  }
}
