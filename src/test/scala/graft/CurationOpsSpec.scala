package graft

import graft.text.{ParagraphDedup, PiiRedact}
import org.apache.spark.sql.functions._

/** Semantics + plan-shape guards for the round-6 curation operators:
  * PII redaction (pure map-side) and corpus-wide paragraph dedup
  * (single wide exchange, no joins). */
class CurationOpsSpec extends SparkSpec {
  import spark.implicits._

  // ---- PII redaction -------------------------------------------------

  private lazy val piiDocs = Seq(
    (1L, "mail me at jane.doe+x@sub.example.org today"),
    (2L, "call 555-123-4567 or 555-000-1111 now"),
    (3L, "server at 10.0.255.7 went down"),
    (4L, "plain text with no pii at all"),
    (5L, "a@b.io and 192.168.1.1 and 555-867-5309 together")
  ).toDF("doc_id", "text")

  private lazy val pii = PiiRedact.annotate(piiDocs, col("text"))
    .select("doc_id", "n_email", "n_phone", "n_ip", "redacted")
    .collect()
    .map(r => r.getLong(0) -> r)
    .toMap

  test("pii counts are per-type and per-span") {
    assert(pii(1L).getLong(1) === 1L && pii(1L).getLong(2) === 0L && pii(1L).getLong(3) === 0L)
    assert(pii(2L).getLong(2) === 2L)
    assert(pii(3L).getLong(3) === 1L)
    assert(pii(4L).getLong(1) + pii(4L).getLong(2) + pii(4L).getLong(3) === 0L)
    assert(pii(5L).getLong(1) === 1L && pii(5L).getLong(2) === 1L && pii(5L).getLong(3) === 1L)
  }

  test("redaction replaces every span with its typed tag and nothing else") {
    assert(pii(1L).getString(4) === "mail me at [EMAIL] today")
    assert(pii(2L).getString(4) === "call [PHONE] or [PHONE] now")
    assert(pii(3L).getString(4) === "server at [IP] went down")
    assert(pii(4L).getString(4) === "plain text with no pii at all")
    assert(pii(5L).getString(4) === "[EMAIL] and [IP] and [PHONE] together")
  }

  test("redaction is idempotent: tags never re-match any pattern") {
    val once = PiiRedact.annotate(piiDocs, col("text")).select(col("doc_id"), col("redacted"))
    val twice = PiiRedact.annotate(once, col("redacted"))
      .select(col("doc_id"), col("redacted").as("r2"))
    val joined = once.join(twice, "doc_id")
    assert(joined.filter(col("redacted") =!= col("r2")).count() === 0)
  }

  test("counts equal tag counts even when one span matches two patterns") {
    // '555-123-4567@example.com' matches both the email and the phone
    // regex; the chained counting must count it once (as email).
    val tricky = Seq((9L, "write 555-123-4567@example.com soon")).toDF("doc_id", "text")
    val r = PiiRedact.annotate(tricky, col("text"))
      .select("n_email", "n_phone", "n_ip", "redacted").collect()(0)
    assert(r.getLong(0) === 1L && r.getLong(1) === 0L && r.getLong(2) === 0L)
    assert(r.getString(3) === "write [EMAIL] soon")
    // invariant: n_x == number of [X] tags in the redacted output
    assert("\\[EMAIL\\]".r.findAllIn(r.getString(3)).length === r.getLong(0))
    assert("\\[PHONE\\]".r.findAllIn(r.getString(3)).length === r.getLong(1))
  }

  test("pii annotation is map-side: no exchange in the plan") {
    val plan = PiiRedact.annotate(piiDocs, col("text")).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"exchange in pii plan:\n$plan")
  }

  // ---- paragraph dedup -----------------------------------------------

  // width=2 paragraphs; "pa pb" is the repeated boilerplate unit.
  private lazy val paraDocs = Seq(
    (10L, "pa pb u1 u2"),          // first occurrence of "pa pb" → kept
    (20L, "pa pb v1 v2 pa pb"),    // both copies lose to doc 10
    (30L, "w1 w2 pa pb"),          // trailing copy lost
    (40L, "x1 x2 x3")              // odd tail: "x3" is its own paragraph
  ).toDF("doc_id", "text")

  private lazy val deduped =
    ParagraphDedup.dedupByParagraph(paraDocs, "doc_id", "text", width = 2)
      .collect()
      .map(r => r.getLong(0) -> r)
      .toMap

  test("global first occurrence wins; later and intra-doc copies drop") {
    assert(deduped(10L).getLong(2) === 2L && deduped(10L).getString(3) === "pa pb u1 u2")
    assert(deduped(20L).getLong(1) === 3L && deduped(20L).getLong(2) === 1L)
    assert(deduped(20L).getString(3) === "v1 v2")
    assert(deduped(30L).getLong(2) === 1L && deduped(30L).getString(3) === "w1 w2")
  }

  test("short tail forms its own paragraph and unique docs survive whole") {
    assert(deduped(40L).getLong(1) === 2L && deduped(40L).getLong(2) === 2L)
    assert(deduped(40L).getString(3) === "x1 x2 x3")
  }

  test("token mass: kept paragraphs reassemble to a subsequence of the original") {
    val orig = paraDocs.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    deduped.foreach { case (id, row) =>
      val kept = row.getString(3)
      if (kept.nonEmpty) {
        // every kept paragraph text appears in the original, in order
        val origToks = orig(id).split(" ").toSeq
        val keptToks = kept.split(" ").toSeq
        // subsequence check on tokens
        var i = 0
        keptToks.foreach { t =>
          val j = origToks.indexOf(t, i)
          assert(j >= 0, s"token $t of doc $id not found in order")
          i = j + 1
        }
      }
    }
  }

  test("null and empty text docs surface as explicit (doc_id, 0, 0, \"\") rows") {
    val withNulls = Seq[(Long, String)]((1L, "pa pb"), (2L, null), (3L, ""), (4L, "  "))
      .toDF("doc_id", "text")
    val out = ParagraphDedup.dedupByParagraph(withNulls, "doc_id", "text", width = 2)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out.keySet === Set(1L, 2L, 3L, 4L))
    Seq(2L, 3L, 4L).foreach { id =>
      assert(out(id).getLong(1) === 0L && out(id).getLong(2) === 0L, s"doc $id stats")
      assert(out(id).getString(3) === "", s"doc $id kept_text")
    }
    assert(out(1L).getLong(2) === 1L && out(1L).getString(3) === "pa pb")
  }

  test("paragraph dedup plan: two hash exchanges (hash, doc_id), no join") {
    val plan = ParagraphDedup.dedupByParagraph(paraDocs, "doc_id", "text", width = 2)
      .queryExecution.executedPlan.toString
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(shuffles === 2, s"paragraph dedup grew to $shuffles exchanges:\n$plan")
    assert(!plan.contains("Join"), s"join in paragraph dedup plan:\n$plan")
  }
}
