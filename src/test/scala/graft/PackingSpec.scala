package graft

import graft.text.Packing
import org.apache.spark.sql.functions._

/** Invariants of the concat-and-chunk sequence packer: exact budget
  * fill, token conservation, contiguous spans, and a plan with no
  * global window (the distributed prefix sum replaces it). */
class PackingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = (0L until 300L)
    .map(i => (i, 1L + (i * 2654435761L) % 97L))
    .toDF("doc_id", "n_toks")
  private val budget = 64

  private lazy val packed =
    Packing.packSequences(docs, "doc_id", "n_toks", budget, parts = 8)
      .localCheckpoint()

  test("every sequence except the last is filled to exactly the budget") {
    val perSeq = packed.groupBy("seq_id").agg(sum("seq_tokens").as("t"))
    val maxSeq = perSeq.agg(max("seq_id")).as[Long].head()
    val bad = perSeq.filter(col("seq_id") < maxSeq && col("t") =!= budget.toLong).count()
    assert(bad === 0)
    val last = perSeq.filter(col("seq_id") === maxSeq).select("t").as[Long].head()
    assert(last >= 1L && last <= budget.toLong)
  }

  test("token mass is conserved per document and in total") {
    val perDoc = packed.groupBy(col("id")).agg(sum("seq_tokens").as("t"))
    val joined = docs.join(perDoc, docs("doc_id") === perDoc("id"), "full_outer")
    assert(joined.filter(col("n_toks") =!= col("t") || col("t").isNull || col("n_toks").isNull).count() === 0)
  }

  test("each document's span is a contiguous run of sequence ids") {
    val spans = packed.groupBy("id")
      .agg(min("seq_id").as("lo"), max("seq_id").as("hi"), count(lit(1)).as("n"))
    assert(spans.filter(col("hi") - col("lo") + 1L =!= col("n")).count() === 0)
  }

  test("zero-token documents are dropped, not exploded into bad spans") {
    val withZero = docs.union(Seq((9999L, 0L)).toDF("doc_id", "n_toks"))
    val p = Packing.packSequences(withZero, "doc_id", "n_toks", budget, parts = 4)
    assert(p.filter(col("id") === 9999L).count() === 0)
    assert(p.filter(col("seq_tokens") <= 0L).count() === 0)
  }

  test("the plan has no window operator (distributed prefix sum, not a global sort)") {
    val live = Packing.packSequences(docs, "doc_id", "n_toks", budget, parts = 8)
    val s = live.queryExecution.executedPlan.toString
    assert(!s.contains("Window"), s"global window leaked into the packing plan:\n$s")
  }

  test("reliable pinning yields bit-identical output to localCheckpoint pinning") {
    // The prefix-sum operators depend on a frozen (pid, row-order)
    // snapshot; this proves the reliable-checkpoint mode (the
    // cluster-resilient path) freezes the SAME snapshot.
    val sc = spark.sparkContext
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    val before = sc.getCheckpointDir
    sc.setCheckpointDir(dir)
    try {
      val local = Packing.packSequences(docs, "doc_id", "n_toks", budget, parts = 8)
        .collect().map(_.toSeq).sortBy(_.toString)
      val rel = Packing.packSequences(docs, "doc_id", "n_toks", budget, parts = 8,
        reliable = true).collect().map(_.toSeq).sortBy(_.toString)
      assert(local.toSeq === rel.toSeq)
      // and the checkpoint actually went to reliable storage
      assert(new java.io.File(dir).listFiles().nonEmpty, "no reliable checkpoint written")

      val sLocal = Packing.sampleToBudget(
        docs.withColumn("src", (col("doc_id") % 3).cast("string")),
        "doc_id", "n_toks", "src", budget = 900L, parts = 8, salt = "s7")
        .collect().map(_.toSeq).sortBy(_.toString)
      val sRel = Packing.sampleToBudget(
        docs.withColumn("src", (col("doc_id") % 3).cast("string")),
        "doc_id", "n_toks", "src", budget = 900L, parts = 8, salt = "s7", reliable = true)
        .collect().map(_.toSeq).sortBy(_.toString)
      assert(sLocal.toSeq === sRel.toSeq)
    } finally before match {
      case Some(d) => sc.setCheckpointDir(d)
      case None    => // leave the temp dir set; no API to unset
    }
  }

  test("reliable pinning without a checkpoint dir fails fast with a clear message") {
    // guard is in Pin: checked before any job runs
    val sc = spark.sparkContext
    if (sc.getCheckpointDir.isEmpty) {
      val e = intercept[IllegalArgumentException] {
        Packing.packSequences(docs, "doc_id", "n_toks", budget, parts = 4, reliable = true)
      }
      assert(e.getMessage.contains("setCheckpointDir"))
    } else succeed // dir already set by an earlier test in this JVM
  }
}
