package graft

import graft.text.{QualityClassifier, TextOps}
import org.apache.spark.sql.functions._

/** The learned quality gate: bit-deterministic integer training and a
  * pinned agreement floor against its teacher. */
class QualityClassifierSpec extends SparkSpec {

  private def fixture = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")

  private def labelsOf(df: org.apache.spark.sql.DataFrame) =
    TextOps.withQuality(df.select(col("doc_id"), col("text")), col("text"))
      .select(col("doc_id").cast("long").as("id"),
        when(col("quality") >= 0.5, lit(1000000L)).otherwise(lit(0L)).as("y"))

  test("training is bit-deterministic across input partitionings") {
    val d = fixture
    def weights(parts: Int): Seq[Long] = {
      val dp = d.repartition(parts)
      QualityClassifier.train(
        QualityClassifier.features(dp, "doc_id", "text"), labelsOf(dp),
        iters = 4, lrDen = 100L).toSeq
    }
    assert(weights(3) == weights(17),
      "integer-LMS weights differ across partitionings — a float crept into the gradient path")
  }

  test("the distilled model agrees with its heuristic teacher on >= 78% of the fixture") {
    val d = fixture
    val feats = QualityClassifier.features(d, "doc_id", "text")
    val labels = labelsOf(d)
    val w = QualityClassifier.train(feats, labels, iters = 16, lrDen = 100L)
    val agree = QualityClassifier.score(feats, w)
      .join(labels, Seq("id"))
      .select(((col("score") > 500000L) === (col("y") === 1000000L)).cast("long").as("ok"))
      .agg(avg("ok")).head().getDouble(0)
    // measured 0.818 at sf0.01 with the unigram+bigram surface (0.814
    // unigram-only); the ratio-based teacher is not exactly linear in
    // count features, so the pin is a floor with margin, not an
    // exactness claim — the bit-exact contract is the DuckDB replay
    assert(agree >= 0.78, f"teacher agreement $agree%.3f fell below the 0.78 floor")
  }
}
