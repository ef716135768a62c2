package graft.dev

import graft.text.{QualityClassifier, TextOps}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the quality classifier's teacher agreement on the sf0.01
  * fixture — the number behind the QualityClassifierSpec floor and the
  * SCALE.md feature-surface entry (unigram 0.814 → unigram+bigram,
  * this probe). */
object ClfAgreeProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .appName("clf-agree-probe")
      .config("spark.sql.shuffle.partitions", 16)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    val d = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val feats = QualityClassifier.features(d, "doc_id", "text").localCheckpoint(false)
    val labels = TextOps.withQuality(d.select(col("doc_id"), col("text")), col("text"))
      .select(col("doc_id").cast("long").as("id"),
        when(col("quality") >= 0.5, lit(1000000L)).otherwise(lit(0L)).as("y"))
      .localCheckpoint(false)
    for (iters <- Seq(8, 16, 32)) {
      val w = QualityClassifier.train(feats, labels, iters = iters, lrDen = 100L)
      val agree = QualityClassifier.score(feats, w)
        .join(labels, Seq("id"))
        .select(((col("score") > 500000L) === (col("y") === 1000000L)).cast("long").as("ok"))
        .agg(avg("ok")).head().getDouble(0)
      println(f"iters=$iters%2d agreement=$agree%.4f  nFeatureRows=${feats.count()}")
    }
    spark.stop()
  }
}
