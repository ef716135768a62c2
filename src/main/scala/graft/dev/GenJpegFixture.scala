package graft.dev

import graft.ml.Multimodal
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev generator (not part of the driver contract): freeze the JPEG
  * fixture for `mm_decode_jpeg`. JPEG is lossy, so the conformance
  * oracle cannot recompute decoded pixels from source text the way the
  * BMP/WAV oracles do — instead the encoded BYTES are frozen on disk
  * (fixtures/jpeg_seed42.parquet, from the first 32 sf0.01 documents at
  * explicit quality 0.9) and this generator prints the decode facts to
  * pin as the oracle's literal golden. Decode of a fixed byte stream by
  * the JDK's pure-Java JPEG plugin is deterministic.
  * `runMain graft.dev.GenJpegFixture` */
object GenJpegFixture {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
      .filter(col("doc_id") < 32)
    val media = Multimodal.encodeJpegFromText(docs, "doc_id", "text")
      .coalesce(1)
      .orderBy("id")
    media.write.mode("overwrite").parquet("/root/repo/fixtures/jpeg_seed42.parquet")
    val decoded = Multimodal.decodeJpeg(
      spark, spark.read.parquet("/root/repo/fixtures/jpeg_seed42.parquet"))
      .orderBy("id").collect()
    println("=== oracle VALUES ===")
    decoded.foreach { r =>
      println(s"  (${r.getLong(0)}, ${r.getLong(1)}, ${r.getLong(2)}, ${r.getLong(3)}, ${r.getLong(4)}, ${r.getLong(5)}, ${r.getLong(6)}),")
    }
    spark.stop()
  }
}
