package graft.ml

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: image/audio/video payloads travel as
  * opaque `binary` columns with a typed metadata struct; decode /
  * feature-extraction runs batched per partition (mapPartitions over a
  * typed Dataset — Spark's Scala analog of `mapInPandas`: the iterator
  * is consumed in fixed-size batches so a real decoder could hand each
  * batch to a native library in one call).
  *
  * The decode step itself is a STUB — this container has no image/audio
  * codecs — producing deterministic pseudo-features from the raw bytes.
  * Everything around it (schema, batching, partitioning, frame
  * sampling, checksums) is real and tested.
  */
object Multimodal {

  final case class MediaRow(id: Long, modality: String, content: Array[Byte])
  final case class MediaFeatures(
      id: Long,
      modality: String,
      n_bytes: Int,
      width: Int,
      height: Int,
      channels: Int,
      checksum: String
  )

  /** Build a media table from any (id, payload-string) source — the
    * payload bytes are treated as an opaque encoded blob. */
  def fromText(df: DataFrame, idCol: String, textCol: String, modality: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("id"),
      lit(modality).as("modality"),
      encode(col(textCol), "UTF-8").as("content")
    )

  /** STUB decode: deterministic pseudo image dims from the byte stream.
    * A real deployment swaps `decodeBatch` for a codec call; the Spark
    * plumbing (typed rows, per-partition batching, output schema) stays
    * identical. */
  private def decodeBatch(batch: Seq[MediaRow]): Seq[MediaFeatures] = batch.map { m =>
    val md = java.security.MessageDigest.getInstance("MD5").digest(m.content)
    val hex = md.map("%02x".format(_)).mkString
    MediaFeatures(
      m.id,
      m.modality,
      m.content.length,
      width = 16 + (m.content.length % 64),      // STUB: stands in for decoded width
      height = 16 + ((m.content.length / 64) % 64), // STUB: decoded height
      channels = 3,                               // STUB: decoded channel count
      checksum = hex
    )
  }

  /** Batched per-partition feature extraction (batch size mirrors the
    * Arrow batch shape a Pandas-UDF pipeline would use). */
  def extractFeatures(spark: SparkSession, media: DataFrame, batchSize: Int = 256): DataFrame = {
    import spark.implicits._
    media
      .select(col("id"), col("modality"), col("content"))
      .as[MediaRow]
      .mapPartitions(_.grouped(batchSize).flatMap(decodeBatch))
      .toDF()
  }

  /** Frame sampling for "video" payloads: fixed-size byte windows as
    * frames, every `stride`-th frame kept. Pure column arithmetic
    * (`substring` on binary), so it codegens. Empty payloads yield
    * zero frames. The fingerprint is the hex of the raw byte slice
    * (portable across engines, unlike md5-of-BLOB). */
  def sampleFrames(media: DataFrame, frameBytes: Int = 64, stride: Int = 2): DataFrame = {
    val nFrames = floor((length(col("content")) + frameBytes - 1) / frameBytes).cast("int")
    val idxs = when(nFrames > 0, sequence(lit(0), nFrames - 1)).otherwise(array())
    media
      .select(
        col("id"),
        posexplode(
          transform(idxs, i => col("content").substr(i * frameBytes + 1, lit(frameBytes)))
        ).as(Seq("frame_idx", "frame"))
      )
      .filter(pmod(col("frame_idx"), lit(stride)) === 0)
      .withColumn("frame_bytes", length(col("frame")))
      .withColumn("frame_hex", hex(col("frame")))
      .drop("frame")
  }
}
