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
  * Two decode paths:
  *  - BMP payloads (magic "BM") go through a REAL codec: [[decodeBmp]]
  *    parses the actual BITMAPFILEHEADER/BITMAPINFOHEADER (little-endian
  *    field extraction, pixel-array offset) and walks the pixel rows
  *    with the genuine 4-byte row-stride padding — a byte-level decode,
  *    not arithmetic on the payload length.
  *  - JPEG payloads go through the pure-JVM `javax.imageio` codec
  *    ([[encodeJpegFromText]]/[[decodeJpeg]]) — a genuine external
  *    format plugged into the same batch hook (lossy, so decode facts
  *    are pinned against a frozen fixture).
  *  - anything else falls back to deterministic pseudo-features derived
  *    from the raw bytes (codecs needing non-JDK libraries — PNG would
  *    also be ImageIO, but e.g. video formats need a native lib a real
  *    deployment plugs into the same batch hook).
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

  /** Decoded image facts read out of the byte stream itself. */
  final case class ImageDecode(
      id: Long,
      n_bytes: Long,
      width: Long,
      height: Long,
      channels: Long,
      pixel_bytes: Long,
      pixel_sum: Long
  )

  /** Pseudo-feature fallback for payloads with no recognized codec:
    * deterministic dims derived from the byte stream. A real deployment
    * swaps this arm for a library call; the Spark plumbing (typed rows,
    * per-partition batching, output schema) stays identical. */
  private def decodeBatch(batch: Seq[MediaRow]): Seq[MediaFeatures] = batch.map { m =>
    val md = java.security.MessageDigest.getInstance("MD5").digest(m.content)
    val hex = md.map("%02x".format(_)).mkString
    MediaFeatures(
      m.id,
      m.modality,
      m.content.length,
      width = 16 + (m.content.length % 64),      // fallback: stands in for decoded width
      height = 16 + ((m.content.length / 64) % 64), // fallback: decoded height
      channels = 3,                               // fallback: decoded channel count
      checksum = hex
    )
  }

  private def leU16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  private def leU32(b: Array[Byte], off: Int): Long =
    (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
      ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)

  /** Encode (id, text) rows as REAL 24-bit uncompressed BMP files:
    * 14-byte file header + 40-byte BITMAPINFOHEADER + pixel array whose
    * rows are padded to 4-byte multiples (the actual on-disk BMP
    * layout). Pixel payload is the UTF-8 text, zero-padded to fill the
    * last row; dims are deterministic in the byte length
    * (width = 8 + n % 9, height = ceil(n / 3·width), min 1) so an
    * oracle can recompute them without parsing. Runs as a batched
    * typed map — the same per-partition hook the decoder uses. */
  def encodeBmpFromText(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(textCol).cast("string"))
      .as[(Long, String)]
      .map { case (id, text) =>
        val payload = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        val n = payload.length
        val w = 8 + n % 9
        val h = math.max(1, (n + 3 * w - 1) / (3 * w))
        val stride = ((3 * w + 3) / 4) * 4
        val imageSize = stride * h
        val fileSize = 54 + imageSize
        val buf = java.nio.ByteBuffer.allocate(fileSize).order(java.nio.ByteOrder.LITTLE_ENDIAN)
        buf.put('B'.toByte).put('M'.toByte)
        buf.putInt(fileSize).putShort(0).putShort(0).putInt(54) // reserved ×2, pixel offset
        buf.putInt(40).putInt(w).putInt(h)                      // info header, dims
        buf.putShort(1).putShort(24)                            // planes, bpp
        buf.putInt(0).putInt(imageSize)                         // BI_RGB, image size
        buf.putInt(2835).putInt(2835).putInt(0).putInt(0)       // 72 dpi, palette unused
        var row = 0
        while (row < h) {
          var x = 0
          while (x < 3 * w) {
            val src = row * 3 * w + x
            buf.put(if (src < n) payload(src) else 0.toByte)
            x += 1
          }
          var p = 3 * w
          while (p < stride) { buf.put(0.toByte); p += 1 } // row padding
          row += 1
        }
        MediaRow(id, "image/bmp", buf.array())
      }
      .toDF("id", "modality", "content")
  }

  /** REAL BMP decode: validates the "BM" magic, reads the little-endian
    * header fields (pixel-array offset @10, width @18, height @22,
    * planes @26, bpp @28), then walks `height` pixel rows of
    * `width·bpp/8` bytes each from the pixel offset, skipping the
    * 4-byte row-stride padding — exactly what a codec does before
    * handing pixels to feature extraction. Emits the parsed dims plus
    * an unsigned byte sum over the de-padded pixel array (a decode
    * checksum an oracle can recompute from the source payload).
    * Malformed payloads raise — corrupt data should fail loudly, not
    * produce fallback features. */
  def decodeBmp(spark: SparkSession, media: DataFrame, batchSize: Int = 256): DataFrame = {
    import spark.implicits._
    media
      .select(col("id"), col("modality"), col("content"))
      .as[MediaRow]
      .mapPartitions(_.grouped(batchSize).flatMap(_.map { m =>
        val b = m.content
        require(b.length >= 54 && b(0) == 'B'.toByte && b(1) == 'M'.toByte,
          s"not a BMP payload (id=${m.id})")
        val pixelOff = leU32(b, 10).toInt
        val width = leU32(b, 18).toInt
        val height = leU32(b, 22).toInt
        val planes = leU16(b, 26)
        val bpp = leU16(b, 28)
        require(planes == 1 && bpp % 8 == 0, s"unsupported BMP (planes=$planes bpp=$bpp)")
        val channels = bpp / 8
        val rowBytes = width * channels
        val stride = ((rowBytes + 3) / 4) * 4
        require(b.length >= pixelOff + stride * height, s"truncated BMP (id=${m.id})")
        var sum = 0L
        var row = 0
        while (row < height) {
          val base = pixelOff + row * stride
          var x = 0
          while (x < rowBytes) { sum += (b(base + x) & 0xff); x += 1 }
          row += 1
        }
        ImageDecode(m.id, b.length.toLong, width.toLong, height.toLong,
          channels.toLong, rowBytes.toLong * height, sum)
      }))
      .toDF()
  }

  /** REAL nearest-neighbor resize: decode the BMP (header parse +
    * de-padded pixel extraction), sample source pixels at
    * src = floor(dst · srcDim / dstDim) per axis, and RE-ENCODE the
    * result as a genuine BMP with its own stride padding — the
    * decode→transform→encode round trip an image pipeline performs,
    * running batched per partition like the other codec hooks. */
  def resizeBmp(spark: SparkSession, media: DataFrame, outW: Int, outH: Int,
                batchSize: Int = 256): DataFrame = {
    import spark.implicits._
    require(outW > 0 && outH > 0, s"bad output dims $outW x $outH")
    media
      .select(col("id"), col("modality"), col("content"))
      .as[MediaRow]
      .mapPartitions(_.grouped(batchSize).flatMap(_.map { m =>
        val b = m.content
        require(b.length >= 54 && b(0) == 'B'.toByte && b(1) == 'M'.toByte,
          s"not a BMP payload (id=${m.id})")
        val pixelOff = leU32(b, 10).toInt
        val width = leU32(b, 18).toInt
        val height = leU32(b, 22).toInt
        val channels = leU16(b, 28) / 8
        val rowBytes = width * channels
        val stride = ((rowBytes + 3) / 4) * 4
        // de-padded source pixel array, file row order
        val pix = new Array[Byte](rowBytes * height)
        var r = 0
        while (r < height) {
          System.arraycopy(b, pixelOff + r * stride, pix, r * rowBytes, rowBytes)
          r += 1
        }
        val outRowBytes = outW * channels
        val outStride = ((outRowBytes + 3) / 4) * 4
        val outSize = 54 + outStride * outH
        val buf = java.nio.ByteBuffer.allocate(outSize).order(java.nio.ByteOrder.LITTLE_ENDIAN)
        buf.put('B'.toByte).put('M'.toByte)
        buf.putInt(outSize).putShort(0).putShort(0).putInt(54)
        buf.putInt(40).putInt(outW).putInt(outH)
        buf.putShort(1).putShort((channels * 8).toShort)
        buf.putInt(0).putInt(outStride * outH)
        buf.putInt(2835).putInt(2835).putInt(0).putInt(0)
        var or = 0
        while (or < outH) {
          val srcR = or * height / outH
          var oc = 0
          while (oc < outW) {
            val srcC = oc * width / outW
            var ch = 0
            while (ch < channels) {
              buf.put(pix(srcR * rowBytes + srcC * channels + ch))
              ch += 1
            }
            oc += 1
          }
          var p = outRowBytes
          while (p < outStride) { buf.put(0.toByte); p += 1 }
          or += 1
        }
        MediaRow(m.id, m.modality, buf.array())
      }))
      .toDF("id", "modality", "content")
  }

  /** Encode (id, text) rows as REAL JPEG files through the pure-JVM
    * `javax.imageio` codec (the JDK ships a JPEG plugin — the first
    * external-format codec beyond the hand-rolled BMP/WAV): a
    * deterministic RGB image is built from the payload bytes (same
    * dims rule as the BMP encoder: width = 8 + n % 9,
    * height = ceil(n / 3·width), min 1; missing bytes are 0) and
    * compressed at an EXPLICIT quality so the byte stream does not
    * depend on writer defaults. JPEG is lossy: decoded pixels are not
    * the payload bytes, so decode facts are pinned against a frozen
    * fixture (fixtures/jpeg_seed42.parquet) rather than recomputed
    * from source text. Runs in the same batched per-partition hook as
    * the other codecs. */
  def encodeJpegFromText(df: DataFrame, idCol: String, textCol: String,
                         quality: Float = 0.9f): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(textCol).cast("string"))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        val payload = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        val n = payload.length
        val w = 8 + n % 9
        val h = math.max(1, (n + 3 * w - 1) / (3 * w))
        val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
        val raster = img.getRaster
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            var c = 0
            while (c < 3) {
              val src = (y * w + x) * 3 + c
              raster.setSample(x, y, c, if (src < n) payload(src) & 0xff else 0)
              c += 1
            }
            x += 1
          }
          y += 1
        }
        val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
        val params = writer.getDefaultWriteParam
        params.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
        params.setCompressionQuality(quality)
        val bos = new java.io.ByteArrayOutputStream()
        val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
        writer.setOutput(ios)
        writer.write(null, new javax.imageio.IIOImage(img, null, null), params)
        ios.close(); writer.dispose()
        MediaRow(id, "image/jpeg", bos.toByteArray)
      })
      .toDF("id", "modality", "content")
  }

  /** REAL JPEG decode via `javax.imageio.ImageIO.read`: validates the
    * SOI magic (0xFFD8) up front so corrupt payloads fail loudly with
    * the id (ImageIO.read returns null instead of raising), then emits
    * the decoded dims, band count, and the unsigned sum over every
    * decoded sample — the decode checksum the fixture golden pins. */
  def decodeJpeg(spark: SparkSession, media: DataFrame, batchSize: Int = 256): DataFrame = {
    import spark.implicits._
    media
      .select(col("id"), col("modality"), col("content"))
      .as[MediaRow]
      .mapPartitions(_.grouped(batchSize).flatMap(_.map { m =>
        val b = m.content
        require(b.length >= 2 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8,
          s"not a JPEG payload (id=${m.id})")
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b))
        require(img != null, s"undecodable JPEG payload (id=${m.id})")
        val raster = img.getRaster
        val (w, h, bands) = (img.getWidth, img.getHeight, raster.getNumBands)
        var sum = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            var c = 0
            while (c < bands) { sum += raster.getSample(x, y, c); c += 1 }
            x += 1
          }
          y += 1
        }
        ImageDecode(m.id, b.length.toLong, w.toLong, h.toLong, bands.toLong,
          w.toLong * h * bands, sum)
      }))
      .toDF()
  }

  /** Encode (id, text) rows as REAL PNG files through the same
    * `javax.imageio` hook as the JPEG path (identical deterministic
    * image construction). PNG is LOSSLESS, so unlike JPEG the decoded
    * pixels ARE the payload bytes — the decode checksum is
    * recomputable from the source text by an independent engine,
    * giving this codec a true cross-engine oracle rather than a
    * frozen-fixture pin. */
  def encodePngFromText(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(textCol).cast("string"))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        val payload = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        val n = payload.length
        val w = 8 + n % 9
        val h = math.max(1, (n + 3 * w - 1) / (3 * w))
        val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
        val raster = img.getRaster
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            var c = 0
            while (c < 3) {
              val src = (y * w + x) * 3 + c
              raster.setSample(x, y, c, if (src < n) payload(src) & 0xff else 0)
              c += 1
            }
            x += 1
          }
          y += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", bos)
        MediaRow(id, "image/png", bos.toByteArray)
      })
      .toDF("id", "modality", "content")
  }

  /** REAL PNG decode via `javax.imageio.ImageIO.read`: validates the
    * 8-byte PNG signature, then emits the decoded dims, band count,
    * and full-raster sample sum — which for a lossless codec equals
    * the encoder's input byte sum exactly. */
  def decodePng(spark: SparkSession, media: DataFrame, batchSize: Int = 256): DataFrame = {
    import spark.implicits._
    val magic = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
    media
      .select(col("id"), col("modality"), col("content"))
      .as[MediaRow]
      .mapPartitions(_.grouped(batchSize).flatMap(_.map { m =>
        val b = m.content
        require(b.length >= 8 && magic.indices.forall(i => b(i) == magic(i)),
          s"not a PNG payload (id=${m.id})")
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b))
        require(img != null, s"undecodable PNG payload (id=${m.id})")
        val raster = img.getRaster
        val (w, h, bands) = (img.getWidth, img.getHeight, raster.getNumBands)
        var sum = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            var c = 0
            while (c < bands) { sum += raster.getSample(x, y, c); c += 1 }
            x += 1
          }
          y += 1
        }
        ImageDecode(m.id, b.length.toLong, w.toLong, h.toLong, bands.toLong,
          w.toLong * h * bands, sum)
      }))
      .toDF()
  }

  /** Decoded audio facts read out of the byte stream itself. */
  final case class AudioDecode(
      id: Long,
      n_bytes: Long,
      sample_rate: Long,
      channels: Long,
      bits: Long,
      n_frames: Long,
      sample_sum: Long
  )

  /** Encode (id, text) rows as REAL RIFF/WAVE files: "RIFF" header,
    * 16-byte PCM "fmt " chunk, "data" chunk. Each payload byte becomes
    * one audio frame whose 16-bit little-endian sample value is
    * (byte − 128)·256, duplicated across channels; channel count
    * (1 + n % 2) and sample rate (8000 + 100·(n % 17)) are
    * deterministic in the byte length so an oracle can recompute them
    * without parsing. */
  def encodeWavFromText(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(textCol).cast("string"))
      .as[(Long, String)]
      .map { case (id, text) =>
        val payload = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        val n = payload.length
        val channels = 1 + n % 2
        val sampleRate = 8000 + 100 * (n % 17)
        val bits = 16
        val blockAlign = channels * bits / 8
        val dataSize = n * blockAlign
        val fileSize = 44 + dataSize
        val buf = java.nio.ByteBuffer.allocate(fileSize).order(java.nio.ByteOrder.LITTLE_ENDIAN)
        buf.put("RIFF".getBytes).putInt(fileSize - 8).put("WAVE".getBytes)
        buf.put("fmt ".getBytes).putInt(16)
        buf.putShort(1)                       // PCM
        buf.putShort(channels.toShort)
        buf.putInt(sampleRate)
        buf.putInt(sampleRate * blockAlign)   // byte rate
        buf.putShort(blockAlign.toShort)
        buf.putShort(bits.toShort)
        buf.put("data".getBytes).putInt(dataSize)
        var i = 0
        while (i < n) {
          val sample = (((payload(i) & 0xff) - 128) * 256).toShort
          var c = 0
          while (c < channels) { buf.putShort(sample); c += 1 }
          i += 1
        }
        MediaRow(id, "audio/wav", buf.array())
      }
      .toDF("id", "modality", "content")
  }

  /** REAL WAV decode: validates the RIFF/WAVE magics, then performs the
    * genuine chunk walk — (id, size) pairs with RIFF's odd-size pad
    * byte — picking the "fmt " chunk (PCM format, channel count, sample
    * rate, bit depth) and the "data" chunk (frame count from
    * size / block-align; signed sum of every 16-bit little-endian
    * sample as a decode checksum). Malformed payloads raise. */
  def decodeWav(spark: SparkSession, media: DataFrame, batchSize: Int = 256): DataFrame = {
    import spark.implicits._
    media
      .select(col("id"), col("modality"), col("content"))
      .as[MediaRow]
      .mapPartitions(_.grouped(batchSize).flatMap(_.map { m =>
        val b = m.content
        require(b.length >= 12 && new String(b, 0, 4) == "RIFF" && new String(b, 8, 4) == "WAVE",
          s"not a WAV payload (id=${m.id})")
        var off = 12
        var channels = -1; var sampleRate = -1L; var bits = -1; var blockAlign = -1
        var nFrames = -1L; var sum = 0L
        while (off + 8 <= b.length) {
          val ckId = new String(b, off, 4)
          val ckSize = leU32(b, off + 4).toInt
          require(off + 8 + ckSize <= b.length, s"truncated chunk $ckId (id=${m.id})")
          ckId match {
            case "fmt " =>
              require(leU16(b, off + 8) == 1, s"not PCM (id=${m.id})")
              channels = leU16(b, off + 10)
              sampleRate = leU32(b, off + 12)
              blockAlign = leU16(b, off + 20)
              bits = leU16(b, off + 22)
            case "data" =>
              require(blockAlign > 0, s"data chunk before fmt (id=${m.id})")
              nFrames = ckSize.toLong / blockAlign
              var p = off + 8
              while (p + 1 < off + 8 + ckSize) {
                sum += (((b(p + 1) & 0xff) << 8) | (b(p) & 0xff)).toShort.toLong
                p += 2
              }
            case _ => () // skip unknown chunks — the real RIFF contract
          }
          off += 8 + ckSize + (ckSize & 1) // odd chunk sizes carry a pad byte
        }
        require(channels > 0 && nFrames >= 0, s"missing fmt/data chunk (id=${m.id})")
        AudioDecode(m.id, b.length.toLong, sampleRate, channels.toLong, bits.toLong,
          nFrames, sum)
      }))
      .toDF()
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
