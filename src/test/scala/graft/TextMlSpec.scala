package graft

import graft.ml.{AnnSearch, Multimodal}
import graft.text.{MinHashLsh, SimHash, TextOps}
import org.apache.spark.sql.functions._

/** Training-data-pipeline operator specs: text ops, MinHash-LSH,
  * SimHash, ANN search, multimodal plumbing. */
class TextMlSpec extends SparkSpec {

  private def docsDf(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("normText collapses whitespace; tokens/shingles handle short docs") {
    import spark.implicits._
    val df = docsDf(Seq(
      (0L, "  Hello   WORLD  foo bar "),
      (1L, "one two"),
      (2L, "a b c")
    )).select(
      col("doc_id"),
      TextOps.normText(col("text")).as("norm"),
      TextOps.tokenCount(col("text")).as("n"),
      size(TextOps.shingles(col("text"))).as("nsh")
    ).orderBy("doc_id").as[(Long, String, Int, Int)].collect()
    assert(df(0) == ((0L, "hello world foo bar", 4, 2)))
    assert(df(1) == ((1L, "one two", 2, 0))) // < 3 words → no shingles
    assert(df(2) == ((2L, "a b c", 3, 1)))
  }

  test("band hashes reject non-positive bands and non-divisor band counts loudly") {
    import graft.functions.BandHashes
    intercept[IllegalArgumentException] {
      BandHashes.bandHashes(array(lit(1L), lit(2L)), 0)
    }
    // 3 bands over a 4-long signature would silently drop the tail —
    // must throw at eval instead
    val err = intercept[Exception] {
      spark.range(1)
        .select(BandHashes.bandHashes(array(lit(1L), lit(2L), lit(3L), lit(4L)), 3).as("b"))
        .collect()
    }
    assert(err.getMessage != null || err.getCause != null)
    // SQL builder enforces positivity too
    graft.functions.GraftExtensions.register(spark)
    intercept[Exception] {
      spark.sql("SELECT graft_band_hashes(array(1L, 2L), 0)").collect()
    }
  }

  test("minhash LSH finds planted near-dup and identical pair, not unrelated docs") {
    val base = (1 to 60).map(i => s"w$i").mkString(" ")
    val nearDup = (1 to 60).map(i => if (i == 30) "CHANGED" else s"w$i").mkString(" ")
    val unrelated = (1 to 60).map(i => s"z$i").mkString(" ")
    val docs = docsDf(Seq((0L, base), (1L, nearDup), (2L, unrelated), (3L, base)))
    val pairs = MinHashLsh.verifiedPairs(docs, "doc_id", "text", tau = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(p => (p._1, p._2))
    assert(pairs.map(p => (p._1, p._2)).toSet == Set((0L, 1L), (0L, 3L), (1L, 3L)))
    val exact = pairs.find(p => (p._1, p._2) == ((0L, 3L))).get
    assert(exact._3 == 1.0)
  }

  test("simhash: identical at distance 0, one-word edit close and found by blocking, unrelated far") {
    val base = (1 to 80).map(i => s"w$i").mkString(" ")
    val oneEdit = (1 to 80).map(i => if (i == 40) "CHANGED" else s"w$i").mkString(" ")
    val unrelated = (1 to 80).map(i => s"q$i").mkString(" ")
    val docs = docsDf(Seq((0L, base), (1L, oneEdit), (2L, unrelated), (3L, base)))
    val sigs = SimHash.signatures(docs, "doc_id", "text").cache()
    val sigMap = sigs.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def d(a: Long, b: Long): Int = java.lang.Long.bitCount(sigMap(a) ^ sigMap(b))
    assert(d(0L, 3L) == 0)                 // identical texts
    assert(d(0L, 1L) < 20, s"one-edit distance ${d(0L, 1L)}")  // near-dup stays close
    assert(d(0L, 2L) > 20, s"unrelated distance ${d(0L, 2L)}") // ~30 expected for 60 bits
    // pigeonhole blocking must be COMPLETE at the observed distance
    val maxDist = math.max(d(0L, 1L), 1)
    val keys = SimHash.nearPairs(sigs, "doc_id", maxDist)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(keys.contains((0L, 3L)) && keys.contains((0L, 1L)) && keys.contains((1L, 3L)))
    assert(!keys.exists(p => p._1 == 2L || p._2 == 2L))
    sigs.unpersist()
  }

  test("simhash pigeonhole blocking ≡ brute force on random signatures (property)") {
    import spark.implicits._
    // EXACTNESS property (not probabilistic like LSH): with the cap
    // above every group size, nearPairs must return precisely the
    // pairs at Hamming distance ≤ maxDist. Seeded random signatures,
    // plus planted near-dups to guarantee non-empty expectations.
    val rnd = new scala.util.Random(1234)
    for (trial <- 1 to 3; maxDist <- Seq(1, 3)) {
      val base = Seq.fill(40)(rnd.nextLong() & ((1L << 60) - 1))
      val planted = base.take(8).map(s => s ^ (1L << rnd.nextInt(60)))
      val sigs = (base ++ planted).zipWithIndex.map { case (s, i) => (i.toLong, s) }
      val got = SimHash.nearPairs(sigs.toDF("doc_id", "simhash"), "doc_id", maxDist)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val want = (for {
        (sa, a) <- sigs.map(_.swap)
        (sb, b) <- sigs.map(_.swap)
        if a < b && java.lang.Long.bitCount(sa ^ sb) <= maxDist
      } yield (a, b)).toSet
      assert(got == want, s"trial=$trial maxDist=$maxDist: got ${got.size}, want ${want.size}")
      assert(want.nonEmpty, s"trial=$trial maxDist=$maxDist degenerate: no expected pairs")
    }
  }

  test("simhash maxBlock cap: hot block dropped, pairs sharing a quiet block survive") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val hotVal = 123L // shared block-0 value (bits 0..14)
    def upper45(): Long = (rnd.nextLong() & ((1L << 45) - 1)) << 15
    // 50 hot-block members with random (pairwise-distant) upper bits
    val hot = (10L until 60L).map(i => (i, hotVal | upper45()))
    // near-dup pair (0,1): distance 1 (bit 20 = block 1); blocks 0,2,3 equal.
    // Block 0 sits in the hot group → dropped by the cap; the pair must
    // still surface via its (quiet) shared blocks 2 and 3.
    val s0 = hotVal | upper45()
    val survivor = Seq((0L, s0), (1L, s0 ^ (1L << 20)))
    // pair (100,101): distance 3, one flipped bit in EACH of blocks 1,2,3
    // → the ONLY shared block is the hot block 0: the documented recall
    // cost of the cap (found uncapped, missed capped).
    val s100 = hotVal | upper45()
    val onlyHot = Seq((100L, s100), (101L, s100 ^ (1L << 20) ^ (1L << 35) ^ (1L << 50)))
    val sigs = (hot ++ survivor ++ onlyHot).toDF("doc_id", "simhash")

    def pairs(maxBlock: Int): Set[(Long, Long)] =
      SimHash.nearPairs(sigs, "doc_id", maxDist = 3, maxBlock = maxBlock)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val uncapped = pairs(1000000)
    assert(uncapped.contains((0L, 1L)) && uncapped.contains((100L, 101L)))
    val capped = pairs(40) // hot group has 54 members > 40
    assert(capped.contains((0L, 1L)), "pair sharing quiet blocks must survive the cap")
    assert(!capped.contains((100L, 101L)), "pair whose only shared block is hot is the documented miss")
    // and the cap introduces no spurious pairs
    assert((capped -- uncapped).isEmpty)
  }

  test("ANN brute-force top-k ranks by cosine with deterministic ties") {
    import spark.implicits._
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(0.9f, 0.1f, 0.0f)),
      (2L, Array(0.0f, 1.0f, 0.0f)),
      (3L, Array(-1.0f, 0.0f, 0.0f)),
      (4L, Array(1.0f, 0.0f, 0.0f))
    ).toDF("id", "vec")
    // columns: q_id, rank, n_id, sim
    val got = AnnSearch.bfTopK(vecs.filter($"id" === 0), vecs, 3)
      .orderBy("rank").select("n_id").as[Long].collect().toSeq
    assert(got == Seq(4L, 1L, 2L)) // exact copy first, near second, orthogonal third
  }

  test("IVF with all cells probed equals brute force") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val vecs = (0L until 40L).map(i => (i, Array.fill(8)(rnd.nextFloat() - 0.5f))).toDF("id", "vec")
    val queries = vecs.filter(pmod($"id", lit(10)) === 0)
    val centroids = AnnSearch.strideCentroids(vecs, 8) // 5 centroids
    val assigned = AnnSearch.ivfAssign(vecs, centroids)
    val ivf = AnnSearch.ivfTopK(queries, assigned, centroids, k = 5, nprobe = 5)
      .orderBy("q_id", "rank").collect().map(r => (r.getLong(0), r.getLong(2))).toSeq
    val bf = AnnSearch.bfTopK(queries, vecs, 5)
      .orderBy("q_id", "rank").collect().map(r => (r.getLong(0), r.getLong(2))).toSeq
    assert(ivf == bf)
  }

  test("multimodal: frame sampling covers payload; features are deterministic") {
    import spark.implicits._
    val docs = docsDf(Seq((0L, "x" * 200), (1L, "short")))
    val media = Multimodal.fromText(docs, "doc_id", "text", "video")
    val frames = Multimodal.sampleFrames(media, frameBytes = 64, stride = 1)
      .orderBy("id", "frame_idx")
      .select("id", "frame_idx", "frame_bytes").as[(Long, Int, Int)].collect().toSeq
    assert(frames.filter(_._1 == 0L) == Seq((0L, 0, 64), (0L, 1, 64), (0L, 2, 64), (0L, 3, 8)))
    assert(frames.filter(_._1 == 1L) == Seq((1L, 0, 5)))
    val feats = Multimodal.extractFeatures(spark, media)
      .orderBy("id").select("n_bytes", "checksum").collect()
    assert(feats(0).getInt(0) == 200)
    assert(feats(1).getInt(0) == 5)
    // md5("short") — stable reference value
    assert(feats(1).getString(1) == "4f09daa9d95bcb166a302407a0e0babe")
  }

  test("BMP codec round-trip: real header parse recovers dims and pixel sum; corrupt magic raises") {
    import spark.implicits._
    // n=200 → w = 8 + 200%9 = 10, h = ceil(200/30) = 7, stride = 32
    // n=5   → w = 13, h = 1, stride = ((39+3)/4)*4 = 40
    val docs = docsDf(Seq((0L, "x" * 200), (1L, "abcde")))
    val media = Multimodal.encodeBmpFromText(docs, "doc_id", "text")
    val dec = Multimodal.decodeBmp(spark, media).orderBy("id")
      .select("id", "n_bytes", "width", "height", "channels", "pixel_bytes", "pixel_sum")
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(dec(0) == ((0L, 54L + 32 * 7, 10L, 7L, 3L, 210L, 200L * 'x'.toLong)))
    assert(dec(1) == ((1L, 54L + 40, 13L, 1L, 3L, 39L, "abcde".map(_.toLong).sum)))
    // encoded payloads are genuine BMPs: magic + little-endian width field
    val raw = media.orderBy("id").select("content").as[Array[Byte]].head()
    assert(raw(0) == 'B'.toByte && raw(1) == 'M'.toByte && (raw(18) & 0xff) == 10)
    // flip the magic → the decoder must fail loudly, not emit fallback rows
    val bad = media.select(col("id"), col("modality"),
      concat(lit(Array[Byte]('X', 'X')), expr("substring(content, 3)")).as("content"))
    intercept[org.apache.spark.SparkException] {
      Multimodal.decodeBmp(spark, bad).collect()
    }
  }

  test("BMP resize: nearest-neighbor sampling with re-encoded stride, hand-checked") {
    import spark.implicits._
    // n=5 ("abcde") → source w=13, h=1; resize to 2x2: every out row samples
    // src row 0; out cols 0,1 sample src cols floor(0*13/2)=0 and floor(1*13/2)=6.
    // src pixel 0 bytes = payload[0..2] = 'a','b','c'; src pixel 6 bytes =
    // payload[18..20] = 0,0,0 (zero pad past n=5).
    val media = Multimodal.encodeBmpFromText(docsDf(Seq((5L, "abcde"))), "doc_id", "text")
    val out = Multimodal.decodeBmp(spark, Multimodal.resizeBmp(spark, media, 2, 2))
      .select("width", "height", "pixel_bytes", "pixel_sum")
      .as[(Long, Long, Long, Long)].head()
    val expectSum = 2L * ("abc".map(_.toLong).sum + 0L)
    assert(out == ((2L, 2L, 12L, expectSum)))
  }

  test("JPEG codec round-trip: dims exact, pixels near source, corrupt magic raises") {
    import spark.implicits._
    val texts = Seq((0L, "x" * 100), (1L, "hello jpeg world, a slightly longer payload"), (2L, "abc"))
    val media = Multimodal.encodeJpegFromText(texts.toDF("doc_id", "text"), "doc_id", "text")
      .cache()
    val decoded = Multimodal.decodeJpeg(spark, media)
      .collect().map(r => r.getLong(0) -> r).toMap
    for ((id, text) <- texts) {
      val n = text.getBytes("UTF-8").length
      val w = 8 + n % 9
      val h = math.max(1, (n + 3 * w - 1) / (3 * w))
      val r = decoded(id)
      assert(r.getLong(2) == w && r.getLong(3) == h, s"id=$id dims ${r.getLong(2)}x${r.getLong(3)} != ${w}x$h")
      assert(r.getLong(4) == 3)
      // lossy but bounded: mean decoded sample within 16 of the mean
      // source sample (zero-padded to the pixel grid)
      val srcSum = text.getBytes("UTF-8").map(_ & 0xff).map(_.toLong).sum
      val pixels = 3L * w * h
      val meanDiff = math.abs(r.getLong(6).toDouble / pixels - srcSum.toDouble / pixels)
      assert(meanDiff < 16.0, s"id=$id decoded mean drifted $meanDiff from source")
    }
    // determinism: re-encode + re-decode yields identical checksums
    val again = Multimodal.decodeJpeg(spark,
        Multimodal.encodeJpegFromText(texts.toDF("doc_id", "text"), "doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r.getLong(6)).toMap
    assert(texts.forall { case (id, _) => again(id) == decoded(id).getLong(6) })
    val corrupt = media.selectExpr("id", "modality",
      "concat(cast('XX' as binary), substring(content, 3)) AS content")
    intercept[org.apache.spark.SparkException] {
      Multimodal.decodeJpeg(spark, corrupt).collect()
    }
    media.unpersist()
  }

  test("PNG codec round-trip is LOSSLESS: decoded sample sum equals source byte sum") {
    import spark.implicits._
    val texts = Seq((0L, "lossless png payload " * 4), (1L, "x"), (2L, "abc def ghi"))
    val media = Multimodal.encodePngFromText(texts.toDF("doc_id", "text"), "doc_id", "text").cache()
    val decoded = Multimodal.decodePng(spark, media)
      .collect().map(r => r.getLong(0) -> r).toMap
    for ((id, text) <- texts) {
      val bytes = text.getBytes("UTF-8")
      val n = bytes.length
      val w = 8 + n % 9
      val h = math.max(1, (n + 3 * w - 1) / (3 * w))
      val r = decoded(id)
      assert(r.getLong(2) == w && r.getLong(3) == h && r.getLong(4) == 3)
      // exact: zero-padding contributes 0 to the sum
      assert(r.getLong(6) == bytes.map(_ & 0xff).map(_.toLong).sum,
        s"id=$id PNG round-trip not lossless")
    }
    val corrupt = media.selectExpr("id", "modality",
      "concat(cast('XXXXXXXX' as binary), substring(content, 9)) AS content")
    intercept[org.apache.spark.SparkException] {
      Multimodal.decodePng(spark, corrupt).collect()
    }
    media.unpersist()
  }

  test("WAV codec round-trip: chunk walk recovers format and signed sample sum") {
    import spark.implicits._
    // "abcde": n=5 → channels = 1 + 5%2 = 2, rate = 8000 + 100·(5%17) = 8500,
    // frames = 5, sum = 2 · Σ(b−128)·256 over bytes 97..101
    val docs = docsDf(Seq((3L, "abcde")))
    val media = Multimodal.encodeWavFromText(docs, "doc_id", "text")
    val dec = Multimodal.decodeWav(spark, media)
      .select("id", "n_bytes", "sample_rate", "channels", "bits", "n_frames", "sample_sum")
      .as[(Long, Long, Long, Long, Long, Long, Long)].head()
    val expectSum = 2L * "abcde".map(c => (c.toInt - 128) * 256L).sum
    assert(dec == ((3L, 44L + 5 * 4, 8500L, 2L, 16L, 5L, expectSum)))
    // the decoder's chunk walk must skip unknown chunks: splice a junk
    // chunk between fmt and data and expect identical output
    val spliced = media.as[Multimodal.MediaRow].map { m =>
      val b = m.content
      val junk = "LIST".getBytes ++ Array[Byte](4, 0, 0, 0) ++ Array[Byte](9, 9, 9, 9)
      m.copy(content = b.slice(0, 36) ++ junk ++ b.slice(36, b.length))
    }.toDF("id", "modality", "content")
    val dec2 = Multimodal.decodeWav(spark, spliced)
      .select("sample_rate", "channels", "n_frames", "sample_sum")
      .as[(Long, Long, Long, Long)].head()
    assert(dec2 == ((8500L, 2L, 5L, expectSum)))
  }

  test("hash sampling is deterministic and stratified; chunking covers every token once per window") {
    import spark.implicits._
    // cross-engine pin: DuckDB computes bucket 210 for id=1 with this salt
    val bucket = spark.range(1, 2)
      .select(TextOps.hashBucket(col("id"), "graft-sample-v1").as("b"))
      .as[Long].head()
    assert(bucket == 210L)
    // 100-token doc, size 30 / overlap 10 → starts at 0,20,40,60,80; the
    // would-be 6th window is suppressed because window 5 reached the end
    val toks = (1 to 100).map(i => s"t$i").mkString(" ")
    val chunks = TextOps.chunk(Seq((7L, toks)).toDF("doc_id", "text"), "doc_id", "text",
        size = 30, overlap = 10)
      .orderBy("chunk_idx")
      .select("chunk_idx", "n_tokens").as[(Long, Long)].collect().toSeq
    assert(chunks == Seq((0L, 30L), (1L, 30L), (2L, 30L), (3L, 30L), (4L, 20L)))
    // short doc → exactly one chunk with all tokens
    val one = TextOps.chunk(Seq((8L, "a b c")).toDF("doc_id", "text"), "doc_id", "text",
        size = 30, overlap = 10)
      .select("chunk_idx", "n_tokens").as[(Long, Long)].collect().toSeq
    assert(one == Seq((0L, 3L)))
  }

  test("distinctive terms rank doc-specific words above corpus-wide ones") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha alpha shared"),
      (2L, "beta shared"),
      (3L, "gamma shared")
    ).toDF("doc_id", "text")
    val top = TextOps.distinctiveTerms(docs, "doc_id", "text", k = 2)
      .filter(col("doc_id") === 1L).orderBy("rank")
      .select("term", "tf", "df", "score_ppm").as[(String, Long, Long, Long)].collect().toSeq
    // alpha: tf=2 df=1 → 2e6 ppm; shared: tf=1 df=3 → 333333 ppm
    assert(top == Seq(("alpha", 2L, 1L, 2000000L), ("shared", 1L, 3L, 333333L)))
  }

  test("dedup keep-ids drops only the larger id of verified pairs") {
    val base = (1 to 50).map(i => s"w$i").mkString(" ")
    val docs = docsDf(Seq((10L, base), (20L, base), (30L, "totally different text " * 10)))
    val keep = MinHashLsh.dedupKeepIds(docs, "doc_id", "text", tau = 0.9)
      .collect().map(_.getLong(0)).toSet
    assert(keep == Set(10L, 30L))
  }
}
