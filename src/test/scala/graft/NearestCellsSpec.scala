package graft

import graft.functions.NearestCells
import graft.ml.AnnSearch
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The map-side NearestCells argmax must reproduce the windowed
  * crossJoin form it replaced bit-for-bit: same cosine formula and
  * accumulation order, ties to the smaller centroid id, top-k in
  * (cosine desc, id asc) order. */
class NearestCellsSpec extends SparkSpec {

  import spark.implicits._

  private def randomCorpus(n: Int, dim: Int, seed: Long) = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map(i => (i.toLong, Array.fill(dim)(rnd.nextDouble() * 2 - 1))).toDF("id", "vec")
  }

  /** The pre-round-4 formulation: crossJoin + cosine + rank window. */
  private def windowedAssign(corpus: org.apache.spark.sql.DataFrame,
                             centroids: org.apache.spark.sql.DataFrame, k: Int) =
    corpus
      .select(col("id").as("n_id"), col("vec").as("n_vec"))
      .crossJoin(broadcast(centroids))
      .withColumn("csim", AnnSearch.cosine(col("n_vec"), col("c_vec")))
      .withColumn("crank", row_number().over(
        Window.partitionBy("n_id").orderBy(desc("csim"), col("c_id"))))
      .filter(col("crank") <= k)
      .select(col("n_id"), col("crank"), col("c_id"))

  test("map-side assignment == windowed crossJoin assignment, k=1 and k=4") {
    val corpus = randomCorpus(300, 16, seed = 11)
    val centroids = AnnSearch.strideCentroids(corpus, 20)
    val cents = AnnSearch.collectCentroids(centroids)
    for (k <- Seq(1, 4)) {
      val mapSide = corpus
        .select(col("id").as("n_id"),
          posexplode(NearestCells.topCells(col("vec"), cents, k)).as(Seq("pos", "c_id")))
        .select(col("n_id"), (col("pos") + 1).as("crank"), col("c_id"))
        .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
      val windowed = windowedAssign(corpus, centroids, k)
        .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
      assert(mapSide == windowed, s"assignment mismatch at k=$k")
    }
  }

  test("exact ties resolve to the smaller centroid id") {
    // two identical centroids → identical cosine; rank 1 must be id 1
    val corpus = Seq((10L, Array(1.0, 2.0, 3.0))).toDF("id", "vec")
    val centroids = Seq(
      (5L, Array(2.0, 4.0, 6.0)),  // same direction as centroid 1
      (1L, Array(1.0, 2.0, 3.0))
    ).toDF("c_id", "c_vec")
    val cents = AnnSearch.collectCentroids(centroids)
    val cells = corpus.select(NearestCells.topCells(col("vec"), cents, 2).as("cells"))
      .collect()(0).getSeq[Long](0)
    assert(cells == Seq(1L, 5L))
  }

  test("k > nlist returns all cells; ivfAssign output matches windowed cells") {
    val corpus = randomCorpus(100, 8, seed = 23)
    val centroids = AnnSearch.strideCentroids(corpus, 30)
    val cents = AnnSearch.collectCentroids(centroids)
    val all = corpus.select(size(NearestCells.topCells(col("vec"), cents, 99)).as("n"))
      .agg(min("n"), max("n")).collect()(0)
    assert(all.getInt(0) == cents.ids.length && all.getInt(1) == cents.ids.length)
    val assigned = AnnSearch.ivfAssign(corpus, centroids)
      .select("n_id", "cell").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val windowed = windowedAssign(corpus, centroids, 1)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(assigned == windowed)
  }

  test("exact closure edge cases: brute-force parity on random data, forced multi-chunk, empty and all-pairs tau") {
    // random corpus, NO fixture: the closure must equal driver-side
    // brute force for any data and any centroid table
    val corpus = randomCorpus(300, 16, seed = 7).cache()
    val centroids = AnnSearch.strideCentroids(corpus, 20)
    val vecs = corpus.collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val ids = vecs.keys.toArray.sorted
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    def truth(tau: Double): Set[(Long, Long)] = (for {
      i <- ids.indices.iterator
      j <- (i + 1) until ids.length
      if cos(vecs(ids(i)), vecs(ids(j))) >= tau
    } yield (ids(i), ids(j))).toSet
    def engine(tau: Double): Seq[(Long, Long)] =
      AnnSearch.cosineNearPairs(corpus, centroids, tau)
        .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq

    val atQuarter = engine(0.25)
    assert(atQuarter.toSet == truth(0.25), "closure != brute force at tau=0.25 on random data")
    assert(atQuarter.length == atQuarter.distinct.length, "duplicate pair emissions")

    // forced multi-chunk: chunkTarget=7 splits every cell into many
    // chunks — the chunk-pair expansion and the same-chunk/cross-chunk
    // emission rules must still produce the identical set, exactly once
    spark.conf.set("spark.graft.nearpairs.chunkTarget", "7")
    try {
      val chunked = engine(0.25)
      assert(chunked.toSet == truth(0.25), "multi-chunk closure diverged")
      assert(chunked.length == chunked.distinct.length, "multi-chunk closure double-emitted pairs")
    } finally spark.conf.unset("spark.graft.nearpairs.chunkTarget")

    // tau above every cosine: empty, not an error
    assert(engine(0.999999).isEmpty, "impossible tau should produce an empty result")
    // tau = -1: every unordered pair exactly once (the all-pairs limit)
    val all = engine(-1.0)
    assert(all.length == ids.length * (ids.length - 1) / 2,
      s"tau=-1 should emit every unordered pair once, got ${all.length}")
    corpus.unpersist()
  }

  test("exact closure at nlist >= 1000: brute-force parity where the old driver pair loop would bind") {
    // 4000 vectors / stride 4 -> 1000 centroid cells: the scale step
    // where the retired r10 driver candidate loop (nlist^2/2 = 500k
    // driver-side dot products + an O(nlist^2) IndexedSeq) starts to
    // bind. The engine-side candidate join must stay exact here with
    // the DEFAULT knobs (no chunkTarget override), and the guard
    // aggregate must pass without expanding anything first.
    val corpus = randomCorpus(4000, 8, seed = 31).cache()
    val centroids = AnnSearch.strideCentroids(corpus, 4)
    assert(AnnSearch.collectCentroids(centroids).ids.length == 1000)
    val vecs = corpus.collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val ids = vecs.keys.toArray.sorted
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val tau = 0.9
    val truth = (for {
      i <- ids.indices.iterator
      j <- (i + 1) until ids.length
      if cos(vecs(ids(i)), vecs(ids(j))) >= tau
    } yield (ids(i), ids(j))).toSet
    val got = AnnSearch.cosineNearPairs(corpus, centroids, tau)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(truth.nonEmpty, "degenerate fixture: no true pairs at tau=0.9")
    assert(got.toSet == truth, s"closure != brute force at nlist=1000 (got ${got.length}, want ${truth.size})")
    assert(got.length == got.distinct.length, "duplicate pair emissions at nlist=1000")
    corpus.unpersist()
  }
}
