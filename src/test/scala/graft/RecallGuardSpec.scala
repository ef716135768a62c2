package graft

import graft.ml.AnnSearch
import graft.text.MinHashLsh
import org.apache.spark.sql.functions._

/** Machine-checks the documented RECALL ASSUMPTIONS that make the
  * probabilistic operators' oracle parity hold on the driver fixture
  * (the "RECALL ASSUMPTION" notes in [[QueriesText]]): the conformance
  * gate compares banded-LSH / IVF-cell-blocked engine outputs against
  * ALL-PAIRS oracles, which is exact only because the fixture's true
  * pairs sit far above the recall knee. The r6 verdict graded that
  * invariant `weak` while it lived in prose ("probabilistic-recall
  * oracles are fixture-coupled"); this spec is the machine check. If
  * the fixture is ever regenerated with pairs AT the knee, these
  * tests go red with a recall diagnosis — instead of a conformance
  * mismatch that looks like an engine bug.
  */
class RecallGuardSpec extends SparkSpec {

  /** The conformance-gate fixture (CORRECTNESS runs at sf0.01). */
  private val dir = "/root/testdata/sf0.01"

  test("LSH guard: every true J>=0.8 pair is recovered, and sits far above the band S-curve knee") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val sets = MinHashLsh.shingleSets(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    val ids = sets.keys.toArray.sorted
    // ground truth: exact all-pairs Jaccard over distinct-word
    // shingles, computed independently of every engine kernel
    val truePairs = (for {
      i <- ids.indices.iterator
      j <- (i + 1) until ids.length
      a = ids(i); b = ids(j)
      inter = (sets(a) & sets(b)).size
      if inter > 0
      jac = inter.toDouble / (sets(a).size + sets(b).size - inter)
      if jac >= 0.8
    } yield (a, b, jac)).toVector
    assert(truePairs.nonEmpty, "fixture has no J>=0.8 pairs — the LSH conformance row checks nothing")

    // deterministic recall: the engine's banded path (k=32, 8 bands
    // of 4 — the dedup_minhash_lsh config) recovers every true pair
    val engine = MinHashLsh.verifiedPairs(docs, "doc_id", "text", tau = 0.8)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val missed = truePairs.filterNot(p => engine((p._1, p._2)))
    assert(missed.isEmpty, s"LSH missed true pairs on the fixture: $missed")

    // margin: with r=4 rows per band and b=8 bands the per-pair miss
    // probability is (1-J^4)^8 under a re-seeded hash family; the sum
    // over all true pairs is the expected number of missed pairs. A
    // healthy fixture keeps it << 1 — pairs near the J=0.8 threshold
    // contribute ~1.5% each, pairs at the 50%-recall knee (J~0.54)
    // contribute 50% each and would trip this long before producing a
    // flaky conformance red.
    val expMiss = truePairs.map { case (_, _, j) => math.pow(1 - math.pow(j, 4), 8) }.sum
    val minJ = truePairs.map(_._3).min
    assert(expMiss < 0.05,
      f"fixture plants near-dup pairs too close to the LSH S-curve knee: " +
        f"expected misses $expMiss%.4f across ${truePairs.size} true pairs (min J = $minJ%.3f). " +
        "Oracle parity for dedup_minhash_lsh / corpus_pipeline* is RECALL-coupled — " +
        "regenerate the fixture with duplicate pairs well above J=0.8, or widen the bands.")
  }

  test("k-means refinement guard: exact-decimal centroids are bit-deterministic and recall >= the stride baseline") {
    val embs = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    // bit-determinism across partitionings: the whole point of the
    // decimal-sum means — different physical aggregation orders MUST
    // produce identical centroid doubles, or the refined-cell queries
    // stop being oracle-reproducible
    def cents(parts: Int): Seq[(Long, Seq[Double])] =
      AnnSearch.kmeansCentroidsExact(embs.repartition(parts), 25, iters = 2)
        .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).sortBy(_._1).toSeq
    val a = cents(3)
    val b = cents(17)
    assert(a == b, "refined centroids differ across input partitionings — decimal means not exact")

    // ground truth (independent of every engine kernel)
    val vecs = embs.selectExpr("id", "cast(vec as array<double>) vec")
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val ids = vecs.keys.toArray.sorted
    def cos(x: Array[Double], y: Array[Double]): Double = {
      var d = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
      while (i < x.length) { d += x(i) * y(i); nx += x(i) * x(i); ny += y(i) * y(i); i += 1 }
      d / (math.sqrt(nx) * math.sqrt(ny))
    }
    val truePairs = (for {
      i <- ids.indices.iterator
      j <- (i + 1) until ids.length
      if cos(vecs(ids(i)), vecs(ids(j))) >= 0.4
    } yield (ids(i), ids(j))).toSet

    // recall >= the stride baseline, probe-for-probe: at every nprobe
    // the refined cells must miss no more true pairs than the stride
    // cells do (the refinement exists to CONCENTRATE neighbors)
    val stride = AnnSearch.strideCentroids(embs, 25)
    val refined = AnnSearch.kmeansCentroidsExact(embs, 25, iters = 2)
    def missed(centroids: org.apache.spark.sql.DataFrame, nprobe: Int): Int = {
      val got = AnnSearch.cosineNearPairs(embs, centroids, tau = 0.4, nprobe = nprobe)
        .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      (truePairs -- got).size
    }
    for (nprobe <- Seq(8, 12, 15, 17)) {
      val ms = missed(stride, nprobe)
      val mk = missed(refined, nprobe)
      assert(mk <= ms,
        s"refined centroids LOST recall vs stride seeds at nprobe=$nprobe: missed $mk vs $ms")
    }
    // and at the conformance probe fraction the refined cells must be
    // complete (the ann_topk_ivf_km row gates against the exact
    // brute-force oracle)
    assert(missed(refined, 17) == 0, "refined cells miss true pairs at the conformance nprobe")
  }

  test("embedding guard: every true cosine>=0.4 pair is recovered by the IVF-blocked path, with probe margin") {
    val embs = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val vecs = embs.selectExpr("id", "cast(vec as array<double>) vec")
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val ids = vecs.keys.toArray.sorted
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    // ground truth: exact all-pairs cosine, independent of the engine
    val truePairs = (for {
      i <- ids.indices.iterator
      j <- (i + 1) until ids.length
      if cos(vecs(ids(i)), vecs(ids(j))) >= 0.4
    } yield (ids(i), ids(j))).toSet
    assert(truePairs.nonEmpty, "fixture has no cosine>=0.4 pairs — the dedup_embedding row checks nothing")

    // the dedup_embedding config: stride-25 centroids, tau=0.4,
    // nprobe=17 (bumped from 15 by this very guard — at 15 the margin
    // check below failed: pairs (334,382) and (53,430) needed probe
    // rank 14/15, i.e. zero headroom)
    val centroids = AnnSearch.strideCentroids(embs, 25)
    def recovered(nprobe: Int): Set[(Long, Long)] =
      AnnSearch.cosineNearPairs(embs, centroids, tau = 0.4, nprobe = nprobe)
        .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val atConfig = recovered(17)
    assert((truePairs -- atConfig).isEmpty,
      s"IVF cell-blocking missed true pairs at the configured nprobe=17: ${truePairs -- atConfig}")

    // margin: full recall must survive TWO fewer probes, so a fixture
    // drift that pushes a pair's partner cell to the last probe slot
    // (one re-generation away from a spurious conformance red) trips
    // this guard first.
    val atMargin = recovered(15)
    assert((truePairs -- atMargin).isEmpty,
      s"recall margin exhausted: true pairs need probe ranks above nprobe-2=15: ${truePairs -- atMargin}. " +
        "Oracle parity for dedup_embedding / corpus_pipeline_v3 is one fixture drift from a " +
        "spurious red — raise nprobe or regenerate the fixture with tighter clusters.")
  }
}
