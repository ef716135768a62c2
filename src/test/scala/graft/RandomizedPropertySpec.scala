package graft

import graft.ml.AnnSearch
import graft.ops.CountMin
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Randomized property checks over scalacheck generators with a FIXED
  * seed (deterministic in CI, but not tuned to any fixture): the CMS
  * overcount guarantee and the closure's exactness claim hold on
  * arbitrary inputs, not just the corpora the suite happens to ship. */
class RandomizedPropertySpec extends SparkSpec {

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  test("CMS: est >= exact and shard-merge == one-pass on random multisets (8 seeded cases)") {
    import spark.implicits._
    val alphabet = Gen.oneOf((1 to 40).map(i => s"tok$i"))
    val streamGen = Gen.chooseNum(50, 400).flatMap(n => Gen.listOfN(n, alphabet))
    for (seed <- 1L to 8L) {
      val toks = sample(streamGen, seed)
      val df = toks.toDF("tok")
      val sk = CountMin.sketch(df, "tok", depth = 3, width = 32)
      val exact = toks.groupBy(identity).map { case (t, xs) => t -> xs.length.toLong }
      val est = CountMin.estimate(sk, exact.keys.toSeq.toDF("tok"), "tok", depth = 3, width = 32)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      for ((t, c) <- exact)
        assert(est(t) >= c, s"seed $seed: CMS undercounted '$t' (${est(t)} < $c)")
      // mergeability on a random split point
      val cut = sample(Gen.chooseNum(1, toks.length - 1), seed * 31)
      val (a, b) = toks.splitAt(cut)
      val merged = CountMin.sketch(a.toDF("tok"), "tok", 3, 32)
        .unionByName(CountMin.sketch(b.toDF("tok"), "tok", 3, 32))
        .groupBy("r", "cell").agg(sum("c").as("c"))
      def rows(d: org.apache.spark.sql.DataFrame) = d.collect().map(_.toString).sorted.toSeq
      assert(rows(merged) == rows(sk), s"seed $seed: shard merge diverged from one-pass sketch")
    }
  }

  test("closure: cosineNearPairs == brute-force all-pairs on random corpora (4 seeded cases)") {
    import spark.implicits._
    val vecGen = Gen.listOfN(6, Gen.chooseNum(-1.0, 1.0))
    for (seed <- 1L to 4L) {
      val n = 30
      val vecs = (0 until n).map(i => (i.toLong,
        sample(vecGen, seed * 1000 + i).toArray))
        // zero-norm degenerate vectors are legal input: the NaN-clamp
        // rule says they can never join a qualifying pair
        .map { case (id, v) => if (id == 7L && seed == 2L) (id, Array.fill(6)(0.0)) else (id, v) }
      val corpus = vecs.toDF("id", "vec")
      val tau = 0.7
      val centroids = AnnSearch.strideCentroids(corpus, 5)
      val got = AnnSearch.cosineNearPairs(corpus, centroids, tau)
        .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      def cos(x: Array[Double], y: Array[Double]): Double = {
        val d = x.indices.map(i => x(i) * y(i)).sum
        d / (math.sqrt(x.map(v => v * v).sum) * math.sqrt(y.map(v => v * v).sum))
      }
      val want = (for {
        (ia, va) <- vecs; (ib, vb) <- vecs if ia < ib
        s = cos(va, vb) if !s.isNaN && s >= tau
      } yield (ia, ib)).toSet
      assert(got == want,
        s"seed $seed: closure diverged from brute force (missing ${want -- got}, extra ${got -- want})")
    }
  }
}
