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

  test("LSH verifiedPairs: sound on random corpora, complete at J=1 (4 seeded cases)") {
    import spark.implicits._
    import graft.text.MinHashLsh
    val word = Gen.oneOf((1 to 25).map(i => s"w$i"))
    val docGen = Gen.chooseNum(5, 14).flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))
    for (seed <- 1L to 4L) {
      val base = (0 until 25).map(i => (i.toLong, sample(docGen, seed * 100 + i)))
      // plant exact duplicates — J=1 pairs match in EVERY band, so
      // banding can never lose them (the completeness floor LSH owes)
      val docs = (base ++ Seq((100L, base(3)._2), (101L, base(8)._2))).toDF("doc_id", "text")
      val tau = 0.5
      val got = MinHashLsh.verifiedPairs(docs, "doc_id", "text", tau)
        .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      def shingles(t: String) = t.toLowerCase.trim.replaceAll("\\s+", " ").split(" ")
        .sliding(3).map(_.mkString(" ")).toSet
      val all = (base ++ Seq((100L, base(3)._2), (101L, base(8)._2)))
        .filter(_._2.split(" ").length >= 3)
      val truth = (for {
        (ia, ta) <- all; (ib, tb) <- all if ia < ib
        (sa, sb) = (shingles(ta), shingles(tb))
        j = sa.intersect(sb).size.toDouble / sa.union(sb).size if j >= tau
      } yield (ia, ib)).toSet
      // soundness: exact verification admits no false positive
      assert(got.subsetOf(truth), s"seed $seed: false positives ${got -- truth}")
      // completeness at J=1: planted duplicates must always surface
      assert(got.contains((3L, 100L)) && got.contains((8L, 101L)),
        s"seed $seed: banded LSH lost an exact duplicate pair: $got")
    }
  }

  test("as-of join == naive per-row scan on random event streams (4 seeded cases)") {
    import spark.implicits._
    import graft.ops.AsOfJoin
    val keyGen = Gen.oneOf("a", "b", "c")
    val tsGen = Gen.chooseNum(0L, 50L)
    for (seed <- 1L to 4L) {
      val leftRows = (0 until 30).map(i =>
        (sample(keyGen, seed * 7000 + i), sample(tsGen, seed * 7100 + i), i.toLong))
      // unique (key, ts) on the right — the operator's documented precondition
      val rightRows = (0 until 30).map(i =>
        (sample(keyGen, seed * 9000 + i), sample(tsGen, seed * 9100 + i), (1000 + i).toLong))
        .groupBy(r => (r._1, r._2)).map(_._2.maxBy(_._3)).toSeq
      val got = AsOfJoin.lastPrior(
          leftRows.toDF("key", "ts", "id"), rightRows.toDF("key", "ts", "id"), "key", "ts", "id")
        .collect().map(r => r.getLong(0) ->
          (if (r.isNullAt(3)) None else Some((r.getLong(3), r.getLong(4))))).toMap
      for ((k, t, id) <- leftRows) {
        val want = rightRows.filter(r => r._1 == k && r._2 <= t)
          .sortBy(r => (r._2, r._3)).lastOption.map(r => (r._3, r._2))
        assert(got(id) == want, s"seed $seed: asof mismatch for left id $id: ${got(id)} vs $want")
      }
    }
  }

  test("packing: budget respected, every token placed exactly once, offsets contiguous (4 seeded cases)") {
    import spark.implicits._
    import graft.text.Packing
    val tokGen = Gen.chooseNum(0L, 40L)
    for (seed <- 1L to 4L) {
      val budget = 64
      val docs = (0 until 60).map(i => (i.toLong, sample(tokGen, seed * 500 + i)))
      val out = Packing.packSequences(docs.toDF("doc_id", "n"), "doc_id", "n",
          budget = budget, parts = 4)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      // every positive-count doc's tokens all land somewhere, once
      val placed = out.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
      for ((id, n) <- docs if n > 0)
        assert(placed.getOrElse(id, 0L) == n, s"seed $seed: doc $id placed ${placed.get(id)} of $n")
      assert(!placed.keySet.exists(id => docs(id.toInt)._2 == 0L), "zero-token doc occupied a span")
      // no sequence over budget; all sequences except the last are FULL
      val bySeq = out.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
      val maxSeq = bySeq.keys.max
      assert(bySeq.values.forall(_ <= budget), s"seed $seed: a sequence exceeds the budget")
      for ((s, tot) <- bySeq if s != maxSeq)
        assert(tot == budget, s"seed $seed: non-final sequence $s holds $tot of $budget tokens")
    }
  }

  test("interval join == naive nested scan on random points/intervals (4 seeded cases)") {
    import spark.implicits._
    import graft.ops.IntervalJoin
    val keyGen = Gen.oneOf("x", "y")
    // negative timestamps on purpose: the bucket floor must stay a true
    // floor below zero or points near bucket edges silently vanish
    val tGen = Gen.chooseNum(-40L, 40L)
    for (seed <- 1L to 4L) {
      val points = (0 until 40).map(i =>
        (sample(keyGen, seed * 11000 + i), sample(tGen, seed * 11100 + i), i.toLong))
      val intervals = (0 until 15).map { i =>
        val a = sample(tGen, seed * 12000 + i); val b = sample(tGen, seed * 12100 + i)
        (sample(keyGen, seed * 12200 + i), math.min(a, b), math.max(a, b), (500 + i).toLong)
      }
      val got = IntervalJoin.pointInInterval(
          points.toDF("k", "t", "id"), intervals.toDF("k", "lo", "hi", "id"), "k", bucket = 8L)
        .select("p_id", "i_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val want = (for {
        (pk, t, pid) <- points; (ik, lo, hi, iid) <- intervals
        if pk == ik && t >= lo && t <= hi
      } yield (pid, iid)).toSet
      assert(got == want,
        s"seed $seed: interval join diverged (missing ${want -- got}, extra ${got -- want})")
    }
  }

  test("simhash near-pairs: every reported pair within maxDist; identical docs always pair (4 seeded cases)") {
    import spark.implicits._
    import graft.text.SimHash
    val word = Gen.oneOf((1 to 30).map(i => s"t$i"))
    val docGen = Gen.chooseNum(4, 12).flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))
    for (seed <- 1L to 4L) {
      val base = (0 until 20).map(i => (i.toLong, sample(docGen, seed * 300 + i)))
      val docs = (base :+ (200L, base(5)._2)).toDF("doc_id", "text")
      val sigs = SimHash.signatures(docs, "doc_id", "text").localCheckpoint(true)
      val sigMap = sigs.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val got = SimHash.nearPairs(sigs, "doc_id", maxDist = 3)
        .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      // soundness: the emitted pairs respect the Hamming threshold
      for ((a, b) <- got)
        assert(java.lang.Long.bitCount(sigMap(a) ^ sigMap(b)) <= 3,
          s"seed $seed: pair ($a,$b) exceeds maxDist")
      // completeness floor: an identical doc shares every block
      assert(got.contains((5L, 200L)), s"seed $seed: identical doc pair lost: $got")
      // pigeonhole completeness: EVERY within-distance pair must
      // surface (some block is untouched by <= 3 differing bits)
      val want = (for {
        (ia, _) <- base :+ (200L, base(5)._2); (ib, _) <- base :+ (200L, base(5)._2)
        if ia < ib && java.lang.Long.bitCount(sigMap(ia) ^ sigMap(ib)) <= 3
      } yield (ia, ib)).toSet
      assert(got == want, s"seed $seed: pigeonhole missed pairs ${want -- got}")
    }
  }

  test("hist1d == naive binning on random doubles incl. boundary values (4 seeded cases)") {
    import spark.implicits._
    import graft.ops.HistogramOps
    import graft.ops.HistogramOps.BinSpec
    val vGen = Gen.chooseNum(-2.0, 12.0)
    for (seed <- 1L to 4L) {
      val s = BinSpec(7, 0.0, 10.0)
      // inject exact edges: lo (in), hi (out), an interior bin edge
      val vals = (0 until 120).map(i => sample(vGen, seed * 800 + i)) ++
        Seq(0.0, 10.0, s.lo + 3 * s.width)
      val got = HistogramOps.hist1d(vals.toDF("v"), col("v"), s)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = vals.filter(v => v >= s.lo && v < s.hi)
        .groupBy(v => math.min(((v - s.lo) / s.width).toInt.toLong, (s.n - 1).toLong))
        .view.mapValues(_.length.toLong).toMap
      assert(got == want, s"seed $seed: hist1d diverged: $got vs $want")
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

  test("grams12 == naive unigram+bigram model on random token arrays incl. sizes 0/1/2 (4 seeded cases)") {
    import spark.implicits._
    import graft.text.TextOps
    val word = Gen.oneOf((1 to 15).map(i => s"t$i"))
    val arrGen = Gen.chooseNum(0, 12).flatMap(n => Gen.listOfN(n, word))
    for (seed <- 1L to 4L) {
      // force the edge sizes into every case: empty, singleton, pair
      val arrays = Seq(List.empty[String], List("solo"), List("a", "b")) ++
        (0 until 12).map(i => sample(arrGen, seed * 100 + i))
      val df = arrays.zipWithIndex.map { case (a, i) => (i.toLong, a) }.toDF("id", "w")
      val got = df.select(col("id"), TextOps.grams12(col("w")).as("g"))
        .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toList).toMap
      val want = arrays.zipWithIndex.map { case (a, i) =>
        i.toLong -> (a ++ a.zip(a.drop(1)).map { case (x, y) => s"${x}_$y" })
      }.toMap
      assert(got == want, s"seed $seed: grams12 diverged from the naive model")
    }
  }

  test("CMS sized from (eps, delta): deterministic lower bound holds, eps*N breach rate <= delta (4 seeded cases)") {
    import spark.implicits._
    import graft.ops.CountMin
    val alphabet = Gen.oneOf((1 to 60).map(i => s"tok$i"))
    val streamGen = Gen.chooseNum(200, 600).flatMap(n => Gen.listOfN(n, alphabet))
    for (seed <- 21L to 24L) {
      val toks = sample(streamGen, seed)
      val (eps, delta) = (0.05, 0.05)
      val (depth, width) = CountMin.dims(eps, delta)
      val df = toks.toDF("tok")
      val sk = CountMin.sketchBounded(df, "tok", eps, delta)
      val exact = toks.groupBy(identity).map { case (t, xs) => t -> xs.length.toLong }
      val est = CountMin.estimate(sk, exact.keys.toSeq.toDF("tok"), "tok", depth, width)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val n = toks.length
      for ((t, c) <- exact)
        assert(est(t) >= c, s"seed $seed: sized CMS undercounted '$t'")
      val breaches = exact.count { case (t, c) => est(t) - c > eps * n }
      assert(breaches.toDouble / exact.size <= delta,
        s"seed $seed: breach rate ${breaches.toDouble / exact.size} > delta=$delta " +
          s"(depth=$depth width=$width n=$n)")
    }
  }
}
