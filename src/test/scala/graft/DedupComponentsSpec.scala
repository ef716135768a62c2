package graft

import graft.text.MinHashLsh
import org.apache.spark.sql.functions._

/** Connected-components dedup over transitive duplicate chains. */
class DedupComponentsSpec extends SparkSpec {

  test("min-label propagation resolves chains and keeps one doc per cluster") {
    import spark.implicits._
    // chain 1-2-3, pair 7-9, isolated pair-less docs absent from pairs
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 9L)).toDF("a", "b")
    val comp = MinHashLsh.components(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 7L, 9L -> 7L))
  }

  test("transitive dedup keeps exactly one of three chained near-identical docs") {
    import spark.implicits._
    val base = (1 to 60).map(i => s"w$i").mkString(" ")
    def edit(at: Int, to: String) = (1 to 60).map(i => if (i == at) to else s"w$i").mkString(" ")
    // 10≈11 (edit at 5), 11≈12 (edit at 5 AND 55) — 10 vs 12 differ in 2 words
    val docs = Seq(
      (10L, base),
      (11L, edit(5, "X")),
      (12L, edit(5, "X") .replace("w55", "Y")),
      (30L, (1 to 60).map(i => s"z$i").mkString(" "))
    ).toDF("doc_id", "text")
    val keep = MinHashLsh.dedupKeepIdsTransitive(docs, "doc_id", "text", tau = 0.7)
      .collect().map(_.getLong(0)).toSet
    assert(keep == Set(10L, 30L))
  }

  test("star contraction matches min-label propagation on chains, stars, and a random graph") {
    import spark.implicits._
    val rng = new scala.util.Random(42)
    val graphs = Seq(
      // chain 1-2-3 plus a detached pair
      Seq((1L, 2L), (2L, 3L), (7L, 9L)),
      // a long path — the high-diameter shape star contraction exists for
      (0L until 40L).map(i => (i, i + 1)),
      // star already centered at its min, reversed orientation
      Seq((5L, 50L), (5L, 51L), (5L, 52L)),
      // random 80-node, 60-edge graph (many components, dup edges, both orders)
      Seq.fill(60)((rng.nextInt(80).toLong, rng.nextInt(80).toLong)).filter(p => p._1 != p._2)
    )
    graphs.foreach { g =>
      val pairs = g.toDF("a", "b")
      val expect = MinHashLsh.components(pairs)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val got = MinHashLsh.componentsStar(pairs)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expect, s"star contraction diverged on graph $g")
    }
  }

  test("star contraction converges on a 64-node chain within the round cap") {
    import spark.implicits._
    val pairs = (0L until 63L).map(i => (i, i + 1)).toDF("a", "b")
    val comp = MinHashLsh.componentsStar(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp.size == 64 && comp.values.forall(_ == 0L))
  }

  test("pointer doubling converges on a 64-node chain within the default round cap") {
    import spark.implicits._
    // a path graph of diameter 63 — one-hop propagation alone would need
    // 63 rounds; pointer doubling needs O(log2 63) ~ 6 and must converge
    // well inside maxIter = 10 (which would previously throw/split)
    val pairs = (0L until 63L).map(i => (i, i + 1)).toDF("a", "b")
    val comp = MinHashLsh.components(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp.size == 64 && comp.values.forall(_ == 0L))
  }
}
