package graft

import graft.ops.CountMin
import graft.text.TextOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Count-Min sketch: the deterministic overcount guarantee, shard
  * mergeability (the property that makes it a one-pass statistic), and
  * the dim-table plan shape. */
class CountMinSpec extends SparkSpec {

  private val Depth = 4
  private val Width = 1024

  private def toks: DataFrame =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(explode(TextOps.tokens(col("text"))).as("tok"))

  test("est(x) >= true(x) for every token, and the sketch never exceeds depth*width rows") {
    val sk = CountMin.sketch(toks, "tok", Depth, Width)
    assert(sk.count() <= Depth.toLong * Width, "sketch grew past its counter grid")
    val exact = toks.groupBy("tok").agg(count(lit(1)).as("cnt"))
    val joined = CountMin.estimate(sk, exact, "tok", Depth, Width)
      .join(exact.select(col("tok").as("item"), col("cnt")), Seq("item"))
      .select(col("item"), col("est"), col("cnt")).collect()
    assert(joined.nonEmpty)
    val under = joined.filter(r => r.getLong(1) < r.getLong(2))
    assert(under.isEmpty,
      s"CMS undercounted ${under.length} tokens, e.g. ${under.take(3).mkString(", ")}")
    // and the fixture's observed overcount stays inside the classic
    // eps*N bound with eps = e/width (not guaranteed deterministically;
    // pinned here as a measured property of the fixture)
    val n = toks.count()
    val eps = math.E / Width
    val over = joined.filter(r => (r.getLong(1) - r.getLong(2)) > eps * n)
    assert(over.isEmpty,
      s"observed overcount left the eps*N envelope for ${over.length} tokens")
  }

  test("(eps, delta) constructor: grid dims match the CM05 formulas and the envelope holds at the chosen eps") {
    // the formula mapping itself, pinned at a few canonical contracts
    assert(CountMin.dims(0.01, 0.01) == (5, 272))   // ceil(ln 100)=5, ceil(e/0.01)=272
    assert(CountMin.dims(0.001, 0.05) == (3, 2719))
    assert(CountMin.dims(0.5, 0.9) == (1, 6))       // depth floors at 1
    intercept[IllegalArgumentException](CountMin.dims(0.0, 0.1))
    intercept[IllegalArgumentException](CountMin.dims(0.1, 1.0))
    // and the sized sketch honors the contract it was sized FOR: the
    // existing envelope assertion, parameterized by the caller's eps
    // instead of a hand-picked grid
    val (eps, delta) = (0.01, 0.01)
    val (depth, width) = CountMin.dims(eps, delta)
    val sk = CountMin.sketchBounded(toks, "tok", eps, delta)
    assert(sk.count() <= depth.toLong * width)
    val exact = toks.groupBy("tok").agg(count(lit(1)).as("cnt"))
    val joined = CountMin.estimate(sk, exact, "tok", depth, width)
      .join(exact.select(col("tok").as("item"), col("cnt")), Seq("item"))
      .select(col("est"), col("cnt")).collect()
    val n = toks.count()
    val breaches = joined.count(r => (r.getLong(0) - r.getLong(1)) > eps * n)
    // delta bounds the PER-ITEM failure probability; with ~thousands of
    // distinct tokens a handful of breaches is within contract — pin
    // the observed rate under delta with slack
    assert(breaches.toDouble / joined.length <= delta,
      s"observed eps*N breach rate ${breaches.toDouble / joined.length} exceeds delta=$delta")
    assert(joined.forall(r => r.getLong(0) >= r.getLong(1)), "deterministic lower bound violated")
  }

  test("shard sketches merge by cell-wise sum to exactly the whole-corpus sketch") {
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val a = d.filter(pmod(col("doc_id"), lit(2)) === 0)
      .select(explode(TextOps.tokens(col("text"))).as("tok"))
    val b = d.filter(pmod(col("doc_id"), lit(2)) =!= 0)
      .select(explode(TextOps.tokens(col("text"))).as("tok"))
    val merged = CountMin.sketch(a, "tok", Depth, Width)
      .unionByName(CountMin.sketch(b, "tok", Depth, Width))
      .groupBy("r", "cell").agg(sum("c").as("c"))
    val whole = CountMin.sketch(toks, "tok", Depth, Width)
    def rows(df: DataFrame) = df.collect().map(_.toString).sorted.toSeq
    assert(rows(merged) == rows(whole),
      "cell-wise shard merge diverged from the one-pass sketch — the statistic is not mergeable as claimed")
  }

  test("plan shape: sketch is one partial-aggregated exchange; estimate joins broadcast, no corpus shuffle") {
    val sk = CountMin.sketch(toks, "tok", Depth, Width)
    val skPlan = sk.queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(skPlan).length == 1,
      s"sketch plan needs exactly one exchange (partial agg -> final):\n$skPlan")
    assert(skPlan.contains("partial_count") || skPlan.contains("HashAggregate"),
      s"sketch aggregate lost its map-side partial:\n$skPlan")
    val est = CountMin.estimate(sk.localCheckpoint(false),
      toks.limit(50), "tok", Depth, Width)
    val estPlan = est.queryExecution.executedPlan.toString
    assert(estPlan.contains("BroadcastHashJoin"),
      s"estimate's sketch join is not broadcast:\n$estPlan")
  }
}
