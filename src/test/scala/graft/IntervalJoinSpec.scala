package graft

import graft.ops.IntervalJoin
import org.apache.spark.sql.functions._

/** Bucket-replicated range join: exactness vs the naive inequality
  * join, boundary inclusivity, and plan shape. */
class IntervalJoinSpec extends SparkSpec {

  import spark.implicits._

  test("matches the naive inequality join exactly, boundaries inclusive") {
    val rng = new scala.util.Random(11)
    val points = Seq.tabulate(400)(i => (rng.nextInt(5).toLong, rng.nextInt(1000).toLong, i.toLong))
      .toDF("k", "t", "id")
    val intervals = Seq.tabulate(60) { i =>
      val lo = rng.nextInt(1000).toLong
      (rng.nextInt(5).toLong, lo, lo + rng.nextInt(150).toLong, (1000 + i).toLong)
    }.toDF("k", "lo", "hi", "id")
    val got = IntervalJoin.pointInInterval(points, intervals, "k", bucket = 64)
      .select("p_id", "i_id").as[(Long, Long)].collect().toSet
    val naive = points.as("p").join(intervals.as("i"),
        $"p.k" === $"i.k" && $"p.t" >= $"i.lo" && $"p.t" <= $"i.hi")
      .select($"p.id", $"i.id").as[(Long, Long)].collect().toSet
    assert(got == naive, s"bucketed join diverged: missing=${naive -- got} extra=${got -- naive}")
    // boundary inclusivity pinned explicitly
    val bp = Seq((1L, 10L, 1L), (1L, 20L, 2L), (1L, 9L, 3L), (1L, 21L, 4L)).toDF("k", "t", "id")
    val bi = Seq((1L, 10L, 20L, 7L)).toDF("k", "lo", "hi", "id")
    val hits = IntervalJoin.pointInInterval(bp, bi, "k", bucket = 8)
      .select("p_id").as[Long].collect().toSet
    assert(hits == Set(1L, 2L))
  }

  test("plan is a hash equi-join on (key, bucket) — no nested loop over ranges") {
    val points = spark.range(100).select((col("id") % 7).as("k"), col("id").as("t"), col("id").as("id"))
    val intervals = spark.range(10).select(
      (col("id") % 7).as("k"), (col("id") * 9).as("lo"), (col("id") * 9 + 20).as("hi"),
      col("id").as("id"))
    val plan = IntervalJoin.pointInInterval(points, intervals, "k", bucket = 16)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"range join degenerated to a product join:\n$plan")
    assert(plan.contains("BroadcastHashJoin") || plan.contains("SortMergeJoin") ||
      plan.contains("ShuffledHashJoin"), s"no hash equi-join in range-join plan:\n$plan")
  }
}
