package graft

import graft.ops.AsOfJoin
import org.apache.spark.sql.functions._

/** As-of join semantics: latest prior (inclusive) right row per key. */
class AsOfJoinSpec extends SparkSpec {

  import spark.implicits._

  test("matches latest prior right row, inclusive at equal ts, null before any right") {
    val left = Seq(
      (1L, 5L, 100L),  // after r@3 → matches 900
      (1L, 3L, 101L),  // equal ts  → inclusive match 900
      (1L, 2L, 102L),  // before every right row → null
      (1L, 9L, 103L),  // after r@3 and r@7 → matches 901
      (2L, 9L, 104L)   // other key, no rights at all → null
    ).toDF("k", "t", "id")
    val right = Seq(
      (1L, 3L, 900L),
      (1L, 7L, 901L)
    ).toDF("k", "t", "id")
    val out = AsOfJoin.lastPrior(left, right, "k", "t", "id")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) None else Some((r.getLong(3), r.getLong(4))))).toMap
    assert(out == Map(
      100L -> Some((900L, 3L)),
      101L -> Some((900L, 3L)),
      102L -> None,
      103L -> Some((901L, 7L)),
      104L -> None
    ))
  }

  test("plan is one key-hashed exchange — no range join, no cartesian") {
    val left = spark.range(100).select(
      (col("id") % 10).as("k"), col("id").as("t"), col("id").as("id"))
    val right = spark.range(20).select(
      (col("id") % 10).as("k"), (col("id") * 3).as("t"), (col("id") + 1000).as("id"))
    val plan = AsOfJoin.lastPrior(left, right, "k", "t", "id")
      .queryExecution.executedPlan.toString
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(shuffles == 1, s"asof plan has $shuffles exchanges, want 1:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"asof degenerated to a product join:\n$plan")
  }
}
