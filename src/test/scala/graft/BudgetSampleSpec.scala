package graft

import graft.text.Packing
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Invariants of the grouped distributed prefix sum behind
  * token-budget sampling: partition-count independence (the carry +
  * offset plumbing must be invisible), exact fill-until-full
  * semantics per group, and agreement with the single-window
  * reference formulation. */
class BudgetSampleSpec extends SparkSpec {
  import spark.implicits._

  private val budget = 100L

  // 5 groups × 60 docs with varied token counts
  private lazy val docs = (0L until 300L)
    .map(i => (i, s"g${i % 5}", 1L + (i * 2654435761L) % 37L))
    .toDF("doc_id", "grp_in", "n_toks")

  private def sample(parts: Int) =
    Packing.sampleToBudget(docs, "doc_id", "n_toks", "grp_in", budget, parts, "spec-salt")

  test("result is independent of the partition count") {
    val one = sample(1).orderBy("grp", "id").collect().toSeq
    val seven = sample(7).orderBy("grp", "id").collect().toSeq
    val thirtyone = sample(31).orderBy("grp", "id").collect().toSeq
    assert(one === seven)
    assert(one === thirtyone)
  }

  test("matches the single-window reference formulation exactly") {
    val ref = docs
      .withColumn("ord", md5(concat(col("doc_id").cast("string"), lit("spec-salt"))))
      .withColumn("cum_before",
        coalesce(
          sum("n_toks").over(
            Window.partitionBy("grp_in").orderBy("ord", "doc_id")
              .rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .filter(col("cum_before") < budget)
      .select(col("grp_in").as("grp"), col("doc_id").as("id"),
        col("n_toks").as("toks"), col("cum_before"))
    val got = sample(7)
    assert(got.exceptAll(ref).count() === 0 && ref.exceptAll(got).count() === 0)
  }

  test("per group: fill-until-full — under budget before, admitted doc may overshoot") {
    val rows = sample(7).collect()
    rows.foreach { r =>
      assert(r.getLong(3) < budget, s"admitted doc ${r.getLong(1)} with cum_before >= budget")
    }
    // each group's admitted token mass reaches the budget (the corpus
    // has plenty of tokens per group), and removing the last admitted
    // doc would drop it under
    val byGrp = rows.groupBy(_.getString(0))
    assert(byGrp.size === 5)
    byGrp.foreach { case (g, rs) =>
      val tot = rs.map(_.getLong(2)).sum
      assert(tot >= budget, s"group $g under-filled: $tot")
      val lastToks = rs.maxBy(_.getLong(3)).getLong(2)
      assert(tot - lastToks < budget, s"group $g kept a doc past the fill point")
    }
  }
}
