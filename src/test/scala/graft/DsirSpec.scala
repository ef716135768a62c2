package graft

import graft.text.Dsir
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** DSIR importance resampling: selection prefers target-like content,
  * weights are exact integers (partitioning-invariant), and the model
  * stays dim-table-sized. */
class DsirSpec extends SparkSpec {

  test("target-like documents outrank off-target ones; weights are partitioning-invariant") {
    import spark.implicits._
    // target: cooking prose. pool: cooking docs + code-like docs.
    val target = Seq(
      (1L, "simmer the onions and garlic in butter until soft and golden"),
      (2L, "season the soup with salt and fresh thyme before serving"),
      (3L, "roast the vegetables until tender and toss with olive oil")
    ).toDF("doc_id", "text")
    val pool = Seq(
      (10L, "simmer the garlic and onions in butter with salt and thyme"),
      (11L, "toss the roasted vegetables with olive oil before serving"),
      (12L, "x = fn(ptr); free(buf); return err_code != 0; /* later */"),
      (13L, "SELECT id FROM logs WHERE ts > now() ORDER BY id DESC LIMIT 5")
    ).toDF("doc_id", "text")
    val tf = Dsir.features(target, "doc_id", "text")
    val pf = Dsir.features(pool, "doc_id", "text")
    val lr = Dsir.logRatioMicro(tf, pf)
    assert(lr.count() == Dsir.Buckets, "log-ratio table must cover the full bucket range")
    val w = Dsir.weigh(pf, lr).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Seq(10L, 11L).map(w).min > Seq(12L, 13L).map(w).max,
      s"cooking docs must outweigh code docs: $w")
    // exact-integer weights: invariant under a different partitioning
    val w7 = Dsir.weigh(pf.repartition(7), lr).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(w7 == w, "weights changed under repartitioning — the sum is not exact")
  }

  test("plan shape: weighing is a broadcast join + per-doc aggregate, no corpus-side extra exchange") {
    val d: DataFrame = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val f = Dsir.features(d, "doc_id", "text").localCheckpoint(false)
    val lr = Dsir.logRatioMicro(f, f).localCheckpoint(false)
    val plan = Dsir.weigh(f, lr).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"ratio join is not broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"corpus-side sort-merge crept in:\n$plan")
  }
}
