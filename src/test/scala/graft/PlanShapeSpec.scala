package graft

import graft.text.MinHashLsh
import graft.ml.AnnSearch
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Plan-shape regression guards for the dedup/ANN scale paths: the
  * no-all-pairs property (VERDICT r2 item 7). These assert on the
  * PHYSICAL plan, so a refactor that silently reintroduces a cartesian
  * or an unbounded shuffle fails the suite, not just the SCALE.md prose.
  */
class PlanShapeSpec extends SparkSpec {

  private def physicalPlan(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  private def docsDf: DataFrame =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  private def embsDf: DataFrame =
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id").as("id"), expr("transform(embedding, x -> cast(x as double))").as("vec"))

  test("minhash-LSH candidate generation never goes all-pairs") {
    val pairs = MinHashLsh.verifiedPairs(docsDf, "doc_id", "text", tau = 0.8)
    val plan = physicalPlan(pairs)
    assert(!plan.contains("CartesianProduct"), s"cartesian in LSH plan:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"BNLJ in LSH plan:\n$plan")
    // every exchange must be on a high-cardinality key (doc_id,
    // band/bucket, candidate pair). The signature subplan appears once
    // per join side when the sides broadcast, so the structural bound
    // is 2×2 signature exchanges + 1 candidate dedup.
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(shuffles <= 5, s"LSH plan grew to $shuffles hash exchanges:\n$plan")
  }

  test("IVF top-k probes cells via equi-join, never a corpus nested-loop") {
    val corpus = embsDf
    val centroids = AnnSearch.strideCentroids(corpus, 8)
    val assigned = AnnSearch.ivfAssign(corpus, centroids)
    val queries = corpus.filter(pmod(col("id"), lit(50)) === 0)
    val topk = AnnSearch.ivfTopK(queries, assigned, centroids, k = 5, nprobe = 3)
    val plan = physicalPlan(topk)
    assert(!plan.contains("CartesianProduct"), s"cartesian in IVF plan:\n$plan")
    // centroid fan-outs are tiny broadcast nested-loops BY DESIGN (two:
    // assignment + probe); the corpus-side candidate join must stay an
    // equi-join on `cell`
    val bnlj = "BroadcastNestedLoopJoin".r.findAllIn(plan).length
    assert(bnlj <= 2, s"IVF corpus join degenerated to nested-loop:\n$plan")
    assert(plan.contains("SortMergeJoin") || plan.contains("BroadcastHashJoin") ||
      plan.contains("ShuffledHashJoin"), s"no equi-join on cell in IVF plan:\n$plan")
  }

  test("embedding near-pairs plan has no cartesian over the corpus") {
    val corpus = embsDf
    val centroids = AnnSearch.strideCentroids(corpus, 25)
    val pairs = AnnSearch.cosineNearPairs(corpus, centroids, tau = 0.4, nprobe = 4)
    val plan = physicalPlan(pairs)
    assert(!plan.contains("CartesianProduct"), s"cartesian in near-pairs plan:\n$plan")
    val equi = plan.contains("SortMergeJoin") || plan.contains("BroadcastHashJoin") ||
      plan.contains("ShuffledHashJoin")
    assert(equi, s"no equi-join in near-pairs plan:\n$plan")
  }
}
