package graft.dev

import graft.ml.AnnSearch
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Does Catalyst push the tau filter below cosineNearPairs' distinct
  * (PushPredicateThroughNonJoin on a grouping column)? If yes the
  * candidate exchange already carries only near-pairs; if no, the
  * distinct shuffles every candidate pair and the operator should
  * filter first explicitly. */
object NearPairsPlanProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val corpus = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val centroids = AnnSearch.strideCentroids(corpus, 25)
    val pairs = AnnSearch.cosineNearPairs(corpus, centroids, tau = 0.4, nprobe = 18)
    val plan = pairs.queryExecution.executedPlan.toString
    val exIdx = plan.indexOf("Exchange hashpartitioning")
    val filterAboveExchange = plan.indexOf("Filter") >= 0 && plan.indexOf("Filter") < exIdx
    println("FILTER-FIRST: filter appears above first exchange = " + filterAboveExchange)
    println(plan.take(6000))
    spark.stop()
  }
}
