package graft.dev

import graft.ml.AnnSearch
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Prints the physical plan of the exact cell-pair-blocked
  * cosineNearPairs closure (r10 form: chunk-pair broadcast join +
  * compiled CellPairSims kernel, no distinct pass) — used to eyeball
  * that the pair join stays a broadcast/shuffled HASH join on
  * (cell, chunk) keys and nothing degenerates to a nested loop. */
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
    val pairs = AnnSearch.cosineNearPairs(corpus, centroids, tau = 0.4)
    val plan = pairs.queryExecution.executedPlan.toString
    println(plan.take(8000))
    val t0 = System.nanoTime()
    println(s"rows = ${pairs.count()} in ${(System.nanoTime() - t0) / 1e9} s")
    spark.stop()
  }
}
