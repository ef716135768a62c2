package graft.dev

import graft.ml.AnnSearch
import graft.text.MinHashLsh
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic: wall-time of the connected-components stage over the
  * embedding near-pair graph, pointer-doubling vs star contraction —
  * the r10 measurement that picked the components algorithm for the
  * dedup_embedding family once the exact closure made the pair stage
  * cheap. `runMain graft.dev.CompProbe [sfDir]` */
object CompProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_sf1_synth")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val corpus = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val centroids = AnnSearch.strideCentroids(corpus, 25)
    val pairs = AnnSearch.cosineNearPairs(corpus, centroids, tau = 0.4)
      .select("a", "b").localCheckpoint(true)
    println(s"pairs = ${pairs.count()}")
    for (rep <- 1 to 2) {
      var t0 = System.nanoTime()
      val c1 = MinHashLsh.components(pairs).groupBy("component").count().count()
      println(f"rep$rep doubling:  ${(System.nanoTime() - t0) / 1e9}%.2f s ($c1 components)")
      t0 = System.nanoTime()
      val c2 = MinHashLsh.componentsStar(pairs).groupBy("component").count().count()
      println(f"rep$rep star:      ${(System.nanoTime() - t0) / 1e9}%.2f s ($c2 components)")
    }
    spark.stop()
  }
}
