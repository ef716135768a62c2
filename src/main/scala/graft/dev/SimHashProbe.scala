package graft.dev

import graft.Bench
import graft.text.SimHash
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev diagnostic (not part of the driver contract): explain the
  * dedup_simhash sf1_synth bench step. Prints stage timings (signature
  * aggregate vs pair generation), the pigeonhole (block, value) group
  * size distribution, candidate-row counts pre/post dedup, and the
  * final pair count — enough to decide whether hot blocks are real and
  * a skew cap is warranted.
  * `runMain graft.dev.SimHashProbe [sfDir]` (default: builds sf1_synth)
  */
object SimHashProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val dir =
      if (args.nonEmpty) args(0)
      else Bench.synthScaleStep(spark, "/root/testdata/sf0.1", "/tmp/graft_sf1_synth", copies = 10)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    println(s"dir=$dir docs=${docs.count()}")

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    val sigs = SimHash.signatures(docs, "doc_id", "text").localCheckpoint()
    timed("signatures")(sigs.count())
    println(s"distinct simhash values: ${sigs.select("simhash").distinct().count()} of ${sigs.count()}")

    // block group sizes (the candidate join is an equi-join on these)
    val nBlocks = 4
    val width = SimHash.Bits / nBlocks
    val blockCols = (0 until nBlocks).map { bi =>
      val w = if (bi == nBlocks - 1) SimHash.Bits - width * (nBlocks - 1) else width
      shiftrightunsigned(col("simhash"), bi * width).bitwiseAND(lit((1L << w) - 1))
    }
    val blocks = sigs
      .select(col("doc_id"), posexplode(array(blockCols: _*)).as(Seq("blk", "blkval")))
      .groupBy("blk", "blkval").count()
      .localCheckpoint()
    println("top block groups:")
    blocks.orderBy(desc("count")).limit(20).collect().foreach(r => println(s"  blk=${r.get(0)} val=${r.get(1)} n=${r.get(2)}"))
    val joinRows = blocks.agg(sum(col("count") * col("count"))).first().getLong(0)
    println(s"candidate join output rows (sum n^2 over groups): $joinRows")
    val dist = blocks.selectExpr(
      "count(*) AS groups",
      "percentile(count, array(0.5, 0.9, 0.99, 1.0)) AS q").first()
    println(s"groups=${dist.get(0)} size quantiles p50/p90/p99/max=${dist.get(1)}")

    timed("nearPairs (uncapped)") {
      println(s"pairs=${SimHash.nearPairs(sigs, "doc_id", maxDist = 3).count()}")
    }
    spark.stop()
  }
}
