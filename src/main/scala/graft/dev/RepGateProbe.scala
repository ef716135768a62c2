package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Equivalence probe for the r16 per-row bigram gate: the old
  * explode → groupBy(doc, g) → groupBy(doc) (mx, nb) aggregation vs
  * the row-local sorted-run-length form, over the RAW documents table
  * (no quality prefilter — strictly more cases than curationKept sees,
  * including docs with < 2 tokens). Prints the symmetric difference of
  * kept doc_id sets; must be 0. */
object RepGateProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .appName("rep-gate-probe")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (dir <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val d = spark.read.parquet(s"$dir/documents.parquet")
        .filter(size(graft.text.TextOps.tokens(col("text"))) >= 2)
      val qw = d.withColumn("w", graft.text.TextOps.tokens(col("text")))
      val old = qw.select(col("doc_id"), explode(expr(
          "transform(sequence(0, size(w)-2), i -> concat(w[i], ' ', w[i+1]))")).as("g"))
        .groupBy("doc_id", "g").agg(count(lit(1)).as("c"))
        .groupBy("doc_id").agg(max("c").as("mx"), sum("c").as("nb"))
        .filter(col("mx") * 50 <= col("nb") * 3)
        .select("doc_id")
      val neu = {
        import spark.implicits._
        d.select(col("doc_id").cast("long"), col("text").cast("string"))
          .as[(Long, String)]
          .filter { (row: (Long, String)) =>
            val text = row._2
            val stripped = text.dropWhile(_ == ' ').reverse.dropWhile(_ == ' ').reverse
            val norm = stripped.toLowerCase(java.util.Locale.ROOT).replaceAll("\\s+", " ")
            val toks = norm.split(" ", -1)
            if (toks.length < 2) false
            else {
              val counts = new java.util.HashMap[String, Int](toks.length * 2)
              var i = 0
              var mx = 1
              while (i < toks.length - 1) {
                val g = toks(i) + " " + toks(i + 1)
                val c = counts.getOrDefault(g, 0) + 1
                counts.put(g, c)
                if (c > mx) mx = c
                i += 1
              }
              mx.toLong * 50 <= (toks.length - 1).toLong * 3
            }
          }
          .toDF("doc_id", "text")
          .select("doc_id")
      }
      val diff = old.withColumn("l", lit(1))
        .join(neu.withColumn("r", lit(1)), Seq("doc_id"), "full_outer")
        .filter(col("l").isNull || col("r").isNull).count()
      println(s"[repgate] $dir old=${old.count()} new=${neu.count()} symdiff=$diff")
      def time(label: String)(body: => Long): Unit = {
        body // warm
        val t0 = System.nanoTime(); val n = body
        println(f"[repgate] $label ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$n")
      }
      time(s"$dir old")(old.count())
      time(s"$dir new")(neu.count())
    }
    spark.stop()
  }
}
