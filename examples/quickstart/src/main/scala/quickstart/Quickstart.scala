package quickstart

import graft.GraftSession
import org.apache.spark.sql.functions._

/** The README quickstart, verbatim: build a session with the engine's
  * extensions, run a curation primitive and a conformance query, and
  * call a registered SQL function. */
object Quickstart {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = GraftSession.builder(master = "local[4]", shufflePartitions = 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // near-duplicate pairs over the documents table
    val docs = GraftSession.table(spark, sfDir, "documents")
    val pairs = graft.text.MinHashLsh.verifiedPairs(docs, "doc_id", "text", tau = 0.7)
    println(s"near-dup pairs: ${pairs.count()}")

    // a named conformance query from the catalog
    val q1 = GraftSession.query("q1_agg")(spark, sfDir)
    q1.orderBy("l_returnflag").show(5)

    // the engine's codegen dot product, registered as a SQL function
    spark.sql("SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS dot").show()

    spark.stop()
  }
}
