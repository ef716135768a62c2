package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: run one SparkEntry query and print its rows, sorted, as
  * SQL VALUES tuples with full round-trip precision (Double.toString) —
  * the capture step for literal-VALUES oracles of deterministic
  * queries. Not part of the driver contract. */
object GoldenDump {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      // local-mode parallelism for single-file inputs: without an
      // advisory minimum, a 46 MB fixture is one 128 MB-bound split and
      // the 1e6-row probe stage runs on one core. On a real cluster
      // inputs arrive in thousands of splits and these are no-ops.
      .config("spark.sql.files.minPartitionNum", cpus)
      .config("spark.sql.files.openCostInBytes", "1048576")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(name)(spark, sfDir)
    val cols = df.columns
    println(s"-- $name columns: ${cols.zip(df.schema.map(_.dataType.sql)).map { case (c, t) => s"$c:$t" }.mkString(", ")}")
    val lines = df.collect().map { r =>
      cols.indices.map { i =>
        r.get(i) match {
          case null      => "NULL"
          case s: String => "'" + s.replace("'", "''") + "'"
          case v         => v.toString
        }
      }.mkString("(", ", ", ")")
    }.sorted
    lines.foreach(l => println(s"  $l,"))
    println(s"-- rows=${lines.length}")
    spark.stop()
  }
}
