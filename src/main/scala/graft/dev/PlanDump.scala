package graft.dev

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Dump `.explain("formatted")` for declared queries to files — the
  * optimization-round evidence trail (plans/r15/<query>_<tag>.txt).
  *
  * Usage: runMain graft.dev.PlanDump <tag> <outDir> [query ...]
  * With no query list, dumps every entry in Bench.catalog. Queries
  * whose builder throws (e.g. streaming-only paths) are recorded as
  * `<name>: ERROR <msg>` in _errors.txt rather than failing the dump.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val tag = if (args.length > 0) args(0) else "before"
    val outDir = if (args.length > 1) args(1) else "plans/r15"
    val names: Seq[String] =
      if (args.length > 2) args.drop(2).toSeq
      else graft.Bench.catalog.keys.toSeq.sorted
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("plan-dump")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.minPartitionNum", cpus)
      .config("spark.sql.files.openCostInBytes", "1048576")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    val errs = new StringBuilder
    names.foreach { name =>
      graft.Bench.catalog.get(name) match {
        case Some(fn) =>
          try {
            val df = fn(spark, sfDir)
            // queryExecution.explainString is exactly what
            // .explain("formatted") prints, capturable as a string
            val plan = df.queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode)
            Files.writeString(Paths.get(outDir, s"${name}_$tag.txt"), plan)
            println(s"[plandump] $name ok (${plan.length} chars)")
          } catch {
            case e: Throwable =>
              errs.append(s"$name: ERROR ${e.getClass.getSimpleName}: ${e.getMessage}\n")
              println(s"[plandump] $name FAILED: ${e.getMessage}")
          }
        case None =>
          errs.append(s"$name: not in catalog\n")
      }
    }
    if (errs.nonEmpty)
      Files.writeString(Paths.get(outDir, s"_errors_$tag.txt"), errs.toString)
    spark.stop()
  }
}
