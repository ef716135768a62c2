package graft.io

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Sinks (SURVEY §2.1 S5/S6/S7).
  *
  * S5: nested-YAML layout export in the database_new.yaml grammar
  * (`layout → disk → face → list of !!python/tuple (x, y)`), the
  * format produced by realistic_layout_export.ipynb and read back by
  * [[LayoutYaml]]. The center table is small (≤ ~25k rows), so the
  * write is a driver-side collect by design.
  *
  * S6: module-center text export with the mirrored −x copy (U2;
  * reference dee_geometry.py:457-461).
  *
  * S7: the pickle result cache re-expressed as a run_name-partitioned
  * parquet store with dynamic partition overwrite — upserting one run
  * rewrites only that partition, the cluster-correct analog of the
  * reference's read-modify-write pickle (dee_geometry.py:140-149).
  */
object Sinks {

  /** S5: write centers `(layout, disk, face, x, y)` as nested YAML. */
  def writeLayoutYaml(centers: DataFrame, path: String): Unit = {
    val rows = centers
      .select("layout", "disk", "face", "x", "y")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getDouble(3), r.getDouble(4)))
    val sb = new StringBuilder
    for ((layout, byLayout) <- rows.groupBy(_._1).toSeq.sortBy(_._1)) {
      sb.append(s"$layout:\n")
      for ((disk, byDisk) <- byLayout.groupBy(_._2).toSeq.sortBy(_._1)) {
        sb.append(s"  $disk:\n")
        for ((face, byFace) <- byDisk.groupBy(_._3).toSeq.sortBy(_._1)) {
          sb.append(s"    $face:\n")
          for ((_, _, _, x, y) <- byFace) {
            sb.append("    - !!python/tuple\n")
            sb.append(s"      - $x\n")
            sb.append(s"      - $y\n")
          }
        }
      }
    }
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path), sb.toString)
  }

  /** S6/U2: write "x, y" lines for each center plus the mirrored −x
    * copy, in center order (small table, driver-side like the
    * reference's file loop). */
  def writeMirroredCenters(centers: DataFrame, path: String): Unit = {
    val sb = new StringBuilder
    centers.select("x", "y").collect().foreach { r =>
      val (x, y) = (r.getDouble(0), r.getDouble(1))
      sb.append(s"$x, $y\n")
      sb.append(s"-$x, $y\n")
    }
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path), sb.toString)
  }

  /** S7: upsert `df` into the parquet result cache under `run_name =
    * runName`, replacing only that partition. */
  def upsertRun(spark: SparkSession, df: DataFrame, cachePath: String, runName: String): Unit = {
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    df.withColumn("run_name", lit(runName))
      .write
      .partitionBy("run_name")
      .mode(SaveMode.Overwrite)
      .parquet(cachePath)
  }

  /** Read one run (partition-pruned scan) or the whole cache. */
  def readRun(spark: SparkSession, cachePath: String, runName: Option[String] = None): DataFrame = {
    val all = spark.read.parquet(cachePath)
    runName.fold(all)(n => all.filter(col("run_name") === n))
  }

  /** JSON-Lines sink (engine extension): the interchange format LLM
    * data pipelines actually exchange corpora in (one JSON object per
    * line — Dolma, RedPajama, FineWeb all ship this way). Spark's json
    * writer IS jsonl (one object per line, one file per partition), so
    * this is a thin, distributed, fully parallel write — no driver
    * collect; `coalesce` only if a bounded file count is required.
    * Text round-trips losslessly: JSON string escaping covers
    * newlines, quotes, and non-BMP unicode. */
  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)

  /** JSON-Lines source. `schema` is REQUIRED by design: schema
    * inference is a second full pass over the data — at 100 TB that
    * doubles the read before any work happens, and a sampled inference
    * can silently widen or mistype columns between runs. Malformed
    * lines surface in the `_corrupt_record` column (PERMISSIVE mode)
    * rather than failing the scan, so curation can count-and-quarantine
    * them — append it to the schema to capture, omit it to ignore. */
  def readJsonl(spark: SparkSession, path: String, schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.schema(schema).json(path)
}
