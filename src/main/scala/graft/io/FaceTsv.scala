package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Face module-table TSV reader (SURVEY §2.1 S1; reference
  * `data/Face {1..4}.txt`, read in realistic_layout_export.ipynb cell 2).
  *
  * Format quirks, handled explicitly: header `Module \tX\tY\tZ\t\t\t`
  * (trailing space in the first name, three empty trailing columns),
  * CRLF line endings, and occasional spreadsheet-error rows (`#REF!`)
  * that the reference skips via try/except — here: cast-to-double and
  * drop rows that fail, the distributed equivalent.
  */
object FaceTsv {

  val schema: StructType = StructType(Seq(
    StructField("module_raw", StringType),
    StructField("x_raw", StringType),
    StructField("y_raw", StringType),
    StructField("z_raw", StringType),
    StructField("_e1", StringType),
    StructField("_e2", StringType),
    StructField("_e3", StringType)
  ))

  /** One face file → (module_id, x, y, z), malformed rows dropped. */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("sep", "\t")
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .schema(schema)
      .csv(path)
      .selectExpr(
        "try_cast(module_raw AS int) AS module_id",
        "try_cast(x_raw AS double) AS x",
        "try_cast(y_raw AS double) AS y",
        "try_cast(z_raw AS double) AS z"
      )
      .filter(
        col("module_id").isNotNull && col("x").isNotNull &&
          col("y").isNotNull && col("z").isNotNull
      )

  /** All four faces with a `face` column (1-based, as the files). */
  def readAll(spark: SparkSession, dir: String): DataFrame =
    (1 to 4)
      .map(i => read(spark, s"$dir/Face $i.txt").withColumn("face", lit(i)))
      .reduce(_ unionByName _)
}
