package graft

import graft.io.{LayoutYaml, Sinks}
import org.apache.spark.sql.functions._

/** S5/S6/S7 sink specs. */
class SinksSpec extends SparkSpec {

  private def tmpDir(): java.nio.file.Path =
    java.nio.file.Files.createTempDirectory("graft-sinks")

  test("S5: YAML layout export round-trips through LayoutYaml.parse") {
    import spark.implicits._
    val centers = Seq(
      ("new", "disk1", "front", 158.35, -1072.25),
      ("new", "disk1", "front", 201.95, -1072.25),
      ("new", "disk1", "back", -27.55, 986.55),
      ("new", "disk2", "front", 0.0, 11.25)
    ).toDF("layout", "disk", "face", "x", "y")
    val path = tmpDir().resolve("layout.yaml").toString
    Sinks.writeLayoutYaml(centers, path)
    val back = LayoutYaml.parse(path).map(c => (c.layout, c.disk, c.face, c.x, c.y)).toSet
    assert(back == Set(
      ("new", "disk1", "front", 158.35, -1072.25),
      ("new", "disk1", "front", 201.95, -1072.25),
      ("new", "disk1", "back", -27.55, 986.55),
      ("new", "disk2", "front", 0.0, 11.25)
    ))
  }

  test("S6/U2: mirrored center export writes x and -x lines") {
    import spark.implicits._
    val centers = Seq((160.35, -1103.25), (245.55, 1043.15)).toDF("x", "y")
    val path = tmpDir().resolve("centers.txt").toString
    Sinks.writeMirroredCenters(centers, path)
    val lines = scala.io.Source.fromFile(path).getLines().toSeq
    assert(lines.length == 4)
    assert(lines.head == "160.35, -1103.25")
    assert(lines(1) == "-160.35, -1103.25")
  }

  test("S7: parquet cache upsert replaces only the named run partition") {
    import spark.implicits._
    val cache = tmpDir().resolve("cache").toString
    Sinks.upsertRun(spark, Seq((1, 10.0), (2, 20.0)).toDF("bin", "v"), cache, "runA")
    Sinks.upsertRun(spark, Seq((1, 99.0)).toDF("bin", "v"), cache, "runB")
    // overwrite runA; runB must survive untouched
    Sinks.upsertRun(spark, Seq((1, 11.0)).toDF("bin", "v"), cache, "runA")
    val all = Sinks.readRun(spark, cache)
      .select("run_name", "bin", "v").as[(String, Int, Double)].collect().toSet
    assert(all == Set(("runA", 1, 11.0), ("runB", 1, 99.0)))
    val onlyB = Sinks.readRun(spark, cache, Some("runB")).count()
    assert(onlyB == 1)
  }

  test("JSONL: text with newlines/quotes/unicode round-trips; malformed lines quarantine, not fail") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("graft_jsonl_spec")
    val out = dir.resolve("docs").toString
    val nasty = Seq(
      (1L, "line one\nline two\ttabbed"),
      (2L, "quotes \" and \\ backslash"),
      (3L, "unicode é中😀 end"),
      (4L, ""))
    val df = spark.createDataFrame(nasty).toDF("doc_id", "text")
    Sinks.writeJsonl(df, out)
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val back = Sinks.readJsonl(spark, out, schema)
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    for ((id, t) <- nasty) assert(back(id) == t, s"doc $id mangled: ${back(id)}")

    // a malformed line lands in _corrupt_record when the schema asks
    // for it (PERMISSIVE default) — the scan must NOT fail
    val corrupt = dir.resolve("corrupt.jsonl")
    java.nio.file.Files.writeString(corrupt,
      """{"doc_id": 10, "text": "good"}
        |{broken json here
        |{"doc_id": 11, "text": "also good"}
        |""".stripMargin)
    val qSchema = StructType(schema.fields :+ StructField("_corrupt_record", StringType))
    val read = Sinks.readJsonl(spark, corrupt.toString, qSchema).cache()
    assert(read.filter(col("_corrupt_record").isNotNull).count() == 1)
    assert(read.filter(col("_corrupt_record").isNull).count() == 2)
    read.unpersist()
  }
}
