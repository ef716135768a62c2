package graft

import graft.functions.VectorOps
import org.apache.spark.sql.functions._

/** The codegen dot product must match the higher-order-function fold
  * bit-for-bit (same left-to-right accumulation), handle float input
  * via cast, and propagate nulls. */
class VectorOpsSpec extends SparkSpec {

  import spark.implicits._

  private def hofDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")), lit(0.0), (acc, v) => acc + v)

  test("codegen dot == HOF fold bit-for-bit on random vectors") {
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(500)((
      Array.fill(64)(rnd.nextDouble() * 2 - 1),
      Array.fill(64)(rnd.nextDouble() * 2 - 1)
    )).toDF("a", "b")
    val diff = rows
      .select((VectorOps.dot($"a", $"b") === hofDot($"a", $"b")).as("eq"))
      .filter(!$"eq").count()
    assert(diff == 0L)
  }

  test("float arrays cast up; nulls propagate") {
    val df = Seq(
      (Some(Array(1.0f, 2.0f)), Some(Array(3.0f, 4.0f))),
      (None, Some(Array(1.0f)))
    ).toDF("a", "b")
    val out = df.select(VectorOps.dot($"a", $"b").as("d")).collect()
    assert(out(0).getDouble(0) == 11.0)
    assert(out(1).isNullAt(0))
  }

  test("int8 quantize: dequantization error bounded by scale/2; zero vector safe") {
    import graft.functions.Int8Quantize
    val rnd = new scala.util.Random(19)
    val rows = (Seq.fill(200)(Array.fill(32)(rnd.nextDouble() * 4 - 2)) :+ Array.fill(32)(0.0))
      .map(Tuple1(_)).toDF("v")
    val checked = rows
      .select($"v", Int8Quantize.quantize($"v").as("qz"))
      .select(
        $"qz.scale".as("s"),
        zip_with(Int8Quantize.dequantize($"qz.q", $"qz.scale"), $"v",
          (d, o) => abs(d - o)).as("errs"))
      .select($"s", array_max($"errs").as("max_err"))
      .collect()
    checked.foreach { r =>
      val (s, maxErr) = (r.getDouble(0), r.getDouble(1))
      assert(maxErr <= s / 2 + 1e-12, s"err $maxErr exceeds half-scale $s")
    }
    assert(checked.last.getDouble(0) == 0.0 && checked.last.getDouble(1) == 0.0)
  }

  test("graft_dot is callable from SQL via GraftExtensions") {
    graft.functions.GraftExtensions.register(spark)
    Seq((Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0))).toDF("a", "b")
      .createOrReplaceTempView("ge_vecs")
    val r = spark.sql("SELECT graft_dot(a, b) AS d FROM ge_vecs").collect()
    assert(r(0).getDouble(0) == 32.0)
  }

  test("graft_band_hashes and graft_int8_quantize are callable from SQL") {
    graft.functions.GraftExtensions.register(spark)
    // band hashes: SQL form must equal the Column-API form exactly
    val sigs = Seq((1L, Array(11L, 22L, 33L, 44L))).toDF("id", "sig")
    sigs.createOrReplaceTempView("ge_sigs")
    val sqlBuckets = spark.sql("SELECT graft_band_hashes(sig, 2) AS bh FROM ge_sigs")
      .head().getSeq[Long](0)
    val apiBuckets = sigs.select(graft.functions.BandHashes.bandHashes($"sig", 2).as("bh"))
      .head().getSeq[Long](0)
    assert(sqlBuckets == apiBuckets && sqlBuckets.length == 2)
    // non-constant bands must be rejected at plan time
    val err = intercept[Exception] {
      spark.sql("SELECT graft_band_hashes(sig, id) FROM ge_sigs").collect()
    }
    assert(err.getMessage.contains("constant"))
    // int8 quantize: struct(scale, q) with the floor(x+0.5) contract
    val q = spark.sql(
      "SELECT graft_int8_quantize(array(0.0D, 63.5D, 127.0D, -127.0D)) AS qz")
      .select($"qz.scale", $"qz.q").head()
    assert(q.getDouble(0) == 1.0)
    assert(q.getSeq[Byte](1) == Seq[Byte](0, 64, 127, -127))
  }

  test("dot stays inside whole-stage codegen") {
    // a range source so the projection isn't folded into a LocalTableScan
    val df = spark.range(100)
      .select(array($"id".cast("double"), lit(2.0)).as("a"), array(lit(3.0), lit(4.0)).as("b"))
    val q = df.select(VectorOps.dot($"a", $"b").as("d"))
    val plan = q.queryExecution.executedPlan.toString
    // the "*(n)" prefix marks operators inside a WholeStageCodegen span
    assert(plan.contains("*(1) Project [graft_dot"), s"dot not in a codegen span:\n$plan")
    assert(q.agg(sum("d")).head().getDouble(0) == (0 until 100).map(i => 3.0 * i + 8.0).sum)
  }
}
