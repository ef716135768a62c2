package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL surface for the engine's custom Catalyst expressions.
  *
  * Install either at session build time —
  * `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `--conf spark.sql.extensions=graft.functions.GraftExtensions` —
  * after which `spark.sql("SELECT graft_dot(a, b) ...")` works
  * anywhere SQL does. The Scala Column API (`VectorOps.dot`,
  * `NearestCells.topCells`) does not require the extension.
  *
  * `graft_nearest_cells` is not SQL-registered: its centroid array is
  * a driver-collected constant bound at plan-build time (see
  * [[NearestCells]]), which has no SQL literal form by design — the
  * SQL-expressible alternative (a join against a centroid table) is
  * exactly the shuffle the expression exists to avoid.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.all.foreach(ext.injectFunction)
  }
}

object GraftExtensions {
  /** (name, info, builder) triple for FunctionRegistry injection. */
  val dotProduct: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_dot"),
    new ExpressionInfo(
      classOf[DotProduct].getName,
      null,
      "graft_dot",
      "graft_dot(a, b) - codegen dot product of two array<double> vectors " +
        "(left-to-right accumulation; inputs must be equal-length and null-free).",
      ""),
    { args =>
      require(args.length == 2, s"graft_dot takes 2 arguments, got ${args.length}")
      DotProduct(args(0), args(1))
    }
  )

  /** graft_band_hashes(sig, bands): LSH band-bucket hashes of a
    * minhash signature. `bands` must be a constant — it fixes the
    * output arity at plan time, the same contract the Column API has. */
  val bandHashes: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_band_hashes"),
    new ExpressionInfo(
      classOf[BandHashes].getName,
      null,
      "graft_band_hashes",
      "graft_band_hashes(sig, bands) - codegen LSH band-bucket hashes: splits an " +
        "array<long> minhash signature into `bands` equal slices (bands must be a " +
        "constant dividing the signature length) and mixes each slice to one long bucket.",
      ""),
    { args =>
      require(args.length == 2, s"graft_band_hashes takes 2 arguments, got ${args.length}")
      require(args(1).foldable, "graft_band_hashes: `bands` must be a constant")
      val bands = args(1).eval().asInstanceOf[Number].intValue()
      require(bands > 0, s"graft_band_hashes: bands must be positive, got $bands")
      BandHashes(args(0), bands)
    }
  )

  /** graft_int8_quantize(vec): symmetric int8 quantization of an
    * array<double> vector into (scale, q) — see [[Int8Quantize]]. */
  val int8Quantize: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_int8_quantize"),
    new ExpressionInfo(
      classOf[Int8Quantize].getName,
      null,
      "graft_int8_quantize",
      "graft_int8_quantize(v) - codegen symmetric int8 quantization of an array<double> " +
        "vector: returns struct(scale double, q array<tinyint>) with " +
        "q_i = floor(v_i/scale + 0.5), scale = max(|v|)/127.",
      ""),
    { args =>
      require(args.length == 1, s"graft_int8_quantize takes 1 argument, got ${args.length}")
      Int8Quantize(args(0))
    }
  )

  /** Everything the extension injects. */
  val all: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] =
    Seq(dotProduct, bandHashes, int8Quantize)

  /** Register directly on an existing session (tests, REPL). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val registry: FunctionRegistry =
      spark.sessionState.functionRegistry
    all.foreach { case (id, info, builder) =>
      registry.registerFunction(id, info, builder)
    }
  }
}
