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
    ext.injectFunction(GraftExtensions.dotProduct)
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

  /** Register directly on an existing session (tests, REPL). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val registry: FunctionRegistry =
      spark.sessionState.functionRegistry
    val (id, info, builder) = dotProduct
    registry.registerFunction(id, info, builder)
  }
}
