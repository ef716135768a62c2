package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}

/** YAML sensor-center database reader (SURVEY §2.1 S2; reference
  * layouts/database_new.yaml, loaded at bias_voltage.py:23-26).
  *
  * Schema is `layout → disk{1,2} → {front,back} → list of !!python/tuple
  * (x, y)`. The file is small (<25k lines), so it is parsed driver-side
  * into `(layout, disk, face, x, y)` rows and turned into a DataFrame;
  * downstream geometry runs distributed.
  *
  * The parser is a purpose-built reader for this grammar (block maps of
  * block maps of tuple lists) — no external YAML dependency, and it
  * accepts the `!!python/tuple` tag that safe YAML loaders reject.
  */
object LayoutYaml {

  final case class Center(layout: String, disk: String, face: String, x: Double, y: Double)

  private val KeyLine = """^(\s*)([A-Za-z0-9_\-]+):\s*$""".r
  private val TupleStart = """^\s*-\s+!!python/tuple\s*$""".r
  private val NumItem = """^\s*-\s+(-?[0-9][0-9eE+\-\.]*)\s*$""".r
  private val FlowPair = """^\s*-\s+\[\s*(-?[0-9][0-9eE+\-\.]*)\s*,\s*(-?[0-9][0-9eE+\-\.]*)\s*\]\s*$""".r

  def parse(path: String): Seq[Center] = {
    val src = scala.io.Source.fromFile(path)
    try parseLines(src.getLines()) finally src.close()
  }

  private[io] def parseLines(lines: Iterator[String]): Seq[Center] = {
    val out = Seq.newBuilder[Center]
    // context stack: indent level → key name
    var ctx = List.empty[(Int, String)] // (indent, key), innermost first
    var pending: List[Double] = Nil

    def keys: (String, String, String) = {
      val ks = ctx.reverse.map(_._2)
      (ks.lift(0).getOrElse(""), ks.lift(1).getOrElse(""), ks.lift(2).getOrElse(""))
    }

    def emit(x: Double, y: Double): Unit = {
      val (l, d, f) = keys
      out += Center(l, d, f, x, y)
    }

    for (raw <- lines) {
      val line = raw.replaceAll("[\r\n]+$", "")
      line match {
        case KeyLine(indent, key) =>
          val depth = indent.length
          ctx = ctx.dropWhile(_._1 >= depth)
          ctx = (depth, key) :: ctx
          pending = Nil
        case TupleStart() =>
          pending = Nil
        case FlowPair(a, b) =>
          emit(a.toDouble, b.toDouble)
          pending = Nil
        case NumItem(v) =>
          pending = pending :+ v.toDouble
          if (pending.length == 2) {
            emit(pending.head, pending(1))
            pending = Nil
          }
        case _ => // blank / comment / unknown — ignore
      }
    }
    out.result()
  }

  /** Parse and lift to a DataFrame `(layout, disk, face, x, y)`.
    * Memoized per (session, path): the parse is pure driver-side work
    * over a static ≤25k-line dimension file that a dozen conformance
    * queries read — one parse per session, like the reference's one
    * `load()` per run. */
  def read(spark: SparkSession, path: String): DataFrame =
    cache.getOrElseUpdate(spark, path) {
      import spark.implicits._
      parse(path).toDF().localCheckpoint(eager = true)
    }

  private val cache = new graft.util.SessionCache[String, DataFrame]
}
