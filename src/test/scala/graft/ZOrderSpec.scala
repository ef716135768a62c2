package graft

import graft.ops.ZOrder
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** Z-order clustering: bit-exact Morton interleave and the locality
  * property that justifies it as a file-layout operator. */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  private def mortonRef(x: Long, y: Long, bits: Int): Long =
    (0 until bits).foldLeft(0L) { (acc, i) =>
      acc | (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
    }

  test("zValue matches the reference interleave on a golden set") {
    val cases = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L), (1023L, 1023L),
      (513L, 2L), (7L, 1000L), (65535L, 12345L))
    val got = cases.toDF("x", "y")
      .select(col("x"), col("y"), ZOrder.zValue(col("x"), col("y"), 16).as("z"))
      .as[(Long, Long, Long)].collect().toSeq
    got.foreach { case (x, y, z) =>
      assert(z === mortonRef(x, y, 16), s"($x,$y)")
    }
    // canonical small values: (1,0)->1, (0,1)->2, (3,5)->0b100111
    assert(mortonRef(1, 0, 16) === 1L && mortonRef(0, 1, 16) === 2L && mortonRef(3, 5, 16) === 39L)
  }

  /** Execute `df` fully, then pull the parquet scan's actual output
    * metrics: rows the reader MATERIALIZED (after row-group min/max
    * pruning driven by the pushed filters — skipped row groups never
    * count) and the scan's PushedFilters metadata. */
  private def scanStats(df: DataFrame): (Long, String) = {
    df.collect()
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case s: FileSourceScanExec    => Seq(s)
      case other => other.children.flatMap(scans)
    }
    val s = scans(df.queryExecution.executedPlan)
    assert(s.nonEmpty, s"no FileSourceScanExec in:\n${df.queryExecution.executedPlan}")
    (s.map(_.metrics("numOutputRows").value).sum,
      s.head.metadata.getOrElse("PushedFilters", ""))
  }

  test("z-clustered parquet layout skips row groups an unclustered layout must read") {
    val n = 256 // grid 256x256 = 65,536 rows, z bits = 8
    val parts = 16
    val grid = (0 until n).flatMap(x => (0 until n).map(y => (x.toLong, y.toLong)))
      .toDF("x", "y")
      .withColumn("payload", col("x") * n + col("y"))
    val base = java.nio.file.Files.createTempDirectory("zorder_skip").toString
    val zDir = s"$base/zclustered"
    val uDir = s"$base/unclustered"
    try {
      // clustered: 16 files, each one contiguous z range = one 64x64
      // quadrant -> per-file min/max tight in BOTH dims
      ZOrder.clusterByZ(grid, "x", "y", bits = 8, parts = parts)
        .write.parquet(zDir)
      // unclustered baseline: same file count, rows laid out by an
      // uncorrelated hash -> every file's x/y min/max spans the grid
      grid.withColumn("_r", pmod(xxhash64(col("x"), col("y")), lit(1000000)))
        .repartitionByRange(parts, col("_r")).sortWithinPartitions("_r").drop("_r")
        .write.parquet(uDir)

      // a 16x16 box well inside one quadrant; both dims filtered
      def box(dir: String): DataFrame =
        spark.read.parquet(dir)
          .filter(col("x") >= 8 && col("x") <= 23 && col("y") >= 8 && col("y") <= 23)
      val expected = 16L * 16L

      val (zRows, zPushed) = scanStats(box(zDir))
      val (uRows, uPushed) = scanStats(box(uDir))
      assert(zPushed.contains("GreaterThanOrEqual(x,8)") && zPushed.contains("LessThanOrEqual(y,23)"),
        s"box filter not pushed to the parquet scan: $zPushed")
      assert(uPushed.contains("GreaterThanOrEqual(x,8)"), s"baseline lost pushdown: $uPushed")
      assert(box(zDir).count() === expected && box(uDir).count() === expected)

      // the point of the operator: the unclustered layout materializes
      // the whole table (no row group's min/max excludes the box);
      // the z-layout reads only the file(s) whose z-range intersects
      // the box's quadrant. repartitionByRange SAMPLES its boundaries
      // (seed depends on the RDD id, i.e. on what ran before in the
      // JVM), so a boundary can straddle a quadrant seam and pull in a
      // neighboring file — allow up to ~4 of the 16 files rather than
      // pinning the exact-seam 1-2, keeping a strict >=4x skip proof.
      assert(uRows === (n * n).toLong,
        s"baseline unexpectedly skipped rows ($uRows) — layout not actually unclustered?")
      assert(zRows <= (n * n).toLong / 4,
        s"z-layout failed to skip: scan materialized $zRows of ${n * n} rows")
      assert(zRows >= expected)
    } finally {
      def rm(p: java.io.File): Unit = {
        if (p.isDirectory) p.listFiles().foreach(rm)
        p.delete(); ()
      }
      rm(new java.io.File(base))
    }
  }

  test("clusterByZ bounds BOTH dimensions where a single-key sort cannot") {
    val n = 64
    val parts = 16
    val grid = (0 until n).flatMap(x => (0 until n).map(y => (x.toLong, y.toLong)))
      .toDF("x", "y")

    def spans(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Long)] =
      df.withColumn("pid", spark_partition_id())
        .groupBy("pid")
        .agg((max("x") - min("x")).as("dx"), (max("y") - min("y")).as("dy"),
          count(lit(1)).as("cnt"))
        .select("dx", "dy", "cnt")
        .as[(Long, Long, Long)].collect().toSeq

    val zBoxes = spans(ZOrder.clusterByZ(grid, "x", "y", bits = 6, parts = parts))
    val xBoxes = spans(grid.repartitionByRange(parts, col("x")).sortWithinPartitions("x"))
    assert(zBoxes.map(_._3).sum === (n * n).toLong)

    // the skip-relevant metric is the WORST dimension span per
    // partition: a single-key sort leaves y unbounded (span = n-1) in
    // every partition; z-order keeps most partitions inside one curve
    // quadrant (at most a few straddle quadrant seams)
    def worst(b: Seq[(Long, Long, Long)]) = b.map { case (dx, dy, _) => dx.max(dy) }
    val zFull = worst(zBoxes).count(_ >= n - 1)
    val xFull = worst(xBoxes).count(_ >= n - 1)
    // every NON-EMPTY baseline partition spans y fully (the range
    // partitioner's sampled boundaries may in principle leave a
    // partition empty, so comparing against `parts` could fail
    // spuriously; xBoxes only counts non-empty pids)
    assert(xFull === xBoxes.size, "the single-key baseline should span y fully everywhere")
    assert(zFull <= parts / 4, s"z-order partitions spanning a full dimension: $zFull")
    val zMean = worst(zBoxes).sum.toDouble / zBoxes.size
    val xMean = worst(xBoxes).sum.toDouble / xBoxes.size
    assert(zMean < 0.75 * xMean, f"z mean worst-span $zMean%.1f vs single-key $xMean%.1f")
  }
}
