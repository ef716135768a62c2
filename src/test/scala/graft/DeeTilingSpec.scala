package graft

import graft.ops.DeeTiling
import graft.pipelines.Layouts
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** X3 dee tiling vs goldens from a fresh reference run
  * (fixtures/tiling_sm_golden.jsonl):
  *  - `annulus_S`: the reference's own numpy path (no exclusion
  *    geometry) — exact, including supermodule positions;
  *  - `updated_S`: the full 'updated' layout, reference executed with
  *    an exact-circle geometry shim standing in for shapely — counts
  *    and positions compared at 1e-6 (positions in multi-run rows are
  *    excluded: the reference's unreset `start` index mis-centers
  *    those, see DeeTiling scaladoc).
  */
class DeeTilingSpec extends SparkSpec {

  private lazy val golden: DataFrame =
    spark.read.json(Layouts.resolveFixture("tiling_sm_golden.jsonl")).cache()

  private def smTable(tiled: DataFrame): DataFrame =
    tiled.filter(col("kind") === "sm")
      .select(col("face"), col("n_mod"), round(col("x"), 6).as("x"), round(col("y"), 6).as("y"))

  test("pure-annulus tiling matches the reference exactly (82 SMs per face, positions bit-equal)") {
    val mine = smTable(DeeTiling.tileAnnulus(spark)).cache()
    val ref = golden.filter(col("layout") === "annulus_S").select("face", "n_mod", "x", "y")
    assert(mine.count() == ref.count())
    val diff = mine.exceptAll(ref).count() + ref.exceptAll(mine.select("face", "n_mod", "x", "y")).count()
    assert(diff == 0, s"$diff position mismatches vs reference")
  }

  test("'updated' layout tiling matches the reference shim run (76/79/76/79 SMs, 1838 modules)") {
    val tiled = DeeTiling.tileUpdatedLayout(spark).cache()
    val counts = smTable(tiled).groupBy("face")
      .agg(count(lit(1)).as("n_sm"), sum("n_mod").as("n_mod"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(counts == Map(
      "face1" -> ((76L, 456L)), "face2" -> ((79L, 461L)),
      "face3" -> ((76L, 460L)), "face4" -> ((79L, 461L))
    ))
    // covered-slot count == module count (X6 matrix sum)
    val matrixSum = tiled.filter(col("kind") === "slot" && col("covered"))
      .groupBy("face").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(matrixSum == Map("face1" -> 456L, "face2" -> 461L, "face3" -> 460L, "face4" -> 461L))
  }

  test("'updated' SM positions match the shim run outside multi-run rows") {
    val tiled = DeeTiling.tileUpdatedLayout(spark)
    val mine = smTable(tiled)
    val ref = golden.filter(col("layout") === "updated_S").select("face", "n_mod", "x", "y")
    // y identifies the row; restrict to (face, y) groups where both sides
    // have the same SM multiset — multi-run rows differ by design.
    val mismatches = mine.exceptAll(ref).groupBy("face", "y").count()
    val total = mine.count()
    val bad = mismatches.agg(sum("count")).head().get(0)
    val badCount = if (bad == null) 0L else bad.asInstanceOf[Long]
    // the reference mis-centers only SMs in rows split by attachments;
    // everything else must agree to 1e-6
    assert(badCount < total / 5, s"$badCount of $total SM positions differ — more than multi-run rows explain")
  }

  test("layout variants tile to the reference shim-run counts") {
    // goldens from the patched shim run (start-reset applied; see
    // tiling_variants oracle): (variant, face1..4 n_sm, total modules)
    val expect = Map(
      ("baseline", "face1") -> 77L, ("baseline", "face2") -> 78L,
      ("plain", "face1") -> 82L, ("plain", "face2") -> 80L,
      ("updated_seal", "face1") -> 75L, ("updated_seal", "face2") -> 77L,
      ("updated_noft", "face1") -> 76L, ("updated_noft", "face2") -> 79L
    )
    val variants = Seq(
      ("baseline", "baseline", false, false),
      ("plain", "plain", false, false),
      ("updated_seal", "updated", true, false),
      ("updated_noft", "updated", false, true))
    for ((name, layout, seal, noft) <- variants) {
      val counts = DeeTiling.tileLayout(spark, layout, seal, noft)
        .filter(col("kind") === "sm")
        .groupBy("face").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      for (face <- Seq("face1", "face2"))
        assert(counts(face) == expect((name, face)), s"$name/$face: ${counts(face)}")
    }
  }

  test("M and L module sizes tile to the reference shim-run counts") {
    // goldens from the --modules M / --modules L shim runs (see the
    // tiling_sizes oracle): per-face (n_sm, n_modules)
    val expect = Map(
      ("M", "face1") -> (74L, 442L), ("M", "face2") -> (75L, 447L),
      ("L", "face1") -> (74L, 442L), ("L", "face3") -> (74L, 445L))
    for (size <- Seq("M", "L")) {
      val counts = DeeTiling.tileLayout(spark, "updated", size = size)
        .filter(col("kind") === "sm")
        .groupBy("face")
        .agg(count(lit(1)), sum("n_mod"))
        .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      for (face <- Seq("face1", "face2", "face3"); exp <- expect.get((size, face)))
        assert(counts(face) == exp, s"$size/$face: ${counts(face)} != $exp")
    }
    // M and L share dimensions; the larger L gap must not grow any face
    val mTot = DeeTiling.tileLayout(spark, "updated", size = "M")
      .filter(col("kind") === "sm").count()
    val lTot = DeeTiling.tileLayout(spark, "updated", size = "L")
      .filter(col("kind") === "sm").count()
    assert(lTot <= mTot, s"L ($lTot) tiled more SMs than M ($mTot) despite the wider gap")
    intercept[IllegalArgumentException] { DeeTiling.sized(DeeTiling.referenceFaces().head._2, "XL") }
  }

  test("notebook detector tiles to the shim-run counts incl. non-square sensors") {
    val counts = DeeTiling.tileNotebook(spark)
      .filter(col("kind") === "sm")
      .groupBy("face")
      .agg(count(lit(1)), sum("n_mod"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(counts("disk1_front") == ((80L, 484L)), s"got ${counts("disk1_front")}")
    assert(counts("disk1_back") == ((79L, 482L)), s"got ${counts("disk1_back")}")
    // sensor active areas must reflect the 21.75 × 22 (−2×0.5 deadspace)
    // non-square geometry: x-extent 20.75, y-extent 21
    val (face, cfg, _) = DeeTiling.notebookFaces().head
    val sens = DeeTiling.sensors(
      DeeTiling.supermodules(DeeTiling.tileNotebook(spark).filter(col("face") === face)), cfg)
    val r = sens
      .select(
        round(max(col("ax2") - col("ax1")), 9).as("dx"),
        round(max(col("ay2") - col("ay1")), 9).as("dy"))
      .head()
    assert(r.getDouble(0) == 20.75 && r.getDouble(1) == 21.0, s"active extents $r")
  }

  test("no-feedthrough boundary drops the slabs without excluding everything") {
    import graft.geom.Exclusion
    val z = Exclusion.outerBoundary(feedthrough = 1185.0)
    // a rect straddling x=1185's line but inside the ring? No — a rect
    // well inside the acceptance must NOT intersect the boundary
    assert(!z.intersects(Exclusion.Rect(1100, 1150, -20, 20)))
    // and the outer ring still excludes
    assert(z.intersects(Exclusion.Rect(1180, 1200, -20, 20)))
  }
}
