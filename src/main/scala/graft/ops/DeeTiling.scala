package graft.ops

import graft.geom.Exclusion
import graft.geom.Exclusion.{Rect, Zone}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dee tiling (SURVEY §2.8 X3 — the reference's biggest operator,
  * `Dee.populate`, ETL.py:555-715; with S4 slot grid, F2 annulus
  * containment, F3 polygon exclusion, O6 run segmentation, X1
  * partition, X6 module matrix).
  *
  * Spark shape: the slot lattice is a crossJoin of two ranges with the
  * availability predicates as plain columns (annulus checks codegen;
  * the exclusion test is one scalar UDF over a broadcast zone list).
  * The per-row 'maybe' state machine + run segmentation + partition
  * placement are row-sequential by construction (ETL.py:599-629), so
  * they run inside one `flatMapGroups` per row — rows are independent
  * and parallelize across the cluster; a row is ≤ ~30 slots.
  *
  * Float discipline: slot coordinates replicate the reference's
  * move_by accumulation order, so every strict annulus comparison is
  * bit-identical.
  *
  * Known deviation (documented, SURVEY §4): the reference does not
  * reset its `start` index between runs of a split row
  * (ETL.py:~688 `start = length`), which mis-centers supermodules in
  * rows broken into 2+ runs by exclusion geometry. We reset per run —
  * entity counts are unaffected; positions in multi-run rows are the
  * correct run-local means.
  */
object DeeTiling {

  /** One face's tiling configuration (dee_geometry.py:346-381). */
  final case class Config(
      orientation: String, // "above" | "below"
      centerRB: Boolean,
      centerPB: Boolean,
      rInner: Double,
      rOuter: Double = 1185.0,
      edgeX: Double = 8.0,
      moduleHeight: Double = 43.10,
      moduleWidth: Double = 56.50,
      pbWidth: Double = 29.5,
      rbWidth: Double = 56.5,
      moduleGap: Double = 0.5,
      flavors: Seq[Int] = Seq(3, 6, 7),
      // 2×2 sensor grid of the 'S' module (dee_geometry.py:323-327, 307)
      sensorSize: Double = 20.8,
      sensorDeadspace: Double = 0.5,
      sensorDistX: Double = 22.6,
      sensorDistY: Double = 22.4,
      // non-square sensors (example.ipynb's 21.75 × 22 small-sensor
      // baseline); NaN = fall back to the square sensorSize
      sensorSizeX: Double = Double.NaN,
      sensorSizeY: Double = Double.NaN,
      // sensor grid shape (Module.__init__ n_sensor_x/n_sensor_y,
      // ETL.py:207-221: a 1-wide axis forces its distance to 0, so the
      // single sensor sits on the module center)
      nSensorX: Int = 2,
      nSensorY: Int = 2
  ) {
    def sensorW: Double = if (sensorSizeX.isNaN) sensorSize else sensorSizeX
    def sensorH: Double = if (sensorSizeY.isNaN) sensorSize else sensorSizeY
    val smWidth: Double = moduleWidth + pbWidth // single-module SM footprint width
    val pitch: Double = moduleHeight + moduleGap

    /** Single-module SM center after centering + edge shift
      * (SuperModule init + centerModule/centerPB + move_by(edge_x,0)). */
    def baseX: Double = moduleHeight / 2.0 + edgeX
    def baseY: Double = {
      val w2 = smWidth / 2.0
      (orientation, centerRB, centerPB) match {
        case ("above", true, _) => w2 - rbWidth / 2.0
        case ("above", _, true) => -w2 + pbWidth / 2.0
        case ("below", true, _) => w2 - pbWidth - rbWidth / 2.0
        case ("below", _, true) => w2 - pbWidth / 2.0
        case _                  => 0.0
      }
    }

    /** Module-rect center offset from SM center (ETL.py:343). */
    def moduleDy: Double = if (orientation == "above") -pbWidth / 2.0 else pbWidth / 2.0

    def nRows: Int = (2 * rOuter / smWidth).toInt + 2
    def nCols: Int = (rOuter / pitch).toInt + 2
  }

  final case class SlotIn(row: Int, col: Int, x: Double, y: Double, fitsSm: Boolean, fitsMod: Boolean)
  final case class TileOut(
      kind: String, // "slot" | "sm"
      row: Int,
      col: Int,     // slot col; for SMs: sequence within the row
      n_mod: Int,   // SMs only
      x: Double,
      y: Double,
      available: String,
      covered: Boolean
  )

  /** Build the slot lattice with fit flags (S4 + F2 + F3). */
  def slotGrid(spark: SparkSession, cfg: Config, zones: Seq[Zone]): DataFrame = {
    import spark.implicits._
    val bZones = spark.sparkContext.broadcast(zones)
    val halfH = cfg.moduleHeight / 2.0
    val smW2 = cfg.smWidth / 2.0
    val modW2 = cfg.moduleWidth / 2.0
    val (rI2, rO2) = (cfg.rInner * cfg.rInner, cfg.rOuter * cfg.rOuter)
    val (baseX, baseY, pitch, smW, modDy) = (cfg.baseX, cfg.baseY, cfg.pitch, cfg.smWidth, cfg.moduleDy)
    val halfRows = cfg.nRows / 2

    spark.range(cfg.nRows).toDF("row").selectExpr("cast(row as int) row")
      .crossJoin(spark.range(cfg.nCols).toDF("col").selectExpr("cast(col as int) col"))
      .as[(Int, Int)]
      .map { case (row, col) =>
        // replicate move_by order: base + col*pitch / base + (halfRows-row)*width
        val x = baseX + col * pitch
        val y = baseY + (halfRows - row) * smW
        def annulus(x1: Double, x2: Double, y1: Double, y2: Double): Boolean =
          x1 * x1 + y1 * y1 > rI2 && x2 * x2 + y2 * y2 > rI2 &&
            x1 * x1 + y2 * y2 > rI2 && x2 * x2 + y1 * y1 > rI2 &&
            x1 * x1 + y1 * y1 < rO2 && x2 * x2 + y2 * y2 < rO2 &&
            x1 * x1 + y2 * y2 < rO2 && x2 * x2 + y1 * y1 < rO2
        val smRect = Rect(x - halfH, x + halfH, y - smW2, y + smW2)
        val my = y + modDy
        val modRect = Rect(x - halfH, x + halfH, my - modW2, my + modW2)
        val fitsSm = annulus(smRect.x1, smRect.x2, smRect.y1, smRect.y2) &&
          !Exclusion.excluded(smRect, bZones.value)
        val fitsMod = annulus(modRect.x1, modRect.x2, modRect.y1, modRect.y2) &&
          !Exclusion.excluded(modRect, bZones.value)
        SlotIn(row, col, x, y, fitsSm, fitsMod)
      }
      .toDF()
  }

  /** Availability state machine + segmentation + partition + placement
    * (ETL.py:582-700), per row. */
  def tile(spark: SparkSession, cfg: Config, zones: Seq[Zone]): DataFrame = {
    import spark.implicits._
    val flavors = cfg.flavors
    slotGrid(spark, cfg, zones)
      .as[SlotIn]
      .groupByKey(_.row)
      .flatMapGroups((row, it) => processRow(row, it.toArray, flavors))
      .toDF()
  }

  /** One row's availability state machine + run segmentation +
    * partition + placement (ETL.py:582-700; start reset per run).
    * Pure function — shared by the single-face and batched tilers. */
  private def processRow(row: Int, unsorted: Array[SlotIn], flavors: Seq[Int]): Seq[TileOut] = {
    val slots = unsorted.sortBy(_.col)
    val n = slots.length
    val avail = Array.fill(n)("no")
    // --- 'maybe' state machine (ETL.py:582-629) ---
    var maybeInRow = 0
    for (c <- 0 until n) {
      val s = slots(c)
      if (s.fitsSm) avail(c) = "yes"
      else if (s.fitsMod) {
        if (maybeInRow < 1) {
          if (c > 0 && avail(c - 1) == "yes") avail(c) = "no"
          else { avail(c) = "maybe"; maybeInRow += 1 }
        } else if (avail(c - 1) == "maybe") {
          avail(c) = "maybe"; avail(c - 1) = "no"
        }
      }
    }
    // --- run segmentation (ETL.py:631-644), with maybe-retry (646-668) ---
    def segment(keep: Set[String]): Seq[Seq[Int]] = {
      val runs = scala.collection.mutable.ArrayBuffer.empty[Vector[Int]]
      var first = true
      for (c <- 0 until n) {
        if (keep(avail(c))) {
          if (first) { runs += Vector(c); first = false }
          else runs(runs.length - 1) = runs.last :+ c
        } else if (avail(c) == "no") first = true
      }
      runs.toSeq
    }
    var runs = segment(Set("yes", "maybe"))
    val passed = runs.forall { r =>
      val part = PartitionSolver.getPartition(r.length, flavors)
      !(part.nonEmpty && avail(r.head) == "maybe" && part.head != 7)
    }
    if (!passed) runs = segment(Set("yes"))
    // --- partition + placement (ETL.py:670-700; start reset per run) ---
    val out = scala.collection.mutable.ArrayBuffer.empty[TileOut]
    val covered = Array.fill(n)(false)
    var seq = 0
    for (r <- runs) {
      val part = PartitionSolver.getPartition(r.length, flavors)
      var start = 0
      for (nMod <- part) {
        val xs = r.slice(start, start + nMod).map(i => slots(i).x)
        val xSm = xs.sum / nMod
        val ySm = slots(r.head).y
        out += TileOut("sm", row, seq, nMod, xSm, ySm, "", covered = true)
        seq += 1
        start += nMod
      }
      for (k <- 0 until part.sum) covered(r(k)) = true
    }
    for (c <- 0 until n)
      out += TileOut("slot", row, c, 0, slots(c).x, slots(c).y, avail(c), covered(c))
    out.toSeq
  }

  final case class SlotInF(face: String, row: Int, col: Int, x: Double, y: Double,
                           fitsSm: Boolean, fitsMod: Boolean)
  final case class TileOutF(face: String, kind: String, row: Int, col: Int, n_mod: Int,
                            x: Double, y: Double, available: String, covered: Boolean)

  /** Batched tiler: all faces in ONE job — the per-face slot grids
    * union into a single dataset and one `flatMapGroups` keyed by
    * (face, row) runs every row of every face concurrently, instead of
    * 4 sequential per-face stage chains (wall-time win; identical
    * output modulo the extra `face` column). */
  def tileFaces(spark: SparkSession, faces: Seq[(String, Config, Seq[Zone])]): DataFrame = {
    import spark.implicits._
    val grids = faces
      .map { case (f, cfg, zones) => slotGrid(spark, cfg, zones).withColumn("face", lit(f)) }
      .reduce(_ unionByName _)
    val flavorsByFace = faces.map { case (f, cfg, _) => f -> cfg.flavors }.toMap
    val bFlavors = spark.sparkContext.broadcast(flavorsByFace)
    grids
      .select($"face", $"row", $"col", $"x", $"y", $"fitsSm", $"fitsMod")
      .as[SlotInF]
      .groupByKey(s => (s.face, s.row))
      .flatMapGroups { (key: (String, Int), it: Iterator[SlotInF]) =>
        val (face, row) = key
        val slots = it.map(s => SlotIn(s.row, s.col, s.x, s.y, s.fitsSm, s.fitsMod)).toArray
        processRow(row, slots, bFlavors.value(face))
          .map(t => TileOutF(face, t.kind, t.row, t.col, t.n_mod, t.x, t.y, t.available, t.covered))
      }
      .toDF()
  }

  /** Supermodule table of a tiled face. */
  def supermodules(tiled: DataFrame): DataFrame =
    tiled.filter(col("kind") === "sm")
      .select(col("row"), col("col").as("seq"), col("n_mod"), col("x").as("x_sm"), col("y").as("y_sm"))

  /** Expand a tiled face's supermodules → modules → n×m sensors with
    * active-area corners (Module.populate, ETL.py:264-269 +
    * SuperModule module placement, ETL.py:341-343). Output feeds the
    * acceptance spatial join directly. A 1-wide sensor axis places its
    * sensor on the module center (ETL.py:220-221 forces the distance
    * to 0 — the geometric_acceptance.ipynb 1×2 module variants). */
  def sensors(sms: DataFrame, cfg: Config): DataFrame = {
    val pitch = cfg.pitch
    val distX = if (cfg.nSensorX == 1) 0.0 else cfg.sensorDistX
    val distY = if (cfg.nSensorY == 1) 0.0 else cfg.sensorDistY
    val mods = sms
      .withColumn("mod_i", explode(sequence(lit(0), col("n_mod") - 1)))
      .withColumn("x_mod", col("x_sm") + ((lit(0) - (col("n_mod") - 1)) / 2.0 + col("mod_i")) * pitch)
      .withColumn("y_mod", col("y_sm") + cfg.moduleDy)
    val sens = mods
      .withColumn("ix", explode(sequence(lit(0), lit(cfg.nSensorX - 1))))
      .withColumn("iy", explode(sequence(lit(0), lit(cfg.nSensorY - 1))))
      .withColumn("x", (col("ix") * 2 - 1) * (distX / 2.0) + col("x_mod"))
      .withColumn("y", (col("iy") * 2 - 1) * (distY / 2.0) + col("y_mod"))
    // withCorners' `height` is the x-extent and `width` the y-extent
    // (Sensor(x, y) in the reference); square for the production
    // modules, 21.75 × 22 for the notebook small-sensor baseline
    SensorTable.withCorners(sens, cfg.sensorW, cfg.sensorH, cfg.sensorDeadspace)
  }

  /** X6 module-matrix bitmap: groupBy(row).pivot(col) over covered. */
  def moduleMatrix(tiled: DataFrame): DataFrame =
    tiled.filter(col("kind") === "slot")
      .groupBy("row")
      .pivot("col")
      .agg(first(col("covered").cast("int")))

  /** The four reference face configs (dee_geometry.py:346-381):
    * face1 above+RB (first-layer geometry), face2 above+PB,
    * face3 below+RB, face4 below+PB. */
  def referenceFaces(firstLayerRInner: Double = 322.0, rInner: Double = 302.0): Seq[(String, Config, Boolean)] =
    Seq(
      ("face1", Config("above", centerRB = true, centerPB = false, rInner = firstLayerRInner), true),
      ("face2", Config("above", centerRB = false, centerPB = true, rInner = rInner), false),
      ("face3", Config("below", centerRB = true, centerPB = false, rInner = rInner), false),
      ("face4", Config("below", centerRB = false, centerPB = true, rInner = rInner), false)
    )

  /** Tile all four faces of the 'updated' layout; returns the combined
    * output with a `face` column (one batched job). Memoized per
    * session — the tiled slot table is a ≤10k-row dimension table that
    * several conformance queries consume; one tiling job serves all
    * (the reference likewise tiles each dee once per run). */
  def tileUpdatedLayout(spark: SparkSession): DataFrame =
    // identical config to tileLayout("updated"): referenceFaces() with
    // default edgeX=8 and Exclusion.updatedLayout == layoutZones("updated")
    tileLayout(spark, "updated")

  /** The example.ipynb small-sensor baseline detector (cells 2 + 6):
    * 44.2 × 56.5 modules of 2×2 non-square 21.75 × 22 sensors at
    * 21.85/22.5 pitch, RB 56.5 / PB 29.5 boards, both disks at
    * r_inner = 315 mm, edge_x = 6 mm, NO exclusion zones. Face order
    * matches the notebook's layer list (disk1_front/back,
    * disk2_front/back — above-RB, above-PB, below-RB, below-PB). */
  def notebookFaces(): Seq[(String, Config, Seq[Zone])] = {
    val base = Config("above", centerRB = true, centerPB = false, rInner = 315.0,
      edgeX = 6.0, moduleHeight = 44.2, moduleWidth = 56.5,
      pbWidth = 29.5, rbWidth = 56.5,
      sensorDistX = 21.85, sensorDistY = 22.5,
      sensorSizeX = 21.75, sensorSizeY = 22.0)
    Seq(
      ("disk1_front", base, Nil),
      ("disk1_back", base.copy(centerRB = false, centerPB = true), Nil),
      ("disk2_front", base.copy(orientation = "below"), Nil),
      ("disk2_back", base.copy(orientation = "below", centerRB = false, centerPB = true), Nil))
  }

  /** The geometric_acceptance.ipynb detector variants at their EXACT
    * notebook parameters (cells 4/6, 16/18, 28/29): four dees D1–D4
    * (above-RB, above-PB, below-RB, below-PB), Dee(315, 1185), default
    * edge_x = 6, NO exclusion zones.
    *  - `large_sensor`: 43.10 × 56.50 modules of 1×2 sensors 42.5 × 22
    *    at y-pitch 22.5 (x distance forced 0), flavors [3,6,7];
    *  - `small_sensor`: the example.ipynb small-sensor baseline —
    *    44.20 × 56.50 modules of 2×2 sensors 21.75 × 22 at 21.85/22.5;
    *  - `small_sensor_v2`: 22.35 × 56.50 half-height modules of 1×2
    *    sensors 21.75 × 22, flavors [6,11,14]. */
  def gaFaces(variant: String): Seq[(String, Config, Seq[Zone])] = {
    val base = variant match {
      case "large_sensor" =>
        Config("above", centerRB = true, centerPB = false, rInner = 315.0,
          edgeX = 6.0, moduleHeight = 43.10, moduleWidth = 56.5,
          pbWidth = 29.5, rbWidth = 56.5,
          sensorDistY = 22.5, sensorSizeX = 42.5, sensorSizeY = 22.0,
          nSensorX = 1, nSensorY = 2)
      case "small_sensor" =>
        Config("above", centerRB = true, centerPB = false, rInner = 315.0,
          edgeX = 6.0, moduleHeight = 44.2, moduleWidth = 56.5,
          pbWidth = 29.5, rbWidth = 56.5,
          sensorDistX = 21.85, sensorDistY = 22.5,
          sensorSizeX = 21.75, sensorSizeY = 22.0)
      case "small_sensor_v2" =>
        Config("above", centerRB = true, centerPB = false, rInner = 315.0,
          edgeX = 6.0, moduleHeight = 42.5 / 2 + 0.5 + 0.6, moduleWidth = 56.5,
          pbWidth = 29.5, rbWidth = 56.5, flavors = Seq(6, 11, 14),
          sensorDistY = 22.5, sensorSizeX = 21.75, sensorSizeY = 22.0,
          nSensorX = 1, nSensorY = 2)
      case other =>
        throw new IllegalArgumentException(s"unknown ga variant '$other'")
    }
    Seq(
      ("D1", base, Nil),
      ("D2", base.copy(centerRB = false, centerPB = true), Nil),
      ("D3", base.copy(orientation = "below"), Nil),
      ("D4", base.copy(orientation = "below", centerRB = false, centerPB = true), Nil))
  }

  /** Re-dimension a face config for a named module size
    * (dee_geometry.py:316-341): 'S' is the TDR-like 43.10 × 56.50
    * module (gap 0.5, RB 56.5 / PB 29.5 boards); 'M' is the
    * tamale-optimized 44.10 × 57.50 (gap 0.5, RB 57.5 / PB 28.5);
    * 'L' is the M geometry with a 0.6 module gap. The 2×2 sensor grid
    * (20.8 mm sensors at 22.6/22.4 pitch) is size-independent. */
  def sized(cfg: Config, size: String): Config = size match {
    case "S" => cfg
    case "M" => cfg.copy(moduleHeight = 44.10, moduleWidth = 57.50,
                         pbWidth = 28.5, rbWidth = 57.5, moduleGap = 0.5)
    case "L" => cfg.copy(moduleHeight = 44.10, moduleWidth = 57.50,
                         pbWidth = 28.5, rbWidth = 57.5, moduleGap = 0.6)
    case other =>
      throw new IllegalArgumentException(s"unknown module size '$other' (S | M | L)")
  }

  /** Face configs + exclusion zones for a named layout variant
    * (dee_geometry.py:225-297, 370-380). Inner-annulus radii:
    * 'updated' → 322 mm first layer / 302 mm others; 'baseline' and
    * 'plain' → 336 mm everywhere. `seal` widens edge_x 8 → 25 mm
    * (dee_geometry.py:379); `noFeedthrough` drops the feedthrough
    * slabs from the outer boundary; `size` swaps the module/board
    * dimensions (see [[sized]]). */
  def layoutFaces(layout: String, seal: Boolean = false,
                  noFeedthrough: Boolean = false,
                  size: String = "S"): Seq[(String, Config, Seq[Zone])] = {
    val (rFirst, rRest) = layout match {
      case "updated"            => (322.0, 302.0)
      case "baseline" | "plain" => (336.0, 336.0)
      case other =>
        throw new IllegalArgumentException(s"unknown dee layout '$other'")
    }
    val edgeX = if (seal) 25.0 else 8.0
    referenceFaces(rFirst, rRest).map { case (face, cfg, first) =>
      (face, sized(cfg.copy(edgeX = edgeX), size),
        Exclusion.layoutZones(layout, firstLayer = first, noFeedthrough = noFeedthrough))
    }
  }

  /** Tile the example.ipynb detector (memoized per session). */
  def tileNotebook(spark: SparkSession): DataFrame =
    tileCache.getOrElseUpdate(spark, "notebook") {
      tileFaces(spark, notebookFaces()).localCheckpoint(eager = true)
    }

  /** Tile all four faces of a named layout variant (one batched job).
    * Memoized per (session, variant, size) like [[tileUpdatedLayout]]. */
  def tileLayout(spark: SparkSession, layout: String, seal: Boolean = false,
                 noFeedthrough: Boolean = false, size: String = "S"): DataFrame =
    tileCache.getOrElseUpdate(spark, s"$layout-$seal-$noFeedthrough-$size") {
      tileFaces(spark, layoutFaces(layout, seal, noFeedthrough, size))
        .localCheckpoint(eager = true)
    }

  private val tileCache =
    new graft.util.SessionCache[String, DataFrame]

  /** Pure-annulus tiling (no exclusion zones) — the reference's
    * geometry-free path, used for the exact golden. */
  def tileAnnulus(spark: SparkSession): DataFrame =
    tileFaces(spark, referenceFaces().map { case (face, cfg, _) => (face, cfg, Nil) })

  /** Acceptance-ready sensor table of a tiled layout: one batched
    * tiling job (checkpointed — the tiny tiled table is computed once,
    * not once per face filter), then the per-face module→sensor
    * expansion with each face's own orientation config. Output:
    * (face index, active-area corners), the spatial-join input.
    *
    * Memoized per (session, layout, flags): this is a ≤10k-row
    * DIMENSION table whose construction costs seconds of driver-side
    * geometry — the reference likewise builds its dees once per run
    * and reuses them across every analysis. The checkpointed result is
    * session-scoped (localCheckpoint blocks die with the session). */
  def layoutFaceSensors(spark: SparkSession, layout: String, seal: Boolean = false,
                        noFeedthrough: Boolean = false): DataFrame =
    sensorCache.getOrElseUpdate(spark, (layout, seal, noFeedthrough)) {
      val faces = layoutFaces(layout, seal, noFeedthrough)
      val tiled = tileLayout(spark, layout, seal, noFeedthrough)
      faces.zipWithIndex
        .map { case ((face, cfg, _), idx) =>
          sensors(supermodules(tiled.filter(col("face") === face)), cfg)
            .select(lit(idx).as("face"), col("ax1"), col("ax2"), col("ay1"), col("ay2"))
        }
        .reduce(_ unionByName _)
        .localCheckpoint(eager = true)
    }

  private val sensorCache =
    new graft.util.SessionCache[(String, Boolean, Boolean), DataFrame]
}
