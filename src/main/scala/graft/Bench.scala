package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.file.{Files, Paths}

/** Benchmark main. Emits ONE JSON line as the final raw stdout line
  * (build.sbt sets run/outputStrategy=StdoutOutput so sbt does not
  * prefix it) and mirrors it to bench_out.json for robustness.
  *
  * LINE-LENGTH CONTRACT (r8): the driver records only the last ~2000
  * characters of stdout and parses the JSON line out of that tail —
  * the r6/r7 lines outgrew the window and two rounds of bench data
  * went unparsed. The stdout line therefore carries the headline
  * cells, both calibration readings, and the extended STEADY cells
  * only (≈1.6 kB); the per-query first-pass breakdowns live in
  * bench_out.json, which this main always writes in full.
  */
object Bench {

  /** Fixed-work host-speed calibration: a seeded, in-memory, CPU-bound
    * aggregation of CONSTANT size (2B xxhash64 evaluations fanned
    * over 32 partitions, partial-aggregated to one row — no input IO,
    * no shuffle). Identical work every round, so the ratio of two
    * rounds' calibration readings IS the host-speed ratio, ending the
    * per-round "was the regression code or host?" adjudication (r4,
    * r5, r6, r7 each needed it). Run BEFORE and AFTER the query cells
    * to bracket drift DURING the run; min-of-3 after a JIT warm pass.
    * Sized so task-scheduling overhead is noise (<5%): a 256M version
    * ran ~0.1 s where 32 × ~1.5 ms task dispatch was a third of the
    * cell. Reference reading on the round-8 build host: ~0.7 s. */
  def calibration(spark: SparkSession): Double = {
    import org.apache.spark.sql.functions._
    def once(): Double = {
      val t0 = System.nanoTime()
      // max, not sum: ANSI mode throws on long overflow and summing
      // full-range hashes overflows immediately
      spark.range(0L, 2000000000L, 1L, 32)
        .select(max(xxhash64(col("id"))).as("s")).collect()
      (System.nanoTime() - t0) / 1e9
    }
    once()
    (1 to 3).map(_ => once()).min
  }

  /** Single-THREAD driver-speed calibration: a fixed 400M-iteration
    * integer mixing loop on the driver thread, no Spark involvement.
    * The r11 adjudication gap this closes: three sf1_synth cells
    * (pack_sequences, bpe_train_1k, bpe_encode_ids_1k) ran 1.7–2×
    * slower on the driver host than locally while the 32-way executor
    * calibration read IDENTICAL (0.32 vs 0.32) — those cells are
    * dominated by single-thread driver work (the BPE pair-heap loop,
    * merge-table construction, per-cell job planning), which scales
    * with single-CORE speed, invisible to a 32-partition throughput
    * cell. drv_cal is the missing axis: cell ratios that track
    * drv_cal ratios are host, not code. */
  def driverCalibration(): Double = {
    def once(): Double = {
      val t0 = System.nanoTime()
      var h = 0x9E3779B97F4A7C15L
      var i = 0L
      while (i < 400000000L) { h ^= i; h *= 0xC2B2AE3D27D4EB4FL; h ^= h >>> 31; i += 1 }
      val sec = (System.nanoTime() - t0) / 1e9
      if (h == 42L) Console.err.println(h) // keep the loop live past JIT DCE
      sec
    }
    once()
    (1 to 3).map(_ => once()).min
  }
  def main(args: Array[String]): Unit = {
    // Route stderr to bench_spark.log BEFORE anything touches Spark:
    // log4j2's console appender targets SYSTEM_ERR and latches the
    // stream when it starts (first Logging call below), so after this
    // line every Spark log record AND any direct printStackTrace lands
    // in the file, never in the process tail. The r8 tail carried a
    // ~1.2 kB DAGScheduler ERROR trace; the r9 rerun with this routing
    // captured it in full: five `ERROR DAGScheduler: Failed to update
    // accumulator N ... attempted to access non-existent accumulator`
    // stacks, fired together ~55 s into the run (mid headline FIRST
    // pass — no streaming cell runs there), i.e. a straggler task-end
    // reporting its SQL-metric accumulators after their execution had
    // already completed and unregistered them (the early-exit
    // collect()/cancelled-stage class — harmless, results unaffected;
    // Bench's per-cell catch recorded no -1). The driver's ~2 kB
    // stdout tail window merges stderr, so one such trace can push the
    // round's JSON line out of the window — hence the routing.
    // Per-cell failures are still visible: the catch records -1 for
    // the cell and the full trace is in bench_spark.log.
    try System.setErr(new java.io.PrintStream(
      new java.io.FileOutputStream("bench_spark.log"), true, "UTF-8"))
    catch { case _: Throwable => () }
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      // local-mode parallelism for single-file inputs: without an
      // advisory minimum, a 46 MB fixture is one 128 MB-bound split and
      // the 1e6-row probe stage runs on one core. On a real cluster
      // inputs arrive in thousands of splits and these are no-ops.
      .config("spark.sql.files.minPartitionNum", cpus)
      .config("spark.sql.files.openCostInBytes", "1048576")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // Two passes over the headline set. The FIRST pass pays JVM/codegen
    // JIT and the once-per-session dimension-table builds — costs a
    // long-lived cluster session amortizes to zero — and is reported
    // under "first_pass" so nothing is hidden. The SECOND pass is the
    // headline "queries"/"value": steady-state compute, the
    // apples-to-apples number against the reference's steady-state
    // single-core loop. (Input scans are NOT cached — both passes read
    // the parquet from disk; only codegen + the ≤10k-row memoized
    // layout dimension tables carry over.)
    try { spark.read.parquet(s"$sfDir/lineitem.parquet").count() }
    catch { case _: Throwable => () }
    val calPre = calibration(spark)
    val drvCal = driverCalibration()
    def timeQuery(name: String, repeats: Int, dir: String = sfDir): Double = {
      val fn = Bench.catalog(name)
      (1 to repeats).map { _ =>
        val t0 = System.nanoTime()
        try { fn(spark, dir).count() } catch { case _: Throwable => -1L }
        (System.nanoTime() - t0) / 1e9
      }.min
    }
    // tiled_acc_hist runs both FIRST and LAST in each headline pass
    // (r7 ask): the in-harness cell measured 3.5× the builder's own
    // CacheProbe for the identical code path — suspect session debt
    // from the 12 preceding cells. tiled_first is the no-debt reading;
    // the canonical last-position cell stays in the total so the
    // headline remains comparable round-over-round.
    def runPass(repeats: Int): (Double, Seq[(String, Double)]) = {
      val tiledFirst = timeQuery("tiled_acc_hist", repeats)
      (tiledFirst, Bench.headline.map(n => n -> timeQuery(n, repeats)))
    }
    val (tiledFirstCold, firstPass) = runPass(1)
    // r14 (the r13 session-debt lesson): the flagship's LAST-measured
    // cell absorbs whatever block-manager/GC debt the session built up,
    // and r13's driver record could only be adjudicated against the
    // builder's local numbers. first/last/min of the steady pass go on
    // the stdout line so the driver record SELF-adjudicates: last ≫
    // min with first ≈ min is session debt, not a code regression.
    // GC barrier: the heavy tail of the first pass (shuffle files,
    // checkpointed blocks) otherwise lands its collection pause on the
    // FIRST steady query — r4 measured q1_agg 2.6× slower from exactly
    // this, while every other query got faster. Steady cells are then
    // min-of-2: one transient pause can't masquerade as a regression.
    System.gc()
    val (tiledFirst, results) = runPass(2)
    def cells(rs: Seq[(String, Double)]): String =
      rs.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }.mkString("{", ",", "}")
    val qs = cells(results)
    val first = cells(firstPass)
    val total = results.map(_._2).sum
    val firstTotal = firstPass.map(_._2).sum
    // steady-pass flagship positions: first-position (tiledFirst), the
    // canonical last-position cell inside `queries`, and their min
    val tiledLast = results.find(_._1 == "tiled_acc_hist").map(_._2).getOrElse(-1.0)
    val tiledMin = math.min(tiledFirst, tiledLast)
    // extended family: the dedup/ANN/streaming shuffle paths measured at
    // the driver's sf AND one scale factor down, so the skew caps and the
    // map-side assignment plan are MEASURED across a 10× data step, not
    // just plan-asserted. Reported as a separate key — the headline
    // total stays comparable round-over-round.
    // A third, 10×-UP step: no sf1 testdata exists, so the bench
    // synthesizes one deterministically from sf0.1 (documents 5k→50k,
    // embeddings 2k→20k — see synthScaleStep) and labels it sf1_synth.
    // Only the trend within the synthetic chain is comparable; its
    // absolute cells are not driver-testdata numbers.
    val synthDir =
      try Some(synthScaleStep(spark, "/root/testdata/sf0.1", "/tmp/graft_sf1_synth", copies = 10))
      catch { case _: Throwable => None }
    val extDirs = (Seq(sfDir, "/root/testdata/sf0.01").distinct
      .filter(d => Files.exists(Paths.get(d))) ++ synthDir)
    // Same hygiene as the headline set (round-5 lesson: the driver's
    // single-shot extended cells came out 10–150× inflated by host
    // noise and GC debt from the preceding cell): per cell, one cold
    // first pass (reported under extended_first_pass), a GC barrier so
    // the first pass's shuffle/checkpoint tail can't land its pause on
    // the steady measurement, then min-of-2 steady (reported under
    // extended).
    def extPass(dir: String): (Seq[(String, Double)], Seq[(String, Double)]) = {
      // barrier before the dir's first pass as well: without it the
      // first cell absorbs the block-manager debt of every preceding
      // query in the session (measured: a 120 s first-pass cell whose
      // steady time is 11 s) and "first pass" stops meaning "cold
      // query cost".
      System.gc()
      // events-table cells only run where the dir HAS an events table
      // (the synth up-step regenerates documents/embeddings only)
      val cells = Bench.extendedFamily.filter(n =>
        !Bench.eventsCells(n) || Files.exists(Paths.get(s"$dir/events.parquet")))
      val both = cells.map { name =>
        val fn = Bench.catalog(name)
        def once(): Double = {
          val t0 = System.nanoTime()
          try { fn(spark, dir).count() } catch { case _: Throwable => -1L }
          (System.nanoTime() - t0) / 1e9
        }
        val first = once()
        System.gc()
        val steady = math.min(once(), once())
        (name -> first, name -> steady)
      }
      (both.map(_._1), both.map(_._2))
    }
    // r11 (third round of bench-vs-host adjudication): a fixed-work
    // calibration reading taken immediately BEFORE each scale step's
    // family, so every extended cell has a same-minute host-speed
    // anchor — a cell that regresses while its step calibration
    // matches history is code; a cell that regresses WITH its step
    // calibration is host. Raw per-step readings go on stdout
    // (ext_cal); host-normalized steady cells (cell · calRef/calStep)
    // go to bench_out.json as extended_norm.
    val calRef = 0.70 // the round-8 reference host reading the series is anchored to
    // r13: a per-step DRIVER calibration too (the ext_cal pattern for
    // the single-thread axis) — the r12 watches (bpe_train_1k,
    // acc_stats) could not be adjudicated because drv_cal ran once at
    // session start; a cell ratio that tracks its STEP's drv_cal ratio
    // is host, not code
    val extRuns = extDirs.map { dir =>
      val label = Paths.get(dir).getFileName.toString
        .replace("graft_sf1_synth", "sf1_synth")
      val calStep = calibration(spark)
      val drvStep = driverCalibration()
      (label, calStep, drvStep, extPass(dir))
    }
    val extCal = extRuns.map { case (label, c, _, _) => "\"" + label + "\":" + f"$c%.2f" }
      .mkString("{", ",", "}")
    val drvCalExt = extRuns.map { case (label, _, dcs, _) => "\"" + label + "\":" + f"$dcs%.2f" }
      .mkString("{", ",", "}")
    val extNorm = extRuns.map { case (label, c, _, (_, steady)) =>
      "\"" + label + "\":" + steady.map { case (k, v) =>
        "\"" + k + "\":" + f"${v * calRef / c}%.3f"
      }.mkString("{", ",", "}")
    }.mkString("{", ",", "}")
    // post-run calibration: together with calPre this brackets host
    // drift DURING the run — a slow round with pre≈post≈historical
    // calibration is a code regression; pre/post ≫ historical is host.
    val calPost = calibration(spark)
    def extJson(pick: ((Seq[(String, Double)], Seq[(String, Double)])) => Seq[(String, Double)],
                fmt: Seq[(String, Double)] => String,
                only: String => Boolean = _ => true): String =
      extRuns.filter { case (label, _, _, _) => only(label) }
        .map { case (label, _, _, runs) => "\"" + label + "\":" + fmt(pick(runs)) }
        .mkString("{", ",", "}")
    // stdout candidates for the extended block, richest first: the
    // DRIVER's dir + the synth up-step (the sf0.01 down-step is
    // fixture-floor-dominated and lives in bench_out.json only), then
    // the tiers extendedTiers derives — one step, top-N. The first
    // tier whose full line fits the tail budget wins (see stdoutJson).
    val sfLabelMain = Paths.get(sfDir).getFileName.toString
    val stdoutSteps = extRuns
      .filter { case (label, _, _, _) => label == sfLabelMain || label == "sf1_synth" }
      .sortBy { case (label, _, _, _) => if (label == sfLabelMain) 0 else 1 }
      .map { case (label, _, _, (_, steady)) => (label, steady) }
    // r15: FIRST-pass readings of the primary step's 5 heaviest cells
    // (by steady time) on the stdout line — the flagship's first/min
    // self-adjudication extended to the heavy tier (capstones,
    // stream_distinct_hll). The r14 round's three ≥2× driver upticks
    // all had to be adjudicated from the builder's local record; with
    // first+steady in the driver record itself, a steady uptick whose
    // first pass and same-step ext_cal stayed in band reads as a
    // measurement-window artifact with no local cross-reference.
    val extHeavyFirst = extRuns
      .find { case (label, _, _, _) => label == sfLabelMain }
      .map { case (_, _, _, (firstP, steadyP)) =>
        val heavy = steadyP.sortBy { case (k, v) => (-v, k) }.take(5).map(_._1).toSet
        firstP.filter { case (k, _) => heavy(k) }
          .map { case (k, v) => "\"" + k + "\":" + f"$v%.2f" }.mkString("{", ",", "}")
      }.getOrElse("{}")
    val ext = extJson(_._2, cells)
    val extFirst = extJson(_._1, cells)
    // cal_drift = pre/post: ~1.0 means a stable host; ≫1 means the run
    // started on a slow host (or carried JIT debt the warm pass missed)
    val calDrift = calPre / calPost
    // slim=true for the stdout line: drops the session-debt diagnostics
    // (first_pass_total, tiled_first_cold) and shortens the sf label —
    // they live in bench_out.json / BENCH_LOCAL — buying back the ~70
    // chars the two r9 extended cells (bpe_encode_1k,
    // corpus_pipeline_v5 × 3 dirs) cost inside the tail window.
    def core(extPart: String, slim: Boolean): String = {
      val debt =
        if (slim) ""
        else s""""first_pass_total":${f"$firstTotal%.3f"},"tiled_first_cold":${f"$tiledFirstCold%.3f"},"""
      val sfLabel = if (slim) Paths.get(sfDir).getFileName.toString else sfDir
      s""""metric":"total","value":${f"$total%.3f"},"unit":"sec","queries":$qs,$debt"tiled_first":${f"$tiledFirst%.3f"},"tiled_min":${f"$tiledMin%.3f"},"calibration_pre":${f"$calPre%.3f"},"calibration_post":${f"$calPost%.3f"},"cal_drift":${f"$calDrift%.2f"},"drv_cal":${f"$drvCal%.3f"},"drv_cal_ext":$drvCalExt,"ext_cal":$extCal,"ext_heavy_first":$extHeavyFirst$extPart,"sf":"$sfLabel""""
    }
    // stdout line: must fit the driver's 2000-char stdout tail window
    // (with the trailing ~75-char sbt status line) or the round's bench
    // goes unparsed — r6/r7 both lost their lines to exactly this.
    // TIERED guard (r13; the r12 lesson): the old guard was
    // all-or-nothing, and when drv_cal + the v9 cells pushed the
    // 2-step block past budget it dropped ALL ~30 extended cells from
    // the driver's record. Now the richest representation that FITS
    // wins — every step, else one step, else the primary step's top-N
    // heaviest cells down to 1 — so the driver's independent perf
    // record never goes blind on the extended family again
    // (bench_out.json always carries all steps in full). The budget:
    // since r9 stderr routes to bench_spark.log BEFORE Spark starts,
    // the tail holds ONLY this line plus sbt's ~76-char status line —
    // 1860 + 76 = 1936 < 2000 with real slack.
    val stdoutJson = pickStdoutLine(
      extPart => "{" + core(extPart, slim = true) + "}",
      extendedTiers(stdoutSteps))
    // full detail (per-query first passes) → bench_out.json
    val fullJson = "{" + core(s""","extended":$ext""", slim = false) +
      s""","first_pass":$first,"extended_first_pass":$extFirst,"extended_norm":$extNorm}"""
    try Files.writeString(Paths.get("bench_out.json"), fullJson) catch { case _: Throwable => () }
    // All results are computed and mirrored at this point. Teardown of a
    // session that ran streaming queries can race a late task-end
    // accumulator update (already-stopped query → unregistered
    // accumulator → a harmless DAGScheduler ERROR stack) — the r8 tail
    // trace was exactly this class, logged MID-RUN after a stream_dedup
    // cell's query stop, which is why the stderr→bench_spark.log routing
    // at the top of main (not this OFF) is the real guard. The OFF stays
    // as belt-and-braces for the stop itself — nothing after this line
    // can affect results.
    spark.sparkContext.setLogLevel("OFF")
    spark.stop()
    // last raw stdout line, after Spark's shutdown logging
    System.out.println(stdoutJson)
    System.out.flush()
  }

  /** Deterministic 10×-UP scale step for the extended family (no sf1
    * testdata exists in this environment): `copies` stacked copies of
    * the sf0.1 documents/embeddings tables, mutated so the step
    * stresses the same paths the real data does rather than degenerate
    * ones —
    *  - each copy's text is word-shuffled by a (copy, doc)-salted hash
    *    order, so copies are NOT near-duplicates of each other and —
    *    because the order is salted PER DOC, not globally — unrelated
    *    docs from the tiny shared vocabulary do not collapse toward one
    *    canonical word order and become spuriously similar (a
    *    copy-only salt measured 8× slower components from exactly that
    *    explosion),
    *  - except doc_id % 500 == 0 rows, kept with only a per-copy
    *    suffix token: a small population of 10-member cross-copy
    *    NEAR-duplicate clusters so LSH verification and the component
    *    paths still find genuine work,
    *  - embeddings get a ±2.5% per-component hash perturbation
    *    (cluster structure preserved for IVF, vectors distinct).
    * Everything derives from xxhash64 — rerunning regenerates
    * bit-identical tables (idempotent: skipped when the output dir
    * already holds both tables). */
  def synthScaleStep(spark: SparkSession, baseDir: String, outDir: String, copies: Int): String = {
    import org.apache.spark.sql.functions._
    val docsOut = Paths.get(s"$outDir/documents.parquet")
    val embOut = Paths.get(s"$outDir/embeddings.parquet")
    if (!(Files.exists(docsOut) && Files.exists(embOut))) {
      val docs = spark.read.parquet(s"$baseDir/documents.parquet")
      val shuffled = expr(
        """array_join(transform(array_sort(transform(split(text, ' '),
          |  w -> struct(xxhash64(w, c, doc_id) AS h, w AS w))), s -> s.w), ' ')""".stripMargin)
      (0 until copies)
        .map { c =>
          docs
            .withColumn("c", lit(c))
            .select(
              (col("doc_id") + lit(c.toLong * 10000000L)).as("doc_id"),
              when(col("doc_id") % 500 === 0, concat(col("text"), lit(" copytoken"), col("c")))
                .otherwise(shuffled).as("text"),
              col("lang"), col("source"), col("n_chars"))
        }
        .reduce(_ unionByName _)
        .write.mode("overwrite").parquet(docsOut.toString)
      val emb = spark.read.parquet(s"$baseDir/embeddings.parquet")
      (0 until copies)
        .map { c =>
          emb
            .withColumn("c", lit(c))
            .select(
              (col("vec_id") + lit(c.toLong * 10000000L)).as("vec_id"),
              expr("""transform(embedding, (x, i) ->
                     |  cast(x + x * (cast(pmod(xxhash64(vec_id, c, i), 2001) - 1000 AS double) / 40000.0) AS float))"""
                .stripMargin).as("embedding"),
              col("label"))
        }
        .reduce(_ unionByName _)
        .write.mode("overwrite").parquet(embOut.toString)
    }
    outDir
  }

  /** The stdout extended-block tiers, RICHEST FIRST, at 2 decimals
    * (3 decimals × 3 dirs left no margin inside the tail window):
    *  1. every step, all cells;
    *  2. the primary (first) step only, all cells;
    *  3. the primary step's top-N heaviest cells, N = 12, 8, 5, 3, 1.
    * Pure so BenchLineSpec can pin the budget against the largest
    * plausible cell set. Steps must arrive primary-first. */
  private[graft] def extendedTiers(steps: Seq[(String, Seq[(String, Double)])]): Seq[String] = {
    def fmt(ss: Seq[(String, Seq[(String, Double)])]): String =
      ss.map { case (l, cs) =>
        "\"" + l + "\":" + cs.map { case (k, v) => "\"" + k + "\":" + f"$v%.2f" }
          .mkString("{", ",", "}")
      }.mkString("{", ",", "}")
    if (steps.isEmpty || steps.forall(_._2.isEmpty)) return Seq.empty
    val primary = Seq(steps.head).filter(_._2.nonEmpty)
    val topNs = Seq(12, 8, 5, 3, 1).map(n =>
      primary.map { case (l, cs) => (l, cs.sortBy { case (k, v) => (-v, k) }.take(n)) })
    (Seq(steps, primary) ++ topNs).distinct.map(fmt)
  }

  /** First tier whose FULL line fits `budget`; a line with no extended
    * block only when even a one-cell tier cannot fit (never happens at
    * the real core size — BenchLineSpec pins it). `mkLine` receives
    * either "" or `,"extended":{...}` and returns the complete line. */
  private[graft] def pickStdoutLine(mkLine: String => String, extTiers: Seq[String],
                                    budget: Int = 1860): String =
    extTiers.iterator.map(t => mkLine(s""","extended":$t"""))
      .find(_.length <= budget)
      .getOrElse(mkLine(""))

  /** Conformance queries plus the bench-only scale-contrast cells
    * (`bpe_train_1k` / `bpe_encode_1k` — oracle-less by design, moved
    * out of the driver catalog in r9 so CORRECTNESS stays all-green). */
  def catalog: Map[String, (SparkSession, String) => DataFrame] =
    SparkEntry.queries ++ SparkEntry.scaleQueries

  /** Headline bench set: the flagship acceptance scan + representative
    * per-family queries (kept small — the driver runs this at sf0.1). */
  def headline: Seq[String] =
    Seq(
      "q1_agg",
      "acc_stats",
      "hist1d_price",
      "join_orders_customer",
      "j1_spatial_grid",
      "o6_runs",
      "sessionize",
      "dedup_exact",
      "dedup_minhash_lsh",
      "ann_topk_bf",
      "text_stats",
      "tiling_counts",
      "tiled_acc_hist"
    ).filter(catalog.contains)

  /** Extended dedup/ANN/streaming family measured at three scale
    * factors (see the `extended` key): the queries whose scale behavior
    * rests on skew caps, cell blocking, and the map-side centroid
    * assignment. Round-6 composition rule: every cell must be
    * expected-SUBLINEAR in data size, or its growth must be explained
    * by genuine output growth documented in SCALE.md — so the chain
    * reads as a scaling trend, not a mix of engine time and
    * by-construction-quadratic work. Two r5 cells were swapped out
    * under that rule: `emb_near_pairs` (raw pair output grows ~1500×
    * on the copy-clique synth step) is benched via its
    * components-summarized consumer `dedup_embedding` (same pair
    * generation inside, output = one row per cluster — the form a
    * pipeline actually materializes; the raw-pairs query remains in
    * the correctness gate), and `ann_topk_q8` (quantized BRUTE-FORCE
    * baseline, queries × corpus by definition) yields its slot to the
    * already-present `ann_topk_ivf_q8` production retrieval shape
    * (it too stays in the correctness gate). `dedup_simhash` remains:
    * its synth step is output-bound (~276k true pairs from
    * identical-multiset copies, see SCALE.md) and now hot-block
    * capped, so the cell measures the capped candidate join. */
  def extendedFamily: Seq[String] =
    Seq(
      "dedup_clusters_star",
      "dedup_simhash",
      "dedup_paragraph",
      "ann_topk_ivf",
      "dedup_embedding",
      "emb_quantize",
      "ann_topk_ivf_q8",
      "decontaminate",
      "perplexity_filter",
      "shared_substrings",
      "pack_sequences",
      // stream_dedup_exact's near-FLAT chain (r7: 1.79/2.25/2.14 s at
      // 500/5k/50k docs) is expected, not a broken feed: the input IS
      // the dir's documents table (collected and replayed through a
      // MemoryStream in two micro-batches), but the cell's floor is
      // the streaming-query machinery — query start/stop, two
      // processAllAvailable barriers, state-store open — which
      // dominates until the feed is ≫ ~100k rows. The cell measures
      // that floor plus the stateful dedup, so it reads as a constant
      // until the state path itself is the cost.
      // stream_dedup_minhash is deliberately NOT a bench cell: like
      // stream_dedup_exact it is streaming-machinery-floor-dominated at
      // fixture scale (query start/stop + processAllAvailable barriers),
      // so a second flat ~2 s cell would add stdout-line pressure
      // without a second scaling story; the exact-dedup cell already
      // measures that floor and the LSH candidate join is benched via
      // dedup_minhash_lsh.
      "stream_dedup_exact",
      // r7 additions (the verdict's missing bench coverage). Under the
      // composition rule: dedup_spans output is one row per doc (the
      // gram exchange + two-phase covered union is the measured path);
      // bpe_train is 12 fixed iterations over a distinct-word table
      // whose size is near-CONSTANT across the synth copy step (the
      // corpus pass is the only linear stage) — expected sublinear;
      // corpus_pipeline_v4 is the full capstone chain with a
      // per-source-rollup output — measures the composed LSH + ANN +
      // span + packing engine path at scale.
      "dedup_spans",
      "bpe_train",
      // the scale-path contrast cells: bpe_train_1k does 83× the
      // merges of bpe_train in a fraction of its time (one corpus
      // pass + the in-memory pair-heap vs ~2 job waves per merge);
      // bpe_encode is the zero-exchange expression-chain forward pass
      "bpe_train_1k",
      "bpe_encode",
      // the >64-merge typed encode path (1,000 merges): like bpe_train,
      // its vocabulary work is near-constant across the synth copy step
      // — the cell tracks the corpus encode sweep, expected ~linear
      "bpe_encode_1k",
      // r10: the token-ID emission at the same 1,000-merge vocabulary —
      // the id-array production kernel (counts-only bpe_encode_1k
      // cannot see id-materialization cost); expected ~linear like the
      // counts sweep
      "bpe_encode_ids_1k",
      // r9: the composed IVFADC production retrieval. The PURE PQ cell
      // (ann_topk_pq) is deliberately absent for the same reason
      // ann_topk_q8 is: an un-probed ADC sweep is queries × corpus BY
      // DEFINITION (the quadratic growth is the contract, not a
      // pathology) — the bench measures the probe-restricted shape a
      // pipeline runs; both stay in the correctness gate
      "ann_topk_ivfpq",
      // r11: IVFADC against the PERSISTED index (parquet, partitioned
      // by cell). The index build is memoized per dir, so the FIRST
      // pass pays encode+write once and the steady cells measure what
      // a production query session runs: probed-cells-only partition-
      // pruned code scan + exact re-rank — the build-once / search-many
      // split, same contract as corpus_pipeline_v7's train/score split
      "ann_topk_ivfpq_idx",
      "corpus_pipeline_v4",
      // v5 = v4 with packing budgeted in BPE subwords of the
      // span-reduced text — its subword-budget packing stage is where
      // a superlinear surprise would hide (r8 verdict item 2)
      "corpus_pipeline_v5",
      // r10: v6 packs REAL token-id sequences (the heaviest chain since
      // r9, previously unmeasured — the heaviest-chain-unbenched lesson's
      // third occurrence per the r9 verdict); its id-array packing stage
      // is the candidate superlinear stage to watch across the 10× step
      "corpus_pipeline_v6",
      // r11: curation + the LEARNED quality gate. Weights are memoized
      // per dir (training is bit-deterministic, so sharing is sound):
      // the FIRST pass pays the 16-iteration distributed training, the
      // steady cells measure map-side scoring + rollup — the
      // train-once / score-many split a production session actually has
      "corpus_pipeline_v7",
      // r11: the HLL-sketch streaming COUNT(DISTINCT) — like
      // stream_dedup_exact, the cell's floor is the streaming-query
      // machinery until feeds are ≫100k rows; what the chain tracks is
      // that the CONSTANT-size register state (4 KB/key) keeps the
      // stateful hop flat while the exact-set form's state grows with
      // cardinality. Skipped in dirs without an events table.
      "stream_distinct_hll",
      // r11: the generation loop — persisted-index shard dedup + the
      // gen-1-trained learned gate + rollup. First pass pays index
      // build + training (both memoized per dir); steady cells measure
      // the per-shard cadence cost a production pipeline re-pays
      "corpus_pipeline_v8",
      // r12: the MULTIMODAL generation loop — v8's cadence plus the
      // exact embedding gate against the persisted gen-1 IVF index.
      // First pass pays both index builds + training (memoized per
      // dir); steady cells measure the three-gate per-shard cost
      "corpus_pipeline_v9",
      // r11: Count-Min heavy hitters — exact top-20 verification side
      // (one token groupBy, TakeOrdered) plus the depth×width sketch
      // (one partial-aggregated exchange into ≤4096 rows). The cell
      // should scale like one corpus token scan; the sketch side's
      // output is constant-size by construction
      "heavy_hitters_cms",
      // r11 closing wave: exact shard-vs-index embedding dedup through
      // the persisted geometry/encoded tables — candidate cells from
      // the triangle bound, partition-pruned membership, exact scoring.
      // First pass pays the memoized gen-1 index build; steady cells
      // measure the per-shard probe (0.79→0.88→5.32 s across the 100×
      // chain in BENCH_LOCAL_r11 — the synth step's amplified
      // duplicate population grows candidate membership, the
      // output-bound shape the closure family shares)
      "dedup_incremental_emb",
      // r11: DSIR importance selection — two corpus feature scans (the
      // Pin'd (id, j, x) table feeds target/raw models and the weigh
      // join), both models ≤1024 rows; the cell should track the
      // token-scan family, not the dedup family
      "dsir_select"
    ).filter(catalog.contains)

  /** Extended cells that read the events table — skipped on scale
    * steps that only regenerate documents/embeddings (sf1_synth). */
  val eventsCells: Set[String] = Set("stream_distinct_hll")
}
