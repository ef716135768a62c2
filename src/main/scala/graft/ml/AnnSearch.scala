package graft.ml

import graft.functions.{CentroidSet, NearestCells}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Two paths:
  *  - `bfTopK`: brute-force cosine top-k — the correctness baseline.
  *    The (small) query set broadcasts; the corpus streams through one
  *    codegen'd projection (dot products via `aggregate`/`zip_with` —
  *    no UDFs), then a per-query top-k window. At 100 TB the corpus
  *    side never shuffles; the only exchange carries (query, candidate,
  *    sim) rows, O(|queries| · corpus) pre-top-k — use the IVF path
  *    when that product is too large.
  *  - `ivfTopK`: the scale path. A deterministic centroid table
  *    partitions the corpus into `nlist` cells (one MAP-SIDE
  *    zero-shuffle assignment pass — see [[graft.functions.NearestCells]];
  *    materialize once, reuse per query batch); queries probe only
  *    their `nprobe` nearest cells, so the per-query candidate set
  *    shrinks by ~nlist/nprobe. Same exact scoring on the survivors.
  *
  * All arithmetic is double-precision with left-to-right accumulation so
  * results are deterministic and oracle-reproducible.
  */
object AnnSearch {

  /** Σ a_i·b_i in double precision (left-to-right, deterministic).
    * A native codegen expression — see [[graft.functions.DotProduct]]
    * for why this beats `aggregate(zip_with(...))` (HOFs run
    * interpreted per element; this is a compiled primitive loop with
    * bit-identical accumulation order). */
  def dot(a: Column, b: Column): Column =
    graft.functions.VectorOps.dot(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Brute-force cosine top-k. `queries`/`corpus`: (id, vec) tables; the
    * query side is broadcast. Ties break on corpus id (deterministic).
    * Self-matches (same id) are excluded. */
  def bfTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    // norms precomputed once per SIDE, not once per pair: the join
    // evaluates a single dot per candidate instead of three. The final
    // division keeps cosine's association (dot / (na·nb)), so sims are
    // bit-identical to the naive form.
    val q = broadcast(
      queries.select(col("id").as("q_id"), col("vec").as("q_vec"), norm(col("vec")).as("q_norm")))
    val scored = corpus
      .select(col("id").as("n_id"), col("vec").as("n_vec"), norm(col("vec")).as("n_norm"))
      .join(q, col("q_id") =!= col("n_id"))
      // sims projected to scalars ahead of the window (SCALE.md rule:
      // never carry vectors through a top-k sort)
      .select(col("q_id"), col("n_id"),
        (dot(col("q_vec"), col("n_vec")) / (col("q_norm") * col("n_norm"))).as("sim"))
    scored
      .withColumn("rank", row_number().over(Window.partitionBy("q_id").orderBy(desc("sim"), col("n_id"))))
      .filter(col("rank") <= k)
      .select("q_id", "rank", "n_id", "sim")
  }

  /** Lloyd refinement of the stride seeds: `iters` rounds of assign
    * (map-side cosine argmax, ties → smaller c_id) + recompute
    * (per-cell elementwise mean via posexplode/groupBy —
    * partial-aggregated, no vector collect). Deterministic up to
    * floating-point aggregation order: `avg()` is partially aggregated,
    * so centroid coordinates can differ in the last ulps across
    * partitionings, which in principle can flip a near-tied argmax
    * downstream (the oracle-checked queries therefore use the exactly
    * reproducible stride seeds, not this). On clustered corpora this
    * concentrates cells so small `nprobe` probes recover the true
    * neighbors; the IVF plumbing downstream is unchanged. Each
    * iteration streams the corpus once and shuffles only the partial
    * (cell, dim) sums — at 100 TB only (nlist × dim) rows move. */
  def kmeansCentroids(corpus: DataFrame, stride: Int, iters: Int): DataFrame = {
    var centroids = strideCentroids(corpus, stride)
    for (_ <- 0 until iters) {
      val assigned = ivfAssign(corpus, centroids)
      centroids = assigned
        .select(col("cell"), posexplode(col("n_vec")).as(Seq("dim", "v")))
        .groupBy("cell", "dim")
        .agg(avg(col("v").cast("double")).as("m"))
        .groupBy(col("cell").as("c_id"))
        .agg(array_sort(collect_list(struct(col("dim"), col("m")))).as("dm"))
        .select(col("c_id"), expr("transform(dm, x -> x.m)").as("c_vec"))
    }
    centroids
  }

  /** [[kmeansCentroids]] with BIT-DETERMINISTIC per-cell means, for the
    * oracle-checked retrieval queries: each component is rounded to 6
    * decimals and accumulated as `decimal(27, 6)` — decimal addition is
    * EXACT (a scaled-integer sum, no intermediate rounding), hence
    * order-independent, hence the refined centroids are identical
    * across partitionings and re-runs where the plain double `avg` can
    * drift in the last ulps and flip a near-tied assignment argmax
    * downstream. The mean is the exact sum cast once to double divided
    * by the count — one rounding, reproducible anywhere (DuckDB
    * included). Precision headroom: |component| ≤ ~10 at 6-decimal
    * scale leaves 20 integer digits — overflow needs a 10^19-member
    * cell. Same scale shape as [[kmeansCentroids]]: the corpus streams
    * once per iteration, only (cell, dim) partial sums shuffle. */
  def kmeansCentroidsExact(corpus: DataFrame, stride: Int, iters: Int): DataFrame = {
    var centroids = strideCentroids(corpus, stride)
    for (_ <- 0 until iters) {
      val assigned = ivfAssign(corpus, centroids)
      centroids = assigned
        .select(col("cell"), posexplode(col("n_vec")).as(Seq("dim", "v")))
        .groupBy("cell", "dim")
        .agg((sum(expr("cast(round(cast(v AS double), 6) AS decimal(27, 6))")).cast("double")
          / count(lit(1))).as("m"))
        .groupBy(col("cell").as("c_id"))
        .agg(array_sort(collect_list(struct(col("dim"), col("m")))).as("dm"))
        .select(col("c_id"), expr("transform(dm, x -> x.m)").as("c_vec"))
    }
    centroids
  }

  /** Deterministic centroid table: every `stride`-th corpus vector. At
    * scale this is a k-means refinement target; the IVF plumbing is
    * identical either way. */
  def strideCentroids(corpus: DataFrame, stride: Int): DataFrame =
    corpus
      .filter(pmod(col("id"), lit(stride)) === 0)
      .select(col("id").as("c_id"), col("vec").as("c_vec"))

  /** Collect the (dim-table-sized) centroid table to the driver, sorted
    * by id, norms precomputed with [[graft.functions.DotProduct]]'s
    * accumulation order. This is the same data movement a broadcast
    * does — done once, then embedded in map-side expressions. */
  def collectCentroids(centroids: DataFrame): CentroidSet = {
    val rows = centroids
      .select(col("c_id").cast("long"), col("c_vec").cast("array<double>"))
      .collect()
      .sortBy(_.getLong(0))
    require(rows.nonEmpty,
      "empty centroid table — seeding selected no rows (check the stride against the corpus id space)")
    val ids = rows.map(_.getLong(0))
    val vecs = rows.map(_.getSeq[Double](1).toArray)
    val norms = vecs.map { v =>
      var s = 0.0; var i = 0
      while (i < v.length) { s += v(i) * v(i); i += 1 }
      math.sqrt(s)
    }
    CentroidSet(ids, vecs, norms)
  }

  /** Assign each corpus vector to its nearest centroid (by cosine,
    * ties → smaller centroid id) — entirely MAP-SIDE: the argmax runs
    * as a codegen expression against the collected centroid array
    * inside the scan projection, so the corpus streams once and
    * NOTHING shuffles (the old crossJoin + top-1 window form shuffled
    * nlist × corpus bytes). Materialize the result and reuse it across
    * query batches. */
  def ivfAssign(corpus: DataFrame, centroids: DataFrame): DataFrame =
    ivfAssignWith(corpus, collectCentroids(centroids))

  /** [[ivfAssign]] against an ALREADY-COLLECTED centroid set — the seam
    * that lets a caller holding a [[CentroidSet]] (the closure: it
    * needs the set for its own probe expressions anyway) assign without
    * a second collect action re-evaluating the centroid subtree (r16;
    * for the capstones that subtree is embeddings ⋈ curated-survivors,
    * re-run once per collect). */
  def ivfAssignWith(corpus: DataFrame, cents: CentroidSet): DataFrame =
    corpus.select(
      NearestCells.topCells(col("vec"), cents, 1).getItem(0).as("cell"),
      col("id").as("n_id"),
      col("vec").as("n_vec"))

  /** IVF top-k: probe the `nprobe` nearest cells per query, exact-score
    * the candidates in those cells. */
  def ivfTopK(queries: DataFrame, assigned: DataFrame, centroids: DataFrame, k: Int, nprobe: Int): DataFrame = {
    val cents = collectCentroids(centroids)
    val probes = queries
      .select(col("id").as("q_id"), col("vec").as("q_vec"))
      .withColumn("cell", explode(NearestCells.topCells(col("q_vec"), cents, nprobe)))
      .select(col("q_id"), col("q_vec"), col("cell"))
    // per-side norms (see bfTopK): one dot per candidate in the scoring join
    probes
      .withColumn("q_norm", norm(col("q_vec")))
      .join(assigned.withColumn("n_norm", norm(col("n_vec"))), Seq("cell"))
      .filter(col("q_id") =!= col("n_id"))
      // sims projected to scalars ahead of the window (SCALE.md rule)
      .select(col("q_id"), col("n_id"),
        (dot(col("q_vec"), col("n_vec")) / (col("q_norm") * col("n_norm"))).as("sim"))
      .withColumn("rank", row_number().over(Window.partitionBy("q_id").orderBy(desc("sim"), col("n_id"))))
      .filter(col("rank") <= k)
      .select("q_id", "rank", "n_id", "sim")
  }

  /** Robust long conf read: malformed values fall back to the default
    * instead of throwing NumberFormatException at plan construction. */
  private def confLong(spark: org.apache.spark.sql.SparkSession, key: String, default: Long): Long =
    spark.conf.getOption(key) match {
      case Some(v) => scala.util.Try(v.trim.toLong).toOption.getOrElse {
        // don't silently mask a typo'd knob ("128m", "1e8"): fall back
        // robustly but SAY so
        org.slf4j.LoggerFactory.getLogger(getClass)
          .warn(s"ignoring malformed $key='$v' (not a long); using default $default")
        default
      }
      case None => default
    }

  /** Internal: per-cell geometry TABLE of an assigned corpus — cell id,
    * member count, chunk count (ceil(cnt / chunkTarget)), ANGULAR
    * RADIUS r_c = max over members of angle(member, centroid), and the
    * centroid vector + norm re-attached for the candidate self-join.
    * One aggregate over the assigned table, nlist output rows,
    * materialized (both the candidate join and the chunk grouping read
    * it). Zero-norm members/centroids map to angle 0 via
    * try_divide + coalesce-to-1 (under ANSI a plain double `/` throws
    * DIVIDE_BY_ZERO rather than yielding the NaN the clamp would
    * absorb) — safe, because a zero-norm vector's sim with ANYTHING is
    * NaN in the scoring kernel and fails the `≥ τ` test, so it can
    * never be part of a qualifying pair. */
  private[graft] def closureGeomDf(
      assigned: DataFrame, centroids: DataFrame, chunkTarget: Long): DataFrame = {
    // centroid norms computed ONCE on the broadcast side (the bfTopK
    // per-side rule) — not re-derived per corpus row in the aggregate
    val centDf = broadcast(centroids.select(
      col("c_id").cast("long").as("cell"), col("c_vec").cast("array<double>").as("c_vec"))
      .withColumn("c_nrm", norm(col("c_vec"))))
    assigned
      .join(centDf, Seq("cell"))
      // try_divide + coalesce-to-1: a zero-norm member or centroid
      // yields cos 1 → angle 0 (kept / radius-neutral) instead of the
      // ANSI DIVIDE_BY_ZERO a plain `/` throws on double zero divisors
      // — the one-sided-safe resolution the NaN-clamp rule promises,
      // now actually reachable (found by RandomizedPropertySpec's
      // zero-norm case; the fixtures never exercised it)
      .select(col("cell"),
        acos(least(lit(1.0), greatest(lit(-1.0),
          coalesce(try_divide(dot(col("n_vec"), col("c_vec")),
            col("n_nrm") * col("c_nrm")), lit(1.0))))).as("ang"))
      .groupBy("cell")
      .agg(count(lit(1)).as("cnt"), max("ang").as("r"))
      .withColumn("nch",
        greatest(lit(1), ceil(col("cnt").cast("double") / chunkTarget).cast("int")))
      .join(centDf, Seq("cell"))
      .localCheckpoint(false)
  }

  /** Internal: the candidate cell pairs the spherical triangle
    * inequality cannot exclude for a τ-closure — as an ENGINE-SIDE
    * broadcast self-join of the nlist-row geometry table on the bound
    * predicate `angle(cᵢ,cⱼ) ≤ rᵢ + rⱼ + θτ + slack`, replacing the
    * r10 driver for-comprehension (O(nlist²·dim) single-threaded work
    * and an O(nlist²) driver allocation BEFORE any guard could fire —
    * at a production nlist of 10⁵ that loop is 5×10⁹ driver-side dot
    * products and a multi-GB candidate list; here the same comparisons
    * fan out as a broadcast nested-loop join over nlist broadcast rows
    * and the driver holds nothing per-pair). Angles are bit-identical
    * to the old driver loop: [[graft.functions.DotProduct]] accumulates
    * left-to-right exactly as the driver while-loop did, and a
    * zero-norm centroid resolves to cos 1 → angle 0 → pair KEPT via
    * try_divide + coalesce — the one-sided-safe resolution (the old
    * driver `math.min/max` clamp propagated NaN and silently PRUNED
    * every pair touching a degenerate cell, an exactness hole; an
    * engine-side plain `/` would instead throw DIVIDE_BY_ZERO under
    * ANSI — RandomizedPropertySpec pins the degenerate case). */
  private[graft] def closureCandidates(geom: DataFrame, tau: Double): DataFrame = {
    val thetaTau = math.acos(math.max(-1.0, math.min(1.0, tau)))
    // slack absorbs float error in the three measured angles; it can
    // only ADD candidate pairs, never drop one — exactness is
    // one-sided safe. Sized generously: acos has unbounded derivative
    // at ±1, so a member sitting numerically AT its centroid direction
    // (cos 1−1e-12 computed as 1.0) can understate a radius by ~1e-6
    // alone; 1e-4 rad (0.006°) covers every such boundary with orders
    // of margin while being far below the bound's useful granularity.
    val slack = 1e-4
    val li = geom.select(col("cell").as("ca"), col("r").as("ra"),
      col("nch").as("ncha"), col("c_vec").as("cva"), col("c_nrm").as("cna"))
    val rj = geom.select(col("cell").as("cb"), col("r").as("rb"),
      col("nch").as("nchb"), col("c_vec").as("cvb"), col("c_nrm").as("cnb"))
    li.join(broadcast(rj),
        col("ca") <= col("cb") &&
          // try_divide + coalesce-to-1: zero-norm centroid → angle 0 →
          // pair KEPT (one-sided safe; plain `/` would throw
          // DIVIDE_BY_ZERO under ANSI before the clamp could see a NaN)
          acos(least(lit(1.0), greatest(lit(-1.0),
            coalesce(try_divide(dot(col("cva"), col("cvb")),
              col("cna") * col("cnb")), lit(1.0)))))
            <= col("ra") + col("rb") + lit(thetaTau + slack))
      .select(col("ca"), col("cb"), col("ncha"), col("nchb"))
  }

  /** Internal: expand candidate cell pairs to CHUNK pairs via
    * `explode(sequence(...))` — each unordered chunk pair exactly once
    * (same-cell pairs enumerate only chb ≥ cha). Engine-side; the
    * driver never holds a per-pair tuple. */
  private[graft] def closureChunkPairs(cand: DataFrame): DataFrame =
    cand
      .withColumn("cha", explode(sequence(lit(0), col("ncha") - 1)))
      .withColumn("chb", explode(sequence(
        when(col("ca") === col("cb"), col("cha")).otherwise(lit(0)), col("nchb") - 1)))
      .select("ca", "cha", "cb", "chb")

  /** The assigned-table projection the closure consumes: home cell
    * (map-side argmax), the vector widened to double, and its norm —
    * materialized once (localCheckpoint) because the geometry
    * aggregate and the chunk grouping both read it. */
  private def closureAssigned(corpus: DataFrame, cents: CentroidSet): DataFrame =
    ivfAssignWith(corpus, cents)
      .select(col("cell"), col("n_id"),
        col("n_vec").cast("array<double>").as("n_vec"),
        norm(col("n_vec")).as("n_nrm"))
      .localCheckpoint(false)

  /** Pruning evidence for the τ-closure: (candidate cell pairs kept by
    * the triangle-inequality bound, total cell pairs over non-empty
    * cells). The scale specs pin the kept fraction on the clustered
    * fixture — the measured form of the "on clustered corpora the
    * blocking prunes hard" claim. */
  def closureCellPairStats(corpus: DataFrame, centroids: DataFrame, tau: Double): (Long, Long) = {
    val chunkTarget = confLong(corpus.sparkSession, "spark.graft.nearpairs.chunkTarget", 512L).max(1L)
    val assigned = closureAssigned(corpus, collectCentroids(centroids))
    val geom = closureGeomDf(assigned, centroids, chunkTarget)
    val m = geom.count()
    (closureCandidates(geom, tau).count(), m * (m + 1) / 2)
  }

  /** ALL pairs (a < b) with cosine ≥ τ — EXACT, via cell-pair blocking
    * pruned by the spherical triangle inequality. No probe knob, no
    * recall assumption: for a ∈ cell i, b ∈ cell j,
    *   angle(cᵢ,cⱼ) ≤ angle(cᵢ,a) + angle(a,b) + angle(b,cⱼ)
    *                ≤ rᵢ + angle(a,b) + rⱼ
    * (rᵢ = cell i's angular radius), so any cell pair with
    * angle(cᵢ,cⱼ) > rᵢ + rⱼ + arccos(τ) provably contains NO
    * qualifying pair and is pruned. This replaces the r9 probe-count
    * heuristic (nprobe = ceil(0.9·nlist)) that was both a latent
    * recall bug at other fractions and ~90% of all-pairs at this one.
    *
    * Plan shape: ONE corpus scan assigns cells map-side
    * ([[ivfAssign]]) and is materialized; one nlist-row aggregate
    * measures cell radii; candidate cell pairs come from an
    * ENGINE-SIDE broadcast self-join of that nlist-row geometry table
    * on the bound predicate ([[closureCandidates]] — the driver holds
    * no per-pair state at any nlist); ONE aggregate over that join
    * enforces `maxChunkPairs` BEFORE anything is expanded or
    * materialized; then the survivors expand to CHUNK pairs via
    * `explode(sequence(...))` (cells split into ≤chunkTarget-member
    * chunks — bounds the grouped row size at any corpus scale AND
    * spreads a giant cell's intrinsic quadratic work across chunk-pair
    * tasks instead of one hot partition). The chunk-pair table joins
    * the grouped corpus twice (broadcast-sized keys only), and scoring
    * runs as the compiled [[graft.functions.CellPairSims]] kernel —
    * one row per chunk pair, not per candidate, with each unordered
    * pair emitted exactly once (no distinct pass).
    *
    * Scale behavior is now a measured property of the DATA, not a
    * tuned knob: on clustered corpora (tight cells, spread centroids)
    * the bound prunes most cell pairs — [[closureCellPairStats]] is
    * spec-pinned ≤ 0.2 kept on the clustered fixture — while on the
    * adversarial near-isotropic fixture (true pairs AT τ, cell radii
    * near 90°) NOTHING can prune without losing exactness, and the
    * operator degrades gracefully to a fast compiled all-cell-pairs
    * pass rather than silently dropping pairs. Use τ-closure on
    * unclustered 100 TB corpora only with a sketch prefilter
    * (MinHash/SimHash) — that trade-off is the consumer's, not a
    * silent property of this operator.
    *
    * Build side: the grouped corpus broadcasts when its true byte size
    * (known exactly from the geometry pass — the planner's estimate
    * for a post-join corpus would be garbage) fits
    * `spark.graft.nearpairs.broadcastAssignedMaxBytes` (default 64 MB);
    * past that the pair join degrades to a shuffled hash join keyed by
    * (cell, chunk). */
  def cosineNearPairs(corpus: DataFrame, centroids: DataFrame, tau: Double): DataFrame = {
    val spark = corpus.sparkSession
    val cents = collectCentroids(centroids)
    require(cents.ids.nonEmpty, "cosineNearPairs: empty centroid table")
    val dim = cents.vecs.head.length
    // reuse the already-collected set: a second collectCentroids here
    // was a second collect ACTION re-running the centroid subtree
    // (embeddings ⋈ survivors in the capstones) per closure call
    val assigned = closureAssigned(corpus, cents)
    val chunkTarget = confLong(spark, "spark.graft.nearpairs.chunkTarget", 512L).max(1L)
    val geom = closureGeomDf(assigned, centroids, chunkTarget)
    val cand = closureCandidates(geom, tau)
    // Defensive ceiling on the chunk-pair table: on data where the
    // triangle bound prunes nothing (isotropic at scale) the expansion
    // is O((n/chunkTarget)²) tuples — hopeless work that would only
    // fail later and slower. The guard is ONE aggregate streamed over
    // the candidate join — nothing is expanded, collected, or
    // checkpointed before this check passes, at ANY nlist (the r10
    // form materialized an O(nlist²) driver IndexedSeq before its
    // guard could say anything). 50M tuples ≈ 2 GB materialized —
    // far beyond any sane closure, far below a silent death.
    val maxChunkPairs = confLong(spark, "spark.graft.nearpairs.maxChunkPairs", 50000000L)
    // guard AND corpus size in ONE action (r16: the corpus-size
    // aggregate was a second job wave; both are one-row aggregates
    // over the checkpointed geometry, so a cross join fuses them)
    val guard = cand.agg(
      count(lit(1)).as("pairs"),
      // nch·(nch+1)/2 via shiftright — Spark's `/` is DOUBLE division
      // even on longs; the product is always even so the shift is exact
      coalesce(sum(when(col("ca") === col("cb"),
          shiftright(col("ncha").cast("long") * (col("ncha").cast("long") + 1L), 1))
        .otherwise(col("ncha").cast("long") * col("nchb").cast("long"))), lit(0L)).as("planned"))
      .crossJoin(geom.agg(coalesce(sum("cnt"), lit(0L)).as("n")))
      .head()
    val nCandPairs = guard.getLong(0)
    val plannedPairs = guard.getLong(1)
    require(plannedPairs <= maxChunkPairs,
      s"cosineNearPairs: the triangle bound kept $nCandPairs cell pairs " +
        s"expanding to $plannedPairs chunk pairs (> $maxChunkPairs). At this scale the " +
        "closure is effectively all-pairs on this data — raise tau, pre-block with a " +
        "sketch (MinHash/SimHash), use more/tighter centroids (k-means refinement), or " +
        "raise spark.graft.nearpairs.{chunkTarget,maxChunkPairs} deliberately.")
    val n = guard.getLong(2)
    // materialize the (guard-bounded) chunk-pair table so the scoring
    // join reads a compact checkpointed table instead of replaying the
    // candidate nested-loop join per downstream stage
    val chunkPairs = closureChunkPairs(cand).localCheckpoint(false)
    // the chunk-pair table broadcasts while small (the common, pruned
    // case); near the maxChunkPairs ceiling it degrades to a shuffled
    // hash join on the chunk keys rather than shipping ~GB broadcasts
    val bcPairsMax = confLong(spark, "spark.graft.nearpairs.broadcastPairsMaxBytes", 64L << 20)
    val pairsDf =
      if (plannedPairs * 40L <= bcPairsMax) broadcast(chunkPairs)
      else chunkPairs.hint("shuffle_hash")
    val nchDf = broadcast(geom.select(col("cell"), col("nch")))
    val chunked = assigned
      .join(nchDf, Seq("cell"))
      // chunk key is a HASH of the id, not the id itself: periodic id
      // allocations (all ids multiples of k) would otherwise collapse
      // onto pmod's residue 0 and rebuild the one-giant-chunk row this
      // chunking exists to prevent; any partition of a cell is valid
      // (chunk pairs enumerate every member combination), so the choice
      // cannot affect the emitted pair set
      .select(col("cell"), pmod(xxhash64(col("n_id")), col("nch").cast("long")).cast("int").as("chunk"),
        struct(col("n_id").as("id"), col("n_vec").as("vec"), col("n_nrm").as("nrm")).as("m"))
      .groupBy("cell", "chunk")
      .agg(collect_list(col("m")).as("members"))
      .localCheckpoint(false)
    val left = chunked.select(col("cell").as("ca"), col("chunk").as("cha"), col("members").as("ma"))
    val right0 = chunked.select(col("cell").as("cb"), col("chunk").as("chb"), col("members").as("mb"))
    val bcMax = confLong(spark, "spark.graft.nearpairs.broadcastAssignedMaxBytes", 64L << 20)
    val right =
      if (n * (8L * dim + 48L) <= bcMax) broadcast(right0)
      else right0.hint("shuffle_hash")
    left.join(pairsDf, Seq("ca", "cha"))
      .join(right, Seq("cb", "chb"))
      .select(explode(graft.functions.CellPairSims.pairSims(
        col("ma"), col("mb"),
        col("ca") === col("cb") && col("cha") === col("chb"), tau)).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"), col("p.sim").as("sim"))
  }

  /** Deterministic PQ codebooks ([[graft.functions.PqBook]]): subspace
    * `j`'s codewords are the j-th `dim/m`-slices of every `stride`-th
    * corpus vector, in corpus-id order — the same reproducible seeding
    * discipline as [[strideCentroids]] (at scale these are k-means
    * refinement targets per subspace; the ADC plumbing is identical).
    * Driver footprint: m × ksub × dsub doubles — dim-table-sized. */
  def pqBook(corpus: DataFrame, m: Int, stride: Int, maxK: Int = 256): graft.functions.PqBook = {
    // ksub caps at 256 so codes always fit one byte per subspace — the
    // production storage contract — and codeword scans stay O(256)
    // however big the corpus (the stride sample is id-sorted first, so
    // the cap keeps a deterministic prefix).
    // the id-order + cap runs IN the engine (orderBy + limit), so the
    // driver receives at most maxK rows — never the whole stride
    // sample (at 100 TB corpus/stride rows of full vectors would OOM
    // the driver; maxK × dim doubles is dim-table-sized)
    val rows = corpus
      .filter(pmod(col("id"), lit(stride)) === 0)
      .select(col("id").cast("long"), col("vec").cast("array<double>"))
      .orderBy(col("id"))
      .limit(maxK)
      .collect()
    require(rows.nonEmpty,
      s"pqBook: stride-$stride sample of the corpus is empty — no codebook can be seeded")
    val dim = rows.head.getSeq[Double](1).length
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val dsub = dim / m
    val books = Array.tabulate(m) { j =>
      rows.map(_.getSeq[Double](1).slice(j * dsub, (j + 1) * dsub).toArray)
    }
    graft.functions.PqBook(m, dsub, books)
  }

  /** Per-subspace Lloyd refinement of [[pqBook]] with BIT-DETERMINISTIC
    * decimal means — the PQ mirror of [[kmeansCentroidsExact]]. Each
    * iteration: one corpus scan assigns every subvector through the
    * [[graft.functions.PqCodes]] kernel itself (map-side, zero
    * shuffle), then per-(subspace, code, dim) means accumulate as
    * exact decimal(27,6) sums — order-independent, so the refined book
    * is identical across partitionings and replayable. Codewords whose
    * cell is empty keep their previous value (k-means convention).
    * Only (m × ksub × dsub) partial-sum rows shuffle per iteration —
    * dim-table-sized at any corpus scale. On clustered real data this
    * is what turns the crude stride seeds into tight subspace
    * codebooks (lower ADC rank spread → smaller shortlists); the
    * near-isotropic fixture is the worst case and the measured gain
    * there is what `graft.dev.PqProbe --iters` reports. */
  def pqBookRefined(corpus: DataFrame, m: Int, stride: Int, iters: Int,
                    maxK: Int = 256): graft.functions.PqBook = {
    var book = pqBook(corpus, m, stride, maxK)
    // the mean pass indexes subspaces as pos/dsub, which is only the
    // PqCodes assignment kernel's convention when EVERY vector has
    // exactly m·dsub components — a longer vector would index sub ≥ m
    // (out-of-bounds element_at), a shorter one would silently omit
    // the zero-padded dims the distance convention includes. Validate
    // the whole corpus once (one cheap aggregate), not just the first
    // sampled row.
    val lens = corpus.agg(
      min(size(col("vec"))).as("mn"), max(size(col("vec"))).as("mx")).head()
    require(lens.getInt(0) == lens.getInt(1) && lens.getInt(0) == book.m * book.dsub,
      s"pqBookRefined: corpus vector lengths [${lens.getInt(0)}, ${lens.getInt(1)}] " +
        s"must all equal m*dsub = ${book.m * book.dsub}")
    for (_ <- 0 until iters) {
      val dsub = book.dsub
      val assigned = corpus.select(
        col("vec").cast("array<double>").as("v"),
        graft.functions.PqOps.codes(col("vec"), book).as("codes"))
      val means = assigned
        .select(posexplode(col("v")).as(Seq("pos", "x")), col("codes"))
        .select(
          (col("pos") / dsub).cast("int").as("sub"),
          pmod(col("pos"), lit(dsub)).cast("int").as("t"),
          col("x"),
          element_at(col("codes"), (col("pos") / dsub).cast("int") + 1).as("code"))
        .groupBy("sub", "code", "t")
        .agg((sum(expr("cast(round(x, 6) AS decimal(27, 6))")).cast("double")
          / count(lit(1))).as("mean"))
        .collect()
        .map(r => ((r.getInt(0), r.getInt(1), r.getInt(2)), r.getDouble(3)))
        .toMap
      book = graft.functions.PqBook(book.m, dsub,
        Array.tabulate(book.m) { j =>
          Array.tabulate(book.ksub) { c =>
            Array.tabulate(dsub) { t =>
              means.getOrElse(((j, c, t)), book.books(j)(c)(t))
            }
          }
        })
    }
    book
  }

  /** Encode the corpus to PQ codes + exact norm, entirely MAP-SIDE
    * (one scan-fused codegen projection, zero shuffle — the
    * [[ivfAssign]] discipline). The stored `n_norm` lets ADC rank by
    * approximate COSINE (adc_dot / (q_norm · n_norm)) instead of raw
    * dot, matching the engine's cosine retrieval contract. At 100 TB
    * this materialized table is the only thing the per-query scoring
    * pass reads: m ints + one double per vector vs d floats. */
  def pqEncode(corpus: DataFrame, book: graft.functions.PqBook): DataFrame =
    corpus.select(
      col("id").as("n_id"),
      graft.functions.PqOps.codes(col("vec"), book).as("codes"),
      norm(col("vec")).as("n_norm"))

  /** PQ-ADC top-k with EXACT re-rank: ADC-cosine-rank the encoded
    * corpus per query (codes only — the float corpus is NOT read),
    * keep the top `shortlist` candidates, then join the floats back BY
    * ID for exact scoring of that tiny set. When the shortlist covers
    * the true top-k (machine-checked on the fixtures by
    * RecallGuardSpec, with margin), the output is EXACTLY the
    * brute-force answer — same oracle.
    *
    * Plan shape: queries broadcast; the encoded corpus streams through
    * one codegen ADC projection; ONE exchange ranks (q_id) candidates;
    * the shortlist is carried as BARE ID PAIRS (broadcast-sized even
    * with thousands of queries), so the float corpus streams map-side
    * exactly once for the re-rank. No all-pairs float pass anywhere. */
  def pqTopK(queries: DataFrame, encoded: DataFrame, corpus: DataFrame,
             book: graft.functions.PqBook, k: Int, shortlist: Int): DataFrame = {
    val q = broadcast(queries.select(
      col("id").as("q_id"), col("vec").as("q_vec"), norm(col("vec")).as("q_norm")))
    // MATERIALIZE the code table before the per-query join — not an
    // optimization nicety but the operator's core contract (encode
    // once, scan codes per query batch). Without the barrier,
    // whole-stage codegen DEFERS non-join-key columns into the join's
    // match loop, so graft_pq_codes (m·ksub·dsub mult-adds, ~36 µs at
    // m=32/ksub=256) re-evaluates PER CANDIDATE ROW instead of per
    // corpus row — measured 31 s vs ~2 s on the 8M-candidate synth
    // step. Join KEYS are evaluated eagerly (that is why ivfAssign's
    // cell column never hits this); payload columns are not.
    val shortIds = encoded.localCheckpoint(false)
      .join(q, col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("n_id"),
        (graft.functions.PqOps.adc(col("q_vec"), col("codes"), book)
          / (col("q_norm") * col("n_norm"))).as("adc"))
      // ADC ties (identical codes) break on n_id — deterministic
      .withColumn("arank", row_number().over(Window.partitionBy("q_id").orderBy(desc("adc"), col("n_id"))))
      .filter(col("arank") <= shortlist)
      .select("q_id", "n_id")
    broadcast(shortIds)
      .join(corpus.select(col("id").as("n_id"), col("vec").as("n_vec")), Seq("n_id"))
      .join(q, Seq("q_id"))
      // exact sims projected ahead of the top-k window (same shuffle
      // rule as the ADC stage: never sort vectors, only scalars)
      .select(col("q_id"), col("n_id"),
        round(dot(col("q_vec"), col("n_vec")) / (col("q_norm") * norm(col("n_vec"))), 6).as("sim"))
      .withColumn("rank", row_number().over(Window.partitionBy("q_id").orderBy(desc("sim"), col("n_id"))).cast("long"))
      .filter(col("rank") <= k)
      .select("q_id", "rank", "n_id", "sim")
  }

  /** IVF + PQ retrieval (the full Jégou-2011 IVFADC production shape):
    * the corpus is cell-partitioned map-side ([[ivfAssign]]) AND
    * PQ-encoded map-side in the same scan projection; per query, only
    * the `nprobe` nearest cells' CODES are ADC-scored, the shortlist
    * re-ranks exactly. This composes both scale levers: IVF cuts the
    * candidate count ~nlist/nprobe, PQ cuts candidate bytes ~32× — at
    * 100 TB the scoring pass reads a few probed cells of byte codes.
    *
    * Exactness on the fixtures composes from the two measured bounds:
    * the probed cells contain every true top-k neighbor (the IVF probe
    * fraction), and a covered neighbor's ADC rank within the PROBED
    * candidate set is at most its global ADC rank (dropping unprobed
    * competitors can only improve it), so the [[pqTopK]] shortlist
    * fraction still covers — both margins machine-checked by
    * RecallGuardSpec. */
  def ivfPqTopK(queries: DataFrame, corpus: DataFrame, centroids: DataFrame,
                book: graft.functions.PqBook, k: Int, nprobe: Int, shortlist: Int): DataFrame = {
    val cents = collectCentroids(centroids)
    // one corpus scan: cell + codes + norm, all map-side expressions —
    // MATERIALIZED before the probe join (see pqTopK: codegen defers
    // non-key columns into the join loop, re-running graft_pq_codes per
    // candidate row without the barrier; `cell` is safe only because
    // join keys evaluate eagerly)
    val encodedCells = corpus.select(
      graft.functions.NearestCells.topCells(col("vec"), cents, 1).getItem(0).as("cell"),
      col("id").as("n_id"),
      graft.functions.PqOps.codes(col("vec"), book).as("codes"),
      norm(col("vec")).as("n_norm"))
      .localCheckpoint(false)
    val probes = queries
      .select(col("id").as("q_id"), col("vec").as("q_vec"), norm(col("vec")).as("q_norm"))
      .withColumn("cell", explode(graft.functions.NearestCells.topCells(col("q_vec"), cents, nprobe)))
    // (q_id, n_id, adc) projection ahead of the window — see pqTopK
    val shortIds = probes
      .join(encodedCells, Seq("cell"))
      .filter(col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("n_id"),
        (graft.functions.PqOps.adc(col("q_vec"), col("codes"), book)
          / (col("q_norm") * col("n_norm"))).as("adc"))
      .withColumn("arank", row_number().over(Window.partitionBy("q_id").orderBy(desc("adc"), col("n_id"))))
      .filter(col("arank") <= shortlist)
      .select("q_id", "n_id")
    val q = broadcast(queries.select(
      col("id").as("q_id"), col("vec").as("q_vec"), norm(col("vec")).as("q_norm")))
    broadcast(shortIds)
      .join(corpus.select(col("id").as("n_id"), col("vec").as("n_vec")), Seq("n_id"))
      .join(q, Seq("q_id"))
      // exact sims projected ahead of the top-k window (same shuffle
      // rule as the ADC stage: never sort vectors, only scalars)
      .select(col("q_id"), col("n_id"),
        round(dot(col("q_vec"), col("n_vec")) / (col("q_norm") * norm(col("n_vec"))), 6).as("sim"))
      .withColumn("rank", row_number().over(Window.partitionBy("q_id").orderBy(desc("sim"), col("n_id"))).cast("long"))
      .filter(col("rank") <= k)
      .select("q_id", "rank", "n_id", "sim")
  }

  /** SSL-prototypes data pruning (Sorscher et al., "Beyond neural
    * scaling laws", NeurIPS 2022): rank every vector within its
    * cluster by cosine to the cluster centroid — the MOST prototypical
    * (closest) examples are the most redundant on large corpora — and
    * mark the top `dropFrac` of each cluster for removal.
    *
    * Returns `(id, cell, rank, cos6, kept)`: rank 1 = most
    * prototypical; `kept` = rank past the cluster's drop cutoff
    * (`floor(cluster_size * dropFrac)`).
    *
    * Scale shape: assignment is the map-side [[ivfAssign]] kernel
    * (zero shuffle); the centroid re-join for the cosine is a
    * broadcast (dim-table) join; ranking is ONE exchange keyed by
    * cell. Cluster sizes are corpus_size/nlist on average — pick nlist
    * so cells fit a partition (same knob as IVF retrieval), and skew
    * is bounded by the true cluster structure, not by a join blowup. */
  def prototypeRanks(corpus: DataFrame, centroids: DataFrame, dropFrac: Double): DataFrame = {
    require(dropFrac >= 0.0 && dropFrac < 1.0, s"dropFrac must be in [0, 1), got $dropFrac")
    val assigned = ivfAssign(corpus, centroids)
    val byCell = Window.partitionBy("cell")
    val byCos = byCell.orderBy(desc("cos"), col("n_id"))
    assigned
      .join(broadcast(centroids.select(col("c_id").as("cell"), col("c_vec"))), Seq("cell"))
      .withColumn("cos",
        dot(col("n_vec"), col("c_vec")) / (norm(col("n_vec")) * norm(col("c_vec"))))
      .withColumn("rank", row_number().over(byCos).cast("long"))
      .withColumn("n_in_cell", count(lit(1)).over(byCell))
      .select(
        col("n_id").as("id"),
        col("cell"),
        col("rank"),
        round(col("cos"), 6).as("cos6"),
        (col("rank") > floor(col("n_in_cell") * dropFrac)).as("kept"))
  }
}
