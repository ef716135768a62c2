package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Near-duplicate detection via MinHash + banded LSH.
  *
  * Scale design (the whole point): there is NO all-pairs stage anywhere.
  *  1. shingle → one xxhash64 per shingle (map-side),
  *  2. k minhashes per doc = one hash-aggregate over (doc, shingle-hash)
  *     rows (partial aggregation map-side, k `min` columns in one pass),
  *  3. band buckets = arithmetic on the signature array (map-side),
  *  4. candidate pairs = equi-self-join on (band, bucket) — the only
  *     shuffle, keyed by bucket hash; bucket populations are tiny for
  *     non-duplicate data, so the join output is ~#duplicates, not n²,
  *  5. exact word-shingle Jaccard verification only on candidates.
  *
  * On a 1000-executor cluster over 100 TB of documents this is three
  * shuffles total (agg by doc, join by bucket, dedupe pairs), each keyed
  * by high-cardinality hashes — no skew beyond genuine duplicate
  * clusters, which `maxBucket` caps defensively.
  *
  * All hashing is deterministic (index-salted xxhash64), so results are
  * reproducible across runs and partitionings.
  */
object MinHashLsh {

  /** (doc_id, shingle-set) per document, computed in a typed map — one
    * O(words) pass per row. The Catalyst-lambda formulation re-inlines
    * the regex tokenizer into every `element_at` (CollapseProject),
    * re-splitting the text per gram — measured ~10× slower. The string
    * pipeline here replicates the SQL semantics exactly (trim spaces,
    * lower, collapse \s+, split on single space, distinct 3-grams in
    * first-occurrence order), so DuckDB-oracle parity holds. */
  def shingleSets(docs: DataFrame, idCol: String, textCol: String, n: Int = 3): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(col(idCol).cast("long"), col(textCol).cast("string"))
      .as[(Long, String)]
      .map { case (id, text) =>
        val stripped = text.dropWhile(_ == ' ').reverse.dropWhile(_ == ' ').reverse
        val norm = stripped.toLowerCase(java.util.Locale.ROOT).replaceAll("\\s+", " ")
        val toks = norm.split(" ", -1)
        val sh =
          if (toks.length >= n) toks.sliding(n).map(_.mkString(" ")).toArray.distinct
          else Array.empty[String]
        (id, sh)
      }
      .toDF(idCol, "sh")
  }

  /** (doc_id, shingle) exploded rows from a documents table. */
  def shingleRows(docs: DataFrame, idCol: String, textCol: String, n: Int = 3): DataFrame =
    shingleSets(docs, idCol, textCol, n).select(col(idCol), explode(col("sh")).as("shingle"))

  /** MinHash signature table: (doc_id, sig: array<long>) with k entries.
    * One hash-aggregate pass; docs with no shingles are dropped. The k
    * hash functions are xxhash64 salted by the function index (no
    * arithmetic family → no overflow under ANSI mode, and each salt
    * yields an independent permutation-approximation). */
  def signatures(docs: DataFrame, idCol: String, textCol: String, k: Int = 32, n: Int = 3): DataFrame =
    signaturesFromSets(shingleSets(docs, idCol, textCol, n), idCol, k)

  /** Signature table from a precomputed (id, sh) shingle-set table —
    * lets one shingling pass feed both the signature aggregate and the
    * exact-Jaccard verification joins. */
  def signaturesFromSets(sets: DataFrame, idCol: String, k: Int = 32): DataFrame = {
    // hash the shingle STRING once, then derive the k family members by
    // hashing the resulting 8-byte long — ~k× less hashing work per row
    val mins = (0 until k).map { i =>
      min(xxhash64(lit(i), col("h"))).as(s"mh_$i")
    }
    sets
      .select(col(idCol), explode(col("sh")).as("shingle"))
      .withColumn("h", xxhash64(col("shingle")))
      .groupBy(col(idCol))
      .agg(mins.head, mins.tail: _*)
      .select(col(idCol), array((0 until k).map(i => col(s"mh_$i")): _*).as("sig"))
  }

  /** Explode signatures into (doc_id, band, bucket) rows: `bands` bands
    * of `k/bands` rows each; bucket = hash of the band's slice —
    * computed by the codegen [[graft.functions.BandHashes]] primitive
    * (the interpreted HOF + per-band string-join formulation it
    * replaces is semantically identical: equal slices ⇒ equal buckets
    * under either hash, and spurious collisions are removed by exact
    * verification). */
  def bandBuckets(sigs: DataFrame, idCol: String, bands: Int): DataFrame = {
    sigs
      .select(
        col(idCol),
        posexplode(graft.functions.BandHashes.bandHashes(col("sig"), bands))
          .as(Seq("band", "bucket"))
      )
  }

  /** Candidate pairs (a < b) sharing at least one band bucket. The self
    * join is a hash equi-join on (band, bucket); `maxBucket` drops
    * pathological buckets (skew guard for adversarial/degenerate data). */
  def candidatePairs(sigs: DataFrame, idCol: String, bands: Int, maxBucket: Int = 1000): DataFrame = {
    val bb = bandBuckets(sigs, idCol, bands)
    val capped = bb
      .withColumn("bn", count(lit(1)).over(org.apache.spark.sql.expressions.Window.partitionBy("band", "bucket")))
      .filter(col("bn") <= maxBucket)
      .drop("bn")
    val a = capped.select(col(idCol).as("a"), col("band"), col("bucket"))
    val b = capped.select(col(idCol).as("b"), col("band"), col("bucket"))
    a.join(b, Seq("band", "bucket"))
      .filter(col("a") < col("b"))
      .select("a", "b")
      .distinct()
  }

  /** Candidates verified with exact distinct-word-shingle Jaccard ≥ τ.
    * Shingle sets are joined per side (hash equi-joins on doc id). */
  def verifiedPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      tau: Double,
      k: Int = 32,
      bands: Int = 8,
      n: Int = 3
  ): DataFrame = {
    // one shingling pass feeds all three consumers (signature aggregate
    // + both sides of the verification join). localCheckpoint
    // materializes the shingle table to block storage (memory, spilling
    // to disk) — the normalize/tokenize map is the pipeline's dominant
    // per-row cost, so at any scale one pass + storage beats three
    // passes; the table is O(corpus tokens), the same order as the
    // input it derives from.
    val sets = shingleSets(docs, idCol, textCol, n).localCheckpoint(eager = false)
    val sigs = signaturesFromSets(sets, idCol, k)
    val cand = candidatePairs(sigs, idCol, bands)
    cand
      .join(sets.select(col(idCol).as("a"), col("sh").as("sha")), Seq("a"))
      .join(sets.select(col(idCol).as("b"), col("sh").as("shb")), Seq("b"))
      .withColumn(
        "jaccard",
        size(array_intersect(col("sha"), col("shb"))).cast("double") /
          size(array_union(col("sha"), col("shb")))
      )
      .filter(col("jaccard") >= tau)
      .select(col("a"), col("b"), col("jaccard"))
  }

  /** Dedup decision: drop the larger doc id of each verified pair
    * (connected-component-free approximation: keep ids that are never a
    * pair's `b`). Returns the surviving doc ids. For transitive
    * duplicate CLUSTERS use [[components]] and keep min per component. */
  def dedupKeepIds(docs: DataFrame, idCol: String, textCol: String, tau: Double): DataFrame = {
    val drop = verifiedPairs(docs, idCol, textCol, tau).select(col("b").as(idCol)).distinct()
    docs.select(col(idCol)).join(drop, Seq(idCol), "left_anti")
  }

  /** Connected components over the duplicate-pair graph via min-label
    * propagation: each node's label converges to the smallest id in its
    * component. Duplicate clusters have tiny diameters, so a handful of
    * iterations suffice; each iteration is one hash join + aggregate.
    * At petabyte scale, [[componentsStar]] is the drop-in swap — same
    * (id, component) interface, edge-set (not label-table) iteration.
    * Returns (id, component).
    *
    * maxIter bounds the DIAMETER the doubling can cover (~2^maxIter
    * hops), not the usual work: the loop exits on the first no-change
    * round, so converged graphs never pay for the headroom. 20 covers
    * ~10^6-hop chains — r9 found 10 genuinely too small once the
    * embedding-dedup recall fix recovered the full sf0.1 pair set and
    * its largest component's label chain passed 2^10 reach. */
  def components(pairs: DataFrame, maxIter: Int = 20): DataFrame = {
    // materialize the INPUT once before the symmetric union: both
    // union branches read the pair subtree, which for consumers like
    // dedup_embedding is a whole cell-blocked closure — without the
    // barrier it would be computed twice into the edge cache (measured
    // ~5 s doubled at the synth step)
    val p = pairs.select(col("a"), col("b")).localCheckpoint(false)
    // the edge set is STATIC across rounds but joined by dst every
    // round — partition and sort it ONCE before caching (r16): the
    // cached scan reports hashpartitioning(dst)/sorted-by-dst, so each
    // round's sort-merge join moves and sorts only the (changing)
    // label table, never the edges (§2.4: two operations keyed the
    // same way share one exchange; here k rounds share one).
    val edges = p.select(col("a").as("src"), col("b").as("dst"))
      .unionByName(p.select(col("b").as("src"), col("a").as("dst")))
      .repartition(col("dst"))
      .sortWithinPartitions("dst")
      .cache()
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("component", col("id"))
      .cache()
    var changed = 1L
    var i = 0
    while (changed > 0 && i < maxIter) {
      val nbrMin = edges
        .join(labels.select(col("id").as("dst"), col("component").as("nbr_comp")), Seq("dst"))
        .groupBy(col("src").as("id"))
        .agg(min("nbr_comp").as("nbr_min"))
      val stepped = labels
        .join(nbrMin, Seq("id"), "left")
        .select(
          col("id"),
          least(col("component"), coalesce(col("nbr_min"), col("component"))).as("component")
        )
      // Pointer doubling: jump each label to its label's label, so
      // convergence needs O(log diameter) rounds instead of O(diameter).
      // Labels are always node ids, so the self-join on component=id hits.
      // localCheckpoint, not cache: the doubling self-join would
      // otherwise double the LOGICAL plan every round — analysis time
      // grows 2^i and the driver spins. Checkpointing cuts lineage so
      // each round's plan is flat. LAZY (eager=false): the `changed`
      // count below reads every partition of `updated` anyway, so that
      // one action both materializes the checkpoint and answers the
      // convergence test — ONE job wave per round instead of two (the
      // same action-halving the BPE merge loop got in r15; iterative
      // loops at any scale are priced in job waves).
      val updated = stepped
        .join(
          stepped.select(col("id").as("component"), col("component").as("pc")),
          Seq("component"), "left")
        .select(col("id"), coalesce(col("pc"), col("component")).as("next"))
        .localCheckpoint(false)
      changed = updated
        .join(labels.withColumnRenamed("component", "prev"), Seq("id"))
        .filter(col("next") =!= col("prev")).count()
      val old = labels
      labels = updated.select(col("id"), col("next").as("component"))
      old.unpersist()
      i += 1
    }
    edges.unpersist()
    if (changed > 0)
      throw new IllegalStateException(
        s"components() did not converge in $maxIter pointer-doubling rounds " +
          "(graph diameter > 2^maxIter); raise maxIter")
    labels
  }

  /** Connected components via ALTERNATING STAR CONTRACTION (the
    * large-star / small-star algorithm of Kiveris et al., "Connected
    * Components in MapReduce and Beyond", SoCC'14) — the PB-scale
    * alternative to [[components]], behind the same (id, component)
    * interface.
    *
    * Why it scales where label propagation strains: the state is the
    * EDGE LIST itself (monotonically contracting toward one star per
    * component), not a separate label table joined against a static
    * edge set every round. Each round is two self-contained
    * group-by-node aggregates over the current edges; edge count never
    * grows above the input, shrinks geometrically on high-diameter
    * graphs, and converges in O(log²) rounds without ever materializing
    * per-node neighbor lists on the driver.
    *
    *  - large-star(u): every neighbor v > u re-points to
    *    m = min(N(u) ∪ {u}) — emits (v, m).
    *  - small-star(u), on edges oriented large→small so N(u) < u:
    *    u and all its neighbors re-point to m = min(N(u)) — emits
    *    (u, m) and (v, m) for the other small neighbors.
    *
    * Both phases preserve connectivity and never raise a node's
    * reachable minimum; on convergence the edge set IS the component
    * map (u → component-min). `localCheckpoint` per round cuts lineage
    * (same driver-side 2^i analysis-cost trap as pointer doubling —
    * see [[components]]). Returns (id, component) with one row per
    * node of the input pair graph, including star centers mapping to
    * themselves. */
  /** Order-independent set checksum of a distinct (u, v) edge table:
    * (count, xor) of the per-edge xxhash64 — one aggregate, no shuffle
    * beyond the final combine, overflow-free under ANSI mode. Equal
    * sets always checksum equal, so a mismatch proves change; a
    * (~2^-64) spurious match only triggers the caller's exact diff. */
  private def checksum(edges: DataFrame): (Long, Long) = {
    val r = edges
      .select(xxhash64(col("u"), col("v")).as("h"))
      .agg(count(lit(1)), expr("bit_xor(h)"))
      .head()
    (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
  }

  def componentsStar(pairs: DataFrame, maxIter: Int = 25): DataFrame = {
    // same input barrier as [[components]]: the node union and the
    // canonical-orientation pass both read the pair subtree
    val p = pairs.select(col("a"), col("b")).localCheckpoint(false)
    val nodes = p.select(col("a").as("id"))
      .unionByName(p.select(col("b").as("id"))).distinct()
    // canonical orientation: u > v (self-pairs dropped). LAZY
    // checkpoint: the initial checksum below reads every partition, so
    // one action materializes AND fingerprints the edge set.
    var edges = p
      .select(greatest(col("a"), col("b")).as("u"), least(col("a"), col("b")).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
      .localCheckpoint(false)
    var converged = false
    var i = 0
    // no INITIAL checksum action (r16): start from a sentinel and let
    // round 1's checksum double as the edge materialization. An
    // already-converged input then costs one extra (no-op) round
    // instead of every call paying an extra job wave up front.
    var sumOld: Option[(Long, Long)] = None
    while (!converged && i < maxIter) {
      // large-star over the UNDIRECTED neighborhood: node n, neighbor w
      val nbrs = edges.select(col("u").as("n"), col("v").as("w"))
        .unionByName(edges.select(col("v").as("n"), col("u").as("w")))
      val withMin = nbrs
        .withColumn("m", min(least(col("w"), col("n"))).over(
          org.apache.spark.sql.expressions.Window.partitionBy("n")))
      // no distinct() here: the edge set is distinct each round, so
      // large-star emits exactly one row per undirected edge (only the
      // smaller endpoint n passes w > n), and the handful of (w, m)
      // collisions from different n with the same minimum neither
      // change small-star's per-n min nor survive small's own distinct
      // — dropping the pass removes one full edge-set exchange per
      // round (§2.4: remove shuffles outright).
      val large = withMin
        .filter(col("w") > col("n"))
        .select(col("w").as("u"), col("m").as("v"))
        .filter(col("u") =!= col("v"))
      // small-star on the large→small orientation: all neighbors < u
      val smallNbrs = large.select(col("u").as("n"), col("v").as("w"))
      val sMin = smallNbrs
        .withColumn("m", min(col("w")).over(
          org.apache.spark.sql.expressions.Window.partitionBy("n")))
      // LAZY checkpoint: the checksum action below reads every
      // partition of `small`, materializing the checkpoint in the same
      // job — one wave per round instead of two (see [[components]]).
      val small = sMin.select(col("n").as("u"), col("m").as("v"))
        .unionByName(
          sMin.filter(col("w") =!= col("m")).select(col("w").as("u"), col("m").as("v")))
        .filter(col("u") =!= col("v"))
        .distinct()
        .localCheckpoint(false)
      // converged when the round was a no-op on the edge set. Detected
      // with a SET CHECKSUM over the freshly checkpointed edges — one
      // cheap scan-and-aggregate (no join, no shuffle of the edge set).
      // The first checksum match is then CONFIRMED EXACTLY with the
      // full outer diff — paid once at the fixpoint, not every round —
      // so convergence remains exact, not probabilistic.
      val sumNew = checksum(small)
      if (sumOld.contains(sumNew)) {
        val diff = edges.withColumn("l", lit(1))
          .join(small.withColumn("r", lit(1)), Seq("u", "v"), "full_outer")
          .filter(col("l").isNull || col("r").isNull)
          .count()
        converged = diff == 0
      }
      sumOld = Some(sumNew)
      edges = small
      i += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"componentsStar() did not converge in $maxIter large/small-star rounds")
    // the converged edge set is a union of stars: u → component minimum;
    // centers (and any isolated canonical nodes) map to themselves.
    // Lazily checkpointed: every consumer reads this node-sized table
    // at least once, and the capstones' keep/drop pattern reads it
    // TWICE (labels ⋈ min-per-component) — the barrier makes the
    // second read a block fetch instead of a re-run of the node-union
    // + final join.
    nodes
      .join(edges.select(col("u").as("id"), col("v").as("comp")), Seq("id"), "left")
      .select(col("id"), coalesce(col("comp"), col("id")).as("component"))
      .localCheckpoint(false)
  }

  /** Cluster-aware dedup: keep the smallest doc id of every duplicate
    * component (plus all unpaired docs). */
  def dedupKeepIdsTransitive(docs: DataFrame, idCol: String, textCol: String, tau: Double): DataFrame = {
    val pairs = verifiedPairs(docs, idCol, textCol, tau)
    val comp = components(pairs)
    val keepInClusters = comp.groupBy("component").agg(min("id").as(idCol)).select(idCol)
    val clustered = comp.select(col("id").as(idCol))
    val unpaired = docs.select(col(idCol)).join(clustered, Seq(idCol), "left_anti")
    unpaired.unionByName(keepInClusters)
  }
}
