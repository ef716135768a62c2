package graft

import graft.text.MinHashLsh
import graft.ml.AnnSearch
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Plan-shape regression guards for the dedup/ANN scale paths: the
  * no-all-pairs property (VERDICT r2 item 7). These assert on the
  * PHYSICAL plan, so a refactor that silently reintroduces a cartesian
  * or an unbounded shuffle fails the suite, not just the SCALE.md prose.
  */
class PlanShapeSpec extends SparkSpec {

  private def physicalPlan(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  private def docsDf: DataFrame =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  private def embsDf: DataFrame =
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id").as("id"), expr("transform(embedding, x -> cast(x as double))").as("vec"))

  test("minhash-LSH candidate generation never goes all-pairs") {
    val pairs = MinHashLsh.verifiedPairs(docsDf, "doc_id", "text", tau = 0.8)
    val plan = physicalPlan(pairs)
    assert(!plan.contains("CartesianProduct"), s"cartesian in LSH plan:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"BNLJ in LSH plan:\n$plan")
    // every exchange must be on a high-cardinality key (doc_id,
    // band/bucket, candidate pair). The signature subplan appears once
    // per join side when the sides broadcast, so the structural bound
    // is 2×2 signature exchanges + 1 candidate dedup.
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(shuffles <= 5, s"LSH plan grew to $shuffles hash exchanges:\n$plan")
  }

  test("simhash near-pairs: capped equi-join, never all-pairs") {
    import graft.text.SimHash
    val sigs = SimHash.signatures(docsDf, "doc_id", "text")
    val plan = physicalPlan(SimHash.nearPairs(sigs, "doc_id", maxDist = 3, maxBlock = 1000))
    assert(!plan.contains("CartesianProduct"), s"cartesian in simhash plan:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"BNLJ in simhash plan:\n$plan")
    // the maxBlock skew cap must survive planning: a count window over
    // the (block, value) groups ahead of the self-join
    assert(plan.contains("Window"), s"hot-block cap window missing from simhash plan:\n$plan")
  }

  test("IVF centroid assignment is map-side: zero exchanges, zero joins") {
    // VERDICT r3: the assignment pass touches every corpus row, so ANY
    // exchange here is nlist-amplified shuffle volume at 100 TB. The
    // map-side NearestCells form must produce a pure scan + project.
    val corpus = embsDf
    val centroids = AnnSearch.strideCentroids(corpus, 8)
    val assigned = AnnSearch.ivfAssign(corpus, centroids)
    val plan = physicalPlan(assigned)
    assert(!plan.contains("Exchange"), s"exchange in assignment plan:\n$plan")
    assert(!plan.contains("Join"), s"join in assignment plan:\n$plan")
    assert(!plan.contains("Window"), s"window in assignment plan:\n$plan")
    // and it stays inside whole-stage codegen (the `*(n)` prefix)
    assert(plan.contains("*("), s"assignment fell out of codegen:\n$plan")
  }

  test("IVF top-k probes cells via equi-join, never a corpus nested-loop") {
    val corpus = embsDf
    val centroids = AnnSearch.strideCentroids(corpus, 8)
    val assigned = AnnSearch.ivfAssign(corpus, centroids)
    val queries = corpus.filter(pmod(col("id"), lit(50)) === 0)
    val topk = AnnSearch.ivfTopK(queries, assigned, centroids, k = 5, nprobe = 3)
    val plan = physicalPlan(topk)
    assert(!plan.contains("CartesianProduct"), s"cartesian in IVF plan:\n$plan")
    // round 4: assignment AND probe selection are map-side NearestCells
    // expressions — no nested-loop join of any kind remains
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"IVF plan regressed to a nested-loop join:\n$plan")
    assert(plan.contains("SortMergeJoin") || plan.contains("BroadcastHashJoin") ||
      plan.contains("ShuffledHashJoin"), s"no equi-join on cell in IVF plan:\n$plan")
  }

  test("embedding near-pairs: chunk-pair-keyed equi-joins, no cartesian, no distinct pass") {
    val corpus = embsDf
    val centroids = AnnSearch.strideCentroids(corpus, 25)
    val pairs = AnnSearch.cosineNearPairs(corpus, centroids, tau = 0.4)
    val plan = physicalPlan(pairs)
    assert(!plan.contains("CartesianProduct"), s"cartesian in near-pairs plan:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"near-pairs chunk-pair join regressed to a nested-loop join:\n$plan")
    val equi = plan.contains("BroadcastHashJoin") || plan.contains("ShuffledHashJoin") ||
      plan.contains("SortMergeJoin")
    assert(equi, s"no equi-join in near-pairs plan:\n$plan")
    // the compiled kernel emits each unordered pair exactly once, so
    // the old candidate-dedup exchange must NOT reappear
    assert(!plan.contains("HashAggregate(keys=[a"),
      s"a distinct over emitted pairs crept back into the closure:\n$plan")
    // and the scoring kernel itself must be in the plan (a refactor to
    // a per-candidate row join would silently repay ~100ns/candidate)
    assert(plan.contains("graft_cell_pair_sims"),
      s"CellPairSims kernel missing — closure degraded to per-candidate rows:\n$plan")
  }

  test("closure candidate generation is an ENGINE join over the geometry table, expanded by explode(sequence)") {
    // r10's one perf weak: candidate cell pairs were a driver
    // for-comprehension (O(nlist²·dim) single-threaded, materialized
    // before the maxChunkPairs guard). The r11 form must plan as a
    // broadcast nested-loop join of the nlist-row geometry table on
    // the triangle-bound predicate, with the chunk-pair expansion a
    // Generate (explode of sequence) — the driver holds no per-pair
    // state at any nlist. This pins the pre-checkpoint subplan the
    // final (equi-join-only) scoring plan no longer shows.
    val corpus = embsDf
    val centroids = AnnSearch.strideCentroids(corpus, 25)
    val assigned = AnnSearch.ivfAssign(corpus, centroids)
      .select(col("cell"), col("n_id"),
        col("n_vec").cast("array<double>").as("n_vec"),
        AnnSearch.norm(col("n_vec")).as("n_nrm"))
    val geom = AnnSearch.closureGeomDf(assigned, centroids, chunkTarget = 512L)
    val cand = AnnSearch.closureCandidates(geom, tau = 0.4)
    val candPlan = physicalPlan(cand)
    assert(candPlan.contains("BroadcastNestedLoopJoin"),
      s"candidate generation is not an engine-side nested-loop join over the geometry table:\n$candPlan")
    assert(!candPlan.contains("CartesianProduct"),
      s"candidate join degenerated to an unbroadcast cartesian:\n$candPlan")
    val chunkPlan = physicalPlan(AnnSearch.closureChunkPairs(cand))
    assert(chunkPlan.contains("Generate"),
      s"chunk-pair expansion is not an engine-side explode:\n$chunkPlan")
    // and the geometry side the join broadcasts is the nlist-row
    // aggregate, not the corpus (one HashAggregate keyed by cell)
    assert(physicalPlan(geom).contains("LocalTableScan") || physicalPlan(geom).contains("Scan ExistingRDD"),
      s"geometry table is not materialized ahead of the candidate join:\n${physicalPlan(geom)}")
  }

  test("near-pairs degrade path: past the broadcast threshold the pair join shuffle-hashes by chunk key, same result") {
    // fixtures always fit the 64 MB default, so the degrade branch
    // would otherwise ship untested; force it and pin BOTH the plan
    // (hash join on the (cell, chunk) keys, nothing nested-loop) and
    // exact result equality with the broadcast path.
    val corpus = embsDf
    val centroids = AnnSearch.strideCentroids(corpus, 25)
    val key = "spark.graft.nearpairs.broadcastAssignedMaxBytes"
    val fast = AnnSearch.cosineNearPairs(corpus, centroids, tau = 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted.toSeq
    spark.conf.set(key, "1")
    try {
      val degraded = AnnSearch.cosineNearPairs(corpus, centroids, tau = 0.4)
      val plan = physicalPlan(degraded)
      assert(plan.contains("ShuffledHashJoin"),
        s"degrade path did not plan a shuffled hash join:\n$plan")
      assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
        s"degrade path degenerated to a nested loop:\n$plan")
      val slow = degraded.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted.toSeq
      assert(slow == fast, "shuffle-hash degrade path diverged from the broadcast path")
    } finally spark.conf.unset(key)
  }

  test("k-means-refined IVF keeps equi-join shape and matches BF top-k recall bound") {
    val corpus = embsDf
    val centroids = AnnSearch.kmeansCentroids(corpus, stride = 20, iters = 2)
    val assigned = AnnSearch.ivfAssign(corpus, centroids)
    val queries = corpus.filter(pmod(col("id"), lit(50)) === 0)
    // the synthetic embeddings are near-isotropic (no cluster structure),
    // so IVF pruning is at its worst case here: nprobe 16 of ~50 cells
    // recovers most — not all — true neighbors. On clustered corpora the
    // same pipeline reaches high recall at nprobe ≪ nlist.
    val topk = AnnSearch.ivfTopK(queries, assigned, centroids, k = 5, nprobe = 16)
    val plan = physicalPlan(topk)
    assert(!plan.contains("CartesianProduct"), s"cartesian in kmeans-IVF plan:\n$plan")
    val bf = AnnSearch.bfTopK(queries, corpus, k = 5)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    val ivf = topk.collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    val hits = bf.count { case (key, nId) => ivf.get(key).contains(nId) }
    val recall = hits.toDouble / bf.size
    assert(recall >= 0.85, s"kmeans-IVF recall $recall below bound (nprobe=16/nlist~50)")
  }

  test("acceptance sparse pipeline shuffles ONLY the per-event aggregate") {
    // the 100-TB contract of the flagship path: the particle table
    // streams through trig + inline 4-face fan-out + broadcast grid
    // join map-side; the single exchange carries one partial-aggregated
    // row per hit event. Rect side must broadcast, never sort-merge.
    import spark.implicits._
    val particles = spark.read.parquet("/root/repo/fixtures/particles_seed42.parquet")
    val rects = Seq(
      (0, 10.0, 60.0, 10.0, 40.0),
      (1, -60.0, -10.0, 10.0, 40.0)
    ).toDF("face", "ax1", "ax2", "ay1", "ay2")
    val sparse = graft.pipelines.Acceptance.hitCounts(spark, particles, rects)
    val plan = physicalPlan(sparse)
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(shuffles == 1, s"acceptance plan has $shuffles exchanges, want 1:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"rect side not broadcast:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"layer fan-out degenerated to BNLJ (should be inline Generate):\n$plan")
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast grid join:\n$plan")
  }

  test("shuffled-cell spatial join: exchanges on cell keys, no BNLJ, equals broadcast path") {
    // The large-rect-side plan (VERDICT r6 item 3): at 100× sensor
    // counts the broadcast stops fitting; broadcastRects = false must
    // shuffle BOTH sides on the grid-cell key into a hash equi-join
    // that returns the identical hit set.
    import graft.ops.SpatialJoin
    import spark.implicits._
    val points = spark.read.parquet("/root/testdata/sf0.001/customer.parquet").select(
      col("c_custkey"),
      col("c_acctbal").as("px"),
      (pmod(col("c_custkey") * 37, lit(2000)) - 1000).cast("double").as("py"))
    // ×100 the rect side: replicate each supplier rect with jittered
    // offsets so the blown-up table isn't just duplicate keys
    val rects = spark.read.parquet("/root/testdata/sf0.001/supplier.parquet")
      .withColumn("rep", explode(sequence(lit(0L), lit(99L))))
      .select(
        (col("s_suppkey") * 100 + col("rep")).as("s_suppkey"),
        (col("s_acctbal") - 40 + col("rep")).as("ax1"),
        (col("s_acctbal") + 40 + col("rep")).as("ax2"),
        ((pmod(col("s_suppkey") * 97 + col("rep") * 13, lit(2000)) - 1000).cast("double") - 60).as("ay1"),
        ((pmod(col("s_suppkey") * 97 + col("rep") * 13, lit(2000)) - 1000).cast("double") + 60).as("ay2"))
    val shuffled = SpatialJoin.hitJoin(points, rects, Seq.empty, cell = 100.0,
      broadcastRects = false)
    val plan = physicalPlan(shuffled)
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"BNLJ in shuffled spatial plan:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"cartesian in shuffled spatial plan:\n$plan")
    assert("Exchange hashpartitioning\\((?:[^)]*\\b)?cx".r.findFirstIn(plan).isDefined,
      s"no cell-key exchange in shuffled spatial plan:\n$plan")
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
      s"no shuffle equi-join in plan:\n$plan")
    val a = shuffled.select("c_custkey", "s_suppkey").collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val b = SpatialJoin.hitJoin(points, rects, Seq.empty, cell = 100.0)
      .select("c_custkey", "s_suppkey").collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(a.nonEmpty && (a.toSeq == b.toSeq), s"shuffled/broadcast hit sets differ: ${a.length} vs ${b.length}")
  }

  test("sessionize and o6_runs shuffle exactly once, keyed by user_id") {
    // VERDICT r3 item 7: both queries window over partitionBy(user_id) —
    // a high-cardinality key, so ONE exchange is the contract. The
    // downstream groupBy keys extend user_id, so hashpartitioning(user_id)
    // already satisfies their distribution; a refactor that globalizes
    // the window (empty partitionBy → SinglePartition) or re-keys the
    // aggregate would change this count and must fail here.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    try {
      for (q <- Seq("sessionize", "o6_runs")) {
        val df = SparkEntry.queries(q)(spark, "/root/testdata/sf0.001")
        val plan = physicalPlan(df)
        val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).length
        assert(shuffles == 1, s"$q plan has $shuffles hash exchanges, want 1:\n$plan")
        assert(!plan.contains("Exchange SinglePartition"),
          s"$q window degenerated to a global single-partition sort:\n$plan")
      }
    } finally spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
  }

  test("salted aggregation: two exchanges, exact equality with the plain groupBy") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    try {
      val events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      val cents = floor(col("value") * 100 + 0.5).cast("long")
      val salted = graft.ops.SaltedAgg.countSum(
        events, col("event_type"), cents, col("user_id"), salts = 16)
      // plan: wide exchange on (k, salt), tiny combine on k — exactly 2
      val plan = physicalPlan(salted)
      val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).length
      assert(shuffles == 2, s"salted agg has $shuffles exchanges, want 2:\n$plan")
      val got = salted.collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      val plain = events.groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum(cents).as("s"))
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(got == plain, "salted aggregate diverged from plain groupBy")
    } finally spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
  }

  test("decontamination broadcasts the probe grams; no sort-merge of the corpus stream") {
    // the benchmark gram set is small at any corpus scale — the corpus
    // gram stream must join it map-side. A SortMergeJoin here would
    // shuffle every corpus gram at 100 TB.
    val df = SparkEntry.queries("decontaminate")(spark, "/root/testdata/sf0.001")
    val plan = physicalPlan(df)
    assert(plan.contains("BroadcastHashJoin"), s"probe grams not broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"corpus gram stream shuffled for the join:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"non-equi join in decontamination plan:\n$plan")
  }

  test("quantized IVF keeps the map-side assignment and equi-join probe shape") {
    val df = SparkEntry.queries("ann_topk_ivf_q8")(spark, "/root/testdata/sf0.001")
    val plan = physicalPlan(df)
    assert(!plan.contains("CartesianProduct"), s"cartesian in q8-IVF plan:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"q8-IVF probe selection regressed to a nested-loop join:\n$plan")
    assert(plan.contains("SortMergeJoin") || plan.contains("BroadcastHashJoin") ||
      plan.contains("ShuffledHashJoin"), s"no equi-join on cell in q8-IVF plan:\n$plan")
  }

  test("PQ encode is map-side scan-fused; re-rank joins floats by id equi-join only") {
    val corpus = embsDf
    val book = AnnSearch.pqBook(corpus, m = 32, stride = 10)
    // encode: pure scan + codegen projection — any exchange here would
    // be re-paid on every corpus materialization at 100 TB
    val encPlan = physicalPlan(AnnSearch.pqEncode(corpus, book))
    assert(!encPlan.contains("Exchange"), s"exchange in PQ encode plan:\n$encPlan")
    assert(!encPlan.contains("Join"), s"join in PQ encode plan:\n$encPlan")
    assert(encPlan.contains("*("), s"PQ encode fell out of codegen:\n$encPlan")

    // full retrieval: the ADC stage's query join may be a broadcast
    // theta-join (query side is broadcast-small, the corpus side is the
    // CODES table — same shape as the bf baseline), but the float
    // corpus must come back ONLY through the n_id equi-join, and
    // nothing may go cartesian
    val queries = corpus.filter(pmod(col("id"), lit(50)) === 0)
    val encoded = AnnSearch.pqEncode(corpus, book)
    val plan = physicalPlan(
      AnnSearch.pqTopK(queries, encoded, corpus, book, k = 5, shortlist = 50))
    assert(!plan.contains("CartesianProduct"), s"cartesian in PQ retrieval plan:\n$plan")
    assert(plan.contains("BroadcastHashJoin") || plan.contains("SortMergeJoin") ||
      plan.contains("ShuffledHashJoin"), s"no equi-join for the PQ re-rank:\n$plan")
  }

  test("filter and projection push down to the parquet scan") {
    val q = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .filter(col("l_quantity") > 30.0)
      .select("l_orderkey", "l_quantity")
    val scan = q.queryExecution.executedPlan.toString
      .linesIterator.find(_.contains("FileScan")).getOrElse("")
    assert(scan.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,30.0)]"),
      s"filter not pushed: $scan")
    assert(scan.contains("ReadSchema: struct<l_orderkey:bigint,l_quantity:double>"),
      s"columns not pruned: $scan")
  }
}
