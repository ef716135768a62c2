package graft

import graft.pipelines.{Acceptance, Layouts}
import org.apache.spark.sql.functions._

/** J1/J2 flagship goldens (fixtures/acceptance_golden.json, numpy-seed-42
  * particle fixture): exact n_hits distribution over 1e6 events × 4 faces.
  */
class AcceptanceSpec extends SparkSpec {

  test("seed-42 fixture reproduces the reference n_hits distribution exactly") {
    val particles = spark.read.parquet("fixtures/particles_seed42.parquet")
    val sensors = Layouts.faceSensors(spark)
    val nhits = Acceptance.nHits(spark, particles, sensors).cache()

    val hist = nhits.groupBy("n_hits").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // golden: {0:276620, 1:116772, 2:577514, 3:28714, 4:380}
    assert(hist == Map(0L -> 276620L, 1L -> 116772L, 2L -> 577514L, 3L -> 28714L, 4L -> 380L))

    val s = Acceptance.stats(nhits).head()
    assert(math.abs(s.getDouble(0) - 1.359462) < 1e-9) // BASELINE.md: 1.3595
    assert(math.abs(s.getDouble(1) - 0.72338) < 1e-9)  // frac ≥1: 0.7234
    assert(math.abs(s.getDouble(2) - 0.606608) < 1e-9) // frac ≥2: 0.6066
    nhits.unpersist()
  }

  test("generated particles give statistically consistent acceptance") {
    val particles = Acceptance.generateParticles(spark, 100000)
    val sensors = Layouts.faceSensors(spark)
    val s = Acceptance.stats(Acceptance.nHits(spark, particles, sensors)).head()
    // ±0.01 at 1e5 events (σ ≈ 0.003)
    assert(math.abs(s.getDouble(0) - 1.3595) < 0.012)
  }

  test("sparse path reproduces dense results with no particle-side shuffle") {
    val particles = Acceptance.generateParticles(spark, 50000)
    val sensors = Layouts.faceSensors(spark)
    val sparse = Acceptance.hitCounts(spark, particles, sensors)
    // plan: exactly one hash-partition exchange (the per-event hit agg);
    // the particle table itself is never exchanged (broadcast join only)
    val plan = sparse.queryExecution.executedPlan.toString()
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(shuffles <= 1, s"expected at most 1 shuffle in the sparse plan, got $shuffles:\n$plan")
    // values: sparse stats == dense stats
    val n = particles.count()
    val s1 = Acceptance.statsSparse(spark, sparse, n).head()
    val s2 = Acceptance.stats(Acceptance.nHits(spark, particles, sensors)).head()
    assert(s1.getDouble(0) == s2.getDouble(0) && s1.getDouble(1) == s2.getDouble(1) && s1.getDouble(2) == s2.getDouble(2))
    // profile: binned-denominator formulation == dense profile
    val p1 = Acceptance.etaProfileSparse(particles, sparse).orderBy("bin")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    val p2 = Acceptance.etaProfile(Acceptance.nHits(spark, particles, sensors)).orderBy("bin")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    assert(p1.toSeq == p2.toSeq)
  }

  test("eta profile covers the generation range") {
    val particles = Acceptance.generateParticles(spark, 20000)
    val sensors = Layouts.faceSensors(spark)
    val prof = Acceptance.etaProfile(Acceptance.nHits(spark, particles, sensors))
    assert(prof.count() == 30)
    // acceptance collapses to ~0 at the high-η edge (inside r_inner)
    val byBin = prof.orderBy("bin").collect()
    assert(byBin.head.getDouble(1) > byBin.last.getDouble(1))
  }
}
