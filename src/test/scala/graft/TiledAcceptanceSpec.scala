package graft

import graft.geom.Exclusion
import graft.ops.DeeTiling
import graft.pipelines.{Acceptance, Layouts}
import org.apache.spark.sql.functions._

/** Complete §3.1 chain golden: exclusion geometry → tiling → sensors →
  * 4-layer spatial join, against a fresh seeded reference run over its
  * own tiled dees (fixtures/tiled_acceptance_seed42.parquet, which
  * carries the reference's per-event n_hits). */
class TiledAcceptanceSpec extends SparkSpec {

  test("per-event hit counts over the tiled layout match the reference for all 1e6 events") {
    val sensors = DeeTiling.referenceFaces().zipWithIndex
      .map { case ((_, cfg, first), idx) =>
        val tiled = DeeTiling.tile(spark, cfg, Exclusion.updatedLayout(first))
        DeeTiling.sensors(DeeTiling.supermodules(tiled), cfg)
          .select(lit(idx).as("face"), col("ax1"), col("ax2"), col("ay1"), col("ay2"))
      }
      .reduce(_ unionByName _)
    val fixture = spark.read.parquet(Layouts.resolveFixture("tiled_acceptance_seed42.parquet"))
    val computed = Acceptance.hitCountsKin(
      spark, fixture.select("event_id", "x", "y", "theta", "phi", "eta"), sensors
    ).select(col("event_id"), col("n_hits").as("n_computed"))
    val joined = fixture.select(col("event_id"), col("n_hits").as("n_ref"))
      .join(computed, Seq("event_id"), "left")
      .withColumn("n_computed", coalesce(col("n_computed"), lit(0L)))
    val mismatches = joined.filter(col("n_ref") =!= col("n_computed")).count()
    assert(mismatches == 0L, s"$mismatches of 1e6 events disagree with the reference")
  }
}
