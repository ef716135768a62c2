package graft

import graft.ops.DeeTiling
import graft.pipelines.{Acceptance, Layouts}
import org.apache.spark.sql.functions._

/** geometric_acceptance.ipynb parity at PER-EVENT granularity: the
  * fixture (fixtures/ga_acceptance_seed42.parquet, written by
  * dev/gen_ga_golden.py running the reference under np.random.seed(42))
  * carries the reference's per-event hit count for each of the four MC
  * detector variants; the engine recomputes all four from its own
  * tiling / fromCenters chains. Stronger than the ga_* histogram
  * oracles — compensating binning errors cannot hide here. */
class GaAcceptanceSpec extends SparkSpec {

  private def tiledSensors(variant: String) = {
    val faces = DeeTiling.gaFaces(variant)
    val all = DeeTiling.tileFaces(spark, faces)
    faces.zipWithIndex
      .map { case ((dee, cfg, _), idx) =>
        DeeTiling.sensors(DeeTiling.supermodules(all.filter(col("face") === dee)), cfg)
          .select(lit(idx).as("face"), col("ax1"), col("ax2"), col("ay1"), col("ay2"))
      }
      .reduce(_ unionByName _)
  }

  private def layoutSensors(yamlName: String, layout: String) =
    Layouts.faceSensors(spark, Layouts.resolveFixture(yamlName), layout)
      .select(col("face"), col("ax1"), col("ax2"), col("ay1"), col("ay2"))

  test("per-event hit counts match the reference for all 4 notebook variants × 1e5 events") {
    val fixture = spark.read.parquet(Layouts.resolveFixture("ga_acceptance_seed42.parquet"))
      .localCheckpoint()
    val kin = fixture.select("event_id", "x", "y", "theta", "phi", "eta")
    val variants = Seq(
      "nhits_tdr" -> layoutSensors("database_TDR.yaml", "TDR"),
      "nhits_large" -> tiledSensors("large_sensor"),
      "nhits_small" -> tiledSensors("small_sensor"),
      "nhits_new" -> layoutSensors("database_new.yaml", "new")
    )
    for ((refCol, sensors) <- variants) {
      val computed = Acceptance.hitCountsKin(spark, kin, sensors)
        .select(col("event_id"), col("n_hits").as("n_computed"))
      val mismatches = fixture.select(col("event_id"), col(refCol).cast("long").as("n_ref"))
        .join(computed, Seq("event_id"), "left")
        .withColumn("n_computed", coalesce(col("n_computed"), lit(0L)))
        .filter(col("n_ref") =!= col("n_computed"))
        .count()
      assert(mismatches == 0L, s"$refCol: $mismatches of 1e5 events disagree with the reference")
    }
  }
}
