package graft.ops

import graft.domain.EtlConfig
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ring split + mixed-vendor min_split studies (SURVEY §2.6 O5, §2.5
  * A16; reference bias_voltage.py:169-191 and the study blocks at
  * bias_voltage.py:203-420).
  *
  * Per module-row (same y), the right-most supermodule goes to the
  * outer ring, the next one or two (two when |y| ≥ 600) to the middle
  * ring, the rest inner. Expressed rank-based over (row, sm_seq) — the
  * reference's float-equality `sm.y == y` bucketing re-keyed on row
  * index (SURVEY §4 "semantic hazard").
  */
object RingSplit {

  /** Add a `ring` column to the supermodule table
    * (needs row_idx, sm_seq, y_row columns).
    *
    * The |y| < 600 boundary tests the SUPERMODULE center
    * y = y_row + pb/2 (the reference's `sm.y`, placed half a power
    * board above the module-row center, bias_voltage.py:104-114) —
    * using the row center instead silently flips rows near the
    * boundary (row at y_row 599.9 → sm.y 614.65). */
  def classify(sms: DataFrame): DataFrame = {
    val w = Window.partitionBy("row_idx")
    val smY = col("y_row") + EtlConfig.pbWidth / 2.0
    sms
      .withColumn("row_n", count(lit(1)).over(w))
      .withColumn("pos_right", col("row_n") - col("sm_seq"))
      .withColumn(
        "ring",
        when(col("pos_right") === 1, "outer")
          .when(abs(smY) < 600, when(col("pos_right") === 2, "middle").otherwise("inner"))
          .otherwise(when(col("pos_right") <= 3, "middle").otherwise("inner"))
      )
      .drop("row_n", "pos_right")
  }

  /** A16 invariance: the split partitions the supermodule set. */
  def checkInvariance(sms: DataFrame, ringed: DataFrame): Unit = {
    val total = sms.count()
    val split = ringed.groupBy("ring").count().agg(sum("count")).head().getLong(0)
    require(total == split, s"ring split changed the supermodule count: $total != $split")
  }

  /** Mixed-vendor min_split study (reference bias_voltage.py:203-420):
    * each ring's supermodules run the BV config search with the ring's
    * assigned ladder curve and a minimum segment count; rollup is
    * leads = Σ(segments+1), channels = Σ segments, plus module counts
    * per vendor (fbk/hpk by curve name prefix).
    *
    * `moduleStats` must carry sm_id, mod_i, r_min, r_max, current.
    * Returns one row: (leads, channels, n_fbk, n_hpk). */
  def minSplitStudy(
      spark: SparkSession,
      moduleStats: DataFrame,
      ringed: DataFrame,
      curveByRing: Map[String, String],
      minSplit: Int
  ): (Long, Long, Long, Long) = {
    val withRing = moduleStats.join(ringed.select("sm_id", "ring"), Seq("sm_id"))
    var leads = 0L
    var channels = 0L
    var nFbk = 0L
    var nHpk = 0L
    // one BvSearch pass per distinct curve (≤2 in practice); rings
    // sharing a curve are searched together — per-SM work parallelizes
    // inside BvSearch.run regardless of the grouping here.
    curveByRing.groupBy(_._2).foreach { case (curve, entries) =>
      val rings = entries.keys.toSeq
      val subset = withRing.filter(col("ring").isin(rings: _*))
      val nMods = subset.count()
      if (nMods > 0) {
        val (l, c) = BvSearch.study(spark, subset, curve, minSplit)
        leads += l
        channels += c
        if (curve.startsWith("fbk")) nFbk += nMods else nHpk += nMods
      }
    }
    (leads, channels, nFbk, nHpk)
  }

  /** The three reference study configurations: (label, curve per ring,
    * min_split) — bias_voltage.py:203-227 (5fC, min_split 2),
    * :300-317 (10fC, min_split 3), :369-386 (10fC, min_split 1). */
  val studyDefs: Seq[(String, Map[String, String], Int)] = Seq(
    ("realistic_5fC_minsplit2",
      Map("inner" -> "fbk_w13_5fc", "middle" -> "fbk_w13_5fc", "outer" -> "hpk_split4_5fc"), 2),
    ("realistic_10fC_minsplit3",
      Map("inner" -> "fbk_w13_10fc", "middle" -> "hpk_split4_10fc", "outer" -> "hpk_split4_10fc"), 3),
    ("realistic_10fC_minsplit1",
      Map("inner" -> "fbk_w13_10fc", "middle" -> "hpk_split4_10fc", "outer" -> "hpk_split4_10fc"), 1)
  )

  /** Per-BV-channel segment table of one study — the `currents` list
    * the reference histograms after each study block
    * (bias_voltage.py:273/341/410). One BvSearch pass per distinct
    * curve, unioned. */
  def minSplitSegments(
      spark: SparkSession,
      moduleStats: DataFrame,
      ringed: DataFrame,
      curveByRing: Map[String, String],
      minSplit: Int
  ): DataFrame = {
    val withRing = moduleStats.join(ringed.select("sm_id", "ring"), Seq("sm_id"))
    curveByRing.groupBy(_._2).map { case (curve, entries) =>
      val rings = entries.keys.toSeq
      BvSearch.run(spark, withRing.filter(col("ring").isin(rings: _*)), curve, minSplit)
    }.reduce(_ unionByName _)
  }

  /** The three reference study configurations, labeled. */
  def referenceStudies(spark: SparkSession, moduleStats: DataFrame, ringed: DataFrame): Seq[(String, Long, Long, Long, Long)] =
    studyDefs.map { case (label, assign, ms) =>
      val (l, c, f, h) = minSplitStudy(spark, moduleStats, ringed, assign, ms)
      (label, l, c, f, h)
    }
}
