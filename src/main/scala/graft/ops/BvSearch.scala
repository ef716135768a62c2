package graft.ops

import graft.physics.Physics
import org.apache.spark.sql.{DataFrame, SparkSession}

import scala.collection.mutable.ArrayBuffer

/** Per-supermodule bias-voltage configuration search (SURVEY §2.8 X2,
  * §2.4 J5, §2.6 O3; reference ETL.py:423-493 `find_BV_config`).
  *
  * For each supermodule, enumerate module spans (i ≤ j) that a single BV
  * line can feed (span r_min > ladder_curve(span r_max), with a
  * problematic-module fallback for single modules), chain spans to tile
  * [0, n), pick the minimum-segment chain closest to equal-sized
  * segments, and report segment currents.
  *
  * The search space per group is ≤ 7 modules, so this is a
  * `flatMapGroups` over module rows grouped by supermodule — the
  * per-group work is trivial and the groups parallelize across the
  * cluster. Chain enumeration order replicates the reference so
  * tie-breaks are identical.
  */
object BvSearch {

  final case class ModuleBV(sm_id: Int, mod_i: Int, r_min: Double, r_max: Double, current: Double)
  final case class BvSegment(sm_id: Int, segment: Int, mod_lo: Int, mod_hi: Int, current: Double)

  /** Exact port of the reference algorithm for one supermodule.
    * `mods` must be indexed 0..n-1 (mod_i). Returns the chosen segments
    * in reference order with their summed currents, plus problematic
    * module ids. */
  def findConfig(
      mods: IndexedSeq[ModuleBV],
      curve: Double => Double,
      minSplit: Int = 1
  ): (List[(Int, Int)], List[Double], List[Int]) = {
    val n = mods.length
    val byI = mods.sortBy(_.mod_i)
    require(byI.zipWithIndex.forall { case (m, i) => m.mod_i == i }, "modules must be 0..n-1")

    // pair enumeration: combinations (i<j) then (i,i)  (ETL.py:424-425)
    val combs = (for { i <- 0 until n; j <- i + 1 until n } yield (i, j)) ++ (0 until n).map(i => (i, i))
    val working = ArrayBuffer.empty[(Int, Int)]
    val problematic = ArrayBuffer.empty[Int]
    for ((a, b) <- combs) {
      val mi = math.min(byI(a).r_min, byI(b).r_min)
      val ma = math.max(byI(a).r_max, byI(b).r_max)
      val bound = curve(ma)
      if (mi > bound) working += ((a, b))
      else if (mi < bound && a == b) {
        problematic += a
        working += ((a, b))
      }
    }

    // chain spans backwards from the one ending at n-1 (ETL.py:451-462)
    var newCfgs: List[List[(Int, Int)]] = working.filter(_._2 == n - 1).map(c => List(c)).toList
    var cfgs: List[List[(Int, Int)]] = Nil
    for (_ <- 0 until n) {
      cfgs = newCfgs
      val next = ArrayBuffer.empty[List[(Int, Int)]]
      for (l <- cfgs) {
        for (c <- working if c._2 == l.last._1 - 1) next += l :+ c
        if (l.last._1 == 0) next += l
      }
      newCfgs = next.toList
    }

    // Guard: if no span ends at n-1 (or chaining dead-ends), the
    // reference would still count BV_lines = len([])+1 = 1 for the SM;
    // emit the empty config instead of throwing on `.min` of Nil.
    if (newCfgs.isEmpty) return (Nil, Nil, problematic.toList)
    val minLen0 = newCfgs.map(_.length).min
    val minLen = if (minSplit > 1) math.max(minSplit, minLen0) else minLen0
    val avgBvs = n.toDouble / minLen

    // best = minimum mean |span length − avg|, first found wins (ETL.py:465-478)
    var best: List[(Int, Int)] = Nil
    var bestAvg = 10.0
    for (cfg <- cfgs if cfg.length == minLen) {
      val dist = cfg.foldLeft(0.0) { case (acc, (m0, m1)) => acc + math.abs(m1 + 1 - m0 - avgBvs) } / minLen
      if (dist < bestAvg) { bestAvg = dist; best = cfg }
    }

    val currents = best.map { case (m0, m1) =>
      (m0 to m1).foldLeft(0.0)((acc, i) => acc + byI(i).current)
    }
    (best, currents, problematic.toList)
  }

  /** Distributed form: module rows (sm_id, mod_i, r_min, r_max, current)
    * → one row per chosen BV segment. */
  def run(spark: SparkSession, modules: DataFrame, curveName: String, minSplit: Int = 1): DataFrame = {
    import spark.implicits._
    val curve = Physics.bvCurve(curveName) _
    modules
      .selectExpr("cast(sm_id as int) sm_id", "cast(mod_i as int) mod_i", "r_min", "r_max", "current")
      .as[ModuleBV]
      .groupByKey(_.sm_id)
      .flatMapGroups { (smId, it) =>
        val mods = it.toIndexedSeq.sortBy(_.mod_i)
        val (cfg, currents, _) = findConfig(mods, curve, minSplit)
        cfg.zip(currents).zipWithIndex.map { case (((lo, hi), cur), seg) =>
          BvSegment(smId, seg, lo, hi, cur)
        }
      }
      .toDF()
  }

  /** Study rollup (bias_voltage.py:130-167): BV leads = Σ(segments+1),
    * channels = Σ segments. */
  def study(spark: SparkSession, modules: DataFrame, curveName: String, minSplit: Int = 1): (Long, Long) = {
    import org.apache.spark.sql.functions._
    val seg = run(spark, modules, curveName, minSplit)
    // left join against the distinct SM set so an SM with an empty
    // config still contributes leads = 0+1 = 1 (reference semantics).
    val row = modules
      .selectExpr("cast(sm_id as int) sm_id").distinct()
      .join(seg.groupBy("sm_id").agg(count(lit(1)).as("n_seg")), Seq("sm_id"), "left")
      .withColumn("n_seg", coalesce(col("n_seg"), lit(0L)))
      .agg(sum(col("n_seg") + 1).as("leads"), sum("n_seg").as("channels"))
      .head()
    (row.getLong(0), row.getLong(1))
  }
}
