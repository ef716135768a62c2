package graft

import graft.ops.SpatialJoin

/** Property test: the grid-bucketed spatial join equals brute force on
  * random rectangles and points (SURVEY §5.3). Seeded, so failures
  * reproduce. */
class SpatialJoinPropSpec extends SparkSpec {

  test("grid join ≡ brute force for random rects/points across cell sizes") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    def c(): Double = rnd.nextDouble() * 1000 - 500
    for (trial <- 1 to 5; cell <- Seq(13.0, 50.0, 300.0)) {
      val rects = Seq.fill(25) {
        val (x, y) = (c(), c())
        (x, x + rnd.nextDouble() * 119 + 1, y, y + rnd.nextDouble() * 119 + 1)
      }
      val points = Seq.fill(200)((c(), c()))
      val rdf = rects.zipWithIndex.map { case ((x1, x2, y1, y2), i) => (i, x1, x2, y1, y2) }
        .toDF("rect_id", "ax1", "ax2", "ay1", "ay2")
      val pdf = points.zipWithIndex.map { case ((x, y), i) => (i, x, y) }
        .toDF("pt_id", "px", "py")
      val got = SpatialJoin.hitJoin(pdf, rdf, Seq.empty, cell)
        .select("pt_id", "rect_id")
        .collect().map(r => (r.getInt(0), r.getInt(1))).toSet
      val want = (for {
        ((x, y), pi) <- points.zipWithIndex
        ((x1, x2, y1, y2), ri) <- rects.zipWithIndex
        if x1 < x && x < x2 && y1 < y && y < y2
      } yield (pi, ri)).toSet
      assert(got == want, s"trial $trial cell $cell: grid join diverged from brute force")
      // existence semantics (the reference's `.any()`)
      val semi = SpatialJoin.semiJoin(pdf, rdf, Seq("pt_id"), Seq.empty, cell)
        .collect().map(_.getInt(0)).toSet
      assert(semi == want.map(_._1), s"trial $trial cell $cell: semi join diverged")
    }
  }

  test("shuffle-path (broadcastRects=false) equals the broadcast path and stays an equi-join") {
    import spark.implicits._
    val rnd = new scala.util.Random(29)
    def c(): Double = rnd.nextDouble() * 1000 - 500
    val rects = Seq.fill(40) {
      val (x, y) = (c(), c())
      (x, x + rnd.nextDouble() * 90 + 1, y, y + rnd.nextDouble() * 90 + 1)
    }.zipWithIndex.map { case ((x1, x2, y1, y2), i) => (i, x1, x2, y1, y2) }
      .toDF("rect_id", "ax1", "ax2", "ay1", "ay2")
    val points = Seq.fill(300)((c(), c())).zipWithIndex.map { case ((x, y), i) => (i, x, y) }
      .toDF("pt_id", "px", "py")
    val bcast = SpatialJoin.hitJoin(points, rects, Seq.empty, cell = 60.0)
      .select("pt_id", "rect_id").collect().map(r => (r.getInt(0), r.getInt(1))).toSet
    val shuffled = SpatialJoin.hitJoin(points, rects, Seq.empty, cell = 60.0, broadcastRects = false)
    val plan = shuffled.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"shuffle path degenerated:\n$plan")
    val got = shuffled.select("pt_id", "rect_id").collect().map(r => (r.getInt(0), r.getInt(1))).toSet
    assert(got == bcast, "shuffle path diverged from broadcast path")
  }
}
