package graft.geom

/** Exclusion-zone geometry for dee tiling (SURVEY §2.8 X7, §2.3 F3;
  * reference dee_geometry.py:60-132 with shapely).
  *
  * A slot is excluded when its rectangle's interior intersects a zone's
  * interior — the reference's `overlaps(r, z) or within(r, z)` reduces
  * to exactly that for these zones (no zone can fit inside a slot
  * rectangle: the smallest zone, the outer-attachment disc, has
  * diameter 68 > the 43.6 mm slot height).
  *
  * Circles are exact here (shapely approximates them with 32-gons);
  * differences are confined to rectangles within ~0.2 mm of tangency.
  * All intersection tests are STRICT (touching boundaries do not
  * exclude), matching shapely's interior-based semantics.
  */
object Exclusion {

  final case class Rect(x1: Double, x2: Double, y1: Double, y2: Double)

  sealed trait Zone {
    /** Strict interior-interior intersection with an axis-aligned rect. */
    def intersects(r: Rect): Boolean
  }

  /** Disk of radius `r` at (cx, cy). */
  final case class CircleZone(cx: Double, cy: Double, r: Double) extends Zone {
    def intersects(rect: Rect): Boolean = {
      val px = math.min(math.max(cx, rect.x1), rect.x2)
      val py = math.min(math.max(cy, rect.y1), rect.y2)
      (px - cx) * (px - cx) + (py - cy) * (py - cy) < r * r
    }
  }

  /** Annular region rIn < dist < rOut around the origin (the reference's
    * disc-with-hole polygons). Degenerate (rIn ≥ rOut) → empty. */
  final case class RingZone(rIn: Double, rOut: Double) extends Zone {
    def intersects(rect: Rect): Boolean = {
      if (rIn >= rOut) return false
      val cx = math.min(math.max(0.0, rect.x1), rect.x2)
      val cy = math.min(math.max(0.0, rect.y1), rect.y2)
      val dMin2 = cx * cx + cy * cy
      val dMax2 = math.max(rect.x1 * rect.x1, rect.x2 * rect.x2) +
        math.max(rect.y1 * rect.y1, rect.y2 * rect.y2)
      dMin2 < rOut * rOut && dMax2 > rIn * rIn
    }
  }

  /** Convex polygon; strict separating-axis test vs the rect. */
  final case class PolyZone(pts: IndexedSeq[(Double, Double)]) extends Zone {
    def intersects(rect: Rect): Boolean = {
      val xs = pts.map(_._1); val ys = pts.map(_._2)
      if (xs.max <= rect.x1 || xs.min >= rect.x2) return false
      if (ys.max <= rect.y1 || ys.min >= rect.y2) return false
      val corners = Seq((rect.x1, rect.y1), (rect.x1, rect.y2), (rect.x2, rect.y2), (rect.x2, rect.y1))
      var i = 0
      while (i < pts.length) {
        val (x1, y1) = pts(i)
        val (x2, y2) = pts((i + 1) % pts.length)
        val ax = -(y2 - y1); val ay = x2 - x1
        val pr = corners.map { case (x, y) => ax * x + ay * y }
        val pp = pts.map { case (x, y) => ax * x + ay * y }
        if (pp.max <= pr.min || pp.min >= pr.max) return false
        i += 1
      }
      true
    }
  }

  final case class RectZone(zone: Rect) extends Zone {
    def intersects(r: Rect): Boolean =
      r.x1 < zone.x2 && zone.x1 < r.x2 && r.y1 < zone.y2 && zone.y1 < r.y2
  }

  final case class UnionZone(parts: Seq[Zone]) extends Zone {
    def intersects(r: Rect): Boolean = parts.exists(_.intersects(r))
  }

  def excluded(rect: Rect, zones: Seq[Zone]): Boolean = zones.exists(_.intersects(rect))

  // ---- constructors mirroring dee_geometry.py:60-132 ----

  private def rad(deg: Double): Double = deg * math.Pi / 180

  private def rotate(p: (Double, Double), angleDeg: Double): (Double, Double) = {
    val a = rad(angleDeg)
    val (x, y) = p
    (math.cos(a) * x - math.sin(a) * y, math.sin(a) * x + math.cos(a) * y)
  }

  /** Tapered inner attachment (dee_geometry.py:61-77): quad rotated
    * clockwise by `angle`, translated radially to `inner + height`. */
  def innerAttachment(angle: Double, height: Double = 84, width: Double = 88.5,
                      taper: Double = 5.4, inner: Double = 336): Zone = {
    val t = math.tan(rad(taper))
    val coords = IndexedSeq(
      (-width / 2, -height),
      (-width / 2 + height * t, 0.0),
      (width / 2 - height * t, 0.0),
      (width / 2, -height)
    )
    val dx = math.sin(rad(angle)) * (inner + height)
    val dy = math.cos(rad(angle)) * (inner + height)
    PolyZone(coords.map(p => rotate(p, -angle)).map { case (x, y) => (x + dx, y + dy) })
  }

  /** Outer attachment (dee_geometry.py:79-93): quad ∪ end-cap disc,
    * rotated clockwise and translated to the outer radius. */
  def outerAttachment(angle: Double, height: Double = 107.5, width: Double = 68,
                      etlOuter: Double = 1185): Zone = {
    val coords = IndexedSeq((-width / 2, -height), (-width / 2, 0.0), (width / 2, 0.0), (width / 2, -height))
    val dx = math.sin(rad(angle)) * etlOuter
    val dy = math.cos(rad(angle)) * etlOuter
    val quad = PolyZone(coords.map(p => rotate(p, -angle)).map { case (x, y) => (x + dx, y + dy) })
    val (ccx, ccy) = rotate((0.0, -height), -angle)
    UnionZone(Seq(quad, CircleZone(ccx + dx, ccy + dy, width / 2)))
  }

  /** Outside-the-acceptance ring + feedthrough slabs (dee_geometry.py:104-131).
    * With feedthrough ≥ etlOuter (the --no_feedthrough path, which calls
    * make_outer(etl_outer, etl_outer)) the slabs are zero-width — empty,
    * not everything-excluding — so they are omitted. */
  def outerBoundary(etlOuter: Double = 1185, feedthrough: Double = 1120): Zone = {
    val ring = RingZone(etlOuter, etlOuter + 100)
    if (feedthrough >= etlOuter) return UnionZone(Seq(ring))
    val yF = math.sqrt(etlOuter * etlOuter - feedthrough * feedthrough)
    UnionZone(Seq(
      ring,
      RectZone(Rect(feedthrough, etlOuter, -yF, yF)),
      RectZone(Rect(-etlOuter, -feedthrough, -yF, yF))
    ))
  }

  /** The reference's 'updated' dee layout geometry
    * (dee_geometry.py:240-276). `firstLayer` uses the 322 mm inner
    * restriction. The `make_inner` ring in the reference is degenerate
    * (exterior 300 < hole radius) — an empty zone, omitted here. */
  def updatedLayout(firstLayer: Boolean): Seq[Zone] =
    layoutZones("updated", firstLayer)

  private val outerAttachmentAngles = Seq(2.5, 68.0, 112.0, 177.5, -2.5, -68.0, -112.0, -177.5)

  /** Exclusion geometry per dee-layout variant
    * (dee_geometry.py:208-297). 'plain' is annulus-only; 'baseline'
    * adds the default tapered inner attachments at ±30/90/150° plus
    * the 8 outer attachments; 'updated' replaces the inner attachments
    * with the rectangular 0/90/180/270° supports and narrows the inner
    * radius. ('updatedV2' is accepted by the reference's CLI but has
    * no geometry branch — it crashes there on an undefined `inner` —
    * so it is deliberately not modeled.) `noFeedthrough` rebuilds the
    * outer boundary without the feedthrough slabs (make_outer called
    * with feedthrough = etl_outer). The degenerate make_inner ring
    * (exterior 300 < hole) is empty in every variant — omitted. */
  def layoutZones(layout: String, firstLayer: Boolean, noFeedthrough: Boolean = false): Seq[Zone] = {
    val nose = CircleZone(0, 0, 302)
    val boundary = outerBoundary(feedthrough = if (noFeedthrough) 1185.0 else 1120.0)
    val outerAtt = outerAttachmentAngles.map(a => outerAttachment(a))
    layout match {
      case "plain" =>
        Seq(nose, boundary)
      case "baseline" =>
        val innerAtt = Seq(30.0, 90.0, 150.0, -30.0, -90.0, -150.0).map(a => innerAttachment(a))
        outerAtt ++ innerAtt ++ Seq(nose, boundary)
      case "updated" =>
        val rInner = 302.0
        val rEff = if (firstLayer) 322.0 else 302.0
        val innerAtt =
          Seq(0.0, 180.0).map(a => innerAttachment(a, width = 170, height = 796.0 / 2 - rEff, taper = 0, inner = rInner)) ++
            Seq(90.0, 270.0).map(a => innerAttachment(a, width = 110, height = 395 - rEff, taper = 0, inner = rInner))
        outerAtt ++ innerAtt ++ Seq(nose, boundary)
      case other =>
        throw new IllegalArgumentException(s"unknown dee layout '$other' (expected plain|baseline|updated)")
    }
  }
}
