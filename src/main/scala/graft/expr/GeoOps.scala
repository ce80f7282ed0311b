package graft.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import graft.geom.Geom
import graft.index.{Cells, Cover, Tiles}

/**
 * Static bridge between Catalyst internal types and the pure kernel.
 * Every method here is callable from generated Java code (whole-stage
 * codegen) as `graft.expr.GeoOps.xxx(...)` — the expressions in
 * [[graft.expr]] delegate both `nullSafeEval` and `doGenCode` to these.
 *
 * SQL-level geometry encoding (SURVEY.md §1.2):
 *   ring    = ARRAY<STRUCT<x: DOUBLE, y: DOUBLE>>
 *   polygon = ARRAY<ARRAY<STRUCT<x: DOUBLE, y: DOUBLE>>>  (ring 0 = shell)
 */
object GeoOps {

  // ---- codecs ----
  def ringToFlat(ad: ArrayData): Array[Double] = {
    val n = ad.numElements()
    val out = new Array[Double](2 * n)
    var i = 0
    while (i < n) {
      val r = ad.getStruct(i, 2)
      out(2 * i) = r.getDouble(0)
      out(2 * i + 1) = r.getDouble(1)
      i += 1
    }
    out
  }

  def flatToRing(flat: Array[Double]): ArrayData = {
    val n = flat.length / 2
    val rows = new Array[Any](n)
    var i = 0
    while (i < n) {
      rows(i) = new GenericInternalRow(Array[Any](flat(2 * i), flat(2 * i + 1)))
      i += 1
    }
    new GenericArrayData(rows)
  }

  def polyToFlat(ad: ArrayData): Array[Array[Double]] = {
    val n = ad.numElements()
    val out = new Array[Array[Double]](n)
    var i = 0
    while (i < n) {
      out(i) = ringToFlat(ad.getArray(i))
      i += 1
    }
    out
  }

  def flatToPoly(poly: Array[Array[Double]]): ArrayData = {
    val rings = new Array[Any](poly.length)
    var i = 0
    while (i < poly.length) { rings(i) = flatToRing(poly(i)); i += 1 }
    new GenericArrayData(rings)
  }

  // ---- ring ops ----
  def closedRing(ring: ArrayData): ArrayData = flatToRing(Geom.closeRing(ringToFlat(ring)))

  def gaussianSmooth(ring: ArrayData, sigma: Double): ArrayData =
    flatToRing(Geom.gaussianSmooth(ringToFlat(ring), sigma))

  /** Reference create_polygon (utils.py:34-47): close ring, null if <3
    * distinct points or construction fails. Returns single-ring polygon. */
  def makePolygon(ring: ArrayData): ArrayData = {
    val flat = ringToFlat(ring)
    if (flat.length / 2 < 3) return null
    val closed = Geom.closeRing(flat)
    if (Geom.nPts(closed) - 1 < 3) return null
    flatToPoly(Array(closed))
  }

  // ---- predicates ----
  // The join hot path: walk the Catalyst ArrayData directly (no flat-array
  // conversion, no per-row allocation beyond struct views) in a single
  // fused on-boundary + even-odd-crossing pass. Semantics identical to
  // Geom.containsStrict (shapely-strict, boundary excluded) — equivalence
  // is property-tested in ExprSpec.

  /** Ring relation: 0 = outside, 1 = on an edge, 2 = strictly inside. */
  private def ringRelation(ring: ArrayData, px: Double, py: Double): Int = {
    val n = ring.numElements()
    if (n == 0) return 0
    var inside = false
    var prev = ring.getStruct(n - 1, 2)
    var xj = prev.getDouble(0); var yj = prev.getDouble(1)
    var i = 0
    while (i < n) {
      val cur = ring.getStruct(i, 2)
      val xi = cur.getDouble(0); val yi = cur.getDouble(1)
      val cross = (xi - xj) * (py - yj) - (yi - yj) * (px - xj)
      if (cross == 0.0 &&
          px >= Math.min(xj, xi) && px <= Math.max(xj, xi) &&
          py >= Math.min(yj, yi) && py <= Math.max(yj, yi)) return 1
      if ((yi > py) != (yj > py)) {
        val xCross = (xj - xi) * (py - yi) / (yj - yi) + xi
        if (px < xCross) inside = !inside
      }
      xj = xi; yj = yi
      i += 1
    }
    if (inside) 2 else 0
  }

  /** Polygon flattened to ARRAY<DOUBLE> [x0,y0,x1,y1,...] — the
    * zero-allocation probe form (primitive getDouble, no struct views).
    * Exterior shells only, like the reference's rendering
    * (plot_courses.py:184-186 uses `.exterior`). A MULTI-PIECE polygon
    * (disjoint pieces, the engine's only multi-ring meaning) flattens as
    * one LEADING (NaN,NaN) marker pair, then all piece shells separated
    * by one (NaN,NaN) pair each — the single-ring output is
    * byte-identical to the pre-r5 form AND lets the contains kernels
    * dispatch on element 0 alone, keeping the dominant single-piece
    * probe path at its original cost (no per-vertex NaN check). */
  def flattenShell(poly: ArrayData): ArrayData = {
    val nr = poly.numElements()
    if (nr == 0) return new GenericArrayData(Array.empty[Double])
    var total = 0
    var r = 0
    while (r < nr) { total += poly.getArray(r).numElements(); r += 1 }
    val head = if (nr > 1) 2 else 0
    val out = new Array[Double](2 * total + 2 * (nr - 1) + head)
    var o = 0
    if (nr > 1) { out(0) = Double.NaN; out(1) = Double.NaN; o = 2 }
    r = 0
    while (r < nr) {
      if (r > 0) { out(o) = Double.NaN; out(o + 1) = Double.NaN; o += 2 }
      val shell = poly.getArray(r)
      val n = shell.numElements()
      var i = 0
      while (i < n) {
        val p = shell.getStruct(i, 2)
        out(o) = p.getDouble(0)
        out(o + 1) = p.getDouble(1)
        o += 2
        i += 1
      }
      r += 1
    }
    new GenericArrayData(out)
  }

  /** Strict containment against a flattened shell: fused on-edge +
    * even-odd walk over primitive doubles — the join refine hot path.
    * Piece-aware ((NaN,NaN)-separated, see [[flattenShell]]): on the
    * boundary of ANY piece -> false, strictly inside any piece -> true —
    * the [[graft.geom.Geom.containsStrict]] rule. For a single ring the
    * arithmetic and outcome are exactly the pre-r5 kernel's. */
  def stContainsFlat(flat: ArrayData, px: Double, py: Double): Boolean = {
    val total = flat.numElements() / 2
    if (total == 0) return false
    // dispatch on the multi-piece marker (leading NaN pair): the dominant
    // single-piece path is the EXACT pre-r5 loop — no per-vertex NaN
    // check on the flagship refine hot path
    if (!java.lang.Double.isNaN(flat.getDouble(0))) {
      val n = total
      if (n < 3) return false
      var inside = false
      var xj = flat.getDouble(2 * (n - 1)); var yj = flat.getDouble(2 * (n - 1) + 1)
      var i = 0
      while (i < n) {
        val xi = flat.getDouble(2 * i); val yi = flat.getDouble(2 * i + 1)
        val cross = (xi - xj) * (py - yj) - (yi - yj) * (px - xj)
        if (cross == 0.0 &&
            px >= Math.min(xj, xi) && px <= Math.max(xj, xi) &&
            py >= Math.min(yj, yi) && py <= Math.max(yj, yi)) return false // on edge
        if ((yi > py) != (yj > py)) {
          val xCross = (xj - xi) * (py - yi) / (yj - yi) + xi
          if (px < xCross) inside = !inside
        }
        xj = xi; yj = yi
        i += 1
      }
      return inside
    }
    // multi-piece: fused forward walk per piece — segments
    // (v0,v1)..(v_{n-2},v_{n-1}) then the wrap (v_{n-1},v0), the exact
    // segment set and arithmetic of the classic prev/cur loop
    var inside = false
    var i = 1 // skip the marker pair
    while (i < total) {
      val firstX = flat.getDouble(2 * i); val firstY = flat.getDouble(2 * i + 1)
      var xj = firstX; var yj = firstY
      var pieceInside = false
      var cnt = 1
      i += 1
      var xi = 0.0; var yi = 0.0
      var run = true
      while (run && i < total) {
        xi = flat.getDouble(2 * i)
        if (java.lang.Double.isNaN(xi)) run = false
        else {
          yi = flat.getDouble(2 * i + 1)
          val cross = (xi - xj) * (py - yj) - (yi - yj) * (px - xj)
          if (cross == 0.0 &&
              px >= Math.min(xj, xi) && px <= Math.max(xj, xi) &&
              py >= Math.min(yj, yi) && py <= Math.max(yj, yi)) return false // on edge
          if ((yi > py) != (yj > py)) {
            val xCross = (xj - xi) * (py - yi) / (yj - yi) + xi
            if (px < xCross) pieceInside = !pieceInside
          }
          xj = xi; yj = yi
          cnt += 1
          i += 1
        }
      }
      if (cnt >= 3) {
        // wrap segment back to the piece's first vertex
        val cross = (firstX - xj) * (py - yj) - (firstY - yj) * (px - xj)
        if (cross == 0.0 &&
            px >= Math.min(xj, firstX) && px <= Math.max(xj, firstX) &&
            py >= Math.min(yj, firstY) && py <= Math.max(yj, firstY)) return false
        if ((firstY > py) != (yj > py)) {
          val xCross = (xj - firstX) * (py - firstY) / (yj - firstY) + firstX
          if (px < xCross) pieceInside = !pieceInside
        }
        if (pieceInside) inside = true
      }
      i += 1 // skip the NaN separator (or step past the end)
    }
    inside
  }

  /** Multi-ring = disjoint pieces (see [[graft.geom.Geom.containsStrict]]):
    * strictly inside any piece and on no piece's boundary. */
  def stContains(poly: ArrayData, x: Double, y: Double): Boolean = {
    val nr = poly.numElements()
    if (nr == 0) return false
    var inside = false
    var r = 0
    while (r < nr) {
      val ring = poly.getArray(r)
      if (ring.numElements() >= 3) {
        val rel = ringRelation(ring, x, y)
        if (rel == 1) return false // boundary is excluded (shapely contains)
        if (rel == 2) inside = true
      }
      r += 1
    }
    inside
  }

  /** Covers = inside or on the boundary of any piece. */
  def stCovers(poly: ArrayData, x: Double, y: Double): Boolean = {
    val nr = poly.numElements()
    if (nr == 0) return false
    var r = 0
    while (r < nr) {
      val ring = poly.getArray(r)
      if (ring.numElements() >= 3 && ringRelation(ring, x, y) != 0) return true
      r += 1
    }
    false
  }

  /** Valid iff non-empty and EVERY piece ring is simple/non-degenerate
    * (multi-ring = disjoint pieces, so one bad piece poisons the whole). */
  def stIsValid(poly: ArrayData): Boolean = {
    val p = polyToFlat(poly)
    if (p.isEmpty) return false
    var i = 0
    while (i < p.length) {
      if (!Geom.isRingValid(p(i))) return false
      i += 1
    }
    true
  }

  // ---- geometric ops ----
  /** Multi-piece-aware intersection: each input is a set of DISJOINT
    * pieces (the engine's multi-ring contract — including outputs of this
    * very function), so the intersection is the union of ALL pairwise
    * piece intersections. Every ring of both inputs is validity-gated
    * (utils.py:57-62's None semantics), not just ring 0 — a composed
    * `st_intersection(st_intersection(a, b), c)` therefore keeps every
    * piece instead of silently dropping all but the first. */
  def stIntersection(a: ArrayData, b: ArrayData): ArrayData = {
    val pa = polyToFlat(a); val pb = polyToFlat(b)
    if (pa.isEmpty || pb.isEmpty) return null
    var i = 0
    while (i < pa.length) { if (!Geom.isRingValid(pa(i))) return null; i += 1 }
    var j = 0
    while (j < pb.length) { if (!Geom.isRingValid(pb(j))) return null; j += 1 }
    val out = scala.collection.mutable.ArrayBuffer.empty[Array[Double]]
    i = 0
    while (i < pa.length) {
      j = 0
      while (j < pb.length) {
        val pieces = Geom.intersectionPieces(pa(i), pb(j))
        if (pieces != null) out ++= pieces
        j += 1
      }
      i += 1
    }
    if (out.isEmpty) null else flatToPoly(out.toArray.map(Geom.closeRing))
  }

  def stEnvelope(poly: ArrayData): InternalRow = {
    val p = polyToFlat(poly)
    val e = Geom.envelopePoly(p)
    if (e(0).isNaN) null else new GenericInternalRow(Array[Any](e(0), e(1), e(2), e(3)))
  }

  /** Multi-ring = disjoint pieces (see [[Geom.containsStrict]] note):
    * area is the SUM over rings. */
  def stArea(poly: ArrayData): Double = {
    val p = polyToFlat(poly)
    var a = 0.0
    var i = 0
    while (i < p.length) { a += Geom.area(p(i)); i += 1 }
    a
  }

  def haversineM(lon1: Double, lat1: Double, lon2: Double, lat2: Double): Double =
    Geom.haversineM(lon1, lat1, lon2, lat2)

  // ---- cells / tiles ----
  def cellId(lon: Double, lat: Double, level: Int): Long = Cells.cellId(lon, lat, level)

  def cellParent(cell: Long, level: Int): Long = Cells.parentAt(cell, level)

  def cellX(cell: Long): Long = Cells.x(cell)

  def cellY(cell: Long): Long = Cells.y(cell)

  def cellLevel(cell: Long): Int = Cells.level(cell)

  def ringCells(cell: Long, r: Int): ArrayData = new GenericArrayData(Cells.ringCells(cell, r))

  def diskCells(cell: Long, r: Int): ArrayData = new GenericArrayData(Cells.diskCells(cell, r))

  def cellCenter(cell: Long): InternalRow = {
    val c = Cells.center(cell)
    new GenericInternalRow(Array[Any](c(0), c(1)))
  }

  def cellMinDistanceM(cell: Long, lon: Double, lat: Double): Double =
    Cells.minDistanceM(cell, lon, lat)

  /** Point-to-shell distance over the flattened ring — zero-copy ArrayData
    * walk (the q75 candidate-refine hot path; HOF composition of the same
    * arithmetic measured 50x slower at sf0.1). */
  def stDistanceToShellM(flat: ArrayData, px: Double, py: Double): Double = {
    // multi-piece flats carry (NaN,NaN) separators (flattenShell): the two
    // pseudo-segments touching a separator evaluate to d = NaN, and
    // `NaN < best` is false, so they self-exclude — no branch needed
    val n = flat.numElements() / 2
    var best = Double.MaxValue
    var i = 0
    while (i < n - 1) {
      val ax = flat.getDouble(2 * i); val ay = flat.getDouble(2 * i + 1)
      val bx = flat.getDouble(2 * i + 2); val by = flat.getDouble(2 * i + 3)
      val dx = bx - ax; val dy = by - ay
      val d2 = dx * dx + dy * dy
      val t =
        if (d2 == 0.0) 0.0
        else {
          val tr = ((px - ax) * dx + (py - ay) * dy) / d2
          if (tr < 0.0) 0.0 else if (tr > 1.0) 1.0 else tr
        }
      val d = Geom.haversineM(px, py, ax + t * dx, ay + t * dy)
      if (d < best) best = d
      i += 1
    }
    best
  }

  def tileX(lon: Double, z: Int): Long = Tiles.lonToTileX(lon, z)

  def tileY(lat: Double, z: Int): Long = Tiles.latToTileY(lat, z)

  def quadkey(z: Int, x: Long, y: Long): org.apache.spark.unsafe.types.UTF8String =
    org.apache.spark.unsafe.types.UTF8String.fromString(Tiles.quadkey(z, x, y))

  /** Cover cells as ARRAY<STRUCT<cell: LONG, full: BOOLEAN>> for explode. */
  def coverCells(poly: ArrayData, minLevel: Int, maxLevel: Int): ArrayData = {
    val entries = Cover.cover(polyToFlat(poly), minLevel, maxLevel)
    val rows = new Array[Any](entries.length)
    var i = 0
    while (i < entries.length) {
      rows(i) = new GenericInternalRow(Array[Any](entries(i)._1, entries(i)._2))
      i += 1
    }
    new GenericArrayData(rows)
  }

  /** Viewport struct (fig_w_in, fig_h_in, aspect, marker_px) — utils.py:69-80. */
  def viewport(west: Double, south: Double, east: Double, north: Double): InternalRow = {
    val v = Geom.viewport(west, south, east, north)
    new GenericInternalRow(Array[Any](v(0), v(1), v(2), v(3)))
  }
}
