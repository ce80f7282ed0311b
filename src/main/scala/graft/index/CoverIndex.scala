package graft.index

import graft.geom.Geom

/**
 * Polygon → cell cover, plus the compact broadcastable probe index —
 * BASELINE.json north_star: "Polygons are indexed into an H3 cover
 * (res 7-10) broadcast as a compact sorted-cell-array structure".
 *
 * The geometric analog in the reference is the envelope-bounded texture
 * grid (`/root/reference/src/python/plot_courses.py:174-200`): enumerate
 * grid cells over the polygon envelope, keep the ones that touch the
 * polygon. Here cells that are FULLY inside the polygon are marked
 * `full=true` so the join can skip the exact point-in-polygon refine for
 * pages landing in them (most of the area of a large polygon).
 */
object Cover {

  /** Relation of axis-aligned rect (w,s,e,n) to a polygon shell:
    * 0 = disjoint, 1 = partial overlap, 2 = rect fully inside polygon. */
  def rectPolyRelation(w: Double, s: Double, e: Double, n: Double,
                       poly: Array[Array[Double]]): Int = {
    if (poly.isEmpty || Geom.nPts(poly(0)) < 3) return 0
    val env = Geom.envelopePoly(poly)
    if (e < env(0) || env(2) < w || n < env(1) || env(3) < s) return 0

    // does any polygon edge cross or touch the rect?
    var edgeHit = false
    var r = 0
    while (r < poly.length && !edgeHit) {
      val ring = Geom.closeRing(poly(r))
      val m = Geom.nPts(ring) - 1
      var i = 0
      while (i < m && !edgeHit) {
        val ax = ring(2 * i); val ay = ring(2 * i + 1)
        val bx = ring(2 * i + 2); val by = ring(2 * i + 3)
        edgeHit = segIntersectsRect(ax, ay, bx, by, w, s, e, n)
        i += 1
      }
      r += 1
    }
    if (edgeHit) return 1

    // no edge touches the rect: either rect wholly inside poly, poly
    // wholly inside rect, or disjoint. Test one rect corner and one poly
    // vertex.
    val cornerIn = Geom.covers(poly, w, s)
    if (cornerIn) 2
    else {
      val vx = poly(0)(0); val vy = poly(0)(1)
      val vertexInRect = vx >= w && vx <= e && vy >= s && vy <= n
      if (vertexInRect) 1 else 0
    }
  }

  /** Segment vs axis-aligned rectangle overlap (inclusive). */
  private def segIntersectsRect(ax: Double, ay: Double, bx: Double, by: Double,
                                w: Double, s: Double, e: Double, n: Double): Boolean = {
    // trivial accept: an endpoint inside
    if (ax >= w && ax <= e && ay >= s && ay <= n) return true
    if (bx >= w && bx <= e && by >= s && by <= n) return true
    // trivial reject: both endpoints strictly one side
    if (ax < w && bx < w) return false
    if (ax > e && bx > e) return false
    if (ay < s && by < s) return false
    if (ay > n && by > n) return false
    // segment vs each rect edge
    Geom.onSegment(ax, ay, bx, by, w, s) || Geom.onSegment(ax, ay, bx, by, e, n) ||
      segSeg(ax, ay, bx, by, w, s, e, s) || segSeg(ax, ay, bx, by, e, s, e, n) ||
      segSeg(ax, ay, bx, by, e, n, w, n) || segSeg(ax, ay, bx, by, w, n, w, s)
  }

  private def segSeg(ax: Double, ay: Double, bx: Double, by: Double,
                     cx: Double, cy: Double, dx: Double, dy: Double): Boolean = {
    def o(ox: Double, oy: Double, px: Double, py: Double, qx: Double, qy: Double): Double =
      (px - ox) * (qy - oy) - (py - oy) * (qx - ox)
    val d1 = o(cx, cy, dx, dy, ax, ay); val d2 = o(cx, cy, dx, dy, bx, by)
    val d3 = o(ax, ay, bx, by, cx, cy); val d4 = o(ax, ay, bx, by, dx, dy)
    if (((d1 > 0 && d2 < 0) || (d1 < 0 && d2 > 0)) &&
        ((d3 > 0 && d4 < 0) || (d3 < 0 && d4 > 0))) return true
    (d1 == 0 && Geom.onSegment(cx, cy, dx, dy, ax, ay)) ||
      (d2 == 0 && Geom.onSegment(cx, cy, dx, dy, bx, by)) ||
      (d3 == 0 && Geom.onSegment(ax, ay, bx, by, cx, cy)) ||
      (d4 == 0 && Geom.onSegment(ax, ay, bx, by, dx, dy))
  }

  /**
   * Multi-resolution cover: cells of levels [minLevel, maxLevel], coarse
   * where fully inside (full=true), refined to maxLevel along the
   * boundary (full=false). Conservative: every point of the polygon lies
   * in some emitted cell's closure.
   */
  def cover(poly: Array[Array[Double]], minLevel: Int, maxLevel: Int): Array[(Long, Boolean)] = {
    require(minLevel <= maxLevel)
    val out = new scala.collection.mutable.ArrayBuffer[(Long, Boolean)]
    val env = Geom.envelopePoly(poly)
    if (env(0).isNaN) return out.toArray
    val x0 = Cells.lonToX(env(0), minLevel)
    val x1 = Cells.lonToX(env(2), minLevel)
    val y1 = Cells.latToY(env(1), minLevel) // south => larger y
    val y0 = Cells.latToY(env(3), minLevel)
    // envelope never wraps the antimeridian for our inputs; guard anyway
    val nx = 1L << minLevel
    val xs = if (x1 >= x0) (x0 to x1) else (x0 until nx) ++ (0L to x1)

    def visit(id: Long): Unit = {
      val e = Cells.envelope(id)
      rectPolyRelation(e(0), e(1), e(2), e(3), poly) match {
        case 0 => ()
        case 2 => out += ((id, true))
        case _ =>
          if (Cells.level(id) >= maxLevel) out += ((id, false))
          else Cells.children(id).foreach(visit)
      }
    }
    for (cx <- xs; cy <- y0 to y1) visit(Cells.fromXY(cx, cy, minLevel))
    out.toArray
  }

  /** Single-level cover (all cells at `level`). */
  def coverAt(poly: Array[Array[Double]], level: Int): Array[(Long, Boolean)] =
    cover(poly, level, level)
}

/**
 * Compact, broadcast-friendly probe structure: parallel sorted arrays
 * (cell -> entry range -> (featureIdx, full) entries). Probing a page is
 * one binary search per cover level actually present (<= 4 for the
 * res-7..10 analog), on primitive arrays — no per-row allocation.
 */
final class CoverIndex private (
    val cells: Array[Long],        // sorted distinct cover cell ids
    val offsets: Array[Int],       // len = cells.length + 1
    val featureIdx: Array[Int],    // entry -> feature ordinal
    val fullFlags: Array[Boolean], // entry -> cell fully inside feature
    val levels: Array[Int]         // distinct cover levels, descending (fine->coarse)
) extends Serializable {

  /** Entries for one cell id, or empty. */
  def lookup(cell: Long): IndexedSeq[(Int, Boolean)] = {
    val i = java.util.Arrays.binarySearch(cells, cell)
    if (i < 0) IndexedSeq.empty
    else (offsets(i) until offsets(i + 1)).map(e => (featureIdx(e), fullFlags(e)))
  }

  /** Candidate (featureIdx, full) pairs for a point: checks the point's
    * cell at each cover level present in the index. */
  def probe(lon: Double, lat: Double): IndexedSeq[(Int, Boolean)] = {
    val buf = scala.collection.mutable.ArrayBuffer.empty[(Int, Boolean)]
    probeEach(lon, lat)((fid, full) => buf += ((fid, full)))
    buf.toIndexedSeq
  }

  /** Allocation-free probe (hot path): invokes `f` per candidate entry,
    * walking the primitive arrays directly — the 96%-miss case touches
    * only `levels.length` binary searches and allocates nothing. */
  def probeEach(lon: Double, lat: Double)(f: (Int, Boolean) => Unit): Unit = {
    var li = 0
    while (li < levels.length) {
      val i = java.util.Arrays.binarySearch(cells, Cells.cellId(lon, lat, levels(li)))
      if (i >= 0) {
        var e = offsets(i)
        val end = offsets(i + 1)
        while (e < end) { f(featureIdx(e), fullFlags(e)); e += 1 }
      }
      li += 1
    }
  }

  def nCells: Int = cells.length
  def nEntries: Int = featureIdx.length
}

object CoverIndex {
  /** Build from (cellId, featureIdx, full) triples. */
  def build(entries: Iterable[(Long, Int, Boolean)]): CoverIndex = {
    val grouped = entries.toArray.sortBy(_._1)
    val cellsB = new scala.collection.mutable.ArrayBuilder.ofLong
    val offB = new scala.collection.mutable.ArrayBuilder.ofInt
    val featB = new scala.collection.mutable.ArrayBuilder.ofInt
    val fullB = new scala.collection.mutable.ArrayBuffer[Boolean]
    var i = 0
    offB += 0
    while (i < grouped.length) {
      val cell = grouped(i)._1
      cellsB += cell
      while (i < grouped.length && grouped(i)._1 == cell) {
        featB += grouped(i)._2
        fullB += grouped(i)._3
        i += 1
      }
      offB += fullB.length
    }
    val cells = cellsB.result()
    val lvls = cells.map(Cells.level).distinct.sorted(Ordering.Int.reverse)
    new CoverIndex(cells, offB.result(), featB.result(), fullB.toArray, lvls)
  }
}
