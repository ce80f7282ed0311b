package graft.index

/**
 * Hierarchical 64-bit geocells ("graft cells") — the engine's H3/S2-role
 * index (BASELINE.json north_star: "custom Catalyst expressions for H3/S2
 * cell encoding", "cell-ring-expansion kNN"). Written from scratch.
 *
 * Scheme: an equirectangular quadtree over lon∈[-180,180), lat∈[-90,90]
 * with Morton (Z-order) bit interleaving:
 *
 *   id = (1L << (2*level)) | morton(x, y)
 *   x  = floor((lon+180)/360 * 2^level)   (wraps mod 2^level)
 *   y  = floor((90-lat)/180 * 2^level)    (clamped)
 *
 * The sentinel bit makes the level self-describing (level = floor(log4)),
 * parent(id) = id >> 2, children(id) = id<<2 | {0,1,2,3} — the same
 * algebra H3/S2 expose. Levels 0..30 fit in 61 bits. Unlike H3's
 * icosahedral aperture-7 grid, neighbor math here is exact integer
 * arithmetic everywhere (x wraps at the antimeridian, y clamps at the
 * poles), which makes ring-expansion kNN provably correct — the property
 * the north star actually needs.
 *
 * Approximate area equivalence at the equator (for the "H3 res 7-10"
 * cover mandate): graft level 13 ≈ H3 res 7 (~4.9 km cells), level 14 ≈
 * res 8, level 15 ≈ res 9, level 16 ≈ H3 res 10 (~0.6 km cells).
 */
object Cells {

  final val MaxLevel = 30

  /** Spread the low 31 bits of v to even bit positions of a Long. */
  @inline def spreadBits(v: Long): Long = {
    var x = v & 0x7fffffffL
    x = (x | (x << 16)) & 0x0000ffff0000ffffL
    x = (x | (x << 8)) & 0x00ff00ff00ff00ffL
    x = (x | (x << 4)) & 0x0f0f0f0f0f0f0f0fL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  /** Inverse of spreadBits. */
  @inline def compactBits(v: Long): Long = {
    var x = v & 0x5555555555555555L
    x = (x | (x >> 1)) & 0x3333333333333333L
    x = (x | (x >> 2)) & 0x0f0f0f0f0f0f0f0fL
    x = (x | (x >> 4)) & 0x00ff00ff00ff00ffL
    x = (x | (x >> 8)) & 0x0000ffff0000ffffL
    x = (x | (x >> 16)) & 0x00000000ffffffffL
    x
  }

  @inline def morton(x: Long, y: Long): Long = spreadBits(x) | (spreadBits(y) << 1)

  /** Grid x index at a level for a longitude (wraps). */
  def lonToX(lon: Double, level: Int): Long = {
    val n = 1L << level
    var x = Math.floor((lon + 180.0) / 360.0 * n).toLong
    x %= n
    if (x < 0) x += n
    x
  }

  /** Grid y index at a level for a latitude (clamped at poles). */
  def latToY(lat: Double, level: Int): Long = {
    val n = 1L << level
    val y = Math.floor((90.0 - lat) / 180.0 * n).toLong
    if (y < 0) 0L else if (y >= n) n - 1 else y
  }

  def fromXY(x: Long, y: Long, level: Int): Long =
    (1L << (2 * level)) | morton(x, y)

  def cellId(lon: Double, lat: Double, level: Int): Long =
    fromXY(lonToX(lon, level), latToY(lat, level), level)

  def level(id: Long): Int = (63 - java.lang.Long.numberOfLeadingZeros(id)) / 2

  def x(id: Long): Long = {
    val l = level(id)
    compactBits(id & ((1L << (2 * l)) - 1))
  }

  def y(id: Long): Long = {
    val l = level(id)
    compactBits((id & ((1L << (2 * l)) - 1)) >> 1)
  }

  def parent(id: Long): Long = id >> 2

  def parentAt(id: Long, targetLevel: Int): Long = {
    val l = level(id)
    require(targetLevel <= l, s"parentAt: target $targetLevel above level $l")
    id >> (2 * (l - targetLevel))
  }

  def children(id: Long): Array[Long] =
    Array(id << 2, (id << 2) | 1, (id << 2) | 2, (id << 2) | 3)

  /** Cell envelope as (west, south, east, north) degrees. */
  def envelope(id: Long): Array[Double] = {
    val l = level(id)
    val n = 1L << l
    val cx = x(id); val cy = y(id)
    val west = cx.toDouble / n * 360.0 - 180.0
    val east = (cx + 1).toDouble / n * 360.0 - 180.0
    val north = 90.0 - cy.toDouble / n * 180.0
    val south = 90.0 - (cy + 1).toDouble / n * 180.0
    Array(west, south, east, north)
  }

  /** Cell center (lon, lat). */
  def center(id: Long): Array[Double] = {
    val e = envelope(id)
    Array((e(0) + e(2)) / 2.0, (e(1) + e(3)) / 2.0)
  }

  /**
   * Square ring of cells at Chebyshev grid distance r from `id` (r=0 =>
   * just the cell). x wraps at the antimeridian; rows clamped off at the
   * poles are dropped. Used for kNN ring expansion (north_star).
   */
  def ringCells(id: Long, r: Int): Array[Long] = {
    val l = level(id)
    val n = 1L << l
    val cx = x(id); val cy = y(id)
    if (r == 0) return Array(id)
    val out = new scala.collection.mutable.ArrayBuilder.ofLong
    out.sizeHint(8 * r)
    @inline def add(xx: Long, yy: Long): Unit = {
      if (yy >= 0 && yy < n) {
        var wx = xx % n
        if (wx < 0) wx += n
        out += fromXY(wx, yy, l)
      }
    }
    var i = -r
    while (i <= r) {                 // top and bottom rows
      add(cx + i, cy - r)
      add(cx + i, cy + r)
      i += 1
    }
    i = -r + 1
    while (i <= r - 1) {             // left and right columns (no corners)
      add(cx - r, cy + i)
      add(cx + r, cy + i)
      i += 1
    }
    out.result()
  }

  /** All cells within Chebyshev distance r (disk = rings 0..r). */
  def diskCells(id: Long, r: Int): Array[Long] = {
    val b = new scala.collection.mutable.ArrayBuilder.ofLong
    var i = 0
    while (i <= r) { b ++= ringCells(id, i); i += 1 }
    b.result()
  }

  /** Minimum great-circle distance (m) from a point to a cell's envelope —
    * the lower bound that terminates kNN ring expansion. */
  def minDistanceM(id: Long, lon: Double, lat: Double): Double = {
    val e = envelope(id)
    val clat = if (lat < e(1)) e(1) else if (lat > e(3)) e(3) else lat
    // closest lon on the cell's [w, e] span IN WRAPPED ANGULAR TERMS: a
    // point just west of the antimeridian is nearest the cell's EAST edge
    // when the cell hugs the antimeridian's other side — linear clamping
    // would pick the far edge and break the lower-bound contract
    val clon =
      if (lon >= e(0) && lon <= e(2)) lon
      else {
        def wrapped(a: Double, b: Double): Double = {
          val d = Math.abs(a - b) % 360.0
          if (d > 180.0) 360.0 - d else d
        }
        if (wrapped(lon, e(0)) <= wrapped(lon, e(2))) e(0) else e(2)
      }
    graft.geom.Geom.haversineM(lon, lat, clon, clat)
  }
}
