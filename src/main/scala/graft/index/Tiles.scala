package graft.index

/**
 * Slippy-map tiles (z/x/y) + quadkeys — the engine's raster tiling scheme
 * (BASELINE.json north_star: "tile (slippy z/x/y and H3) assignments").
 * The reference's raster analog is the envelope-bounded texture grid at
 * `/root/reference/src/python/plot_courses.py:172-207`; slippy tiles are
 * the standard Web-Mercator pyramid (public OSM spec), used here so tile
 * ids are globally meaningful and reverse-lookupable.
 */
object Tiles {

  /** Web-Mercator latitude clamp. */
  final val MaxLat = 85.05112878
  final val MinLat = -85.05112878

  @inline private def clamp(v: Double, lo: Double, hi: Double): Double =
    if (v < lo) lo else if (v > hi) hi else v

  /** Tile x at zoom z for a longitude. */
  def lonToTileX(lon: Double, z: Int): Long = {
    val n = 1L << z
    val x = ((lon + 180.0) / 360.0 * n).toLong
    if (x < 0) 0L else if (x >= n) n - 1 else x
  }

  /** Tile y at zoom z for a latitude (Web-Mercator projection). */
  def latToTileY(lat: Double, z: Int): Long = {
    val n = 1L << z
    val latR = Math.toRadians(clamp(lat, MinLat, MaxLat))
    val y = ((1.0 - Math.log(Math.tan(latR) + 1.0 / Math.cos(latR)) / Math.PI) / 2.0 * n).toLong
    if (y < 0) 0L else if (y >= n) n - 1 else y
  }

  /** West edge longitude of tile x at zoom z. */
  def tileXToLon(x: Long, z: Int): Double = x.toDouble / (1L << z) * 360.0 - 180.0

  /** North edge latitude of tile y at zoom z. */
  def tileYToLat(y: Long, z: Int): Double = {
    val n = Math.PI - 2.0 * Math.PI * y.toDouble / (1L << z)
    Math.toDegrees(Math.atan(Math.sinh(n)))
  }

  /** Bing-style quadkey for tile (z, x, y): z characters of '0'..'3'. */
  def quadkey(z: Int, x: Long, y: Long): String = {
    val sb = new java.lang.StringBuilder(z)
    var i = z
    while (i > 0) {
      val mask = 1L << (i - 1)
      var digit = 0
      if ((x & mask) != 0) digit += 1
      if ((y & mask) != 0) digit += 2
      sb.append(('0' + digit).toChar)
      i -= 1
    }
    sb.toString
  }

  /** Parse a quadkey back to (z, x, y). */
  def fromQuadkey(qk: String): (Int, Long, Long) = {
    var x = 0L; var y = 0L
    val z = qk.length
    var i = 0
    while (i < z) {
      x <<= 1; y <<= 1
      qk.charAt(i) match {
        case '1' => x |= 1
        case '2' => y |= 1
        case '3' => x |= 1; y |= 1
        case _ =>
      }
      i += 1
    }
    (z, x, y)
  }
}
