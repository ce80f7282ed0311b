package graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.graftShim.{column => toCol, expression => toExpr}
import graft.expr._

/**
 * Public Column API for every custom Catalyst expression the engine adds —
 * the `org.apache.spark.sql.functions`-style entry point users compose
 * with built-ins. All of these are native expressions (codegen'd where
 * hot), never Scala UDFs.
 */
object functions {

  // ---- geometry (reference semantics: /root/reference/src/python/utils.py) ----
  def closed_ring(ring: Column): Column = toCol(ClosedRing(toExpr(ring)))
  def gaussian_smooth(ring: Column, sigma: Column): Column =
    toCol(GaussianSmooth(toExpr(ring), toExpr(sigma)))
  def make_polygon(ring: Column): Column = toCol(MakePolygon(toExpr(ring)))
  def st_contains(poly: Column, x: Column, y: Column): Column =
    toCol(StContains(toExpr(poly), toExpr(x), toExpr(y)))
  def st_covers(poly: Column, x: Column, y: Column): Column =
    toCol(StCovers(toExpr(poly), toExpr(x), toExpr(y)))
  def flatten_shell(poly: Column): Column = toCol(FlattenShell(toExpr(poly)))
  def st_contains_flat(flat: Column, x: Column, y: Column): Column =
    toCol(StContainsFlat(toExpr(flat), toExpr(x), toExpr(y)))
  def st_isvalid(poly: Column): Column = toCol(StIsValid(toExpr(poly)))
  def st_intersection(a: Column, b: Column): Column =
    toCol(StIntersection(toExpr(a), toExpr(b)))
  def st_envelope(poly: Column): Column = toCol(StEnvelope(toExpr(poly)))
  def st_area(poly: Column): Column = toCol(StArea(toExpr(poly)))
  def st_distance_m(lon1: Column, lat1: Column, lon2: Column, lat2: Column): Column =
    toCol(StDistanceM(toExpr(lon1), toExpr(lat1), toExpr(lon2), toExpr(lat2)))
  def st_distance_to_shell_m(flat: Column, x: Column, y: Column): Column =
    toCol(StDistanceToShellM(toExpr(flat), toExpr(x), toExpr(y)))
  def viewport(w: Column, s: Column, e: Column, n: Column): Column =
    toCol(Viewport(toExpr(w), toExpr(s), toExpr(e), toExpr(n)))

  // ---- cells / tiles (north_star H3/S2 + slippy roles) ----
  def cell_id(lon: Column, lat: Column, level: Column): Column =
    toCol(CellId(toExpr(lon), toExpr(lat), toExpr(level)))
  def cell_parent(cell: Column, level: Column): Column =
    toCol(CellParent(toExpr(cell), toExpr(level)))
  def cell_level(cell: Column): Column = toCol(CellLevel(toExpr(cell)))
  def cell_x(cell: Column): Column = toCol(CellX(toExpr(cell)))
  def cell_y(cell: Column): Column = toCol(CellY(toExpr(cell)))
  def ring_cells(cell: Column, r: Column): Column =
    toCol(RingCells(toExpr(cell), toExpr(r)))
  def disk_cells(cell: Column, r: Column): Column =
    toCol(DiskCells(toExpr(cell), toExpr(r)))
  def cell_center(cell: Column): Column = toCol(CellCenter(toExpr(cell)))
  def cell_min_distance_m(cell: Column, lon: Column, lat: Column): Column =
    toCol(CellMinDistanceM(toExpr(cell), toExpr(lon), toExpr(lat)))
  def tile_x(lon: Column, z: Column): Column = toCol(TileX(toExpr(lon), toExpr(z)))
  def tile_y(lat: Column, z: Column): Column = toCol(TileY(toExpr(lat), toExpr(z)))
  def quadkey(z: Column, x: Column, y: Column): Column =
    toCol(QuadkeyExpr(toExpr(z), toExpr(x), toExpr(y)))
  def cover_cells(poly: Column, minLevel: Column, maxLevel: Column): Column =
    toCol(CoverCells(toExpr(poly), toExpr(minLevel), toExpr(maxLevel)))

  // ---- raster artifact sink (reference plot_courses.py:309-316) ----
  def png_encode(pixels: Column, width: Column, rgb: Column): Column =
    toCol(PngEncode(toExpr(pixels), toExpr(width), toExpr(rgb)))

  // ---- text / dedup / embeddings (training-data pipeline operators) ----
  def hash_text(s: Column): Column = toCol(HashText(toExpr(s)))
  def mix64(z: Column): Column = toCol(Mix64(toExpr(z)))
  def leading_zeros(z: Column): Column = toCol(LeadingZeros(toExpr(z)))
  def nfc_normalize(s: Column): Column = toCol(NfcNormalize(toExpr(s)))
  def word_shingles(s: Column, n: Column): Column =
    toCol(WordShingles(toExpr(s), toExpr(n)))
  def char_shingles(s: Column, n: Column): Column =
    toCol(CharShingles(toExpr(s), toExpr(n)))
  def hashed_char_shingles(s: Column, n: Column): Column =
    toCol(HashedCharShingles(toExpr(s), toExpr(n)))
  def hashed_word_shingles(s: Column, n: Column): Column =
    toCol(HashedWordShingles(toExpr(s), toExpr(n)))
  def gear_cuts(s: Column, maskBits: Column): Column =
    toCol(GearCuts(toExpr(s), toExpr(maskBits)))
  def sorted_jaccard(a: Column, b: Column): Column =
    toCol(SortedJaccard(toExpr(a), toExpr(b)))
  def minhash(shingles: Column, k: Column, seed: Column): Column =
    toCol(MinHash(toExpr(shingles), toExpr(k), toExpr(seed)))
  def lsh_bands(sig: Column, rowsPerBand: Column): Column =
    toCol(LshBands(toExpr(sig), toExpr(rowsPerBand)))
  def simhash(shingles: Column): Column = toCol(SimHash(toExpr(shingles)))
  def hamming_dist(a: Column, b: Column): Column =
    toCol(HammingDist(toExpr(a), toExpr(b)))
  def keyed_dot(a: Column, b: Column): Column =
    toCol(KeyedDot(toExpr(a), toExpr(b)))
  def bm25_fold(qarr: Column, ps: Column, kdoc: Column): Column =
    toCol(Bm25Fold(toExpr(qarr), toExpr(ps), toExpr(kdoc)))
  def dot_sim(a: Column, b: Column): Column =
    toCol(DotSim(toExpr(a), toExpr(b)))
  def cosine_sim(a: Column, b: Column): Column =
    toCol(CosineSim(toExpr(a), toExpr(b)))
  def hyperplane_lsh(v: Column, bits: Column, seed: Column): Column =
    toCol(HyperplaneLsh(toExpr(v), toExpr(bits), toExpr(seed)))
  def fingerprint(s: Column): Column = toCol(Fingerprint(toExpr(s)))

  type Builder = Seq[org.apache.spark.sql.catalyst.expressions.Expression] =>
    org.apache.spark.sql.catalyst.expressions.Expression

  /** Every SQL-exposed function: name -> expression builder. Consumed by
    * [[registerAll]] (imperative registration) and [[graft.GraftExtensions]]
    * (`spark.sql.extensions` injection at session build). */
  val builders: Seq[(String, Builder)] = Seq(
    "closed_ring" -> ((e => ClosedRing(e.head)): Builder),
    "gaussian_smooth" -> ((e => GaussianSmooth(e(0), e(1))): Builder),
    "make_polygon" -> ((e => MakePolygon(e.head)): Builder),
    "st_contains" -> ((e => StContains(e(0), e(1), e(2))): Builder),
    "st_covers" -> ((e => StCovers(e(0), e(1), e(2))): Builder),
    "png_encode" -> ((e => PngEncode(e(0), e(1), e(2))): Builder),
    "flatten_shell" -> ((e => FlattenShell(e.head)): Builder),
    "st_contains_flat" -> ((e => StContainsFlat(e(0), e(1), e(2))): Builder),
    "st_distance_to_shell_m" -> ((e => StDistanceToShellM(e(0), e(1), e(2))): Builder),
    "st_isvalid" -> ((e => StIsValid(e.head)): Builder),
    "st_intersection" -> ((e => StIntersection(e(0), e(1))): Builder),
    "st_envelope" -> ((e => StEnvelope(e.head)): Builder),
    "st_area" -> ((e => StArea(e.head)): Builder),
    "st_distance_m" -> ((e => StDistanceM(e(0), e(1), e(2), e(3))): Builder),
    "viewport" -> ((e => Viewport(e(0), e(1), e(2), e(3))): Builder),
    "cell_id" -> ((e => CellId(e(0), e(1), e(2))): Builder),
    "cell_parent" -> ((e => CellParent(e(0), e(1))): Builder),
    "cell_level" -> ((e => CellLevel(e.head)): Builder),
    "cell_x" -> ((e => CellX(e.head)): Builder),
    "cell_y" -> ((e => CellY(e.head)): Builder),
    "ring_cells" -> ((e => RingCells(e(0), e(1))): Builder),
    "disk_cells" -> ((e => DiskCells(e(0), e(1))): Builder),
    "cell_center" -> ((e => CellCenter(e.head)): Builder),
    "cell_min_distance_m" -> ((e => CellMinDistanceM(e(0), e(1), e(2))): Builder),
    "tile_x" -> ((e => TileX(e(0), e(1))): Builder),
    "tile_y" -> ((e => TileY(e(0), e(1))): Builder),
    "quadkey" -> ((e => QuadkeyExpr(e(0), e(1), e(2))): Builder),
    "cover_cells" -> ((e => CoverCells(e(0), e(1), e(2))): Builder),
    "hash_text" -> ((e => HashText(e.head)): Builder),
    "word_shingles" -> ((e => WordShingles(e(0), e(1))): Builder),
    "char_shingles" -> ((e => CharShingles(e(0), e(1))): Builder),
    "hashed_char_shingles" -> ((e => HashedCharShingles(e(0), e(1))): Builder),
    "hashed_word_shingles" -> ((e => HashedWordShingles(e(0), e(1))): Builder),
    "gear_cuts" -> ((e => GearCuts(e(0), e(1))): Builder),
    "sorted_jaccard" -> ((e => SortedJaccard(e(0), e(1))): Builder),
    "keyed_dot" -> ((e => KeyedDot(e(0), e(1))): Builder),
    "bm25_fold" -> ((e => Bm25Fold(e(0), e(1), e(2))): Builder),
    "minhash" -> ((e => MinHash(e(0), e(1), e(2))): Builder),
    "lsh_bands" -> ((e => LshBands(e(0), e(1))): Builder),
    "simhash" -> ((e => SimHash(e.head)): Builder),
    "hamming_dist" -> ((e => HammingDist(e(0), e(1))): Builder),
    "cosine_sim" -> ((e => CosineSim(e(0), e(1))): Builder),
    "dot_sim" -> ((e => DotSim(e(0), e(1))): Builder),
    "hyperplane_lsh" -> ((e => HyperplaneLsh(e(0), e(1), e(2))): Builder),
    "fingerprint" -> ((e => Fingerprint(e.head)): Builder))

  /** Register every graft function for SQL use (`SELECT st_contains(...)`).
    * Idempotent per session — repeat calls (every query closure calls this
    * defensively) don't re-register or warn. */
  def registerAll(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    // idempotence sentinel: a graft-unique name, so a foreign library's
    // st_contains can never suppress (or be shadowed silently by) ours
    if (reg.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier("hashed_char_shingles")))
      return
    builders.foreach { case (name, b) =>
      reg.createOrReplaceTempFunction(name, b, "built-in")
    }
  }
}
