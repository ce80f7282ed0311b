package graft.expr

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** SQL-level geometry/grid type aliases (SURVEY.md §1.2). */
object GeoTypes {
  val pointType: StructType = StructType(Seq(
    StructField("x", DoubleType, nullable = false),
    StructField("y", DoubleType, nullable = false)))
  val ringType: ArrayType = ArrayType(pointType, containsNull = false)
  val polygonType: ArrayType = ArrayType(ringType, containsNull = false)
  val envelopeType: StructType = StructType(Seq(
    StructField("minx", DoubleType, nullable = false),
    StructField("miny", DoubleType, nullable = false),
    StructField("maxx", DoubleType, nullable = false),
    StructField("maxy", DoubleType, nullable = false)))
  val coverEntriesType: ArrayType = ArrayType(StructType(Seq(
    StructField("cell", LongType, nullable = false),
    StructField("full", BooleanType, nullable = false))), containsNull = false)
  val viewportType: StructType = StructType(Seq(
    StructField("fig_w_in", DoubleType, nullable = false),
    StructField("fig_h_in", DoubleType, nullable = false),
    StructField("aspect", DoubleType, nullable = false),
    StructField("marker_px", DoubleType, nullable = false)))
  val lonLatType: StructType = StructType(Seq(
    StructField("lon", DoubleType, nullable = false),
    StructField("lat", DoubleType, nullable = false)))
}

// ===========================================================================
// Ring / polygon scalar expressions. Reference semantics cited per class.
// Hot-path expressions implement doGenCode by delegating to the static
// GeoOps bridge so they stay inside whole-stage codegen; cold structural
// ones use CodegenFallback.
// ===========================================================================

/** Ring closure — reference utils.py:40-41 (exact tuple equality). */
case class ClosedRing(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(GeoTypes.ringType)
  override def dataType: DataType = GeoTypes.ringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "closed_ring"
  override protected def nullSafeEval(ring: Any): Any =
    GeoOps.closedRing(ring.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, r => s"graft.expr.GeoOps.closedRing($r)")
  override protected def withNewChildInternal(c: Expression): ClosedRing = copy(c)
}

/** Gaussian ring smoothing — reference utils.py:27-31 (scipy
  * gaussian_filter1d, mode='reflect', truncate=4.0, per axis). */
case class GaussianSmooth(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(GeoTypes.ringType, DoubleType)
  override def dataType: DataType = GeoTypes.ringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "gaussian_smooth"
  override protected def nullSafeEval(ring: Any, sigma: Any): Any =
    GeoOps.gaussianSmooth(ring.asInstanceOf[ArrayData], sigma.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (r, s) => s"graft.expr.GeoOps.gaussianSmooth($r, $s)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): GaussianSmooth =
    copy(l, r)
}

/** Polygon constructor with degenerate guards — reference utils.py:34-47
  * (<3 points or failed construction -> null/None). */
case class MakePolygon(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(GeoTypes.ringType)
  override def dataType: DataType = GeoTypes.polygonType
  override def nullable: Boolean = true
  override def prettyName: String = "make_polygon"
  override protected def nullSafeEval(ring: Any): Any =
    GeoOps.makePolygon(ring.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, r => s"""
      ${ev.value} = graft.expr.GeoOps.makePolygon($r);
      ${ev.isNull} = (${ev.value} == null);
    """)
  override protected def withNewChildInternal(c: Expression): MakePolygon = copy(c)
}

/** Strict point-in-polygon — reference utils.py:50-52 (shapely `contains`:
  * boundary points NOT contained). The J4 join's refine predicate. */
case class StContains(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(GeoTypes.polygonType, DoubleType, DoubleType)
  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "st_contains"
  override protected def nullSafeEval(p: Any, x: Any, y: Any): Any =
    GeoOps.stContains(p.asInstanceOf[ArrayData], x.asInstanceOf[Double], y.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (p, x, y) => s"graft.expr.GeoOps.stContains($p, $x, $y)")
  override protected def withNewChildrenInternal(f: Expression, s: Expression, t: Expression): StContains =
    copy(f, s, t)
}

/** Shell ring flattened to ARRAY<DOUBLE> (zero-alloc probe form). */
case class FlattenShell(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(GeoTypes.polygonType)
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "flatten_shell"
  override protected def nullSafeEval(p: Any): Any =
    GeoOps.flattenShell(p.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, p => s"graft.expr.GeoOps.flattenShell($p)")
  override protected def withNewChildInternal(c: Expression): FlattenShell = copy(c)
}

/** Strict PIP against a flattened shell ring (exterior-only, like the
  * reference's rendering path) — the join refine hot path. */
case class StContainsFlat(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(DoubleType, containsNull = false), DoubleType, DoubleType)
  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "st_contains_flat"
  override protected def nullSafeEval(f: Any, x: Any, y: Any): Any =
    GeoOps.stContainsFlat(f.asInstanceOf[ArrayData], x.asInstanceOf[Double], y.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (f, x, y) => s"graft.expr.GeoOps.stContainsFlat($f, $x, $y)")
  override protected def withNewChildrenInternal(f: Expression, s: Expression, t: Expression): StContainsFlat =
    copy(f, s, t)
}

/** Haversine meters to the nearest segment of a flattened closed shell
  * (q75 boundary-kNN metric) — kernel loop, codegen'd like the PIP
  * refine. */
case class StDistanceToShellM(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(DoubleType, containsNull = false), DoubleType, DoubleType)
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "st_distance_to_shell_m"
  override protected def nullSafeEval(f: Any, x: Any, y: Any): Any =
    GeoOps.stDistanceToShellM(f.asInstanceOf[ArrayData], x.asInstanceOf[Double], y.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (f, x, y) => s"graft.expr.GeoOps.stDistanceToShellM($f, $x, $y)")
  override protected def withNewChildrenInternal(f: Expression, s: Expression, t: Expression): StDistanceToShellM =
    copy(f, s, t)
}

/** Contains-or-boundary (conservative cover probes). */
case class StCovers(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(GeoTypes.polygonType, DoubleType, DoubleType)
  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "st_covers"
  override protected def nullSafeEval(p: Any, x: Any, y: Any): Any =
    GeoOps.stCovers(p.asInstanceOf[ArrayData], x.asInstanceOf[Double], y.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (p, x, y) => s"graft.expr.GeoOps.stCovers($p, $x, $y)")
  override protected def withNewChildrenInternal(f: Expression, s: Expression, t: Expression): StCovers =
    copy(f, s, t)
}

/** Ring/polygon validity — reference utils.py:57-62 (`is_valid` gates). */
case class StIsValid(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(GeoTypes.polygonType)
  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "st_isvalid"
  override protected def nullSafeEval(p: Any): Any =
    GeoOps.stIsValid(p.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, p => s"graft.expr.GeoOps.stIsValid($p)")
  override protected def withNewChildInternal(c: Expression): StIsValid = copy(c)
}

/** Polygon intersection — reference utils.py:55-66 (None on invalid/empty,
  * exception path -> row skipped: here null). */
case class StIntersection(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(GeoTypes.polygonType, GeoTypes.polygonType)
  override def dataType: DataType = GeoTypes.polygonType
  override def nullable: Boolean = true
  override def prettyName: String = "st_intersection"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    GeoOps.stIntersection(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      ${ev.value} = graft.expr.GeoOps.stIntersection($a, $b);
      ${ev.isNull} = (${ev.value} == null);
    """)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): StIntersection =
    copy(l, r)
}

/** Envelope — reference total_bounds/bounds (plot_courses.py:174-176,275). */
case class StEnvelope(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes with CodegenFallback {
  override def inputTypes: Seq[DataType] = Seq(GeoTypes.polygonType)
  override def dataType: DataType = GeoTypes.envelopeType
  override def nullable: Boolean = true
  override def prettyName: String = "st_envelope"
  override protected def nullSafeEval(p: Any): Any =
    GeoOps.stEnvelope(p.asInstanceOf[ArrayData])
  override protected def withNewChildInternal(c: Expression): StEnvelope = copy(c)
}

/** Planar polygon area (shell minus holes). */
case class StArea(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(GeoTypes.polygonType)
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "st_area"
  override protected def nullSafeEval(p: Any): Any =
    GeoOps.stArea(p.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, p => s"graft.expr.GeoOps.stArea($p)")
  override protected def withNewChildInternal(c: Expression): StArea = copy(c)
}

/** Haversine great-circle distance in meters. */
case class StDistanceM(first: Expression, second: Expression,
                       third: Expression, fourth: Expression)
    extends QuaternaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(DoubleType, DoubleType, DoubleType, DoubleType)
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "st_distance_m"
  override protected def nullSafeEval(a: Any, b: Any, c: Any, d: Any): Any =
    GeoOps.haversineM(a.asInstanceOf[Double], b.asInstanceOf[Double],
      c.asInstanceOf[Double], d.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b, c, d) => s"graft.expr.GeoOps.haversineM($a, $b, $c, $d)")
  override protected def withNewChildrenInternal(a: Expression, b: Expression,
      c: Expression, d: Expression): StDistanceM = copy(a, b, c, d)
}

// ===========================================================================
// Cell / tile expressions (north_star: "H3/S2 cell encoding ... batched
// columnar UDFs" — these are codegen'd Catalyst expressions, strictly
// faster than any UDF).
// ===========================================================================

/** 64-bit graft cell id (equirect Morton quadtree; see graft.index.Cells). */
case class CellId(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(DoubleType, DoubleType, IntegerType)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "cell_id"
  override protected def nullSafeEval(lon: Any, lat: Any, level: Any): Any =
    GeoOps.cellId(lon.asInstanceOf[Double], lat.asInstanceOf[Double], level.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (lon, lat, l) => s"graft.expr.GeoOps.cellId($lon, $lat, $l)")
  override protected def withNewChildrenInternal(f: Expression, s: Expression, t: Expression): CellId =
    copy(f, s, t)
}

case class CellParent(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(LongType, IntegerType)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "cell_parent"
  override protected def nullSafeEval(cell: Any, level: Any): Any =
    GeoOps.cellParent(cell.asInstanceOf[Long], level.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (c, l) => s"graft.expr.GeoOps.cellParent($c, $l)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): CellParent =
    copy(l, r)
}

case class CellLevel(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(LongType)
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "cell_level"
  override protected def nullSafeEval(cell: Any): Any =
    GeoOps.cellLevel(cell.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.GeoOps.cellLevel($c)")
  override protected def withNewChildInternal(c: Expression): CellLevel = copy(c)
}

/** Grid x of a cell id (Morton decode). */
case class CellX(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(LongType)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "cell_x"
  override protected def nullSafeEval(cell: Any): Any =
    GeoOps.cellX(cell.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.GeoOps.cellX($c)")
  override protected def withNewChildInternal(c: Expression): CellX = copy(c)
}

/** Grid y of a cell id (Morton decode). */
case class CellY(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(LongType)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "cell_y"
  override protected def nullSafeEval(cell: Any): Any =
    GeoOps.cellY(cell.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.GeoOps.cellY($c)")
  override protected def withNewChildInternal(c: Expression): CellY = copy(c)
}

/** Square ring of cells at Chebyshev distance r — kNN expansion step. */
case class RingCells(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(LongType, IntegerType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "ring_cells"
  override protected def nullSafeEval(cell: Any, r: Any): Any =
    GeoOps.ringCells(cell.asInstanceOf[Long], r.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (c, r) => s"graft.expr.GeoOps.ringCells($c, $r)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): RingCells =
    copy(l, r)
}

/** Disk (rings 0..r) of cells. */
case class DiskCells(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(LongType, IntegerType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "disk_cells"
  override protected def nullSafeEval(cell: Any, r: Any): Any =
    GeoOps.diskCells(cell.asInstanceOf[Long], r.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (c, r) => s"graft.expr.GeoOps.diskCells($c, $r)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DiskCells =
    copy(l, r)
}

case class CellCenter(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes with CodegenFallback {
  override def inputTypes: Seq[DataType] = Seq(LongType)
  override def dataType: DataType = GeoTypes.lonLatType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "cell_center"
  override protected def nullSafeEval(cell: Any): Any =
    GeoOps.cellCenter(cell.asInstanceOf[Long])
  override protected def withNewChildInternal(c: Expression): CellCenter = copy(c)
}

/** Great-circle lower bound from a point to a cell (kNN termination). */
case class CellMinDistanceM(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(LongType, DoubleType, DoubleType)
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "cell_min_distance_m"
  override protected def nullSafeEval(cell: Any, lon: Any, lat: Any): Any =
    GeoOps.cellMinDistanceM(cell.asInstanceOf[Long], lon.asInstanceOf[Double], lat.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (c, lon, lat) => s"graft.expr.GeoOps.cellMinDistanceM($c, $lon, $lat)")
  override protected def withNewChildrenInternal(f: Expression, s: Expression, t: Expression): CellMinDistanceM =
    copy(f, s, t)
}

/** Slippy tile x at zoom z (OSM Web-Mercator pyramid). */
case class TileX(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(DoubleType, IntegerType)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "tile_x"
  override protected def nullSafeEval(lon: Any, z: Any): Any =
    GeoOps.tileX(lon.asInstanceOf[Double], z.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (lon, z) => s"graft.expr.GeoOps.tileX($lon, $z)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): TileX = copy(l, r)
}

/** Slippy tile y at zoom z. */
case class TileY(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(DoubleType, IntegerType)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "tile_y"
  override protected def nullSafeEval(lat: Any, z: Any): Any =
    GeoOps.tileY(lat.asInstanceOf[Double], z.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (lat, z) => s"graft.expr.GeoOps.tileY($lat, $z)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): TileY = copy(l, r)
}

/** Bing-style quadkey string for tile (z, x, y). */
case class QuadkeyExpr(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(IntegerType, LongType, LongType)
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "quadkey"
  override protected def nullSafeEval(z: Any, x: Any, y: Any): Any =
    GeoOps.quadkey(z.asInstanceOf[Int], x.asInstanceOf[Long], y.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (z, x, y) => s"graft.expr.GeoOps.quadkey($z, $x, $y)")
  override protected def withNewChildrenInternal(f: Expression, s: Expression, t: Expression): QuadkeyExpr =
    copy(f, s, t)
}

/** Multi-resolution polygon cover — ARRAY<STRUCT<cell,full>> for explode
  * (north_star "H3 cover res 7-10"; graft levels 13-16 are the area
  * equivalent). */
case class CoverCells(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with ImplicitCastInputTypes with CodegenFallback {
  override def inputTypes: Seq[DataType] = Seq(GeoTypes.polygonType, IntegerType, IntegerType)
  override def dataType: DataType = GeoTypes.coverEntriesType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "cover_cells"
  override protected def nullSafeEval(p: Any, minL: Any, maxL: Any): Any =
    GeoOps.coverCells(p.asInstanceOf[ArrayData], minL.asInstanceOf[Int], maxL.asInstanceOf[Int])
  override protected def withNewChildrenInternal(f: Expression, s: Expression, t: Expression): CoverCells =
    copy(f, s, t)
}

/** Viewport struct from bounds — reference utils.py:69-80. */
case class Viewport(first: Expression, second: Expression,
                    third: Expression, fourth: Expression)
    extends QuaternaryExpression with ImplicitCastInputTypes with CodegenFallback {
  override def inputTypes: Seq[DataType] = Seq(DoubleType, DoubleType, DoubleType, DoubleType)
  override def dataType: DataType = GeoTypes.viewportType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "viewport"
  override protected def nullSafeEval(w: Any, s: Any, e: Any, n: Any): Any =
    GeoOps.viewport(w.asInstanceOf[Double], s.asInstanceOf[Double],
      e.asInstanceOf[Double], n.asInstanceOf[Double])
  override protected def withNewChildrenInternal(a: Expression, b: Expression,
      c: Expression, d: Expression): Viewport = copy(a, b, c, d)
}
