package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions._

/**
 * Reference-parity course operators (SURVEY.md §2), each a declarative
 * DataFrame transformation over the flat gpsItem frame from
 * [[graft.data.Courses.itemsDf]]:
 *   (clubId, courseId, holeNumber, itemType, shape ARRAY<STRUCT<x,y>>)
 *
 * The per-hole dataflow mirrors plot_courses.py:209-321: boundary pass ->
 * clean (smooth sigma=1, close, polygonize) -> item pass (clip polygons,
 * vertex-filter lines, contain-filter markers) -> catalog join -> z-order
 * draw list -> envelope/viewport -> tile masks.
 */
object CourseEngine {

  val holeKey: Seq[String] = Seq("clubId", "courseId", "holeNumber")

  /** Boundary per hole, cleaned like the reference (utils.py:27-47 via
    * plot_courses.py:216-229): FIRST HoleBoundary item of each hole,
    * gaussian-smoothed (sigma=1), re-closed, polygonized (null if
    * degenerate). P3 + F1 + F2 + F3. */
  def boundaries(items: DataFrame): DataFrame = {
    // "first" = smallest itemSeq (position within the hole's gpsItems) —
    // deterministic at any partitioning/split layout, unlike a
    // monotonically_increasing_id tiebreak
    val w = Window.partitionBy(holeKey.map(col): _*).orderBy(col("itemSeq"))
    items
      .filter(col("itemType") === "HoleBoundary")            // P3 selection
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)                                // first + break (:229)
      .select(
        col("clubId"), col("courseId"), col("holeNumber"),
        make_polygon(closed_ring(gaussian_smooth(col("shape"), lit(1.0)))).as("boundary"))
      .filter(col("boundary").isNotNull)                      // P11 integrity gate (:268-272)
  }

  /** MULTI-PIECE boundary per hole — the capability past the reference's
    * crash point (plot_courses.py:318 assumes exactly one Polygon;
    * exceeding it is the point): EVERY HoleBoundary item of a hole
    * becomes one disjoint piece (cleaned exactly like [[boundaries]];
    * degenerate pieces dropped), assembled in itemSeq order into one
    * ARRAY<ring> polygon — the engine's multi-ring = disjoint-pieces
    * model, which the cover builder, st_contains, and the flat refine
    * kernels all already honor. Holes with a single HoleBoundary item
    * produce bit-identical single-ring boundaries to [[boundaries]]. */
  def boundariesMulti(items: DataFrame): DataFrame =
    items
      .filter(col("itemType") === "HoleBoundary")
      .select(col("clubId"), col("courseId"), col("holeNumber"), col("itemSeq"),
        make_polygon(closed_ring(gaussian_smooth(col("shape"), lit(1.0)))).as("piece"))
      .filter(col("piece").isNotNull)
      .groupBy(holeKey.map(col): _*)
      .agg(flatten(transform(
        array_sort(collect_list(struct(col("itemSeq"), col("piece")))),
        s => s("piece"))).as("boundary"))

  /** Non-boundary items joined to their hole's boundary (J1's equi part).
    * The boundary side is one row per hole -> broadcast. */
  def itemsWithBoundary(items: DataFrame, bounds: DataFrame): DataFrame =
    items.filter(col("itemType") =!= "HoleBoundary")          // P4 anti-filter
      .join(broadcast(bounds), holeKey)

  /** P5 catalog dispatch with the reference's unknown-type semantics
    * (plot_courses.py:138-140 logs a warning and skips): LEFT join the
    * full 14-row catalog, surface the unknown-itemType row count as an
    * observed metric (`<metricName>.n_unknown_items`, readable from
    * `df.queryExecution.observedMetrics` after any action), THEN filter
    * to the wanted category — unknown types are counted, never silently
    * inner-joined away.
    *
    * CollectMetrics names must be unique WITHIN one resolved plan, so a
    * query that composes the same public helper twice (e.g. a union of
    * two clippedPolygons subtrees) must disambiguate via the helper's
    * `metricName` parameter — same-name composition throws
    * AnalysisException at analysis time, never silently miscounts. */
  private def catalogJoin(withBounds: DataFrame, category: String,
                          metricName: String): DataFrame =
    withBounds
      .join(broadcast(Catalog.df(withBounds.sparkSession)), Seq("itemType"), "left")
      .observe(metricName,
        sum(when(col("category").isNull, 1L).otherwise(0L)).as("n_unknown_items"))
      .filter(col("category") === category)

  /** Translate every vertex of a polygon (ARRAY<ARRAY<STRUCT<x,y>>>). */
  private def translatePoly(p: Column, dx: Column, dy: Column): Column =
    transform(p, ring => transform(ring,
      pt => struct((pt("x") + dx).as("x"), (pt("y") + dy).as("y"))))

  /** Polygon items clipped to the boundary — J1/U3 (plot_courses.py:258-264
    * via utils.py:55-66): smooth+close+polygonize the item, intersect with
    * boundary, drop empty/invalid (null) results; keep items with >=3
    * in-boundary vertices (P6).
    *
    * The intersection runs in a BOUNDARY-LOCAL FRAME (both rings
    * translated by the boundary's first vertex): at lon ~ 116 the clip
    * arithmetic's crossing points carry ~1e-14 absolute error, while in
    * the local frame (coords ~1e-3) the same ops are accurate to ~1e-19 —
    * the difference between a clip area an independent engine reproduces
    * to ~1e-16 and one that drifts at 1e-10 (q43 compares on a 1e-10
    * grid; the boundary margin is pinned in PipelineSpec). The output
    * geometry is translated back (a <=1-ulp-of-longitude effect,
    * irrelevant to rendering); `clip_area` is measured in the local
    * frame. */
  def clippedPolygons(items: DataFrame, bounds: DataFrame,
                      metricName: String = "unknown_items_polygon"): DataFrame = {
    val b0x = col("boundary").getItem(0).getItem(0).getField("x")
    val b0y = col("boundary").getItem(0).getItem(0).getField("y")
    catalogJoin(itemsWithBoundary(items, bounds), "polygon", metricName)
      .filter(size(col("shape")) > 2)                         // P6 polygons >= 3
      .withColumn("poly", make_polygon(closed_ring(gaussian_smooth(col("shape"), lit(1.0)))))
      .filter(col("poly").isNotNull)
      .withColumn("b0x", b0x).withColumn("b0y", b0y)
      .withColumn("clippedT", st_intersection(
        translatePoly(col("poly"), -col("b0x"), -col("b0y")),
        translatePoly(col("boundary"), -col("b0x"), -col("b0y"))))
      .filter(col("clippedT").isNotNull)                      // empty/invalid -> dropped (:260)
      .select(col("clubId"), col("courseId"), col("holeNumber"), col("itemSeq"),
        col("itemType"), col("zorder"),
        translatePoly(col("clippedT"), col("b0x"), col("b0y")).as("clipped"),
        st_area(col("clippedT")).as("clip_area"))
  }

  /** Line items vertex-filtered to the boundary — P8 (plot_courses.py:
    * 242-244): keep only vertices strictly inside; keep lines with >= 2
    * surviving vertices (P6). NOT a geometric clip — segments crossing the
    * boundary are joined, matching the reference's vertex-drop semantics. */
  def clippedLines(items: DataFrame, bounds: DataFrame,
                   metricName: String = "unknown_items_line"): DataFrame =
    catalogJoin(itemsWithBoundary(items, bounds), "line", metricName)
      .withColumn("inside",
        expr("filter(shape, p -> st_contains(boundary, p.x, p.y))"))
      .filter(size(col("inside")) > 1)                        // P6 lines >= 2 (:243)
      .select(col("clubId"), col("courseId"), col("holeNumber"), col("itemSeq"),
        col("itemType"), col("zorder"), col("color"), col("lineWidth"),
        col("inside").as("line"))

  /** Markers kept only if strictly inside the boundary — P9
    * (plot_courses.py:148-151), with pixel placement math (F6). */
  def markers(items: DataFrame, bounds: DataFrame,
              metricName: String = "unknown_items_marker"): DataFrame =
    catalogJoin(itemsWithBoundary(items, bounds), "marker", metricName)
      .filter(size(col("shape")) === 1)
      .select(col("clubId"), col("courseId"), col("holeNumber"), col("itemSeq"),
        col("itemType"), col("zorder"),
        col("shape").getItem(0).getField("x").as("x"),
        col("shape").getItem(0).getField("y").as("y"),
        col("boundary"))
      .filter(st_contains(col("boundary"), col("x"), col("y")))
      .drop("boundary")
      .withColumn("marker_zoom", lit(graft.geom.Geom.MarkerSizeM / graft.geom.Geom.MetersPerPixel / 200.0))

  /** Painter's-order draw list per hole — A3/W3 (zorder ladder,
    * plot_courses.py:59-76; boundary first at zorder 0). One row per
    * drawable with a per-hole draw_seq. */
  def drawList(items: DataFrame, bounds: DataFrame): DataFrame = {
    val spark = items.sparkSession
    val b = bounds.select(col("clubId"), col("courseId"), col("holeNumber"),
      lit(-1).as("itemSeq"), lit("HoleBoundary").as("itemType"), lit(0).as("zorder"),
      to_json(col("boundary")).as("geometry"), lit("polygon").as("category"))
    val polys = clippedPolygons(items, bounds)
      .select(col("clubId"), col("courseId"), col("holeNumber"), col("itemSeq"),
        col("itemType"), col("zorder"), to_json(col("clipped")).as("geometry"),
        lit("polygon").as("category"))
    val lines = clippedLines(items, bounds)
      .select(col("clubId"), col("courseId"), col("holeNumber"), col("itemSeq"),
        col("itemType"), col("zorder"), to_json(col("line")).as("geometry"),
        lit("line").as("category"))
    val marks = markers(items, bounds)
      .select(col("clubId"), col("courseId"), col("holeNumber"), col("itemSeq"),
        col("itemType"), col("zorder"), to_json(struct(col("x"), col("y"))).as("geometry"),
        lit("marker").as("category"))
    val all = b.unionByName(polys).unionByName(lines).unionByName(marks)
    // tiebreak within (zorder, itemType) by the item's stable position in
    // the hole's gpsItems (the boundary sorts first at -1) — a key an
    // independent engine can reproduce, unlike the serialized-geometry
    // string it replaces (GH piece vertex order is an implementation
    // detail no oracle should have to match)
    val w = Window.partitionBy(holeKey.map(col): _*)
      .orderBy(col("zorder"), col("itemType"), col("itemSeq"))
    all.withColumn("draw_seq", row_number().over(w))
  }

  /** Per-hole envelope + figure viewport — A1 + F4 + R3
    * (plot_courses.py:274-292, utils.py:69-80). */
  def viewports(bounds: DataFrame): DataFrame =
    bounds
      .withColumn("env", st_envelope(col("boundary")))
      .select(col("clubId"), col("courseId"), col("holeNumber"), col("env"),
        viewport(col("env.minx"), col("env.miny"), col("env.maxx"), col("env.maxy")).as("vp"))
      .select(col("clubId"), col("courseId"), col("holeNumber"),
        col("env.minx").as("west"), col("env.miny").as("south"),
        col("env.maxx").as("east"), col("env.maxy").as("north"),
        col("vp.fig_w_in"), col("vp.fig_h_in"), col("vp.aspect"), col("vp.marker_px"))

  /**
   * Rasterize boundaries to slippy-tile coverage masks — R1
   * (plot_courses.py:172-207's texture grid, on the global z/x/y pyramid).
   * Each covering tile gets an 8x8 sampled boolean mask of st_covers hits
   * packed into a LONG bitmask + a coverage fraction. J6's inverted index
   * is the (z,x,y) -> feature reverse of this output.
   */
  def tileMasks(bounds: DataFrame, zoom: Int): DataFrame = {
    val b = bounds
      .withColumn("env", st_envelope(col("boundary")))
      .withColumn("tx0", tile_x(col("env.minx"), lit(zoom)))
      .withColumn("tx1", tile_x(col("env.maxx"), lit(zoom)))
      .withColumn("ty0", tile_y(col("env.maxy"), lit(zoom))) // north -> smaller y
      .withColumn("ty1", tile_y(col("env.miny"), lit(zoom)))
      .withColumn("tx", explode(sequence(col("tx0"), col("tx1"))))
      .withColumn("ty", explode(sequence(col("ty0"), col("ty1"))))
    // 8x8 sample grid inside each tile: mask bit i*8+j set when the sample
    // point is covered by the boundary polygon
    val masked = b.withColumn("mask",
      expr(
        s"""aggregate(
           |  flatten(transform(sequence(0, 7), i ->
           |    transform(sequence(0, 7), j ->
           |      CASE WHEN st_covers(boundary,
           |        (CAST(tx AS DOUBLE) + (CAST(j AS DOUBLE) + 0.5) / 8.0) / ${1L << zoom}.0 * 360.0 - 180.0,
           |        degrees(atan(sinh(pi() * (1.0 - 2.0 * (CAST(ty AS DOUBLE) + (CAST(i AS DOUBLE) + 0.5) / 8.0) / ${1L << zoom}.0))))
           |      ) THEN shiftleft(1L, i * 8 + j) ELSE 0L END))),
           |  0L, (acc, v) -> acc | v)""".stripMargin))
    masked
      .filter(col("mask") =!= 0L)
      .select(col("clubId"), col("courseId"), col("holeNumber"),
        lit(zoom).as("z"), col("tx").as("x"), col("ty").as("y"),
        quadkey(lit(zoom), col("tx"), col("ty")).as("qk"),
        col("mask"),
        (expr("bit_count(mask)") / lit(64.0)).as("coverage"))
  }

  /**
   * Tile-pyramid rollup (q81): aggregate leaf-zoom coverage masks up the
   * slippy pyramid to `minZoom` — the serving-side index a map stack
   * queries at every zoom. Pure bit math: the zoom-(z-d) parent of tile
   * (x, y) is (x >> d, y >> d), so the whole pyramid is ONE explode of
   * (zoom-minZoom+1) literal-shift branches followed by ONE groupBy.
   * Shuffle count is depth-independent: the n_features countDistinct
   * plans Spark's standard two-phase distinct rewrite (partials on
   * (tile, feature), then (tile)) — two pyramid-keyed exchanges total,
   * regardless of how many zoom levels roll up. `sum_coverage` sums
   * exact 1/64-dyadic fractions, so it is bit-identical at any
   * partitioning / aggregation order (no float-order caveat).
   */
  def tilePyramid(masks: DataFrame, zoom: Int, minZoom: Int): DataFrame = {
    require(minZoom <= zoom, s"minZoom $minZoom must be <= leaf zoom $zoom")
    val levels = (0 to zoom - minZoom).map { d =>
      struct(lit(zoom - d).as("pz"),
        shiftright(col("x"), d).as("px"), shiftright(col("y"), d).as("py"))
    }
    masks
      .select(col("clubId"), col("courseId"), col("holeNumber"), col("coverage"),
        explode(array(levels: _*)).as("p"))
      .groupBy(col("p.pz").as("z"), col("p.px").as("x"), col("p.py").as("y"))
      .agg(count(lit(1)).as("n_entries"),
        countDistinct(concat_ws("/", col("clubId"), col("courseId"),
          col("holeNumber"))).as("n_features"),
        sum(col("coverage")).as("sum_coverage"))
  }

  /** Priority reorder — W2 (plot_courses.py:340-352): given priority hole
    * keys, order them first, everything else after, stable by key. */
  def priorityOrder(bounds: DataFrame, priority: Seq[(String, String, Int)]): DataFrame = {
    val prioCol: Column = priority.zipWithIndex.foldLeft(lit(Int.MaxValue)) {
      case (acc, ((cl, co, h), i)) =>
        when(col("clubId") === cl && col("courseId") === co && col("holeNumber") === h, lit(i))
          .otherwise(acc)
    }
    bounds.withColumn("prio", prioCol)
      .orderBy(col("prio"), col("clubId"), col("courseId"), col("holeNumber"))
  }
}
