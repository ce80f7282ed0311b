package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * The 14-row item-style catalog — the reference's `get_item_by_type`
 * 14-way dispatch (`/root/reference/src/python/plot_courses.py:109-140`)
 * re-expressed as a broadcastable dimension table (SURVEY.md §2.3 J2).
 * zorders from plot_courses.py:59-76 + hole_item.py:67,81; colors from
 * resources/colors.xml via color_manager.py:12-27.
 */
object Catalog {

  case class Item(itemType: String, category: String, zorder: Int,
                  color: String, lineWidth: Double)

  val items: Seq[Item] = Seq(
    Item("HoleBoundary", "polygon", 0, null, 0.0),
    Item("BunkerTrace", "polygon", 1, null, 0.0),
    Item("VegetationTrace", "polygon", 1, null, 0.0),
    Item("WaterTrace", "polygon", 1, "#ADD8E6", 0.0),
    Item("FairwayTrace", "polygon", 2, null, 0.0),
    Item("TeeboxTrace", "polygon", 9, null, 0.0),
    Item("GreenTrace", "polygon", 9, null, 0.0),
    Item("WaterPath", "line", 10, "#ADD8E6", 2.0),
    Item("CartpathTrace", "line", 11, "#D3D3D3", 1.5),
    Item("CartpathPath", "line", 12, "#D3D3D3", 1.5),
    Item("LeafyTree", "marker", 20, null, 0.0),
    Item("ShrubTree", "marker", 20, null, 0.0),
    Item("PalmTree", "marker", 20, null, 0.0),
    Item("PineTree", "marker", 20, null, 0.0))

  /** As a DataFrame (broadcast side of the catalog lookup join). */
  def df(spark: SparkSession): DataFrame = {
    import spark.implicits._
    spark.createDataset(items).toDF()
  }
}
