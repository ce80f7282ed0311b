package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * The 14-row item-style catalog — the reference's `get_item_by_type`
 * 14-way dispatch (`/root/reference/src/python/plot_courses.py:109-140`)
 * re-expressed as a broadcastable dimension table (SURVEY.md §2.3 J2).
 * zorders from plot_courses.py:59-76 + hole_item.py:67,81; colors parsed
 * at runtime from `resources/colors.xml` exactly as the reference's
 * ColorManager does (color_manager.py:12-27) — S2 in SURVEY.md §2.1.
 */
object Catalog {

  /** The reference's color config file (read-only mount). */
  val DefaultColorsXml = "/root/reference/resources/colors.xml"

  /**
   * S2 — XML config scan. Parses `<resources><color name="…">#HEX</color>
   * …</resources>` with the JDK DOM parser (driver-side, once; the values
   * ride the broadcast catalog). Mirrors color_manager.py:12-24's
   * ElementTree walk.
   */
  def colorsFromXml(path: String): Map[String, String] = {
    val doc = javax.xml.parsers.DocumentBuilderFactory.newInstance()
      .newDocumentBuilder().parse(new java.io.File(path))
    val nodes = doc.getElementsByTagName("color")
    (0 until nodes.getLength).map { i =>
      val n = nodes.item(i)
      n.getAttributes.getNamedItem("name").getNodeValue -> n.getTextContent.trim
    }.toMap
  }

  /** Runtime color map: the actual XML when PRESENT, else the reference's
    * published values (so the engine still runs where the config isn't
    * mounted). Only absence falls back — a file that EXISTS but fails to
    * parse or lacks a required key throws loudly; swallowing it would be
    * exactly the silent config divergence this module exists to prevent. */
  lazy val colors: Map[String, String] =
    if (new java.io.File(DefaultColorsXml).exists()) {
      val m = colorsFromXml(DefaultColorsXml) // parse errors propagate
      Seq("water_blue", "cartpath_grey").foreach { k =>
        require(m.contains(k), s"$DefaultColorsXml is missing color '$k'")
      }
      m
    } else Map("water_blue" -> "#ADD8E6", "cartpath_grey" -> "#D3D3D3")

  case class Item(itemType: String, category: String, zorder: Int,
                  color: String, lineWidth: Double)

  lazy val items: Seq[Item] = {
    val water = colors("water_blue")
    val cartpath = colors("cartpath_grey")
    Seq(
      Item("HoleBoundary", "polygon", 0, null, 0.0),
      Item("BunkerTrace", "polygon", 1, null, 0.0),
      Item("VegetationTrace", "polygon", 1, null, 0.0),
      Item("WaterTrace", "polygon", 1, water, 0.0),
      Item("FairwayTrace", "polygon", 2, null, 0.0),
      Item("TeeboxTrace", "polygon", 9, null, 0.0),
      Item("GreenTrace", "polygon", 9, null, 0.0),
      Item("WaterPath", "line", 10, water, 2.0),
      Item("CartpathTrace", "line", 11, cartpath, 1.5),
      Item("CartpathPath", "line", 12, cartpath, 1.5),
      Item("LeafyTree", "marker", 20, null, 0.0),
      Item("ShrubTree", "marker", 20, null, 0.0),
      Item("PalmTree", "marker", 20, null, 0.0),
      Item("PineTree", "marker", 20, null, 0.0))
  }

  /** As a DataFrame (broadcast side of the catalog lookup join). */
  def df(spark: SparkSession): DataFrame = {
    import spark.implicits._
    spark.createDataset(items).toDF()
  }
}
