package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

/** S2 — the XML color-config scan (reference color_manager.py:12-27 over
  * resources/colors.xml) is a real parse, not hardcoded hex. */
class CatalogSpec extends AnyFunSuite {

  test("colorsFromXml parses the actual reference colors.xml") {
    val m = Catalog.colorsFromXml(Catalog.DefaultColorsXml)
    assert(m === Map("water_blue" -> "#ADD8E6", "cartpath_grey" -> "#D3D3D3"))
  }

  test("catalog colors flow from the parsed XML (a config change would propagate)") {
    val byType = Catalog.items.map(i => i.itemType -> i.color).toMap
    assert(byType("WaterTrace") === Catalog.colors("water_blue"))
    assert(byType("WaterPath") === Catalog.colors("water_blue"))
    assert(byType("CartpathTrace") === Catalog.colors("cartpath_grey"))
    assert(byType("CartpathPath") === Catalog.colors("cartpath_grey"))
    assert(byType("FairwayTrace") === null) // texture-styled, no color
  }

  test("colorsFromXml on a modified config yields the modified values") {
    val tmp = java.nio.file.Files.createTempFile("colors", ".xml")
    java.nio.file.Files.writeString(tmp,
      """<?xml version="1.0" encoding="utf-8"?>
        |<resources>
        |    <color name="water_blue">#123456</color>
        |    <color name="cartpath_grey">#654321</color>
        |</resources>""".stripMargin)
    val m = Catalog.colorsFromXml(tmp.toString)
    assert(m === Map("water_blue" -> "#123456", "cartpath_grey" -> "#654321"))
    java.nio.file.Files.delete(tmp)
  }
}
