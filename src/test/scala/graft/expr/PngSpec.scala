package graft.expr

import java.util.zip.{Adler32, CRC32, Inflater}
import javax.imageio.ImageIO

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen

/**
 * png_encode (the q95 raster-artifact sink) verified against the JDK's
 * own PNG stack — three INDEPENDENT oracles that share no code with
 * `PngOps`:
 *   1. `javax.imageio.ImageIO` decodes the whole file and every ARGB
 *      pixel must match the input flags (covered -> opaque fill color,
 *      uncovered -> fully transparent);
 *   2. `java.util.zip.Inflater` inflates the IDAT zlib stream (checking
 *      the Adler-32 trailer) and the raw filter-0 scanlines must match;
 *   3. `java.util.zip.CRC32`/`Adler32` recompute both chunk CRCs and the
 *      zlib checksum from the file bytes.
 * The DuckDB replay in q95's oracle is the fourth, cross-engine check.
 */
class PngSpec extends AnyFunSuite with graft.PropHelper {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  private def be4(b: Array[Byte], at: Int): Long =
    ((b(at) & 0xFFL) << 24) | ((b(at + 1) & 0xFFL) << 16) |
      ((b(at + 2) & 0xFFL) << 8) | (b(at + 3) & 0xFFL)

  /** Parse sig/IHDR/IDAT/IEND, recheck every CRC with java.util.zip.CRC32,
    * inflate IDAT with Inflater, recheck Adler-32, return (w, h, raw). */
  private def decodeAndCheck(png: Array[Byte]): (Int, Int, Array[Byte]) = {
    assert(png.take(8).map(_ & 0xFF).toSeq == Seq(137, 80, 78, 71, 13, 10, 26, 10))
    assert(be4(png, 8) == 13 && new String(png.slice(12, 16), "US-ASCII") == "IHDR")
    val crcH = new CRC32(); crcH.update(png, 12, 17)
    assert(crcH.getValue == be4(png, 29), "IHDR CRC")
    val w = be4(png, 16).toInt
    val h = be4(png, 20).toInt
    assert(png(24) == 8 && png(25) == 6 && png(26) == 0 && png(27) == 0 && png(28) == 0)
    val idatLen = be4(png, 33).toInt
    assert(new String(png.slice(37, 41), "US-ASCII") == "IDAT")
    val crcI = new CRC32(); crcI.update(png, 37, 4 + idatLen)
    assert(crcI.getValue == be4(png, 41 + idatLen), "IDAT CRC")
    // zlib: Inflater(false) consumes header + blocks AND verifies Adler-32
    val inf = new Inflater()
    inf.setInput(png, 41, idatLen)
    val raw = new Array[Byte](h * (1 + 4 * w))
    var got = 0
    while (got < raw.length && !inf.finished())
      got += inf.inflate(raw, got, raw.length - got)
    assert(got == raw.length && inf.finished(), "inflated size")
    inf.end()
    val ad = new Adler32(); ad.update(raw, 0, raw.length)
    assert(ad.getValue == be4(png, 41 + idatLen - 4), "zlib Adler-32")
    val iendAt = 41 + idatLen + 4
    assert(be4(png, iendAt) == 0 &&
      new String(png.slice(iendAt + 4, iendAt + 8), "US-ASCII") == "IEND")
    assert(iendAt + 12 == png.length, "trailing bytes after IEND")
    (w, h, raw)
  }

  private def encode(flags: Seq[Boolean], width: Int, rgb: Int): Array[Byte] = {
    val df = Seq((1, flags)).toDF("id", "px")
      .select(graft.functions.png_encode(col("px"), lit(width), lit(rgb)).as("png"))
    df.collect()(0).getAs[Array[Byte]](0)
  }

  test("ImageIO round-trip: every ARGB pixel matches the input flags") {
    val rgb = 0xADD8E6
    val flags = (0 until 64).map(i => (i * 2654435761L % 3) == 0)
    val png = encode(flags, 8, rgb)
    val img = ImageIO.read(new java.io.ByteArrayInputStream(png))
    assert(img != null, "ImageIO failed to parse the file")
    assert(img.getWidth == 8 && img.getHeight == 8)
    for (y <- 0 until 8; x <- 0 until 8) {
      val expected = if (flags(y * 8 + x)) 0xFF000000 | rgb else 0x00000000
      assert(img.getRGB(x, y) == expected, s"pixel ($x,$y)")
    }
  }

  test("chunk structure, CRCs, Adler-32, and raw scanlines (JDK zip oracle)") {
    val rgb = 0x112233
    val flags = (0 until 64).map(i => i % 5 != 0)
    val png = encode(flags, 8, rgb)
    val (w, h, raw) = decodeAndCheck(png)
    assert(w == 8 && h == 8)
    for (row <- 0 until 8) {
      assert(raw(row * 33) == 0, s"filter byte row $row")
      for (colI <- 0 until 8) {
        val o = row * 33 + 1 + colI * 4
        val expected: Seq[Int] =
          if (flags(row * 8 + colI)) Seq(0x11, 0x22, 0x33, 255) else Seq(0, 0, 0, 0)
        assert((0 until 4).map(k => raw(o + k) & 0xFF) == expected, s"px ($row,$colI)")
      }
    }
  }

  test("multi-block STORED stream: rawLen > 65535 inflates intact") {
    // 600x30 raster: rawLen = 30*(1+2400) = 72030 -> two deflate blocks
    val wpx = 600; val hpx = 30
    val flags = (0 until wpx * hpx).map(i => (i & 7) == 3)
    val png = encode(flags, wpx, 0x00FF00)
    val (w, h, raw) = decodeAndCheck(png)
    assert(w == wpx && h == hpx)
    val img = ImageIO.read(new java.io.ByteArrayInputStream(png))
    assert(img.getWidth == wpx && img.getHeight == hpx)
    // spot-check pixels across the block boundary region
    for (i <- Seq(0, 16380, 16384, wpx * hpx - 1)) {
      val (x, y) = (i % wpx, i / wpx)
      val expected = if (flags(i)) 0xFF00FF00 else 0x00000000
      assert(img.getRGB(x, y) == expected, s"pixel $i")
      assert(raw(y * (1 + 4 * wpx)) == 0, s"filter byte row $y")
    }
  }

  test("property: random rasters round-trip through ImageIO") {
    val gen = for {
      w <- Gen.choose(1, 12)
      h <- Gen.choose(1, 12)
      flags <- Gen.listOfN(w * h, Gen.oneOf(true, false))
      rgb <- Gen.choose(0, 0xFFFFFF)
    } yield (w, h, flags, rgb)
    forAllN(gen, n = 12) { case (w, h, flags, rgb) =>
      val png = encode(flags, w, rgb)
      decodeAndCheck(png)
      val img = ImageIO.read(new java.io.ByteArrayInputStream(png))
      assert(img.getWidth == w && img.getHeight == h)
      for (y <- 0 until h; x <- 0 until w) {
        val expected = if (flags(y * w + x)) 0xFF000000 | rgb else 0x00000000
        assert(img.getRGB(x, y) == expected)
      }
    }
  }

  test("non-tiling pixel count throws") {
    assertThrows[Exception](encode(Seq(true, false, true), 2, 0))
  }
}
