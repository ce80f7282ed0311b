package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** CMS + HLL sketches: guarantees, accuracy, and the rounding-safety
  * table that makes q83's corrected estimate hash-comparable. */
class SketchSpec extends AnyFunSuite {
  lazy val spark = graft.expr.SparkTestSession.spark
  import spark.implicits._

  test("CMS: never under-estimates, and is exact when keys fit without collisions") {
    val keys = (0 until 300).flatMap(i => Seq.fill(i % 7 + 1)(s"key-$i"))
    val df = keys.toDF("k")
    val counters = Sketch.countMin(df, $"k")
    val exact = df.groupBy($"k").agg(count(lit(1)).as("exact_n"))
    val joined = Sketch.cmsEstimates(counters, exact.select($"k"))
      .join(exact, Seq("k")).collect()
    assert(joined.length == 300)
    joined.foreach { r =>
      assert(r.getAs[Long]("cms_est") >= r.getAs[Long]("exact_n"),
        s"CMS under-estimated ${r.getAs[String]("k")}")
    }
    // 300 keys x 4 rows in 4x1024 cells: collisions in ALL FOUR rows for
    // one key are overwhelmingly unlikely with a real mixer — with this
    // deterministic hash the min is exact for (at least) the vast majority
    val exactCnt = joined.count(r => r.getAs[Long]("cms_est") == r.getAs[Long]("exact_n"))
    assert(exactCnt >= 290, s"only $exactCnt/300 CMS estimates exact — mixer broken?")
  }

  test("HLL: corrected estimate within 35% over a cardinality sweep; raw monotone-ish in registers") {
    for (n <- Seq(10, 50, 200, 1000)) {
      val df = (0 until n).map(i => s"host-$i.example.com").toDF("k")
      val r = Sketch.hllEstimate(Sketch.hllRegisters(df, $"k")).collect()(0)
      val corrected = r.getAs[Double]("hll_corrected")
      val err = math.abs(corrected - n) / n
      assert(err < 0.35, s"HLL corrected error $err at n=$n (est $corrected)")
    }
  }

  test("q83 rounding safety: ALL 63 possible linear-counting values sit far from a 0.5e-6 boundary") {
    // the corrected estimate's only libm call is ln(64/V), V in 1..63 —
    // a finite input table. Pin that every output sits >= 1000x the
    // cross-engine 1-ULP drift from a 1e-6 rounding boundary, so the
    // rounded value can never flip on ANY input data.
    for (v <- 1 until 64) {
      val x = 64.0 * math.log(64.0 / v)
      val scaled = x * 1e6
      val frac = scaled - math.floor(scaled)
      val dist = math.abs(frac - 0.5)
      assert(dist > 1e-5,
        s"linear-counting value for V=$v sits $dist quanta from a boundary")
    }
  }
}
