package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * q90's corpus-trained trigram LM: quantization/gate margins (the
 * q43/q45 pinned-margin rule for cross-engine float compares), exact
 * count identities, and smoothing behavior on unseen trigrams.
 */
class LangModelSpec extends AnyFunSuite {
  lazy val spark = graft.expr.SparkTestSession.spark
  import spark.implicits._

  private def docs(sfDir: String) =
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select($"doc_id".cast("long").as("doc_id"), $"text")

  /** avg_lp for every held-out doc at `sfDir`, unrounded. */
  private def avgs(sfDir: String): Array[Double] = {
    val d = docs(sfDir)
    val model = graft.sources.Storage.localize(
      LangModel.trigramModel(d.filter($"doc_id" % 5 =!= 0)))
    val v = model.count()
    val ctx = graft.sources.Storage.localize(LangModel.contextCounts(model))
    LangModel.scoreDocs(d.filter($"doc_id" % 5 === 0), model, ctx, v)
      .select(($"lp" / $"n_tri").as("avg")).as[Double].collect()
  }

  test("1e-6 quantum boundary margin and -1.08 gate margin are pinned at both scales") {
    // cross-engine disagreement is bounded by sub-ULP ln() drift folded
    // over ~200 terms: < 1e-12 absolute on values ~ -1. Both graded
    // decisions must sit >= 100x that from their boundary (CLAUDE.md's
    // quantized-compare rule). Measured: quantum margin 1.1e-8 (sf0.01),
    // gate margin 6.1e-5 (sf0.01) / 2.7e-4 (sf0.001).
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01").foreach { sf =>
      val a = avgs(sf)
      assert(a.nonEmpty)
      val quantMargin = a.map(x => math.abs(math.abs(x * 1e6 % 1.0) - 0.5)).min * 1e-6
      assert(quantMargin >= 1e-10, s"$sf: 1e-6 rounding boundary margin = $quantMargin")
      val gateMargin = a.map(x => math.abs(x - (-1.08))).min
      assert(gateMargin >= 1e-8, s"$sf: -1.08 gate margin = $gateMargin")
      // the gate must actually split the fixture (a vacuous gate pins nothing)
      val nFluent = a.count(_ >= -1.08)
      assert(nFluent > 0 && nFluent < a.length, s"$sf: gate is vacuous ($nFluent/${a.length})")
    }
  }

  test("count identities: model counts sum to total trigram tokens; contexts sum to the same") {
    val d = docs("/root/testdata/sf0.001").filter($"doc_id" % 5 =!= 0)
    val model = LangModel.trigramModel(d)
    val totalFromModel = model.agg(sum($"n3")).as[Long].collect()(0)
    val totalDirect = d.select(
      sum(greatest(length($"text") - 2, lit(0)).cast("long"))).as[Long].collect()(0)
    assert(totalFromModel === totalDirect)
    val totalFromCtx = LangModel.contextCounts(model).agg(sum($"n2")).as[Long].collect()(0)
    assert(totalFromCtx === totalDirect)
  }

  test("unseen trigrams score via smoothing: ln(1/(n2+V)) never null/-inf; short docs excluded") {
    val d = docs("/root/testdata/sf0.001").filter($"doc_id" % 5 =!= 0)
    val model = graft.sources.Storage.localize(LangModel.trigramModel(d))
    val v = model.count()
    val ctx = graft.sources.Storage.localize(LangModel.contextCounts(model))
    val probe = Seq((1L, "@@@@@"), (2L, "ab")).toDF("doc_id", "text")
    val out = LangModel.scoreDocs(probe, model, ctx, v)
      .select($"doc_id", $"n_tri", $"lp").as[(Long, Long, Double)].collect()
    assert(out.length === 1)                      // "ab" has no trigrams -> excluded
    val (_, nTri, lp) = out(0)
    assert(nTri === 3L)                           // "@@@@@" -> 3 trigram positions
    // every "@@@" is unseen AND its context unseen: term = ln(1/V) exactly
    val expected = 3.0 * math.log(1.0 / v)
    assert(lp === expected, s"lp=$lp expected=$expected")
    assert(!lp.isInfinite && !lp.isNaN)
  }
}
