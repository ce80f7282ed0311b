package graft.pipeline

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.expr.TextOps

/** Minhash jaccard estimation (q111): the 64-slot agreement fraction is
  * an accurate, monotone estimator of exact shingle jaccard — the
  * statistical contract the LSH funnel relies on when it screens by
  * signature instead of features. */
class MinhashEstimateSpec extends AnyFunSuite {

  private def sig(shingles: Seq[String]): Array[Long] = {
    val a = TextOps.minHash(
      new GenericArrayData(shingles.map(s => UTF8String.fromString(s)).toArray[Any]),
      Dedup.MinhashK, Dedup.MinhashSeed)
    (0 until a.numElements()).map(a.getLong).toArray
  }

  private def est(a: Seq[String], b: Seq[String]): Double = {
    val sa = sig(a); val sb = sig(b)
    sa.zip(sb).count { case (x, y) => x == y }.toDouble / Dedup.MinhashK
  }

  /** Disjoint shingle universes with a controlled overlap: |A∩B| = m,
    * |A∪B| = n, exact jaccard = m/n. */
  private def pairAt(tag: Int, m: Int, n: Int): (Seq[String], Seq[String]) = {
    val per = (n - m) / 2
    val shared = (0 until m).map(i => s"s${tag}_$i")
    val onlyA = (0 until per).map(i => s"a${tag}_$i")
    val onlyB = (0 until per).map(i => s"b${tag}_$i")
    (shared ++ onlyA, shared ++ onlyB)
  }

  test("estimates concentrate around exact jaccard (J = 0.5, 40 pairs)") {
    val errs = (0 until 40).map { t =>
      val (a, b) = pairAt(t, 30, 60)
      est(a, b) - 0.5
    }
    val mean = errs.sum / errs.size
    assert(math.abs(mean) < 0.06, s"mean bias $mean over 40 pairs at J=0.5")
    // per-pair: 64 slots -> std ~0.0625; 0.30 is ~5 sigma
    errs.foreach(e => assert(math.abs(e) < 0.30, s"single-pair error $e"))
  }

  test("estimator is monotone in true jaccard") {
    def meanEst(m: Int, n: Int): Double =
      (0 until 25).map(t => { val (a, b) = pairAt(1000 + 31 * m + t, m, n); est(a, b) })
        .sum / 25
    val lo = meanEst(10, 100)  // J = 0.1
    val mid = meanEst(50, 100) // J = 0.5
    val hi = meanEst(90, 100)  // J = 0.9
    assert(lo < mid && mid < hi, s"not monotone: $lo, $mid, $hi")
    assert(math.abs(lo - 0.1) < 0.08 && math.abs(mid - 0.5) < 0.08 &&
      math.abs(hi - 0.9) < 0.08, s"means off: $lo, $mid, $hi")
  }

  test("identical and disjoint extremes are exact") {
    val (a, _) = pairAt(9999, 20, 40)
    assert(est(a, a) == 1.0)
    val (x, _) = pairAt(777, 0, 40)
    val (y, _) = pairAt(778, 0, 40)
    // distinct universes: agreement only by hash coincidence (none expected)
    assert(est(x, y) < 0.05)
  }
}
