package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bloom semi-join filter (q100): the no-false-negative guarantee, the
  * fixed-size/mergeability structure, and the shuffle-free probe plan. */
class BloomSpec extends AnyFunSuite {
  lazy val spark = graft.expr.SparkTestSession.spark
  import spark.implicits._

  private val Bits = 1024
  private val K = 3

  test("zero false negatives for every build key; false positives stay near the analytic rate") {
    val universe = (0 until 5000).map(i => s"https://h$i.example.org/p/$i")
    val build = universe.filter(_.hashCode % 11 == 0) // ~450 keys
    val words = Bloom.buildWords(build.toDF("u"), $"u", Bits, K)
    val probed = Bloom.mightContain(universe.toDF("u"), $"u", words, Bits, K, "pass")
      .collect().map(r => r.getAs[String]("u") -> r.getAs[Boolean]("pass")).toMap
    build.foreach(u => assert(probed(u), s"FALSE NEGATIVE for build key $u"))
    val nonBuild = universe.filterNot(build.toSet)
    val fp = nonBuild.count(probed(_)).toDouble / nonBuild.size
    // load n=450, k=3, bits=1024 -> p = (1-e^{-kn/bits})^k ~ 0.40; allow slack
    assert(fp < 0.6, s"false-positive rate $fp implausibly high")
    assert(fp > 0.05, s"false-positive rate $fp implausibly low for a saturated filter — hash degenerate?")
  }

  test("word table is fixed-size and membership == distinct-idx semantics (the oracle's form)") {
    val build = (0 until 800).map(i => s"key-$i").toDF("u")
    val words = Bloom.buildWords(build, $"u", Bits, K)
    assert(words.count() <= Bits / 64, "word table exceeded bits/64 rows")
    // brute replica: probe passes iff all K of its idxs are in the build idx set
    import graft.{functions => gf}
    def idxs(df: org.apache.spark.sql.DataFrame) = df.select(
      (col("u") +: (0 until K).map(j =>
        pmod(gf.mix64(gf.hash_text($"u").bitwiseXOR(lit(j.toLong))),
          lit(Bits.toLong)).as(s"i$j"))): _*)
    val bset = idxs(build).select(explode(array((0 until K).map(j => col(s"i$j")): _*)).as("idx"))
      .distinct().as[Long].collect().toSet
    val probeKeys = (700 until 900).map(i => s"key-$i")
    val expect = idxs(probeKeys.toDF("u")).collect()
      .map(r => r.getAs[String]("u") -> (0 until K).forall(j => bset(r.getAs[Long](s"i$j")))).toMap
    val got = Bloom.mightContain(probeKeys.toDF("u"), $"u", words, Bits, K, "pass")
      .collect().map(r => r.getAs[String]("u") -> r.getAs[Boolean]("pass")).toMap
    probeKeys.foreach(u => assert(got(u) == expect(u), s"word/bit test diverged from idx-set semantics at $u"))
  }

  test("merge of per-shard filters == filter built on the union (distributive bit_or)") {
    val a = (0 until 300).map(i => s"a-$i").toDF("u")
    val b = (0 until 300).map(i => s"b-$i").toDF("u")
    val merged = Bloom.merge(Bloom.buildWords(a, $"u", Bits, K), Bloom.buildWords(b, $"u", Bits, K))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val direct = Bloom.buildWords(a.unionByName(b), $"u", Bits, K)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(merged == direct, "merged word table differs from the directly-built one")
  }

  test("probe-side plan: k broadcast joins, no SortMergeJoin, no probe-side Exchange") {
    val build = (0 until 200).map(i => s"k-$i").toDF("u")
    val words = Bloom.buildWords(build, $"u", Bits, K)
    val probe = spark.range(0, 10000).select(concat(lit("p-"), $"id").as("u"))
    val probed = Bloom.mightContain(probe, $"u", words, Bits, K, "pass")
    probed.collect()
    // AQE's toString prints Final + Initial sections — keep only the final
    val whole = probed.queryExecution.executedPlan.toString
    val plan = whole.indexOf("Initial Plan") match {
      case -1 => whole
      case i  => whole.substring(0, i)
    }
    assert(!plan.contains("SortMergeJoin"), "probe fell back to a sort-merge join")
    assert("BroadcastHashJoin".r.findAllIn(plan).size == K,
      s"expected $K broadcast joins in the probe plan:\n$plan")
    // the only shuffles allowed are the word-table builds feeding the
    // broadcasts: every hash-partitioned exchange must be keyed on the
    // word column — the probe stream itself is never exchanged
    plan.linesIterator.filter(_.contains("Exchange hashpartitioning")).foreach { l =>
      assert(l.contains("word"), s"non-build-side shuffle in the probe plan: $l")
    }
  }
}
