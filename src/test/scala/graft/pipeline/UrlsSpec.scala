package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** URL canonicalization fuzz: the Column chain vs an independently
  * written plain-string replica of the same five rules, over randomized
  * messy URLs (case noise, default/odd ports, fragments, shuffled and
  * duplicate-keyed params, empty params, missing paths). */
class UrlsSpec extends AnyFunSuite {
  lazy val spark = graft.expr.SparkTestSession.spark
  import spark.implicits._

  private def canonRef(url: String): String = {
    val m = "^([A-Za-z][A-Za-z0-9+.-]*)://".r.findFirstMatchIn(url).get
    val scheme = m.group(1).toLowerCase
    val rest = url.substring(m.matched.length)
    val hpEnd = rest.indexWhere(c => c == '/' || c == '?' || c == '#') match {
      case -1 => rest.length; case i => i
    }
    var hostport = rest.substring(0, hpEnd).toLowerCase
    if (scheme == "http" && hostport.endsWith(":80")) hostport = hostport.dropRight(3)
    if (scheme == "https" && hostport.endsWith(":443")) hostport = hostport.dropRight(4)
    var tail = rest.substring(hpEnd)
    val hashIdx = tail.indexOf('#')
    if (hashIdx >= 0) tail = tail.substring(0, hashIdx)
    val qIdx = tail.indexOf('?')
    val (path, query) = if (qIdx >= 0) (tail.substring(0, qIdx), tail.substring(qIdx)) else (tail, "")
    val qs = if (query.length > 1) "?" + query.substring(1).split("&", -1).sorted.mkString("&") else ""
    scheme + "://" + hostport + path + qs
  }

  test("canonicalize == plain-string replica over 400 randomized messy URLs") {
    val rnd = new scala.util.Random(42)
    def maybeUpper(s: String) = if (rnd.nextBoolean()) s.toUpperCase else s
    val urls = (0 until 400).map { i =>
      val scheme = maybeUpper(Seq("http", "https", "ftp")(rnd.nextInt(3)))
      val host = maybeUpper(s"w${rnd.nextInt(5)}.Example${rnd.nextInt(3)}.org")
      val port = Seq("", ":80", ":443", ":8080", ":21")(rnd.nextInt(5))
      val path = Seq("", "/", s"/A${rnd.nextInt(9)}/p%20x", "/idx.HTML")(rnd.nextInt(4))
      val query = rnd.nextInt(4) match {
        case 0 => ""
        case 1 => "?"
        case 2 => "?" + rnd.shuffle(Seq(s"b=${rnd.nextInt(5)}", "a=1", "Z=9", "")).mkString("&")
        case _ => s"?q=${rnd.nextInt(99)}"
      }
      val frag = if (rnd.nextBoolean()) s"#sec${rnd.nextInt(9)}" else ""
      s"$scheme://$host$port$path$query$frag"
    }
    val got = urls.toDF("url")
      .select($"url", Urls.canonicalize($"url").as("c")).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    urls.foreach { u =>
      assert(got(u) == canonRef(u), s"canonicalization drift for '$u'")
    }
    // the rules actually merge spellings: at least one collision must
    // exist in this corpus or the fuzz is vacuous
    assert(got.values.toSet.size < urls.distinct.size)
  }
}
