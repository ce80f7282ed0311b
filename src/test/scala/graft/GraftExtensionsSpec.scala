package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** `spark.sql.extensions=graft.GraftExtensions` injects the full function
  * surface at session build — no registerAll call anywhere. */
class GraftExtensionsSpec extends AnyFunSuite {

  test("extension-built session resolves graft functions in plain SQL") {
    // build a SIBLING session (shares any existing SparkContext) with the
    // extensions applied; never stop it — that would kill the context the
    // other suites share
    val old = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      val r = spark.sql(
        """SELECT cell_id(116.4d, 39.9d, 15) AS c,
          |  tile_x(116.4d, 15) AS tx,
          |  st_contains(make_polygon(array(
          |    struct(0.0d AS x, 0.0d AS y), struct(4.0d AS x, 0.0d AS y),
          |    struct(4.0d AS x, 4.0d AS y), struct(0.0d AS x, 4.0d AS y))),
          |    2.0d, 2.0d) AS inside""".stripMargin).head()
      assert(r.getLong(0) > 0 && r.getLong(1) > 0 && r.getBoolean(2))
      // every builder is resolvable by name
      functions.builders.foreach { case (name, _) =>
        assert(spark.sessionState.functionRegistry
          .functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier(name)), name)
      }
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      old.foreach { s =>
        SparkSession.setDefaultSession(s)
        SparkSession.setActiveSession(s)
      }
    }
  }
}
