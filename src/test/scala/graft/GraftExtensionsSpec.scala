package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Proves the SparkSessionExtensions path: a session built with
  * `withExtensions(new GraftExtensions)` resolves every custom function
  * with no explicit register() call.
  */
class GraftExtensionsSpec extends AnyFunSuite {

  test("withExtensions injects all custom functions into a fresh session") {
    // Ensure a SparkContext exists, then build a sibling session with the
    // extensions applied (getOrCreate would return the active session and
    // skip extension wiring, so clear the thread bindings first).
    SparkTestSession.spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .withExtensions(new functions.GraftExtensions)
      .getOrCreate()
    try {
      val r = spark.sql(
        """SELECT
          |  rolling_hash64('abc') AS rh,
          |  simhash60(array(5L, 6L)) AS sh,
          |  size(minhash64(array(42L))) AS mh_lanes,
          |  hyperplane_sig(array(1.0D), array(array(1.0D), array(-1.0D))) AS hs,
          |  json_extract_mysql('{"A":1}', '$.a') AS jx,
          |  json_unquote('"x"') AS ju,
          |  jaccard_sorted(array('a','b'), array('b','c')) AS js,
          |  dot_product(array(2.0D), array(3.0D)) AS dp""".stripMargin).head()
      assert(r.getLong(0) != 0L)
      assert(r.getAs[Int]("mh_lanes") == 64)
      assert(r.getAs[Int]("hs") == 1) // +1 plane dot is >= 0, -1 plane is not
      assert(r.getString(4) == "1")   // case-insensitive key match
      assert(r.getString(5) == "x")
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      SparkSession.setDefaultSession(SparkTestSession.spark)
      SparkSession.setActiveSession(SparkTestSession.spark)
    }
  }
}
