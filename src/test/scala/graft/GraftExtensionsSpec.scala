package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Builds a session with the extensions installed and exercises each
  * injected function through plain SQL — no imperative registration.
  */
class GraftExtensionsSpec extends AnyFunSuite {

  test("injected functions resolve in SQL on an extensions-built session") {
    // getOrCreate reuses any default session (ignoring extensions), so
    // clear the defaults to force a genuinely new session on the shared
    // context, and restore them afterwards
    val base = TestSpark.spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s: SparkSession = SparkSession.builder()
      .master("local[2]")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      val row = s.sql(
        """SELECT
          |  dot_product(array(1.0D, 2.0D, 3.0D), array(4.0D, 5.0D, 6.0D)) AS dp,
          |  vec_norm(array(3.0D, 4.0D)) AS nrm,
          |  rolling_hash('abc') AS rh""".stripMargin).head()
      assert(row.getDouble(0) == 32.0)
      assert(row.getDouble(1) == 5.0)
      // ((31*0+97)*31+98)*31+99 = 97*961 + 98*31 + 99
      assert(row.getLong(2) == (97L * 961 + 98L * 31 + 99) % 1000000007L)
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }
}
