package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The SQL-surface registration: a session built with
  * spark.sql.extensions=graft.functions.GraftExtensions resolves the
  * native expressions by name in plain SQL.
  */
class GraftExtensionsSpec extends AnyFunSuite {

  test("extensions register SQL functions on a new session") {
    val prevActive = SparkSession.getActiveSession
    val prevDefault = SparkSession.getDefaultSession
    // force TestSpark's shared context to exist first, then derive a new
    // session (same SparkContext, different extensions)
    TestSpark.spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      // withExtensions = the programmatic route; the config route
      // (spark.sql.extensions=graft.functions.GraftExtensions) is
      // equivalent when set at initial SparkContext creation
      val s2 = SparkSession.builder()
        .master("local[4]")
        .withExtensions(new graft.functions.GraftExtensions)
        .getOrCreate()
      val r = s2.sql("""
        SELECT
          cosine_similarity(CAST(array(1, 0) AS ARRAY<FLOAT>),
                            CAST(array(1, 0) AS ARRAY<FLOAT>)) AS cos_same,
          cosine_similarity(CAST(array(1, 0) AS ARRAY<FLOAT>),
                            CAST(array(0, 1) AS ARRAY<FLOAT>)) AS cos_orth,
          bitmap_intersect_count(array(CAST(3 AS BIGINT)), array(CAST(1 AS BIGINT))) AS bic,
          rolling_hash('ab') AS rh
      """).head()
      assert(r.getDouble(0) === 1.0)
      assert(r.getDouble(1) === 0.0)
      assert(r.getLong(2) === 1L)
      assert(r.getLong(3) === 3105L) // 97*31 + 98
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }
}
