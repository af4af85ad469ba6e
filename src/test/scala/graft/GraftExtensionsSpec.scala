package graft

import org.apache.spark.sql.SparkSession

class GraftExtensionsSpec extends SparkSpec {

  test("spark.sql.extensions registration serves pure-SQL clients") {
    // build a FRESH SparkSession (same context) through the extensions
    // path — the config-only adoption route a cluster uses
    val prev = SparkSession.getActiveSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s = SparkSession
        .builder()
        .master("local[2]")
        .withExtensions(new GraftExtensions())
        .getOrCreate()
      try {
        val cos = s
          .sql("SELECT cosine_sim(array(3.0D, 0.0D), array(1.0D, 0.0D)) AS c")
          .head()
          .getDouble(0)
        assert(math.abs(cos - 1.0) < 1e-12)
        // the bloom pair resolves end to end through SQL alone
        val hits = s
          .sql(
            """WITH f AS (
              |  SELECT bloom_filter_agg(xxhash64(CAST(id AS STRING)), CAST(64 AS BIGINT), CAST(1024 AS BIGINT)) AS bf
              |  FROM range(0, 8))
              |SELECT might_contain((SELECT bf FROM f), xxhash64(CAST(3 AS STRING))) AS hit""".stripMargin
          )
          .head()
          .getBoolean(0)
        assert(hits, "an inserted key must probe true")
      } finally {
        // the fresh session shares the suite's SparkContext — do not stop it
      }
    } finally {
      SparkSession.clearActiveSession()
      prev.foreach(SparkSession.setActiveSession)
      prev.foreach(SparkSession.setDefaultSession)
    }
  }
}
