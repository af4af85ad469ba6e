package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class StarSchemaSpec extends SparkSpec {
  import spark.implicits._

  test("insertMissing is idempotent and null-safe") {
    val dim = Seq((Some("A"), Some("hi")), (None, Some("x"))).toDF("k1", "k2")
    val incoming = Seq(
      (Some("A"), Some("hi")), // exists
      (None, Some("x")), // exists (null-safe match)
      (Some("B"), None) // new
    ).toDF("k1", "k2")
    val missing = StarSchema.insertMissing(dim, incoming, Seq("k1", "k2")).collect()
    assert(missing.length == 1 && missing(0).getString(0) == "B")
    // re-running with the grown dim inserts nothing
    val grown = dim.unionByName(Seq((Some("B"), None: Option[String])).toDF("k1", "k2"))
    assert(StarSchema.insertMissing(grown, incoming, Seq("k1", "k2")).count() == 0)
  }

  test("fact join loses no rows and resolves every surrogate key") {
    val flat = Fixtures.orders(spark, "/root/testdata/sf0.001")
    val dim = StarSchema.dimension(flat, Seq("o_orderstatus", "o_orderpriority"), "dim_id")
    val fact = StarSchema.factJoin(flat, dim, Seq("o_orderstatus", "o_orderpriority"), "dim_id")
    assert(fact.count() == flat.count())
    assert(fact.filter(col("dim_id").isNull).count() == 0)
  }
}
