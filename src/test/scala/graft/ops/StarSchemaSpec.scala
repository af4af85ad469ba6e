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

  test("scd2History: versions open/close at changes, half-open windows, nulls tracked") {
    // key 1: attr changes at snap 1 and 2 -> three versions
    // key 2: never changes -> one open version
    // key 3: null -> value at snap 2 (null-safe change detection)
    val snaps = Seq(
      (1L, 0L, Some("x")), (1L, 1L, Some("y")), (1L, 2L, Some("z")),
      (2L, 0L, Some("k")), (2L, 1L, Some("k")), (2L, 2L, Some("k")),
      (3L, 0L, None), (3L, 1L, None), (3L, 2L, Some("v"))
    ).toDF("key", "snap", "attr")
    val h = StarSchema
      .scd2History(snaps, "key", "snap", Seq("attr"))
      .collect()
      .map(r => (r.getAs[Long]("key"), r.getAs[Long]("version")) ->
        ((Option(r.getAs[String]("attr")), r.getAs[Long]("valid_from"), r.getAs[Long]("valid_to"))))
      .toMap
    val MAX = Long.MaxValue
    assert(h((1L, 1L)) == ((Some("x"), 0L, 1L)))
    assert(h((1L, 2L)) == ((Some("y"), 1L, 2L)))
    assert(h((1L, 3L)) == ((Some("z"), 2L, MAX)))
    assert(h((2L, 1L)) == ((Some("k"), 0L, MAX)))
    assert(h((3L, 1L)) == ((None, 0L, 2L)))
    assert(h((3L, 2L)) == ((Some("v"), 2L, MAX)))
    assert(h.size == 6)
  }

  test("scd2Resolve: each fact matches exactly one version, the one valid at its time") {
    val snaps = Seq(
      (1L, 0L, "x"), (1L, 1L, "y"), (1L, 2L, "z"),
      (2L, 0L, "k"), (2L, 1L, "k"), (2L, 2L, "k")
    ).toDF("key", "snap", "attr")
    val hist = StarSchema.scd2History(snaps, "key", "snap", Seq("attr"))
    val facts = Seq((100L, 1L, 0L), (101L, 1L, 1L), (102L, 1L, 2L), (103L, 2L, 2L))
      .toDF("fact_id", "fkey", "t")
    val out = StarSchema
      .scd2Resolve(facts, hist, "fkey", "key", "t")
      .collect()
      .map(r => r.getAs[Long]("fact_id") -> r.getAs[String]("attr"))
      .toMap
    assert(out == Map(100L -> "x", 101L -> "y", 102L -> "z", 103L -> "k"))
    // exactly one match per fact
    assert(StarSchema.scd2Resolve(facts, hist, "fkey", "key", "t").count() == 4L)
  }
}
