package graft.optimize

import graft.SparkSpec
import org.apache.spark.sql.types._
import SchemaNarrower._

class SchemaNarrowerSpec extends SparkSpec {

  private lazy val li = graft.ops.Fixtures.lineitem(spark, "/root/testdata/sf0.001")

  test("lossless proposals apply; lossy ones are rejected with counts") {
    val (narrowed, outcomes) = SchemaNarrower.apply(
      li,
      Seq(
        Proposal("l_quantity", DecimalType(4, 2)), // quantities ≤ 50.00 → lossless
        Proposal("l_extendedprice", DecimalType(4, 2)), // ≫ 99.99 → lossy
        Proposal("nope", DecimalType(9, 0))
      )
    )
    val byCol = outcomes.map(o => o.column -> o.status).toMap
    assert(byCol("l_quantity") == "applied")
    assert(byCol("l_extendedprice").startsWith("rejected: ") && byCol("l_extendedprice").contains("lossy"))
    assert(byCol("nope") == "rejected: unknown column")
    assert(narrowed.schema("l_quantity").dataType == DecimalType(4, 2))
    assert(narrowed.schema("l_extendedprice").dataType == DoubleType) // untouched
    // applied narrowing is value-preserving
    import org.apache.spark.sql.functions._
    val n = li.withColumn("rt", col("l_quantity").cast(DecimalType(4, 2)).cast("double"))
      .filter(col("rt") =!= col("l_quantity")).count()
    assert(n == 0)
  }

  test("dry run reports without changing the frame") {
    val outcomes = SchemaNarrower.dryRun(li, Seq(Proposal("l_tax", DecimalType(3, 2))))
    assert(outcomes.map(_.status) == Seq("applied"))
    assert(li.schema("l_tax").dataType == DoubleType)
  }
}
