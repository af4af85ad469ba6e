package graft.core

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types._
import graft.core.options._
import graft.sync.DeltaImportPlanner
import graft.sync.DeltaImportPlanner._

class Dialect2Spec extends AnyFunSuite {
  private val opts = MigrationOptions()
  private def col(t: String, p: Option[Int] = None, s: Option[Int] = None) =
    ColumnMeta("s", "t", 1, "c", t, precision = p, scale = s)

  test("clickhouse wrapper unwrapping") {
    assert(ClickHouseDialect.unwrapType("Nullable(Int64)") == (("Int64", true)))
    assert(ClickHouseDialect.unwrapType("LowCardinality(String)") == (("String", false)))
    assert(ClickHouseDialect.unwrapType("LowCardinality(Nullable(String))") == (("String", true)))
    assert(ClickHouseDialect.unwrapType("SimpleAggregateFunction(sum, UInt64)") == (("UInt64", false)))
    assert(ClickHouseDialect.unwrapType("Int32") == (("Int32", false)))
  }

  test("clickhouse engine classification") {
    import ClickHouseDialect._
    assert(classifyEngine("ReplacingMergeTree") == DataEngine)
    assert(classifyEngine("MergeTree") == DataEngine)
    assert(classifyEngine("MaterializedView") == ViewEngine)
    assert(classifyEngine("Distributed") == IntegrationEngine)
    assert(classifyEngine("Kafka") == IntegrationEngine)
  }

  test("clickhouse type matrix: unsigned widening, decimals, opaque state") {
    assert(ClickHouseDialect.toSparkType(col("UInt64"), opts) == DecimalType(20, 0))
    assert(ClickHouseDialect.toSparkType(col("Nullable(UInt32)"), opts) == LongType)
    assert(ClickHouseDialect.toSparkType(col("Decimal(12, 4)"), opts) == DecimalType(12, 4))
    assert(ClickHouseDialect.toSparkType(col("AggregateFunction(uniq, String)"), opts) == NullType)
    assert(ClickHouseDialect.toSparkType(col("Array(String)"), opts) == StringType)
    assert(
      ClickHouseDialect.toSparkType(col("Int128"), opts.copy(decimalOverflow = DecimalOverflow.ToDouble)) == DoubleType
    )
  }

  test("clickhouse read expressions: finiteness guard and toString flattening") {
    assert(ClickHouseDialect.readExpression(col("Float64"), opts) == "if(isFinite(`c`), `c`, NULL)")
    assert(ClickHouseDialect.readExpression(col("Array(Int32)"), opts) == "toString(`c`)")
    assert(ClickHouseDialect.readExpression(col("AggregateFunction(uniq, String)"), opts) == "NULL")
    assert(ClickHouseDialect.readExpression(col("Int64"), opts) == "`c`")
  }

  test("teradata PERIOD expands to _BEGINNING/_END via begin()/end()") {
    val c = ColumnMeta("s", "t", 1, "validity", "PD")
    val expanded = TeradataDialect.expandColumns(c, opts)
    assert(expanded == Seq("validity_BEGINNING" -> "begin(\"validity\")", "validity_END" -> "end(\"validity\")"))
    val plain = TeradataDialect.expandColumns(ColumnMeta("s", "t", 1, "x", "I"), opts)
    assert(plain == Seq("x" -> "\"x\""))
  }

  test("teradata UNICODE byte-halving is in the catalog query") {
    val q = TeradataDialect.columnsQuery(SchemaFilter("%"))
    assert(q.contains("CharType = 2") && q.contains("ColumnLength / 2"))
  }

  test("teradata binary base64 with 48000-byte transfer limit") {
    val e = TeradataDialect.readExpression(
      ColumnMeta("s", "t", 1, "b", "BV"),
      opts.copy(binaryHandling = BinaryHandling.Base64)
    )
    assert(e.contains("octet_length") && e.contains("48000") && e.contains("base64m"))
  }

  test("sqlserver multi-database expansion and DB2SCHEMA packing") {
    val q = SqlServerDialect.multiDbColumnsQuery(Seq("SalesDb", "HrDb"))
    assert(q.contains("[SalesDb].sys.columns") && q.contains("[HrDb].sys.columns"))
    assert(q.split("UNION ALL").length == 2)
    assert(SqlServerDialect.packDb2Schema("SalesDb", "dbo", "orders") == (("SalesDb", "dbo_orders")))
  }

  test("sqlserver read expressions: tz normalization, WKT, hierarchyid, lob truncation") {
    def c(t: String) = ColumnMeta("s", "t", 1, "c", t)
    assert(SqlServerDialect.readExpression(c("datetimeoffset"), opts).contains("AT TIME ZONE 'UTC'"))
    assert(SqlServerDialect.readExpression(c("geometry"), opts) == "[c].STAsText()")
    assert(SqlServerDialect.readExpression(c("hierarchyid"), opts) == "[c].ToString()")
    assert(
      SqlServerDialect.readExpression(c("xml"), opts.copy(truncateLongStrings = true))
        .startsWith("LEFT(CAST(")
    )
    assert(SqlServerDialect.readExpression(c("varbinary"), opts.copy(binaryHandling = BinaryHandling.Hex)) ==
      "CONVERT(VARCHAR(MAX), [c], 2)")
  }

  test("Teradata RANGE_N PPI text: single-column emission vs review notes") {
    import TeradataDialect.{partitionColumnFromPpi, ppiPartitionStmt}
    // single-level RANGE_N over a bare column → extracted
    val simple =
      "CHECK ((RANGE_N(sale_date BETWEEN DATE '2020-01-01' AND DATE '2023-12-31' EACH INTERVAL '1' MONTH)) BETWEEN 1 AND 65535)"
    assert(partitionColumnFromPpi(simple).contains("sale_date"))
    assert(
      ppiPartitionStmt("sales", "fact", simple) ==
        """ALTER TABLE "sales"."fact" PARTITION BY "sale_date";"""
    )
    // CASE_N → review note
    val caseN = "CHECK ((CASE_N(amount < 100, amount < 1000, NO CASE) ) BETWEEN 1 AND 65535)"
    assert(partitionColumnFromPpi(caseN).isEmpty)
    assert(ppiPartitionStmt("s", "t", caseN).startsWith("-- \"s\".\"t\" Teradata partitioning not auto-mapped"))
    // multi-level PPI (second RANGE_N) → review note
    val multi =
      "CHECK ((RANGE_N(d BETWEEN DATE '2020-01-01' AND DATE '2021-01-01' EACH INTERVAL '1' DAY)) * 10 + (RANGE_N(r BETWEEN 1 AND 10 EACH 1)) BETWEEN 1 AND 65535)"
    assert(partitionColumnFromPpi(multi).isEmpty)
    // expression-based RANGE_N (not a bare column) → review note
    val exprPpi =
      "CHECK ((RANGE_N(EXTRACT(YEAR FROM d) BETWEEN 2020 AND 2024 EACH 1)) BETWEEN 1 AND 65535)"
    assert(partitionColumnFromPpi(exprPpi).isEmpty)
    // no PPI marker at all → review note
    assert(partitionColumnFromPpi("CHECK (x > 0)").isEmpty)
  }

  test("delta import decision tree") {
    val d = PostgresDialect
    assert(decide(TableSync(Nil, None), d) == TruncateFullReload)
    assert(decide(TableSync(Seq("id"), None), d) == StagedFullMerge)
    assert(decide(TableSync(Seq("id"), Some("updated_at"), watermark = None), d) == StagedFullMerge)
    decide(TableSync(Seq("id"), Some("updated_at"), "timestamp", Some("2024-01-01 00:00:00")), d) match {
      case StagedDeltaMerge(p) =>
        assert(p == "\"updated_at\" >= TIMESTAMP '2024-01-01 00:00:00'") // inclusive boundary
      case other => fail(s"unexpected $other")
    }
  }
}
