package graft.core

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types._
import graft.core.options.MigrationOptions

class DialectLegacySpec extends AnyFunSuite {
  private val opts = MigrationOptions()
  private def col(t: String, p: Option[Int] = None, s: Option[Int] = None) =
    ColumnMeta("s", "t", 1, "c", t, precision = p, scale = s)

  test("snowflake: NUMBER defaults, semi-structured JSON reads, geography WKT") {
    assert(SnowflakeDialect.toSparkType(col("NUMBER", Some(38), Some(0)), opts) == DecimalType(38, 0))
    assert(SnowflakeDialect.toSparkType(col("TIMESTAMP_LTZ"), opts) == TimestampType)
    assert(SnowflakeDialect.readExpression(col("VARIANT"), opts) == "TO_JSON(\"c\")")
    assert(SnowflakeDialect.readExpression(col("GEOGRAPHY"), opts) == "ST_ASTEXT(\"c\")")
  }

  test("redshift: SUPER serialization and int widths") {
    assert(RedshiftDialect.toSparkType(col("INT4"), opts) == IntegerType)
    assert(RedshiftDialect.readExpression(col("SUPER"), opts) == "JSON_SERIALIZE(\"c\")")
  }

  test("bigquery: per-dataset template expansion and nested JSON reads") {
    val q = BigQueryDialect.multiDatasetColumnsQuery(Seq("ds1", "ds2"))
    assert(q.contains("`ds1`.INFORMATION_SCHEMA.COLUMNS") && q.contains("`ds2`.INFORMATION_SCHEMA.COLUMNS"))
    assert(q.split("UNION ALL").length == 2)
    assert(BigQueryDialect.toSparkType(col("BIGNUMERIC"), opts) == DecimalType(38, 18))
    assert(BigQueryDialect.readExpression(col("ARRAY<INT64>"), opts) == "TO_JSON_STRING(\"c\")")
  }

  test("bigquery: wildcard filter iterates discovered datasets; concrete filter does not") {
    // wildcard → one query per discovered dataset, system schemas out,
    // table filter pushed into each
    var listed = false
    val qs = BigQueryDialect.columnsQueriesFor(
      SchemaFilter("%"),
      { listed = true; Seq("ds2", "ds1", "INFORMATION_SCHEMA") },
      tableFilter = "fact%"
    )
    assert(listed)
    assert(qs.length == 2 && qs.head.contains("`ds1`.") && qs(1).contains("`ds2`."))
    assert(qs.forall(_.contains("table_name LIKE 'fact%'")))
    assert(qs.forall(_.contains("table_type = 'BASE TABLE'")))
    // concrete filter → single dataset query, no dataset listing fetch
    var listedConcrete = false
    val one = BigQueryDialect.columnsQueriesFor(
      SchemaFilter("mydata"),
      { listedConcrete = true; Seq("unused") }
    )
    assert(!listedConcrete)
    assert(one.length == 1 && one.head.contains("`mydata`.INFORMATION_SCHEMA.COLUMNS"))
    assert(BigQueryDialect.datasetsQuery.contains("INFORMATION_SCHEMA.SCHEMATA"))
  }

  test("vertica 64-bit ints; vectorwise iicolumns catalog") {
    assert(VerticaDialect.toSparkType(col("INTEGER"), opts) == LongType)
    assert(VectorwiseDialect.columnsQuery(SchemaFilter("%")).contains("iicolumns"))
    assert(VectorwiseDialect.toSparkType(col("INGRESDATE"), opts) == DateType)
  }

  test("mariadb: versioned tables in, sequences out, zero-date FAIL literal") {
    val q = MariaDbDialect.columnsQuery(SchemaFilter("%"))
    assert(q.contains("SYSTEM VERSIONED") && q.contains("<> 'SEQUENCE'"))
    val e = MariaDbDialect.readExpression(
      ColumnMeta("s", "t", 1, "d", "datetime"),
      MigrationOptions() // FAIL default
    )
    assert(e.contains("'0000-00-00'"))
    assert(MariaDbDialect.translateDefault("'abc'") == Some("'abc'"))
    assert(MariaDbDialect.translateDefault("NULL") == None)
    assert(MariaDbDialect.translateDefault("current_timestamp()") == Some("CURRENT_TIMESTAMP"))
  }

  test("connection probe: URL prefix detection with generic fallback") {
    assert(ConnectionProbe.detect("jdbc:postgresql://h/db").contains(PostgresDialect))
    assert(ConnectionProbe.detect("jdbc:oracle:thin:@h:1521/x").contains(OracleDialect))
    assert(ConnectionProbe.detect("jdbc:clickhouse://h:8123/d").contains(ClickHouseDialect))
    assert(ConnectionProbe.detect("JDBC:EXA:host:8563").contains(ExasolDialect))
    assert(ConnectionProbe.detect("jdbc:unknown://x").isEmpty)
    assert(ConnectionProbe.detectOrGeneric("jdbc:unknown://x") == GenericJdbcDialect)
    assert(ConnectionProbe.probeQuery.contains("Connection works"))
  }

  test("all 16 dialects expose coherent catalog queries") {
    val dialects: Seq[SourceDialect] = Seq(
      PostgresDialect, MySqlDialect, GenericJdbcDialect, ClickHouseDialect, TeradataDialect,
      SqlServerDialect, OracleDialect, Db2Dialect, NetezzaDialect, SapHanaDialect, ExasolDialect,
      SnowflakeDialect, RedshiftDialect, BigQueryDialect, VerticaDialect, VectorwiseDialect
    )
    assert(dialects.map(_.name).distinct.size == 16) // mysql additionally covers mariadb
    dialects.foreach { d =>
      val q = d.columnsQuery(SchemaFilter("myschema"))
      assert(q.toLowerCase.contains("table_schema"), d.name)
      assert(q.toLowerCase.contains("myschema"), d.name)
      assert(d.keysQuery(SchemaFilter("%")).toLowerCase.contains("constraint"), d.name)
    }
  }
}
