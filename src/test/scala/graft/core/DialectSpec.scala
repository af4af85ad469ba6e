package graft.core

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types._
import graft.core.options._

class DialectSpec extends AnyFunSuite {
  private val opts = MigrationOptions()
  private def pgCol(t: String, p: Option[Int] = None, s: Option[Int] = None, len: Option[Int] = None) =
    ColumnMeta("s", "t", 1, "c", t, precision = p, scale = s, charLength = len)

  test("postgres type matrix: integers, numeric, temporal") {
    assert(PostgresDialect.toSparkType(pgCol("smallint"), opts) == ShortType)
    assert(PostgresDialect.toSparkType(pgCol("bigint"), opts) == LongType)
    assert(PostgresDialect.toSparkType(pgCol("numeric", Some(10), Some(2)), opts) == DecimalType(10, 2))
    assert(PostgresDialect.toSparkType(pgCol("numeric"), opts) == DoubleType) // bare numeric → overflow policy
    assert(PostgresDialect.toSparkType(pgCol("timestamp with time zone"), opts) == TimestampType)
    assert(PostgresDialect.toSparkType(pgCol("timestamp without time zone"), opts) == TimestampNTZType)
    assert(PostgresDialect.toSparkType(pgCol("uuid"), opts) == StringType)
  }

  test("postgres binary handling modes change type and read expression") {
    val c = pgCol("bytea")
    assert(PostgresDialect.toSparkType(c, opts) == BinaryType) // Native default: Spark is stronger
    val b64 = opts.copy(binaryHandling = BinaryHandling.Base64)
    assert(PostgresDialect.toSparkType(c, b64) == StringType)
    assert(PostgresDialect.readExpression(c, b64) == "encode(\"c\", 'base64')")
    assert(PostgresDialect.readExpression(c, opts.copy(binaryHandling = BinaryHandling.Hex)) == "encode(\"c\", 'hex')")
  }

  test("postgres timestamptz reads normalize to UTC instant") {
    val e = PostgresDialect.readExpression(pgCol("timestamp with time zone"), opts)
    assert(e.contains("at time zone 'UTC'"))
  }

  test("postgres temporal out-of-range policies wrap the expression") {
    val c = pgCol("date")
    assert(PostgresDialect.readExpression(c, opts) == "\"c\"") // FAIL = passthrough
    val n = PostgresDialect.readExpression(c, opts.copy(temporalOutOfRange = TemporalOutOfRange.Null))
    assert(n.contains("CASE WHEN") && n.contains("0001-01-01"))
    val cl = PostgresDialect.readExpression(c, opts.copy(temporalOutOfRange = TemporalOutOfRange.Clamp))
    assert(cl.contains("least(greatest"))
  }

  test("postgres complex types flatten to text") {
    assert(PostgresDialect.readExpression(pgCol("integer[]"), opts) == "\"c\"::text")
    assert(PostgresDialect.readExpression(pgCol("time"), opts) == "\"c\"::text")
  }

  test("postgres truncate-long-strings option") {
    val c = pgCol("text")
    assert(PostgresDialect.readExpression(c, opts) == "\"c\"")
    assert(
      PostgresDialect.readExpression(c, opts.copy(truncateLongStrings = true)) ==
        "left(\"c\"::text, 2000000)"
    )
  }

  test("mysql unsigned widening + text reads (driver overflow quirk)") {
    def col(t: String) = ColumnMeta("s", "t", 1, "c", t)
    assert(MySqlDialect.toSparkType(col("bigint unsigned"), opts) == DecimalType(20, 0))
    assert(MySqlDialect.toSparkType(col("mediumint unsigned"), opts) == DecimalType(8, 0))
    assert(MySqlDialect.toSparkType(col("int"), opts) == IntegerType)
    assert(MySqlDialect.readExpression(col("bigint unsigned"), opts) == "CAST(`c` AS CHAR)")
    assert(MySqlDialect.readExpression(col("bigint"), opts) == "`c`")
  }

  test("mysql zero-date policy and geometry WKT") {
    def col(t: String) = ColumnMeta("s", "t", 1, "c", t)
    val n = MySqlDialect.readExpression(col("datetime"), opts.copy(temporalOutOfRange = TemporalOutOfRange.Null))
    assert(n == "(CASE WHEN `c` = 0 THEN NULL ELSE `c` END)")
    assert(MySqlDialect.readExpression(col("geometry"), opts) == "ST_AsText(`c`)")
  }

  test("schema filter compiles LIKE vs IN from comma lists") {
    assert(SchemaFilter("%").toSql("s") == "1 = 1")
    assert(SchemaFilter("tpch").toSql("s") == "upper(s) LIKE upper('tpch')")
    assert(SchemaFilter("a,b").toSql("s") == "upper(s) IN (upper('a'), upper('b'))")
  }

  test("catalog queries embed system-schema exclusions and the filter") {
    val q = PostgresDialect.columnsQuery(SchemaFilter("tpch"))
    assert(q.contains("'pg_catalog'") && q.contains("LIKE upper('tpch')"))
    assert(q.contains("typbasetype")) // recursive domain walk
    val k = PostgresDialect.keysQuery(SchemaFilter("%"))
    assert(k.contains("WITH ORDINALITY")) // composite key order
  }

  test("delta literals render per type family") {
    assert(PostgresDialect.deltaLiteral("2024-01-01", "date") == "DATE '2024-01-01'")
    assert(PostgresDialect.deltaLiteral("2024-01-01 10:00:00", "timestamp") == "TIMESTAMP '2024-01-01 10:00:00'")
    assert(PostgresDialect.deltaLiteral("42", "numeric") == "42")
    assert(PostgresDialect.deltaLiteral("o'x", "varchar") == "'o''x'")
  }
}
