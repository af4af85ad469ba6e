package graft.core

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types._
import graft.core.options._
import graft.core.PartitionPlanner.SourcePartition

class Dialect3Spec extends AnyFunSuite {
  private val opts = MigrationOptions()
  private def col(t: String, p: Option[Int] = None, s: Option[Int] = None) =
    ColumnMeta("s", "t", 1, "c", t, precision = p, scale = s)

  test("oracle NUMBER mapping and DATE-with-time") {
    assert(OracleDialect.toSparkType(col("NUMBER", Some(10), Some(2)), opts) == DecimalType(10, 2))
    assert(OracleDialect.toSparkType(col("NUMBER"), opts) == DoubleType)
    assert(OracleDialect.toSparkType(col("DATE"), opts) == TimestampNTZType) // Oracle DATE has time
    assert(OracleDialect.toSparkType(col("TIMESTAMP(6) WITH TIME ZONE"), opts) == TimestampType)
    assert(OracleDialect.toSparkType(col("INTERVAL DAY(2) TO SECOND(6)"), opts).isInstanceOf[DayTimeIntervalType])
  }

  test("oracle partition read stitching: bins become UNION ALL partition clauses") {
    val parts = Seq(
      SourcePartition("P1", 100), SourcePartition("P2", 90),
      SourcePartition("P3", 10), SourcePartition("P4", 5)
    )
    val stmts = OracleDialect.partitionReadStatements("hr", "emp", parts, 2)
    assert(stmts.length == 2)
    assert(stmts.forall(_.contains("/*+parallel*/")))
    // largest-first greedy: P1(100)→bin0, P2(90)→bin1, P3(10)→bin1
    // (load 90<100), P4(5)→bin0 (tie broken by index)
    assert(stmts.exists(s => s.contains("partition(\"P1\")") && s.contains("partition(\"P4\")")))
    assert(stmts.exists(s => s.contains("partition(\"P2\")") && s.contains("partition(\"P3\")")))
    assert(stmts.forall(_.contains("UNION ALL")))
  }

  test("oracle hash-split fallback covers all residues") {
    val stmts = OracleDialect.hashSplitStatements("hr", "emp", 4)
    assert(stmts.length == 4)
    (0 until 4).foreach(i => assert(stmts(i).contains(s"ora_hash(rowid, 3) = $i")))
  }

  test("oracle NLS preamble pins numeric and temporal formats") {
    assert(OracleDialect.sessionPreamble.exists(_.contains("NLS_NUMERIC_CHARACTERS")))
    assert(OracleDialect.sessionPreamble.exists(_.contains("NLS_TIMESTAMP_TZ_FORMAT")))
  }

  test("db2 distinct-UDT resolution and hex limit") {
    assert(Db2Dialect.columnsQuery(SchemaFilter("%")).contains("SOURCENAME"))
    assert(Db2Dialect.readExpression(col("TIME"), opts) == "replace(char(\"c\"), '.', ':')")
    assert(Db2Dialect.readExpression(col("XML"), opts) == "XMLSERIALIZE(\"c\" AS CLOB)")
    assert(
      Db2Dialect.readExpression(col("BLOB"), opts.copy(binaryHandling = BinaryHandling.Hex)) ==
        "HEX(CAST(\"c\" AS VARCHAR(16336) FOR BIT DATA))"
    )
  }

  test("netezza FORMAT_TYPE parsing") {
    assert(NetezzaDialect.parseFormatType("NUMERIC(12,4)") == (("NUMERIC", Some(12), Some(4))))
    assert(NetezzaDialect.parseFormatType("CHARACTER VARYING(40)") == (("CHARACTER VARYING", Some(40), None)))
    assert(NetezzaDialect.parseFormatType("DOUBLE PRECISION") == (("DOUBLE PRECISION", None, None)))
    assert(NetezzaDialect.toSparkType(col("NUMERIC(12,4)"), opts) == DecimalType(12, 4))
  }

  test("netezza interval rebuild and hex") {
    val e = NetezzaDialect.readExpression(col("INTERVAL"), opts)
    assert(e.contains("EXTRACT(DAY FROM") && e.contains("lpad"))
    assert(
      NetezzaDialect.readExpression(col("BINARY VARYING"), opts.copy(binaryHandling = BinaryHandling.Hex)) ==
        "to_hex(\"c\")"
    )
  }

  test("saphana TIME driver quirk and BINTOHEX") {
    assert(SapHanaDialect.toSparkType(col("TIME"), opts) == StringType)
    assert(SapHanaDialect.readExpression(col("TIME"), opts) == "TO_VARCHAR(\"c\")")
    assert(
      SapHanaDialect.readExpression(col("BLOB"), opts.copy(binaryHandling = BinaryHandling.Hex)) ==
        "BINTOHEX(\"c\")"
    )
    assert(SapHanaDialect.readExpression(col("ST_GEOMETRY"), opts) == "\"c\".ST_AsText()")
  }

  test("exasol 1:1 type passthrough and native transport preference") {
    assert(ExasolDialect.targetTypeString(col("DECIMAL(18,0)"), opts) == "DECIMAL(18,0)")
    assert(ExasolDialect.toSparkType(col("TIMESTAMP WITH LOCAL TIME ZONE"), opts) == TimestampType)
    assert(ExasolDialect.preferNativeParallelTransport)
  }

  test("job log records steps, statuses and row counts") {
    var t = 0L
    val log = new JobLog("job1", () => { t += 5000000L; t })
    val out = log.step[Seq[Int]]("load", rowCount = _.size.toLong) { Seq(1, 2, 3) }
    assert(out == Seq(1, 2, 3))
    intercept[RuntimeException] {
      log.step[Unit]("validate") { throw new RuntimeException("boom") }
    }
    val entries = log.log
    assert(entries.map(_.step) == Seq(1, 2))
    assert(entries(0).status == "ok" && entries(0).rows == 3 && entries(0).duration_ms == 5)
    assert(entries(1).status.startsWith("error: boom"))
  }
}
