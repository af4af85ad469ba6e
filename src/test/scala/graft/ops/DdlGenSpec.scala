package graft.ops

import graft.SparkSpec

/** Golden tests on the DDL text generators — the reference's dry-run
  * contract is byte-stable reviewable statement text (SURVEY.md §7.4.6).
  */
class DdlGenSpec extends SparkSpec {

  private def stmts(df: org.apache.spark.sql.DataFrame): Map[String, String] =
    df.collect().map(r => r.getAs[String]("table_name") -> r.getAs[String]("stmt")).toMap

  test("CREATE TABLE golden: region") {
    val m = stmts(DdlGen.createTableStmts(FixtureCatalog.columnsDf(spark)))
    assert(
      m("region") ==
        """CREATE TABLE "TPCH"."REGION" ("R_REGIONKEY" DECIMAL(9,0) NOT NULL, "R_NAME" VARCHAR(25) NOT NULL);"""
    )
  }

  test("CREATE TABLE golden: defaults and NOT NULL interleave correctly") {
    val m = stmts(DdlGen.createTableStmts(FixtureCatalog.columnsDf(spark)))
    assert(m("customer").contains(""""C_ACCTBAL" DOUBLE DEFAULT 0.0"""))
    assert(m("lineitem").contains(""""L_DISCOUNT" DOUBLE DEFAULT 0.0"""))
    assert(m("lineitem").startsWith("""CREATE TABLE "TPCH"."LINEITEM" ("L_ORDERKEY" DECIMAL(18,0) NOT NULL"""))
  }

  test("composite PK preserves key ordinal order, created DISABLE") {
    val m = stmts(DdlGen.primaryKeyStmts(FixtureCatalog.keysDf(spark)))
    assert(
      m("lineitem") ==
        """ALTER TABLE "TPCH"."LINEITEM" ADD CONSTRAINT "LINEITEM_PK" PRIMARY KEY ("L_ORDERKEY","L_LINENUMBER") DISABLE;"""
    )
  }

  test("FK with out-of-scope parent is skipped") {
    val fks = DdlGen
      .foreignKeyStmts(FixtureCatalog.keysDf(spark), FixtureCatalog.columnsDf(spark))
      .collect()
      .map(_.getAs[String]("stmt"))
    assert(fks.length == 7) // 8 declared FKs minus orders_currency_fk (parent not migrated)
    assert(!fks.exists(_.contains("CURRENCY")))
  }

  test("view definitions normalize to canonical runnable headers") {
    import DdlGen.normalizeViewDefinition
    assert(
      normalizeViewDefinition("s", "v", "SELECT 1") ==
        """CREATE OR REPLACE FORCE VIEW "S"."V" AS SELECT 1;"""
    )
    assert(
      normalizeViewDefinition("s", "v", "create view old_name as SELECT a FROM t") ==
        """CREATE OR REPLACE FORCE VIEW "S"."V" AS SELECT a FROM t;"""
    )
    assert(
      normalizeViewDefinition("s", "v", "CREATE OR REPLACE FORCE VIEW \"x\".\"y\" AS\nSELECT 2") ==
        """CREATE OR REPLACE FORCE VIEW "S"."V" AS SELECT 2;"""
    )
  }

  test("postgres partition-def parser keeps only single bare columns") {
    import graft.core.PostgresDialect.parsePartitionDef
    assert(parsePartitionDef("RANGE (o_orderdate)") == Some("o_orderdate"))
    assert(parsePartitionDef("LIST (region)") == Some("region"))
    assert(parsePartitionDef("RANGE (a, b)") == None) // multi-column → review note
    assert(parsePartitionDef("RANGE (date_trunc('day', ts))") == None) // expression → review note
    val q = graft.core.PostgresDialect.commentsQuery(graft.core.SchemaFilter("%"))
    assert(q.contains("pg_description") && q.contains("objsubid"))
    assert(graft.core.PostgresDialect.viewsQuery(graft.core.SchemaFilter("%")).contains("pg_get_viewdef"))
    assert(graft.core.PostgresDialect.partitionDefQuery(graft.core.SchemaFilter("%")).contains("pg_get_partkeydef"))
  }

  test("statement stream is section-ordered: schemas, tables, PKs, FKs") {
    val ords = DdlGen
      .statementStream(FixtureCatalog.columnsDf(spark), FixtureCatalog.keysDf(spark))
      .collect()
      .map(_.getAs[Int]("ord"))
    assert(ords.toSeq == ords.sorted.toSeq)
    assert(ords.distinct.toSeq == Seq(2, 4, 6, 8))
  }
}
