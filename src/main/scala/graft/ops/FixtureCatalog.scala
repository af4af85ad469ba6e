package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A literal catalog snapshot of the fixture tables, shared between the
  * Spark implementations and the generated DuckDB oracle SQL so the two
  * can never drift.
  *
  * This plays the role of the reference's remote catalog scan result
  * (postgresql_to_exasol.sql:104-145): the DDL generators are pure
  * functions of this metadata, so feeding both engines the same literal
  * rows checks the *generator* operators (sort-within-group text
  * aggregation etc.) end to end.
  */
object FixtureCatalog {
  /** (schema, table, ordinal, column, target type, nullable, default) */
  final case class ColRow(
      schema_name: String,
      table_name: String,
      ordinal: Int,
      col_name: String,
      type_name: String,
      is_nullable: Boolean,
      col_default: Option[String]
  )

  /** (schema, table, constraint, kind P/F, position, column, ref schema, ref table) */
  final case class KeyRow(
      schema_name: String,
      table_name: String,
      constraint_name: String,
      kind: String,
      position: Int,
      col_name: String,
      ref_schema: Option[String],
      ref_table: Option[String]
  )

  private val S = "tpch"

  val columns: Seq[ColRow] = Seq(
    ColRow(S, "region", 1, "r_regionkey", "DECIMAL(9,0)", false, None),
    ColRow(S, "region", 2, "r_name", "VARCHAR(25)", false, None),
    ColRow(S, "nation", 1, "n_nationkey", "DECIMAL(9,0)", false, None),
    ColRow(S, "nation", 2, "n_name", "VARCHAR(25)", false, None),
    ColRow(S, "nation", 3, "n_regionkey", "DECIMAL(9,0)", false, None),
    ColRow(S, "customer", 1, "c_custkey", "DECIMAL(18,0)", false, None),
    ColRow(S, "customer", 2, "c_name", "VARCHAR(40)", true, None),
    ColRow(S, "customer", 3, "c_nationkey", "DECIMAL(9,0)", false, None),
    ColRow(S, "customer", 4, "c_acctbal", "DOUBLE", true, Some("0.0")),
    ColRow(S, "customer", 5, "c_mktsegment", "VARCHAR(10)", true, None),
    ColRow(S, "supplier", 1, "s_suppkey", "DECIMAL(18,0)", false, None),
    ColRow(S, "supplier", 2, "s_name", "VARCHAR(40)", true, None),
    ColRow(S, "supplier", 3, "s_nationkey", "DECIMAL(9,0)", false, None),
    ColRow(S, "supplier", 4, "s_acctbal", "DOUBLE", true, None),
    ColRow(S, "part", 1, "p_partkey", "DECIMAL(18,0)", false, None),
    ColRow(S, "part", 2, "p_name", "VARCHAR(55)", true, None),
    ColRow(S, "part", 3, "p_brand", "VARCHAR(10)", true, None),
    ColRow(S, "part", 4, "p_type", "VARCHAR(25)", true, None),
    ColRow(S, "part", 5, "p_size", "DECIMAL(9,0)", true, None),
    ColRow(S, "part", 6, "p_retailprice", "DOUBLE", true, None),
    ColRow(S, "orders", 1, "o_orderkey", "DECIMAL(18,0)", false, None),
    ColRow(S, "orders", 2, "o_custkey", "DECIMAL(18,0)", false, None),
    ColRow(S, "orders", 3, "o_orderstatus", "VARCHAR(1)", true, None),
    ColRow(S, "orders", 4, "o_totalprice", "DOUBLE", true, None),
    ColRow(S, "orders", 5, "o_orderdate", "TIMESTAMP(3)", true, None),
    ColRow(S, "orders", 6, "o_orderpriority", "VARCHAR(15)", true, None),
    ColRow(S, "lineitem", 1, "l_orderkey", "DECIMAL(18,0)", false, None),
    ColRow(S, "lineitem", 2, "l_partkey", "DECIMAL(18,0)", false, None),
    ColRow(S, "lineitem", 3, "l_suppkey", "DECIMAL(18,0)", false, None),
    ColRow(S, "lineitem", 4, "l_linenumber", "DECIMAL(9,0)", false, None),
    ColRow(S, "lineitem", 5, "l_quantity", "DOUBLE", true, None),
    ColRow(S, "lineitem", 6, "l_extendedprice", "DOUBLE", true, None),
    ColRow(S, "lineitem", 7, "l_discount", "DOUBLE", true, Some("0.0")),
    ColRow(S, "lineitem", 8, "l_tax", "DOUBLE", true, Some("0.0")),
    ColRow(S, "lineitem", 9, "l_returnflag", "VARCHAR(1)", true, None),
    ColRow(S, "lineitem", 10, "l_linestatus", "VARCHAR(1)", true, None),
    ColRow(S, "lineitem", 11, "l_shipdate", "TIMESTAMP(3)", true, None)
  )

  val keys: Seq[KeyRow] = Seq(
    KeyRow(S, "region", "region_pk", "P", 1, "r_regionkey", None, None),
    KeyRow(S, "nation", "nation_pk", "P", 1, "n_nationkey", None, None),
    KeyRow(S, "customer", "customer_pk", "P", 1, "c_custkey", None, None),
    KeyRow(S, "supplier", "supplier_pk", "P", 1, "s_suppkey", None, None),
    KeyRow(S, "part", "part_pk", "P", 1, "p_partkey", None, None),
    KeyRow(S, "orders", "orders_pk", "P", 1, "o_orderkey", None, None),
    KeyRow(S, "lineitem", "lineitem_pk", "P", 1, "l_orderkey", None, None),
    KeyRow(S, "lineitem", "lineitem_pk", "P", 2, "l_linenumber", None, None),
    KeyRow(S, "nation", "nation_region_fk", "F", 1, "n_regionkey", Some(S), Some("region")),
    KeyRow(S, "customer", "customer_nation_fk", "F", 1, "c_nationkey", Some(S), Some("nation")),
    KeyRow(S, "supplier", "supplier_nation_fk", "F", 1, "s_nationkey", Some(S), Some("nation")),
    KeyRow(S, "orders", "orders_customer_fk", "F", 1, "o_custkey", Some(S), Some("customer")),
    KeyRow(S, "lineitem", "lineitem_orders_fk", "F", 1, "l_orderkey", Some(S), Some("orders")),
    KeyRow(S, "lineitem", "lineitem_part_fk", "F", 1, "l_partkey", Some(S), Some("part")),
    KeyRow(S, "lineitem", "lineitem_supplier_fk", "F", 1, "l_suppkey", Some(S), Some("supplier")),
    // Deliberately out of migration scope: its parent table is not in
    // `columns` — the FK generator must skip it (the reference's
    // exists-against-migrated-set rule, postgresql_to_exasol.sql:374-378).
    KeyRow(S, "orders", "orders_currency_fk", "F", 1, "o_orderkey", Some(S), Some("currency"))
  )

  /** (schema, table, column-or-null, comment text) — column rows carry
    * a col_name, table rows NULL (reference pg_description scan,
    * postgresql_to_exasol.sql:253-262).
    */
  final case class CommentRow(
      schema_name: String,
      table_name: String,
      col_name: Option[String],
      comment: String
  )

  /** Partition / distribution metadata (reference: pg_get_partkeydef
    * parse :273-288; Db2 PARTKEYSEQ db2_to_exasol.sql:221-229).
    */
  final case class ExtraRow(
      schema_name: String,
      table_name: String,
      partition_col: Option[String],
      dist_cols: Option[String] // comma-separated, ordered
  )

  val comments: Seq[CommentRow] = Seq(
    CommentRow(S, "orders", None, "All customer orders"),
    CommentRow(S, "orders", Some("o_totalprice"), "Total incl. tax, 2 dp"),
    CommentRow(S, "lineitem", None, "Order line items; Bob's 'fact' table"),
    CommentRow(S, "customer", Some("c_mktsegment"), "Market segment")
  )

  val extras: Seq[ExtraRow] = Seq(
    ExtraRow(S, "orders", Some("o_orderdate"), Some("o_orderkey")),
    ExtraRow(S, "lineitem", Some("l_shipdate"), Some("l_orderkey,l_linenumber")),
    ExtraRow(S, "customer", None, Some("c_custkey")),
    ExtraRow(S, "nation", None, None)
  )

  /** View definitions (reference: pg_get_viewdef review section
    * postgresql_to_exasol.sql:264-271; runnable Exasol form
    * exasol_to_exasol.sql:94-109).
    */
  final case class ViewRow(schema_name: String, view_name: String, definition: String)

  val views: Seq[ViewRow] = Seq(
    ViewRow(S, "open_orders", "SELECT * FROM tpch.orders WHERE o_orderstatus = 'O'"),
    ViewRow(S, "big_orders", "SELECT o_orderkey FROM tpch.orders WHERE o_totalprice > 100000")
  )

  def viewsDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    views.toDF()
  }

  def viewsValuesSql: String = {
    val rows = views
      .map(v => s"(${sqlLit(v.schema_name)}, ${sqlLit(v.view_name)}, ${sqlLit(v.definition)})")
      .mkString(", ")
    s"(VALUES $rows) AS views(schema_name, view_name, definition)"
  }

  def commentsDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    comments.toDF()
  }

  def extrasDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    extras.toDF()
  }

  def commentsValuesSql: String = {
    val rows = comments
      .map(c =>
        s"(${sqlLit(c.schema_name)}, ${sqlLit(c.table_name)}, ${sqlLit(c.col_name)}, ${sqlLit(c.comment)})"
      )
      .mkString(", ")
    s"(VALUES $rows) AS comments(schema_name, table_name, col_name, comment)"
  }

  def extrasValuesSql: String = {
    val rows = extras
      .map(e =>
        s"(${sqlLit(e.schema_name)}, ${sqlLit(e.table_name)}, ${sqlLit(e.partition_col)}, ${sqlLit(e.dist_cols)})"
      )
      .mkString(", ")
    s"(VALUES $rows) AS extras(schema_name, table_name, partition_col, dist_cols)"
  }

  def columnsDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    columns.toDF()
  }

  def keysDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    keys.toDF()
  }

  private def sqlLit(s: String): String = "'" + s.replace("'", "''") + "'"
  private def sqlLit(o: Option[String]): String =
    o.map(sqlLit).getOrElse("CAST(NULL AS VARCHAR)")

  /** DuckDB VALUES clause mirroring [[columns]] exactly. */
  def columnsValuesSql: String = {
    val rows = columns
      .map(c =>
        s"(${sqlLit(c.schema_name)}, ${sqlLit(c.table_name)}, ${c.ordinal}, " +
          s"${sqlLit(c.col_name)}, ${sqlLit(c.type_name)}, ${c.is_nullable}, ${sqlLit(c.col_default)})"
      )
      .mkString(", ")
    s"(VALUES $rows) AS cols(schema_name, table_name, ordinal, col_name, type_name, is_nullable, col_default)"
  }

  /** DuckDB VALUES clause mirroring [[keys]] exactly. */
  def keysValuesSql: String = {
    val rows = keys
      .map(k =>
        s"(${sqlLit(k.schema_name)}, ${sqlLit(k.table_name)}, ${sqlLit(k.constraint_name)}, " +
          s"${sqlLit(k.kind)}, ${k.position}, ${sqlLit(k.col_name)}, ${sqlLit(k.ref_schema)}, ${sqlLit(k.ref_table)})"
      )
      .mkString(", ")
    s"(VALUES $rows) AS keys(schema_name, table_name, constraint_name, kind, position, col_name, ref_schema, ref_table)"
  }
}
