package graft.core

import org.apache.spark.sql.types._
import graft.core.options.MigrationOptions

/** The legacy-generation source scans (SURVEY.md §2.A #14):
  * Snowflake / Redshift / BigQuery / Vertica / Vectorwise. The
  * reference's scripts for these are ad-hoc INFORMATION_SCHEMA
  * readers with smaller type matrices (snowflake_to_exasol.sql:69-111;
  * redshift_to_exasol.sql:23-33; bigquery_to_exasol.sql:27-49;
  * vertica_to_exasol.sql:24-78; vectorwise_to_exasol.sql:27-31); the
  * same compactness is kept here — the shared machinery (plan builder,
  * movement, validation) comes from the core.
  */
abstract class InformationSchemaDialect extends SourceDialect {
  def columnsQuery(filter: SchemaFilter): String =
    s"""SELECT table_schema, table_name, ordinal_position AS ordinal, column_name,
       |       data_type AS type_name, is_nullable = 'YES' AS is_nullable,
       |       column_default, character_maximum_length AS char_length,
       |       numeric_precision AS num_precision, numeric_scale AS num_scale
       |FROM information_schema.columns
       |WHERE table_schema NOT IN (${systemSchemas.map(s => s"'$s'").mkString(", ")})
       |  AND ${filter.toSql("table_schema")}""".stripMargin

  def keysQuery(filter: SchemaFilter): String =
    s"""SELECT k.table_schema, k.table_name, k.constraint_name,
       |       CASE t.constraint_type WHEN 'PRIMARY KEY' THEN 'P' ELSE 'F' END AS kind,
       |       k.ordinal_position AS position, k.column_name,
       |       CAST(NULL AS VARCHAR) AS ref_schema, CAST(NULL AS VARCHAR) AS ref_table
       |FROM information_schema.key_column_usage k
       |JOIN information_schema.table_constraints t
       |  ON t.constraint_name = k.constraint_name AND t.table_schema = k.table_schema
       |WHERE t.constraint_type IN ('PRIMARY KEY', 'FOREIGN KEY')
       |  AND ${filter.toSql("k.table_schema")}""".stripMargin

  protected def base(c: ColumnMeta): String = c.typeName.toUpperCase.takeWhile(_ != '(').trim

  def targetTypeString(c: ColumnMeta, opts: MigrationOptions): String =
    PostgresDialectLikeTarget.render(toSparkType(c, opts), c)

  def readExpression(c: ColumnMeta, opts: MigrationOptions): String = quoteIdent(c.name)
}

/** Snowflake: NUMBER(38,0) default integers; VARIANT/OBJECT/ARRAY
  * were data-dropped placeholders in the legacy script
  * (snowflake_to_exasol.sql:198-201) — here they flatten to JSON text
  * (strictly more faithful), geography → WKT (:190-191).
  */
object SnowflakeDialect extends InformationSchemaDialect {
  val name = "snowflake"
  val systemSchemas: Seq[String] = Seq("INFORMATION_SCHEMA")

  def toSparkType(c: ColumnMeta, opts: MigrationOptions): DataType = base(c) match {
    case "NUMBER" | "DECIMAL" | "NUMERIC" =>
      DecimalType(c.precision.getOrElse(38), c.scale.getOrElse(0))
    case "FLOAT" | "FLOAT4" | "FLOAT8" | "DOUBLE" | "REAL" => DoubleType
    case "BOOLEAN" => BooleanType
    case "TEXT" | "VARCHAR" | "CHAR" | "STRING" => StringType
    case "DATE" => DateType
    case "TIME" => StringType
    case "TIMESTAMP_NTZ" | "DATETIME" => TimestampNTZType
    case "TIMESTAMP_LTZ" | "TIMESTAMP_TZ" => TimestampType
    case "BINARY" | "VARBINARY" => BinaryType
    case "VARIANT" | "OBJECT" | "ARRAY" | "GEOGRAPHY" | "GEOMETRY" => StringType
    case _ => StringType
  }

  override def readExpression(c: ColumnMeta, opts: MigrationOptions): String = base(c) match {
    case "VARIANT" | "OBJECT" | "ARRAY" => s"TO_JSON(${quoteIdent(c.name)})"
    case "GEOGRAPHY" | "GEOMETRY" => s"ST_ASTEXT(${quoteIdent(c.name)})" // :190-191
    case "TIME" => s"TO_VARCHAR(${quoteIdent(c.name)})"
    case _ => quoteIdent(c.name)
  }
}

/** Redshift: SUPER → JSON text, inline temporal clamp
  * (redshift_to_exasol.sql:111-112).
  */
object RedshiftDialect extends InformationSchemaDialect {
  val name = "redshift"
  val systemSchemas: Seq[String] = Seq("pg_catalog", "information_schema", "pg_internal")

  def toSparkType(c: ColumnMeta, opts: MigrationOptions): DataType = base(c) match {
    case "SMALLINT" | "INT2" => ShortType
    case "INTEGER" | "INT" | "INT4" => IntegerType
    case "BIGINT" | "INT8" => LongType
    case "NUMERIC" | "DECIMAL" => DecimalType(c.precision.getOrElse(18), c.scale.getOrElse(0))
    case "REAL" | "FLOAT4" => FloatType
    case "DOUBLE PRECISION" | "FLOAT8" | "FLOAT" => DoubleType
    case "BOOLEAN" | "BOOL" => BooleanType
    case "CHAR" | "CHARACTER" | "VARCHAR" | "CHARACTER VARYING" | "TEXT" => StringType
    case "DATE" => DateType
    case "TIMESTAMP" | "TIMESTAMP WITHOUT TIME ZONE" => TimestampNTZType
    case "TIMESTAMPTZ" | "TIMESTAMP WITH TIME ZONE" => TimestampType
    case "TIME" | "TIMETZ" => StringType
    case "SUPER" | "HLLSKETCH" | "GEOMETRY" | "GEOGRAPHY" | "VARBYTE" => StringType
    case _ => StringType
  }

  override def readExpression(c: ColumnMeta, opts: MigrationOptions): String = base(c) match {
    case "SUPER" => s"JSON_SERIALIZE(${quoteIdent(c.name)})"
    case "GEOMETRY" | "GEOGRAPHY" => s"ST_ASTEXT(${quoteIdent(c.name)})"
    case _ => quoteIdent(c.name)
  }
}

/** BigQuery: dataset-per-schema iteration (the reference builds one
  * query per dataset, bigquery_to_exasol.sql:27-49) — here a template
  * expansion like SQL Server's multi-DB scan.
  */
object BigQueryDialect extends InformationSchemaDialect {
  val name = "bigquery"
  val systemSchemas: Seq[String] = Seq("INFORMATION_SCHEMA")

  def perDatasetColumnsQuery(dataset: String, tableFilter: String = "%"): String =
    s"""SELECT table_schema, table_name, ordinal_position AS ordinal, column_name,
       |       data_type AS type_name, is_nullable = 'YES' AS is_nullable,
       |       NULL AS column_default, NULL AS char_length,
       |       NULL AS num_precision, NULL AS num_scale
       |FROM `$dataset`.INFORMATION_SCHEMA.COLUMNS
       |JOIN `$dataset`.INFORMATION_SCHEMA.TABLES USING (table_catalog, table_schema, table_name)
       |WHERE table_type = 'BASE TABLE'
       |  AND table_schema NOT IN ('INFORMATION_SCHEMA')
       |  AND table_name LIKE '${tableFilter.replace("'", "''")}'""".stripMargin

  def multiDatasetColumnsQuery(datasets: Seq[String]): String =
    datasets.map(d => perDatasetColumnsQuery(d)).mkString("\nUNION ALL\n")

  /** Dataset discovery — step 1 of the reference's '%'-filter loop
    * (bigquery_to_exasol.sql:27-31): BigQuery's INFORMATION_SCHEMA is
    * dataset-scoped, so a wildcard scan must first list datasets.
    */
  def datasetsQuery: String = "SELECT schema_name FROM INFORMATION_SCHEMA.SCHEMATA"

  /** The reference's per-dataset fan-out (bigquery_to_exasol.sql:27-49):
    * a '%' schema filter expands into one catalog query per discovered
    * dataset (run `datasetsQuery` on the source to obtain them); a
    * concrete filter goes straight to that dataset. Evaluated lazily so
    * the dataset listing is only fetched when the wildcard path runs.
    */
  def columnsQueriesFor(filter: SchemaFilter, datasets: => Seq[String], tableFilter: String = "%"): Seq[String] =
    if (filter.pattern == "%")
      datasets.filterNot(systemSchemas.contains).distinct.sorted.map(d => perDatasetColumnsQuery(d, tableFilter))
    else Seq(perDatasetColumnsQuery(filter.pattern, tableFilter))

  def toSparkType(c: ColumnMeta, opts: MigrationOptions): DataType = base(c) match {
    case "INT64" | "INTEGER" => LongType
    case "NUMERIC" => DecimalType(38, 9)
    case "BIGNUMERIC" => DecimalType(38, 18)
    case "FLOAT64" | "FLOAT" => DoubleType
    case "BOOL" | "BOOLEAN" => BooleanType
    case "STRING" => StringType
    case "DATE" => DateType
    case "DATETIME" => TimestampNTZType
    case "TIMESTAMP" => TimestampType
    case "TIME" => StringType
    case "BYTES" => BinaryType
    case "GEOGRAPHY" | "JSON" => StringType
    case t if t.startsWith("ARRAY") || t.startsWith("STRUCT") => StringType
    case _ => StringType
  }

  override def readExpression(c: ColumnMeta, opts: MigrationOptions): String = base(c) match {
    case t if t.startsWith("ARRAY") || t.startsWith("STRUCT") || t == "JSON" =>
      s"TO_JSON_STRING(${quoteIdent(c.name)})"
    case "GEOGRAPHY" => s"ST_ASTEXT(${quoteIdent(c.name)})"
    case _ => quoteIdent(c.name)
  }
}

/** Vertica (vertica_to_exasol.sql:24-78). */
object VerticaDialect extends InformationSchemaDialect {
  val name = "vertica"
  val systemSchemas: Seq[String] = Seq("v_catalog", "v_monitor", "v_internal")

  def toSparkType(c: ColumnMeta, opts: MigrationOptions): DataType = base(c) match {
    case "INT" | "INTEGER" | "BIGINT" | "SMALLINT" | "TINYINT" => LongType // Vertica ints are 64-bit
    case "NUMERIC" | "DECIMAL" | "NUMBER" | "MONEY" =>
      DecimalType(c.precision.getOrElse(37), c.scale.getOrElse(0))
    case "FLOAT" | "FLOAT8" | "DOUBLE PRECISION" | "REAL" => DoubleType
    case "BOOLEAN" => BooleanType
    case "CHAR" | "VARCHAR" | "LONG VARCHAR" => StringType
    case "DATE" => DateType
    case "TIMESTAMP" | "DATETIME" | "SMALLDATETIME" => TimestampNTZType
    case "TIMESTAMPTZ" => TimestampType
    case "TIME" | "TIMETZ" | "INTERVAL" => StringType
    case "BINARY" | "VARBINARY" | "LONG VARBINARY" | "BYTEA" | "RAW" => BinaryType
    case _ => StringType
  }
}

/** Vectorwise / Actian (iitables/iicolumns catalog,
  * vectorwise_to_exasol.sql:27-31).
  */
object VectorwiseDialect extends InformationSchemaDialect {
  val name = "vectorwise"
  val systemSchemas: Seq[String] = Seq("$ingres")

  override def columnsQuery(filter: SchemaFilter): String =
    s"""SELECT c.table_owner AS table_schema, c.table_name,
       |       c.column_sequence AS ordinal, c.column_name,
       |       c.column_datatype AS type_name,
       |       CASE c.column_nulls WHEN 'Y' THEN 1 ELSE 0 END AS is_nullable,
       |       c.column_default_val AS column_default,
       |       c.column_length AS char_length,
       |       c.column_length AS num_precision, c.column_scale AS num_scale
       |FROM iicolumns c
       |JOIN iitables t ON t.table_owner = c.table_owner AND t.table_name = c.table_name
       |WHERE t.table_type = 'T' AND ${filter.toSql("c.table_owner")}""".stripMargin

  def toSparkType(c: ColumnMeta, opts: MigrationOptions): DataType = base(c) match {
    case "INTEGER1" => ByteType
    case "SMALLINT" => ShortType
    case "INTEGER" => IntegerType
    case "INTEGER8" | "BIGINT" => LongType
    case "DECIMAL" => DecimalType(c.precision.getOrElse(18), c.scale.getOrElse(0))
    case "FLOAT" | "FLOAT8" => DoubleType
    case "FLOAT4" => FloatType
    case "C" | "CHAR" | "VARCHAR" | "TEXT" | "NCHAR" | "NVARCHAR" => StringType
    case "ANSIDATE" | "INGRESDATE" => DateType
    case "TIMESTAMP" => TimestampNTZType
    case "TIMESTAMP WITH TIME ZONE" => TimestampType
    case "TIME" | "INTERVAL YEAR TO MONTH" | "INTERVAL DAY TO SECOND" => StringType
    case "BYTE" | "VARBYTE" | "LONG BYTE" => BinaryType
    case _ => StringType
  }
}

/** Connection-type detection (SURVEY.md §2.A #18;
  * oracle_to_exasol.sql:56-116): classify a connection by its address
  * prefix, with a probe-query fallback for ambiguous ones. The Spark
  * analog classifies JDBC URLs to pick the dialect.
  */
object ConnectionProbe {
  private val byPrefix: Seq[(String, SourceDialect)] = Seq(
    "jdbc:postgresql:" -> PostgresDialect,
    "jdbc:mysql:" -> MySqlDialect,
    "jdbc:mariadb:" -> MariaDbDialect,
    "jdbc:clickhouse:" -> ClickHouseDialect,
    "jdbc:ch:" -> ClickHouseDialect,
    "jdbc:sqlserver:" -> SqlServerDialect,
    "jdbc:oracle:" -> OracleDialect,
    "jdbc:db2:" -> Db2Dialect,
    "jdbc:netezza:" -> NetezzaDialect,
    "jdbc:sap:" -> SapHanaDialect,
    "jdbc:exa:" -> ExasolDialect,
    "jdbc:snowflake:" -> SnowflakeDialect,
    "jdbc:redshift:" -> RedshiftDialect,
    "jdbc:bigquery:" -> BigQueryDialect,
    "jdbc:vertica:" -> VerticaDialect,
    "jdbc:ingres:" -> VectorwiseDialect
  )

  def detect(url: String): Option[SourceDialect] = {
    val u = url.trim.toLowerCase
    byPrefix.collectFirst { case (p, d) if u.startsWith(p) => d }
  }

  /** Probe statement for ambiguous/unknown URLs — the reference's
    * fallback probe imports (`SELECT 'Connection works'`,
    * postgresql_to_exasol.sql:430).
    */
  val probeQuery: String = "SELECT 'Connection works'"

  def detectOrGeneric(url: String): SourceDialect =
    detect(url).getOrElse(GenericJdbcDialect)
}
