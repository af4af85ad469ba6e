package graft.core

import org.apache.spark.sql.types._
import graft.core.options.{BinaryHandling, DecimalOverflow, MigrationOptions}

/** ClickHouse dialect — distinctive behaviors (SURVEY.md §2.A #6,
  * §1.2): type-wrapper unwrapping (`Nullable()/LowCardinality()`
  * regex-unwrapped, `SimpleAggregateFunction(f,T) → T`,
  * `AggregateFunction` opaque → NULL with a note,
  * clickhouse_to_exasol.sql:112-115,166,296-304), engine
  * classification (data engines migrate, view engines get review
  * notes, integration engines are skipped,
  * clickhouse_to_exasol.sql:98-100,306-309), cast-to-text for
  * complex types (:165-174) and the float finiteness guard (:171).
  */
object ClickHouseDialect extends SourceDialect {
  val name = "clickhouse"
  val systemSchemas: Seq[String] = Seq("system", "INFORMATION_SCHEMA", "information_schema")

  /** Unwrap Nullable/LowCardinality/SimpleAggregateFunction to the
    * carried type; returns (baseType, forcedNullable).
    */
  def unwrapType(t: String): (String, Boolean) = {
    val lc = "^LowCardinality\\((.*)\\)$".r
    val nu = "^Nullable\\((.*)\\)$".r
    val saf = "^SimpleAggregateFunction\\([^,]+,\\s*(.*)\\)$".r
    t.trim match {
      case nu(inner) =>
        val (b, _) = unwrapType(inner)
        (b, true)
      case lc(inner) => unwrapType(inner)
      case saf(inner) => unwrapType(inner)
      case other => (other, false)
    }
  }

  sealed trait EngineClass
  case object DataEngine extends EngineClass
  case object ViewEngine extends EngineClass
  case object IntegrationEngine extends EngineClass

  /** Engine classification: migrate only engines that own data. */
  def classifyEngine(engine: String): EngineClass = engine match {
    case e if e.contains("MergeTree") => DataEngine
    case "Log" | "TinyLog" | "StripeLog" | "Memory" | "Set" | "Join" => DataEngine
    case "View" | "MaterializedView" | "LiveView" | "WindowView" => ViewEngine
    case _ => IntegrationEngine // Distributed/Kafka/S3Queue/URL/... (:306-309)
  }

  def columnsQuery(filter: SchemaFilter): String =
    s"""SELECT c.database AS table_schema, c.table AS table_name,
       |       c.position AS ordinal, c.name AS column_name,
       |       c.type AS type_name,
       |       startsWith(c.type, 'Nullable(') AS is_nullable,
       |       c.default_expression AS column_default,
       |       NULL AS char_length, NULL AS num_precision, NULL AS num_scale,
       |       t.engine AS engine
       |FROM system.columns c
       |JOIN system.tables t ON t.database = c.database AND t.name = c.table
       |WHERE c.database NOT IN (${systemSchemas.map(s => s"'$s'").mkString(", ")})
       |  AND ${filter.toSql("c.database")}""".stripMargin

  def keysQuery(filter: SchemaFilter): String =
    // ClickHouse has no PK/FK constraints; the sort key doubles as the
    // primary key (is_in_primary_key — clickhouse_to_exasol.sql:94-107)
    s"""SELECT database AS table_schema, table AS table_name,
       |       concat(table, '_sortkey') AS constraint_name,
       |       'P' AS kind, position AS position, name AS column_name,
       |       NULL AS ref_schema, NULL AS ref_table
       |FROM system.columns
       |WHERE is_in_primary_key = 1
       |  AND database NOT IN (${systemSchemas.map(s => s"'$s'").mkString(", ")})
       |  AND ${filter.toSql("database")}""".stripMargin

  private val decRe = "^Decimal\\((\\d+),\\s*(\\d+)\\)$".r
  private val dt64Re = "^DateTime64\\((\\d+).*\\)$".r
  private val fixedRe = "^FixedString\\((\\d+)\\)$".r

  def toSparkType(c: ColumnMeta, opts: MigrationOptions): DataType = {
    val (base, _) = unwrapType(c.typeName)
    base match {
      case "Int8" => ByteType
      case "Int16" | "UInt8" => ShortType
      case "Int32" | "UInt16" => IntegerType
      case "Int64" | "UInt32" => LongType
      case "UInt64" => DecimalType(20, 0) // clickhouse_to_exasol.sql:135
      case "Int128" | "Int256" | "UInt128" | "UInt256" =>
        opts.decimalOverflow match { // :118-125,136
          case DecimalOverflow.ToDouble => DoubleType
          case _ => StringType // lossless text / CAP handled at plan level
        }
      case decRe(p, s) => DecimalType(math.min(p.toInt, 38), s.toInt)
      case "Float32" => FloatType
      case "Float64" => DoubleType
      case "Bool" => BooleanType
      case "String" => StringType
      case fixedRe(_) => StringType
      case "Date" | "Date32" => DateType
      case "DateTime" => TimestampNTZType
      case dt64Re(_) => TimestampNTZType // p ≤ 9: sub-micro handled as split column (§7.4.1)
      case "UUID" | "IPv4" | "IPv6" => StringType
      case a if a.startsWith("AggregateFunction") => NullType // opaque state → NULL + note (:296-304)
      case _ => StringType // Array/Tuple/Map/Nested/JSON/Variant/geo → toString (:165-174)
    }
  }

  def targetTypeString(c: ColumnMeta, opts: MigrationOptions): String = toSparkType(c, opts) match {
    case ByteType => "DECIMAL(3,0)"
    case ShortType => "DECIMAL(5,0)"
    case IntegerType => "DECIMAL(10,0)"
    case LongType => "DECIMAL(18,0)"
    case d: DecimalType => s"DECIMAL(${d.precision},${d.scale})"
    case FloatType | DoubleType => "DOUBLE"
    case BooleanType => "BOOLEAN"
    case DateType => "DATE"
    case TimestampNTZType => "TIMESTAMP"
    case NullType => "/*AggregateFunction state not transferable*/ VARCHAR(1)"
    case _ => "VARCHAR(2000000)"
  }

  def readExpression(c: ColumnMeta, opts: MigrationOptions): String = {
    val q = s"`${c.name.replace("`", "\\`")}`"
    val (base, _) = unwrapType(c.typeName)
    base match {
      case "Float32" | "Float64" => s"if(isFinite($q), $q, NULL)" // :171
      case "Int128" | "Int256" | "UInt128" | "UInt256" => s"toString($q)"
      case a if a.startsWith("AggregateFunction") => "NULL"
      case "Int8" | "Int16" | "Int32" | "Int64" | "UInt8" | "UInt16" | "UInt32" | "UInt64" |
          "Bool" | "String" | "Date" | "Date32" | "DateTime" =>
        q
      case d if d.startsWith("Decimal") || d.startsWith("DateTime64") || d.startsWith("FixedString") => q
      case "UUID" | "IPv4" | "IPv6" => s"toString($q)"
      case _ => s"toString($q)" // :165-174
    }
  }
}

/** Teradata dialect — PERIOD multi-column expansion, UNICODE
  * byte-halving, base64 transfer limit (SURVEY.md §2.A #11, §1.2).
  */
object TeradataDialect extends SourceDialect {
  val name = "teradata"
  // 44-entry system DB list in the reference (teradata_to_exasol.sql:107-108);
  // representative subset here
  val systemSchemas: Seq[String] =
    Seq("DBC", "SYSLIB", "SYSUDTLIB", "SysAdmin", "SYSBAR", "TDStats", "TD_SYSFNLIB")

  def columnsQuery(filter: SchemaFilter): String =
    s"""SELECT c.DatabaseName AS table_schema, c.TableName AS table_name,
       |       c.ColumnId AS ordinal, c.ColumnName AS column_name,
       |       c.ColumnType AS type_name,
       |       CASE WHEN c.Nullable = 'Y' THEN 1 ELSE 0 END AS is_nullable,
       |       c.DefaultValue AS column_default,
       |       CASE WHEN c.CharType = 2 THEN c.ColumnLength / 2
       |            ELSE c.ColumnLength END AS char_length,
       |       c.DecimalTotalDigits AS num_precision,
       |       c.DecimalFractionalDigits AS num_scale
       |FROM DBC.ColumnsV c
       |JOIN DBC.TablesV t
       |  ON t.DatabaseName = c.DatabaseName AND t.TableName = c.TableName
       | AND t.TableKind = 'T'
       |WHERE c.DatabaseName NOT IN (${systemSchemas.map(s => s"'$s'").mkString(", ")})
       |  AND ${filter.toSql("c.DatabaseName")}""".stripMargin

  def keysQuery(filter: SchemaFilter): String =
    s"""SELECT i.DatabaseName AS table_schema, i.TableName AS table_name,
       |       COALESCE(i.IndexName, i.TableName || '_pk') AS constraint_name,
       |       'P' AS kind, i.ColumnPosition AS position, i.ColumnName AS column_name,
       |       NULL AS ref_schema, NULL AS ref_table
       |FROM DBC.IndicesV i
       |WHERE i.UniqueFlag = 'Y' AND i.IndexType = 'K'
       |  AND ${filter.toSql("i.DatabaseName")}""".stripMargin

  /** Best-effort single-column extraction from a Teradata PPI
    * constraint text (teradata_to_exasol.sql:282-300): a single-level
    * `RANGE_N(<col> BETWEEN ...)` over a bare column yields that
    * column; CASE_N, multi-level (second RANGE_N) or expression-based
    * PPI yields None — no single-column PARTITION BY equivalent
    * exists, so those become review notes.
    */
  def partitionColumnFromPpi(partText: String): Option[String] = {
    val first = partText.indexOf("RANGE_N(")
    val second = if (first < 0) -1 else partText.indexOf("RANGE_N", first + 7)
    val between = partText.indexOf(" BETWEEN")
    if (partText.contains("CASE_N") || first < 0 || second >= 0 || between <= first + 8) None
    else {
      val raw = partText.substring(first + 8, between).trim
      if (raw.matches("^[A-Za-z_][A-Za-z0-9_]*$")) Some(raw) else None
    }
  }

  /** PARTITION BY statement (or commented review note) for one PPI
    * catalog row — the emission shape of teradata_to_exasol.sql:293-297.
    */
  def ppiPartitionStmt(schema: String, table: String, partText: String): String =
    partitionColumnFromPpi(partText) match {
      case Some(c) => s"""ALTER TABLE "$schema"."$table" PARTITION BY "$c";"""
      case None =>
        s"""-- "$schema"."$table" Teradata partitioning not auto-mapped (review and add PARTITION BY manually if appropriate): $partText"""
    }

  /** One source column → N target columns: PERIOD(x) becomes
    * x_BEGINNING / x_END read via begin()/end()
    * (teradata_to_exasol.sql:196-202,214-217). Everything else is 1:1.
    */
  def expandColumns(c: ColumnMeta, opts: MigrationOptions): Seq[(String, String)] = {
    val q = quoteIdent(c.name)
    c.typeName.trim.toUpperCase match {
      case "PD" | "PT" | "PS" | "PM" => // PERIOD(DATE/TIME/TIMESTAMP...)
        Seq(s"${c.name}_BEGINNING" -> s"begin($q)", s"${c.name}_END" -> s"end($q)")
      case _ => Seq(c.name -> readExpression(c, opts))
    }
  }

  def toSparkType(c: ColumnMeta, opts: MigrationOptions): DataType =
    c.typeName.trim.toUpperCase match {
      case "I1" => ByteType
      case "I2" => ShortType
      case "I" => IntegerType
      case "I8" => LongType
      case "D" => DecimalType(c.precision.getOrElse(18), c.scale.getOrElse(0))
      case "F" => DoubleType
      case "DA" => DateType
      case "TS" | "SZ" => TimestampNTZType
      case "AT" | "TZ" => StringType // TIME: cast-to-text
      case "CF" | "CV" => StringType
      case "CO" => StringType // CLOB
      case "BF" | "BV" | "BO" =>
        if (opts.binaryHandling == BinaryHandling.Native) BinaryType else StringType
      case "PD" | "PT" | "PS" | "PM" =>
        // native struct answer for PERIOD (SURVEY.md §1.2): begin/end pair
        StructType(Seq(StructField("beginning", TimestampNTZType), StructField("end", TimestampNTZType)))
      case "YR" | "YM" | "MO" => YearMonthIntervalType()
      case _ if c.typeName.trim.toUpperCase.startsWith("D") => StringType
      case _ => StringType
    }

  def targetTypeString(c: ColumnMeta, opts: MigrationOptions): String = toSparkType(c, opts) match {
    case ByteType => "DECIMAL(3,0)"
    case ShortType => "DECIMAL(5,0)"
    case IntegerType => "DECIMAL(10,0)"
    case LongType => "DECIMAL(18,0)"
    case d: DecimalType => s"DECIMAL(${d.precision},${d.scale})"
    case DoubleType => "DOUBLE"
    case DateType => "DATE"
    case TimestampNTZType => "TIMESTAMP"
    case _: YearMonthIntervalType => "INTERVAL YEAR TO MONTH"
    case BinaryType => "HASHTYPE"
    case _: StructType => "TIMESTAMP /*expanded to _BEGINNING/_END*/"
    case _ => s"VARCHAR(${c.charLength.filter(_ > 0).getOrElse(2000000)})"
  }

  def readExpression(c: ColumnMeta, opts: MigrationOptions): String = {
    val q = quoteIdent(c.name)
    c.typeName.trim.toUpperCase match {
      case "AT" | "TZ" => s"cast($q as varchar(40))" // TIME → text
      case "CO" => s"substr(cast($q as clob), 1, 2000000)" // teradata_to_exasol.sql:209-213
      case "BF" | "BV" | "BO" =>
        opts.binaryHandling match {
          // >48000-byte values exceed the transfer limit → NULL (:205)
          case BinaryHandling.Base64 =>
            s"CASE WHEN octet_length($q) <= 48000 THEN from_bytes($q, 'base64m') END"
          case _ => q
        }
      case "TS" | "SZ" => s"$q at time zone 0" // UTC normalization (:220)
      case _ => q
    }
  }
}

/** SQL Server dialect — multi-database expansion and the DB2SCHEMA
  * name-packing policy (SURVEY.md §2.A #7, §1.3;
  * sqlserver_to_exasol.sql:120,180-242).
  */
object SqlServerDialect extends SourceDialect {
  val name = "sqlserver"
  val systemSchemas: Seq[String] =
    Seq("sys", "INFORMATION_SCHEMA", "db_owner", "db_accessadmin", "db_securityadmin",
      "db_ddladmin", "db_backupoperator", "db_datareader", "db_datawriter",
      "db_denydatareader", "db_denydatawriter", "guest")

  /** The per-database catalog query template; `@DB@` is expanded per
    * database and the results UNION ALLed — the reference's
    * multi-database scan (sqlserver_to_exasol.sql:203-242).
    */
  def columnsQueryTemplate: String =
    s"""SELECT '@DB@' AS database_name, s.name AS table_schema, t.name AS table_name,
       |       c.column_id AS ordinal, c.name AS column_name,
       |       type_name(c.system_type_id) AS type_name,
       |       c.is_nullable, d.definition AS column_default,
       |       c.max_length AS char_length, c.precision AS num_precision,
       |       c.scale AS num_scale
       |FROM [@DB@].sys.columns c
       |JOIN [@DB@].sys.tables t ON t.object_id = c.object_id
       |JOIN [@DB@].sys.schemas s ON s.schema_id = t.schema_id
       |LEFT JOIN [@DB@].sys.default_constraints d
       |  ON d.parent_object_id = c.object_id AND d.parent_column_id = c.column_id
       |WHERE t.is_ms_shipped = 0 AND t.is_external = 0
       |  AND s.name NOT IN (${systemSchemas.map(s => s"'$s'").mkString(", ")})""".stripMargin

  def multiDbColumnsQuery(databases: Seq[String]): String =
    databases.map(db => columnsQueryTemplate.replace("@DB@", db.replace("]", "]]"))).mkString("\nUNION ALL\n")

  def columnsQuery(filter: SchemaFilter): String =
    columnsQueryTemplate.replace("@DB@", "master") + s"\n  AND ${filter.toSql("s.name")}"

  def keysQuery(filter: SchemaFilter): String =
    s"""SELECT s.name AS table_schema, t.name AS table_name,
       |       kc.name AS constraint_name,
       |       CASE kc.type WHEN 'PK' THEN 'P' ELSE 'F' END AS kind,
       |       ic.key_ordinal AS position, c.name AS column_name,
       |       NULL AS ref_schema, NULL AS ref_table
       |FROM sys.key_constraints kc
       |JOIN sys.tables t ON t.object_id = kc.parent_object_id
       |JOIN sys.schemas s ON s.schema_id = t.schema_id
       |JOIN sys.index_columns ic
       |  ON ic.object_id = kc.parent_object_id AND ic.index_id = kc.unique_index_id
       |JOIN sys.columns c ON c.object_id = ic.object_id AND c.column_id = ic.column_id
       |WHERE ${filter.toSql("s.name")}""".stripMargin

  /** DB2SCHEMA packing: database.schema.table →
    * ("database", "schema_table") so N databases land in N schemas
    * (sqlserver_to_exasol.sql:120,180-201).
    */
  def packDb2Schema(database: String, schema: String, table: String): (String, String) =
    (database, s"${schema}_$table")

  def toSparkType(c: ColumnMeta, opts: MigrationOptions): DataType =
    c.typeName.toLowerCase match {
      case "tinyint" => ShortType // SQL Server tinyint is unsigned 0..255
      case "smallint" => ShortType
      case "int" => IntegerType
      case "bigint" => LongType
      case "decimal" | "numeric" | "money" | "smallmoney" =>
        DecimalType(c.precision.getOrElse(18), c.scale.getOrElse(0))
      case "real" => FloatType
      case "float" => DoubleType
      case "bit" => BooleanType
      case "char" | "varchar" | "nchar" | "nvarchar" | "text" | "ntext" | "sysname" => StringType
      case "date" => DateType
      case "datetime" | "datetime2" | "smalldatetime" => TimestampNTZType
      case "datetimeoffset" => TimestampType // AT TIME ZONE 'UTC' read (:347)
      case "time" => StringType
      case "binary" | "varbinary" | "image" | "timestamp" | "rowversion" =>
        if (opts.binaryHandling == BinaryHandling.Native) BinaryType else StringType
      case "uniqueidentifier" | "xml" | "json" | "sql_variant" | "hierarchyid" | "geometry" |
          "geography" | "vector" =>
        StringType
      case _ => StringType
    }

  def targetTypeString(c: ColumnMeta, opts: MigrationOptions): String =
    PostgresDialectLikeTarget.render(toSparkType(c, opts), c)

  def readExpression(c: ColumnMeta, opts: MigrationOptions): String = {
    val q = s"[${c.name.replace("]", "]]")}]"
    c.typeName.toLowerCase match {
      case "datetimeoffset" =>
        s"CAST($q AT TIME ZONE 'UTC' AS datetime2(${c.scale.getOrElse(7)}))" // :347
      case "geometry" | "geography" => s"$q.STAsText()" // :349-350
      case "hierarchyid" => s"$q.ToString()" // :348
      case "xml" | "json" | "sql_variant" | "vector" =>
        if (opts.truncateLongStrings) s"LEFT(CAST($q AS NVARCHAR(MAX)), 2000000)" // :329-345
        else s"CAST($q AS NVARCHAR(MAX))"
      case "binary" | "varbinary" | "image" =>
        opts.binaryHandling match {
          case BinaryHandling.Hex => s"CONVERT(VARCHAR(MAX), $q, 2)" // :325-326
          case BinaryHandling.Base64 => s"CAST('' AS XML).value('xs:base64Binary(sql:column(\"$q\"))', 'VARCHAR(MAX)')"
          case _ => q
        }
      case "time" => s"CONVERT(VARCHAR(16), $q, 114)"
      case _ => q
    }
  }
}
