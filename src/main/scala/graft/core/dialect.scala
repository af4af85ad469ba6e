package graft.core

import org.apache.spark.sql.types._
import graft.core.options.{BinaryHandling, IntervalHandling, MigrationOptions, TemporalOutOfRange}

/** Schema/table include filter compiled into every catalog query — the
  * reference builds `LIKE '..'` vs `IN ('a','b')` from a comma list
  * (sqlserver_to_exasol.sql:161-174).
  */
final case class SchemaFilter(pattern: String) {
  private def lit(s: String) = s.trim.replace("'", "''")
  def toSql(column: String): String =
    if (pattern == "%") "1 = 1"
    else if (pattern.contains(","))
      s"upper($column) IN (${pattern.split(",").map(p => s"upper('${lit(p)}')").mkString(", ")})"
    else s"upper($column) LIKE upper('${lit(pattern)}')"
}

/** A source-system dialect: the catalog queries that read its metadata,
  * the type matrix mapping its types into Spark, and the per-column
  * read expression making values transferable — the three per-source
  * assets of every reference script (SURVEY.md §2.A/§2.B/§1.2).
  *
  * Catalog queries are *full-pushdown* remote scans: the returned SQL
  * is meant for `spark.read.jdbc(url, s"($sql) q", props)`, so the
  * source database does the joins/filters and only metadata rows cross
  * the wire — exactly the reference's
  * `import from jdbc at conn statement '<catalog query>'` shape.
  */
trait SourceDialect {
  def name: String

  def quoteIdent(id: String): String = "\"" + id.replace("\"", "\"\"") + "\""

  /** Always-excluded system schemas (reference: per-source exclusion
    * lists, e.g. teradata_to_exasol.sql:107-108).
    */
  def systemSchemas: Seq[String]

  /** Remote catalog query returning one row per column:
    * (table_schema, table_name, ordinal, column_name, type_name,
    * is_nullable, column_default, char_length, num_precision,
    * num_scale).
    */
  def columnsQuery(filter: SchemaFilter): String

  /** Remote catalog query returning one row per key column:
    * (table_schema, table_name, constraint_name, kind P|F, position,
    * column_name, ref_schema, ref_table).
    */
  def keysQuery(filter: SchemaFilter): String

  /** Source type → Spark type (the §1.2 matrix). */
  def toSparkType(c: ColumnMeta, opts: MigrationOptions): DataType

  /** Source type → target DDL type string. */
  def targetTypeString(c: ColumnMeta, opts: MigrationOptions): String

  /** Per-column scalar expression, in SOURCE SQL, that makes the value
    * faithful and transferable (§2.B) — pushed down inside the read's
    * SELECT list.
    */
  def readExpression(c: ColumnMeta, opts: MigrationOptions): String

  /** Render a watermark value as a source-dialect literal for the
    * delta predicate (delta_import:280-310).
    */
  def deltaLiteral(value: String, typeName: String): String =
    typeName.toLowerCase match {
      case t if t.contains("date") => s"DATE '$value'"
      case t if t.contains("time") => s"TIMESTAMP '$value'"
      case t if t.startsWith("int") || t.startsWith("num") || t.startsWith("dec") => value
      case _ => s"'${value.replace("'", "''")}'"
    }
}

/** PostgreSQL — the richest documented semantics of the modern
  * template scripts; every branch carries its reference citation.
  */
object PostgresDialect extends SourceDialect {
  val name = "postgresql"

  // pg_catalog + information_schema are excluded; partition children
  // and extension members too (postgresql_to_exasol.sql:97,104-129)
  val systemSchemas: Seq[String] = Seq("pg_catalog", "information_schema")

  /** Columns scan with recursive domain resolution to base types
    * (postgresql_to_exasol.sql:104-129). The recursive CTE walks
    * pg_type.typbasetype so domains land on their base type.
    */
  def columnsQuery(filter: SchemaFilter): String =
    s"""WITH RECURSIVE basetype(oid, base_oid, n) AS (
       |  SELECT t.oid, t.typbasetype, 0 FROM pg_type t
       |  UNION ALL
       |  SELECT b.oid, t.typbasetype, b.n + 1
       |  FROM basetype b JOIN pg_type t ON t.oid = b.base_oid
       |  WHERE t.typbasetype <> 0 AND b.n < 8),
       |resolved AS (
       |  SELECT oid, base_oid FROM basetype b
       |  WHERE n = (SELECT max(n) FROM basetype WHERE oid = b.oid))
       |SELECT ns.nspname AS table_schema, c.relname AS table_name,
       |       a.attnum AS ordinal, a.attname AS column_name,
       |       pg_catalog.format_type(COALESCE(NULLIF(r.base_oid, 0), a.atttypid), a.atttypmod) AS type_name,
       |       NOT a.attnotnull AS is_nullable,
       |       pg_get_expr(d.adbin, d.adrelid) AS column_default,
       |       information_schema._pg_char_max_length(a.atttypid, a.atttypmod) AS char_length,
       |       information_schema._pg_numeric_precision(a.atttypid, a.atttypmod) AS num_precision,
       |       information_schema._pg_numeric_scale(a.atttypid, a.atttypmod) AS num_scale
       |FROM pg_attribute a
       |JOIN pg_class c ON c.oid = a.attrelid AND c.relkind = 'r'
       |JOIN pg_namespace ns ON ns.oid = c.relnamespace
       |LEFT JOIN resolved r ON r.oid = a.atttypid
       |LEFT JOIN pg_attrdef d ON d.adrelid = a.attrelid AND d.adnum = a.attnum
       |WHERE a.attnum > 0 AND NOT a.attisdropped
       |  AND ns.nspname NOT IN (${systemSchemas.map(s => s"'$s'").mkString(", ")})
       |  AND NOT c.relispartition
       |  AND ${filter.toSql("ns.nspname")}""".stripMargin

  /** PK/FK scan preserving composite order via
    * `unnest(conkey) with ordinality` (postgresql_to_exasol.sql:131-145).
    */
  def keysQuery(filter: SchemaFilter): String =
    s"""SELECT ns.nspname AS table_schema, c.relname AS table_name,
       |       con.conname AS constraint_name,
       |       CASE con.contype WHEN 'p' THEN 'P' ELSE 'F' END AS kind,
       |       k.ord AS position, a.attname AS column_name,
       |       fns.nspname AS ref_schema, fc.relname AS ref_table
       |FROM pg_constraint con
       |JOIN pg_class c ON c.oid = con.conrelid
       |JOIN pg_namespace ns ON ns.oid = c.relnamespace
       |CROSS JOIN LATERAL unnest(con.conkey) WITH ORDINALITY AS k(attnum, ord)
       |JOIN pg_attribute a ON a.attrelid = c.oid AND a.attnum = k.attnum
       |LEFT JOIN pg_class fc ON fc.oid = con.confrelid
       |LEFT JOIN pg_namespace fns ON fns.oid = fc.relnamespace
       |WHERE con.contype IN ('p', 'f')
       |  AND ns.nspname NOT IN (${systemSchemas.map(s => s"'$s'").mkString(", ")})
       |  AND ${filter.toSql("ns.nspname")}""".stripMargin

  /** Comments scan: table + column descriptions from pg_description
    * (postgresql_to_exasol.sql:253-262). objsubid 0 = table comment,
    * > 0 = that column's ordinal.
    */
  def commentsQuery(filter: SchemaFilter): String =
    s"""SELECT ns.nspname AS table_schema, c.relname AS table_name,
       |       CASE WHEN d.objsubid = 0 THEN NULL ELSE a.attname END AS column_name,
       |       d.description AS comment
       |FROM pg_description d
       |JOIN pg_class c ON c.oid = d.objoid AND c.relkind = 'r'
       |JOIN pg_namespace ns ON ns.oid = c.relnamespace
       |LEFT JOIN pg_attribute a
       |  ON a.attrelid = c.oid AND a.attnum = d.objsubid AND d.objsubid > 0
       |WHERE ${filter.toSql("ns.nspname")}""".stripMargin

  /** Views scan for the review section (pg_get_viewdef,
    * postgresql_to_exasol.sql:264-271).
    */
  def viewsQuery(filter: SchemaFilter): String =
    s"""SELECT ns.nspname AS table_schema, c.relname AS view_name,
       |       pg_get_viewdef(c.oid, true) AS definition
       |FROM pg_class c
       |JOIN pg_namespace ns ON ns.oid = c.relnamespace
       |WHERE c.relkind = 'v'
       |  AND ns.nspname NOT IN (${systemSchemas.map(s => s"'$s'").mkString(", ")})
       |  AND ${filter.toSql("ns.nspname")}""".stripMargin

  /** Partition-definition scan (pg_get_partkeydef,
    * postgresql_to_exasol.sql:273-288) — the plan builder keeps only
    * best-effort single-bare-column definitions.
    */
  def partitionDefQuery(filter: SchemaFilter): String =
    s"""SELECT ns.nspname AS table_schema, c.relname AS table_name,
       |       pg_get_partkeydef(c.oid) AS partition_def
       |FROM pg_class c
       |JOIN pg_namespace ns ON ns.oid = c.relnamespace
       |WHERE c.relkind = 'p'
       |  AND ${filter.toSql("ns.nspname")}""".stripMargin

  /** Parse a pg_get_partkeydef result into a single bare partition
    * column if (and only if) it is the supported shape
    * `RANGE/LIST/HASH (col)` — anything else falls back to a review
    * note, mirroring postgresql_to_exasol.sql:273-288.
    */
  def parsePartitionDef(d: String): Option[String] = {
    val re = "^(?:RANGE|LIST|HASH)\\s*\\(\\s*([a-zA-Z_][a-zA-Z0-9_]*)\\s*\\)$".r
    d.trim match {
      case re(col) => Some(col)
      case _ => None
    }
  }

  private def base(c: ColumnMeta): String =
    c.typeName.toLowerCase.takeWhile(ch => ch != '(').trim

  /** Type matrix (postgresql_to_exasol.sql:147-242). Spark is wider
    * than Exasol in several places (38-digit decimals, native binary,
    * native arrays kept as text only for compatibility).
    */
  def toSparkType(c: ColumnMeta, opts: MigrationOptions): DataType = base(c) match {
    case "smallint" | "int2" => ShortType
    case "integer" | "int4" | "serial" => IntegerType
    case "bigint" | "int8" | "bigserial" => LongType
    case "numeric" | "decimal" =>
      (c.precision, c.scale) match {
        case (Some(p), s) if p <= 38 => DecimalType(p, s.getOrElse(0))
        case _ => DoubleType // bare numeric: DECIMAL_OVERFLOW policy (:150-157)
      }
    case "real" | "float4" => FloatType
    case "double precision" | "float8" => DoubleType
    case "boolean" | "bool" => BooleanType
    case "money" => DecimalType(19, 2)
    case "character" | "char" | "character varying" | "varchar" | "text" | "name" => StringType
    case "date" => DateType
    case "timestamp without time zone" | "timestamp" => TimestampNTZType
    case "timestamp with time zone" | "timestamptz" => TimestampType // UTC instant (:210-218)
    case "time without time zone" | "time" | "time with time zone" => StringType // cast-to-text (:220)
    case "interval" =>
      if (opts.intervalHandling == IntervalHandling.Native) DayTimeIntervalType() else StringType
    case "bytea" =>
      opts.binaryHandling match {
        case BinaryHandling.Native => BinaryType
        case BinaryHandling.Skip => NullType
        case _ => StringType // base64/hex text carriers (:221)
      }
    case "uuid" | "json" | "jsonb" | "xml" | "cidr" | "inet" | "macaddr" | "point" | "line" |
        "lseg" | "box" | "path" | "polygon" | "circle" =>
      StringType // flatten-to-text policy (:240)
    case _ => StringType // arrays/ranges/enums/composites → ::text (:240)
  }

  def targetTypeString(c: ColumnMeta, opts: MigrationOptions): String = toSparkType(c, opts) match {
    case ShortType => "DECIMAL(5,0)"
    case IntegerType => "DECIMAL(10,0)"
    case LongType => "DECIMAL(18,0)"
    case d: DecimalType => s"DECIMAL(${d.precision},${d.scale})"
    case FloatType | DoubleType => "DOUBLE"
    case BooleanType => "BOOLEAN"
    case DateType => "DATE"
    case TimestampNTZType => "TIMESTAMP"
    case TimestampType => "TIMESTAMP WITH LOCAL TIME ZONE"
    case _: DayTimeIntervalType => "INTERVAL DAY TO SECOND"
    case BinaryType => s"HASHTYPE(${c.charLength.getOrElse(16)} BYTE)"
    case NullType => "/*SKIPPED*/ VARCHAR(1)"
    case _ =>
      val n = c.charLength.filter(_ > 0).getOrElse(2000000)
      s"VARCHAR(${math.min(n, 2000000)})"
  }

  def readExpression(c: ColumnMeta, opts: MigrationOptions): String = {
    val q = quoteIdent(c.name)
    base(c) match {
      case "bytea" =>
        opts.binaryHandling match {
          case BinaryHandling.Base64 => s"encode($q, 'base64')" // :221
          case BinaryHandling.Hex => s"encode($q, 'hex')"
          case _ => q
        }
      case "timestamp with time zone" | "timestamptz" =>
        temporalGuard(s"($q at time zone 'UTC')", opts) // :210-218
      case "timestamp without time zone" | "timestamp" | "date" =>
        temporalGuard(q, opts) // :206-219
      case "time without time zone" | "time" | "time with time zone" => s"$q::text"
      case "interval" =>
        if (opts.intervalHandling == IntervalHandling.Native) s"justify_hours($q)::text" // :224-226
        else s"$q::text"
      case "character varying" | "varchar" | "text" | "name" =>
        if (opts.truncateLongStrings) s"left($q::text, 2000000)" else q // :223
      case "smallint" | "int2" | "integer" | "int4" | "bigint" | "int8" | "serial" | "bigserial" |
          "numeric" | "decimal" | "real" | "float4" | "double precision" | "float8" | "boolean" |
          "bool" | "money" | "character" | "char" =>
        q
      case _ => s"$q::text" // flatten complex types to text (:240)
    }
  }

  /** Default-expression translation (postgresql_to_exasol.sql:192-203):
    * plain literals survive (with `::type` cast suffixes stripped),
    * the now()-family normalizes to CURRENT_TIMESTAMP / CURRENT_DATE,
    * and sequence defaults (`nextval(...)`) are dropped — identity
    * values migrate as plain data, the generator does not.
    */
  def translateDefault(raw: String): Option[String] = {
    val t = raw.trim
    val lower = t.toLowerCase
    if (lower.startsWith("nextval(")) None
    else if (
      Set("now()", "current_timestamp", "transaction_timestamp()", "statement_timestamp()",
        "clock_timestamp()").contains(lower)
    ) Some("CURRENT_TIMESTAMP")
    else if (lower == "current_date" || lower == "('now'::text)::date") Some("CURRENT_DATE")
    else Some(t.replaceAll("::[a-zA-Z_ ]+(\\([0-9,]*\\))?$", ""))
  }

  /** Out-of-range temporal policy wrapper: dates outside 0001..9999
    * (postgresql_to_exasol.sql:206-219). Spark's DateType covers the
    * full range, so FAIL is a no-op here; NULL/CLAMP stay meaningful
    * as compatibility modes.
    */
  private def temporalGuard(e: String, opts: MigrationOptions): String =
    opts.temporalOutOfRange match {
      case TemporalOutOfRange.Null =>
        s"(CASE WHEN $e BETWEEN '0001-01-01' AND '9999-12-31' THEN $e END)"
      case TemporalOutOfRange.Clamp =>
        s"least(greatest($e, '0001-01-01'), '9999-12-31')"
      case TemporalOutOfRange.Fail => e
    }
}

/** MySQL / MariaDB — documents the unsigned-widening driver quirk: the
  * Connector/J driver overflows signed Java types, so wide unsigned
  * integers are widened to DECIMAL and *read as text*
  * (mysql_to_exasol.sql:27-33,136-138,188).
  */
object MySqlDialect extends SourceDialect {
  val name = "mysql"
  val systemSchemas: Seq[String] =
    Seq("mysql", "information_schema", "performance_schema", "sys")

  def columnsQuery(filter: SchemaFilter): String =
    s"""SELECT c.table_schema, c.table_name, c.ordinal_position AS ordinal,
       |       c.column_name, c.column_type AS type_name,
       |       c.is_nullable = 'YES' AS is_nullable, c.column_default,
       |       c.character_maximum_length AS char_length,
       |       c.numeric_precision AS num_precision, c.numeric_scale AS num_scale
       |FROM information_schema.columns c
       |JOIN information_schema.tables t
       |  ON t.table_schema = c.table_schema AND t.table_name = c.table_name
       |WHERE t.table_type = 'BASE TABLE'
       |  AND c.table_schema NOT IN (${systemSchemas.map(s => s"'$s'").mkString(", ")})
       |  AND ${filter.toSql("c.table_schema")}""".stripMargin

  def keysQuery(filter: SchemaFilter): String =
    s"""SELECT k.table_schema, k.table_name, k.constraint_name,
       |       CASE WHEN k.constraint_name = 'PRIMARY' THEN 'P' ELSE 'F' END AS kind,
       |       k.ordinal_position AS position, k.column_name,
       |       k.referenced_table_schema AS ref_schema,
       |       k.referenced_table_name AS ref_table
       |FROM information_schema.key_column_usage k
       |WHERE (k.constraint_name = 'PRIMARY' OR k.referenced_table_name IS NOT NULL)
       |  AND k.table_schema NOT IN (${systemSchemas.map(s => s"'$s'").mkString(", ")})
       |  AND ${filter.toSql("k.table_schema")}""".stripMargin

  private def t(c: ColumnMeta): String = c.typeName.toLowerCase
  private def unsigned(c: ColumnMeta): Boolean = t(c).contains("unsigned")

  def toSparkType(c: ColumnMeta, opts: MigrationOptions): DataType = {
    val b = t(c).takeWhile(_ != '(').trim.stripSuffix(" unsigned").trim
    b match {
      case "tinyint" => if (unsigned(c)) ShortType else ByteType
      case "smallint" => if (unsigned(c)) IntegerType else ShortType
      case "mediumint" => if (unsigned(c)) DecimalType(8, 0) else IntegerType // :136
      case "int" | "integer" => if (unsigned(c)) LongType else IntegerType
      case "bigint" => if (unsigned(c)) DecimalType(20, 0) else LongType // :137
      case "decimal" | "numeric" => DecimalType(c.precision.getOrElse(10), c.scale.getOrElse(0))
      case "float" => FloatType
      case "double" => DoubleType
      case "bit" => if (c.precision.contains(1)) BooleanType else StringType
      case "date" => DateType
      case "datetime" => TimestampNTZType
      case "timestamp" => TimestampType // session-TZ instant (:144)
      case "time" | "year" => StringType // driver-untransferable → text (:186-199)
      case "char" | "varchar" | "tinytext" | "text" | "mediumtext" | "longtext" | "enum" | "set" =>
        StringType
      case "binary" | "varbinary" | "tinyblob" | "blob" | "mediumblob" | "longblob" =>
        if (opts.binaryHandling == BinaryHandling.Native) BinaryType else StringType
      case "json" => StringType
      case g if g.startsWith("geom") || g == "point" || g == "linestring" || g == "polygon" =>
        StringType // WKT carrier (:193)
      case _ => StringType
    }
  }

  def targetTypeString(c: ColumnMeta, opts: MigrationOptions): String =
    PostgresDialectLikeTarget.render(toSparkType(c, opts), c)

  def readExpression(c: ColumnMeta, opts: MigrationOptions): String = {
    val q = s"`${c.name.replace("`", "``")}`"
    val b = t(c).takeWhile(_ != '(').trim.stripSuffix(" unsigned").trim
    b match {
      case "mediumint" | "bigint" if unsigned(c) => s"CAST($q AS CHAR)" // driver overflow (:188)
      case "bit" if !c.precision.contains(1) => s"CAST($q AS CHAR)"
      case "time" | "year" => s"CAST($q AS CHAR)" // :186-199
      case "binary" | "varbinary" | "tinyblob" | "blob" | "mediumblob" | "longblob" =>
        opts.binaryHandling match {
          case BinaryHandling.Base64 => s"to_base64($q)" // :180
          case BinaryHandling.Hex => s"HEX($q)"
          case _ => q
        }
      case g if g.startsWith("geom") || g == "point" || g == "linestring" || g == "polygon" =>
        s"ST_AsText($q)" // :193
      case "date" | "datetime" | "timestamp" =>
        // zero-date policy (`col = 0` detection — mysql_to_exasol.sql:168-178)
        opts.temporalOutOfRange match {
          case TemporalOutOfRange.Null => s"(CASE WHEN $q = 0 THEN NULL ELSE $q END)"
          case TemporalOutOfRange.Clamp =>
            s"(CASE WHEN $q = 0 THEN '0001-01-01' ELSE $q END)"
          case TemporalOutOfRange.Fail => q
        }
      case _ => q
    }
  }
}

/** MariaDB — MySQL plus: SYSTEM VERSIONED tables included, SEQUENCE
  * objects skipped (mariadb_to_exasol.sql:122-134), pre-quoted default
  * literals (:179-189), and the zero-date FAIL policy transferring the
  * literal text `'0000-00-00'` so the target rejects it loudly
  * (:192-203).
  */
object MariaDbDialect extends SourceDialect {
  val name = "mariadb"
  val systemSchemas: Seq[String] = MySqlDialect.systemSchemas

  def columnsQuery(filter: SchemaFilter): String =
    s"""SELECT c.table_schema, c.table_name, c.ordinal_position AS ordinal,
       |       c.column_name, c.column_type AS type_name,
       |       c.is_nullable = 'YES' AS is_nullable, c.column_default,
       |       c.character_maximum_length AS char_length,
       |       c.numeric_precision AS num_precision, c.numeric_scale AS num_scale
       |FROM information_schema.columns c
       |JOIN information_schema.tables t
       |  ON t.table_schema = c.table_schema AND t.table_name = c.table_name
       |WHERE t.table_type IN ('BASE TABLE', 'SYSTEM VERSIONED')
       |  AND t.table_type <> 'SEQUENCE'
       |  AND c.table_schema NOT IN (${systemSchemas.map(s => s"'$s'").mkString(", ")})
       |  AND ${filter.toSql("c.table_schema")}""".stripMargin

  def keysQuery(filter: SchemaFilter): String = MySqlDialect.keysQuery(filter)

  def toSparkType(c: ColumnMeta, opts: MigrationOptions): DataType =
    MySqlDialect.toSparkType(c, opts)

  def targetTypeString(c: ColumnMeta, opts: MigrationOptions): String =
    MySqlDialect.targetTypeString(c, opts)

  def readExpression(c: ColumnMeta, opts: MigrationOptions): String = {
    val base = c.typeName.toLowerCase.takeWhile(_ != '(').trim.stripSuffix(" unsigned").trim
    (base, opts.temporalOutOfRange) match {
      // FAIL transfers the literal zero-date text so the load errors
      // loudly instead of silently coercing (mariadb_to_exasol.sql:192-203)
      case ("date" | "datetime" | "timestamp", TemporalOutOfRange.Fail) =>
        val q = s"`${c.name.replace("`", "``")}`"
        s"(CASE WHEN $q = 0 THEN '0000-00-00' ELSE CAST($q AS CHAR) END)"
      case _ => MySqlDialect.readExpression(c, opts)
    }
  }

  /** MariaDB pre-quotes default literals — strip one quoting layer
    * (mariadb_to_exasol.sql:179-189).
    */
  def translateDefault(raw: String): Option[String] = {
    val t = raw.trim
    if (t.equalsIgnoreCase("NULL")) None
    else if (t.startsWith("'") && t.endsWith("'")) Some(t)
    else if (t.equalsIgnoreCase("current_timestamp()") || t.equalsIgnoreCase("current_timestamp"))
      Some("CURRENT_TIMESTAMP")
    else Some(t)
  }
}

private object PostgresDialectLikeTarget {
  def render(dt: DataType, c: ColumnMeta): String = dt match {
    case ByteType => "DECIMAL(3,0)"
    case ShortType => "DECIMAL(5,0)"
    case IntegerType => "DECIMAL(10,0)"
    case LongType => "DECIMAL(18,0)"
    case d: DecimalType => s"DECIMAL(${d.precision},${d.scale})"
    case FloatType | DoubleType => "DOUBLE"
    case BooleanType => "BOOLEAN"
    case DateType => "DATE"
    case TimestampNTZType => "TIMESTAMP"
    case TimestampType => "TIMESTAMP WITH LOCAL TIME ZONE"
    case BinaryType => "HASHTYPE"
    case _ =>
      val n = c.charLength.filter(_ > 0).getOrElse(2000000)
      s"VARCHAR(${math.min(n, 2000000)})"
  }
}

/** Generic JDBC fallback dialect: standard information_schema, no
  * quirks — the safe default for sources without a dedicated spec.
  */
object GenericJdbcDialect extends SourceDialect {
  val name = "jdbc"
  val systemSchemas: Seq[String] = Seq("information_schema")

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
       |       CASE WHEN t.constraint_type = 'PRIMARY KEY' THEN 'P' ELSE 'F' END AS kind,
       |       k.ordinal_position AS position, k.column_name,
       |       CAST(NULL AS VARCHAR) AS ref_schema, CAST(NULL AS VARCHAR) AS ref_table
       |FROM information_schema.key_column_usage k
       |JOIN information_schema.table_constraints t
       |  ON t.constraint_name = k.constraint_name AND t.table_schema = k.table_schema
       |WHERE t.constraint_type IN ('PRIMARY KEY', 'FOREIGN KEY')
       |  AND ${filter.toSql("k.table_schema")}""".stripMargin

  def toSparkType(c: ColumnMeta, opts: MigrationOptions): DataType =
    c.typeName.toLowerCase.takeWhile(_ != '(').trim match {
      case "smallint" => ShortType
      case "integer" | "int" => IntegerType
      case "bigint" => LongType
      case "numeric" | "decimal" => DecimalType(c.precision.getOrElse(18), c.scale.getOrElse(0))
      case "real" => FloatType
      case "double" | "double precision" | "float" => DoubleType
      case "boolean" => BooleanType
      case "date" => DateType
      case "timestamp" => TimestampNTZType
      case "timestamp with time zone" => TimestampType
      case "binary" | "varbinary" | "blob" =>
        if (opts.binaryHandling == BinaryHandling.Native) BinaryType else StringType
      case _ => StringType
    }

  def targetTypeString(c: ColumnMeta, opts: MigrationOptions): String =
    PostgresDialectLikeTarget.render(toSparkType(c, opts), c)

  def readExpression(c: ColumnMeta, opts: MigrationOptions): String = quoteIdent(c.name)
}
