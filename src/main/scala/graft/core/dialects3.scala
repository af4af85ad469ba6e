package graft.core

import org.apache.spark.sql.types._
import graft.core.options.{BinaryHandling, MigrationOptions}

/** Oracle dialect — home of the reference's only physical planner
  * (partition bin-packing + ora_hash fallback,
  * oracle_to_exasol.sql:142-262,554-585), the NLS session preamble
  * (:805-817) and the identity-column feature detection (:265-404).
  */
object OracleDialect extends SourceDialect {
  val name = "oracle"
  val systemSchemas: Seq[String] =
    Seq("SYS", "SYSTEM", "OUTLN", "XDB", "CTXSYS", "MDSYS", "ORDSYS", "DBSNMP", "APPQOSSYS",
      "WMSYS", "GSMADMIN_INTERNAL", "OLAPSYS", "LBACSYS", "DVSYS", "AUDSYS")

  /** NLS session preamble: pins numeric/date rendering so text-formed
    * values are locale-independent (oracle_to_exasol.sql:805-817).
    * Spark mapping: JDBC `sessionInitStatement`.
    */
  val sessionPreamble: Seq[String] = Seq(
    "ALTER SESSION SET NLS_NUMERIC_CHARACTERS = '.,'",
    "ALTER SESSION SET NLS_DATE_FORMAT = 'YYYY-MM-DD HH24:MI:SS'",
    "ALTER SESSION SET NLS_TIMESTAMP_FORMAT = 'YYYY-MM-DD HH24:MI:SSXFF'",
    "ALTER SESSION SET NLS_TIMESTAMP_TZ_FORMAT = 'YYYY-MM-DD HH24:MI:SSXFF TZH:TZM'"
  )

  def columnsQuery(filter: SchemaFilter): String =
    s"""SELECT c.owner AS table_schema, c.table_name, c.column_id AS ordinal,
       |       c.column_name, c.data_type AS type_name,
       |       CASE c.nullable WHEN 'Y' THEN 1 ELSE 0 END AS is_nullable,
       |       c.data_default AS column_default,
       |       c.char_length AS char_length,
       |       c.data_precision AS num_precision, c.data_scale AS num_scale
       |FROM all_tab_columns c
       |WHERE NOT EXISTS (SELECT 1 FROM all_views v
       |                  WHERE v.owner = c.owner AND v.view_name = c.table_name)
       |  AND c.owner NOT IN (${systemSchemas.map(s => s"'$s'").mkString(", ")})
       |  AND ${filter.toSql("c.owner")}""".stripMargin

  def keysQuery(filter: SchemaFilter): String =
    s"""SELECT cc.owner AS table_schema, cc.table_name, cc.constraint_name,
       |       CASE c.constraint_type WHEN 'P' THEN 'P' ELSE 'F' END AS kind,
       |       cc.position, cc.column_name,
       |       NULL AS ref_schema, NULL AS ref_table
       |FROM all_cons_columns cc
       |JOIN all_constraints c
       |  ON c.owner = cc.owner AND c.constraint_name = cc.constraint_name
       |WHERE c.constraint_type IN ('P', 'R')
       |  AND ${filter.toSql("cc.owner")}""".stripMargin

  /** Stitch one read statement per bin-packed partition group — the
    * reference's IMPORT with N `STATEMENT '…partition("P")…'` clauses
    * (oracle_to_exasol.sql:554-566) → the Spark `predicates`-per-
    * partition JDBC read uses these as dbtable subqueries.
    */
  def partitionReadStatements(
      schema: String,
      table: String,
      parts: Seq[PartitionPlanner.SourcePartition],
      parallelism: Int,
      selectList: String = "*"
  ): Seq[String] =
    PartitionPlanner.binPack(parts, parallelism).map { bin =>
      bin
        .map(p =>
          s"""SELECT /*+parallel*/ $selectList FROM ${quoteIdent(schema)}.${quoteIdent(table)} partition("${p.name}")"""
        )
        .mkString(" UNION ALL ")
    }

  /** Hash-split fallback for unpartitioned tables
    * (oracle_to_exasol.sql:567-573).
    */
  def hashSplitStatements(
      schema: String,
      table: String,
      parallelism: Int,
      selectList: String = "*"
  ): Seq[String] =
    (0 until parallelism).map(i =>
      s"""SELECT /*+parallel*/ $selectList FROM ${quoteIdent(schema)}.${quoteIdent(table)} WHERE ora_hash(rowid, ${parallelism - 1}) = $i"""
    )

  def toSparkType(c: ColumnMeta, opts: MigrationOptions): DataType = {
    // keep the full string: "TIMESTAMP(6) WITH TIME ZONE" must not lose
    // its suffix to the precision-paren strip
    val full = c.typeName.toUpperCase.trim
    val base = full.takeWhile(_ != '(').trim
    base match {
      case "NUMBER" =>
        (c.precision, c.scale) match {
          case (Some(p), Some(s)) if p <= 38 => DecimalType(p, math.max(s, 0))
          case (Some(p), None) => DecimalType(p, 0)
          case _ => DoubleType // unqualified NUMBER
        }
      case "BINARY_FLOAT" => FloatType
      case "BINARY_DOUBLE" => DoubleType
      case "FLOAT" => DoubleType
      case "CHAR" | "NCHAR" | "VARCHAR2" | "NVARCHAR2" | "CLOB" | "NCLOB" | "LONG" | "ROWID" => StringType
      case "DATE" => TimestampNTZType // Oracle DATE carries time of day
      case t if t.startsWith("TIMESTAMP") && full.contains("TIME ZONE") => TimestampType
      case t if t.startsWith("TIMESTAMP") => TimestampNTZType
      case t if t.startsWith("INTERVAL DAY") => DayTimeIntervalType()
      case t if t.startsWith("INTERVAL YEAR") => YearMonthIntervalType()
      case "RAW" | "LONG RAW" | "BLOB" =>
        if (opts.binaryHandling == BinaryHandling.Native) BinaryType else StringType
      case "XMLTYPE" | "SDO_GEOMETRY" => StringType
      case _ => StringType
    }
  }

  def targetTypeString(c: ColumnMeta, opts: MigrationOptions): String =
    PostgresDialectLikeTarget.render(toSparkType(c, opts), c)

  def readExpression(c: ColumnMeta, opts: MigrationOptions): String = {
    val q = quoteIdent(c.name)
    val full = c.typeName.toUpperCase.trim
    full.takeWhile(_ != '(').trim match {
      case "RAW" | "LONG RAW" | "BLOB" =>
        opts.binaryHandling match {
          case BinaryHandling.Hex => s"rawtohex($q)" // oracle_to_exasol.sql:531
          case _ => q
        }
      case t if t.startsWith("TIMESTAMP") && full.contains("TIME ZONE") =>
        s"$q at time zone '00:00'" // :539
      case "XMLTYPE" => s"($q).getClobVal()"
      case "SDO_GEOMETRY" => s"SDO_UTIL.TO_WKTGEOMETRY($q)"
      case _ => q
    }
  }
}

/** Db2 — DISTINCT-UDT resolution through SYSCAT.DATATYPES, the HEX
  * 16336-byte limit and LOB serializers (SURVEY.md §2.A #8,
  * db2_to_exasol.sql:96-112,146-171).
  */
object Db2Dialect extends SourceDialect {
  val name = "db2"
  val systemSchemas: Seq[String] = Seq("SYSCAT", "SYSIBM", "SYSIBMADM", "SYSPUBLIC", "SYSSTAT", "SYSTOOLS")

  def columnsQuery(filter: SchemaFilter): String =
    s"""SELECT c.TABSCHEMA AS table_schema, c.TABNAME AS table_name,
       |       c.COLNO + 1 AS ordinal, c.COLNAME AS column_name,
       |       COALESCE(d.SOURCENAME, c.TYPENAME) AS type_name,
       |       CASE c.NULLS WHEN 'Y' THEN 1 ELSE 0 END AS is_nullable,
       |       c.DEFAULT AS column_default, c.LENGTH AS char_length,
       |       c.LENGTH AS num_precision, c.SCALE AS num_scale
       |FROM SYSCAT.COLUMNS c
       |LEFT JOIN SYSCAT.DATATYPES d
       |  ON d.TYPESCHEMA = c.TYPESCHEMA AND d.TYPENAME = c.TYPENAME
       | AND d.METATYPE = 'T'
       |WHERE c.TABSCHEMA NOT IN (${systemSchemas.map(s => s"'$s'").mkString(", ")})
       |  AND ${filter.toSql("c.TABSCHEMA")}""".stripMargin

  def keysQuery(filter: SchemaFilter): String =
    s"""SELECT k.TABSCHEMA AS table_schema, k.TABNAME AS table_name,
       |       k.CONSTNAME AS constraint_name,
       |       CASE t.TYPE WHEN 'P' THEN 'P' ELSE 'F' END AS kind,
       |       k.COLSEQ AS position, k.COLNAME AS column_name,
       |       r.REFTABSCHEMA AS ref_schema, r.REFTABNAME AS ref_table
       |FROM SYSCAT.KEYCOLUSE k
       |JOIN SYSCAT.TABCONST t
       |  ON t.TABSCHEMA = k.TABSCHEMA AND t.CONSTNAME = k.CONSTNAME
       |LEFT JOIN SYSCAT.REFERENCES r
       |  ON r.TABSCHEMA = k.TABSCHEMA AND r.CONSTNAME = k.CONSTNAME
       |WHERE t.TYPE IN ('P', 'F')
       |  AND ${filter.toSql("k.TABSCHEMA")}""".stripMargin

  def toSparkType(c: ColumnMeta, opts: MigrationOptions): DataType =
    c.typeName.toUpperCase.trim match {
      case "SMALLINT" => ShortType
      case "INTEGER" => IntegerType
      case "BIGINT" => LongType
      case "DECIMAL" | "DECFLOAT" => DecimalType(c.precision.getOrElse(18), c.scale.getOrElse(0))
      case "REAL" => FloatType
      case "DOUBLE" => DoubleType
      case "BOOLEAN" => BooleanType
      case "CHARACTER" | "CHAR" | "VARCHAR" | "CLOB" | "GRAPHIC" | "VARGRAPHIC" | "DBCLOB" => StringType
      case "DATE" => DateType
      case "TIME" => StringType // replace(char(col),'.',':') reformat (:168)
      case "TIMESTAMP" => TimestampNTZType
      case "BLOB" | "BINARY" | "VARBINARY" =>
        if (opts.binaryHandling == BinaryHandling.Native) BinaryType else StringType
      case "XML" => StringType
      case _ => StringType
    }

  def targetTypeString(c: ColumnMeta, opts: MigrationOptions): String =
    PostgresDialectLikeTarget.render(toSparkType(c, opts), c)

  def readExpression(c: ColumnMeta, opts: MigrationOptions): String = {
    val q = quoteIdent(c.name)
    c.typeName.toUpperCase.trim match {
      case "TIME" => s"replace(char($q), '.', ':')" // db2_to_exasol.sql:168
      case "XML" => s"XMLSERIALIZE($q AS CLOB)" // :171
      case "BLOB" | "BINARY" | "VARBINARY" =>
        opts.binaryHandling match {
          // HEX limit 16,336 bytes (db2_to_exasol.sql:159-160)
          case BinaryHandling.Hex => s"HEX(CAST($q AS VARCHAR(16336) FOR BIT DATA))"
          case _ => q
        }
      case _ => q
    }
  }
}

/** Netezza — FORMAT_TYPE parsing and the EXTRACT-based interval
  * rebuild (SURVEY.md §2.A #9, netezza_to_exasol.sql:109-135,174).
  */
object NetezzaDialect extends SourceDialect {
  val name = "netezza"
  val systemSchemas: Seq[String] = Seq("DEFINITION_SCHEMA", "INFORMATION_SCHEMA")

  /** FORMAT_TYPE strings arrive like "NUMERIC(12,4)" / "CHARACTER
    * VARYING(40)" — parse into (base, p1, p2)
    * (netezza_to_exasol.sql:109-113).
    */
  def parseFormatType(t: String): (String, Option[Int], Option[Int]) = {
    val re = "^([A-Z ]+?)\\s*(?:\\((\\d+)(?:,(\\d+))?\\))?$".r
    t.trim.toUpperCase match {
      case re(base, p1, p2) => (base.trim, Option(p1).map(_.toInt), Option(p2).map(_.toInt))
      case other => (other, None, None)
    }
  }

  def columnsQuery(filter: SchemaFilter): String =
    s"""SELECT c.SCHEMA AS table_schema, c.NAME AS table_name,
       |       c.ATTNUM AS ordinal, c.ATTNAME AS column_name,
       |       c.FORMAT_TYPE AS type_name,
       |       CASE WHEN c.ATTNOTNULL THEN 0 ELSE 1 END AS is_nullable,
       |       c.COLDEFAULT AS column_default,
       |       NULL AS char_length, NULL AS num_precision, NULL AS num_scale
       |FROM _V_RELATION_COLUMN c
       |WHERE c.TYPE = 'TABLE'
       |  AND ${filter.toSql("c.SCHEMA")}""".stripMargin

  def keysQuery(filter: SchemaFilter): String =
    s"""SELECT SCHEMA AS table_schema, RELATION AS table_name,
       |       CONSTRAINTNAME AS constraint_name,
       |       CASE CONTYPE WHEN 'p' THEN 'P' ELSE 'F' END AS kind,
       |       CONSEQ AS position, ATTNAME AS column_name,
       |       PKSCHEMA AS ref_schema, PKRELATION AS ref_table
       |FROM _V_RELATION_KEYDATA
       |WHERE CONTYPE IN ('p', 'f') AND ${filter.toSql("SCHEMA")}""".stripMargin

  def toSparkType(c: ColumnMeta, opts: MigrationOptions): DataType = {
    val (base, p1, p2) = parseFormatType(c.typeName)
    base match {
      case "BYTEINT" => ByteType
      case "SMALLINT" => ShortType
      case "INTEGER" => IntegerType
      case "BIGINT" => LongType
      case "NUMERIC" | "DECIMAL" => DecimalType(p1.getOrElse(18), p2.getOrElse(0))
      case "REAL" => FloatType
      case "DOUBLE PRECISION" => DoubleType
      case "BOOLEAN" => BooleanType
      case "CHARACTER" | "CHARACTER VARYING" | "NATIONAL CHARACTER" | "NATIONAL CHARACTER VARYING" =>
        StringType
      case "DATE" => DateType
      case "TIMESTAMP" => TimestampNTZType
      case "TIME" | "TIME WITH TIME ZONE" => StringType // cast-to-text (:177-185)
      case "INTERVAL" => StringType // rebuilt from EXTRACT parts (:126-135)
      case "ST_GEOMETRY" => StringType
      case "BINARY VARYING" =>
        if (opts.binaryHandling == BinaryHandling.Native) BinaryType else StringType
      case _ => StringType
    }
  }

  def targetTypeString(c: ColumnMeta, opts: MigrationOptions): String =
    PostgresDialectLikeTarget.render(toSparkType(c, opts), c.copy(charLength = {
      val (_, p1, _) = parseFormatType(c.typeName)
      p1.orElse(c.charLength)
    }))

  def readExpression(c: ColumnMeta, opts: MigrationOptions): String = {
    val q = quoteIdent(c.name)
    val (base, _, _) = parseFormatType(c.typeName)
    base match {
      case "TIME" | "TIME WITH TIME ZONE" => s"CAST($q AS VARCHAR(40))"
      case "INTERVAL" =>
        // rebuilt from EXTRACT parts with zero-padding (netezza:126-135)
        s"trim(EXTRACT(DAY FROM $q)) || ' ' || lpad(trim(EXTRACT(HOUR FROM $q)), 2, '0') || ':' || " +
          s"lpad(trim(EXTRACT(MINUTE FROM $q)), 2, '0') || ':' || lpad(trim(EXTRACT(SECOND FROM $q)), 2, '0')"
      case "ST_GEOMETRY" => s"ST_ASTEXT($q)" // :181
      case "BINARY VARYING" =>
        opts.binaryHandling match {
          case BinaryHandling.Hex => s"to_hex($q)" // hex text limit 32,000 (:174; README.md:632-634)
          case _ => q
        }
      case _ => q
    }
  }
}

/** SAP HANA — the TIME-driver quirk (driver returns today's date for
  * TIME, README.md:896) and BINTOHEX (SURVEY.md §2.A #10,
  * saphana_to_exasol.sql:88-103,145-169).
  */
object SapHanaDialect extends SourceDialect {
  val name = "saphana"
  val systemSchemas: Seq[String] = Seq("SYS", "SYSTEM", "_SYS_BI", "_SYS_BIC", "_SYS_REPO", "_SYS_STATISTICS")

  def columnsQuery(filter: SchemaFilter): String =
    s"""SELECT c.SCHEMA_NAME AS table_schema, c.TABLE_NAME AS table_name,
       |       c.POSITION AS ordinal, c.COLUMN_NAME AS column_name,
       |       c.DATA_TYPE_NAME AS type_name,
       |       CASE c.IS_NULLABLE WHEN 'TRUE' THEN 1 ELSE 0 END AS is_nullable,
       |       c.DEFAULT_VALUE AS column_default, c.LENGTH AS char_length,
       |       c.LENGTH AS num_precision, c.SCALE AS num_scale
       |FROM SYS.TABLE_COLUMNS c
       |WHERE c.IS_HIDDEN = 'FALSE'
       |  AND c.SCHEMA_NAME NOT IN (${systemSchemas.map(s => s"'$s'").mkString(", ")})
       |  AND ${filter.toSql("c.SCHEMA_NAME")}""".stripMargin

  def keysQuery(filter: SchemaFilter): String =
    s"""SELECT c.SCHEMA_NAME AS table_schema, c.TABLE_NAME AS table_name,
       |       c.CONSTRAINT_NAME AS constraint_name, 'P' AS kind,
       |       c.POSITION AS position, c.COLUMN_NAME AS column_name,
       |       NULL AS ref_schema, NULL AS ref_table
       |FROM SYS.CONSTRAINTS c
       |WHERE c.IS_PRIMARY_KEY = 'TRUE' AND ${filter.toSql("c.SCHEMA_NAME")}""".stripMargin

  def toSparkType(c: ColumnMeta, opts: MigrationOptions): DataType =
    c.typeName.toUpperCase.trim match {
      case "TINYINT" => ShortType
      case "SMALLINT" => ShortType
      case "INTEGER" => IntegerType
      case "BIGINT" => LongType
      case "DECIMAL" | "SMALLDECIMAL" => DecimalType(c.precision.getOrElse(18), c.scale.getOrElse(0))
      case "REAL" => FloatType
      case "DOUBLE" => DoubleType
      case "BOOLEAN" => BooleanType
      case "VARCHAR" | "NVARCHAR" | "ALPHANUM" | "SHORTTEXT" | "TEXT" | "CLOB" | "NCLOB" => StringType
      case "DATE" => DateType
      case "TIME" => StringType // driver quirk: returns today's date (README.md:896)
      case "TIMESTAMP" | "SECONDDATE" => TimestampNTZType
      case "VARBINARY" | "BLOB" =>
        if (opts.binaryHandling == BinaryHandling.Native) BinaryType else StringType
      case "ST_GEOMETRY" | "ST_POINT" => StringType
      case _ => StringType
    }

  def targetTypeString(c: ColumnMeta, opts: MigrationOptions): String =
    PostgresDialectLikeTarget.render(toSparkType(c, opts), c)

  def readExpression(c: ColumnMeta, opts: MigrationOptions): String = {
    val q = quoteIdent(c.name)
    c.typeName.toUpperCase.trim match {
      case "TIME" => s"TO_VARCHAR($q)" // saphana:161-169
      case "TEXT" | "SHORTTEXT" | "CLOB" | "NCLOB" => s"TO_NVARCHAR($q)" // :159
      case "VARBINARY" | "BLOB" =>
        opts.binaryHandling match {
          case BinaryHandling.Hex => s"BINTOHEX($q)" // :158
          case _ => q
        }
      case "ST_GEOMETRY" | "ST_POINT" => s"$q.ST_AsText()" // :165
      case _ => q
    }
  }
}

/** Exasol→Exasol — 1:1 types (COLUMN_TYPE reused verbatim) and the
  * always-parallel native transport preference
  * (exasol_to_exasol.sql:150-179,238-241; README.md:295-297).
  */
object ExasolDialect extends SourceDialect {
  val name = "exasol"
  val systemSchemas: Seq[String] = Seq("SYS", "EXA_STATISTICS")

  /** Native EXA transport is "always parallelized … significantly
    * faster" than JDBC — the Spark analog is a partitioned parallel
    * read, so dialect users should prefer predicates-based reads.
    */
  val preferNativeParallelTransport: Boolean = true

  def columnsQuery(filter: SchemaFilter): String =
    s"""SELECT COLUMN_SCHEMA AS table_schema, COLUMN_TABLE AS table_name,
       |       COLUMN_ORDINAL_POSITION AS ordinal, COLUMN_NAME AS column_name,
       |       COLUMN_TYPE AS type_name,
       |       CASE WHEN COLUMN_IS_NULLABLE THEN 1 ELSE 0 END AS is_nullable,
       |       COLUMN_DEFAULT AS column_default,
       |       COLUMN_MAXSIZE AS char_length,
       |       COLUMN_NUM_PREC AS num_precision, COLUMN_NUM_SCALE AS num_scale
       |FROM EXA_ALL_COLUMNS
       |WHERE COLUMN_OBJECT_TYPE = 'TABLE'
       |  AND COLUMN_SCHEMA NOT IN (${systemSchemas.map(s => s"'$s'").mkString(", ")})
       |  AND ${filter.toSql("COLUMN_SCHEMA")}""".stripMargin

  def keysQuery(filter: SchemaFilter): String =
    s"""SELECT CONSTRAINT_SCHEMA AS table_schema, CONSTRAINT_TABLE AS table_name,
       |       CONSTRAINT_NAME AS constraint_name,
       |       CASE CONSTRAINT_TYPE WHEN 'PRIMARY KEY' THEN 'P' ELSE 'F' END AS kind,
       |       ORDINAL_POSITION AS position, COLUMN_NAME AS column_name,
       |       REFERENCED_SCHEMA AS ref_schema, REFERENCED_TABLE AS ref_table
       |FROM EXA_ALL_CONSTRAINT_COLUMNS
       |WHERE CONSTRAINT_TYPE IN ('PRIMARY KEY', 'FOREIGN KEY')
       |  AND ${filter.toSql("CONSTRAINT_SCHEMA")}""".stripMargin

  def toSparkType(c: ColumnMeta, opts: MigrationOptions): DataType = {
    val t = c.typeName.toUpperCase.takeWhile(_ != '(').trim
    t match {
      case "DECIMAL" => DecimalType(c.precision.getOrElse(18), c.scale.getOrElse(0))
      case "DOUBLE" | "DOUBLE PRECISION" => DoubleType
      case "BOOLEAN" => BooleanType
      case "CHAR" | "VARCHAR" => StringType
      case "DATE" => DateType
      case "TIMESTAMP WITH LOCAL TIME ZONE" => TimestampType
      case "TIMESTAMP" => TimestampNTZType
      case "INTERVAL DAY TO SECOND" => DayTimeIntervalType()
      case "INTERVAL YEAR TO MONTH" => YearMonthIntervalType()
      case "HASHTYPE" => if (opts.binaryHandling == BinaryHandling.Native) BinaryType else StringType
      case "GEOMETRY" => StringType
      case _ => StringType
    }
  }

  /** 1:1 — the source COLUMN_TYPE string is already the target type. */
  def targetTypeString(c: ColumnMeta, opts: MigrationOptions): String = c.typeName

  def readExpression(c: ColumnMeta, opts: MigrationOptions): String = quoteIdent(c.name)
}
