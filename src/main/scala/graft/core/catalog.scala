package graft.core

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.types._
import graft.core.options.MigrationOptions

/** Catalog readers producing the engine's metadata IR
  * (`Dataset[ColumnMeta]` / `Dataset[KeyColumnMeta]`), the Spark
  * analog of the reference's remote catalog scans (SURVEY.md §2.A).
  */
object Catalog {

  /** JDBC catalog read: run the dialect's pushdown catalog query on
    * the source. Only metadata rows cross the wire; the source does
    * all joins (the reference's `import ... statement '<catalog
    * query>'` contract). Unused offline (no reachable JDBC source in
    * this sandbox) but the full production path.
    */
  def readJdbcColumns(
      spark: SparkSession,
      url: String,
      dialect: SourceDialect,
      filter: SchemaFilter,
      props: java.util.Properties = new java.util.Properties()
  ): Dataset[ColumnMeta] = {
    import spark.implicits._
    props.setProperty("fetchsize", "100000") // reference settings.cfg (README.md:75)
    spark.read
      .jdbc(url, s"(${dialect.columnsQuery(filter)}) cat_cols", props)
      .map { r =>
        ColumnMeta(
          schema = r.getAs[String]("table_schema"),
          table = r.getAs[String]("table_name"),
          ordinal = r.getAs[Number]("ordinal").intValue(),
          name = r.getAs[String]("column_name"),
          typeName = r.getAs[String]("type_name"),
          nullable = r.getAs[Boolean]("is_nullable"),
          default = Option(r.getAs[String]("column_default")),
          charLength = Option(r.getAs[Number]("char_length")).map(_.intValue()),
          precision = Option(r.getAs[Number]("num_precision")).map(_.intValue()),
          scale = Option(r.getAs[Number]("num_scale")).map(_.intValue())
        )
      }
  }

  /** Parquet-directory catalog: derive ColumnMeta from the files'
    * footers — the file-lake analog of a catalog scan (schema comes
    * from the source of truth, not inference over data).
    */
  def readParquetColumns(
      spark: SparkSession,
      dir: String,
      schemaName: String,
      tables: Seq[String]
  ): Seq[ColumnMeta] =
    tables.flatMap { t =>
      val st = spark.read.parquet(s"$dir/$t.parquet").schema
      st.fields.zipWithIndex.map { case (f, i) =>
        val (tn, len, p, s) = describe(f.dataType)
        ColumnMeta(
          schema = schemaName,
          table = t,
          ordinal = i + 1,
          name = f.name,
          typeName = tn,
          nullable = f.nullable,
          charLength = len,
          precision = p,
          scale = s
        )
      }
    }

  private def describe(dt: DataType): (String, Option[Int], Option[Int], Option[Int]) = dt match {
    case ByteType => ("tinyint", None, Some(3), Some(0))
    case ShortType => ("smallint", None, Some(5), Some(0))
    case IntegerType => ("integer", None, Some(10), Some(0))
    case LongType => ("bigint", None, Some(18), Some(0))
    case FloatType => ("real", None, None, None)
    case DoubleType => ("double", None, None, None)
    case d: DecimalType => ("decimal", None, Some(d.precision), Some(d.scale))
    case BooleanType => ("boolean", None, None, None)
    case StringType => ("varchar", Some(2000000), None, None)
    case BinaryType => ("binary", None, None, None)
    case DateType => ("date", None, None, None)
    case TimestampType => ("timestamp with time zone", None, None, None)
    case TimestampNTZType => ("timestamp", None, None, None)
    case ArrayType(e, _) => (s"array<${describe(e)._1}>", None, None, None)
    case other => (other.simpleString, None, None, None)
  }

  /** Spark StructType for a table's ColumnMeta rows under a dialect. */
  def toStructType(cols: Seq[ColumnMeta], dialect: SourceDialect, opts: MigrationOptions): StructType =
    StructType(
      cols
        .sortBy(_.ordinal)
        .map(c => StructField(c.name, dialect.toSparkType(c, opts), c.nullable))
    )
}
