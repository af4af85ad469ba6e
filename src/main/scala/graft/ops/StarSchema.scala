package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Flat → star-schema decomposition (SURVEY.md §2.D #50; reference
  * post_load_optimization/Flat_To_Star_Schema/Convert_To_Star_Schema.sql:317-446):
  * dimension tables = DISTINCT natural keys + surrogate ids, fact =
  * the flat table joined back to each dimension with NULL-safe
  * equality (`<=>` ↔ the reference's `(a=b OR (a IS NULL AND b IS
  * NULL))`), idempotent re-runs via anti-join.
  *
  * Surrogate keys: the reference uses an IDENTITY column; here the
  * global dense rank over the natural key gives *deterministic* ids
  * (testable against the oracle). The rank is computed WITHOUT a
  * global single-partition window: distinct keys are range-partitioned
  * (globally ordered across partitions), ranked per partition in
  * parallel, and composed with per-partition offsets (a partition-
  * count-sized driver list) — so a high-cardinality dimension ranks at
  * full parallelism instead of collapsing onto one task.
  */
object StarSchema {
  type Q = (SparkSession, String) => DataFrame
  import Fixtures._

  /** Build a dimension: distinct natural-key rows + dense-rank
    * surrogate id via range-partitioned parallel rank composition.
    * Output ids are identical to a global `dense_rank` (keys are
    * unique after distinct, and range partitioning preserves global
    * order across partitions) at any partition count.
    */
  def dimension(flat: DataFrame, naturalCols: Seq[String], idCol: String): DataFrame = {
    val order = naturalCols.map(c => asc_nulls_first(c))
    val distinctRows = flat
      .select(naturalCols.map(col): _*)
      .distinct()
      .repartitionByRange(order: _*)
      .cache()
    val w = Window.partitionBy(col("__pid")).orderBy(order: _*)
    val local = distinctRows
      .withColumn("__pid", spark_partition_id())
      .withColumn("__rn", row_number().over(w))
    // per-partition row counts → cumulative offsets; partition-count-
    // sized, never data-sized
    val counts = local
      .groupBy(col("__pid"))
      .agg(count(lit(1)).as("__cnt"))
      .collect()
      .map(r => (r.getAs[Int]("__pid"), r.getAs[Long]("__cnt")))
      .sortBy(_._1)
    val offsets = counts
      .scanLeft((0, 0L)) { case ((_, acc), (pid, cnt)) => (pid, acc + cnt) }
      .tail
      .zip(counts)
      .map { case ((pid, cumEnd), (_, cnt)) => (pid, cumEnd - cnt) }
    val spark = flat.sparkSession
    import spark.implicits._
    val offsetDf = offsets.toSeq.toDF("__pid", "__offset")
    local
      .join(broadcast(offsetDf), "__pid")
      .withColumn(idCol, (col("__rn") + col("__offset")).cast("bigint"))
      .drop("__pid", "__rn", "__offset")
      .select((naturalCols :+ idCol).map(col): _*)
  }

  /** Join the flat table back to a dimension null-safely, replacing the
    * natural columns with the surrogate id.
    */
  def factJoin(flat: DataFrame, dim: DataFrame, naturalCols: Seq[String], idCol: String): DataFrame = {
    val dimRenamed = naturalCols.foldLeft(dim)((d, c) => d.withColumnRenamed(c, s"__dim_$c"))
    val cond = naturalCols
      .map(c => col(c) <=> col(s"__dim_$c"))
      .reduce(_ && _)
    flat
      .join(broadcast(dimRenamed), cond, "inner")
      .drop(naturalCols.map(c => s"__dim_$c"): _*)
      .drop(naturalCols: _*)
  }

  /** Idempotent dimension maintenance: insert only natural-key rows
    * not already present (the reference's `INSERT … SELECT DISTINCT …
    * WHERE NOT EXISTS`, Convert_To_Star_Schema.sql:386,443) — null-safe
    * anti-join, so re-running a load never duplicates dimension rows.
    */
  def insertMissing(dim: DataFrame, incoming: DataFrame, naturalCols: Seq[String]): DataFrame = {
    val newRows = incoming.select(naturalCols.map(col): _*).distinct()
    val cond = naturalCols.map(c => newRows(c) <=> dim(c)).reduce(_ && _)
    newRows.join(dim, cond, "left_anti")
  }

  val dims: Q = (s, d) =>
    dimension(orders(s, d), Seq("o_orderstatus", "o_orderpriority"), "dim_id")
      .select(col("dim_id"), col("o_orderstatus"), col("o_orderpriority"))
      .orderBy("dim_id")

  val fact: Q = (s, d) => {
    val flat = orders(s, d)
    val dim = dimension(flat, Seq("o_orderstatus", "o_orderpriority"), "dim_id")
    factJoin(flat, dim, Seq("o_orderstatus", "o_orderpriority"), "dim_id")
      .select(
        col("o_orderkey"),
        col("o_custkey"),
        col("dim_id"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate_s")
      )
      .orderBy("o_orderkey")
  }

  /** Full decomposition with TWO dimensions — the reference's actual
    * shape (one dim table per column group, fact holding only
    * surrogate keys + measures).
    */
  val factMultiDim: Q = (s, d) => {
    val flat = orders(s, d)
    val dimStatus = dimension(flat, Seq("o_orderstatus"), "status_id")
    val dimPriority = dimension(flat, Seq("o_orderpriority"), "priority_id")
    val f1 = factJoin(flat, dimStatus, Seq("o_orderstatus"), "status_id")
    factJoin(f1, dimPriority, Seq("o_orderpriority"), "priority_id")
      .select(
        col("o_orderkey"),
        col("o_custkey"),
        col("status_id"),
        col("priority_id"),
        Fixtures.decStr(col("o_totalprice").cast(org.apache.spark.sql.types.DecimalType(18, 2))).as("totalprice")
      )
      .orderBy("o_orderkey")
  }

  def queries: Map[String, Q] = Map(
    "star_dims" -> dims,
    "star_fact" -> fact,
    "star_fact_multidim" -> factMultiDim
  )

  def oracles: Map[String, String] = Map(
    "star_dims" ->
      """SELECT CAST(dense_rank() OVER (ORDER BY o_orderstatus, o_orderpriority) AS BIGINT) AS dim_id,
        |       o_orderstatus, o_orderpriority
        |FROM (SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders)
        |ORDER BY dim_id""".stripMargin,
    "star_fact" ->
      """WITH dim AS (
        |  SELECT CAST(dense_rank() OVER (ORDER BY o_orderstatus, o_orderpriority) AS BIGINT) AS dim_id,
        |         o_orderstatus, o_orderpriority
        |  FROM (SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders))
        |SELECT o_orderkey, o_custkey, dim_id,
        |       strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate_s
        |FROM orders o JOIN dim d
        |  ON o.o_orderstatus IS NOT DISTINCT FROM d.o_orderstatus
        | AND o.o_orderpriority IS NOT DISTINCT FROM d.o_orderpriority
        |ORDER BY o_orderkey""".stripMargin,
    "star_fact_multidim" ->
      """WITH dim_s AS (
        |  SELECT CAST(dense_rank() OVER (ORDER BY o_orderstatus) AS BIGINT) AS status_id, o_orderstatus
        |  FROM (SELECT DISTINCT o_orderstatus FROM orders)),
        |dim_p AS (
        |  SELECT CAST(dense_rank() OVER (ORDER BY o_orderpriority) AS BIGINT) AS priority_id, o_orderpriority
        |  FROM (SELECT DISTINCT o_orderpriority FROM orders))
        |SELECT o_orderkey, o_custkey, status_id, priority_id,
        |       CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR) AS totalprice
        |FROM orders o
        |JOIN dim_s s ON o.o_orderstatus IS NOT DISTINCT FROM s.o_orderstatus
        |JOIN dim_p p ON o.o_orderpriority IS NOT DISTINCT FROM p.o_orderpriority
        |ORDER BY o_orderkey""".stripMargin
  )
}
