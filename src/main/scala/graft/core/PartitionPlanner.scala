package graft.core

/** Parallel-read planning — the reference's only physical-planning
  * algorithm (oracle_to_exasol.sql:142-262): per-partition row counts
  * are greedily bin-packed into `parallelism` least-loaded bins, each
  * bin becoming one parallel read statement; tables without partitions
  * fall back to a hash split (`ora_hash(rowid, N-1) = i`,
  * oracle_to_exasol.sql:567-573).
  *
  * Spark mapping: the bins become the `predicates` array of
  * `spark.read.jdbc(url, table, predicates, props)` — one partition
  * (task) per bin, so a balanced packing directly balances executor
  * work. This is what makes a 100 TB JDBC pull feasible: parallelism
  * bounded by `parallelism`, per-task volume bounded by the packing.
  */
object PartitionPlanner {

  /** A source-side physical partition and its row count. */
  final case class SourcePartition(name: String, rows: Long)

  /** Greedy least-loaded bin packing (largest-first), deterministic:
    * ties broken by bin index, input order normalized by (rows desc,
    * name asc). Returns at most `nBins` non-empty bins.
    *
    * Guarantee (classic LPT bound): max bin load <= avg load + max
    * item — checked by the property tests.
    */
  def binPack(parts: Seq[SourcePartition], nBins: Int): Vector[Vector[SourcePartition]] = {
    require(nBins > 0, "nBins must be positive")
    val sorted = parts.sortBy(p => (-p.rows, p.name))
    val bins = Array.fill(nBins)(Vector.newBuilder[SourcePartition])
    val loads = Array.fill(nBins)(0L)
    sorted.foreach { p =>
      val i = loads.indices.minBy(i => (loads(i), i))
      bins(i) += p
      loads(i) += p.rows
    }
    bins.map(_.result()).toVector.filter(_.nonEmpty)
  }

  /** Per-bin JDBC predicate over a partition-name pseudo-column (for
    * sources addressing partitions by name in SQL, the predicate is an
    * IN-list; Oracle's `partition("P")` syntax is handled by the
    * dialect when stitching the read statement).
    */
  def partitionPredicates(
      parts: Seq[SourcePartition],
      parallelism: Int,
      partitionColumn: String
  ): Array[String] =
    binPack(parts, parallelism).map { bin =>
      val names = bin.map(p => s"'${p.name.replace("'", "''")}'").mkString(", ")
      s"$partitionColumn IN ($names)"
    }.toArray

  /** Hash-split fallback for unpartitioned tables: N disjoint,
    * complete residue-class predicates over a dialect hash expression
    * (`ora_hash(rowid, N-1) = i` ↔ `mod(hash, N) = i`).
    */
  def hashSplitPredicates(hashExpr: String, parallelism: Int): Array[String] = {
    require(parallelism > 0)
    (0 until parallelism).map(i => s"mod($hashExpr, $parallelism) = $i").toArray
  }

  /** Range-split predicates over a numeric column — Spark's
    * lower/upperBound JDBC split expressed as explicit predicates so
    * the boundary semantics are visible and testable (first/last
    * stride unbounded, matching Spark's own JDBCRelation behavior).
    */
  def rangeSplitPredicates(
      column: String,
      lower: Long,
      upper: Long,
      parallelism: Int
  ): Array[String] = {
    require(parallelism > 0 && upper >= lower)
    if (parallelism == 1) return Array("1 = 1")
    val stride = math.max(1L, (upper - lower) / parallelism)
    (0 until parallelism).map { i =>
      val lo = lower + i * stride
      val hi = lower + (i + 1) * stride
      if (i == 0) s"$column < $hi OR $column IS NULL"
      else if (i == parallelism - 1) s"$column >= $lo"
      else s"$column >= $lo AND $column < $hi"
    }.toArray
  }
}
