package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew salting for joins: when one join key dominates (the classic
  * hot-key pile-up AQE's skew handling can't always split — e.g. a
  * build side too large to broadcast), the large side scatters each
  * hot key across `factor` salted sub-keys and the small side is
  * replicated `factor` times; the join runs on (key, salt) with
  * factor-fold parallelism on the hot key.
  *
  * The salt is deterministic (hash of the large side's row identity
  * column modulo factor) so re-runs and retries place rows
  * identically.
  */
object Salting {

  /** Equi-join `large ⋈ small` on largeKey = smallKey with the large
    * side salted by `idCol` (any column that varies within a key
    * group). Result column set = large.* ++ small.* minus the
    * duplicate key column.
    */
  def saltedJoin(
      large: DataFrame,
      largeKey: String,
      idCol: String,
      small: DataFrame,
      smallKey: String,
      factor: Int
  ): DataFrame = {
    require(factor > 0)
    val saltedLarge = large.withColumn("__salt", pmod(xxhash64(col(idCol)), lit(factor)))
    val replicatedSmall = small
      .withColumn("__salt", explode(sequence(lit(0), lit(factor - 1))))
      .withColumn("__salt", col("__salt").cast("long"))
    saltedLarge
      .join(replicatedSmall, col(largeKey) === col(smallKey) && saltedLarge("__salt") === replicatedSmall("__salt"))
      .drop("__salt")
      .drop(smallKey)
  }

  /** Two-sided salt grid for the hot-key PAIR-expansion joins (both
    * sides corpus-sized, e.g. a blocked self-join): side A is pinned
    * to a salt class by hash(aId) mod `grid` and replicated across the
    * `grid` classes of the other axis; side B symmetrically. The join
    * runs on (key, salt_a, salt_b), so each (rowA, rowB) pair meets
    * exactly once — at (hash(aId)%grid, hash(bId)%grid) — and a hot
    * key fans out over grid² tasks for only 2·grid total shuffle
    * volume. The one-sided form needs factor = grid² replication of a
    * whole side for the same parallelism (16× vs 2×4× at grid 4),
    * which is exactly the overpay that shows up at 100 TB where the
    * replicated side carries word-set / embedding arrays.
    */
  def saltedGridJoin(
      a: DataFrame,
      aKey: String,
      aId: String,
      b: DataFrame,
      bKey: String,
      bId: String,
      grid: Int
  ): DataFrame = {
    require(grid > 0)
    val ga = a
      .withColumn("__sa", pmod(xxhash64(col(aId)), lit(grid)))
      .withColumn("__sb", explode(sequence(lit(0), lit(grid - 1))))
      .withColumn("__sb", col("__sb").cast("long"))
    val gb = b
      .withColumn("__gb_sb", pmod(xxhash64(col(bId)), lit(grid)))
      .withColumn("__gb_sa", explode(sequence(lit(0), lit(grid - 1))))
      .withColumn("__gb_sa", col("__gb_sa").cast("long"))
    ga.join(
      gb,
      col(aKey) === col(bKey) && col("__sa") === col("__gb_sa") && col("__sb") === col("__gb_sb")
    )
      .drop("__sa", "__sb", "__gb_sa", "__gb_sb")
      .drop(bKey)
  }
}
