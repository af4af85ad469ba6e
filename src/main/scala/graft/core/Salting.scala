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
}
