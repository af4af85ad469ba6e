package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sequence packing: lay documents end to end into fixed token-budget
  * training sequences — the tokenizer-feed step between curation and
  * batching. Contiguous packing (concatenate in order, cut every
  * `budget` tokens) is what production pretraining pipelines do; a
  * document's sequence id is just the prefix-sum of token counts
  * before it, divided by the budget.
  *
  * Scale shape: the prefix sum runs per STRATUM (here language; in
  * production a shard/file), so each window partition is one stratum's
  * stream and strata pack in parallel — there is no global order and
  * no single-partition window. A corpus-wide global pack would need
  * the two-phase prefix sum (per-partition totals broadcast as
  * offsets); deliberately not implemented — global order across a
  * 100 TB corpus is a serialization point with no training benefit,
  * which is why real pipelines pack per shard.
  */
object Packing {
  type Q = (SparkSession, String) => DataFrame
  import Fixtures._

  /** Per-doc packing map: (doc, stratum) -> sequence id + offset of
    * the doc's first token within that stratum's concatenated stream.
    * Docs longer than the residual budget straddle a boundary (exactly
    * like training-data concatenation; `spans_boundary` marks them).
    */
  def packSequences(
      docs: DataFrame,
      idCol: String,
      strataCol: String,
      tokensExpr: org.apache.spark.sql.Column,
      budget: Int
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("stratum")).orderBy(col("doc_id"))
    docs
      .select(col(idCol).as("doc_id"), col(strataCol).as("stratum"), tokensExpr.as("n_tokens"))
      .withColumn("end_offset", sum(col("n_tokens")).over(w))
      .withColumn("start_offset", (col("end_offset") - col("n_tokens")).cast("bigint"))
      .withColumn("seq_id", floor(col("start_offset") / budget).cast("bigint"))
      .withColumn(
        "spans_boundary",
        when(floor((col("end_offset") - 1) / budget) > col("seq_id"), 1L).otherwise(0L)
      )
      .select(
        col("doc_id"),
        col("stratum"),
        col("n_tokens").cast("bigint").as("n_tokens"),
        col("start_offset"),
        col("seq_id"),
        col("spans_boundary")
      )
  }

  private val budget = 512

  val packSequencesQ: Q = (s, d) =>
    packSequences(
      documents(s, d),
      "doc_id",
      "lang",
      size(split(col("text"), " ")).cast("bigint"),
      budget
    ).orderBy("doc_id")

  def queries: Map[String, Q] = Map(
    "pack_sequences" -> packSequencesQ
  )

  def oracles: Map[String, String] = Map(
    "pack_sequences" ->
      s"""WITH t AS (
         |  SELECT doc_id, lang AS stratum,
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
         |  FROM documents),
         |p AS (
         |  SELECT doc_id, stratum, n_tokens,
         |    CAST(sum(n_tokens) OVER (PARTITION BY stratum ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens AS BIGINT) AS start_offset
         |  FROM t)
         |SELECT doc_id, stratum, n_tokens, start_offset,
         |  CAST(floor(start_offset / $budget.0) AS BIGINT) AS seq_id,
         |  CAST(CASE WHEN floor((start_offset + n_tokens - 1) / $budget.0)
         |                  > floor(start_offset / $budget.0)
         |       THEN 1 ELSE 0 END AS BIGINT) AS spans_boundary
         |FROM p ORDER BY doc_id""".stripMargin
  )
}
