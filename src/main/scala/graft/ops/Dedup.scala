package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operators for LLM training-data pipelines (the
  * BASELINE.json north-star extensions; SURVEY.md §7.1 item 8).
  *
  * Exact dedup: group by a content hash, keep the lowest id. At 100 TB
  * this is one shuffle on the 128-bit hash (never on the document text
  * itself), with map-side partial aggregation; the surviving-id policy
  * (min id) is deterministic and rerun-stable.
  */
object Dedup {
  type Q = (SparkSession, String) => DataFrame
  import Fixtures._

  /** Exact near-zero-cost dedup over a content hash. Returns one row
    * per distinct content: (content hash, surviving doc id, copy count).
    */
  def exactDedup(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    docs
      .select(md5(col(textCol).cast("binary")).as("content_hash"), col(idCol))
      .groupBy(col("content_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  val dedupExact: Q = (s, d) =>
    exactDedup(documents(s, d), "text", "doc_id")
      .select("content_hash", "keep_id", "n_copies")
      .orderBy("keep_id")

  def queries: Map[String, Q] = Map(
    "dedup_exact" -> dedupExact
  )

  def oracles: Map[String, String] = Map(
    "dedup_exact" ->
      """SELECT md5(text) AS content_hash, min(doc_id) AS keep_id, count(*) AS n_copies
        |FROM documents GROUP BY md5(text) ORDER BY keep_id""".stripMargin
  )
}
