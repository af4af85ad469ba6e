package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Exact duplicated-SPAN detection — the fixed-k engine analog of
  * ExactSubstr dedup (Lee et al. 2022, "Deduplicating Training Data
  * Makes Language Models Better": duplicated 50-BPE-token substrings).
  * Their suffix-array machine finds duplicates of ANY length; the
  * distributed form fixes a span length k and slides a k-word window
  * (stride 1) over every document — any duplicated substring of ≥ k
  * words contains a duplicated k-span, so fixed-k detection is a
  * complete detector at the chosen granularity, and it becomes pure
  * relational algebra:
  *
  *   span digests → ONE shuffle on digest (corpus-wide counts) →
  *   per-doc aggregate.
  *
  * The shuffled rows carry (digest, doc, pos) — 16-byte digests, not
  * span text — so shuffle volume is O(corpus tokens), independent of
  * k. Per-doc stats come back partitioned by doc_id (a partition is
  * one document's spans — never skewed). No suffix array, no driver
  * state, no all-pairs.
  */
object Spans {
  type Q = (SparkSession, String) => DataFrame
  import Fixtures._

  private val k = 20

  /** (doc_id, pos, digest) for every k-word window; documents shorter
    * than k yield no rows (both engines agree: the index-lambda
    * transform is guarded, the oracle's generate_series is empty).
    * Index-lambda transform + struct explode, the plan shape that
    * keeps the window transform above any repartition (doc_winnow
    * hazard).
    */
  def spanDigests(docs: DataFrame, idCol: String, textCol: String, spanWords: Int = k): DataFrame =
    docs
      .select(col(idCol).as("doc_id"), split(col(textCol), " ").as("w"))
      .select(
        col("doc_id"),
        explode(
          when(
            size(col("w")) >= spanWords,
            expr(
              s"transform(sequence(0, size(w) - $spanWords), " +
                s"i -> named_struct('pos', i, 'dig', md5(cast(concat_ws(' ', slice(w, i + 1, $spanWords)) as binary))))"
            )
          ).otherwise(array())
        ).as("sp")
      )
      .select(col("doc_id"), col("sp.pos").cast("bigint").as("pos"), col("sp.dig").as("dig"))

  /** Per-document duplicated-span report: how many of the doc's spans
    * occur elsewhere in the corpus (or again in the same doc), plus
    * the duplicated fraction — the triage signal ExactSubstr pipelines
    * act on (cut the span, or drop the doc above a threshold).
    */
  val substringDupSpans: Q = (s, d) => {
    // corpus-wide occurrence counts via groupBy + join, not a
    // count-over-window: a boilerplate span shared by millions of docs
    // would pile one window partition onto one task, while the
    // aggregate partial-combines and the join is AQE-skew-splittable
    val digests = spanDigests(documents(s, d), "doc_id", "text")
    val occ = digests.groupBy(col("dig")).agg(count(lit(1)).as("n_occ"))
    digests
      .join(occ, Seq("dig"))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).cast("bigint").as("n_spans"),
        sum(when(col("n_occ") >= 2, 1L).otherwise(0L)).cast("bigint").as("n_dup_spans")
      )
      .withColumn(
        "dup_span_frac",
        round(col("n_dup_spans").cast("double") / col("n_spans"), 6)
      )
      .orderBy("doc_id")
  }

  def queries: Map[String, Q] = Map("substring_dup_spans" -> substringDupSpans)

  def oracles: Map[String, String] = Map(
    "substring_dup_spans" ->
      s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         |sp AS (
         |  SELECT doc_id, md5(array_to_string(w[i:i + $k - 1], ' ')) AS dig
         |  FROM (SELECT doc_id, w, unnest(generate_series(1, len(w) - $k + 1)) AS i FROM w)),
         |occ AS (SELECT dig, count(*) AS n_occ FROM sp GROUP BY dig)
         |SELECT s.doc_id,
         |  CAST(count(*) AS BIGINT) AS n_spans,
         |  CAST(sum(CASE WHEN o.n_occ >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_spans,
         |  round(CAST(sum(CASE WHEN o.n_occ >= 2 THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6)
         |    AS dup_span_frac
         |FROM sp s JOIN occ o ON o.dig = s.dig
         |GROUP BY s.doc_id ORDER BY s.doc_id""".stripMargin
  )
}
