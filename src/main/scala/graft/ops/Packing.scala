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

  /** Deterministic corpus SHARDING — the delivery step after mixture
    * and packing: route each document to one of `nShards` training
    * shards by a 48-bit md5 draw on its id (domain-separated from the
    * mixture draw, so sampling survival and shard routing stay
    * independent). The assignment is a pure map-side projection —
    * engine-portable, append-stable, zero shuffle; the physical write
    * is `partitionBy(shard)`, the cluster-map layout discipline.
    * Balance is binomial over documents.
    */
  def shardAssign(docs: DataFrame, idCol: String, nShards: Int): DataFrame =
    docs.withColumn(
      "shard",
      pmod(
        conv(
          substring(md5(concat(lit("shard|"), col(idCol).cast("string")).cast("binary")), 1, 12),
          16,
          10
        ).cast("long"),
        lit(nShards.toLong)
      )
    )

  private val nShards = 8

  /** Per-shard manifest: doc/token counts plus a bit_xor membership
    * digest of the doc ids — the xor pins the EXACT assignment (any
    * single reroute flips it) without materializing the row-level map
    * in the gate.
    */
  val shardManifestQ: Q = (s, d) =>
    shardAssign(documents(s, d), "doc_id", nShards)
      .withColumn("n_tokens", size(split(col("text"), " ")).cast("bigint"))
      .groupBy(col("shard"))
      .agg(
        count(lit(1)).cast("bigint").as("n_docs"),
        sum(col("n_tokens")).cast("bigint").as("tokens"),
        expr("bit_xor(doc_id)").as("doc_xor")
      )
      .orderBy("shard")

  /** Deterministic GLOBAL SHUFFLE order — the last delivery step: a
    * training run wants every epoch's data order random w.r.t.
    * content but reproducible and resumable. The order key is a
    * 48-bit md5 draw on the doc id (domain-separated: `shuf|` — a
    * doc's position is independent of its mixture/shard/holdout
    * draws, and appending documents never moves existing ones
    * relative to each other). The global ORDER BY rides Spark's
    * range-partitioned sort — sampled boundaries, then per-partition
    * sorts — the scalable global sort, never a single-point merge;
    * at delivery the writer emits files in partition order and a
    * reader streams them sequentially for a fully shuffled epoch.
    */
  def corpusShuffle(docs: DataFrame, idCol: String): DataFrame =
    docs
      .select(
        col(idCol).as("doc_id"),
        conv(
          substring(md5(concat(lit("shuf|"), col(idCol).cast("string")).cast("binary")), 1, 12),
          16,
          10
        ).cast("long").as("draw")
      )
      .orderBy("draw", "doc_id")

  val corpusShuffleQ: Q = (s, d) => corpusShuffle(documents(s, d), "doc_id")

  def queries: Map[String, Q] = Map(
    "pack_sequences" -> packSequencesQ,
    "shard_manifest" -> shardManifestQ,
    "corpus_shuffle" -> corpusShuffleQ
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
         |FROM p ORDER BY doc_id""".stripMargin,
    "shard_manifest" -> {
      val draw = "CAST(" + Dedup.hex12ValSql("md5('shard|' || CAST(doc_id AS VARCHAR))", 1) + " AS BIGINT)"
      s"""WITH a AS (
         |  SELECT doc_id, $draw % $nShards AS shard,
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
         |  FROM documents)
         |SELECT CAST(shard AS BIGINT) AS shard,
         |  CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(n_tokens) AS BIGINT) AS tokens,
         |  CAST(bit_xor(doc_id) AS BIGINT) AS doc_xor
         |FROM a GROUP BY shard ORDER BY shard""".stripMargin
    },
    "corpus_shuffle" -> {
      val draw = "CAST(" + Dedup.hex12ValSql("md5('shuf|' || CAST(doc_id AS VARCHAR))", 1) + " AS BIGINT)"
      s"SELECT doc_id, $draw AS draw FROM documents ORDER BY draw, doc_id"
    }
  )
}
