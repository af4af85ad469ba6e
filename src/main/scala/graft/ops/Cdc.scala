package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** CONTENT-DEFINED CHUNKING (the Rabin-boundary recipe of LBFS/
  * rsync-family dedup): split each document where the CONTENT says so
  * — after any word whose hash clears a divisor test — instead of at
  * fixed offsets. The property that matters: an insertion near the
  * start of a document shifts every fixed-size chunk after it (all
  * their digests change, dedup misses everything), but content-
  * defined boundaries re-synchronize immediately — only the chunk
  * containing the edit changes. That makes chunk-level dedup robust
  * to the boilerplate-prefix/suffix edits that defeat whole-doc
  * hashing, without any pairwise comparison.
  *
  * Shape: one token-level pass — boundary flag per word (pure hash
  * predicate, the MinHash md5 family under a `cdc|` domain), chunk id
  * = running boundary count (a doc-partitioned prefix sum — windows
  * partition by doc, so no skew beyond document length), chunk text
  * reassembled per (doc, chunk id) and digested. Chunk digests are
  * 16 bytes; chunk TEXT never shuffles beyond its reassembly
  * aggregate. Expected chunk length is `divisor` words (geometric).
  */
object Cdc {
  type Q = (SparkSession, String) => DataFrame
  import Fixtures._

  /** Fixture divisor: expected chunk ≈ 8 words. */
  private val fixtureDivisor = 8

  /** (doc_id, chunk_id, n_words, chunk_digest) per content-defined
    * chunk. A word ends a chunk iff md5-48(`cdc|` ++ word) mod
    * divisor = 0 — boundary decisions depend ONLY on the word, never
    * its position, which is the whole trick.
    */
  def cdcChunks(docs: DataFrame, idCol: String, textCol: String, divisor: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tok = docs
      .select(col(idCol).as("doc_id"), posexplode(split(col(textCol), " ")).as(Seq("pos", "word")))
      .withColumn(
        "boundary",
        (conv(substring(md5(concat(lit("cdc|"), col("word")).cast("binary")), 1, 12), 16, 10)
          .cast("long") % divisor === 0).cast("int")
      )
    // chunk id = boundaries BEFORE this word: a word that fires the
    // divisor test is the LAST word of its chunk
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    tok
      .withColumn("chunk_id", (sum(col("boundary")).over(w) - col("boundary")).cast("bigint"))
      .groupBy(col("doc_id"), col("chunk_id"))
      .agg(
        count(lit(1)).cast("bigint").as("n_words"),
        md5(
          concat_ws(" ", sort_array(collect_list(struct(col("pos"), col("word")))).getField("word"))
            .cast("binary")
        ).as("chunk_digest")
      )
  }

  /** Per-language chunk-dedup accounting: how much of the corpus is
    * duplicated at content-defined-chunk granularity (distinctness
    * measured corpus-wide — cross-language duplicate chunks count as
    * duplicates in every language holding them).
    */
  val cdcChunkStats: Q = (s, d) => {
    val docs = documents(s, d)
    val chunks = cdcChunks(docs, "doc_id", "text", fixtureDivisor)
      .join(docs.select(col("doc_id"), col("lang")), "doc_id")
    // keeper per digest (min occurrence) — digest-keyed partial agg +
    // digest-keyed equi-join, the exactDedup shape; the keeper
    // relation is chunk-cardinality-sized, so it joins, never
    // broadcasts
    val keeper = chunks
      .groupBy(col("chunk_digest"))
      .agg(min(struct(col("doc_id"), col("chunk_id"))).as("k"))
      .select(col("chunk_digest"), col("k.doc_id").as("kdoc"), col("k.chunk_id").as("kchunk"))
    chunks
      .join(keeper, "chunk_digest")
      .withColumn("is_dup", (col("doc_id") =!= col("kdoc") || col("chunk_id") =!= col("kchunk")).cast("int"))
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).cast("bigint").as("n_chunks"),
        sum(col("is_dup")).cast("bigint").as("n_dup_chunks"),
        sum(col("n_words")).cast("bigint").as("n_words"),
        sum(col("is_dup") * col("n_words")).cast("bigint").as("dup_words")
      )
      .withColumn("dup_chunk_micro", expr("n_dup_chunks * 1000000 div n_chunks"))
      .orderBy("lang")
  }

  def queries: Map[String, Q] = Map(
    "cdc_chunk_stats" -> cdcChunkStats
  )

  def oracles: Map[String, String] = Map(
    "cdc_chunk_stats" -> {
      val bhash = "CAST(" + Dedup.hex12ValSql("md5('cdc|' || word)", 1) + s" AS BIGINT) % $fixtureDivisor"
      s"""WITH tok AS (
         |  SELECT doc_id, lang, i - 1 AS pos, w[i] AS word,
         |    CASE WHEN ${bhash.replace("word", "w[i]")} = 0 THEN 1 ELSE 0 END AS boundary
         |  FROM (SELECT doc_id, lang, string_split(text, ' ') AS w FROM documents),
         |       LATERAL (SELECT unnest(generate_series(1, len(w))) AS i)),
         |cid AS (
         |  SELECT doc_id, lang, pos, word,
         |    sum(boundary) OVER (PARTITION BY doc_id ORDER BY pos) - boundary AS chunk_id
         |  FROM tok),
         |chunks AS (
         |  SELECT doc_id, lang, chunk_id,
         |    CAST(count(*) AS BIGINT) AS n_words,
         |    md5(string_agg(word, ' ' ORDER BY pos)) AS chunk_digest
         |  FROM cid GROUP BY doc_id, lang, chunk_id),
         |keeper AS (
         |  SELECT chunk_digest, min(doc_id * 1000000 + chunk_id) AS kkey
         |  FROM chunks GROUP BY chunk_digest),
         |marked AS (
         |  SELECT c.lang, c.n_words,
         |    CASE WHEN c.doc_id * 1000000 + c.chunk_id <> k.kkey THEN 1 ELSE 0 END AS is_dup
         |  FROM chunks c JOIN keeper k USING (chunk_digest))
         |SELECT lang,
         |  CAST(count(*) AS BIGINT) AS n_chunks,
         |  CAST(sum(is_dup) AS BIGINT) AS n_dup_chunks,
         |  CAST(sum(n_words) AS BIGINT) AS n_words,
         |  CAST(sum(is_dup * n_words) AS BIGINT) AS dup_words,
         |  CAST(sum(is_dup) * 1000000 // count(*) AS BIGINT) AS dup_chunk_micro
         |FROM marked GROUP BY lang ORDER BY lang""".stripMargin
    }
  )
}
