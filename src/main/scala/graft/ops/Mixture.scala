package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-mixture operators: deterministic stratified sampling — the
  * "mix 30% web, 2× books, 0.5× low-resource langs" step every
  * training-data pipeline runs between curation and tokenization.
  *
  * The keep/drop decision is a pure function of the document id: a
  * 48-bit uniform draw from md5 (engine-portable, like the MinHash
  * family) compared against the stratum's rate threshold. That makes
  * the sample (a) reproducible across runs/engines/cluster sizes,
  * (b) a map-side FILTER — no shuffle, no sort, no sampling state,
  * pushdown-friendly — and (c) stable under corpus appends: a doc's
  * fate never depends on what else is in the corpus (the property
  * `df.sample()` does NOT have, being partition-layout-dependent).
  */
object Mixture {
  type Q = (SparkSession, String) => DataFrame
  import Fixtures._

  private val drawBits = 48
  private val drawMod = 1L << drawBits

  /** 48-bit uniform draw in [0, 2^48) from the id — `mix|` domain-
    * separates it from the MinHash/fingerprint hash families.
    */
  def uniformDraw(id: Column): Column =
    conv(substring(md5(concat(lit("mix|"), id.cast("string")).cast("binary")), 1, 12), 16, 10)
      .cast("long")

  /** Keep each row iff draw(id) < rate(stratum) · 2^48. Rates are
    * per-stratum with a default; thresholds are exact integers so the
    * predicate is integer comparison end to end.
    */
  def stratifiedSample(
      docs: DataFrame,
      idCol: String,
      strataCol: String,
      rates: Map[String, Double],
      defaultRate: Double
  ): DataFrame = {
    val draw = uniformDraw(col(idCol))
    val threshold = rates.foldLeft(lit((defaultRate * drawMod).toLong)) {
      case (acc, (stratum, rate)) =>
        when(col(strataCol) === stratum, lit((rate * drawMod).toLong)).otherwise(acc)
    }
    docs.withColumn("draw", draw).filter(col("draw") < threshold)
  }

  /** Deterministic TRAIN/VAL/TEST assignment — the held-out-split
    * idiom with [[stratifiedSample]]'s guarantees: a domain-separated
    * draw mod 10000 against basis-point cuts, so membership is a pure
    * function of the id (append-stable — a doc can never migrate
    * between splits as the corpus grows, the property that keeps eval
    * sets uncontaminated), map-side, zero shuffle.
    */
  def holdoutSplit(
      docs: DataFrame,
      idCol: String,
      trainBps: Int = 9800,
      valBps: Int = 100
  ): DataFrame = {
    require(trainBps + valBps <= 10000, "split fractions exceed 100%")
    val bps = pmod(
      conv(substring(md5(concat(lit("split|"), col(idCol).cast("string")).cast("binary")), 1, 12), 16, 10)
        .cast("long"),
      lit(10000L)
    )
    docs.withColumn(
      "split",
      when(bps < trainBps, "train").when(bps < trainBps + valBps, "val").otherwise("test")
    )
  }

  val holdoutSplitQ: Q = (s, d) =>
    holdoutSplit(documents(s, d), "doc_id")
      .withColumn("n_tokens", size(split(col("text"), " ")).cast("bigint"))
      .groupBy(col("split"))
      .agg(
        count(lit(1)).cast("bigint").as("n_docs"),
        sum(col("n_tokens")).cast("bigint").as("tokens"),
        expr("bit_xor(doc_id)").as("doc_xor")
      )
      .orderBy("split")

  /** The fixture mixture: keep all English, 40% of everything else —
    * the shape of an upsample-head-language mixture. Output carries
    * the draw so the oracle pins the exact per-doc decision, not just
    * the counts.
    */
  private[ops] val fixtureRates = Map("en" -> 1.0)
  private[ops] val fixtureDefault = 0.4

  val mixtureSample: Q = (s, d) =>
    stratifiedSample(documents(s, d), "doc_id", "lang", fixtureRates, fixtureDefault)
      .select(col("doc_id"), col("lang"), col("draw"))
      .orderBy("doc_id")

  /** Per-stratum accounting: planned rate vs achieved rate — the
    * mixture report a pipeline publishes next to the sampled corpus.
    * Achieved-vs-planned drift is the binomial noise of the draw, so
    * the report carries exact integer counts plus a basis-point rate.
    */
  val mixtureAccounting: Q = (s, d) => {
    val docs = documents(s, d)
    val kept = stratifiedSample(docs, "doc_id", "lang", fixtureRates, fixtureDefault)
    docs
      .groupBy(col("lang"))
      .agg(count(lit(1)).cast("bigint").as("n_total"))
      .join(
        kept.groupBy(col("lang")).agg(count(lit(1)).cast("bigint").as("n_kept")),
        Seq("lang"),
        "left"
      )
      .na.fill(0L, Seq("n_kept"))
      .withColumn(
        "kept_bps",
        expr("CAST(floor(n_kept * 10000.0 / n_total) AS BIGINT)")
      )
      .withColumn(
        "planned_bps",
        when(col("lang") === "en", lit(10000L)).otherwise(lit((fixtureDefault * 10000).toLong))
      )
      .orderBy("lang")
  }

  /** Mixture DESIGN: derive per-stratum keep rates from a token
    * budget — the planning step upstream of [[stratifiedSample]]
    * (collect the plan's per-stratum rows — metadata-scale, like the
    * partition planner's bins — and feed them back as the rate map).
    * Exact integer arithmetic: rate_bps = min(10000,
    * budget·10000 div tokens), expected kept tokens under the
    * binomial-mean model = tokens·rate_bps div 10000.
    */
  def mixturePlan(
      docs: DataFrame,
      strataCol: String,
      tokens: Column,
      budgetPerStratum: Long
  ): DataFrame =
    docs
      .groupBy(col(strataCol).as("stratum"))
      .agg(
        count(lit(1)).cast("bigint").as("n_docs"),
        sum(tokens).cast("bigint").as("n_tokens")
      )
      .withColumn(
        "rate_bps",
        least(lit(10000L), expr(s"CAST($budgetPerStratum AS BIGINT) * 10000 div n_tokens"))
      )
      .withColumn("exp_kept_tokens", expr("n_tokens * rate_bps div 10000"))

  // 5000 sits between the largest stratum (en, ~11.8k tokens at sf0.01)
  // and the rest, so BOTH branches fire: en down-samples to ~4252 bps,
  // every other stratum caps at 10000
  private val planBudget = 5000L

  val mixturePlanQ: Q = (s, d) =>
    mixturePlan(
      documents(s, d),
      "lang",
      size(split(col("text"), " ")).cast("bigint"),
      planBudget
    ).orderBy("stratum")

  def queries: Map[String, Q] = Map(
    "mixture_sample" -> mixtureSample,
    "mixture_accounting" -> mixtureAccounting,
    "mixture_plan" -> mixturePlanQ,
    "holdout_split" -> holdoutSplitQ
  )

  private[ops] def drawSql: String =
    "CAST(" + Dedup.hex12ValSql("md5('mix|' || CAST(doc_id AS VARCHAR))", 1) + " AS BIGINT)"

  private[ops] def thresholdSql: String = {
    val en = (1.0 * drawMod).toLong
    val other = (fixtureDefault * drawMod).toLong
    s"CASE WHEN lang = 'en' THEN $en ELSE $other END"
  }

  def oracles: Map[String, String] = Map(
    "holdout_split" -> {
      val draw =
        "CAST(" + Dedup.hex12ValSql("md5('split|' || CAST(doc_id AS VARCHAR))", 1) + " AS BIGINT)"
      s"""WITH a AS (
         |  SELECT doc_id,
         |    CASE WHEN $draw % 10000 < 9800 THEN 'train'
         |         WHEN $draw % 10000 < 9900 THEN 'val'
         |         ELSE 'test' END AS split,
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
         |  FROM documents)
         |SELECT split,
         |  CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(n_tokens) AS BIGINT) AS tokens,
         |  CAST(bit_xor(doc_id) AS BIGINT) AS doc_xor
         |FROM a GROUP BY split ORDER BY split""".stripMargin
    },
    "mixture_plan" ->
      s"""WITH t AS (
         |  SELECT lang AS stratum, CAST(count(*) AS BIGINT) AS n_docs,
         |    CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
         |  FROM documents GROUP BY lang)
         |SELECT stratum, n_docs, n_tokens,
         |  CAST(least(10000, $planBudget * 10000 // n_tokens) AS BIGINT) AS rate_bps,
         |  CAST(n_tokens * least(10000, $planBudget * 10000 // n_tokens) // 10000 AS BIGINT) AS exp_kept_tokens
         |FROM t ORDER BY stratum""".stripMargin,
    "mixture_sample" ->
      s"""SELECT doc_id, lang, $drawSql AS draw
         |FROM documents
         |WHERE $drawSql < $thresholdSql
         |ORDER BY doc_id""".stripMargin,
    "mixture_accounting" ->
      s"""WITH kept AS (
         |  SELECT lang FROM documents WHERE $drawSql < $thresholdSql),
         |tot AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_total FROM documents GROUP BY lang),
         |k AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_kept FROM kept GROUP BY lang)
         |SELECT t.lang, t.n_total, coalesce(k.n_kept, 0) AS n_kept,
         |  CAST(floor(coalesce(k.n_kept, 0) * 10000.0 / t.n_total) AS BIGINT) AS kept_bps,
         |  CAST(CASE WHEN t.lang = 'en' THEN 10000 ELSE ${(fixtureDefault * 10000).toLong} END AS BIGINT) AS planned_bps
         |FROM tot t LEFT JOIN k ON k.lang = t.lang
         |ORDER BY t.lang""".stripMargin
  )
}
