package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructType}

/** JSONL (one JSON object per line) corpus ingestion with per-line
  * quarantine — the landing format most raw text corpora actually
  * arrive in, and the JSON twin of [[CsvBatchLoader]]'s bounded-
  * failure-domain loading (the reference's per-IMPORT error recording,
  * s3_to_exasol.sql:294-317, re-expressed as Spark's PERMISSIVE-mode
  * corrupt-record column instead of a per-batch retry loop).
  *
  * Quarantine semantics: a line that fails to parse as JSON — or
  * parses but cannot satisfy the schema (type mismatch) — lands in
  * the corrupt relation VERBATIM (the raw line, for repair/forensics)
  * and contributes nothing to the good relation. The split is one
  * pass: Spark populates `_corrupt_record` during the scan; the two
  * filters share the cached parse (Spark refuses a raw filter on the
  * internal corrupt column precisely because re-parsing could
  * disagree — the cache is load-bearing, not an optimization, and it
  * is batch-sized: callers land one batch at a time).
  *
  * Scale shape: JSONL is splittable by line, so a 100 TB landing dir
  * parallelizes across files AND within files natively; the explicit
  * schema keeps the scan one-pass (no inference pass over the corpus)
  * and projects only the declared columns.
  */
object JsonlLoader {

  private val corruptCol = "_graft_corrupt"

  /** One-pass good/corrupt split of a JSONL path under an explicit
    * schema. Returns (good rows, corrupt raw lines); the shared parse
    * is cached — call [[release]] with the returned handle when both
    * sides are consumed.
    */
  def readWithQuarantine(
      spark: SparkSession,
      path: String,
      schema: StructType
  ): (DataFrame, DataFrame, DataFrame) = {
    val withCorrupt = schema.add(corruptCol, StringType)
    val raw = spark.read
      .schema(withCorrupt)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corruptCol)
      .json(path)
      .cache()
    val good = raw.filter(col(corruptCol).isNull).drop(corruptCol)
    val corrupt = raw.filter(col(corruptCol).isNotNull).select(col(corruptCol).as("raw_line"))
    (good, corrupt, raw)
  }

  /** Release the cached parse returned by [[readWithQuarantine]]. */
  def release(raw: DataFrame): Unit = { raw.unpersist(); () }

  /** REPAIR loop over quarantined lines — the retry half of the
    * reference's per-IMPORT error recording (s3_to_exasol.sql:294-317
    * re-runs failed files after the operator fixes the cause; here
    * the fix is a column expression over the raw line — strip a BOM,
    * cut a trailing comma, regex out a control character — applied
    * fleet-wide in one pass). Each quarantined line is transformed by
    * `fix` and re-parsed under the SAME schema/corrupt-column
    * semantics as the original scan (from_json in PERMISSIVE mode
    * with the corrupt-record column, so malformed JSON AND type
    * mismatches both stay quarantined — the reader's exact contract).
    *
    * Returns (repaired rows in the good schema, residue as the
    * ORIGINAL raw lines — not the fixed attempt, so forensics and a
    * later repair round always see the verbatim landing bytes).
    * Counts reconcile by construction: every input line lands in
    * exactly one side. Union the repaired rows with the first pass's
    * good relation and keep the residue as the next round's
    * quarantine — a fixed-point loop terminates because the residue
    * only shrinks. Scale shape: quarantine-sized (failure-domain-
    * sized, not corpus-sized), one map-side pass, no shuffle.
    */
  def repairQuarantine(
      corrupt: DataFrame, // (raw_line)
      schema: StructType,
      fix: org.apache.spark.sql.Column => org.apache.spark.sql.Column
  ): (DataFrame, DataFrame) = {
    val withCorrupt = schema.add(corruptCol, StringType)
    val opts = Map("mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> corruptCol)
    val parsed = corrupt
      .withColumn("__parsed", from_json(fix(col("raw_line")), withCorrupt, opts))
      // a fixed line that is not even a JSON object parses to a NULL
      // struct — quarantined like a corrupt-column hit
      .withColumn(
        "__ok",
        col("__parsed").isNotNull && col(s"__parsed.$corruptCol").isNull
      )
    val repaired = parsed
      .filter(col("__ok"))
      .select(schema.fieldNames.map(f => col(s"__parsed.$f")): _*)
    val residue = parsed.filter(!col("__ok")).select(col("raw_line"))
    (repaired, residue)
  }
}
