package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Structured Streaming operators (SURVEY.md §3.2's Spark-native
  * shape): exactly-once incremental file discovery via the streaming
  * file source + checkpoint (replacing the reference's logging-table
  * discovery loop), watermarked windowed aggregation, and custom
  * session state via flatMapGroupsWithState.
  *
  * `Trigger.AvailableNow` gives the reference's batch-style "process
  * everything waiting, then stop" run mode; a continuous trigger is
  * the same pipeline. State (which files are done) lives in the
  * checkpoint — per-file error quarantine and modified-file reload
  * stay in graft.sync.FileStateSync (Spark's file source cannot
  * express them natively; SURVEY.md §7.4.4).
  */
object StreamingIngest {

  /** Incremental parquet-dir ingestion: every file is processed exactly
    * once across restarts (checkpointed); new files picked up per
    * trigger. maxFilesPerTrigger bounds batch size so executor memory
    * is stable regardless of backlog length — the property that
    * matters when a 100 TB backlog lands at once.
    */
  def ingestParquetDir(
      spark: SparkSession,
      srcDir: String,
      schema: StructType,
      checkpoint: String,
      outDir: String,
      maxFilesPerTrigger: Int = 16
  ): StreamingQuery =
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(srcDir)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .format("parquet")
      .option("path", outDir)
      .outputMode(OutputMode.Append)
      .start()

  /** Watermarked sliding-window counts per event type. Late events
    * beyond the watermark are dropped (bounded state); window state is
    * distributed by (window, event_type) — no skew pile-up because
    * event_type cardinality is multiplied by the window dimension.
    */
  def windowedEventCounts(
      events: DataFrame,
      watermarkDelay: String = "10 minutes",
      windowLen: String = "1 hour",
      slide: String = "30 minutes"
  ): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), windowLen, slide), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).as("total_value")
      )

  /** Streaming exact dedup with BOUNDED state: duplicates of a
    * content hash arriving within the watermark horizon are emitted
    * once, and the hash's state is dropped once the watermark passes
    * it. Without the watermark bound, dedup state on a continuous
    * 100 TB/day feed grows forever — this is the streaming analog of
    * graft.ops.Dedup.exactDedup, trading cross-horizon exactness for
    * O(horizon) state.
    */
  def dedupStream(
      docs: DataFrame,
      textCol: String,
      tsCol: String,
      watermarkDelay: String = "1 hour"
  ): DataFrame =
    docs
      .withColumn("content_hash", md5(col(textCol).cast("binary")))
      .withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark("content_hash")

  /** Streaming NEAR-dup flags with DISK-backed unbounded-horizon state:
    * each micro-batch probes the persisted MinHash signature index
    * (graft.ops.Dedup.incrementalDedup), appends its flags to `outDir`,
    * then appends its own signatures to the index so later batches see
    * it as history. Contrast with [[dedupStream]]: that is EXACT dedup
    * whose state is watermark-bounded executor memory; this is
    * NEAR-dup whose state is the signature index on disk — O(corpus
    * signatures), never executor-resident, no horizon. foreachBatch is
    * at-least-once under retries; a replayed batch re-flags the same
    * pairs (downstream consumers dedup on (new_id, ref_id)) and its
    * signature re-append is harmless to candidate generation (pairs
    * are DISTINCT'd) — the standard idempotency analysis foreachBatch
    * sinks need.
    */
  def nearDupFlagsStream(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      indexDir: String,
      outDir: String,
      checkpoint: String,
      minMatches: Int
  ): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        graft.ops.Dedup
          .incrementalDedup(batch.toDF(), idCol, textCol, indexDir, minMatches)
          .write
          .mode(SaveMode.Append)
          .parquet(outDir)
        graft.ops.Dedup.appendToMinhashIndex(batch.toDF(), idCol, textCol, indexDir)
      }
      .start()

  final case class Event(user_id: Long, ts_micros: Long, event_type: String, value: Double)
  final case class Session(
      user_id: Long,
      start_micros: Long,
      end_micros: Long,
      n_events: Long,
      closed: Boolean
  )

  private final case class SessionState(start: Long, end: Long, n: Long)

  /** Gap-based sessionization with explicit state + processing-time
    * timeout: the mapGroupsWithState pattern the reference has no
    * analog for (its delta sync is batch) but a streaming pipeline
    * needs. State per user is O(1) (no event buffering).
    */
  def sessionize(
      events: Dataset[Event],
      gapMicros: Long
  ): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append,
        GroupStateTimeout.NoTimeout
      ) { (userId: Long, evs: Iterator[Event], state: GroupState[SessionState]) =>
        // Batch-mode contract (tests/backfill): all events for the user
        // arrive in one call; emit every closed session + the open one.
        val sorted = evs.toSeq.sortBy(e => (e.ts_micros, e.event_type))
        val sessions = Seq.newBuilder[Session]
        var cur = state.getOption
        sorted.foreach { e =>
          cur match {
            case Some(st) if e.ts_micros - st.end <= gapMicros =>
              cur = Some(st.copy(end = e.ts_micros, n = st.n + 1))
            case Some(st) =>
              sessions += Session(userId, st.start, st.end, st.n, closed = true)
              cur = Some(SessionState(e.ts_micros, e.ts_micros, 1))
            case None =>
              cur = Some(SessionState(e.ts_micros, e.ts_micros, 1))
          }
        }
        cur.foreach { st =>
          state.update(st)
          sessions += Session(userId, st.start, st.end, st.n, closed = false)
        }
        sessions.result().iterator
      }
  }
}
