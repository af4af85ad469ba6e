package graft.sync

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental file-state reconciliation (SURVEY.md §2.D #48;
  * reference s3_to_exasol.sql:205-254): a state table keyed by file
  * with (last_modified, status) is MERGEd against a fresh listing —
  * new files → 'waiting for insertion'; files with a newer
  * last_modified or a non-done status → 'waiting for update'
  * (modified-file reprocessing + per-file error quarantine, the two
  * behaviors Spark's streaming file source does not give natively);
  * untouched done files stay done. Files that vanished from the
  * listing are kept in state (quarantine history).
  *
  * One full-outer join on the file key — state tables are
  * file-count-sized (millions, not data-sized), so this is a narrow
  * cheap job even for a 100 TB lake.
  */
object FileStateSync {

  val StatusNew = "waiting for insertion"
  val StatusUpdate = "waiting for update"
  val StatusDone = "done"

  /** listing: (file_name, last_modified) — the discovery scan.
    * state: (file_name, last_modified, status) — the persisted log.
    * Returns the new state with a decision column.
    */
  def reconcile(listing: DataFrame, state: DataFrame): DataFrame = {
    val l = listing.select(col("file_name").as("l_file"), col("last_modified").as("l_lm"))
    val s = state.select(col("file_name").as("s_file"), col("last_modified").as("s_lm"), col("status").as("s_status"))
    l.join(s, col("l_file") === col("s_file"), "full_outer")
      .select(
        coalesce(col("l_file"), col("s_file")).as("file_name"),
        coalesce(col("l_lm"), col("s_lm")).as("last_modified"),
        when(col("s_file").isNull, StatusNew)
          .when(col("l_file").isNull, col("s_status")) // vanished: keep history
          .when(col("l_lm") > col("s_lm"), StatusUpdate) // modified since last load
          .when(col("s_status") =!= StatusDone, StatusUpdate) // error quarantine retry
          .otherwise(StatusDone)
          .as("status")
      )
  }

  /** force_reload mode (reference s3_to_exasol.sql:227-233): the
    * reference TRUNCATEs the state (logging) table AND the target
    * table, then merges the fresh listing into the now-empty state —
    * so every listed file comes back 'waiting for insertion', and
    * vanished files' quarantine history is dropped with the state.
    * Expressed here as reconcile against the truncated state
    * (state.limit(0) — one metadata-only plan node, no scan); the
    * caller pairs it with truncating the target before the batch loop
    * (QuarantineIntegrationSpec drives that end to end).
    */
  def reconcile(listing: DataFrame, state: DataFrame, forceReload: Boolean): DataFrame =
    reconcile(listing, if (forceReload) state.limit(0) else state)
}
