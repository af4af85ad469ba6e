package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType
import graft.core.PartitionPlanner
import graft.core.PartitionPlanner.SourcePartition

/** Batched CSV loading — the Spark analog of the reference's
  * `parallel_connections`-files-per-IMPORT batching
  * (s3_to_exasol.sql:257-318, azure_blob_storage_to_exasol.sql:186-243).
  *
  * Spark parallelizes across files natively, so a single
  * `spark.read.csv(all paths)` is already the fast path; batching
  * stays relevant for (a) bounded-failure-domain loads — one failed
  * batch quarantines k files, not the whole run (pairs with
  * FileStateSync's per-file status) — and (b) size-balanced work
  * groups, which reuse the greedy bin-packing planner with file size
  * as the weight.
  */
object CsvBatchLoader {

  /** Size-balanced batches of at most `parallelism` groups. */
  def planBatches(files: Seq[FileListing.ListedFile], parallelism: Int): Vector[Vector[String]] =
    PartitionPlanner
      .binPack(files.map(f => SourcePartition(f.file_name, f.size_bytes)), parallelism)
      .map(_.map(_.name))

  /** Load one batch (column-count projection via the explicit schema —
    * the reference's `(1..n)` column range, s3_to_exasol.sql:276-287).
    */
  def loadBatch(
      spark: SparkSession,
      dir: String,
      batch: Seq[String],
      schema: StructType,
      header: Boolean = true
  ): DataFrame =
    spark.read
      .schema(schema)
      .option("header", header.toString)
      .csv(batch.map(f => s"$dir/$f"): _*)

  /** Load all batches, returning (batch index, file names, DataFrame)
    * so the caller can execute per batch with per-batch status (the
    * reference's per-IMPORT error recording, s3_to_exasol.sql:294-317).
    */
  def loadAll(
      spark: SparkSession,
      dir: String,
      files: Seq[FileListing.ListedFile],
      schema: StructType,
      parallelism: Int,
      header: Boolean = true
  ): Seq[(Int, Seq[String], DataFrame)] =
    planBatches(files, parallelism).zipWithIndex.map { case (batch, i) =>
      (i, batch, loadBatch(spark, dir, batch, schema, header))
    }
}
