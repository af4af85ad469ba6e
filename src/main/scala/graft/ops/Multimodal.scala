package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads are opaque
  * `BinaryType` columns with typed metadata. The Spark-side machinery
  * (schema, batching, partition sizing, feature extraction signature)
  * is real; the actual media *decode* is behind [[BinaryDecoder]] and
  * stubbed deterministically (no codec libraries exist in this
  * container — see the builder prompt).
  *
  * Scale notes: binary payloads dominate row size, so the operators
  * (a) never shuffle payload bytes — metadata is extracted first and
  * payloads dropped before any wide operation; and (b) decode runs in
  * `mapPartitions` so a real decoder amortizes per-partition
  * initialization (model load, codec context) exactly like a Pandas
  * UDF batch would.
  */
object Multimodal {
  type Q = (SparkSession, String) => DataFrame
  import Fixtures._

  /** A decoded media item: dimensions + a small feature vector. */
  final case class DecodedMedia(width: Int, height: Int, nFrames: Int, feature: Array[Float])

  /** The decode seam. A real implementation would wrap an image/audio
    * codec; the stub derives deterministic pseudo-metadata from the
    * leading bytes so the plumbing is testable end to end.
    */
  trait BinaryDecoder extends Serializable {
    def decode(payload: Array[Byte]): DecodedMedia
  }

  /** STUB decoder — NOT a real codec. Deterministic fake: dimensions
    * from leading bytes, feature = normalized byte histogram moments.
    */
  object StubDecoder extends BinaryDecoder {
    def decode(payload: Array[Byte]): DecodedMedia = {
      val b0 = if (payload.nonEmpty) payload(0) & 0xff else 0
      val b1 = if (payload.length > 1) payload(1) & 0xff else 0
      val mean = if (payload.isEmpty) 0f else payload.map(_ & 0xff).sum.toFloat / payload.length
      DecodedMedia(width = 16 + b0, height = 16 + b1, nFrames = 1 + payload.length % 8, Array(mean, payload.length.toFloat))
    }
  }

  final case class MediaRow(doc_id: Long, payload: Array[Byte])
  final case class MediaFeatures(doc_id: Long, width: Int, height: Int, n_frames: Int, feat_mean: Float, feat_len: Float)

  /** Decode + featurize via mapPartitions (per-partition decoder
    * amortization); payload is dropped on output so downstream
    * shuffles never carry media bytes.
    */
  def decodeFeatures(media: Dataset[MediaRow], decoder: BinaryDecoder): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val m = decoder.decode(r.payload)
        MediaFeatures(r.doc_id, m.width, m.height, m.nFrames, m.feature(0), m.feature(1))
      }
    }
  }

  /** Documents-as-media: text bytes stand in for payloads. */
  def mediaTable(s: SparkSession, d: String): Dataset[MediaRow] = {
    import s.implicits._
    documents(s, d)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[MediaRow]
  }

  /** Pure-SQL metadata extraction over the binary column (byte length,
    * content hash, leading-bytes hex) — the part expressible in both
    * engines and oracle-checked.
    */
  val multimodalMeta: Q = (s, d) =>
    documents(s, d)
      .withColumn("payload", col("text").cast("binary"))
      .select(
        col("doc_id"),
        length(col("payload")).cast("bigint").as("n_bytes"),
        md5(col("payload")).as("content_md5"),
        hex(expr("substring(payload, 1, 8)")).as("head_hex")
      )
      .orderBy("doc_id")

  def queries: Map[String, Q] = Map(
    "multimodal_meta" -> multimodalMeta
  )

  def oracles: Map[String, String] = Map(
    "multimodal_meta" ->
      """SELECT doc_id,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  md5(text) AS content_md5,
        |  hex(encode(substr(text, 1, 8))) AS head_hex
        |FROM documents ORDER BY doc_id""".stripMargin
  )
}
