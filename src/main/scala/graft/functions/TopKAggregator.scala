package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Exact top-k frequent values as a typed Aggregator (the custom-
  * aggregate surface SURVEY.md §2.H reserves for the BASELINE
  * extensions): per group, ONE aggregation produces the k most
  * frequent tokens — map-side partial counting merges count maps, so
  * only per-partition maps shuffle instead of every token row, and no
  * second window-function shuffle is needed for the ranking.
  *
  * Exactness note: buffers hold full per-group count maps (token
  * vocabulary per group), which is fine for natural-language
  * vocabularies; a space-bounded variant would swap the buffer for a
  * SpaceSaving/CMS sketch behind the same interface.
  *
  * Determinism: ties break by token (count desc, token asc).
  */
class TopKAggregator(k: Int)
    extends Aggregator[String, Map[String, Long], Seq[(String, Long)]] {

  override def zero: Map[String, Long] = Map.empty

  override def reduce(buf: Map[String, Long], token: String): Map[String, Long] =
    buf.updated(token, buf.getOrElse(token, 0L) + 1L)

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val (big, small) = if (a.size >= b.size) (a, b) else (b, a)
    small.foldLeft(big) { case (acc, (t, c)) => acc.updated(t, acc.getOrElse(t, 0L) + c) }
  }

  override def finish(buf: Map[String, Long]): Seq[(String, Long)] =
    buf.toSeq.sortBy { case (t, c) => (-c, t) }.take(k)

  override def bufferEncoder: Encoder[Map[String, Long]] =
    Encoders.kryo[Map[String, Long]]

  override def outputEncoder: Encoder[Seq[(String, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}
