package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** The `spark.sql.extensions` entry point — how a CLUSTER adopts this
  * library without a single line of driver code:
  *
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  * }}}
  *
  * registers the engine's SQL surface (the fused `cosine_sim`
  * Catalyst expression and the surfaced Bloom build/probe pair) into
  * EVERY session of the application, pure-SQL clients included —
  * `SELECT cosine_sim(a.embedding, b.embedding)` works from a
  * Thrift/Connect session that never touches the Scala API.
  * [[graft.functions.GraftFunctions.register]] stays as the
  * programmatic per-session route (what the library's own operators
  * call); both paths bind the same expressions.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(
      (
        FunctionIdentifier("cosine_sim"),
        new ExpressionInfo(classOf[graft.functions.CosineSimilarity].getName, "cosine_sim"),
        (exprs: Seq[Expression]) => graft.functions.CosineSimilarity(exprs(0), exprs(1))
      )
    )
    ext.injectFunction(
      (
        FunctionIdentifier("bloom_filter_agg"),
        new ExpressionInfo(
          classOf[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate].getName,
          "bloom_filter_agg"
        ),
        (exprs: Seq[Expression]) =>
          new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
            exprs(0),
            exprs(1),
            exprs(2)
          )
      )
    )
    ext.injectFunction(
      (
        FunctionIdentifier("might_contain"),
        new ExpressionInfo(
          classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain].getName,
          "might_contain"
        ),
        (exprs: Seq[Expression]) =>
          org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(exprs(0), exprs(1))
      )
    )
  }
}
