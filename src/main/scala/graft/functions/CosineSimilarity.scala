package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Fused cosine similarity over two double arrays — a native Catalyst
  * expression with whole-stage codegen (SURVEY.md §7.3: custom
  * Catalyst work is reserved for the similarity extensions; built-ins
  * can only express this as three separate `aggregate(zip_with(...))`
  * folds, which materialize an intermediate array per row and walk
  * the vectors three times; this computes dot product and both norms
  * in ONE loop with no allocation).
  *
  * NULL semantics: null if either input is null or either vector has
  * zero norm. Vectors of unequal length are compared over the common
  * prefix (callers validate dimensions upstream).
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression
    with ExpectsInputTypes {

  // return type inferred: AbstractDataType is private[sql] in Spark 4
  override def inputTypes = Seq(ArrayType(DoubleType), ArrayType(DoubleType))

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "cosine_sim"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0
    var nx = 0.0
    var ny = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getDouble(i)
      val yi = y.getDouble(i)
      dot += xi * yi
      nx += xi * xi
      ny += yi * yi
      i += 1
    }
    val denom = math.sqrt(nx) * math.sqrt(ny)
    if (denom == 0.0) null else (dot / denom): java.lang.Double
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val leftGen = left.genCode(ctx)
    val rightGen = right.genCode(ctx)
    val n = ctx.freshName("n")
    val i = ctx.freshName("i")
    val dot = ctx.freshName("dot")
    val nx = ctx.freshName("nx")
    val ny = ctx.freshName("ny")
    val xi = ctx.freshName("xi")
    val yi = ctx.freshName("yi")
    val denom = ctx.freshName("denom")
    ev.copy(code = code"""
      ${leftGen.code}
      ${rightGen.code}
      boolean ${ev.isNull} = true;
      double ${ev.value} = 0.0;
      if (!${leftGen.isNull} && !${rightGen.isNull}) {
        int $n = java.lang.Math.min(${leftGen.value}.numElements(), ${rightGen.value}.numElements());
        double $dot = 0.0; double $nx = 0.0; double $ny = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          double $xi = ${leftGen.value}.getDouble($i);
          double $yi = ${rightGen.value}.getDouble($i);
          $dot += $xi * $yi; $nx += $xi * $xi; $ny += $yi * $yi;
        }
        double $denom = java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny);
        if ($denom != 0.0) {
          ${ev.isNull} = false;
          ${ev.value} = $dot / $denom;
        }
      }
    """)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression
  ): Expression = copy(left = newLeft, right = newRight)
}

/** Registration for the engine's custom functions: either call
  * [[GraftFunctions.register]] on a session, or configure
  * `spark.sql.extensions=graft.functions.GraftExtensions` so every
  * session (incl. thrift/connect servers) gets them at build time.
  */
object GraftFunctions {
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_sim",
      (exprs: Seq[Expression]) => CosineSimilarity(exprs(0), exprs(1)),
      "built-in"
    )
    // Spark ships Bloom-filter build/probe as INTERNAL expressions
    // (used by its own runtime row-level join filtering) without SQL
    // registration; surfacing them gives the engine a distributed
    // Bloom build (partial aggregation, no driver collect — unlike
    // DataFrameStatFunctions.bloomFilter) and a codegen'd probe.
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bloom_filter_agg",
      (exprs: Seq[Expression]) =>
        new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
          exprs(0),
          exprs(1),
          exprs(2)
        ),
      "built-in"
    )
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "might_contain",
      (exprs: Seq[Expression]) =>
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(exprs(0), exprs(1)),
      "built-in"
    )
  }
}

class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit =
    ext.injectFunction(
      (
        org.apache.spark.sql.catalyst.FunctionIdentifier("cosine_sim"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[CosineSimilarity].getName,
          "cosine_sim"
        ),
        (exprs: Seq[Expression]) => CosineSimilarity(exprs(0), exprs(1))
      )
    )
}
