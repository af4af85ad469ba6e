package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DoubleType}

class CosineSimilaritySpec extends SparkSpec {
  import spark.implicits._

  private def viaBuiltins = expr(
    "aggregate(zip_with(a, b, (x, y) -> x * y), 0D, (acc, x) -> acc + x) / " +
      "(sqrt(aggregate(a, 0D, (acc, x) -> acc + x * x)) * sqrt(aggregate(b, 0D, (acc, x) -> acc + x * x)))"
  )

  test("codegen path matches the aggregate/zip_with formulation bit-for-bit") {
    GraftFunctions.register(spark)
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(500)((Array.fill(64)(rnd.nextDouble() - 0.5), Array.fill(64)(rnd.nextDouble() - 0.5)))
    val df = rows.toDF("a", "b")
    val got = df.select(expr("cosine_sim(a, b)").as("c"), viaBuiltins.as("e")).collect()
    got.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) == java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("interpreted eval agrees with codegen and handles edge cases") {
    val e = CosineSimilarity(
      Literal.create(ArrayData.toArrayData(Array(1.0, 0.0)), ArrayType(DoubleType)),
      Literal.create(ArrayData.toArrayData(Array(1.0, 0.0)), ArrayType(DoubleType))
    )
    assert(e.eval(null).asInstanceOf[Double] == 1.0)
    // zero-norm vector → null, not NaN
    val z = CosineSimilarity(
      Literal.create(ArrayData.toArrayData(Array(0.0, 0.0)), ArrayType(DoubleType)),
      Literal.create(ArrayData.toArrayData(Array(1.0, 0.0)), ArrayType(DoubleType))
    )
    assert(z.eval(null) == null)
    // null input → null
    val n = CosineSimilarity(Literal.create(null, ArrayType(DoubleType)), Literal.create(null, ArrayType(DoubleType)))
    assert(n.eval(null) == null)
  }

  test("orthogonal and opposite vectors") {
    GraftFunctions.register(spark)
    val df = Seq(
      (Array(1.0, 0.0), Array(0.0, 1.0)), // orthogonal
      (Array(1.0, 2.0), Array(-1.0, -2.0)) // opposite
    ).toDF("a", "b")
    val out = df.select(round(expr("cosine_sim(a, b)"), 9).as("c")).collect().map(_.getDouble(0))
    assert(out(0) == 0.0 && out(1) == -1.0)
  }

  test("whole-stage codegen actually compiles the expression (no fallback)") {
    GraftFunctions.register(spark)
    // non-local source so the projection isn't constant-folded away;
    // arrays built with array() (codegen'd) — a higher-order builder
    // like transform() is CodegenFallback and would break the stage
    // regardless of this expression
    val mk = (off: Int) => (0 to 9).map(i => s"cast(id + ${i + off} as double)").mkString(", ")
    val df = spark
      .range(100)
      .selectExpr(s"array(${mk(0)}) as a", s"array(${mk(1)}) as b")
      .select(expr("cosine_sim(a, b)").as("c"))
    // the `*(n)` prefix on Project marks whole-stage-codegen membership;
    // assert structurally on the plan tree
    val codegenStages = df.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(codegenStages.exists(_.toString.contains("cosine_sim")))
    val vals = df.collect().map(_.getDouble(0))
    assert(vals.length == 100 && vals.forall(v => v > 0.9 && v <= 1.0))
  }
}
