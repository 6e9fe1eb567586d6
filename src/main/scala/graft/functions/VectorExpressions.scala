package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.sql.SparkSessionExtensions

/** Native Catalyst expression for the vector hot path.
  *
  * The higher-order-function form
  * `aggregate(zip_with(a, b, (x,y) -> x*y), 0D, (acc,z) -> acc+z)` is
  * evaluated interpretively (one closure call + boxed Double per element),
  * which dominates the near-dup pair join where the expression runs
  * O(pairs·64) times. This expression does the same left-to-right
  * double-precision accumulation — bit-identical results — but
  * participates in whole-stage codegen: the generated Java is a tight
  * primitive loop, no boxing, no closures.
  *
  * Preference order per the charter: compose built-ins where semantics
  * allow (j3/j9 do); drop to a custom Expression only where the built-in
  * form is the measured bottleneck (the O(n²) pair join) — this is that
  * case.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType, _), ArrayType(FloatType, _)) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"vec_dot expects (array<float>, array<float>), got (${left.dataType}, ${right.dataType})")
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object VectorExpressions {
  private val ident = FunctionIdentifier("vec_dot")
  private val info = new ExpressionInfo(classOf[DotProduct].getName, "vec_dot")
  private val builder: Seq[Expression] => Expression = es => DotProduct(es(0), es(1))

  /** Imperative registration — used by query functions (idempotent). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(ident, info, builder)

  /** `spark.sql.extensions`-style injection for cluster deployments. */
  class GraftExtensions extends (SparkSessionExtensions => Unit) {
    override def apply(ext: SparkSessionExtensions): Unit =
      ext.injectFunction((ident, info, builder))
  }
}
