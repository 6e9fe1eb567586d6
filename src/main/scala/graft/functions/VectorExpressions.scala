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

/** Native codegen form of `aggregate(emb, 0D, (a, x) -> a + CAST(x AS
  * DOUBLE))` — the all-ones-query numerator of the shared cosine column.
  * Identical left-to-right double accumulation (float widened exactly),
  * so bit-identical to the HOF form; no closures, no boxing. */
case class VecSum(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"vec_sum expects array<float>, got $t")
  }

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    var s = 0.0
    var i = 0
    while (i < n) { s += a.getFloat(i).toDouble; i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = $a.numElements();
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += (double) $a.getFloat($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): VecSum =
    copy(child = newChild)
}

/** Native Catalyst expression for the hyperplane-LSH signature pass.
  *
  * Replaces the nested higher-order-function form
  * `aggregate(sequence(0, P-1), 0L, (acc, k) -> acc + CASE WHEN
  *   aggregate(sequence(1, 64), 0D, (sm, i) -> sm +
  *     CAST(element_at(emb, i) AS DOUBLE) *
  *     element_at(element_at(planes, off + k + 1), i)) >= 0
  *   THEN CAST(power(2, k) AS BIGINT) ELSE 0 END)`
  * which evaluates P·dim interpreted lambda calls (boxed Doubles) per row —
  * the graphAnnBuild/j31 signature pass runs it over every corpus vector.
  * This expression performs the IDENTICAL left-to-right double-precision
  * accumulation per plane (float widened to double exactly, plane weights
  * already double) and the identical `>= 0` sign decision with bit k set
  * via `1L << k` (== CAST(power(2,k) AS BIGINT) exactly for k ≤ 62), so
  * results are bit-identical to the HOF form — but it participates in
  * whole-stage codegen: a tight primitive nested loop, no closures.
  *
  * `offset`/`count` must be foldable ints (they are structural literals —
  * which plane table slice and how many planes), pinned at analysis time.
  */
case class HyperplaneSig(emb: Expression, planes: Expression,
    offset: Expression, count: Expression) extends Expression {

  override def children: Seq[Expression] = Seq(emb, planes, offset, count)
  override def dataType: DataType = LongType
  override def nullable: Boolean = emb.nullable || planes.nullable
  override def foldable: Boolean = children.forall(_.foldable)

  override def checkInputDataTypes(): TypeCheckResult =
    (emb.dataType, planes.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(ArrayType(DoubleType, _), _))
          if offset.foldable && offset.dataType == IntegerType &&
            count.foldable && count.dataType == IntegerType =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "hp_sig expects (array<float>, array<array<double>>, int literal, int literal), " +
          s"got (${emb.dataType}, ${planes.dataType}, $offset, $count)")
    }

  private lazy val offsetVal: Int = offset.eval().asInstanceOf[Int]
  private lazy val countVal: Int = count.eval().asInstanceOf[Int]

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val e = emb.eval(input)
    if (e == null) return null
    val p = planes.eval(input)
    if (p == null) return null
    val ea = e.asInstanceOf[ArrayData]
    val pa = p.asInstanceOf[ArrayData]
    var acc = 0L
    var k = 0
    while (k < countVal) {
      val plane = pa.getArray(offsetVal + k)
      val n = math.min(ea.numElements(), plane.numElements())
      var sm = 0.0
      var i = 0
      while (i < n) {
        sm += ea.getFloat(i).toDouble * plane.getDouble(i)
        i += 1
      }
      if (sm >= 0) acc += (1L << k)
      k += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val embCode = emb.genCode(ctx)
    val plCode = planes.genCode(ctx)
    val acc = ctx.freshName("acc")
    val k = ctx.freshName("k")
    val i = ctx.freshName("i")
    val sm = ctx.freshName("sm")
    val pl = ctx.freshName("pl")
    val n = ctx.freshName("n")
    val ad = "org.apache.spark.sql.catalyst.util.ArrayData"
    ev.copy(code =
      code"""
        ${embCode.code}
        ${plCode.code}
        boolean ${ev.isNull} = ${embCode.isNull} || ${plCode.isNull};
        long ${ev.value} = 0L;
        if (!${ev.isNull}) {
          long $acc = 0L;
          for (int $k = 0; $k < $countVal; $k++) {
            $ad $pl = ${plCode.value}.getArray($offsetVal + $k);
            int $n = java.lang.Math.min(${embCode.value}.numElements(), $pl.numElements());
            double $sm = 0.0;
            for (int $i = 0; $i < $n; $i++) {
              $sm += (double) ${embCode.value}.getFloat($i) * $pl.getDouble($i);
            }
            if ($sm >= 0) $acc += (1L << $k);
          }
          ${ev.value} = $acc;
        }""")
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HyperplaneSig =
    copy(emb = newChildren(0), planes = newChildren(1),
      offset = newChildren(2), count = newChildren(3))
}

object VectorExpressions {
  private val ident = FunctionIdentifier("vec_dot")
  private val info = new ExpressionInfo(classOf[DotProduct].getName, "vec_dot")
  private val builder: Seq[Expression] => Expression = es => DotProduct(es(0), es(1))

  private val sigIdent = FunctionIdentifier("hp_sig")
  private val sigInfo = new ExpressionInfo(classOf[HyperplaneSig].getName, "hp_sig")
  private val sigBuilder: Seq[Expression] => Expression =
    es => HyperplaneSig(es(0), es(1), es(2), es(3))

  private val sumIdent = FunctionIdentifier("vec_sum")
  private val sumInfo = new ExpressionInfo(classOf[VecSum].getName, "vec_sum")
  private val sumBuilder: Seq[Expression] => Expression = es => VecSum(es(0))

  /** Imperative registration — used by query functions (idempotent). */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
    spark.sessionState.functionRegistry.registerFunction(sigIdent, sigInfo, sigBuilder)
    spark.sessionState.functionRegistry.registerFunction(sumIdent, sumInfo, sumBuilder)
  }

  /** `spark.sql.extensions`-style injection for cluster deployments. */
  class GraftExtensions extends (SparkSessionExtensions => Unit) {
    override def apply(ext: SparkSessionExtensions): Unit = {
      ext.injectFunction((ident, info, builder))
      ext.injectFunction((sigIdent, sigInfo, sigBuilder))
      ext.injectFunction((sumIdent, sumInfo, sumBuilder))
    }
  }
}
