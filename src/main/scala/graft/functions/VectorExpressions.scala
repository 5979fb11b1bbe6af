package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Dot product of two float vectors, accumulated in double — a native
  * Catalyst expression with full codegen.
  *
  * The higher-order-function form (`aggregate(zip_with(...))`) is
  * interpreted per row and allocates per element; this compiles to a
  * tight primitive loop inside whole-stage codegen. Semantics match the
  * HOF form exactly: each float is widened to double before the
  * multiply, accumulation is a sequential left fold, a null element or
  * mismatched lengths yield null (zip_with pads with nulls, which
  * nulls the fold).
  */
case class DotProductFloat(left: Expression, right: Expression)
    extends BinaryExpression {

  // AbstractDataType/ExpectsInputTypes are private[sql]; validate here.
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(t: DataType): Boolean = t match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_dot expects two array<float> arguments, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    var acc = 0.0
    var i = 0
    val n = x.numElements()
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductFloat =
    copy(left = newLeft, right = newRight)
}

/** Runtime registration of the graft native functions. */
object GraftFunctions {
  val dotInfo = new ExpressionInfo(classOf[DotProductFloat].getName, "graft_dot")

  private[functions] val dotBuilder: Seq[Expression] => Expression = { children =>
    require(children.size == 2,
      s"graft_dot expects exactly 2 arguments, got ${children.size}")
    DotProductFloat(children(0), children(1))
  }

  /** Idempotently register on a live (classic) session. */
  def register(spark: SparkSession): Unit = spark match {
    case s: org.apache.spark.sql.classic.SparkSession =>
      s.sessionState.functionRegistry.registerFunction(
        FunctionIdentifier("graft_dot"), dotInfo, dotBuilder)
    case _ => // non-classic session (e.g. connect): extensions config required
  }
}

/** `spark.sql.extensions=graft.functions.GraftExtensions` installs the
  * native functions at session build time. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectFunction((FunctionIdentifier("graft_dot"), GraftFunctions.dotInfo,
      GraftFunctions.dotBuilder))
}
