package graft.spark

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.{expr, sqrt}
import org.apache.spark.sql.types._

/** `float_vec_dot(a, b)` — dot product of two `array<float>` columns as a
  * DOUBLE, with whole-stage codegen (`doGenCode` emits a primitive float
  * loop over the ArrayData, no boxing).
  *
  * Rationale (SURVEY-level): Spark's higher-order functions
  * (`zip_with`/`aggregate`) are interpreted per element — for a 64-dim
  * embedding that is ~130 lambda invocations with boxed accumulators per
  * pair, the dominant cost of the ANN/near-dup operators. A native
  * codegen'd expression is the idiomatic Catalyst escape hatch
  * (preferred over a Scala UDF, which would break codegen and add
  * serialization).
  */
case class FloatVecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = left.nullable || right.nullable

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"float_vec_dot expects (array<float>, array<float>), got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      code"""
        int $n = Math.min($a.numElements(), $b.numElements());
        double $acc = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          $acc += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
        }
        ${ev.value} = $acc;
      """.toString
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatVecDot =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "float_vec_dot"
}

object VectorExpressions {
  val info = new ExpressionInfo(classOf[FloatVecDot].getName, "float_vec_dot")

  val builder: Seq[Expression] => Expression = { args =>
    require(args.length == 2, "float_vec_dot(a, b) takes 2 arguments")
    FloatVecDot(args.head, args(1))
  }

  /** Register `float_vec_dot` on a session (idempotent). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("float_vec_dot"), info, builder)

  /** Column helper: dot(a, b) as DOUBLE (codegen'd); requires register().
    * Takes column-name/expression strings (the ops layer style).
    */
  def vecDot(a: String, b: String): Column = expr(s"float_vec_dot($a, $b)")

  /** Column helper: L2 norm of an array<float> column. */
  def vecNorm(a: String): Column = sqrt(vecDot(a, a))
}
