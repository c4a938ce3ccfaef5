package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native codegen dot product over two float-array columns.
  *
  * The similarity family's hot loop is O(pairs) dot products. A Scala UDF
  * pays per-call ser/de: each ArrayType(Float) column is converted to an
  * immutable Seq[Float] (boxing every element) before the lambda runs —
  * measured as the dominant cost of q_dedup_embcos at sf0.1, dwarfing the
  * 64 multiply-adds of actual work. This Expression reads the unsafe
  * ArrayData in place inside whole-stage codegen: no allocation, no boxing,
  * and the loop JITs with the surrounding operator pipeline.
  *
  * Determinism: identical double arithmetic to the UDF/SQL twins — ascending
  * sequential fold of double products — so scores stay bit-identical to the
  * DuckDB oracle formulations (integer 1e-4 encodings preserved exactly).
  * Norms reuse it as sqrt(float_dot(v, v)) — the same sum-of-squares fold.
  *
  * Null handling: a null ARRAY yields null (BinaryExpression null-safety);
  * null ELEMENTS read as 0.0 (unsafe array slots are zeroed) and so
  * contribute nothing to the sum — fine for embeddings, which have no null
  * elements; callers with nullable elements should coalesce first.
  */
case class FloatDot(left: Expression, right: Expression)
    extends BinaryExpression {

  // NB: not ExpectsInputTypes — its Seq[AbstractDataType] signature is
  // private[sql], so the type contract is enforced here instead.
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"graft_float_dot requires two array<float> arguments, got $l / $r")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_float_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0
    var i = 0
    while (i < n) {
      dot += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $dot += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = $dot;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatDot =
    copy(left = newLeft, right = newRight)
}

object FloatDot {
  /** Register `graft_float_dot` in the session's function registry so query
    * builders can use it via `expr(...)`. Idempotent. */
  def register(s: SparkSession): Unit =
    s.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_float_dot",
      { exprs: Seq[Expression] =>
        require(exprs.length == 2, "graft_float_dot takes exactly 2 arguments")
        FloatDot(exprs.head, exprs(1))
      },
      "built-in")
}
