package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, NullType}

/** Native Catalyst expression: exact dot product of two float-array
  * columns, accumulated strictly left-to-right in double.
  *
  * Why a custom Expression (SURVEY.md §7.3 preference order): the same
  * semantics via `aggregate(zip_with(...))` runs the lambda through
  * interpreted per-element dispatch, and a 64-term unrolled expression
  * tree blows past codegen method limits on pair-join inputs. This
  * generates a tight primitive loop (`acc += (double)a[i] * (double)b[i]`)
  * inside whole-stage codegen — the difference between ~40 s and ~1 s on
  * a 2M-pair similarity self-join at sf0.1.
  *
  * The accumulation order (element 0 → n-1) is part of the CONTRACT:
  * it makes results bit-identical to the DuckDB oracle's sequential
  * `list_reduce` fold, and independent of partitioning/parallelism.
  */
case class DotProductFF(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  /** Analysis-time type gate: both inputs must be array<float>. Without
    * this, `graft_dot(array<double>, …)` (reachable via the registered
    * SQL function) would pass analysis and then read the wrong 4 bytes
    * of each UnsafeArrayData element at runtime — silent wrong results.
    * (ExpectsInputTypes is unusable here: AbstractDataType is
    * private[sql] in Spark 4.) Length mismatch stays a runtime-tolerated
    * min(): query-vs-corpus embeddings share a fixed model dimension, and
    * truncation is the documented contract for ragged inputs. */
  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(FloatType, _) => true
      case NullType => true // NULL literal — propagates to a null result
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dot requires (array<float>, array<float>), got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
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
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): DotProductFF =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  /** Column API: exact sequential dot product of two ArrayType(Float)
    * columns as a codegen'd native expression. */
  def dot_ff(a: Column, b: Column): Column =
    ColumnBridge.column(DotProductFF(ColumnBridge.expression(a),
      ColumnBridge.expression(b)))
}
