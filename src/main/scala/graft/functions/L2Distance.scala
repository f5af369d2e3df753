package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, NullType}

/** Native Catalyst expression: exact squared L2 distance over a SLICE of
  * two float-array columns, accumulated strictly left-to-right in double
  * (`acc += dx*dx` with `dx = (double)a[o+i] − (double)b[o+i]`).
  *
  * Built for product quantization (q131): per (vector, centroid, block)
  * the distance is over an 8-element subvector. Expressing that with
  * built-ins needs either `slice(...)` per side (one array allocation
  * per row per block per centroid — 128 allocations per vector at
  * 8 blocks × 16 centroids) or three [[DotProductFF]] passes via the
  * |x|²−2x·c+|c|² decomposition. This fuses the whole thing into one
  * allocation-free primitive loop inside whole-stage codegen.
  *
  * The slice bounds are CONSTRUCTION-TIME constants (not child
  * expressions): a PQ block layout is a property of the index layout,
  * known at plan time, and constant bounds let codegen emit a
  * fixed-trip-count loop the JIT unrolls. The accumulation order is the
  * contract that makes results bit-identical to the oracle's sequential
  * `list_reduce` fold over `(a[i]−b[i])²`.
  */
case class L2SliceDistanceFF(left: Expression, right: Expression,
                             offset: Int, length: Int)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(FloatType, _) => true
      case NullType => true // NULL literal — propagates to a null result
      case _ => false
    }
    if (offset < 0 || length < 0)
      TypeCheckResult.TypeCheckFailure(
        s"graft_l2_slice requires offset >= 0 and length >= 0, got ($offset, $length)")
    else if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_l2_slice requires (array<float>, array<float>), got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    // clamp to what both arrays actually hold past the offset — ragged
    // inputs degrade to the shared prefix, same contract as DotProductFF
    val n = math.max(0,
      math.min(length, math.min(x.numElements(), y.numElements()) - offset))
    var acc = 0.0
    var i = 0
    while (i < n) {
      val dx = x.getFloat(offset + i).toDouble - y.getFloat(offset + i).toDouble
      acc += dx * dx
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val dx = ctx.freshName("dx")
      s"""
         |int $n = java.lang.Math.max(0, java.lang.Math.min($length,
         |  java.lang.Math.min($a.numElements(), $b.numElements()) - $offset));
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $dx = (double) $a.getFloat($offset + $i) - (double) $b.getFloat($offset + $i);
         |  $acc += $dx * $dx;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): L2SliceDistanceFF =
    copy(left = newLeft, right = newRight)
}

object L2Distance {
  /** Column API: exact sequential squared L2 distance over
    * `[offset, offset+length)` of two ArrayType(Float) columns. */
  def l2_ff(a: Column, b: Column, offset: Int, length: Int): Column =
    ColumnBridge.column(L2SliceDistanceFF(ColumnBridge.expression(a),
      ColumnBridge.expression(b), offset, length))

  /** Whole-vector form. */
  def l2_ff(a: Column, b: Column): Column = l2_ff(a, b, 0, Int.MaxValue)
}
