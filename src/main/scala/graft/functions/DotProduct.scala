package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Element-order dot product of two numeric arrays, accumulated in
  * double: `Σ (double)a[i] * (double)b[i]`.
  *
  * Replaces the `zip_with` + `aggregate` lambda fold: higher-order
  * functions are interpreted (a boxed lambda call per element), while
  * this generates a tight primitive loop inside whole-stage codegen —
  * the difference between O(pairs·dims) interpreted calls and a
  * vector-friendly loop in the similarity hot path. The summation order
  * is identical to the sequential fold, so results are bit-equal to the
  * lambda version (and to the DuckDB oracle's DOUBLE[] computation).
  */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

  /** Both inputs must be arrays of the SAME float/double element type:
    * eval and codegen pick the element getter from the LEFT child, so a
    * mixed call like dot_product(array<float>, array<double>) would read
    * the right side with the wrong-width getter — garbage values, not an
    * error. Reject at analysis time instead. */
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(lt @ (FloatType | DoubleType), _), ArrayType(rt, _)) if lt == rt =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires two arrays with identical FLOAT or DOUBLE element " +
            s"types, got ${l.catalogString} and ${r.catalogString}")
    }

  private def elemType: DataType =
    left.dataType.asInstanceOf[ArrayType].elementType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    // fail loudly on ragged vectors: a silent min-length dot yields a
    // plausible-but-wrong similarity (and DuckDB's oracle errors here too)
    if (n != y.numElements())
      throw new IllegalArgumentException(
        s"dot_product: array length mismatch ($n vs ${y.numElements()})")
    var acc = 0.0
    var i = 0
    // null elements would read as 0.0 from unsafe arrays — fail loudly
    // (consistent with the ragged-length stance) instead of skewing scores
    elemType match {
      case FloatType =>
        while (i < n) {
          if (x.isNullAt(i) || y.isNullAt(i)) throw nullElem(i)
          acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble; i += 1
        }
      case DoubleType =>
        while (i < n) {
          if (x.isNullAt(i) || y.isNullAt(i)) throw nullElem(i)
          acc += x.getDouble(i) * y.getDouble(i); i += 1
        }
      case t => throw new IllegalStateException(s"dot_product over $t")
    }
    acc
  }

  private def nullElem(i: Int) =
    new IllegalArgumentException(s"dot_product: null array element at index $i")

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val get = elemType match {
      case FloatType  => "getFloat"
      case DoubleType => "getDouble"
      case t          => throw new IllegalStateException(s"dot_product over $t")
    }
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  throw new IllegalArgumentException(
         |    "dot_product: array length mismatch (" + $n + " vs " + $b.numElements() + ")");
         |}
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) {
         |    throw new IllegalArgumentException(
         |      "dot_product: null array element at index " + $i);
         |  }
         |  $acc += (double) $a.$get($i) * (double) $b.$get($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}
