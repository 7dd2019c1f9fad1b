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
  *
  * MIXED element widths are allowed (float×double): each side is read
  * with its own getter and widened to double before the multiply —
  * float→double widening is exact, so `dot(floats, doubles)` is
  * bit-equal to casting the float array first. This removes the
  * interpreted `transform(v, cast)` projections the similarity
  * operators used to need when dotting raw float embeddings against
  * double-valued hyperplanes/centroids.
  */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

  /** Each input independently an array of FLOAT or DOUBLE — each side
    * gets its own width-correct getter (the round-4 version required
    * identical types because one getter served both sides). */
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType | DoubleType, _), ArrayType(FloatType | DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires two arrays with FLOAT or DOUBLE element " +
            s"types, got ${l.catalogString} and ${r.catalogString}")
    }

  private def elemTypeOf(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

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
    val lf = elemTypeOf(left) == FloatType
    val rf = elemTypeOf(right) == FloatType
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) throw nullElem(i)
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      acc += xv * yv; i += 1
    }
    acc
  }

  private def nullElem(i: Int) =
    new IllegalArgumentException(s"dot_product: null array element at index $i")

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    def getter(e: Expression) = elemTypeOf(e) match {
      case FloatType  => "getFloat"
      case DoubleType => "getDouble"
      case t          => throw new IllegalStateException(s"dot_product over $t")
    }
    val (getL, getR) = (getter(left), getter(right))
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
         |  $acc += (double) $a.$getL($i) * (double) $b.$getR($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}
