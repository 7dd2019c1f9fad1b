package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word n-grams of a token array, first-occurrence order —
  * semantically `array_distinct(transform(sequence(0, size(w)-n), i ->
  * concat_ws(' ', w[i+1..i+n])))`, but as ONE native expression with
  * codegen.
  *
  * Why it exists: higher-order functions (`transform`) are interpreted
  * in Spark — the lambda's expression tree is re-evaluated per element,
  * outside whole-stage codegen. The shingle stage feeds EVERY
  * MinHash/LSH/decontamination consumer, so at corpus scale those
  * interpreted evaluations dominate the pipeline (measured on a 500k-doc
  * / 25M-shingle corpus: 21 s of a 36 s decontamination run was trigram
  * construction alone; this expression removes that floor — the loop
  * compiles once and runs inside the generated stage). Returns an empty
  * array when the document has fewer than n tokens, which `explode`
  * then drops — the same no-row outcome as the old `size(w) >= n`
  * pre-filter.
  */
case class DistinctShingles(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"shingle width must be >= 1, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "distinct_shingles"

  /** SQL-reachable, so reject non-string-array input at ANALYSIS time:
    * getUTF8String over a wrong-typed UnsafeArrayData misreads raw bytes
    * as offset/size words — garbage values, not an error (the same
    * hazard DotProduct's check exists for). */
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> input, got ${t.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    DistinctShingles.compute(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.DistinctShingles$$.MODULE$$.compute($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): DistinctShingles =
    copy(child = newChild)
}

object DistinctShingles {
  private val Space = UTF8String.fromString(" ")

  /** Single pass over the token array: build each n-gram with one
    * byte-copying concat, dedup through a LinkedHashSet (preserves
    * array_distinct's first-occurrence order). Called from both the
    * interpreted eval and the generated code. */
  def compute(arr: ArrayData, n: Int): ArrayData = {
    val len = arr.numElements()
    if (len < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[UTF8String]()
    val parts = new Array[UTF8String](n)
    var i = 0
    while (i <= len - n) {
      var j = 0
      while (j < n) { parts(j) = arr.getUTF8String(i + j); j += 1 }
      seen.add(UTF8String.concatWs(Space, parts: _*))
      i += 1
    }
    new GenericArrayData(seen.toArray(new Array[AnyRef](seen.size)).asInstanceOf[Array[Any]])
  }
}

/** All word n-grams of a token array, in order, duplicates kept — the
  * multiset sibling of [[DistinctShingles]] for consumers that measure
  * repetition (t08's duplicate-bigram share needs every occurrence).
  * Same reason to exist: the `transform(sequence(...), i -> concat(...))`
  * composition it replaces is an interpreted lambda per element.
  *
  * NULL elements: joined with `concat_ws` semantics — a null token is
  * SKIPPED, yielding a shortened n-gram ("a", null, "b" with n=2 →
  * ["a", "b"]), where the `concat`-based composition it replaced
  * propagated null into the whole gram. Unreachable from `split()`
  * outputs (never null-elemented; the oracle surface is unaffected),
  * but SQL callers passing nullable-element arrays should know the
  * n-gram is shortened, not nulled. */
case class WordNgrams(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"ngram width must be >= 1, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_ngrams"

  /** SQL-reachable, so reject non-string-array input at ANALYSIS time:
    * getUTF8String over a wrong-typed UnsafeArrayData misreads raw bytes
    * as offset/size words — garbage values, not an error (the same
    * hazard DotProduct's check exists for). */
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> input, got ${t.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    WordNgrams.compute(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WordNgrams$$.MODULE$$.compute($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): WordNgrams =
    copy(child = newChild)
}

object WordNgrams {
  private val Space = UTF8String.fromString(" ")

  def compute(arr: ArrayData, n: Int): ArrayData = {
    val len = arr.numElements()
    if (len < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](len - n + 1)
    val parts = new Array[UTF8String](n)
    var i = 0
    while (i <= len - n) {
      var j = 0
      while (j < n) { parts(j) = arr.getUTF8String(i + j); j += 1 }
      out(i) = UTF8String.concatWs(Space, parts: _*)
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** All word BIGRAMS of a token array as array<struct<gram, prev, cur>>,
  * duplicates kept — the struct sibling of [[WordNgrams]](n=2) for
  * consumers that need the joined gram AND its two member tokens (the
  * LM scorer buckets all three): emitting them together in one pass
  * means the downstream Project never re-`split`s the gram string it
  * was just concatenated from (two splits per exploded pair in the
  * p24 hot path before this). Same analysis-time type check as the
  * sibling. NULL tokens (unreachable from `split()` outputs, but the
  * SQL surface accepts any array): `gram` follows concat_ws semantics
  * (null member skipped) and the member fields carry the null through
  * — so prev/cur are declared NULLABLE; a non-null declaration would
  * let downstream null checks be optimized away over a value that can
  * in fact be null. */
case class WordBigramStructs(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("gram", StringType, nullable = false),
    StructField("prev", StringType, nullable = true),
    StructField("cur", StringType, nullable = true))), containsNull = false)
  override def prettyName: String = "word_bigram_structs"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> input, got ${t.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    WordBigramStructs.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WordBigramStructs$$.MODULE$$.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): WordBigramStructs =
    copy(child = newChild)
}

object WordBigramStructs {
  private val Space = UTF8String.fromString(" ")

  def compute(arr: ArrayData): ArrayData = {
    val len = arr.numElements()
    if (len < 2) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](len - 1)
    var prev = arr.getUTF8String(0)
    var i = 1
    while (i < len) {
      val cur = arr.getUTF8String(i)
      out(i - 1) = InternalRow(UTF8String.concatWs(Space, prev, cur), prev, cur)
      prev = cur
      i += 1
    }
    new GenericArrayData(out)
  }
}
