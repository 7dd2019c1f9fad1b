package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL-surface registration for graft's native expressions, so
  * `dot_product` and `rolling_hash` are callable from `spark.sql(...)`
  * (and thus from any SQL-only client), not just the Column API.
  *
  * Two entry points for the two deployment shapes:
  *   - [[GraftExtensions]]: a `SparkSessionExtensions` injector — set
  *     `spark.sql.extensions=graft.functions.GraftExtensions` on the
  *     cluster and every new session has the functions (the standard
  *     library-extension mechanism; rules/strategies would register the
  *     same way);
  *   - [[registerAll]]: imperative registration into an EXISTING
  *     session, for notebooks/tests where the session already exists
  *     (extensions only apply at session construction).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.registrations.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    // operator-optimization batch: runs interleaved with Catalyst's own
    // pushdown rules, so predicates our rule moves below the as-of node
    // keep travelling down to the scan in the same fixed point
    ext.injectOptimizerRule(_ => graft.plans.AsOfJoinPushdown)
    ext.injectOptimizerRule(_ => graft.plans.AsOfJoinPruning)
    ext.injectOptimizerRule(_ => graft.plans.AsOfJoinElimination)
    ext.injectOptimizerRule(_ => graft.plans.TopKRewrite)
  }
}

object GraftExtensions {

  private type Builder = Seq[Expression] => Expression

  private[functions] val registrations: Seq[(String, ExpressionInfo, Builder)] = Seq(
    ("dot_product",
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (args: Seq[Expression]) => {
        require(args.length == 2, s"dot_product expects 2 arguments, got ${args.length}")
        DotProduct(args.head, args(1))
      }),
    ("rolling_hash",
      new ExpressionInfo(classOf[RollingHash].getName, "rolling_hash"),
      (args: Seq[Expression]) => args match {
        case Seq(c) => RollingHash(c)
        case other => throw new IllegalArgumentException(
          s"rolling_hash expects 1 argument, got ${other.length}")
      }),
    ("nfc_normalize",
      new ExpressionInfo(classOf[NfcNormalize].getName, "nfc_normalize"),
      (args: Seq[Expression]) => args match {
        case Seq(c) => NfcNormalize(c)
        case other => throw new IllegalArgumentException(
          s"nfc_normalize expects 1 argument, got ${other.length}")
      }),
    ("distinct_shingles",
      new ExpressionInfo(classOf[DistinctShingles].getName, "distinct_shingles"),
      (args: Seq[Expression]) => args match {
        // n must be a literal: it shapes the generated loop at plan time
        case Seq(c, org.apache.spark.sql.catalyst.expressions.Literal(n: Int, _)) =>
          DistinctShingles(c, n)
        case other => throw new IllegalArgumentException(
          "distinct_shingles expects (tokens, n literal int), got " +
            other.map(_.sql).mkString(", "))
      }),
    ("word_ngrams",
      new ExpressionInfo(classOf[WordNgrams].getName, "word_ngrams"),
      (args: Seq[Expression]) => args match {
        case Seq(c, org.apache.spark.sql.catalyst.expressions.Literal(n: Int, _)) =>
          WordNgrams(c, n)
        case other => throw new IllegalArgumentException(
          "word_ngrams expects (tokens, n literal int), got " +
            other.map(_.sql).mkString(", "))
      }),
    ("word_bigram_structs",
      new ExpressionInfo(classOf[WordBigramStructs].getName, "word_bigram_structs"),
      (args: Seq[Expression]) => args match {
        case Seq(c) => WordBigramStructs(c)
        case other => throw new IllegalArgumentException(
          s"word_bigram_structs expects 1 argument, got ${other.length}")
      }),
    ("topk_by_score",
      new ExpressionInfo(classOf[TopKByScore].getName, "topk_by_score"),
      (args: Seq[Expression]) => args match {
        // k must be a literal: it sizes the aggregation buffer at plan time
        case Seq(s, i, org.apache.spark.sql.catalyst.expressions.Literal(k: Int, _)) =>
          TopKByScore(s, i, k)
        case other => throw new IllegalArgumentException(
          "topk_by_score expects (score, id, k literal int), got " +
            other.map(_.sql).mkString(", "))
      }))

  /** Register into an already-constructed session (idempotent) —
    * functions into the registry, the as-of planner strategy into
    * `spark.experimental.extraStrategies` (the public post-construction
    * hook; the session's planner consults it on every query). */
  def registerAll(spark: SparkSession): Unit = {
    val registry: FunctionRegistry = spark.sessionState.functionRegistry
    registrations.foreach { case (name, info, builder) =>
      registry.registerFunction(FunctionIdentifier(name), info, builder)
    }
    if (!spark.experimental.extraStrategies.contains(graft.plans.AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ graft.plans.AsOfJoinStrategy
    val rules = Seq(graft.plans.AsOfJoinPushdown, graft.plans.AsOfJoinPruning,
      graft.plans.AsOfJoinElimination, graft.plans.TopKRewrite)
    val missing = rules.filterNot(spark.experimental.extraOptimizations.contains)
    if (missing.nonEmpty)
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations ++ missing
  }
}
