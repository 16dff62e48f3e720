package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** Catalyst optimizer rule: rewrite the portable higher-order-function
  * cosine formulation ([[graft.ext.Similarity.cosineHof]] and anything a
  * user writes in the same canonical shape)
  *
  * {{{
  *   aggregate(zip_with(a, b, (x, y) -> x * y), 0D, (acc, v) -> acc + v)
  *     / (sqrt(aggregate(a, 0D, (acc, v) -> acc + v * v))
  *        * sqrt(aggregate(b, 0D, (acc, v) -> acc + v * v)))
  * }}}
  *
  * into the single-pass whole-stage-codegen [[CosineSimilarity]]
  * expression. The HOF chain is interpreted per element and walks each
  * array three times; the native expression is one fused scalar loop with
  * identical index-order double arithmetic, so the rewrite is
  * bit-preserving for equal-length arrays with a nonzero norm (the
  * embedding contract). Two documented edge divergences: a length
  * mismatch makes the HOF chain NULL where the fused loop truncates
  * (why the match demands the norm folds run over semantically-equal
  * children of the zip), and a zero-norm vector is NULL under the HOF
  * chain (Spark Divide by 0) but NaN under the fused loop (0/0).
  *
  * Wired two ways: `spark.sql.extensions=graft.functions.GraftExtensions`
  * (config-time, every session) or [[CosineHofRewrite.register]] on a
  * live session (`spark.experimental.extraOptimizations`).
  */
object CosineHofRewrite extends Rule[LogicalPlan] {

  private object DoubleZero {
    def unapply(e: Expression): Boolean = e match {
      case Literal(v: Double, _) => v == 0.0
      case _                     => false
    }
  }

  /** The finish lambda must be the IDENTITY (`acc -> acc`) — `aggregate`
    * without an explicit finish parses to exactly this; any real finish
    * transforms the fold result and must block the rewrite. */
  private object IdentityFinish {
    def unapply(e: Expression): Boolean = e match {
      case LambdaFunction(body: NamedLambdaVariable, Seq(arg: NamedLambdaVariable), _) =>
        body.exprId == arg.exprId
      case _ => false
    }
  }

  /** `(acc, v) -> acc + v` with acc and v playing DISTINCT roles, and
    * BOTH being this lambda's own arguments — a merge that references an
    * enclosing HOF's lambda variable (nested-transform shapes) is not a
    * plain sum and must not match. */
  private object SumMerge {
    def unapply(e: Expression): Boolean = e match {
      case LambdaFunction(Add(x: NamedLambdaVariable, y: NamedLambdaVariable, _),
          Seq(accArg: NamedLambdaVariable, vArg: NamedLambdaVariable), _) =>
        x.exprId != y.exprId &&
          Set(x.exprId, y.exprId) == Set(accArg.exprId, vArg.exprId)
      case _ => false
    }
  }

  /** `aggregate(arr, 0D, (acc, v) -> acc + v * v)` → arr */
  private object SquaredNormFold {
    def unapply(e: Expression): Option[Expression] = e match {
      case ArrayAggregate(arg, DoubleZero(),
          LambdaFunction(
            Add(acc: NamedLambdaVariable,
              Multiply(v1: NamedLambdaVariable, v2: NamedLambdaVariable, _), _),
            Seq(accArg: NamedLambdaVariable, vArg: NamedLambdaVariable), _),
          IdentityFinish())
          if v1.exprId == v2.exprId && v1.exprId == vArg.exprId
            && acc.exprId == accArg.exprId =>
        Some(arg)
      case _ => None
    }
  }

  /** `aggregate(zip_with(a, b, (x, y) -> x * y), 0D, (acc, v) -> acc + v)`
    * → (a, b). The product must use BOTH zip variables (x·x over the zip
    * is not a dot product). */
  private object DotFold {
    def unapply(e: Expression): Option[(Expression, Expression)] = e match {
      case ArrayAggregate(
          ZipWith(a, b,
            LambdaFunction(Multiply(x: NamedLambdaVariable, y: NamedLambdaVariable, _),
              Seq(xArg: NamedLambdaVariable, yArg: NamedLambdaVariable), _)),
          DoubleZero(), SumMerge(), IdentityFinish())
          if Set(x.exprId, y.exprId) == Set(xArg.exprId, yArg.exprId)
            && x.exprId != y.exprId =>
        Some((a, b))
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case Divide(
        DotFold(a, b),
        Multiply(Sqrt(SquaredNormFold(a2)), Sqrt(SquaredNormFold(b2)), _), _)
        if a2.semanticEquals(a) && b2.semanticEquals(b) =>
      CosineSimilarity(a, b)
  }

  /** Idempotently attach the rule to a live session's optimizer. */
  def register(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(this))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ this
}
