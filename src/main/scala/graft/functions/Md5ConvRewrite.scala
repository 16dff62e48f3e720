package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Catalyst optimizer rule: collapse the portable md5-prefix hash chain
  *
  * {{{ cast(conv(substring(md5(x), pos, len), 16, 10) as bigint) }}}
  *
  * (literal pos/len, ≤ 15 hex digits — the shape of every shingle key,
  * KMV/count-min probe, and sampling uniform in this engine) into the
  * fused [[Md5Slice64]] expression, which reads the value straight off
  * the digest bytes instead of materializing and re-parsing hex strings.
  *
  * CSE guard: the rewrite fires ONLY when that `md5(x)` occurrence is
  * the plan's sole slice of the digest. The MinHash signature path slices
  * ONE md5 twice (`h1` = digits 1-8, `h2` = digits 9-16); Spark's
  * subexpression elimination computes that digest once, and fusing both
  * slices would compute it twice — a pessimization precisely where the
  * hash is hottest. A digest sliced once has nothing to share, so fusing
  * it is pure win.
  *
  * Bit-parity: `conv(hex, 16, 10)` of ≤ 15 hex digits is an exact
  * unsigned value < 2⁶⁰; the bigint cast of its decimal string is the
  * same long [[Md5Slice64.compute]] assembles from the nibbles
  * (`Md5Slice64Spec` pins equality over the real corpus and edge
  * shapes). Wired like [[CosineHofRewrite]]: via `GraftExtensions`
  * (config-time) or [[register]] on a live session.
  */
object Md5ConvRewrite extends Rule[LogicalPlan] {

  private object IntLit {
    def unapply(e: Expression): Option[Int] = e match {
      case Literal(v: Int, IntegerType) => Some(v)
      case _                            => None
    }
  }

  /** `cast(conv(substring(md5(x), p, n), 16, 10) as bigint)` → (md5, x, p, n) */
  private object PrefixChain {
    def unapply(e: Expression): Option[(Md5, Expression, Int, Int)] = e match {
      case Cast(
          Conv(Substring(m @ Md5(bytes), IntLit(p), IntLit(n)), IntLit(16), IntLit(10), _),
          LongType, _, _)
          if p >= 1 && n >= 1 && n <= 15 && p + n - 1 <= 32 =>
        Some((m, bytes, p, n))
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    // count every md5 occurrence by canonicalized child — a digest that
    // feeds more than one expression stays on the CSE-shared chain
    var counts = Map.empty[Expression, Int].withDefaultValue(0)
    plan.foreach { node =>
      node.expressions.foreach(_.foreach {
        case m: Md5 =>
          val k = m.canonicalized
          counts = counts.updated(k, counts(k) + 1)
        case _ => ()
      })
    }
    plan.transformAllExpressions {
      case PrefixChain(m, bytes, p, n) if counts(m.canonicalized) == 1 =>
        Md5Slice64(bytes, Literal(p), Literal(n))
    }
  }

  /** Idempotently attach the rule to a live session's optimizer. */
  def register(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(this))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ this
}
