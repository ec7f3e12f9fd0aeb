package graft.plans

import graft.functions.BitmapDistinct
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Injected Catalyst optimizer rule (SURVEY.md §4.2 tier (c): a
  * `Rule[LogicalPlan]` registered through `SparkSessionExtensions`):
  * rewrites exact `COUNT(DISTINCT col)` over integral columns into the
  * one-pass paged-bitmap aggregate [[graft.functions.BitmapDistinct]].
  *
  * Why a rule and not a function users must call: Spark's built-in
  * distinct aggregation plans an `Expand` (one duplicated input row per
  * distinct column) plus a re-aggregate keyed on (group, value) — at sf10
  * that was 31% of the whole bench (q23, 6.3× DuckDB). With the rule, a
  * user writing standard SQL gets the bitmap plan automatically: no
  * Expand, the shuffle carries bitmap pages per group instead of one row
  * per (group, value), and several distinct columns ride ONE single-pass
  * aggregate. q23 measured 10.3 s → 1.4 s at sf10.
  *
  * Scope guards:
  *  - only `Count` with a single INTEGRAL or DATE argument (bitmap
  *    domain; dates are dense int32 days internally). TIMESTAMP is
  *    deliberately excluded: micros are pathologically sparse, so a
  *    bitmap would cost ~520 B/key — worse than the Expand it replaces;
  *  - non-integral distincts in the SAME aggregate are left alone and
  *    fall back to Spark's built-in path. Because every integral
  *    distinct leaves the pattern, at most ONE distinct group (the
  *    non-integral ones) remains, which Spark plans WITHOUT an Expand
  *    (planAggregateWithOneDistinct) — so a mixed
  *    `COUNT(DISTINCT int_col), COUNT(DISTINCT string_col)` aggregate
  *    has no Expand anywhere (RewriteRuleSpec "mixed");
  *  - `isDistinct` flips to false (the bitmap dedups by construction);
  *  - FILTER clauses and the result id are preserved, so references to
  *    the aggregate's output attribute stay bound;
  *  - opt-out: `SET spark.graft.rewriteExactDistinct=false` (pathologically
  *    sparse 64-bit domains degenerate to ~520 B/key — there the honest
  *    100 TB tier is the HLL sketch, q34).
  *
  * Injected via `injectOptimizerRule`, which lands in the operator-
  * optimization batch — BEFORE Spark's RewriteDistinctAggregates, so the
  * Expand never materializes. Idempotent (the rewritten expression no
  * longer matches the pattern).
  */
object RewriteExactDistinctToBitmap extends Rule[LogicalPlan] {
  private val flag = "spark.graft.rewriteExactDistinct"

  private def integral(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | DateType => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!conf.getConfString(flag, "true").toBoolean) plan
    else plan.transform {
      case agg: Aggregate =>
        agg.transformExpressionsUp {
          case ae @ AggregateExpression(Count(Seq(e)), _, true, _, _)
              if integral(e.dataType) =>
            ae.copy(aggregateFunction = BitmapDistinct(e), isDistinct = false)
        }
    }
}
