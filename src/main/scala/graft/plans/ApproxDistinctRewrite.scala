package graft.plans

import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, HyperLogLogPlusPlus}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/**
 * Config-gated optimizer rule: rewrite exact `COUNT(DISTINCT x)` into a
 * HyperLogLog++ sketch (`approx_count_distinct`) when
 * `spark.graft.approxDistinct=true`.
 *
 * Why a planner rule (SURVEY.md §4 "candidates that may justify one"): an
 * exact distinct over a high-cardinality key plans as a two-stage expand +
 * shuffle of every distinct value — at 10^8+ keys per group that shuffle is
 * the job. The sketch is fixed-size state with bounded error, which is the
 * right default at 100 TB; gating it in the OPTIMIZER (not the query text)
 * lets the same query run exact in tests/backfills and approximate at
 * scale, the way the reference swaps HashSet UV for bloom-filter UV between
 * UniqueVisitor and UniqueVisitorWithBloomFilter without changing the job
 * graph (SURVEY.md §2.5 A4/A5).
 *
 * Only single-argument COUNT(DISTINCT col) is rewritten; multi-arg and
 * filtered forms keep exact semantics.
 */
case class ApproxDistinctRewrite() extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!conf.getConfString("spark.graft.approxDistinct", "false").toBoolean) plan
    else plan.transform {
      case agg: Aggregate =>
        agg.transformExpressions {
          case ae @ AggregateExpression(c: Count, _, true, None, _)
              if c.children.size == 1 =>
            ae.copy(aggregateFunction = new HyperLogLogPlusPlus(c.children.head),
              isDistinct = false)
        }
    }
}
