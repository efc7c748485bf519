package graft.plans

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.connector.read.{Statistics, SupportsReportStatistics}
import org.apache.spark.sql.execution.datasources.v2.{DataSourceV2ScanRelation, V1ScanWrapper}

/** Restores connector statistics across Spark's V1 bridge.
  *
  * The engine's DSv2 scans report size/row-count
  * ([[graft.core.GraftTable.plannerStats]] via `SupportsReportStatistics`),
  * but `V2ScanRelationPushDown` wraps every `V1Scan` in a `V1ScanWrapper`
  * that does NOT forward the statistics interface — so
  * `DataSourceV2ScanRelation.computeStats` falls back to
  * `defaultSizeInBytes` (= effectively infinite) and a small graft
  * dimension table never qualifies for a broadcast join at plan time
  * (AQE can still convert at runtime, but only after paying the first
  * shuffle's map stage).
  *
  * This rule re-wraps: same `V1ScanWrapper` (planning still pattern-matches
  * it) with `SupportsReportStatistics` mixed back in, delegating to the
  * wrapped scan. Guarded so an already-forwarding wrapper is left alone.
  */
object V1StatsRule extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case r: DataSourceV2ScanRelation =>
      r.scan match {
        case w: V1ScanWrapper if !w.isInstanceOf[SupportsReportStatistics] =>
          w.v1Scan match {
            case s: SupportsReportStatistics =>
              r.copy(scan = new V1ScanWrapper(w.v1Scan, w.handledFilters,
                  w.pushedDownOperators) with SupportsReportStatistics {
                override def estimateStatistics(): Statistics =
                  s.estimateStatistics()
                // The original wrapper is case-class-EQUAL to this one, and
                // TreeNode discards "unchanged" replacements — mapChildren
                // tests newChild.fastEquals(oldChild), so BOTH directions of
                // equals must distinguish the stats mixin or the rewrite is
                // silently dropped (canEqual alone only breaks one side).
                override def equals(other: Any): Boolean =
                  other.isInstanceOf[SupportsReportStatistics] && super.equals(other)
                override def canEqual(other: Any): Boolean =
                  other.isInstanceOf[SupportsReportStatistics]
              })
            case _ => r
          }
        case _ => r
      }
  }
}
