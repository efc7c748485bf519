package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, Expression, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation

import graft.connector.GraftDsTable
import graft.core.{DynamicConfigs, GraftTable, GroupedReads, LakeFormatOps, LakeMaintenance}

/** Serves catalog SQL reads of PK tables — and, in the session's
  * lake-union mode, of lake-enabled tables — through the GROUPED engine
  * plan instead of the V1 bridge (rides
  * `spark.sql.graft.read.preserve-data-grouping`, 'auto' by default).
  *
  * The V1 bridge is correct but planner-opaque: `buildScan` re-plans the
  * snapshot ∪ log-tail collapse INSIDE the relation and hands Spark an
  * `RDD[Row]` — the collapse itself runs grouped/columnar in there, but
  * the rows pay an InternalRow→Row→InternalRow double conversion at the
  * bridge, and a join or aggregate ABOVE the relation cannot see the
  * bucket grouping, so SQL plans an exchange the engine-API path has
  * already deleted. This rule substitutes the relation with the SAME
  * logical plan the engine API builds — `GraftTable.scan()` (the
  * LatestRow collapse over the grouped DSv2 state input), or, when the
  * session has `spark.sql.graft.read.lake-union` set on a lake-enabled
  * table, `GraftTable.scanLakeUnion()` (lake live files ∪ gated log tail
  * as one grouped relation; the reference's union read is a SQL-first
  * surface — website/docs/streaming-lakehouse/union-read.md,
  * fluss-spark/.../read/lake/FlussLakeUtils.scala) — so catalog SQL gets
  * the identical exchange-free, columnar, conversion-free plan, and
  * joins above it can ride the reported `KeyGroupedPartitioning` (the
  * reference's FlussUpsertPartitionReader merges per bucket for the same
  * reason; in Spark the merge is an aggregate the planner can SEE).
  *
  * Runs in `experimental.extraOptimizations` ("User Provided Optimizers",
  * after every built-in batch): by then read-side relations are
  * `DataSourceV2ScanRelation`s — write targets stay `DataSourceV2Relation`
  * and row-level operations wrap their table in `RowLevelOperationTable`,
  * so matching scan relations whose table IS a plain [[GraftDsTable]] can
  * never touch a write — and `V2ScanRelationPushDown` has already run, so
  * the substituted subplan is optimized in its OWN pass (scan pushdown
  * included) before grafting. A residual Filter directly above the
  * relation is folded INTO that pass, so a full-PK point predicate
  * reaches the grouped scan's bucket pruning exactly like the engine API.
  *
  * Per-query planning cost: one nested optimizer pass per eligible
  * relation (the batch's later fixed-point iterations find nothing to
  * substitute — the grafted subplan's relations are internal grouped
  * tables, not [[GraftDsTable]]s). The eligibility checks in front of it
  * are conf lookups against [[DynamicConfigs]]' mtime-keyed cache plus,
  * in lake-union mode only, one lake-metadata existence probe.
  *
  * Skips: time travel (`isCurrentStateRead`), reader options (startup
  * modes, leases — those semantics live in the V1 scan), read-optimized
  * session mode (the ScanBuilder already plans that grouped natively),
  * pushed-aggregate scans (output shape differs; PK tables never push
  * aggregates, the output-name guard is defensive).
  */
object PkCollapseRule extends Rule[LogicalPlan] {

  private def conf(spark: SparkSession, path: String, key: String): Boolean =
    DynamicConfigs.readFlag(spark, path, key)

  /** How an eligible relation reads through the engine API. */
  private sealed trait Mode {
    def plan(gt: GraftTable): org.apache.spark.sql.DataFrame
  }
  private case object PkState extends Mode {
    def plan(gt: GraftTable) = gt.scan()
  }
  private final case class LakeUnion(dir: String, format: String)
      extends Mode {
    def plan(gt: GraftTable) = gt.scanLakeUnion(dir, format)
  }

  private def modeOf(sr: DataSourceV2ScanRelation): Option[Mode] =
    sr.relation.table match {
      case t: GraftDsTable if t.isCurrentStateRead =>
        val gt = t.table
        val spark = SparkSession.active
        val eligible = gt.desc.effectiveBucketKeys.nonEmpty &&
          // rebucket marker: the bucket numbering is ambiguous — the
          // substituted grouped scan would report/prune with a possibly
          // stale count; the V1 bridge (bucketing-independent) serves
          !gt.bucketPruneUnsafe &&
          sr.relation.options.isEmpty &&
          sr.output.forall(a => gt.desc.schema.fieldNames.contains(a.name)) &&
          GroupedReads.enabled(spark, gt.path, gt.desc.numBuckets,
            gt.plannerBytesCached) &&
          !conf(spark, gt.path, "spark.sql.graft.read.optimized")
        // the session's lake-union mode binds only tables that HAVE a
        // lake — substitutes for PK AND append tables (both cross the
        // V1 bridge otherwise); for every other table the mode is inert
        // and the normal branches apply
        val lakeUnion: Option[Mode] =
          if (!eligible ||
            !conf(spark, gt.path, "spark.sql.graft.read.lake-union")) None
          else LakeMaintenance.policyOf(gt.desc.properties)
            .filter(p => LakeFormatOps.of(p.format).hasMetadata(p.dir))
            .map(p => LakeUnion(p.dir, p.format))
        if (!eligible) None
        else if (lakeUnion.isDefined) lakeUnion
        else if (gt.desc.isPrimaryKeyTable) Some(PkState)
        else None // plain append reads already plan grouped natively
      case _ => None
    }

  /** Memo for [[substituted]], keyed on everything the built subplan
    * depends on: table path + committed-state identity (manifest and
    * snapshot stat), the read mode, the relation's output attributes
    * (exprIds included — a self-join's two branches get separate entries
    * and separate subplans, never shared exprIds within one tree), and
    * the canonicalized residual condition. Entries include `None` bails —
    * the expensive case VERDICT flagged was a bail REBUILDING the nested
    * plan on every fixed-point iteration. Survives across
    * QueryExecutions of the same DataFrame (same exprIds), so
    * EXPLAIN-then-execute pays one nested pass. Bounded by a real LRU
    * (access-ordered LinkedHashMap, not a clear-at-cap): a planning
    * storm over > 256 distinct keys evicts the coldest entry instead of
    * thrashing every planner to a zero hit rate. Map operations are a
    * short synchronized get/put — the expensive substituted() build
    * stays OUTSIDE the lock.
    */
  private type MemoKey = (String, ((Long, Long), (Long, Long)), Mode,
    Seq[(String, Long)], Option[Expression])
  private val memo = java.util.Collections.synchronizedMap(
    new java.util.LinkedHashMap[MemoKey, Option[LogicalPlan]](
        64, 0.75f, /* accessOrder = */ true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[MemoKey, Option[LogicalPlan]]): Boolean =
        size() > 256
    })

  /** Nested optimizer passes actually RUN (memo misses) — instrumentation
    * for PkCollapsePlanningSpec's flat-planning-cost contract.
    */
  private[graft] val nestedPasses =
    new java.util.concurrent.atomic.AtomicLong(0L)

  private def substitutedMemo(sr: DataSourceV2ScanRelation, mode: Mode,
      cond: Option[Expression]): Option[LogicalPlan] = {
    // LakeUnion subplans pin the LAKE's live-file list, whose state the
    // graft-side key below cannot see (external lake maintenance never
    // touches the manifest/snapshot stats) — a memoized lake plan could
    // serve deleted files. Those substitutions always build fresh.
    if (mode != PkState) {
      nestedPasses.incrementAndGet()
      return substituted(sr, mode, cond)
    }
    val gt = sr.relation.table.asInstanceOf[GraftDsTable].table
    val key = (gt.path, gt.planningStateKey, mode,
      sr.output.map(a => a.name -> a.exprId.id),
      cond.map(_.canonicalized))
    // NOT compute-in-map: running a full nested optimizer pass inside
    // the map lock would serialize concurrent planners, and a
    // substituted subplan that (however unlikely) contained another
    // eligible relation would re-enter the map. Lookup, build OUTSIDE
    // the lock, publish; a lost race costs one duplicate pass, never a
    // lock — and the loser adopts the winner's entry so object
    // identity stays stable for repeated plans.
    val cached = memo.get(key)
    if (cached != null) cached
    else {
      nestedPasses.incrementAndGet()
      val built = substituted(sr, mode, cond)
      memo.synchronized {
        val prior = memo.get(key)
        if (prior != null) prior
        else { memo.put(key, built); built }
      }
    }
  }

  /** The engine plan for `mode`, pruned to `sr.output` and aliased back
    * to its exprIds; `cond` (the residual filter that sat above the
    * relation) is re-applied inside the subplan BEFORE its optimization
    * pass, so predicate pushdown can carry it through the collapse to the
    * grouped scan. None = bail (leave the V1 plan).
    */
  private def substituted(sr: DataSourceV2ScanRelation, mode: Mode,
      cond: Option[Expression]): Option[LogicalPlan] = {
    val spark = SparkSession.active
    val gt = sr.relation.table.asInstanceOf[GraftDsTable].table
    // build the plan through the same door the engine API uses
    val analyzed = mode.plan(gt).queryExecution.analyzed
    val byName = analyzed.output.map(a => a.name -> a).toMap
    if (!sr.output.forall(a => byName.contains(a.name))) return None
    val remapped: Option[Expression] = cond.map { c =>
      if (!c.references.forall(a => byName.contains(a.name))) return None
      c.transform { case a: AttributeReference => byName(a.name) }
    }
    val gated = remapped.map(Filter(_, analyzed)).getOrElse(analyzed)
    val optimized =
      org.apache.spark.sql.graftshim.V2Relation.optimize(spark, gated)
    val outByName = optimized.output.map(a => a.name -> a).toMap
    if (!sr.output.forall(a => outByName.contains(a.name))) return None
    Some(Project(sr.output.map { a =>
      Alias(outByName(a.name), a.name)(exprId = a.exprId): NamedExpression
    }, optimized))
  }

  override def apply(plan: LogicalPlan): LogicalPlan = rewrite(plan)

  /** Explicit recursion (not transformDown — a returned node must be
    * able to STOP descent): row-level commands whose STRATEGY pattern-
    * matches the scan relation itself (`DeleteFromTable(relation, _)` →
    * `DeleteFromTableExec`) keep their TARGET subtree — but a MERGE's
    * source is a plain read the strategy never pattern-matches, so it
    * still substitutes. Everything else recurses, matching Filter-over-
    * relation first so the residual predicate travels into the subplan's
    * own optimization pass and reaches the grouped scan's bucket pruning.
    */
  private def rewrite(p: LogicalPlan): LogicalPlan = p match {
    case d: org.apache.spark.sql.catalyst.plans.logical.DeleteFromTable => d
    case u: org.apache.spark.sql.catalyst.plans.logical.UpdateTable => u
    case m: org.apache.spark.sql.catalyst.plans.logical.MergeIntoTable =>
      m.copy(sourceTable = rewrite(m.sourceTable))
    case f @ Filter(cond, sr: DataSourceV2ScanRelation) =>
      modeOf(sr).flatMap(substitutedMemo(sr, _, Some(cond))).getOrElse(f)
    case sr: DataSourceV2ScanRelation =>
      modeOf(sr).flatMap(substitutedMemo(sr, _, None)).getOrElse(sr)
    case other => other.mapChildren(rewrite)
  }
}
