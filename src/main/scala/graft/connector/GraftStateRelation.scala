package graft.connector

import java.util

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.connector.catalog.{CatalogPlugin, Identifier, SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.core.GraftTable

/** The engine-API door into [[GraftKeyGroupedScan]]: a DataFrame over an
  * internal DSv2 table, so a scan consumed through `GraftTable.scan()`
  * (not the SQL catalog) can still REPORT its bucket grouping to the
  * planner. Used for the PK table's STATE INPUT — snapshot ∪ log tail as
  * one grouped relation — which lets the LatestRow collapse above it run
  * with NO exchange: rows of one key live in one bucket, and both tiers
  * are bucketed by the same function (the reference merges per bucket in
  * FlussUpsertPartitionReader for exactly this reason).
  */
private[graft] object GraftStateRelation {

  /** PK state input (snapshot ∪ log tail) as one grouped relation, the
    * snapshot cutoffs PINNED by the caller: the scan emits the tail
    * UNGATED below the cutoffs (columnar when the manifest's id set
    * proves the upper gate redundant too) and the caller applies the
    * exact per-bucket tail gate above — see
    * [[graft.core.GraftTable.stateInput]], which filters
    * `offset == -1 OR offset >= cutoff(bucket)` over this relation.
    */
  def stateInput(table: GraftTable,
      pinnedCutoffs: Option[Map[Int, Long]]): DataFrame =
    grouped(table, GraftScanTier.State, Some(pinnedCutoffs))

  /** PK lake-union input (lake live files ∪ log tail above the pinned
    * tier offsets) as one grouped relation — lake files resolved by the
    * caller under the lake lock; the caller applies the exact tail gate
    * above (`offset == -1 OR offset >= pinned(bucket)`), like
    * [[stateInput]].
    */
  def lakeUnionInput(table: GraftTable, lakeDir: String,
      lakeFiles: Seq[(String, Long)],
      pinned: Map[Int, Long]): DataFrame =
    grouped(table, GraftScanTier.LakeUnion(lakeDir, lakeFiles, pinned))

  /** Grouped relation over any scan tier. */
  def grouped(table: GraftTable, tier: GraftScanTier,
      pinnedCutoffs: Option[Option[Map[Int, Long]]] = None): DataFrame =
    org.apache.spark.sql.graftshim.V2Relation.dataFrame(table.sparkSession,
      new GroupedTable(table, tier, pinnedCutoffs),
      Some(GraftStandaloneFunctions))

  /** Internal DSv2 table exposing raw rows (log schema: data + system
    * columns) through a [[GraftKeyGroupedScan]] of the given tier.
    */
  private final class GroupedTable(table: GraftTable, tier: GraftScanTier,
      pinnedCutoffs: Option[Option[Map[Int, Long]]])
      extends Table with SupportsRead {

    override def name(): String = s"graft_grouped(${table.path}, $tier)"

    override def schema(): StructType = table.logSchema

    override def capabilities(): util.Set[TableCapability] =
      util.EnumSet.of(TableCapability.BATCH_READ)

    override def newScanBuilder(options: CaseInsensitiveStringMap)
        : ScanBuilder = new ScanBuilder
        with SupportsPushDownFilters with SupportsPushDownRequiredColumns {
      private var pushed: Array[Filter] = Array.empty
      private var required: StructType = table.logSchema

      override def pushFilters(filters: Array[Filter]): Array[Filter] = {
        pushed = filters.filter(f => GraftScanBuilder.toColumn(f).isDefined)
        filters // all residual (best-effort; Spark re-applies)
      }

      override def pushedFilters(): Array[Filter] = pushed

      override def pruneColumns(requiredSchema: StructType): Unit =
        required = if (requiredSchema.isEmpty)
          StructType(table.logSchema.fields.take(1)) else requiredSchema

      override def build(): Scan =
        new GraftKeyGroupedScan(table, required, pushed, tier,
          pinnedCutoffs = pinnedCutoffs)
    }
  }
}

/** A standalone [[org.apache.spark.sql.connector.catalog.FunctionCatalog]]
  * carrying the engine's V2 functions for relations built OUTSIDE a
  * registered catalog (the engine API) — Spark resolves a reported
  * `bucket(...)` transform by loading `bucket` from the relation's
  * catalog, and an engine-API table has none.
  */
private[graft] object GraftStandaloneFunctions
    extends org.apache.spark.sql.connector.catalog.FunctionCatalog {

  override def initialize(name: String,
      options: CaseInsensitiveStringMap): Unit = ()

  override def name(): String = "graft_functions"

  override def listFunctions(namespace: Array[String]): Array[Identifier] =
    Array(Identifier.of(namespace, "bucket"))

  override def loadFunction(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.functions.UnboundFunction =
    if (ident.name == "bucket") GraftBucketFunction
    else throw new org.apache.spark.sql.catalyst.analysis
      .NoSuchFunctionException(ident)
}
