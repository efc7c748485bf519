package graft.core

import org.json4s._
import org.json4s.jackson.JsonMethods

/** Index-freshness half of a maintenance tick: indexes registered at
  * creation time ([[SecondaryIndex.create]] / [[VectorIndex.create]]
  * stamp `index.kind` / `index.base.path` into the index table's
  * properties) are discoverable from the base table alone, so a
  * scheduled maintenance loop — the library analog of the reference's
  * periodic table-maintenance services (LakeTableTieringManager-style
  * scheduling, fluss-server coordinator/) — keeps every derived
  * structure fresh without the operator enumerating them per call:
  *
  * {{{
  *   // one tick, per table:
  *   t.compact()                                  // KV snapshot
  *   t.maintainPartitions(policy, now)            // pre-create / expire
  *   IndexMaintenance.refreshAll(catalog, t)      // secondary + vector
  *   LakeMaintenance.maintainLake(t, now)         // freshness-gated tier
  *                                                // + history expiry
  * }}}
  *
  * Discovery is catalog-metadata-sized (one `meta.json` read per table);
  * each refresh is the same incremental changelog replay the explicit
  * `refresh_index` / `refresh_vector_index` procedures run.
  */
object IndexMaintenance {

  /** All registered indexes whose base is `base`:
    * (qualified name, kind, index table).
    */
  def indexesOf(catalog: Catalog, base: GraftTable)
      : Seq[(String, String, GraftTable)] =
    for {
      db <- catalog.listDatabases()
      name <- catalog.listTables(db)
      idx = catalog.getTable(db, name)
      if idx.desc.properties.get("index.base.path").contains(base.path)
    } yield (s"$db.$name", idx.desc.properties("index.kind"), idx)

  /** Refresh every registered index of `base` to its current version;
    * returns (qualified name, kind, applied base version) per index.
    */
  def refreshAll(catalog: Catalog, base: GraftTable)
      : Seq[(String, String, Long)] =
    indexesOf(catalog, base).map { case (qn, kind, idx) =>
      val applied = kind match {
        case "secondary" =>
          val cols = idx.desc.properties("index.columns")
            .split(',').map(_.trim).filter(_.nonEmpty).toSeq
          val si = SecondaryIndex.open(base, idx, cols)
          si.refresh()
          si.appliedVersion
        case "vector" =>
          val vi = VectorIndex.open(base,
            idx.desc.properties("index.id.column"),
            idx.desc.properties("index.vector.column"), idx)
          vi.refresh()
          vi.appliedVersion
        case other => throw new IllegalStateException(
          s"index $qn has unknown index.kind '$other'")
      }
      (qn, kind, applied)
    }

  // -------------------------------------------------------------------
  // Property-driven tick — the [[LakeMaintenance]] pattern for indexes:
  // `table.index.*` options on the BASE table gate a freshness-scheduled
  // refresh loop, so a stale ANN/secondary index re-arms the way the
  // lake tick does and an in-window tick costs ONE metadata stat.
  //
  //   - `table.index.auto-refresh`: gate; the tick skips the table
  //     unless exactly "true"
  //   - `table.index.freshness`: max index lag, '3m' / '45s' / millis
  //     (default 3 minutes, matching the lake tick's reference default)
  // -------------------------------------------------------------------

  private val Prefix = "table.index."

  final case class IndexPolicy(freshnessMs: Long)

  /** Policy from the base table's properties; None unless
    * auto-refresh=true (the tick then skips the table).
    */
  def policyOf(props: Map[String, String]): Option[IndexPolicy] =
    if (!props.get(Prefix + "auto-refresh").exists(_.equalsIgnoreCase("true")))
      None
    else Some(IndexPolicy(Durations.parseMillis(
      props.getOrElse(Prefix + "freshness", "3m"))))

  /** One index tick for `base`: None when auto-refresh is disabled;
    * otherwise a summary. Within the freshness window nothing is read
    * beyond the stamp file; past it every registered index refreshes
    * (each refresh is itself a no-op metadata compare when the base has
    * not advanced) and the gate re-arms.
    */
  def maintainIndexes(catalog: Catalog, base: GraftTable,
      nowMillis: Long): Option[String] =
    policyOf(base.desc.properties).map { p =>
      refreshedAtMillis(base) match {
        case Some(at) if nowMillis - at < p.freshnessMs =>
          s"indexes fresh: refreshed ${nowMillis - at} ms ago " +
            s"(freshness target ${p.freshnessMs} ms)"
        case _ =>
          val rs = refreshAll(catalog, base)
          touchRefreshedAt(base, nowMillis)
          if (rs.isEmpty) "no registered indexes (freshness gate re-armed)"
          else rs.map { case (qn, kind, v) =>
            s"$qn ($kind) refreshed to base version $v"
          }.mkString("; ") + " (freshness gate re-armed)"
      }
    }

  /** Last tick time from the base table's `_index_maintenance.json`
    * stamp (one metadata read; `_`-prefixed, so invisible to Spark's
    * file listing); None before the first tick.
    */
  private def refreshedAtMillis(base: GraftTable): Option[Long] =
    WarehouseIO.readStringIfExists(stampFile(base)).map { s =>
      JsonMethods.parse(s).asInstanceOf[JObject].obj.toMap
        .get("refreshedAtMillis") match {
        case Some(JInt(n)) => n.toLong
        case _ => 0L
      }
    }

  private def touchRefreshedAt(base: GraftTable, now: Long): Unit =
    WarehouseIO.atomicWriteString(stampFile(base), JsonMethods.compact(
      JsonMethods.render(JObject(List(
        "refreshedAtMillis" -> (JInt(now): JValue))))))

  private def stampFile(base: GraftTable): String =
    s"${base.path}/_index_maintenance.json"
}
