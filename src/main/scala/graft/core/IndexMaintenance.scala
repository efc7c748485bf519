package graft.core

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
}
