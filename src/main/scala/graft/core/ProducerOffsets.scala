package graft.core

import org.json4s._
import org.json4s.jackson.JsonMethods

/** Warehouse-level producer offset snapshots — the reference's
  * exactly-once undo-recovery registry (apache/fluss
  * fluss-client/.../admin/Admin.java:745 `registerProducerOffsets` /
  * `getProducerOffsets` / `deleteProducerOffsets`, stored by
  * fluss-server/.../coordinator/producer/ProducerOffsetsStore.java with
  * atomic check-and-register semantics).
  *
  * The contract: an external exactly-once writer (the reference's Flink
  * job coordinator) registers, BEFORE writing any data, the per-table
  * per-bucket next-offsets it observed at startup. Registration is an
  * atomic check-and-create:
  *
  *  - [[Created]] — no snapshot existed: first start, no undo needed.
  *  - [[AlreadyExists]] — a previous attempt registered and then crashed
  *    before its first checkpoint: the caller must undo everything
  *    written past the registered offsets ([[GraftTable.undoTo]]) before
  *    writing again. The existing snapshot is NEVER overwritten.
  *
  * After the first durable checkpoint the writer deletes its snapshot
  * (checkpoint state supersedes it). Snapshots carry a TTL and expired
  * ones are pruned on every registry write, so an abandoned producer id
  * cannot pin the registry forever (the reference's automatic TTL
  * cleanup, ProducerOffsetsManager).
  *
  * Storage is one JSON registry under the warehouse root, read-modify-
  * written under the same file lock discipline as ACLs / dynamic configs
  * / KV snapshot leases — the atomicity the reference gets from its ZK
  * check-and-create node.
  */
object ProducerOffsets {

  /** Result of an atomic registration (RegisterResult.java:32). */
  sealed abstract class RegisterResult(val code: Int)
  /** Snapshot newly created — first startup, no undo recovery needed. */
  case object Created extends RegisterResult(0)
  /** Snapshot already existed (crash before first checkpoint) — the
    * caller should undo to the EXISTING snapshot's offsets.
    */
  case object AlreadyExists extends RegisterResult(1)

  /** A registered snapshot: per-table (`db.table`) per-bucket next
    * offsets, plus the expiry stamp.
    */
  final case class Snapshot(
      producerId: String,
      expiresAtMillis: Long,
      tables: Map[String, Map[Int, Long]])

  /** Default snapshot TTL (the reference's configured TTL; generous —
    * the snapshot only needs to outlive the window between job start and
    * first checkpoint).
    */
  val DefaultTtlMillis: Long = 24L * 60 * 60 * 1000

  private def registryFile(warehouse: String): String =
    s"$warehouse/_producer_offsets.json"

  private def readAll(warehouse: String): Map[String, Snapshot] =
    WarehouseIO.readStringIfExists(registryFile(warehouse)) match {
      case None => Map.empty
      case Some(json) =>
        JsonMethods.parse(json).asInstanceOf[JObject].obj.map {
          case (id, body) =>
            val fields = body.asInstanceOf[JObject].obj.toMap
            val exp = fields("expiresAtMillis").asInstanceOf[JInt].num.toLong
            val tables = fields("tables").asInstanceOf[JObject].obj.map {
              case (tbl, offs) =>
                tbl -> offs.asInstanceOf[JObject].obj.map {
                  case (b, o) => b.toInt -> o.asInstanceOf[JInt].num.toLong
                }.toMap
            }.toMap
            id -> Snapshot(id, exp, tables)
        }.toMap
    }

  private def writeAll(warehouse: String, all: Map[String, Snapshot]): Unit =
    CatalogJson.atomicWrite(registryFile(warehouse),
      JsonMethods.compact(JsonMethods.render(JObject(
        all.toList.sortBy(_._1).map { case (id, s) =>
          id -> (JObject(List(
            "expiresAtMillis" -> (JInt(s.expiresAtMillis): JValue),
            "tables" -> (JObject(s.tables.toList.sortBy(_._1).map {
              case (tbl, offs) =>
                tbl -> (JObject(offs.toList.sortBy(_._1).map {
                  case (b, o) => b.toString -> (JInt(o): JValue)
                }): JValue)
            }): JValue))): JValue)
        }))))

  private def live(all: Map[String, Snapshot],
      nowMillis: Long): Map[String, Snapshot] =
    all.filter { case (_, s) => s.expiresAtMillis > nowMillis }

  /** Atomic check-and-register. Never overwrites: an existing unexpired
    * snapshot under `producerId` returns [[AlreadyExists]] untouched.
    */
  def register(warehouse: String, producerId: String,
      tables: Map[String, Map[Int, Long]],
      ttlMillis: Long = DefaultTtlMillis,
      nowMillis: Long = System.currentTimeMillis()): RegisterResult = {
    require(producerId.nonEmpty, "producerId must be non-empty")
    require(ttlMillis > 0, s"ttl $ttlMillis must be positive")
    CatalogJson.withFileLock(registryFile(warehouse)) {
      val liveNow = live(readAll(warehouse), nowMillis)
      if (liveNow.contains(producerId)) AlreadyExists
      else {
        writeAll(warehouse, liveNow +
          (producerId -> Snapshot(producerId, nowMillis + ttlMillis, tables)))
        Created
      }
    }
  }

  /** The unexpired snapshot for `producerId`, if any. Expiry is decided
    * at read time — a stale registry entry past its TTL reads as absent
    * (and is physically pruned by the next registry write).
    */
  def get(warehouse: String, producerId: String,
      nowMillis: Long = System.currentTimeMillis()): Option[Snapshot] =
    live(readAll(warehouse), nowMillis).get(producerId)

  /** Delete a snapshot (after the first successful checkpoint). Returns
    * whether the id existed — expired-but-listed counts, matching the
    * lease-drop contract: the caller's intent is "gone now", and the
    * write prunes it either way.
    */
  def delete(warehouse: String, producerId: String,
      nowMillis: Long = System.currentTimeMillis()): Boolean =
    CatalogJson.withFileLock(registryFile(warehouse)) {
      val all = readAll(warehouse)
      writeAll(warehouse, live(all, nowMillis) - producerId)
      all.contains(producerId)
    }

  /** All unexpired snapshots (admin listing). */
  def list(warehouse: String,
      nowMillis: Long = System.currentTimeMillis()): Seq[Snapshot] =
    live(readAll(warehouse), nowMillis).values.toSeq.sortBy(_.producerId)
}
