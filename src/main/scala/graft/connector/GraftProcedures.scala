package graft.connector

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.core.{AutoPartitionPolicy, AutoPartitionUnit, GraftTable}

/** SQL stored procedures for table maintenance (Spark 4 DSv2
  * ProcedureCatalog — the iceberg `CALL catalog.system.…` surface; the
  * reference exposes the same operations through its Admin RPC,
  * fluss-client/.../admin/Admin.java):
  *
  *   CALL gfs.system.compact('db.tbl')            -- KV snapshot (S3/S7)
  *   CALL gfs.system.vacuum_log('db.tbl')         -- drop snapshot-covered log (S13)
  *   CALL gfs.system.rewrite_files('db.tbl')      -- small-file compaction
  *   CALL gfs.system.expire_partitions('db.tbl', 'dt', '2024-02-01')
  *   CALL gfs.system.maintain_partitions('db.tbl', 'day', 2, 7)
  *
  * Each call runs the same engine method the Scala API exposes and
  * returns a one-row summary via a LocalScan (driver-side result; the
  * heavy lifting inside — snapshot writes, log rewrites — is distributed
  * Spark jobs like any other engine operation).
  */
object GraftProcedures {

  val Namespace: Array[String] = Array("system")

  def names: Seq[String] = Seq(
    "compact", "vacuum_log", "rewrite_files", "expire_partitions",
    "maintain_partitions", "expire_log", "remove_orphan_files",
    "create_index", "refresh_index", "get_configs")

  /** Session-scoped engine configuration keys and their defaults — the
    * registry behind `CALL <cat>.system.get_configs()` (the reference's
    * `sys.get_cluster_configs`, website/docs/engine-spark/procedures
    * .md:62-99; source DEFAULT vs DYNAMIC maps to DEFAULT vs SESSION
    * here, since a library engine's dynamic scope IS the Spark session).
    */
  val configDefaults: Map[String, String] = Map(
    "spark.sql.graft.read.optimized" -> "false",
    "spark.sql.graft.scan.startup.mode" -> "earliest")

  /** '7d' / '12h' / '30m' / '45s' / plain milliseconds → millis (the
    * reference's Duration-typed `table.log.ttl`).
    */
  private[connector] def parseTtlMillis(s: String): Long = {
    val t = s.trim.toLowerCase
    require(t.nonEmpty, "empty ttl")
    val (num, unit) = t.last match {
      case 'd' => (t.dropRight(1), 86400000L)
      case 'h' => (t.dropRight(1), 3600000L)
      case 'm' => (t.dropRight(1), 60000L)
      case 's' => (t.dropRight(1), 1000L)
      case _ => (t, 1L)
    }
    val n = try num.trim.toLong catch {
      case _: NumberFormatException => throw new IllegalArgumentException(
        s"bad ttl '$s' (expected <n>[d|h|m|s] or milliseconds)")
    }
    require(n >= 0, s"ttl '$s' must be non-negative")
    n * unit
  }

  def load(catalog: GraftCatalog, name: String): Option[UnboundProcedure] =
    name match {
      case "compact" => Some(proc(catalog, "compact",
        Seq(in("table", StringType)),
        out("result", StringType)) { (t, _) =>
        t.compact(); s"snapshot written at offsets ${t.latestOffsets}"
      })
      case "vacuum_log" => Some(proc(catalog, "vacuum_log",
        Seq(in("table", StringType)),
        out("result", StringType)) { (t, _) =>
        t.vacuumLog(); "log vacuumed to the snapshot cutoff"
      })
      case "rewrite_files" => Some(proc(catalog, "rewrite_files",
        Seq(in("table", StringType),
          in("max_records_per_file", LongType, Some("0")),
          in("zorder_by", StringType, Some("''"))),
        out("result", StringType)) { (t, row) =>
        // zorder_by 'table' reads the table's own `table.rewrite.zorder-by`
        // property (settable via ALTER TABLE ... SET TBLPROPERTIES) — the
        // shape a maintenance loop over many tables uses
        val spec = row.getUTF8String(2).toString match {
          case "table" => t.desc.properties.getOrElse(
            "table.rewrite.zorder-by", throw new IllegalArgumentException(
              "table.rewrite.zorder-by is not set on this table; pass " +
                "explicit columns like 'c1,c2' or set the property"))
          case explicit => explicit
        }
        val zcols = spec.split(",").map(_.trim).filter(_.nonEmpty).toSeq
        t.rewriteLogFiles(row.getLong(1), zorderBy = zcols)
        if (zcols.isEmpty) "log rewritten to one file per (partition, bucket)"
        else s"log rewritten, z-ordered by ${zcols.mkString(",")}"
      })
      case "create_index" => Some(proc(catalog, "create_index",
        Seq(in("table", StringType), in("index_table", StringType),
          in("columns", StringType)),
        out("result", StringType)) { (t, row) =>
        val qualified = row.getUTF8String(1).toString
        val parts = qualified.split('.')
        require(parts.length == 2, s"index_table must be 'db.name', got '$qualified'")
        val cols = row.getUTF8String(2).toString
          .split(",").map(_.trim).filter(_.nonEmpty).toSeq
        val si = graft.core.SecondaryIndex.create(
          catalog.coreCatalog, parts(0), parts(1), t, cols)
        s"index $qualified on (${cols.mkString(",")}) built at base version " +
          s"${si.appliedVersion}"
      })
      case "refresh_index" => Some(proc(catalog, "refresh_index",
        Seq(in("table", StringType), in("index_table", StringType)),
        out("result", StringType)) { (t, row) =>
        val idx = catalog.tableForProcedure(row.getUTF8String(1).toString)
        // the index's bucket keys ARE its index columns (SecondaryIndex.create)
        val si = graft.core.SecondaryIndex.open(t, idx, idx.desc.bucketKeys)
        si.refresh()
        s"index refreshed to base version ${si.appliedVersion}"
      })
      case "remove_orphan_files" => Some(proc(catalog, "remove_orphan_files",
        Seq(in("table", StringType),
          in("staging_older_than", StringType, Some("'24h'"))),
        out("result", StringType)) { (t, row) =>
        t.removeOrphanFiles(parseTtlMillis(row.getUTF8String(1).toString))
        "orphan files removed"
      })
      case "expire_log" => Some(proc(catalog, "expire_log",
        Seq(in("table", StringType),
          in("ttl", StringType, Some("'table'"))),
        out("dropped", LongType)) { (t, row) =>
        // ttl 'table' reads the table's own `table.log.ttl` property
        // (ConfigOptions.java:1814), settable via ALTER TABLE ... SET
        val ttl = row.getUTF8String(1).toString match {
          case "table" => parseTtlMillis(t.desc.properties.getOrElse(
            "table.log.ttl", throw new IllegalArgumentException(
              "table.log.ttl is not set on this table; pass an explicit " +
                "ttl like '7d' or set the property")))
          case explicit => parseTtlMillis(explicit)
        }
        Long.box(t.expireLog(ttl))
      })
      case "expire_partitions" => Some(proc(catalog, "expire_partitions",
        Seq(in("table", StringType), in("partition_col", StringType),
          in("cutoff", StringType)),
        out("expired", IntegerType)) { (t, row) =>
        Int.box(t.expirePartitions(
          row.getUTF8String(1).toString, row.getUTF8String(2).toString))
      })
      case "maintain_partitions" => Some(proc(catalog, "maintain_partitions",
        Seq(in("table", StringType),
          in("time_unit", StringType, Some("'day'")),
          in("pre_create", IntegerType, Some("2")),
          in("retain", IntegerType, Some("7"))),
        out("result", StringType)) { (t, row) =>
        // time_unit 'table' reads the policy from the table's own
        // `table.auto-partition.*` properties (the reference's per-table
        // options, set via ALTER TABLE ... SET TBLPROPERTIES) — the shape
        // a scheduler loop over all tables uses
        val policy = row.getUTF8String(1).toString.toLowerCase match {
          case "table" => AutoPartitionPolicy.fromProperties(t.desc.properties)
            .getOrElse(throw new IllegalArgumentException(
              "table.auto-partition.enabled is not 'true' on this table"))
          case unit => AutoPartitionPolicy(
            timeUnit = AutoPartitionPolicy.unitOf(unit),
            numPreCreate = row.getInt(2), numToRetain = row.getInt(3))
        }
        val (created, expired) = t.maintainPartitions(policy,
          java.time.Instant.now())
        s"pre-created ${created.mkString("[", ",", "]")}, " +
          s"expired ${expired.mkString("[", ",", "]")}"
      })
      case "get_configs" => Some(new UnboundProcedure with BoundProcedure {
        private val schema = StructType(Seq(
          StructField("config_key", StringType, nullable = false),
          StructField("config_value", StringType, nullable = false),
          StructField("config_source", StringType, nullable = false)))
        override def name(): String = "get_configs"
        override def description(): String =
          "engine configuration values (key, value, DEFAULT|SESSION)"
        override def bind(inputType: StructType): BoundProcedure = this
        override def parameters(): Array[ProcedureParameter] =
          Array(in("config_keys", StringType, Some("''")))
        override def isDeterministic: Boolean = false // reflects session state
        override def call(input: InternalRow): java.util.Iterator[Scan] = {
          val spark = org.apache.spark.sql.SparkSession.active
          val wanted = input.getUTF8String(0).toString
            .split(",").map(_.trim).filter(_.nonEmpty).toSet
          // registry defaults overlaid with session overrides, plus any
          // ad-hoc spark.sql.graft.* keys SET in this session
          val sessionGraft = spark.conf.getAll.filter {
            case (k, _) => k.startsWith("spark.sql.graft.") }
          val resultRows = (configDefaults.keySet ++ sessionGraft.keySet).toSeq.sorted
            .filter(k => wanted.isEmpty || wanted.contains(k))
            .map { k =>
              val session = sessionGraft.get(k)
              new GenericInternalRow(Array[Any](
                UTF8String.fromString(k),
                UTF8String.fromString(
                  session.orElse(configDefaults.get(k)).getOrElse("")),
                UTF8String.fromString(
                  if (session.isDefined) "SESSION" else "DEFAULT")))
            }
          val scan: Scan = new LocalScan {
            override def readSchema(): StructType = schema
            override def rows(): Array[InternalRow] = resultRows.toArray
          }
          java.util.Collections.singletonList(scan).iterator()
        }
      })
      case _ => None
    }

  private def in(name: String, dt: DataType,
      default: Option[String] = None): ProcedureParameter = {
    val b = ProcedureParameter.in(name, dt)
    default.foreach(b.defaultValue)
    b.build()
  }

  private def out(name: String, dt: DataType): StructType =
    StructType(Seq(StructField(name, dt, nullable = false)))

  /** Bound+unbound in one: our procedures take literal maintenance args,
    * so bind() has nothing to specialize.
    */
  private def proc(catalog: GraftCatalog, procName: String,
      params: Seq[ProcedureParameter], outSchema: StructType)(
      body: (GraftTable, InternalRow) => Any): UnboundProcedure =
    new UnboundProcedure with BoundProcedure {
      override def name(): String = procName
      override def description(): String = s"graft maintenance procedure $procName"
      override def bind(inputType: StructType): BoundProcedure = this
      override def parameters(): Array[ProcedureParameter] = params.toArray
      override def isDeterministic: Boolean = false // mutates table state
      override def call(input: InternalRow): java.util.Iterator[Scan] = {
        val table = catalog.tableForProcedure(input.getUTF8String(0).toString)
        val result = body(table, input) match {
          case s: String => UTF8String.fromString(s)
          case other => other
        }
        val scan: Scan = new LocalScan {
          override def readSchema(): StructType = outSchema
          override def rows(): Array[InternalRow] =
            Array(new GenericInternalRow(Array[Any](result)))
        }
        java.util.Collections.singletonList(scan).iterator()
      }
    }
}
