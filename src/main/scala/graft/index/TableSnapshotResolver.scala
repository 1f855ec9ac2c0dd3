package graft.index

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * SPI for TRANSACTIONAL table providers (Delta, Iceberg): their
 * locations are NOT a stable file list — the live content is one
 * committed snapshot, and stale/uncommitted files legitimately coexist
 * in the same directory, so scanning the location directly would
 * silently index wrong rows. The provider jars cannot be compiled
 * against in this build (offline resolver — SURVEY §2.0 row 30 records
 * the rejection and the DeltaLog.snapshot design), so integration is a
 * reflection-resolved seam: a provider-equipped cluster sets
 *
 * {{{ spark.graft.snapshot.resolver = com.example.DeltaResolver }}}
 *
 * naming a zero-arg class implementing [[TableSnapshotResolver]]. The
 * Delta shape of such a resolver is
 * `DeltaLog.forTable(spark, path).update()` → `snapshot.allFiles`
 * (absolute parquet paths) + `snapshot.version`; Iceberg's is
 * `table.currentSnapshot()` → data files + `snapshotId`.
 *
 * The engine consults the resolver at every index build entry
 * ([[SqlDdl]] create/vacuum): builds scan exactly the snapshot's file
 * list, and the snapshot `version` token joins the recorded recipe
 * (`sql_snapshot`) so a NEW COMMIT forces REINDEX on the next
 * CREATE/VACUUM instead of silently no-oping the idempotent-ensure
 * staleness check (dir mtimes alone cannot distinguish a new snapshot
 * from compaction debris). The version is resolved BEFORE the build —
 * a commit racing the build errs toward one extra rebuild, never toward
 * serving pre-commit rows as current (the ensure fingerprint ordering).
 */
trait TableSnapshotResolver {
  /** Some(snapshot) when `location` is a table this resolver owns;
    * None → plain parquet file-listing semantics. Must be driver-cheap
    * (metadata only — it runs inside DDL commands, never in a task). */
  def resolve(spark: SparkSession, location: String)
      : Option[TableSnapshotResolver.Snapshot]
}

object TableSnapshotResolver {
  /** `files`: the snapshot's data files (absolute parquet paths);
    * `version`: an opaque token identifying the snapshot — joins the
    * index staleness recipe so a new commit forces REINDEX. Must not
    * contain control characters (the single-line recipe rule). */
  case class Snapshot(files: Seq[String], version: String)

  val ConfKey = "spark.graft.snapshot.resolver"

  // one instance per class name — resolvers are expected stateless
  private val instances =
    new java.util.concurrent.ConcurrentHashMap[String, TableSnapshotResolver]()

  /** The configured resolver, reflection-instantiated once per class
    * name. None when unset — the common parquet-only deployment pays
    * one conf read. */
  def configured(spark: SparkSession): Option[TableSnapshotResolver] =
    spark.conf.getOption(ConfKey).map(_.trim).filter(_.nonEmpty).map { cn =>
      instances.computeIfAbsent(cn, c =>
        Class.forName(c).getDeclaredConstructor().newInstance()
          .asInstanceOf[TableSnapshotResolver])
    }

  /** The snapshot for `location`, when a resolver is configured AND
    * owns it. */
  def snapshotOf(spark: SparkSession, location: String): Option[Snapshot] =
    configured(spark).flatMap(_.resolve(spark, location))

  /** The frame an index build scans for `location`: the snapshot's file
    * list when resolver-owned (never the raw dir — it holds stale/
    * uncommitted files too), the plain parquet read otherwise. */
  def readSource(spark: SparkSession, location: String): DataFrame =
    snapshotOf(spark, location) match {
      case Some(s) => spark.read.parquet(s.files: _*)
      case None => graft.ParquetCache.read(spark, location)
    }
}
