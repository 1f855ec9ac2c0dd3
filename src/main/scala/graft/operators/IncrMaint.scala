package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.index.IndexCatalog

/**
 * Shared incremental-maintenance plumbing for artifacts that live over a
 * [[Segments]] store (the reference's optimizer contract,
 * crates/index/src/optimizing/mod.rs:58-104: appends touch only new
 * segments; deletes are tombstone versions; compaction promotes without
 * rebuilding). Used by [[IncrIvf]] and [[IncrQuant]] — [[IncrHnsw]]
 * predates it and keeps its graph-file-specific variant.
 *
 * Visibility rule (crates/index/src/delete.rs:45-51 analog): a row
 * written at version `_ver` is visible unless a tombstone for its id
 * exists at `_tomb_ver >= _ver`. Live tombstones come from the store;
 * compaction snapshots them into the index's `dead/` parquet BEFORE
 * [[Segments.compact]] deletes them (promote-on-compact), so visibility
 * survives the store folding its history.
 */
object IncrMaint {

  def deadDir(spark: SparkSession, name: String): java.io.File =
    new java.io.File(IndexCatalog.dir(spark, name), "dead")

  private def deadFrame(spark: SparkSession, name: String): Option[DataFrame] = {
    val dd = deadDir(spark, name)
    if (dd.isDirectory && Option(dd.listFiles()).getOrElse(Array.empty)
        .exists(_.getName.endsWith(".parquet")))
      Some(spark.read.parquet(dd.getAbsolutePath))
    else None
  }

  /** (seq, dir) of committed deltas with seq > afterSeq — the shared
    * shape of every incremental family's "what is new" question
    * (round 16: the families batch all new deltas into ONE write job,
    * so the list is materialized once instead of looped). */
  def deltasAfter(segDir: String, st: Segments.State,
      afterSeq: Long): Seq[(Long, String)] =
    Segments.deltaDirs(segDir, st).map { dd =>
      (new java.io.File(dd).getName.stripPrefix("delta-").toLong, dd)
    }.filter(_._1 > afterSeq)

  /** Promoted-dead ∪ live tombstones, max version per id. */
  def tombstones(spark: SparkSession, name: String, segDir: String,
      idCol: String): Option[DataFrame] = {
    val dead = deadFrame(spark, name)
    val live = Segments.tombstoneMax(spark, segDir, idCol)
    (dead, live) match {
      case (Some(a), Some(b)) => Some(a.unionByName(b)
        .groupBy(col(idCol)).agg(max(col("_tomb_ver")).as("_tomb_ver")))
      case (a, b) => a.orElse(b)
    }
  }

  /** Version-filter a scan carrying `_ver` against the broadcast
    * tombstones (rows are data, not graph candidates — filtering BEFORE
    * top-k needs no over-fetch). */
  def visible(scan: DataFrame, tombs: Option[DataFrame], idCol: String): DataFrame =
    tombs match {
      case Some(t) => scan.join(broadcast(t), Seq(idCol), "left_outer")
        .filter(col("_tomb_ver").isNull || col("_tomb_ver") < col("_ver"))
        .drop("_tomb_ver")
      case None => scan
    }

  /** Full optimize (the reference's vacuum-analog rebuild,
    * crates/index/src/optimizing/mod.rs:58-104 when every segment is
    * selected): fold the store, discard the promoted-dead snapshot (the
    * rebuilt artifact contains no dead rows for it to hide), drop the
    * artifact and re-ensure from scratch — reclaiming tombstoned rows
    * and refreshing drifted quantizers/centroids. The deliberately
    * expensive path; incremental ensure covers the common append case.
    * `reEnsure` is the family's own ensure call, run after the drop.
    *
    * Single-writer contract: between the drop and the re-ensure there is
    * a window with no committed manifest, so a CONCURRENT search on the
    * same index name would throw "no committed index". vacuum is a
    * maintenance operation scheduled by the single batch driver (the
    * reference's optimizer bgworker likewise owns the index exclusively
    * while optimizing, crates/index/src/optimizing/mod.rs); it does not
    * serialize against readers, only against other maintenance calls. */
  def vacuum(spark: SparkSession, name: String, segDir: String,
      idCol: String)(reEnsure: => String): String = synchronized {
    Segments.compact(spark, segDir, idCol)
    // drop removes the whole index dir — including the promoted-dead
    // snapshot, which the rebuilt artifact has no dead rows to need
    IndexCatalog.drop(spark, name)
    reEnsure
  }

  /** Compact the store WITHOUT rebuilding the artifact: snapshot live
    * tombstones into `dead/` (write-then-rename publish), fold the data
    * side, record the promoted generation on the manifest. */
  def promoteOnCompact(spark: SparkSession, name: String, segDir: String,
      idCol: String): Unit = synchronized {
    val dd = deadDir(spark, name)
    Segments.tombstoneMax(spark, segDir, idCol).foreach { tombs =>
      val all = deadFrame(spark, name)
        .map(_.unionByName(tombs)).getOrElse(tombs)
        .groupBy(col(idCol)).agg(max(col("_tomb_ver")).as("_tomb_ver"))
      val tmp = new java.io.File(dd.getParentFile, "dead.tmp")
      all.write.mode("overwrite").parquet(tmp.getAbsolutePath)
      def rm(f: java.io.File): Unit = { if (f.isDirectory)
        Option(f.listFiles()).getOrElse(Array.empty).foreach(rm); f.delete() }
      if (dd.exists()) rm(dd)
      if (!tmp.renameTo(dd))
        throw new java.io.IOException(s"failed to publish $dd")
    }
    Segments.compact(spark, segDir, idCol)
    val newSt = Segments.state(segDir)
    val pm = IndexCatalog.load(spark, name).getOrElse(
      throw new IllegalStateException(s"no index $name to promote"))
    IndexCatalog.commit(spark, name, pm.copy(params =
      pm.params ++ Map("promoted_gen" -> newSt.gen.toString,
        "seq" -> newSt.seq.toString)))
  }
}
