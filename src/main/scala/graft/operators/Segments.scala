package graft.operators

import java.io.File
import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Incremental table maintenance — the Spark shape of the reference's
 * segment lifecycle: a sealed `base` generation, append-only growing
 * `delta` segments (crates/index/src/segment/growing.rs:132-158 aminsert
 * analog), a versioned tombstone table (crates/index/src/delete.rs:10-75:
 * a delete at version v hides every row of that id with version <= v;
 * re-insert writes a higher version), and a compaction job that folds
 * base+deltas-tombstones into the next sealed generation
 * (crates/index/src/optimizing/mod.rs:58-104).
 *
 * Crash recovery follows the manifest rule (crates/index/src/lib.rs:
 * 128-211): data directories are written FIRST, the VERSION pointer is
 * swapped LAST (atomic rename); a generation directory without a
 * committed pointer is garbage and gets ignored/cleaned.
 *
 * Layout under `dir`:
 *   VERSION            committed state: "gen=<g> seq=<s>"
 *   base-<g>/          sealed generation parquet
 *   delta-<s>/         growing segments appended since gen g
 *   tombs-<s>/         tombstone parquet (id, _ver)
 *
 * Scale shape: read() is base ∪ deltas with one anti-join against the
 * (small, broadcastable) tombstone set; compaction is the only full
 * rewrite and runs offline, exactly like the reference's optimizer
 * thread.
 */
object Segments {

  case class State(gen: Long, seq: Long)

  private def versionFile(dir: String) = new File(dir, "VERSION")

  def state(dir: String): State = {
    val f = versionFile(dir)
    if (!f.isFile) State(-1L, 0L)
    else {
      val kv = Files.readString(f.toPath).trim.split("\\s+")
        .map(_.split("=")).map(a => a(0) -> a(1).toLong).toMap
      State(kv("gen"), kv("seq"))
    }
  }

  /** Atomic pointer swap — the commit point. */
  private def commit(dir: String, s: State): Unit = {
    val tmp = Paths.get(dir, "VERSION.tmp")
    Files.writeString(tmp, s"gen=${s.gen} seq=${s.seq}\n")
    Files.move(tmp, versionFile(dir).toPath,
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  /** Create generation 0 from `df` (rows get version 0). */
  def init(spark: SparkSession, dir: String, df: DataFrame, idCol: String): Unit = {
    new File(dir).mkdirs()
    df.withColumn("_ver", lit(0L))
      .write.mode("overwrite").parquet(s"$dir/base-0")
    commit(dir, State(0L, 0L))
  }

  /** Append a growing delta; an insert of an existing id shadows older
    * versions via the paired tombstone (reinsert = delete + insert). */
  def append(spark: SparkSession, dir: String, df: DataFrame, idCol: String,
      shadow: Boolean = true): Long = {
    val s = state(dir)
    val seq = s.seq + 1
    df.withColumn("_ver", lit(seq))
      .write.mode("overwrite").parquet(s"$dir/delta-$seq")
    if (shadow)
      df.select(col(idCol)).distinct().withColumn("_ver", lit(seq) - 1)
        .write.mode("overwrite").parquet(s"$dir/tombs-$seq")
    commit(dir, s.copy(seq = seq))
    seq
  }

  /** Tombstone the given ids as of the next version. */
  def delete(spark: SparkSession, dir: String, ids: DataFrame, idCol: String): Long = {
    val s = state(dir)
    val seq = s.seq + 1
    ids.select(col(idCol)).distinct().withColumn("_ver", lit(seq))
      .write.mode("overwrite").parquet(s"$dir/tombs-$seq")
    commit(dir, s.copy(seq = seq))
    seq
  }

  private def listDirs(dir: String, prefix: String, state: State): Seq[String] =
    Option(new File(dir).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith(prefix))
      .filter(_.getName.stripPrefix(prefix).toLong <= state.seq)
      .map(_.getAbsolutePath).toSeq.sorted

  def deltaDirs(dir: String, s: State): Seq[String] = listDirs(dir, "delta-", s)

  /** Max tombstone version per id, or None if no tombstones committed. */
  def tombstoneMax(spark: SparkSession, dir: String, idCol: String): Option[DataFrame] = {
    val tombDirs = listDirs(dir, "tombs-", state(dir))
    if (tombDirs.isEmpty) None
    else Some(tombDirs.map(spark.read.parquet(_)).reduce(_ unionByName _)
      .groupBy(col(idCol)).agg(max(col("_ver")).as("_tomb_ver")))
  }

  /** Snapshot read: base ∪ committed deltas, minus rows hidden by a
    * tombstone of the same id at version >= the row's version. */
  def read(spark: SparkSession, dir: String, idCol: String): DataFrame = {
    val s = state(dir)
    require(s.gen >= 0, s"no committed generation under $dir")
    val parts = s"$dir/base-${s.gen}" +: deltaDirs(dir, s)
    val rows = parts.map(spark.read.parquet(_)).reduce(_ unionByName _)
    tombstoneMax(spark, dir, idCol) match {
      case None => rows
      case Some(tombs) =>
        rows.join(broadcast(tombs), Seq(idCol), "left_outer")
          .filter(col("_tomb_ver").isNull || col("_tomb_ver") < col("_ver"))
          .drop("_tomb_ver")
    }
  }

  /** Fold everything visible into the next sealed generation; data first,
    * pointer swap last, old dirs cleaned only after the commit. */
  def compact(spark: SparkSession, dir: String, idCol: String): Unit = {
    val s = state(dir)
    val nextGen = s.gen + 1
    read(spark, dir, idCol).withColumn("_ver", lit(0L))
      .write.mode("overwrite").parquet(s"$dir/base-$nextGen")
    commit(dir, State(nextGen, s.seq))  // <- crash before here: old gen wins
    // post-commit cleanup (safe to redo after a crash)
    Option(new File(dir).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory &&
        (f.getName.startsWith("delta-") || f.getName.startsWith("tombs-") ||
          (f.getName.startsWith("base-") && f.getName != s"base-$nextGen")))
      .foreach(del)
  }

  private def del(f: File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(del)
    f.delete()
  }
}
