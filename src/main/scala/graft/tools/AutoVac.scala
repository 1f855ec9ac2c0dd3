package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Auto-compaction (delete_threshold) cost measurement (round 17): a
  * 500k-row 64-dim segment store through the policy's three regimes —
  *
  *   - append-only sync: the explicit-tombstone cheap gate reads 0,
  *     policy evaluation is driver-side footer I/O only (no job);
  *   - 10% deleted: cheap bound below the 0.2 threshold — still no
  *     count job, sync stays O(delta);
  *   - 25% deleted: bound passes, ONE exact count job confirms, the
  *     store folds and the artifact rebuilds at the next ensure — the
  *     reference's background-optimizer compaction, executed at sync.
  *
  * Appends an "Auto-compaction" section to SOAK.md. Run:
  * `SPARK_GRAFT_CPUS=32 sbt "runMain graft.tools.AutoVac"`.
  */
object AutoVac {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.registerAll(spark)
    import graft.operators.{IncrIvf, IncrMaint, Segments}
    import graft.index.IndexCatalog

    val n = 500000L
    val dims = 64
    val dir = sys.props("java.io.tmpdir") + "/graft_autovac_soak"
    val name = "autovac_soak_ivf"
    def rm(f: java.io.File): Unit = { if (f.isDirectory)
      Option(f.listFiles()).getOrElse(Array.empty).foreach(rm); f.delete() }
    rm(new java.io.File(dir)); IndexCatalog.drop(spark, name)
    def wall(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    val rows = spark.range(n).select(col("id").as("vec_id"),
      expr(s"transform(sequence(0, ${dims - 1}), j -> " +
        "CAST(pmod(xxhash64(id * 31 + j), 1000) / 1000.0 AS FLOAT))")
        .as("embedding"))
    Segments.init(spark, dir, rows, "vec_id")
    val tBase = wall { IncrIvf.ensure(spark, name, dir, "vec_id",
      "embedding", nlist = 64) }
    println(f"[autovac] base build ($n%d rows) ${tBase}%.1f s")

    // append-only sync: 20k fresh ids — the policy must stay footer-only
    Segments.append(spark, dir,
      rows.filter(col("vec_id") < 20000)
        .select((col("vec_id") + n).as("vec_id"), col("embedding")),
      "vec_id", shadow = true)
    val tAppendSync = wall { IncrIvf.ensure(spark, name, dir, "vec_id",
      "embedding", nlist = 64) }
    val tEvalClean = wall {
      require(!IncrMaint.vacuumDue(spark, name, dir, "vec_id"))
    }
    println(f"[autovac] append sync ${tAppendSync}%.1f s; " +
      f"policy eval (clean, footer-only) ${tEvalClean * 1000}%.0f ms")

    // 10% explicit deletes: bound 0.10 < 0.2 — still no count job
    Segments.delete(spark, dir,
      spark.range(n / 10).select((col("id") * 10).as("vec_id")), "vec_id")
    val tEval10 = wall {
      require(!IncrMaint.vacuumDue(spark, name, dir, "vec_id"))
    }
    val tSync10 = wall { IncrIvf.ensure(spark, name, dir, "vec_id",
      "embedding", nlist = 64) }
    println(f"[autovac] 10%% deleted: policy eval ${tEval10 * 1000}%.0f ms " +
      f"(cheap-gated, no job), sync ${tSync10}%.1f s, no fold " +
      f"(gen ${Segments.state(dir).gen}%d)")

    // +15% more (25% total): exact confirm + fold + rebuild at sync
    Segments.delete(spark, dir,
      spark.range(n / 10, n / 4).select((col("id") * 4 + 1).as("vec_id")),
      "vec_id")
    val tEval25 = wall {
      require(IncrMaint.vacuumDue(spark, name, dir, "vec_id"))
    }
    val visBefore = Segments.read(spark, dir, "vec_id").count()
    val tFold = wall { IncrIvf.ensure(spark, name, dir, "vec_id",
      "embedding", nlist = 64) }
    val st = Segments.state(dir)
    val visAfter = Segments.read(spark, dir, "vec_id").count()
    require(st.gen >= 1 && Segments.tombDirs(dir, st).isEmpty,
      "25% wave must fold at sync")
    require(visBefore == visAfter, s"fold changed visibility: " +
      s"$visBefore -> $visAfter")
    println(f"[autovac] 25%% deleted: exact confirm ${tEval25}%.2f s " +
      f"(one count job, memoized), fold+rebuild at sync ${tFold}%.1f s, " +
      f"visible $visAfter%d rows preserved")

    val table =
      f"""
## Auto-compaction (delete_threshold, round 17, one-off direct measurement)

The executed reference policy (index.rs:243-263 / optimizing/mod.rs:
58-104 — IncrMaint.vacuumIfDue at incremental sync) on a $n%d-row
64-dim store, local[$cpus%s]. The design claim under measurement: the
policy must cost footer I/O only until a real explicit-delete wave
crosses the threshold — append-only and under-threshold syncs stay
O(delta).

| item | value |
|---|---|
| base IncrIvf build ($n%d rows, nlist=64) | ${tBase}%.1f s |
| append-only sync (20k fresh ids, shadow tombstones ignored by the trigger) | ${tAppendSync}%.1f s |
| policy evaluation, clean store (footer-only, no job) | ${tEvalClean * 1000}%.0f ms |
| policy evaluation, 10%% deleted (cheap bound < 0.2, no job) | ${tEval10 * 1000}%.0f ms |
| exact confirm at 25%% (one count job, memoized per store state) | ${tEval25}%.2f s |
| fold + artifact rebuild at the triggering sync | ${tFold}%.1f s |
| visible rows before/after the fold | $visBefore%d / $visAfter%d (identical) |
"""
    val soak = java.nio.file.Paths.get("SOAK.md")
    if (java.nio.file.Files.exists(soak)) {
      val cur = java.nio.file.Files.readString(soak)
      val cut = cur.indexOf("\n## Auto-compaction (delete_threshold")
      val base = if (cut >= 0) {
        val rest = cur.substring(cut + 1)
        val nxt = rest.indexOf("\n## ")
        cur.substring(0, cut) + (if (nxt >= 0) rest.substring(nxt) else "")
      } else cur
      java.nio.file.Files.writeString(soak, base + table)
      println("[autovac] SOAK.md appendix updated")
    }
    IndexCatalog.drop(spark, name)
    rm(new java.io.File(dir))
    spark.stop()
  }
}
