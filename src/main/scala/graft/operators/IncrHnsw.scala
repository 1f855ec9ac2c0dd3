package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Incremental HNSW maintenance over a [[Segments]] store — the Spark
 * shape of the reference's sealed-graph patching
 * (crates/hnsw/src/lib.rs:198-235 `patch_insertions`/`patch_deletions`):
 * an append must NOT trigger a full-source rebuild.
 *
 *  - The sealed base generation gets per-partition graphs once
 *    (`base-<gen>-NNNNN.bin`).
 *  - Each appended delta gets ONE small side graph (`side-<seq>.bin`)
 *    built over just that delta's rows; existing graph files are never
 *    rewritten (mtime-stable — the spec asserts it).
 *  - Deletes need no graph work: searches version-filter against the
 *    live tombstones, exactly like [[HybridSearch]].
 *  - Compaction PROMOTES side graphs instead of rebuilding: the current
 *    tombstone versions are snapshotted into the index's `dead/` parquet
 *    (graphs keep dead rows resident, filtered at search — the
 *    reference's version map over sealed segments), then
 *    [[Segments.compact]] folds the data side. A later full re-ensure
 *    (vacuum analog) reclaims dead residency.
 *
 * Every graph file encodes the segment VERSION its rows carry (base = 0,
 * side-<s> = s), so the tombstone rule "a tombstone at v hides rows with
 * version <= v" applies per graph file.
 */
object IncrHnsw {

  /** Stored-graph layout generation — tracks the plain hnsw kind's
    * format key (flatbin2 = snapshot-time connectivity repair, round 8):
    * graph bytes come from the same Graph.snapshot, so an edge-layout
    * change there must invalidate incremental artifacts too. */
  private val GraphFormat = "flatbin2"

  private def graftDir(spark: SparkSession, name: String): String =
    graft.index.IndexCatalog.dataDir(spark, name)

  private def binFiles(dir: java.io.File): Seq[java.io.File] =
    Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.endsWith(".bin")).toSeq.sortBy(_.getName)

  /** Version the rows of a graph file carry: side-<seq>.bin and
    * side-<seq>-<chunk>.bin -> seq, rebase-<seq>-*.bin (a REINDEX fold,
    * whose rows were visible at store seq <seq>) -> seq, base graphs
    * -> 0. */
  private def fileVer(name: String): Long =
    if (name.startsWith("side-"))
      name.stripPrefix("side-").stripSuffix(".bin").split("-")(0).toLong
    else if (name.startsWith("rebase-"))
      name.stripPrefix("rebase-").stripSuffix(".bin").split("-")(0).toLong
    else 0L

  /** Build one side/base-chunk graph in ONE EXECUTOR TASK (round-6: the
    * former driver-side collect+insert serialized every append on the
    * driver). The chunk is shuffled to a single sorted partition and the
    * task inserts in id order — the exact insertion sequence of the old
    * driver build, so the published file is byte-identical (the spec
    * asserts it against an in-test reference build). Write-then-rename
    * with an attempt-unique tmp, like the base build
    * (Hnsw.ensure:583-609): retried/speculative tasks never interleave
    * and readers never see partials. */
  private def buildGraphFile(spark: SparkSession, rows: DataFrame,
      idCol: String, vecCol: String, metric: String, out: java.io.File,
      m: Int, efConstruction: Int): Unit = {
    import spark.implicits._
    out.getParentFile.mkdirs()
    val outPath = out.getAbsolutePath
    val parentPath = out.getParentFile.getAbsolutePath
    val outName = out.getName
    val hconf = Hnsw.confEntries(spark)
    rows.filter(col(vecCol).isNotNull &&
        graft.functions.vectorIsFinite(col(vecCol)))
      .select(col(idCol).cast("long"), col(vecCol))
      .as[(Long, Array[Float])]
      .repartition(1).sortWithinPartitions(col(idCol))
      .mapPartitions { it =>
        val g = new Hnsw.Graph(metric, m, efConstruction)
        it.foreach { case (id, v) => g.insert(id, v) }
        if (g.size == 0) Iterator.empty
        else {
          val attempt = org.apache.spark.TaskContext.get().taskAttemptId()
          val p = new org.apache.hadoop.fs.Path(outPath)
          val tmp = new org.apache.hadoop.fs.Path(parentPath,
            s".$outName-$attempt.tmp")
          val pfs = p.getFileSystem(Hnsw.mkConf(hconf))
          val os = new java.io.DataOutputStream(
            new java.io.BufferedOutputStream(pfs.create(tmp, true), 1 << 20))
          try Hnsw.FlatGraph.write(os, g.snapshot) finally os.close()
          if (!pfs.rename(tmp, p)) {
            if (!pfs.exists(p))
              throw new java.io.IOException(s"failed to publish $p")
            pfs.delete(tmp, false)
          }
          Iterator.single(1)
        }
      }.collect()
    ()
  }

  /** Build the graph file(s) for one segment, each in one executor task
    * over at most [[Segments.maxGrowingRows]] rows: a segment within the
    * cap gets one file at `stem.bin`; an oversized one is hash-split on
    * the id into ceil(n/cap) files `stem-CCCCC.bin`, each an independent
    * searchable graph over a bounded slice (searches scan every resident
    * graph already, so more files = more bounded tasks, not a semantic
    * change). The cap bounds EXECUTOR task memory now — the driver holds
    * no rows at any point in an append. */
  private def buildSegmentGraphs(spark: SparkSession, rows: DataFrame,
      idCol: String, vecCol: String, metric: String,
      dataDir: java.io.File, stem: String, m: Int, efConstruction: Int): Unit = {
    val cap = Segments.maxGrowingRows(spark)
    val n = rows.count()
    if (n <= cap)
      buildGraphFile(spark, rows, idCol, vecCol, metric,
        new java.io.File(dataDir, s"$stem.bin"), m, efConstruction)
    else {
      // ONE shuffle + one job for the whole chunk set (round 16): the
      // former per-chunk loop ran nChunks sequential single-task jobs,
      // each rescanning the entire segment — O(nChunks) source scans
      // and a serial build wall that made a 5M-row full rebuild
      // driver-paced (the incr BigSmoke's first finding). Chunk
      // assignment (pmod(xxhash64(id), nChunks)) and per-chunk id-sorted
      // insertion are unchanged, so every published file is
      // byte-identical to the serial path's; the exact PidPartitioner
      // pins partition == chunk (hash repartition could collide chunks).
      import spark.implicits._
      val nChunks = ((n + cap - 1) / cap).toInt
      val writer = new SegmentGraphWriter(dataDir.getAbsolutePath, stem,
        metric, m, efConstruction, Hnsw.confEntries(spark))
      rows.filter(col(vecCol).isNotNull &&
          graft.functions.vectorIsFinite(col(vecCol)))
        .select(
          pmod(xxhash64(col(idCol).cast("long")), lit(nChunks.toLong))
            .cast("int").as("_chunk"),
          col(idCol).cast("long").as("_id"), col(vecCol))
        .as[(Int, Long, Array[Float])]
        .rdd.map { case (c, id, v) => (c, (id, v)) }
        .partitionBy(new Hnsw.PidPartitioner(nChunks))
        .map(_._2)
        .mapPartitions(writer.run _)
        .collect()
      ()
    }
  }

  /** Sync the index to the segment store's committed state, building
    * ONLY what is new: base graphs on first ensure (or after a gen
    * change from a non-promoted compaction), one side graph per
    * newly-appended delta otherwise. Returns the artifact dir.
    *
    * Graph builds run in executor tasks and are BOUNDED, not
    * assumed-small: every segment (base or delta) larger than
    * `spark.graft.segments.maxGrowingRows` is hash-split into multiple
    * graph files, so no single task exceeds the cap
    * ([[buildSegmentGraphs]] — the enforced form of the reference's
    * max_growing_segment_size sealing rule,
    * crates/base/src/index.rs:199-226). */
  def ensure(spark: SparkSession, name: String, segDir: String,
      idCol: String, vecCol: String, metric: String = "l2",
      m: Int = 12, efConstruction: Int = 300): String = synchronized {
    import graft.index.IndexCatalog
    val st = Segments.state(segDir)
    require(st.gen >= 0, s"no committed generation under $segDir")
    val dataDir = new java.io.File(graftDir(spark, name))
    val prior = IndexCatalog.load(spark, name)
      .filter(_.source == segDir)
      .filter(_.params.get("metric_int").contains(metric))
      // graph-layout generation: snapshot-time connectivity repair
      // (round 8) changed stored edges, so pre-repair artifacts (no
      // format key, or an older one) must full-rebuild — the staleness
      // invariant the plain hnsw kind satisfies via flatbin2
      .filter(_.params.get("format").contains(GraphFormat))
    val priorGen = prior.flatMap(_.params.get("gen")).map(_.toLong).getOrElse(-1L)
    val priorSeq = prior.flatMap(_.params.get("seq")).map(_.toLong).getOrElse(-1L)
    val promotedGen = prior.flatMap(_.params.get("promoted_gen")).map(_.toLong).getOrElse(-1L)
    val genOk = priorGen == st.gen || promotedGen == st.gen
    if (prior.isEmpty || !genOk) {
      // full (re)build: base graphs + a side graph per existing delta
      if (dataDir.exists()) { def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
        f.delete() }; rm(dataDir) }
      buildSegmentGraphs(spark, spark.read.parquet(s"$segDir/base-${st.gen}"),
        idCol, vecCol, metric, dataDir, f"base-${st.gen}-00000",
        m, efConstruction)
      Segments.deltaDirs(segDir, st).foreach { dd =>
        val seq = new java.io.File(dd).getName.stripPrefix("delta-").toLong
        buildSegmentGraphs(spark, spark.read.parquet(dd), idCol, vecCol, metric,
          dataDir, s"side-$seq", m, efConstruction)
      }
      IndexCatalog.commit(spark, name, IndexCatalog.Manifest(
        "hnsw_incr", segDir, metric,
        Map("gen" -> st.gen.toString, "seq" -> st.seq.toString,
          "metric_int" -> metric, "m" -> m.toString,
          "ef_construction" -> efConstruction.toString,
          "format" -> GraphFormat)))
    } else if (st.seq > priorSeq) {
      // incremental: ONLY deltas newer than what the index covers get a
      // side graph; existing files are untouched (deletes are pure
      // tombstone work — no graph change at all)
      Segments.deltaDirs(segDir, st).foreach { dd =>
        val seq = new java.io.File(dd).getName.stripPrefix("delta-").toLong
        if (seq > priorSeq)
          buildSegmentGraphs(spark, spark.read.parquet(dd), idCol, vecCol, metric,
            dataDir, s"side-$seq", m, efConstruction)
      }
      val pm = prior.get
      IndexCatalog.commit(spark, name, pm.copy(
        params = pm.params + ("seq" -> st.seq.toString)))
    }
    dataDir.getAbsolutePath
  }

  /** REINDEX over the segment store (reference
    * tests/sqllogictest/reindex.slt): rebuild ONE fresh graph set from
    * the current VISIBLE rows — dead rows reclaimed, side graphs folded,
    * the STORE untouched (vs [[vacuum]], which compacts the store too).
    * The build runs into a fresh generation dir while searches keep
    * serving the committed graphs ([[graft.index.IndexCatalog.reindex]]
    * — the REINDEX CONCURRENTLY property), and later appends still get
    * incremental side graphs: the committed manifest carries the store
    * (gen, seq) the fold covered.
    *
    * Fold files are named `rebase-<seq>-*` and their rows carry graph
    * version <seq> (the store seq the fold observed): every tombstone
    * already applied by the fold has version <= seq and tombstones are
    * per-id, so no surviving row can be hidden by an old tombstone,
    * while a LATER delete (version > seq) hides exactly as on side
    * graphs. */
  def reindex(spark: SparkSession, name: String, segDir: String,
      idCol: String, vecCol: String, metric: String = "l2",
      m: Int = 12, efConstruction: Int = 300): String = synchronized {
    import graft.index.IndexCatalog
    val st = Segments.state(segDir)
    require(st.gen >= 0, s"no committed generation under $segDir")
    IndexCatalog.reindex(spark, name) { dataDir =>
      val dd = new java.io.File(dataDir)
      dd.mkdirs()
      // the fold reads the snapshot pinned at `st` — an append that
      // commits during the build stays invisible here and gets its own
      // side graph from the next ensure (stamping st.seq while folding
      // a LATER delta would double-index it)
      buildSegmentGraphs(spark,
        Segments.readAt(spark, segDir, idCol, st)
          .select(col(idCol), col(vecCol)),
        idCol, vecCol, metric, dd, f"rebase-${st.seq}%d-00000",
        m, efConstruction)
      IndexCatalog.Manifest("hnsw_incr", segDir, metric,
        Map("gen" -> st.gen.toString, "seq" -> st.seq.toString,
          "metric_int" -> metric, "m" -> m.toString,
          "ef_construction" -> efConstruction.toString,
          "format" -> GraphFormat))
    }
    graftDir(spark, name)
  }

  /** Compact the segment store WITHOUT rebuilding graphs: snapshot the
    * live tombstone versions into the index's `dead/` parquet (those ids
    * stay resident in the graphs, filtered at search), then fold the
    * data side. Side graphs are hereby "promoted" — they simply remain
    * part of the sealed search set. */
  /** Full optimize: fold the store, rebuild base graphs from scratch —
    * reclaims tombstoned rows and folds side graphs into the base
    * (shared [[IncrMaint.vacuum]] contract). */
  def vacuum(spark: SparkSession, name: String, segDir: String,
      idCol: String, vecCol: String, metric: String = "l2",
      m: Int = 12, efConstruction: Int = 300): String =
    IncrMaint.vacuum(spark, name, segDir, idCol) {
      ensure(spark, name, segDir, idCol, vecCol, metric, m, efConstruction)
    }

  def promoteOnCompact(spark: SparkSession, name: String, segDir: String,
      idCol: String): Unit = synchronized {
    import graft.index.IndexCatalog
    val st = Segments.state(segDir)
    val deadDir = new java.io.File(graftDir(spark, name), "dead")
    Segments.tombstoneMax(spark, segDir, idCol).foreach { tombs =>
      val prior = if (deadDir.isDirectory && binOrParquetNonEmpty(deadDir))
        Some(spark.read.parquet(deadDir.getAbsolutePath)) else None
      val all = prior.map(_.unionByName(tombs)).getOrElse(tombs)
        .groupBy(col(idCol)).agg(max(col("_tomb_ver")).as("_tomb_ver"))
      // write-then-swap: never read and overwrite the same dir in one job
      val tmp = new java.io.File(deadDir.getParentFile, "dead.tmp")
      all.write.mode("overwrite").parquet(tmp.getAbsolutePath)
      def rm(f: java.io.File): Unit = { if (f.isDirectory)
        Option(f.listFiles()).getOrElse(Array.empty).foreach(rm); f.delete() }
      if (deadDir.exists()) rm(deadDir)
      if (!tmp.renameTo(deadDir))
        throw new java.io.IOException(s"failed to publish $deadDir")
    }
    Segments.compact(spark, segDir, idCol)
    val newSt = Segments.state(segDir)
    val pm = IndexCatalog.load(spark, name).getOrElse(
      throw new IllegalStateException(s"no index $name to promote"))
    // promoted_gen records that this index's graphs (base + sides) cover
    // the new generation without a rebuild
    IndexCatalog.commit(spark, name, pm.copy(params =
      pm.params ++ Map("promoted_gen" -> newSt.gen.toString,
        "seq" -> newSt.seq.toString)))
  }

  private def binOrParquetNonEmpty(dir: java.io.File): Boolean =
    Option(dir.listFiles()).getOrElse(Array.empty).exists(_.getName.endsWith(".parquet"))

  /** Search every resident graph (base + promoted + fresh sides), then
    * version-filter: a row from a graph carrying version v is hidden by
    * any tombstone (live OR promoted-dead) with _tomb_ver >= v. exact
    * mode flat-scans each graph — provably the visible-set top-k. */
  def search(spark: SparkSession, name: String, segDir: String,
      idCol: String, q: Array[Float], k: Int, efSearch: Int = 100,
      exact: Boolean = false): DataFrame = {
    import spark.implicits._
    val dataDir = new java.io.File(graftDir(spark, name))
    val files = binFiles(dataDir).map(f => (f.getAbsolutePath, fileVer(f.getName)))
    if (files.isEmpty)
      return spark.emptyDataset[(Long, Double)].toDF(idCol, "dist")
    val deadDir = new java.io.File(dataDir, "dead")
    val dead = if (deadDir.isDirectory && binOrParquetNonEmpty(deadDir))
      Some(spark.read.parquet(deadDir.getAbsolutePath)) else None
    val live = Segments.tombstoneMax(spark, segDir, idCol)
    val tombs = (dead, live) match {
      case (Some(a), Some(b)) => Some(a.unionByName(b)
        .groupBy(col(idCol)).agg(max(col("_tomb_ver")).as("_tomb_ver")))
      case (a, b) => a.orElse(b)
    }
    // the version filter runs AFTER the per-graph top-k, so each graph
    // over-fetches by the tombstone count — at most that many of its
    // candidates can be dead (tombstones are small by the lifecycle
    // contract: compaction folds them away)
    val deadCount = tombs.map(_.count()).getOrElse(0L)
    val fetch = math.min(k.toLong + deadCount, Int.MaxValue.toLong).toInt
    // per-graph BEAM headroom (round 13): ef == k beams lose
    // recoverable neighbors to local minima — the coded-graph rerank-
    // window precedent (round 5). At the former ef = max(efSearch,
    // fetch) the k=100 searches ran ef == k and incr_hnsw was the
    // RECALL ledger's lowest non-fixed-knob row; ef = 2x fetch measures
    // 0.96 -> 1.00 (clustered) and 0.99 -> 1.00 (random) at a beam-only
    // cost (the union/top-k stays k-bounded). Routing was considered
    // and rejected: the base fleet here is one graph + small side
    // graphs, so the loss was beam-local, not fleet-selection.
    val efMult = spark.conf.get("spark.graft.incrhnsw.efMult", "2").toInt
    val bq = spark.sparkContext.broadcast(q)
    val hconf = Hnsw.confEntries(spark)
    val hits = spark.sparkContext
      .parallelize(files, files.length)
      .mapPartitions { it =>
        val conf = Hnsw.mkConf(hconf)
        it.flatMap { case (f, ver) =>
          val g = Hnsw.GraphCache.get(f, conf)
          val res = if (exact) g.bruteForce(bq.value, fetch)
                    else g.search(bq.value, fetch,
                      math.max(efSearch, fetch * efMult))
          res.iterator.map { case (d, id) => (id, d, ver) }
        }
      }.toDF(idCol, "dist", "_gver")
    val visible = tombs match {
      case Some(t) => hits.join(broadcast(t), Seq(idCol), "left_outer")
        .filter(col("_tomb_ver").isNull || col("_tomb_ver") < col("_gver"))
        .drop("_tomb_ver")
      case None => hits
    }
    visible.select(col(idCol), col("dist"))
      .orderBy(col("dist"), col(idCol)).limit(k)
  }
}

/** Top-level serializable per-chunk graph writer for
  * [[IncrHnsw.buildSegmentGraphs]]'s parallel path (the GraphFileWriter
  * convention: a local def would capture the non-serializable IncrHnsw$
  * singleton). Sorts its partition by id and publishes
  * `<stem>-<pid>%05d.bin` write-then-rename with an attempt-unique tmp
  * — the serial buildGraphFile naming and bytes, task-parallel. */
private[graft] class SegmentGraphWriter(dataDir: String, stem: String,
    metric: String, m: Int, efConstruction: Int,
    hconf: Seq[(String, String)]) extends Serializable {
  def run(it: Iterator[(Long, Array[Float])]): Iterator[Int] = {
    val rows = it.toArray.sortBy(_._1)
    if (rows.isEmpty) Iterator.empty
    else {
      val g = new Hnsw.Graph(metric, m, efConstruction)
      rows.foreach { case (id, v) => g.insert(id, v) }
      val tc = org.apache.spark.TaskContext.get()
      val pid = tc.partitionId()
      val attempt = tc.taskAttemptId()
      val p = new org.apache.hadoop.fs.Path(f"$dataDir/$stem-$pid%05d.bin")
      val tmp = new org.apache.hadoop.fs.Path(
        f"$dataDir/.$stem-$pid%05d-$attempt.tmp")
      val pfs = p.getFileSystem(Hnsw.mkConf(hconf))
      val out = new java.io.DataOutputStream(
        new java.io.BufferedOutputStream(pfs.create(tmp, true), 1 << 20))
      try Hnsw.FlatGraph.write(out, g.snapshot) finally out.close()
      if (!pfs.rename(tmp, p)) {
        if (!pfs.exists(p))
          throw new java.io.IOException(s"failed to publish $p")
        pfs.delete(tmp, false)
      }
      Iterator.single(pid)
    }
  }
}
