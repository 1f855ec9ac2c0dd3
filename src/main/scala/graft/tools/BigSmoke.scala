package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One genuinely large single-node smoke (round 15): every other scale
  * claim in this repo extrapolates from sf0.1 + the 10× soak replicas
  * (20k vectors). This tool synthesizes a ~5M-row 64-dim clustered
  * corpus (~1.3 GB of raw float payload; mixture of 64 Gaussians via a
  * deterministic codegen hash — no driver-side row materialization, no
  * Math.random), builds the two flagship index families at fleet width
  * (hnsw parts=16, ivf nlist=1024), and records:
  *
  *   - build wall per family (the 1000-executor extrapolation basis:
  *     both builds are one-task-per-partition shapes),
  *   - routed scalar search p50/p95 over 64 queries (AUTO probing),
  *   - one 1000-query knn_join (the dataset-vs-dataset shape),
  *   - a 1M-doc minhash near-dup pass (documents replicated from sf0.1
  *     with token suffixes — the Soak independence convention).
  *
  * Appends the numbers to SOAK.md ("Large-corpus smoke" section) and
  * prints them. Fixture cached under /tmp/graft_bigsmoke (marker file);
  * artifacts go through the normal IndexCatalog root. Run:
  * `SPARK_DRIVER_MEM=48g SPARK_GRAFT_CPUS=32 sbt "runMain graft.tools.BigSmoke"`.
  * (The heap must come from SPARK_DRIVER_MEM — build.sbt feeds it to the
  * forked run JVM's -Xmx; a session-builder spark.driver.memory is inert
  * in local mode, the JVM is already running.)
  *
  * `incr` mode (round 16): the segment-store lifecycle at the same
  * scale — 5M-row base through Segments.init, IncrHnsw base build
  * (20k-row chunk fleet, the parallel one-job path), 10×50k appends
  * with per-append side-graph walls, search p50 as the graph count
  * grows, a 1% delete wave (the tombstone-overfetch serving path), and
  * the vacuum rebuild. Appends an "Incremental-store smoke" section to
  * SOAK.md. Run: `... sbt "runMain graft.tools.BigSmoke incr"`.
  *
  * High-dimensional mode (round 17): `dims=768 n=1000000` — every
  * prior scale measurement was 64-dim; production LLM embeddings are
  * 768–3072-dim, which multiplies graph bytes ~12×, presses the
  * GraphCache byte budget (served graphs may no longer co-reside), and
  * shifts build cost into distance kernels. The same flow runs at the
  * requested shape (doc dedup skipped — dim-independent), plus a
  * per-delta side-graph cadence (100k base + 3×20k appends) and the
  * GraphCache hit/load counters around the serving loop. Appends a
  * "High-dimensional smoke" section to SOAK.md.
  */
object BigSmoke {
  private var N = 5000000L
  private var Dims = 64
  private val Clusters = 64
  private val DocReps = 200

  private def hashNoise(idExpr: String, j: String): String =
    // the classic fract(sin(h)*43758.5453) shader hash: deterministic,
    // codegen-friendly, uniform-ish in [0,1)
    s"(sin($idExpr * 12.9898d + $j * 78.233d) * 43758.5453d) - " +
      s"floor((sin($idExpr * 12.9898d + $j * 78.233d) * 43758.5453d))"

  def main(args: Array[String]): Unit = {
    val src = args.headOption.filterNot(a => a.contains("=") ||
      a == "incr" || a == "serve").getOrElse("/root/testdata/sf0.1")
    args.collectFirst { case a if a.startsWith("dims=") =>
      a.stripPrefix("dims=").toInt }.foreach(Dims = _)
    args.collectFirst { case a if a.startsWith("n=") =>
      a.stripPrefix("n=").toLong }.foreach(N = _)
    val hd = Dims != 64
    val dir = sys.props("java.io.tmpdir") + "/graft_bigsmoke" +
      (if (hd) s"_d$Dims" else "")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      // heap comes from SPARK_DRIVER_MEM via build.sbt javaOptions —
      // setting spark.driver.memory here would be silently inert (local
      // mode: the driver JVM is already running; round-15 advice)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.registerAll(spark)

    // ---- corpus ----
    val embPath = s"$dir/embeddings.parquet"
    val docPath = s"$dir/documents.parquet"
    if (!new java.io.File(s"$embPath/_SUCCESS").exists) {
      val cRnd = new scala.util.Random(42)
      val flat = Array.fill(Clusters * Dims)(cRnd.nextGaussian().toFloat)
      val centers = typedlit(flat.toSeq)
      val t0 = System.nanoTime()
      spark.range(N).repartition(cpus.toInt * 2)
        .select(col("id").as("vec_id"),
          pmod(col("id"), lit(Clusters)).cast("int").as("c"))
        .withColumn("centers", centers)
        .withColumn("embedding", expr(
          s"transform(sequence(0, ${Dims - 1}), j -> " +
            s"element_at(centers, c * $Dims + j + 1) + " +
            s"CAST(0.5d * (${hashNoise("vec_id", "j")} - 0.5d) AS FLOAT))"))
        .withColumn("label", pmod(col("vec_id"), lit(10)).cast("int"))
        .select("vec_id", "embedding", "label")
        .write.mode("overwrite").parquet(embPath)
      println(f"[bigsmoke] corpus embeddings ${N}%d rows written in " +
        f"${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    if (!hd && !new java.io.File(s"$docPath/_SUCCESS").exists) {
      val d0 = spark.read.parquet(s"$src/documents.parquet")
      val t0 = System.nanoTime()
      (0 until DocReps).map { i =>
        val shifted = d0.withColumn("doc_id", col("doc_id") + lit(i.toLong * 10000000L))
        if (i == 0) shifted
        else shifted.withColumn("text",
          array_join(transform(split(col("text"), " "),
            x => concat(x, lit(s"_$i"))), " "))
      }.reduce(_.unionAll(_))
        .repartition(cpus.toInt * 2)
        .write.mode("overwrite").parquet(docPath)
      println(f"[bigsmoke] corpus documents written in " +
        f"${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    val embBytes = Option(new java.io.File(embPath).listFiles())
      .getOrElse(Array.empty).map(_.length()).sum
    val docBytes = Option(new java.io.File(docPath).listFiles())
      .getOrElse(Array.empty).map(_.length()).sum
    val nDocs = if (hd) 0L else spark.read.parquet(docPath).count()
    println(f"[bigsmoke] corpus: $N%d vectors x $Dims%d dims " +
      f"(${embBytes / 1e9}%.2f GB parquet, " +
      f"${N * Dims * 4 / 1e9}%.2f GB raw floats), $nDocs%d docs " +
      f"(${docBytes / 1e9}%.2f GB parquet)")

    def wall(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    if (args.contains("incr")) {
      runIncr(spark, dir, embPath, cpus)
      spark.stop()
      return
    }

    // ---- builds (drop first so the wall is a real build; pass
    // `serve` as an arg to keep existing artifacts and re-measure the
    // serving rows only) ----
    val serveOnly = args.contains("serve")
    // fleet width: `parts=N` arg (default 16 — deliberately UNDER the
    // corpus's 64 natural clusters, the configuration that exposed the
    // round-15 straggler and multi-island findings; parts=64 is the
    // intended one-graph-per-cluster recipe)
    val parts = args.collectFirst {
      case a if a.startsWith("parts=") => a.stripPrefix("parts=").toInt
    }.getOrElse(16)
    // build-quality knob: `efc=N` (default 100 — the build-wall
    // measurement setting; the gate fixtures build at 300, and recall
    // on uniform-noise sub-corpora tracks it)
    val efc = args.collectFirst {
      case a if a.startsWith("efc=") => a.stripPrefix("efc=").toInt
    }.getOrElse(100)
    val hName = s"bigsmoke_hnsw_p${parts}_e$efc" + (if (hd) s"_d$Dims" else "")
    val ivfName = "bigsmoke_ivf" + (if (hd) s"_d$Dims" else "")
    val nlist = if (hd) 256 else 1024
    val joinProbe = if (hd) 16 else 32
    import graft.operators.{Hnsw, IvfIndex, KnnJoin}
    import graft.index.IndexCatalog
    def emb = spark.read.parquet(embPath)
    if (!serveOnly) IndexCatalog.drop(spark, hName)
    val tHnsw = wall {
      Hnsw.ensure(spark, hName, emb, embPath, "vec_id",
        "embedding", "l2", parts = parts, m = 12, efConstruction = efc)
    }
    println(f"[bigsmoke] hnsw parts=$parts%d efc=$efc%d build ${tHnsw}%.1f s")
    if (!serveOnly) IndexCatalog.drop(spark, ivfName)
    val tIvf = wall {
      IvfIndex.ensure(spark, ivfName, emb, embPath, "embedding",
        "l2", nlist = nlist, maxIter = 4)
    }
    println(f"[bigsmoke] ivf nlist=$nlist%d build ${tIvf}%.1f s")

    // ---- routed scalar search p50/p95 (64 queries, AUTO probing) ----
    val hDir = IndexCatalog.dataDir(spark, hName)
    val qs = emb.filter(col("vec_id") % lit(N / 64) === 0)
      .select("embedding").collect().map(_.getSeq[Float](0).toArray)
    // warm the graph cache untimed with an EXACT pass (touches every
    // graph — a single routed warm-up query only loads its own route,
    // and the p95 then measures 100 MiB cold graph loads instead of
    // beam cost; the QPS convention is caches-warm serving)
    Hnsw.searchIndex(spark, hDir, "vec_id", qs.head, 10, exact = true)
      .collect()
    Hnsw.searchIndex(spark, hDir, "vec_id", qs.head, 10,
      probeGraphs = Hnsw.AutoProbe).collect()
    // GraphCache economics (the high-dim pressure point): graph bytes
    // vs the byte budget, and hit/load counters across the serving
    // loop — loads growing with QUERIES rather than with distinct
    // graphs means the budget is thrashing
    val graphBytes = Option(new java.io.File(hDir).listFiles())
      .getOrElse(Array.empty).filter(_.getName.endsWith(".bin"))
      .map(_.length()).sum
    val cacheBudget = spark.sparkContext.getConf
      .getLong("spark.graft.hnsw.cacheBytes", 4L << 30)
    val (h0, l0) = Hnsw.GraphCache.counters
    val lat = qs.map(q => wall {
      Hnsw.searchIndex(spark, hDir, "vec_id", q, 10,
        probeGraphs = Hnsw.AutoProbe).collect()
    }).sorted
    val (h1, l1) = Hnsw.GraphCache.counters
    val p50 = lat(lat.length / 2); val p95 = lat((lat.length * 95) / 100 - 1)
    println(f"[bigsmoke] routed search p50 ${p50 * 1000}%.0f ms " +
      f"p95 ${p95 * 1000}%.0f ms over ${qs.length}%d queries " +
      f"(graphs ${graphBytes / 1e9}%.2f GB vs budget " +
      f"${cacheBudget / 1e9}%.2f GB; cache +${h1 - h0}%d hits " +
      f"+${l1 - l0}%d loads)")

    // routed recall@10 vs the exact flat scan on the same queries —
    // the RECALL.json convention measured at 2500x the fixture scale
    val recall = qs.map { q =>
      val routed = Hnsw.searchIndex(spark, hDir, "vec_id", q, 10,
        probeGraphs = Hnsw.AutoProbe).collect().map(_.getLong(0)).toSet
      val exact = Hnsw.searchIndex(spark, hDir, "vec_id", q, 10,
        exact = true).collect().map(_.getLong(0)).toSet
      (routed intersect exact).size.toDouble / math.max(exact.size, 1)
    }
    val meanRecall = recall.sum / recall.length
    println(f"[bigsmoke] routed recall@10 ${meanRecall}%.3f " +
      f"over ${qs.length}%d queries")

    // ---- knn_join: 1000-query side, k=10 ----
    val (ivfModel, ivfDir) = IvfIndex.ensure(spark, ivfName, emb,
      embPath, "embedding", "l2", nlist = nlist, maxIter = 4)
    val qSide = emb.filter(col("vec_id") % lit(N / 1000) === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val tJoin = wall {
      KnnJoin.join(spark, qSide, "qid", "qv", ivfDir, ivfModel,
        "vec_id", "embedding", k = 10, nprobe = joinProbe).count()
    }
    println(f"[bigsmoke] knn_join 1000q k=10 nprobe=$joinProbe%d ${tJoin}%.1f s")

    // ---- minhash near-dup over the doc corpus (64-dim run only: the
    // doc chain is dim-independent) ----
    import graft.operators.Dedup
    val tDedup = if (hd) 0.0 else {
      val docs = spark.read.parquet(docPath).select(
        col("doc_id"), col("text"))
      val t = wall {
        // the q_dedup_minhash chain: hashed shingles -> signatures ->
        // banded LSH candidates -> exact-Jaccard verify
        val sh = docs.select(col("doc_id"),
          Dedup.shingleHashes(col("text"), 3).as("shh"))
        val sig = sh.select(col("doc_id"),
          Dedup.minhashSignatureHashed(col("shh"), 64).as("sig"))
        val cands = Dedup.lshCandidates(sig, "doc_id", "sig",
          bands = 16, rows = 4)
        Dedup.verifyJaccard(cands, sh, "doc_id", "shh")
          .filter(col("jacc") >= 0.8).count()
      }
      println(f"[bigsmoke] minhash near-dup over $nDocs%d docs ${t}%.1f s")
      t
    }

    // ---- hd mode: per-delta side-graph cadence (append cost is
    // per-DELTA, so a small 100k base isolates exactly the 768-dim
    // side-graph build wall without a second full fleet build) ----
    val hdAppends: Seq[Double] = if (!hd) Nil else {
      import graft.operators.{IncrHnsw, Segments}
      val segDir = s"$dir/segstore_hd"
      val iname = s"bigsmoke_hd_incr_d$Dims"
      IndexCatalog.drop(spark, iname)
      def rm(f: java.io.File): Unit = { if (f.isDirectory)
        Option(f.listFiles()).getOrElse(Array.empty).foreach(rm); f.delete() }
      rm(new java.io.File(segDir))
      Segments.init(spark, segDir,
        emb.filter(col("vec_id") < 100000).select(col("vec_id"),
          col("embedding")), "vec_id")
      IncrHnsw.ensure(spark, iname, segDir, "vec_id", "embedding",
        efConstruction = efc)
      val walls = (1 to 3).map { i =>
        val batch = emb
          .filter(col("vec_id") >= 100000L * i && col("vec_id") < 100000L * i + 20000L)
          .select((col("vec_id") + lit(N * 10 * i)).as("vec_id"),
            col("embedding"))
        Segments.append(spark, segDir, batch, "vec_id", shadow = false)
        val t = wall { IncrHnsw.ensure(spark, iname, segDir, "vec_id",
          "embedding", efConstruction = efc) }
        println(f"[bigsmoke-hd] append $i%d (20k rows, $Dims%d dims): " +
          f"side graph ${t}%.1f s")
        t
      }
      IndexCatalog.drop(spark, iname)
      rm(new java.io.File(segDir))
      walls
    }

    // ---- append to SOAK.md ----
    if (hd) {
      val sideMean = hdAppends.sum / math.max(hdAppends.length, 1)
      val hdTable =
        f"""
## High-dimensional smoke ($Dims%d-dim, round 17, one-off direct measurement)

Every other direct scale measurement in this file is 64-dim; production
LLM embeddings are 768–3072-dim, which multiplies graph bytes ~${Dims / 64}%d×
and shifts build cost into distance kernels. Same flow as the
large-corpus smoke at $N%d rows × $Dims%d dims, single node
local[$cpus%s], plus the per-delta side-graph cadence and the
GraphCache residency counters around the serving loop.

| item | value |
|---|---|
| corpus | $N%d vectors × $Dims%d dims (${N * Dims * 4 / 1e9}%.2f GB raw floats, ${embBytes / 1e9}%.2f GB parquet) |
| hnsw parts=$parts%d m=12 efc=$efc%d build | ${tHnsw}%.1f s |
| ivf nlist=$nlist%d (kmeans‖ iters=4) build | ${tIvf}%.1f s |
| graph artifact bytes vs GraphCache budget | ${graphBytes / 1e9}%.2f GB vs ${cacheBudget / 1e9}%.2f GB |
| routed scalar search (AUTO) p50 / p95 | ${p50 * 1000}%.0f ms / ${p95 * 1000}%.0f ms |
| GraphCache over the ${qs.length}%d-query loop | ${(l1 - l0)}%d loads / ${(h1 - h0)}%d hits |
| routed recall@10 vs exact (${qs.length}%d queries) | ${meanRecall}%.3f |
| knn_join 1000q k=10 nprobe=$joinProbe%d/$nlist%d | ${tJoin}%.1f s |
| side-graph append (20k rows × $Dims%d dims, mean of 3) | ${sideMean}%.1f s |
"""
      val soak = java.nio.file.Paths.get("SOAK.md")
      if (java.nio.file.Files.exists(soak)) {
        val cur = java.nio.file.Files.readString(soak)
        val marker = s"\n## High-dimensional smoke ($Dims-dim"
        val cut = cur.indexOf(marker)
        val base = if (cut >= 0) {
          // replace this dims' section, keep anything after it
          val rest = cur.substring(cut + 1)
          val nxt = rest.indexOf("\n## ")
          cur.substring(0, cut) + (if (nxt >= 0) rest.substring(nxt) else "")
        } else cur
        java.nio.file.Files.writeString(soak, base + hdTable)
        println("[bigsmoke-hd] SOAK.md appendix updated")
      }
      spark.stop()
      return
    }
    val table =
      f"""
## Large-corpus smoke (round 15, one-off direct measurement)

Synthetic clustered corpus, single node local[$cpus%s] — the direct
check behind the extrapolated scale claims: every build below is a
one-task-per-partition shape whose wall divides by executor count on a
real cluster, and the serving rows are per-query costs that do not
grow with corpus size (resident routed graphs / pruned IVF scans).

| item | value |
|---|---|
| corpus | $N%d vectors × $Dims%d dims (${N * Dims * 4 / 1e9}%.2f GB raw floats, ${embBytes / 1e9}%.2f GB parquet) + $nDocs%d docs (${docBytes / 1e9}%.2f GB parquet) |
| hnsw parts=$parts%d m=12 efc=$efc%d build | ${tHnsw}%.1f s |
| ivf nlist=1024 (kmeans‖ iters=4) build | ${tIvf}%.1f s |
| routed scalar search (AUTO) p50 / p95 | ${p50 * 1000}%.0f ms / ${p95 * 1000}%.0f ms |
| routed recall@10 vs exact (64 queries) | ${meanRecall}%.3f |
| knn_join 1000q k=10 nprobe=32/1024 | ${tJoin}%.1f s |
| minhash near-dup pass ($nDocs%d docs) | ${tDedup}%.1f s |
"""
    val soak = java.nio.file.Paths.get("SOAK.md")
    if (java.nio.file.Files.exists(soak)) {
      val cur = java.nio.file.Files.readString(soak)
      val cut = cur.indexOf("\n## Large-corpus smoke")
      val tail = if (cut >= 0) {
        // keep any later incr section
        val rest = cur.substring(cut + 1)
        val nxt = rest.indexOf("\n## Incremental-store smoke")
        if (nxt >= 0) rest.substring(nxt) else ""
      } else ""
      val base = if (cut >= 0) cur.substring(0, cut) else cur
      java.nio.file.Files.writeString(soak, base + table + tail)
      println("[bigsmoke] SOAK.md appendix updated")
    }
    spark.stop()
  }

  /** The segment-store lifecycle at 5M rows (round 16): base build,
    * append cadence, tombstone serving, vacuum. Prints + appends an
    * "Incremental-store smoke" section to SOAK.md. */
  private def runIncr(spark: SparkSession, dir: String, embPath: String,
      cpus: String): Unit = {
    import graft.operators.{IncrHnsw, Segments}
    import graft.index.IndexCatalog
    def wall(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val segDir = s"$dir/segstore"
    val name = "bigsmoke_incr"
    def emb = spark.read.parquet(embPath).select(col("vec_id"), col("embedding"))
    // fresh store every run — the lifecycle IS the measurement
    IndexCatalog.drop(spark, name)
    def rm(f: java.io.File): Unit = { if (f.isDirectory)
      Option(f.listFiles()).getOrElse(Array.empty).foreach(rm); f.delete() }
    rm(new java.io.File(segDir))
    val tInit = wall { Segments.init(spark, segDir, emb, "vec_id") }
    println(f"[bigsmoke-incr] store init ($N%d rows) ${tInit}%.1f s")
    // base fleet: default 20k-row cap -> ~250 chunk graphs, built by the
    // round-16 ONE-JOB parallel path (the former serial loop was the
    // first finding this smoke produced)
    val tBase = wall { IncrHnsw.ensure(spark, name, segDir, "vec_id",
      "embedding", efConstruction = 100) }
    def graphCount = Option(new java.io.File(
      IndexCatalog.dataDir(spark, name)).listFiles())
      .getOrElse(Array.empty).count(_.getName.endsWith(".bin"))
    println(f"[bigsmoke-incr] base build ${tBase}%.1f s ($graphCount%d graphs)")
    val qs = emb.filter(col("vec_id") % lit(N / 16) === 0)
      .select("embedding").collect().map(_.getSeq[Float](0).toArray)
    def searchP50(label: String): Double = {
      IncrHnsw.search(spark, name, segDir, "vec_id", qs.head, 10).collect()
      val lat = qs.map(q => wall {
        IncrHnsw.search(spark, name, segDir, "vec_id", q, 10).collect()
      }).sorted
      val p50 = lat(lat.length / 2)
      println(f"[bigsmoke-incr] search p50 $label ${p50 * 1000}%.0f ms " +
        f"($graphCount%d graphs)")
      p50
    }
    val p50Base = searchP50("base")
    // 10 x 50k appends (new ids above the corpus), ensure after each —
    // the StreamingIngest cadence at its sealed-delta grain
    val appendWalls = (1 to 10).map { i =>
      val batch = emb.filter(col("vec_id") % lit(100) === lit(i.toLong))
        .limit(50000)
        .select((col("vec_id") + lit(N * (i + 1))).as("vec_id"),
          col("embedding"))
      // fresh ids -> no shadow tombstones (shadow is the REINSERT
      // spelling; a shadow row per appended id would inflate the
      // serving-side tombstone overfetch with tombstones that hide
      // nothing)
      val tA = wall { Segments.append(spark, segDir, batch, "vec_id",
        shadow = false) }
      val tE = wall { IncrHnsw.ensure(spark, name, segDir, "vec_id",
        "embedding", efConstruction = 100) }
      println(f"[bigsmoke-incr] append $i%2d: stage ${tA}%.1f s, " +
        f"side graphs ${tE}%.1f s ($graphCount%d graphs)")
      (tA, tE)
    }
    val p50Appended = searchP50("after 10 appends")
    // 1% delete wave: every 100th base id
    val tDel = wall { Segments.delete(spark, segDir,
      emb.filter(col("vec_id") % 100 === 37).select(col("vec_id")),
      "vec_id") }
    println(f"[bigsmoke-incr] 1%% delete (${N / 100}%d ids) ${tDel}%.1f s")
    val p50Deleted = searchP50("after 1% deletes")
    // vacuum: compact the store + full fleet rebuild (reclaims dead
    // rows, folds side graphs)
    val tVacuum = wall { IncrHnsw.vacuum(spark, name, segDir, "vec_id",
      "embedding", efConstruction = 100) }
    println(f"[bigsmoke-incr] vacuum (compact + rebuild) ${tVacuum}%.1f s")
    val p50Vacuumed = searchP50("after vacuum")
    // parquet-family cadence (IncrIvf as the representative): base
    // train+assign, then appends whose auto-split deltas sync in ONE
    // batched write (round 16) — the claim measured at corpus scale
    import graft.operators.IncrIvf
    val ivfName = "bigsmoke_incr_ivf"
    IndexCatalog.drop(spark, ivfName)
    val tIvfBase = wall { IncrIvf.ensure(spark, ivfName, segDir,
      "vec_id", "embedding", nlist = 256) }
    println(f"[bigsmoke-incr] incr-ivf base (train+assign, nlist=256) " +
      f"${tIvfBase}%.1f s")
    val ivfAppendWalls = (1 to 3).map { i =>
      val batch = emb.filter(col("vec_id") % lit(100) === lit(50 + i))
        .limit(50000)
        .select((col("vec_id") + lit(N * (i + 20))).as("vec_id"),
          col("embedding"))
      Segments.append(spark, segDir, batch, "vec_id", shadow = false)
      val t = wall { IncrIvf.ensure(spark, ivfName, segDir,
        "vec_id", "embedding", nlist = 256) }
      println(f"[bigsmoke-incr] incr-ivf append $i%d: sync ${t}%.1f s " +
        "(3 split deltas, one write)")
      t
    }
    val ivfAppendMean = ivfAppendWalls.sum / ivfAppendWalls.length
    val sideMean = appendWalls.map(_._2).sum / appendWalls.length
    val table =
      f"""
## Incremental-store smoke (round 16, one-off direct measurement)

The segment-store lifecycle at the 5M corpus, single node
local[$cpus%s]: StreamingIngest-cadence appends get one side graph per
sealed delta, deletes are tombstone-only, vacuum folds everything.
Side-graph build cost is per-DELTA (constant in corpus size); the
serving rows measure the per-graph fan-out and the tombstone-overfetch
path directly.

| item | value |
|---|---|
| store init ($N%d rows) | ${tInit}%.1f s |
| base fleet build (20k-row chunks, one parallel job) | ${tBase}%.1f s |
| search p50, base | ${p50Base * 1000}%.0f ms |
| append 50k: stage + side-graph mean (10 appends) | ${appendWalls.map(_._1).sum / 10}%.1f s + ${sideMean}%.1f s |
| search p50, after 10 appends | ${p50Appended * 1000}%.0f ms |
| 1%% delete wave (${N / 100}%d tombstones) | ${tDel}%.1f s |
| search p50, after deletes (overfetch path) | ${p50Deleted * 1000}%.0f ms |
| vacuum (compact + fleet rebuild) | ${tVacuum}%.1f s |
| search p50, after vacuum | ${p50Vacuumed * 1000}%.0f ms |
| incr-ivf base build (train+assign, nlist=256) | ${tIvfBase}%.1f s |
| incr-ivf append 50k: sync mean (3 appends, batched-delta write) | ${ivfAppendMean}%.1f s |
"""
    val soak = java.nio.file.Paths.get("SOAK.md")
    if (java.nio.file.Files.exists(soak)) {
      val cur = java.nio.file.Files.readString(soak)
      val cut = cur.indexOf("\n## Incremental-store smoke")
      val base = if (cut >= 0) cur.substring(0, cut) else cur
      java.nio.file.Files.writeString(soak, base + table)
      println("[bigsmoke-incr] SOAK.md appendix updated")
    }
  }
}
