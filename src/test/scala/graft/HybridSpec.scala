package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.operators.{HybridSearch, IvfIndex, Segments}

/** Full mutable-store lifecycle: sealed IVF + growing deltas + deletes,
  * then seal (compaction) + reindex — search stays correct at each step
  * (the optimizing-thread contract, tests/sealing analog). */
class HybridSpec extends SparkSpec {
  import spark.implicits._

  test("hybrid search across append/delete/seal/reindex") {
    val segDir = Files.createTempDirectory("graft_hybrid_seg").toString
    val ivfDir = Files.createTempDirectory("graft_hybrid_ivf").toString
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val q: Array[Float] = emb.filter(col("vec_id") === 0)
      .select(col("embedding")).head().getSeq[Float](0).toArray

    Segments.init(spark, segDir, emb, "vec_id")
    val model = IvfIndex.build(emb, "embedding", "l2", 8, ivfDir)

    def topIds(k: Int): Seq[Long] =
      HybridSearch.topkL2(spark, segDir, ivfDir, model, "vec_id", "embedding",
        q, k, nprobe = model.nlist)
        .select("vec_id").as[Long].collect().toSeq

    // appended rows equal to q dominate immediately (growing-scan path)
    val dups = emb.filter(col("vec_id") === 0)
      .select(col("embedding")).crossJoin(Seq(9000L, 9001L, 9002L).toDF("vec_id"))
      .select(col("vec_id"), col("embedding"))
    Segments.append(spark, segDir, dups, "vec_id")
    assert(topIds(4) == Seq(0L, 9000L, 9001L, 9002L))

    // delete one delta row and the original: both vanish from top-k
    Segments.delete(spark, segDir,
      Seq(9001L, 0L).toDF("vec_id"), "vec_id")
    assert(topIds(2) == Seq(9000L, 9002L))

    // seal: compact, rebuild the index over the sealed generation
    Segments.compact(spark, segDir, "vec_id")
    val sealedRows = Segments.read(spark, segDir, "vec_id")
      .select(col("vec_id"), col("embedding"))
    val model2 = IvfIndex.build(sealedRows, "embedding", "l2", 8, ivfDir)
    def topIds2(k: Int): Seq[Long] =
      HybridSearch.topkL2(spark, segDir, ivfDir, model2, "vec_id", "embedding",
        q, k, nprobe = model2.nlist)
        .select("vec_id").as[Long].collect().toSeq
    assert(topIds2(2) == Seq(9000L, 9002L))

    // and the sealed store matches a brute-force over its own contents
    val brute = sealedRows
      .select(col("vec_id"), graft.functions.l2sq(col("embedding"),
        typedLit(q)).as("d"))
      .orderBy(col("d"), col("vec_id")).limit(10)
      .select("vec_id").as[Long].collect().toSeq
    assert(topIds2(10) == brute)
  }

  test("incremental HNSW: append adds one side graph, compaction promotes without rebuild") {
    import graft.operators.IncrHnsw
    val segDir = Files.createTempDirectory("graft_incr_seg").toString
    val name = "hybridspec_incr"
    graft.index.IndexCatalog.drop(spark, name)
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val q: Array[Float] = emb.filter(col("vec_id") === 0)
      .select(col("embedding")).head().getSeq[Float](0).toArray

    Segments.init(spark, segDir, emb, "vec_id")
    val dir = IncrHnsw.ensure(spark, name, segDir, "vec_id", "embedding")
    def binMtimes: Map[String, Long] =
      Option(new java.io.File(dir).listFiles()).getOrElse(Array.empty)
        .filter(_.getName.endsWith(".bin"))
        .map(f => f.getName -> f.lastModified()).toMap
    val m0 = binMtimes
    assert(m0.keySet.exists(_.startsWith("base-")), s"no base graphs in $m0")

    def got(k: Int): Seq[(Long, Double)] =
      IncrHnsw.search(spark, name, segDir, "vec_id", q, k, exact = true)
        .as[(Long, Double)].collect().toSeq
    def want(k: Int): Seq[(Long, Double)] =
      Segments.read(spark, segDir, "vec_id")
        .select(col("vec_id"), graft.functions.l2sq(col("embedding"),
          typedLit(q)).as("dist"))
        .orderBy(col("dist"), col("vec_id")).limit(k)
        .as[(Long, Double)].collect().toSeq
    assert(got(20) == want(20))

    // append: exactly ONE new side graph; every existing file untouched
    val dups = emb.filter(col("vec_id") === 0)
      .select(col("embedding")).crossJoin(Seq(9000L, 9001L, 9002L).toDF("vec_id"))
      .select(col("vec_id"), col("embedding"))
    Segments.append(spark, segDir, dups, "vec_id")
    IncrHnsw.ensure(spark, name, segDir, "vec_id", "embedding")
    val m1 = binMtimes
    assert(m1.keySet == m0.keySet + "side-1.bin", s"unexpected graph set: ${m1.keySet}")
    assert(m0.forall { case (k, v) => m1(k) == v }, "append rewrote an existing graph")
    assert(got(4).map(_._1) == Seq(0L, 9000L, 9001L, 9002L))

    // delete: pure tombstone work — zero graph changes
    Segments.delete(spark, segDir, Seq(9001L, 0L).toDF("vec_id"), "vec_id")
    IncrHnsw.ensure(spark, name, segDir, "vec_id", "embedding")
    assert(binMtimes == m1, "delete touched graph files")
    assert(got(2).map(_._1) == Seq(9000L, 9002L))

    // compaction PROMOTES: same graph files byte-for-byte (mtimes
    // unchanged), dead rows filtered via the snapshotted version map
    IncrHnsw.promoteOnCompact(spark, name, segDir, "vec_id")
    assert(binMtimes == m1, "compaction rebuilt graph files")
    assert(got(2).map(_._1) == Seq(9000L, 9002L))
    assert(got(30) == want(30))

    // post-compact append keeps working incrementally
    val more = emb.filter(col("vec_id") === 0)
      .select(col("embedding")).crossJoin(Seq(9100L).toDF("vec_id"))
      .select(col("vec_id"), col("embedding"))
    Segments.append(spark, segDir, more, "vec_id")
    IncrHnsw.ensure(spark, name, segDir, "vec_id", "embedding")
    val m4 = binMtimes
    assert(m4.keySet == m1.keySet + "side-3.bin", s"unexpected graph set: ${m4.keySet}")
    assert(m1.forall { case (k, v) => m4(k) == v })
    assert(got(3).map(_._1) == Seq(9000L, 9002L, 9100L))
    assert(got(30) == want(30))

    // vacuum (full optimize): side graphs fold into fresh base graphs,
    // dead rows reclaimed, search unchanged
    IncrHnsw.vacuum(spark, name, segDir, "vec_id", "embedding")
    val m5 = binMtimes
    assert(m5.keySet.forall(_.startsWith("base-")),
      s"vacuum left side graphs: ${m5.keySet}")
    assert(got(3).map(_._1) == Seq(9000L, 9002L, 9100L))
    assert(got(30) == want(30))
    graft.index.IndexCatalog.drop(spark, name)
  }

  test("oversized delta is split into multiple bounded side graphs; search stays exact") {
    import graft.operators.IncrHnsw
    val segDir = Files.createTempDirectory("graft_incr_big").toString
    val name = "hybridspec_incr_big"
    graft.index.IndexCatalog.drop(spark, name)
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val q: Array[Float] = emb.filter(col("vec_id") === 0)
      .select(col("embedding")).head().getSeq[Float](0).toArray

    Segments.init(spark, segDir, emb.filter(col("vec_id") < 100), "vec_id")
    // one 300-row delta, sealed under the default (large) cap ...
    Segments.append(spark, segDir,
      emb.filter(col("vec_id") >= 100 && col("vec_id") < 400), "vec_id")
    // ... then ensure under a 50-row cap: the side build must chunk the
    // delta instead of collecting all 300 rows at once
    spark.conf.set("spark.graft.segments.maxGrowingRows", "50")
    try {
      val dir = IncrHnsw.ensure(spark, name, segDir, "vec_id", "embedding")
      val sides = Option(new java.io.File(dir).listFiles()).get
        .map(_.getName).filter(_.startsWith("side-1-")).sorted
      assert(sides.length >= 2, s"expected chunked side graphs, got ${sides.toSeq}")
      assert(!new java.io.File(dir, "side-1.bin").exists())

      val got = IncrHnsw.search(spark, name, segDir, "vec_id", q, 25, exact = true)
        .as[(Long, Double)].collect().toSeq
      val want = Segments.read(spark, segDir, "vec_id")
        .select(col("vec_id"), graft.functions.l2sq(col("embedding"),
          typedLit(q)).as("dist"))
        .orderBy(col("dist"), col("vec_id")).limit(25)
        .as[(Long, Double)].collect().toSeq
      assert(got == want)
      // round 16: the chunk set builds in ONE task-parallel job — each
      // published chunk must stay byte-identical to the serial
      // reference (same pmod(xxhash64) assignment, same id-sorted
      // insertion); any divergence is a graph change, not a scheduling
      // change
      val nChunks = 6 // ceil(300 rows / 50 cap) — the build's formula
      sides.foreach { f =>
        val c = f.stripPrefix("side-1-").stripSuffix(".bin").toInt
        val published = java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(dir, f))
        val chunkRows = spark.read.parquet(s"$segDir/delta-1")
          .filter(pmod(xxhash64(col("vec_id").cast("long")),
            lit(nChunks.toLong)) === c.toLong)
          .select(col("vec_id").cast("long"), col("embedding"))
          .as[(Long, Array[Float])].collect().sortBy(_._1)
        val g = new graft.operators.Hnsw.Graph("l2", 12, 300)
        chunkRows.foreach { case (id, v) => g.insert(id, v) }
        val buf = new java.io.ByteArrayOutputStream()
        val os = new java.io.DataOutputStream(buf)
        graft.operators.Hnsw.FlatGraph.write(os, g.snapshot)
        os.close()
        assert(java.util.Arrays.equals(published, buf.toByteArray),
          s"parallel chunk $f diverges from the serial reference build")
      }
    } finally {
      spark.conf.unset("spark.graft.segments.maxGrowingRows")
      graft.index.IndexCatalog.drop(spark, name)
    }
  }

  test("tombstone snapshot cache invalidates on every commit (rapid delete/search)") {
    // round 16: searches reuse a driver-side tombstone snapshot keyed on
    // the committed (gen, seq) — back-to-back delete/search sequences
    // (faster than mtime granularity) must still observe each commit
    import graft.operators.IncrHnsw
    val segDir = Files.createTempDirectory("graft_incr_tombcache").toString
    val name = "hybridspec_tombcache"
    graft.index.IndexCatalog.drop(spark, name)
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val q: Array[Float] = emb.filter(col("vec_id") === 0)
      .select(col("embedding")).head().getSeq[Float](0).toArray
    Segments.init(spark, segDir, emb.filter(col("vec_id") < 60), "vec_id")
    IncrHnsw.ensure(spark, name, segDir, "vec_id", "embedding")
    def ids(): Set[Long] =
      IncrHnsw.search(spark, name, segDir, "vec_id", q, 60, exact = true)
        .select("vec_id").as[Long].collect().toSet
    try {
      assert(ids().contains(0L))
      Segments.delete(spark, segDir,
        spark.range(1).select(lit(0L).as("vec_id")), "vec_id")
      assert(!ids().contains(0L), "a just-committed delete must be visible")
      assert(ids().contains(1L))
      Segments.delete(spark, segDir,
        spark.range(1).select(lit(1L).as("vec_id")), "vec_id")
      assert(!ids().contains(1L),
        "the second rapid-fire delete must be visible too")
      assert(ids().size === 58)
    } finally graft.index.IndexCatalog.drop(spark, name)
  }

  test("executor-side side-graph build is byte-identical to the insertion-order reference") {
    // round-6: buildGraphFile moved from a driver collect+insert to one
    // executor task (sorted single partition). Same id-ordered insertion
    // sequence => the published file must match a reference build done
    // here, byte for byte — any divergence means the executor path
    // changed the graph, not just where it was computed.
    import graft.operators.{Hnsw, IncrHnsw}
    val segDir = Files.createTempDirectory("graft_incr_bytes").toString
    val name = "hybridspec_incr_bytes"
    graft.index.IndexCatalog.drop(spark, name)
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    Segments.init(spark, segDir, emb.filter(col("vec_id") < 40), "vec_id")
    Segments.append(spark, segDir,
      emb.filter(col("vec_id") >= 40 && col("vec_id") < 90), "vec_id")
    val dir = IncrHnsw.ensure(spark, name, segDir, "vec_id", "embedding")
    val published = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir, "side-1.bin"))

    val deltaRows = spark.read.parquet(s"$segDir/delta-1")
      .select(col("vec_id").cast("long"), col("embedding"))
      .as[(Long, Array[Float])].collect().sortBy(_._1)
    val g = new Hnsw.Graph("l2", 12, 300)
    deltaRows.foreach { case (id, v) => g.insert(id, v) }
    val buf = new java.io.ByteArrayOutputStream()
    val os = new java.io.DataOutputStream(buf)
    Hnsw.FlatGraph.write(os, g.snapshot)
    os.close()
    assert(java.util.Arrays.equals(published, buf.toByteArray),
      s"executor-built side graph diverges from the reference build " +
        s"(${published.length} vs ${buf.toByteArray.length} bytes)")
    graft.index.IndexCatalog.drop(spark, name)
  }

  test("memoized bridge repair is byte-identical to the naive per-component " +
      "scan on a many-component duplicate-heavy corpus") {
    import graft.operators.Hnsw
    // one large connected cluster plus many far-away tiny cliques of
    // EXACT duplicates — the duplicate-heavy shape whose m-pruned
    // insertion shatters level-0 connectivity; duplicate reps share the
    // memoized incremental scan, which must reproduce the naive
    // per-component scan's (d, idx) argmin bit-exactly
    val dims = 8
    val rnd = new scala.util.Random(13)
    def mk(seedRow: => Array[Float], n: Int): Seq[Array[Float]] =
      (0 until n).map(_ => seedRow)
    val main = (0 until 2500).map { _ =>
      Array.tabulate(dims)(_ => rnd.nextFloat())
    }
    val cliques = (0 until 30).flatMap { c =>
      val base = Array.tabulate(dims)(j =>
        100f * (c + 1) * (if (j % 2 == 0) 1f else -1f))
      mk(base.clone(), 15)
    }
    val rows = main ++ cliques
    def build(): Hnsw.Graph = {
      val g = new Hnsw.Graph("l2", m = 4, efConstruction = 40)
      rows.zipWithIndex.foreach { case (v, i) => g.insert(i.toLong, v) }
      g
    }
    val memoG = build()
    val memoBytes = {
      val buf = new java.io.ByteArrayOutputStream()
      val os = new java.io.DataOutputStream(buf)
      Hnsw.FlatGraph.write(os, memoG.snapshot)
      os.close(); buf.toByteArray
    }
    // the fixture must genuinely exercise repair (orphan components
    // exist) or this test asserts nothing
    assert(memoG.lastRepairBridges > 0,
      "fixture produced no orphan components - repair never ran")
    val scanG = build()
    val scanBytes = {
      val buf = new java.io.ByteArrayOutputStream()
      val os = new java.io.DataOutputStream(buf)
      Hnsw.FlatGraph.write(os, scanG.snapshotWithScanRepair)
      os.close(); buf.toByteArray
    }
    assert(scanG.lastRepairBridges == memoG.lastRepairBridges)
    assert(java.util.Arrays.equals(memoBytes, scanBytes),
      s"memoized repair diverged from the naive scan " +
        s"(${memoBytes.length} vs ${scanBytes.length} bytes, " +
        s"${memoG.lastRepairBridges} bridges)")
  }
}
