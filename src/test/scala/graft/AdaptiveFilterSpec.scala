package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame
import graft.plans.AnnPushdown
import graft.index.SampleSidecar

/** Round-10 selectivity guard for the filtered top-k pushdown arm:
  * dense ensures persist a deterministic `_sample.bin` of the source's
  * filterable columns; the arm evaluates the query predicate on it
  * driver-side and (a) refuses the HNSW candidate-join rewrite when no
  * credible breadth can hold k survivors (the pre-filter exact plan
  * wins — the reference's amcostestimate decision), (b) widens the
  * candidate fetch / IVF probe count to the measured selectivity so the
  * one-shot basic-mode form stops underfilling on moderately selective
  * predicates. */
class AdaptiveFilterSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/tmp/graft_adfl_src"
  private val srcPath = s"$dir/rows.parquet"
  private val N = 2000

  private def ensureCorpus(): Unit = {
    val f = new java.io.File(srcPath)
    if (f.exists()) return
    val rows = (0 until N).map { id =>
      val vec = Array.tabulate(8)(d => math.sin(id * 0.7 + d * 1.3).toFloat)
      (id.toLong, vec, id % 10)
    }
    rows.toDF("id", "vec", "label")
      .repartition(1).write.mode("overwrite").parquet(srcPath)
  }

  private lazy val q: Array[Float] =
    Array.tabulate(8)(d => math.sin(d * 1.3).toFloat) // row 0's vector

  private def ensureHnsw(): String = {
    ensureCorpus()
    graft.operators.Hnsw.ensure(spark, "adfl_hnsw",
      spark.read.parquet(srcPath), srcPath, "id", "vec", "l2", parts = 1)
  }

  private def ensureIvf(): String = {
    ensureCorpus()
    graft.operators.IvfIndex.ensure(spark, "adfl_ivf",
      spark.read.parquet(srcPath), srcPath, "vec", "l2", 16)._2
  }

  private def topk(pred: org.apache.spark.sql.Column, k: Int): DataFrame =
    spark.read.parquet(srcPath)
      .filter(pred)
      .select(col("id"), graft.functions.l2sq(col("vec"), typedLit(q)).as("dist"))
      .orderBy(col("dist")).limit(k)

  private def bruteRows(pred: org.apache.spark.sql.Column, k: Int): Seq[(Long, Double)] = {
    val prev = spark.conf.get("spark.graft.ann.enabled", "false")
    spark.conf.set("spark.graft.ann.enabled", "false")
    try topk(pred, k).collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    finally spark.conf.set("spark.graft.ann.enabled", prev)
  }

  private def withArm(name: String)(body: => Unit): Unit = {
    AnnPushdown.install(spark)
    AnnPushdown.register(srcPath,
      AnnPushdown.IndexedTable(name, "id", "vec", "l2"))
    spark.conf.set("spark.graft.ann.enabled", "true")
    try body
    finally {
      spark.conf.set("spark.graft.ann.enabled", "false")
      spark.conf.set("spark.graft.hnsw.exact", "false")
      spark.conf.set("spark.graft.ann.filteredAdaptive", "true")
      spark.conf.set("spark.graft.ann.nprobe", "10")
      AnnPushdown.unregister(srcPath)
    }
  }

  test("sample sidecar: deterministic write, load, and estimates") {
    val dataDir = ensureHnsw()
    val s = SampleSidecar.load(spark, dataDir).get
    assert(s.total == N)
    assert(s.n == N) // under the 4096 cap the sample IS the table
    assert(s.names.toSet == Set("id", "label")) // vec is not filterable

    def est(c: org.apache.spark.sql.Column) =
      SampleSidecar.estimate(spark, dataDir,
        spark.read.parquet(srcPath).filter(c)
          .queryExecution.analyzed.asInstanceOf[org.apache.spark.sql.catalyst.plans.logical.Filter]
          .condition)
    assert(est(col("label") === 3).contains((200L, N.toLong, N.toLong)))
    assert(est(col("id") % 401 === 0).contains((5L, N.toLong, N.toLong)))
    // vector-column and unknown-column predicates get no estimate
    assert(est(col("vec").isNotNull).isEmpty)

    // rebuild reproduces the sample byte-for-byte
    val p = java.nio.file.Paths.get(dataDir, SampleSidecar.FileName)
    val bytes1 = java.nio.file.Files.readAllBytes(p)
    graft.index.IndexCatalog.drop(spark, "adfl_hnsw")
    val dataDir2 = ensureHnsw()
    val bytes2 = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dataDir2, SampleSidecar.FileName))
    assert(java.util.Arrays.equals(bytes1, bytes2))
  }

  test("hyper-selective predicate: guard refuses the rewrite, pre-filter exact wins") {
    ensureHnsw()
    withArm("adfl_hnsw") {
      spark.conf.set("spark.graft.hnsw.exact", "true")
      val pred = col("id") % 401 === 0 // 5 of 2000 rows
      val expected = bruteRows(pred, 10)

      val kept = topk(pred, 10)
      assert(!kept.queryExecution.optimizedPlan.toString.contains("Join"),
        "guard should refuse the candidate join on a 0.25% predicate")
      val got = kept.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(got == expected) // all 5 survivors, exactly

      // fixed breadth (guard off): the one-shot 40-candidate fetch
      // rewrites and underfills — the defect the guard removes.
      // (count through the MATERIALIZED rewritten plan: a fresh
      // df.count() optimizes an Aggregate shape the arm doesn't match)
      spark.conf.set("spark.graft.ann.filteredAdaptive", "false")
      val fixedPlan = topk(pred, 10).queryExecution.optimizedPlan
      assert(fixedPlan.toString.contains("Join"))
      val fixedN = org.apache.spark.sql.graftshim.Shims
        .ofRows(spark, fixedPlan).count()
      assert(fixedN < expected.length,
        "fixed breadth should underfill on this fixture")
    }
  }

  test("moderate predicate: widened candidate breadth fills k exactly") {
    ensureHnsw()
    withArm("adfl_hnsw") {
      spark.conf.set("spark.graft.hnsw.exact", "true")
      val pred = col("label") === 7 // 10%
      val expected = bruteRows(pred, 10)

      val adaptive = topk(pred, 10)
      assert(adaptive.queryExecution.optimizedPlan.toString.contains("Join"),
        "10% selectivity should keep the candidate-join rewrite")
      val got = adaptive.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(got == expected, "widened exact prefix must yield the exact filtered top-k")

      spark.conf.set("spark.graft.ann.filteredAdaptive", "false")
      val fixedN = org.apache.spark.sql.graftshim.Shims
        .ofRows(spark, topk(pred, 10).queryExecution.optimizedPlan).count()
      assert(fixedN < 10,
        "fixed 4x breadth should underfill at 10% selectivity on this fixture")
    }
  }

  test("vbase refill: sample-seeded first fetch collapses the rounds") {
    val dataDir = ensureHnsw()
    val pred = col("id") % 401 === 0 // 5 of 2000 rows
    val expected = bruteRows(pred, 3)

    def run(): Seq[(Long, Double)] =
      graft.operators.Hnsw.searchIndexFiltered(spark, dataDir, "id", q,
        3, spark.read.parquet(srcPath), pred, exact = true)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq

    spark.conf.set("spark.graft.ann.filteredAdaptive", "true")
    try {
      assert(run() == expected)
      assert(graft.operators.Hnsw.lastFilteredRounds == 1,
        "seeded fetch should hold k survivors in round 1")

      spark.conf.set("spark.graft.ann.filteredAdaptive", "false")
      assert(run() == expected) // exact in every round regardless
      assert(graft.operators.Hnsw.lastFilteredRounds > 1,
        "unseeded k*overfetch start should need refill rounds here")
    } finally
      spark.conf.set("spark.graft.ann.filteredAdaptive", "true")
  }

  test("filtered knn join: probe escalation recovers every (qid, id) pair") {
    import org.apache.spark.sql.expressions.Window
    ensureIvf()
    withArm("adfl_ivf") {
      spark.conf.set("spark.graft.ann.nprobe", "1")
      val pred = col("id") % 401 === 0 // 5 of 2000 corpus rows

      def joinDf(): DataFrame = {
        val corpus = spark.read.parquet(srcPath).filter(pred)
        val queries = spark.read.parquet(srcPath)
          .filter(col("id") % 500 === 0)
          .select(col("id").as("qid"), col("vec").as("qvec"))
        queries.crossJoin(corpus)
          .select(queries("qid"), corpus("id"),
            graft.functions.l2sq(corpus("vec"), queries("qvec")).as("dist"))
          .withColumn("rn", row_number().over(
            Window.partitionBy(col("qid")).orderBy(col("dist"), col("id"))))
          .filter(col("rn") <= 3)
      }
      def pairs(df: DataFrame): Set[(Long, Long)] =
        df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

      val prevEnabled = spark.conf.get("spark.graft.ann.enabled")
      spark.conf.set("spark.graft.ann.enabled", "false")
      val expected = pairs(joinDf())
      spark.conf.set("spark.graft.ann.enabled", prevEnabled)
      assert(expected.size == 4 * 3)

      val adaptive = joinDf()
      assert(adaptive.queryExecution.optimizedPlan.toString
        .contains("probe_lists"), "filtered knn join should rewrite")
      assert(pairs(org.apache.spark.sql.graftshim.Shims.ofRows(spark,
        adaptive.queryExecution.optimizedPlan)) == expected,
        "escalated probes must recover every filtered pair")

      spark.conf.set("spark.graft.ann.filteredAdaptive", "false")
      val fixed = pairs(org.apache.spark.sql.graftshim.Shims.ofRows(spark,
        joinDf().queryExecution.optimizedPlan))
      assert(fixed.subsetOf(expected) && fixed != expected,
        "nprobe=1 should miss filtered pairs on this fixture")
    }
  }

  // --- mixed-predicate filtered top-k on partitioned parents (round
  //     10): partition conjuncts prune sub-indexes, leftovers either
  //     semi-join the base scan (hnsw_part, pooled-sample breadth) or
  //     re-evaluate on the sub scans (ivf_part, per-sub escalation)

  private val partSrc = "/tmp/graft_adfl_partsrc"

  private def ensurePartCorpus(): Unit = {
    if (new java.io.File(partSrc, "_SUCCESS").isFile) return
    ensureCorpus()
    spark.read.parquet(srcPath)
      .withColumn("cat", (col("id") % 4).cast("int"))
      .write.mode("overwrite").partitionBy("cat").parquet(partSrc)
  }

  private def partTopk(pred: org.apache.spark.sql.Column, k: Int): DataFrame =
    spark.read.parquet(partSrc)
      .filter(pred)
      .select(col("id"), graft.functions.l2sq(col("vec"), typedLit(q)).as("dist"))
      .orderBy(col("dist")).limit(k)

  private def partBrute(pred: org.apache.spark.sql.Column, k: Int): Seq[(Long, Double)] = {
    val prev = spark.conf.get("spark.graft.ann.enabled", "false")
    spark.conf.set("spark.graft.ann.enabled", "false")
    try partTopk(pred, k).collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    finally spark.conf.set("spark.graft.ann.enabled", prev)
  }

  private def withPartArm(name: String)(body: => Unit): Unit = {
    AnnPushdown.install(spark)
    AnnPushdown.register(partSrc,
      AnnPushdown.IndexedTable(name, "id", "vec", "l2"))
    spark.conf.set("spark.graft.ann.enabled", "true")
    try body
    finally {
      spark.conf.set("spark.graft.ann.enabled", "false")
      spark.conf.set("spark.graft.hnsw.exact", "false")
      spark.conf.set("spark.graft.ann.filteredAdaptive", "true")
      spark.conf.set("spark.graft.ann.nprobe", "10")
      spark.conf.set("spark.graft.ann.filteredOverfetch", "4")
      AnnPushdown.unregister(partSrc)
    }
  }

  test("hnsw_part mixed predicate: widen fills k exactly, hyper-selective refuses") {
    ensurePartCorpus()
    graft.operators.PartitionedIndex.ensureHnsw(spark, "adfl_part",
      partSrc, "cat", "id", "vec", "l2")
    withPartArm("adfl_part") {
      spark.conf.set("spark.graft.hnsw.exact", "true")

      // label is uncorrelated with the partition key (cat = id%4 makes
      // id%2 DEGENERATE within a partition — every cat-1 id is odd)
      val widen = col("cat") === 1 && col("label") === 3
      val adaptive = partTopk(widen, 10)
      assert(adaptive.queryExecution.optimizedPlan.toString.contains("Join"),
        "20%-within-partition predicate should take the candidate join")
      val got = adaptive.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(got == partBrute(widen, 10),
        "pooled-sample exact prefix must yield the exact filtered top-k")

      val refuse = col("cat") === 1 && col("id") % 401 === 0 // 1 row
      val kept = partTopk(refuse, 5)
      assert(!kept.queryExecution.optimizedPlan.toString.contains("Join"),
        "guard should refuse the rewrite on a 0.2% mixed predicate")
      assert(kept.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
        == partBrute(refuse, 5))
    }
  }

  test("ivf_part mixed predicate: per-sub probes escalate to recover every survivor") {
    ensurePartCorpus()
    graft.operators.PartitionedIndex.ensureIvf(spark, "adfl_partivf",
      partSrc, "cat", "vec", "l2", nlist = 8)
    withPartArm("adfl_partivf") {
      spark.conf.set("spark.graft.ann.nprobe", "1")
      spark.conf.set("spark.graft.ann.filteredOverfetch", "1")
      // 5 survivors spread over both chosen partitions
      val pred = col("cat").isin(1, 2) && col("id") % 201 === 0
      val expected = partBrute(pred, 10)
      assert(expected.length == 5)

      val adaptive = partTopk(pred, 10)
      assert(adaptive.queryExecution.optimizedPlan.toString.contains("list_id"),
        "mixed-predicate ivf_part top-k should dispatch to the sub scans")
      val got = adaptive.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(got == expected, "per-sub escalation must recover every survivor")

      spark.conf.set("spark.graft.ann.filteredAdaptive", "false")
      val fixed = partTopk(pred, 10)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(fixed.length < expected.length,
        "1-of-8 probed lists per sub should miss survivors on this fixture")
    }
  }

  test("ivf arm: probe count escalates to cover the sampled selectivity") {
    ensureIvf()
    withArm("adfl_ivf") {
      spark.conf.set("spark.graft.ann.nprobe", "1")
      val pred = col("id") % 401 === 0
      val expected = bruteRows(pred, 10)

      val adaptive = topk(pred, 10)
      assert(adaptive.queryExecution.optimizedPlan.toString.contains("list_id"))
      val got = adaptive.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(got == expected, "escalated probes must recover every survivor")

      spark.conf.set("spark.graft.ann.filteredAdaptive", "false")
      val fixed = topk(pred, 10).collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(fixed.length < expected.length,
        "4-of-16 probed lists should miss survivors on this fixture")
    }
  }
}
