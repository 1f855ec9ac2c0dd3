package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnosis harness for the 768-dim recall finding (round 17; the
  * RepairBench convention — the measurement tool stays with the fix it
  * motivated). Against the BigSmoke hd artifact it separates the two
  * recall suspects: routed-vs-unrouted parity (routing innocent),
  * per-query recall histograms with top-1 distances (diffuse loss at
  * the right distance scale → beam starvation under distance
  * concentration, not island failure), the ef ladder (monotone
  * recovery), and the calibrated-IVF comparison on the same corpus
  * (1.000 — the alternative scale path at high dims). The numbers are
  * recorded in SOAK.md's high-dimensional section and PLANS round 17;
  * re-run after `BigSmoke dims=768 n=1000000` to reproduce. */
object HdProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.registerAll(spark)
    import graft.operators.Hnsw
    import graft.index.IndexCatalog
    val dir = sys.props("java.io.tmpdir") + "/graft_bigsmoke_d768"
    val embPath = s"$dir/embeddings.parquet"
    val hDir = IndexCatalog.dataDir(spark, "bigsmoke_hnsw_p16_e100_d768")
    val emb = spark.read.parquet(embPath)
    val n = 1000000L
    val qs = emb.filter(col("vec_id") % lit(n / 16) === 0)
      .select("embedding").collect().map(_.getSeq[Float](0).toArray)
    def recallOf(label: String)(run: Array[Float] => Set[Long]): Unit = {
      val rs = qs.map { q =>
        val exact = Hnsw.searchIndex(spark, hDir, "vec_id", q, 10,
          exact = true).collect().map(_.getLong(0)).toSet
        val got = run(q)
        (got intersect exact).size.toDouble / math.max(exact.size, 1)
      }
      println(f"[hdprobe] $label recall@10 ${rs.sum / rs.length}%.3f")
    }
    // per-query diagnosis: island failure is bimodal {0,1} with wrong
    // top-1 distance ~ the inter-cluster scale; beam diffusion is
    // partial overlaps at the right distance scale
    val diag = qs.zipWithIndex.map { case (q, i) =>
      val exact = Hnsw.searchIndex(spark, hDir, "vec_id", q, 10,
        exact = true).collect().map(r => (r.getLong(0), r.getDouble(1)))
      val got = Hnsw.searchIndex(spark, hDir, "vec_id", q, 10)
        .collect().map(r => (r.getLong(0), r.getDouble(1)))
      val rec = (got.map(_._1).toSet intersect exact.map(_._1).toSet).size / 10.0
      (i, rec, exact.head._2, got.head._2, exact.last._2, got.last._2)
    }
    diag.foreach { case (i, r, ed1, gd1, edk, gdk) =>
      println(f"[hdprobe] q$i%02d recall $r%.1f exactTop1 $ed1%.3f gotTop1 " +
        f"$gd1%.3f exactK $edk%.3f gotK $gdk%.3f")
    }
    val hist = diag.groupBy(_._2).view.mapValues(_.length).toMap
    println(s"[hdprobe] recall histogram: " +
      hist.toSeq.sortBy(_._1).map { case (r, c) => f"$r%.1f:$c" }.mkString(" "))
    // ef ladder on the existing artifact
    Seq(100, 200, 400, 800, 1600).foreach { ef =>
      val t0 = System.nanoTime()
      val rs = qs.map { q =>
        val exact = Hnsw.searchIndex(spark, hDir, "vec_id", q, 10,
          exact = true).collect().map(_.getLong(0)).toSet
        val got = Hnsw.searchIndex(spark, hDir, "vec_id", q, 10,
          efSearch = ef).collect().map(_.getLong(0)).toSet
        (got intersect exact).size.toDouble / 10
      }
      println(f"[hdprobe] ef=$ef%d recall@10 ${rs.sum / rs.length}%.3f " +
        f"(${(System.nanoTime() - t0) / 1e9 / qs.length * 500}%.0f ms/q incl exact)")
    }
    // IVF on the same corpus: calibrated hint + exact rerank within
    // probed lists — the alternative scale path at high dims
    import graft.operators.IvfIndex
    import graft.index.IndexCatalog
    val ivfName = "bigsmoke_ivf_d768"
    val m = IndexCatalog.load(spark, ivfName).get
    val hint = m.params.get("probe_hint").map(_.toInt).getOrElse(10)
    println(s"[hdprobe] ivf probe_hint=$hint nlist=${m.params("nlist")}")
    val (model, ivfDir) = IvfIndex.ensure(spark, ivfName,
      spark.read.parquet(embPath), embPath, "embedding", "l2",
      nlist = 256, maxIter = 4)
    Seq(math.max(10, hint), 32).foreach { np =>
      val rs = qs.map { q =>
        val exact = Hnsw.searchIndex(spark, hDir, "vec_id", q, 10,
          exact = true).collect().map(_.getLong(0)).toSet
        val got = IvfIndex.search(spark, ivfDir, model, "vec_id",
          "embedding", q, 10, np).collect().map(_.getLong(0)).toSet
        (got intersect exact).size.toDouble / 10
      }
      println(f"[hdprobe] ivf nprobe=$np%d recall@10 ${rs.sum / rs.length}%.3f")
    }
    spark.stop()
  }
}
