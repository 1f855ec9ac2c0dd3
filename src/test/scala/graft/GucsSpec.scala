package graft

import graft.index.Gucs

/** compact_var.slt conformance: reference GUC spellings in SQL text and
  * the pgvector-compatibility aliasing contract (compatibility.rs:7-59;
  * default OFF, planning.rs:15).
  *
  * Conf mutations run on a FRESH `newSession()` (same extensions —
  * the injected parser carries over — but an isolated runtime SQLConf):
  * suites share one context and run in parallel, so asserting the
  * SHARED session's conf absence races with sibling suites'
  * set/restore windows (observed: ann.nprobe=10 mid-flight). */
class GucsSpec extends SparkSpec {

  test("compact_var.slt: SET-time name swap, compat-gated, shared storage") {
    val ds = spark.newSession()
    ds.sql("SET vectors.pgvector_compatibility=off")
    assert(!Gucs.pgvectorCompat(ds))
    ds.sql("SET ivfflat.probes=40")
    // off: the pgvector spelling is an inert foreign key
    assert(ds.conf.getOption("spark.graft.ann.nprobe").isEmpty)
    assert(ds.conf.get("ivfflat.probes") === "40")
    ds.sql("SET hnsw.ef_search=400")
    assert(ds.conf.getOption("spark.graft.hnsw.efSearch").isEmpty)
    ds.sql("SET vectors.pgvector_compatibility=on")
    assert(Gucs.pgvectorCompat(ds))
    ds.sql("SET ivfflat.probes=50")
    assert(ds.conf.get("spark.graft.ann.nprobe") === "50")
    ds.sql("SET vectors.ivf_nprobe=60")
    assert(ds.conf.get("spark.graft.ann.nprobe") === "60")
    // the bare SET read form IS the reference's SHOW: shared storage
    val shown = ds.sql("SET ivfflat.probes").head()
    assert(shown.getString(0) === "spark.graft.ann.nprobe")
    assert(shown.getString(1) === "60")
    ds.sql("SET vectors.hnsw_ef_search=600")
    assert(ds.sql("SET hnsw.ef_search").head().getString(1) === "600")
  }

  test("vectors.* GUCs always map; bool values normalize from on/off") {
    val ds = spark.newSession()
    ds.sql("SET vectors.search_mode=basic")
    assert(ds.conf.get("spark.graft.search.mode") === "basic")
    ds.sql("SET vectors.enable_index=on")
    assert(ds.conf.get("spark.graft.ann.enabled") === "true")
    ds.sql("SET vectors.enable_index=off")
    assert(ds.conf.get("spark.graft.ann.enabled") === "false")
    // a typo'd bool ERRORS at SET time (PG invalid-GUC-bool parity) —
    // silently mapping it to false would disable acceleration with no
    // diagnostic; a programmatic garbage COMPAT value stays lenient
    // (rule-safe read: resolves to the off default)
    val e = intercept[Exception](ds.sql("SET vectors.enable_index=ture"))
    assert(e.getMessage.contains("Boolean"))
    ds.conf.set(Gucs.CompatKey, "garbage")
    assert(!Gucs.pgvectorCompat(ds))
    // PG quotes any GUC value: one layer of single quotes strips
    ds.sql("SET vectors.enable_index='on'")
    assert(ds.conf.get("spark.graft.ann.enabled") === "true")
    ds.sql("SET vectors.ivf_nprobe = '40'")
    assert(ds.conf.get("spark.graft.ann.nprobe") === "40")
  }

  test("conf-layer alias (programmatic spark.conf.set) is compat-gated") {
    val ds = spark.newSession()
    ds.conf.set(Gucs.CompatKey, "off")
    ds.conf.set("spark.graft.ivfflat.probes", "40")
    assert(Gucs.alias(ds, "spark.graft.ivfflat.probes").isEmpty)
    ds.conf.set(Gucs.CompatKey, "on")
    assert(Gucs.alias(ds, "spark.graft.ivfflat.probes").contains("40"))
  }

  test("q_pgvector_gucs gate replays compact_var.slt's printed values") {
    val Touched = Seq(Gucs.CompatKey, "spark.graft.ann.nprobe",
      "spark.graft.hnsw.efSearch", "spark.graft.search.mode",
      "spark.graft.ann.enabled", "ivfflat.probes", "hnsw.ef_search")
    val before = Touched.map(k => k -> spark.conf.getOption(k))
    val df = SparkEntry.queries("q_pgvector_gucs")(spark, sf001)
    val got = df.collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(got === Seq(
      ("s01_compat_off_probes_inert", "10"),
      ("s02_show_foreign_storage", "40"),
      ("s03_compat_off_ef_inert", "100"),
      ("s04_compat_on_probes_maps", "50"),
      ("s05_compat_on_ef_maps", "500"),
      ("s06_vectors_nprobe_native", "60"),
      ("s07_show_probes_shared", "60"),
      ("s08_vectors_ef_native", "600"),
      ("s09_show_ef_shared", "600"),
      ("s10_search_mode_maps", "basic"),
      ("s11_enable_index_bool_norm", "true")))
    // the gate runs on its own newSession: the caller's confs untouched
    assert(Touched.map(k => k -> spark.conf.getOption(k)) === before)
  }

  test("compact_var.slt SHOW statements run verbatim") {
    val ds = spark.newSession()
    def show(key: String): String = {
      val row = ds.sql(s"SHOW $key;").head()
      row.getString(0)
    }
    // the slt's own sequence; one documented divergence: a never-set
    // vectors.ivf_nprobe prints `auto` (this engine's stronger default,
    // resolving max(10, the artifact's calibrated hint)) where the
    // reference prints its fixed default 10
    ds.sql("SET vectors.pgvector_compatibility=off;")
    assert(show("vectors.pgvector_compatibility") === "off")
    ds.sql("SET ivfflat.probes=40;")
    assert(show("vectors.ivf_nprobe") === "auto") // slt: 10 (see above)
    assert(show("ivfflat.probes") === "40")
    ds.sql("SET hnsw.ef_search=400;")
    // slt: 100 — unset prints auto since round 17 (the calibrated
    // ef_hint default, the ivf_nprobe divergence precedent)
    assert(show("vectors.hnsw_ef_search") === "auto")
    assert(show("hnsw.ef_search") === "400")
    ds.sql("SET vectors.pgvector_compatibility=on;")
    assert(show("vectors.pgvector_compatibility") === "on")
    ds.sql("SET ivfflat.probes=50;")
    assert(show("vectors.ivf_nprobe") === "50")
    assert(show("ivfflat.probes") === "50")
    ds.sql("SET hnsw.ef_search=500;")
    assert(show("vectors.hnsw_ef_search") === "500")
    assert(show("hnsw.ef_search") === "500")
    ds.sql("SET ivfflat.probes=60;")
    assert(show("vectors.ivf_nprobe") === "60")
    assert(show("ivfflat.probes") === "60")
    ds.sql("SET vectors.hnsw_ef_search=600;")
    assert(show("vectors.hnsw_ef_search") === "600")
    assert(show("hnsw.ef_search") === "600")
    // the column carries the parameter name (the PG SHOW shape), and
    // Spark's own SHOW statements are never claimed
    assert(ds.sql("SHOW vectors.search_mode").schema.head.name ===
      "vectors.search_mode")
    assert(ds.sql("SHOW TABLES").schema.head.name !== "TABLES")
    // an unset FOREIGN name errors like PG's unrecognized parameter
    val ds2 = spark.newSession()
    val e = intercept[Exception](ds2.sql("SHOW ivfflat.probes").collect())
    assert(e.getMessage.contains("unrecognized configuration parameter"))
  }

  test("executing.rs GUCs: rerank sizes, fast-scan/transport advisory (round 14)") {
    val ds = spark.newSession()
    org.apache.spark.sql.SparkSession.setActiveSession(ds)
    try {
      def show(k: String): String =
        Gucs.showValue(ds, k)
      // unset rerank sizes SHOW the engine's stronger default (the
      // ivf_nprobe `auto` divergence convention)
      assert(show("vectors.sq_rerank_size") === "auto")
      assert(show("vectors.pq_rerank_size") === "auto")
      // SET lands on the native conf; SHOW reads it back
      assert(Gucs.rewriteSet("SET vectors.sq_rerank_size = 250") ===
        "SET spark.graft.sq8.rerankSize=250")
      ds.conf.set("spark.graft.sq8.rerankSize", "250")
      assert(show("vectors.sq_rerank_size") === "250")
      // out-of-range / non-integer values error at SET like PG
      intercept[IllegalArgumentException](
        Gucs.rewriteSet("SET vectors.pq_rerank_size = 70000"))
      intercept[IllegalArgumentException](
        Gucs.rewriteSet("SET vectors.sq_rerank_size = lots"))
      // fast-scan bools normalize on/off and SHOW reference defaults
      assert(Gucs.rewriteSet("SET vectors.pq_fast_scan = on") ===
        "SET spark.graft.pq.fastScan=true")
      assert(show("vectors.sq_fast_scan") === "off")
      assert(show("vectors.rq_fast_scan") === "on")
      // internal_transport validates its enum, defaults mmap
      assert(show("vectors.internal_transport") === "mmap")
      assert(Gucs.rewriteSet("SET vectors.internal_transport = unix") ===
        "SET spark.graft.internal.transport=unix")
      intercept[IllegalArgumentException](
        Gucs.rewriteSet("SET vectors.internal_transport = carrier_pigeon"))
      // openai keys store like PG (quoted values strip one layer)
      assert(Gucs.rewriteSet("SET vectors.openai_api_key = 'sk-x'") ===
        "SET spark.graft.openai.apiKey=sk-x")
    } finally
      org.apache.spark.sql.SparkSession.setActiveSession(spark)
  }

  test("rewriteSet leaves non-GUC SETs and other statements untouched") {
    assert(Gucs.rewriteSet("SET spark.sql.shuffle.partitions=7") ===
      "SET spark.sql.shuffle.partitions=7")
    assert(Gucs.rewriteSet("SET search_path TO pg_temp, vectors;") ===
      "SET search_path TO pg_temp, vectors;")
    assert(Gucs.rewriteSet("SELECT 1") === "SELECT 1")
    assert(Gucs.rewriteSet(
      "ALTER VECTOR INDEX foo SET (nprobe = 4)") ===
      "ALTER VECTOR INDEX foo SET (nprobe = 4)")
    assert(Gucs.rewriteSet("SET vectors.ivf_nprobe = 12") ===
      "SET spark.graft.ann.nprobe=12")
  }
}
