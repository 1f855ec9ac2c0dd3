package graft

import org.apache.spark.sql.functions._
import graft.index.{IndexCatalog, IndexToml}

/** The reference's NATIVE Postgres DDL spellings (round 13): plain
  * `CREATE INDEX ... USING vectors (col opclass) WITH (options =
  * "<TOML>")`, the pgvector-compat `USING hnsw/ivfflat` forms
  * (compact_stmt.slt), `DROP INDEX`, `REINDEX INDEX` (reindex.slt),
  * `VACUUM FULL` (index_vacuum.slt), and the TOML `[indexing.*]`
  * matrix (index.rs IndexingOptions/QuantizationOptions). */
class PgDdlSpec extends SparkSpec {
  import spark.implicits._

  private lazy val srcDir: String = {
    val dir = sys.props("java.io.tmpdir") + "/graft_pgddl_src"
    if (!new java.io.File(dir, "_SUCCESS").isFile) {
      val rnd = new scala.util.Random(7)
      (0 until 64).map(i =>
          (i.toLong, Array.fill(4)(rnd.nextFloat() * 2f - 1f)))
        .toDF("vec_id", "val")
        .coalesce(1).write.mode("overwrite").parquet(dir)
    }
    dir
  }

  test("IndexToml: defaults, multi-line ivf, quantization, unknown fields") {
    assert(IndexToml.parse("") ===
      IndexToml.Indexing("hnsw", Map.empty, None))
    assert(IndexToml.parse("[indexing.hnsw]") ===
      IndexToml.Indexing("hnsw", Map.empty, None))
    assert(IndexToml.parse("\n[indexing.ivf]\nnlist = 20\n") ===
      IndexToml.Indexing("ivf", Map("nlist" -> "20"), None))
    assert(IndexToml.parse("[indexing.hnsw.quantization.product]") ===
      IndexToml.Indexing("hnsw", Map.empty, Some(("product", Map.empty))))
    assert(IndexToml.parse("[indexing.flat]") ===
      IndexToml.Indexing("flat", Map.empty, None))
    assert(IndexToml.parse("[indexing.sparse_inverted_index]") ===
      IndexToml.Indexing("sparse_inverted_index", Map.empty, None))
    // serde deny_unknown_fields parity: the index.slt error contract
    val e1 = intercept[IllegalArgumentException](
      IndexToml.parse("unknown_field = 1"))
    assert(e1.getMessage.contains("unknown"))
    val e2 = intercept[IllegalArgumentException](
      IndexToml.parse("[indexing.hnsw]\nbogus = 2"))
    assert(e2.getMessage.contains("unknown field `bogus`"))
    val e3 = intercept[IllegalArgumentException](
      IndexToml.parse("[indexing.btree]"))
    assert(e3.getMessage.contains("unknown variant `btree`"))
    // validation ranges (index.rs validators)
    intercept[IllegalArgumentException](
      IndexToml.parse("[indexing.hnsw]\nm = 2"))
    intercept[IllegalArgumentException](IndexToml.parse(
      "[indexing.hnsw.quantization.scalar]\nbits = 3"))
    // vbase.slt's root dotted-key lifecycle knob: accepted (advisory),
    // validated against the reference's own field set
    assert(IndexToml.parse(
      "optimizing.optimizing_threads = 16\n[indexing.hnsw]") ===
      IndexToml.Indexing("hnsw", Map.empty, None,
        Map("optimizing.optimizing_threads" -> "16")))
    assert(IndexToml.parse("[segment]\nmax_sealed_segment_size = 100")
      .lifecycle === Map("segment.max_sealed_segment_size" -> "100"))
    val e5 = intercept[IllegalArgumentException](
      IndexToml.parse("[optimizing]\nbogus_knob = 1"))
    assert(e5.getMessage.contains("unknown field `bogus_knob`"))
    // quantization is dense-only (reference validate())
    val e4 = intercept[IllegalArgumentException](IndexToml.parse(
      "[indexing.sparse_inverted_index.quantization.scalar]"))
    assert(e4.getMessage.contains("only supported for dense"))
    assert(IndexToml.toReloptions(
      IndexToml.parse("[indexing.ivf]\nnlist = 20")) === "indexing=ivf,nlist=20")
    assert(IndexToml.toReloptions(IndexToml.parse(
      "[indexing.hnsw.quantization.scalar]\nbits = 8")) ===
      "indexing=hnsw,quantization=scalar,bits=8")
  }

  test("native CREATE INDEX: anonymous naming, REINDEX INDEX, DROP INDEX") {
    val tbl = "pgddl_t"
    spark.sql(s"CREATE TABLE IF NOT EXISTS $tbl USING parquet LOCATION '$srcDir'")
    // debris guard for re-runs with drifted recipes
    Seq("pgddl_t_val_idx", "pgddl_t_val_idx1").foreach(IndexCatalog.drop(spark, _))
    // EXPLAIN plans the command, builds nothing
    val plan = spark.sql(s"""EXPLAIN CREATE INDEX ON $tbl USING vectors
        (val vector_l2_ops) WITH (options = "[indexing.hnsw]")""")
      .head().getString(0)
    assert(plan.contains("CreatePgIndexCommand"))
    assert(IndexCatalog.load(spark, "pgddl_t_val_idx").isEmpty)
    // anonymous create -> the PG name <table>_<col>_idx
    assert(spark.sql(s"""CREATE INDEX ON $tbl USING vectors
        (val vector_l2_ops) WITH (options = "[indexing.hnsw]")""")
      .head().getString(0) === "ok")
    val m = IndexCatalog.load(spark, "pgddl_t_val_idx").get
    assert(m.kind === "hnsw" && m.metric === "l2" && m.source === srcDir)
    // the heap-TID analog: vec_id (first atomic non-vector column)
    assert(m.params.get("sql_cols").contains("vec_id,val"))
    // idempotent re-run: the identical recipe REUSES the name
    assert(spark.sql(s"""CREATE INDEX ON $tbl USING vectors
        (val vector_l2_ops) WITH (options = "[indexing.hnsw]")""")
      .head().getString(0) === "ok")
    assert(IndexCatalog.load(spark, "pgddl_t_val_idx1").isEmpty)
    // a DIFFERENT opclass suffixes like PG (index.slt stacks three)
    assert(spark.sql(s"""CREATE INDEX ON $tbl USING vectors
        (val vectors.vector_dot_ops) WITH (options = "[indexing.hnsw]")""")
      .head().getString(0) === "ok")
    assert(IndexCatalog.load(spark, "pgddl_t_val_idx1").get.metric === "dot")
    // stat-view parity on the graph artifact: idx_tuples parses the
    // FlatGraph header (variable-width metric field — a fixed offset
    // would read dims)
    val st = IndexCatalog.stats(spark)
      .filter(col("idx_name") === "pgddl_t_val_idx")
      .select("idx_status", "idx_tuples").head()
    assert(st.getString(0) === "NORMAL")
    assert(st.getLong(1) === 64L, s"hnsw idx_tuples must be the row count")
    // REINDEX INDEX (reindex.slt): generation swap via the recipe
    assert(spark.sql("REINDEX INDEX pgddl_t_val_idx").head().getString(0) === "ok")
    assert(IndexCatalog.load(spark, "pgddl_t_val_idx").get.params
      .contains("data_dir"))
    assert(spark.sql("REINDEX INDEX CONCURRENTLY pgddl_t_val_idx")
      .head().getString(0) === "ok")
    // DROP INDEX list form + IF EXISTS
    assert(spark.sql("DROP INDEX pgddl_t_val_idx, pgddl_t_val_idx1")
      .collect().map(_.getString(0)).toSeq === Seq("ok", "ok"))
    assert(IndexCatalog.load(spark, "pgddl_t_val_idx").isEmpty)
    assert(spark.sql("DROP INDEX IF EXISTS pgddl_t_val_idx")
      .head().getString(0) === "skipped")
    intercept[Exception](spark.sql("DROP INDEX pgddl_t_val_idx").collect())
  }

  test("pgvector-compat CREATE INDEX forms are compatibility-gated") {
    val ds = spark.newSession()
    ds.sql(s"CREATE TABLE IF NOT EXISTS pgddl_c USING parquet LOCATION '$srcDir'")
    IndexCatalog.drop(ds, "pgddl_hnsw_ix")
    // off (the default): the hnsw AM does not exist (compatibility.rs
    // skips the swap; compact_stmt.slt sets the GUC on first)
    val e = intercept[Exception](ds.sql(
      "CREATE INDEX pgddl_hnsw_ix ON pgddl_c USING hnsw (val vector_l2_ops)")
      .collect())
    assert(e.getMessage.contains("access method \"hnsw\" does not exist"))
    ds.sql("SET vectors.pgvector_compatibility=on")
    assert(ds.sql(
      """CREATE INDEX pgddl_hnsw_ix ON pgddl_c USING hnsw (val vector_l2_ops)
         WITH (m = 12, ef_construction = 80)""").head().getString(0) === "ok")
    val m = IndexCatalog.load(ds, "pgddl_hnsw_ix").get
    // the swap records the NATIVE am (the reference's hook rewrites the
    // statement before PG stores anything)
    assert(m.kind === "hnsw" && m.params.get("sql_am").contains("vectors"))
    assert(m.params.get("ef_construction").contains("80"))
    // unknown AM / opclass error shapes (compact_stmt.slt)
    val e2 = intercept[Exception](ds.sql(
      "CREATE INDEX pgddl_w ON pgddl_c USING wrong_type (val vector_cosine_ops)")
      .collect())
    assert(e2.getMessage.contains("access method \"wrong_type\" does not exist"))
    val e3 = intercept[Exception](ds.sql(
      "CREATE INDEX pgddl_w ON pgddl_c USING ivfflat (val wrong_operator)")
      .collect())
    assert(e3.getMessage.contains(
      "operator class \"wrong_operator\" does not exist for access method \"vectors\""))
    assert(ds.sql("DROP INDEX pgddl_hnsw_ix").head().getString(0) === "ok")
  }

  test("TOML indexing matrix: dollar-quoted ivf, flat, quantized, sparse") {
    // $$-quoted multi-line options (ivf.slt) through the statement
    IndexCatalog.drop(spark, "pgddl_ivf_ix")
    assert(spark.sql(s"""CREATE INDEX pgddl_ivf_ix ON '$srcDir'
        USING vectors (val vector_l2_ops)
        WITH (options = $$$$
        [indexing.ivf]
        nlist = 4
        $$$$)""").head().getString(0) === "ok")
    val mIvf = IndexCatalog.load(spark, "pgddl_ivf_ix").get
    assert(mIvf.kind === "ivf" && mIvf.params.get("nlist").contains("4"))
    // flat: catalog-only (the exact ORDER BY plan IS the flat scan) —
    // no pushdown registration
    IndexCatalog.drop(spark, "pgddl_flat_ix")
    assert(spark.sql(s"""CREATE INDEX pgddl_flat_ix ON '$srcDir'
        USING vectors (val vector_l2_ops)
        WITH (options = "[indexing.flat]")""").head().getString(0) === "ok")
    assert(IndexCatalog.load(spark, "pgddl_flat_ix").get.kind === "flat")
    assert(!graft.plans.AnnPushdown.snapshot(srcDir)
      .exists(_.indexName == "pgddl_flat_ix"))
    // quantized kinds (quantization.slt / ivf.slt shapes)
    for ((nm, opts, kind) <- Seq(
        ("pgddl_sq_ix", "[indexing.hnsw.quantization.scalar]", "hnsw_sq8"),
        ("pgddl_pq_ix", "[indexing.hnsw.quantization.product]", "hnsw_pq"),
        ("pgddl_rq_ix", "[indexing.flat.quantization.rabitq]", "rabitq"),
        ("pgddl_ipq_ix", "[indexing.ivf.quantization.product]", "ivfpq"),
        ("pgddl_isq_ix", "[indexing.ivf.quantization.scalar]", "ivfsq8"))) {
      IndexCatalog.drop(spark, nm)
      assert(spark.sql(s"""CREATE INDEX $nm ON '$srcDir'
          USING vectors (val vector_l2_ops)
          WITH (options = "$opts")""").head().getString(0) === "ok", nm)
      assert(IndexCatalog.load(spark, nm).get.kind === kind, nm)
      assert(!graft.plans.AnnPushdown.snapshot(srcDir).exists(_.indexName == nm))
    }
    // quantization sub-table keys on a PLAIN kind keep erroring at BOTH
    // layers: IndexToml (the TOML spelling) and the strict option sets
    // (the flat k=v spelling through CREATE VECTOR INDEX) — while
    // spherical_centroids=false is a valid [indexing.ivf] key with or
    // without quantization
    val ePlain = intercept[Exception](spark.sql(s"""CREATE INDEX pgddl_badb
        ON '$srcDir' USING vectors (val vector_l2_ops)
        WITH (options = "[indexing.hnsw]
          bits = 8")""").collect())
    assert(ePlain.getMessage.contains("unknown"), ePlain.getMessage)
    val eKv = intercept[Exception](spark.sql(s"""CREATE VECTOR INDEX
        pgddl_badkv ON '$srcDir' USING vectors (vec_id, val vector_l2_ops)
        WITH (indexing = hnsw, bits = 8)""").collect())
    assert(eKv.getMessage.contains("unknown"), eKv.getMessage)
    IndexCatalog.drop(spark, "pgddl_sphf_ix")
    assert(spark.sql(s"""CREATE INDEX pgddl_sphf_ix ON '$srcDir'
        USING vectors (val vector_l2_ops)
        WITH (options = "[indexing.ivf]
          nlist = 2
          spherical_centroids = false")""").head().getString(0) === "ok")
    assert(IndexCatalog.load(spark, "pgddl_sphf_ix").get.kind === "ivf")
    assert(spark.sql("DROP INDEX pgddl_sphf_ix").head().getString(0) === "ok")
    // ivf rabitq is rejected with the flat pointer
    val e = intercept[Exception](spark.sql(s"""CREATE INDEX pgddl_bad ON
        '$srcDir' USING vectors (val vector_l2_ops)
        WITH (options = "[indexing.ivf.quantization.rabitq]")""").collect())
    assert(e.getMessage.contains("flat.quantization.rabitq"))
    // sparse inverted index needs svector_dot_ops
    IndexCatalog.drop(spark, "pgddl_sp_ix")
    assert(spark.sql(s"""CREATE INDEX pgddl_sp_ix ON '$srcDir'
        USING vectors (val svector_dot_ops)
        WITH (options = "[indexing.sparse_inverted_index]")""")
      .head().getString(0) === "ok")
    assert(IndexCatalog.load(spark, "pgddl_sp_ix").get.kind === "sparse")
    val e2 = intercept[Exception](spark.sql(s"""CREATE INDEX pgddl_bad2 ON
        '$srcDir' USING vectors (val svector_l2_ops)
        WITH (options = "[indexing.sparse_inverted_index]")""").collect())
    assert(e2.getMessage.contains("svector_dot_ops"))
    // unknown TOML field through the statement: the index.slt contract
    val e3 = intercept[Exception](spark.sql(s"""CREATE INDEX pgddl_bad3 ON
        '$srcDir' USING vectors (val vector_l2_ops)
        WITH (options = "unknown_field = 1")""").collect())
    assert(e3.getMessage.contains("unknown"))
  }

  test("VACUUM FULL sweeps recipe-complete indexes; quantized kinds reindex") {
    IndexCatalog.drop(spark, "pgddl_vac_ix")
    assert(spark.sql(s"""CREATE INDEX pgddl_vac_ix ON '$srcDir'
        USING vectors (val vector_l2_ops)
        WITH (options = "[indexing.flat.quantization.scalar]")""")
      .head().getString(0) === "ok")
    assert(IndexCatalog.load(spark, "pgddl_vac_ix").get.kind === "sq8")
    // REINDEX of the quantized kind: generation swap, kind preserved
    assert(spark.sql("REINDEX INDEX pgddl_vac_ix").head().getString(0) === "ok")
    val m2 = IndexCatalog.load(spark, "pgddl_vac_ix").get
    assert(m2.kind === "sq8" && m2.params.contains("data_dir"))
    // plain VACUUM: no-op success; VACUUM FULL '<path>': scoped sweep
    assert(spark.sql("VACUUM").head().getString(0).startsWith("ok"))
    val swept = spark.sql(s"VACUUM FULL '$srcDir'").head().getString(0)
    assert(swept.startsWith("ok ("), swept)
    val m3 = IndexCatalog.load(spark, "pgddl_vac_ix").get
    assert(m3.kind === "sq8" &&
      m3.params("reindex_gen").toLong > m2.params("reindex_gen").toLong)
    assert(spark.sql("DROP INDEX pgddl_vac_ix").head().getString(0) === "ok")
  }

  test("rewrite guards: CTAS vector casts and qualified array access survive") {
    import graft.index.OpSqlRewrite
    // a ::vector(3) CAST inside table DDL belongs to rewriteCasts — the
    // column-type rewrite must not strip its graft semantics
    val ctas = "CREATE TABLE x AS SELECT '[1,2,3]'::vector(3) AS v"
    assert(OpSqlRewrite.tableTypes(ctas) === ctas)
    // ...while a column TYPE in the same statement still rewrites
    assert(OpSqlRewrite.tableTypes("CREATE TABLE x (v vector(3))")
      .contains("ARRAY<FLOAT>"))
    // end to end: the CTAS parses and builds the parsed-vector column
    spark.sql("DROP TABLE IF EXISTS pgddl_ctas")
    spark.sql("CREATE TABLE pgddl_ctas AS SELECT '[1,2,3]'::vector(3) AS v")
    assert(spark.table("pgddl_ctas").head().getSeq[Float](0) ===
      Seq(1f, 2f, 3f))
    spark.sql("DROP TABLE pgddl_ctas")
    // a QUALIFIED access to a column named array keeps Spark's
    // element-subscript meaning; the bare spelling is PG's constructor
    val q = spark.sql(
      "SELECT t.array[0], array[7] FROM (SELECT array(5, 6) AS array) t")
      .head()
    assert(q.getInt(0) === 5)
    assert(q.getSeq[Int](1) === Seq(7))
    // CAST(x AS vector(3)) in table DDL is NOT rewritten to a plain
    // array cast (which would silently NULL the column) — it fails
    // loudly; the supported cast spelling is ::vector
    val eCast = intercept[Exception](spark.sql(
      "CREATE TABLE pgddl_castas AS SELECT CAST('[1,2,3]' AS vector(3)) AS v"))
    assert(eCast.getMessage.toLowerCase.contains("datatype") ||
      eCast.getMessage.contains("vector"), eCast.getMessage)
  }

  test("id inference: wrong-typed id errors; integral-only auto-pick") {
    val dir = sys.props("java.io.tmpdir") + "/graft_pgddl_badid"
    if (!new java.io.File(dir, "_SUCCESS").isFile)
      (0 until 8).map(i => (i.toDouble + 0.5, s"t$i",
          Array.fill(4)(i.toFloat)))
        .toDF("id", "title", "val")
        .coalesce(1).write.mode("overwrite").parquet(dir)
    // a PRESENT `id` of double type must error actionably, never pick
    // `title` (whose cast to long would null every key)
    val e = intercept[Exception](spark.sql(s"""CREATE INDEX pgddl_badid
        ON '$dir' USING vectors (val vector_l2_ops)
        WITH (options = "[indexing.flat]")""").collect())
    assert(e.getMessage.contains("id_col"), e.getMessage)
    assert(e.getMessage.contains("double"), e.getMessage)
  }

  test("stats sizes are stable across calls (sidecar excluded from du)") {
    IndexCatalog.drop(spark, "pgddl_size_ix")
    spark.sql(s"""CREATE INDEX pgddl_size_ix ON '$srcDir'
        USING vectors (val vector_l2_ops)
        WITH (options = "[indexing.flat.quantization.scalar]")""")
    def size(): Long = IndexCatalog.stats(spark)
      .filter(col("idx_name") === "pgddl_size_ix")
      .select("idx_size_bytes").head().getLong(0)
    val s1 = size(); val s2 = size()
    assert(s1 === s2, "the tuple sweep's sidecar must not change idx_size_bytes")
    assert(spark.sql("DROP INDEX pgddl_size_ix").head().getString(0) === "ok")
  }

  test("unknown AM + non-vector opclass delegates (round-14 claim narrowing)") {
    // CREATE INDEX ... USING btree (c text_ops) must NOT be claimed —
    // it falls through to Spark's grammar, whose error is about the
    // statement surface, never our 'access method does not exist'
    val e = intercept[Exception] {
      spark.sql("CREATE INDEX pgddl_bt ON pgddl_nosuch USING btree (c text_ops)")
        .collect()
    }
    assert(!e.getMessage.contains("does not exist\""), e.getMessage)
    // vector-family opclasses under an unknown AM stay CLAIMED and give
    // the PG error shape
    val e2 = intercept[Exception] {
      spark.sql(
        "CREATE INDEX pgddl_vx ON pgddl_nosuch USING weird (c vector_l2_ops)")
        .collect()
    }
    assert(e2.getMessage.contains("""access method "weird" does not exist"""),
      e2.getMessage)
  }

  test("NULL ids in the source error actionably at CREATE (round 14)") {
    import java.nio.file.Files
    val dir = Files.createTempDirectory("pgddl_nullid_").toFile
    val p = new java.io.File(dir, "t").getAbsolutePath
    import spark.implicits._
    Seq((Some(1L), Seq(1f, 2f)), (None, Seq(3f, 4f)))
      .toDF("id", "vec").write.parquet(p)
    val e = intercept[Exception] {
      spark.sql(s"CREATE INDEX pgddl_nullid ON '$p' USING vectors (vec vector_l2_ops)")
        .collect()
    }
    assert(e.getMessage.contains("NULL ids"), e.getMessage)
    graft.index.IndexCatalog.drop(spark, "pgddl_nullid")
  }

  test("partial PG-form create (partition.slt WHERE shape) scopes rows") {
    IndexCatalog.drop(spark, "pgddl_part_ix")
    assert(spark.sql(s"""CREATE INDEX pgddl_part_ix ON '$srcDir'
        USING vectors (val vector_l2_ops)
        WITH (options = "[indexing.ivf]
          nlist = 2") WHERE (vec_id < 32)""").head().getString(0) === "ok")
    val m = IndexCatalog.load(spark, "pgddl_part_ix").get
    assert(m.params.get("sql_where").exists(_.contains("vec_id < 32")))
    // the artifact holds only the scoped rows
    val rows = spark.read.parquet(IndexCatalog.dataDir(spark, "pgddl_part_ix"))
      .count()
    assert(rows === 32)
    assert(spark.sql("DROP INDEX pgddl_part_ix").head().getString(0) === "ok")
  }

  test("parts>1 DDL builds record the suggest_parts advisory in the stat view") {
    IndexCatalog.drop(spark, "pgddl_parts_ix")
    assert(spark.sql(s"""CREATE VECTOR INDEX pgddl_parts_ix ON '$srcDir'
        USING vectors (vec_id, val vector_l2_ops)
        WITH (parts = 2, m = 8, ef_construction = 100)""")
      .head().getString(0) === "ok")
    val m = IndexCatalog.load(spark, "pgddl_parts_ix").get
    // advisory only: the final spatial cell count — equals files, and
    // equals parts on this near-uniform fixture (no cell splits)
    assert(m.params.get("suggest_parts") === m.params.get("files"))
    val opts = spark.sql("""SELECT idx_options FROM pg_vector_index_stat
        WHERE indexname = 'pgddl_parts_ix'""").head().getString(0)
    assert(opts.contains("suggest_parts="),
      s"the stat view must surface the advisory, got $opts")
    assert(spark.sql("DROP VECTOR INDEX pgddl_parts_ix")
      .head().getString(0) === "ok")
  }
}
