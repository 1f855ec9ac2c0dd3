package graft

import graft.types.VectorText

/** Reference sqllogictest conformance (round 13): the pure-expression
  * queries from tests/sqllogictest/operator.slt, vector.slt,
  * svector.slt, and bvector.slt run VERBATIM through spark.sql (the
  * dialect rewrite + type dispatches) and reproduce the reference's
  * printed answers. Expected vectors compare as PARSED floats — the
  * reference prints shortest-roundtrip f32 decimals, so parsing its
  * output text yields exactly the f32 values its kernels computed, and
  * bit-equality with ours is the assertion. Table-bound slt queries
  * are exercised by the gate inventory; this spec pins the LITERAL
  * surface (casts, arithmetic, comparisons, distances, norms). */
class SltConformanceSpec extends SparkSpec {

  private def floats(sql: String): Seq[Float] =
    spark.sql(sql).head().getSeq[Float](0)
  private def dbl(sql: String): Double = spark.sql(sql).head().getDouble(0)
  private def bool(sql: String): Boolean = spark.sql(sql).head().getBoolean(0)
  private def expect(lit: String): Seq[Float] =
    VectorText.parseDense(lit).toSeq

  test("init.sql: CREATE EXTENSION vectors ≡ GraftExtensions session wiring") {
    // the reference harness prologue (tests/init.sql, one line) loads
    // the extension into every suite's session; the analog is the
    // spark.sql.extensions entry every gate/bench/test session carries —
    // this pin asserts the wiring is present AND is what makes the
    // dialect live (a ::vector cast only parses through the injected
    // parser)
    assert(spark.conf.get("spark.sql.extensions", "")
      .contains("graft.plans.GraftExtensions"))
    assert(floats("SELECT '[1,2,3]'::vector") === expect("[1, 2, 3]"))
  }

  test("operator.slt: vector + - * (verbatim, f32 expected values)") {
    assert(floats("SELECT '[1,2.3,4e5]'::vector + '[6,7.8,9e10]'") ===
      expect("[7, 10.1, 90000400000]"))
    assert(floats("SELECT '[1,2.3,4e5]'::vector - '[6,7.8,9e10]'") ===
      expect("[-5, -5.5, -89999600000]"))
    assert(floats("SELECT '[1,2,3]'::vector * '[4,5,6]'::vector") ===
      expect("[4, 10, 18]"))
  }

  test("operator.slt: vector comparisons (VERBATIM, incl. dims error)") {
    // the slt spellings exactly: bare-string right operands coerce
    // through the family parser (VectorArithRule → OpDispatch.comparison)
    assert(bool("SELECT '[1,2,3]'::vector = '[1,2,3]'"))
    assert(!bool("SELECT '[1,2,3]'::vector <> '[1,2,3]'"))
    assert(bool("SELECT '[1,2]'::vector < '[2,2]'"))
    assert(bool("SELECT '[1,2]'::vector < '[1,3]'"))
    assert(bool("SELECT '[1,2]'::vector <= '[2,2]'"))
    assert(!bool("SELECT '[1,2]'::vector > '[2,2]'"))
    assert(!bool("SELECT '[1,2]'::vector >= '[2,2]'"))
    // operator.slt:35 `statement error differs in dimensions`
    val e = intercept[Exception] {
      spark.sql("SELECT '[1,2]'::vector < '[1,2,3]'").collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("differs in dimensions")),
      s"got: ${msgs(e)}")
    // both-cast spellings take the same dims-checked operator
    assert(bool("SELECT '[1,2]'::vector < '[2,2]'::vector"))
    val e2 = intercept[Exception] {
      spark.sql("SELECT '[1,2]'::vector = '[1,2,3]'::vector").collect()
    }
    assert(msgs(e2).exists(_.contains("differs in dimensions")))
    // svector/bvector comparisons under the same rule (their kernels
    // already dims-check)
    assert(bool("SELECT '{0:1, 1:2}/2'::svector < '{0:2}/2'"))
    assert(bool("SELECT '[1, 0, 1]'::bvector = '[1, 0, 1]'"))
  }

  test("operator.slt: <-> <#> <=> distances") {
    assert(dbl("SELECT '[1,2]'::vector <-> '[3,4]'") === 8.0)
    assert(dbl("SELECT '[1,2]'::vector <#> '[3,4]'") === -11.0)
    assert(bool("SELECT '[1,2]'::vector <=> '[3,4]' > -1"))
  }

  test("vector.slt / svector.slt / bvector.slt: norms and dims") {
    assert(dbl("SELECT vector_norm('[3,4]'::vector)") === 5.0)
    assert(dbl("SELECT vector_norm('{0:3, 1:4}/2'::svector)") === 5.0)
    assert(dbl("SELECT vector_norm('[1, 1, 0, 1]'::bvector)") ===
      math.sqrt(3.0))
    assert(spark.sql("SELECT vector_dims('[1,2,3]'::vector)")
      .head().getInt(0) === 3)
    assert(spark.sql("SELECT vector_dims('{0:1}/7'::svector)")
      .head().getInt(0) === 7)
    // parse tolerance from cast.slt: one trailing comma is accepted
    assert(floats("SELECT '[1,]'::vector") === Seq(1f))
  }

  test("svector.slt: sparse distances and arithmetic") {
    assert(dbl("SELECT '{0:3, 1:4}/2'::svector <-> '{0:0}/2'") === 25.0)
    assert(dbl("SELECT '{0:1, 1:2}/2'::svector <#> '{0:3, 1:4}/2'") === -11.0)
    assert(spark.sql(
      "SELECT svec_to_dense('{0:1}/3'::svector + '{1:2}/3'::svector)")
      .head().getSeq[Float](0) === Seq(1f, 2f, 0f))
  }

  test("bvector.slt: hamming / jaccard / bit ops") {
    assert(dbl("SELECT '[1, 0, 1]'::bvector <-> '[0, 0, 1]'") === 1.0)
    assert(dbl("SELECT '[1, 0, 1]'::bvector <~> '[0, 0, 1]'") === 0.5)
    assert(spark.sql(
      "SELECT format_bvector('[1, 0, 1]'::bvector & '[1, 1, 0]'::bvector)")
      .head().getString(0) === "[1, 0, 0]")
    assert(spark.sql(
      "SELECT format_bvector('[1, 0, 1]'::bvector | '[1, 1, 0]'::bvector)")
      .head().getString(0) === "[1, 1, 1]")
  }

  test("null.slt / error.slt: NULL propagation and dims-mismatch errors") {
    // STRICT semantics: NULL in -> NULL out, through casts and operators
    assert(spark.sql("SELECT NULL::vector <-> '[1]'").head().isNullAt(0))
    assert(spark.sql("SELECT '[1]'::vector <#> NULL::vector").head().isNullAt(0))
    assert(spark.sql("SELECT vector_norm(NULL::vector)").head().isNullAt(0))
    // dims mismatches error at runtime with the reference's wording
    val e = intercept[Exception] {
      spark.sql("SELECT '[1,2]'::vector <-> '[1,2,3]'").collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("differ")), s"got: ${msgs(e)}")
  }

  test("bvector_subscript.slt: slice fetch, optional bounds, NULL law") {
    def bits(sql: String): String =
      spark.sql(s"SELECT format_bvector(($sql))").head().getString(0)
    assert(bits("('[0, 1, 0, 1, 0, 1, 0, 1]'::bvector)[3:6]") === "[1, 0, 1]")
    assert(bits("('[0, 1, 0, 1, 0, 1, 0, 1]'::bvector)[:4]") === "[0, 1, 0, 1]")
    assert(bits("('[0, 1, 0, 1, 0, 1, 0, 1]'::bvector)[5:]") === "[1, 0, 1]")
    assert(bits("('[0, 1, 0, 1, 0, 1, 0, 1]'::bvector)[1:8]") ===
      "[1, 0, 1, 0, 1, 0, 1]")
    // invalid ranges are NULL (reversed, past-the-end, empty, negative)
    for (sub <- Seq("[5:4]", "[9:]", "[:0]", "[:-1]"))
      assert(spark.sql(
        s"SELECT ('[0, 1, 0, 1, 0, 1, 0, 1]'::bvector)$sub").head().isNullAt(0),
        s"$sub must be NULL")
    // dense and sparse take the same subscript law
    assert(spark.sql("SELECT ('[1, 2, 3, 4]'::vector)[1:3]")
      .head().getSeq[Float](0) === Seq(2f, 3f))
    assert(spark.sql(
      "SELECT svec_to_dense(('{1:5}/4'::svector)[1:3])")
      .head().getSeq[Float](0) === Seq(5f, 0f))
    // Spark's own single-index subscript is untouched
    assert(spark.sql("SELECT array(7, 8, 9)[1]").head().getInt(0) === 8)
  }

  test("vector/svector/vecf16_subscript.slt: NULL bounds, re-based sparse, f16") {
    val v = "('[0, 1, 2, 3, 4, 5, 6, 7]'::vector)"
    assert(spark.sql(s"SELECT $v[3:6]").head().getSeq[Float](0) ===
      Seq(3f, 4f, 5f))
    // any NULL bound NULLs the slice (never an analysis error)
    for (sub <- Seq("[NULL:NULL]", "[NULL:8]", "[1:NULL]", "[NULL:]", "[:NULL]"))
      assert(spark.sql(s"SELECT $v$sub").head().isNullAt(0),
        s"$sub must be NULL")
    // sparse slices re-base indexes against the new dims
    def sfmt(sql: String): String =
      spark.sql(s"SELECT format_svector(($sql))").head().getString(0)
    val sv = "('{1:1, 2:2, 3:3, 4:4, 5:5, 6:6, 7:7}/8'::svector)"
    assert(sfmt(s"$sv[3:6]") === "{0:3, 1:4, 2:5}/3")
    assert(sfmt(s"$sv[:4]") === "{1:1, 2:2, 3:3}/4")
    assert(sfmt(s"$sv[5:]") === "{0:5, 1:6, 2:7}/3")
    assert(spark.sql(s"SELECT $sv[NULL:]").head().isNullAt(0))
    // vecf16 surface slices through the dense arm (f32 storage of
    // f16-rounded values); the bits form slices bit-exactly too
    assert(spark.sql("SELECT ('[0, 1, 2, 3, 4, 5, 6, 7]'::vecf16)[3:6]")
      .head().getSeq[Float](0) === Seq(3f, 4f, 5f))
    assert(spark.sql(
      "SELECT f16_to_vector(graft_slice(to_f16_bits(parse_vector('[0,1,2,3]')), 1, 3))")
      .head().getSeq[Float](0) === Seq(1f, 2f))
  }

  test("pushdown_range.slt: table-bound operator + sphere queries, printed values") {
    // the slt's 4-row, 4-type fixture (CREATE INDEX lines skipped —
    // the printed answers are index-independent); values compare as
    // the reference's OWN printed text now that the formatters carry
    // Rust-Display parity
    spark.sql(
      """SELECT * FROM VALUES
           ('[0.1, 0.1, 0.1]', '[0.1, 0.1, 0.1]', '{0:-0.1, 1:0.1, 2:0.1}/3', '[0, 0, 0]'),
           ('[0.2, 0.2, 0.2]', '[-0.2, 0.2, 0.2]', '{0:0.2, 1:-0.2, 2:0.2}/3', '[0, 0, 1]'),
           ('[0.3, 0.3, 0.3]', '[0.3, 0.3, -0.3]', '{0:-0.3, 1:0.3, 2:-0.3}/3', '[1, 1, 0]'),
           ('[0.4, 0.4, 0.4]', '[0.4, -0.4, 0.4]', '{0:-0.4, 1:-0.4, 2:-0.4}/3', '[1, 1, 1]')
           AS v(s0, s1, s2, s3)""")
      .selectExpr("s0::vector AS val0", "s1::vecf16 AS val1",
        "s2::svector AS val2", "s3::bvector AS val3")
      .createOrReplaceTempView("slt_range_t")
    // original style + sphere style: project through the formatter so
    // the assertion text is the slt's own printed column
    def col0(sql: String): Seq[String] = spark.sql(sql.replace(
      "SELECT val0", "SELECT format_vector(val0)")).collect().toSeq.map(_.getString(0))
    def col1(sql: String): Seq[String] = spark.sql(sql.replace(
      "SELECT val1", "SELECT format_vector(val1)")).collect().toSeq.map(_.getString(0))
    def col2(sql: String): Seq[String] = spark.sql(sql.replace(
      "SELECT val2", "SELECT format_svector(val2)")).collect().toSeq.map(_.getString(0))
    def col3(sql: String): Seq[String] = spark.sql(sql.replace(
      "SELECT val3", "SELECT format_bvector(val3)")).collect().toSeq.map(_.getString(0))
    assert(col0("SELECT val0 FROM slt_range_t WHERE val0 <-> '[0.24, 0.24, 0.24]' < 0.012 ORDER BY val0 <-> '[0.24, 0.24, 0.24]'") ===
      Seq("[0.2, 0.2, 0.2]", "[0.3, 0.3, 0.3]"))
    assert(col0("SELECT val0 FROM slt_range_t WHERE val0 <<->> sphere('[0.24, 0.24, 0.24]'::vector, 0.012) ORDER BY val0 <-> '[0.24, 0.24, 0.24]'") ===
      Seq("[0.2, 0.2, 0.2]", "[0.3, 0.3, 0.3]"))
    assert(col1("SELECT val1 FROM slt_range_t WHERE val1 <#> '[0.24, -0.24, 0.24]' < 0 ORDER BY val1 <#> '[0.24, -0.24, 0.24]'") ===
      Seq("[0.39990234, -0.39990234, 0.39990234]",
        "[0.099975586, 0.099975586, 0.099975586]"))
    assert(col1("SELECT val1 FROM slt_range_t WHERE val1 <<#>> sphere('[0.24, -0.24, 0.24]'::vecf16, 0) ORDER BY val1 <#> '[0.24, -0.24, 0.24]'") ===
      Seq("[0.39990234, -0.39990234, 0.39990234]",
        "[0.099975586, 0.099975586, 0.099975586]"))
    assert(col2("SELECT val2 FROM slt_range_t WHERE val2 <=> '{0:0.12, 1:0.24, 2:0.36}/3' < 1 ORDER BY val2 <=> '{0:0.12, 1:0.24, 2:0.36}/3'") ===
      Seq("{0:-0.1, 1:0.1, 2:0.1}/3", "{0:0.2, 1:-0.2, 2:0.2}/3"))
    assert(col2("SELECT val2 FROM slt_range_t WHERE val2 <<=>> sphere('{0:0.12, 1:0.24, 2:0.36}/3'::svector, 1) ORDER BY val2 <=> '{0:0.12, 1:0.24, 2:0.36}/3'") ===
      Seq("{0:-0.1, 1:0.1, 2:0.1}/3", "{0:0.2, 1:-0.2, 2:0.2}/3"))
    assert(col3("SELECT val3 FROM slt_range_t WHERE val3 <~> '[1, 1, 1]' <= 0.4 ORDER BY val3 <~> '[1, 1, 1]'") ===
      Seq("[1, 1, 1]", "[1, 1, 0]"))
    assert(col3("SELECT val3 FROM slt_range_t WHERE val3 <<~>> sphere('[1, 1, 1]'::bvector, 0.4) ORDER BY val3 <~> '[1, 1, 1]'") ===
      Seq("[1, 1, 1]", "[1, 1, 0]"))
    // multiple sphere keys, and order-by on a DIFFERENT column's operator
    assert(col0("SELECT val0 FROM slt_range_t WHERE val0 <<->> sphere('[0.24, 0.24, 0.24]'::vector, 0.012) AND val1 <<#>> sphere('[0.24, -0.24, 0.24]'::vecf16, 0.05) ORDER BY val0 <-> '[0.24, 0.24, 0.24]'") ===
      Seq("[0.2, 0.2, 0.2]"))
    // the sphere keeps 0.2 and 0.3; val1 negdot orders 0.3 first
    // (val1 row3 = [0.3, 0.3, -0.3] -> dot 0.9 -> -0.9 < row2's 0.2)
    assert(col0("SELECT val0 FROM slt_range_t WHERE val0 <<->> sphere('[0.24, 0.24, 0.24]'::vector, 0.012) ORDER BY val1 <#> '[1, 1, -1]'") ===
      Seq("[0.3, 0.3, 0.3]", "[0.2, 0.2, 0.2]"))
  }

  test("index.slt / cos.slt setup + lifecycle statements run verbatim") {
    // the slt prologue + table setup, verbatim modulo ONE documented
    // divergence: the reference indexes heap TIDs, a path-based catalog
    // needs an id COLUMN — so the CREATE TABLE carries one and the
    // INSERT selects it from generate_series (PG's own column name).
    // Everything else is the reference's spelling: SET search_path,
    // vector(3) column type, ARRAY[...]::real[], generate_series,
    // anonymous CREATE INDEX with TOML options, operator queries,
    // REINDEX, DROP.
    graft.index.IndexCatalog.drop(spark, "pgslt_t_val_idx")
    spark.sql("SET search_path TO pg_temp, vectors;")
    spark.sql("DROP TABLE IF EXISTS pgslt_t")
    spark.sql("CREATE TABLE pgslt_t (id BIGINT, val vector(3))")
    spark.sql("""INSERT INTO pgslt_t
      SELECT generate_series, ARRAY[random(), random(), random()]::real[]
      FROM generate_series(1, 1000)""")
    assert(spark.table("pgslt_t").count() === 1000L)
    // the slt's own smoke query shape (index.slt:29-41)
    def count10(op: String): Long = spark.sql(
      s"""SELECT COUNT(1) FROM (SELECT 1 FROM pgslt_t
          ORDER BY val $op '[0.5,0.5,0.5]' limit 10) t2""").head().getLong(0)
    assert(count10("<->") === 10L)
    assert(count10("<=>") === 10L)
    assert(count10("<#>") === 10L)
    assert(spark.sql("""CREATE INDEX ON pgslt_t USING vectors
        (val vector_l2_ops) WITH (options = "[indexing.hnsw]")""")
      .head().getString(0) === "ok")
    // reindex.slt: the generated PG name, both REINDEX spellings
    assert(spark.sql("REINDEX INDEX pgslt_t_val_idx")
      .head().getString(0) === "ok")
    assert(spark.sql("REINDEX INDEX CONCURRENTLY pgslt_t_val_idx")
      .head().getString(0) === "ok")
    assert(count10("<->") === 10L)
    // vbase.slt's options block with the root dotted lifecycle knob
    graft.index.IndexCatalog.drop(spark, "pgslt_vb")
    assert(spark.sql("""CREATE INDEX pgslt_vb ON pgslt_t USING vectors
        (val vector_l2_ops) WITH (options = $$
        optimizing.optimizing_threads = 16
        [indexing.hnsw]
        $$)""").head().getString(0) === "ok")
    val savedMode = spark.conf.getOption("spark.graft.search.mode")
    try {
      spark.sql("SET vectors.search_mode=vbase")
      assert(count10("<->") === 10L)
    } finally savedMode match {
      case Some(v) => spark.conf.set("spark.graft.search.mode", v)
      case None => spark.conf.unset("spark.graft.search.mode")
    }
    assert(spark.sql("DROP INDEX pgslt_vb").head().getString(0) === "ok")
    assert(spark.sql("DROP INDEX pgslt_t_val_idx").head().getString(0) === "ok")
    spark.sql("DROP TABLE pgslt_t")
  }

  test("issue_427.slt / update.slt: NULL-only builds, subquery operands, REINDEX TABLE") {
    graft.index.IndexCatalog.drop(spark, "pgslt_n_val_idx")
    spark.sql("DROP TABLE IF EXISTS pgslt_n")
    spark.sql("CREATE TABLE pgslt_n (id BIGINT, val vector(3))")
    // issue_427: an all-NULL vector column must index (builds filter
    // NULLs — the artifact is empty) and search without crashing
    spark.sql("""INSERT INTO pgslt_n
      SELECT generate_series, NULL::vector FROM generate_series(1, 100)""")
    assert(spark.sql("""CREATE INDEX ON pgslt_n USING vectors
        (val vector_l2_ops)""").head().getString(0) === "ok")
    // the slt's search: a scalar-subquery operand (itself NULL here) —
    // the dialect captures the parenthesized subquery as the operand,
    // kernels NULL-propagate, and the statement succeeds with all-NULL
    // distances (PG 'statement ok' semantics)
    val rows = spark.sql("""SELECT val FROM pgslt_n
        ORDER BY val <-> (SELECT val FROM pgslt_n LIMIT 1) limit 10""")
      .collect()
    assert(rows.length === 10 && rows.forall(_.isNullAt(0)))
    // update.slt's REINDEX TABLE CONCURRENTLY: the per-source sweep
    val swept = spark.sql("REINDEX TABLE CONCURRENTLY pgslt_n")
      .head().getString(0)
    assert(swept.startsWith("ok (1 reindexed"), swept)
    assert(spark.sql("DROP INDEX pgslt_n_val_idx").head().getString(0) === "ok")
    spark.sql("DROP TABLE pgslt_n")
  }

  test("update.slt: UPDATE / DELETE / vector-literal INSERT statements verbatim") {
    // the full update.slt lifecycle with the statements run VERBATIM
    // (table gains the conventional id column — the heap-TID
    // divergence documented in SURVEY row 30); UPDATE/DELETE execute
    // through SqlDml's copy-on-write path, the bare string-literal
    // INSERT through InsertVectorValuesCommand's cast wrapping
    graft.index.IndexCatalog.drop(spark, "pgslt_u_val_idx")
    spark.sql("DROP TABLE IF EXISTS pgslt_u")
    spark.sql("CREATE TABLE pgslt_u (id BIGINT, val vector(3))")
    spark.sql("""INSERT INTO pgslt_u SELECT generate_series,
      ARRAY[random(), random(), random()]::real[]
      FROM generate_series(1, 1000)""")
    assert(spark.sql("""CREATE INDEX CONCURRENTLY ON pgslt_u USING vectors
        (val vector_l2_ops)""").head().getString(0) === "ok")
    // update.slt:14
    assert(spark.sql(
      """UPDATE pgslt_u SET val = ARRAY[0.2, random(), random()]::real[]
         WHERE val = (SELECT val FROM pgslt_u
                      ORDER BY val <-> '[0.1,0.1,0.1]' LIMIT 1)""")
      .head().getString(0) === "ok (1 rows updated)")
    // update.slt:17 — the bare vector text literal INSERT (the id cell
    // is the documented heap-TID divergence: our rows carry explicit
    // integral ids, and an id-less insert would put an unindexable
    // NULL-id row into the store)
    assert(spark.sql("INSERT INTO pgslt_u (id, val) VALUES (2000, '[0.1,0.1,0.1]')")
      .head().getString(0).startsWith("ok"))
    // query I: nearest IS the inserted row, runner-up is not equal
    val rows = spark.sql("""SELECT val = '[0.1,0.1,0.1]' FROM pgslt_u
        ORDER BY val <-> '[0.1,0.1,0.1]' LIMIT 2""").collect()
    assert(rows.map(_.getBoolean(0)).toSeq === Seq(true, false))
    assert(spark.sql("REINDEX TABLE CONCURRENTLY pgslt_u")
      .head().getString(0).startsWith("ok"))
    // update.slt:29
    assert(spark.sql("DELETE FROM pgslt_u WHERE val = '[0.1,0.1,0.1]'")
      .head().getString(0) === "ok (1 rows deleted)")
    val rows2 = spark.sql("""SELECT val = '[0.1,0.1,0.1]' FROM pgslt_u
        ORDER BY val <-> '[0.1,0.1,0.1]' LIMIT 1""").collect()
    assert(rows2.map(_.getBoolean(0)).toSeq === Seq(false))
    assert(spark.sql("DROP INDEX pgslt_u_val_idx").head().getString(0) === "ok")
    spark.sql("DROP TABLE pgslt_u")
  }

  test("sparse.slt / bvector.slt / fp16.slt: typed table columns end to end") {
    import graft.index.IndexCatalog
    // --- sparse.slt: svector(6) column, chained ::real[]::vector::svector
    //     INSERT, three opclass indexes on the STRUCT column, operator
    //     queries over an ::svector literal ---
    Seq("pgslt_sv_val_idx", "pgslt_sv_val_idx1", "pgslt_sv_val_idx2")
      .foreach(IndexCatalog.drop(spark, _))
    spark.sql("DROP TABLE IF EXISTS pgslt_sv")
    spark.sql("CREATE TABLE pgslt_sv (id BIGINT, val svector(6))")
    spark.sql("""INSERT INTO pgslt_sv SELECT generate_series,
      ARRAY[0, random(), 0, 0, random(), random()]::real[]::vector::svector
      FROM generate_series(1, 200)""")
    for (ops <- Seq("svector_l2_ops", "svector_dot_ops", "svector_cos_ops"))
      assert(spark.sql(s"""CREATE INDEX ON pgslt_sv USING vectors
          (val $ops) WITH (options = "[indexing.hnsw]")""")
        .head().getString(0) === "ok", ops)
    def count10(tbl: String, op: String, lit: String): Long = spark.sql(
      s"""SELECT COUNT(1) FROM (SELECT 1 FROM $tbl
          ORDER BY val $op $lit limit 10) t2""").head().getLong(0)
    assert(count10("pgslt_sv", "<->", "'{1:3,2:1}/6'::svector") === 10L)
    assert(count10("pgslt_sv", "<=>", "'{1:3,2:1}/6'::svector") === 10L)
    assert(count10("pgslt_sv", "<#>", "'{1:3,2:1}/6'::svector") === 10L)
    spark.sql("DROP TABLE pgslt_sv")
    // --- bvector.slt: bvector(10) struct column, ROUND(RANDOM()::numeric)
    //     INSERT chain, hamming index on the struct column ---
    IndexCatalog.drop(spark, "pgslt_bv_val_idx")
    spark.sql("DROP TABLE IF EXISTS pgslt_bv")
    spark.sql("CREATE TABLE pgslt_bv (id BIGINT, val bvector(10))")
    spark.sql("""INSERT INTO pgslt_bv SELECT generate_series,
      ARRAY[ROUND(RANDOM()::numeric, 0), ROUND(RANDOM()::numeric, 0),
            ROUND(RANDOM()::numeric, 0), ROUND(RANDOM()::numeric, 0),
            ROUND(RANDOM()::numeric, 0), ROUND(RANDOM()::numeric, 0),
            ROUND(RANDOM()::numeric, 0), ROUND(RANDOM()::numeric, 0),
            ROUND(RANDOM()::numeric, 0), ROUND(RANDOM()::numeric, 0)
      ]::real[]::vector::bvector FROM generate_series(1, 200)""")
    assert(spark.sql("""CREATE INDEX ON pgslt_bv USING vectors
        (val bvector_hamming_ops) WITH (options = "[indexing.hnsw]")""")
      .head().getString(0) === "ok")
    assert(count10("pgslt_bv", "<->", "'[0,1,0,1,0,1,0,1,0,1]'::bvector") === 10L)
    spark.sql("DROP TABLE pgslt_bv")
    // --- fp16.slt: vecf16(3) column (f32-surface storage), index,
    //     operator queries, and the printed f16 arithmetic value ---
    IndexCatalog.drop(spark, "pgslt_f16_val_idx")
    spark.sql("DROP TABLE IF EXISTS pgslt_f16")
    spark.sql("CREATE TABLE pgslt_f16 (id BIGINT, val vecf16(3))")
    spark.sql("""INSERT INTO pgslt_f16 SELECT generate_series,
      ARRAY[random(), random(), random()]::real[]::vector::vecf16
      FROM generate_series(1, 200)""")
    assert(spark.sql("""CREATE INDEX ON pgslt_f16 USING vectors
        (val vecf16_l2_ops) WITH (options = "[indexing.hnsw]")""")
      .head().getString(0) === "ok")
    assert(count10("pgslt_f16", "<->", "'[0.5,0.5,0.5]'::vecf16") === 10L)
    // fp16.slt's printed value: '[1,2,3]'::vecf16 * '[4,5,6]'::vecf16
    assert(spark.sql(
      "SELECT format_vector('[1,2,3]'::vecf16 * '[4,5,6]'::vecf16)")
      .head().getString(0) === "[4, 10, 18]")
    spark.sql("DROP TABLE pgslt_f16")
    Seq("pgslt_sv_val_idx", "pgslt_sv_val_idx1", "pgslt_sv_val_idx2",
      "pgslt_bv_val_idx", "pgslt_f16_val_idx")
      .foreach(IndexCatalog.drop(spark, _))
  }

  test("partition.slt: PARTITION BY LIST / PARTITION OF / partition index verbatim") {
    import graft.index.IndexCatalog
    val idxNames = Seq("pgslt_items_val_idx", "pgslt_id123_val_idx",
      "pgslt_items_val_idx1")
    idxNames.foreach(IndexCatalog.drop(spark, _))
    spark.sql("DROP TABLE IF EXISTS pgslt_items")
    SqlDmlSpec.rmWarehouse(spark, "pgslt_items")
    // partition.slt:6 (id column added — the documented heap-TID
    // divergence); parent becomes a native PARTITIONED BY parquet table
    spark.sql("""CREATE TABLE pgslt_items (id BIGINT, val vector(3),
      category_id int) PARTITION BY LIST(category_id)""")
    // partition.slt:9-15: children register as value-scoped aliases
    assert(spark.sql(
      "CREATE TABLE pgslt_id123 PARTITION OF pgslt_items FOR VALUES IN (1, 2, 3)")
      .head().getString(0) === "ok")
    assert(spark.sql(
      "CREATE TABLE pgslt_id456 PARTITION OF pgslt_items FOR VALUES IN (4, 5, 6)")
      .head().getString(0) === "ok")
    assert(spark.sql(
      "CREATE TABLE pgslt_id789 PARTITION OF pgslt_items FOR VALUES IN (7, 8, 9)")
      .head().getString(0) === "ok")
    spark.sql("""INSERT INTO pgslt_items (id, val, category_id)
      SELECT generate_series, ARRAY[random(), random(), random()]::real[],
        (random() * 6 + 1)::int
      FROM generate_series(1, 1000)""")
    // whole-parent index + query (partition.slt:26-33)
    assert(spark.sql("""CREATE INDEX ON pgslt_items USING vectors
        (val vectors.vector_l2_ops) WITH (options = "[indexing.hnsw]")""")
      .head().getString(0) === "ok")
    def count10(op: String, filter: String = ""): Long = spark.sql(
      s"""SELECT COUNT(1) FROM (SELECT 1 FROM pgslt_items $filter
          ORDER BY val $op '[0.5,0.5,0.5]' limit 10) t2""").head().getLong(0)
    assert(count10("<->") === 10L)
    // index on ONE PARTITION → a partial index over the parent scoped
    // by the child's value set (partition.slt:36-41)
    assert(spark.sql("""CREATE INDEX ON pgslt_id123 USING vectors
        (val vectors.vector_cos_ops) WITH (options = "[indexing.hnsw]")""")
      .head().getString(0) === "ok")
    assert(IndexCatalog.load(spark, "pgslt_id123_val_idx")
      .exists(_.params.getOrElse("sql_where", "")
        .contains("category_id IN (1, 2, 3)")))
    assert(count10("<=>") === 10L)
    // partial index (partition.slt:44-51)
    assert(spark.sql("""CREATE INDEX ON pgslt_items USING vectors
        (val vectors.vector_dot_ops) WITH (options = "[indexing.hnsw]")
        WHERE (category_id = 1)""").head().getString(0) === "ok")
    assert(count10("<#>", "WHERE (category_id = 1)") === 10L)
    // partition.slt:54 — the multi-name DROP TABLE spelling
    assert(spark.sql(
      "DROP TABLE pgslt_id789, pgslt_id456, pgslt_id123, pgslt_items")
      .head().getString(0) === "ok (4 dropped)")
    assert(spark.sessionState.catalog.tableExists(
      org.apache.spark.sql.catalyst.TableIdentifier("pgslt_items")) === false)
    idxNames.foreach(IndexCatalog.drop(spark, _))
  }

  test("partition.slt durability: child aliases survive a driver restart") {
    import graft.index.{IndexCatalog, PgPartitions}
    val idx = "pgslt_dur_child_val_idx"
    IndexCatalog.drop(spark, idx)
    spark.sql("DROP TABLE IF EXISTS pgslt_dur")
    SqlDmlSpec.rmWarehouse(spark, "pgslt_dur")
    spark.sql("""CREATE TABLE pgslt_dur (id BIGINT, val vector(3),
      category_id int) PARTITION BY LIST(category_id)""")
    assert(spark.sql("""CREATE TABLE pgslt_dur_child PARTITION OF pgslt_dur
        FOR VALUES IN (1, 2)""").head().getString(0) === "ok")
    spark.sql("""INSERT INTO pgslt_dur (id, val, category_id) VALUES
      (1, '[1,0,0]', 1), (2, '[0,1,0]', 2), (3, '[0,0,1]', 3)""")
    // simulated restart (the scoped reset convention): the in-memory
    // alias clears; CREATE INDEX ON the child must still resolve through
    // the persisted registry under the index root — PG's partition DDL
    // is catalog-durable (partition.slt assumes it)
    PgPartitions.resetNamesForTest(spark, Set("pgslt_dur_child"))
    assert(spark.sql("""CREATE INDEX ON pgslt_dur_child USING vectors
        (val vectors.vector_l2_ops) WITH (options = "[indexing.hnsw]")""")
      .head().getString(0) === "ok")
    assert(IndexCatalog.load(spark, idx).exists(_.params
      .getOrElse("sql_where", "").contains("category_id IN (1, 2)")),
      "the post-restart child index must carry the child's value scope")
    // restart again: the single-name DROP TABLE claim resolves durably
    PgPartitions.resetNamesForTest(spark, Set("pgslt_dur_child"))
    assert(spark.sql("DROP TABLE pgslt_dur_child")
      .head().getString(0) === "ok (1 dropped)")
    // and the drop itself is durable — a third restart resurrects nothing
    PgPartitions.resetNamesForTest(spark, Set("pgslt_dur_child"))
    assert(PgPartitions.resolve(spark, "pgslt_dur_child").isEmpty)
    spark.sql("DROP TABLE pgslt_dur")
    IndexCatalog.drop(spark, idx)
  }

  test("cast.slt / finalize.sql cast matrix: cross-type :: casts") {
    // string literal casts (cast.slt) and vector<->vector conversions
    // (finalize.sql CREATE CAST set) through the same :: spelling
    assert(spark.sql("SELECT '[1,2,3]'::vector").head().getSeq[Float](0) ===
      Seq(1f, 2f, 3f))
    assert(spark.sql("SELECT array(1, 2, 3)::vector")
      .head().getSeq[Float](0) === Seq(1f, 2f, 3f))          // real[]->vector
    assert(spark.sql("SELECT '{1:5}/3'::svector::vector")
      .head().getSeq[Float](0) === Seq(0f, 5f, 0f))          // svector->vector
    assert(spark.sql("SELECT format_bvector('[1, 0, 1]'::vector::bvector)")
      .head().getString(0) === "[1, 0, 1]")                  // vector->bvector
    assert(spark.sql("SELECT '[0, 1]'::bvector::vector")
      .head().getSeq[Float](0) === Seq(0f, 1f))              // bvector->vector
    assert(spark.sql("SELECT svec_to_dense('[0, 5, 0]'::vector::svector)")
      .head().getSeq[Float](0) === Seq(0f, 5f, 0f))          // vector->svector
    // vector->vecf16 applies f16 rounding; small ints are exact
    assert(spark.sql("SELECT '[1, 2]'::vector::vecf16 <-> '[3, 4]'")
      .head().getDouble(0) === 8.0)
    assert(spark.sql("SELECT '[0.4]'::vector::vecf16")
      .head().getSeq[Float](0) === Seq(graft.types.Fp16.roundTrip(0.4f)))
    // the 0/1 rule still guards vector->bvector
    val e = intercept[Exception] {
      spark.sql("SELECT '[0.5]'::vector::bvector").collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("not 0 or 1")))
  }

  test("sealing/create.slt + check.slt: idx_indexing/idx_growing/idx_sealed") {
    // the reference's own segment-observability suite: 1000-row table,
    // hnsw build, then the stat view reports f / {} / {1000}. The one
    // adaptation is the shared-catalog table/index naming (pgslt_seal
    // for t, pgslt_seal_i for i — the file's t/i names, suite-scoped);
    // the bare VIEW spelling `FROM pg_vector_index_stat` and the
    // reference `indexname` column run verbatim.
    graft.index.IndexCatalog.drop(spark, "pgslt_seal_i")
    spark.sql("DROP TABLE IF EXISTS pgslt_seal")
    SqlDmlSpec.rmWarehouse(spark, "pgslt_seal")
    spark.sql("CREATE TABLE pgslt_seal (id BIGINT, val vector(3))")
    spark.sql("""INSERT INTO pgslt_seal
      SELECT generate_series, ARRAY[random(), random(), random()]::real[]
      FROM generate_series(1, 1000)""")
    assert(spark.sql("""CREATE INDEX pgslt_seal_i ON pgslt_seal USING vectors
        (val vector_l2_ops) WITH (options = "[indexing.hnsw]")""")
      .head().getString(0) === "ok")
    def pgArr(v: Seq[Long]): String = v.mkString("{", ",", "}")
    val row = spark.sql(
      """SELECT idx_indexing, idx_growing, idx_sealed
         FROM pg_vector_index_stat WHERE indexname = 'pgslt_seal_i'""").head()
    assert(!row.getBoolean(0), "check.slt: idx_indexing must print f")
    assert(pgArr(row.getSeq[Long](1)) === "{}",
      "check.slt: idx_growing must print {} after a build")
    assert(pgArr(row.getSeq[Long](2)) === "{1000}",
      "check.slt: idx_sealed must print {1000} after a build")
    // table-qualified column spelling (legal PG; round-17 advice): the
    // rewrite must leave `pg_vector_index_stat.indexname` an identifier
    // chain — Spark aliases the TVF relation by its function name, so
    // the qualifier resolves against the rewritten FROM item
    assert(spark.sql(
      """SELECT pg_vector_index_stat.indexname FROM pg_vector_index_stat
         WHERE pg_vector_index_stat.indexname = 'pgslt_seal_i'""")
      .head().getString(0) === "pgslt_seal_i")
    assert(spark.sql("DROP INDEX pgslt_seal_i").head().getString(0) === "ok")
    spark.sql("DROP TABLE pgslt_seal")
  }

  test("transaction/test.sql: BEGIN; CREATE INDEX; ABORT retracts the index") {
    // the reference's transaction suite, verbatim modulo the table
    // naming (tests_transaction_t → pgslt_txn, suite-scoped) and the id
    // column (the header-note adaptation). Anonymous naming applies:
    // CREATE INDEX ON pgslt_txn ... → pgslt_txn_val_idx.
    val idx = "pgslt_txn_val_idx"
    graft.index.IndexCatalog.drop(spark, idx)
    spark.sql("DROP TABLE IF EXISTS pgslt_txn")
    SqlDmlSpec.rmWarehouse(spark, "pgslt_txn")
    spark.sql("ROLLBACK") // debris guard: a crashed prior run's block
    spark.sql("CREATE TABLE pgslt_txn (id BIGINT, val vector(3))")
    spark.sql("""INSERT INTO pgslt_txn
      SELECT generate_series, ARRAY[random(), random(), random()]::real[]
      FROM generate_series(1, 1000)""")
    assert(spark.sql("BEGIN;").head().getString(0) === "ok")
    assert(spark.sql("""CREATE INDEX ON pgslt_txn
        USING vectors (val vector_l2_ops)""").head().getString(0) === "ok")
    // each statement commits atomically on its own — visible mid-block
    assert(graft.index.IndexCatalog.load(spark, idx).isDefined)
    assert(spark.sql("ABORT;").head().getString(0).startsWith("ok (1 "))
    assert(graft.index.IndexCatalog.load(spark, idx).isEmpty,
      "ABORT must retract the index created inside the block")
    // PG refuses VACUUM inside a block (25001) — ours does verbatim
    spark.sql("BEGIN")
    val e = intercept[Exception] {
      spark.sql("VACUUM pgslt_txn")
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("cannot run inside a transaction block")))
    // ... and so does the vacuum_vector_index() UDF spelling — EVERY
    // vacuum entry point refuses (round-17 advice: the statement paths
    // refused at parse, the UDF landed in SqlDdl.vacuum directly)
    val e2 = intercept[Exception] {
      spark.sql("SELECT vacuum_vector_index('pgslt_txn_nonexistent')")
        .collect()
    }
    assert(msgs(e2).exists(_.contains("cannot run inside a transaction block")),
      s"got: ${msgs(e2)}")
    spark.sql("ROLLBACK")
    // COMMIT keeps the index
    spark.sql("BEGIN TRANSACTION")
    assert(spark.sql("""CREATE INDEX ON pgslt_txn
        USING vectors (val vector_l2_ops)""").head().getString(0) === "ok")
    assert(spark.sql("COMMIT").head().getString(0) === "ok")
    assert(graft.index.IndexCatalog.load(spark, idx).isDefined,
      "COMMIT must keep the index")
    assert(spark.sql(s"DROP INDEX $idx").head().getString(0) === "ok")
    spark.sql("DROP TABLE pgslt_txn")
  }

  test("crash/create.slt + restore.slt: the index serves after a restart") {
    // the reference's crash suite: build, kill the bgworker, restart,
    // then (1) the table exists, (2) the index exists, (3) the indexed
    // top-k query still answers. The restart is the scoped-reset
    // simulation (registry + sweep fingerprint cleared — the fresh-JVM
    // state for this index); existence checks replay through the stat
    // view (pg_indexes has no direct analog) and Spark's own catalog.
    import graft.plans.AnnPushdown
    graft.index.IndexCatalog.drop(spark, "pgslt_crash_i")
    spark.sql("DROP TABLE IF EXISTS pgslt_crash")
    SqlDmlSpec.rmWarehouse(spark, "pgslt_crash")
    spark.sql("CREATE TABLE pgslt_crash (id BIGINT, val vector(3))")
    spark.sql("""INSERT INTO pgslt_crash
      SELECT generate_series, ARRAY[random(), random(), random()]::real[]
      FROM generate_series(1, 1000)""")
    assert(spark.sql("""CREATE INDEX pgslt_crash_i ON pgslt_crash
        USING vectors (val vector_l2_ops)
        WITH (options = "[indexing.hnsw]")""").head().getString(0) === "ok")
    val loc = spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier("pgslt_crash"))
      .location.getPath
    // simulated restart
    AnnPushdown.resetNamesForTest(loc, Set("pgslt_crash_i"))
    assert(spark.catalog.tableExists("pgslt_crash"),
      "restore.slt: the table must exist after restart")
    assert(spark.sql("""SELECT COUNT(1) FROM pg_vector_index_stat
        WHERE indexname = 'pgslt_crash_i'""").head().getLong(0) === 1L,
      "restore.slt: the index must exist after restart")
    assert(spark.sql("""SELECT COUNT(1) FROM (SELECT 1 FROM pgslt_crash
        ORDER BY val <-> '[0.5,0.5,0.5]' limit 10) t2""").head()
      .getLong(0) === 10L,
      "restore.slt: the indexed top-k must answer after restart")
    assert(spark.sql("DROP INDEX pgslt_crash_i").head().getString(0) === "ok")
    spark.sql("DROP TABLE pgslt_crash")
  }
}
