package graft

import org.apache.spark.sql.functions._

/** The SQL-registered function surface (finalize.sql analog) and the
  * null.slt semantics: NULL vectors drop out of top-k, NaN distances
  * order last. */
class SqlSurfaceSpec extends SparkSpec {
  import spark.implicits._

  private lazy val view: Unit = {
    spark.read.parquet(s"$sf0001/embeddings.parquet")
      .createOrReplaceTempView("emb")
  }

  test("distance + norm + format functions work from spark.sql") {
    view
    val row = spark.sql(
      """SELECT vec_id,
           l2sq_distance(embedding, embedding) AS self_dist,
           vector_norm(embedding) AS nrm,
           parse_vector(format_vector(embedding)) = embedding AS rt
         FROM emb ORDER BY vec_id LIMIT 1""").head()
    assert(row.getDouble(1) == 0.0)
    assert(row.getDouble(2) > 0.0)
    assert(row.getBoolean(3))
  }

  test("text/dedup kernels work from spark.sql") {
    val row = spark.sql(
      """SELECT
           size(shingle_hashes(split('a b c d', ' '), 3)) AS n_sh,
           size(minhash_signature_hashed(shingle_hashes(split('a b c d', ' '), 3), 16)) AS k,
           simhash64(split('a b c', ' ')) = simhash64(split('a b c', ' ')) AS stable,
           size(shingle_hashes(split('a b', ' '), 3)) AS short_doc""").head()
    assert(row.getInt(0) == 2)   // 'a b c', 'b c d'
    assert(row.getInt(1) == 16)
    assert(row.getBoolean(2))
    assert(row.getInt(3) == 0)   // shorter than n -> empty set, no throw
    // both variants produce identical signatures from the same shingles
    val same = spark.sql(
      """SELECT minhash_signature(array('a b c', 'b c d'), 8) =
                minhash_signature_hashed(shingle_hashes(split('a b c d', ' '), 3), 8)""")
      .head().getBoolean(0)
    assert(same)
    // wrong input type is an ANALYSIS error, not a runtime crash
    val err = intercept[Exception](
      spark.sql("SELECT minhash_signature_hashed(array('x'), 8)").head())
    assert(err.getMessage.toLowerCase.contains("type"))
  }

  test("SQL top-k matches the DataFrame plan") {
    view
    val sql = spark.sql(
      """SELECT vec_id FROM (
           SELECT vec_id, l2sq_distance(embedding, parse_vector(
             (SELECT format_vector(embedding) FROM emb WHERE vec_id = 0))) AS d
           FROM emb WHERE vec_id <> 0)
         ORDER BY d, vec_id LIMIT 10""").as[Long].collect().toSeq
    val q = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .filter(col("vec_id") === 0).select(col("embedding"))
      .head().getSeq[Float](0).toArray
    val df = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .filter(col("vec_id") =!= 0)
      .select(col("vec_id"), graft.functions.l2sq(col("embedding"),
        typedLit(q)).as("d"))
      .orderBy(col("d"), col("vec_id")).limit(10)
      .select("vec_id").as[Long].collect().toSeq
    assert(sql == df)
  }

  test("vector_dims / sphere / f16 cos / sparse aggs from spark.sql") {
    val r = spark.sql(
      """SELECT vector_dims(array(1.0f, 2.0f, 3.0f)) AS d_dense,
           vector_dims(parse_svector('{1:5, 3:7}/6')) AS d_svec,
           vector_dims(parse_bvector('[0, 1, 0, 1]')) AS d_bvec,
           vector_dims(to_f16_bits(array(1.0f, 2.0f))) AS d_f16,
           sphere(array(1.0f, 2.0f), 0.5d).radius AS rad,
           f16_cos_distance(to_f16_bits(array(1.0f, 0.0f)),
             to_f16_bits(array(1.0f, 0.0f))) AS selfcos""")
      .head()
    assert(r.getInt(0) == 3 && r.getInt(1) == 6 && r.getInt(2) == 4
      && r.getInt(3) == 2)
    assert(r.getDouble(4) == 0.5 && r.getDouble(5) == 0.0)
    // sparse aggregates with zero-drop, from SQL
    val agg = spark.sql(
      """SELECT format_svector(svec_avg(v, 3)) AS a FROM (
           SELECT parse_svector('{0:1, 1:2, 2:3}/3') AS v
           UNION ALL SELECT parse_svector('{0:-1, 1:2, 2:-3}/3'))""")
      .head().getString(0)
    assert(agg == "{1:2}/3") // reference Display: integral f32 prints bare
    // unsupported input type is an analysis error
    val err = intercept[Exception](
      spark.sql("SELECT vector_dims('not a vector')").head())
    assert(err.getMessage.toLowerCase.contains("vector_dims"))
  }

  test("null.slt semantics: NULL vectors drop out; NaN distances sort last") {
    val good = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select(col("vec_id"), col("embedding")).limit(20)
    val nulls = Seq.tabulate(5)(i => (1000L + i, null: Seq[Float]))
      .toDF("vec_id", "embedding")
    val nans = Seq.tabulate(3)(i => (2000L + i,
      Seq.fill(64)(Float.NaN))).toDF("vec_id", "embedding")
    val t = good.unionByName(nulls).unionByName(nans)
    val q = good.filter(col("vec_id") === 0).select(col("embedding"))
      .head().getSeq[Float](0).toArray
    val top = t.select(col("vec_id"),
        graft.functions.l2sq(col("embedding"), typedLit(q)).as("d"))
      .orderBy(col("d").asc_nulls_last, col("vec_id")).limit(10)
      .collect()
    assert(top.length == 10)
    // no NULL-embedding id makes it into the top-k (nulls last)
    assert(top.forall(_.getLong(0) < 1000L),
      s"got ${top.map(_.getLong(0)).toSeq}")
    // NaN distances exist but order after all finite ones
    val all = t.select(col("vec_id"),
        graft.functions.l2sq(col("embedding"), typedLit(q)).as("d"))
      .orderBy(col("d").asc_nulls_last, col("vec_id"))
      .collect().filter(!_.isNullAt(1))
    val finitePrefix = all.takeWhile(r => !r.getDouble(1).isNaN)
    assert(finitePrefix.length == 20)
    assert(all.drop(20).forall(r => r.getDouble(1).isNaN))
  }

  test("issue_427: NULL vectors don't break index build or search") {
    val good = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select(col("vec_id"), col("embedding")).limit(30)
    val nulls = Seq.tabulate(10)(i => (5000L + i, null: Seq[Float]))
      .toDF("vec_id", "embedding")
    val t = good.unionByName(nulls)
    val q = good.filter(col("vec_id") === 0).select(col("embedding"))
      .head().getSeq[Float](0).toArray

    val ivfDir = java.nio.file.Files.createTempDirectory("graft_null_ivf").toString
    val model = graft.operators.IvfIndex.build(t, "embedding", "l2", 4, ivfDir)
    val hits = graft.operators.IvfIndex.search(spark, ivfDir, model,
      "vec_id", "embedding", q, k = 10, nprobe = 4).collect()
    assert(hits.length == 10)
    assert(hits.forall(_.getLong(0) < 5000L), "null rows leaked into results")

    val (mins, widths) = graft.operators.Sq8.train(
      t.filter(col("embedding").isNotNull), "embedding")
    assert(mins.length == 64 && widths.forall(_ > 0))
  }

  test("null.slt index leg: NULL + NaN/Inf rows through HNSW and IVF build/search") {
    val good = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select(col("vec_id"), col("embedding")).limit(40)
    val dims = 64
    val nulls = Seq.tabulate(10)(i => (6000L + i, null: Seq[Float]))
      .toDF("vec_id", "embedding")
    // NaN, +Inf, and a single-Inf-component row: the null.slt corpus shape
    val nans = (Seq.tabulate(5)(i => (7000L + i, Seq.fill(dims)(Float.NaN))) ++
      Seq((7100L, Seq.fill(dims)(Float.PositiveInfinity)),
          (7101L, Seq.tabulate(dims)(j =>
            if (j == 0) Float.NegativeInfinity else 1f))))
      .toDF("vec_id", "embedding")
    val src = java.nio.file.Files.createTempDirectory("graft_nullsrc").toString
    good.unionByName(nulls).unionByName(nans)
      .write.mode("overwrite").parquet(src)
    val t = spark.read.parquet(src)
    val q = good.filter(col("vec_id") === 0).select(col("embedding"))
      .head().getSeq[Float](0).toArray

    // IVF: non-finite rows must not poison k-means training or the search
    val ivfDir = java.nio.file.Files.createTempDirectory("graft_nan_ivf").toString
    val model = graft.operators.IvfIndex.build(t, "embedding", "l2", 4, ivfDir)
    assert(model.centroids.forall(_.forall(v => !v.isNaN && !v.isInfinite)),
      "non-finite values leaked into trained centroids")
    val ivfHits = graft.operators.IvfIndex.search(spark, ivfDir, model,
      "vec_id", "embedding", q, k = 10, nprobe = 4).collect()
    assert(ivfHits.length == 10)
    assert(ivfHits.forall(r => r.getLong(0) < 6000L && !r.getDouble(1).isNaN),
      s"got ${ivfHits.map(_.getLong(0)).toSeq}")

    // HNSW: graph walk AND exact flat scan both return k finite rows
    // (a NaN entry node must not stall the greedy descent)
    val p = graft.operators.Hnsw.ensure(spark, "nulltest_hnsw", t, src,
      "vec_id", "embedding", "l2", parts = 2)
    for (hits <- Seq(
        graft.operators.Hnsw.searchIndex(spark, p, "vec_id", q, k = 10).collect(),
        graft.operators.Hnsw.searchIndexExact(spark, p, "vec_id", q, k = 10).collect())) {
      assert(hits.length == 10)
      assert(hits.forall(r => r.getLong(0) < 6000L && !r.getDouble(1).isNaN),
        s"got ${hits.map(_.getLong(0)).toSeq}")
    }
  }

  test("SQL dims-mismatch errors like the reference operators") {
    view
    val e = intercept[Exception] {
      spark.sql(
        "SELECT l2sq_distance(embedding, parse_vector('[1, 2]')) FROM emb LIMIT 1"
      ).head()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else t.getMessage +: msgs(t.getCause)
    assert(msgs(e).exists(m => m != null && m.contains("dimensions")))
  }
}
