package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sources.VectorTextSource

/** Text (COPY-analog) source/sink: dense, sparse, and bit vectors
  * round-trip bit-exactly through CSV and JSON-lines as their canonical
  * literals, on real fixture embeddings. */
class VectorTextSourceSpec extends SparkSpec {
  import spark.implicits._

  private def fixture = {
    val e = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
      .limit(50)
    e.withColumn("sv", graft.functions.toSVector(lit(8),
        array(lit(1), lit(5)),
        array(element_at(col("embedding"), 1), element_at(col("embedding"), 2))))
      .withColumn("bv", graft.functions.binarize(col("embedding")))
  }

  private val kinds = Map("embedding" -> "dense", "sv" -> "svec", "bv" -> "bvec")

  private def assertRoundTrip(back: org.apache.spark.sql.DataFrame): Unit = {
    val orig = fixture
    // compare through the canonical text form: parse∘format must be identity
    def canon(df: org.apache.spark.sql.DataFrame) = df.select(col("vec_id"),
        graft.functions.formatVector(col("embedding")).as("d"),
        graft.functions.formatSVector(col("sv")).as("s"),
        graft.functions.formatBVector(col("bv")).as("b"))
      .as[(Long, String, String, String)].collect().sortBy(_._1)
    val a = canon(orig); val b = canon(back)
    assert(a.length == 50 && a.sameElements(b))
  }

  test("CSV round-trip is bit-exact for all three vector types") {
    val dir = Files.createTempDirectory("graft_csv").toFile.getAbsolutePath + "/t"
    VectorTextSource.writeCsv(fixture, dir, kinds)
    assertRoundTrip(VectorTextSource.readCsv(spark, dir, kinds))
  }

  test("JSONL round-trip is bit-exact for all three vector types") {
    val dir = Files.createTempDirectory("graft_jsonl").toFile.getAbsolutePath + "/t"
    VectorTextSource.writeJsonl(fixture, dir, kinds)
    assertRoundTrip(VectorTextSource.readJsonl(spark, dir, kinds))
  }

  test("CSV read with explicit schema preserves non-vector column types") {
    val dir = Files.createTempDirectory("graft_csv_sch").toFile.getAbsolutePath + "/t"
    VectorTextSource.writeCsv(fixture, dir, kinds)
    // inference downgrades the bigint id to int on this small file ...
    val inferred = VectorTextSource.readCsv(spark, dir, kinds)
    assert(inferred.schema("vec_id").dataType ==
      org.apache.spark.sql.types.IntegerType)
    // ... an explicit schema keeps it long (vector cols may be declared
    // with any type — the reader forces them to string pre-parse)
    val typed = VectorTextSource.readCsv(spark, dir, kinds,
      Some(fixture.schema))
    assert(typed.schema("vec_id").dataType ==
      org.apache.spark.sql.types.LongType)
    assertRoundTrip(typed)
  }
}
