package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.{parseVector, formatVector, parseSVector, formatSVector,
  parseBVector, formatBVector}

/**
 * Text source/sink for vector-bearing tables — the COPY/text-protocol
 * analog (the reference round-trips every vector type through its text
 * form: src/utils/parse.rs + text_vecf32/svecf32/bvecf32 in/out). Vectors
 * travel as their canonical literals ('[1,2,3]', '{i:v, ...}/dims',
 * '0101…') inside ordinary CSV or JSON-lines files; parse on read and
 * format on write are the SAME codegen expressions the SQL surface
 * registers, so file ingest and literal ingest are one code path.
 *
 * Scale shape: both formats are splittable line formats — a 100 TB
 * ingest parallelizes by file split exactly like any Spark text read;
 * parse is a per-row codegen kernel, no UDF, no shuffle.
 */
object VectorTextSource {

  private def parser(kind: String): org.apache.spark.sql.Column => org.apache.spark.sql.Column =
    kind match {
      case "dense"  => parseVector
      case "svec"   => parseSVector
      case "bvec"   => parseBVector
      case other    => throw new IllegalArgumentException(s"unknown vector kind: $other")
    }

  private def formatter(kind: String): org.apache.spark.sql.Column => org.apache.spark.sql.Column =
    kind match {
      case "dense"  => formatVector
      case "svec"   => formatSVector
      case "bvec"   => formatBVector
      case other    => throw new IllegalArgumentException(s"unknown vector kind: $other")
    }

  /** Read a CSV (with header) whose `vecCols` columns hold vector text
    * literals; returns them parsed to the engine's column types.
    *
    * `schema`, when given, fixes the NON-vector column types (the COPY
    * semantics of loading into an already-typed table — reference
    * src/utils/parse.rs feeds typed tuples); vector columns are read as
    * string regardless (they hold text literals pre-parse). Without it
    * the reader falls back to inference, which does NOT round-trip types
    * (a bigint written out can come back int32).
    */
  def readCsv(spark: SparkSession, path: String,
      vecCols: Map[String, String],
      schema: Option[org.apache.spark.sql.types.StructType] = None): DataFrame = {
    val reader = spark.read.option("header", "true")
    val base = schema match {
      case Some(s) =>
        // vector columns travel as text literals in the file; force them
        // to string in the read schema whatever the caller declared
        val readSchema = org.apache.spark.sql.types.StructType(s.map { f =>
          if (vecCols.contains(f.name))
            f.copy(dataType = org.apache.spark.sql.types.StringType)
          else f
        })
        reader.schema(readSchema).csv(path)
      case None => reader.option("inferSchema", "true").csv(path)
    }
    parseAll(base, vecCols)
  }

  /** Write `df` as CSV with vector columns rendered as text literals. */
  def writeCsv(df: DataFrame, path: String, vecCols: Map[String, String]): Unit =
    formatAll(df, vecCols).write.mode("overwrite")
      .option("header", "true").csv(path)

  /** Read JSON-lines with vector-literal string fields. */
  def readJsonl(spark: SparkSession, path: String,
      vecCols: Map[String, String]): DataFrame =
    parseAll(spark.read.json(path), vecCols)

  /** Write `df` as JSON-lines with vector columns as text literals. */
  def writeJsonl(df: DataFrame, path: String, vecCols: Map[String, String]): Unit =
    formatAll(df, vecCols).write.mode("overwrite").json(path)

  private def parseAll(df: DataFrame, vecCols: Map[String, String]): DataFrame =
    vecCols.foldLeft(df) { case (d, (c, kind)) =>
      d.withColumn(c, parser(kind)(col(c)))
    }

  private def formatAll(df: DataFrame, vecCols: Map[String, String]): DataFrame =
    vecCols.foldLeft(df) { case (d, (c, kind)) =>
      d.withColumn(c, formatter(kind)(col(c)))
    }
}
