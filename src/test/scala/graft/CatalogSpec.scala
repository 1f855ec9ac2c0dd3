package graft

import org.apache.spark.sql.functions._
import graft.index.IndexCatalog
import graft.operators.IvfIndex

/** Index catalog: ensure-once reuse, manifest commit rule, alter/drop
  * admin commands, stat view. */
class CatalogSpec extends SparkSpec {
  import spark.implicits._

  test("ensure builds once, reuses committed artifacts, alter/drop work") {
    val name = "catalog_spec_ivf"
    IndexCatalog.drop(spark, name)
    var builds = 0
    def ensure() = IndexCatalog.ensure(spark, name, "srcA") { dataDir =>
      builds += 1
      val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
      val model = IvfIndex.train(emb, "embedding", "l2", 4)
      IvfIndex.assign(emb, "embedding", model)
        .write.mode("overwrite").partitionBy("list_id").parquet(dataDir)
      IndexCatalog.Manifest("ivf", "srcA", "l2", Map("nlist" -> "4"),
        centroids = model.centroids)
    }
    val m1 = ensure(); val m2 = ensure()
    assert(builds == 1, "second ensure must reuse the committed artifact")
    assert(m2.centroids.length == 4)

    // stat view surfaces it
    val row = IndexCatalog.stats(spark)
      .filter(col("idx_name") === name)
      .select("idx_type", "idx_metric", "idx_size_bytes").head()
    assert(row.getString(0) == "ivf" && row.getString(1) == "l2")
    assert(row.getLong(2) > 0)

    // fence: committed build -> returns; missing index -> error
    IndexCatalog.fence(spark, name)
    intercept[IllegalStateException] {
      IndexCatalog.fence(spark, "no_such_index")
    }
    // upgrade: nothing unreadable -> sweep drops nothing
    assert(!IndexCatalog.upgrade(spark).contains(name))

    // alter updates a search-time option in place
    val altered = IndexCatalog.alter(spark, name, "nprobe", "2")
    assert(altered.params("nprobe") == "2")
    assert(IndexCatalog.load(spark, name).get.params("nprobe") == "2")

    // source change triggers rebuild
    IndexCatalog.ensure(spark, name, "srcB") { dataDir =>
      builds += 1
      IndexCatalog.Manifest("ivf", "srcB", "l2", Map.empty)
    }
    assert(builds == 2)

    IndexCatalog.drop(spark, name)
    assert(IndexCatalog.load(spark, name).isEmpty)
  }
}
