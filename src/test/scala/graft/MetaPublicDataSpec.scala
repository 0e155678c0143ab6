package graft

import graft.api.{CachedMeta, Catalog, PublicData}
import org.apache.spark.sql.functions._

/** CachedMeta TTL memoization (cached/cached_meta.py) and the read-only
  * PublicData reader (api/public_data.py). */
class MetaPublicDataSpec extends SparkSpec {
  import spark.implicits._

  test("CachedMeta: serves cached listings inside the TTL, refresh() drops them") {
    val cat = new Catalog(spark,
      java.nio.file.Files.createTempDirectory("graft-cmeta").toString)
    cat.onboard("cm_src", Seq((1, "a")).toDF("id", "v"))
    val meta = new CachedMeta(cat, ttlMs = Long.MaxValue >> 1)
    assert(meta.dataSources().count() == 1)
    assert(meta.describe("cm_src")("status") == "ready")
    // registry mutates AFTER the first read — cached results stand
    cat.onboard("cm_src2", Seq((2, "b")).toDF("id", "v"))
    assert(meta.dataSources().count() == 1)
    assert(new CachedMeta(cat).dataSources().count() == 2) // fresh instance sees it
    meta.refresh()
    assert(meta.dataSources().count() == 2)
  }

  test("CachedMeta: zero TTL always refetches") {
    val cat = new Catalog(spark,
      java.nio.file.Files.createTempDirectory("graft-cmeta0").toString)
    cat.onboard("z1", Seq((1, "a")).toDF("id", "v"))
    val meta = new CachedMeta(cat, ttlMs = 0L)
    assert(meta.dataSources().count() == 1)
    cat.onboard("z2", Seq((2, "b")).toDF("id", "v"))
    assert(meta.dataSources().count() == 2)
  }

  test("PublicData: lists testdata by name and reads it, no write surface") {
    val pd = new PublicData(spark, sf)
    val names = pd.list()
    assert(names.contains("customer") && names.contains("lineitem"))
    assert(pd.get("customer").count() == 150)
    intercept[IllegalArgumentException](pd.get("no_such_dataset"))
  }
}
