package graft.api

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Meta: account-wide artifact listing with optional details — the
  * reference's `Meta` API (api/meta.py:1-120; list methods
  * data_sources/feature_sets/models/endpoints with `details=True`,
  * describe methods by name, views listing).
  *
  * Every listing is a filter over the registry's (metadata-sized)
  * table; `details = true` projects the typed per-kind meta keys into
  * columns instead of returning the raw map. */
class Meta(val catalog: Catalog) {
  private def reg = catalog.registry

  /** Account info — the root + per-type artifact counts
    * (api/meta.py `account`). */
  def account: Map[String, String] = {
    val counts = reg.list().groupBy("artifact_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1).toString).toMap
    Map("root" -> catalog.root) ++ counts.map { case (k, v) => s"count_$k" -> v }
  }

  private def listByType(t: String, details: Boolean,
                         detailKeys: Seq[(String, String)]): DataFrame = {
    val base = reg.list().filter(col("artifact_type") === t)
      .select("name", "owner", "status", "input", "created", "modified", "tags", "meta")
    val projected =
      if (!details) base
      else detailKeys.foldLeft(base) { case (d, (key, as)) =>
        d.withColumn(as, element_at(col("meta"), key))
      }
    projected.drop("meta").orderBy("name")
  }

  def dataSources(details: Boolean = false): DataFrame =
    listByType("data_source", details, Nil)
  def featureSets(details: Boolean = false): DataFrame =
    listByType("feature_set", details, Seq(
      "graft_id_column" -> "id_column",
      "graft_event_time_column" -> "event_time_column"))
  def models(details: Boolean = false): DataFrame =
    listByType("model", details, Seq(
      "graft_model_type" -> "model_type", "graft_target" -> "target",
      "graft_features" -> "features", "graft_endpoints" -> "endpoints",
      "graft_inference_runs" -> "inference_runs"))
  def endpoints(details: Boolean = false): DataFrame =
    listByType("endpoint", details, Seq(
      "graft_data_capture" -> "data_capture",
      "graft_capture_percentage" -> "capture_percentage"))
  def graphs(details: Boolean = false): DataFrame =
    listByType("graph", details, Nil)

  /** All stored view definitions as (artifact, view, sql) —
    * api/meta.py `views`. */
  def views(): DataFrame =
    reg.list().select(col("name").as("artifact"), explode(col("meta")))
      .filter(col("key").startsWith("graft_view_sql/"))
      .select(col("artifact"),
        regexp_replace(col("key"), "^graft_view_sql/", "").as("view"),
        col("value").as("sql"))
      .orderBy("artifact", "view")

  /** Describe one artifact by name: the basic fields merged with its
    * free-form meta (artifact.py `summary`, api/meta.py describe
    * methods). */
  def describe(name: String): Map[String, String] =
    reg.get(catalog.sanitize(name)).map { r =>
      Map("name" -> r.name, "artifact_type" -> r.artifact_type,
        "owner" -> r.owner, "status" -> r.status, "input" -> r.input,
        "tags" -> r.tags.mkString(","),
        "health_tags" -> r.health_tags.mkString(",")) ++ r.meta
    }.getOrElse(Map.empty)
}

/** CachedMeta: the same interface as [[Meta]] with TTL-memoized results
  * (reference: cached/cached_meta.py:68-150 — "the recommended class
  * for metadata retrieval: same interface as Meta, much faster, with a
  * 30-second TTL so results stay current"; the per-artifact cached
  * wrappers in cached/cached_*.py are the same memoization idea).
  *
  * Listing frames are materialized once via `localCheckpoint` (they are
  * metadata-sized by construction — one row per artifact), so repeat
  * calls inside the TTL window neither re-read the registry parquet nor
  * re-run the projection. `refresh()` drops everything eagerly. */
class CachedMeta(catalog: Catalog, val ttlMs: Long = 30000L)
  extends Meta(catalog) {
  // the catalog-shared ArtifactCache (same store the Cached* artifact
  // handles use) unless a custom TTL forces a private instance; either
  // way displaced checkpointed frames are unpersisted on eviction
  // (ADVICE r3: the old map-based cache leaked checkpoint blocks)
  private val store =
    if (ttlMs == catalog.artifactCache.ttlMs) catalog.artifactCache
    else new ArtifactCache(catalog, ttlMs)

  private def cached[T](k: String)(f: => T): T = store.cached("meta/" + k)(f)
  private def cachedDf(k: String)(f: => DataFrame): DataFrame = cached(k)(f)

  override def account: Map[String, String] = cached("account")(super.account)
  override def dataSources(details: Boolean = false): DataFrame =
    cachedDf(s"data_sources/$details")(super.dataSources(details))
  override def featureSets(details: Boolean = false): DataFrame =
    cachedDf(s"feature_sets/$details")(super.featureSets(details))
  override def models(details: Boolean = false): DataFrame =
    cachedDf(s"models/$details")(super.models(details))
  override def endpoints(details: Boolean = false): DataFrame =
    cachedDf(s"endpoints/$details")(super.endpoints(details))
  override def graphs(details: Boolean = false): DataFrame =
    cachedDf(s"graphs/$details")(super.graphs(details))
  override def views(): DataFrame = cachedDf("views")(super.views())
  override def describe(name: String): Map[String, String] =
    cached(s"describe/$name")(super.describe(name))

  /** Drop all cached results, releasing checkpointed frames
    * (cached_meta.py `refresh`). */
  def refresh(): Unit = store.invalidate("meta/")
}
