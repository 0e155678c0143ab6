package graft

import graft.dedup.{Dedup, ShardExchange}
import org.apache.spark.sql.functions._

/** Round-12 wave: cross-shard dedup exchange — two-level manifest
  * (per-shard local clusters → fingerprint exchange → global first-seen
  * assignment), the N-store orchestration of the q84 incremental path. */
class ShardExchangeSpec extends SparkSpec {
  import spark.implicits._

  // three shards in ingest order with planted within-shard and
  // cross-shard duplicates (normalization collisions included)
  private def shards() = Seq(
    ("s0", 0, Seq(
      (1L, "alpha text"), (2L, "beta text"),
      (3L, "alpha   TEXT") // within-shard dup of 1 (normalizes equal)
    )),
    ("s1", 1, Seq(
      (10L, "alpha text"), // cross-shard dup: s0 wins
      (11L, "gamma text"),
      (12L, "gamma text")  // within-shard dup of 11
    )),
    ("s2", 2, Seq(
      (20L, "beta text"),  // cross-shard dup: s0 wins
      (21L, "gamma text"), // cross-shard dup: s1 wins
      (22L, "delta text")
    ))
  ).map { case (sid, ord, rows) =>
    (sid, ord, rows.toDF("doc_id", "text"))
  }

  test("globalAssign picks the first occurrence in ingest order") {
    val sh = shards()
    val manifests = sh.map { case (sid, ord, df) =>
      ShardExchange.localManifest(df, "doc_id", "text", sid, ord) }
    // s1's manifest collapsed its gamma dup locally
    val m1 = manifests(1).collect()
    assert(m1.length == 2)
    val g = ShardExchange.globalAssign(manifests)
      .orderBy("canonical_id").collect()
    // 4 distinct fingerprints: alpha→(s0,1), beta→(s0,2), gamma→(s1,11),
    // delta→(s2,22)
    assert(g.map(r => (r.getAs[String]("canonical_shard"),
      r.getAs[Long]("canonical_id"))).toSeq ==
      Seq(("s0", 1L), ("s0", 2L), ("s1", 11L), ("s2", 22L)))
    val gamma = g.find(_.getAs[Long]("canonical_id") == 11L).get
    assert(gamma.getAs[Long]("n_shards") == 2) // s1 and s2 both saw it
    assert(gamma.getAs[Long]("n_total") == 3)  // 11, 12, 21
  }

  test("shardSurvivors keeps exactly the global winners") {
    val sh = shards()
    val g = ShardExchange.globalAssign(sh.map { case (sid, ord, df) =>
      ShardExchange.localManifest(df, "doc_id", "text", sid, ord) })
    val survivors = sh.map { case (sid, _, df) =>
      ShardExchange.shardSurvivors(df, "doc_id", "text", sid, g) }
    assert(survivors(0).select("doc_id").as[Long].collect().sorted.toSeq
      == Seq(1L, 2L))
    assert(survivors(1).select("doc_id").as[Long].collect().toSeq
      == Seq(11L))
    assert(survivors(2).select("doc_id").as[Long].collect().toSeq
      == Seq(22L))
    // equivalence: the union of survivors is what single-frame exact
    // dedup keeps on the concatenated corpus (ids encode ingest order)
    val whole = sh.map(_._3).reduce(_ union _)
    val single = Dedup.exactDedup(whole, "doc_id", "text")
      .select("doc_id").as[Long].collect().sorted.toSeq
    val unioned = survivors.reduce(_ union _)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(unioned == single)
  }

  test("exchangeReport rollup: docs, manifest, winners, lost, dups") {
    val rows = ShardExchange.exchangeReport(shards(), "doc_id", "text")
      .collect()
    def r(sid: String) = rows.find(_.getAs[String]("shard_id") == sid).get
    // s0: 3 docs, 2 manifest rows (alpha collapsed), wins both
    assert(r("s0").getAs[Long]("n_docs") == 3)
    assert(r("s0").getAs[Long]("n_manifest") == 2)
    assert(r("s0").getAs[Long]("n_winners") == 2)
    assert(r("s0").getAs[Long]("n_lost") == 0)
    assert(r("s0").getAs[Long]("n_dup_rows") == 1)
    // s1: 3 docs, 2 manifest rows, wins gamma, loses alpha
    assert(r("s1").getAs[Long]("n_docs") == 3)
    assert(r("s1").getAs[Long]("n_manifest") == 2)
    assert(r("s1").getAs[Long]("n_winners") == 1)
    assert(r("s1").getAs[Long]("n_lost") == 1)
    assert(r("s1").getAs[Long]("n_dup_rows") == 1)
    // s2: 3 docs, 3 manifest rows, wins delta, loses beta+gamma
    assert(r("s2").getAs[Long]("n_docs") == 3)
    assert(r("s2").getAs[Long]("n_manifest") == 3)
    assert(r("s2").getAs[Long]("n_winners") == 1)
    assert(r("s2").getAs[Long]("n_lost") == 2)
    assert(r("s2").getAs[Long]("n_dup_rows") == 0)
  }

  test("fp_bucket matches the incremental store's partition layout") {
    val (sid, ord, df) = shards().head
    val m = ShardExchange.localManifest(df, "doc_id", "text", sid, ord)
    assert(m.filter(col("fp_bucket") =!=
      substring(col("fingerprint"), 1, 2)).isEmpty)
  }
}
