package graft

import org.apache.spark.sql.functions._

/** Round-12 wave 52: shared-prefix templates, dup-span position,
  * directed dup attribution, lang-ID confusion, n-gram df spectrum,
  * daily growth accounting (q494–q499). */
class WaveFiftyTwoSpec extends SparkSpec {
  import spark.implicits._

  test("sharedPrefixes: normalized prefix families, deterministic top") {
    val docs = Seq(
      ("A", "Terms of service apply here"),
      ("A", "terms   OF service apply now"),
      ("A", "unique doc one")
    ).toDF("source", "text")
    val r = graft.text.Templates
      .sharedPrefixes(docs, "source", "text", k = 8, minDocs = 2L)
      .collect()
    assert(r.length == 1)
    val a = r.head
    assert(a.getAs[Long]("n_docs") == 3)
    assert(a.getAs[Long]("n_dup_prefixes") == 1)
    assert(a.getAs[Long]("docs_in_dup_groups") == 2)
    assert(a.getAs[Double]("dup_share") == 0.666667)
    assert(a.getAs[String]("top_prefix") == "terms of")
    assert(a.getAs[Long]("top_count") == 2)
  }

  test("dupSpanPosition: planted shared shingle lands in the right thirds") {
    // d1 "a b c" at third 0; d2 "a b c" at third 1 (pos 2 of m=4)
    val docs = Seq(
      (1L, "a b c d e f"), (2L, "x y a b c z")
    ).toDF("doc_id", "text")
    val r = graft.text.CorpusStats.dupSpanPosition(docs, "doc_id", "text")
      .collect().map(x => x.getAs[Long]("third") -> x).toMap
    assert(r(0L).getAs[Long]("n_instances") == 4)
    assert(r(0L).getAs[Long]("n_dup_instances") == 1)
    assert(r(0L).getAs[Double]("dup_share") == 0.25)
    assert(r(1L).getAs[Long]("n_instances") == 2)
    assert(r(1L).getAs[Long]("n_dup_instances") == 1)
    assert(r(2L).getAs[Long]("n_dup_instances") == 0)
  }

  test("dupAttribution: keep-first losses attributed to the winner source") {
    val docs = Seq(
      (1L, "s0", "x"), (2L, "s1", "x"), (3L, "s1", "x"), (4L, "s1", "y"),
      (5L, "s0", "z"), (6L, "s0", "z")
    ).toDF("doc_id", "source", "text")
    val r = graft.dedup.Dedup
      .dupAttribution(docs, "doc_id", "source", "text")
      .collect()
      .map(x => (x.getAs[String]("winner_source"),
        x.getAs[String]("dup_source")) -> x.getAs[Long]("n_dup_rows"))
      .toMap
    assert(r == Map(("s0", "s0") -> 1L, ("s0", "s1") -> 2L))
    // prefix mode clusters on the normalized first-k characters
    val pf = graft.dedup.Dedup.dupAttribution(
      Seq((1L, "sA", "HEADER one"), (2L, "sB", "header two"))
        .toDF("doc_id", "source", "text"),
      "doc_id", "source", "text", prefixChars = 6).collect()
    assert(pf.length == 1 &&
      pf.head.getAs[String]("winner_source") == "sA" &&
      pf.head.getAs[Long]("n_dup_rows") == 1)
  }

  test("langid confusion cells: labeled vs predicted with in-label share") {
    import org.apache.spark.sql.expressions.Window
    val docs = Seq(
      ("en", "the and of"), ("en", "qqq zzz"), ("fr", "le et pour")
    ).toDF("lang", "text")
    val cells = docs
      .select(col("lang"),
        graft.text.Text.langId(col("text")).as("lang_pred"))
      .groupBy("lang", "lang_pred").agg(count(lit(1)).as("n_docs"))
      .withColumn("share", round(col("n_docs").cast("double") /
        sum("n_docs").over(Window.partitionBy("lang")), 6))
      .collect()
      .map(x => (x.getAs[String]("lang"), x.getAs[String]("lang_pred"))
        -> x.getAs[Double]("share")).toMap
    assert(cells(("en", "en")) == 0.5)
    assert(cells(("en", "und")) == 0.5)
    assert(cells(("fr", "fr")) == 1.0)
  }

  test("ngramDfHistogram: df buckets with exact instance mass") {
    val docs = Seq(
      (1L, "a b c a b c"), // "a b c" x2, "b c a", "c a b"
      (2L, "a b c")        // "a b c" x1
    ).toDF("doc_id", "text")
    val r = graft.text.CorpusStats
      .ngramDfHistogram(docs, "doc_id", "text")
      .collect().map(x => x.getAs[String]("df_bucket") -> x).toMap
    assert(r("1").getAs[Long]("n_shingles") == 2)
    assert(r("1").getAs[Long]("n_instances") == 2)
    assert(r("1").getAs[Double]("instance_share") == 0.4)
    assert(r("2").getAs[Long]("n_shingles") == 1)
    assert(r("2").getAs[Long]("n_instances") == 3)
    assert(r("2").getAs[Double]("instance_share") == 0.6)
  }

  test("growthAccounting: DAU ledger with clipped churn") {
    val ev = Seq(
      (1L, "2024-01-01 10:00:00"), (1L, "2024-01-02 09:00:00"),
      (1L, "2024-01-04 08:00:00"), (2L, "2024-01-02 12:00:00")
    ).toDF("user_id", "ts")
      .withColumn("ts", to_timestamp(col("ts")))
    val r = graft.operators.Cohorts.growthAccounting(ev, "user_id", "ts")
      .collect().map(x => x.getAs[String]("day") -> x).toMap
    assert(r("2024-01-01").getAs[Long]("n_new") == 1)
    assert(r("2024-01-02").getAs[Long]("n_active") == 2)
    assert(r("2024-01-02").getAs[Long]("n_retained") == 1)
    assert(r("2024-01-02").getAs[Long]("n_new") == 1)
    // both users vanish on the 3rd; u1 resurrects on the 4th
    assert(r("2024-01-03").getAs[Long]("n_active") == 0)
    assert(r("2024-01-03").getAs[Long]("n_churned") == 2)
    assert(r("2024-01-04").getAs[Long]("n_resurrected") == 1)
    // u1's churn after 01-04 is clipped past the last observed day
    assert(!r.contains("2024-01-05"))
  }
}
