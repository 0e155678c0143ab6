package graft

import graft.text.{Budget, Ccnet, SourceOverlap, Urls}
import org.apache.spark.sql.functions._

/** Round-7 wave 2 of the training-data pack (SURVEY §2.12): URL
  * curation, CCNet perplexity bands, cross-source overlap, token-budget
  * planning. */
class UrlCcnetBudgetSpec extends SparkSpec {
  import spark.implicits._

  test("url normalize: scheme/www/query/fragment/case/trailing-slash all collapse") {
    val urls = Seq(
      "https://www.Example.com/a/b?q=1",
      "http://example.com/a/b#frag",
      "EXAMPLE.com/a/b/",
      "ftp://www.example.com/a/b").toDF("url")
    val norms = urls.select(Urls.normalize(col("url")).as("n"))
      .collect().map(_.getString(0)).toSet
    assert(norms == Set("example.com/a/b"), s"got $norms")
  }

  test("url host + registered domain, including the no-dot fallback") {
    val rows = Seq(
      "https://a.b.news.co.uk/story/1",
      "http://sub.example.com/x",
      "localhost/admin").toDF("url")
      .select(Urls.host(Urls.normalize(col("url"))).as("h"))
      .select(col("h"), Urls.registeredDomain(col("h")).as("r"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(rows.toSeq == Seq(
      ("a.b.news.co.uk", "co.uk"), // two-label PSL approximation, as documented
      ("sub.example.com", "example.com"),
      ("localhost", "localhost")))
  }

  test("url annotate: blocklist verdicts and per-URL first-occurrence dedup") {
    val docs = Seq(
      (1L, "https://www.good.com/page"),
      (2L, "http://good.com/page/"),      // same normalized URL as doc 1
      (3L, "https://ads.tracker.net/x"),  // blocked
      (4L, "https://good.com/other")).toDF("doc_id", "url")
    val out = Urls.annotate(docs, "doc_id", "url", Seq("tracker.net"))
      .orderBy("doc_id").collect()
    assert(out.map(r => (r.getLong(0), r.getBoolean(5), r.getLong(6), r.getBoolean(7))).toSeq ==
      Seq((1L, false, 1L, true), (2L, false, 2L, false),
          (3L, true, 1L, false), (4L, false, 1L, true)))
    val kept = Urls.curate(docs, "doc_id", "url", Seq("tracker.net"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 4L))
    // blocklist-as-data anti-join agrees with the literal list
    val viaJoin = Urls.dropBlocklisted(
      Urls.annotate(docs, "doc_id", "url", Nil),
      Seq("tracker.net").toDF("reg_domain"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(viaJoin == Set(1L, 2L, 4L))
  }

  test("ccnet bands: quartile split on perplexity, head = lowest band") {
    // 8 docs with avg_logp descending => perplexity ascending 1..8-ish
    val scored = (1 to 8).map(i => (i.toLong, 10L, -math.log(i.toDouble)))
      .toDF("doc_id", "n_tokens", "avg_logp")
    val banded = Ccnet.perplexityBands(scored).orderBy("doc_id").collect()
    val bands = banded.map(r => r.getLong(0) -> r.getString(4)).toMap
    assert(bands(1L) == "head" && bands(2L) == "head")
    assert(bands(7L) == "tail" && bands(8L) == "tail")
    assert(bands(4L) == "middle" && bands(5L) == "middle")
    // perplexity column is exp(-logp) rounded: doc i has perplexity ~i
    val pp = banded.map(r => r.getDouble(3))
    assert(math.abs(pp(0) - 1.0) < 1e-9 && math.abs(pp(7) - 8.0) < 1e-3)
  }

  test("ccnet sampleBands: head survives fully, tail thins, deterministic") {
    val scored = (1 to 400).map(i => (i.toLong, 10L, -0.01 * i))
      .toDF("doc_id", "n_tokens", "avg_logp")
    val banded = Ccnet.perplexityBands(scored)
    val sampled = Ccnet.sampleBands(banded, "doc_id", 1.0, 0.5, 0.1)
    val byBand = sampled.groupBy("band").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // head quartile (100 docs) fully kept; middle ~50%; tail ~10%
    assert(byBand("head") == 100L, s"head must be kept whole, got $byBand")
    assert(byBand.getOrElse("middle", 0L) > 60 && byBand("middle") < 140)
    assert(byBand.getOrElse("tail", 0L) < 30)
    // deterministic: second run identical
    val again = Ccnet.sampleBands(banded, "doc_id", 1.0, 0.5, 0.1)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(again == sampled.select("doc_id").collect().map(_.getLong(0)).toSet)
  }

  test("source overlap: hand-built corpora give exact jaccard") {
    val docs = Seq(
      ("a", "one two three four"),   // shingles: {one two three, two three four}
      ("b", "one two three"),        // {one two three}
      ("c", "five six seven")        // {five six seven}
    ).toDF("source", "text")
    val m = SourceOverlap.overlapMatrix(docs, "source", "text", n = 3)
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    // a∩b = {one two three}: |a|=2, |b|=1, jaccard = 1/2
    assert(m(("a", "b")) == ((2L, 1L, 1L, 0.5)))
    assert(!m.contains(("a", "c")) && !m.contains(("b", "c")))
    // a clone source is flagged by nearDuplicateSources
    val dup = SourceOverlap.nearDuplicateSources(
      docs.union(Seq(("a2", "one two three four")).toDF("source", "text")),
      "source", "text", n = 3, minJaccard = 0.99)
      .select("source_a", "source_b").collect()
      .map(r => (r.getString(0), r.getString(1)))
    assert(dup.toSeq == Seq(("a", "a2")))
  }

  test("token budget: cap + single-pass redistribution, total within budget") {
    val counts = Seq(("big", 1000L), ("small", 100L))
      .toDF("source", "n_tokens_avail")
    val weights = Seq(("big", 0.5), ("small", 0.5)).toDF("source", "weight")
    // budget 1000, maxEpochs 2: small wants 500 but caps at 200; the 300
    // surplus re-spreads to big (500 + 300 = 800, still under its cap)
    val plan = Budget.plan(counts, weights, totalBudget = 1000L, maxEpochs = 2.0)
      .orderBy("source").collect()
    val byS = plan.map(r => r.getString(0) ->
      (r.getLong(3), r.getDouble(4), r.getBoolean(5))).toMap
    assert(byS("small") == ((200L, 2.0, true)))
    assert(byS("big") == ((800L, 0.8, false)))
    assert(plan.map(_.getLong(3)).sum <= 1000L)
    // everything capped: allocation clamps to cap, plan stays valid
    val tight = Budget.plan(counts, weights, totalBudget = 100000L, maxEpochs = 2.0)
      .collect().map(r => (r.getString(0), r.getLong(3), r.getBoolean(5)))
    assert(tight.toSet == Set(("big", 2000L, true), ("small", 200L, true)))
  }

  test("ccnet curate end-to-end: head of the held-out half survives whole") {
    val docs = graft.core.Tables.load(spark, sf, "documents")
    val out = Ccnet.curate(docs.filter(col("doc_id") >= 250),
      docs.filter(col("doc_id") < 250), "doc_id", "text", minCount = 2)
    val byBand = out.groupBy("band").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // head quartile fully kept; tail mostly dropped; schema carries the
    // ladder columns
    assert(out.columns.toSeq ==
      Seq("doc_id", "n_tokens", "avg_logp", "perplexity", "band"))
    assert(byBand.getOrElse("head", 0L) > byBand.getOrElse("tail", 0L))
    // re-run identical (deterministic draw)
    assert(out.count() == Ccnet.curate(docs.filter(col("doc_id") >= 250),
      docs.filter(col("doc_id") < 250), "doc_id", "text", minCount = 2).count())
  }

  test("url annotate: null url rows keep their verdict row (nothing crashes)") {
    val docs = Seq((1L, "https://ok.com/a"), (2L, null))
      .toDF("doc_id", "url")
    val out = Urls.annotate(docs, "doc_id", "url", Seq("bad.com"))
      .orderBy("doc_id").collect()
    assert(out.length == 2)
    assert(out(1).isNullAt(2), "null url → null url_norm, row retained")
    assert(!out(1).getBoolean(5), "null url is not 'blocked'")
  }

  test("planFromCorpus: temperature weights sum to ~1 and epochs respect the cap") {
    val docs = graft.core.Tables.load(spark, sf, "documents")
    val plan = Budget.planFromCorpus(docs, "source", "text",
      totalBudget = 20000L, temperature = 0.7, maxEpochs = 2.0).collect()
    val wSum = plan.map(_.getDouble(2)).sum
    assert(math.abs(wSum - 1.0) < 1e-3, s"weights sum to $wSum")
    assert(plan.forall(_.getDouble(4) <= 2.0 + 1e-9))
    assert(plan.map(_.getLong(3)).sum <= 20000L)
  }
}
