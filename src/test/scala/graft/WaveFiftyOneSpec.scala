package graft

import org.apache.spark.sql.functions._

/** Round-12 wave 51: token fertility, shard-pair overlap, header/detail
  * reconciliation, length x quality grid, backlog curve, lead-time
  * profile (q488–q493). */
class WaveFiftyOneSpec extends SparkSpec {
  import spark.implicits._

  test("tokenFertility: cell-kernel percentiles and exact means") {
    val docs = Seq(
      ("A", "aa bbb aa"), ("A", "c"), ("B", "dd dd")
    ).toDF("source", "text")
    val r = graft.text.CorpusStats.tokenFertility(docs, "source", "text")
      .collect()
    val a = r.find(_.getAs[String]("source") == "A").get
    // lens sorted: 1,2,2,3 → p50 = 2 (cum 3*2 >= 4), p90 = 3
    assert(a.getAs[Long]("n_docs") == 2)
    assert(a.getAs[Long]("n_tokens") == 4)
    assert(a.getAs[Double]("mean_word_len") == 2.0)
    assert(a.getAs[Long]("p50_word_len") == 2)
    assert(a.getAs[Long]("p90_word_len") == 3)
    assert(a.getAs[Double]("tokens_per_doc") == 2.0)
    val b = r.find(_.getAs[String]("source") == "B").get
    assert(b.getAs[Long]("p50_word_len") == 2 &&
      b.getAs[Long]("p90_word_len") == 2)
  }

  test("shardPairOverlap: within-shard dups collapse, grid pads zero pairs") {
    // shard = doc_id % 2: s0 = {x, y} (4 dups to x), s1 = {x, z}
    val docs = Seq(
      (0L, "x"), (2L, "y"), (4L, "x"), (1L, "x"), (3L, "z")
    ).toDF("doc_id", "text")
    val r = graft.dedup.ShardExchange
      .shardPairOverlap(docs, "doc_id", "text", nShards = 2).collect()
    assert(r.length == 1)
    assert(r.head.getAs[Long]("n_a") == 2 && r.head.getAs[Long]("n_b") == 2)
    assert(r.head.getAs[Long]("n_shared") == 1)
    assert(r.head.getAs[Double]("jaccard") == 0.333333)
    // disjoint shards: every pair present with n_shared = 0
    val dj = Seq((0L, "p"), (1L, "q"), (2L, "r"))
      .toDF("doc_id", "text")
    val g = graft.dedup.ShardExchange
      .shardPairOverlap(dj, "doc_id", "text", nShards = 3).collect()
    assert(g.length == 3)
    assert(g.forall(_.getAs[Long]("n_shared") == 0L))
    assert(g.forall(_.getAs[Double]("jaccard") == 0.0))
  }

  test("reconcileOrderTotals: integer-lattice match, mismatch, no-lines") {
    val orders = Seq(
      (1L, "O", 10.00), // exact match
      (2L, "F", 6.00),  // detail says 5.00 → $1 gap
      (3L, "X", 1.00)   // no lines
    ).toDF("o_orderkey", "o_orderstatus", "o_totalprice")
    val lines = Seq(
      (1L, 10.00, 0.00, 0.00),
      (2L, 10.00, 0.50, 0.00) // 10 * (1-0.5) = 5.00
    ).toDF("l_orderkey", "l_extendedprice", "l_discount", "l_tax")
    val r = graft.eda.Integrity.reconcileOrderTotals(orders, lines)
      .collect().map(x => x.getAs[String]("o_orderstatus") -> x).toMap
    assert(r("O").getAs[Long]("n_mismatch") == 0)
    assert(r("O").getAs[Double]("mean_abs_diff_usd") == 0.0)
    assert(r("F").getAs[Long]("n_mismatch") == 1)
    assert(r("F").getAs[Double]("mean_abs_diff_usd") == 1.0)
    assert(r("F").getAs[Double]("max_abs_diff_usd") == 1.0)
    assert(r("X").getAs[Long]("n_no_lines") == 1)
    assert(r("X").isNullAt(r("X").fieldIndex("mean_abs_diff_usd")))
  }

  test("lengthQualityGrid: integer-exact buckets, pooled cell ratios") {
    val docs = Seq(
      Tuple1("the the the"), // nt=3 ns=3 → q bucket 9 (capped), len 11 → 0
      Tuple1("zz zz"),       // q 0, len 0
      Tuple1("")             // nt=0 → q 0, len 0
    ).toDF("text")
    val r = graft.text.CorpusStats.lengthQualityGrid(docs, "text")
      .collect()
    assert(r.length == 2)
    val hi = r.find(_.getAs[Long]("q_bucket") == 9L).get
    assert(hi.getAs[Long]("n_docs") == 1)
    assert(hi.getAs[Double]("stopword_ratio") == 1.0)
    assert(hi.getAs[Double]("mean_chars") == 11.0)
    val lo = r.find(_.getAs[Long]("q_bucket") == 0L).get
    assert(lo.getAs[Long]("n_docs") == 2)
    assert(lo.getAs[Double]("stopword_ratio") == 0.0)
    assert(lo.getAs[Double]("mean_chars") == 2.5)
  }

  test("backlogByMonth: sweep-line opens/closes net to zero") {
    val orders = Seq(
      (1L, "2020-01-15"), (2L, "2020-02-01")
    ).toDF("o_orderkey", "o_orderdate")
    val lines = Seq(
      (1L, "2020-01-20"), (1L, "2020-02-10"), (2L, "2020-02-20")
    ).toDF("l_orderkey", "l_shipdate")
    val r = graft.operators.Intervals.backlogByMonth(orders, lines,
      "o_orderkey", "l_orderkey", "o_orderdate", "l_shipdate").collect()
    val byM = r.map(x => x.getAs[String]("month") -> x).toMap
    assert(byM("2020-01-01").getAs[Long]("n_opened") == 1)
    assert(byM("2020-01-01").getAs[Long]("open_orders") == 1)
    assert(byM("2020-02-01").getAs[Long]("open_orders") == 2)
    assert(byM("2020-03-01").getAs[Long]("n_closed") == 2)
    assert(byM("2020-03-01").getAs[Long]("open_orders") == 0)
  }

  test("leadTimeProfile: type-1 percentiles on day cells") {
    val orders = Seq(
      (1L, "2020-01-01", "P1"), (2L, "2020-01-01", "P1")
    ).toDF("o_orderkey", "o_orderdate", "o_orderpriority")
    val lines = Seq(
      (1L, "2020-01-05"), (1L, "2020-01-11"), (2L, "2020-01-21")
    ).toDF("l_orderkey", "l_shipdate")
    val r = graft.operators.Reporting.leadTimeProfile(orders, lines,
      "o_orderkey", "l_orderkey", "o_orderdate", "l_shipdate",
      "o_orderpriority").collect()
    assert(r.length == 1)
    val p = r.head
    assert(p.getAs[Long]("n_orders") == 2)
    assert(p.getAs[Double]("mean_days") == 15.0)
    assert(p.getAs[Long]("p50_days") == 10)
    assert(p.getAs[Long]("p90_days") == 20)
    assert(p.getAs[Long]("p99_days") == 20)
  }
}
