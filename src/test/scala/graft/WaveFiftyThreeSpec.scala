package graft

/** Round-12 wave 53: function-word cosine, new/repeat revenue ledger,
  * template-family purity (q500–q502). */
class WaveFiftyThreeSpec extends SparkSpec {
  import spark.implicits._

  test("functionWordCosine: integer-exact cosine, stopword-free source drops") {
    val docs = Seq(
      ("A", "the the a"), ("B", "the a a"), ("D", "of of"), ("C", "zz")
    ).toDF("source", "text")
    val r = graft.text.Distinctive
      .functionWordCosine(docs, "source", "text")
      .collect()
      .map(x => (x.getAs[String]("source_a"), x.getAs[String]("source_b"))
        -> x.getAs[Double]("cosine")).toMap
    // A=(the:2, a:1), B=(the:1, a:2): dot 4, |A|²=|B|²=5 → 4/5
    assert(r.size == 3) // C has no stopword tokens → no pairs
    assert(r(("A", "B")) == 0.8)
    assert(r(("A", "D")) == 0.0)
    assert(r(("B", "D")) == 0.0)
  }

  test("newRepeatRevenue: acquisition vs retention split on the month grain") {
    val orders = Seq(
      (1L, "2020-01-15", 10.00), (1L, "2020-02-10", 5.00),
      (2L, "2020-02-20", 7.00)
    ).toDF("o_custkey", "o_orderdate", "o_totalprice")
    val r = graft.operators.Reporting
      .newRepeatRevenue(orders, "o_custkey", "o_orderdate", "o_totalprice")
      .collect().map(x => x.getAs[String]("month") -> x).toMap
    val jan = r("2020-01-01")
    assert(jan.getAs[Double]("revenue_new") == 10.0)
    assert(jan.getAs[Double]("revenue_repeat") == 0.0)
    assert(jan.getAs[Double]("new_revenue_share") == 1.0)
    val feb = r("2020-02-01")
    assert(feb.getAs[Double]("revenue_new") == 7.0)
    assert(feb.getAs[Double]("revenue_repeat") == 5.0)
    assert(feb.getAs[Long]("n_new_customers") == 1)
    assert(feb.getAs[Long]("n_repeat_customers") == 1)
    assert(feb.getAs[Double]("new_revenue_share") == 0.583333)
  }

  test("templatePurity: family-size buckets with pooled top-source share") {
    val docs = Seq(
      ("s0", "Terms of service A"), ("s0", "terms   OF service B"),
      ("s1", "terms of service C"),   // cross-source family of 3
      ("s0", "footer x1"), ("s0", "footer x2"), // pure family of 2
      ("s2", "unique document")       // singleton → excluded
    ).toDF("source", "text")
    val r = graft.text.Templates.templatePurity(docs, "source", "text")
      .collect().map(x => x.getAs[String]("size_bucket") -> x).toMap
    val two = r("2")
    assert(two.getAs[Long]("n_families") == 1)
    assert(two.getAs[Long]("n_cross_source") == 0)
    assert(two.getAs[Double]("pooled_top_share") == 1.0)
    val mid = r("3-5")
    assert(mid.getAs[Long]("n_families") == 1)
    assert(mid.getAs[Long]("n_cross_source") == 1)
    assert(mid.getAs[Double]("cross_share") == 1.0)
    assert(mid.getAs[Double]("pooled_top_share") == 0.666667)
  }
}
