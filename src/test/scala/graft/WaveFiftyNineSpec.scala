package graft

/** Round-12 wave 59: char-trigram JS style-drift matrix and the JL
  * projection distortion audit (q518–q519). */
class WaveFiftyNineSpec extends SparkSpec {
  import spark.implicits._

  test("charJsMatrix: identical sources at 0, disjoint sources at 1") {
    val docs = Seq(
      ("a", "hello world"), ("b", "hello world"), ("c", "zzzzz")
    ).toDF("source", "text")
    val r = graft.text.StyleDrift.charJsMatrix(docs, "source", "text")
      .collect()
      .map(x => (x.getAs[String]("source_a"),
        x.getAs[String]("source_b")) -> x).toMap
    assert(r.size == 3)
    assert(r(("a", "b")).getAs[Double]("js") == 0.0)
    assert(r(("a", "b")).getAs[Long]("n_shared_grams") == 9)
    // zero-overlap pairs still appear, at the JS maximum
    assert(r(("a", "c")).getAs[Long]("n_shared_grams") == 0)
    assert(r(("a", "c")).getAs[Double]("js") == 1.0)
    assert(r(("b", "c")).getAs[Double]("js") == 1.0)
  }

  test("jlDistortion: identical pair lands in the top bucket with 0 err") {
    val emb = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (2L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (3L, Array(0.0f, 1.0f, 0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val r = graft.proximity.JlAudit
      .jlDistortion(emb, "vec_id", "embedding", k = 16, idCap = 500)
      .collect().map(x => x.getAs[Long]("bucket") -> x).toMap
    // (1,2): cos 1 -> bucket 9, projections identical -> err 0
    val top = r(9L)
    assert(top.getAs[Long]("n_pairs") == 1)
    assert(top.getAs[Double]("mean_true") == 1.0)
    assert(top.getAs[Double]("mean_abs_err") == 0.0)
    // (1,3), (2,3): cos 0 -> bucket 5
    assert(r(5L).getAs[Long]("n_pairs") == 2)
    assert(r(5L).getAs[Double]("mean_true") == 0.0)
  }
}
