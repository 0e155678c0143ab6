package graft

/** Round-13 wave 60: corpus snapshot diffing / data versioning
  * (q520–q522). */
class WaveSixtySpec extends SparkSpec {
  import spark.implicits._
  import graft.operators.SnapshotDiff

  private val oldSnap = Seq(
    (1L, "alpha beta", "web"),
    (2L, "gamma delta", "web"),
    (3L, "epsilon", "web"),
    (4L, "zeta eta", "books"),
    (5L, "theta", "books")
  ).toDF("doc_id", "text", "source")

  // 2 removed; 1 changed (doc 4); 1 added (doc 6); 1+1 unchanged
  private val newSnap = Seq(
    (1L, "alpha beta", "web"),
    (4L, "zeta eta v2", "books"),
    (5L, "theta", "books"),
    (6L, "iota kappa", "web")
  ).toDF("doc_id", "text", "source")

  test("diff: per (source, status) counts and exact char sums") {
    val r = SnapshotDiff.diff(oldSnap, newSnap, "doc_id", "text", "source")
      .collect()
      .map(x => (x.getAs[String]("source"), x.getAs[String]("status")) -> x)
      .toMap
    assert(r.size == 5)
    assert(r(("web", "removed")).getAs[Long]("n_docs") == 2)
    // removed: "gamma delta" (11) + "epsilon" (7); nothing on the new side
    assert(r(("web", "removed")).getAs[Long]("chars_old") == 18)
    assert(r(("web", "removed")).getAs[Long]("chars_new") == 0)
    assert(r(("web", "added")).getAs[Long]("n_docs") == 1)
    assert(r(("web", "added")).getAs[Long]("chars_new") == 10)
    assert(r(("books", "changed")).getAs[Long]("n_docs") == 1)
    assert(r(("books", "changed")).getAs[Long]("chars_old") == 8)
    assert(r(("books", "changed")).getAs[Long]("chars_new") == 11)
    assert(r(("web", "unchanged")).getAs[Long]("n_docs") == 1)
    assert(r(("books", "unchanged")).getAs[Long]("n_docs") == 1)
  }

  test("incrementalStats: merged == direct on every source") {
    val r = SnapshotDiff
      .incrementalStats(oldSnap, newSnap, "doc_id", "text", "source")
      .collect().map(x => x.getAs[String]("source") -> x).toMap
    assert(r.size == 2)
    val web = r("web")
    assert(web.getAs[Long]("n_direct") == 2 &&
      web.getAs[Long]("n_merged") == 2)
    // "alpha beta" (10) + "iota kappa" (10)
    assert(web.getAs[Long]("chars_direct") == 20 &&
      web.getAs[Long]("chars_merged") == 20)
    assert(web.getAs[Boolean]("consistent"))
    val books = r("books")
    assert(books.getAs[Long]("n_direct") == 2 &&
      books.getAs[Boolean]("consistent"))
    assert(books.getAs[Long]("chars_direct") == 16 &&
      books.getAs[Long]("chars_merged") == 16)
  }

  test("changedSimilarity: millionths-lattice jaccard over changed docs") {
    val r = SnapshotDiff
      .changedSimilarity(oldSnap, newSnap, "doc_id", "text", "source")
      .collect().map(x => x.getAs[String]("source") -> x).toMap
    // only doc 4 changed: {zeta,eta} vs {zeta,eta,v2} -> 2/3
    assert(r.size == 1)
    assert(r("books").getAs[Long]("n_changed") == 1)
    assert(r("books").getAs[Long]("mean_jaccard_ppm") == 666666L)
  }

  test("diff: disjoint snapshots are all added + removed") {
    val r = SnapshotDiff.diff(
      oldSnap.filter($"doc_id" <= 2), newSnap.filter($"doc_id" >= 6),
      "doc_id", "text", "source").collect()
    assert(r.map(_.getAs[String]("status")).toSet == Set("added", "removed"))
  }
}
