package graft

import graft.core.Tables
import graft.proximity.{Pq, Proximity}
import org.apache.spark.sql.functions._

/** Product-quantization ANN (round-7 wave 2; SURVEY §2.12): encode
  * fidelity, planted-twin retrieval, recall vs the exact path, and the
  * IVF+PQ pruned form. */
class PqSpec extends SparkSpec {

  lazy val emb = Tables.load(spark, sf, "embeddings")

  lazy val books = Pq.fitCodebooks(emb, "vec_id", "embedding", m = 16, k = 16)

  test("codebooks: m subspaces of k centroids at dim/m") {
    assert(books.length == 16)
    assert(books.forall(_.length == 16))
    assert(books.forall(_.forall(_.length == 4)))
  }

  test("encode: one code per subspace, all within codebook range") {
    val codes = Pq.encode(emb, "vec_id", "embedding", books).collect()
    assert(codes.length == 500)
    codes.foreach { r =>
      val c = r.getSeq[Int](1)
      assert(c.length == 16 && c.forall(x => x >= 0 && x < 16))
    }
    // scaled copy of a vector (same direction) encodes identically:
    // encoding normalizes first
    val v = emb.limit(10)
    val doubled = v.select(col("vec_id"),
      transform(col("embedding"), x => x * lit(2.0f)).as("embedding"))
    val a = Pq.encode(v, "vec_id", "embedding", books)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val b = Pq.encode(doubled, "vec_id", "embedding", books)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(a == b)
  }

  test("adcTopK: planted twins rank first with pq_similarity ~1") {
    val clones = emb.filter(col("vec_id") < 10).select(
      (col("vec_id") + 100000).as("vec_id"),
      transform(col("embedding"), x => x * lit(3.0f)).as("embedding"),
      col("label"))
    val refs = emb.unionByName(clones)
    val top = Pq.adcTopK(emb.filter(col("vec_id") < 10), refs,
      "vec_id", "embedding", k = 1, books).collect()
    // the twin has the query's exact direction => identical codes =>
    // ADC distance is pure quantization error, the minimum achievable
    top.foreach { r =>
      assert(r.getLong(1) == r.getLong(0) + 100000,
        s"query ${r.getLong(0)} top-1 was ${r.getLong(1)}")
    }
  }

  test("refined recall@10 >= 0.7 vs exact cosine; ADC-only shortlist is looser") {
    val queries = emb.filter(col("vec_id") < 50)
    val exact = Proximity.cosineTopK(queries, emb, "vec_id", "embedding", 10)
      .select("id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // this corpus is quantization-hostile (top-10 cosine gaps smaller
    // than ADC noise): the production shortlist+refine path must hold
    // the 0.7 bar (numpy reference: 0.85 at m=16 k=16 shortlist=50);
    // ADC-only ordering only has to beat noise-floor smoke (ref: 0.44)
    val refined = Pq.adcTopKRerank(queries, emb, "vec_id", "embedding",
      10, books, shortlist = 50)
      .select("id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact intersect refined).size.toDouble / exact.size
    assert(recall >= 0.7, s"refined PQ recall@10 = $recall")
    val adcOnly = Pq.adcTopK(queries, emb, "vec_id", "embedding", 10, books)
      .select("id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val adcRecall = (exact intersect adcOnly).size.toDouble / exact.size
    assert(adcRecall >= 0.25, s"ADC-only recall@10 = $adcRecall")
  }

  test("ivfPqTopK: probing all cells matches adcTopK; pruned probe keeps twins") {
    val queries = emb.filter(col("vec_id") < 20)
    val full = Pq.ivfPqTopK(queries, emb, "vec_id", "embedding", k = 5,
      books, nCells = 4, nProbe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = Pq.adcTopK(queries, emb, "vec_id", "embedding", 5, books)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(full == brute, "nProbe = nCells must reproduce the unpruned scan")
    // pruned: the query's own cell is always probed first, so a planted
    // twin (same direction => same cell) survives nProbe = 1
    val clones = emb.filter(col("vec_id") < 10).select(
      (col("vec_id") + 100000).as("vec_id"),
      transform(col("embedding"), x => x * lit(3.0f)).as("embedding"),
      col("label"))
    val refs = emb.unionByName(clones)
    val pruned = Pq.ivfPqTopK(emb.filter(col("vec_id") < 10), refs,
      "vec_id", "embedding", k = 1, books, nCells = 8, nProbe = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    pruned.foreach { case (q, n) =>
      assert(n == q + 100000, s"query $q pruned top-1 was $n")
    }
  }

  test("pq plans: no cartesian in the ivf-pq join path") {
    val plan = Pq.ivfPqTopK(emb.limit(5), emb, "vec_id", "embedding",
      k = 3, books, nCells = 4, nProbe = 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      s"ivfPqTopK must equi-join on cell:\n$plan")
  }

  test("adcTopKAdaptive: large query side routes to the IVF cell-pruned " +
      "plan, small stays flat (VERDICT r7 item 3)") {
    // forced route (bruteMaxQueries=0 ≡ a query side past the threshold):
    // the plan must be the cell equi-join, never the flat |Q|×|R| scan
    graft.core.Routing.drain()
    val big = Pq.adcTopKAdaptive(emb, emb, "vec_id", "embedding", k = 3,
      books, bruteMaxQueries = 0, nCells = 4, nProbe = 2)
    assert(graft.core.Routing.drain().contains("pq-adc=ivf"))
    // the only non-equi join allowed is the one-row-per-cell centroid
    // broadcast; the candidate join itself must be the __cell equi-join
    val bigPlan = big.queryExecution.executedPlan.toString
    assert(!bigPlan.contains("CartesianProduct") &&
      bigPlan.contains("__cell"),
      s"scaled adc route must be cell-pruned:\n$bigPlan")
    // default threshold at fixture size: flat scan, identical to adcTopK
    val small = Pq.adcTopKAdaptive(emb.limit(5), emb, "vec_id", "embedding",
      k = 3, books)
    assert(graft.core.Routing.drain().contains("pq-adc=flat"))
    val exact = Pq.adcTopK(emb.limit(5), emb, "vec_id", "embedding", 3, books)
    assert(small.collect().toSet == exact.collect().toSet)
  }
}
