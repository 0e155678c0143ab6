package graft

import graft.operators.Cooccur
import graft.stores.IncrementalAgg._
import org.apache.spark.sql.functions._

/** Wave-10 kernels: incremental aggregate maintenance, co-occurrence
  * mining. */
class IncrementalCooccurSpec extends SparkSpec {
  import spark.implicits._

  test("incremental agg: N-batch fold equals full rescan exactly") {
    val df = (1 to 1000).map(i => (s"g${i % 3}", i * 1.01)).toDF("g", "v")
    val full = finalizeState(aggState(df, Seq("g"), "v"))
    // fold 4 arbitrary batches
    val batches = (0 until 4).map(b => df.filter(pmod(crc32(col("v").cast("string")), lit(4)) === b))
    val folded = finalizeState(
      batches.map(aggState(_, Seq("g"), "v"))
        .reduce((a, b) => merge(a, b, Seq("g"))))
    assert(folded.exceptAll(full).isEmpty && full.exceptAll(folded).isEmpty)
  }

  test("incremental agg: merge is associative") {
    val df = (1 to 300).map(i => (s"g${i % 2}", i.toDouble)).toDF("g", "v")
    val Seq(a, b, c) = (0 until 3).map(k =>
      aggState(df.filter(pmod(col("v"), lit(3.0)) === k), Seq("g"), "v"))
    val left = merge(merge(a, b, Seq("g")), c, Seq("g"))
    val right = merge(a, merge(b, c, Seq("g")), Seq("g"))
    assert(finalizeState(left).exceptAll(finalizeState(right)).isEmpty)
  }

  test("cooccur: hand-computed lift and PMI on a 4-basket fixture") {
    // baskets: {A,B}, {A,B}, {A,C}, {C}
    val df = Seq((1, "A"), (1, "B"), (2, "A"), (2, "B"), (3, "A"), (3, "C"),
      (4, "C")).toDF("b", "i")
    val out = Cooccur.itemPairs(df, "b", "i", minSupport = 1)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(5))).toMap
    // A:3 B:2 C:2 baskets, N=4; AB pairs=2 → lift = 2*4/(3*2) = 1.333333
    assert(out(("A", "B"))._1 === 2L)
    assert(out(("A", "B"))._2 === 1.333333)
    // AC: 1*4/(3*2) = 0.666667 (negative association → pmi < 0)
    assert(out(("A", "C"))._2 === 0.666667)
    assert(!out.contains(("B", "C"))) // never co-occur
  }

  test("cooccur: duplicate items in a basket count once; cap drops mega-baskets") {
    val dup = Seq((1, "A"), (1, "A"), (1, "B")).toDF("b", "i")
    assert(Cooccur.itemPairs(dup, "b", "i", 1).head().getLong(2) === 1L)
    val mega = (Seq((1, "A"), (1, "B")) ++ (1 to 50).map(i => (2, s"x$i")))
      .toDF("b", "i")
    val capped = Cooccur.itemPairs(mega, "b", "i", 1, maxBasketSize = 10)
    assert(capped.count() === 1L) // only basket 1's pair survives
  }
}
