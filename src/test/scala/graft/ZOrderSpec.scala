package graft

import graft.core.Tables
import graft.operators.ZOrder
import org.apache.spark.sql.functions._

/** Z-order clustered layout (operators/ZOrder.scala): Morton key
  * correctness, codegen plan shape, and the property that justifies the
  * operator at 100 TB — per-file min/max spreads stay tight in EVERY
  * z-ordered dimension, where a single-column sort leaves the other
  * dimension's file statistics useless for pruning. */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("morton interleave matches the reference bit computation") {
    val df = Seq((0L, 0L), (255L, 0L), (0L, 255L), (255L, 255L),
      (5L, 9L), (170L, 85L)).toDF("a", "b")
    def ref(a: Long, b: Long): Long =
      (0 until 8).map(j => (((a >> j) & 1L) << (2 * j)) |
        (((b >> j) & 1L) << (2 * j + 1))).reduce(_ | _)
    val got = df.select(col("a"), col("b"),
        ZOrder.morton(Seq(col("a"), col("b")), 8).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    got.foreach { case (a, b, z) => assert(z == ref(a, b), s"($a,$b)") }
  }

  test("quantize: clamped linear buckets, exact-max lands in top bucket") {
    val df = Seq(0.0, 2.5, 5.0, 9.999, 10.0).toDF("v")
    val q = df.select(ZOrder.quantize(col("v"), 0.0, 10.0, 2).as("b"))
      .as[Long].collect().toSeq
    assert(q == Seq(0L, 1L, 2L, 3L, 3L))
    // degenerate range collapses to bucket 0, no division by zero
    val const = df.select(ZOrder.quantize(col("v"), 5.0, 5.0, 4).as("b"))
      .as[Long].collect().toSeq
    assert(const.forall(_ == 0L))
  }

  test("zOrderKey plan: one codegen projection, no UDF, no extra shuffle") {
    val p = Tables.load(spark, sf, "part")
    val plan = p.select(ZOrder.zOrderKey(p, Seq("p_size", "p_retailprice"), 8))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BatchEvalPython") && !plan.contains("Exchange"),
      s"key must be a pure projection:\n$plan")
  }

  test("z-ordered layout keeps BOTH dims' per-file spreads tight; " +
      "single-column sort leaves the second dim unprunable") {
    val p = Tables.load(spark, sf, "part")
      .select("p_partkey", "p_size", "p_retailprice")
    val dims = Seq("p_size", "p_retailprice")
    val zDir = java.nio.file.Files.createTempDirectory("graft-zorder").toString
    val sDir = java.nio.file.Files.createTempDirectory("graft-sorted").toString
    ZOrder.writeZOrdered(p, zDir, dims, nFiles = 16, bits = 12)
    // baseline: same file count, clustered on p_size only
    p.repartitionByRange(16, col("p_size")).sortWithinPartitions("p_size")
      .write.mode("overwrite").parquet(sDir)
    def spreads(dir: String): Map[String, Double] =
      ZOrder.layoutReport(spark.read.parquet(dir), dims)
        .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    val z = spreads(zDir)
    val s = spreads(sDir)
    // single-column sort: near-perfect on its own key, ~full-range on the
    // other; z-order: materially tight on BOTH (each file a curve segment)
    assert(s("p_retailprice") > 0.8,
      s"baseline should be unprunable on dim 2: $s")
    assert(z("p_size") < 0.5 && z("p_retailprice") < 0.5,
      s"z-order must bound both dims' file spreads: $z")
    // the data itself round-trips
    assert(spark.read.parquet(zDir).count() == p.count())
  }

  test("prunedRead: opens a strict subset of files on EITHER dim of a " +
      "z-ordered layout, and the result is exactly the filtered scan") {
    val p = Tables.load(spark, sf, "part")
      .select("p_partkey", "p_size", "p_retailprice")
    val dims = Seq("p_size", "p_retailprice")
    val dir = java.nio.file.Files.createTempDirectory("graft-zprune").toString
    ZOrder.writeZOrdered(p, dir, dims, nFiles = 16, bits = 12)
    val idx = ZOrder.skippingIndex(spark, dir, dims).localCheckpoint(true)
    val nFiles = idx.count()
    for ((c, lo, hi) <- Seq(("p_size", 1.0, 10.0),
        ("p_retailprice", 1200.0, 1400.0))) {
      val survivors = idx
        .filter(col(s"max_$c") >= lo && col(s"min_$c") <= hi).count()
      assert(survivors < nFiles,
        s"$c: no files pruned ($survivors of $nFiles)")
      val got = ZOrder.prunedRead(spark, dir, idx, c, lo, hi)
        .select("p_partkey").collect().map(_.getLong(0)).toSet
      val want = p.filter(col(c).cast("double") >= lo &&
          col(c).cast("double") <= hi)
        .select("p_partkey").collect().map(_.getLong(0)).toSet
      assert(got == want, s"$c: pruned read must stay exact")
    }
    // empty-intersection predicate yields an empty, schema-correct frame
    val none = ZOrder.prunedRead(spark, dir, idx, "p_size", 1e9, 2e9)
    assert(none.count() == 0 && none.columns.toSeq == p.columns.toSeq)
  }
}
