package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Focused checks for the round-13 optimization internals:
  *  - Metrics.rowAvgRanks grew per-partition bounds + an optional ties
  *    column (the q204 payload-carrying restructure) — ranks must match
  *    the plain window form on groups with wildly different value ranges;
  *  - ecodTopK's kernel swap (distinct-cell join-back → payload-carrying
  *    ranks) must be value-identical to the windowed ECDF definition;
  *  - ParameterStore / InferenceStore must survive the concurrent
  *    lifecycle submissions introduced for q91/q94 (guide §2.6).
  */
class R13OptimizationSpec extends SparkSpec {
  import spark.implicits._

  test("rowAvgRanks with partitionCols: per-group bounds, window-form parity, ties column") {
    // three groups whose ranges differ by orders of magnitude — a global
    // bucket range would collapse two of them into one bucket; ranks must
    // still be the exact per-group tie-averaged window ranks
    val rows = for {
      g <- Seq("discount", "quantity", "price")
      i <- 1 to 500
    } yield {
      val v = g match {
        case "discount" => (i % 11) / 100.0
        case "quantity" => (i % 50).toDouble + 1
        case "price"    => 900.0 + (i % 137) * 731.5
      }
      (g, v, s"$g-$i")
    }
    val df = rows.toDF("g", "v", "payload")
    val got = graft.ml.Metrics.rowAvgRanks(df, "v", "r",
      buckets = 16, partitionCols = Seq("g"), tiesAs = Some("t"))
    val wTie = Window.partitionBy("g", "v")
    val expected = df
      .withColumn("mr", rank().over(Window.partitionBy("g").orderBy("v")))
      .withColumn("tt", count(lit(1)).over(wTie))
      .select(col("payload").as("p2"),
        (col("mr") + (col("tt") - 1) / 2.0).as("r2"), col("tt").as("t2"))
    val joined = got.join(expected, got("payload") === expected("p2"))
    assert(joined.count() == rows.size)
    assert(joined.filter(col("r") =!= col("r2") || col("t") =!= col("t2"))
      .count() == 0)
  }

  test("ecodTopK matches the windowed ECDF definition") {
    val df = (1 to 400).map { i =>
      (i.toLong, (i % 7).toDouble, (i % 13) * 100.0, if (i == 399) 9999.0 else i / 4.0)
    }.toDF("id", "a", "b", "c")
    val got = graft.eda.OutlierScores.ecodTopK(df, "id", Seq("a", "b", "c"), k = 10)
      .withColumnRenamed("id", "gid")
    // reference: per feature, leq = count(v' <= v), t = ties, n = count;
    // tail = min(leq/n, (n-leq+t)/n); score = round(sum(-ln tail), 6)
    val long = df.select(col("id"), explode(array(
        Seq("a", "b", "c").map(c0 => struct(lit(c0).as("f"),
          col(c0).cast("double").as("v"))): _*)).as("p"))
      .select(col("id"), col("p.f").as("f"), col("p.v").as("v"))
    val wLeq = Window.partitionBy("f").orderBy("v")
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    val ref = long
      .withColumn("leq", count(lit(1)).over(wLeq).cast("double"))
      .withColumn("t", count(lit(1)).over(Window.partitionBy("f", "v")))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("f")))
      .withColumn("tail", least(col("leq") / col("n"),
        (col("n") - col("leq") + col("t")) / col("n")))
      .groupBy("id").agg(round(sum(-log(col("tail"))), 6).as("score"))
      .orderBy(col("score").desc, col("id")).limit(10)
    val both = got.join(ref, got("gid") === ref("id"))
    assert(both.count() == 10)
    assert(both.filter(col("ecod_score") =!= col("score")).count() == 0)
  }

  test("ParameterStore and InferenceStore survive concurrent writers") {
    val root = java.nio.file.Files.createTempDirectory("graft-conc").toString
    val ps = new graft.stores.ParameterStore(spark, root)
    val inf = new graft.stores.InferenceStore(spark, root)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutorService(pool)
    val futs = (1 to 4).map { th =>
      scala.concurrent.Future {
        (1 to 5).foreach { i => ps.upsert(s"k-$th-$i", s"""{"v":$i}""") }
        inf.append(Seq((s"id-$th", s"m$th", "lbl", th.toDouble))
          .toDF("id", "model", "pred_label", "pred_value"))
      }
    }
    scala.concurrent.Await.result(
      scala.concurrent.Future.sequence(futs),
      scala.concurrent.duration.Duration(120, "s"))
    pool.shutdown()
    assert(ps.listKeys().size == 20)
    (1 to 4).foreach { th =>
      assert(ps.get(s"k-$th-3").contains("""{"v":3}"""))
    }
    assert(inf.read().count() == 4)
    assert(inf.read().select("model").as[String].collect().sorted.toSeq ==
      Seq("m1", "m2", "m3", "m4"))
  }
}
