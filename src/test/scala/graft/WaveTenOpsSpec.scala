package graft

import graft.ml.{Bootstrap, Preference, RankingMetrics, Ridge}
import graft.proximity.Graph
import org.apache.spark.sql.functions._

/** ANN-recall harness (q267), position bias (q268), subsample
  * bootstrap (q269), weighted SSSP (q270), modularity (q271) and
  * closed-form ridge (q272): hand-computed fixtures + invariants. */
class WaveTenOpsSpec extends SparkSpec {
  import spark.implicits._

  test("overlapAtK: identical runs give recall 1, disjoint give 0") {
    val a = Seq((1, 10), (1, 11), (2, 20), (2, 21))
      .toDF("query", "doc")
    val r1 = RankingMetrics.overlapAtK(a, a, k = 2)
      .collect().map(r => r.getInt(0) -> r.getDouble(2)).toMap
    assert(r1 == Map(1 -> 1.0, 2 -> 1.0))
    val b = Seq((1, 90), (1, 91), (2, 20), (2, 92)).toDF("query", "doc")
    val r2 = RankingMetrics.overlapAtK(a, b, k = 2)
      .collect().map(r => r.getInt(0) -> r.getDouble(2)).toMap
    assert(r2 == Map(1 -> 0.0, 2 -> 0.5))
  }

  test("positionBias: planted left bias is measured exactly") {
    // item x shown first 10 times, wins 8; item y shown first 10, wins 2
    // pooled = 0.5; x rate 0.8, z = (0.8-0.5)/sqrt(0.25/10)
    val pl = (Seq.fill(8)(("x", 1)) ++ Seq.fill(2)(("x", 0)) ++
      Seq.fill(2)(("y", 1)) ++ Seq.fill(8)(("y", 0)))
      .toDF("first_item", "first_won")
    val out = Preference.positionBias(pl, "first_item", "first_won")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("x").getDouble(3) == 0.8 && out("x").getDouble(4) == 0.5)
    val z = (0.8 - 0.5) / math.sqrt(0.25 / 10)
    assert(math.abs(out("x").getDouble(5) - z) < 1e-6)
    assert(math.abs(out("y").getDouble(5) + z) < 1e-6)
  }

  test("positionBias: degenerate pooled rate emits null z") {
    val pl = Seq(("x", 1), ("y", 1)).toDF("first_item", "first_won")
    Preference.positionBias(pl, "first_item", "first_won")
      .collect().foreach(r => assert(r.isNullAt(5)))
  }

  test("subsampleCi: CI brackets the mean and narrows with spread") {
    val tight = (1 to 200).map(i => ("t", i.toLong, 100.0 + (i % 3)))
    val wide = (1 to 200).map(i => ("w", i.toLong + 1000, (i % 100) * 10.0))
    val out = Bootstrap.subsampleCi((tight ++ wide).toDF("g", "id", "v"),
        "g", "id", "v")
      .collect().map(r => r.getString(0) -> r).toMap
    Seq("t", "w").foreach { g =>
      val r = out(g)
      assert(r.getLong(1) == 200 && r.getLong(5) == 64)
      assert(r.getDouble(3) <= r.getDouble(2) &&
        r.getDouble(2) <= r.getDouble(4)) // lo <= mean <= hi
    }
    val widtht = out("t").getDouble(4) - out("t").getDouble(3)
    val widthw = out("w").getDouble(4) - out("w").getDouble(3)
    assert(widtht < widthw)
    // deterministic: a rerun reproduces the bounds bit-exactly
    val again = Bootstrap.subsampleCi((tight ++ wide).toDF("g", "id", "v"),
        "g", "id", "v")
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(again("t") == out("t").getDouble(3))
  }

  test("ssspWeighted: hand-built weighted path graph") {
    // 1 →(1.0) 2 →(1.0) 3, and a direct heavy edge 1 →(5.0) 3:
    // dist(3) must take the 2-hop light path = 2.0
    val edges = Seq((1L, 2L, 1.0), (2L, 3L, 1.0), (1L, 3L, 5.0))
      .toDF("src", "dst", "w")
    val out = Graph.ssspWeighted(edges,
        Seq(Tuple1(1L)).toDF("id"), rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out == Map(1L -> 0.0, 2L -> 1.0, 3L -> 2.0))
  }

  test("ssspWeighted: rounds cap bounds the horizon") {
    val edges = Seq((1L, 2L, 1.0), (2L, 3L, 1.0)).toDF("src", "dst", "w")
    val out = Graph.ssspWeighted(edges, Seq(Tuple1(1L)).toDF("id"),
        rounds = 1)
      .collect().map(_.getLong(0)).toSet
    assert(out == Set(1L, 2L)) // 3 unreached in one round
  }

  test("modularity: two clean cliques score the textbook value") {
    // two triangles {1,2,3} and {4,5,6}: m = 6, each community
    // L_c = 3, D_c = 6 → q_c = 3/6 - (6/12)^2 = 0.25, Q = 0.5
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (4L, 5L), (5L, 6L),
        (4L, 6L))
      .toDF("src", "dst")
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L), (5L, 4L),
        (6L, 4L))
      .toDF("id", "label")
    val out = Graph.modularity(edges, labels).collect()
    assert(out.length == 2)
    out.foreach { r =>
      assert(r.getLong(1) == 3 && r.getLong(2) == 3 && r.getLong(3) == 6)
      assert(r.getDouble(4) == 0.25)
    }
  }

  test("modularity: everything in one community gives Q = 0") {
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val labels = Seq((1L, 9L), (2L, 9L), (3L, 9L)).toDF("id", "label")
    val r = Graph.modularity(edges, labels).head()
    // L_c/m = 1, (D_c/2m)^2 = 1 → q_c = 0
    assert(r.getDouble(4) == 0.0)
  }

  test("ridge2: lambda 0 recovers a planted exact linear relation") {
    // y = 2 + 3*x1 - 4*x2 exactly; lambda 0 → OLS recovers it
    val rows = for (i <- 1 to 20; j <- 1 to 5)
      yield ("g", i.toDouble, j.toDouble, 2.0 + 3 * i - 4 * j)
    val r = Ridge.ridge2(rows.toDF("g", "x1", "x2", "y"), "g",
      "x1", "x2", "y", lambda = 0.0).head()
    assert(math.abs(r.getDouble(2) - 2.0) < 1e-6)
    assert(math.abs(r.getDouble(3) - 3.0) < 1e-6)
    assert(math.abs(r.getDouble(4) + 4.0) < 1e-6)
    assert(r.getDouble(5) == 1.0) // explained
  }

  test("ridge2: penalty shrinks slopes toward zero") {
    val rows = for (i <- 1 to 20; j <- 1 to 5)
      yield ("g", i.toDouble, j.toDouble, 2.0 + 3 * i - 4 * j)
    val df = rows.toDF("g", "x1", "x2", "y")
    val ols = Ridge.ridge2(df, "g", "x1", "x2", "y", lambda = 0.0).head()
    val rg = Ridge.ridge2(df, "g", "x1", "x2", "y", lambda = 100.0).head()
    assert(math.abs(rg.getDouble(3)) < math.abs(ols.getDouble(3)))
    assert(math.abs(rg.getDouble(4)) < math.abs(ols.getDouble(4)))
  }

  test("ridge2: constant feature is singular at lambda 0, fit at > 0") {
    val rows = (1 to 10).map(i => ("g", 5.0, i.toDouble, 2.0 * i))
    val df = rows.toDF("g", "x1", "x2", "y")
    val sing = Ridge.ridge2(df, "g", "x1", "x2", "y", lambda = 0.0).head()
    assert(sing.isNullAt(2) && sing.isNullAt(3))
    val ok = Ridge.ridge2(df, "g", "x1", "x2", "y", lambda = 0.5).head()
    assert(!ok.isNullAt(3) && math.abs(ok.getDouble(3)) < 1e-9)
  }
}
