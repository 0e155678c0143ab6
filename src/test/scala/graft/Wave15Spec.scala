package graft

import graft.ml.InfoGain
import graft.operators.{Forecast, Reporting, SkewJoin}
import graft.text.{Distinctive, Readability}
import org.apache.spark.sql.functions._

/** Wave-15 kernels: EWMA, distinctive terms, clustering coefficient,
  * conversion latency, salted join, readability, info gain, purged
  * folds. */
class Wave15Spec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private def dailySeries(vals: Seq[Double]) =
    vals.zipWithIndex.map { case (v, i) =>
      (ts(f"2024-01-${i + 1}%02d 12:00:00"), v)
    }.toDF("ts", "value")

  test("ewma: constant series is a fixpoint; two-point check") {
    val flat = Forecast.ewma(dailySeries(Seq.fill(10)(42.0)), "ts", "value")
      .collect()
    assert(flat.length === 10 && flat.forall(_.getDouble(2) === 42.0))
    // adjust=true, alpha=0.5 on [1, 2]: (0.5·1 + 1·2)/1.5 = 1.666667
    val two = Forecast.ewma(dailySeries(Seq(1.0, 2.0)), "ts", "value", 0.5)
      .orderBy("day").collect()
    assert(two(0).getDouble(2) === 1.0)
    assert(two(1).getDouble(2) === 1.666667)
  }

  test("distinctiveTerms: a source-exclusive term tops its source") {
    val docs = ((1 to 30).map(i => ("a", "zebra common word filler text")) ++
      (1 to 30).map(i => ("b", "common word filler text other"))).toDF("src", "text")
    val r = Distinctive.distinctiveTerms(docs, "src", "text",
      topK = 2, minCount = 5)
    val topA = r.filter(col("source") === "a").orderBy(desc("z")).head()
    assert(topA.getString(1) === "zebra")
    assert(topA.getLong(2) === 30L && topA.getLong(3) === 0L)
    assert(topA.getDouble(5) > 3.0) // strongly distinctive
  }

  test("clusteringCoefficient: triangle = 1, path interior = 0") {
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("src", "dst")
    val ct = graft.proximity.Graph.clusteringCoefficient(tri).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(ct === Map(1L -> 1.0, 2L -> 1.0, 3L -> 1.0))
    val path = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val cp = graft.proximity.Graph.clusteringCoefficient(path).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(cp(2L) === 0.0) // degree 2, no closing edge
    assert(cp(1L) === 0.0) // degree 1 → defined as 0, not null
  }

  test("conversionLatency: censored users count as started, not converted") {
    val ev = Seq(
      (1L, ts("2024-01-01 00:00:00"), "signup"),
      (1L, ts("2024-01-03 00:00:00"), "purchase"), // 2 days
      (2L, ts("2024-01-01 00:00:00"), "signup"),   // never converts
      (3L, ts("2024-01-02 00:00:00"), "purchase"), // converts BEFORE signup
      (3L, ts("2024-01-05 00:00:00"), "signup"),
      (4L, ts("2024-01-01 00:00:00"), "signup"),
      (4L, ts("2024-01-02 00:00:00"), "purchase")  // 1 day
    ).toDF("user_id", "t", "et")
    val r = Reporting.conversionLatency(ev, "user_id", "t", "et",
      "signup", "purchase").head()
    assert(r.getLong(0) === 4L)             // 4 starters
    assert(r.getLong(1) === 2L)             // only users 1 and 4 convert
    assert(r.getDouble(2) === 0.5)
    assert(r.getDouble(3) === 1.5)          // mean of 2 and 1
    assert(r.getDouble(5) === 1.5)          // median
  }

  test("saltedJoin: result identical to the plain join, salt spreads keys") {
    val fact = (1 to 1000).map(i =>
      (i.toLong, if (i <= 900) 1L else (i % 10).toLong, i * 1.0))
      .toDF("id", "k", "v") // key 1 holds 90% of rows — heavy skew
    val dim = (0L to 10L).map(k => (k, s"dim_$k")).toDF("k", "label")
    val salted = SkewJoin.saltedJoin(fact, dim, "k", "id", k = 8)
    val plain = fact.join(dim, "k")
    assert(salted.count() === plain.count())
    val sAgg = salted.groupBy("label").agg(sum("v").as("s"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val pAgg = plain.groupBy("label").agg(sum("v").as("s"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(sAgg === pAgg)
    // the hot key's rows really do land in >1 salt bucket
    val spread = fact.withColumn("__salt",
        pmod(xxhash64(col("id")), lit(8L)))
      .filter(col("k") === 1L).select("__salt").distinct().count()
    assert(spread > 1)
  }

  test("readability: simple vs complex prose orders correctly") {
    val docs = Seq(
      ("simple", "The cat sat. The dog ran. It was fun."),
      ("complex", "Notwithstanding extraordinarily complicated " +
        "considerations, interminable bureaucratic deliberations " +
        "continued unabated throughout.")
    ).toDF("src", "text")
    val r = Readability.readabilityProfile(docs, "src", "text").collect()
      .map(x => x.getString(0) -> x.getDouble(4)).toMap // mean_reading_ease
    assert(r("simple") > r("complex"))
    assert(r("simple") > 80) // short words, short sentences
  }

  test("infoGain: separating feature ≈ H(y), shuffled feature ≈ 0") {
    val df = (1 to 1000).map { i =>
      val y = if (i % 2 == 0) 1 else 0
      // good: perfectly separates; noise: independent of y
      (y, y * 100.0 + (i % 7), (i % 13).toDouble)
    }.toDF("label", "good", "noise")
    val ig = InfoGain.infoGain(df, Seq("good", "noise"), "label", bins = 4)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(ig("good") > 0.69)   // ln(2) = 0.693 — full binary entropy
    assert(ig("noise") < 0.01)
  }

  test("mahalanobisTopK: off-diagonal point beats marginally-larger ones") {
    // strongly correlated cloud y ≈ x; the planted point (60, -60) is
    // inside both marginal ranges' neighborhood but far off the ellipse
    val cloud = (1 to 500).map(i =>
      (i.toLong, (i % 100).toDouble, (i % 100).toDouble + (i % 7) * 0.1))
    val df = (cloud :+ (9999L, 60.0, -60.0)).toDF("id", "x", "y")
    val top = graft.eda.OutlierScores.mahalanobisTopK(df, "id", "x", "y", 3)
      .collect()
    assert(top.head.getLong(0) === 9999L)
    assert(top.head.getDouble(1) > top(1).getDouble(1) * 5)
  }

  test("seasonalDecompose: pure weekly signal → flat trend, zero residual") {
    val vals = (0 until 28).map(i => Seq(10.0, 20, 30, 40, 30, 20, 10)(i % 7))
    val rows = graft.operators.Forecast
      .seasonalDecompose(dailySeries(vals), "ts", "value")
      .orderBy("day").collect()
    assert(rows.length === 28)
    // centered 7-day MA of an exact-period signal is the constant mean
    val defined = rows.filter(!_.isNullAt(2))
    assert(defined.length === 22) // 28 − 3 leading − 3 trailing
    val m = BigDecimal(Seq(10.0, 20, 30, 40, 30, 20, 10).sum / 7)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(defined.forall(_.getDouble(2) === m))
    assert(defined.forall(r => math.abs(r.getDouble(4)) < 1e-6)) // residual
  }

  test("sprtTrace: sustained high rate accepts H1, low rate accepts H0") {
    def ev(rate: Int) = (0 until 20).flatMap { d =>
      (0 until 100).map { j =>
        (ts(f"2024-01-${d + 1}%02d 10:${j % 60}%02d:00"),
          if (j < rate) "purchase" else "view")
      }
    }.toDF("ts", "et")
    val hi = graft.operators.Forecast.sprtTrace(ev(30), "ts", "et",
      "purchase", 0.18, 0.22).orderBy(desc("day")).head()
    assert(hi.getString(5) === "accept_h1")
    val lo = graft.operators.Forecast.sprtTrace(ev(10), "ts", "et",
      "purchase", 0.18, 0.22).orderBy(desc("day")).head()
    assert(lo.getString(5) === "accept_h0")
  }

  test("powerMde: quadrupling n halves the detectable effect") {
    def frame(n: Int) = (1 to n).map(i =>
      (if (i % 2 == 0) "a" else "b", (i % 50).toDouble)).toDF("g", "v")
    val small = graft.eda.StatTests.powerMde(frame(400), "g", "v", "a", "b")
      .head().getDouble(4)
    val big = graft.eda.StatTests.powerMde(frame(1600), "g", "v", "a", "b")
      .head().getDouble(4)
    assert(math.abs(big / small - 0.5) < 0.05)
  }

  test("benchmarkDecontaminate: exact copy flagged at 1.0, orthogonal not") {
    val bench = Seq((1L, Seq(1.0, 0.0, 0.0)), (2L, Seq(0.0, 1.0, 0.0)))
      .toDF("vec_id", "embedding")
    val corpus = Seq(
      (100L, Seq(1.0, 0.0, 0.0)),   // exact copy of bench 1
      (101L, Seq(0.0, 0.0, 1.0)),   // orthogonal to both
      (102L, Seq(0.7, 0.7, 0.0))    // ~0.707 to both → best bid = 2
    ).toDF("vec_id", "embedding")
    val r = graft.proximity.Embeddings.benchmarkDecontaminate(
      corpus, bench, "vec_id", "embedding", 0.5).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getDouble(2)))).toMap
    assert(r.keySet === Set(100L, 102L))
    assert(r(100L) === ((1L, 1.0)))
    assert(r(102L)._1 === 2L) // tie on similarity → higher bench id wins
  }

  test("snapshotDiff: hand-counted add/remove/change classification") {
    val base = Seq((1L, 10.0, "x"), (2L, 20.0, "y"), (3L, 30.0, "z"))
      .toDF("k", "p", "s")
    val cur = Seq((1L, 10.0, "x"),          // unchanged
      (2L, 25.0, "y"),                      // p changed
      (4L, 40.0, "w"))                      // added; 3 removed
      .toDF("k", "p", "s")
    val m = graft.eda.Profile.snapshotDiff(base, cur, "k", Seq("p", "s"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m === Map("added" -> 1L, "removed" -> 1L, "changed" -> 1L,
      "unchanged" -> 1L, "changed_p" -> 1L, "changed_s" -> 0L))
  }

  test("ucbAllocation: under-explored arm outranks an equal-mean arm") {
    val df = ((1 to 100).map(_ => ("heavy", 5.0)) ++
      (1 to 5).map(_ => ("light", 5.0))).toDF("arm", "r")
    val r = graft.ml.Stats.ucbAllocation(df, "arm", "r").collect()
      .map(x => x.getString(0) -> x.getInt(4)).toMap
    assert(r("light") === 1 && r("heavy") === 2) // same mean, bigger bonus
  }

  test("pairwiseTestsBH: shifted group's pairs flagged, equal pairs not") {
    val df = (Seq("a", "b", "c").flatMap(g =>
      (1 to 200).map(i => (g, (i % 50).toDouble))) ++
      (1 to 200).map(i => ("d", (i % 50).toDouble + 100)))
      .toDF("g", "v")
    val r = graft.eda.MultipleTesting.pairwiseTestsBH(df, "g", "v")
      .collect().map(x =>
        (x.getString(0), x.getString(1)) -> x.getBoolean(6)).toMap
    assert(r.size === 6)
    assert(r.filter(_._1._2 == "d").values.forall(_ == true))
    assert(r.filterNot(_._1._2 == "d").values.forall(_ == false))
  }

  test("A&S normal CDF: identical groups give p = 1 exactly") {
    val na = 10000
    val fixture = ((1 to na).map(i => ("a", (i % 100).toDouble)) ++
      (1 to na).map(i => ("b", (i % 100).toDouble))).toDF("g", "v")
    val p = graft.eda.MultipleTesting.pairwiseTestsBH(fixture, "g", "v")
      .head().getDouble(3)
    assert(p === 1.0) // identical groups → z = 0 → p = 2·(1−Φ(0)) = 1
  }

  test("neymanAllocation: variance drives share; constant stratum gets 0") {
    val df = ((1 to 300).map(i => ("wild", (i % 100).toDouble)) ++
      (1 to 300).map(i => ("tame", (i % 4).toDouble)) ++
      (1 to 300).map(_ => ("flat", 7.0))).toDF("s", "v")
    val r = graft.eda.MultipleTesting.neymanAllocation(df, "s", "v", 1000L)
      .collect().map(x => x.getString(0) -> x.getLong(4)).toMap
    assert(r("flat") === 0L)
    assert(r("wild") > r("tame"))
    assert(math.abs(r.values.sum - 1000L) <= 1) // rounding slack
  }

  test("corrSignificance: linear pair flagged, independent pair not") {
    val df = (1 to 400).map { i =>
      (i.toDouble, i * 2.0 + (i % 5), ((i * 37) % 100).toDouble)
    }.toDF("x", "y", "noise")
    val r = graft.eda.MultipleTesting.corrSignificance(df,
      Seq("noise", "x", "y")).collect()
      .map(row => (row.getString(0), row.getString(1)) ->
        ((row.getDouble(3), row.getBoolean(7)))).toMap
    assert(r.size === 3)
    val (rxy, sigXy) = r(("x", "y"))
    assert(rxy > 0.999 && sigXy)
    assert(!r(("noise", "x"))._2 && !r(("noise", "y"))._2)
  }

  test("cramersVMatrix: dependent pair → V = 1, independent → V ≈ 0") {
    val df = (0 until 400).map { i =>
      val a = if (i % 2 == 0) "p" else "q"
      (a, a.toUpperCase, if ((i / 2) % 2 == 0) "u" else "v")
    }.toDF("a", "dup", "ind")
    val v = graft.eda.Association.cramersVMatrix(df,
      Seq("a" -> "dup", "a" -> "ind")).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(4)).toMap
    assert(v(("a", "dup")) === 1.0)
    assert(v(("a", "ind")) < 0.01)
  }

  test("lexicalRichness: hand-counted TTR and hapax share") {
    val docs = Seq(
      ("s", "alpha beta alpha"),
      ("s", "gamma beta")
    ).toDF("src", "text")
    val r = graft.text.Distinctive.lexicalRichness(docs, "src", "text")
      .head()
    assert(r.getLong(1) === 2L)   // docs
    assert(r.getLong(2) === 5L)   // tokens
    assert(r.getLong(3) === 3L)   // types: alpha, beta, gamma
    assert(r.getDouble(4) === 0.6)
    // hapax: only gamma occurs once → 1/3
    assert(r.getDouble(5) === 0.333333)
    assert(r.getDouble(6) === 4.6) // (2·5 + 2·4 + 5) / 5
  }

  test("audioFeatures: real PCM16 parse — duration, rms, zcr, clipping") {
    import graft.multimodal.Audio
    val rows = Seq(
      (1L, Audio.synthWavPcm16(440.0, 0.5, 8000, amplitude = 0.5)),
      (2L, Audio.synthWavPcm16(100.0, 0.5, 8000, amplitude = 1.5)), // clips
      (3L, Array[Byte](9, 9, 9, 9)) // not a WAV
    ).toDF("media_id", "payload")
    val r = Audio.audioFeatures(rows).collect()
      .map(x => x.getLong(0) -> x).toMap
    val sine = r(1L)
    assert(sine.getBoolean(1))                       // ok
    assert(sine.getInt(2) === 8000)
    assert(sine.getLong(3) === 4000L)                // 0.5 s at 8 kHz
    assert(sine.getDouble(4) === 0.5)                // duration
    assert(math.abs(sine.getDouble(5) - 0.5 / math.sqrt(2)) < 0.001) // rms
    assert(math.abs(sine.getDouble(7) - 880.0) < 10) // zcr ≈ 2·f
    assert(sine.getDouble(8) === 0.0)                // no clipping
    val loud = r(2L)
    assert(loud.getDouble(8) > 0.2)                  // clipped fraction
    assert(loud.getDouble(6) > 0.999)                // peak pinned at FS
    val bad = r(3L)
    assert(!bad.getBoolean(1) && bad.isNullAt(4))    // fallback contract
  }

  test("videoFeatures: frame sampling, real decode, motion energy") {
    import graft.multimodal.{Multimodal, Video}
    val still = Video.packFrames(Seq.fill(4)(Multimodal.syntheticPng(5L, 16, 16)))
    val moving = Video.syntheticClip(99L, nFrames = 6)
    val rows = Seq(
      (1L, moving), (2L, still), (3L, Array[Byte](71, 86, 73, 68))
    ).toDF("media_id", "payload")
    val r = Video.videoFeatures(rows, sampleEvery = 2).collect()
      .map(x => x.getLong(0) -> x).toMap
    val mv = r(1L)
    assert(mv.getBoolean(1) && mv.getInt(2) === 6 && mv.getInt(3) === 3)
    assert(mv.getDouble(5) > 0.0)       // drifting frames → motion
    val st = r(2L)
    assert(st.getBoolean(1) && st.getDouble(5) === 0.0) // identical frames
    assert(!r(3L).getBoolean(1))        // truncated container
  }

  test("KLL quantile shards: merged estimate tracks exact within rank ε, " +
    "state stays kilobytes") {
    val df = (1 to 50000).map(i =>
      ((i % 16).toLong, ((i * 2654435761L) % 100000).toDouble))
      .toDF("shard", "v")
    val shards = graft.eda.Sketches.quantileShardSketches(df, "shard", "v")
      .localCheckpoint(true)
    assert(shards.count() === 16)
    // bounded state: every shard binary ≤ ~32 KB at k=200
    val sizes = shards.select(length(col("qsketch"))).collect()
      .map(_.getInt(0))
    assert(sizes.forall(_ < 32768))
    val merged = graft.eda.Sketches.mergedQuantiles(shards,
      Seq(0.25, 0.5, 0.9)).collect()
    assert(merged.length === 3 && merged.head.getLong(2) === 50000L)
    val exact = df.agg(graft.functions.ExactPercentiles
      .exactPercentiles(col("v"), Seq(0.25, 0.5, 0.9))).head()
      .getSeq[Double](0)
    merged.map(_.getDouble(1)).zip(exact).foreach { case (est, ex) =>
      // KLL k=200 guarantees ~0.7% rank error; values ~uniform on
      // [0, 1e5] so rank error ≈ value error scale
      assert(math.abs(est - ex) < 2500, s"est $est vs exact $ex")
    }
    shards.unpersist()
  }

  test("theta sketches: exact-regime set algebra matches true overlap") {
    import graft.functions.ThetaSketch
    // below sketch capacity the estimates are exact: A = 0..999,
    // B = 500..1499 → |A∩B| = 500, |A\B| = 500
    val df = ((0 until 1000).map(i => ("a", i)) ++
      (500 until 1500).map(i => ("b", i))).toDF("side", "k")
    val sk = df.groupBy("side")
      .agg(ThetaSketch.thetaSketch(col("k")).as("sk"))
      .collect().map(r => r.getString(0) -> r.getAs[Array[Byte]](1)).toMap
    assert(math.round(ThetaSketch.estimate(sk("a"))) === 1000L)
    assert(math.round(ThetaSketch.intersect(sk("a"), sk("b"))) === 500L)
    assert(math.round(ThetaSketch.aNotB(sk("a"), sk("b"))) === 500L)
  }

  test("frequent-items sketch: planted heavy hitter surfaces with bounds") {
    import graft.functions.FreqSketch
    val df = ((1 to 5000).map(_ => "whale") ++
      (1 to 20000).map(i => s"minnow_$i")).toDF("term")
    val bytes = df.agg(FreqSketch.freqSketch(col("term"), 64)).head()
      .getAs[Array[Byte]](0)
    val top = FreqSketch.frequentItems(bytes)
    assert(top.nonEmpty && top.head._1 === "whale")
    val (_, est, lb, ub) = top.head
    assert(lb <= 5000L && 5000L <= ub && est >= lb && est <= ub)
  }

  test("skyline: hand frontier, tied duplicates survive, equals naive") {
    import graft.operators.Skyline
    val pts = Seq((1L, 1, 10.0), (2L, 2, 5.0), (3L, 3, 7.0),
      (4L, 3, 5.0), (5L, 0, 1.0), (6L, 3, 5.0)).toDF("id", "a", "b")
    val sky = Skyline.skyline(pts, Seq("a" -> true, "b" -> false))
      .select("id").collect().map(_.getLong(0)).toSet
    // (3,5) dominates (2,5),(3,7),(1,10); (0,1) incomparable; the
    // duplicate (3,5) rows both survive — neither strictly dominates
    assert(sky === Set(4L, 5L, 6L))
    // equivalence with the naive quadratic form on pseudo-random data
    val rnd = (1 to 500).map(i =>
      (i.toLong, ((i * 2654435761L) % 97).toInt,
        ((i * 40503L) % 89).toDouble)).toDF("id", "a", "b")
    val fast = Skyline.skyline(rnd, Seq("a" -> true, "b" -> false))
      .select("id").collect().map(_.getLong(0)).toSet
    val naive = rnd.as("x").join(rnd.as("y"),
        col("y.a") >= col("x.a") && col("y.b") <= col("x.b") &&
          (col("y.a") > col("x.a") || col("y.b") < col("x.b")),
        "left_anti")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(fast === naive)
  }

  test("sequenceNeighbors: identical journey ranks first at distance 0") {
    val base = Seq("a", "b", "c", "a")
    def journey(u: Long, types: Seq[String], startId: Long) =
      types.zipWithIndex.map { case (t, i) =>
        (u, startId + i, ts(f"2024-01-01 00:0${i}%01d:00"), t + "x")
      }
    val ev = (journey(1L, base ++ Seq("d", "e"), 100) ++ // probe: busiest
      journey(2L, base ++ Seq("d", "e"), 200) ++          // twin, dist 0
      journey(3L, base, 300) ++                           // prefix, dist 2
      journey(4L, Seq("z", "z", "z"), 400))               // far
      .toDF("user_id", "event_id", "t", "et")
    val r = graft.operators.FuzzyJoin.sequenceNeighbors(
      ev, "user_id", "t", "et", "event_id", k = 3).collect()
    assert(r.map(_.getLong(0)).toSeq === Seq(2L, 3L, 4L))
    assert(r(0).getInt(2) === 0 && r(1).getInt(2) === 2)
  }

  test("jaccardJoinPrefix: identical results to the brute-force join, " +
    "prefix postings beat full postings") {
    import graft.dedup.Dedup
    val docs = (1 to 120).map { i =>
      val base = Seq("alpha", "beta", "gamma", "delta", "eps")
      val extra = Seq(s"u$i", s"v${i % 7}", s"w${i % 11}")
      (i.toLong, (base.take(2 + i % 4) ++ extra).mkString(" "))
    }.toDF("doc_id", "text")
    val t = 0.5
    def pairs(d: org.apache.spark.sql.DataFrame) = d.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val fast = pairs(Dedup.jaccardJoinPrefix(docs, "doc_id", "text", t))
    val brute = pairs(Dedup.jaccardPairs(docs, "doc_id", "text", t))
    assert(fast === brute) // exactness of the prefix filter
    assert(fast.nonEmpty)
  }

  test("imputeFeatures: inf demoted, median fill excludes bad cells, " +
    "tags name the repair") {
    import graft.transforms.Impute
    val df = Seq(
      (1L, Some(10.0), Some(1.0)),
      (2L, None, Some(2.0)),                      // nan in x
      (3L, Some(Double.PositiveInfinity), None),  // inf in x, nan in y
      (4L, Some(30.0), Some(4.0)),
      (5L, Some(20.0), Some(5.0))
    ).toDF("id", "x", "y")
    val r = Impute.imputeFeatures(df, Seq("x", "y"), "median").collect()
      .map(row => row.getLong(0) -> row).toMap
    // clean x = {10, 30, 20} → median 20; clean y = {1,2,4,5} → 3
    assert(r(2L).getDouble(1) === 20.0 && r(2L).getString(3) === "nan")
    assert(r(3L).getDouble(1) === 20.0 && r(3L).getDouble(2) === 3.0)
    assert(r(3L).getString(3) === "inf,nan") // both repairs named once
    assert(r(1L).getString(3) === "" && r(1L).getDouble(1) === 10.0)
    // zero strategy on an all-bad column never leaves NaN behind
    val allBad = Seq((1L, Option.empty[Double])).toDF("id", "x")
    val z = Impute.imputeFeatures(allBad, Seq("x"), "median").head()
    assert(z.getDouble(1) === 0.0)
  }

  test("purgedRollingFolds: embargo carves rows out of train, not valid") {
    val ev = (0 until 100).map(i =>
      (i.toLong, new java.sql.Timestamp(1700000000000L + i * 3600000L)))
      .toDF("id", "ts")
    val plain = graft.ml.Stats.rollingOriginFolds(ev, "ts", 4)
      .orderBy("fold").collect()
    val purged = graft.ml.Stats.purgedRollingFolds(ev, "ts", 4,
      embargoUs = 5L * 3600L * 1000000L) // 5 hours = 5 rows
      .orderBy("fold").collect()
    purged.zip(plain).foreach { case (p, pl) =>
      assert(p.getLong(3) + p.getLong(4) === pl.getLong(3)) // train+embargo
      assert(p.getLong(5) === pl.getLong(4))                // valid unchanged
      assert(p.getLong(4) === 5L)
    }
  }
}
