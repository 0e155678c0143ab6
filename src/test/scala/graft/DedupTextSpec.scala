package graft

import graft.core.Tables
import graft.dedup.Dedup
import graft.text.Text
import org.apache.spark.sql.functions._

class DedupTextSpec extends SparkSpec {
  import spark.implicits._

  test("exact dedup collapses identical normalized texts") {
    val df = Seq((1L, "a b  c"), (2L, "A B C"), (3L, "different doc")).toDF("id", "text")
    val groups = Dedup.exactGroups(df, "id", "text").collect()
    assert(groups.length == 2)
    val big = groups.find(_.getLong(2) == 2).get
    assert(big.getLong(1) == 1L) // keeper = lowest id
    assert(Dedup.exactDedup(df, "id", "text").count() == 2)
  }

  test("minhashLsh finds a near-duplicate pair and reports true jaccard") {
    val base = (1 to 40).map(i => s"w$i").mkString(" ")
    val nearDup = (1 to 38).map(i => s"w$i").mkString(" ") + " x y"
    val other = (100 to 140).map(i => s"v$i").mkString(" ")
    val df = Seq((1L, base), (2L, nearDup), (3L, other)).toDF("id", "text")
    val pairs = Dedup.minhashLsh(df, "id", "text", threshold = 0.3).collect()
    assert(pairs.exists(r => r.getLong(0) == 1L && r.getLong(1) == 2L))
    assert(pairs.forall(r => r.getDouble(2) >= 0.3 && r.getDouble(2) <= 1.0))
    assert(!pairs.exists(r => r.getLong(1) == 3L))
  }

  test("simhash: identical text same signature; near-dup small hamming") {
    val df = Seq((1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"),
      (3L, "completely unrelated words about spark catalyst execution model")).toDF("id", "text")
    val sigs = df.select(col("id"), Dedup.simhash(col("text")).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sigs(1L) == sigs(2L))
    val pairs = Dedup.simhashPairs(df, "id", "text", maxHamming = 0).collect()
    assert(pairs.exists(r => r.getLong(0) == 1L && r.getLong(1) == 2L))
  }

  test("jaccardPairs on testdata is symmetric-free and thresholded") {
    val docs = Tables.load(spark, sf, "documents").filter(col("doc_id") < 50)
    val pairs = Dedup.jaccardPairs(docs, "doc_id", "text", 0.6).collect()
    assert(pairs.forall(r => r.getLong(0) < r.getLong(1)))
    assert(pairs.forall(r => r.getDouble(2) >= 0.6))
  }

  test("text functions: tokens, counts, fingerprint stability, shingles") {
    val df = Seq(Tuple1("  Héllo   world!  ")).toDF("text")
    val r = df.select(
      Text.wordCount(col("text")).as("w"),
      Text.tokenCount(col("text")).as("t"),
      Text.fingerprint(col("text")).as("f"),
      Text.shingles(col("text"), 2).as("sh")).head()
    assert(r.getInt(0) == 2)
    assert(r.getInt(1) >= 3) // héllo + world + !
    assert(r.getString(2).length == 32)
    assert(r.getSeq[String](3) == Seq("héllo world!"))
  }

  test("langId picks the language with most stopword hits; und when none") {
    val df = Seq((1, "the cat sat of the mat and it is that"),
      (2, "le chat est dans la maison et il est pour"),
      (3, "zzz qqq www")).toDF("id", "text")
    val out = df.select(col("id"), Text.langId(col("text")).as("l"))
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(out(1) == "en"); assert(out(2) == "fr"); assert(out(3) == "und")
  }

  test("cosine near-dup: brute pairs, LSH recall on planted duplicates, dedup") {
    import graft.dedup.Dedup
    val rnd = new scala.util.Random(23)
    // 100 random 8-d vectors + 10 planted near-duplicates (tiny noise)
    val base = (0 until 100).map(i =>
      (i.toLong, Seq.fill(8)(rnd.nextGaussian())))
    val dups = (0 until 10).map(i =>
      (1000L + i, base(i)._2.map(_ + rnd.nextGaussian() * 0.01)))
    val df = (base ++ dups).toDF("id", "vec")
      .withColumn("vec", col("vec").cast("array<double>"))
    val brute = Dedup.cosinePairs(df, "id", "vec", 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(brute.size >= 10, s"planted dups must surface: $brute")
    assert((0 until 10).forall(i => brute.contains((i.toLong, 1000L + i))))
    // LSH path finds every planted duplicate (near-identical vectors
    // land in the same buckets in at least one table)
    val lsh = Dedup.cosinePairsLsh(df, "id", "vec", 0.99, dim = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert((0 until 10).forall(i => lsh.contains((i.toLong, 1000L + i))),
      s"LSH missed planted dups: ${lsh.size} of ${brute.size}")
    assert(lsh.subsetOf(brute), "LSH must not invent pairs")
    // end-to-end dedup keeps the canonical (min-id) row per cluster
    val survivors = Dedup.cosineNearDup(df, "id", "vec", 0.99)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(survivors.size == 100)
    assert((0 until 10).forall(i => survivors.contains(i.toLong) &&
      !survivors.contains(1000L + i)))
  }

  test("cosineNearDup default is scale-safe: LSH route above bruteMaxRows, no cartesian") {
    import graft.dedup.Dedup
    val rnd = new scala.util.Random(31)
    val base = (0 until 100).map(i => (i.toLong, Seq.fill(8)(rnd.nextGaussian())))
    val dups = (0 until 10).map(i =>
      (1000L + i, base(i)._2.map(_ + rnd.nextGaussian() * 0.001)))
    val df = (base ++ dups).toDF("id", "vec")
      .withColumn("vec", col("vec").cast("array<double>"))
    // capture EVERY executed plan during the call — the LSH pair stage
    // localCheckpoints eagerly, so the returned frame's own plan no
    // longer shows how the pairs were generated
    val plans = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, durationNs: Long): Unit =
        plans.add(qe.executedPlan.toString)
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, e: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      // 110 rows > bruteMaxRows=50 → default must route to LSH (dim inferred)
      val survivors = Dedup.cosineNearDup(df, "id", "vec", 0.99, bruteMaxRows = 50)
        .select("id").collect().map(_.getLong(0)).toSet
      assert(survivors.size == 100)
      assert((0 until 10).forall(i => survivors.contains(i.toLong)))
      val deadline = System.currentTimeMillis() + 10000
      while (plans.isEmpty && System.currentTimeMillis() < deadline) Thread.sleep(50)
      Thread.sleep(500) // let straggler listener events drain
      val seen = plans.toArray(Array.empty[String]).toSeq
      assert(seen.nonEmpty, "no executed plans observed")
      val bad = seen.filter(p =>
        p.contains("CartesianProduct") || p.contains("BroadcastNestedLoopJoin"))
      assert(bad.isEmpty,
        s"default cosineNearDup ran a quadratic join:\n${bad.mkString("\n---\n")}")
    } finally spark.listenerManager.unregister(listener)
  }

  test("exact-substring pairs: planted 200-token run found with exact count + spans") {
    import graft.dedup.Substrings
    // unique vocab per region so the ONLY overlap is the planted run
    val shared = (0 until 200).map(i => s"sh$i").mkString(" ")
    val doc1 = ((0 until 50).map(i => s"a$i") :+ shared) ++
      (0 until 50).map(i => s"z$i")
    val doc2 = ((0 until 10).map(i => s"b$i") :+ shared) ++
      (0 until 20).map(i => s"y$i")
    val doc3 = (0 until 300).map(i => s"c$i")
    val df = Seq((1L, doc1.mkString(" ")), (2L, doc2.mkString(" ")),
      (3L, doc3.mkString(" "))).toDF("doc_id", "text")
    val rows = Substrings.exactSubstringPairs(df, "doc_id", "text",
      minTokens = 20).collect()
    assert(rows.length == 1, s"exactly the planted pair: ${rows.toSeq}")
    val r = rows.head
    assert((r.getLong(0), r.getLong(1)) == (1L, 2L))
    // a 200-token run has 200-20+1 = 181 aligned distinct 20-grams
    assert(r.getLong(r.fieldIndex("n_shared")) == 181L)
    assert(r.getLong(r.fieldIndex("a_start")) == 50L &&
      r.getLong(r.fieldIndex("a_end")) == 249L, s"span a: $r")
    assert(r.getLong(r.fieldIndex("b_start")) == 10L &&
      r.getLong(r.fieldIndex("b_end")) == 209L, s"span b: $r")
    // below the guarantee threshold nothing surfaces: a 19-token run
    // cannot produce a full 20-gram anchor
    val short = Seq((1L, (0 until 19).map(i => s"sh$i").mkString(" ") + " tailA"),
      (2L, (0 until 19).map(i => s"sh$i").mkString(" ") + " tailB"))
      .toDF("doc_id", "text")
    assert(Substrings.exactSubstringPairs(short, "doc_id", "text",
      minTokens = 20).count() == 0)
    // dedup keeps the canonical min-id doc per overlap cluster
    val kept = Substrings.exactSubstringDedup(df, "doc_id", "text",
      minTokens = 20).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 3L))
    // boilerplate guard: a gram in EVERY doc is dropped when maxDocFreq
    // is below the corpus size, so no pairs emerge from boilerplate alone
    val boiler = (1L to 5L).map(i => (i, shared)).toDF("doc_id", "text")
    assert(Substrings.exactSubstringPairs(boiler, "doc_id", "text",
      minTokens = 20, maxDocFreq = 4).count() == 0)
  }

  test("removeSharedSpans: later docs lose the covered tokens, canonical doc intact") {
    import graft.dedup.Substrings
    val shared = (0 until 40).map(i => s"sh$i").mkString(" ")
    val d1 = (0 until 30).map(i => s"a$i").mkString(" ") + " " + shared
    val d2 = (0 until 10).map(i => s"b$i").mkString(" ") + " " + shared +
      " " + (0 until 5).map(i => s"y$i").mkString(" ")
    val d3 = (0 until 50).map(i => s"c$i").mkString(" ")
    val df = Seq((1L, d1), (2L, d2), (3L, d3)).toDF("doc_id", "text")
    val out = Substrings.removeSharedSpans(df, "doc_id", "text", minTokens = 20)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    // doc 1 is canonical (lowest id sharing the anchors): untouched
    assert(out(1L) == (d1, 0L), s"canonical doc changed: ${out(1L)}")
    // doc 2 loses exactly the 40 shared tokens; prefix+suffix survive
    val expected2 = (0 until 10).map(i => s"b$i").mkString(" ") + " " +
      (0 until 5).map(i => s"y$i").mkString(" ")
    assert(out(2L) == (expected2, 40L), s"span not cut: ${out(2L)}")
    // doc 3 shares nothing: untouched
    assert(out(3L) == (d3, 0L))
    // fully-shared doc edge: doc 5 IS the shared run — cut to empty
    val full = Seq((4L, shared), (5L, shared)).toDF("doc_id", "text")
    val fo = Substrings.removeSharedSpans(full, "doc_id", "text", minTokens = 20)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(fo(4L) == (shared, 0L) && fo(5L) == ("", 40L), s"$fo")
  }

  test("quality classifier: separates classes, pareto keep is deterministic and monotone") {
    import graft.text.QualityModel
    // two separable vocabularies; train on half, score all
    val pos = (0 until 40).map(i =>
      (i.toLong, "alpha beta gamma delta " + s"p$i q$i", 1))
    val neg = (0 until 40).map(i =>
      (100L + i, "zork quux blarg wibble " + s"n$i m$i", 0))
    val df = (pos ++ neg).toDF("doc_id", "text", "label")
    val model = QualityModel.train(df.filter($"doc_id" % 2 === 0),
      "text", "label", numFeatures = 1 << 12)
    val scored = QualityModel.score(model, df, "text")
    val probs = scored.collect()
      .map(r => r.getLong(r.fieldIndex("doc_id")) ->
        r.getDouble(r.fieldIndex("quality_prob"))).toMap
    val posAvg = pos.map(p => probs(p._1)).sum / pos.size
    val negAvg = neg.map(n => probs(n._1)).sum / neg.size
    assert(posAvg > 0.8 && negAvg < 0.2,
      s"classifier failed to separate: pos=$posAvg neg=$negAvg")
    // schema: input columns + quality_prob, working columns dropped
    assert(scored.columns.toSeq == Seq("doc_id", "text", "label", "quality_prob"))
    // pareto keep: deterministic (two runs identical), and the high class
    // survives at a far higher rate than the low class
    val k1 = QualityModel.paretoKeep(scored, "doc_id").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val k2 = QualityModel.paretoKeep(scored, "doc_id").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(k1 == k2, "pareto keep must be deterministic")
    val posKept = pos.count(p => k1.contains(p._1))
    val negKept = neg.count(n => k1.contains(n._1))
    assert(posKept > 20 && negKept < 10,
      s"keep rates wrong: pos $posKept/40, neg $negKept/40")
  }

  test("vocabulary: term totals and document frequency with minCount pruning") {
    import spark.implicits._
    val docs = Seq((1L, "the cat the hat"), (2L, "the dog"), (3L, "a dog"))
      .toDF("doc_id", "text")
    val v = graft.text.Text.vocabulary(docs, "doc_id", "text")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(v("the") == (3L, 2L)) // 3 occurrences across 2 docs
    assert(v("dog") == (2L, 2L))
    assert(v("cat") == (1L, 1L))
    // minCount prunes the tail BEFORE the caller sees it
    val pruned = graft.text.Text.vocabulary(docs, "doc_id", "text", minCount = 2L)
    assert(pruned.select("term").collect().map(_.getString(0)).toSet ==
      Set("the", "dog"))
  }
}
