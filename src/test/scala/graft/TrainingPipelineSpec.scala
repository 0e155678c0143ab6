package graft

import graft.text.{Contamination, LineDedup, Mixing, Packing, Scrub, Text}
import org.apache.spark.sql.functions._

/** The round-4 training-data-pipeline additions: PII scrub, repetition
  * signals, line-level dedup, packing manifest, domain mixing,
  * benchmark contamination. */
class TrainingPipelineSpec extends SparkSpec {
  import spark.implicits._

  test("piiSignals counts and redact scrubs emails/phones/ips in order") {
    val df = Seq(
      (1L, "write bob@example.com or call 555-123-4567 from 10.0.0.1"),
      (2L, "dotted phone 555.123.4567 is a phone not an ip"),
      (3L, "clean text with numbers 1.2 and 3.4 only"))
      .toDF("id", "text")
    val sig = Scrub.piiSignals(df, "text").orderBy("id")
      .select("n_emails", "n_phones", "n_ipv4", "has_pii")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getBoolean(3)))
    assert(sig.toSeq == Seq((1, 1, 1, true), (0, 1, 0, true), (0, 0, 0, false)))
    val red = Scrub.redactPii(df, "text").orderBy("id").select("text")
      .as[String].collect()
    assert(red(0) == "write <EMAIL> or call <PHONE> from <IP>")
    assert(red(1) == "dotted phone <PHONE> is a phone not an ip")
    assert(red(2) == "clean text with numbers 1.2 and 3.4 only")
    // redaction collapses contact-string variants to one fingerprint
    val fps = Scrub.redactPii(
        Seq("hi x@a.com bye", "hi y@b.org bye").toDF("text"), "text")
      .select(Text.fingerprint($"text")).distinct().count()
    assert(fps == 1)
  }

  test("normalizeText strips controls, maps typographic unicode, squeezes spaces") {
    val dirty = "\u201Ccurly\u201D \u2018quotes\u2019 \u2013 dash\u2014here" +
      "\u2026\u00A0nb \u0007bell \u200Bzw   wide\t\tgap\nline2  keep"
    val out = Seq(dirty).toDF("t")
      .select(Scrub.normalizeText($"t")).as[String].head()
    assert(out == "\"curly\" 'quotes' - dash-here... nb bell zw wide gap\nline2 keep", out)
    // idempotent: normalizing twice is a no-op
    val twice = Seq(out).toDF("t")
      .select(Scrub.normalizeText($"t")).as[String].head()
    assert(twice == out)
  }

  test("repetitionSignals: dup-line and top-ngram fractions") {
    val lines = Seq((Seq("a", "b", "a", "a"), 1)).toDF("l", "id")
    assert(lines.select(Text.dupLineFraction($"l")).as[Double].head() == 0.5)
    val df = Seq(
      (1L, "spam spam spam spam spam spam"),   // one 2-gram repeated 5x
      (2L, "all words here are fully distinct"))
      .toDF("id", "text")
    val rep = Text.repetitionSignals(df, "text").orderBy("id")
      .select("top_2gram_frac", "top_3gram_frac")
      .collect().map(r => (r.getDouble(0), r.getDouble(1)))
    assert(rep(0) == ((1.0, 1.0)), rep(0).toString)
    assert(rep(1) == ((0.2, 0.25)), rep(1).toString) // 5 distinct 2-grams, 4 3-grams
    // charChunks: ragged tail, empty text -> one empty chunk
    assert(Seq("abcdefgh").toDF("t")
      .select(Text.charChunks($"t", 3)).as[Seq[String]].head()
      == Seq("abc", "def", "gh"))
    assert(Seq("").toDF("t")
      .select(Text.charChunks($"t", 3)).as[Seq[String]].head() == Seq(""))
    // review: a doc too short to HAVE an n-gram is not "maximally
    // repetitive" — 0.0, so threshold gates don't drop every short doc
    val short = Text.repetitionSignals(Seq((9L, "solo")).toDF("id", "text"), "text")
      .select("top_2gram_frac", "top_3gram_frac").head()
    assert(short.getDouble(0) == 0.0 && short.getDouble(1) == 0.0, short.toString)
  }

  test("dedupLines drops corpus-frequent lines, keeps order, drops emptied docs") {
    val docs = Seq(
      (1L, Seq("COOKIE BANNER", "real content one", "COOKIE BANNER")),
      (2L, Seq("COOKIE BANNER", "real content two")),
      (3L, Seq("COOKIE BANNER")),
      (4L, Seq("untouched doc")))
      .toDF("id", "lines")
    val out = LineDedup.dedupLines(docs, "id", "lines", maxFreq = 2)
      .orderBy("id").as[(Long, String)].collect().toSeq
    // banner occurs 4x > 2 -> stripped everywhere; doc 3 vanishes
    assert(out == Seq((1L, "real content one"), (2L, "real content two"),
      (4L, "untouched doc")))
    val freq = LineDedup.lineFrequencies(docs, "id", "lines")
      .filter($"__line" === "COOKIE BANNER").select("__freq")
      .as[Long].collect()
    assert(freq.length == 4 && freq.forall(_ == 4L))
  }

  test("packingManifest: exact global offsets via bucketed prefix sum") {
    val docs = (0L until 1000L).map(i => (i, ("tok " * ((i % 7).toInt + 1)).trim))
      .toDF("id", "text")
    val m = Packing.packingManifest(docs, "id", "text", maxLen = 16, buckets = 8)
      .orderBy("id").collect()
    // oracle: sequential scan
    var off = 0L
    m.foreach { r =>
      val (id, n, o, s, e) = (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))
      assert(n == id % 7 + 1, s"tokens of $id")
      assert(o == off, s"offset of $id: got $o want $off")
      assert(s == o / 16 && e == (o + n - 1) / 16, s"chunks of $id")
      off += n
    }
    val sum = Packing.packingSummary(
      Packing.packingManifest(docs, "id", "text", 16, 8), 16).head()
    assert(sum.getLong(0) == off)
    assert(sum.getLong(1) == (off + 15) / 16)
  }

  test("temperatureSample is deterministic and hits target within tolerance") {
    val docs = (0L until 3000L)
      .map(i => (i, if (i % 10 < 7) "big" else if (i % 10 < 9) "mid" else "small"))
      .toDF("id", "source")
    val fr = Mixing.temperatureFractions(docs, "source", temperature = 0.5,
      targetRows = 1000).orderBy("source").collect()
    // T=0.5 flattens: weight(big)/weight(small) = sqrt(2100/300) ≈ 2.65
    val w = fr.map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(math.abs(w("big") / w("small") - math.sqrt(2100.0 / 300.0)) < 1e-3)
    val s1 = Mixing.temperatureSample(docs, "id", "source", 0.5, 1000)
    val s2 = Mixing.temperatureSample(docs, "id", "source", 0.5, 1000)
    val ids1 = s1.select("id").as[Long].collect().toSet
    assert(ids1 == s2.select("id").as[Long].collect().toSet, "deterministic")
    assert(math.abs(ids1.size - 1000) < 150, s"target: got ${ids1.size}")
    assert(s1.columns.toSeq == docs.columns.toSeq, "schema preserved")
    // frac >= 1 keeps everything
    assert(Mixing.temperatureSample(docs, "id", "source", 0.5, 100000).count() == 3000)
  }

  test("temperatureSample picks are monotone in targetRows (incremental rebuilds)") {
    // the md5 draw is a fixed per-row uniform: raising any source's
    // fraction can only ADD picks — the property that lets a pipeline
    // grow its sample without resampling what it already shipped
    val docs = (0L until 2000L).map(i => (i, s"s${i % 3}")).toDF("id", "source")
    val small = Mixing.temperatureSample(docs, "id", "source", 1.0, 400)
      .select("id").as[Long].collect().toSet
    val big = Mixing.temperatureSample(docs, "id", "source", 1.0, 1200)
      .select("id").as[Long].collect().toSet
    assert(small.nonEmpty && small.subsetOf(big),
      s"${(small -- big).size} picks lost when target grew")
  }

  test("packingManifest: offsets are contiguous and chunk ids monotone") {
    val docs = (0L until 500L).map(i => (i * 3 + 7, ("w " * ((i % 11).toInt + 1)).trim))
      .toDF("id", "text") // sparse, shifted ids — bucket bounds not dense
    val rows = Packing.packingManifest(docs, "id", "text", 32, buckets = 16)
      .orderBy("id").collect()
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getLong(2) + a.getLong(1) == b.getLong(2),
        s"gap between ${a.getLong(0)} and ${b.getLong(0)}")
      assert(b.getLong(3) >= a.getLong(3), "start_chunk must be monotone")
    }
  }

  test("groupCentroids averages per dimension; centroidDrift orders pairs") {
    val vecs = Seq(
      ("a", Seq(1.0f, 0.0f)), ("a", Seq(3.0f, 0.0f)),
      ("b", Seq(0.0f, 2.0f)), ("c", Seq(4.0f, 0.0f)),
      ("c", null.asInstanceOf[Seq[Float]]))
      .toDF("g", "vec")
    val cent = graft.proximity.Embeddings.groupCentroids(vecs, "g", "vec")
      .orderBy("g").collect()
    assert(cent.map(_.getLong(1)).toSeq == Seq(2L, 1L, 1L), "null vec skipped")
    assert(cent(0).getSeq[Double](2) == Seq(2.0, 0.0))
    val drift = graft.proximity.Embeddings.centroidDrift(vecs, "g", "vec")
      .orderBy("group_a", "group_b")
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
    assert(drift.toSeq == Seq(("a", "b", 0.0), ("a", "c", 1.0), ("b", "c", 0.0)))
  }

  test("groupSpread: trace variance flags collapsed groups, norms flag zero fills") {
    val vecs = Seq(
      ("ok", Seq(1.0f, 0.0f)), ("ok", Seq(0.0f, 1.0f)),
      ("collapsed", Seq(0.5f, 0.5f)), ("collapsed", Seq(0.5f, 0.5f)))
      .toDF("g", "vec")
    val r = graft.proximity.Embeddings.groupSpread(vecs, "g", "vec")
      .orderBy("g").collect()
    // collapsed: zero variance, norm² = 0.5; ok: var .25+.25, norm² = 1
    assert(r(0).getString(0) == "collapsed" && r(0).getDouble(2) == 0.0)
    assert(r(0).getDouble(3) == 0.5)
    assert(r(1).getDouble(2) == 0.5 && r(1).getDouble(3) == 1.0)
  }

  test("null text does not poison pii counts, packing offsets, or repetition") {
    val docs = Seq((1L, "real text here with words"), (2L, null), (3L, "tail doc"))
      .toDF("id", "text")
    val pii = Scrub.piiSignals(docs, "text").orderBy("id")
      .select("n_emails", "has_pii").collect()
    assert(pii(1).getInt(0) == 0 && !pii(1).getBoolean(1), "null row: no PII")
    val pack = Packing.packingManifest(docs, "id", "text", 4)
      .orderBy("id").select("n_tokens", "token_offset").collect()
    assert(pack(1).getLong(0) == 0L, "null row: 0 tokens")
    assert(pack(2).getLong(1) == 5L, "doc after null keeps exact offset")
    val rep = Text.repetitionSignals(docs, "text").filter($"id" === 2)
      .select("dup_line_frac").collect()
    assert(rep.length == 1, "null row must survive the repetition scan")
  }

  test("chunkDocuments: overlapping windows, ragged tail, short-doc single chunk") {
    val docs = Seq(
      (1L, "t1 t2 t3 t4 t5 t6 t7"),   // 7 tokens, size 4 stride 2 → 3 chunks
      (2L, "a b"))                    // shorter than size → one whole chunk
      .toDF("id", "text")
    val out = Text.chunkDocuments(docs, "id", "text", size = 4, stride = 2)
      .orderBy("id", "chunk_id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getInt(3)))
    assert(out.toSeq == Seq(
      (1L, 0, "t1 t2 t3 t4", 4), (1L, 1, "t3 t4 t5 t6", 4), (1L, 2, "t5 t6 t7", 3),
      (2L, 0, "a b", 2)), out.mkString("; "))
    intercept[IllegalArgumentException] {
      Text.slidingWindows(col("x"), 4, 0)
    }
  }

  test("unigramLm + lmScore: exact log-probs, OOV floor, minCount prune") {
    val ref = Seq((1L, "a a b"), (2L, "a b c")).toDF("id", "text")
    val lm = Text.unigramLm(ref, "id", "text") // tf: a=3, b=2, c=1; total 6
    val lmMap = lm.collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(math.abs(lmMap("a") - math.log(3.0 / 6)) < 1e-12)
    assert(math.abs(lmMap("c") - math.log(1.0 / 6)) < 1e-12)
    // minCount prunes c AND shrinks the total to surviving mass
    val pruned = Text.unigramLm(ref, "id", "text", minCount = 2)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(pruned.keySet == Set("a", "b"))
    assert(math.abs(pruned("a") - math.log(3.0 / 5)) < 1e-12)
    val scored = Text.lmScore(Seq((10L, "a b zzz")).toDF("id", "text"),
      "id", "text", lm, oovLogp = -20.0).head()
    val want = (math.log(3.0 / 6) + math.log(2.0 / 6) - 20.0) / 3
    assert(scored.getLong(1) == 3L)
    assert(math.abs(scored.getDouble(2) - want) < 1e-4)
  }

  test("corpusReport: per-source docs/tokens/lang/dup/pii in one aggregate") {
    val docs = Seq(
      (1L, "srcA", "the quick brown fox is a fine animal for it runs"),
      (2L, "srcA", "the quick brown fox is a fine animal for it runs"), // dup
      (3L, "srcA", "mail me at a@b.co for the offer and the rest now"),
      (4L, "srcB", "le chat est dans la maison pour le diner et la nuit"),
      (5L, "srcB", null))
      .toDF("id", "source", "text")
    val r = graft.text.CorpusReport.report(docs, "text", "source")
      .orderBy("source").collect()
    val a = r(0) // srcA: 3 docs, 33 tokens, 0 null, 3 en, 1 dup, 1 pii
    assert((a.getLong(1), a.getLong(2), a.getLong(3), a.getLong(4),
      a.getLong(5), a.getLong(6)) == ((3L, 33L, 0L, 3L, 1L, 1L)), a.toString)
    assert(a.getDouble(7) == 11.0)
    val b = r(1) // srcB: 2 docs, 12 tokens, 1 null, 0 en, 0 dup, 0 pii
    assert((b.getLong(1), b.getLong(2), b.getLong(3), b.getLong(4),
      b.getLong(5), b.getLong(6)) == ((2L, 12L, 1L, 0L, 0L, 0L)), b.toString)
    assert(b.getDouble(7) == 6.0)
  }

  test("review: shared shingle in many bench docs counts once; hit_frac <= 1") {
    val bench = Seq((100L, "alpha beta gamma delta"), (101L, "alpha beta gamma other"))
      .toDF("bid", "btext") // both contain "alpha beta gamma"
    val corpus = Seq((1L, "alpha beta gamma end")).toDF("id", "text")
    val hits = graft.text.Contamination.contaminated(
      corpus, "id", "text", bench, "bid", "btext", n = 3).head()
    // doc 1 has 2 distinct shingles, shares exactly 1 (in BOTH bench docs)
    assert(hits.getLong(1) == 1L, s"n_hit_shingles ${hits.getLong(1)}")
    assert(hits.getLong(2) == 2L, "both bench docs hit")
    assert(hits.getDouble(4) == 0.5, s"hit_frac ${hits.getDouble(4)}")
  }

  test("review: null-source stratum is sampled, not silently dropped") {
    val docs = (0L until 1000L)
      .map(i => (i, if (i % 2 == 0) "a" else null)).toDF("id", "source")
    val out = Mixing.temperatureSample(docs, "id", "source", 1.0, 500)
    val bySrc = out.groupBy("source").count().collect()
      .map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    assert(bySrc.contains(None) && bySrc(None) > 150,
      s"null stratum missing or starved: $bySrc")
    assert(math.abs(out.count() - 500) < 100, s"total ${out.count()}")
  }

  test("review: packingManifest fails fast on ids that cast to null") {
    val docs = Seq(("not-a-number", "some text")).toDF("id", "text")
    val e = intercept[Exception] {
      Packing.packingManifest(docs, "id", "text", 16).collect()
    }
    assert(e.getMessage.contains("castable to long") ||
      Option(e.getCause).exists(_.getMessage.contains("castable to long")),
      e.toString)
    intercept[IllegalArgumentException] { Text.charChunks(col("x"), 0) }
  }

  test("sampleWithReplacement upsamples scarce sources deterministically") {
    // 1000 "big" + 50 "rare" docs, T=0.3 flattens hard; target 800 →
    // rare's unclamped fraction lands well above 1 → upsampling
    val docs = (0L until 1050L)
      .map(i => (i, if (i < 1000) "big" else "rare")).toDF("id", "source")
    val fr = Mixing.temperatureFractionsUnclamped(docs, "source", 0.3, 800)
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(fr("rare") > 1.0, fr.toString)
    val out = Mixing.temperatureSampleWithReplacement(
      docs, "id", "source", 0.3, 800)
    assert(out.columns.last == "__epoch")
    val rare = out.filter($"source" === "rare")
    val perDoc = rare.groupBy("id").count().select("count").as[Long].collect()
    // every rare doc appears floor(f) or floor(f)+1 times
    val f = fr("rare")
    assert(perDoc.forall(c => c == f.toLong || c == f.toLong + 1), perDoc.toSet.toString)
    // total tracks n*f
    assert(math.abs(rare.count() - 50 * f) <= 15, s"${rare.count()} vs ${50 * f}")
    // deterministic
    assert(out.count() == Mixing.temperatureSampleWithReplacement(
      docs, "id", "source", 0.3, 800).count())
    // sub-1 sources: EXACTLY the plain sampler's picks (epoch-0 draw is
    // unsalted), so crossing the f=1 boundary never churns shipped rows
    val bigIds = out.filter($"source" === "big").select("id").as[Long].collect().toSet
    val plainBig = Mixing.temperatureSample(docs, "id", "source", 0.3, 800)
      .filter($"source" === "big").select("id").as[Long].collect().toSet
    assert(bigIds == plainBig, "with-replacement sub-1 draw must match plain sampler")
    assert(out.filter($"source" === "big" && $"__epoch" > 0).count() == 0)
  }

  test("BPE: learned merges match hand-computed ranks; encode is greedy by rank") {
    import graft.text.Bpe
    val docs = Seq.fill(5)("ab").map(Tuple1(_)).toDF("text")
      .union(Seq.fill(3)("abc").map(Tuple1(_)).toDF("text"))
    // pair counts: (a,b)=8 > (b,</w>)=5 > (b,c)=3 = (c,</w>)=3
    val merges = Bpe.trainMerges(docs, "text", numMerges = 3)
    assert(merges == Seq(("a", "b"), ("ab", "</w>"), ("ab", "c")), merges.toString)
    val enc2 = Seq(("abc", 1)).toDF("text", "i")
      .select(Bpe.encode($"text", merges.take(2))).as[Seq[String]].head()
    assert(enc2 == Seq("ab", "c", "</w>"), enc2.toString)
    val enc3 = Seq(("abc ab", 1)).toDF("text", "i")
      .select(Bpe.encode($"text", merges)).as[Seq[String]].head()
    assert(enc3 == Seq("abc", "</w>", "ab</w>"), enc3.toString)
    val tc = Seq(("xyz abc", 1)).toDF("text", "i")
      .select(Bpe.tokenCount($"text", merges.take(2))).as[Int].head()
    assert(tc == 7, s"x y z </w> + ab c </w> = 7, got $tc")
    // exhausted pairs stop early instead of looping
    assert(Bpe.trainMerges(Seq(Tuple1("a")).toDF("text"), "text", 10)
      .size <= 2)
  }

  test("writeShards: balanced deterministic shards, per-file row cap") {
    val out = java.nio.file.Files.createTempDirectory("graft-shards").toString + "/c"
    val docs = spark.range(5000).selectExpr("id", "concat('doc ', id) AS text")
    val shards = graft.sources.CorpusWriter.writeShards(docs, out, 500, "id")
    assert(shards == 10)
    val perFile = spark.read.parquet(out)
      .groupBy(input_file_name()).count().select("count").as[Long].collect()
    assert(perFile.sum == 5000)
    assert(perFile.forall(_ <= 500), s"file over cap: ${perFile.max}")
    // near-uniform: overfull shards split into (full + remainder) files,
    // so the FULL files carry the corpus — no shard-sized hotspot
    assert(perFile.length <= 2 * shards, s"${perFile.length} files")
    assert(perFile.count(_ >= 400) >= 9, perFile.sorted.mkString(","))
  }

  test("contamination finds shingle overlap and decontaminate drops hits") {
    val bench = Seq((100L, "the quick brown fox jumps over the lazy dog"))
      .toDF("bid", "btext")
    val corpus = Seq(
      (1L, "prefix words then the quick brown fox appears here"),
      (2L, "totally unrelated text about spark catalyst plans"),
      (3L, "quick brown fox jumps somewhere"))
      .toDF("id", "text")
    val hits = Contamination.contaminated(corpus, "id", "text",
      bench, "bid", "btext", n = 3).orderBy("id").collect()
    assert(hits.map(_.getLong(0)).toSeq == Seq(1L, 3L))
    // doc1: shingles "the quick brown","quick brown fox" hit; 7 own shingles
    assert(hits(0).getLong(1) == 2 && hits(0).getLong(3) == 7)
    assert(hits(0).getDouble(4) == 0.2857)
    val clean = Contamination.decontaminate(corpus, "id", "text",
      bench, "bid", "btext", n = 3)
    assert(clean.select("id").as[Long].collect().toSet == Set(2L))
    assert(Contamination.decontaminate(corpus, "id", "text",
      bench, "bid", "btext", n = 3, maxHitFrac = 0.5)
      .select("id").as[Long].collect().toSet == Set(1L, 2L))
  }
}
