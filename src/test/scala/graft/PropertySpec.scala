package graft

import graft.text.Text
import graft.transforms.Transforms
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests for the coercion/sampling/text rules (SURVEY §5 plan).
  * Raw ScalaCheck generators, deterministically seeded (the
  * scalatest-scalacheck bridge isn't in the offline dependency set).
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def forAll[A](gen: Gen[A], n: Int = 40)(f: A => Unit): Unit =
    (0 until n).foreach { i =>
      f(gen.pureApply(Gen.Parameters.default, Seed(i.toLong)))
    }

  private def forAll[A, B](genA: Gen[A], genB: Gen[B])(f: (A, B) => Unit): Unit =
    (0 until 40).foreach { i =>
      f(genA.pureApply(Gen.Parameters.default, Seed(i.toLong)),
        genB.pureApply(Gen.Parameters.default, Seed(i.toLong + 1000)))
    }

  private val nameGen: Gen[String] =
    Gen.nonEmptyListOf(Gen.oneOf(Gen.alphaNumChar, Gen.oneOf(' ', '!', '.', '-', '_', 'É')))
      .map(_.mkString.take(80))

  test("normalizeColumnNames: output is lowercase, sanitized, <=64 chars, idempotent") {
    forAll(nameGen) { name =>
      val out = Transforms.normalizeColumnNames(
        Seq(1).toDF(name + "x")).columns.head
      assert(out.matches("[a-z0-9-_]+"))
      assert(out.length <= 64)
      val again = Transforms.normalizeColumnNames(Seq(1).toDF(out)).columns.head
      assert(again == out)
    }
  }

  private val textGen: Gen[String] =
    Gen.listOf(Gen.oneOf("the", "cat", "sat", "x1", "über", "", " ", "\t"))
      .map(_.mkString(" ")).map(_.take(200))

  test("text invariants: wordCount >= 0; fingerprint stable under respacing") {
    forAll(textGen) { text =>
      val df = Seq(Tuple1(text)).toDF("t")
      val r = df.select(Text.wordCount(col("t")).as("w"),
        Text.fingerprint(col("t")).as("f"),
        Text.fingerprint(regexp_replace(col("t"), " ", "   ")).as("f2")).head()
      assert(r.getInt(0) >= 0)
      assert(r.getString(1) == r.getString(2)) // whitespace-insensitive
    }
  }

  test("jaccard and ruzicka stay in [0,1]; ruzicka is symmetric") {
    val vecGen = Gen.listOfN(8, Gen.choose(0, 5)).map(_.map(_.toDouble))
    forAll(vecGen, vecGen) { (a, b) =>
      val df = Seq((a, b)).toDF("a", "b")
      val r = df.select(
        graft.proximity.Proximity.ruzicka(col("a"), col("b")).as("rab"),
        graft.proximity.Proximity.ruzicka(col("b"), col("a")).as("rba")).head()
      assert(r.getDouble(0) >= 0.0 - 1e-12 && r.getDouble(0) <= 1.0 + 1e-12)
      assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-12)
    }
  }

  test("sampleRows never exceeds the target regardless of table size") {
    forAll(Gen.choose(1, 60), Gen.choose(1, 500)) { (target, rows) =>
      val df = (1 to rows).toDF("v")
      assert(Transforms.sampleRows(df, targetRows = target, totalRows = rows).count() <= target)
    }
  }

  test("rocAucByGroup equals per-group rocAuc on random score/label data") {
    import graft.ml.Metrics
    val dataGen = for {
      n <- Gen.choose(20, 120)
      rows <- Gen.listOfN(n, for {
        g <- Gen.oneOf("a", "b", "c")
        score <- Gen.choose(0, 50).map(_ / 10.0) // coarse → plenty of ties
        label <- Gen.oneOf(0, 1)
      } yield (g, score, label))
    } yield rows
    forAll(dataGen, n = 12) { rows =>
      val df = rows.toDF("g", "score", "label")
      val grouped = Metrics.rocAucByGroup(df, "g", "label", "score")
        .collect().map(r => r.getString(0) ->
          (if (r.isNullAt(1)) null else r.getDouble(1))).toMap
      rows.map(_._1).distinct.foreach { g =>
        val single = Metrics.rocAuc(df.filter(col("g") === g), "label", "score")
          .head()
        val expected = if (single.isNullAt(0)) null else single.getDouble(0)
        assert(grouped.get(g).contains(expected),
          s"group $g: grouped=${grouped.get(g)} single=$expected")
      }
    }
  }

  test("spearmanByGroup equals per-pair spearman on random tied data") {
    import graft.ml.Metrics
    val dataGen = for {
      n <- Gen.choose(20, 100)
      rows <- Gen.listOfN(n, for {
        pair <- Gen.oneOf("p0", "p1", "p2")
        a <- Gen.choose(0, 20).map(_ / 4.0) // coarse → ties in both cols
        b <- Gen.choose(0, 20).map(_ / 4.0)
      } yield (pair, a, b))
    } yield rows
    forAll(dataGen, n = 12) { rows =>
      val df = rows.toDF("pair", "a", "b")
      val grouped = Metrics.spearmanByGroup(df, "pair", "a", "b")
        .collect().map(r => r.getString(0) ->
          (if (r.isNullAt(1)) null else r.getDouble(1))).toMap
      rows.map(_._1).distinct.foreach { g =>
        val single = Metrics.spearman(
          df.filter(col("pair") === g), "a", "b").head()
        val expected = if (single.isNullAt(0)) null else single.getDouble(0)
        assert(grouped.get(g).contains(expected),
          s"pair $g: grouped=${grouped.get(g)} single=$expected")
      }
    }
  }

  private val rawTextGen: Gen[String] = Gen.listOf(
    Gen.oneOf(Gen.alphaNumChar.map(_.toString), Gen.const(" "), Gen.const("\n"),
      Gen.oneOf("tok", "the", "batch", "spark ")))
    .map(_.mkString.take(200))

  test("charChunks concatenation is the identity for any width") {
    forAll(rawTextGen, Gen.choose(1, 40)) { (text, width) =>
      val back = Seq(text).toDF("t")
        .select(concat_ws("", Text.charChunks(col("t"), width))).as[String].head()
      assert(back == text, s"width=$width text=${text.take(40)}…")
    }
  }

  test("slidingWindows cover every token in order for any size/stride") {
    forAll(rawTextGen, Gen.zip(Gen.choose(1, 10), Gen.choose(1, 10))) {
      case (text, (size, stride)) =>
        val toks = Seq(text).toDF("t")
          .select(Text.tokens(col("t"))).as[Seq[String]].head()
        val wins = Seq(text).toDF("t")
          .select(Text.slidingWindows(Text.tokens(col("t")), size, stride))
          .as[Seq[String]].head()
        // stride <= size ⇒ lossless coverage: each non-final window's
        // first `stride` tokens + the whole final window == the corpus
        if (stride <= size) {
          val rebuilt = wins.init.flatMap(_.split(" ").filter(_.nonEmpty).take(stride)) ++
            wins.last.split(" ").filter(_.nonEmpty)
          assert(rebuilt == toks, s"size=$size stride=$stride: $rebuilt vs $toks")
        }
        // every window except possibly the last has exactly `size` tokens
        wins.dropRight(1).foreach { w =>
          assert(w.split(" ").count(_.nonEmpty) == size)
        }
    }
  }

  test("simhash is token-order invariant; fingerprint is not forced to be") {
    val wordsGen = Gen.nonEmptyListOf(Gen.oneOf("alpha", "beta", "gamma", "delta", "eps"))
    forAll(wordsGen, n = 25) { words =>
      val a = words.mkString(" ")
      val b = scala.util.Random.javaRandomToRandom(new java.util.Random(42))
        .shuffle(words).mkString(" ")
      val sims = Seq(a, b).toDF("t")
        .select(graft.functions.Signatures.simhash(Text.tokens(col("t"))))
        .as[Long].collect()
      assert(sims(0) == sims(1), s"simhash must ignore order: $a vs $b")
    }
  }

  test("bucketedNtile == ntile window for random sizes/tiles/duplication " +
    "(asc and desc, forced-bucketed)") {
    import org.apache.spark.sql.expressions.Window
    // (rows, tiles, distinct-value modulus, desc) — the modulus drives
    // tie density from all-distinct to 3-value; 8 cases keeps the suite
    // fast while covering N<n, N%n==0 and heavy-tie shapes
    val caseGen = for {
      rows <- Gen.choose(1, 900)
      n <- Gen.choose(2, 17)
      mod <- Gen.oneOf(3, 7, 50, 100000)
      desc <- Gen.oneOf(true, false)
    } yield (rows, n, mod, desc)
    forAll(caseGen, n = 8) { case (rows, n, mod, desc) =>
      val df = spark.range(rows).selectExpr("id",
        s"CAST(id % $mod AS DOUBLE) AS v")
      val ord = (if (desc) col("v").desc else col("v").asc) :: col("id").asc :: Nil
      val expect = df.withColumn("q", ntile(n).over(Window.orderBy(ord: _*)))
        .select("id", "q").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      val got = graft.ml.Metrics.bucketedNtile(df, "v", n, "q",
          tieCols = Seq(col("id")), desc = desc, buckets = 16, smallMaxRows = 0)
        .select("id", "q").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(got == expect, s"rows=$rows n=$n mod=$mod desc=$desc")
    }
  }
}
