package graft

import graft.text.Curation
import org.apache.spark.sql.functions._

/** End-to-end curation funnel: gate sequencing, dedup-among-survivors,
  * funnel arithmetic. */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    // passes everything, keeper of its fingerprint group
    (1L, "srcA", "the quick brown fox jumps over the lazy dog again and again"),
    // exact duplicate of 1 after normalization → dropped by dedup
    (2L, "srcA", "The  quick Brown fox jumps over the lazy dog AGAIN and again"),
    // too short → quality gate
    (3L, "srcA", "the fox"),
    // wrong language (es stopwords) → language gate
    (4L, "srcB", "el perro es que la una casa de el gato y un dia por en mas"),
    // punctuation garbage → quality gate
    (5L, "srcB", "a ! ! ! ! the , , , of . . . and ; ; ; to : : : is ! ! !")
  ).toDF("doc_id", "source", "text")

  private val cfg = Curation.Config(minWords = 5, maxPunctRatio = 0.2,
    langs = Seq("en"))

  test("gates apply sequentially and dedup keeps the lowest passing id") {
    val a = Curation.annotate(docs, "doc_id", "text", cfg)
      .select("doc_id", "quality_pass", "lang_pass", "kept")
      .as[(Long, Boolean, Boolean, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(a(1L) == ((true, true, true)))
    assert(a(2L) == ((true, true, false))) // duplicate, not keeper
    assert(a(3L) == ((false, false, false)))
    assert(a(4L)._1 && !a(4L)._2) // quality ok, language gate fails
    assert(!a(5L)._1) // punct ratio gate
    val kept = Curation.run(docs, "doc_id", "text", cfg)
    assert(kept.select("doc_id").as[Long].collect().toSet == Set(1L))
    assert(kept.columns.toSeq == docs.columns.toSeq) // original shape back
  }

  test("funnel counts are consistent and per-group") {
    val f = Curation.funnel(docs, "doc_id", "text", "source", cfg)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(f("srcA") == ((3L, 2L, 2L, 1L)))
    assert(f("srcB") == ((2L, 1L, 0L, 0L)))
  }

  test("a fingerprint group whose rows all fail the gates has NO keeper") {
    // docs 10/11 are duplicates that fail the quality gate — the dedup
    // stage must not resurrect either of them as a "keeper"
    val d = Seq(
      (10L, "x", "the fox"),
      (11L, "x", "the  FOX"),
      (12L, "x", "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "source", "text")
    val cfg2 = Curation.Config(minWords = 5, maxPunctRatio = 1.0, langs = Seq("en"))
    val a = Curation.annotate(d, "doc_id", "text", cfg2)
    assert(a.filter(col("kept")).select("doc_id").as[Long].collect().toSet
      == Set(12L))
    // and the funnel never counts a non-survivor as kept
    val f = Curation.funnel(d, "doc_id", "text", "source", cfg2).head()
    assert((f.getLong(1), f.getLong(2), f.getLong(3), f.getLong(4))
      == ((3L, 1L, 1L, 1L)))
  }

  test("opt-in repetition gates drop keyword-stuffed docs; defaults unchanged") {
    val d = Seq(
      (1L, "the fox is a fine animal and it runs far today"),
      (2L, "the spam the spam the spam the spam the spam here"))
      .toDF("doc_id", "text")
    val base = Curation.Config(minWords = 5, maxPunctRatio = 1.0, langs = Seq("en"))
    // defaults (gates at 1.0): both pass quality
    val defFlags = Curation.gateFlags(d, "text", base)
    assert(defFlags.filter(col("quality_pass")).count() == 2)
    // top-2gram gate: doc 2's "the spam" covers 5/10 2-grams
    val gated = base.copy(maxTopNgramFrac = 0.4)
    val flags = Curation.gateFlags(d, "text", gated)
    assert(flags.filter(col("quality_pass")).select("doc_id")
      .as[Long].collect().toSeq == Seq(1L))
  }
}
