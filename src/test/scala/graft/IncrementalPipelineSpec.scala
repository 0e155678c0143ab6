package graft

import graft.dedup.Incremental
import graft.text.Pipelines
import org.apache.spark.sql.functions._

/** Round-7 wave 3: incremental store-backed dedup + the FineWeb preset
  * pipeline (SURVEY §2.12). */
class IncrementalPipelineSpec extends SparkSpec {
  import spark.implicits._

  private def tmpStore(): String =
    java.nio.file.Files.createTempDirectory("graft-inc-spec").toString + "/store"

  test("incremental dedup: batch2 drops history dups and in-batch dups") {
    val store = tmpStore()
    val b1 = Seq((1L, "alpha text"), (2L, "beta text")).toDF("doc_id", "text")
    val s1 = Incremental.dedupAndIngest(spark, b1, "doc_id", "text", store, "b1")
    assert(s1.count() == 2)
    val b2 = Seq(
      (10L, "alpha text"),   // seen in batch 1 → dropped
      (11L, "gamma text"),   // new → kept
      (12L, "gamma text"),   // in-batch dup → dropped
      (13L, "ALPHA   text")  // normalizes to batch-1 fingerprint → dropped
    ).toDF("doc_id", "text")
    val s2 = Incremental.dedupAndIngest(spark, b2, "doc_id", "text", store, "b2")
    assert(s2.select("doc_id").collect().map(_.getLong(0)).toSeq == Seq(11L))
    // batch 3 against the grown store: gamma now history
    val b3 = Seq((20L, "gamma text"), (21L, "delta text")).toDF("doc_id", "text")
    val s3 = Incremental.newDocuments(spark, b3, "doc_id", "text", store)
    assert(s3.select("doc_id").collect().map(_.getLong(0)).toSeq == Seq(21L))
  }

  test("incremental dedup: double-ingest of a batch id is refused") {
    val store = tmpStore()
    val b = Seq((1L, "x y z")).toDF("doc_id", "text")
    Incremental.dedupAndIngest(spark, b, "doc_id", "text", store, "day1")
    val e = intercept[IllegalArgumentException] {
      Incremental.ingest(spark, b, "doc_id", "text", store, "day1")
    }
    assert(e.getMessage.contains("already ingested"))
    assert(Incremental.hasBatch(spark, store, "day1"))
    assert(!Incremental.hasBatch(spark, store, "day2"))
  }

  test("incremental store is fp_bucket-partitioned parquet") {
    val store = tmpStore()
    val b = (1 to 50).map(i => (i.toLong, s"unique document number $i"))
      .toDF("doc_id", "text")
    Incremental.dedupAndIngest(spark, b, "doc_id", "text", store, "b1")
    val buckets = new java.io.File(store).listFiles()
      .filter(_.getName.startsWith("fp_bucket=")).map(_.getName)
    assert(buckets.nonEmpty, "store must be hive-partitioned on fp_bucket")
    val back = spark.read.parquet(store)
    assert(back.columns.toSet == Set("fingerprint", "id", "batch_id", "fp_bucket"))
    assert(back.count() == 50)
  }

  test("fineweb preset: stage flags are sequential and kept dedups") {
    val good = (1 to 4).map(i =>
      s"This sentence number $i is long enough to pass easily.").mkString("\n")
    val docs = Seq(
      (1L, "s1", good),                           // passes everything
      (2L, "s1", good),                           // exact dup of 1 → not kept
      (3L, "s1", good + "\nfunction f() { }"),    // curly brace → c4 fails
      (4L, "s2", "le la les et un une de du " * 4 + "\n" + good), // fr line fails line filter; page = good → en
      (5L, "s2", "Contact me at bob@example.com for the full offer details today.\n" + good)
    ).toDF("doc_id", "source", "text")
    val a = Pipelines.finewebAnnotate(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    val rows = a.map(r => (r.getLong(0),
      r.getBoolean(a.head.fieldIndex("c4_pass")),
      r.getBoolean(a.head.fieldIndex("lang_pass")),
      r.getBoolean(a.head.fieldIndex("kept")),
      r.getBoolean(a.head.fieldIndex("pii_hit"))))
    assert(rows(0) == ((1L, true, true, true, false)))
    assert(rows(1) == ((2L, true, true, false, false)), "dup must lose the keeper election")
    assert(!rows(2)._2, "curly-brace page must fail c4")
    assert(rows(4)._2 && rows(4)._5, "pii doc passes but is flagged")
    // funnel accounting matches the flags
    val funnel = Pipelines.finewebFunnel(docs, "doc_id", "text", "source")
      .orderBy("source").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(5)))
    assert(funnel(0)._2 == 3L) // s1 input
    assert(funnel(1)._2 == 2L) // s2 input
    val keptTotal = Pipelines.fineweb(docs, "doc_id", "text").count()
    assert(keptTotal == funnel.map(r => r._4).sum)
  }

  test("fineweb: redacted output replaces pii with sentinels") {
    val good = (1 to 4).map(i =>
      s"Sentence number $i is long enough to pass the filters.").mkString("\n")
    val docs = Seq(
      (1L, "Reach alice@example.org with offers now please.\n" + good))
      .toDF("doc_id", "text")
    val out = Pipelines.fineweb(docs, "doc_id", "text").collect()
    assert(out.length == 1)
    val txt = out(0).getString(1)
    assert(txt.contains("<EMAIL>") && !txt.contains("alice@example.org"))
  }

  test("fineweb: working-column clash is rejected loud") {
    val bad = Seq((1L, "x", true)).toDF("doc_id", "text", "c4_pass")
    val e = intercept[IllegalArgumentException] {
      Pipelines.finewebAnnotate(bad, "doc_id", "text")
    }
    assert(e.getMessage.contains("working column"))
  }
}
