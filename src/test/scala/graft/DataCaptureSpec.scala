package graft

import graft.sources.DataCapture
import org.apache.spark.sql.functions._

/** SageMaker data-capture parsing (SURVEY §2.1, upgrading the r1
  * "partial": real payload shape, CSV/JSON encodings, timestamps). */
class DataCaptureSpec extends SparkSpec {
  import spark.implicits._

  private def record(inData: String, inEnc: String, outData: String,
                     ts: String): String =
    s"""{"captureData":{"endpointInput":{"data":${ujsonStr(inData)},"encoding":"$inEnc","mode":"INPUT","observedContentType":"text/csv"},""" +
      s""""endpointOutput":{"data":${ujsonStr(outData)},"encoding":"JSON","mode":"OUTPUT","observedContentType":"application/json"}},""" +
      s""""eventMetadata":{"eventId":"e-1","inferenceTime":"$ts"},"eventVersion":"0"}"""

  private def ujsonStr(s: String): String =
    "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"").replace("\n", "\\n") + "\""

  test("readCapture: CSV inputs and JSON outputs with timestamps") {
    val dir = java.nio.file.Files.createTempDirectory("capture").toString
    val lines = Seq(
      record("id,score\n1,0.5\n2,0.7", "CSV",
        """{"prediction": 1.5, "confidence": 0.9}""", "2025-03-01T10:00:00Z"),
      record("id,score\n3,0.9", "CSV",
        """{"prediction": 2.5, "confidence": 0.8}""", "2025-03-01T11:00:00Z"))
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/part-0.jsonl"),
      lines.mkString("\n").getBytes)
    val (in, out) = DataCapture.readCapture(spark, s"$dir/part-0.jsonl")
    assert(in.count() == 3) // 2 + 1 CSV body rows
    assert(in.columns.toSet == Set("timestamp", "id", "score"))
    assert(in.filter(col("id") === 3).head().getDouble(2) == 0.9)
    assert(in.select("timestamp").distinct().count() == 2)
    assert(out.count() == 2)
    assert(out.select(sum("prediction")).head().getDouble(0) == 4.0)
  }

  test("parsePayloads: JSON dict-of-lists explodes; unsupported encoding skipped") {
    val payloads = Seq(
      ("""{"a": [1, 2, 3], "b": [10, 20, 30]}""", "JSON", "2025-01-01T00:00:00Z"),
      ("ignored", "PROTOBUF", "2025-01-01T00:00:00Z"))
      .toDF("data", "encoding", "ts")
      .withColumn("timestamp", to_timestamp(col("ts"))).drop("ts")
    val parsed = DataCapture.parsePayloads(payloads)
    assert(parsed.count() == 3) // dict-of-lists → one row per element
    assert(parsed.select(sum("a")).head().getLong(0) == 6)
    assert(parsed.select(sum("b")).head().getLong(0) == 60)
  }

  test("parsePayloads: mixed CSV headers align by column name") {
    val payloads = Seq(
      ("x,y\n1,2", "CSV", null), ("x,z\n5,6", "CSV", null))
      .toDF("data", "encoding", "ts")
      .withColumn("timestamp", lit(null).cast("timestamp")).drop("ts")
    val parsed = DataCapture.parsePayloads(payloads)
    assert(parsed.count() == 2)
    assert(parsed.columns.toSet == Set("timestamp", "x", "y", "z"))
    // missing columns land as nulls, like the reference's concat
    assert(parsed.filter(col("z").isNull).count() == 1)
  }

  test("parsePayloads: empty input returns an empty frame, no crash") {
    val empty = Seq.empty[(String, String)].toDF("data", "encoding")
      .withColumn("timestamp", lit(null).cast("timestamp"))
    assert(DataCapture.parsePayloads(empty).count() == 0)
  }

  test("captureStreamParsed: capture files drain incrementally into parsed rows") {
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("capture-stream").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/cap-0.jsonl"),
      record("id,score\n10,0.1\n11,0.2", "CSV",
        """{"prediction": 1.0}""", "2025-04-01T10:00:00Z").getBytes)
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("score", DoubleType)))
    val parsed = graft.streaming.Streaming.captureStreamParsed(
      spark, dir, "Input", schema)
    assert(parsed.isStreaming)
    val q = parsed.writeStream.format("memory").queryName("cap_stream")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val out1 = spark.table("cap_stream").collect()
    assert(out1.length == 2)
    assert(out1.map(_.getAs[Long]("id")).toSet == Set(10L, 11L))
    // a second capture file lands; re-draining picks it up
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/cap-1.jsonl"),
      record("id,score\n12,0.3", "CSV",
        """{"prediction": 2.0}""", "2025-04-01T11:00:00Z").getBytes)
    val q2 = parsed.writeStream.format("memory").queryName("cap_stream2")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q2.awaitTermination(60000)
    assert(spark.table("cap_stream2").count() == 3)
  }

  test("parseSideWithSchema skips header-mismatched payloads (no transposition)") {
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("capture-mismatch").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/cap.jsonl"),
      (record("id,score\n1,0.5", "CSV", "{}", "2025-05-01T00:00:00Z") + "\n" +
        record("score,id\n0.7,2", "CSV", "{}", "2025-05-01T00:00:00Z")).getBytes)
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("score", DoubleType)))
    val raw = spark.read.schema(
      graft.sources.DataCapture.captureSchema).json(s"$dir/cap.jsonl")
    val out = graft.sources.DataCapture.parseSideWithSchema(raw, "Input", schema)
      .collect()
    // only the matching-header payload parses; the swapped one is
    // SKIPPED, not silently transposed into (id=null, score=2.0)
    assert(out.length == 1)
    assert(out(0).getAs[Long]("id") == 1L && out(0).getAs[Double]("score") == 0.5)
  }

  test("aggregateRows: per-group mean + group_count, auto feature selection") {
    import graft.transforms.Transforms
    val df = Seq(
      ("a", 1.0, 10.0, 7L), ("a", 3.0, 30.0, 8L), ("b", 5.0, 50.0, 9L))
      .toDF("grp", "f1", "f2", "row_id")
    val agg = Transforms.aggregateRows(df, "grp").orderBy("grp").collect()
    // row_id excluded by the endswith("id") rule (aggregation.py:22)
    assert(agg.head.schema.fieldNames.toSeq == Seq("grp", "f1", "f2", "group_count"))
    assert(agg(0).getDouble(1) == 2.0 && agg(0).getDouble(2) == 20.0)
    assert(agg(0).getLong(3) == 2 && agg(1).getLong(3) == 1)
    intercept[IllegalArgumentException] {
      Transforms.aggregateRows(df, "grp", Seq("missing_col"))
    }
  }
}
