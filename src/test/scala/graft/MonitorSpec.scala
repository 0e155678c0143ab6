package graft

import graft.api.Catalog
import graft.core.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StructField, StructType}

/** Monitor artifact (VERDICT r2 item 2): capture switch, baseline
  * persist, constraint check, capture round-trip (batch + streaming
  * AvailableNow), drift report — all restart-survivable. */
class MonitorSpec extends SparkSpec {
  import spark.implicits._

  lazy val root: String =
    java.nio.file.Files.createTempDirectory("graft-monitor").toString

  lazy val payloadSchema = StructType(Seq(
    StructField("l_quantity", DoubleType), StructField("l_discount", DoubleType)))

  private def li = Tables.load(spark, sf, "lineitem")
    .select("l_orderkey", "l_quantity", "l_discount", "l_extendedprice")

  test("capture switch + baseline files persist under the catalog root") {
    val cat = new Catalog(spark, root)
    val m = cat.onboardFormulaModel("mon_model", 10.0,
      Seq("l_quantity" -> 2.0, "l_discount" -> -5.0), target = "l_extendedprice")
    val ep = m.toEndpoint("mon-endpoint")
    val mon = ep.monitor
    assert(!mon.captureEnabled && !mon.baselineExists)
    mon.enableDataCapture(capturePercentage = 100)
    assert(mon.captureEnabled && mon.capturePercentage == 100)
    assert(mon.summary("data_capture_enabled") == "true")

    mon.createBaseline(li.select("l_quantity", "l_discount"),
      Seq("l_quantity", "l_discount"))
    assert(mon.baselineExists)
    assert(mon.getBaseline().get.count() == li.count())
    assert(mon.getStatistics().isDefined)
    val cons = mon.getConstraints().get.collect()
    assert(cons.length == 2 && cons.forall(_.getDouble(1) == 1.0)) // complete cols
    // create again without recreate: no-op
    mon.createBaseline(li.limit(1), Seq("l_quantity"))
    assert(mon.getBaseline().get.count() == li.count())
  }

  test("inference with capture enabled writes parseable JSONL records") {
    val cat = new Catalog(spark, root)
    val ep = cat.endpoint("mon-endpoint")
    ep.inference(li, idColumn = Some("l_orderkey"))
    val mon = ep.monitor
    val parsed = mon.capturedData(payloadSchema, side = "Input")
    assert(parsed.count() == li.count())
    // captured values survive the CSV round-trip exactly
    val sumIn = parsed.agg(sum("l_quantity")).head().getDouble(0)
    val sumSrc = li.agg(sum("l_quantity")).head().getDouble(0)
    assert(sumIn == sumSrc)
    // output side carries the prediction column
    val outSchema = StructType(Seq(StructField("prediction", DoubleType)))
    val out = mon.capturedData(outSchema, side = "Output")
    assert(out.count() == li.count())
    assert(out.filter(col("prediction").isNull).count() == 0)
  }

  test("streaming AvailableNow drains the same capture dir") {
    val cat = new Catalog(spark, root)
    val mon = cat.endpoint("mon-endpoint").monitor
    val stream = mon.capturedStream(payloadSchema, side = "Input")
    assert(stream.isStreaming)
    val q = stream.writeStream
      .format("memory").queryName("mon_capture_stream")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    assert(spark.table("mon_capture_stream").count() == li.count())
  }

  test("constraint check flags range escapes; drift report composes PSI + flags") {
    val cat = new Catalog(spark, root)
    val mon = cat.endpoint("mon-endpoint").monitor
    // in-range current: nothing violated
    val ok = mon.checkConstraints(li.select("l_quantity", "l_discount"))
    assert(ok.filter(col("violated")).count() == 0)
    // shifted current: range escape + PSI drift
    val shifted = li.select((col("l_quantity") * 1.5 + 2).as("l_quantity"),
      col("l_discount"))
    val bad = mon.checkConstraints(shifted)
    assert(bad.filter(col("column_name") === "l_quantity")
      .head().getBoolean(bad.columns.indexOf("violated")))
    val drift = mon.driftReport(shifted, Seq("l_quantity", "l_discount"))
    val dq = drift.filter(col("column_name") === "l_quantity").head()
    assert(dq.getDouble(dq.fieldIndex("psi")) > 0.1)
    val dd = drift.filter(col("column_name") === "l_discount").head()
    assert(dd.getDouble(dd.fieldIndex("psi")) < 0.01)
  }

  test("restart: a new session reopens monitor state by name") {
    val s2 = spark.newSession()
    val cat2 = new Catalog(s2, root)
    val mon2 = cat2.endpoint("mon-endpoint").monitor
    assert(mon2.captureEnabled && mon2.baselineExists)
    assert(mon2.getConstraints().get.count() == 2)
    assert(mon2.capturedData(payloadSchema).count() ==
      Tables.load(s2, sf, "lineitem").count())
  }
}
