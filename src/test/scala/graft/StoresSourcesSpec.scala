package graft

import graft.core.Tables
import graft.sources.Sources
import graft.stores._
import org.apache.spark.sql.functions._
import java.nio.file.Files

class StoresSourcesSpec extends SparkSpec {
  import spark.implicits._

  lazy val tmp: String = Files.createTempDirectory("graft-stores").toString

  test("DFStore: upsert/get/list/delete round-trip") {
    val store = new DFStore(spark, tmp + "/dfstore")
    val df = Seq((1, "a"), (2, "b")).toDF("id", "v")
    store.upsert("/ml/features/run1", df)
    assert(store.get("/ml/features/run1").count() == 2)
    assert(store.list().exists(_.contains("ml/features/run1")))
    store.upsert("/ml/features/run1", df.limit(1))   // overwrite
    assert(store.get("/ml/features/run1").count() == 1)
    store.delete("/ml/features/run1")
    assert(!store.list().exists(_.contains("run1")))
  }

  test("ParameterStore: upsert/get/delete/list") {
    val ps = new ParameterStore(spark, tmp + "/params")
    ps.upsert("model/threshold", """{"value": 0.5}""")
    ps.upsert("model/name", """"xgb"""")
    assert(ps.get("model/threshold").contains("""{"value": 0.5}"""))
    ps.upsert("model/threshold", """{"value": 0.7}""")
    assert(ps.get("model/threshold").contains("""{"value": 0.7}"""))
    assert(ps.listKeys().toSet == Set("model/threshold", "model/name"))
    ps.delete("model/name")
    assert(ps.get("model/name").isEmpty)
  }

  test("InferenceStore: schema enforced, append-only, byModel filter") {
    val is = new InferenceStore(spark, tmp + "/inf")
    val preds = Seq(("r1", "m1", 0.9), ("r2", "m1", 0.8)).toDF("id", "model", "pred_value")
      .withColumn("extra", lit("dropped"))
    is.append(preds)
    is.append(Seq(("r3", "m2", 0.7)).toDF("id", "model", "pred_value"))
    assert(is.read().count() == 3)
    assert(is.byModel("m1").count() == 2)
    assert(is.read().schema.fieldNames.toSeq ==
      Seq("id", "model", "pred_label", "pred_value", "tags", "meta", "timestamp"))
  }

  test("GraphStore round-trips vertex/edge frames") {
    val gs = new GraphStore(spark, tmp + "/graphs")
    gs.upsert("g1", Seq((1L, "a")).toDF("id", "attr"), Seq((1L, 1L, 0.5)).toDF("src", "dst", "w"))
    assert(gs.vertices("g1").count() == 1)
    assert(gs.edges("g1").count() == 1)
  }

  test("readCsv infers schema and normalizes names") {
    val csvDir = tmp + "/csv"
    Seq(("1", "x"), ("2", "y")).toDF("ID Num", "Val!")
      .write.option("header", "true").mode("overwrite").csv(csvDir)
    val df = Sources.readCsv(spark, csvDir)
    assert(df.columns.toSeq.sorted == Seq("id_num", "val_"))
    assert(df.schema("id_num").dataType.typeName == "integer")
  }

  test("readOrc/writeOrc round-trip with pushdown reaching the scan") {
    val orcDir = tmp + "/orc"
    val li = Tables.load(spark, sf, "lineitem")
      .select("l_orderkey", "l_quantity", "l_returnflag")
    Sources.writeOrc(li, orcDir)
    val back = Sources.readOrc(spark, orcDir)
    assert(back.count() === li.count())
    assert(back.schema("l_quantity").dataType.typeName === "double")
    val plan = back.filter(col("l_returnflag") === "R").select("l_orderkey")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("l_returnflag"))
    assert(plan.contains("ReadSchema") && !plan.contains("l_quantity"))
  }

  test("flattenStructs flattens nested structs to a_b columns") {
    val df = spark.read.json(Seq(
      """{"a": {"b": {"c": 1}, "d": "x"}, "top": 2}""").toDS())
    val flat = Sources.flattenStructs(df)
    assert(flat.columns.toSet == Set("a_b_c", "a_d", "top"))
    assert(flat.head().getAs[Long]("a_b_c") == 1L)
  }

  test("readJsonFlattened applies timestamp casts") {
    val jsonDir = tmp + "/json"
    Seq("""{"meta": {"when": "2024-01-02 03:04:05"}, "v": 1}""").toDS()
      .write.mode("overwrite").text(jsonDir)
    val df = Sources.readJsonFlattened(spark, jsonDir, timestampCols = Seq("meta_when"))
    assert(df.schema("meta_when").dataType.typeName == "timestamp")
  }

  test("createDataSource registers a queryable table") {
    Sources.createDataSource(spark, Seq((1, "a")).toDF("id", "v"), "test_ds",
      warehouse = Some(tmp + "/warehouse"))
    assert(spark.sql("SELECT count(*) FROM test_ds").head().getLong(0) == 1)
  }

  test("createDataSource partitionBy enables partition pruning") {
    val ev = Tables.load(spark, sf, "events")
    Sources.createDataSource(spark, ev, "events_part_t", Some(tmp + "/w"),
      partitionBy = Seq("event_type"))
    val pruned = spark.table("events_part_t").filter(col("event_type") === "error")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("event_type"))
    assert(pruned.count() ==
      ev.filter(col("event_type") === "error").count())
  }

  test("bucketed tables join without any shuffle") {
    val o = Tables.load(spark, sf, "orders")
    val c = Tables.load(spark, sf, "customer").withColumnRenamed("c_custkey", "o_custkey")
    Sources.createBucketedTable(spark, o, "orders_bt", "o_custkey", 4)
    Sources.createBucketedTable(spark, c, "cust_bt", "o_custkey", 4)
    withAutoBroadcastOff {
      val joined = spark.table("orders_bt").join(spark.table("cust_bt"), Seq("o_custkey"))
      val exchanges = joined.queryExecution.executedPlan.toString
        .linesIterator.count(_.contains("Exchange"))
      assert(exchanges == 0, s"expected shuffle-free bucketed join, got $exchanges exchanges")
      assert(joined.count() == o.count())
    }
  }

  private def withAutoBroadcastOff[T](f: => T): T = {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try f finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
