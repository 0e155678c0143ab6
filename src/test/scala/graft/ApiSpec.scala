package graft

import graft.api.{DataSource, FeatureSet}
import graft.core.Tables
import org.apache.spark.sql.functions._

class ApiSpec extends SparkSpec {
  import spark.implicits._

  lazy val ds = DataSource(spark, "cust", Tables.load(spark, sf, "customer"))

  test("DataSource: query by name, numRows, numeric column detection") {
    assert(ds.numRows() == 150)
    assert(ds.query("SELECT count(*) AS n FROM cust").head().getLong(0) == 150)
    assert(ds.numericColumns.contains("c_acctbal"))
  }

  test("DataSource: EDA methods memoize (same DataFrame instance back)") {
    val first = ds.descriptiveStats()
    assert(ds.descriptiveStats() eq first)
    assert(first.count() == ds.numericColumns.size)
  }

  test("DataSource: views registered under ___ names") {
    ds.displayView(Seq("c_custkey", "c_name"))
    assert(spark.sql("SELECT * FROM cust___display").columns.toSeq ==
      Seq("c_custkey", "c_name"))
  }

  test("toFeatures: auto id + event time, snapshot dedups to latest") {
    val raw = Seq((1, "a", "2024-01-01T00:00:00.000Z"),
      (1, "b", "2024-02-01T00:00:00.000Z"),
      (2, "c", "2024-01-15T00:00:00.000Z")).toDF("id", "v", "event_time")
    val fs = new DataSource(spark, "fs_src", raw).toFeatures("fs1", idColumn = "id")
    val snap = fs.snapshot().orderBy("id").collect()
    assert(snap.length == 2)
    assert(snap(0).getAs[String]("v") == "b") // latest record for id=1
  }

  test("FeatureSet training view applies roles") {
    val raw = Seq((1, 10.0, "2024-01-01T00:00:00.000Z"),
      (2, 20.0, "2024-01-01T00:00:00.000Z")).toDF("id", "x", "event_time")
    val fs = new DataSource(spark, "fs_src2", raw).toFeatures("fs2", idColumn = "id")
    val roles = Seq((2, true, false, 1.0)).toDF("id", "exclude", "validation", "sample_weight")
    val tv = fs.trainingView(roles)
    assert(tv.count() == 1)
    assert(tv.head().getAs[Int]("id") == 1)
  }

  test("DataSource.fromPath reads parquet") {
    val ds2 = DataSource.fromPath(spark, "li_path", s"$sf/lineitem.parquet")
    assert(ds2.numRows() == 6000)
  }
}
