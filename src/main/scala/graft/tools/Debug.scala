package graft.tools

import graft.api.DataSource
import graft.core.Tables
import graft.transforms.Transforms
import graft.views.Views
import org.apache.spark.sql.SparkSession

object Debug {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val cust = Tables.load(spark, "/root/testdata/sf0.001", "customer")
    println("resolveNames: " + Views.resolveNames(
      "SELECT * FROM cust WHERE cust.id IN (SELECT id FROM custom)",
      Map("cust" -> "warehouse.customer_v2")))
    val h1 = Transforms.contentHash(cust)
    val h2 = Transforms.contentHash(cust.orderBy("c_name").repartition(5))
    val h3 = Transforms.contentHash(cust.limit(100))
    println(s"contentHash stable under reorder: ${h1 == h2}; differs on subset: ${h1 != h3}")
    val ds = DataSource(spark, "cust_dbg", cust)
    ds.columnStats().show(3, false)
  }
}
