package graft.tools

import graft.api.DataSource
import graft.core.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object Debug {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val ds = DataSource(spark, "orders_dbg", Tables.load(spark, "/root/testdata/sf0.001", "orders"))
    ds.columnStats().filter(col("column_name") === "o_orderdate").show(false)
  }
}
