package graft.tools

import graft.core.Tables
import graft.sources.Sources
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object Debug {
  def main(args: Array[String]): Unit = {
    val tmp = java.nio.file.Files.createTempDirectory("graft-layout").toString
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.warehouse.dir", tmp + "/warehouse")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")  // expose shuffle vs bucketed
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // partition pruning
    val ev = Tables.load(spark, "/root/testdata/sf0.01", "events")
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
    Sources.createDataSource(spark, ev, "events_part", Some(tmp), partitionBy = Seq("event_type"))
    val pruned = spark.table("events_part").filter(col("event_type") === "error")
    val scan = pruned.queryExecution.executedPlan.toString
    println("partition filter: " + scan.linesIterator.find(_.contains("PartitionFilters")).map(
      l => l.substring(l.indexOf("PartitionFilters"))).getOrElse("NOT FOUND").take(120))
    println("pruned count: " + pruned.count())
    // bucketed co-located join: no Exchange expected
    val o = Tables.load(spark, "/root/testdata/sf0.01", "orders")
    val c = Tables.load(spark, "/root/testdata/sf0.01", "customer")
      .withColumnRenamed("c_custkey", "o_custkey")
    Sources.createBucketedTable(spark, o, "orders_b", "o_custkey", 8)
    Sources.createBucketedTable(spark, c, "cust_b", "o_custkey", 8)
    val joined = spark.table("orders_b").join(spark.table("cust_b"), Seq("o_custkey"))
    val plan = joined.queryExecution.executedPlan.toString
    val exchanges = plan.linesIterator.count(_.contains("Exchange"))
    println(s"bucketed join exchanges in plan: $exchanges (expect 0); rows=${joined.count()}")
    // contrast: plain parquet join shuffles both sides
    val plainPlan = o.join(c, Seq("o_custkey")).queryExecution.executedPlan.toString
    println(s"plain join exchanges: ${plainPlan.linesIterator.count(_.contains("Exchange"))} (expect 2)")
  }
}
