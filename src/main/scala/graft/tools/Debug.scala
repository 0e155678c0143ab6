package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

object Debug {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    val before = SparkEntry.queries("q15_temporal_split")(spark, dir)
    println("WITHOUT rule: " + before.count())
    println(before.queryExecution.executedPlan.toString.linesIterator
      .filter(l => l.contains("PushedFilters") || l.contains("Filter")).take(4).mkString("\n"))
    graft.plans.NanosPushdown.install(spark)
    val after = SparkEntry.queries("q15_temporal_split")(spark, dir)
    println("WITH rule: " + after.count())
    println(after.queryExecution.executedPlan.toString.linesIterator
      .filter(l => l.contains("PushedFilters") || l.contains("Filter")).take(4).mkString("\n"))
  }
}
