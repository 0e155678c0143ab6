package graft.tools

import graft.core.Tables
import graft.eda.Eda
import org.apache.spark.sql.SparkSession

object Debug {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val li = Tables.load(spark, "/root/testdata/sf0.1", "lineitem")
    def time[T](label: String)(f: => T): Unit = {
      val t0 = System.nanoTime(); f
      println(s"$label: ${(System.nanoTime()-t0)/1e9}s")
    }
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    time("warmup")(li.count())
    time("descriptiveStats exact (custom agg)")(Eda.descriptiveStats(li, cols).collect())
    time("descriptiveStats exact again")(Eda.descriptiveStats(li, cols).collect())
    time("descriptiveStats approx")(Eda.descriptiveStats(li, cols, exact = false).collect())
    Eda.descriptiveStats(li, cols).show(5, false)
  }
}
