package graft.tools

import org.apache.spark.sql.SparkSession

/** Driver-contract smoke: entry() on a VANILLA session (no graft confs),
  * exactly as the driver would call it. */
object Debug {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val n = graft.SparkEntry.entry(spark).count()
    println(s"entry() rows: $n (driver checks > 0)")
  }
}
