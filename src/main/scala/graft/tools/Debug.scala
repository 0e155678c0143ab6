package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object Debug {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("nanos-ab").toString
    Seq(-2000L, -1500L, -1000L, -999L, -1L, 0L, 999L, 1000L).toDF("ts")
      .write.mode("overwrite").parquet(tmp)
    def q() = spark.read.parquet(tmp)
      .withColumn("tsm", expr("timestamp_micros(ts div 1000)"))
      .filter(col("tsm") < expr("timestamp_micros(-1L)"))
      .select("ts").as[Long].collect().toSet
    val without = q()
    graft.plans.NanosPushdown.install(spark)
    val withRule = q()
    println(s"without rule: ${without.toSeq.sorted}")
    println(s"with rule:    ${withRule.toSeq.sorted}")
    println(s"identical: ${without == withRule}")
  }
}
