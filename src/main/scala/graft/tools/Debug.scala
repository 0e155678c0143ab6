package graft.tools

import graft.core.Tables
import graft.dedup.Dedup
import org.apache.spark.sql.SparkSession

object Debug {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.load(spark, "/root/testdata/sf0.1", "documents")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(s"$label: ${(System.nanoTime()-t0)/1e9}s"); r
    }
    val n = time("minhashLsh")(Dedup.minhashLsh(docs, "doc_id", "text", threshold = 0.2).count())
    println(s"rows=$n")
    val n2 = time("simhashPairs")(Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 6).count())
    println(s"rows=$n2")
  }
}
