package graft.tools

import graft.core.Tables
import graft.dedup.Dedup
import graft.text.Text
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object Debug {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.load(spark, "/root/testdata/sf0.1", "documents")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(s"$label: ${(System.nanoTime()-t0)/1e9}s"); r
    }
    // shingle expression == combinator chain? (sets must match; order may differ)
    val fast = graft.functions.Signatures.wordShingles(col("text"), 3)
    val slow = array_distinct(Text.shingles(col("text"), 3))
    val mismatch = docs.limit(300)
      .select(array_sort(fast).as("f"), array_sort(slow).as("s"))
      .filter(col("f") =!= col("s")).count()
    println(s"shingle cross-check mismatches: $mismatch (expect 0)")
    val n = time("minhashLsh (full custom)")(
      Dedup.minhashLsh(docs, "doc_id", "text", threshold = 0.2).count())
    println(s"minhash rows=$n (expect 256)")
  }
}
