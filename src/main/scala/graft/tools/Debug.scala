package graft.tools

import graft.core.Tables
import graft.proximity.Proximity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object Debug {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = Tables.load(spark, "/root/testdata/sf0.1", "embeddings")
    val qs = emb.filter(col("vec_id") < 50)
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(s"$label: ${(System.nanoTime()-t0)/1e9}s"); r
    }
    val exact = time("exact cosineTopK 50x2000")(
      Proximity.cosineTopK(qs, emb, "vec_id", "embedding", 10)
        .select("id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet)
    val ivf = time("ivf cosineTopKIvf 50x2000")(
      Proximity.cosineTopKIvf(qs, emb, "vec_id", "embedding", 10, nCells = 32, nProbe = 8)
        .select("id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet)
    println(s"IVF recall: ${exact.intersect(ivf).size.toDouble / exact.size}")
  }
}
