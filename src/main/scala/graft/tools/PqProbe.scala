package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for the PQ path (round-7 perf triage; throwaway). */
object PqProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[pqprobe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val base = graft.core.Tables.load(spark, sfDir, "embeddings")
    val clones = base.filter(col("vec_id") < 25).select(
      (col("vec_id") + 100000).as("vec_id"),
      transform(col("embedding"), x => x * lit(2.0f)).as("embedding"),
      col("label"))
    val refs = base.unionByName(clones)
    val books = time("fitCodebooks")(
      graft.proximity.Pq.fitCodebooks(refs, "vec_id", "embedding", m = 16, k = 16))
    time("fit again (warm)")(
      graft.proximity.Pq.fitCodebooks(refs, "vec_id", "embedding", m = 16, k = 16))
    time("encode.count")(
      graft.proximity.Pq.encode(refs, "vec_id", "embedding", books).count())
    val q = base.filter(col("vec_id") < 50)
    time("adcTopK.count")(
      graft.proximity.Pq.adcTopK(q, refs, "vec_id", "embedding", 50, books).count())
    time("adcTopKRerank.count")(
      graft.proximity.Pq.adcTopKRerank(q, refs, "vec_id", "embedding", 5, books,
        shortlist = 50).count())
    spark.stop()
  }
}
