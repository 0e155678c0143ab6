package graft.tools

import org.apache.spark.sql.SparkSession

/** Micro-probe: per-call driver cost of Tables.load + trivial plan,
  * isolating the catalog/footer/listing overhead every query pays at
  * construction time. Usage: runMain graft.tools.LoadProbe <sfDir> */
object LoadProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.head
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()
    for (round <- 1 to 3) {
      var loadNs = 0L
      var countNs = 0L
      for (_ <- 1 to 10; tb <- Seq("lineitem", "orders", "events",
          "documents", "embeddings", "customer")) {
        val t0 = System.nanoTime()
        val df = graft.core.Tables.load(spark, dir, tb)
        val t1 = System.nanoTime()
        df.count()
        val t2 = System.nanoTime()
        loadNs += t1 - t0; countNs += t2 - t1
      }
      println(f"[loadprobe] round $round: 60 loads ${loadNs / 1e9}%.2f s, 60 counts ${countNs / 1e9}%.2f s")
    }
    spark.stop()
  }
}
