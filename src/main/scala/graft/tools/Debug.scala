package graft.tools

import graft.sources.Sources
import graft.stores._
import graft.streaming.Streaming
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._

/** Scratch diagnostics main (not part of the driver contract). */
object Debug {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-drive").toString

    val store = new DFStore(spark, tmp + "/df")
    store.upsert("/pipe/run1", Seq((1, "a"), (2, "b")).toDF("id", "v"))
    println(s"DFStore get: ${store.get("/pipe/run1").count()} rows; list: ${store.list()}")

    val ps = new ParameterStore(spark, tmp + "/ps")
    ps.upsert("thr", "0.5"); ps.upsert("thr", "0.9")
    println(s"ParameterStore get after overwrite: ${ps.get("thr")}; missing: ${ps.get("nope")}")

    val is = new InferenceStore(spark, tmp + "/inf")
    is.append(Seq(("a", "m1", 0.7)).toDF("id", "model", "pred_value"))
    println(s"InferenceStore schema: ${is.read().schema.fieldNames.mkString(",")}; n=${is.read().count()}")

    val in = tmp + "/in"; val out = tmp + "/out"; val cp = tmp + "/cp"
    Seq(1L, 2L).toDF("id").write.parquet(in)
    Streaming.ingestAvailableNow(spark, StructType(Seq(StructField("id", LongType))), in, out, cp)
      .awaitTermination(60000)
    Seq(3L).toDF("id").write.mode("append").parquet(in)
    Streaming.ingestAvailableNow(spark, StructType(Seq(StructField("id", LongType))), in, out, cp)
      .awaitTermination(60000)
    println(s"Streaming incremental: out=${spark.read.parquet(out).count()} rows (expect 3)")

    val flat = Sources.flattenStructs(spark.read.json(Seq("""{"a":{"b":1},"c":"x"}""").toDS()))
    println(s"flatten: ${flat.columns.mkString(",")} -> ${flat.head()}")
  }
}
