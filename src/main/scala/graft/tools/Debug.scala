package graft.tools

import graft.core.Tables
import graft.eda.Eda
import graft.ml.Models
import graft.proximity.{Analytics, Proximity}
import graft.views.Joins
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object Debug {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    // salted join vs plain join on a hot key
    val left = (1 to 100000).map(i => (if (i % 3 == 0) 1L else i.toLong, i)).toDF("k", "v")
    val right = (1L to 50L).map(k => (k, s"tag$k")).toDF("k", "tag")
    val plain = left.join(right, Seq("k")).count()
    val salted = Joins.saltedJoin(left, right, "k", buckets = 16).count()
    println(s"saltedJoin: plain=$plain salted=$salted equal=${plain == salted}")
    // uq intervals over real residual features
    val e = Tables.load(spark, "/root/testdata/sf0.01", "embeddings")
      .withColumn("embedding", transform(col("embedding"), x => x.cast("double")))
      .filter(col("vec_id") < 100)
    val nn = Proximity.knnJoin(e, e, "vec_id", "embedding", 5, Proximity.euclidean)
    val rf = Analytics.residualFeatures(nn, e.withColumn("pred", col("label") * 0.9),
      "vec_id", "label", "pred", 5)
    val uq = Models.uqIntervals(rf)
    val bad = uq.filter(col("pred_lower") >= col("prediction") ||
      col("pred_upper") <= col("prediction")).count()
    println(s"uqIntervals: rows=${uq.count()} non-bracketing=$bad")
    // value-counts collapse at the operator surface
    val unique = (1 to 50).map(i => s"v$i").toDF("c")
    println(s"valueCounts all-unique: ${Eda.valueCounts(unique, "c").count()} rows (expect 5)")
  }
}
