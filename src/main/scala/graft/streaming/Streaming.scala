package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Structured Streaming extension (beyond the reference, which is
  * batch-only — SURVEY §2.10). Its chunked FeatureSet ingestion
  * (reference: src/workbench/core/transforms/pandas_transforms/
  * pandas_to_features_chunked.py:1-111) and endpoint data-capture
  * parsing (data_capture_core.py:28-60) are the natural streaming
  * surfaces: a file source with Trigger.AvailableNow drains whatever
  * has landed, checkpoints, and stops — incremental ingestion with
  * exactly-once sink semantics.
  */
object Streaming {

  /** Chunked ingestion: stream parquet files from `inDir` into a parquet
    * table at `outDir`, draining available data then stopping. Re-running
    * picks up only new files (checkpoint). */
  def ingestAvailableNow(spark: SparkSession, schema: StructType, inDir: String,
                         outDir: String, checkpoint: String): StreamingQuery = {
    spark.readStream.schema(schema).parquet(inDir)
      .writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** withWatermark rejects TIMESTAMP_NTZ event times; normalize the
    * event-time column defensively before watermarking (shared kernel
    * helper — see [[graft.core.Tables.ltzTs]]). */
  private def withLtzEventTime(df: DataFrame, tsCol: String): DataFrame =
    graft.core.Tables.ltzTs(df, tsCol)

  /** Windowed rolling aggregate over an event stream: per event-type
    * counts/sums in tumbling windows with a watermark — the streaming
    * form of the batch time-rollup (q23). */
  def windowedRollup(events: DataFrame, tsCol: String, window_ : String,
                     watermark: String): DataFrame =
    withLtzEventTime(events, tsCol).withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), window_), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("total_value"))

  /** Stateful sessionization: group events per user into sessions closed
    * by an inactivity gap — `flatMapGroupsWithState`-class custom state,
    * expressed here with the built-in session_window (state-store backed,
    * watermark-evicted), which is the codegen-friendly form.
    */
  def sessionize(events: DataFrame, tsCol: String, userCol: String,
                 gap: String, watermark: String): DataFrame =
    withLtzEventTime(events, tsCol).withWatermark(tsCol, watermark)
      .groupBy(session_window(col(tsCol), gap), col(userCol))
      .agg(count(lit(1)).as("n_events"), sum("value").as("session_value"))

  /** Stream-stream interval join: pair rows from two live streams on a
    * key when the right event lands within `[l.ts + lowSec, l.ts +
    * highSec]` of the left event — click→conversion attribution as a
    * streaming operator. This is the Spark-native form: BOTH sides carry
    * watermarks and the join condition bounds event-time distance, which
    * is exactly what Structured Streaming requires to evict join state —
    * without the time bound the state store grows forever.
    * Output columns: key, `l_`/`r_`-prefixed remaining columns. */
  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
                   tsCol: String, watermark: String,
                   lowSec: Long, highSec: Long): DataFrame = {
    require(highSec > lowSec)
    def side(df: DataFrame, p: String) =
      withLtzEventTime(df, tsCol).select(
        col(key) +: df.columns.filterNot(_ == key).toSeq
          .map(c => col(c).as(p + c)): _*)
        .withWatermark(p + tsCol, watermark)
    val l = side(left, "l_")
    val r = side(right, "r_")
    l.join(r, l(key) === r(key) &&
        col("r_" + tsCol) >= col("l_" + tsCol) + expr(s"INTERVAL $lowSec SECONDS") &&
        col("r_" + tsCol) <= col("l_" + tsCol) + expr(s"INTERVAL $highSec SECONDS"))
      .drop(r(key))
  }

  /** JSONL data-capture parsing as a stream (capture dirs accumulate
    * request/response payloads; parse incrementally)
    * (reference: data_capture_core.py parses these in batch). */
  def captureStream(spark: SparkSession, schema: StructType, captureDir: String): DataFrame =
    spark.readStream.schema(schema).json(captureDir)

  /** SageMaker data-capture as a PARSED stream: capture JSONL lands
    * continuously under the endpoint's capture prefix; this reads the
    * real record shape ([[graft.sources.DataCapture.captureSchema]]) and
    * incrementally parses one side's CSV payloads with the supplied
    * schema (streams cannot sample-infer). Combine with
    * Trigger.AvailableNow for the reference's batch-drain pattern. */
  def captureStreamParsed(spark: SparkSession, captureDir: String,
                          side: String, payloadSchema: StructType): DataFrame =
    graft.sources.DataCapture.parseSideWithSchema(
      spark.readStream.schema(graft.sources.DataCapture.captureSchema)
        .json(captureDir),
      side, payloadSchema)

  /** Streaming exact-dedup WITHIN a watermark horizon: drop rows whose
    * normalized-text fingerprint was already seen recently. State-store
    * backed (`dropDuplicatesWithinWatermark`), so state is evicted as
    * the watermark advances — bounded memory on an unbounded stream.
    * For dedup against ALL history, use [[dedupAgainstStore]]. */
  def dedupWithinWatermark(docs: DataFrame, textCol: String, tsCol: String,
                           watermark: String): DataFrame =
    docs.withColumn("fingerprint", graft.text.Text.fingerprint(col(textCol)))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("fingerprint")

  /** Streaming NEAR-dedup within a watermark horizon: drop documents
    * whose SimHash signature collides with a recently-seen one. SimHash
    * puts near-identical texts (small token edits, reordered whitespace)
    * in the same 32-bit signature with high probability, so this catches
    * the boilerplate-variant duplicates exact fingerprints miss — while
    * staying a state-store-backed `dropDuplicatesWithinWatermark` with
    * bounded memory. Hamming-radius matching (signatures within k bits)
    * needs a stateful band join; that is the batch path
    * ([[graft.dedup.Dedup.simhashPairs]]) — run it over drained output
    * when radius-duplicates matter. */
  def nearDedupWithinWatermark(docs: DataFrame, textCol: String, tsCol: String,
                               watermark: String): DataFrame =
    // the single-pass Signatures expression, NOT Dedup.simhash's 32-pass
    // HOF form (bit-identical signature; the HOF form's per-bit filter
    // scans are the ad-hoc-small-data path, wrong for an unbounded
    // stream's hot loop — same reasoning as Dedup.simhashPairs)
    docs.withColumn("simhash",
        graft.functions.Signatures.simhash(graft.text.Text.tokens(col(textCol))))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("simhash")

  /** Streaming corpus curation — the incremental form of
    * [[graft.text.Curation]] for a live ingest: PII redaction
    * ([[graft.text.Scrub.redact]], applied FIRST so documents differing
    * only in contact strings collapse as duplicates), then the
    * stateless quality + language gates ([[graft.text.Curation.gateFlags]]
    * — one codegen'd projection, stream-safe), then exact dedup within
    * the watermark horizon on the already-computed fingerprint.
    * Gate-failing documents are DROPPED — a stream cannot publish a
    * retrospective funnel report; run the batch
    * [[graft.text.Curation.funnel]] over the drained output to audit.
    * Output: the input columns with `textCol` redacted. */
  def curateStream(docs: DataFrame, textCol: String, tsCol: String,
                   watermark: String,
                   cfg: graft.text.Curation.Config = graft.text.Curation.Config()): DataFrame =
    graft.text.Curation.gateFlags(
        graft.text.Scrub.redactPii(docs, textCol), textCol, cfg)
      .filter(col("lang_pass"))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("fingerprint")
      .select(docs.columns.map(col).toIndexedSeq: _*)

  /** Streaming exact-dedup against a PERSISTENT fingerprint store — the
    * incremental form of [[graft.dedup.Dedup.exactDedup]] for a corpus
    * that grows batch by batch (the shape of a training-data ingest
    * pipeline: every drained micro-batch deduplicates against
    * everything ever ingested, not just the watermark horizon).
    *
    * Per micro-batch: batch-local exact dedup (one fingerprint
    * groupBy), then one left_anti join against the store (fingerprints
    * only — a narrow single-column table), then survivors overwrite the
    * `batch_id=N` partition under BOTH `outDir` and `storeDir`. Keying
    * the store by batch_id makes the replay deterministic: a batch
    * retried after ANY crash point (including after both writes, before
    * the streaming commit) recomputes `seen` EXCLUDING its own
    * partition, so `fresh` comes out identical and both writes are
    * idempotent partition overwrites — exactly-once output. (Appending
    * an unpartitioned store instead loses data on exactly that replay:
    * the store already holds the batch's fingerprints, the anti-join
    * returns empty, and the output overwrite erases the survivors.) */
  def dedupAgainstStore(docs: DataFrame, idCol: String, textCol: String,
                        storeDir: String, outDir: String,
                        checkpoint: String): StreamingQuery =
    docs.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      val spark = batch.sparkSession
      val groups = graft.dedup.Dedup.exactGroups(batch, idCol, textCol)
      val keepers = batch.join(
        groups.select(col("keeper_id").as(idCol), col("fingerprint")), Seq(idCol))
      // Hadoop FS existence check — java.io.File would treat every
      // non-local store (hdfs://, s3a://, even file:/) as absent and
      // silently skip the against-history anti-join forever
      val storePath = new org.apache.hadoop.fs.Path(storeDir)
      val storeFs = storePath.getFileSystem(
        spark.sparkContext.hadoopConfiguration)
      // one-time migration of a pre-batch_id store (flat appended
      // parquet): fold its fingerprints into a batch_id=-1 partition,
      // then drop the flat files — a mixed flat+partitioned layout
      // breaks partition discovery, and filtering on a column the old
      // layout lacks would kill the stream on the first batch
      if (storeFs.exists(storePath)) {
        val flatFiles = storeFs.listStatus(storePath)
          .filter(st => st.isFile && !st.getPath.getName.startsWith("_"))
        if (flatFiles.nonEmpty) {
          spark.read.parquet(flatFiles.map(_.getPath.toString): _*)
            .select("fingerprint").distinct()
            .write.mode("overwrite").parquet(s"$storeDir/batch_id=-1")
          storeFs.listStatus(storePath).filter(_.isFile)
            .foreach(st => storeFs.delete(st.getPath, false))
        }
      }
      val seen =
        if (storeFs.exists(storePath))
          // exclude THIS batch's own partition: on replay the store may
          // already hold the batch's fingerprints, and anti-joining
          // against them would erase the survivors (ADVICE r3)
          spark.read.parquet(storeDir)
            .filter(col("batch_id") =!= batchId)
            .select("fingerprint")
        else spark.range(0).select(lit("").as("fingerprint"))
      val fresh = keepers.join(seen, Seq("fingerprint"), "left_anti").persist()
      try {
        // both writes OVERWRITE a batch-keyed partition dir: with `seen`
        // deterministic under replay (own partition excluded), replaying
        // batch N rewrites identical content into batch_id=N in place —
        // exactly-once output; readers just see an extra `batch_id`
        // partition column
        fresh.drop("fingerprint").write.mode("overwrite")
          .parquet(s"$outDir/batch_id=$batchId")
        fresh.select("fingerprint").write.mode("overwrite")
          .parquet(s"$storeDir/batch_id=$batchId")
      } finally fresh.unpersist()
      ()
    }
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .start()

  /** Streaming anomaly scoring with CUSTOM state: a per-key Welford
    * (count, mean, M2) accumulator lives in the state store and scores
    * each arriving value against the baseline of EVERYTHING seen before
    * it — across batches and restarts (the state checkpoint carries it).
    * This is the `flatMapGroupsWithState` form of the batch
    * rolling-z-score kernel (operators/Anomaly.scala): where the batch
    * version re-derives its baseline from a trailing window each run,
    * the stream pays O(1) state per key and never re-reads history.
    *
    * Within a batch, a key's rows are folded in (ts, value) order so
    * replay is deterministic; each value is scored BEFORE it updates
    * the state (a spike never vouches for itself). State never times
    * out here — production keys that can disappear should wrap this
    * with a timeout policy; the state is 3 numbers per key either way.
    */
  def anomalyStream(events: DataFrame, userCol: String, tsCol: String,
                    valueCol: String, minN: Int = 5,
                    threshold: Double = 3.0): org.apache.spark.sql.Dataset[AnomalyScore] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = events.sparkSession
    import spark.implicits._
    val typed = events.select(
      col(userCol).cast("long").as("user_id"),
      col(tsCol).cast("timestamp").as("ts"),
      col(valueCol).cast("double").as("value")).as[AnomalyEvent]
    typed.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[AnomalyEvent], state: GroupState[WelfordState]) =>
          var st = state.getOption.getOrElse(WelfordState(0L, 0.0, 0.0))
          val out = rows.toSeq.sortBy(e => (e.ts.getTime, e.value)).map { e =>
            val sd = if (st.n > 1) math.sqrt(st.m2 / (st.n - 1)) else 0.0
            val z = if (st.n >= minN && sd > 0) Some((e.value - st.mean) / sd)
              else None
            val n1 = st.n + 1
            val d = e.value - st.mean
            val mean1 = st.mean + d / n1
            st = WelfordState(n1, mean1, st.m2 + d * (e.value - mean1))
            AnomalyScore(uid, e.ts, e.value, n1,
              z.map(Double.box).orNull,
              z.exists(v => math.abs(v) > threshold))
          }
          state.update(st)
          out.iterator
      }
  }
}

/** Welford accumulator persisted in the streaming state store. */
case class WelfordState(n: Long, mean: Double, m2: Double)

case class AnomalyEvent(user_id: Long, ts: java.sql.Timestamp, value: Double)

case class AnomalyScore(user_id: Long, ts: java.sql.Timestamp, value: Double,
                        n_seen: Long, z: java.lang.Double, is_anomaly: Boolean)
