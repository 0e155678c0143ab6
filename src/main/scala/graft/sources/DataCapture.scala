package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** SageMaker endpoint data-capture parsing — the reference's capture
  * pipeline re-expressed on Spark
  * (reference: src/workbench/core/artifacts/data_capture_core.py:280-350,
  * utils/monitor_utils.py:77-170).
  *
  * Capture files are JSONL; each record carries
  * `captureData.endpointInput` / `endpointOutput` payloads with a
  * `data` string and an `encoding` (CSV: header line + body lines;
  * JSON: scalar dict = one row, dict-of-lists = one row per element),
  * plus `eventMetadata.inferenceTime`.
  *
  * Spark-first: the record scan is a schema'd JSON read; CSV payload
  * groups parse via `from_csv` with a schema inferred once per header
  * (the reference's "parse each header group in a single pass" — here
  * the single pass is distributed); JSON payloads via `from_json` with
  * a sampled schema. Different payload schemas align by column like the
  * reference's concat (unionByName allowMissingColumns).
  */
object DataCapture {

  private def sideStruct = StructType(Seq(
    StructField("data", StringType),
    StructField("encoding", StringType),
    StructField("mode", StringType),
    StructField("observedContentType", StringType)))

  /** JSONL record shape of a SageMaker capture file. */
  val captureSchema: StructType = StructType(Seq(
    StructField("captureData", StructType(Seq(
      StructField("endpointInput", sideStruct),
      StructField("endpointOutput", sideStruct)))),
    StructField("eventMetadata", StructType(Seq(
      StructField("eventId", StringType),
      StructField("inferenceTime", StringType)))),
    StructField("eventVersion", StringType)))

  /** Read capture JSONL file(s) → (input rows, output rows). */
  def readCapture(spark: SparkSession, path: String): (DataFrame, DataFrame) = {
    val raw = spark.read.schema(captureSchema).json(path)
    (parseSide(raw, "Input"), parseSide(raw, "Output"))
  }

  /** One side's payloads of a raw capture frame → parsed rows. */
  def parseSide(raw: DataFrame, side: String): DataFrame =
    parsePayloads(raw.select(
      col(s"captureData.endpoint$side.data").as("data"),
      col(s"captureData.endpoint$side.encoding").as("encoding"),
      to_timestamp(col("eventMetadata.inferenceTime")).as("timestamp")))

  /** Shared CSV payload kernel: explode body lines of `(data, timestamp)`
    * rows and parse each with `schema`. `requireHeader` guards against
    * positional transposition — a payload whose header differs from the
    * schema's column order is SKIPPED (from_csv binds positionally and
    * would otherwise silently swap columns). */
  private def parseCsvLines(payloadRows: DataFrame, schema: StructType,
                            requireHeader: Option[String]): DataFrame = {
    val withHeader = payloadRows
      .withColumn("header", substring_index(col("data"), "\n", 1))
    val guarded = requireHeader match {
      case Some(h) => withHeader.filter(trim(col("header")) === h)
      case None => withHeader
    }
    guarded
      .withColumn("line", explode(split(col("data"), "\n")))
      .filter(col("line") =!= col("header") && length(trim(col("line"))) > 0)
      .withColumn("__p", from_csv(col("line"), schema, Map.empty[String, String]))
      .select(col("timestamp") +: schema.fieldNames.toSeq
        .map(f => col(s"__p.$f").as(f)): _*)
  }

  /** Streaming-safe side parse: the payload schema is supplied (a stream
    * cannot collect a sample to infer), CSV payloads only — the endpoint
    * capture default. Payloads whose header does not match the schema's
    * column order are skipped rather than transposed. Works identically
    * on batch and streaming frames — the kernel behind
    * [[graft.streaming.Streaming.captureStreamParsed]]. */
  def parseSideWithSchema(raw: DataFrame, side: String,
                          schema: StructType): DataFrame = {
    val typed = raw.select(
      col(s"captureData.endpoint$side.data").as("data"),
      upper(col(s"captureData.endpoint$side.encoding")).as("encoding"),
      to_timestamp(col("eventMetadata.inferenceTime")).as("timestamp"))
      .filter(col("data").isNotNull && col("encoding") === "CSV")
    parseCsvLines(typed, schema, Some(schema.fieldNames.mkString(",")))
  }

  /** Parse (data, encoding, timestamp) payload rows into one DataFrame —
    * the `parse_payloads` contract (monitor_utils.py:104-170). Payloads
    * with an unsupported encoding are skipped. */
  def parsePayloads(payloads: DataFrame, maxHeaders: Int = 100): DataFrame = {
    val spark = payloads.sparkSession
    import spark.implicits._
    val typed = payloads
      .select(col("data"), upper(col("encoding")).as("encoding"), col("timestamp"))
      .filter(col("data").isNotNull)

    // ── CSV: one from_csv pass per distinct header (dtype inference is
    //    per header group, like the reference's single read_csv) ──
    val csv = typed.filter(col("encoding") === "CSV")
      .withColumn("header", substring_index(col("data"), "\n", 1))
    // cardinality gate (like stratifiedSplit's maxStrata): a real capture
    // dir has a handful of schemas, but each distinct header costs a
    // driver-side schema inference + one union branch — adversarial/
    // corrupt input with per-payload headers must fail loudly, not OOM
    // the driver. The limit bounds the collect at maxHeaders+1 rows.
    val headers = csv.select("header").distinct().limit(maxHeaders + 1)
      .as[String].collect().toSeq
    require(headers.length <= maxHeaders,
      s"parsePayloads: more than $maxHeaders distinct CSV headers in the " +
        "capture payloads — this looks like corrupt/adversarial capture " +
        "data; raise maxHeaders explicitly if the schema count is real")
    val csvFrames = headers.map { h =>
      val group = csv.filter(col("header") === h)
      val sample = group
        .select(explode(split(col("data"), "\n")).as("line"))
        .filter(col("line") =!= h && length(trim(col("line"))) > 0)
        .limit(100).as[String].collect().toSeq
      val schema = spark.read.option("header", "true").option("inferSchema", "true")
        .csv((h +: sample).toDS()).schema
      // schema is inferred FROM this header, so positional binding is
      // column-order-correct per group (requireHeader redundant here)
      parseCsvLines(group.drop("header"), schema, None)
    }

    // ── JSON: sampled schema; dict-of-lists explodes to one row per
    //    element (monitor_utils.py parse_json) ──
    val json = typed.filter(col("encoding") === "JSON")
    val jsonFrames =
      if (json.isEmpty) Seq.empty
      else {
        val schema = spark.read.json(json.select("data").as[String]).schema
        val parsed = json.withColumn("__p", from_json(col("data"), schema))
        if (schema.fields.nonEmpty &&
            schema.fields.forall(_.dataType.isInstanceOf[ArrayType]))
          Seq(parsed
            .withColumn("__z", explode(arrays_zip(
              schema.fieldNames.toSeq.map(f => col(s"__p.$f").as(f)): _*)))
            .select(col("timestamp") +: schema.fieldNames.toSeq
              .map(f => col(s"__z.$f").as(f)): _*))
        else
          Seq(parsed.select(col("timestamp") +: schema.fieldNames.toSeq
            .map(f => col(s"__p.$f").as(f)): _*))
      }

    val frames = csvFrames ++ jsonFrames
    if (frames.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(Seq(StructField("timestamp", TimestampType))))
    else frames.reduce(_.unionByName(_, allowMissingColumns = true))
  }
}
