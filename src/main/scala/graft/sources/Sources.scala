package graft.sources

import graft.transforms.Transforms
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Ingest layer: file → normalized DataSource.
  *
  * Mirrors the reference's loaders (CSVToDataSource / JSONToDataSource /
  * S3HeavyToDataSource — reference: src/workbench/core/transforms/
  * data_loaders/) with the §1.2 coercion rules applied at ingest, and the
  * Glue `Relationalize` nested-flattening re-expressed as a recursive
  * StructType walk.
  */
object Sources {

  /** CSV → normalized DataFrame (header + schema inference, lowercase
    * sanitized column names)
    * (reference: data_loaders/light/csv_to_data_source.py:38-66). */
  def readCsv(spark: SparkSession, path: String): DataFrame =
    Transforms.normalizeColumnNames(
      spark.read.option("header", "true").option("inferSchema", "true").csv(path))

  /** JSONL → normalized DataFrame
    * (reference: data_loaders/light/json_to_data_source.py:37-60). */
  def readJson(spark: SparkSession, path: String): DataFrame =
    Transforms.normalizeColumnNames(spark.read.json(path))

  /** ORC → normalized DataFrame. Same columnar/pushdown story as
    * parquet (Spark-native reader: predicate pushdown + column pruning
    * reach the stripe reader); the interchange format a Hive-era lake
    * hands us instead of parquet. */
  def readOrc(spark: SparkSession, path: String): DataFrame =
    Transforms.normalizeColumnNames(spark.read.orc(path))

  /** DataFrame → ORC (round-trip counterpart of [[readOrc]]). */
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  /** Heavy path: JSONL with nested structs → flattened, `.`→`_` names,
    * string→timestamp casts for given columns
    * (reference: data_loaders/heavy/s3_heavy_to_data_source.py:91-221,
    * Relationalize at 127-148). */
  def readJsonFlattened(spark: SparkSession, path: String,
                        timestampCols: Seq[String] = Nil): DataFrame = {
    val flat = flattenStructs(spark.read.json(path))
    val withTs = timestampCols.foldLeft(flat) { (d, c) =>
      if (d.columns.contains(c)) d.withColumn(c, to_timestamp(col(c))) else d
    }
    Transforms.normalizeColumnNames(withTs)
  }

  /** Recursively flatten nested StructType columns to `a_b_c` top-level
    * columns (Glue Relationalize equivalent, minus array pivoting —
    * arrays are kept as typed ArrayType columns, an upgrade over the
    * reference which treats them as opaque strings). */
  def flattenStructs(df: DataFrame): DataFrame = {
    def expand(schema: StructType, prefix: String): Seq[Column] =
      schema.fields.flatMap { f =>
        val name = if (prefix.isEmpty) f.name else s"$prefix.${f.name}"
        val alias = name.replace(".", "_")
        f.dataType match {
          case s: StructType => expand(s, name)
          case _ => Seq(col(name).as(alias))
        }
      }
    val cols = expand(df.schema, "")
    df.select(cols: _*)
  }

  /** Register a normalized DataFrame as a named table in the session
    * catalog — the DataSource "creation" step. Parquet-backed when a
    * warehouse location is given, temp view otherwise.
    *
    * `partitionBy` enables partition pruning on the listed columns —
    * the reference leaves this unimplemented (`partition_cols=None`
    * FIXME at pandas_to_data.py:142-145); at 100 TB it is the first
    * knob that matters (a date/tenant partition turns full scans into
    * directory listings).
    */
  def createDataSource(spark: SparkSession, df: DataFrame, name: String,
                       warehouse: Option[String] = None,
                       partitionBy: Seq[String] = Nil): DataFrame = {
    warehouse match {
      case Some(dir) =>
        val writer = df.write.mode("overwrite")
        (if (partitionBy.nonEmpty) writer.partitionBy(partitionBy: _*) else writer)
          .parquet(s"$dir/$name")
        val back = spark.read.parquet(s"$dir/$name")
        back.createOrReplaceTempView(name)
        back
      case None =>
        df.createOrReplaceTempView(name)
        df
    }
  }

  /** Bucketed managed table: pre-hash-partitions rows by the join key so
    * equi-joins between tables bucketed on the same key need NO shuffle
    * (co-located join). Requires the session catalog (saveAsTable).
    */
  def createBucketedTable(spark: SparkSession, df: DataFrame, name: String,
                          bucketBy: String, buckets: Int): DataFrame = {
    df.write.mode("overwrite")
      .bucketBy(buckets, bucketBy).sortBy(bucketBy)
      .format("parquet").saveAsTable(name)
    spark.table(name)
  }
}
