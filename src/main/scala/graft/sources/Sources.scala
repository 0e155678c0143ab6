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
    */
  def createDataSource(spark: SparkSession, df: DataFrame, name: String,
                       warehouse: Option[String] = None): DataFrame = {
    warehouse match {
      case Some(dir) =>
        df.write.mode("overwrite").parquet(s"$dir/$name")
        val back = spark.read.parquet(s"$dir/$name")
        back.createOrReplaceTempView(name)
        back
      case None =>
        df.createOrReplaceTempView(name)
        df
    }
  }
}
