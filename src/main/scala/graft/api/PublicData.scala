package graft.api

import org.apache.spark.sql.{DataFrame, SparkSession}

/** PublicData: read-only list/get over a shared dataset root
  * (reference: api/public_data.py:16-100 — an anonymous public S3
  * bucket of example datasets; here any mounted/shared directory of
  * parquet or CSV files, listed by relative path with the extension
  * stripped, exactly like the reference strips `.csv`/`.parquet` from
  * the S3 keys). No write surface exists by design. */
class PublicData(spark: SparkSession, root: String) {
  private val exts = Seq(".parquet", ".csv", ".csv.gz", ".jsonl", ".json")

  private def fsOf(p: org.apache.hadoop.fs.Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Dataset names: relative paths without extensions
    * (public_data.py `list`). */
  def list(): Seq[String] = {
    val rootPath = new org.apache.hadoop.fs.Path(root)
    val fs = fsOf(rootPath)
    if (!fs.exists(rootPath)) return Seq.empty
    val prefix = fs.makeQualified(rootPath).toString
    def walk(p: org.apache.hadoop.fs.Path): Seq[String] =
      fs.listStatus(p).toSeq.flatMap { s =>
        val name = s.getPath.getName
        if (s.isDirectory) {
          // a parquet output DIRECTORY is one dataset, not a subtree
          if (fs.exists(new org.apache.hadoop.fs.Path(s.getPath, "_SUCCESS")))
            Seq(s.getPath.toString)
          else walk(s.getPath)
        } else if (exts.exists(name.endsWith))
          Seq(s.getPath.toString)
        else Seq.empty
      }
    walk(rootPath)
      .map(_.stripPrefix(prefix).stripPrefix("/"))
      .map(p => exts.find(p.endsWith).map(e => p.dropRight(e.length)).getOrElse(p))
      .sorted.distinct
  }

  /** Load a dataset by its listed name (public_data.py `get` — format
    * dispatched from the stored object's extension). */
  def get(name: String): DataFrame = {
    val base = new org.apache.hadoop.fs.Path(s"$root/$name")
    val fs = fsOf(base)
    val candidate = (Seq("") ++ exts)
      .map(e => new org.apache.hadoop.fs.Path(s"$root/$name$e"))
      .find(fs.exists)
      .getOrElse(throw new IllegalArgumentException(
        s"PublicData: no dataset named '$name' under $root"))
    val path = candidate.toString
    if (path.endsWith(".csv") || path.endsWith(".csv.gz"))
      spark.read.option("header", "true").option("inferSchema", "true").csv(path)
    else if (path.endsWith(".jsonl") || path.endsWith(".json"))
      spark.read.json(path)
    else spark.read.parquet(path)
  }
}
