package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Shard-balanced corpus export — the "write N-row parquet shards"
  * step at the end of every curation pipeline (beyond the reference's
  * operator set — north-star scope). Downstream trainers want shards
  * of roughly equal row counts regardless of how skewed the upstream
  * partitioning was (per-source filters leave wildly uneven
  * partitions; a plain write would mirror that skew into the files).
  *
  * Scale shape: one count (columnar metadata scan) sizes the shard
  * grid; `repartitionByRange` on `hash(id)` spreads rows near-
  * uniformly regardless of upstream skew (range boundaries come from
  * a sample of the hash values, so shards land within a few percent
  * of the target); `maxRecordsPerFile` hard-caps any shard the
  * sampling still left heavy — an overfull shard splits into a full
  * file plus a remainder file, never an oversized one.
  */
object CorpusWriter {

  /** Write `df` to `path` as ~`rowsPerShard`-row parquet shards.
    * Returns the shard count. */
  def writeShards(df: DataFrame, path: String, rowsPerShard: Long,
                  idCol: String): Int = {
    require(rowsPerShard > 0, s"rowsPerShard must be positive, got $rowsPerShard")
    val n = df.count()
    val shards = math.max(1L, (n + rowsPerShard - 1) / rowsPerShard).toInt
    df.repartitionByRange(shards, hash(col(idCol)), col(idCol))
      .write.option("maxRecordsPerFile", rowsPerShard)
      .mode("overwrite").parquet(path)
    shards
  }
}
