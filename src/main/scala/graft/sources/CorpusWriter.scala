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
    * Returns the shard count.
    *
    * Sizing the grid needs the row count; when `df` is an expensive
    * pipeline (a full curation funnel, not a raw scan) the count would
    * re-execute every upstream shuffle, so either pass `knownRows`
    * (pipelines usually just counted their output for the funnel
    * report) or let this persist `df` around the count+write and
    * release it after. */
  def writeShards(df: DataFrame, path: String, rowsPerShard: Long,
                  idCol: String, knownRows: Option[Long] = None): Int = {
    require(rowsPerShard > 0, s"rowsPerShard must be positive, got $rowsPerShard")
    val staged = if (knownRows.isEmpty)
      df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    else df
    try {
      val n = knownRows.getOrElse(staged.count())
      val shards = math.max(1L, (n + rowsPerShard - 1) / rowsPerShard).toInt
      staged.repartitionByRange(shards, hash(col(idCol)), col(idCol))
        .write.option("maxRecordsPerFile", rowsPerShard)
        .mode("overwrite").parquet(path)
      shards
    } finally if (knownRows.isEmpty) staged.unpersist()
  }
}
