package graft.eda

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Referential-integrity audit: for each declared FK edge, how many
  * child rows point at a parent key that doesn't exist (or at NULL)?
  * The first question a warehouse asks of a new feed — and the
  * prerequisite sanity gate before every join view the catalog builds
  * (an orphan rate > 0 silently shrinks q12's inner joins).
  *
  * Scale shape: child keys COLLAPSE first (one map-combinable groupBy
  * to the distinct-key frame carrying row counts), then one left join
  * against the parent's distinct keys decides orphan-ness per KEY and
  * the row counts sum — the corpus is never joined row-by-row, and the
  * distinct-key frames are the small side AQE broadcasts. */
object Integrity {

  /** Audit one FK edge child.childKey → parent.parentKey. NULL child
    * keys count separately (`n_null_rows` — SQL FK semantics ignore
    * them; they are reported, not counted as orphans). Returns one
    * row: (edge, n_rows, n_null_rows, n_orphan_rows, n_orphan_keys,
    * orphan_rate 6dp over non-null rows). */
  def fkAudit(child: DataFrame, childKey: String, parent: DataFrame,
              parentKey: String, edge: String): DataFrame = {
    val keys = child.groupBy(col(childKey).as("__k"))
      .agg(count(lit(1)).as("__c"))
    val pk = parent.select(col(parentKey).as("__pk")).distinct()
    val joined = keys.join(pk, col("__k") === col("__pk"), "left")
    val isNullKey = col("__k").isNull
    val isOrphan = !isNullKey && col("__pk").isNull
    joined.agg(
      sum("__c").cast("long").as("n_rows"),
      sum(when(isNullKey, col("__c")).otherwise(0L)).cast("long")
        .as("n_null_rows"),
      sum(when(isOrphan, col("__c")).otherwise(0L)).cast("long")
        .as("n_orphan_rows"),
      sum(when(isOrphan, 1L).otherwise(0L)).cast("long")
        .as("n_orphan_keys"),
      round(
        sum(when(isOrphan, col("__c")).otherwise(0L)).cast("double") /
          sum(when(!isNullKey, col("__c")).otherwise(0L)), 6)
        .as("orphan_rate"))
      .select(lit(edge).as("edge"), col("n_rows"), col("n_null_rows"),
        col("n_orphan_rows"), col("n_orphan_keys"), col("orphan_rate"))
  }

  /** DuckDB twin of ONE [[fkAudit]] edge; compose edges with UNION ALL
    * (matching the Spark side's union of per-edge frames). */
  def fkAuditOracleSql(childTable: String, childKey: String,
                       parentTable: String, parentKey: String,
                       edge: String): String =
    s"""SELECT '$edge' AS edge,
          CAST(SUM(c) AS BIGINT) AS n_rows,
          CAST(SUM(CASE WHEN k IS NULL THEN c ELSE 0 END) AS BIGINT)
            AS n_null_rows,
          CAST(SUM(CASE WHEN k IS NOT NULL AND pk IS NULL THEN c
            ELSE 0 END) AS BIGINT) AS n_orphan_rows,
          CAST(SUM(CASE WHEN k IS NOT NULL AND pk IS NULL THEN 1
            ELSE 0 END) AS BIGINT) AS n_orphan_keys,
          ROUND(CAST(SUM(CASE WHEN k IS NOT NULL AND pk IS NULL THEN c
              ELSE 0 END) AS DOUBLE)
            / SUM(CASE WHEN k IS NOT NULL THEN c ELSE 0 END), 6)
            AS orphan_rate
        FROM (SELECT $childKey AS k, COUNT(*) AS c FROM $childTable
              GROUP BY $childKey) ck
        LEFT JOIN (SELECT DISTINCT $parentKey AS pk FROM $parentTable) pp
          ON ck.k = pp.pk"""
}
