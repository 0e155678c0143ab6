package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Domain-mixture sampling for training-data assembly: given per-source
  * document counts, compute temperature-scaled sampling weights
  * (w_i ∝ n_i^T, the multilingual/multi-domain mixing rule — T=1 is
  * proportional, T→0 uniform) and draw a DETERMINISTIC hash-based
  * sample hitting a target corpus size (beyond the reference's
  * operator set — north-star scope).
  *
  * Determinism: a document is kept iff the first 8 hex digits of
  * md5(id) — a uniform draw in [0, 2^32) that any engine reproduces —
  * fall below its source's sampling fraction. No RNG state, no
  * partition-order dependence; the same corpus always yields the same
  * sample, and re-runs over a grown corpus keep their previous picks
  * (the property ingest pipelines need for incremental rebuilds).
  *
  * Scale shape: fractions are a per-source metadata aggregate
  * (broadcast back); the sample itself is one codegen'd filter scan.
  */
object Mixing {

  /** Per-source mixture table: (source, n_docs, weight, sample_frac)
    * where weight = n^T / Σ n^T and sample_frac = min(1, targetRows ×
    * weight / n). Weights/fractions rounded to 6dp (stable across
    * engines). */
  def temperatureFractions(df: DataFrame, sourceCol: String,
                           temperature: Double, targetRows: Long): DataFrame =
    // clamp of the unclamped form — round(least(1,x),6) ≡
    // least(1.0, round(x,6)), so this is the same numbers, one pipeline
    temperatureFractionsUnclamped(df, sourceCol, temperature, targetRows)
      .withColumn("sample_frac", least(lit(1.0), col("sample_frac")))

  /** Deterministic keep-predicate: md5-hex draw of `id` below `frac`.
    * Fraction ≥ 1 keeps everything (the hex threshold would overflow
    * 8 digits). Comparing fixed-width lowercase hex strings IS the
    * numeric comparison — same trick the oracle SQL uses. */
  def hashKeep(id: Column, frac: Column): Column =
    frac >= 1.0 ||
      substring(md5(id.cast("string")), 1, 8) <
        lower(lpad(hex(floor(frac * 4294967296.0).cast("long")), 8, "0"))

  /** Per-source mixture table WITHOUT the ≤1 clamp: `sample_frac`
    * above 1 means the source should be UPSAMPLED (seen more than
    * once per epoch) to hit the target — the high-quality-source
    * repetition every data-constrained training mix uses. */
  def temperatureFractionsUnclamped(df: DataFrame, sourceCol: String,
                                    temperature: Double,
                                    targetRows: Long): DataFrame = {
    require(temperature > 0, s"temperature must be positive, got $temperature")
    val counts = df.groupBy(col(sourceCol).as("source"))
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("__wt", pow(col("n_docs").cast("double"), temperature))
    counts
      .crossJoin(broadcast(counts.agg(sum("__wt").as("__tot"))))
      .withColumn("weight", round(col("__wt") / col("__tot"), 6))
      .withColumn("sample_frac", round(
        lit(targetRows.toDouble) * col("weight") / col("n_docs"), 6))
      .select("source", "n_docs", "weight", "sample_frac")
  }

  /** [[temperatureSample]] with replacement: a source whose fraction is
    * f ≥ 1 emits floor(f) deterministic copies of every row (tagged
    * `__epoch` 0..floor(f)-1) plus a hash-kept f−floor(f) share of an
    * extra copy; f < 1 behaves exactly like [[temperatureSample]].
    * The epoch column lets downstream shuffles (e.g. packing order,
    * shard assignment) separate the copies. Replication is an
    * `explode(sequence(...))` — no driver loop, no RNG. */
  /** Same no-clash rule as Curation.gateFlags: the sampler joins working
    * columns onto the input, so an input frame already carrying one would
    * fail later with an opaque ambiguous-reference error — reject loud. */
  private def requireNoClash(df: DataFrame, working: Seq[String]): Unit = {
    val clash = df.columns.filter(working.contains)
    require(clash.isEmpty,
      s"input frame already has mixing working column(s) ${clash.mkString(", ")} — rename or drop them first")
  }

  def temperatureSampleWithReplacement(df: DataFrame, idCol: String,
                                       sourceCol: String, temperature: Double,
                                       targetRows: Long): DataFrame = {
    requireNoClash(df, Seq("__mix_src", "sample_frac", "__epoch"))
    val fr = temperatureFractionsUnclamped(df, sourceCol, temperature, targetRows)
      .select(col("source").as("__mix_src"), col("sample_frac"))
    df.join(broadcast(fr), col(sourceCol) <=> col("__mix_src"))
      .withColumn("__epoch", explode(sequence(lit(0L),
        floor(col("sample_frac")).cast("long"))))
      // the final partial epoch keeps a (frac - floor) hash share.
      // Epoch 0 draws on the UNSALTED id — identical to
      // [[temperatureSample]]'s draw, so a source whose fraction crosses
      // 1 as the target grows keeps its previously-shipped picks (the
      // module's incremental-rebuild property); epochs ≥ 1 salt the
      // draw with the epoch index so each extra copy picks its own rows
      .filter(col("__epoch") < floor(col("sample_frac")) ||
        hashKeep(
          when(col("__epoch") === 0, col(idCol).cast("string"))
            .otherwise(concat(col(idCol).cast("string"), lit(":"), col("__epoch"))),
          col("sample_frac") - floor(col("sample_frac"))))
      .select((df.columns.map(col) :+ col("__epoch")).toIndexedSeq: _*)
  }

  /** The sampled corpus: joins each row to its source's fraction
    * (broadcast — sources are metadata-cardinality) and applies
    * [[hashKeep]] on `idCol`. Output schema = input schema. */
  def temperatureSample(df: DataFrame, idCol: String, sourceCol: String,
                        temperature: Double, targetRows: Long): DataFrame = {
    requireNoClash(df, Seq("__mix_src", "sample_frac"))
    val fr = temperatureFractions(df, sourceCol, temperature, targetRows)
      .select(col("source").as("__mix_src"), col("sample_frac"))
    // null-safe join: a null source is a real stratum — groupBy gave it
    // weight, so an equality join would silently drop its every row and
    // undershoot targetRows by that stratum's whole share
    df.join(broadcast(fr), col(sourceCol) <=> col("__mix_src"))
      .filter(hashKeep(col(idCol), col("sample_frac")))
      .select(df.columns.map(col).toIndexedSeq: _*)
  }
}
