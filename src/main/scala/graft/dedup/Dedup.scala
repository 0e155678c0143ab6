package graft.dedup

import graft.text.Text
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operator pack for large-scale training-data pipelines.
  *
  * Scale design: every variant avoids the O(N²) all-pairs comparison.
  *  - exact: one hash-groupBy (single shuffle on the fingerprint).
  *  - MinHash-LSH: shingle → minhash signature → band keys → equi-join on
  *    band key (shuffle is hash-partitioned on band buckets; only
  *    same-bucket candidates are ever paired) → exact Jaccard verify.
  *  - SimHash: 32-bit signature → band-of-bits blocking → Hamming verify.
  * All hashing is Spark's deterministic murmur3 `hash()` — no RNG at
  * runtime, so results are reproducible across runs/cluster sizes.
  */
object Dedup {

  /** Exact dedup: group identical (normalized) texts, keep the lowest id
    * as the canonical representative. Returns
    * (fingerprint, keeper_id, n_dups).
    */
  def exactGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(Text.fingerprint(col(textCol)).as("fingerprint"), col(idCol).as("id"))
      .groupBy("fingerprint")
      .agg(min("id").as("keeper_id"), count(lit(1)).as("n_dups"))

  /** Rows with the duplicates removed (keep first occurrence by id). */
  def exactDedup(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val keep = exactGroups(df, idCol, textCol).select(col("keeper_id").as(idCol))
    df.join(keep, Seq(idCol), "left_semi")
  }

  /** MinHash signature: `numHashes` minima of salted murmur3 over the
    * shingle set. Pure column expressions (array_min/transform) — stays in
    * codegen, one pass.
    */
  def minhashSignature(text: Column, shingleSize: Int, numHashes: Int): Column = {
    val sh = array_distinct(Text.shingles(text, shingleSize))
    val mins = (0 until numHashes).map { seed =>
      array_min(transform(sh, s => hash(s, lit(seed))))
    }
    array(mins: _*)
  }

  /** MinHash + LSH banding candidate pairs, verified with exact n-gram
    * Jaccard. `bands` × `rowsPerBand` = signature length. Pairs are emitted
    * once (id_a < id_b) with their true Jaccard similarity.
    *
    * The only shuffles are (a) the explode+groupBy on band keys and (b) the
    * band-key self-join — both hash-partitioned and skew-safe for normal
    * corpora (a pathological bucket means near-global duplication, which a
    * pre-count cap could guard; see `maxBucket`).
    */
  def minhashLsh(df: DataFrame, idCol: String, textCol: String,
                 shingleSize: Int = 3, numHashes: Int = 32, bands: Int = 8,
                 threshold: Double = 0.5, maxBucket: Int = 1000): DataFrame = {
    val rowsPerBand = numHashes / bands
    val docs = df.select(col(idCol).as("id"),
      array_distinct(Text.shingles(col(textCol), shingleSize)).as("sh"),
      minhashSignature(col(textCol), shingleSize, numHashes).as("sig"))
    // band key = hash of the band's slice of the signature
    val banded = docs.select(col("id"), col("sh"), explode(
      array((0 until bands).map(b =>
        struct(lit(b).as("band"), hash(slice(col("sig"), b * rowsPerBand + 1, rowsPerBand)).as("bkey"))): _*)
    ).as("bk"))
      .select(col("id"), col("sh"), col("bk.band"), col("bk.bkey"))
    // guard against pathological buckets (near-global dup text)
    val counted = banded.withColumn("__n",
      count(lit(1)).over(org.apache.spark.sql.expressions.Window.partitionBy("band", "bkey")))
      .filter(col("__n") <= maxBucket).drop("__n")
    val l = counted.select(col("band"), col("bkey"), col("id").as("id_a"), col("sh").as("sh_a"))
    val r = counted.select(col("band"), col("bkey"), col("id").as("id_b"), col("sh").as("sh_b"))
    val jac = size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
      size(array_union(col("sh_a"), col("sh_b")))
    l.join(r, Seq("band", "bkey"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("sh_a"), col("sh_b"))
      .dropDuplicates("id_a", "id_b")
      .select(col("id_a"), col("id_b"), round(jac, 6).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** 32-bit SimHash over whitespace tokens: per bit, majority vote of the
    * token-hash bits. Pure column expressions.
    */
  def simhash(text: Column): Column = {
    val hashes = transform(Text.tokens(text), t => hash(t))
    val n = size(hashes)
    val bits = (0 until 32).map { i =>
      val ones = size(filter(hashes, h => shiftright(h, i).bitwiseAND(1) === 1))
      when(ones * 2 >= n, lit(1L << i)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** SimHash near-dup pairs: block on 4 8-bit bands, verify Hamming ≤
    * `maxHamming`. Returns (id_a, id_b, hamming).
    */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 3): DataFrame = {
    val docs = df.select(col(idCol).as("id"), simhash(col(textCol)).as("sig"))
    val banded = docs.select(col("id"), col("sig"), explode(array(
      (0 until 4).map(b => struct(lit(b).as("band"),
        shiftright(col("sig"), b * 8).bitwiseAND(0xff).as("bkey"))): _*)).as("bk"))
      .select(col("id"), col("sig"), col("bk.band"), col("bk.bkey"))
    val l = banded.select(col("band"), col("bkey"), col("id").as("id_a"), col("sig").as("sig_a"))
    val r = banded.select(col("band"), col("bkey"), col("id").as("id_b"), col("sig").as("sig_b"))
    val ham = bit_count(col("sig_a").bitwiseXOR(col("sig_b")))
    l.join(r, Seq("band", "bkey"))
      .filter(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .select(col("id_a"), col("id_b"), ham.as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  /** Exact word-level Jaccard near-dup pairs over a bounded id range —
    * the brute-force baseline (oracle-checkable; LSH variants above are the
    * scale path). Emits (id_a, id_b, jaccard ≥ threshold).
    */
  def jaccardPairs(df: DataFrame, idCol: String, textCol: String,
                   threshold: Double): DataFrame = {
    val docs = df.select(col(idCol).as("id"),
      array_distinct(Text.tokens(col(textCol))).as("w"))
    val l = docs.select(col("id").as("id_a"), col("w").as("w_a"))
    val r = docs.select(col("id").as("id_b"), col("w").as("w_b"))
    val jac = size(array_intersect(col("w_a"), col("w_b"))).cast("double") /
      size(array_union(col("w_a"), col("w_b")))
    l.crossJoin(r).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), round(jac, 6).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }
}
