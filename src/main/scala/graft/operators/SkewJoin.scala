package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-salted equi-join: the classic remedy when ONE join key holds a
  * disproportionate share of the fact rows and a plain hash join
  * funnels them all through a single reducer. The fact side gets a
  * deterministic salt in [0, k) (a hash of the whole row's id, NOT an
  * RNG — reproducible across retries and engines); the dimension side
  * is replicated k× with an explode; the join key becomes (key, salt),
  * spreading each hot key over k reducers.
  *
  * Result-identical to the plain join (each fact row matches exactly
  * the one replica carrying its salt), which is what the oracle
  * compare proves. AQE's skew-join handles sort-merge skew
  * automatically at runtime; explicit salting remains the tool when
  * the skew is in a shuffled HASH aggregate/join AQE won't split, or
  * when the layout must be fixed ahead of time (bucketed writes).
  * Cost: dimension side ×k (broadcastable dims shouldn't use this —
  * broadcast() them instead; this is for mid-size dimensions that
  * must shuffle).
  */
object SkewJoin {

  /** Inner-join `fact` to `dim` on `key`, salted `k` ways. `saltBy` is
    * the fact column whose hash picks the salt (an id column — any
    * stable column works; using the key itself would defeat the
    * spread). Output columns: fact.* then dim.* minus the join key. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 saltBy: String, k: Int = 8): DataFrame = {
    require(k >= 1, s"salt fan-out must be >= 1, got $k")
    val salted = fact.withColumn("__salt",
      pmod(xxhash64(col(saltBy)), lit(k.toLong)))
    val replicated = dim
      .withColumn("__salt", explode(sequence(lit(0L), lit(k.toLong - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
