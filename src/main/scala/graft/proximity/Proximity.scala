package graft.proximity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Proximity / KNN operator pack.
  *
  * The reference runs KNN client-side (sklearn NearestNeighbors / chunked
  * sparse Ruzicka — reference: src/workbench/algorithms/dataframe/
  * proximity.py:100-271, feature_space_proximity.py:65-104,
  * fingerprint_proximity.py:19-160). Here the same semantics are expressed
  * as Spark joins so they distribute:
  *
  *  - exact top-k: broadcast the (small) query side, crossJoin against the
  *    reference side, window rank per query id. The reference side is never
  *    collected — scales to arbitrarily large reference sets as long as the
  *    query batch is broadcast-able (mirrors the reference's 1024-row query
  *    chunking, fingerprint_proximity.py:32-45).
  *  - approximate: MinHash-LSH banding (see graft.dedup) for Jaccard-like
  *    metrics; random-hyperplane buckets for cosine (simhash-style).
  *
  * Canonical result schema matches the reference: (id, neighbor_id,
  * distance, …) with self-exclusion and near-zero clamp at 1e-6
  * (proximity.py:201-271).
  */
object Proximity {

  /** Cosine similarity between two double-array columns. Computed with
    * codegen'd higher-order functions (zip_with/aggregate) — no UDF.
    */
  def cosine(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)
    val na = sqrt(aggregate(a, lit(0.0), (acc, v) => acc + v * v))
    val nb = sqrt(aggregate(b, lit(0.0), (acc, v) => acc + v * v))
    dot / (na * nb)
  }

  /** Euclidean distance between two double-array columns. */
  def euclidean(a: Column, b: Column): Column =
    sqrt(aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0), (acc, v) => acc + v))

  /** Ruzicka (weighted-Tanimoto) distance on count vectors:
    * d = 1 − Σmin(a,b)/Σmax(a,b)
    * (reference identity: fingerprint_proximity.py:27-30 uses
    * 2·L1/(Sq+Sr+L1); equivalent to 1 − Σmin/Σmax for non-negative counts).
    */
  def ruzicka(a: Column, b: Column): Column = {
    val smin = aggregate(zip_with(a, b, (x, y) => least(x, y)), lit(0.0), (acc, v) => acc + v)
    val smax = aggregate(zip_with(a, b, (x, y) => greatest(x, y)), lit(0.0), (acc, v) => acc + v)
    lit(1.0) - when(smax === 0, lit(1.0)).otherwise(smin / smax)
  }

  /** Exact brute-force top-k neighbor join.
    *
    * @param queries  query rows (id + vector); SMALL — gets broadcast
    * @param refs     reference rows (id + vector); arbitrarily large
    * @param distance (queryVec, refVec) => distance column (ascending = closer)
    * @return (id, neighbor_id, distance) — k rows per query id,
    *         self-pairs excluded, distances < 1e-6 clamped to 0 like the
    *         reference (proximity.py near-zero clamp).
    */
  def knnJoin(queries: DataFrame, refs: DataFrame, idCol: String, vecCol: String,
              k: Int, distance: (Column, Column) => Column): DataFrame = {
    val q = queries.select(col(idCol).as("id"), col(vecCol).as("__qv"))
    val r = refs.select(col(idCol).as("neighbor_id"), col(vecCol).as("__rv"))
    val d = distance(col("__qv"), col("__rv"))
    val pairs = r.crossJoin(broadcast(q))
      .filter(col("id") =!= col("neighbor_id"))
      .select(col("id"), col("neighbor_id"),
        when(d < 1e-6, 0.0).otherwise(d).as("distance"))
    val w = Window.partitionBy(col("id")).orderBy(asc("distance"), asc("neighbor_id"))
    pairs.withColumn("__rank", row_number().over(w))
      .filter(col("__rank") <= k)
      .drop("__rank")
  }

  /** Radius variant: all neighbors within `radius`
    * (reference: fingerprint_proximity.py:142-160). */
  def radiusJoin(queries: DataFrame, refs: DataFrame, idCol: String, vecCol: String,
                 radius: Double, distance: (Column, Column) => Column): DataFrame = {
    val q = queries.select(col(idCol).as("id"), col(vecCol).as("__qv"))
    val r = refs.select(col(idCol).as("neighbor_id"), col(vecCol).as("__rv"))
    val d = distance(col("__qv"), col("__rv"))
    r.crossJoin(broadcast(q))
      .filter(col("id") =!= col("neighbor_id"))
      .select(col("id"), col("neighbor_id"),
        when(d < 1e-6, 0.0).otherwise(d).as("distance"))
      .filter(col("distance") <= radius)
  }

  /** Brute-force cosine top-k similarity search over an embedding column —
    * the ANN baseline. Returns (id, neighbor_id, similarity), most similar
    * first per id.
    */
  def cosineTopK(queries: DataFrame, refs: DataFrame, idCol: String, vecCol: String,
                 k: Int): DataFrame = {
    val toD: Column => Column = c => transform(c, x => x.cast("double"))
    val q = queries.select(col(idCol).as("id"), toD(col(vecCol)).as("__qv"))
    val r = refs.select(col(idCol).as("neighbor_id"), toD(col(vecCol)).as("__rv"))
    val sim = cosine(col("__qv"), col("__rv"))
    val pairs = r.crossJoin(broadcast(q))
      .filter(col("id") =!= col("neighbor_id"))
      .select(col("id"), col("neighbor_id"), sim.as("similarity"))
    val w = Window.partitionBy(col("id")).orderBy(desc("similarity"), asc("neighbor_id"))
    pairs.withColumn("__rank", row_number().over(w))
      .filter(col("__rank") <= k)
      .drop("__rank")
  }

  /** Scaled-Euclidean feature-space KNN — the reference's
    * FeatureSpaceProximity backend (StandardScaler + NearestNeighbors,
    * reference: src/workbench/algorithms/dataframe/
    * feature_space_proximity.py:65-104). Features are z-scored with
    * global mean/std (one aggregate pass → broadcast literals), then the
    * standard knnJoin runs on the standardized vectors.
    */
  def featureSpaceKnn(queries: DataFrame, refs: DataFrame, idCol: String,
                      featureCols: Seq[String], k: Int): DataFrame = {
    val statAggs = featureCols.flatMap(c =>
      Seq(avg(col(c)).as(s"${c}__mu"), stddev(col(c)).as(s"${c}__sd")))
    val stats = refs.agg(statAggs.head, statAggs.tail: _*).head()
    def standardized(df: DataFrame): DataFrame = {
      val vec = array(featureCols.zipWithIndex.map { case (c, i) =>
        val mu = if (stats.isNullAt(2 * i)) 0.0 else stats.getDouble(2 * i)
        val sd = if (stats.isNullAt(2 * i + 1)) 1.0 else stats.getDouble(2 * i + 1)
        ((col(c) - mu) / (if (sd == 0) 1.0 else sd)).cast("double")
      }: _*)
      df.withColumn("__z", vec)
    }
    knnJoin(standardized(queries), standardized(refs), idCol, "__z", k, euclidean)
  }

  /** IVF-style approximate cosine top-k — the other scale path.
    *
    * A KMeans coarse quantizer (trained on a sample of the reference set)
    * assigns every reference vector to its nearest centroid cell; each
    * query probes only its `nProbe` nearest cells. The candidate join is
    * a hash-partitioned equi-join on cell id — O(|Q|·|R|·nProbe/k) pairs
    * instead of the brute-force |Q|·|R|. Centroids are broadcast (tiny);
    * the reference side is scanned once to assign cells.
    */
  def cosineTopKIvf(queries: DataFrame, refs: DataFrame, idCol: String, vecCol: String,
                    k: Int, nCells: Int = 16, nProbe: Int = 4,
                    seed: Long = 42L): DataFrame = {
    import org.apache.spark.ml.feature.VectorAssembler
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
    val toD: Column => Column = c => transform(c, x => x.cast("double"))
    val r = refs.select(col(idCol).as("neighbor_id"), toD(col(vecCol)).as("__rv"))
    val q = queries.select(col(idCol).as("id"), toD(col(vecCol)).as("__qv"))
    // train the coarse quantizer on the reference vectors
    val km = new KMeans().setK(nCells).setSeed(seed)
      .setFeaturesCol("__vec").setPredictionCol("__cell")
      .fit(r.withColumn("__vec", array_to_vector(col("__rv"))))
    val centroids = km.clusterCenters.zipWithIndex.map { case (c, i) =>
      (i, c.toArray.toSeq)
    }.toSeq
    val centDf = broadcast(
      refs.sparkSession.createDataFrame(centroids).toDF("__cell", "__centroid"))
    // assign refs to their cell; queries fan out to their nProbe cells
    val rCells = km.transform(r.withColumn("__vec", array_to_vector(col("__rv"))))
      .select(col("neighbor_id"), col("__rv"), col("__cell"))
    val qCells = q.crossJoin(centDf)
      .withColumn("__sim", cosine(col("__qv"), col("__centroid")))
      .withColumn("__rank", row_number().over(
        Window.partitionBy("id").orderBy(desc("__sim"), asc("__cell"))))
      .filter(col("__rank") <= nProbe)
      .select(col("id"), col("__qv"), col("__cell"))
    val w = Window.partitionBy(col("id")).orderBy(desc("similarity"), asc("neighbor_id"))
    qCells.join(rCells, Seq("__cell"))
      .filter(col("id") =!= col("neighbor_id"))
      .select(col("id"), col("neighbor_id"), cosine(col("__qv"), col("__rv")).as("similarity"))
      .withColumn("__rank", row_number().over(w))
      .filter(col("__rank") <= k)
      .drop("__rank")
  }

  /** LSH-bucketed approximate cosine top-k — the 100 TB scale path.
    *
    * Random-hyperplane signatures (sign of dot with `nPlanes` seeded
    * Gaussian-ish vectors) bucket the space; candidates only join within a
    * bucket, replacing the O(|Q|·|R|) crossJoin with a hash-partitioned
    * equi-join on the signature. Recall is tuned by `nTables` independent
    * signature sets. Deterministic (seeded, no RNG at runtime).
    */
  /** Deterministic random-hyperplane LSH signature: sign bits of the dot
    * products with `nPlanes` hash-seeded pseudo-random planes, packed
    * into one int. Shared by [[cosineTopKLsh]] and
    * [[graft.dedup.Dedup.cosinePairsLsh]] — the seeding scheme MUST stay
    * identical wherever bucketing recall is compared. */
  private[graft] def hyperplaneSignature(vec: Column, t: Int, nPlanes: Int,
                                         dim: Int): Column = {
    val bits = (0 until nPlanes).map { p =>
      val plane = array((0 until dim).map { i =>
        // MurmurHash3(t, p, i) → deterministic coefficient in [-1, 1]
        lit(scala.util.hashing.MurmurHash3.productHash((t, p, i)).toDouble
          / Int.MaxValue)
      }: _*)
      val dot = aggregate(zip_with(vec, plane, (x, y) => x * y),
        lit(0.0), (a, v) => a + v)
      when(dot >= 0, lit(1)).otherwise(lit(0))
    }
    bits.zipWithIndex.map { case (b, i) => b * lit(1 << i) }.reduce(_ + _)
  }

  def cosineTopKLsh(queries: DataFrame, refs: DataFrame, idCol: String, vecCol: String,
                    k: Int, dim: Int, nPlanes: Int = 8, nTables: Int = 4): DataFrame = {
    val toD: Column => Column = c => transform(c, x => x.cast("double"))
    def signature(vec: Column, t: Int): Column =
      hyperplaneSignature(vec, t, nPlanes, dim)
    val cand = (0 until nTables).map { t =>
      val q = queries.select(col(idCol).as("id"), toD(col(vecCol)).as("__qv"))
        .withColumn("__sig", signature(col("__qv"), t))
      val r = refs.select(col(idCol).as("neighbor_id"), toD(col(vecCol)).as("__rv"))
        .withColumn("__sig", signature(col("__rv"), t))
      r.join(q, Seq("__sig")).filter(col("id") =!= col("neighbor_id"))
        .select(col("id"), col("neighbor_id"), col("__qv"), col("__rv"))
    }.reduce(_ unionByName _).dropDuplicates("id", "neighbor_id")
    val w = Window.partitionBy(col("id")).orderBy(desc("similarity"), asc("neighbor_id"))
    cand.select(col("id"), col("neighbor_id"), cosine(col("__qv"), col("__rv")).as("similarity"))
      .withColumn("__rank", row_number().over(w))
      .filter(col("__rank") <= k)
      .drop("__rank")
  }
}
