package graft.proximity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.GraftExprBridge
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Product quantization (Jégou et al. 2011, "Product Quantization for
  * Nearest Neighbor Search") — the compressed-vector ANN scale path
  * that complements the family already here: [[Proximity.cosineTopK]]
  * (exact), [[Proximity.cosineTopKLsh]] (bucketed candidates),
  * [[Proximity.cosineTopKIvf]] / [[IvfIndex]] (partition-pruned
  * candidates). PQ attacks the OTHER axis: each d-dim float vector
  * becomes m one-byte codes (d=64 → 8 bytes, a 32× shrink), and
  * distance evaluation becomes m table lookups — so a "brute" scan
  * over codes is memory-bound over 3% of the data, and the IVF+PQ
  * combination prunes partitions AND shrinks what's left.
  *
  * Layout: dims split into m contiguous subspaces; per-subspace
  * k-means codebook (k ≤ 256) fit on a bounded hash-ordered sample
  * (same rationale as [[Proximity.fitQuantizer]] — codebooks saturate
  * long before the corpus does). Vectors are L2-NORMALIZED before
  * encoding so the asymmetric squared-L2 distance (exact query vs
  * quantized ref — ADC) converts to cosine: sim = 1 − d²/2. This is
  * the plain (non-residual) IVF-PQ variant: codes quantize the vector
  * itself, not the residual from its coarse centroid — one codebook
  * serves every cell, at slightly coarser resolution per cell.
  *
  * Both per-row kernels are single CodegenFallback expressions (the
  * argmin/lookup loops; an m×k HOF expression tree would interpret a
  * lambda per centroid element — the [[graft.functions.BpeEncodeExpr]]
  * precedent).
  */
object Pq {

  /** [m][k][d/m] centroid table — plan-constant metadata (8×16×8
    * doubles = 8 KB at the defaults), shipped inside the expressions. */
  type Codebooks = IndexedSeq[IndexedSeq[IndexedSeq[Double]]]

  private def toD(c: Column): Column = transform(c, x => x.cast("double"))

  /** L2-unit-normalize an array<double> column (zero vectors pass
    * through unscaled rather than dividing by zero).
    *
    * PERF: the norm sub-expression is re-evaluated per ELEMENT of the
    * transform (interpreted HOFs get no CSE), making this O(d²) per
    * row — fine on a per-input projection (once per corpus row), a
    * disaster inside a join's output projection (once per candidate
    * PAIR; the round-7 triage measured 58 s of a 63 s ADC scan in
    * exactly that mistake). Callers below normalize on the SMALL
    * per-row projections and feed already-unit vectors to the raw ADC
    * kernel. */
  def unitize(vec: Column): Column =
    // one-pass imperative kernel; the HOF form re-evaluated the O(d)
    // norm aggregate PER ELEMENT (the exact mistake the scaladoc above
    // warns callers about — it was inside this helper too). Identical
    // values and null semantics: null element / zero norm / NaN norm →
    // input unchanged, else x/‖v‖ elementwise.
    graft.functions.VecKernels.unitize(vec)

  /** ADC on an ALREADY-normalized query vector — the hot-path form
    * evaluated once per (query, candidate) pair. */
  private def adcCosineRaw(unitQueryVec: Column, code: Column,
                           books: Codebooks): Column =
    lit(1.0) - GraftExprBridge.toColumn(PqAdcExpr(
      GraftExprBridge.toExpression(unitQueryVec),
      GraftExprBridge.toExpression(code), books)) / 2.0

  /** Per-subspace codebooks from a bounded hash-ordered sample of the
    * (normalized) refs: m sequential MLlib k-means fits over dim
    * slices of the SAME persisted sample — the corpus is scanned once
    * to draw it, never per subspace. `dim` must divide evenly by `m`. */
  def fitCodebooks(refs: DataFrame, idCol: String, vecCol: String,
                   m: Int = 8, k: Int = 16, seed: Long = 42L): Codebooks = {
    require(m >= 1 && k >= 2 && k <= 256,
      s"need m >= 1 and 2 <= k <= 256, got m=$m k=$k")
    val v = refs.select(col(idCol).cast("long").as("id"),
      unitize(toD(col(vecCol))).as("vec"))
    // ONE corpus pass draws the bounded sample; the m Lloyd's fits run
    // driver-local over it (≤ 10240 × d doubles ≈ 5 MB at d=64 —
    // metadata-sized, the BPE-merge-loop precedent: re-running tiny
    // sequential fits as Spark jobs only buys scheduler latency — the
    // round-7 triage measured 16 MLlib fits at ~20 s vs <0.5 s local)
    val sample = v.orderBy(hash(col("id"), lit(seed.toInt)), col("id"))
      .limit(math.max(10000, k * 256))
      .collect().map(_.getSeq[Double](1).toArray)
    require(sample.nonEmpty, "fitCodebooks: empty refs")
    val dim = sample.head.length
    require(dim % m == 0, s"dim $dim must divide evenly into $m subspaces")
    val sub = dim / m
    (0 until m).map { j =>
      val sl = sample.map(row => java.util.Arrays.copyOfRange(row, j * sub, (j + 1) * sub))
      localKMeans(sl, k, seed + j).map(_.toIndexedSeq).toIndexedSeq
    }.toIndexedSeq
  }

  /** Seeded Lloyd's over a driver-local sample: k-means++-style spread
    * init (farthest-point by hash-seeded first pick), 20 iterations,
    * empty clusters re-seeded deterministically. */
  private def localKMeans(points: Array[Array[Double]], k: Int,
                          seed: Long, iters: Int = 20): Array[Array[Double]] = {
    val n = points.length
    val d = points.head.length
    val rnd = new scala.util.Random(seed)
    def dist2(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < d) { val t = a(i) - b(i); s += t * t; i += 1 }
      s
    }
    // greedy farthest-point init (deterministic; no weighted draws)
    val cents = Array.ofDim[Double](k, d)
    cents(0) = points(rnd.nextInt(n)).clone()
    val minD = Array.fill(n)(Double.MaxValue)
    var c = 1
    while (c < k) {
      var far = 0; var farD = -1.0; var i = 0
      while (i < n) {
        val dd = math.min(minD(i), dist2(points(i), cents(c - 1)))
        minD(i) = dd
        if (dd > farD) { farD = dd; far = i }
        i += 1
      }
      cents(c) = points(far).clone()
      c += 1
    }
    val assign = new Array[Int](n)
    var it = 0
    while (it < iters) {
      var i = 0
      while (i < n) {
        var best = 0; var bestD = Double.MaxValue; var j = 0
        while (j < k) {
          val dd = dist2(points(i), cents(j))
          if (dd < bestD) { bestD = dd; best = j }
          j += 1
        }
        assign(i) = best
        i += 1
      }
      val sums = Array.ofDim[Double](k, d)
      val counts = new Array[Int](k)
      i = 0
      while (i < n) {
        val a = assign(i); counts(a) += 1
        var x = 0
        while (x < d) { sums(a)(x) += points(i)(x); x += 1 }
        i += 1
      }
      var j = 0
      while (j < k) {
        if (counts(j) > 0) {
          var x = 0
          while (x < d) { cents(j)(x) = sums(j)(x) / counts(j); x += 1 }
        } else cents(j) = points(rnd.nextInt(n)).clone() // re-seed empty
        j += 1
      }
      it += 1
    }
    cents
  }

  /** Encode a vector column to its m-code array (normalizes first —
    * encode and fit must see the same geometry). */
  def encodeCol(vec: Column, books: Codebooks): Column =
    GraftExprBridge.toColumn(
      PqEncodeExpr(GraftExprBridge.toExpression(unitize(toD(vec))), books))

  /** The compressed corpus: (id, pq_code array<int>). At rest this is
    * the 32×-smaller side every ADC scan reads instead of the floats. */
  def encode(refs: DataFrame, idCol: String, vecCol: String,
             books: Codebooks): DataFrame =
    refs.select(col(idCol).as("id"), encodeCol(col(vecCol), books).as("pq_code"))

  /** ADC approximate cosine: exact (normalized) query against a code
    * column. */
  def adcCosine(queryVec: Column, code: Column, books: Codebooks): Column =
    lit(1.0) - GraftExprBridge.toColumn(PqAdcExpr(
      GraftExprBridge.toExpression(unitize(toD(queryVec))),
      GraftExprBridge.toExpression(code), books)) / 2.0

  /** PQ-compressed brute top-k: every query scores every CODE (m int
    * lookups per candidate, not d float multiplies) and keeps its k
    * best by approximate cosine. The scan is all-candidates by design
    * — that is the PQ baseline; [[ivfPqTopK]] is the pruned form.
    * Returns (id, neighbor_id, pq_similarity 6dp), self-matches
    * excluded. */
  def adcTopK(queries: DataFrame, refs: DataFrame, idCol: String,
              vecCol: String, k: Int, books: Codebooks): DataFrame = {
    val codes = encode(refs, idCol, vecCol, books)
      .select(col("id").as("neighbor_id"), col("pq_code"))
    val q = queries.select(col(idCol).as("id"),
      unitize(toD(col(vecCol))).as("__qv"))
    val w = Window.partitionBy(col("id"))
      .orderBy(desc("pq_similarity"), asc("neighbor_id"))
    q.crossJoin(codes)
      .filter(col("id") =!= col("neighbor_id"))
      .select(col("id"), col("neighbor_id"),
        round(adcCosineRaw(col("__qv"), col("pq_code"), books), 6)
          .as("pq_similarity"))
      .withColumn("__rank", row_number().over(w))
      .filter(col("__rank") <= k)
      .drop("__rank")
  }

  /** Query-size-adaptive ADC top-k — the [[Proximity.knnJoinAdaptive]]
    * treatment for the PQ path (VERDICT r7 item 3). Below
    * `bruteMaxQueries` query rows the flat [[adcTopK]] scan runs (|Q|·|R|
    * code lookups — the deliberate PQ baseline, fine for query batches).
    * Above it that scan is quadratic in the self-KNN shape, so the
    * IVF-pruned [[ivfPqTopK]] takes over: candidate volume per query
    * drops to ~nProbe/nCells of the corpus. The route is recorded via
    * [[graft.core.Routing]] (the bench ladder reports switches) and
    * surfaced at warn level; pin `bruteMaxQueries = Long.MaxValue` to
    * force the flat scan. */
  def adcTopKAdaptive(queries: DataFrame, refs: DataFrame, idCol: String,
                      vecCol: String, k: Int, books: Codebooks,
                      bruteMaxQueries: Long = 65536,
                      queryCountHint: Option[Long] = None,
                      nCells: Int = 16, nProbe: Int = 4): DataFrame = {
    val n = queryCountHint.getOrElse(queries.count())
    val brute = n <= bruteMaxQueries
    graft.core.Routing.record("pq-adc", if (brute) "flat" else "ivf", n)
    if (brute) adcTopK(queries, refs, idCol, vecCol, k, books)
    else {
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"adcTopKAdaptive: $n query rows > bruteMaxQueries=$bruteMaxQueries " +
          s"— routing to IVF-pruned ADC (nCells=$nCells, nProbe=$nProbe); " +
          "pass bruteMaxQueries=Long.MaxValue to pin the flat scan")
      ivfPqTopK(queries, refs, idCol, vecCol, k, books, nCells, nProbe)
    }
  }

  /** ADC shortlist + exact re-rank (the FAISS "refine" stage): the
    * compressed scan nominates `shortlist` candidates per query, then
    * ONLY those rows' full vectors are read back for an exact cosine
    * re-rank. On corpora whose true neighbors are separated by less
    * than the quantization noise (this synthetic corpus: max pairwise
    * cosine ~0.5, so top-10 gaps are tiny) ADC ordering alone is
    * unreliable — the shortlist+refine pair is the production shape:
    * measured recall@10 here is 0.27 ADC-only vs 0.85+ refined at
    * m=16, k=16. Cost: the exact pass touches |Q|·shortlist vectors,
    * not |Q|·|R|. Returns (id, neighbor_id, similarity 6dp). */
  def adcTopKRerank(queries: DataFrame, refs: DataFrame, idCol: String,
                    vecCol: String, k: Int, books: Codebooks,
                    shortlist: Int = 50,
                    bruteMaxQueries: Long = 65536,
                    queryCountHint: Option[Long] = None): DataFrame = {
    require(shortlist >= k, s"shortlist $shortlist must be >= k $k")
    val cand = adcTopKAdaptive(queries, refs, idCol, vecCol, shortlist, books,
        bruteMaxQueries, queryCountHint)
      .select(col("id"), col("neighbor_id"))
    val q = queries.select(col(idCol).as("id"), toD(col(vecCol)).as("__qv"))
    val r = refs.select(col(idCol).as("neighbor_id"), toD(col(vecCol)).as("__rv"))
    val w = Window.partitionBy(col("id"))
      .orderBy(desc("similarity"), asc("neighbor_id"))
    cand.join(q, "id").join(r, "neighbor_id")
      .select(col("id"), col("neighbor_id"),
        round(Proximity.cosine(col("__qv"), col("__rv")), 6).as("similarity"))
      .withColumn("__rank", row_number().over(w))
      .filter(col("__rank") <= k)
      .drop("__rank")
  }

  /** IVF + PQ: coarse cells prune which codes a query scores (the
    * 100 TB shape — candidate volume ∝ nProbe/nCells, each candidate
    * m bytes), then ADC ranks within the probed cells. Coarse
    * quantizer and codebooks both fit on bounded samples. */
  def ivfPqTopK(queries: DataFrame, refs: DataFrame, idCol: String,
                vecCol: String, k: Int, books: Codebooks,
                nCells: Int = 16, nProbe: Int = 4,
                seed: Long = 42L): DataFrame = {
    import org.apache.spark.ml.functions.array_to_vector
    val r = refs.select(col(idCol).cast("long").as("id"),
      unitize(toD(col(vecCol))).as("vec"))
    val (km, cents) = Proximity.fitQuantizer(r, nCells, seed)
    val rCells = km.transform(r.withColumn("__vec", array_to_vector(col("vec"))))
      .select(col("id").as("neighbor_id"),
        encodeCol(col("vec"), books).as("pq_code"), col("__cell"))
    val q = queries.select(col(idCol).cast("long").as("id"),
      unitize(toD(col(vecCol))).as("__qv"))
    val qCells = q.crossJoin(broadcast(cents))
      .withColumn("__sim", Proximity.cosine(col("__qv"), col("__centroid")))
      .withColumn("__rank", row_number().over(
        Window.partitionBy("id").orderBy(desc("__sim"), asc("__cell"))))
      .filter(col("__rank") <= nProbe)
      .select(col("id"), col("__qv"), col("__cell"))
    val w = Window.partitionBy(col("id"))
      .orderBy(desc("pq_similarity"), asc("neighbor_id"))
    qCells.join(rCells, Seq("__cell"))
      .filter(col("id") =!= col("neighbor_id"))
      .select(col("id"), col("neighbor_id"),
        round(adcCosineRaw(col("__qv"), col("pq_code"), books), 6)
          .as("pq_similarity"))
      .withColumn("__rank", row_number().over(w))
      .filter(col("__rank") <= k)
      .drop("__rank")
  }
}

/** argmin-per-subspace encoder: array<double> → array<int> of length
  * m. The centroid table is a plan constant inside the expression. */
case class PqEncodeExpr(child: Expression, books: Pq.Codebooks)
  extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  @transient private lazy val flat: Array[Array[Array[Double]]] =
    books.map(_.map(_.toArray).toArray).toArray

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val m = flat.length
    val sub = if (m == 0) 0 else flat(0)(0).length
    val out = new Array[Int](m)
    var j = 0
    while (j < m) {
      val cents = flat(j)
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < cents.length) {
        val cent = cents(c)
        var d = 0.0
        var i = 0
        while (i < sub) {
          val diff = arr.getDouble(j * sub + i) - cent(i)
          d += diff * diff
          i += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      out(j) = best
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncodeExpr =
    copy(child = newChild)
}

/** Asymmetric distance: squared L2 between an exact query vector and a
  * code's reconstruction, summed per subspace — m table walks, no
  * reconstruction materialized. */
case class PqAdcExpr(left: Expression, right: Expression, books: Pq.Codebooks)
  extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType

  @transient private lazy val flat: Array[Array[Array[Double]]] =
    books.map(_.map(_.toArray).toArray).toArray

  override def nullSafeEval(q: Any, code: Any): Any = {
    val qa = q.asInstanceOf[ArrayData]
    val ca = code.asInstanceOf[ArrayData]
    val m = flat.length
    val sub = if (m == 0) 0 else flat(0)(0).length
    var d = 0.0
    var j = 0
    while (j < m) {
      val cent = flat(j)(ca.getInt(j))
      var i = 0
      while (i < sub) {
        val diff = qa.getDouble(j * sub + i) - cent(i)
        d += diff * diff
        i += 1
      }
      j += 1
    }
    d
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdcExpr =
    copy(left = newLeft, right = newRight)
}
