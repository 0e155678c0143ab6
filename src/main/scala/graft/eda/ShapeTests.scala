package graft.eda

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Distribution-shape and sequence tests the reference's scipy layer
  * would reach for (normality, median homogeneity, paired location,
  * randomness) — each re-derived as a distributed aggregate pipeline
  * with an exact cross-engine contract: every sufficient statistic is
  * either an integer count, an exact decimal sum, or a rank from the
  * bucketed kernel, so no summation-order term can flip the oracle
  * hash (the q253 lesson).
  */
object ShapeTests {

  /** Jarque–Bera normality test per group: JB = n/6·(S² + K²/4) from
    * the four raw power sums. Inputs are pinned to an integer lattice
    * (x · 10^scale, HALF_UP) so Σx..Σx⁴ accumulate EXACTLY as
    * decimals — S and K are invariant under the linear rescale, so the
    * statistic is the textbook one up to lattice granularity, and the
    * double arithmetic after the exact sums is one deterministic
    * expression tree on both engines. Lattice values must satisfy
    * |x·10^scale| ≲ 1e9 (so x⁴ fits decimal(38,0)/HUGEINT).
    * Returns (group, n, skew 6dp, ex_kurtosis 6dp, jb 6dp). */
  def jarqueBera(df: DataFrame, groupCol: String, valueCol: String,
                 scale: Int = 0): DataFrame = {
    val xi = round(col(valueCol).cast("double") * math.pow(10, scale), 0)
      .cast(DecimalType(38, 0))
    val base = df.filter(col(valueCol).isNotNull &&
        !isnan(col(valueCol).cast("double")))
      .select(col(groupCol).as("group"), xi.as("__x"))
    val g = base.groupBy("group").agg(
      count(lit(1)).as("n"),
      sum(col("__x")).cast("double").as("__s1"),
      sum(col("__x") * col("__x")).cast("double").as("__s2"),
      sum(col("__x") * col("__x") * col("__x")).cast("double").as("__s3"),
      sum(col("__x") * col("__x") * col("__x") * col("__x"))
        .cast("double").as("__s4"))
    val nd = col("n").cast("double")
    val m = col("__s1") / nd
    val m2 = col("__s2") / nd - m * m
    val m3 = col("__s3") / nd - lit(3.0) * m * (col("__s2") / nd) +
      lit(2.0) * m * m * m
    val m4 = col("__s4") / nd - lit(4.0) * m * (col("__s3") / nd) +
      lit(6.0) * m * m * (col("__s2") / nd) - lit(3.0) * m * m * m * m
    // sqrt(m2)*m2 instead of pow(m2, 1.5): sqrt is IEEE
    // correctly-rounded on both engines, pow is not guaranteed to be
    val skew = when(m2 > 0, m3 / (sqrt(m2) * m2))
    val kurt = when(m2 > 0, m4 / (m2 * m2) - lit(3.0))
    g.select(col("group"), col("n"),
        round(skew, 6).as("skew"),
        round(kurt, 6).as("ex_kurtosis"),
        round(nd / lit(6.0) *
          (skew * skew + kurt * kurt / lit(4.0)), 6).as("jb"))
      .orderBy("group")
  }

  /** DuckDB twin of [[jarqueBera]]; `srcCte` must yield (grp, v). */
  def jarqueBeraOracleSql(srcCte: String, scale: Int = 0): String = {
    val f = s"ROUND(CAST(v AS DOUBLE) * ${math.pow(10, scale)}, 0)"
    s"""WITH src AS ($srcCte),
        base AS (SELECT grp AS "group", CAST($f AS HUGEINT) AS x
          FROM src WHERE v IS NOT NULL
            AND NOT isnan(CAST(v AS DOUBLE))),
        g AS (SELECT "group", COUNT(*) AS n,
            CAST(SUM(x) AS DOUBLE) AS s1,
            CAST(SUM(x * x) AS DOUBLE) AS s2,
            CAST(SUM(x * x * x) AS DOUBLE) AS s3,
            CAST(SUM(x * x * x * x) AS DOUBLE) AS s4
          FROM base GROUP BY "group"),
        mo AS (SELECT "group", n, CAST(n AS DOUBLE) AS nd,
            s1 / n AS m, s2, s3, s4 FROM g),
        cm AS (SELECT "group", n, nd, m,
            s2 / nd - m * m AS m2,
            s3 / nd - 3.0 * m * (s2 / nd) + 2.0 * m * m * m AS m3,
            s4 / nd - 4.0 * m * (s3 / nd) + 6.0 * m * m * (s2 / nd)
              - 3.0 * m * m * m * m AS m4
          FROM mo),
        sk AS (SELECT "group", n, nd,
            CASE WHEN m2 > 0 THEN m3 / (SQRT(m2) * m2) END AS skew,
            CASE WHEN m2 > 0 THEN m4 / (m2 * m2) - 3.0 END AS kurt
          FROM cm)
        SELECT "group", n, ROUND(skew, 6) AS skew,
          ROUND(kurt, 6) AS ex_kurtosis,
          ROUND(nd / 6.0 * (skew * skew + kurt * kurt / 4.0), 6) AS jb
        FROM sk ORDER BY "group""""
  }

  /** Mood's median test: split every value on the POOLED median and
    * χ²-test the per-group above/at-or-below contingency (the robust
    * k-group location test that needs no variance assumption at all —
    * the screening companion to [[StatTests.kruskalWallis]]).
    * Two-phase: the exact pooled median becomes a plan literal
    * (the q174 madOutliers pattern), then ONE map-combinable groupBy
    * builds the 2×k table and the χ² rides the k-row metadata frame.
    * Returns one row: (k, n, n_above, chi2 6dp). */
  def moodMedian(df: DataFrame, groupCol: String,
                 valueCol: String): DataFrame = {
    val v = col(valueCol).cast("double")
    val base = df.filter(v.isNotNull && !isnan(v))
      .select(col(groupCol).as("__grp"), v.as("__v"))
    val medRow = base.agg(element_at(graft.functions.ExactPercentiles
      .exactPercentiles(col("__v"), Seq(0.5)), 1)).head()
    val med = if (medRow.isNullAt(0)) Double.NaN else medRow.getDouble(0)
    val cells = base.groupBy("__grp").agg(
      count(lit(1)).as("__ng"),
      sum(when(col("__v") > med, 1L).otherwise(0L)).as("__ag"))
    val tot = cells.agg(sum("__ng").as("__n"), sum("__ag").as("__a"),
      count(lit(1)).as("k"))
    val ea = col("__ng").cast("double") * col("__a") / col("__n")
    val eb = col("__ng").cast("double") * (col("__n") - col("__a")) /
      col("__n")
    val bg = col("__ng") - col("__ag")
    cells.crossJoin(broadcast(tot))
      .agg(first("k").as("k"), first("__n").as("n"),
        first("__a").as("n_above"),
        round(sum(
          (col("__ag") - ea) * (col("__ag") - ea) / ea +
            (bg - eb) * (bg - eb) / eb), 6).as("chi2"))
  }

  /** DuckDB twin of [[moodMedian]]; `srcCte` must yield (grp, v). */
  def moodMedianOracleSql(srcCte: String): String =
    s"""WITH src AS ($srcCte),
        base AS (SELECT grp, CAST(v AS DOUBLE) AS v FROM src
          WHERE v IS NOT NULL AND NOT isnan(CAST(v AS DOUBLE))),
        med AS (SELECT quantile_cont(v, 0.5) AS m FROM base),
        cells AS (SELECT grp, COUNT(*) AS ng,
            SUM(CASE WHEN v > (SELECT m FROM med) THEN 1 ELSE 0 END)
              AS ag
          FROM base GROUP BY grp),
        tot AS (SELECT SUM(ng) AS n, SUM(ag) AS a, COUNT(*) AS k
          FROM cells)
        SELECT CAST(k AS BIGINT) AS k, CAST(n AS BIGINT) AS n,
          CAST(a AS BIGINT) AS n_above,
          ROUND(SUM(
            (ag - CAST(ng AS DOUBLE) * a / n)
              * (ag - CAST(ng AS DOUBLE) * a / n)
              / (CAST(ng AS DOUBLE) * a / n)
            + ((ng - ag) - CAST(ng AS DOUBLE) * (n - a) / n)
              * ((ng - ag) - CAST(ng AS DOUBLE) * (n - a) / n)
              / (CAST(ng AS DOUBLE) * (n - a) / n)), 6) AS chi2
        FROM cells CROSS JOIN tot GROUP BY k, n, a"""

  /** Wilcoxon signed-rank test over PRE-PAIRED observations (xCol,
    * yCol per row): d = x − y, zeros dropped, |d| tie-average-ranked
    * through the bucketed kernel ([[graft.ml.Metrics.avgRanks]] — no
    * global sort), W⁺ = Σ ranks of positive d, z from the tie-corrected
    * normal approximation (no continuity correction — the exact
    * large-sample form, reproducible bit-for-bit in SQL).
    * Returns one row: (n_pairs, w_plus, z_stat 6dp). */
  def wilcoxonSignedRank(df: DataFrame, xCol: String,
                         yCol: String): DataFrame = {
    val x = col(xCol).cast("double")
    val y = col(yCol).cast("double")
    val base = df
      .filter(x.isNotNull && !isnan(x) && y.isNotNull && !isnan(y))
      .select((x - y).as("__d"))
      .filter(col("__d") =!= 0.0)
      .select(abs(col("__d")).as("__ad"),
        (col("__d") > 0).cast("int").as("__pos"))
    val ranks = graft.ml.Metrics.avgRanks(base, "__ad")
    val main = base.join(ranks, base("__ad") === ranks("value"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(when(col("__pos") === 1, col("avg_rank"))).as("__wp"))
    val tie = ranks.agg(sum(col("n") * col("n") * col("n") - col("n"))
      .as("__t3t"))
    val nd = col("n_pairs").cast("double")
    main.crossJoin(broadcast(tie))
      .select(col("n_pairs"),
        round(coalesce(col("__wp"), lit(0.0)), 6).as("w_plus"),
        round((coalesce(col("__wp"), lit(0.0)) -
          nd * (nd + 1) / lit(4.0)) /
          sqrt(nd * (nd + 1) * (lit(2.0) * nd + 1) / lit(24.0) -
            col("__t3t").cast("double") / lit(48.0)), 6).as("z_stat"))
  }

  /** DuckDB twin of [[wilcoxonSignedRank]]; `srcCte` yields (x, y). */
  def wilcoxonSignedRankOracleSql(srcCte: String): String =
    s"""WITH src AS ($srcCte),
        d AS (SELECT CAST(x AS DOUBLE) - CAST(y AS DOUBLE) AS d
          FROM src WHERE x IS NOT NULL AND y IS NOT NULL
            AND NOT isnan(CAST(x AS DOUBLE))
            AND NOT isnan(CAST(y AS DOUBLE))),
        nz AS (SELECT ABS(d) AS ad,
            CASE WHEN d > 0 THEN 1 ELSE 0 END AS pos
          FROM d WHERE d <> 0),
        m AS (SELECT ad, COUNT(*) AS n FROM nz GROUP BY ad),
        r AS (SELECT ad, n,
            SUM(n) OVER (ORDER BY ad) - n
              + (CAST(n AS DOUBLE) + 1) / 2 AS avg_rank FROM m),
        j AS (SELECT nz.pos, r.avg_rank FROM nz JOIN r USING (ad)),
        a AS (SELECT COUNT(*) AS n_pairs,
            SUM(CASE WHEN pos = 1 THEN avg_rank END) AS wp FROM j),
        t AS (SELECT SUM(CAST(n AS HUGEINT) * n * n - n) AS t3t FROM m)
        SELECT n_pairs,
          ROUND(COALESCE(wp, 0.0), 6) AS w_plus,
          ROUND((COALESCE(wp, 0.0)
            - CAST(n_pairs AS DOUBLE) * (n_pairs + 1) / 4.0)
            / SQRT(CAST(n_pairs AS DOUBLE) * (n_pairs + 1)
              * (2.0 * n_pairs + 1) / 24.0
              - CAST(t3t AS DOUBLE) / 48.0), 6) AS z_stat
        FROM a CROSS JOIN t"""

  /** Wald–Wolfowitz runs test on an ORDERED series (one row per order
    * key, e.g. a daily aggregate): signs vs the series median (ties at
    * the median dropped), R = #sign runs, z from the exact run-count
    * moments. The window rides the already-aggregated series frame
    * (days, not events) — metadata-sized by construction; the caller
    * owns the aggregation that got it there.
    * Returns one row: (n, n_above, n_below, runs, z_stat 6dp). */
  def runsTest(df: DataFrame, orderCol: String,
               valueCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val v = col(valueCol).cast("double")
    val base = df.filter(v.isNotNull && !isnan(v))
      .select(col(orderCol).as("__o"), v.as("__v"))
    val medRow = base.agg(element_at(graft.functions.ExactPercentiles
      .exactPercentiles(col("__v"), Seq(0.5)), 1)).head()
    val med = if (medRow.isNullAt(0)) Double.NaN else medRow.getDouble(0)
    val signs = base.filter(col("__v") =!= med)
      .select(col("__o"), (col("__v") > med).cast("int").as("__s"))
    val w = Window.orderBy("__o")
    val runs = signs
      .withColumn("__chg",
        when(lag("__s", 1).over(w).isNull ||
          lag("__s", 1).over(w) =!= col("__s"), 1L).otherwise(0L))
    val n1 = col("n_above").cast("double")
    val n2 = col("n_below").cast("double")
    val n = n1 + n2
    val muR = lit(2.0) * n1 * n2 / n + 1
    val varR = lit(2.0) * n1 * n2 * (lit(2.0) * n1 * n2 - n) /
      (n * n * (n - 1))
    runs.agg(count(lit(1)).as("n_t"),
        sum("__s").as("n_above"),
        sum(lit(1L) - col("__s")).as("n_below"),
        sum("__chg").as("runs"))
      .select(col("n_t").as("n"), col("n_above"), col("n_below"),
        col("runs"),
        round(when(varR > 0,
          (col("runs").cast("double") - muR) / sqrt(varR)), 6)
          .as("z_stat"))
  }

  /** DuckDB twin of [[runsTest]]; `srcCte` must yield (o, v). */
  def runsTestOracleSql(srcCte: String): String =
    s"""WITH src AS ($srcCte),
        base AS (SELECT o, CAST(v AS DOUBLE) AS v FROM src
          WHERE v IS NOT NULL AND NOT isnan(CAST(v AS DOUBLE))),
        med AS (SELECT quantile_cont(v, 0.5) AS m FROM base),
        signs AS (SELECT o,
            CASE WHEN v > (SELECT m FROM med) THEN 1 ELSE 0 END AS s
          FROM base WHERE v <> (SELECT m FROM med)),
        runs AS (SELECT s,
            CASE WHEN LAG(s) OVER (ORDER BY o) IS NULL
              OR LAG(s) OVER (ORDER BY o) <> s THEN 1 ELSE 0 END AS chg
          FROM signs),
        a AS (SELECT COUNT(*) AS n, SUM(s) AS n_above,
            SUM(1 - s) AS n_below, SUM(chg) AS r FROM runs),
        z AS (SELECT n, n_above, n_below, r,
            CAST(n_above AS DOUBLE) AS n1, CAST(n_below AS DOUBLE) AS n2
          FROM a)
        SELECT n, CAST(n_above AS BIGINT) AS n_above,
          CAST(n_below AS BIGINT) AS n_below, CAST(r AS BIGINT) AS runs,
          ROUND(CASE WHEN
              2.0 * n1 * n2 * (2.0 * n1 * n2 - (n1 + n2))
                / ((n1 + n2) * (n1 + n2) * ((n1 + n2) - 1)) > 0 THEN
            (CAST(r AS DOUBLE) - (2.0 * n1 * n2 / (n1 + n2) + 1))
              / SQRT(2.0 * n1 * n2 * (2.0 * n1 * n2 - (n1 + n2))
                / ((n1 + n2) * (n1 + n2) * ((n1 + n2) - 1))) END, 6)
            AS z_stat
        FROM z"""

  /** Paired sign test over pre-paired (xCol, yCol) rows: the
    * assumption-free floor under [[wilcoxonSignedRank]] (no symmetry
    * needed — only the sign of each difference). Zeros drop;
    * z = (n⁺ − n⁻)/√n. ONE aggregate, all-integer sufficient stats.
    * Returns one row: (n_pairs, n_pos, n_neg, z_stat 6dp). */
  def signTest(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val x = col(xCol).cast("double")
    val y = col(yCol).cast("double")
    val g = df
      .filter(x.isNotNull && !isnan(x) && y.isNotNull && !isnan(y) &&
        x =!= y)
      .agg(count(lit(1)).as("n_pairs"),
        sum((x > y).cast("long")).as("n_pos"),
        sum((x < y).cast("long")).as("n_neg"))
    g.select(col("n_pairs"), col("n_pos"), col("n_neg"),
      round((col("n_pos") - col("n_neg")).cast("double") /
        sqrt(col("n_pairs").cast("double")), 6).as("z_stat"))
  }

  /** DuckDB twin of [[signTest]]; `srcCte` must yield (x, y). */
  def signTestOracleSql(srcCte: String): String =
    s"""WITH src AS (SELECT CAST(x AS DOUBLE) AS x,
            CAST(y AS DOUBLE) AS y FROM ($srcCte)
          WHERE x IS NOT NULL AND y IS NOT NULL
            AND NOT isnan(CAST(x AS DOUBLE))
            AND NOT isnan(CAST(y AS DOUBLE))
            AND CAST(x AS DOUBLE) <> CAST(y AS DOUBLE)),
        g AS (SELECT COUNT(*) AS n_pairs,
            SUM(CASE WHEN x > y THEN 1 ELSE 0 END) AS n_pos,
            SUM(CASE WHEN x < y THEN 1 ELSE 0 END) AS n_neg
          FROM src)
        SELECT n_pairs, CAST(n_pos AS BIGINT) AS n_pos,
          CAST(n_neg AS BIGINT) AS n_neg,
          ROUND(CAST(n_pos - n_neg AS DOUBLE)
            / SQRT(CAST(n_pairs AS DOUBLE)), 6) AS z_stat
        FROM g"""

  /** Bimodality coefficient per group: BC = (g₁² + 1) /
    * (g₂ + 3(n−1)²/((n−2)(n−3))) with population-moment skew g₁ and
    * excess kurtosis g₂ from the EXACT integer-lattice power sums
    * (the [[jarqueBera]] kernel) — BC > 5/9 ≈ 0.555 flags a
    * bimodal/heavy-shoulder distribution (the cheap stand-in for a
    * dip test). Returns (group, n, bc 6dp, is_bimodal). */
  def bimodalityCoefficient(df: DataFrame, groupCol: String,
                            valueCol: String,
                            scale: Int = 0): DataFrame = {
    val xi = round(col(valueCol).cast("double") * math.pow(10, scale), 0)
      .cast(DecimalType(38, 0))
    val base = df.filter(col(valueCol).isNotNull &&
        !isnan(col(valueCol).cast("double")))
      .select(col(groupCol).as("group"), xi.as("__x"))
    val g = base.groupBy("group").agg(
      count(lit(1)).as("n"),
      sum(col("__x")).cast("double").as("__s1"),
      sum(col("__x") * col("__x")).cast("double").as("__s2"),
      sum(col("__x") * col("__x") * col("__x")).cast("double")
        .as("__s3"),
      sum(col("__x") * col("__x") * col("__x") * col("__x"))
        .cast("double").as("__s4"))
    val nd = col("n").cast("double")
    val m = col("__s1") / nd
    val m2 = col("__s2") / nd - m * m
    val m3 = col("__s3") / nd - lit(3.0) * m * (col("__s2") / nd) +
      lit(2.0) * m * m * m
    val m4 = col("__s4") / nd - lit(4.0) * m * (col("__s3") / nd) +
      lit(6.0) * m * m * (col("__s2") / nd) - lit(3.0) * m * m * m * m
    val skew = m3 / (sqrt(m2) * m2)
    val kurt = m4 / (m2 * m2) - lit(3.0)
    val corr3 = lit(3.0) * (nd - 1) * (nd - 1) /
      ((nd - 2) * (nd - 3))
    val bc = (skew * skew + 1) / (kurt + corr3)
    g.filter(col("n") > 3)
      .select(col("group"), col("n"),
        round(when(m2 > 0, bc), 6).as("bc"),
        when(m2 > 0, bc > 5.0 / 9).as("is_bimodal"))
      .orderBy("group")
  }

  /** DuckDB twin of [[bimodalityCoefficient]]; `srcCte` yields
    * (grp, v). */
  def bimodalityCoefficientOracleSql(srcCte: String,
                                     scale: Int = 0): String = {
    val f = s"ROUND(CAST(v AS DOUBLE) * ${math.pow(10, scale)}, 0)"
    s"""WITH src AS ($srcCte),
        base AS (SELECT grp AS "group", CAST($f AS HUGEINT) AS x
          FROM src WHERE v IS NOT NULL
            AND NOT isnan(CAST(v AS DOUBLE))),
        g AS (SELECT "group", COUNT(*) AS n,
            CAST(SUM(x) AS DOUBLE) AS s1,
            CAST(SUM(x * x) AS DOUBLE) AS s2,
            CAST(SUM(x * x * x) AS DOUBLE) AS s3,
            CAST(SUM(x * x * x * x) AS DOUBLE) AS s4
          FROM base GROUP BY "group"),
        mo AS (SELECT "group", n, CAST(n AS DOUBLE) AS nd,
            s1 / n AS m, s2, s3, s4 FROM g WHERE n > 3),
        cm AS (SELECT "group", n, nd, m,
            s2 / nd - m * m AS m2,
            s3 / nd - 3.0 * m * (s2 / nd) + 2.0 * m * m * m AS m3,
            s4 / nd - 4.0 * m * (s3 / nd) + 6.0 * m * m * (s2 / nd)
              - 3.0 * m * m * m * m AS m4
          FROM mo),
        sk AS (SELECT "group", n, nd, m2,
            m3 / (SQRT(m2) * m2) AS skew,
            m4 / (m2 * m2) - 3.0 AS kurt FROM cm),
        b AS (SELECT "group", n, m2,
            (skew * skew + 1)
              / (kurt + 3.0 * (nd - 1) * (nd - 1)
                / ((nd - 2) * (nd - 3))) AS bc
          FROM sk)
        SELECT "group", n,
          ROUND(CASE WHEN m2 > 0 THEN bc END, 6) AS bc,
          CASE WHEN m2 > 0 THEN bc > 5.0 / 9 END AS is_bimodal
        FROM b ORDER BY "group""""
  }

  /** Paired rank-biserial correlation: the effect size under the
    * Wilcoxon signed-rank test (q349) — r = (W⁺ − W⁻)/(W⁺ + W⁻), the
    * share of signed-rank mass favoring the positive direction.
    * Tie-averaged ranks of |d| carry as EXACT integers (2·avg_rank =
    * 2·cum_before + run + 1 — rank mass is counts, whatever the value
    * type), so W⁺ and W⁻ are integer halves and r is one division;
    * d stays a raw double like q349's kernel (casting a derived
    * quotient to a decimal lattice would hit the .xx5 tie trap).
    * Zero diffs drop (the q380 convention). Returns one row:
    * (n_pairs, w_plus 1dp, w_minus 1dp, rank_biserial 6dp). */
  def rankBiserial(df: DataFrame, xCol: String,
                   yCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val x = col(xCol).cast("double")
    val y = col(yCol).cast("double")
    val d = df.filter(x.isNotNull && !isnan(x) &&
        y.isNotNull && !isnan(y))
      .select((x - y).as("__d"))
      .filter(col("__d") =!= 0.0)
    val cells = d.groupBy(abs(col("__d")).as("__ad"))
      .agg(count(lit(1)).as("__c"),
        sum((col("__d") > 0).cast("long")).as("__cp"))
    val w = Window.orderBy("__ad")
      .rowsBetween(Window.unboundedPreceding, -1)
    val withR = cells
      .withColumn("__cb", coalesce(sum("__c").over(w), lit(0L)))
      // 2 x tie-averaged rank of every obs in this run
      .withColumn("__r2", lit(2) * col("__cb") + col("__c") + 1)
    val g = withR.agg(sum("__c").as("n_pairs"),
      sum(col("__cp") * col("__r2")).as("__w2p"),
      sum((col("__c") - col("__cp")) * col("__r2")).as("__w2m"))
    g.select(col("n_pairs"),
      (col("__w2p").cast("double") / 2).as("w_plus"),
      (col("__w2m").cast("double") / 2).as("w_minus"),
      round(try_divide((col("__w2p") - col("__w2m")).cast("double"),
        (col("__w2p") + col("__w2m")).cast("double")), 6)
        .as("rank_biserial"))
  }

  /** DuckDB twin of [[rankBiserial]]; `srcCte` yields (x, y). */
  def rankBiserialOracleSql(srcCte: String): String =
    s"""WITH d AS (SELECT CAST(x AS DOUBLE) - CAST(y AS DOUBLE) AS dd
          FROM ($srcCte)
          WHERE x IS NOT NULL AND NOT isnan(CAST(x AS DOUBLE))
            AND y IS NOT NULL AND NOT isnan(CAST(y AS DOUBLE))),
        nz AS (SELECT dd FROM d WHERE dd <> 0.0),
        cells AS (SELECT ABS(dd) AS ad, COUNT(*) AS c,
            SUM(CASE WHEN dd > 0 THEN 1 ELSE 0 END) AS cp
          FROM nz GROUP BY ad),
        wr AS (SELECT c, cp,
            2 * COALESCE(SUM(c) OVER (ORDER BY ad
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              + c + 1 AS r2
          FROM cells),
        g AS (SELECT CAST(SUM(c) AS BIGINT) AS n_pairs,
            SUM(cp * r2) AS w2p, SUM((c - cp) * r2) AS w2m FROM wr)
        SELECT n_pairs, CAST(w2p AS DOUBLE) / 2 AS w_plus,
          CAST(w2m AS DOUBLE) / 2 AS w_minus,
          ROUND(CAST(w2p - w2m AS DOUBLE) / (w2p + w2m), 6)
            AS rank_biserial
        FROM g"""
}
