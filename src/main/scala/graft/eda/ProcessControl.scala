package graft.eda

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Statistical process control over event streams — the monitoring
  * read-outs (control charts, capability indices, outlier screens) a
  * data-quality pipeline runs per ingest batch. Every center line and
  * sigma estimate is built from exact decimal sums, so chart limits
  * are bit-identical across engines and partitionings.
  */
object ProcessControl {

  /** Exact mean of 6dp-rounded doubles: decimal sum, one division. */
  private def decMean(c: org.apache.spark.sql.Column) =
    sum(round(c, 6).cast(DecimalType(28, 6))).cast("double") /
      count(c)

  /** Individuals (I-MR) Shewhart chart on the daily mean: center =
    * mean of daily means, sigma = MR-bar / d2 (d2 = 1.128, the
    * standard moving-range-of-2 estimator — robust to a drifting
    * level, unlike the pooled stddev), Western Electric rule 1
    * (beyond 3 sigma) and rule 2 (9 consecutive points one side of
    * center) violation counts. Day frame only: the groupBy(day)
    * collapse happens first, every window rides the ~#days rows.
    * Returns one row:
    * (n_days, center 6dp, sigma_hat 6dp, n_rule1, n_rule2). */
  def shewhartI(events: DataFrame, tsCol: String,
                valueCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d = graft.core.Tables.ltzTs(events, tsCol)
      .filter(col(valueCol).isNotNull)
      .groupBy(to_date(col(tsCol)).as("day"))
      .agg((sum(col(valueCol).cast(DecimalType(18, 2))).cast("double") /
        count(lit(1))).as("m"))
    val w = Window.orderBy("day")
    val withMr = d.withColumn("__mr",
      abs(col("m") - lag("m", 1).over(w)))
    val stats = withMr.agg(count(lit(1)).as("n_days"),
      decMean(col("m")).as("__center"),
      (decMean(col("__mr")) / 1.128).as("__sigma"))
    val w9 = w.rowsBetween(-8, Window.currentRow)
    val side = signum(col("m") - col("__center"))
    withMr.crossJoin(broadcast(stats))
      .withColumn("__side9", when(count(lit(1)).over(w9) === 9,
        sum(side).over(w9)))
      .agg(first("n_days").as("n_days"),
        round(first("__center"), 6).as("center"),
        round(first("__sigma"), 6).as("sigma_hat"),
        sum((abs(col("m") - col("__center")) >
          lit(3.0) * col("__sigma")).cast("long")).as("n_rule1"),
        sum((abs(col("__side9")) === 9).cast("long")).as("n_rule2"))
  }

  /** DuckDB twin of [[shewhartI]]. */
  def shewhartIOracleSql(tsExpr: String, valueExpr: String,
                         table: String): String =
    s"""WITH d AS (SELECT CAST($tsExpr AS DATE) AS day,
            CAST(SUM(CAST($valueExpr AS DECIMAL(18,2))) AS DOUBLE)
              / COUNT(*) AS m
          FROM $table WHERE $valueExpr IS NOT NULL GROUP BY day),
        mr AS (SELECT day, m,
            ABS(m - LAG(m, 1) OVER (ORDER BY day)) AS mrv FROM d),
        st AS (SELECT COUNT(*) AS n_days,
            CAST(SUM(CAST(ROUND(m, 6) AS DECIMAL(28,6))) AS DOUBLE)
              / COUNT(m) AS center,
            CAST(SUM(CAST(ROUND(mrv, 6) AS DECIMAL(28,6))) AS DOUBLE)
              / COUNT(mrv) / 1.128 AS sigma
          FROM mr),
        sides AS (SELECT m, mrv, center, sigma, n_days,
            CASE WHEN COUNT(*) OVER (ORDER BY day
                ROWS BETWEEN 8 PRECEDING AND CURRENT ROW) = 9 THEN
              SUM(SIGN(m - center)) OVER (ORDER BY day
                ROWS BETWEEN 8 PRECEDING AND CURRENT ROW) END AS s9
          FROM mr CROSS JOIN st)
        SELECT ANY_VALUE(n_days) AS n_days,
          ROUND(ANY_VALUE(center), 6) AS center,
          ROUND(ANY_VALUE(sigma), 6) AS sigma_hat,
          CAST(SUM(CASE WHEN ABS(m - center) > 3.0 * sigma
            THEN 1 ELSE 0 END) AS BIGINT) AS n_rule1,
          CAST(SUM(CASE WHEN ABS(s9) = 9 THEN 1 ELSE 0 END) AS BIGINT)
            AS n_rule2
        FROM sides"""

  /** Process capability per group against fixed spec limits:
    * Cp = (USL−LSL)/6σ (potential — the spread the spec allows over
    * the spread the process uses) and Cpk = min(USL−μ, μ−LSL)/3σ
    * (actual — penalized for off-center). μ and σ come from exact
    * decimal power sums (Σx at (18,2), Σx² at (37,4)) so the indices
    * are partitioning-independent. One map-combinable groupBy.
    * Returns (group, n, mean 6dp, sigma 6dp, cp 6dp, cpk 6dp). */
  def capability(df: DataFrame, groupCol: String, valueCol: String,
                 lsl: Double, usl: Double): DataFrame = {
    // cents lattice + portable double (see core/Lattice.scala)
    val x = (col(valueCol).cast(DecimalType(18, 2)) * lit(100))
      .cast(DecimalType(38, 0))
    val pd = graft.core.Lattice.sparkPortableDouble _
    val g = df.filter(col(valueCol).isNotNull)
      .groupBy(col(groupCol).as("group"))
      .agg(count(lit(1)).as("n"),
        sum(x).as("__s1i"),
        sum(x * x).as("__s2i"))
      .selectExpr("group", "n",
        s"${pd("__s1i")} / 100.0 AS __s1",
        s"${pd("__s2i")} / 10000.0 AS __s2")
    val nd = col("n").cast("double")
    val mu = col("__s1") / nd
    val sig = sqrt((col("__s2") - nd * mu * mu) / (nd - 1))
    g.filter(col("n") > 1)
      .select(col("group"), col("n"), round(mu, 6).as("mean"),
        round(sig, 6).as("sigma"),
        round(when(sig > 0, lit(usl - lsl) / (lit(6.0) * sig)), 6)
          .as("cp"),
        round(when(sig > 0,
          least(lit(usl) - mu, mu - lit(lsl)) / (lit(3.0) * sig)), 6)
          .as("cpk"))
      .orderBy("group")
  }

  /** DuckDB twin of [[capability]]; `srcCte` must yield (grp, v). */
  def capabilityOracleSql(srcCte: String, lsl: Double,
                          usl: Double): String =
    s"""WITH src AS ($srcCte),
        gi AS (SELECT grp AS "group", COUNT(*) AS n,
            SUM(CAST(CAST(v AS DECIMAL(18,2)) * 100 AS HUGEINT)) AS s1i,
            SUM(CAST(CAST(v AS DECIMAL(18,2)) * 100 AS HUGEINT)
              * CAST(CAST(v AS DECIMAL(18,2)) * 100 AS HUGEINT)) AS s2i
          FROM src WHERE v IS NOT NULL GROUP BY grp),
        g AS (SELECT "group", n,
            ${graft.core.Lattice.duckPortableDouble("s1i")} / 100.0 AS s1,
            ${graft.core.Lattice.duckPortableDouble("s2i")} / 10000.0 AS s2
          FROM gi),
        c AS (SELECT "group", n, CAST(n AS DOUBLE) AS nd,
            s1 / CAST(n AS DOUBLE) AS mu,
            SQRT((s2 - CAST(n AS DOUBLE) * (s1 / CAST(n AS DOUBLE))
              * (s1 / CAST(n AS DOUBLE))) / (CAST(n AS DOUBLE) - 1))
              AS sig
          FROM g WHERE n > 1)
        SELECT "group", n, ROUND(mu, 6) AS mean, ROUND(sig, 6) AS sigma,
          ROUND(CASE WHEN sig > 0 THEN ($usl - $lsl) / (6.0 * sig)
            END, 6) AS cp,
          ROUND(CASE WHEN sig > 0 THEN
            LEAST($usl - mu, mu - $lsl) / (3.0 * sig) END, 6) AS cpk
        FROM c ORDER BY "group""""

  /** Grubbs extreme-outlier statistic per group:
    * G = max|x−μ|/σ, with the offending value (deterministic
    * tie-break: smallest such value). Two map-combinable aggregates —
    * exact-decimal moments, then a broadcast join back for the argmax
    * — never a sort. The screening question G answers ("is the single
    * worst point beyond what n normal draws produce?") precedes any
    * bulk outlier scan. Returns (group, n, g_stat 6dp, extreme_value).
    */
  def grubbs(df: DataFrame, groupCol: String,
             valueCol: String): DataFrame = {
    // cents lattice + portable double (see core/Lattice.scala): exact
    // integer moments whose double conversion is cross-engine stable
    val x = (col(valueCol).cast(DecimalType(18, 2)) * lit(100))
      .cast(DecimalType(38, 0))
    val base = df.filter(col(valueCol).isNotNull)
      .select(col(groupCol).as("group"),
        col(valueCol).cast("double").as("__v"), x.as("__xd"))
    val pd = graft.core.Lattice.sparkPortableDouble _
    val g = base.groupBy("group")
      .agg(count(lit(1)).as("n"),
        sum(col("__xd")).as("__s1i"),
        sum(col("__xd") * col("__xd")).as("__s2i"))
      .filter(col("n") > 2)
      .selectExpr("group", "n",
        s"${pd("__s1i")} / 100.0 AS __s1",
        s"${pd("__s2i")} / 10000.0 AS __s2")
    val nd = col("n").cast("double")
    val moments = g.select(col("group"), col("n"),
      (col("__s1") / nd).as("__mu"),
      sqrt((col("__s2") - nd * (col("__s1") / nd) *
        (col("__s1") / nd)) / (nd - 1)).as("__sig"))
    val dev = base.join(broadcast(moments), Seq("group"))
      .select(col("group"), col("n"), col("__sig"), col("__v"),
        abs(col("__v") - col("__mu")).as("__d"))
    val mx = dev.groupBy("group")
      .agg(max("__d").as("__dm"), first("n").as("n"),
        first("__sig").as("__sg"))
    dev.select(col("group"), col("__v"), col("__d"))
      .join(broadcast(mx), Seq("group"))
      .groupBy(col("group"))
      .agg(first("n").as("n"),
        round(when(first("__sg") > 0,
          first("__dm") / first("__sg")), 6).as("g_stat"),
        min(when(col("__d") === col("__dm"), col("__v")))
          .as("extreme_value"))
      .orderBy("group")
  }

  /** DuckDB twin of [[grubbs]]; `srcCte` must yield (grp, v). */
  def grubbsOracleSql(srcCte: String): String =
    s"""WITH src AS ($srcCte),
        base AS (SELECT grp AS g, CAST(v AS DOUBLE) AS v,
            CAST(CAST(v AS DECIMAL(18,2)) * 100 AS HUGEINT) AS xd
          FROM src WHERE v IS NOT NULL),
        moi AS (SELECT g, COUNT(*) AS n, SUM(xd) AS s1i,
            SUM(xd * xd) AS s2i
          FROM base GROUP BY g HAVING COUNT(*) > 2),
        mo AS (SELECT g, n,
            ${graft.core.Lattice.duckPortableDouble("s1i")} / 100.0 AS s1,
            ${graft.core.Lattice.duckPortableDouble("s2i")} / 10000.0 AS s2
          FROM moi),
        m2 AS (SELECT g, n, s1 / CAST(n AS DOUBLE) AS mu,
            SQRT((s2 - CAST(n AS DOUBLE) * (s1 / CAST(n AS DOUBLE))
              * (s1 / CAST(n AS DOUBLE))) / (CAST(n AS DOUBLE) - 1))
              AS sig
          FROM mo),
        dev AS (SELECT base.g, m2.n, m2.sig, base.v,
            ABS(base.v - m2.mu) AS d
          FROM base JOIN m2 USING (g)),
        mx AS (SELECT g, MAX(d) AS dm FROM dev GROUP BY g)
        SELECT dev.g AS "group", ANY_VALUE(dev.n) AS n,
          ROUND(CASE WHEN ANY_VALUE(dev.sig) > 0 THEN
            ANY_VALUE(mx.dm) / ANY_VALUE(dev.sig) END, 6) AS g_stat,
          MIN(CASE WHEN dev.d = mx.dm THEN dev.v END) AS extreme_value
        FROM dev JOIN mx USING (g)
        GROUP BY dev.g ORDER BY dev.g"""
}
