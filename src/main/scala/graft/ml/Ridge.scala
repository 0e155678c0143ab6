package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Two-feature ridge regression per group, solved in closed form: the
  * multivariate step past q176's simple OLS. Slopes come from the
  * centered 2×2 normal equations with an L2 penalty,
  *   (S + λI)·β = c,  β = [(s22+λ)c1 − s12·c2, (s11+λ)c2 − s12·c1]/det,
  *   det = (s11+λ)(s22+λ) − s12²,
  * intercept unpenalized (b0 = ȳ − β·x̄, the standard convention).
  * λ > 0 also conditions the collinear case the unpenalized formula
  * would blow up on.
  *
  * Scale shape: ONE map-side-combined groupBy computes the nine raw
  * moments; every closed-form expression then rides the #groups-sized
  * frame. No second pass, no matrix library, no driver math — the
  * whole fit is a single aggregation, which is what makes it viable
  * per-key on a 100 TB table (it is the textbook "sufficient
  * statistics" trick: moments are additive-mergeable).
  */
object Ridge {

  /** Fit y ~ b0 + b1·x1 + b2·x2 (+ λ on the slopes) per group.
    * `explained` is the centered explained-variance share
    * (β·c / Syy — exact R² at λ = 0, a shrunk proxy under penalty).
    * Groups with a singular penalized system (det = 0, only possible
    * at λ = 0) or fewer than 3 rows emit null coefficients. Returns
    * (group, n, b0, b1, b2, explained) floats 6dp. */
  def ridge2(df: DataFrame, groupCol: String, x1Col: String, x2Col: String,
             yCol: String, lambda: Double = 1.0): DataFrame = {
    require(lambda >= 0, s"lambda must be >= 0, got $lambda")
    val (x1, x2, y) = (col(x1Col).cast("double"), col(x2Col).cast("double"),
      col(yCol).cast("double"))
    val m = df.filter(x1.isNotNull && x2.isNotNull && y.isNotNull)
      .groupBy(col(groupCol).as("group"))
      .agg(count(lit(1)).as("n"),
        sum(x1).as("sx1"), sum(x2).as("sx2"), sum(y).as("sy"),
        sum(x1 * x1).as("sx1x1"), sum(x2 * x2).as("sx2x2"),
        sum(x1 * x2).as("sx1x2"),
        sum(x1 * y).as("sx1y"), sum(x2 * y).as("sx2y"),
        sum(y * y).as("syy"))
    val n = col("n").cast("double")
    val (m1, m2, my) = (col("sx1") / n, col("sx2") / n, col("sy") / n)
    val s11 = col("sx1x1") - n * m1 * m1 + lit(lambda)
    val s22 = col("sx2x2") - n * m2 * m2 + lit(lambda)
    val s12 = col("sx1x2") - n * m1 * m2
    val c1 = col("sx1y") - n * m1 * my
    val c2 = col("sx2y") - n * m2 * my
    val syyC = col("syy") - n * my * my
    val det = s11 * s22 - s12 * s12
    val b1 = (s22 * c1 - s12 * c2) / det
    val b2 = (s11 * c2 - s12 * c1) / det
    def fit(c: Column): Column =
      when(col("n") >= 3 && det =!= 0.0, round(c, 6))
    m.select(col("group"), col("n"),
      fit(my - b1 * m1 - b2 * m2).as("b0"),
      fit(b1).as("b1"), fit(b2).as("b2"),
      when(col("n") >= 3 && det =!= 0.0 && syyC =!= 0.0,
        round((b1 * c1 + b2 * c2) / syyC, 6)).as("explained"))
  }

  /** DuckDB mirror of [[ridge2]]: `rowsCte` must yield
    * (grp, x1, x2, y). */
  def ridge2OracleSql(rowsCte: String, lambda: Double): String = {
    val l = lambda
    // the same expression tree, spelled once per use exactly as the
    // Column DSL expands it (moment aliases keep it readable)
    val defs =
      s"""mm AS (SELECT grp,
            CAST(COUNT(*) AS DOUBLE) AS n, COUNT(*) AS ni,
            SUM(x1) AS sx1, SUM(x2) AS sx2, SUM(y) AS sy,
            SUM(x1 * x1) AS sx1x1, SUM(x2 * x2) AS sx2x2,
            SUM(x1 * x2) AS sx1x2,
            SUM(x1 * y) AS sx1y, SUM(x2 * y) AS sx2y,
            SUM(y * y) AS syy
          FROM rows0 GROUP BY grp),
        ex AS (SELECT grp, ni, n,
            sx1x1 - n * (sx1 / n) * (sx1 / n) + $l AS s11,
            sx2x2 - n * (sx2 / n) * (sx2 / n) + $l AS s22,
            sx1x2 - n * (sx1 / n) * (sx2 / n) AS s12,
            sx1y - n * (sx1 / n) * (sy / n) AS c1,
            sx2y - n * (sx2 / n) * (sy / n) AS c2,
            syy - n * (sy / n) * (sy / n) AS syyc,
            sx1 / n AS m1, sx2 / n AS m2, sy / n AS my
          FROM mm),
        sol AS (SELECT grp, ni, n, m1, m2, my, c1, c2, syyc,
            s11 * s22 - s12 * s12 AS det,
            (s22 * c1 - s12 * c2) / (s11 * s22 - s12 * s12) AS b1,
            (s11 * c2 - s12 * c1) / (s11 * s22 - s12 * s12) AS b2
          FROM ex)"""
    s"""WITH rows0 AS (SELECT grp, CAST(x1 AS DOUBLE) AS x1,
            CAST(x2 AS DOUBLE) AS x2, CAST(y AS DOUBLE) AS y
          FROM ($rowsCte)
          WHERE x1 IS NOT NULL AND x2 IS NOT NULL AND y IS NOT NULL),
        $defs
        SELECT grp AS "group", ni AS n,
          CASE WHEN ni >= 3 AND det != 0
            THEN ROUND(my - b1 * m1 - b2 * m2, 6) END AS b0,
          CASE WHEN ni >= 3 AND det != 0 THEN ROUND(b1, 6) END AS b1,
          CASE WHEN ni >= 3 AND det != 0 THEN ROUND(b2, 6) END AS b2,
          CASE WHEN ni >= 3 AND det != 0 AND syyc != 0
            THEN ROUND((b1 * c1 + b2 * c2) / syyc, 6) END AS explained
        FROM sol"""
  }
}
