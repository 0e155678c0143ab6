package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ensemble aggregation — the combination math behind the reference's
  * meta-endpoint DAG nodes and its offline strategy simulator
  * (utils/aggregation_nodes.py:1-387, utils/ensemble_utils.py:1-57).
  *
  * The reference aligns M model-output frames with M-way pandas merges
  * on a synthetic row id and then does numpy row math. Here each
  * aggregator is ONE union + ONE groupBy on the row id — a single
  * shuffle regardless of M — followed by one pass-through join back to
  * the first upstream's user columns (the reference's `_build_output`
  * merge). Per-model constants (static weights, correlation scales)
  * ride along as literals stamped per union branch, so every strategy's
  * per-row weight normalization folds into plain aggregate expressions
  * inside whole-stage codegen.
  */
object Ensemble {
  /** Output contract shared by every prediction aggregator
    * (aggregation_nodes.py:134 OUTPUT_COLS). */
  val OutputCols: Seq[String] = Seq("prediction", "prediction_std", "confidence")

  /** DAG aggregation nodes (aggregation_nodes.py class hierarchy).
    * `corrScale` empty means all-ones; weights are normalized at
    * construction like the reference's `__init__` checks. */
  sealed trait AggNode {
    def name: String
    def apply(upstream: Seq[DataFrame], rowId: String): DataFrame
  }

  /** Column-union of parallel feature branches, inner-joined on the
    * walker row id (aggregation_nodes.py:89-117 Concat). */
  final case class Concat(name: String) extends AggNode {
    def apply(upstream: Seq[DataFrame], rowId: String): DataFrame = {
      require(upstream.nonEmpty, s"Concat[$name]: requires at least one upstream")
      upstream.reduce { (out, df) =>
        val fresh = df.columns.filter(c => c == rowId || !out.columns.contains(c))
        out.join(df.select(fresh.map(col).toIndexedSeq: _*), Seq(rowId), "inner")
      }
    }
  }

  /** Equal-weight mean (aggregation_nodes.py:188-199). */
  final case class Mean(name: String) extends AggNode {
    def apply(upstream: Seq[DataFrame], rowId: String): DataFrame =
      aggregate(upstream, rowId, name) { m =>
        (avg("__pred"), avg("__conf"))
      }
  }

  /** Static-weight mean; weights normalized to sum 1
    * (aggregation_nodes.py:202-228). */
  final case class WeightedMean(name: String, weights: Seq[Double]) extends AggNode {
    val w: Seq[Double] = normalize(weights, "WeightedMean")
    def apply(upstream: Seq[DataFrame], rowId: String): DataFrame = {
      checkArity(upstream, w, s"WeightedMean[$name]")
      aggregate(upstream, rowId, name, w) { m =>
        (sum(col("__pred") * col("__mw")), sum(col("__conf") * col("__mw")))
      }
    }
  }

  /** Majority vote over classifier labels: winner = most common label
    * (smallest label on ties, pandas `mode()[0]`), confidence = winner
    * share, prediction_std = 0 for contract symmetry
    * (aggregation_nodes.py:231-266). */
  final case class Vote(name: String) extends AggNode {
    def apply(upstream: Seq[DataFrame], rowId: String): DataFrame = {
      require(upstream.nonEmpty, s"Vote[$name]: requires at least one upstream")
      val m = upstream.size
      val long = upstream.map(df =>
        df.select(col(rowId).as("__rid"),
          col("prediction").cast("string").as("__label")))
        .reduce(_ unionByName _)
      // (rid, label) counts → per-rid argmax via ONE more groupBy:
      // max_by over (count, reversed-label) structs would tie-break to
      // the LARGEST label, so order by count with min_by on the
      // lexicographically-smallest label among max-count rows instead
      val counts = long.groupBy("__rid", "__label").agg(count(lit(1)).as("__c"))
      val winners = counts.groupBy("__rid").agg(
        max("__c").as("__maxc"),
        sum("__c").as("__votes"),
        min_by(col("__label"),
          // smallest label among max-count labels: sort key ranks count
          // first (descending via negation) then label ascending
          struct((-col("__c")).as("c"), col("__label").as("l"))).as("prediction"))
        .filter(col("__votes") === m) // inner-join id semantics across upstream
        .select(col("__rid").as(rowId), col("prediction"),
          lit(0.0).as("prediction_std"),
          (col("__maxc") / lit(m.toDouble)).as("confidence"))
      passThrough(upstream.head, winners, rowId)
    }
  }

  /** Shared knobs of the calibrated strategy family
    * (aggregation_nodes.py:272-301 _StrategyAggregator). */
  sealed trait StrategyNode extends AggNode {
    def modelWeights: Seq[Double]
    def corrScale: Seq[Double]
    def optimalAlpha: Double
    protected lazy val mw: Seq[Double] =
      normalize(modelWeights, getClass.getSimpleName)
    protected lazy val cs: Seq[Double] = {
      val c = if (corrScale.isEmpty) Seq.fill(modelWeights.size)(1.0) else corrScale
      require(c.size == modelWeights.size,
        s"${getClass.getSimpleName}: corrScale size must match modelWeights size")
      c
    }
    /** confidence = α·agreement + (1−α)·calibrated-confidence
      * (ensemble_utils.ensemble_confidence; numpy std → stddev_pop). */
    protected def ensembleConfidence: Column =
      lit(optimalAlpha) / (lit(1.0) + coalesce(stddev_pop("__pred"), lit(0.0))) +
        lit(1.0 - optimalAlpha) * sum(col("__conf") * col("__cs") * col("__mw"))
    /** Per-row normalized weights with static fallback on ~zero rows
      * (ensemble_utils.conf_weights_with_fallback): the weighted sum
      * collapses to Σ(pred·kᵢ)/(Σkᵢ+1e-12) for per-row kernel k. */
    protected def fallbackWeighted(kernelTimesPred: Column, kernelSum: Column): Column =
      when(kernelSum < 1e-12, sum(col("__pred") * col("__mw")))
        .otherwise(kernelTimesPred / (kernelSum + lit(1e-12)))
  }

  /** Per-row weights = normalized confidences
    * (aggregation_nodes.py:304-320). */
  final case class ConfidenceWeighted(name: String, modelWeights: Seq[Double],
                                      corrScale: Seq[Double] = Nil,
                                      optimalAlpha: Double = 0.5) extends StrategyNode {
    def apply(upstream: Seq[DataFrame], rowId: String): DataFrame = {
      checkArity(upstream, mw, s"ConfidenceWeighted[$name]")
      aggregate(upstream, rowId, name, mw, cs) { m =>
        (fallbackWeighted(sum(col("__pred") * col("__conf")), sum("__conf")),
          ensembleConfidence)
      }
    }
  }

  /** Static inverse-MAE weights + calibrated ensemble confidence
    * (aggregation_nodes.py:323-341). */
  final case class InverseMaeWeighted(name: String, modelWeights: Seq[Double],
                                      corrScale: Seq[Double] = Nil,
                                      optimalAlpha: Double = 0.5) extends StrategyNode {
    def apply(upstream: Seq[DataFrame], rowId: String): DataFrame = {
      checkArity(upstream, mw, s"InverseMaeWeighted[$name]")
      aggregate(upstream, rowId, name, mw, cs) { m =>
        (sum(col("__pred") * col("__mw")), ensembleConfidence)
      }
    }
  }

  /** Per-row weights = static weight × confidence
    * (aggregation_nodes.py:344-361). */
  final case class ScaledConfidenceWeighted(name: String, modelWeights: Seq[Double],
                                            corrScale: Seq[Double] = Nil,
                                            optimalAlpha: Double = 0.5) extends StrategyNode {
    def apply(upstream: Seq[DataFrame], rowId: String): DataFrame = {
      checkArity(upstream, mw, s"ScaledConfidenceWeighted[$name]")
      aggregate(upstream, rowId, name, mw, cs) { m =>
        (fallbackWeighted(sum(col("__pred") * col("__conf") * col("__mw")),
          sum(col("__conf") * col("__mw"))), ensembleConfidence)
      }
    }
  }

  /** Per-row weights = confidence × |confidence-to-error correlation|
    * (aggregation_nodes.py:364-387). */
  final case class CalibratedConfidenceWeighted(name: String, modelWeights: Seq[Double],
                                                corrScale: Seq[Double] = Nil,
                                                optimalAlpha: Double = 0.5) extends StrategyNode {
    def apply(upstream: Seq[DataFrame], rowId: String): DataFrame = {
      checkArity(upstream, mw, s"CalibratedConfidenceWeighted[$name]")
      aggregate(upstream, rowId, name, mw, cs) { m =>
        (fallbackWeighted(sum(col("__pred") * col("__conf") * col("__cs")),
          sum(col("__conf") * col("__cs"))), ensembleConfidence)
      }
    }
  }

  // ── shared kernels ──

  private def normalize(weights: Seq[Double], who: String): Seq[Double] = {
    require(weights.nonEmpty, s"$who: weights must be a non-empty list")
    require(weights.forall(_ >= 0), s"$who: weights must be non-negative")
    val total = weights.sum
    require(total > 0, s"$who: at least one weight must be positive")
    weights.map(_ / total)
  }

  private def checkArity(upstream: Seq[DataFrame], w: Seq[Double], who: String): Unit =
    require(upstream.size == w.size,
      s"$who: got ${upstream.size} upstream frames but ${w.size} weights")

  /** Stack M upstream frames into one long frame (__rid, __pred, __conf,
    * __mw, __cs) — the union replaces the reference's `_stack` M-way
    * merge; missing confidence columns default to 1.0 like np.ones
    * (aggregation_nodes.py:161-185). */
  private def stack(upstream: Seq[DataFrame], rowId: String,
                    mw: Seq[Double], cs: Seq[Double]): DataFrame =
    upstream.zipWithIndex.map { case (df, i) =>
      df.select(col(rowId).as("__rid"),
        col("prediction").cast("double").as("__pred"),
        (if (df.columns.contains("confidence")) col("confidence").cast("double")
         else lit(1.0)).as("__conf"),
        lit(if (mw.isEmpty) 1.0 / upstream.size else mw(i)).as("__mw"),
        lit(if (cs.isEmpty) 1.0 else cs(i)).as("__cs"))
    }.reduce(_ unionByName _)

  /** One groupBy computing (prediction, confidence) from the builder's
    * aggregate pair plus the shared prediction_std (numpy population
    * std) and the inner-join row filter (only ids present in ALL
    * upstream frames survive, matching the reference's merges). */
  private def aggregate(upstream: Seq[DataFrame], rowId: String, who: String,
                        mw: Seq[Double] = Nil, cs: Seq[Double] = Nil)(
      build: Int => (Column, Column)): DataFrame = {
    require(upstream.nonEmpty, s"$who: requires at least one upstream DataFrame")
    val m = upstream.size
    val (pred, conf) = build(m)
    val agg = stack(upstream, rowId, mw, cs)
      .groupBy(col("__rid").as(rowId))
      .agg(pred.as("prediction"),
        coalesce(stddev_pop("__pred"), lit(0.0)).as("prediction_std"),
        conf.as("confidence"),
        count(lit(1)).as("__n"))
      .filter(col("__n") === m).drop("__n")
    passThrough(upstream.head, agg, rowId)
  }

  /** `_build_output` (aggregation_nodes.py:139-159): user columns from
    * the first upstream flow through; its prediction columns are
    * replaced by the aggregated ones. */
  private def passThrough(first: DataFrame, agg: DataFrame, rowId: String): DataFrame =
    first.drop(OutputCols.filter(first.columns.contains): _*)
      .join(agg, Seq(rowId), "inner")
}
