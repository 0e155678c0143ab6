package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Tag catalogs as DATA + the rule engines that apply them.
  *
  * The reference derives molecular curation tags in Python with RDKit
  * (reference: src/workbench/utils/chem_utils/mol_tagging.py:116-384).
  * RDKit has no JVM port (SURVEY §7.5), but the *catalogs* — the
  * property-range thresholds behind the physchem:* tags and the
  * tag→curation-decision policy behind the curation:* tags — are pure
  * data. This module ports them as literal reference tables so that
  * tag-driven training-set curation (tag → filterByTags) works
  * end-to-end on frames that carry precomputed descriptor columns,
  * with no RDKit anywhere.
  *
  * Scale design: both catalogs are O(10) rows, and both appliers
  * collect them once and COMPILE them into a single codegen'd array
  * projection — zero joins, zero shuffles, no UDF ([[applyPropertyRules]]
  * keeps a stack + broadcast-join + groupBy fallback for catalogs too
  * large to compile into a when-tree).
  */
object TagCatalog {

  /** Property-range rule catalog
    * (reference: mol_tagging.py:200-228 `_physchem_tags` thresholds and
    * mol_tagging.py:96-100,265-270 ADMET MW bounds).
    *
    * Semantics: for each tag, count its rule rows whose property value
    * is null or outside [lo, hi]; the tag is emitted when
    * `min_violations <= count <= max_violations`. This one shape covers
    * all the reference's forms: AND-of-ranges (0..0), "at most one
    * violation" Ro5 (0..1), and "at least one out of range" beyond-Ro5
    * / MW excludes (1..n). ±1e18 stand in for unbounded sides so the
    * catalog stays plain doubles (SQL-expressible).
    */
  def propertyRules(spark: SparkSession): DataFrame = {
    val U = 1e18 // unbounded sentinel
    val rows: Seq[(String, String, Double, Double, Int, Int)] = Seq(
      // Lipinski Ro5 (mol_tagging.py:210-215): <=1 violation compliant, 0 strict
      ("physchem:ro5_compliant", "mw", -U, 500.0, 0, 1),
      ("physchem:ro5_compliant", "logp", -U, 5.0, 0, 1),
      ("physchem:ro5_compliant", "hbd", -U, 5.0, 0, 1),
      ("physchem:ro5_compliant", "hba", -U, 10.0, 0, 1),
      ("physchem:ro5_strict", "mw", -U, 500.0, 0, 0),
      ("physchem:ro5_strict", "logp", -U, 5.0, 0, 0),
      ("physchem:ro5_strict", "hbd", -U, 5.0, 0, 0),
      ("physchem:ro5_strict", "hba", -U, 10.0, 0, 0),
      // beyond-Ro5 = mw > 500 OR logp > 5 (mol_tagging.py:215-216)
      ("physchem:beyond_ro5", "mw", -U, 500.0, 1, 2),
      ("physchem:beyond_ro5", "logp", -U, 5.0, 1, 2),
      // Veber oral bioavailability (mol_tagging.py:218-219)
      ("physchem:veber_compliant", "rotbonds", -U, 10.0, 0, 0),
      ("physchem:veber_compliant", "tpsa", -U, 140.0, 0, 0),
      // lead-likeness window (mol_tagging.py:221-222)
      ("physchem:lead_like", "mw", 150.0, 350.0, 0, 0),
      ("physchem:lead_like", "logp", -3.0, 3.5, 0, 0),
      // Ro3 fragment-likeness (mol_tagging.py:224-225)
      ("physchem:fragment_like", "mw", -U, 300.0, 0, 0),
      ("physchem:fragment_like", "logp", -U, 3.0, 0, 0),
      ("physchem:fragment_like", "hbd", -U, 3.0, 0, 0),
      ("physchem:fragment_like", "hba", -U, 3.0, 0, 0),
      ("physchem:fragment_like", "rotbonds", -U, 3.0, 0, 0),
      // ADMET training-set MW gates (mol_tagging.py:96-100, 265-270)
      ("curation:exclude:mw_too_low", "mw", 100.0, U, 1, 1),
      ("curation:exclude:mw_too_high", "mw", -U, 900.0, 1, 1)
    )
    spark.createDataFrame(rows)
      .toDF("tag", "property", "lo", "hi", "min_violations", "max_violations")
  }

  /** Tag→tag curation policy catalog
    * (reference: mol_tagging.py:254-288 `_curation_tags`): each row maps
    * a source tag (exact, or a prefix when `is_prefix`) to the derived
    * curation:* tag it implies. The value-based rows of `_curation_tags`
    * (MW gates) live in [[propertyRules]] instead, since they read a
    * numeric column rather than a tag.
    */
  def curationPolicy(spark: SparkSession): DataFrame = {
    val rows: Seq[(String, Boolean, String)] = Seq(
      ("composition:inorganic", false, "curation:exclude:inorganic"),
      ("composition:organometallic", false, "curation:exclude:organometallic"),
      ("composition:isotope_labeled", false, "curation:caution:isotope_labeled"),
      ("structure:peptide", false, "curation:caution:peptide"),
      ("structure:macrocycle", false, "curation:caution:macrocycle"),
      ("composition:heavy_metal", false, "curation:caution:heavy_metal"),
      ("composition:highly_halogenated", false, "curation:caution:highly_halogenated"),
      ("composition:unusual_element", false, "curation:caution:unusual_element"),
      ("liabilities:pains_", true, "curation:caution:pains")
    )
    spark.createDataFrame(rows).toDF("source_tag", "is_prefix", "derived_tag")
  }

  /** Apply a property-range rule catalog to numeric descriptor columns,
    * producing a sorted `tagColumn` array per row. Only ids that earn at
    * least one tag appear in the output (inner semantics, like the
    * reference emitting nothing for clean compounds in a category).
    *
    * Plan: for a normal-sized catalog (≤ [[CompileRuleLimit]] rows) the
    * rules are collected once and compiled into ONE codegen'd
    * projection — per tag, the violation count is a sum of range
    * `when`s; the tag array assembles with `array`/`filter`. Zero
    * joins, zero shuffles: scan → project → filter, the plan you want
    * at any scale. Catalogs above the limit (where a giant codegen'd
    * when-tree would stop being a win) fall back to stack-long +
    * broadcast join + two groupBys on id — still window-free.
    */
  def applyPropertyRules(df: DataFrame, idCol: String, rules: DataFrame,
                         tagColumn: String = "tags"): DataFrame = {
    val ruleRows = rules
      .select("tag", "property", "lo", "hi", "min_violations", "max_violations")
      .collect()
    val props = ruleRows.map(_.getString(1)).distinct.sorted
    require(props.forall(df.columns.contains),
      s"applyPropertyRules: missing descriptor columns ${props.filterNot(df.columns.contains).mkString(", ")}")
    if (ruleRows.length <= CompileRuleLimit)
      applyCompiled(df, idCol, ruleRows.toSeq, tagColumn)
    else {
      val long = df.select(col(idCol), expr(
        s"stack(${props.length}, ${props.map(p => s"'$p', cast(`$p` as double)").mkString(", ")}) as (property, value)"))
      val violations = long.join(broadcast(rules), "property")
        .groupBy(col(idCol), col("tag"))
        .agg(
          sum(when(col("value").isNull || col("value") < col("lo") ||
            col("value") > col("hi"), 1).otherwise(0)).as("violations"),
          first(col("min_violations")).as("min_v"),
          first(col("max_violations")).as("max_v"))
      violations
        .filter(col("violations").between(col("min_v"), col("max_v")))
        .groupBy(col(idCol))
        .agg(sort_array(collect_set(col("tag"))).as(tagColumn))
    }
  }

  /** Rule-count ceiling for the compiled (shuffle-free) path. */
  val CompileRuleLimit = 200

  private def applyCompiled(df: DataFrame, idCol: String,
                            ruleRows: Seq[org.apache.spark.sql.Row],
                            tagColumn: String): DataFrame = {
    // conditional SINGLETON-ARRAY concat, not array()+HOF filter: higher-
    // order lambdas (ArrayFilter) are CodegenFallback, which would drop
    // the whole when-tree out of whole-stage codegen AND evaluate it
    // twice (once in the size() filter, once in the projection)
    val empty = array().cast("array<string>")
    val byTag = ruleRows.groupBy(_.getString(0)).toSeq.sortBy(_._1)
    val tagExprs = byTag.map { case (tag, rs) =>
      val violations = rs.map { r =>
        val v = col(r.getString(1)).cast("double")
        when(v.isNull || v < lit(r.getDouble(2)) || v > lit(r.getDouble(3)), 1)
          .otherwise(0)
      }.reduce(_ + _)
      val (minV, maxV) = (rs.head.getInt(4), rs.head.getInt(5))
      when(violations.between(minV, maxV), array(lit(tag))).otherwise(empty)
    }
    df.select(col(idCol), sort_array(concat(tagExprs: _*)).as(tagColumn))
      .filter(size(col(tagColumn)) > 0)
  }

  /** Derive curation tags from an existing tag array via the policy
    * catalog. The tiny policy is collected once and compiled into a
    * single codegen'd array projection — catalog-as-data in, pure
    * whole-stage-codegen plan out. Exact matches are `array_contains`;
    * prefix matches test `contains(SEP + prefix)` against a SEP-joined
    * tag string (SEP = \\u0001, never in a tag) because the natural
    * `exists(_.startsWith(…))` is a CodegenFallback higher-order lambda.
    * Null tag arrays derive no tags. */
  def deriveCurationTags(df: DataFrame, policy: DataFrame,
                         tagColumn: String = "tags",
                         outColumn: String = "curation_tags"): DataFrame = {
    val rows = policy.select("source_tag", "is_prefix", "derived_tag").collect()
    require(rows.length <= 1000,
      s"deriveCurationTags: policy catalog unexpectedly large (${rows.length} rows)")
    val sep = "\u0001"
    val joined = concat(lit(sep), array_join(col(tagColumn), sep))
    val empty = array().cast("array<string>")
    val derived = rows.toSeq.map { r =>
      val (src, pfx, out) = (r.getString(0), r.getBoolean(1), r.getString(2))
      val cond =
        if (pfx) joined.contains(sep + src)
        else array_contains(col(tagColumn), src)
      when(coalesce(cond, lit(false)), array(lit(out))).otherwise(empty)
    }
    df.withColumn(outColumn,
      sort_array(array_distinct(concat(derived: _*))))
  }
}
