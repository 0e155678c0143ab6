package graft

import graft.functions.TagCatalog
import graft.proximity.Analytics
import org.apache.spark.sql.functions._

/** Tag catalogs as data (reference mol_tagging.py:116-384): the
  * property-range rule engine and the tag→curation policy derivation. */
class TagCatalogSpec extends SparkSpec {
  import spark.implicits._

  private def tagsFor(mw: Double, logp: Double, hbd: Double, hba: Double,
                      rotbonds: Double, tpsa: Double): Set[String] = {
    val df = Seq((1L, mw, logp, hbd, hba, rotbonds, tpsa))
      .toDF("id", "mw", "logp", "hbd", "hba", "rotbonds", "tpsa")
    val out = TagCatalog.applyPropertyRules(df, "id", TagCatalog.propertyRules(spark))
    if (out.isEmpty) Set.empty
    else out.head().getSeq[String](1).toSet
  }

  test("property rules reproduce the reference physchem thresholds") {
    // clean oral-drug profile: compliant + strict + veber + lead-like
    assert(tagsFor(mw = 320, logp = 2.5, hbd = 2, hba = 5, rotbonds = 4, tpsa = 80) ==
      Set("physchem:ro5_compliant", "physchem:ro5_strict",
        "physchem:veber_compliant", "physchem:lead_like"))
    // one Ro5 violation (mw 510): compliant but not strict, beyond-Ro5 fires
    val one = tagsFor(mw = 510, logp = 2.5, hbd = 2, hba = 5, rotbonds = 4, tpsa = 80)
    assert(one("physchem:ro5_compliant") && !one("physchem:ro5_strict") &&
      one("physchem:beyond_ro5"))
    // two violations: not compliant
    assert(!tagsFor(mw = 510, logp = 6.0, hbd = 2, hba = 5, rotbonds = 4, tpsa = 80)
      ("physchem:ro5_compliant"))
    // fragment-like Ro3 (all five gates)
    assert(tagsFor(mw = 180, logp = 1.0, hbd = 1, hba = 2, rotbonds = 2, tpsa = 40)
      ("physchem:fragment_like"))
    // ADMET MW gates (mol_tagging.py:96-100)
    assert(tagsFor(mw = 80, logp = 1, hbd = 1, hba = 2, rotbonds = 2, tpsa = 40)
      ("curation:exclude:mw_too_low"))
    assert(tagsFor(mw = 950, logp = 1, hbd = 1, hba = 2, rotbonds = 2, tpsa = 40)
      ("curation:exclude:mw_too_high"))
  }

  test("null descriptor counts as a violation, tagless rows drop out") {
    val df = Seq((1L, Some(400.0), 6.0, 6.0, 11.0, 11.0, 150.0),
        (2L, None: Option[Double], 6.0, 6.0, 11.0, 11.0, 150.0))
      .toDF("id", "mw", "logp", "hbd", "hba", "rotbonds", "tpsa")
    val out = TagCatalog.applyPropertyRules(df, "id", TagCatalog.propertyRules(spark))
    // id 1: every category misses (2-3 violations each, beyond needs mw/logp>thr ok
    // logp 6 > 5 → beyond fires); id 2: null mw ALSO violates mw gates → both
    // mw_too_low and mw_too_high fire alongside beyond_ro5
    val m = out.collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    assert(m(1L) == Set("physchem:beyond_ro5"))
    assert(m(2L) == Set("physchem:beyond_ro5",
      "curation:exclude:mw_too_low", "curation:exclude:mw_too_high"))
  }

  test("compiled rule path is shuffle-free and matches the join path") {
    val df = (1L to 500L).map(i =>
        (i, (80 + (i % 100) * 10).toDouble, ((i % 13) - 4).toDouble,
          (i % 8).toDouble, (i % 14).toDouble, (i % 15).toDouble, (i % 200).toDouble))
      .toDF("id", "mw", "logp", "hbd", "hba", "rotbonds", "tpsa")
    val rules = TagCatalog.propertyRules(spark)
    val compiled = TagCatalog.applyPropertyRules(df, "id", rules)
    // zero Exchange operators: scan → project → filter only
    val exchanges = compiled.queryExecution.executedPlan.collect {
      case e: org.apache.spark.sql.execution.exchange.Exchange => e
    }
    assert(exchanges.isEmpty, s"compiled rule path should not shuffle: $exchanges")
    // bit-identical to the join+groupBy fallback (forced via a low limit)
    val viaJoin = {
      val long = df.selectExpr("id",
        "stack(6, 'mw', mw, 'logp', logp, 'hbd', hbd, 'hba', hba, " +
          "'rotbonds', rotbonds, 'tpsa', tpsa) as (property, value)")
      long.join(broadcast(rules), "property")
        .groupBy("id", "tag")
        .agg(sum(when(col("value").isNull || col("value") < col("lo") ||
          col("value") > col("hi"), 1).otherwise(0)).as("v"),
          first("min_violations").as("min_v"), first("max_violations").as("max_v"))
        .filter(col("v").between(col("min_v"), col("max_v")))
        .groupBy("id").agg(sort_array(collect_set(col("tag"))).as("tags"))
    }
    val a = compiled.as[(Long, Seq[String])].collect().toMap
    val b = viaJoin.as[(Long, Seq[String])].collect().toMap
    assert(a == b)
  }

  test("oversized catalogs take the join fallback and agree with compiled") {
    // 51 tags × 5 rules = 255 rows > CompileRuleLimit → join path; the
    // same catalog truncated to 40 tags compiles — both must tag a row
    // identically on the shared tags
    def catalogRows(nTags: Int) = (0 until nTags).flatMap { t =>
      Seq("mw", "logp", "hbd", "hba", "rotbonds").zipWithIndex.map {
        case (p, i) =>
          (f"synth:tag_$t%03d", p, -1e18, (t * 5 + i * 7).toDouble % 97, 0, 1)
      }
    }
    val big = spark.createDataFrame(catalogRows(51))
      .toDF("tag", "property", "lo", "hi", "min_violations", "max_violations")
    val small = spark.createDataFrame(catalogRows(40))
      .toDF("tag", "property", "lo", "hi", "min_violations", "max_violations")
    assert(big.count() > TagCatalog.CompileRuleLimit)
    val df = Seq((1L, 30.0, 20.0, 10.0, 5.0, 2.0, 0.0))
      .toDF("id", "mw", "logp", "hbd", "hba", "rotbonds", "tpsa")
    val viaJoin = TagCatalog.applyPropertyRules(df, "id", big)
      .head().getSeq[String](1).filter(_ < "synth:tag_040")
    val viaCompiled = TagCatalog.applyPropertyRules(df, "id", small)
      .head().getSeq[String](1)
    assert(viaJoin == viaCompiled && viaCompiled.nonEmpty)
  }

  test("curation policy derives exclude/caution tags incl. prefix match") {
    val df = Seq(
      (1L, Seq("composition:inorganic", "structure:acyclic")),
      (2L, Seq("liabilities:pains_b", "structure:macrocycle")),
      (3L, Seq("structure:aromatic")),
      (4L, Seq.empty[String])).toDF("id", "tags")
    val out = TagCatalog.deriveCurationTags(df, TagCatalog.curationPolicy(spark))
      .select("id", "curation_tags").as[(Long, Seq[String])].collect().toMap
    assert(out(1L) == Seq("curation:exclude:inorganic"))
    assert(out(2L) == Seq("curation:caution:macrocycle", "curation:caution:pains"))
    assert(out(3L).isEmpty && out(4L).isEmpty)
  }

  test("catalog tags feed filterByTags end-to-end") {
    val df = Seq(
      (1L, Seq("composition:inorganic")),
      (2L, Seq("liabilities:pains_a")),
      (3L, Seq("structure:aromatic"))).toDF("id", "tags")
    val curated = TagCatalog.deriveCurationTags(df, TagCatalog.curationPolicy(spark))
      .withColumn("tags", sort_array(concat(col("tags"), col("curation_tags"))))
    val kept = Analytics.filterByTags(curated,
      excludePrefix = Seq("curation:exclude:"))
      .select("id").as[Long].collect().toSet
    assert(kept == Set(2L, 3L))
    val flagged = Analytics.filterByTags(curated,
      requirePrefix = Seq("curation:")).select("id").as[Long].collect().toSet
    assert(flagged == Set(1L, 2L))
  }
}
