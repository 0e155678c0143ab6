package graft

import graft.api.{Catalog, Compound}
import graft.core.PipelineMeta

/** Compound record API (api/compound.py) and the PipelineMeta env-config
  * resolver (core/pipelines/pipeline_meta.py). */
class CompoundPipelineSpec extends SparkSpec {

  test("Compound: add_tag/remove_tag/add_meta/details round-trip") {
    val c0 = Compound("c123", smiles = Some("CCO"))
    val c1 = c0.addTag("alcohol").addTag("primary").addTag("alcohol") // idempotent
    assert(c1.tags == Seq("alcohol", "primary"))
    val c2 = c1.removeTag("primary").addMeta("toxic_info", "none")
    assert(c2.tags == Seq("alcohol"))
    assert(c2.meta == Map("toxic_info" -> "none"))
    val d = c2.details
    assert(d("id") == "c123" && d("smiles") == "CCO" && d("tags") == "alcohol")
    assert(c2.toString.contains("SMILES: CCO"))
  }

  test("CompoundStore: registry-backed persistence survives a reopened catalog") {
    val root = java.nio.file.Files.createTempDirectory("graft-compound").toString
    val cat = new Catalog(spark, root)
    val c = Compound("mol1", Some("c1ccccc1"), Seq("aromatic"), Map("mw" -> "78.1"))
    cat.compounds.save(c)
    cat.compounds.save(Compound("mol2"))
    assert(cat.compounds.list() == Seq("mol1", "mol2"))
    // reopen: records come back from the registry, not session state
    val cat2 = new Catalog(spark, root)
    val back = cat2.compounds.get("mol1").get
    assert(back == c)
    // re-save with a removed tag: the old tag must not linger
    cat2.compounds.save(back.removeTag("aromatic").addTag("benzene"))
    assert(cat2.compounds.get("mol1").get.tags == Seq("benzene"))
    cat2.compounds.delete("mol2")
    assert(cat2.compounds.list() == Seq("mol1"))
    assert(cat2.compounds.get("mol2").isEmpty)
  }

  test("review: delimiter-bearing ids/tags/meta keys are rejected, not corrupted") {
    val root = java.nio.file.Files.createTempDirectory("graft-compound2").toString
    val cat = new Catalog(spark, root)
    // '/' in an id would alias other ids' namespaces (delete("a") eating
    // "a/b"); ',' in a tag would split into two on read-back
    intercept[IllegalArgumentException](cat.compounds.save(Compound("a/b")))
    intercept[IllegalArgumentException](cat.compounds.save(Compound("")))
    intercept[IllegalArgumentException](
      cat.compounds.save(Compound("ok").addTag("x,y")))
    intercept[IllegalArgumentException](
      cat.compounds.save(Compound("ok").addMeta("k/1", "v")))
    // prefix ids must not alias: deleting "a" leaves "ab" intact
    cat.compounds.saveAll(Seq(Compound("a").addTag("t1"), Compound("ab").addTag("t2")))
    cat.compounds.delete("a")
    assert(cat.compounds.list() == Seq("ab"))
    assert(cat.compounds.get("ab").get.tags == Seq("t2"))
  }

  test("PipelineMeta: resolves keys, defaults, and fails hard") {
    val pm = new PipelineMeta(Map("PIPELINE_META" ->
      """{"mode": "dt", "model_name": "m-dt", "endpoint_name": "e-dt",
         "serverless": true, "challengers": ["a", "b"]}"""))
    assert(pm.modelName == "m-dt" && pm.endpointName == "e-dt")
    assert(pm.mode.contains("dt") && pm.serverless)
    assert(pm.challengers == Seq("a", "b"))
    assert(pm.get("custom", "fallback") == "fallback")
    intercept[RuntimeException](pm.get("custom"))
    // defaults: mode null (known key), serverless true
    val modeless = new PipelineMeta(Map("PIPELINE_META" -> """{"model_name": "m"}"""))
    assert(modeless.mode.isEmpty && modeless.serverless)
    assert(modeless.get("mode") == null) // known key — get and mode agree
    // owner resolution by mode
    pm.setOwner("BW")
    assert(pm.dynamicOwner == "DT") // dt/ts pin DT
    val promo = new PipelineMeta(Map("PIPELINE_META" -> """{"mode": "promote"}"""))
    promo.setOwner("BW")
    assert(promo.dynamicOwner == "Pro-BW")
    val plain = new PipelineMeta(Map("PIPELINE_META" -> """{"mode": "adhoc"}"""))
    plain.setOwner("Bob")
    assert(plain.dynamicOwner == "Bob")
    // fail-hard: unset and invalid
    intercept[RuntimeException](new PipelineMeta(Map.empty))
    intercept[RuntimeException](new PipelineMeta(Map("PIPELINE_META" -> "{broken")))
    intercept[RuntimeException](new PipelineMeta(Map("PIPELINE_META" -> "[1,2]")))
  }
}
