package graft.api

/** Compound: a per-compound record of tags and free-form metadata — the
  * reference's `Compound` dataclass (api/compound.py:10-61: id, smiles,
  * tags, meta, add_tag/remove_tag/add_meta/details). SVG rendering is
  * RDKit-backed in the reference and scoped out with the rest of the
  * chem drawing stack (SURVEY §7.5); everything data-shaped is here.
  *
  * Immutable: mutators return an updated copy (idiomatic Scala for a
  * record the reference mutates in place). Persistence lives in
  * [[CompoundStore]].
  */
case class Compound(id: String, smiles: Option[String] = None,
                    tags: Seq[String] = Seq.empty,
                    meta: Map[String, String] = Map.empty) {
  /** add_tag: append once, order preserved (compound.py:19-22). */
  def addTag(tag: String): Compound =
    if (tags.contains(tag)) this else copy(tags = tags :+ tag)

  /** remove_tag (compound.py:24-27). */
  def removeTag(tag: String): Compound = copy(tags = tags.filterNot(_ == tag))

  /** add_meta (compound.py:29-31). */
  def addMeta(key: String, value: String): Compound =
    copy(meta = meta + (key -> value))

  /** details (compound.py:33-39) — project key included like the
    * reference's placeholder. */
  def details: Map[String, String] = Map(
    "id" -> id,
    "smiles" -> smiles.orNull,
    "tags" -> tags.mkString(","),
    "meta" -> meta.toSeq.sortBy(_._1).map { case (k, v) => s"$k=$v" }.mkString(";"))

  override def toString: String = {
    val t = if (tags.nonEmpty) tags.mkString(", ") else "None"
    val m = if (meta.nonEmpty) meta.toString else "None"
    s"Compound($id)\n  SMILES: ${smiles.getOrElse("None")}\n  Tags: $t\n  Meta: $m"
  }
}

/** CompoundStore: persists [[Compound]] records into the registry meta of
  * a single `compound_store` artifact row — metadata-sized by
  * construction (the reference keeps Compounds in memory and persists
  * compound collections through DF stores; here the record round-trips
  * the catalog so tags survive sessions, the same registry-meta backing
  * the tag catalogs use).
  *
  * Keys: `graft_compound/<id>/smiles|tags|meta/<k>` in the artifact's
  * free-form meta map. All writes go through the registry's locked
  * read-modify-write.
  */
class CompoundStore(val catalog: Catalog) {
  private val ArtifactName = "compound_store"
  private def reg = catalog.registry
  private def prefix(id: String) = s"graft_compound/$id/"

  // the key scheme delimits ids with '/' and tag lists with ',' — a
  // record containing them would silently corrupt the round-trip (and a
  // '/'-bearing id would alias other ids' namespaces on delete)
  private def validate(c: Compound): Unit = {
    require(c.id.nonEmpty && !c.id.contains("/"),
      s"compound id '${c.id}' must be non-empty and must not contain '/'")
    c.tags.foreach(t => require(!t.contains(","),
      s"tag '$t' must not contain ','"))
    c.meta.keys.foreach(k => require(!k.contains("/"),
      s"meta key '$k' must not contain '/'"))
  }

  private def ensureRow(): Unit =
    if (reg.get(ArtifactName).isEmpty) reg.upsert(ArtifactName, "compound_store")

  private def keysOf(c: Compound): Map[String, String] =
    Map(prefix(c.id) + "tags" -> c.tags.mkString(",")) ++
      c.smiles.map(s => prefix(c.id) + "smiles" -> s).toMap ++
      c.meta.map { case (k, v) => prefix(c.id) + "meta/" + k -> v }

  /** Upsert the full record: the compound's key namespace is replaced in
    * ONE locked registry write, so removed tags/meta don't linger and a
    * save costs one parquet swap, not one per key. */
  def save(c: Compound): Unit = {
    validate(c)
    ensureRow()
    reg.replaceMetaPrefixes(ArtifactName, Seq(prefix(c.id)), keysOf(c))
  }

  /** Batch upsert: all records land in a single locked registry write —
    * the bulk-ingest path (N per-record saves would serialize N lock +
    * parquet-swap cycles on the shared store row). */
  def saveAll(cs: Seq[Compound]): Unit = if (cs.nonEmpty) {
    cs.foreach(validate)
    ensureRow()
    reg.replaceMetaPrefixes(ArtifactName, cs.map(c => prefix(c.id)),
      cs.flatMap(keysOf).toMap)
  }

  def get(id: String): Option[Compound] = {
    val m = reg.getMeta(ArtifactName)
    val p = prefix(id)
    val keys = m.filter { case (k, _) => k.startsWith(p) }
    if (keys.isEmpty) None
    else Some(Compound(
      id,
      smiles = keys.get(p + "smiles"),
      tags = keys.get(p + "tags").map(_.split(",").toSeq.filter(_.nonEmpty))
        .getOrElse(Seq.empty),
      meta = keys.collect {
        case (k, v) if k.startsWith(p + "meta/") => k.stripPrefix(p + "meta/") -> v
      }))
  }

  /** Every stored record from ONE registry read (per-id `get` loops cost
    * one parquet read each). */
  def getAll(): Seq[Compound] = {
    val m = reg.getMeta(ArtifactName)
    m.keys.collect { case k if k.startsWith("graft_compound/") =>
        k.stripPrefix("graft_compound/").takeWhile(_ != '/') }
      .toSeq.distinct.sorted.map { id =>
        val p = prefix(id)
        Compound(id,
          smiles = m.get(p + "smiles"),
          tags = m.get(p + "tags").map(_.split(",").toSeq.filter(_.nonEmpty))
            .getOrElse(Seq.empty),
          meta = m.collect {
            case (k, v) if k.startsWith(p + "meta/") =>
              k.stripPrefix(p + "meta/") -> v
          })
      }
  }

  def list(): Seq[String] =
    reg.getMeta(ArtifactName).keys
      .collect { case k if k.startsWith("graft_compound/") =>
        k.stripPrefix("graft_compound/").takeWhile(_ != '/') }
      .toSeq.distinct.sorted

  def delete(id: String): Unit =
    reg.replaceMetaPrefixes(ArtifactName, Seq(prefix(id)), Map.empty)
}
