package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** URL-level curation (C4 / RefinedWeb-style): normalize, extract the
  * domain, drop blocklisted domains, and deduplicate the corpus by
  * normalized URL — the first gate every web-scale training pipeline
  * applies, before any content-based filter touches the text (beyond
  * the reference's operator set — north-star scope).
  *
  * Every transform is a pure codegen'd column expression (regexp
  * strip / extract / lower), so annotation is one projection; the only
  * shuffle in the whole pack is the per-URL first-occurrence window,
  * keyed on the normalized URL (groups are near-singletons, so the
  * window never concentrates rows). The blocklist comparison stays a
  * broadcast: either a literal IN over a small in-code list or an
  * anti-join against a blocklist frame that AQE broadcasts.
  *
  * The registered-domain extraction is the standard two-label
  * approximation (no public-suffix list on the JVM classpath —
  * "foo.co.uk" style multi-label suffixes resolve to "co.uk"); exact
  * PSL parsing is a data-file swap, not a design change.
  */
object Urls {

  /** Canonical form: lowercase, scheme and leading "www." stripped,
    * fragment always cut, query cut when `dropQuery`, trailing slashes
    * trimmed. Pure string surgery — no parsing library — so the exact
    * same regexes run on any engine. */
  def normalize(url: Column, dropQuery: Boolean = true): Column = {
    val lowered  = lower(trim(url))
    val noScheme = regexp_replace(lowered, "^[a-z][a-z0-9+.-]*://", "")
    val noWww    = regexp_replace(noScheme, "^www\\.", "")
    val noFrag   = regexp_replace(noWww, "#.*$", "")
    val noQuery  = if (dropQuery) regexp_replace(noFrag, "\\?.*$", "") else noFrag
    regexp_replace(noQuery, "/+$", "")
  }

  /** Host part of a [[normalize]]d URL (everything before the first
    * slash). */
  def host(urlNorm: Column): Column =
    regexp_extract(urlNorm, "^([^/]+)", 1)

  /** Registered domain: last two dot-labels of the host, or the host
    * itself when it has no dot (two-label PSL approximation). */
  def registeredDomain(hostCol: Column): Column =
    when(hostCol.contains("."),
      regexp_extract(hostCol, "([^.]+\\.[^.]+)$", 1))
      .otherwise(hostCol)

  /** Per-document URL verdicts:
    * (idCol, urlCol, url_norm, domain, reg_domain, blocked, url_rank,
    * keep) — `url_rank` is the first-occurrence order within each
    * normalized URL (by ascending id), `keep` = not blocked AND rank 1.
    * The annotated frame is the inspection surface; [[curate]] is the
    * filtered view. */
  def annotate(df: DataFrame, idCol: String, urlCol: String,
               blockedDomains: Seq[String]): DataFrame = {
    val norm = normalize(col(urlCol))
    val h    = host(norm)
    val reg  = registeredDomain(h)
    val annotated = df.select(
      col(idCol), col(urlCol),
      norm.as("url_norm"), h.as("domain"), reg.as("reg_domain"),
      // coalesce: a NULL url yields NULL reg_domain — that's "not on
      // the blocklist", not an unknown verdict (a null here would
      // poison downstream `!blocked` keeps)
      (if (blockedDomains.isEmpty) lit(false)
       else coalesce(reg.isInCollection(blockedDomains), lit(false)))
        .as("blocked"))
    annotated.withColumn("url_rank",
      row_number().over(
        Window.partitionBy(col("url_norm")).orderBy(col(idCol)))
        .cast("long"))
      .withColumn("keep", !col("blocked") && col("url_rank") === 1)
  }

  /** [[annotate]] then keep only surviving rows — blocked domains out,
    * one document per normalized URL (lowest id wins). */
  def curate(df: DataFrame, idCol: String, urlCol: String,
             blockedDomains: Seq[String]): DataFrame =
    annotate(df, idCol, urlCol, blockedDomains)
      .filter(col("keep"))
      .drop("blocked", "url_rank", "keep")

  /** Blocklist as data, for lists too big to inline: anti-join the
    * annotated frame against a (reg_domain) blocklist frame. The
    * blocklist side is bounded by the number of distinct bad domains —
    * AQE broadcasts it. */
  def dropBlocklisted(annotated: DataFrame, blocklist: DataFrame,
                      domainCol: String = "reg_domain"): DataFrame =
    annotated.join(blocklist.select(col(domainCol)).distinct(),
      Seq(domainCol), "left_anti")
}
