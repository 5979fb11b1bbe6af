package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL/domain-grain curation: the crawl-side half of corpus balancing.
  * Published web pipelines dedup at the URL grain BEFORE content dedup
  * (the same page recrawled under tracking params is the cheapest dup
  * to kill), then cap each registrable domain so no single site
  * dominates the mix.
  *
  * Everything is codegen'd column expressions over one narrow pass —
  * canonicalization and domain extraction add no exchange; the dedup
  * shuffles 32-byte md5 keys ([[Dedup.exactGroups]]); the quota is
  * [[Sampling.quotaPerGroup]]'s two-level prefix-bucket scan (domains
  * are low-cardinality relative to the corpus, exactly the
  * dominant-group shape that machinery exists for). */
object UrlOps {

  /** Canonical form of a URL column: fragment (`#...`) and query
    * (`?...`) stripped, scheme and host lowercased, path untouched
    * (paths are case-significant; schemes and hosts are not). A value
    * with no `scheme://host` prefix passes through with only the
    * query/fragment strip — garbage in, deterministic garbage out,
    * never a null. */
  def canonicalUrl(url: Column): Column = {
    val base = regexp_replace(url, "[?#].*$", "")
    val head = regexp_extract(base, "^([^/]*://[^/]*)", 1)
    val tail = regexp_extract(base, "^[^/]*://[^/]*(.*)$", 1)
    when(head =!= "", concat(lower(head), tail)).otherwise(base)
  }

  /** Lowercased host of a URL (raw or canonical); empty string when
    * there is no `scheme://host` prefix. */
  def urlDomain(url: Column): Column =
    lower(regexp_extract(regexp_replace(url, "[?#].*$", ""),
      "^[^/]*://([^/]*)", 1))

  /** Rows surviving exact URL dedup at the CANONICAL grain, keeping
    * the minimum-id copy per canonical URL (the [[Dedup]] canon
    * convention), with the canonical URL appended as `curl`. The
    * group key the shuffle carries is md5(curl) — 32 bytes per row at
    * any corpus size, never the document. */
  def dropUrlDuplicates(df: DataFrame, urlCol: String, idCol: String): DataFrame = {
    TextAnalysis.requireNoCollision(df, Seq("curl"), "dropUrlDuplicates")
    val withC = df.withColumn("curl", canonicalUrl(col(urlCol)))
    withC.join(
      Dedup.exactGroups(withC, "curl", idCol)
        .select(col("keep_id").as(idCol)),
      Seq(idCol), "left_semi")
  }

  /** The composed URL curation pass: canonicalize -> exact URL dedup
    * (min-id copy kept) -> per-domain quota of `cap` docs chosen in
    * deterministic md5-shuffled order (the d17 machinery — two-level
    * prefix-bucket scan, no group-wide window, so one dominant domain
    * cannot serialize the job). Output: the surviving rows with
    * `curl` and `domain` appended. */
  def curateUrls(df: DataFrame, urlCol: String, idCol: String, cap: Int,
      prefixChars: Int = 2): DataFrame = {
    TextAnalysis.requireNoCollision(df, Seq("curl", "domain"), "curateUrls")
    val deduped = dropUrlDuplicates(df, urlCol, idCol)
      .withColumn("domain", urlDomain(col("curl")))
    Sampling.quotaPerGroup(deduped, idCol, "domain", cap, prefixChars)
  }

  /** [[curateUrls]] with REPUTATION-WEIGHTED per-domain caps (the
    * [[Sampling.quotaPerGroupBy]] form): published web stacks don't
    * cap every domain equally — they admit more from high-centrality
    * hosts and zero out the junk tail. `caps` is one row per domain
    * (domain, capCol), e.g. integer-scaled [[GraphOps.pageRank]]
    * centrality; domains absent from it get `defaultCap` (0 = drop).
    * Same canonicalize → dedup → two-level prefix-bucket quota
    * pipeline; the caps frame broadcasts at host-graph grain. */
  def curateUrlsWeighted(df: DataFrame, urlCol: String, idCol: String,
      caps: DataFrame, capCol: String = "cap", defaultCap: Long = 0L,
      prefixChars: Int = 2): DataFrame = {
    TextAnalysis.requireNoCollision(df, Seq("curl", "domain"),
      "curateUrlsWeighted")
    val deduped = dropUrlDuplicates(df, urlCol, idCol)
      .withColumn("domain", urlDomain(col("curl")))
    Sampling.quotaPerGroupBy(deduped, idCol, "domain", caps, capCol,
      defaultCap, prefixChars)
  }
}
