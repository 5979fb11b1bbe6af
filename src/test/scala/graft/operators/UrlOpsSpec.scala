package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** URL curation: canonicalization edges, min-id URL dedup, and the
  * domain quota riding the two-level d17 machinery. */
class UrlOpsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def canon(urls: String*): Seq[String] =
    urls.toDF("u").select(UrlOps.canonicalUrl(col("u")).as("c"))
      .as[String].collect().toSeq

  test("canonicalUrl: case-folds scheme+host only, strips query and fragment") {
    assert(canon("HTTPS://WWW.Example.COM/Path/File?a=1&b=2#frag")
      == Seq("https://www.example.com/Path/File"))
    // path case preserved; no query/fragment -> unchanged
    assert(canon("https://example.com/CaseSensitive")
      == Seq("https://example.com/CaseSensitive"))
    // fragment before query: everything from the first marker goes
    assert(canon("http://A.b/x#frag?notaquery") == Seq("http://a.b/x"))
    // no scheme://host prefix: only the strip applies, never null
    assert(canon("not a url?tracking=1") == Seq("not a url"))
    assert(canon("") == Seq(""))
  }

  test("urlDomain extracts the lowercased host") {
    val got = Seq("HTTPS://WWW.Example.COM/x?q=1", "relative/path")
      .toDF("u").select(UrlOps.urlDomain(col("u")).as("d"))
      .as[String].collect().toSeq
    assert(got == Seq("www.example.com", ""))
  }

  test("curateUrls: min-id copy survives URL dedup, domains capped via the two-level plan") {
    // 2 domains; a.com has 3 distinct canonical urls (one with a 3-way
    // dup group under query/case noise), b.com has 1
    val df = Seq(
      (1L, "https://a.com/x?utm=1"),
      (2L, "HTTPS://A.com/x"),          // dup of 1 after canon -> dropped
      (3L, "https://a.com/x#frag"),     // dup of 1 -> dropped
      (4L, "https://a.com/y"),
      (5L, "https://a.com/z"),
      (6L, "https://b.com/only")).toDF("doc_id", "url")
    val out = UrlOps.curateUrls(df, "url", "doc_id", cap = 2)
    val rows = out.select("doc_id", "curl", "domain")
      .as[(Long, String, String)].collect().sortBy(_._1)
    // survivors of dedup: 1 (min of {1,2,3}), 4, 5, 6; then cap 2 per
    // domain in md5-shuffled order — a.com keeps 2 of {1,4,5}
    assert(rows.map(_._1).toSet.subsetOf(Set(1L, 4L, 5L, 6L)))
    assert(!rows.map(_._1).toSet.intersect(Set(2L, 3L)).nonEmpty)
    assert(rows.count(_._3 == "a.com") == 2)
    assert(rows.count(_._3 == "b.com") == 1)
    assert(rows.forall(r => r._2 == r._2.toLowerCase || r._2.contains("/")))
    // the quota rides quotaPerGroup's two-level machinery: map-side cap
    // pruning below the exchange, never a group-wide single window
    out.collect()
    val executed = out.queryExecution.executedPlan.toString
    assert(executed.contains("WindowGroupLimit"),
      s"domain quota lost the two-level shape:\n$executed")
    // selection matches the single-window reference exactly
    val survivors = Seq((1L, "a.com"), (4L, "a.com"), (5L, "a.com"),
      (6L, "b.com")).toDF("doc_id", "domain")
    import org.apache.spark.sql.expressions.{Window => W}
    val ref = survivors.withColumn("rn", row_number().over(
        W.partitionBy("domain").orderBy(md5($"doc_id".cast("string")), $"doc_id")))
      .filter($"rn" <= 2).select("doc_id").as[Long].collect().toSet
    assert(rows.map(_._1).toSet == ref)
  }
}
