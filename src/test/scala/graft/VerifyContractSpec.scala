package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins Verify's loud-failure contract: a query that throws is skipped
  * (the rest still dump) but the run records it in `_failures.json` and
  * returns a non-empty failure list — which main turns into exit(1).
  * This is the guard against the r11 failure mode where a 92-query
  * surface silently became a 90-row all-green correctness file. */
class VerifyContractSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("a throwing query is recorded in _failures.json and fails the run") {
    val out = graft.TestScratch.dir("graft-verify-contract")
    val queries = Map[String, (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame](
      "ok_query" -> ((s, _) => s.range(3).select(col("id"))),
      "broken_query" -> ((_, _) =>
        throw new RuntimeException("deliberately broken for the contract spec")))
    val failures = Verify.dump(spark, "unused-sf-dir", out, queries,
      Map("ok_query" -> "SELECT 1"))
    assert(failures.map(_._1) == Seq("broken_query"))
    assert(failures.head._2.contains("deliberately broken"))
    // the healthy query still dumped — catch-and-continue preserved
    assert(Files.exists(Paths.get(s"$out/ok_query")))
    assert(Files.exists(Paths.get(s"$out/oracle_sql.json")))
    val fj = Files.readString(Paths.get(s"$out/_failures.json"))
    assert(fj.contains("broken_query") && fj.contains("deliberately broken"))
  }

  test("an all-green run writes no _failures.json and returns empty") {
    val out = graft.TestScratch.dir("graft-verify-contract-ok")
    val failures = Verify.dump(spark, "unused-sf-dir", out,
      Map("ok_query" -> ((s, _) => s.range(2).select(col("id")))),
      Map("ok_query" -> "SELECT 1"))
    assert(failures.isEmpty)
    assert(!Files.exists(Paths.get(s"$out/_failures.json")))
  }

  test("a green prefix-scoped run keeps failures of queries it did not re-run") {
    // full run fails w-query; a later green d-prefixed run into the
    // same dir must NOT un-condemn the dir — w's failure stands in the
    // re-aggregated record until a run that re-runs w goes green
    val out = graft.TestScratch.dir("graft-verify-contract-prefix")
    val full = Map[String, (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame](
      "d_ok" -> ((s, _) => s.range(1).select(col("id"))),
      "w_broken" -> ((_, _) => throw new RuntimeException("w still broken")))
    assert(Verify.dump(spark, "unused", out, full, Map.empty)
      .map(_._1) == Seq("w_broken"))
    // prefix-scoped green re-run of only the d query
    val dOnly = full.filter(_._1.startsWith("d"))
    assert(Verify.dump(spark, "unused", out, dOnly, Map.empty).isEmpty)
    val fj = Files.readString(Paths.get(s"$out/_failures.json"))
    assert(fj.contains("w_broken"),
      "prefix-scoped green run erased a failure it never re-ran")
    // a full green re-run then clears everything
    val fixed = full.updated("w_broken",
      (s: org.apache.spark.sql.SparkSession, _: String) => s.range(1).select(col("id")))
    assert(Verify.dump(spark, "unused", out, fixed, Map.empty).isEmpty)
    assert(!Files.exists(Paths.get(s"$out/_failures.json")))
  }

  test("a green re-run into a reused out dir clears the stale failure record") {
    val out = graft.TestScratch.dir("graft-verify-contract-rerun")
    val broken = Map[String, (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame](
      "q" -> ((_, _) => throw new RuntimeException("broken first run")))
    assert(Verify.dump(spark, "unused", out, broken, Map.empty).nonEmpty)
    assert(Files.exists(Paths.get(s"$out/_failures.json")))
    val fixed = Map[String, (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame](
      "q" -> ((s, _) => s.range(1).select(col("id"))))
    assert(Verify.dump(spark, "unused", out, fixed, Map.empty).isEmpty)
    assert(!Files.exists(Paths.get(s"$out/_failures.json")),
      "stale _failures.json survived a green re-run")
  }
}
