package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** As-of join edge semantics: inclusive same-instant pick, null before
  * any right row, latest-of-several, per-key isolation. */
class AsOfSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("asofJoin picks the latest right row at or before each left row") {
    val left = Seq(
      (1L, 100L, "l1"), // before any right -> null
      (1L, 200L, "l2"), // exactly at r@200 -> inclusive
      (1L, 350L, "l3"), // between r@200 and r@400 -> r@200
      (1L, 450L, "l4"), // after r@400 -> r@400
      (2L, 500L, "l5")  // other key: only its own rights visible
    ).toDF("k", "ts", "tag")
    val right = Seq(
      (1L, 200L, 20.0), (1L, 400L, 40.0), (2L, 100L, 99.0)
    ).toDF("k", "ts", "v")

    val out = AsOf.asofJoin(left, right, "k", "ts", Seq("v"))
      .collect().map(r => r.getAs[String]("tag") ->
        Option(r.getAs[java.lang.Double]("v")).map(_.toDouble)).toMap
    assert(out === Map(
      "l1" -> None, "l2" -> Some(20.0), "l3" -> Some(20.0),
      "l4" -> Some(40.0), "l5" -> Some(99.0)))
  }

  test("asofJoin matches the latest right ROW even when its value is null") {
    val left = Seq((1L, 300L, "l1")).toDF("k", "ts", "tag")
    // latest right row at ts=200 carries a NULL a but a real b: the
    // output must take BOTH fields from that row, not leak a=5.0 from
    // the older row
    val right = Seq(
      (1L, 100L, Option(5.0), Option(1.0)),
      (1L, 200L, Option.empty[Double], Option(7.0))
    ).toDF("k", "ts", "a", "b")
    val out = AsOf.asofJoin(left, right, "k", "ts", Seq("a", "b")).head()
    assert(out.getAs[java.lang.Double]("a") === null)
    assert(out.getAs[java.lang.Double]("b") === 7.0)
  }

  test("asofJoin rejects colliding value column names") {
    val df = Seq((1L, 1L, "x")).toDF("k", "ts", "v")
    intercept[IllegalArgumentException] {
      AsOf.asofJoin(df, df, "k", "ts", Seq("v"))
    }
  }
}
