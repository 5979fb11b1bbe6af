package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** The sanctioned driver-hop helper: caps assert, truncation truncates,
  * probes stay O(cap). */
class DriverBoundedSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def range(n: Int) = {
    import spark.implicits._
    (1 to n).toDF("x")
  }

  test("collectCapped returns all rows under the cap") {
    assert(DriverBounded.collectCapped(range(5), 10, "ctx").length == 5)
    assert(DriverBounded.collectCapped(range(10), 10, "ctx").length == 10)
  }

  test("collectCapped fails loudly past the cap, with the caller's context") {
    val e = intercept[IllegalArgumentException] {
      DriverBounded.collectCapped(range(11), 10, "centroids are configuration")
    }
    assert(e.getMessage.contains("centroids are configuration"))
    assert(e.getMessage.contains("cap 10"))
  }

  test("takeFirst deliberately truncates ordered input") {
    import org.apache.spark.sql.functions.col
    val rows = DriverBounded.takeFirst(range(100).orderBy(col("x")), 3)
    assert(rows.map(_.getInt(0)).toSeq == Seq(1, 2, 3))
  }

  test("exceeds answers the over-cap probe without a full count") {
    assert(!DriverBounded.exceeds(range(10), 10))
    assert(DriverBounded.exceeds(range(11), 10))
  }

  test("caps must be positive") {
    intercept[IllegalArgumentException] {
      DriverBounded.collectCapped(range(1), 0, "ctx")
    }
    intercept[IllegalArgumentException] {
      DriverBounded.takeFirst(range(1), -1)
    }
  }
}
