package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Salted operators must be invisible in results: equal to their plain
  * counterparts on skewed data (one key holding ~90% of rows).
  */
class SkewSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val skewed = (1 to 2000).map { i =>
    val key = if (i % 10 == 0) s"k${i % 7}" else "hot"
    (i.toLong, key, (i % 100).toDouble)
  }.toDF("id", "k", "v")

  test("saltedSum equals plain groupBy sum on skewed keys") {
    val plain = skewed.groupBy("k").agg(sum("v")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val salted = Skew.saltedSum(skewed, Seq("k"), "v", col("id"), buckets = 8)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(salted.keySet === plain.keySet)
    plain.foreach { case (k, v) =>
      assert(math.abs(salted(k) - v) < 1e-6, s"key $k") }
  }

  test("saltedCount equals plain count") {
    val plain = skewed.groupBy("k").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Skew.saltedCount(skewed, Seq("k"), col("id"), buckets = 8)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted === plain)
  }

  test("saltedJoin equals plain inner join, including hot-key rows") {
    val dim = Seq(("hot", "H"), ("k0", "A"), ("k3", "B")).toDF("k", "label")
    val plain = skewed.join(dim, Seq("k")).select("id", "label").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    val salted = Skew.saltedJoin(skewed, dim, "k", col("id"), buckets = 8)
      .select("id", "label").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(salted === plain)
    assert(salted.size === plain.size)
  }
}
