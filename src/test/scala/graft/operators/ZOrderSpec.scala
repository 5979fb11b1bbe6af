package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Z-order layout: Morton bucketing, rectangle→bucket enumeration, and
  * the planning-time directory pruning the layout exists for. */
class ZOrderSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("interleaveBits round-trips against the scalar decode") {
    val got = spark.range(256).select(col("id"),
        ZOrder.interleaveBits(col("id").bitwiseAND(15),
          shiftright(col("id"), 4).bitwiseAND(15), 4).as("z"))
      .as[(Long, Long)].collect().toMap
    (0L until 256L).foreach { v =>
      val (x, y) = (v & 15, (v >> 4) & 15)
      var z = 0L
      (0 until 4).foreach { i =>
        z |= ((x >> i) & 1) << (2 * i); z |= ((y >> i) & 1) << (2 * i + 1)
      }
      assert(got(v) == z, s"interleave($x, $y)")
    }
  }

  test("intersectingBuckets is an exact cover of the rectangle's cells") {
    // every point's bucket must be enumerated (no lost rows — the
    // correctness half) and every enumerated bucket must contain at
    // least one cell of the rectangle (no vacuous over-read)
    val (xMax, yMax) = (99L, 99L)
    val xr = (20L, 55L); val yr = (70L, 95L)
    val buckets =
      ZOrder.intersectingBuckets(xr, yr, xMax, yMax, bitsPerDim = 4).toSet
    val pointBuckets = (for {
      x <- xr._1 to xr._2; y <- yr._1 to yr._2
    } yield {
      val (qx, qy) = (x * 16 / 100, y * 16 / 100)
      var z = 0L
      (0 until 4).foreach { i =>
        z |= ((qx >> i) & 1) << (2 * i); z |= ((qy >> i) & 1) << (2 * i + 1)
      }
      z
    }).toSet
    assert(pointBuckets.subsetOf(buckets), "a rectangle point's bucket was not enumerated")
    assert(buckets == pointBuckets,
      "enumerated buckets beyond the rectangle's own cells")
    assert(buckets.size < 256 / 4, "quarter-ish rectangle should prune hard")
  }

  test("z-ordered read prunes directories at planning time") {
    val df = (0L until 2000L)
      .map(i => (i % 97, (i * 31) % 89, i)).toDF("x", "y", "v")
    val path = graft.TestScratch.dir("graft-zorder")
    ZOrder.writeZOrdered(df, path, "x", "y", xMax = 96, yMax = 88)
    val read = ZOrder.readPruned(spark, path, "x", "y",
      (10L, 30L), (40L, 60L), xMax = 96, yMax = 88)
    // semantics: equals the plain filter
    val expected = df.filter($"x".between(10, 30) && $"y".between(40, 60))
      .select("v").as[Long].collect().sorted
    val got = read.select("v").as[Long].collect().sorted
    assert(got.sameElements(expected))
    // pruning: the isin reaches the scan as a PartitionFilter, and the
    // file index selects a strict subset of the bucket directories
    val plan = read.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), plan.take(500))
    val scans = graft.plans.PlanWalk.flatten(read.queryExecution.executedPlan)
      .collect { case f: org.apache.spark.sql.execution.FileSourceScanExec => f }
    assert(scans.nonEmpty)
    val selected = scans.head.selectedPartitions.partitionCount
    val all = new java.io.File(path).listFiles()
      .count(_.getName.startsWith("z_bucket="))
    assert(selected < all,
      s"no directory pruning: $selected of $all buckets read")
  }

  test("zBucket fails loudly on negative inputs instead of dropping rows") {
    // a negative value sign-extends into a garbage bucket that
    // readPruned's enumerated cover never includes — the scaladoc's
    // "can only over-read, never drop" guarantee only holds if
    // out-of-range-below data cannot be written at all
    val df = Seq((-1L, 5L, 0L), (3L, 4L, 1L)).toDF("x", "y", "v")
    def chain(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(_.getMessage).mkString(" | ")
    val e = intercept[Exception] {
      df.select(ZOrder.zBucket("x", "y", 96, 88)).collect()
    }
    assert(chain(e).contains("negative"), s"got: ${chain(e)}")
    // in-range rows are untouched by the guard
    val ok = Seq((3L, 4L, 1L)).toDF("x", "y", "v")
      .select(ZOrder.zBucket("x", "y", 96, 88).as("z")).as[Long].head()
    assert(ok >= 0)
  }
}
