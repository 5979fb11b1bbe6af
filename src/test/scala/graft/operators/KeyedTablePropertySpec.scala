package graft.operators

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SchkTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** ScalaCheck invariant for the keyed side-table device: ANY sequence
  * of deliveries — overlapping key sets, a replay with poisoned
  * payloads, a compaction dropped at a random point, either plan form
  * (literal vs bucket-aligned join, chosen by a random threshold) —
  * folds to exactly the sequential first-writer-wins map, and probes
  * in either form return exactly the fold restricted to the probed
  * keys. The example-based KeyedTableSpec pins each behavior at a
  * chosen point; this pins the ALGEBRA the streamed ingest flows rely
  * on (at-least-once delivery in, exactly-once key effect out)
  * across generated orderings. Few cases — each is ~a dozen Spark
  * jobs — with small generated batches. */
class KeyedTablePropertySpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val caseNo = new AtomicInteger(0)

  private def check(cases: Int, prop: Prop): Unit = {
    val res = SchkTest.check(
      SchkTest.Parameters.default.withMinSuccessfulTests(cases)
        .withMaxSize(12), prop)
    assert(res.passed, res.status.toString)
  }

  private val keyPool = (0 until 14).map(i => s"k$i")

  private val batchGen: Gen[Seq[(String, Long)]] = for {
    n <- Gen.choose(0, 8)
    ks <- Gen.pick(n, keyPool)
    vs <- Gen.listOfN(n, Gen.choose(0L, 1000L))
  } yield ks.toSeq.zip(vs)

  private val caseGen: Gen[(List[Seq[(String, Long)]], Int, Int, Int)] =
    for {
      nb <- Gen.choose(1, 4)
      batches <- Gen.listOfN(nb, batchGen)
      replayAfter <- Gen.choose(0, nb - 1)
      compactAfter <- Gen.choose(0, nb - 1)
      threshold <- Gen.oneOf(1, 3, 1 << 16)
    } yield (batches, replayAfter, compactAfter, threshold)

  test("append/replay/compact in any order fold to the sequential first-writer-wins map; both probe forms agree") {
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_keyed")
    check(8, Prop.forAll(caseGen) {
      case (batches, replayAfter, compactAfter, threshold) =>
        val tbl = s"graft_keyed.prop_fold_${caseNo.incrementAndGet()}"
        Dedup.buildKeyedTable(
          Seq.empty[(String, Long)].toDF("k", "v"), "k", tbl, buckets = 4)
        batches.zipWithIndex.foreach { case (b, i) =>
          Dedup.appendToKeyedTable(b.toDF("k", "v"), tbl, "k",
            joinFormThreshold = threshold)
          if (i == replayAfter)
            // redelivery with poisoned payloads: must append nothing
            // for keys delivered in THIS or any earlier batch
            Dedup.appendToKeyedTable(
              b.map { case (k, _) => (k, -1L) }.toDF("k", "v"), tbl, "k",
              joinFormThreshold = threshold)
          if (i == compactAfter) Dedup.compactKeyedTable(spark, tbl, "k")
        }
        val expected = batches.flatten
          .foldLeft(Map.empty[String, Long]) { case (m, (k, v)) =>
            if (m.contains(k)) m else m.updated(k, v)
          }
        val got = spark.table(tbl).collect()
          .map(r => (r.getString(0), r.getLong(1))).toMap
        assert(got == expected,
          s"fold drifted (replayAfter=$replayAfter " +
            s"compactAfter=$compactAfter threshold=$threshold): " +
            s"$got vs $expected")
        // probe half the pool plus keys never delivered, both forms
        val probed = keyPool.zipWithIndex.collect {
          case (k, i) if i % 2 == 0 => k
        } :+ "never-delivered"
        val want = expected.filter { case (k, _) => probed.contains(k) }
        Seq(1, 1 << 16).foreach { probeThreshold =>
          val rows = Dedup.probeKeyedTable(spark, tbl, probed.toDF("k"),
              "k", joinFormThreshold = probeThreshold)
            .collect().map(r => (r.getString(0), r.getLong(1))).toMap
          assert(rows == want,
            s"probe (threshold $probeThreshold) drifted: $rows vs $want")
        }
        true
    })
  }
}
