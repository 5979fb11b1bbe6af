package graft.operators

import java.util.concurrent.Executors

import scala.concurrent.duration._
import scala.concurrent.{Await, ExecutionContext, Future}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The keyed-table device's SUPPORTED interleavings, exercised with
  * real threads. The device serializes plan compilation and table
  * writes under one lock (the session-global autoBucketedScan conf
  * flip must never leak into a concurrent compile) but executes
  * probe jobs OUTSIDE it — claims the scaladoc makes in prose and
  * these tests pin under load:
  *
  *  - probes (literal AND join form) racing appends to a different
  *    table return exact rows on every iteration;
  *  - two ingest flows (one writer per table — the single-writer
  *    contract is PER TABLE) interleave without cross-contaminating
  *    each other's conf windows, idempotence checks, or payloads;
  *  - replays delivered mid-race still append nothing.
  *
  * NOT tested: probes racing a compaction of the SAME table — the
  * compactBandIndex scaladoc documents that interleaving as a
  * caller bug under the single-writer contract (a probe compiled
  * pre-swap fails loudly, spec'd in DedupSpec's negative swap test).
  */
class KeyedTableConcurrencySpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshDb(): Unit =
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_keyed")

  /** Run thunks on real threads, propagating the FIRST failure with
    * its original stack (Await re-throws the Future's exception). */
  private def runAll(thunks: Seq[() => Unit]): Unit = {
    val pool = Executors.newFixedThreadPool(thunks.size)
    implicit val ec: ExecutionContext =
      ExecutionContext.fromExecutorService(pool)
    try {
      val fs = thunks.map(t => Future(t()))
      fs.foreach(Await.result(_, 5.minutes))
    } finally { pool.shutdown(); () }
  }

  test("probes in both forms race appends to another table: exact rows every iteration") {
    freshDb()
    val staticTbl = "graft_keyed.spec_conc_static"
    val growTbl = "graft_keyed.spec_conc_grow"
    val staticRows = (0 until 300).map(i => (s"k$i", i.toLong))
    Dedup.buildKeyedTable(staticRows.toDF("k", "v"), "k", staticTbl,
      buckets = 8)
    Dedup.buildKeyedTable(Seq(("g_seed", -1L)).toDF("k", "v"), "k",
      growTbl, buckets = 8)

    val writer: () => Unit = () => {
      (0 until 10).foreach { j =>
        val batch = (0 until 20)
          .map(i => (s"g${j * 20 + i}", (j * 20 + i).toLong))
          .toDF("k", "v")
        // alternate forms: even deliveries take the bucket-aligned
        // join (20 keys > threshold 8), odd ones the literal path
        val threshold = if (j % 2 == 0) 8 else 1 << 16
        Dedup.appendToKeyedTable(batch, growTbl, "k",
          joinFormThreshold = threshold)
        // replay the SAME keys mid-race with a poisoned payload:
        // first writer must win even while probes are in flight
        Dedup.appendToKeyedTable(
          (0 until 20).map(i => (s"g${j * 20 + i}", -999L)).toDF("k", "v"),
          growTbl, "k", joinFormThreshold = threshold)
      }
    }

    def reader(seed: Int): () => Unit = () => {
      (0 until 12).foreach { it =>
        val want = (0 until 7).map(i => (seed + it * 7 + i) % 300)
        val keys = want.map(i => s"k$i").toDF("k")
        val expect = want.map(i => (s"k$i", i.toLong)).toSet
        val threshold = if (it % 2 == 0) 4 else 1 << 16
        val got = Dedup.probeKeyedTable(spark, staticTbl, keys, "k",
            joinFormThreshold = threshold)
          .collect().map(r => (r.getString(0), r.getLong(1))).toSet
        assert(got == expect,
          s"reader($seed) iteration $it (threshold $threshold) drifted " +
            s"under concurrent appends: $got vs $expect")
      }
    }

    runAll(Seq(writer, reader(0), reader(150)))

    val endState = spark.table(growTbl).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(endState.size == 201,
      s"seed + 200 appended keys expected, got ${endState.size}")
    assert(endState("g_seed") == -1L)
    assert((0 until 200).forall(i => endState(s"g$i") == i.toLong),
      "a poisoned replay payload displaced a first-writer row: " +
        endState.filter(_._2 == -999L).take(5).toString)
  }

  test("two single-writer ingest flows on separate tables interleave without cross-contamination") {
    freshDb()
    val tblA = "graft_keyed.spec_conc_a"
    val tblB = "graft_keyed.spec_conc_b"
    Dedup.buildKeyedTable(Seq(("a_seed", 0L)).toDF("k", "v"), "k", tblA,
      buckets = 4)
    Dedup.buildKeyedTable(Seq(("b_seed", 0L)).toDF("k", "v"), "k", tblB,
      buckets = 4)

    def flow(tbl: String, prefix: String, threshold: Int): () => Unit =
      () => {
        (0 until 8).foreach { j =>
          val batch = (0 until 15)
            .map(i => (s"$prefix${j * 15 + i}", (j * 15 + i).toLong))
            .toDF("k", "v")
          Dedup.appendToKeyedTable(batch, tbl, "k",
            joinFormThreshold = threshold)
          // each flow also PROBES its own table between deliveries
          // (the streamed-ingest shape: append, then look keys up)
          val got = Dedup.probeKeyedTable(spark, tbl,
              Seq(s"${prefix}0", s"$prefix${j * 15}").toDF("k"), "k",
              joinFormThreshold = threshold)
            .collect().map(_.getString(0)).toSet
          assert(got == Set(s"${prefix}0", s"$prefix${j * 15}"),
            s"flow $tbl delivery $j: own-table probe drifted: $got")
        }
      }

    // flow A rides the join form (threshold below batch size), flow B
    // the literal form — their conf windows interleave under the lock
    runAll(Seq(flow(tblA, "a", 4), flow(tblB, "b", 1 << 16)))

    val a = spark.table(tblA).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    val b = spark.table(tblB).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(a.size == 121 && b.size == 121, s"${a.size} / ${b.size}")
    assert(a.keySet.forall(k => k == "a_seed" || k.startsWith("a")) &&
      b.keySet.forall(k => k == "b_seed" || k.startsWith("b")),
      "a delivery landed in the other flow's table")
    assert((0 until 120).forall(i =>
        a(s"a$i") == i.toLong && b(s"b$i") == i.toLong),
      "payloads drifted across interleaved conf windows")
  }
}
