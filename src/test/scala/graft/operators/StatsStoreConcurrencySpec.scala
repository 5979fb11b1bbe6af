package graft.operators

import java.util.concurrent.Executors

import scala.concurrent.duration._
import scala.concurrent.{Await, ExecutionContext, Future}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The StatsStore's SUPPORTED interleavings, exercised with real
  * threads — the KeyedTableConcurrencySpec discipline applied to the
  * log-structured stats store. The layout is what makes concurrency
  * safe: DISTINCT delivery ids touch disjoint immutable partition
  * directories, so parallel writers never contend (production ingests
  * shards concurrently), and a partition becomes visible to readers
  * atomically (the `_SUCCESS` commit marker), so a read racing writes
  * is always a whole-delivery snapshot.
  *
  * NOT tested, by contract: [[StatsStore.compact]] stays SINGLE-WRITER
  * (it deletes the partitions it absorbs — racing it against writers
  * of ids it might list, or against another compact, is a caller bug,
  * like every graft maintenance rewrite), and two concurrent writers
  * of the SAME delivery id are the redelivery race the at-least-once
  * contract already serializes upstream (a redelivery arrives after
  * its original completed or crashed, never beside it).
  */
class StatsStoreConcurrencySpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def statsOf(rows: (String, Long)*) =
    rows.toDF("k", "cnt").groupBy("k").agg(sum("cnt").as("cnt"))

  private def read(path: String): Map[String, Long] =
    StatsStore.readStats(spark, path, Seq("k"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

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

  test("parallel writers of distinct delivery ids sum exactly; mid-race replays stay inert") {
    val p = graft.TestScratch.dir("stats-conc-w")
    // power-of-two payloads: the final rollup's bit pattern proves
    // every delivery landed exactly once — a lost write clears a bit,
    // a double count sets a higher one
    def writer(idx: Int): () => Unit = () => {
      (0 until 6).foreach { j =>
        val id = s"w$idx-d$j"
        val v = 1L << (idx * 6 + j)
        StatsStore.writeDelivery(p, id, statsOf("x" -> v, "y" -> v))
        // replay the SAME id mid-race with poisoned content: the
        // committed partition must absorb it even while the other
        // writer is mid-delivery
        StatsStore.writeDelivery(p, id, statsOf("x" -> 999999L))
      }
    }
    runAll(Seq(writer(0), writer(1)))
    val total = (0 until 12).map(1L << _).sum
    assert(read(p) == Map("x" -> total, "y" -> total),
      "parallel distinct-id writers must fold like a sequential ingest")
  }

  test("readStats racing a writer always sees whole-delivery snapshots, never partials") {
    val p = graft.TestScratch.dir("stats-conc-r")
    StatsStore.writeDelivery(p, "seed", statsOf("x" -> 1L, "y" -> 1L))
    @volatile var done = false
    val writer: () => Unit = () => {
      try (0 until 8).foreach { j =>
        StatsStore.writeDelivery(p, s"d$j",
          statsOf("x" -> (1L << (j + 1)), "y" -> (1L << (j + 1))))
      } finally done = true
    }
    val reader: () => Unit = () => {
      var reads = 0
      var last = 0L
      while (!done || reads == 0) {
        val m = read(p)
        // every delivery writes x and y TOGETHER; a read that sees a
        // delivery's x without its y read a partition mid-write —
        // the _SUCCESS gate exists to make that impossible
        assert(m("x") == m("y"),
          s"read $reads saw a torn delivery: $m")
        // and visibility is monotone: committed partitions never
        // un-commit under a reader
        assert(m("x") >= last, s"read $reads went backwards: $m vs $last")
        last = m("x")
        reads += 1
      }
    }
    runAll(Seq(writer, reader))
    assert(read(p) == Map("x" -> 511L, "y" -> 511L))
  }
}
