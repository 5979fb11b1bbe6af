package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** The log-structured additive-stats store (d56/w13): replay-neutral
  * by layout pre-compaction, by manifest post-compaction, self-healing
  * at every compaction crash window. */
class StatsStoreSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def dir(): String = graft.TestScratch.dir("stats-store")

  private def statsOf(rows: (String, Long)*) =
    rows.toDF("k", "cnt").groupBy("k").agg(sum("cnt").as("cnt"))

  private def read(path: String): Map[String, Long] =
    StatsStore.readStats(spark, path, Seq("k"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("deliveries sum; replay is a no-op by layout; compaction preserves the rollup") {
    val p = dir()
    StatsStore.writeDelivery(p, "day1", statsOf("a" -> 2L, "b" -> 1L))
    StatsStore.writeDelivery(p, "day2", statsOf("a" -> 3L, "c" -> 5L))
    assert(read(p) == Map("a" -> 5L, "b" -> 1L, "c" -> 5L))
    // replay BEFORE compaction: the committed partition absorbs it —
    // even with different (wrong) content, nothing moves
    StatsStore.writeDelivery(p, "day1", statsOf("a" -> 999L))
    assert(read(p) == Map("a" -> 5L, "b" -> 1L, "c" -> 5L))
    StatsStore.compact(spark, p, Seq("k"))
    assert(read(p) == Map("a" -> 5L, "b" -> 1L, "c" -> 5L))
    // replay AFTER compaction: the partition is gone, the manifest
    // absorbs it — the exact double-count the verdict flagged
    StatsStore.writeDelivery(p, "day2", statsOf("a" -> 3L, "c" -> 5L))
    assert(read(p) == Map("a" -> 5L, "b" -> 1L, "c" -> 5L))
    // new deliveries keep folding in post-compaction
    StatsStore.writeDelivery(p, "day3", statsOf("b" -> 4L))
    assert(read(p) == Map("a" -> 5L, "b" -> 5L, "c" -> 5L))
    // second compaction folds base + day3
    StatsStore.compact(spark, p, Seq("k"))
    assert(read(p) == Map("a" -> 5L, "b" -> 5L, "c" -> 5L))
    StatsStore.writeDelivery(p, "day3", statsOf("b" -> 4L))
    assert(read(p) == Map("a" -> 5L, "b" -> 5L, "c" -> 5L))
  }

  test("interrupted compaction: every crash window self-heals without loss or double count") {
    val p = dir()
    StatsStore.writeDelivery(p, "d1", statsOf("a" -> 1L))
    StatsStore.writeDelivery(p, "d2", statsOf("a" -> 2L))
    val want = Map("a" -> 3L)
    val root = new org.apache.hadoop.fs.Path(p)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    // window 1: crash after the manifest append, before the stage —
    // simulate by appending the manifest by hand
    Seq("d1", "d2").toDF("delivery_id").write.mode("append")
      .parquet(s"$p/_absorbed")
    assert(read(p) == want, "manifest-only state must read unchanged")
    // a replay in this state is absorbed by the manifest AND its
    // partition still backs the counts — no loss
    StatsStore.writeDelivery(p, "d1", statsOf("a" -> 999L))
    assert(read(p) == want)
    // window 2: crash with an UNCOMMITTED stage — discarded on entry
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$p/_base_tmp"))
    assert(read(p) == want)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$p/_base_tmp")),
      "an uncommitted stage must be discarded")
    // window 3: crash after the stage COMMITTED, before the swap —
    // stage the rollup by hand, plus a delivery that lands post-crash
    StatsStore.readStats(spark, p, Seq("k"))
      .write.mode("overwrite").parquet(s"$p/_base_tmp")
    StatsStore.writeDelivery(p, "late", statsOf("z" -> 7L))
    // the recovery (any entry point) promotes the stage, deletes only
    // the absorbed partitions, and keeps the late delivery
    assert(read(p) == Map("a" -> 3L, "z" -> 7L))
    assert(fs.exists(new org.apache.hadoop.fs.Path(
        s"$p/delivery_id=${StatsStore.BasePartition}")),
      "the staged base must have been promoted")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$p/delivery_id=d1")),
      "absorbed partitions must be superseded by the promoted base")
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$p/delivery_id=late")),
      "a post-crash delivery must survive recovery")
  }

  test("crashed delivery write (no _SUCCESS) is redone; ids validated; metadata survives") {
    val p = dir()
    // a partition directory with data but no _SUCCESS marker: a
    // crashed write — the redelivery must redo it, not skip it
    val dead = new org.apache.hadoop.fs.Path(s"$p/delivery_id=d1")
    val fs = dead.getFileSystem(spark.sessionState.newHadoopConf())
    fs.mkdirs(dead)
    StatsStore.writeDelivery(p, "d1", statsOf("a" -> 4L))
    assert(read(p) == Map("a" -> 4L))
    intercept[IllegalArgumentException] {
      StatsStore.writeDelivery(p, "has space", statsOf("a" -> 1L))
    }
    intercept[IllegalArgumentException] {
      StatsStore.writeDelivery(p, "123", statsOf("a" -> 1L))  // no letter
    }
    intercept[IllegalArgumentException] {
      StatsStore.writeDelivery(p, StatsStore.BasePartition,
        statsOf("a" -> 1L))
    }
    // the scorers' config metadata survives store + rollup (the
    // lmStats/nbStats validation contract)
    val p2 = dir()
    val docs = Seq((1L, "x y z"), (2L, "x y")).toDF("doc_id", "text")
    StatsStore.writeDelivery(p2, "s0",
      TextAnalysis.lmStats(docs, "text", ctxBuckets = 64, pairBuckets = 256))
    val rolled = StatsStore.readStats(spark, p2, Seq("kind", "bucket"))
    val m = rolled.schema.fields.find(_.name == "cnt").get.metadata
    assert(m.getLong("ctxBuckets") == 64 && m.getLong("pairBuckets") == 256
      && m.getLong("order") == 2,
      s"cnt metadata must survive the store round-trip, got $m")
    // and the rollup equals the one-shot stats
    val oneShot = TextAnalysis.lmStats(docs, "text", 64, 256)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val got = rolled.collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == oneShot)
  }
}
