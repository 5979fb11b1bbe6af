package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.vault._

/** Streaming front-end behavior: watermarked windowed aggregation,
  * CDC micro-batches driving the idempotent vault loaders through
  * foreachBatch (at-least-once delivery -> exactly-once table effect),
  * and stateful gap sessionization.
  */
class StreamingSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("watermarked windowed counts over a memory stream") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val events = input.toDF().toDF("ts", "kind")

    val counts = CdcStream.windowedCounts(events, "ts", "kind",
      windowLength = "10 minutes", watermarkDelay = "5 minutes")

    val query = counts.writeStream
      .format("memory").queryName("win_counts")
      .outputMode("append")
      .start()

    // batch 1: the window under test
    input.addData(
      (Timestamp.valueOf("2024-01-01 00:01:00"), "a"),
      (Timestamp.valueOf("2024-01-01 00:02:00"), "a"),
      (Timestamp.valueOf("2024-01-01 00:03:00"), "b"))
    query.processAllAvailable()
    // batch 2 advances the watermark past the window...
    input.addData((Timestamp.valueOf("2024-01-01 01:00:00"), "a"))
    query.processAllAvailable()
    // ...and batch 3 emits the closed window (append mode emits with a
    // one-batch lag: emission uses the PREVIOUS batch's watermark)
    input.addData((Timestamp.valueOf("2024-01-01 02:00:00"), "a"))
    query.processAllAvailable()
    query.stop()

    val out = spark.table("win_counts")
      .select("kind", "n_events", "window_start").collect()
    val byKind = out.map(r => (r.getString(0), r.getLong(1))).toSet
    assert(byKind.contains(("a", 2L)), s"got ${byKind.mkString(",")}")
    assert(byKind.contains(("b", 1L)))
  }

  test("foreachBatch drives vault loaders; replays stay idempotent") {
    val stagingDir = graft.TestScratch.dir("stream-stg")
    val config = RawVaultConfig(stagingDir, "stream_stg", "stream_raw", partitionSize = 2)
    val vault = new RawVault(spark, config, "stream_test",
      lit(Timestamp.valueOf("2026-01-01 00:00:00")))
    implicit val c: Conventions = config.conventions

    vault.initializeDatabase()
    vault.createHub("THINGS", Seq(ColumnDefinition("PublicID", StringType)))
    vault.createSatellite("THINGS", Seq(ColumnDefinition("V", StringType)))
    val sat = SatelliteDefinition("SAT__THINGS", Seq(ColumnDefinition("V", StringType)))

    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Int, Timestamp, String, String)]
    val stream = input.toDF().toDF("OPERATION", "LOAD_DATE", "PublicID", "V")

    val query = CdcStream.foreachBatchLoader(stream) { batch =>
      val staged = RawVaultOps.prepareStaged(batch, "stream_test",
        "LOAD_DATE", "OPERATION", Seq("PublicID"))
      vault.loadHub(staged, "THINGS", Seq("PublicID"), Seq(sat))
    }.start()

    val t0 = Timestamp.valueOf("2024-01-01 00:00:00")
    val t1 = Timestamp.valueOf("2024-01-02 00:00:00")
    input.addData((2, t0, "x1", "v1"), (2, t0, "x2", "v1"))
    query.processAllAvailable()
    // micro-batch 2 replays an already-loaded row (at-least-once)
    input.addData((2, t0, "x1", "v1"), (4, t1, "x1", "v2"))
    query.processAllAvailable()
    query.stop()

    val hub = spark.table("stream_raw.`HUB__THINGS`")
    assert(hub.count() === 2) // replayed x1 row deduped
    val satDf = spark.table("stream_raw.`SAT__THINGS`")
    assert(satDf.count() === 3) // x1@t0, x2@t0, x1@t1 — not 4
    val latest = satDf.filter(col("$__HKEY") === md5Hex("x1"))
      .orderBy(col("$__LOAD_DATE").desc).head()
    assert(latest.getAs[String]("V") === "v2")
  }

  test("foreachBatch maintains a persisted IVF index from an embedding stream") {
    // streaming index maintenance: new vectors arrive as micro-batches,
    // each assigned against the FIXED centroid codebook and appended
    // into the bucketed index table; an overlapping delivery (the
    // at-least-once case) is absorbed by the (cid, id) anti-join
    import graft.operators.Similarity
    spark.sql("CREATE DATABASE IF NOT EXISTS sim_idx")
    val tbl = "sim_idx.ivf_streamed"
    def vec(i: Long): Seq[Float] =
      Seq.tabulate(8)(d => (((i * 7 + d) % 5).toInt - 2).toFloat)
    def frame(rows: Seq[(Long, Seq[Float])]) = Similarity.withNorm(
      rows.toDF("vec_id", "embedding"), "vec_id", "embedding")
    val seed = (0L until 20L).map(i => (i, vec(i)))
    // ids 0 and 3: vec() is period-5 in its id, so ids congruent mod 5
    // (e.g. 0 and 10) would be IDENTICAL centroids and every row would
    // land in one bucket — a degenerate test that multi-bucket routing
    // bugs would pass. 0 vs 3 gives genuinely distinct centroids
    val cents = frame(seed.filter(r => r._1 == 0L || r._1 == 3L))
    Similarity.buildIvfIndex(
      Similarity.assignToCentroids(frame(seed), cents, "vec_id"),
      tbl, buckets = 2)

    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Seq[Float])]
    val query = CdcStream.foreachBatchLoader(input.toDF().toDF("vec_id", "embedding")) {
      batch => Similarity.appendToIvfIndex(
        Similarity.withNorm(batch, "vec_id", "embedding"),
        tbl, cents, "vec_id", buckets = 2)
    }.start()
    // 22 redelivered INSIDE the first batch (in-batch dedup)
    input.addData(((20L until 30L).map(i => (i, vec(i))) :+ (22L, vec(22L))): _*)
    query.processAllAvailable()
    // overlapping redelivery of 25..29 plus genuinely new 30..34
    input.addData((25L until 35L).map(i => (i, vec(i))): _*)
    query.processAllAvailable()
    query.stop()

    assert(spark.table(tbl).count() === 35)
    // the appends really routed across buckets, not one degenerate cid
    assert(spark.table(tbl).filter(col("vec_id") >= 20)
      .select("cid").distinct().count() > 1)
    val oneShot = Similarity.knnIvf(
        Similarity.assignToCentroids(
          frame((0L until 35L).map(i => (i, vec(i)))), cents, "vec_id"),
        col("vec_id") < 3, "vec_id", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val probed = Similarity.probeIvfIndex(spark, tbl,
        col("vec_id") < 3, "vec_id", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(probed === oneShot && probed.nonEmpty)
  }

  test("streaming exact dedup drops within-horizon duplicates, keeps firsts") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val deduped = CdcStream.dedupByContent(
      input.toDF().toDF("ts", "text"), "ts", "text", "10 minutes")

    val query = deduped.writeStream
      .format("memory").queryName("stream_dedup")
      .outputMode("append")
      .start()

    input.addData(
      (Timestamp.valueOf("2024-01-01 00:01:00"), "alpha"),
      (Timestamp.valueOf("2024-01-01 00:01:30"), "alpha"), // in-batch dup
      (Timestamp.valueOf("2024-01-01 00:02:00"), "beta"))
    query.processAllAvailable()
    // cross-micro-batch duplicate inside the horizon
    input.addData((Timestamp.valueOf("2024-01-01 00:05:00"), "alpha"))
    query.processAllAvailable()
    input.addData((Timestamp.valueOf("2024-01-01 00:06:00"), "gamma"))
    query.processAllAvailable()
    query.stop()

    val out = spark.table("stream_dedup").collect()
      .map(r => r.getAs[String]("text"))
    assert(out.sorted.toSeq === Seq("alpha", "beta", "gamma"),
      s"got ${out.mkString(",")}")
  }

  test("stream-stream interval join: purchases attach to recent clicks") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Long, Timestamp)]
    val purchases = MemoryStream[(Long, Timestamp, Double)]
    val c = clicks.toDF().toDF("user_id", "click_ts")
      .withWatermark("click_ts", "10 minutes")
    val p = purchases.toDF().toDF("p_user", "purchase_ts", "value")
      .withWatermark("purchase_ts", "10 minutes")
    // purchase within 15 minutes AFTER the click — the watermarked
    // time-range condition bounds both join states
    val joined = c.join(p,
      col("user_id") === col("p_user") &&
        col("purchase_ts") >= col("click_ts") &&
        col("purchase_ts") <= col("click_ts") + expr("INTERVAL 15 MINUTES"))
      .select(col("user_id"), col("click_ts"), col("value"))

    val query = joined.writeStream
      .format("memory").queryName("ss_join")
      .outputMode("append")
      .start()

    clicks.addData(
      (1L, Timestamp.valueOf("2024-01-01 00:00:00")),
      (2L, Timestamp.valueOf("2024-01-01 00:01:00")))
    purchases.addData(
      (1L, Timestamp.valueOf("2024-01-01 00:10:00"), 42.0), // within 15m
      (2L, Timestamp.valueOf("2024-01-01 00:30:00"), 7.0))  // outside range
    query.processAllAvailable()
    // advance BOTH watermarks far past the first clicks (wm = max - 10m),
    // plus one more batch so the advanced watermark takes effect (state
    // eviction uses the PREVIOUS batch's watermark)
    clicks.addData((9L, Timestamp.valueOf("2024-01-01 02:00:00")))
    purchases.addData((8L, Timestamp.valueOf("2024-01-01 02:00:00"), 0.0))
    query.processAllAvailable()
    purchases.addData((7L, Timestamp.valueOf("2024-01-01 02:01:00"), 0.0))
    query.processAllAvailable()
    // this purchase satisfies the join predicate against click(1, 00:00),
    // but arrives far below the watermark: the click's state is evicted
    // and the late row dropped — no output may appear
    purchases.addData((1L, Timestamp.valueOf("2024-01-01 00:05:00"), 99.0))
    query.processAllAvailable()
    query.stop()

    val out = spark.table("ss_join").collect()
      .map(r => (r.getLong(0), r.getDouble(2)))
    assert(out.toSeq === Seq((1L, 42.0)), s"got ${out.mkString(",")}")
  }

  test("gap-timeout sessionization with flatMapGroupsWithState") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long)]
    val sessions = CdcStream.sessionize(input.toDS(), gapMs = 500)

    val query = sessions.writeStream
      .format("memory").queryName("sessions")
      .outputMode("append")
      .trigger(Trigger.ProcessingTime("200 milliseconds"))
      .start()

    input.addData((7L, 1000L), (7L, 1500L), (9L, 2000L))
    // wait past the gap so the state times out and sessions emit
    var waited = 0
    while (spark.table("sessions").count() < 2 && waited < 60000) {
      Thread.sleep(500); waited += 500
    }
    query.stop()

    val out = spark.table("sessions").as[CdcStream.Session].collect()
      .map(s => s.user_id -> s).toMap
    assert(out.keySet === Set(7L, 9L))
    assert(out(7L).n_events === 2 && out(7L).first_ms === 1000L && out(7L).last_ms === 1500L)
    assert(out(9L).n_events === 1)
  }

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
}
