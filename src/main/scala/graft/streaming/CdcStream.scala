package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.Row

/** Structured Streaming front-ends for the vault and analytics layers.
  *
  * The reference is batch-only (SURVEY §2.10): its CDC "stream" is
  * ordered batches replayed through the loaders. Because every loader is
  * an anti-join + append keyed on (HKEY, LOAD_DATE), the loaders are
  * idempotent — which makes them safe foreachBatch sinks: at-least-once
  * micro-batch delivery composes with the dedup to exactly-once table
  * effect. That is the designed streaming story at 100 TB: one
  * readStream source, foreachBatch into the same loaders used by batch.
  */
object CdcStream {

  /** Drive any batch loader from a stream via foreachBatch. The loader
    * receives each micro-batch as a plain DataFrame; replays are
    * harmless because vault loads dedup on append.
    *
    * DELIVERY IDENTITY (the [[graft.operators.StatsStore]] and keyed-
    * append pattern): when the loader body needs a per-delivery id —
    * a StatsStore partition key, a bookkeeping tag — derive it from
    * the batch's CONTENT (a stable residue class of its rows, a source
    * file name, a business date), never from the streaming `batchId`.
    * Structured Streaming numbers batches by position in THIS run: a
    * redelivered file arrives as a FRESH batchId, so a batchId-keyed
    * StatsStore delivery would write a second partition for the same
    * rows and silently double-count them — exactly the failure the
    * store's replay absorption exists to prevent. The w13 gate is the
    * prescribed form (TextOps "w13_stream_lm_stats": delivery id = the
    * slice's residue class, so the replayed slice collides with its
    * original and is absorbed); StatsStoreSpec pins the negative. */
  def foreachBatchLoader(stream: DataFrame)(load: DataFrame => Unit): DataStreamWriter[Row] =
    stream.writeStream
      .outputMode(OutputMode.Update())
      .foreachBatch { (batch: DataFrame, _: Long) => load(batch) }

  /** Run `body` (construct + start + drain a STATEFUL streaming
    * query) against an ISOLATED session whose
    * `spark.sql.shuffle.partitions` is pinned to the deliberate
    * state-partition count — `body` receives that session and must
    * build its readStream from it.
    *
    * A stateful operator (stream-stream join, streaming dedup/agg)
    * instantiates state-store instances per shuffle partition per
    * micro-batch — for a stream-stream join, FOUR stores per partition
    * per side — and the count is FROZEN into the checkpoint at the
    * first batch. Inheriting whatever the batch session's
    * shuffle.partitions happens to be sizes that state machinery to
    * the batch corpus, not to the stream's state: measured on the w06
    * gate at sf0.1, 32 inherited partitions cost 45-72 s of
    * HDFS-backed store commits where 4-8 right-sized partitions run
    * the same stream in ~12 s with an identical result (optimization
    * guide §1.2/§3 — the distributed shape, not the per-task work).
    * At production scale the knob goes UP deliberately
    * (`SPARK_GRAFT_STREAM_STATE_PARTITIONS`, thousands for a 100 TB
    * join state); the default 8 right-sizes the micro-fixture gates.
    *
    * Isolation (r21 VERDICT #3): the r21 form set/restored the knob on
    * the SHARED session, so two streams planning concurrently in one
    * session could cross-contaminate (and a crash between set and
    * restore left the batch session mis-sized). `newSession()` shares
    * the SparkContext and catalog but carries its own SQL conf, so the
    * pin never touches the caller's session and needs no lock or
    * restore; concurrent stateful streams each plan under their own
    * count. */
  def withStatePartitions[T](spark: org.apache.spark.sql.SparkSession)
      (body: org.apache.spark.sql.SparkSession => T): T = {
    val n = sys.env.getOrElse("SPARK_GRAFT_STREAM_STATE_PARTITIONS", "8")
    val isolated = spark.newSession()
    isolated.conf.set("spark.sql.shuffle.partitions", n)
    body(isolated)
  }

  /** Watermarked tumbling-window counts per key — the standard
    * late-data-tolerant streaming aggregation. */
  def windowedCounts(events: DataFrame, tsCol: String, keyCol: String,
      windowLength: String, watermarkDelay: String): DataFrame =
    events
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), windowLength), col(keyCol))
      .agg(count(lit(1)).as("n_events"))
      .select(col(s"window.start").as("window_start"),
        col(s"window.end").as("window_end"),
        col(keyCol), col("n_events"))

  /** Streaming exact deduplication: keep the first occurrence of each
    * content hash, dropping duplicates that arrive within the watermark
    * horizon. The streaming-ingest counterpart of `Dedup.exactGroups` —
    * at continuous-ingest scale the dedup state must be bounded by
    * TIME (watermark eviction), not grow with the corpus; cross-horizon
    * duplicates are the batch dedup's job downstream. Only the 32-byte
    * md5 enters the state store, never the payload. */
  def dedupByContent(stream: DataFrame, tsCol: String, contentCol: String,
      watermarkDelay: String): DataFrame =
    stream
      .withColumn("content_hash", md5(col(contentCol)))
      .withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark("content_hash")

  /** A closed user session produced by gap-timeout sessionization. */
  final case class Session(user_id: Long, n_events: Long, first_ms: Long, last_ms: Long)

  /** Internal sessionization state (public: encoder codegen needs an
    * accessible constructor). */
  final case class SessionState(n: Long, first: Long, last: Long)

  /** Gap-based sessionization with flatMapGroupsWithState: a session
    * closes when no event arrives for `gapMs` (processing-time timeout).
    * Input rows: (user_id: Long, ts_ms: Long). */
  def sessionize(events: Dataset[(Long, Long)], gapMs: Long): Dataset[Session] = {
    import events.sparkSession.implicits._
    events.groupByKey(_._1)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.ProcessingTimeTimeout()) {
        case (user, rows, state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(Session(user, s.n, s.first, s.last))
          } else {
            val ts = rows.map(_._2).toSeq
            val prev = state.getOption.getOrElse(SessionState(0L, Long.MaxValue, Long.MinValue))
            val next = SessionState(prev.n + ts.size,
              math.min(prev.first, ts.min), math.max(prev.last, ts.max))
            state.update(next)
            state.setTimeoutDuration(gapMs)
            Iterator.empty
          }
      }
  }
}
