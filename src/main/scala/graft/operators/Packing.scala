package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for pretraining pipelines: lay every document's
  * tokens out in a single deterministic stream (id order) and cut the
  * stream into fixed-length context windows — the public
  * "concatenate-then-chunk" scheme GPT-style training data uses.
  *
  * The core primitive is a DISTRIBUTED prefix sum. A bare
  * `Window.orderBy(id)` with no partition key collapses the whole corpus
  * onto one task — the classic scale-killer — so [[prefixSum]] runs the
  * textbook two-level scan instead: a within-bucket cumulative sum
  * (window partitioned by bucket — fully parallel), a bucket-totals
  * cumulative sum (one row per bucket: corpus/bucketSize rows, the only
  * single-task step, recursable if ever needed), and a broadcast join
  * adding each bucket's offset back. Every value is a bigint — the
  * output is bit-deterministic and oracle-checkable against a plain
  * `SUM(...) OVER (ORDER BY id)`.
  */
object Packing {

  /** Inclusive prefix sum of `valueCol` over `orderCol` order (both must
    * be integral; `orderCol` values must be unique). `bucketSize` trades
    * level-1 parallelism against the level-2 single-task frame — at
    * 10^12 rows, bucketSize 10^6 leaves 10^6 bucket totals, still a
    * trivial single task.
    *
    * The bucket-totals branch is derived FROM the windowed output, not
    * from a second aggregation of the input: the in-bucket cumulative
    * sum at a bucket's last row IS the bucket total (`max_by(__local,
    * orderCol)` — not `max`, which would be wrong for negative values),
    * and because the windowed subtree is byte-identical under both
    * consumers, the totals branch re-reads the ONE bucket-keyed
    * exchange (ReusedExchange, plan-pinned) instead of re-running
    * everything upstream of the prefix sum. The r10 form aggregated the
    * input directly; the map-side combine made the totals shuffle tiny,
    * but the upstream — at 100 TB a corpus scan, and under [[Pipeline
    * .chunkedPretrainPipeline]] a quality gate + dedup — executed
    * twice, which is the wrong trade at any scale (measured: d16 went
    * 3 → 2 exchanges with text never entering any exchange). */
  def prefixSum(df: DataFrame, orderCol: String, valueCol: String,
      outCol: String, bucketSize: Long = 1 << 20): DataFrame = {
    // integral `div`, not `/`: Column./ on longs widens to double and
    // loses exactness past 2^53 ids
    val withBkt = df.withColumn("__bkt", expr(s"$orderCol div $bucketSize"))
    val wIn = Window.partitionBy("__bkt").orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = withBkt.withColumn("__local", sum(col(valueCol)).over(wIn))
    val wBkt = Window.orderBy("__bkt")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val offsets = local.groupBy("__bkt")
      .agg(max_by(col("__local"), col(orderCol)).as("__t"))
      .withColumn("__off", sum("__t").over(wBkt) - col("__t"))
      .select(col("__bkt").as("__obkt"), col("__off"))
    // null-safe key on purpose: a plain equi-join plants IsNotNull(__bkt)
    // below the main branch's exchange but cannot push it through the
    // offsets branch's global window — the two copies of the windowed
    // subtree stop being canonically identical and ReusedExchange is
    // lost (the d25 lesson in filter form). <=> generates no null
    // filters, keeping both consumers on one exchange; __bkt is never
    // null anyway for in-contract (non-null) orderCol values.
    local.join(broadcast(offsets), col("__bkt") <=> col("__obkt"))
      .withColumn(outCol, col("__off") + col("__local"))
      .drop("__bkt", "__obkt", "__local", "__off")
  }

  /** Pack whitespace-token documents into `seqLen`-token training
    * sequences: tokens are concatenated in `idCol` order and chunked
    * every `seqLen`. Output per document: its token count, its start
    * offset in the global token stream, and the first/last sequence
    * index it lands in (`first_seq < last_seq` means the document is
    * split across a chunk boundary). */
  def packSequences(df: DataFrame, idCol: String, textCol: String,
      seqLen: Int, bucketSize: Long = 1 << 20): DataFrame =
    packSequencesBy(df.select(col(idCol),
        size(TextAnalysis.tokens(col(textCol))).cast("long").as("n_tokens")),
      idCol, "n_tokens", seqLen, bucketSize)

  /** [[packSequences]] over an ARBITRARY integral length column — the
    * real-tokenizer form: published pipelines pack by the trained
    * tokenizer's token counts (e.g. `size(bpe_ids)` from
    * [[TextAnalysis.bpeEncode]]), not whitespace counts. Same
    * two-level prefix sum, same output shape with `lengthCol` in place
    * of n_tokens. */
  def packSequencesBy(df: DataFrame, idCol: String, lengthCol: String,
      seqLen: Int, bucketSize: Long = 1 << 20): DataFrame = {
    require(seqLen > 0, s"seqLen must be positive, got $seqLen")
    require(bucketSize > 0, s"bucketSize must be positive, got $bucketSize")
    // Real-tokenizer counts can legally be 0 (a doc that encodes to no
    // tokens), but a NEGATIVE length would silently corrupt the global
    // prefix sum for every later row — fail the job loudly instead
    // (the tokenBudgetPerGroup pattern: a codegen'd guard on the scan,
    // not an extra pass).
    val counted = df.select(col(idCol),
      when(col(lengthCol) >= 0, col(lengthCol).cast("long"))
        .otherwise(raise_error(concat(
          lit(s"packSequencesBy: negative $lengthCol ("),
          col(lengthCol).cast("string"),
          lit(") would corrupt the global prefix sum")))).as(lengthCol))
    // last_seq for a ZERO-length doc is defined as first_seq (the doc
    // occupies no sequence; it "lands at" its start position). The
    // greatest() keeps length >= 1 rows on the plain (__cum - 1)
    // arithmetic AND pins the engine-divergent corner: for a leading
    // zero-length doc __cum = 0, where Spark's div truncates
    // (-1 div 512 = 0) but SQL floor division gives -1.
    prefixSum(counted, idCol, lengthCol, "__cum", bucketSize)
      .select(col(idCol), col(lengthCol),
        (col("__cum") - col(lengthCol)).as("start_offset"),
        expr(s"(__cum - $lengthCol) div $seqLen").as("first_seq"),
        expr(s"greatest(__cum - 1, __cum - $lengthCol) div $seqLen")
          .as("last_seq"))
  }
}
