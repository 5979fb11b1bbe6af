package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization, token counting, quality scoring, language ID,
  * fingerprinting. All are narrow per-row transforms (no shuffle), built
  * from codegen-friendly built-ins — no UDFs.
  */
object TextAnalysis {

  /** Whitespace tokens of a text column. */
  def tokens(text: Column): Column = split(text, " ")

  /** Distinct token set. */
  def tokenSet(text: Column): Column = array_distinct(tokens(text))

  /** Word n-gram shingles (n >= 1). The token array must be a
    * materialized column — referencing an expression inside the shingle
    * lambda re-evaluates it per element. Rows with fewer than n tokens
    * shingle to the whole text.
    */
  def shingles(tokenArrayCol: String, textCol: String, n: Int): Column =
    when(size(col(tokenArrayCol)) < n, array(col(textCol)))
      .otherwise(expr(
        s"transform(sequence(0, size($tokenArrayCol) - $n), " +
          s"i -> concat_ws(' ', ${(0 until n).map(k => s"$tokenArrayCol[i+$k]").mkString(", ")}))"))

  /** BPE-ish subword segmentation regex: letter runs, digit runs, and
    * single non-alphanumeric marks — the pre-tokenization split most
    * byte-pair tokenizers apply before merging. */
  val subtokenPattern = "[a-z]+|[0-9]+|[^a-z0-9\\s]"

  /** Token counts: whitespace tokens, distinct tokens, BPE-ish
    * subtokens, characters. */
  def tokenCounts(df: DataFrame, textCol: String, idCols: Seq[String]): DataFrame =
    df.select(idCols.map(col) ++ Seq(
      size(tokens(col(textCol))).as("n_tokens"),
      size(tokenSet(col(textCol))).as("n_distinct"),
      size(regexp_extract_all(col(textCol), lit(subtokenPattern), lit(0))).as("n_subtokens"),
      length(col(textCol)).as("n_text_chars")): _*)

  val defaultStopwords: Seq[String] =
    Seq("the", "a", "or", "and", "of", "to", "in", "is")

  /** Fail loudly when appending signal columns would silently REPLACE
    * (and a later drop would then DESTROY) columns the caller already
    * has — `withColumn` gives no warning on a name collision. */
  private[operators] def requireNoCollision(df: DataFrame, names: Seq[String],
      op: String): Unit = {
    val collisions = df.columns.toSet.intersect(names.toSet)
    require(collisions.isEmpty,
      s"$op would overwrite caller column(s) ${collisions.mkString(", ")} — " +
        "rename them upstream before gating")
  }

  /** The quality-signal column names [[qualityScore]] emits. */
  val qualitySignalCols: Seq[String] =
    Seq("n_tokens", "avg_word_len", "stopword_ratio")

  /** The three [[qualityScore]] signals APPENDED as columns, original
    * columns preserved — the single source of these expressions: d03,
    * the d28 gate, and the composed pipelines all read the same
    * definitions, so they cannot drift apart. Callers needing a
    * collision guard go through [[qualitySignals]]. */
  private def withQualitySignals(df: DataFrame, textCol: String,
      stopwords: Seq[String]): DataFrame = {
    val tk = tokens(col(textCol))
    df.withColumn("n_tokens", size(tk))
      .withColumn("avg_word_len",
        length(regexp_replace(col(textCol), "[^a-z]", "")).cast("double")
          / col("n_tokens"))
      .withColumn("stopword_ratio",
        size(filter(tk, t => t.isin(stopwords.map(lit): _*))).cast("double")
          / col("n_tokens"))
  }

  /** [[qualityScore]]'s signals appended IN PLACE (original columns
    * preserved; fails loudly on a name collision) — the building block
    * for pipelines that gate on quality without a corpus-sized id set
    * joined back. */
  def qualitySignals(df: DataFrame, textCol: String,
      stopwords: Seq[String] = defaultStopwords): DataFrame = {
    requireNoCollision(df, qualitySignalCols, "qualitySignals")
    withQualitySignals(df, textCol, stopwords)
  }

  /** Quality heuristics: token count, alpha-chars-per-token, stopword
    * ratio. Ratios are single int/int divisions — bit-deterministic. */
  def qualityScore(df: DataFrame, textCol: String, idCols: Seq[String],
      stopwords: Seq[String] = defaultStopwords): DataFrame =
    withQualitySignals(df, textCol, stopwords)
      .select((idCols ++ Seq("n_tokens", "avg_word_len", "stopword_ratio"))
        .map(col): _*)

  /** Marker-stopword language vote; ties resolve in `markers` order. */
  def languageId(df: DataFrame, textCol: String, idCols: Seq[String],
      markers: Seq[(String, Seq[String])]): DataFrame = {
    val tk = tokens(col(textCol))
    val hitCols = markers.map { case (lang, ws) =>
      size(filter(tk, t => t.isin(ws.map(lit): _*))).as(s"${lang}_hits")
    }
    val withHits = df.select(idCols.map(col) ++ hitCols: _*)
    val pred = markers.init.zipWithIndex.foldRight(lit(markers.last._1): Column) {
      case (((lang, _), i), els) =>
        val laterLangs = markers.drop(i + 1).map(_._1)
        val cond = laterLangs.map(l => col(s"${lang}_hits") >= col(s"${l}_hits"))
          .reduce(_ && _)
        when(cond, lang).otherwise(els)
    }
    withHits.withColumn("pred_lang", pred)
  }

  /** The three [[repetitionSignals]] signals APPENDED as columns,
    * original columns preserved (single-source, like
    * [[withQualitySignals]]; uses `__tk`/`__sg`/`__top` scratch
    * columns internally). */
  private def withRepetitionSignals(df: DataFrame, textCol: String,
      n: Int): DataFrame = {
    val lines = split(col(textCol), "\n")
    df.withColumn("__tk", tokens(col(textCol)))
      .withColumn("__sg", array_sort(shingles("__tk", textCol, n)))
      .withColumn("__top", aggregate(
        col("__sg"),
        struct(lit(null).cast("string").as("prev"),
          lit(0L).as("run"), lit(0L).as("mx")),
        (acc, g) => {
          val run = when(acc.getField("prev") <=> g,
            acc.getField("run") + 1L).otherwise(1L)
          struct(g.as("prev"), run.as("run"),
            greatest(acc.getField("mx"), run).as("mx"))
        },
        acc => acc.getField("mx")))
      .withColumn("dup_token_ratio",
        (size(col("__tk")) - size(array_distinct(col("__tk")))).cast("double")
          / size(col("__tk")))
      .withColumn("dup_line_ratio",
        (size(lines) - size(array_distinct(lines))).cast("double") / size(lines))
      .withColumn("top_ngram_mass",
        col("__top").cast("double") / size(col("__sg")))
      .drop("__tk", "__sg", "__top")
  }

  /** Repetition-based quality signals (the public Gopher/MassiveText
    * family of heuristics): fraction of repeated tokens, fraction of
    * repeated lines, and the occurrence share of the most frequent word
    * n-gram. Ratios are single int/int divisions — bit-deterministic.
    *
    * Fully NARROW: every signal is a function of one row. Top-n-gram
    * mass sorts the row's shingle array and takes the longest run of
    * equal adjacent grams (sorted order groups duplicates), so the
    * count of the most frequent gram falls out of one O(L log L)
    * per-row pass — no shingle explode, no (doc, gram) shuffle, and no
    * corpus-sized join of the mass branch back onto the per-row
    * signals (the pre-r8 shape paid all three; a per-document
    * statistic never needs a corpus exchange). */
  def repetitionSignals(df: DataFrame, textCol: String, idCols: Seq[String],
      n: Int = 2): DataFrame =
    withRepetitionSignals(df, textCol, n)
      .select((idCols ++
        Seq("dup_token_ratio", "dup_line_ratio", "top_ngram_mass")).map(col): _*)

  /** Thresholds for the Gopher gate. Defaults are tuned to the
    * synthetic fixture corpus (its generated text repeats tokens far
    * more than natural prose — median dup-token ratio .54); production
    * Gopher uses 50 ≤ tokens ≤ 100k, word length [3, 10], ≥ 2 stopword
    * hits, dup-line ≤ .30, top-2-gram mass ≤ .20. */
  final case class GopherThresholds(
      minTokens: Int = 20, maxTokens: Int = 100000,
      minAvgWordLen: Double = 2.0, maxAvgWordLen: Double = 12.0,
      minStopwordRatio: Double = 0.05,
      maxDupTokenRatio: Double = 0.60, maxDupLineRatio: Double = 0.30,
      maxTopNgramMass: Double = 0.20)

  /** The six gate signal columns, in output order. */
  val gopherSignalCols: Seq[String] = Seq(
    "n_tokens", "avg_word_len", "stopword_ratio",
    "dup_token_ratio", "dup_line_ratio", "top_ngram_mass")

  private def gopherCondition(t: GopherThresholds) =
    col("n_tokens") >= t.minTokens && col("n_tokens") <= t.maxTokens &&
      col("avg_word_len") >= t.minAvgWordLen &&
      col("avg_word_len") <= t.maxAvgWordLen &&
      col("stopword_ratio") >= t.minStopwordRatio &&
      col("dup_token_ratio") <= t.maxDupTokenRatio &&
      col("dup_line_ratio") <= t.maxDupLineRatio &&
      col("top_ngram_mass") <= t.maxTopNgramMass

  private def gopherSignals(df: DataFrame, textCol: String,
      stopwords: Seq[String]): DataFrame = {
    requireNoCollision(df,
      gopherSignalCols ++ Seq("__tk", "__sg", "__top"), "the Gopher gate")
    withRepetitionSignals(withQualitySignals(df, textCol, stopwords),
      textCol, n = 2)
  }

  /** Gopher-style composite quality gate (the public MassiveText /
    * Gopher filtering rules, re-expressed over this engine's signals):
    * keep a document only if its token count, mean word length,
    * stopword ratio, repeated-token/line fractions, and top-bigram
    * occurrence mass ALL fall inside their thresholds. Built on the
    * SAME signal expressions d03/d12 emit ([[withQualitySignals]] /
    * [[withRepetitionSignals]]) in ONE narrow pass — every signal is a
    * function of one row, so the whole gate is a codegen'd
    * projection+filter with zero exchanges at any corpus size (the d12
    * lesson: a per-document statistic never needs a corpus exchange).
    * Emits the kept rows with all six signals for audit; thresholds
    * are bit-exact to mirror in an external oracle because every
    * signal is a single int/int division. */
  def gopherQualityFilter(df: DataFrame, textCol: String, idCols: Seq[String],
      thresholds: GopherThresholds = GopherThresholds(),
      stopwords: Seq[String] = defaultStopwords): DataFrame =
    gopherSignals(df, textCol, stopwords)
      .filter(gopherCondition(thresholds))
      .select((idCols ++ gopherSignalCols).map(col): _*)

  /** The gate as an IN-PLACE filter: original columns preserved,
    * signal columns dropped. This is what a composed pipeline wants —
    * a `docs.filter(...)`-shaped stage, not a corpus-sized id set
    * joined back (which only stays cheap while the id set fits a
    * broadcast; at corpus scale it degrades to a shuffle join the
    * gate's zero-exchange contract forbids). */
  def gopherQualityKept(df: DataFrame, textCol: String,
      thresholds: GopherThresholds = GopherThresholds(),
      stopwords: Seq[String] = defaultStopwords): DataFrame =
    gopherSignals(df, textCol, stopwords)
      .filter(gopherCondition(thresholds))
      .drop(gopherSignalCols: _*)

  /** Rare-token ratio: the fraction of a document's token occurrences
    * whose corpus-wide document frequency is below `maxDf` — a cheap
    * proxy for OOV/gibberish density (the public CCNet-style frequency
    * heuristic family, computed against the corpus itself instead of an
    * external LM).
    *
    * Shape: one distinct-token explode → groupBy(token) builds the
    * document-frequency table (vocabulary-sized, far smaller than the
    * corpus — AQE broadcasts it when it fits), one occurrence explode
    * joins against it, one groupBy(doc) folds the ratio. Ratios are
    * int/int divisions — bit-deterministic. */
  def rareTokenRatio(df: DataFrame, textCol: String, idCol: String,
      maxDf: Int): DataFrame = {
    val docFreq = df
      .select(col(idCol), explode(tokenSet(col(textCol))).as("__t"))
      .groupBy("__t").agg(count(lit(1)).as("__df"))
    df.select(col(idCol), explode(tokens(col(textCol))).as("__t"))
      .join(docFreq, "__t")
      .groupBy(idCol)
      .agg((sum(when(col("__df") < maxDf, 1).otherwise(0)).cast("double")
        / count(lit(1))).as("rare_token_ratio"))
  }

  /** Duplicated-n-gram fraction: the share of a document's distinct
    * word n-grams that also occur in at least `minDf - 1` OTHER
    * documents — the public RefinedWeb/Gopher-family boilerplate signal
    * (shared n-grams ≈ templated/boilerplate spans). Counting distinct
    * grams per doc makes the corpus-side groupBy a document-frequency
    * table, same scale shape as [[rareTokenRatio]]: one explode, one
    * vocabulary-sized aggregate (AQE broadcasts it when it fits), one
    * fold back to the doc grain. Ratio is int/int — bit-deterministic. */
  def dupNgramFraction(df: DataFrame, textCol: String, idCol: String,
      n: Int = 3, minDf: Int = 2): DataFrame = {
    val grams = df
      .select(col(idCol), col(textCol), tokens(col(textCol)).as("__tk"))
      .select(col(idCol),
        explode(array_distinct(shingles("__tk", textCol, n))).as("__g"))
    val gramDf = grams.groupBy("__g").agg(count(lit(1)).as("__df"))
    grams.join(gramDf, "__g")
      .groupBy(idCol)
      .agg((sum(when(col("__df") >= minDf, 1).otherwise(0)).cast("double")
        / count(lit(1))).as("dup_ngram_ratio"))
  }

  /** Benchmark decontamination: count, per corpus document, the
    * distinct word n-grams it shares with a benchmark/eval set, and
    * flag documents at or above `minOverlap` — the leakage guard a
    * pretraining pipeline runs before training (the public
    * GPT-3/PaLM-family n-gram overlap method).
    *
    * Scale shape: the benchmark side is tiny by definition (eval sets,
    * not corpora), so its distinct gram set BROADCASTS; the corpus side
    * is one narrow explode → broadcast equi-join → groupBy(doc) fold,
    * and corpus text never shuffles. Output: the corpus frame plus
    * `n_shared_grams` and `contaminated` (callers drop flagged rows or
    * audit them). */
  def decontaminate(corpus: DataFrame, benchmark: DataFrame, textCol: String,
      idCol: String, n: Int = 3, minOverlap: Int = 2): DataFrame = {
    val benchGrams = benchmark
      .select(col(textCol), tokens(col(textCol)).as("__tk"))
      .select(explode(array_distinct(shingles("__tk", textCol, n))).as("__g"))
      .distinct()
    val overlap = corpus
      .select(col(idCol), col(textCol), tokens(col(textCol)).as("__tk"))
      .select(col(idCol),
        explode(array_distinct(shingles("__tk", textCol, n))).as("__g"))
      .join(broadcast(benchGrams), "__g")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_shared_grams"))
    corpus.join(overlap, Seq(idCol), "left")
      .withColumn("n_shared_grams", coalesce(col("n_shared_grams"), lit(0L)))
      .withColumn("contaminated", col("n_shared_grams") >= minOverlap)
  }

  /** PII patterns: deliberately simple character-class regexes (email,
    * dotted-quad IP, NNN-NNN-NNNN phone) that mean the same thing in
    * Java regex and RE2, so external engines reproduce the redaction
    * byte-for-byte. Real deployments swap in their own pattern packs —
    * the operator shape (sequential global replace, narrow projection)
    * is the contract. */
  val piiPatterns: Seq[String] = Seq(
    "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}",
    "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b",
    "\\b\\d{3}-\\d{3}-\\d{4}\\b")

  /** PII redaction: replace every pattern match with `replacement` (in
    * pattern order) and count matches per pattern on the ORIGINAL text
    * (counting per pattern, not an alternation, keeps engines' regex
    * preference rules out of the result). One narrow codegen'd
    * projection — no shuffle, no UDF. */
  def redactPii(df: DataFrame, textCol: String, idCols: Seq[String],
      replacement: String = "<PII>",
      patterns: Seq[String] = piiPatterns): DataFrame = {
    val redacted = patterns.foldLeft(col(textCol))(
      (c, p) => regexp_replace(c, p, replacement))
    val nPii = patterns.map(p =>
      size(regexp_extract_all(col(textCol), lit(p), lit(0)))).reduce(_ + _)
    df.select(idCols.map(col) ++ Seq(
      redacted.as("redacted_text"), nPii.as("n_pii")): _*)
  }

  /** Content fingerprint: md5 over the sorted distinct token set —
    * stable under token reordering and duplication. */
  def fingerprint(df: DataFrame, textCol: String, idCols: Seq[String]): DataFrame =
    df.select(idCols.map(col) :+
      md5(concat_ws(" ", array_sort(tokenSet(col(textCol))))).as("fingerprint"): _*)

  /** Token-window chunking: segment each document into sliding windows
    * of `window` tokens advancing by `stride` (stride < window ⇒
    * window − stride tokens of overlap) — the standard context-length
    * segmentation step before tokenizer packing. Chunk count is
    * ceil((n − window)/stride) + 1 (min 1), so every token is covered,
    * no chunk is fully contained in its predecessor, and only the last
    * chunk may run short. FULLY NARROW: sequence/slice/posexplode stay
    * inside codegen, nothing shuffles — at 100 TB this is a map-only
    * pass emitting ~n/stride rows per document, and the output order
    * (doc, chunk_idx) needs no sort because posexplode preserves it. */
  def chunkTokenWindows(df: DataFrame, textCol: String, idCol: String,
      window: Int, stride: Int): DataFrame = {
    require(window > 0, s"window must be positive, got $window")
    require(stride > 0 && stride <= window,
      s"stride must be in [1, window=$window], got $stride")
    df.select(col(idCol), tokens(col(textCol)).as("__tk"))
      .withColumn("__nc",
        expr(s"if(size(__tk) <= $window, 1, " +
          s"((size(__tk) - $window + $stride - 1) div $stride) + 1)"))
      .select(col(idCol),
        posexplode(expr(
          s"transform(sequence(0, int(__nc) - 1), i -> slice(__tk, i * $stride + 1, $window))")))
      .select(col(idCol), col("pos").as("chunk_idx"),
        size(col("col")).as("chunk_tokens"),
        array_join(col("col"), " ").as("chunk_text"))
  }

  /** Top-k TF-IDF keywords per document, the standard corpus-keyword
    * extraction: tf = in-doc occurrences, idf = ln((N+1)/(df+1)) + 1
    * (the smoothed form), ranked per doc by tf·idf descending with a
    * token-order tiebreak. The double score orders internally; the
    * OUTPUT is integer/string only (rank, tf, df), so the result is
    * robust to last-ulp libm differences across engines unless two
    * distinct (tf, df) pairs score within one ulp.
    *
    * Shape at scale: one occurrence explode → groupBy(doc, token) tf
    * (map-side combined), the vocabulary-sized document-frequency
    * aggregate REUSES tf's exchange (same subtree, same keys — cf.
    * [[rareTokenRatio]]), the corpus count N rides in as a one-row
    * broadcast, and the per-doc top-k compiles to a partial
    * WindowGroupLimit below the final exchange. Shuffles carry
    * (token, count) pairs only, never text. */
  def tfidfKeywords(df: DataFrame, textCol: String, idCol: String,
      k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    import org.apache.spark.sql.expressions.Window
    val tf = df.select(col(idCol), explode(tokens(col(textCol))).as("__t"))
      .groupBy(col(idCol), col("__t")).agg(count(lit(1)).as("tf"))
    // df := sum(least(tf, 1)) == documents containing the token (every
    // group has tf >= 1). Written this way, not count(1), because the
    // aggregate must REFERENCE tf: with count the optimizer strips the
    // unused count from this branch's copy of the tf aggregate, the two
    // subtrees stop being canonically identical, and ReusedExchange is
    // lost — the corpus is then scanned, exploded and shuffled TWICE.
    // Referencing tf keeps both consumers on one exchange (pinned by
    // the d25 SHUFFLE_BASELINE entry).
    val dfreq = tf.groupBy("__t").agg(sum(least(col("tf"), lit(1L))).as("df"))
    val n = df.agg(countDistinct(col(idCol)).as("__n"))
    val w = Window.partitionBy(idCol)
      .orderBy(col("__score").desc, col("__t").asc)
    tf.join(dfreq, "__t")
      .crossJoin(broadcast(n))
      .withColumn("__score",
        col("tf") * (log((col("__n") + 1.0) / (col("df") + 1.0)) + 1.0))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(idCol), col("rank"), col("__t").as("token"),
        col("tf"), col("df"))
  }

  /** Corpus vocabulary, top `k` tokens by collection frequency (ties:
    * token ascending — a total order): (token, coll_freq, doc_freq) —
    * the corpus artifact tokenizer training starts from.
    *
    * Shape at scale: per-(doc, token) counts first (one corpus-sized
    * exchange), then the vocabulary-level rollup — each (doc, token)
    * row is one document occurrence, so doc_freq is a plain count
    * (unlike [[tfidfKeywords]], there is no sibling consumer of the
    * tf frame here, so no exchange-reuse device is needed). The top-k
    * compiles to TakeOrderedAndProject (distributed partial top-k, k
    * configuration-sized) — never a global sort. */
  /** DSIR-style importance statistics (the published "Data Selection
    * for Language Models via Importance Resampling" method): hashed
    * word-bigram features over a TARGET (high-quality/in-domain) slice
    * vs the RAW rest, one row per feature bucket with occurrence
    * counts and a quantized importance weight. This is the method's
    * "train" half — a `buckets`-row artifact, saved and reused across
    * scoring runs exactly like a trained codebook; the corpus pass it
    * costs is one explode → bucket-keyed aggregate (map-side combined
    * to at most `buckets` rows per task), grand totals via a window
    * over the configuration-sized bucket frame.
    *
    * Deliberate deviation from the paper's log-likelihood-ratio: the
    * weight is the smoothed probability RATIO
    * (n_t[b]+1)(N_r+B) / ((n_r[b]+1)(N_t+B)), quantized to 2^-20
    * fixed-point via one floor. ln is not correctly rounded and
    * differs across libms, so a log-weight can diverge in the last
    * ulp between engines; the ratio uses only IEEE-exact conversions
    * and correctly-rounded multiply/divide, so the quantized weight —
    * and therefore every downstream score, an integer sum — is
    * bit-identical in any engine at any parallelism. Production code
    * that wants the exact paper scoring swaps ln in at one line and
    * gives up oracle-grade determinism, nothing else changes. */
  def dsirStats(df: DataFrame, textCol: String, isTargetCol: String,
      buckets: Int = 256): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    import org.apache.spark.sql.expressions.Window
    df.select(col(isTargetCol).as("__tgt"), col(textCol),
        tokens(col(textCol)).as("__tk"))
      .select(col("__tgt"),
        explode(shingles("__tk", textCol, 2)).as("__g"))
      .select(col("__tgt"),
        (conv(substring(md5(col("__g")), 1, 12), 16, 10).cast("long")
          % buckets).as("bucket"))
      .groupBy("bucket")
      .agg(sum(when(col("__tgt"), 1L).otherwise(0L)).as("n_target"),
        sum(when(!col("__tgt"), 1L).otherwise(0L)).as("n_raw"))
      .withColumn("__ntt", sum("n_target").over(Window.partitionBy(lit(0))))
      .withColumn("__nrt", sum("n_raw").over(Window.partitionBy(lit(0))))
      .withColumn("lambda_q", floor(lit(1048576.0)
          * ((col("n_target") + 1).cast("double")
            * (col("__nrt") + buckets).cast("double"))
          / ((col("n_raw") + 1).cast("double")
            * (col("__ntt") + buckets).cast("double")))
        .cast("long"))
      .select("bucket", "n_target", "n_raw", "lambda_q")
  }

  /** DSIR scoring, the "apply" half: per-document importance score
    * Σ_b n_db · λ_q[b] over the document's hashed-bigram bucket counts
    * and a [[dsirStats]] artifact. An INTEGER sum of quantized
    * weights — summation-order-free, so the score is deterministic
    * under any partitioning and reproduces exactly in an external
    * engine (the float log-sum it replaces is neither).
    *
    * One corpus pass: explode → (id, bucket) count (map-side
    * combined) → broadcast join of the `buckets`-row stats → per-doc
    * rollup. Text never enters an exchange. Grams hashing to a bucket
    * absent from `stats` (impossible when stats were trained on a
    * superset of this corpus; possible on genuinely new data)
    * contribute zero — the pessimistic reading of "never seen while
    * training the weights". */
  def dsirScores(df: DataFrame, textCol: String, idCol: String,
      stats: DataFrame, buckets: Int = 256,
      scoreCol: String = "dsir_score"): DataFrame = {
    // the modulus must be the TRAINING-time bucket count — inferring
    // it from max(bucket) would silently shift every hash when the top
    // buckets happen to be empty
    require(buckets > 0, s"buckets must be positive, got $buckets")
    df.select(col(idCol), col(textCol), tokens(col(textCol)).as("__tk"))
      .select(col(idCol), explode(shingles("__tk", textCol, 2)).as("__g"))
      .select(col(idCol),
        (conv(substring(md5(col("__g")), 1, 12), 16, 10).cast("long")
          % buckets).as("bucket"))
      .groupBy(col(idCol), col("bucket")).agg(count(lit(1)).as("__n"))
      // LEFT join: a doc whose every bucket is absent from the stats
      // must still come back (scored 0), not vanish — an inner join
      // would silently drop it from the resampling pool
      .join(broadcast(stats.select(col("bucket"), col("lambda_q"))),
        Seq("bucket"), "left")
      .groupBy(idCol)
      .agg(sum(col("__n") * coalesce(col("lambda_q"), lit(0L))).as(scoreCol))
  }

  def vocabularyTopK(df: DataFrame, textCol: String, idCol: String,
      k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val tf = df.select(col(idCol), explode(tokens(col(textCol))).as("token"))
      .groupBy(col(idCol), col("token")).agg(count(lit(1)).as("tf"))
    tf.groupBy("token")
      .agg(sum("tf").as("coll_freq"),
        count(lit(1)).as("doc_freq"))
      .orderBy(col("coll_freq").desc, col("token").asc)
      .limit(k)
  }

  /** Adjacent token-pair statistics, top `k` by count (ties: pair
    * ascending) — the first step of BPE/WordPiece merge training:
    * every neighboring (tok_a, tok_b) in every document, counted over
    * the corpus. One narrow explode, one (pair, count) aggregate with
    * map-side combine, TakeOrderedAndProject for the k cut — shuffles
    * carry pair strings and counts only, never documents. */
  def bpePairStats(df: DataFrame, textCol: String, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    // filter BEFORE the sequence: Spark's sequence(0, -1) infers step
    // -1 and yields [0, -1] instead of an empty array, so a 1-token
    // doc would fabricate a pair
    df.select(tokens(col(textCol)).as("__tk"))
      .filter(size(col("__tk")) >= 2)
      .select(explode(expr(
        "transform(sequence(0, size(__tk) - 2), i -> " +
          "struct(element_at(__tk, i + 1) AS a, element_at(__tk, i + 2) AS b))"))
        .as("__p"))
      .select(col("__p.a").as("tok_a"), col("__p.b").as("tok_b"))
      .groupBy("tok_a", "tok_b").agg(count(lit(1)).as("pair_count"))
      .orderBy(col("pair_count").desc, col("tok_a").asc, col("tok_b").asc)
      .limit(k)
  }

  /** N-gram transition structs `(a = the (order-1)-token context
    * joined by spaces, b = the following token)` of a token-array
    * column, explode-ready; the empty TYPED array for docs shorter
    * than `order` (the bpePairStats sequence(0,-1) hazard, solved
    * with an explicit CASE + cast instead of a filter so
    * explode_outer callers keep every doc). order = 2 is the adjacent
    * pair (a = previous token). */
  private def transitionArr(tokenArrayCol: String, order: Int): Column = expr(
    s"CASE WHEN size($tokenArrayCol) >= $order THEN " +
      s"transform(sequence(0, size($tokenArrayCol) - $order), i -> " +
      s"struct(concat_ws(' ', slice($tokenArrayCol, i + 1, ${order - 1})) AS a, " +
      s"$tokenArrayCol[i + ${order - 1}] AS b)) " +
      "ELSE CAST(array() AS ARRAY<STRUCT<a: STRING, b: STRING>>) END")

  /** The d35 engine-neutral hash bucket: top 48 bits of md5, mod B. */
  private def hashBucket48(c: Column, buckets: Int): Column =
    conv(substring(md5(c), 1, 12), 16, 10).cast("long") % buckets

  /** Hashed n-gram LM statistics (the CCNet recipe's KenLM stand-in,
    * trained on the in-domain slice): context ((order-1) previous
    * tokens) bucket counts and full-n-gram bucket counts over every
    * transition in `df`; `order` = 2 is the bigram default, CCNet's
    * published recipe uses 5. One corpus pass — each transition explodes to
    * its two (kind, bucket) feature rows and ONE map-side-combined
    * aggregate collapses them to at most ctxBuckets + pairBuckets rows
    * per task, so the artifact is config-sized at any corpus size,
    * exactly like [[dsirStats]]' codebook device. */
  def lmStats(df: DataFrame, textCol: String, ctxBuckets: Int = 1024,
      pairBuckets: Int = 16384, order: Int = 2): DataFrame = {
    require(ctxBuckets > 0, s"ctxBuckets must be positive, got $ctxBuckets")
    require(pairBuckets > 0, s"pairBuckets must be positive, got $pairBuckets")
    require(order >= 2, s"order must be >= 2, got $order")
    // The bucket/order config rides the artifact itself (column
    // metadata on cnt — survives localizeStats and a parquet
    // round-trip): pairBuckets enters lmPerplexity's smoothing
    // denominator and bucket ids are only meaningful in the space they
    // were hashed into, so scoring against a mismatched config must
    // fail loudly, not silently produce wrong perplexities.
    val cfg = new org.apache.spark.sql.types.MetadataBuilder()
      .putLong("ctxBuckets", ctxBuckets.toLong)
      .putLong("pairBuckets", pairBuckets.toLong)
      .putLong("order", order.toLong).build()
    df.select(tokens(col(textCol)).as("__tk"))
      .select(explode(transitionArr("__tk", order)).as("__tr"))
      .select(explode(array(
        struct(lit("ctx").as("kind"),
          hashBucket48(col("__tr.a"), ctxBuckets).as("bucket")),
        struct(lit("pair").as("kind"),
          hashBucket48(concat_ws(" ", col("__tr.a"), col("__tr.b")),
            pairBuckets).as("bucket")))).as("__f"))
      .groupBy(col("__f.kind").as("kind"), col("__f.bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt", cfg))
  }

  /** Materialize a [[lmStats]] artifact through the driver — the
    * trained-codebook device (PQ codebooks, IVF centroids): the frame
    * is PROVABLY config-bounded (its grain is the bucket ids), so the
    * hop is safe at any corpus size, and consumers that join it more
    * than once (lmPerplexity joins context and pair sides) stop
    * re-running the training scan per join. */
  def localizeStats(stats: DataFrame): DataFrame = {
    val rows = stats.collect()
    stats.sparkSession.createDataFrame(
      java.util.Arrays.asList(rows: _*), stats.schema)
  }

  /** floor-quantized log2(d / n) in 1/1024ths for integral d >= n >= 1,
    * computed with INTEGER arithmetic only — shift-and-square on a
    * 30-bit normalized rational. ln/log2 are not correctly rounded and
    * differ across libms (the dsirStats lesson), so a float log can
    * diverge in the last ulp between engines; these are shifts,
    * multiplies, and comparisons on longs, bit-identical anywhere.
    * Integer part: floor(log2(d div n)) = bitlength - 1 (exact: d/n
    * and d div n never straddle a power of two). Fraction: normalize
    * p/q to q in [2^29, 2^30) (left shifts exact, right shifts floor
    * deterministically), then 10x { square, renormalize, emit a bit if
    * the ratio crossed 2 } — p stays < 2^31, p^2 < 2^62, no overflow.
    * Appends `outCol` and drops the scratch columns. */
  private[operators] def withQuantizedLog2(df: DataFrame, dCol: String,
      nCol: String, outCol: String): DataFrame = {
    var out = df
      .withColumn("__k", (length(bin(expr(s"$dCol div $nCol"))) - 1).cast("int"))
      .withColumn("__q0", expr(s"shiftleft($nCol, __k)"))
      .withColumn("__s0", (length(bin(col("__q0"))) - 30).cast("int"))
      .withColumn("__p", expr(
        s"CASE WHEN __s0 >= 0 THEN shiftright($dCol, __s0) " +
          s"ELSE shiftleft($dCol, -__s0) END"))
      .withColumn("__q", expr(
        "CASE WHEN __s0 >= 0 THEN shiftright(__q0, __s0) " +
          "ELSE shiftleft(__q0, -__s0) END"))
      .withColumn("__acc", lit(0L))
    for (_ <- 1 to 10) {
      out = out
        .withColumn("__p", col("__p") * col("__p"))
        .withColumn("__q", col("__q") * col("__q"))
        .withColumn("__s", (length(bin(col("__q"))) - 30).cast("int"))
        .withColumn("__p", expr("shiftright(__p, __s)"))
        .withColumn("__q", expr("shiftright(__q, __s)"))
        .withColumn("__b", (col("__p") >= col("__q") * 2).cast("long"))
        .withColumn("__p", expr("CASE WHEN __b = 1 THEN shiftright(__p, 1) ELSE __p END"))
        .withColumn("__acc", col("__acc") * 2 + col("__b"))
    }
    out.withColumn(outCol, col("__k").cast("long") * 1024 + col("__acc"))
      .drop("__k", "__q0", "__s0", "__p", "__q", "__s", "__b", "__acc")
  }

  /** Per-document LM perplexity against a [[lmStats]] artifact — the
    * CCNet quality signal (LOW = in-domain-like). Each transition's
    * add-one-smoothed probability is the counts ratio
    * (c_pair + 1) / (c_ctx + pairBuckets), clamped to <= 1 (bucket
    * collisions can inflate c_pair past its context's mass); its
    * negative log2 is [[withQuantizedLog2]]'s integer quantization, so
    * the document score — `ppl_q` = (sum of transition nlls in
    * 1/1024ths) div transitions, an integer mean log2 perplexity — is
    * summation-order-free and engine-exact.
    *
    * One corpus pass, text in no exchange: a narrow transition
    * explode_outer (docs with < 2 tokens keep a null row and score 0
    * — CCNet's head band must not silently lose them), two broadcast
    * joins of the config-sized stats, integer nll columns, then the
    * per-doc rollup whose map-side partials are one row per doc per
    * task. */
  def lmPerplexity(df: DataFrame, textCol: String, idCol: String,
      stats: DataFrame, ctxBuckets: Int = 1024, pairBuckets: Int = 16384,
      scoreCol: String = "ppl_q", order: Int = 2): DataFrame = {
    require(ctxBuckets > 0 && pairBuckets > 0,
      s"bucket counts must be positive, got $ctxBuckets/$pairBuckets")
    require(order >= 2, s"order must be >= 2, got $order")
    // Validate the scoring config against the one the artifact was
    // trained with, when the artifact carries it ([[lmStats]] stamps
    // cnt's column metadata; hand-built stats frames without it skip
    // the check). A mismatch re-hashes bucket ids into the wrong space
    // and shifts the smoothing denominator — wrong scores, no error.
    stats.schema.fields.find(_.name == "cnt").map(_.metadata)
      .filter(_.contains("ctxBuckets")).foreach { m =>
        require(m.getLong("ctxBuckets") == ctxBuckets &&
            m.getLong("pairBuckets") == pairBuckets &&
            m.getLong("order") == order,
          s"lmPerplexity: stats artifact was trained with ctxBuckets=" +
            s"${m.getLong("ctxBuckets")}, pairBuckets=" +
            s"${m.getLong("pairBuckets")}, order=${m.getLong("order")} " +
            s"but scoring was invoked with $ctxBuckets/$pairBuckets/" +
            s"$order — bucket ids would re-hash into the wrong space")
      }
    val tr = df.select(col(idCol), tokens(col(textCol)).as("__tk"))
      .select(col(idCol), explode_outer(transitionArr("__tk", order)).as("__tr"))
      .withColumn("__cb", hashBucket48(col("__tr.a"), ctxBuckets))
      .withColumn("__pb", hashBucket48(
        concat_ws(" ", col("__tr.a"), col("__tr.b")), pairBuckets))
    val scored = tr
      .join(broadcast(stats.filter(col("kind") === "ctx")
        .select(col("bucket").as("__cb"), col("cnt").as("__cc"))),
        Seq("__cb"), "left")
      .join(broadcast(stats.filter(col("kind") === "pair")
        .select(col("bucket").as("__pb"), col("cnt").as("__pc"))),
        Seq("__pb"), "left")
      // null transition (sub-2-token doc) keeps __d/__n null -> null nll
      .withColumn("__d",
        when(col("__tr").isNotNull,
          coalesce(col("__cc"), lit(0L)) + pairBuckets))
      .withColumn("__n",
        when(col("__tr").isNotNull,
          least(coalesce(col("__pc"), lit(0L)) + 1, col("__d"))))
    withQuantizedLog2(scored, "__d", "__n", "__nll")
      .groupBy(col(idCol))
      .agg(count(col("__tr")).as("n_trans"),
        coalesce(sum(col("__nll")), lit(0L)).as("nll_q"))
      .withColumn(scoreCol,
        expr("nll_q div greatest(n_trans, 1L)"))
  }

  /** A small character-BPE merge list over common English fragments —
    * a stand-in for a trained artifact ([[bpePairStats]] computes the
    * statistics a real training loop iterates on). Rank = position;
    * later merges may build on earlier ones' surfaces ("in"+"g"). All
    * surface forms are distinct (BpeTables enforces it — ids would
    * collide otherwise). */
  val defaultBpeMerges: Seq[(String, String)] = Seq(
    "t" -> "h", "th" -> "e", "i" -> "n", "a" -> "n", "an" -> "d",
    "e" -> "r", "o" -> "n", "r" -> "e", "o" -> "r", "e" -> "n",
    "a" -> "t", "e" -> "s", "o" -> "u", "in" -> "g", "t" -> "o",
    "i" -> "t", "i" -> "s", "o" -> "f", "a" -> "l", "e" -> "d",
    "a" -> "r", "s" -> "t", "c" -> "o", "l" -> "e")

  /** A byte-level merge list in the PUBLISHED GPT-2 artifact format
    * (vocab.bpe, openai/gpt-2): pairs of strings over the
    * [[graft.functions.ByteAlphabet]] mapped alphabet, where "Ġ" is
    * the mapped space byte — the opening merges of that public list
    * ("Ġ t", "Ġ a", "h e", "i n", "r e", "o n", "Ġt he", ...). Real
    * merge lists plug into byte mode unmodified — this prefix is the
    * compatibility fixture the d53 gate runs against. */
  val gpt2ByteMergesPrefix: Seq[(String, String)] = Seq(
    "Ġ" -> "t", "Ġ" -> "a", "h" -> "e", "i" -> "n",
    "r" -> "e", "o" -> "n", "Ġt" -> "he", "e" -> "r",
    "Ġ" -> "s", "a" -> "t")

  /** The one-pass (word, count) corpus histogram BPE training
    * iterates on: whitespace words (empty words — runs of spaces,
    * leading/trailing — contribute nothing, matching graft_bpe_pairs'
    * own splitting), counted corpus-wide. Vocab-sized, not
    * corpus-sized: natural-language vocabularies plateau in the
    * millions of distinct words while corpora grow without bound,
    * which is why published BPE trainers (the GPT-2 reference) all
    * pre-aggregate to this frame before the merge loop. */
  def bpeWordHistogram(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(tokens(col(textCol))).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("cnt"))

  /** [[bpeWordHistogram]]'s byte-mode counterpart: the (chunk, count)
    * histogram over space-ATTACHED chunks (`' *[^ ]+| +'` — the
    * graft_bpe_bytes chunking, so whitespace is part of the trained
    * vocabulary exactly as the published byte-level scheme has it). */
  def bpeChunkHistogram(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(
        regexp_extract_all(col(textCol), lit(" *[^ ]+| +"), lit(0))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cnt"))

  /** One training iteration's weighted pair-count frame over a
    * [[bpeWordHistogram]]: each DISTINCT word is segmented once under
    * the current merges (graft_bpe_pairs) and its adjacent sub-token
    * pairs weighted by the word's corpus count — identical totals to
    * counting pairs per word OCCURRENCE over the raw corpus, at
    * vocab-scan cost. Exposed for the plan spec that pins the
    * per-merge job to the histogram. */
  private[graft] def bpePairCounts(hist: DataFrame,
      merges: Seq[(String, String)], byteLevel: Boolean = false): DataFrame = {
    // an empty array() literal types as array<void>; pin the type
    val m = array(merges.map { case (l, r) => array(lit(l), lit(r)) }: _*)
      .cast("array<array<string>>")
    val fn = if (byteLevel) "graft_bpe_bytes_pairs" else "graft_bpe_pairs"
    hist
      .select(col("cnt"),
        explode(call_function(fn, col("w"), m)).as("p"))
      .groupBy("p").agg(sum(col("cnt")).as("c"))
  }

  /** BPE merge-list TRAINING (the published iterative loop): count
    * every adjacent sub-token pair under the current segmentation
    * (graft_bpe_pairs — per word occurrence, boundaries respected),
    * append the most frequent pair as the next merge, re-segment,
    * repeat `numMerges` times.
    *
    * The corpus is scanned ONCE — into the persisted
    * [[bpeWordHistogram]] — and every merge iteration is a scan of
    * that vocab-sized frame with a map-side-combined weighted
    * (pair, count) aggregate and a TakeOrderedAndProject cut: per-word
    * pair multiplicity times word count sums to exactly the
    * per-occurrence count, so the trained list is unchanged, but a
    * 32k-merge train costs merges × vocab, not merges × corpus.
    * Shuffles carry pair strings and counts only; published pipelines
    * additionally train on a corpus SAMPLE, which is the caller's
    * knob (pass `df.sample(...)`).
    *
    * Ties break on the pair string ascending (a total order, so the
    * trained list is engine-reproducible). One deliberate deviation
    * from tokenizers that track token IDENTITY: a candidate whose
    * surface form collides with an existing merge's surface is
    * SKIPPED (the engine-neutral id scheme — and any external replay
    * of the merge list — needs surfaces to be unambiguous). Training
    * stops early when no pair occurs twice. */
  def trainBpeMerges(df: DataFrame, textCol: String, numMerges: Int,
      base: Seq[(String, String)] = Nil,
      byteLevel: Boolean = false): Seq[(String, String)] = {
    require(numMerges >= 0, s"numMerges must be >= 0, got $numMerges")
    graft.functions.GraftFunctions.register(df.sparkSession)
    // byte mode trains over space-attached chunks through the mapped
    // alphabet (graft_bpe_bytes_pairs) — the merges it learns are
    // published-format byte merges ('Ġ'-prefixed and all)
    val hist = (if (byteLevel) bpeChunkHistogram(df, textCol)
      else bpeWordHistogram(df, textCol)).persist()
    try {
      var merges = base.toVector
      var stop = false
      while (merges.size < base.size + numMerges && !stop) {
        val surfaces = merges.map { case (l, r) => l + r }
        val best = bpePairCounts(hist, merges, byteLevel)
          .filter(col("c") >= 2 &&
            !regexp_replace(col("p"), " ", "").isin(surfaces: _*))
          .orderBy(col("c").desc, col("p").asc)
          .limit(1)
          .collect()
        if (best.isEmpty) stop = true
        else {
          val parts = best(0).getString(0).split(" ", 2)
          merges = merges :+ (parts(0) -> parts(1))
        }
      }
      merges
    } finally hist.unpersist()
  }

  /** [[trainBpeMerges]] with the published single-process merge loop:
    * the corpus still scans ONCE into the vocab-sized histogram (the
    * same distributed pre-aggregation — that is the corpus-scale
    * part), which then localizes through a capped driver hop, and all
    * `numMerges` iterations run IN MEMORY with incremental
    * re-segmentation: when a merge lands, only the words whose
    * current segmentation contains the merged pair re-segment (a
    * maintained pair→words index, no scan), and pair counts update by
    * deltas — so a real 50k-merge train costs one corpus scan plus
    * in-memory work instead of 50k sequential vocab-sized Spark jobs
    * (the r17 verdict's note #5). This is the architecture published
    * trainers use (histogram in memory, incremental pair
    * maintenance); the distributed loop remains the choice when the
    * vocabulary exceeds driver memory — `maxVocab` fails loudly (the
    * published knob past it is training on `df.sample`).
    *
    * Output is IDENTICAL to [[trainBpeMerges]] (A/B spec'd): the same
    * segmentation kernel ([[graft.functions.BpeTables]]), the same
    * tie order (count desc, then the "l r" pair string ascending in
    * UTF8String binary order — exactly the distributed orderBy), the
    * same surface-collision skip, the same stop-when-no-pair-twice
    * rule. Applying only the NEW pair to an affected word is exact,
    * not an approximation: the old segmentation is already a fixpoint
    * of the old merges, and no old merge can reference the new
    * surface (surfaces are unique), so the single-pair
    * left-to-right-until-absent pass lands on the full loop's
    * fixpoint. */
  def trainBpeMergesIncremental(df: DataFrame, textCol: String,
      numMerges: Int, base: Seq[(String, String)] = Nil,
      byteLevel: Boolean = false, maxVocab: Int = 1 << 22)
      : Seq[(String, String)] = {
    require(numMerges >= 0, s"numMerges must be >= 0, got $numMerges")
    val hist = if (byteLevel) bpeChunkHistogram(df, textCol)
      else bpeWordHistogram(df, textCol)
    val rows = DriverBounded.collectCapped(hist, maxVocab,
      s"trainBpeMergesIncremental: distinct vocabulary exceeds " +
        s"maxVocab $maxVocab; train on df.sample (the published knob) " +
        "or use the distributed trainBpeMerges loop")
    val words = rows.map(_.getString(0))
    val cnts = rows.map(_.getLong(1))
    // initial segmentation under the base merges — the same kernel
    // the distributed loop's graft_bpe_pairs expression runs
    val baseTables = new graft.functions.BpeTables(base.toArray, byteLevel)
    val seg: Array[Array[String]] =
      words.map(w => baseTables.segmentWord(w))
    // pair accounting: "l r" key -> corpus-weighted count, and the
    // pair -> word-index occurrence index that makes re-segmentation
    // O(affected), never a vocab scan
    val counts = new java.util.HashMap[String, Long]()
    val byPair = new java.util.HashMap[String, java.util.HashSet[Integer]]()
    def addWord(i: Int, sign: Long): Unit = {
      val s = seg(i); val c = cnts(i) * sign
      var j = 0
      while (j < s.length - 1) {
        val key = s(j) + " " + s(j + 1)
        val nv = counts.getOrDefault(key, 0L) + c
        if (nv == 0L) { counts.remove(key); () } else counts.put(key, nv)
        // membership is add-only (removal is lazy: a stale entry's
        // remove+re-add nets to zero when its pair is later picked)
        if (sign > 0) {
          byPair.computeIfAbsent(key,
            _ => new java.util.HashSet[Integer]()).add(i)
          ()
        }
        j += 1
      }
    }
    (0 until words.length).foreach(addWord(_, 1L))
    // the distributed loop's exact tie order: UTF8String binary
    // ascending on the "l r" key (= code-point order; Java
    // String.compareTo diverges on supplementary planes)
    def keyLt(a: String, b: String): Boolean =
      org.apache.spark.unsafe.types.UTF8String.fromString(a)
        .compareTo(org.apache.spark.unsafe.types.UTF8String.fromString(b)) < 0
    var merges = base.toVector
    var surfaces = merges.map { case (l, r) => l + r }.toSet
    var stop = false
    while (merges.size < base.size + numMerges && !stop) {
      var bestKey: String = null
      var bestC = 1L  // the c >= 2 floor
      val it = counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val surf = e.getKey.replace(" ", "")
        if (!surfaces.contains(surf) &&
            (e.getValue > bestC ||
              (e.getValue == bestC && bestKey != null &&
                keyLt(e.getKey, bestKey))))
          if (e.getValue >= 2) { bestKey = e.getKey; bestC = e.getValue }
      }
      if (bestKey == null) stop = true
      else {
        val parts = bestKey.split(" ", 2)
        val (l, r) = (parts(0), parts(1))
        merges = merges :+ (l -> r)
        surfaces = surfaces + (l + r)
        val members = byPair.get(bestKey)
        val affected = if (members == null) Array.empty[Int]
          else members.toArray(Array.empty[Integer]).map(_.intValue)
        byPair.remove(bestKey)
        affected.foreach { i =>
          // stale index entries (the pair left this word in an earlier
          // merge) contribute nothing: remove+re-add is a no-op then
          addWord(i, -1L)
          seg(i) = mergeInPlace(seg(i), l, r)
          addWord(i, 1L)
        }
        // the merged pair cannot re-form (its surface is now a merge,
        // and no later surface can equal an existing token — the
        // collision skip); a residual count here would be an
        // accounting bug, not a legal state
        require(!counts.containsKey(bestKey),
          s"trainBpeMergesIncremental: residual count for merged pair " +
            s"'$bestKey' — pair accounting diverged")
      }
    }
    merges
  }

  /** One left-to-right, non-overlapping, until-absent pass of a
    * single merge pair over a segmentation — the full batch loop's
    * fixpoint when the pair is the newest (lowest-priority) merge. */
  private def mergeInPlace(toks: Array[String], l: String,
      r: String): Array[String] = {
    var cur = toks
    var changed = true
    while (changed && cur.length > 1) {
      changed = false
      val out = new scala.collection.mutable.ArrayBuffer[String](cur.length)
      var j = 0
      while (j < cur.length) {
        if (j < cur.length - 1 && cur(j) == l && cur(j + 1) == r) {
          out += l + r; changed = true; j += 2
        } else { out += cur(j); j += 1 }
      }
      cur = out.toArray
    }
    cur
  }

  /** Parse a merge list in the published vocab.bpe FILE format
    * (openai/gpt-2): an optional `#version:` header line, then one
    * `lhs rhs` pair per line; blank lines ignored, CRLF tolerated.
    * The result plugs into [[bpeEncode]]/[[bpeDecode]] byte mode
    * as-is — this closes the artifact-compatibility loop the inline
    * [[gpt2ByteMergesPrefix]] fixture opens (scope: alphabet +
    * artifact format; the pretokenizer deviates, see BpeTables). */
  def parseMergeLines(lines: Iterator[String]): Seq[(String, String)] =
    lines.map(_.stripSuffix("\r")).zipWithIndex
      .filterNot { case (l, i) =>
        l.isEmpty || (i == 0 && l.startsWith("#version")) }
      .map { case (l, i) =>
        val parts = l.split(" ", -1)
        require(parts.length == 2 && parts.forall(_.nonEmpty),
          s"parseMergeLines: line ${i + 1} is not a 'lhs rhs' pair: '$l'")
        (parts(0), parts(1))
      }.toVector

  /** [[parseMergeLines]] over a file on any Hadoop filesystem —
    * driver-side (merge lists are config-sized artifacts: 50k lines),
    * UTF-8. */
  def loadMergeFile(spark: org.apache.spark.sql.SparkSession,
      path: String): Seq[(String, String)] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val in = fs.open(p)
    try parseMergeLines(scala.io.Source.fromInputStream(in, "UTF-8")
      .getLines())
    finally in.close()
  }

  /** BPE-apply (the published GPT-2 encode loop): whitespace words ->
    * per-word batch merges in rank order -> engine-neutral token ids
    * (single codepoint = the code point; merge rank r = 0x110000 + r).
    * One narrow per-row native expression (graft_bpe) — codegen'd, no
    * UDF, no shuffle at any corpus size; the merge table rides the
    * plan as one shared reference object with a bounded word cache.
    * Appends `outCol` (array<int>). Training is out of scope here:
    * published pipelines iterate [[bpePairStats]] -> take the best
    * pair -> re-segment; this applies the resulting artifact. */
  def bpeEncode(df: DataFrame, textCol: String,
      merges: Seq[(String, String)] = defaultBpeMerges,
      outCol: String = "bpe_ids", byteLevel: Boolean = false): DataFrame = {
    requireNoCollision(df, Seq(outCol), "bpeEncode")
    graft.functions.GraftFunctions.register(df.sparkSession)
    // merges = Nil (codepoint-only encode) makes the bare literal type
    // array<void>; pin it (the bpePairCounts device)
    val m = array(merges.map { case (l, r) => array(lit(l), lit(r)) }: _*)
      .cast("array<array<string>>")
    val fn = if (byteLevel) "graft_bpe_bytes" else "graft_bpe"
    df.withColumn(outCol, call_function(fn, col(textCol), m))
  }

  /** Model-based quality-classifier TRAINING (the GPT-3/CCNet recipe's
    * "quality classifier trained on a curated seed" — published as a
    * logistic/fastText model over bag-of-words; this is the
    * multinomial Naive Bayes formulation, whose one-pass closed-form
    * training fits a distributed engine: no SGD epochs, one aggregate).
    * Hashed unigram counts per class over a LABELED slice
    * (`isPositiveCol` boolean: curated/high-quality vs rest), plus one
    * `bucket = -1` row carrying the class DOCUMENT counts (the prior).
    * The artifact is config-sized (<= buckets + 1 rows) at any corpus
    * size — same trained-codebook device as [[lmStats]]/[[dsirStats]];
    * the bucket config rides `n_pos`'s column metadata and scoring
    * validates it (a mismatch re-hashes into the wrong space).
    * Tokenization is bare space-split (empties kept), identical to the
    * LM chain, so external mirrors reproduce counts exactly. */
  def nbStats(df: DataFrame, textCol: String, isPositiveCol: String,
      buckets: Int = 4096): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    val cfg = new org.apache.spark.sql.types.MetadataBuilder()
      .putLong("buckets", buckets.toLong).build()
    val tok = df
      .select(col(isPositiveCol).as("__pos"),
        explode(tokens(col(textCol))).as("__t"))
      .select(col("__pos"), hashBucket48(col("__t"), buckets).as("bucket"))
      .groupBy("bucket")
      .agg(sum(when(col("__pos"), 1L).otherwise(0L)).as("n_pos"),
        sum(when(!col("__pos"), 1L).otherwise(0L)).as("n_neg"))
    val docs = df
      .agg(sum(when(col(isPositiveCol), 1L).otherwise(0L)).as("n_pos"),
        sum(when(!col(isPositiveCol), 1L).otherwise(0L)).as("n_neg"))
      .select(lit(-1L).as("bucket"), col("n_pos"), col("n_neg"))
    tok.unionByName(docs)
      .select(col("bucket"), col("n_pos").as("n_pos", cfg), col("n_neg"))
  }

  /** Quality-classifier SCORING against a [[nbStats]] artifact: per
    * document, the add-one-smoothed Naive Bayes negative log2
    * likelihood under each class — token term
    * (N_c + buckets) / (c_c[b] + 1) per occurrence plus one prior term
    * (D_pos + D_neg + 2) / (D_c + 1) — via [[withQuantizedLog2]]'s
    * integer shift-and-square chain (no libm anywhere, so scores are
    * bit-identical across engines and partitionings, the dsirStats
    * lesson). `margin_q = nll_neg_q - nll_q_pos` in 1/1024ths of a
    * bit: positive margin = the curated class is likelier =
    * `pred_hq`. This is the published filter's decision rule; the
    * Pareto-noisiness trick GPT-3 layers on top (keep if
    * score > 1 - sample) is a caller-side threshold on `margin_q`.
    *
    * One corpus pass, text in no exchange: narrow token explode_outer
    * (null-text docs keep a row and score on the prior alone), ONE
    * broadcast join of the config-sized stats, two integer nll column
    * chains, then a doc-grain rollup (map-side combined). Class token
    * totals and the two prior terms localize through a driver hop of
    * the artifact — provably bounded at <= buckets + 1 rows by its
    * grain, the [[localizeStats]] discipline — and ride the plan as
    * literals, so the scoring plan carries exactly one exchange and
    * never re-runs the training scan (the prior's own qlog2 runs
    * through the SAME column chain on a one-row frame, not a
    * reimplementation). This forces `stats` eagerly at plan-build. */
  def nbScore(df: DataFrame, textCol: String, idCol: String,
      stats: DataFrame, buckets: Int = 4096,
      scoreCol: String = "margin_q"): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    stats.schema.fields.find(_.name == "n_pos").map(_.metadata)
      .filter(_.contains("buckets")).foreach { m =>
        require(m.getLong("buckets") == buckets,
          s"nbScore: stats artifact was trained with buckets=" +
            s"${m.getLong("buckets")} but scoring was invoked with " +
            s"$buckets — bucket ids would re-hash into the wrong space")
      }
    val tokStats = stats.filter(col("bucket") >= 0)
    val totRow = tokStats
      .agg(coalesce(sum("n_pos"), lit(0L)).as("tp"),
        coalesce(sum("n_neg"), lit(0L)).as("tn")).collect()(0)
    val (tp, tn) = (totRow.getLong(0), totRow.getLong(1))
    val priorRows = stats.filter(col("bucket") === -1)
      .select(col("n_pos"), col("n_neg")).collect()
    require(priorRows.length == 1,
      s"nbScore: stats artifact must carry exactly one prior row " +
        s"(bucket = -1), got ${priorRows.length} — was it built by nbStats?")
    val (dp, dn) = (priorRows(0).getLong(0), priorRows(0).getLong(1))
    // `+ id` (always 0) keeps the inputs non-foldable: on pure
    // literals Catalyst constant-folds the 2x10-step chain into an
    // exponentially duplicated expression tree and the optimizer
    // spins; with a column reference the chain stays the same narrow
    // projects the corpus path runs
    val pq = withQuantizedLog2(withQuantizedLog2(
        df.sparkSession.range(1).select(
          (lit(dp + dn + 2) + col("id")).as("__pa"),
          (lit(dp + 1) + col("id")).as("__pp"),
          (lit(dn + 1) + col("id")).as("__pn")),
        "__pa", "__pp", "__prp"), "__pa", "__pn", "__prn")
      .select("__prp", "__prn").collect()(0)
    val (priorPos, priorNeg) = (pq.getLong(0), pq.getLong(1))
    val tok = df
      .select(col(idCol), explode_outer(tokens(col(textCol))).as("__t"))
      .withColumn("__b",
        when(col("__t").isNotNull, hashBucket48(col("__t"), buckets)))
      .join(broadcast(tokStats.select(col("bucket").as("__b"),
        col("n_pos").as("__cp"), col("n_neg").as("__cn"))),
        Seq("__b"), "left")
      .withColumn("__dp", when(col("__t").isNotNull, lit(tp + buckets)))
      .withColumn("__dn", when(col("__t").isNotNull, lit(tn + buckets)))
      .withColumn("__np",
        when(col("__t").isNotNull, coalesce(col("__cp"), lit(0L)) + 1))
      .withColumn("__nn",
        when(col("__t").isNotNull, coalesce(col("__cn"), lit(0L)) + 1))
    val scored = withQuantizedLog2(
      withQuantizedLog2(tok, "__dp", "__np", "__nllp"),
      "__dn", "__nn", "__nlln")
      .groupBy(col(idCol))
      .agg(count(col("__t")).as("n_tok"),
        coalesce(sum(col("__nllp")), lit(0L)).as("nll_pos_q"),
        coalesce(sum(col("__nlln")), lit(0L)).as("nll_neg_q"))
    scored
      .withColumn(scoreCol,
        (col("nll_neg_q") + lit(priorNeg))
          - (col("nll_pos_q") + lit(priorPos)))
      .withColumn("pred_hq", col(scoreCol) > 0)
  }

  /** BPE-decode — the inverse of [[bpeEncode]] at word grain: codepoint
    * ids back to their characters, merge ids back to their surface
    * forms, concatenated (graft_bpe_decode, the same narrow codegen'd
    * per-row shape). The id stream carries no whitespace token, so a
    * text-level stream decodes to its words concatenated; the LOSSLESS
    * grain is the word, which d50 proves over the corpus vocabulary.
    * Appends `outCol` (string). */
  def bpeDecode(df: DataFrame, idsCol: String,
      merges: Seq[(String, String)] = defaultBpeMerges,
      outCol: String = "decoded", byteLevel: Boolean = false): DataFrame = {
    requireNoCollision(df, Seq(outCol), "bpeDecode")
    graft.functions.GraftFunctions.register(df.sparkSession)
    // merges = Nil (decoding a codepoint-only id stream) makes the
    // bare literal type array<void>; pin it (the bpePairCounts device)
    val m = array(merges.map { case (l, r) => array(lit(l), lit(r)) }: _*)
      .cast("array<array<string>>")
    val fn = if (byteLevel) "graft_bpe_bytes_decode" else "graft_bpe_decode"
    df.withColumn(outCol, call_function(fn, col(idsCol), m))
  }

  /** Winnowing fingerprint (rolling hash): hash every word n-gram
    * shingle, slide a window of `window` consecutive shingle hashes and
    * keep each window's minimum — the classic local-fingerprint scheme
    * whose selected hashes overlap for documents sharing long runs. The
    * digest is md5 over the ordered distinct selected hashes. */
  def winnowFingerprint(df: DataFrame, textCol: String, idCols: Seq[String],
      shingleSize: Int = 3, window: Int = 4): DataFrame = {
    val hashes = transform(col("__sh"),
      t => conv(substring(md5(t), 1, 12), 16, 10).cast("long"))
    val mins = expr(
      s"transform(sequence(1, greatest(size(__h) - ${window - 1}, 1)), " +
        s"i -> array_min(slice(__h, i, $window)))")
    df.select(idCols.map(col) ++ Seq(col(textCol), tokens(col(textCol)).as("__tk")): _*)
      .withColumn("__sh", shingles("__tk", textCol, shingleSize))
      .withColumn("__h", hashes)
      .select(idCols.map(col) :+
        md5(concat_ws(",",
          transform(array_sort(array_distinct(mins)), x => x.cast("string"))))
          .as("winnow_fp"): _*)
  }
}
