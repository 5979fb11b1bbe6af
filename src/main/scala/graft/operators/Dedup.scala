package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators: exact (hash-groupBy), MinHash+LSH, SimHash,
  * n-gram Jaccard. Designed for the 100 TB shape:
  *
  *  - exact dedup shuffles 32-byte md5 keys, never raw content;
  *  - MinHash signatures are computed by exploding the distinct shingle
  *    set and min-aggregating seeded md5s — every hash runs inside
  *    whole-stage codegen and the only wide exchange is a groupBy on the
  *    doc id (higher-order-function folds are interpreted and measured
  *    ~10x slower);
  *  - LSH candidates come from an equi-join on index-salted band keys;
  *  - Jaccard runs only inside candidate blocks (a cheap blocking key or
  *    the LSH output), never all-pairs.
  */
object Dedup {

  /** Exact-duplicate groups: one row per distinct content hash with the
    * canonical (minimum) id and the copy count. */
  def exactGroups(df: DataFrame, contentCol: String, idCol: String): DataFrame =
    df.groupBy(md5(col(contentCol)).as("content_hash"))
      .agg(min(idCol).as("keep_id"), count(lit(1)).as("copies"))

  /** Rows surviving exact dedup (the min-id representative per hash). */
  def dropExactDuplicates(df: DataFrame, contentCol: String, idCol: String): DataFrame =
    df.join(exactGroups(df, contentCol, idCol)
        .select(col("keep_id").as(idCol)), Seq(idCol), "left_semi")

  /** MinHash signatures over word n-gram shingles: one row per id with
    * bigint columns s0..s{k-1}. One md5 per shingle supplies two 48-bit
    * halves h1/h2; slot j minimizes h1 + j*h2 (the Kirsch-Mitzenmacher
    * construction) — k independent-enough hash families for the cost of
    * one digest, which at corpus scale is the difference between one
    * and k hashing passes. */
  def minHashSignatures(df: DataFrame, textCol: String, idCol: String,
      k: Int, shingleSize: Int = 3): DataFrame = {
    val h1 = conv(substring(md5(col("__shingle")), 1, 12), 16, 10).cast("long")
    val h2 = conv(substring(md5(col("__shingle")), 13, 12), 16, 10).cast("long")
    val sigCols = (0 until k).map(j => min(h1 + lit(j) * h2).as(s"s$j"))
    df.select(col(idCol), col(textCol),
        TextAnalysis.tokens(col(textCol)).as("__tk"))
      .select(col(idCol),
        explode(array_distinct(
          TextAnalysis.shingles("__tk", textCol, shingleSize))).as("__shingle"))
      .groupBy(idCol)
      .agg(sigCols.head, sigCols.tail: _*)
  }

  /** Index-salted LSH band keys from a signature frame: (id, band). */
  def lshBands(signatures: DataFrame, idCol: String, k: Int, bandWidth: Int): DataFrame = {
    require(k % bandWidth == 0, s"k=$k not divisible by bandWidth=$bandWidth")
    val bands = (0 until k / bandWidth).map { b =>
      val slots = (0 until bandWidth).map(i => col(s"s${b * bandWidth + i}"))
      md5(concat_ws(",", lit(b.toString) +: slots: _*))
    }
    signatures.select(col(idCol), explode(array(bands: _*)).as("band"))
  }

  /** Band self-join with both sides shaped for exchange reuse: identical
    * alias-only projections canonicalize to the same plan, and the
    * shuffle-hash hint keeps Catalyst from broadcasting one side (which
    * would both recompute the banding pipeline AND be the wrong plan at
    * corpus scale — the band frame is O(corpus)). AQE then computes the
    * banding shuffle once and wires a ReusedExchange for the other side
    * (pinned by QueryPlanSpec).
    */
  private def bandSelfJoin(banded: DataFrame, idCol: String,
      pairCondition: (Column, Column) => Column): DataFrame = {
    val a = banded.select(col(idCol).as("a_id"), col("band").as("a_band"))
    val b = banded.select(col(idCol).as("b_id"), col("band").as("b_band"))
    a.hint("shuffle_hash")
      .join(b.hint("shuffle_hash"),
        col("a_band") === col("b_band") && pairCondition(col("a_id"), col("b_id")))
  }

  /** Near-duplicate candidate pairs (a < b) sharing at least one band. */
  def lshCandidatePairs(df: DataFrame, textCol: String, idCol: String,
      k: Int = 6, bandWidth: Int = 2, shingleSize: Int = 3): DataFrame = {
    val banded = lshBands(minHashSignatures(df, textCol, idCol, k, shingleSize),
      idCol, k, bandWidth)
    bandSelfJoin(banded, idCol, _ < _)
      .select(col("a_id"), col("b_id"))
      .distinct()
  }

  /** Per-document count of distinct LSH candidates — the linear-output
    * form for the degenerate everything-similar corpus. */
  def lshCandidateCounts(df: DataFrame, textCol: String, idCol: String,
      k: Int = 6, bandWidth: Int = 2, shingleSize: Int = 3): DataFrame = {
    val banded = lshBands(minHashSignatures(df, textCol, idCol, k, shingleSize),
      idCol, k, bandWidth)
    bandSelfJoin(banded, idCol, _ =!= _)
      .select(col("a_id").as("doc_id"), col("b_id"))
      .distinct()
      .groupBy("doc_id").agg(count(lit(1)).as("n_candidates"))
  }

  /** Document-LEVEL cross-corpus contamination: for every corpus doc
    * sharing at least one MinHash-LSH band with ANY benchmark doc, the
    * count of distinct matching benchmark docs. The document-similarity
    * complement of the n-gram-overlap decontamination (d20/d23): grams
    * catch verbatim passage leaks, band collisions catch whole-document
    * near-copies whose shared grams are individually unremarkable.
    *
    * Scale shape: the benchmark side is small by definition (eval sets,
    * not corpora), so its banded frame broadcasts — the corpus banding
    * pipeline stays narrow (shingle explode → codegen'd md5 slots →
    * per-doc min-agg, map-side combined) and the only corpus-keyed
    * exchange is the final per-doc count. */
  def lshContamination(corpus: DataFrame, bench: DataFrame, textCol: String,
      idCol: String, k: Int = 6, bandWidth: Int = 2,
      shingleSize: Int = 3): DataFrame = {
    val cb = lshBands(
      minHashSignatures(corpus, textCol, idCol, k, shingleSize),
      idCol, k, bandWidth)
    val bb = lshBands(
      minHashSignatures(bench, textCol, idCol, k, shingleSize),
      idCol, k, bandWidth)
      .select(col(idCol).as("bench_id"), col("band"))
    cb.join(broadcast(bb), "band")
      .select(col(idCol), col("bench_id")).distinct()
      .groupBy(idCol).agg(count(lit(1)).as("n_bench_matches"))
  }

  /** Near-duplicate group resolution: connected components over the
    * candidate-pair graph, labeling every document with the minimum
    * doc id of its component — the keep/drop decision a corpus curation
    * run executes after LSH ("keep the representative, drop the rest").
    *
    * Iterative min-label propagation: each round combines one
    * neighbor-min step (label(x) := min over neighbors' labels) with one
    * pointer-jump step (label(x) := label(label(x))), so convergence is
    * O(log diameter) rounds rather than O(diameter) — a 1000-link chain
    * resolves in ~10 rounds. Each round is two key shuffles over the
    * label table (two bigints per doc — tiny next to the corpus), the
    * round result is `localCheckpoint`ed so the plan stays flat and the
    * per-round cost is constant, and iteration stops at the first round
    * that changes no label (`maxIter` caps pathological inputs).
    *
    * Output: one row per document that has at least one candidate pair —
    * (doc_id, group_id = min id of its component, group_size). Documents
    * with no candidates are trivially their own singleton group and are
    * not emitted.
    */
  def nearDupGroups(pairs: DataFrame, aCol: String = "a_id",
      bCol: String = "b_id", maxIter: Int = 20): DataFrame = {
    // cache the PAIRS, not just the edge union: both symmetric branches
    // read the cached pair set, so the (expensive) candidate pipeline
    // feeding this operator runs once, not twice. A frame the CALLER
    // already persisted is used as-is (and left persisted — unpersisting
    // it here would clobber the caller's cache).
    val callerCached =
      pairs.storageLevel != org.apache.spark.storage.StorageLevel.NONE
    val p = if (callerCached) pairs else pairs.persist()
    // the edge table (pair-grain — the BIG side at corpus scale) is
    // repartitioned by the join key ONCE and cached with that layout:
    // the cached relation claims hashpartitioning(dst), so every
    // round's neighbor-min join re-shuffles only the LABEL side
    // (doc-grain) instead of re-exchanging the edge table per round
    // (guide §2.4 — establish the partitioning once; r22)
    val edges = p.select(col(aCol).as("src"), col(bCol).as("dst"))
      .union(p.select(col(bCol).as("src"), col(aCol).as("dst")))
      .repartition(col("dst"))
      .persist()
    val lblType = pairs.schema(aCol).dataType
    var labels = edges.groupBy("src").agg(min("dst").as("lbl"))
      .select(col("src").as("id"), least(col("src"), col("lbl")).as("lbl"))
      .localCheckpoint(true)
    var converged = false
    var round = 0
    while (!converged && round < maxIter) {
      // alias every union-branch column: the right branch's lineage
      // contains `labels` itself, and a union whose children share
      // expression ids trips Catalyst's constraint rewriting. The `old`
      // column rides along (exactly one non-null per id, so min() picks
      // it) to make the convergence check a narrow scan of the round's
      // checkpoint instead of a join against the previous round.
      val viaNeighbors = edges
        .join(labels, edges("dst") === labels("id"))
        .select(edges("src").as("id"), col("lbl").as("lbl"),
          lit(null).cast(lblType).as("old"))
      val folded = labels
        .select(col("id").as("id"), col("lbl").as("lbl"), col("lbl").as("old"))
        .union(viaNeighbors)
        .groupBy("id").agg(min("lbl").as("lbl"), min("old").as("old"))
      // one checkpointed job per round: the jump self-join's two sides
      // are identical aggregate subtrees, so AQE wires a ReusedExchange
      // for the second (shuffle-hash hints keep a broadcast from
      // replacing — and thereby recomputing — the shared subtree)
      val jumped = folded.alias("a").hint("shuffle_hash")
        .join(folded.alias("b").hint("shuffle_hash"),
          col("a.lbl") === col("b.id"), "left")
        .select(col("a.id").as("id"),
          least(col("a.lbl"), coalesce(col("b.lbl"), col("a.lbl"))).as("lbl"),
          col("a.old").as("old"))
        .localCheckpoint(true)
      converged = jumped.filter(col("lbl") =!= col("old")).isEmpty
      labels = jumped.drop("old")
      round += 1
    }
    if (!callerCached) p.unpersist(blocking = false)
    edges.unpersist(blocking = false)
    // an unconverged result silently under-merges duplicate groups —
    // refuse it. maxIter=20 covers component diameters around a million
    // (rounds grow with log2(diameter)); hitting the cap means the pair
    // graph is pathological, which the caller must decide how to handle.
    if (!converged) throw new IllegalStateException(
      s"nearDupGroups did not converge within $maxIter rounds — " +
        "the candidate-pair graph has an extreme-diameter component; " +
        "raise maxIter or tighten the LSH banding")
    val sizes = labels.groupBy("lbl").agg(count(lit(1)).as("group_size"))
    labels.join(sizes, "lbl")
      .select(col("id").as("doc_id"), col("lbl").as("group_id"), col("group_size"))
  }

  /** Quality-aware near-duplicate resolution: within each
    * [[nearDupGroups]] component, KEEP the member with the best
    * `scoreCol` (ties to the lowest id — a total order) and mark the
    * rest for dropping — the published "keep the longest / highest
    * quality copy" policy, where min-id retention ([[cleanCorpus]])
    * throws away whichever quality signal the pipeline already
    * computed. Output: every clustered document as
    * (id, group_id, scoreCol, keep).
    *
    * Shape: the groups frame is duplicated-docs-only; one id-keyed
    * join pulls the score (narrow two-column corpus projection), one
    * group-keyed window ranks members — group sizes are near-dup
    * cluster sizes, so the window never sees a corpus-sized
    * partition. */
  def resolveNearDupsByQuality(docs: DataFrame, groups: DataFrame,
      idCol: String, scoreCol: String): DataFrame = {
    val w = Window.partitionBy("group_id")
      .orderBy(col(scoreCol).desc, col(idCol).asc)
    groups.select(col("doc_id").as(idCol), col("group_id"))
      .join(docs.select(col(idCol), col(scoreCol)), idCol)
      .withColumn("__rn", row_number().over(w))
      .select(col(idCol), col("group_id"), col(scoreCol),
        (col("__rn") === 1).as("keep"))
  }

  /** Exact duplicated-SPAN measurement — the substring-level dedup
    * family (the published "Deduplicating Training Data Makes Language
    * Models Better" ExactSubstr line): find, per document, the maximal
    * runs of tokens covered by a `spanTokens`-token window whose exact
    * content occurs at least twice ANYWHERE in the corpus (including a
    * second time in the same document). d14/d23 detect shared grams;
    * this merges them back into contiguous spans — the unit a curation
    * run actually strips or thresholds on.
    *
    * The reference method is a monolithic suffix array; the Spark-first
    * re-expression is a sorted n-gram index: overlapping `spanTokens`-
    * grams with their token position, a corpus-wide occurrence count
    * per gram hash, and a per-document merge of adjacent/overlapping
    * duplicated windows (two grams at positions p1 < p2 cover a common
    * or contiguous token range iff p2 <= p1 + spanTokens). A span of L
    * duplicated tokens appears as L - spanTokens + 1 consecutive
    * duplicated windows, so the merge recovers the full span length
    * the suffix array would report, without ever materializing
    * suffixes.
    *
    * Scale shape: three corpus-keyed exchanges and corpus TEXT rides in
    * none of them — occurrence rows are (id, pos, 32-hex gram hash).
    * (1) the gram-count aggregate (map-side combined, so the exchange
    * carries one row per distinct gram per task); (2) the occurrence
    * re-key by gram hash for the count join (AQE's skew-join splitting
    * applies — a Window-based count would be one exchange fewer but
    * buffers a pathologically common gram's entire partition in one
    * task, the d13/d14 lesson is to prefer the join); (3) the per-doc
    * position window, whose hash(id) partitioning then satisfies BOTH
    * downstream groupBys (span merge, per-doc stats) with no further
    * exchange. Output: one row per merged span — (id, span_start,
    * span_end, span_tokens), token positions 0-based inclusive.
    * Documents shorter than `spanTokens` emit nothing (a whole-document
    * duplicate at that length is [[exactGroups]]'s job). */
  /** Positioned window-occurrence index: one row per `spanTokens`-token
    * window — (id, __pos 0-based token position, __gh md5 of the window
    * text). The narrow upstream both span operators share. */
  private def spanWindowOccurrences(df: DataFrame, textCol: String,
      idCol: String, spanTokens: Int): DataFrame =
    df.select(col(idCol), col(textCol),
        TextAnalysis.tokens(col(textCol)).as("__tk"))
      .filter(size(col("__tk")) >= spanTokens)
      .select(col(idCol),
        posexplode(TextAnalysis.shingles("__tk", textCol, spanTokens)))
      .select(col(idCol), col("pos").as("__pos"), md5(col("col")).as("__gh"))

  /** Merge a (id, __pos) frame of duplicated window positions into
    * maximal covered-token spans: two windows at p1 < p2 cover a common
    * or contiguous range iff p2 <= p1 + spanTokens. One hash(id)
    * exchange (the window), which the span groupBy then reuses. */
  private def mergeSpanPositions(positions: DataFrame, idCol: String,
      spanTokens: Int): DataFrame = {
    val wOrd = Window.partitionBy(idCol).orderBy("__pos")
    val wRun = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    positions
      .withColumn("__new",
        when(col("__pos") > lag("__pos", 1).over(wOrd) + spanTokens, 1)
          .otherwise(0))
      .withColumn("__span", sum("__new").over(wRun))
      .groupBy(col(idCol), col("__span"))
      .agg(min("__pos").as("span_start"),
        (max("__pos") + lit(spanTokens - 1)).as("span_end"))
      .withColumn("span_tokens", col("span_end") - col("span_start") + 1)
      .drop("__span")
  }

  def duplicatedSpans(df: DataFrame, textCol: String, idCol: String,
      spanTokens: Int = 8): DataFrame = {
    require(spanTokens >= 1, s"spanTokens must be >= 1, got $spanTokens")
    val occ = spanWindowOccurrences(df, textCol, idCol, spanTokens)
    val dupGrams = occ.groupBy("__gh").agg(count(lit(1)).as("__gc"))
      .filter(col("__gc") >= 2).select("__gh")
    mergeSpanPositions(occ.join(dupGrams, "__gh").drop("__gh"),
      idCol, spanTokens)
  }

  /** The REMOVE step of the ExactSubstr method: strip every token
    * covered by a duplicated window that is not its window-content's
    * CANONICAL occurrence, and reassemble the cleaned text — "keep one
    * copy of each duplicated substring, drop the rest".
    *
    * The canonical occurrence of a duplicated window is its minimum
    * (id, position) site, totally ordered via a zero-padded decimal
    * "id:pos" string so the min is engine-neutral (no struct-ordering
    * or integer-packing hazard; ids must be non-negative — a negative
    * id would sort before its padding). Tokens covered only by
    * canonical windows survive, so the first site of a duplicated run
    * keeps its text; a canonical window OVERLAPPED by a redundant one
    * can still lose the overlap's tokens — the guarantee is that
    * duplicated content is removed and its first site retained when
    * sites don't interleave, which is the published method's behavior
    * too, not that every canonical site survives verbatim.
    *
    * Output: only documents that lost tokens — (id, n_removed,
    * clean_text). A document that is entirely duplicated content
    * (a whole near-copy) comes back with empty clean_text; dropping
    * or keeping such husks is the caller's policy. Scale shape: the
    * same three corpus-keyed text-free exchanges as
    * [[duplicatedSpans]] plus one id-keyed join of the (small,
    * affected-docs-only) span list back onto the corpus for the
    * token filter — the only exchange that carries text, and it
    * carries it once. */
  def stripDuplicatedSpans(df: DataFrame, textCol: String, idCol: String,
      spanTokens: Int = 8): DataFrame = {
    require(spanTokens >= 1, s"spanTokens must be >= 1, got $spanTokens")
    // the key contract is enforced, not just documented: lpad TRUNCATES
    // anything past 20 chars, so a string id (UUIDs!) would silently
    // collide on its prefix and retain duplicated content; a negative
    // id ('-' < '0') would mis-order the canonical choice. Integral ids
    // always fit (long max = 19 digits) and negatives fail the job
    // loudly instead of corrupting it.
    locally {
      import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
      val idType = df.schema(idCol).dataType
      require(Set[org.apache.spark.sql.types.DataType](
          ByteType, ShortType, IntegerType, LongType)(idType),
        s"stripDuplicatedSpans requires an integral id column (the " +
          s"canonical-site key zero-pads its decimal rendering; a string " +
          s"id would be silently truncated at 20 chars) — got $idType for $idCol")
    }
    val guardedId = when(col(idCol) < 0,
      raise_error(concat(lit(s"stripDuplicatedSpans: negative $idCol "),
        col(idCol).cast("string"),
        lit(" breaks canonical-site ordering")))).otherwise(col(idCol))
    val occ = spanWindowOccurrences(df, textCol, idCol, spanTokens)
      .withColumn("__k", concat(
        lpad(guardedId.cast("string"), 20, "0"), lit(":"),
        lpad(col("__pos").cast("string"), 10, "0")))
    val gramAgg = occ.groupBy("__gh")
      .agg(count(lit(1)).as("__gc"), min("__k").as("__canon"))
      .filter(col("__gc") >= 2)
    val redundant = occ.join(gramAgg, "__gh")
      .filter(col("__k") =!= col("__canon"))
      .select(col(idCol), col("__pos"))
    val spansPerDoc = mergeSpanPositions(redundant, idCol, spanTokens)
      .groupBy(idCol)
      .agg(collect_list(struct(col("span_start"), col("span_end")))
        .as("__spans"))
    df.join(spansPerDoc, idCol)
      .withColumn("__tk", TextAnalysis.tokens(col(textCol)))
      .withColumn("__kept", filter(col("__tk"), (t, i) =>
        !exists(col("__spans"), s =>
          i >= s.getField("span_start") && i <= s.getField("span_end"))))
      .select(col(idCol),
        (size(col("__tk")) - size(col("__kept"))).as("n_removed"),
        concat_ws(" ", col("__kept")).as("clean_text"))
  }

  /** Decontamination SURGERY: strip every token covered by a
    * `spanTokens`-token window that appears verbatim in the BENCHMARK
    * set, and reassemble the cleaned text — the removal counterpart of
    * [[TextAnalysis.decontaminate]] (which only flags documents).
    * Published pipelines use both policies; surgery keeps the rest of
    * an otherwise-good document instead of dropping it for one quoted
    * eval passage. No canonical-copy retention here: benchmark text
    * has no business surviving anywhere in training data.
    *
    * Scale shape: the benchmark gram index is eval-set-sized and
    * BROADCAST (the [[TextAnalysis.decontaminate]] contract); corpus
    * windows carry (id, pos, 32-hex) only; text joins back once, for
    * affected documents only. Output: affected docs only —
    * (id, n_removed, clean_text). */
  def stripContaminatedSpans(corpus: DataFrame, bench: DataFrame,
      textCol: String, idCol: String, spanTokens: Int = 8): DataFrame = {
    require(spanTokens >= 1, s"spanTokens must be >= 1, got $spanTokens")
    val benchGrams = bench
      .select(col(textCol), TextAnalysis.tokens(col(textCol)).as("__tk"))
      .filter(size(col("__tk")) >= spanTokens)
      .select(explode(array_distinct(
        TextAnalysis.shingles("__tk", textCol, spanTokens))).as("__g"))
      .select(md5(col("__g")).as("__gh")).distinct()
    val hits = spanWindowOccurrences(corpus, textCol, idCol, spanTokens)
      .join(broadcast(benchGrams), "__gh")
      .select(col(idCol), col("__pos"))
    val spansPerDoc = mergeSpanPositions(hits, idCol, spanTokens)
      .groupBy(idCol)
      .agg(collect_list(struct(col("span_start"), col("span_end")))
        .as("__spans"))
    corpus.join(spansPerDoc, idCol)
      .withColumn("__tk", TextAnalysis.tokens(col(textCol)))
      .withColumn("__kept", filter(col("__tk"), (t, i) =>
        !exists(col("__spans"), s =>
          i >= s.getField("span_start") && i <= s.getField("span_end"))))
      .select(col(idCol),
        (size(col("__tk")) - size(col("__kept"))).as("n_removed"),
        concat_ws(" ", col("__kept")).as("clean_text"))
  }

  /** C4/RefinedWeb-style corpus-wide LINE deduplication: keep one copy
    * of every line occurring at least `minCount` times across the
    * corpus (the canonical copy = minimum zero-padded "id:line-index"
    * site, [[stripDuplicatedSpans]]' engine-neutral device), strip the
    * rest, and reassemble each affected document's text. Web boilerplate
    * — nav menus, cookie banners, footers — repeats verbatim at line
    * grain, which is why the published web-corpus recipes run this pass
    * before any fuzzy dedup.
    *
    * Output: affected documents only — (id, n_removed_lines,
    * clean_text); a document whose every line is redundant comes back
    * with empty clean_text (the caller's drop-or-keep policy, as with
    * span strip). Scale shape: line hashes, never line text, in the
    * two corpus-keyed exchanges (line-hash aggregate + per-doc drop
    * list); text is joined back ONCE, for affected docs only. */
  def stripDuplicatedLines(df: DataFrame, textCol: String, idCol: String,
      minCount: Int = 2): DataFrame = {
    require(minCount >= 2, s"minCount must be >= 2, got $minCount")
    locally {
      import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
      val idType = df.schema(idCol).dataType
      require(Set[org.apache.spark.sql.types.DataType](
          ByteType, ShortType, IntegerType, LongType)(idType),
        s"stripDuplicatedLines requires an integral id column (the " +
          s"canonical-site key zero-pads its decimal rendering; a string " +
          s"id would be silently truncated at 20 chars) — got $idType for $idCol")
    }
    val guardedId = when(col(idCol) < 0,
      raise_error(concat(lit(s"stripDuplicatedLines: negative $idCol "),
        col(idCol).cast("string"),
        lit(" breaks canonical-site ordering")))).otherwise(col(idCol))
    val occ = df
      .select(col(idCol), posexplode(split(col(textCol), "\n")))
      .select(col(idCol), col("pos").as("__pos"), md5(col("col")).as("__lh"))
      .withColumn("__k", concat(
        lpad(guardedId.cast("string"), 20, "0"), lit(":"),
        lpad(col("__pos").cast("string"), 10, "0")))
    val lineAgg = occ.groupBy("__lh")
      .agg(count(lit(1)).as("__c"), min("__k").as("__canon"))
      .filter(col("__c") >= minCount)
    val dropList = occ.join(lineAgg, "__lh")
      .filter(col("__k") =!= col("__canon"))
      .groupBy(idCol).agg(collect_list(col("__pos")).as("__drop"))
    df.join(dropList, idCol)
      .withColumn("__lns", split(col(textCol), "\n"))
      .withColumn("__kept", filter(col("__lns"), (_, i) =>
        !array_contains(col("__drop"), i)))
      .select(col(idCol),
        (size(col("__lns")) - size(col("__kept"))).as("n_removed_lines"),
        concat_ws("\n", col("__kept")).as("clean_text"))
  }

  /** Distinct md5 line hashes of a corpus slice — the accumulating
    * index [[stripDuplicatedLinesVsIndex]] dedups against. One narrow
    * explode + a 32-byte-key distinct; nothing else shuffles. */
  def lineHashes(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(split(col(textCol), "\n")).as("__ln"))
      .select(md5(col("__ln")).as("line_hash")).distinct()

  /** INCREMENTAL [[stripDuplicatedLines]]: strip a NEW batch's
    * duplicated lines against the lines already seen (`index`, a
    * `line_hash` frame from [[lineHashes]] accumulated over prior
    * batches) plus the batch itself. For batches arriving in
    * ascending-id order this equals the one-shot pass over the union
    * corpus EXACTLY: a kept occurrence is precisely the globally-first
    * occurrence of its line (never stripped by the one-shot) or a
    * line seen exactly once globally (under the one-shot's threshold
    * of 2 there is nothing to strip). minCount is FIXED at 2 — the
    * C4 convention, and the only prefix-decidable threshold: at 3+,
    * whether the first occurrence survives depends on batches that
    * have not arrived yet.
    *
    * Scale shape: the index join is an equi-join on 32-byte line
    * hashes — at production scale persist the index bucketed on
    * line_hash (the [[buildBandIndex]] device) so the probe side
    * co-locates; text rides only the final reassembly join, exactly
    * like the one-shot. Output: the AFFECTED batch docs
    * (n_removed_lines, clean_text), same contract as
    * [[stripDuplicatedLines]]. */
  def stripDuplicatedLinesVsIndex(df: DataFrame, textCol: String,
      idCol: String, index: DataFrame): DataFrame = {
    locally {
      import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
      val idType = df.schema(idCol).dataType
      require(Set[org.apache.spark.sql.types.DataType](
          ByteType, ShortType, IntegerType, LongType)(idType),
        s"stripDuplicatedLinesVsIndex requires an integral id column — " +
          s"got $idType for $idCol")
      require(index.columns.contains("line_hash"),
        "index must be a lineHashes frame (line_hash column)")
    }
    val guardedId = when(col(idCol) < 0,
      raise_error(concat(lit(s"stripDuplicatedLinesVsIndex: negative $idCol "),
        col(idCol).cast("string"),
        lit(" breaks canonical-site ordering")))).otherwise(col(idCol))
    val occ = df
      .select(col(idCol), posexplode(split(col(textCol), "\n")))
      .select(col(idCol), col("pos").as("__pos"), md5(col("col")).as("__lh"))
      .withColumn("__k", concat(
        lpad(guardedId.cast("string"), 20, "0"), lit(":"),
        lpad(col("__pos").cast("string"), 10, "0")))
    val seen = index.select(col("line_hash").as("__lh")).distinct()
      .withColumn("__seen", lit(1))
    val batchAgg = occ.groupBy("__lh")
      .agg(count(lit(1)).as("__c"), min("__k").as("__canon"))
    // drop an occurrence when its line was seen in ANY prior batch
    // (the index holds the kept canonical), or when it repeats within
    // this batch and is not the batch-canonical site
    val dropList = occ
      .join(seen, Seq("__lh"), "left")
      .join(batchAgg, "__lh")
      .filter(col("__seen").isNotNull ||
        (col("__c") >= 2 && col("__k") =!= col("__canon")))
      .groupBy(idCol).agg(collect_list(col("__pos")).as("__drop"))
    df.join(dropList, idCol)
      .withColumn("__lns", split(col(textCol), "\n"))
      .withColumn("__kept", filter(col("__lns"), (_, i) =>
        !array_contains(col("__drop"), i)))
      .select(col(idCol),
        (size(col("__lns")) - size(col("__kept"))).as("n_removed_lines"),
        concat_ws("\n", col("__kept")).as("clean_text"))
  }

  /** Per-document duplicated-span statistics over [[duplicatedSpans]]:
    * span count, total duplicated tokens, and the longest duplicated
    * span — the numbers a curation run thresholds on ("drop documents
    * whose longest duplicated span exceeds N tokens"). Only documents
    * with at least one duplicated span are emitted. Inherits the span
    * frame's hash(id) partitioning, so the rollup adds no exchange. */
  def duplicatedSpanStats(df: DataFrame, textCol: String, idCol: String,
      spanTokens: Int = 8): DataFrame =
    duplicatedSpans(df, textCol, idCol, spanTokens)
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_dup_spans"),
        sum("span_tokens").as("dup_span_tokens"),
        max("span_tokens").as("longest_dup_span"))

  /** SimHash (nBits <= 24): per bit, majority vote of token-hash bits
    * over the distinct token set. */
  def simHash(df: DataFrame, textCol: String, idCol: String, nBits: Int = 16): DataFrame = {
    val hexDigits = (nBits + 3) / 4
    val hashes = transform(TextAnalysis.tokenSet(col(textCol)),
      t => conv(substring(md5(t), 1, hexDigits), 16, 10).cast("int"))
    val n = size(col("__th"))
    val bits = (0 until nBits).map { b =>
      val ones = size(filter(col("__th"), h => shiftright(h, b).bitwiseAND(1) === 1))
      when(ones * 2 > n, 1 << b).otherwise(0)
    }
    df.select(col(idCol), hashes.as("__th"))
      .select(col(idCol), bits.reduce(_ + _).as("simhash"))
  }

  // ---- Persisted MinHash band index: incremental new-batch-vs-corpus
  // dedup, the production ingest shape. No published pipeline re-mines
  // 100 TB per daily batch: the corpus's LSH bands persist ONCE as a
  // band-bucketed catalog table, and each new batch is banded, probed
  // against the EXISTING index for near-dup/contamination verdicts,
  // and appended idempotently (the buildIvfIndex/appendToIvfIndex
  // device, with the band hash as the bucket key).

  /** Persist `df`'s MinHash-LSH band frame (id, band) as a catalog
    * table bucketed by band — probes become scans of the batch's band
    * buckets with no shuffle on the index side, at any corpus size. */
  def buildBandIndex(df: DataFrame, textCol: String, idCol: String,
      table: String, k: Int = 6, bandWidth: Int = 2, shingleSize: Int = 3,
      buckets: Int = 32): Unit = {
    val spark = df.sparkSession
    Similarity.dropTableAndLocation(spark, table)
    // a rebuilt index starts with no pending deletes: a stale tombstone
    // side table from a previous build would silently suppress live
    // docs from every probe
    Similarity.dropTableAndLocation(spark, tombstoneTable(table))
    // task-aligned to buckets (same hash family): one file per bucket
    // instead of one per (task x bucket) — see RawVault.writeTable
    lshBands(minHashSignatures(df, textCol, idCol, k, shingleSize),
        idCol, k, bandWidth)
      .repartition(buckets, col("band")).write
      .bucketBy(buckets, "band")
      .mode("overwrite")
      .saveAsTable(table)
    spark.catalog.refreshTable(table)
  }

  /** Near-dup verdicts for a NEW batch against a persisted
    * [[buildBandIndex]] table: distinct (`idCol`, index_id) pairs
    * sharing at least one band, self-pairs excluded (a replayed doc
    * already in the index is not its own near-dup).
    *
    * Scale shape: the batch's bands become planning-time literals
    * (bounded by `maxBatchBands`, loud fail past it — micro-batches
    * are small by contract), so the index scan BUCKET-PRUNES to the
    * batch's band buckets with the band filter pushed to parquet; the
    * batch side broadcasts into the join. The index is never shuffled
    * and never scanned beyond the probed buckets. The bucketed scan
    * must survive planning (DisableUnnecessaryBucketedScan would
    * discard the pruning — nothing above a broadcast join needs the
    * distribution), so the plan is compiled inside the conf window,
    * ASSERTED to bucket-prune (a mis-built index fails loudly here,
    * not silently as a full scan at corpus size — the catalog
    * bucketSpec is additionally validated up front, so even an empty
    * batch refuses a mis-built table), and MATERIALIZED by an eager
    * checkpoint: the returned frame and anything derived from it
    * (.filter, joins) re-plan from the checkpointed verdict rows —
    * batch-proportional by construction — never from the index, so
    * the derived-frame full-scan fallback is structurally impossible.
    *
    * Checkpoint durability: the default is `localCheckpoint` —
    * verdict blocks live on executor storage only, so an executor
    * loss (or dynamic-allocation decommission) makes the returned
    * frame unrecoverable mid-pipeline; the lineage it replaced cannot
    * recompute. Fine for the single-writer ingest loop this operator
    * serves (a failed probe re-probes the batch), but long-lived
    * production sessions can pass `reliableCheckpoint = true` to
    * write the verdicts through the configured `sc.setCheckpointDir`
    * instead (verdicts are batch-proportional, so the extra write is
    * micro-batch-sized). */
  def probeBandIndex(spark: org.apache.spark.sql.SparkSession, table: String,
      batch: DataFrame, textCol: String, idCol: String, k: Int = 6,
      bandWidth: Int = 2, shingleSize: Int = 3,
      maxBatchBands: Int = 1 << 20,
      reliableCheckpoint: Boolean = false): DataFrame =
      DriverBounded.labeled(spark, s"probeBandIndex:$table") {
    requireBandBucketedTable(spark, table, "probeBandIndex")
    val (banded, release) = freshBatchBands(batch, textCol, idCol, k,
      bandWidth, shingleSize, maxBatchBands, "probeBandIndex")
    try {
      val bands = banded._2.map(_.get(1)).distinct.toSeq
      probeBanded(spark, table, banded._1, bands, idCol,
        reliableCheckpoint)
    } finally release()
  }

  /** [[probeBandIndex]]'s core over an ALREADY-banded (persisted)
    * batch frame and its collected band literals — shared with
    * [[resolveAtIngest]], which bands its delivery once and reuses
    * the rows for the winner append. Returns the checkpointed
    * (idCol, index_id) verdicts. */
  private def probeBanded(spark: org.apache.spark.sql.SparkSession,
      table: String, bandedDf: DataFrame, bands: Seq[Any], idCol: String,
      reliableCheckpoint: Boolean): DataFrame =
    if (bands.isEmpty)  // empty batch: nothing to probe (an empty
      // isin() folds the scan away, so there is no plan to pin; the
      // catalog check above still rejected a mis-built table)
      bandedDf.select(col(idCol), col(idCol).as("index_id")).limit(0)
        .localCheckpoint(true)
    else {
      // tombstoned docs (superseded by resolve-at-ingest, or taken
      // down via deleteFromIndex) are dead to probes IMMEDIATELY —
      // excluded above the pruned scan, the vector families'
      // contract; compactBandIndex reclaims them physically
      val pruned = Similarity.liveRows(spark, table,
        spark.table(table).filter(col("band").isin(bands: _*))
          .select(col(idCol).as("index_id"), col("band")),
        "index_id")
      val out = pruned
        .join(broadcast(bandedDf.select(col(idCol), col("band"))),
          Seq("band"))
        .filter(col("index_id") =!= col(idCol))
        .select(col(idCol), col("index_id"))
        .distinct()
      compileAndPinBucketedScan(spark, out, table, reliableCheckpoint)
    }

  /** Idempotently append a new batch's bands to a [[buildBandIndex]]
    * table: at-least-once delivery, exactly-once table effect (the
    * vault loaders' contract). The idempotence check is bucket-pruned
    * point lookups, not a corpus join — the batch's bands and ids
    * re-enter the plan as literals, so a replayed batch finds its own
    * (deterministically identical) bands in the probed buckets and
    * appends nothing. */
  def appendToBandIndex(batch: DataFrame, table: String, textCol: String,
      idCol: String, k: Int = 6, bandWidth: Int = 2, shingleSize: Int = 3,
      buckets: Int = 32, maxBatchBands: Int = 1 << 20): Unit = {
    val spark = batch.sparkSession
    DriverBounded.labeled(spark, s"appendToBandIndex:$table") {
    // a tombstoned doc id cannot re-enter until compacted: its OLD
    // bands are still physically present, so the idempotence anti-join
    // would absorb the same-band rows and the next compact would strip
    // BOTH generations — the vector families' re-append contract.
    // Resolve-at-ingest never trips this (winners are batch docs; a
    // replayed ex-winner loses to the doc that superseded it).
    Similarity.requireNotTombstoned(spark, table, batch, idCol,
      "appendToBandIndex")
    val (banded, release) = freshBatchBands(batch, textCol, idCol, k,
      bandWidth, shingleSize, maxBatchBands, "appendToBandIndex")
    try {
      val bandedDf = banded._1
      val ids = banded._2.map(_.get(0)).distinct.toSeq
      val bands = banded._2.map(_.get(1)).distinct.toSeq
      // same pinning as the probe: the idempotence lookup must
      // bucket-prune (asserted) and is checkpointed so the anti-join
      // derives from batch-proportional rows, not from the table
      // being appended to
      val existing =
        if (bands.isEmpty) bandedDf.select(col(idCol)).limit(0)
        else compileAndPinBucketedScan(spark,
          spark.table(table)
            .filter(col("band").isin(bands: _*) && col(idCol).isin(ids: _*))
            .select(col(idCol)),
          table, reliable = false, "appendToBandIndex")
      val fresh = bandedDf.join(existing, Seq(idCol), "left_anti")
        .select(col(idCol), col("band"))
      withAutoBucketedScanOff(spark) {
        fresh.repartition(buckets, col("band")).write
          .bucketBy(buckets, "band")
          .mode("append")
          .saveAsTable(table)
      }
    } finally release()
    spark.catalog.refreshTable(table)
    }
  }

  private val bandConfLock = new Object

  /** Run `body` with the session-global auto-bucketed-scan heuristic
    * OFF, under the ONE process lock every conf window in the engine
    * shares (band probes/appends, keyed probes/appends, compactions,
    * and the IVF index's append — Similarity routes through here).
    * The flip is session-global, so two concurrent windows on
    * DIFFERENT locks could interleave save/flip/restore and leave the
    * heuristic permanently flipped (or spuriously fail a probe's
    * pruning assert); one shared lock serializes all of them.
    * Reentrant (JVM monitor), so a window already holding
    * [[bandConfLock]] — the compaction swap — can nest it. */
  private[graft] def withAutoBucketedScanOff[T](
      spark: org.apache.spark.sql.SparkSession)(body: => T): T =
    bandConfLock.synchronized {
      val key = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
      val old = spark.conf.get(key)
      spark.conf.set(key, "false")
      try body finally spark.conf.set(key, old)
    }

  /** Shared probe/append scaffolding: the batch banded once (persisted
    * — the collected literals must be the exact rows the joins later
    * see, cf. Similarity.freshIndexRows' non-determinism note), its
    * (id, band) rows collected under the `maxBatchBands` bound.
    * Returns ((banded, rows), release) — callers derive their id/band
    * literal sets from the rows (resolve-at-ingest additionally
    * filters them to the delivery's winners, driver-side). */
  private def freshBatchBands(batch: DataFrame, textCol: String,
      idCol: String, k: Int, bandWidth: Int, shingleSize: Int,
      maxBatchBands: Int, context: String)
      : ((DataFrame, Array[org.apache.spark.sql.Row]), () => Unit) = {
    val banded = lshBands(
      minHashSignatures(batch.dropDuplicates(Seq(idCol)), textCol, idCol,
        k, shingleSize),
      idCol, k, bandWidth).persist()
    val rows = DriverBounded.collectCapped(banded, maxBatchBands,
      s"$context: micro-batch exceeds maxBatchBands $maxBatchBands (the " +
        "batch's bands become planning-time point-lookup literals); " +
        "split the batch or raise the bound deliberately")
    ((banded, rows), () => { banded.unpersist(blocking = false); () })
  }

  /** Compile `df`'s physical plan with the auto-bucketed-scan
    * heuristic OFF so the In(band) bucket pruning survives, assert at
    * call time that the compiled plan actually bucket-prunes (the
    * ranked() precondition pattern — probing a table that is not a
    * [[buildBandIndex]] product refuses loudly instead of shipping a
    * full-index-scan probe), then materialize via an eager checkpoint
    * OUTSIDE the window: `executedPlan` is a cached lazy val on the
    * QueryExecution compiled here, and checkpoint execution only calls
    * `executedPlan.execute()` — it never re-plans — so the lock and
    * the session-global conf flip cover plan compilation alone, not
    * the probe job. Concurrent same-session queries plan with their
    * own conf, and appendToBandIndex never serializes behind probe
    * execution. */
  private[graft] def compileAndPinBucketedScan(
      spark: org.apache.spark.sql.SparkSession, df: DataFrame,
      table: String, reliable: Boolean,
      context: String = "probeBandIndex"): DataFrame = {
    withAutoBucketedScanOff(spark) {
      val executed = df.queryExecution.executedPlan.toString
      require(executed.contains("SelectedBucketsCount"),
        s"$context: the scan of $table did not bucket-prune — " +
          "the table must be bucketed by its probe key (a " +
          "buildBandIndex/buildKeyedTable product); refusing to run " +
          "a full-index-scan probe")
    }
    val out = if (reliable) df.checkpoint(true) else df.localCheckpoint(true)
    // Re-assert on the FINAL plan, post-execution: the compile-time
    // assert above holds for non-adaptive plans, but under AQE (the
    // session default) reOptimize re-runs stage-preparation rules with
    // the conf RESTORED — a Spark version that includes
    // DisableUnnecessaryBucketedScan in queryStagePreparationRules
    // would drop the just-asserted bucketed scan at execution time,
    // and the compile-time assert would have passed on a plan the
    // engine didn't run. This version doesn't (the check passes); if
    // an upgrade changes that, the probe fails loudly here instead of
    // silently full-scanning the index.
    require(df.queryExecution.executedPlan.toString
        .contains("SelectedBucketsCount"),
      s"$context: the EXECUTED plan against $table lost its " +
        "bucket pruning (AQE re-optimization re-ran " +
        "DisableUnnecessaryBucketedScan with the restored conf?) — " +
        "the probe that just ran full-scanned the index; this Spark " +
        "version's stage-preparation rules are incompatible with the " +
        "compile-inside-the-conf-window device")
    out
  }

  /** Catalog-metadata validation shared by every band-index read/
    * rewrite entry point: `table` must be bucketed by exactly `band`
    * (a [[buildBandIndex]]/[[appendToBandIndex]] product). Returns the
    * bucket count, so layout-preserving rewrites need no bucket
    * parameter. This is the metadata complement of the compiled-plan
    * `SelectedBucketsCount` assert — it also covers paths where no
    * plan exists to inspect (an empty probe batch, a pre-rewrite
    * check). */
  private[graft] def requireBandBucketedTable(
      spark: org.apache.spark.sql.SparkSession, table: String,
      context: String): Int =
    requireKeyBucketedTable(spark, table, "band", context)

  /** [[requireBandBucketedTable]] generalized to any bucket column —
    * shared with the keyed side tables ([[buildKeyedTable]]). */
  private[graft] def requireKeyBucketedTable(
      spark: org.apache.spark.sql.SparkSession, table: String,
      keyCol: String, context: String): Int = {
    restoreInterruptedSwap(spark, table)
    val ident = spark.sessionState.sqlParser.parseTableIdentifier(table)
    val spec = spark.sessionState.catalog.getTableMetadata(ident).bucketSpec
    require(spec.exists(_.bucketColumnNames == Seq(keyCol)),
      s"$context: table $table is not $keyCol-bucketed " +
        s"(bucketSpec=$spec) — not a buildBandIndex/buildKeyedTable " +
        "product; a probe against it could not bucket-prune at any scale")
    spec.get.numBuckets
  }

  /** Self-healing for a [[compactBandIndex]] swap interrupted between
    * its two renames: the live name is missing but the data survives
    * in full under `__compact_backup` — rename it back. Called by
    * every band-index entry point (via [[requireBandBucketedTable]]),
    * so the first probe/append/compact after the crash restores the
    * pre-compaction table and the compaction is simply redone. Runs
    * under the band lock: a reader entry point racing a LIVE
    * compaction's two-rename window would otherwise see the
    * moved-away live table and rename the backup back, making the
    * compactor's staging→live rename fail and orphaning the staging
    * table — the lock serializes the heal against the swap it heals
    * (the single-writer contract makes that race a caller bug, but
    * the heal must not widen the surface it exists to close). */
  private def restoreInterruptedSwap(
      spark: org.apache.spark.sql.SparkSession, table: String): Unit =
    bandConfLock.synchronized {
      val ident = spark.sessionState.sqlParser.parseTableIdentifier(table)
      val backup = ident.copy(table = ident.table + "__compact_backup")
        .unquotedString
      if (!spark.catalog.tableExists(table) &&
          spark.catalog.tableExists(backup)) {
        spark.sql(s"ALTER TABLE $backup RENAME TO ${ident.unquotedString}")
        ()
      }
    }

  /** Number of data files currently backing a band-index or keyed
    * table — the quantity [[compactBandIndex]]/[[compactKeyedTable]]
    * exist to bound. Hidden files (`_SUCCESS`, dotfiles) excluded. */
  def bandIndexFileCount(spark: org.apache.spark.sql.SparkSession,
      table: String): Int = {
    val ident = spark.sessionState.sqlParser.parseTableIdentifier(table)
    val loc = new org.apache.hadoop.fs.Path(
      spark.sessionState.catalog.getTableMetadata(ident).location)
    val fs = loc.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(loc)) 0
    else fs.listStatus(loc).count { st =>
      val n = st.getPath.getName
      st.isFile && !n.startsWith("_") && !n.startsWith(".")
    }
  }

  /** Compact a [[buildBandIndex]] table back to one file per bucket.
    *
    * Every [[appendToBandIndex]] delivery writes its own task-aligned
    * file set, so after N deliveries each bucket holds N files and a
    * probe's bucket-pruned scan opens N files per probed bucket — the
    * probe cost degrades linearly in DELIVERIES, not in data. This
    * pass rewrites the table coalesced (the f05 rewrite device: same
    * bucket count and hash family read from the catalog, one
    * task-aligned file per bucket) into a staging table, then swaps
    * it in under the band lock, so no probe plan compilation or
    * append interleaves with the swap. (A probe plan compiled before
    * the swap that is still executing its checkpoint when the swap
    * lands fails loudly on the moved files — never silently wrong —
    * and the single-writer ingest contract makes that interleaving a
    * caller bug.) The swap is two catalog renames, not atomic: live →
    * `__compact_backup`, staging → live, then drop the backup — so a
    * crash at ANY point leaves at least one full copy of the data
    * (never zero, unlike a drop-then-rename). An interrupted swap is
    * self-healing: every band-index entry point detects a missing
    * live table with a surviving backup and renames it back before
    * proceeding (the compaction itself is then simply redone). When
    * the index has a tombstone
    * side table ([[ingestResolveNearDups]]'s supersede mechanism),
    * the rewrite also APPLIES it: tombstoned docs' bands are dropped
    * and the tombstone table truncated — deletes cost O(corpus) only
    * here, never per delivery. Verdict-neutral by construction apart
    * from exactly those applied tombstones — row set, bucketing spec,
    * and bucket hash are all unchanged (spec'd: identical probe
    * verdicts before/after with the file count reduced) — and
    * idempotent: re-running rewrites the same one-file-per-bucket
    * layout. */
  def compactBandIndex(spark: org.apache.spark.sql.SparkSession,
      table: String): Unit = {
    val buckets = requireBandBucketedTable(spark, table, "compactBandIndex")
    val tomb = tombstoneTable(table)
    val applyTombs = spark.catalog.tableExists(tomb)
    compactBucketedTable(spark, table, "band", buckets,
      rows =>
        if (applyTombs) {
          val idName = bandIndexIdColumn(spark, table)
          rows.join(spark.table(tomb).select(col(idName)), Seq(idName),
            "left_anti")
        } else rows,
      () => if (applyTombs) { spark.sql(s"TRUNCATE TABLE $tomb"); () })
  }

  /** [[compactBandIndex]]'s rewrite for a [[buildKeyedTable]] side
    * table — same degradation, same fix: every [[appendToKeyedTable]]
    * delivery writes its own task-aligned file set, so after N
    * deliveries a probe's bucket-pruned point lookup opens N files
    * per probed bucket and probe cost grows linearly in DELIVERIES.
    * Row-neutral (keyed tables have no tombstone side — appends are
    * anti-joined, so there is nothing to delete), idempotent, same
    * backup dance and self-healing swap. Run it on the fingerprint/
    * score/sink tables the streamed flows maintain, on the same
    * schedule the band index compacts. */
  def compactKeyedTable(spark: org.apache.spark.sql.SparkSession,
      table: String, keyCol: String): Unit = {
    val buckets = requireKeyBucketedTable(spark, table, keyCol,
      "compactKeyedTable")
    compactBucketedTable(spark, table, keyCol, buckets,
      identity, () => ())
  }

  /** [[compactKeyedTable]] for an id-carrying index table with a
    * tombstone side ([[graft.operators.Similarity.deleteFromIndex]]'s
    * pending deletes — the vector families): the rewrite additionally
    * APPLIES the tombstones (the [[compactBandIndex]] device) —
    * tombstoned ids' rows are dropped and the tombstone table
    * truncated, so deletes cost O(corpus) only here, never per probe.
    * The id column's name is read from the tombstone table's own
    * schema (stamped by the delete — the side table is
    * self-describing), so the bucket column need not be the id column
    * (the IVF/PQ families bucket by `cid` and delete by the caller's
    * id). The tombstone anti-join is broadcast (pending deletes are
    * bounded by the delete path), so the rewrite stays zero-shuffle.
    * A crash between the swap and the truncate leaves tombstones
    * naming already-removed ids — benign: probes' anti-joins no-op on
    * them and the next compact re-applies and truncates. */
  def compactIdKeyedTable(spark: org.apache.spark.sql.SparkSession,
      table: String, bucketCol: String): Unit = {
    val buckets = requireKeyBucketedTable(spark, table, bucketCol,
      "compactIdKeyedTable")
    val tomb = tombstoneTable(table)
    val applyTombs = spark.catalog.tableExists(tomb)
    compactBucketedTable(spark, table, bucketCol, buckets,
      rows =>
        if (applyTombs) {
          val idName = spark.table(tomb).columns.head
          rows.join(broadcast(spark.table(tomb).select(col(idName))),
            Seq(idName), "left_anti")
        } else rows,
      () => if (applyTombs) { spark.sql(s"TRUNCATE TABLE $tomb"); () })
  }

  /** Run `body` under the engine's ONE maintenance lock (the same
    * object every conf window and compaction swap synchronizes on) —
    * for mutations that must not interleave with a compact's
    * read-rewrite-truncate cycle, e.g. a tombstone append landing
    * between a compact's tombstone read and its truncate would be
    * silently wiped unapplied. */
  private[graft] def withBandLock[T](body: => T): T =
    bandConfLock.synchronized(body)

  /** The shared zero-shuffle compaction core: rewrite `table` (its
    * rows through `transform` — the band index's tombstone apply)
    * coalesced to one task-aligned file per bucket into a staging
    * table, swap it in under the band lock via the never-zero-copies
    * backup dance, then run `afterSwap` (the tombstone truncate)
    * still under the lock. */
  private def compactBucketedTable(
      spark: org.apache.spark.sql.SparkSession, table: String,
      bucketCol: String, buckets: Int,
      transform: DataFrame => DataFrame, afterSwap: () => Unit): Unit =
      DriverBounded.labeled(spark, s"compactBucketedTable:$table") {
    val ident = spark.sessionState.sqlParser.parseTableIdentifier(table)
    val stagingIdent = ident.copy(table = ident.table + "__compact_stage")
    val staging = stagingIdent.unquotedString
    val backup = ident.copy(table = ident.table + "__compact_backup")
      .unquotedString
    // leftovers of a crashed prior compact: the staging rewrite is
    // redone from scratch, and a backup that survived past its swap
    // (crash after the stage→live rename, before the drop) is stale
    Similarity.dropTableAndLocation(spark, staging)
    Similarity.dropTableAndLocation(spark, backup)
    bandConfLock.synchronized {
      val rows = transform(spark.table(table))
      // the rewrite is METADATA-preserving too: the live table's sort
      // spec (the vector store sorts within buckets for single-file
      // point lookups) and its graft.* serving stamps (index width,
      // codebook fingerprint — Similarity.stampTableProps) must
      // survive the staging swap, or a compact would silently strip
      // the layout/identity guarantees the probes assert on
      val meta = spark.sessionState.catalog.getTableMetadata(ident)
      val sortCols = meta.bucketSpec.map(_.sortColumnNames).getOrElse(Nil)
      val graftProps = meta.properties.filter(_._1.startsWith("graft."))
      // Force the bucketed scan for the rewrite: the scan then claims
      // HashPartitioning(bucketCol, buckets), the repartition below
      // elides, and each task reads ONE bucket's file sets and writes
      // its one replacement file — a zero-shuffle, per-bucket-parallel
      // rewrite. Left to the default heuristic,
      // DisableUnnecessaryBucketedScan drops the bucketed read AFTER
      // the repartition was already elided against its claimed
      // partitioning, and the write tasks hold arbitrary bucket
      // mixtures — compaction would then GROW the file count it
      // exists to bound.
      withAutoBucketedScanOff(spark) {
        val bucketed = rows.repartition(buckets, col(bucketCol))
          .write.bucketBy(buckets, bucketCol)
        val writer =
          if (sortCols.isEmpty) bucketed
          else bucketed.sortBy(sortCols.head, sortCols.tail: _*)
        writer.mode("overwrite").saveAsTable(staging)
      }
      if (graftProps.nonEmpty)
        Similarity.stampTableProps(spark, staging, graftProps)
      // backup dance (never zero copies): live→backup, stage→live,
      // drop backup. A crash between the renames strands the data
      // under the backup name; restoreInterruptedSwap renames it back
      // at the next entry-point call.
      spark.sql(s"ALTER TABLE ${ident.unquotedString} RENAME TO $backup")
      spark.sql(s"ALTER TABLE $staging RENAME TO ${ident.unquotedString}")
      Similarity.dropTableAndLocation(spark, backup)
      afterSwap()
      // the rewrite preserves stamps and rows, but conservatively drop
      // the table's serving-identity cache with the files it replaced
      Similarity.invalidateServingIdentity(table)
    }
    spark.catalog.refreshTable(table)
  }

  /** The tombstone side table of a band index: superseded index doc
    * ids awaiting physical removal at the next [[compactBandIndex]]. */
  private[graft] def tombstoneTable(table: String): String =
    table + "__tombstones"

  /** The id column of a band-index table (its one non-`band` column). */
  private def bandIndexIdColumn(
      spark: org.apache.spark.sql.SparkSession, table: String): String =
    spark.table(table).columns.filter(_ != "band") match {
      case Array(one) => one
      case other => throw new IllegalArgumentException(
        s"band index $table must have exactly (id, band) columns, " +
          s"saw ${other.mkString(",")} besides band")
    }

  /** Incremental near-dup RESOLUTION at ingest — the [[probeBandIndex]]
    * + [[resolveNearDupsByQuality]] composition the one-shot d42 pass
    * cannot express: a NEW batch doc that near-dups index docs is
    * kept, dropped, or made to REPLACE them by score, at delivery
    * time, without re-mining the corpus.
    *
    * Policy (the d42 total order): a batch doc WINS iff it beats every
    * live index-side candidate under (`scoreCol` desc, id asc).
    * Winners are ingested ([[appendToBandIndex]], idempotent) and
    * their candidates become TOMBSTONES (appended to the side table;
    * physically removed at the next [[compactBandIndex]]); losers are
    * dropped and never enter the index. Tombstoned docs are dead to
    * every later delivery — their verdict rows are filtered before
    * resolution — so a better-scored late arrival genuinely
    * supersedes its index-side near-dup.
    *
    * `indexScores` must cover every index doc id (`idCol`,
    * `scoreCol`) — it is scanned ONCE, semi-joined by the broadcast
    * batch-proportional verdict pairs, so the corpus-sized side
    * shuffles nothing; a candidate id MISSING from `indexScores`
    * fails loudly (an uncovered candidate would otherwise vanish
    * from the pair set, handing the batch doc a vacuous win with the
    * candidate never tombstoned — a silent contract breach). Scope:
    * resolution is batch-vs-INDEX only — near-dup pairs WITHIN one
    * batch are not resolved (both copies append); pre-resolve the
    * batch with the one-shot d42 pass ([[resolveNearDupsByQuality]])
    * when within-batch duplicates are possible, or deliver at a grain
    * that precludes them. The batch side is micro-batch grain by the
    * probe's contract and broadcasts everywhere. The pair frame is
    * eagerly checkpointed before any table mutation (the w05
    * discipline: everything returned or written derives from
    * checkpointed batch-proportional rows, not from the tables the
    * appends extend). The whole flow is replay-idempotent: a replayed
    * winner finds its candidates tombstoned and itself appended (both
    * appends anti-joined), a replayed loser loses again.
    *
    * Per-delivery cost note: the tombstone side table is read twice
    * per delivery (the probe's exclusion anti-join — shared with
    * ad-hoc probes since the takedown unification — and the tombstone
    * append's own anti-join; the winner append's re-entry guard is a
    * third, limit(1)-bounded). It is TOMBSTONE-grain — superseded
    * docs awaiting the
    * next [[compactBandIndex]], which truncates it — so the
    * compaction CADENCE is what bounds those two reads, not the
    * corpus; schedule compaction accordingly on high-supersede
    * workloads. Because tombstones BROADCAST into every probe, the
    * pending set is additionally configuration-bounded
    * (`maxPendingTombstones`, the [[Similarity.deleteFromIndex]]
    * invariant): a high-supersede stream with a slow compaction
    * cadence fails loudly with direction (run [[compactBandIndex]])
    * instead of growing the probe broadcast without bound.
    *
    * Returns one row per batch doc:
    * (idCol, n_candidates, kept, n_superseded). */
  def ingestResolveNearDups(spark: org.apache.spark.sql.SparkSession,
      table: String, batch: DataFrame, textCol: String, idCol: String,
      scoreCol: String, indexScores: DataFrame, k: Int = 6,
      bandWidth: Int = 2, shingleSize: Int = 3, buckets: Int = 32,
      maxBatchBands: Int = 1 << 20,
      maxPendingTombstones: Int = 1 << 20): DataFrame =
    resolveAtIngest(spark, table, batch, textCol, idCol, scoreCol,
      // one corpus-score scan, broadcast-semi-joined by the verdict
      // pairs — the corpus-sized side shuffles nothing, but IS read
      // once per call; fine one-shot, per-delivery use wants
      // [[ingestResolveNearDupsIndexed]]. The corpus side must stream
      // (broadcast build = the batch pairs), so coverage cannot ride
      // the join as a left-outer guard — the core runs its separate
      // uncovered probe for this form.
      (_, withBatch) => indexScores
        .select(col(idCol).as("index_id"), col(scoreCol).as("__is"))
        .join(broadcast(withBatch), Seq("index_id")),
      coverageGuarded = false,
      _ => (), "the indexScores frame argument",
      k, bandWidth, shingleSize, buckets, maxBatchBands,
      maxPendingTombstones)

  /** [[ingestResolveNearDups]] with the score side PERSISTED — the
    * per-delivery shape: candidate scores come from bucket-pruned
    * point lookups of a `scoreTable` built by [[buildKeyedTable]]
    * (`idCol` key, `scoreCol` payload), and each delivery's winners
    * are appended to it idempotently ([[appendToKeyedTable]]), so the
    * table stays complete as the index grows and NO corpus-sized frame
    * is read at delivery time — cost is O(batch) per micro-batch at
    * any corpus size, where the frame-argument form re-scans its
    * corpus-sized `indexScores` once per call. Same policy, same
    * returned frame, same replay-idempotence (a replayed winner's
    * score append is absorbed by the key-grain anti-join). */
  def ingestResolveNearDupsIndexed(
      spark: org.apache.spark.sql.SparkSession,
      table: String, batch: DataFrame, textCol: String, idCol: String,
      scoreCol: String, scoreTable: String, k: Int = 6,
      bandWidth: Int = 2, shingleSize: Int = 3, buckets: Int = 32,
      maxBatchBands: Int = 1 << 20,
      maxPendingTombstones: Int = 1 << 20): DataFrame =
    resolveAtIngest(spark, table, batch, textCol, idCol, scoreCol,
      (verdicts, withBatch) => {
        // probe by the VERDICT rows' candidate ids (same key set as
        // withBatch — every verdict id is a batch id — without paying
        // the batch broadcast inside the probe's own collect), then a
        // batch-grain LEFT join whose __is projection carries the
        // coverage guard in-row: an uncovered candidate fails the
        // pairs checkpoint itself, not a separate probe job
        val scored = probeKeyedTable(spark, scoreTable,
          verdicts.select(col("index_id").as(idCol)), idCol)
        withBatch.join(
          broadcast(scored.select(col(idCol).as("index_id"),
            col(scoreCol).as("__is"))),
          Seq("index_id"), "left")
          .withColumn("__is", when(col("__is").isNull,
            raise_error(concat(
              lit("ingestResolveNearDups: index doc id "),
              col("index_id").cast("string"),
              lit(s" has no row in the persisted score table " +
                s"$scoreTable — " + CoverageGuardWhy))))
            .otherwise(col("__is")))
      },
      coverageGuarded = true,
      winners => appendToKeyedTable(
        winners.select(col(idCol), col(scoreCol)), scoreTable, idCol),
      s"the persisted score table $scoreTable",
      k, bandWidth, shingleSize, buckets, maxBatchBands,
      maxPendingTombstones)

  /** Why score coverage is a hard contract — shared by the in-row
    * guard (indexed form) and the separate probe (frame form). */
  private val CoverageGuardWhy =
    "scores must cover every index doc; an uncovered candidate " +
      "would be silently dropped from resolution (vacuous batch win, " +
      "candidate never tombstoned)"

  /** The shared resolve-at-ingest core: `attachScores` turns the
    * checkpointed verdicts + the (idCol, index_id, __bs) verdict×batch
    * frame into pairs carrying `__is` (the candidate's score) — batch-
    * proportional in, batch-proportional out; `coverageGuarded` says
    * whether the caller's join carries the in-row coverage guard (the
    * indexed form) or the core must run its separate uncovered probe
    * (the frame form, whose corpus-sized score scan cannot take a
    * batch-preserving outer join); `onWinners` runs after the winner
    * append for score-side maintenance. `scoreSource` names the
    * caller's score side in the coverage-guard failure, so incident
    * triage reads which side actually lacked the candidate's score.
    *
    * Per-delivery job shape (measured r22, guide §1.2): the batch is
    * banded ONCE — the probe and the winner append previously each ran
    * their own minhash pipeline + driver collect — the winner ids come
    * from one bounded collect over the checkpointed resolution rows
    * (their band literals are a driver-side subset of the banding
    * collect), the coverage guard rides the pairs checkpoint, and the
    * pending-tombstone cap is enforced by one post-append limit probe
    * of the tombstone table alone (bounding the probe broadcast at
    * maxPendingTombstones + one batch) instead of a second evaluation
    * of the tombstone anti-join under a union. */
  private def resolveAtIngest(spark: org.apache.spark.sql.SparkSession,
      table: String, batch: DataFrame, textCol: String, idCol: String,
      scoreCol: String,
      attachScores: (DataFrame, DataFrame) => DataFrame,
      coverageGuarded: Boolean,
      onWinners: DataFrame => Unit, scoreSource: String, k: Int,
      bandWidth: Int, shingleSize: Int, buckets: Int,
      maxBatchBands: Int, maxPendingTombstones: Int): DataFrame =
      DriverBounded.labeled(spark, s"resolveAtIngest:$table") {
    val tomb = tombstoneTable(table)
    if (!spark.catalog.tableExists(tomb))
      spark.table(table).select(col(idCol)).limit(0)
        .write.saveAsTable(tomb)
    requireBandBucketedTable(spark, table, "resolveAtIngest")
    // ONE banding pass per delivery, shared by the probe and the
    // winner append (guide §1.2 — the two used to band independently)
    val (banded, release) = freshBatchBands(batch, textCol, idCol, k,
      bandWidth, shingleSize, maxBatchBands, "resolveAtIngest")
    try {
      val bandedDf = banded._1
      val bandRows = banded._2
      val bands = bandRows.map(_.get(1)).distinct.toSeq
      // tombstone exclusion lives INSIDE the probe (one read per
      // delivery, shared with ad-hoc probes) — verdicts arrive already
      // filtered to live index docs
      val verdicts = probeBanded(spark, table, bandedDf, bands, idCol,
        reliableCheckpoint = false)
      // the per-pair frame checkpoints batch-proportional rows so
      // resolution, tombstoning, and the winner append all replan from
      // them (never from the score side, never from the mutating
      // tables); an in-row coverage guard (indexed form) surfaces
      // through this checkpoint and is rethrown as the operator's own
      // loud contract failure
      val withBatch = verdicts.join(
        broadcast(batch.select(col(idCol), col(scoreCol).as("__bs"))),
        Seq(idCol))
      val pairs = materializeWithCoverageGuard(
        attachScores(verdicts, withBatch)
          .select(col(idCol), col("index_id"), col("__bs"), col("__is")))
      if (!coverageGuarded) {
        // frame form: every candidate id the probe surfaced must have
        // come back with a score — the inner join silently DROPS an
        // uncovered candidate. Both frames are checkpointed batch-
        // proportional rows; limit(1) keeps the probe driver-cheap.
        val uncovered = verdicts.select(col("index_id"))
          .join(pairs.select(col("index_id")), Seq("index_id"),
            "left_anti")
          .limit(1).collect()
        require(uncovered.isEmpty,
          s"ingestResolveNearDups: index doc id ${uncovered.headOption
              .map(_.get(0)).getOrElse("")} has no row in " +
            s"$scoreSource — " + CoverageGuardWhy)
      }
      val beats = col("__bs") > col("__is") ||
        (col("__bs") === col("__is") && col(idCol) < col("index_id"))
      val byDoc = pairs.groupBy(col(idCol))
        .agg(count(lit(1)).as("__n"),
          (min(when(beats, 1).otherwise(0)) === 1).as("__wins"))
      val resolvedPlan = batch.select(col(idCol))
        .join(broadcast(byDoc), Seq(idCol), "left")
        .select(col(idCol),
          coalesce(col("__n"), lit(0L)).as("n_candidates"),
          coalesce(col("__wins"), lit(true)).as("kept"),
          when(coalesce(col("__wins"), lit(true)),
            coalesce(col("__n"), lit(0L))).otherwise(lit(0L))
            .as("n_superseded"))
      // the resolution is batch-grain — one row per batch doc, bounded
      // by the banding collect's own cap — so it comes back as ONE
      // bounded collect and re-enters as a LocalRelation: the returned
      // frame, the winner id literals, and the tombstone-skip decision
      // all read the same driver rows (the old shape paid a checkpoint
      // job plus a winner-collect job per delivery for the same data)
      val resolvedRows = DriverBounded.collectCapped(resolvedPlan,
        maxBatchBands,
        "resolveAtIngest: resolution rows exceed maxBatchBands")
      val resolved = spark.createDataFrame(
        java.util.Arrays.asList(resolvedRows: _*), resolvedPlan.schema)
      val winnerIds = resolvedRows.filter(_.getBoolean(2))
        .map(_.get(0)).toSeq
      val winnerIdSet = winnerIds.toSet
      val winnerBands = bandRows
        .filter(r => winnerIdSet.contains(r.get(0)))
        .map(_.get(1)).distinct.toSeq
      // tombstones: superseded index docs awaiting the next compact.
      // Skipped entirely when no winner had a candidate (nothing can
      // be superseded). The side table is self-describing — its stored
      // id column name is authoritative (a tomb first stamped by
      // deleteFromIndex may carry a different name than idCol), so the
      // anti-join renames it in and the append renames back out.
      if (resolvedRows.exists(r => r.getBoolean(2) && r.getLong(1) > 0)) {
        val tombT = spark.table(tomb)
        val storedId = tombT.columns.head
        val freshTombs = pairs
          .join(broadcast(byDoc.filter(col("__wins")).select(col(idCol))),
            Seq(idCol), "left_semi")
          .select(col("index_id").as(idCol)).distinct()
          .join(tombT.select(col(storedId).as(idCol)), Seq(idCol),
            "left_anti")
        freshTombs.select(col(idCol).as(storedId))
          .write.mode("append").saveAsTable(tomb)
        spark.catalog.refreshTable(tomb)
        // tombstones broadcast into every probe (the exclusion
        // anti-join), so the pending set must stay configuration-sized
        // — the deleteFromIndex invariant applied to supersede
        // tombstones: refuse loudly with direction instead of growing
        // the probe broadcast unboundedly under a slow compaction
        // cadence. Enforced by one limit probe of the table AFTER the
        // append (bound: maxPendingTombstones + one batch) — the
        // pre-append union form paid a second evaluation of the
        // anti-join every delivery.
        require(!DriverBounded.exceeds(
            spark.table(tomb), maxPendingTombstones),
          s"ingestResolveNearDups: pending deletes for $table " +
            s"exceed $maxPendingTombstones — supersede tombstones " +
            "broadcast into every probe, so they must stay " +
            "configuration-sized; run compactBandIndex to apply and " +
            "clear them, or raise maxPendingTombstones deliberately")
      }
      if (winnerIds.nonEmpty) {
        val winners = batch.filter(col(idCol).isin(winnerIds: _*))
        // a winner that was itself superseded THIS delivery (a batch
        // doc whose id is also an index doc another winner beat) must
        // not re-enter until compacted — same guard as the standalone
        // append path
        Similarity.requireNotTombstoned(spark, table, winners, idCol,
          "appendToBandIndex")
        // idempotence check over the winners' own (band, id) literals,
        // pinned to bucket-prune exactly like the standalone append;
        // fresh bands come from the SAME persisted banding the probe
        // used (deterministic pipeline, so a replayed winner finds its
        // identical bands and appends nothing)
        val existing = compileAndPinBucketedScan(spark,
          spark.table(table)
            .filter(col("band").isin(winnerBands: _*) &&
              col(idCol).isin(winnerIds: _*))
            .select(col(idCol)),
          table, reliable = false, "appendToBandIndex")
        val fresh = bandedDf.filter(col(idCol).isin(winnerIds: _*))
          .join(existing, Seq(idCol), "left_anti")
          .select(col(idCol), col("band"))
        withAutoBucketedScanOff(spark) {
          fresh.repartition(buckets, col("band")).write
            .bucketBy(buckets, "band")
            .mode("append")
            .saveAsTable(table)
        }
        spark.catalog.refreshTable(table)
        onWinners(winners)
      }
      resolved
    } finally release()
  }

  /** Materialize the pairs frame, surfacing an in-row coverage-guard
    * raise_error (which arrives wrapped in the job failure) as the
    * operator's own IllegalArgumentException with the directed
    * message — the failure ergonomics of the old separate probe, at
    * zero extra jobs. */
  private def materializeWithCoverageGuard(df: DataFrame): DataFrame =
    try df.localCheckpoint(true) catch {
      case e: Throwable =>
        val directed = Iterator.iterate(e)(_.getCause)
          .takeWhile(_ != null).take(20)
          .map(t => String.valueOf(t.getMessage))
          .find(_.contains("ingestResolveNearDups: index doc id"))
        directed match {
          case Some(m) =>
            val msg = m.substring(
              m.indexOf("ingestResolveNearDups: index doc id"))
            throw new IllegalArgumentException(msg, e)
          case None => throw e
        }
    }


  // ---- Key-bucketed side tables: the band-index device generalized
  // to POINT lookups. A streamed ingest flow must answer corpus-grain
  // questions ("is this fingerprint already in the corpus?", "what is
  // index doc X's score?") once per micro-batch; scanning a
  // corpus-sized frame per delivery makes delivery cost proportional
  // to the CORPUS, not the batch. Persisting the lookup side as a
  // catalog table bucketed by the probe key makes every per-batch
  // lookup a bucket-pruned point probe — the batch's keys enter the
  // plan as literals, the scan opens only their buckets (asserted,
  // like probeBandIndex), and delivery cost is O(batch) at any corpus
  // size. Same lifecycle as the band index: build / idempotent append
  // / asserted-pruned probe / zero-shuffle compaction
  // ([[compactKeyedTable]] — appends are anti-joined so there is
  // never a duplicate key to resolve, but each delivery stacks its
  // own file set and probe cost grows linearly in deliveries until
  // the rewrite folds each bucket back to one file).

  /** Persist `df` as a catalog table bucketed by `keyCol`, one
    * task-aligned file per bucket. `df` must be key-distinct (one row
    * per key — the table is a key-indexed map, and [[probeKeyedTable]]
    * callers join its payload back at key grain); violations fail
    * loudly rather than persisting an ambiguous map.
    *
    * Size `buckets` for the CORPUS, not the batch: the literal probe
    * form prunes to the batch's buckets regardless, but the join form
    * (a backfill-sized probe or append) inherits its parallelism from
    * the table's bucket count — the key frame repartitions to exactly
    * `buckets` partitions, so a 32-bucket table caps a billion-key
    * backfill at 32 join tasks. At 100 TB build with thousands of
    * buckets; the default 32 is the local-mode test shape. */
  def buildKeyedTable(df: DataFrame, keyCol: String, table: String,
      buckets: Int = 32): Unit = {
    val spark = df.sparkSession
    Similarity.dropTableAndLocation(spark, table)
    // repartition FIRST: the duplicate-key window's required clustering
    // is then already satisfied (hashpartitioning on keyCol), so the
    // guard rides the write's own task-alignment exchange — one
    // shuffle total, and the window preserves the alignment the
    // bucketed write needs (one file per bucket).
    val keyed = df.repartition(buckets, col(keyCol))
      .withColumn("__dup",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window
          .partitionBy(col(keyCol))))
    // the guard rides the KEY column itself (a dropped guard column
    // would be pruned away, silently skipping the check); the
    // otherwise branch preserves the value, so alignment holds. A
    // NULL key is rejected with the duplicates: isin(literals) never
    // matches null, so a null-keyed row could neither be probed nor
    // absorb its own replay — it would be dead weight that re-appends
    // forever.
    val guarded = keyed.columns.filter(_ != "__dup").map { c =>
      if (c == keyCol)
        when(col(keyCol).isNull, raise_error(lit(
            s"buildKeyedTable: null key in $keyCol — a null-keyed row " +
              "can never be probed (isin never matches null); filter " +
              "or key-derive upstream")))
          .when(col("__dup") > 1, raise_error(concat(
            lit(s"buildKeyedTable: duplicate key in $keyCol: "),
            col(keyCol).cast("string"),
            lit(" — the table is a key-indexed map; dedupe upstream"))))
          .otherwise(col(c)).as(c)
      else col(c)
    }
    keyed.select(guarded.toIndexedSeq: _*)
      .write
      .bucketBy(buckets, keyCol)
      .mode("overwrite")
      .saveAsTable(table)
    spark.catalog.refreshTable(table)
  }

  /** Idempotently append `batch` to a [[buildKeyedTable]] table at key
    * grain: at-least-once delivery, exactly-once table effect, FIRST
    * writer wins per key (a replayed batch — or a later batch carrying
    * an already-indexed key — appends nothing for it). `batch` must be
    * key-distinct and null-free on `keyCol` (loud fail otherwise: two
    * payloads for one key in a single delivery has no deterministic
    * winner, and a null key can never match the idempotence check so
    * it would re-append on every redelivery).
    *
    * The idempotence check mirrors [[probeKeyedTable]]'s two forms:
    * at micro-batch sizes (≤ `joinFormThreshold` distinct keys) it is
    * bucket-pruned point lookups — the batch's keys enter the plan as
    * literals (bounded by `maxKeys`, loud fail past it), the scan
    * asserted to prune, so the check opens only the batch's buckets —
    * and above the threshold (a backfill-sized delivery) it switches
    * to the bucket-aligned join form with every validation pushed to
    * the cluster: no driver hop, no literal plan, zero table-side
    * exchange, and the same first-writer-wins effect. */
  def appendToKeyedTable(batch: DataFrame, table: String, keyCol: String,
      maxKeys: Int = 1 << 20, joinFormThreshold: Int = 1 << 16): Unit = {
    val spark = batch.sparkSession
    DriverBounded.labeled(spark, s"appendToKeyedTable:$table") {
    val buckets = requireKeyBucketedTable(spark, table, keyCol,
      "appendToKeyedTable")
    val b = batch.persist()
    try {
      // form decision, driver-bounded by construction (the literal
      // path re-uses these rows as its key list)
      val headRows = b.select(col(keyCol))
        .limit(joinFormThreshold + 1).collect()
      val existing: Option[DataFrame] =
        if (headRows.length > joinFormThreshold) {
          // JOIN FORM: validations run distributed (limit(1) failure
          // probes — driver-cheap), the existence check is the probe's
          // bucket-aligned join, and nothing batch-sized ever lands on
          // the driver
          val nullKey = b.filter(col(keyCol).isNull).limit(1).collect()
          require(nullKey.isEmpty,
            s"appendToKeyedTable: null $keyCol key in the batch — the " +
              "idempotence anti-join never matches null, so a " +
              "null-keyed row would re-append on every redelivery; " +
              "filter or key-derive upstream")
          val dup = b.groupBy(col(keyCol))
            .agg(count(lit(1)).as("__n")).filter(col("__n") > 1)
            .limit(1).collect()
          require(dup.isEmpty,
            s"appendToKeyedTable: batch has duplicate $keyCol keys " +
              s"(e.g. ${dup.headOption.map(_.get(0)).getOrElse("")}) — " +
              "the table is a key-indexed map and a within-batch " +
              "duplicate has no deterministic winner; dedupe the batch " +
              "upstream")
          Some(probeKeyedTableViaJoin(spark, table,
              b.select(col(keyCol)).distinct(), keyCol, buckets,
              reliable = false)
            .select(col(keyCol)))
        } else {
          val keys = headRows.map(_.get(0)).toSeq
          require(keys.size <= maxKeys,
            s"appendToKeyedTable: batch exceeds maxKeys $maxKeys (the " +
              "batch's keys become planning-time point-lookup " +
              "literals); split the batch, raise the bound " +
              "deliberately, or lower joinFormThreshold to take the " +
              "join form")
          require(!keys.contains(null),
            s"appendToKeyedTable: null $keyCol key in the batch — the " +
              "idempotence anti-join never matches null, so a " +
              "null-keyed row would re-append on every redelivery; " +
              "filter or key-derive upstream")
          require(keys.distinct.length == keys.length,
            s"appendToKeyedTable: batch has duplicate $keyCol keys — " +
              "the table is a key-indexed map and a within-batch " +
              "duplicate has no deterministic winner; dedupe the batch " +
              "upstream")
          if (keys.isEmpty) None
          else
            // the idempotence check is compiled and ASSERTED to
            // bucket-prune exactly like a probe (and checkpointed, so
            // the anti-join below derives from batch-proportional
            // rows, never from the table the append is about to
            // extend) — a plan that failed to prune would silently
            // full-scan the table once per delivery
            Some(compileAndPinBucketedScan(spark,
              spark.table(table).filter(col(keyCol).isin(keys: _*))
                .select(col(keyCol)),
              table, reliable = false, "appendToKeyedTable"))
        }
      existing.foreach { ex =>
        val fresh = b.join(ex, Seq(keyCol), "left_anti")
        withAutoBucketedScanOff(spark) {
          fresh.repartition(buckets, col(keyCol)).write
            .bucketBy(buckets, keyCol)
            .mode("append")
            .saveAsTable(table)
        }
        spark.catalog.refreshTable(table)
      }
    } finally { b.unpersist(blocking = false); () }
    }
  }

  /** [[appendToKeyedTable]] for a batch whose key set was ALREADY
    * probed this delivery: `probed` must be the [[probeKeyedTable]]
    * result for a key set COVERING the batch's keys (same table, same
    * delivery — the per-batch probe the streamed flows run anyway),
    * and the batch must be key-distinct and null-free BY CONSTRUCTION
    * (a [[lineHashes]]/distinct product). The append then skips its
    * own idempotence probe — the anti-join derives from `probed`'s
    * checkpointed batch-proportional rows — and the guard collects,
    * so a delivery pays ONE table write and nothing else (guide §1.2:
    * the probe+append pair was reading the same buckets twice per
    * micro-batch).
    *
    * CONTRACT (loud in the scaladoc because the table's idempotence
    * depends on it): a key present in the table but MISSING from
    * `probed` would re-append — exactly-once table effect holds only
    * when `probed` came from probing a superset of this batch's keys
    * against this table, after which no other writer touched it (the
    * single-writer ingest contract). */
  def appendProbedToKeyedTable(batch: DataFrame, table: String,
      keyCol: String, probed: DataFrame): Unit = {
    val spark = batch.sparkSession
    DriverBounded.labeled(spark, s"appendProbedToKeyedTable:$table") {
      val buckets = requireKeyBucketedTable(spark, table, keyCol,
        "appendProbedToKeyedTable")
      val fresh = batch.join(probed.select(col(keyCol)), Seq(keyCol),
        "left_anti")
      withAutoBucketedScanOff(spark) {
        fresh.repartition(buckets, col(keyCol)).write
          .bucketBy(buckets, keyCol)
          .mode("append")
          .saveAsTable(table)
      }
      spark.catalog.refreshTable(table)
    }
  }

  /** Bucket-pruned point lookups against a [[buildKeyedTable]] table:
    * returns the table rows whose `keyCol` appears in `keys` (any
    * frame carrying that column; other columns ignored), eagerly
    * checkpointed so downstream plans derive from batch-proportional
    * rows, never from the table.
    *
    * Two plan forms, chosen by the probe's distinct key count:
    *
    *  - '''Literal form''' (≤ `joinFormThreshold` keys — the
    *    micro-batch norm): the keys become planning-time literals,
    *    the scan is ASSERTED to bucket-prune and re-asserted on the
    *    executed plan (the probeBandIndex device) — a mis-built table
    *    refuses loudly instead of full-scanning at corpus size. The
    *    loud `maxKeys` cap applies to this form only (it bounds the
    *    driver materialization and the plan's literal count).
    *  - '''Join form''' (above the threshold): a million-literal
    *    `isin` would bloat planning time and driver memory, so the
    *    probe switches to a bucket-ALIGNED join — the key frame
    *    repartitions to the TABLE's own (bucket-count, key) layout,
    *    the forced bucketed scan claims that exact partitioning, and
    *    the table side joins with ZERO exchange (asserted on the
    *    executed plan: no shuffle above the table's scan). No file
    *    pruning — the trade is one full bucketed read with no
    *    corpus-side shuffle versus an unboundedly large plan — and no
    *    driver hop at all: the keys never leave the cluster.
    *
    * Both forms return identical rows (spec-pinned at the threshold
    * boundary). An empty key set probes nothing and returns an empty
    * frame with the table's schema. */
  def probeKeyedTable(spark: org.apache.spark.sql.SparkSession,
      table: String, keys: DataFrame, keyCol: String,
      maxKeys: Int = 1 << 20,
      reliableCheckpoint: Boolean = false,
      joinFormThreshold: Int = 1 << 16): DataFrame =
      DriverBounded.labeled(spark, s"probeKeyedTable:$table") {
    val buckets = requireKeyBucketedTable(spark, table, keyCol,
      "probeKeyedTable")
    val distinctKeys = keys.select(col(keyCol)).distinct()
    // form decision, driver-bounded by construction: fetch at most
    // threshold+1 rows — never the whole key set
    val headRows = distinctKeys.limit(joinFormThreshold + 1).collect()
    if (headRows.length > joinFormThreshold)
      probeKeyedTableViaJoin(spark, table, distinctKeys, keyCol,
        buckets, reliableCheckpoint)
    else {
      val lits = headRows.map(_.get(0)).toSeq
      require(lits.size <= maxKeys,
        s"probeKeyedTable: probe key set exceeds maxKeys $maxKeys (keys " +
          "become planning-time point-lookup literals); split the batch, " +
          "raise the bound deliberately, or lower joinFormThreshold to " +
          "take the join form")
      require(!lits.contains(null),
        s"probeKeyedTable: null $keyCol in the probe key set — " +
          "isin(literals) never matches null, so a null probe would " +
          "silently come back absent; filter nulls (or treat them as " +
          "known-absent) at the caller, explicitly")
      if (lits.isEmpty)
        spark.table(table).limit(0).localCheckpoint(true)
      else
        compileAndPinBucketedScan(spark,
          spark.table(table).filter(col(keyCol).isin(lits: _*)),
          table, reliableCheckpoint, "probeKeyedTable")
    }
  }

  /** The join form of [[probeKeyedTable]]: table left-semi-joined by
    * the key frame repartitioned to the table's own bucketing. The
    * bucketed scan is forced (same conf window as every other
    * band-device compile) so it claims HashPartitioning(keyCol,
    * buckets) and the join needs no table-side exchange; the executed
    * plan is asserted to have NO shuffle above the table's scan —
    * cost is one bucketed read of the table plus one batch-side
    * shuffle, at any key count. */
  private def probeKeyedTableViaJoin(
      spark: org.apache.spark.sql.SparkSession, table: String,
      distinctKeys: DataFrame, keyCol: String, buckets: Int,
      reliable: Boolean): DataFrame = {
    val nullProbe = distinctKeys.filter(col(keyCol).isNull)
      .limit(1).collect()
    require(nullProbe.isEmpty,
      s"probeKeyedTable: null $keyCol in the probe key set — an " +
        "equi-join never matches null, so a null probe would silently " +
        "come back absent; filter nulls (or treat them as " +
        "known-absent) at the caller, explicitly")
    val joined = spark.table(table).join(
      distinctKeys.repartition(buckets, col(keyCol)).hint("shuffle_hash"),
      Seq(keyCol), "left_semi")
    // compile inside the window only — executedPlan is a cached
    // lazy val on this QueryExecution, so the checkpoint below
    // (OUTSIDE the lock, like compileAndPinBucketedScan) merely
    // executes the already-compiled plan: concurrent appends never
    // serialize behind this probe's execution
    withAutoBucketedScanOff(spark) { joined.queryExecution.executedPlan; () }
    val out =
      if (reliable) joined.checkpoint(true)
      else joined.localCheckpoint(true)
    // assert on the FINAL (post-AQE) plan: no shuffle may sit above
    // the table's scan — if the forced bucketed scan was dropped at
    // stage preparation, the table side would re-shuffle at corpus
    // size, exactly the cost this form exists to avoid
    val ident = spark.sessionState.sqlParser.parseTableIdentifier(table)
    val nodes = graft.plans.PlanWalk
      .flatten(joined.queryExecution.executedPlan)
    val shuffledTableSide = nodes.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
          if graft.plans.PlanWalk.flatten(e.child).exists {
            case f: org.apache.spark.sql.execution.FileSourceScanExec =>
              f.tableIdentifier.exists(_.table == ident.table)
            case _ => false
          } => e
    }
    require(shuffledTableSide.isEmpty,
      s"probeKeyedTable (join form): the executed plan shuffles the " +
        s"table side of $table — the bucketed scan's partitioning " +
        "claim was lost (stage-preparation rules dropped the forced " +
        "bucketed scan?); the probe that just ran re-shuffled the " +
        "table at corpus size")
    out
  }

  /** Persist a corpus's content-fingerprint set as a key-bucketed
    * catalog table: one row per distinct `md5(textCol)`, bucketed by
    * the fingerprint — the exact-membership ground truth the streamed
    * ingest flows probe per micro-batch ([[exactMembershipViaTable]]).
    * Unlike the bloom (config-sized, probabilistic, broadcast), this
    * is the corpus-sized EXACT side — which is why it must be a
    * bucket-pruned table and never a per-delivery scan. */
  def buildFingerprintTable(corpus: DataFrame, textCol: String,
      table: String, buckets: Int = 32): Unit =
    buildKeyedTable(
      corpus.select(md5(col(textCol)).as("fp")).distinct(), "fp",
      table, buckets)

  /** [[exactMembership]] with the verifying side persisted: bloom
    * probe first (no false negatives, so every true member is a
    * candidate), then the candidate minority verified by bucket-pruned
    * point lookups of a [[buildFingerprintTable]] table — the corpus
    * is never scanned at probe time, so a streamed flow probing once
    * per micro-batch pays O(batch) per delivery instead of a full
    * corpus read (the one-shot [[exactMembership]]'s scan amortizes
    * over a single large batch; per-delivery it does not). Returns the
    * same (idCol, maybe_member, is_member) frame. The bloom verdict
    * is referenced twice (candidate derivation + the final join), so
    * it checkpoints eagerly — batch-grain — instead of re-running the
    * probe rollups per consumer (the double-pass the one-shot form
    * documents and leaves to its callers). */
  def exactMembershipViaTable(spark: org.apache.spark.sql.SparkSession,
      fpTable: String, batch: DataFrame, textCol: String, idCol: String,
      bloom: DataFrame, mBits: Int = 1 << 20, k: Int = 3): DataFrame =
      DriverBounded.labeled(spark, s"exactMembershipViaTable:$fpTable") {
    val keyed = batch.select(col(idCol), md5(col(textCol)).as("fp"))
    val probed = probeBloom(keyed, "fp", idCol, bloom, mBits, k)
      .localCheckpoint(true)
    val candidates = probed.filter(col("maybe_member"))
      .join(keyed, Seq(idCol))
      .select(col(idCol), col("fp"))
    val present = probeKeyedTable(spark, fpTable, candidates, "fp")
    val confirmed = candidates
      .join(broadcast(present.select(col("fp"))), Seq("fp"))
      .select(col(idCol)).distinct()
      .withColumn("is_member", lit(true))
    probed.join(broadcast(confirmed), Seq(idCol), "left")
      .select(col(idCol), col("maybe_member"),
        coalesce(col("is_member"), lit(false)).as("is_member"))
  }

  /** Bloom-filter membership artifact over a key column (content
    * fingerprints) — the exact-dedup complement of [[buildBandIndex]]
    * for the production ingest shape: a daily batch's exact-duplicate
    * verdicts against a 100 TB corpus need no corpus join, because the
    * corpus aggregates ONCE to this config-sized bitmap, which then
    * BROADCASTS to every probe. `mBits` filter bits packed 32 per row
    * (bit positions 0..31, so every mask is a small positive long —
    * no sign games in any engine), `k` salted md5 hash functions.
    * One corpus pass: key explodes to its k (word, bit) cells, one
    * map-side-combined `bit_or` aggregate collapses them to at most
    * mBits/32 rows per task. The (mBits, k) config rides `bits`'
    * column metadata; probing validates it (a mismatch re-hashes into
    * the wrong bit space). False-positive rate for n keys is the
    * standard (1 − e^(−kn/m))^k — size mBits ≥ ~10n for ~1% at k=3;
    * false positives only send extra candidates to a verifying join,
    * never lose a document (no false negatives, ever — set union via
    * OR is exact). Merging two filters of identical config is
    * `bit_or` per word — idempotent under replay, which is what makes
    * the artifact maintainable incrementally. */
  def buildBloom(df: DataFrame, keyCol: String, mBits: Int = 1 << 20,
      k: Int = 3): DataFrame = {
    require(mBits > 0 && mBits % 32 == 0,
      s"mBits must be a positive multiple of 32, got $mBits")
    requireBloomK(k)
    val cfg = new org.apache.spark.sql.types.MetadataBuilder()
      .putLong("mBits", mBits.toLong).putLong("k", k.toLong).build()
    df.select(explode(array((0 until k).map(s =>
        bloomCell(col(keyCol), s, mBits)): _*)).as("__h"))
      .groupBy(expr("__h div 32").as("word"))
      .agg(expr("bit_or(shiftleft(CAST(1 AS BIGINT), CAST(__h % 32 AS INT)))")
        .as("bits", cfg))
  }

  /** One salted hash cell: top-48-bit md5 bucket of salt||key into
    * [0, mBits) — the d35/d38 engine-neutral hash family. The salt
    * prepends with NO separator, so the scheme is prefix-free only
    * for single-digit salts ("1"+"1x" vs "11"+"x" alias at k >= 11,
    * correlating the hash functions); [[requireBloomK]] enforces the
    * bound at every public entry. */
  private def bloomCell(key: Column, salt: Int, mBits: Int): Column =
    (conv(substring(md5(concat_ws("", lit(salt.toString), key)),
      1, 12), 16, 10).cast("long") % mBits)

  /** Guard for the [[bloomCell]] salt scheme: k in [1, 10]. */
  private def requireBloomK(k: Int): Unit =
    require(k >= 1 && k <= 10,
      s"k must be in [1, 10], got $k — bloomCell prepends the salt " +
        "digit with no separator, so salts beyond one digit alias " +
        "(salt 1 on key '1x' = salt 11 on key 'x') and correlate the " +
        "hash functions, inflating the false-positive rate")

  /** Probe a [[buildBloom]] artifact: appends `maybe_member` — true
    * iff every one of the key's k bits is set. No false negatives; a
    * deterministic false-positive minority goes on to the verifying
    * join (callers prune that join to `maybe_member` rows, which is
    * the entire point — the corpus-sized side is touched only by the
    * candidate subset). One batch pass: k-cell explode, ONE broadcast
    * join of the config-sized bitmap, per-key then per-doc rollup.
    * Null keys probe no cells and come back `maybe_member = false`.
    * Duplicate (`idCol`, `keyCol`) rows are collapsed first (a
    * replayed row must not double its cells — `sum === k` would
    * report a genuine member as false); duplicate ids carrying
    * DIFFERENT keys FAIL LOUDLY (raise_error in the final rollup) —
    * silently picking one key would make `maybe_member`
    * partition-order-dependent on malformed input, in tension with
    * the no-false-negatives contract, and every other graft entry
    * point refuses ambiguity rather than resolving it arbitrarily.
    * The id→key functional dependency is the upstream contract (ids
    * are content-hash grain); this guard just makes a breach loud.
    * Costs one extra micro-batch-grain exchange vs the single-rollup
    * form (the (id, key) aggregate reuses the dedup's partitioning;
    * the id-grain rollup re-keys) — batch-proportional, never
    * corpus. */
  def probeBloom(batch: DataFrame, keyCol: String, idCol: String,
      bloom: DataFrame, mBits: Int = 1 << 20, k: Int = 3): DataFrame = {
    require(mBits > 0 && mBits % 32 == 0,
      s"mBits must be a positive multiple of 32, got $mBits")
    requireBloomK(k)
    bloom.schema.fields.find(_.name == "bits").map(_.metadata)
      .filter(_.contains("mBits")).foreach { m =>
        require(m.getLong("mBits") == mBits && m.getLong("k") == k,
          s"probeBloom: bloom artifact was built with mBits=" +
            s"${m.getLong("mBits")}, k=${m.getLong("k")} but probing " +
            s"was invoked with $mBits/$k — bits would re-hash into " +
            "the wrong space")
      }
    batch
      .dropDuplicates(Seq(idCol, keyCol))
      .select(col(idCol), col(keyCol).as("__key"),
        explode_outer(when(col(keyCol).isNotNull, array((0 until k).map(s =>
          bloomCell(col(keyCol), s, mBits)): _*))).as("__h"))
      .withColumn("__w", expr("__h div 32"))
      .join(broadcast(bloom.select(col("word").as("__w"),
        col("bits").cast("long").as("__bits"))), Seq("__w"), "left")
      .withColumn("__hit",
        (coalesce(col("__bits"), lit(0L))
          .bitwiseAND(expr("shiftleft(CAST(1 AS BIGINT), CAST(__h % 32 AS INT))"))) =!= 0)
      .groupBy(col(idCol), col("__key"))
      .agg((sum(when(col("__hit"), 1L).otherwise(0L)) === k)
        .as("__key_member"))
      .groupBy(col(idCol))
      .agg(max(col("__key_member")).as("__mm"), count(lit(1)).as("__nk"))
      .select(col(idCol),
        when(col("__nk") > 1, raise_error(concat(
            lit("probeBloom: id "), col(idCol).cast("string"),
            lit(" carries conflicting keys — ids must be key-grain " +
              "(one key per id); dedupe upstream or probe at key grain"))))
          .otherwise(col("__mm")).as("maybe_member"))
  }

  /** The composed exact-membership ingest flow (d49): corpus content
    * fingerprints → [[buildBloom]] (localized through the provably
    * mBits/32-bounded driver hop so reuse never re-runs the corpus
    * aggregate), batch probed, and the bloom's false positives
    * settled by the verifying join — whose corpus side is semi-joined
    * by the BROADCAST candidate keys, so the full corpus is scanned
    * once (projected to its 32-hex fingerprint) and shuffles nothing.
    * Returns (idCol, maybe_member, is_member): `maybe_member` is the
    * filter's verdict, `is_member` the verified truth. The probe
    * frame is referenced twice (candidate derivation + final join),
    * so Spark re-runs the BATCH-grain aggregate once more — one extra
    * pass over the micro-batch, never the corpus; callers holding a
    * large batch persist it first. */
  def exactMembership(corpus: DataFrame, batch: DataFrame,
      textCol: String, idCol: String, mBits: Int = 1 << 20,
      k: Int = 3): DataFrame = {
    val bloom = TextAnalysis.localizeStats(
      buildBloom(corpus.select(md5(col(textCol)).as("__key")), "__key",
        mBits, k))
    val probed = probeBloom(
      batch.select(col(idCol), md5(col(textCol)).as("__key")),
      "__key", idCol, bloom, mBits, k)
    val candidates = probed.filter(col("maybe_member"))
      .join(batch.select(col(idCol), md5(col(textCol)).as("__key")),
        Seq(idCol))
      .select(col(idCol), col("__key"))
    val confirmed = corpus.select(md5(col(textCol)).as("__key"))
      .join(broadcast(candidates), Seq("__key"))
      .select(col(idCol)).distinct()
      .withColumn("is_member", lit(true))
    probed.join(broadcast(confirmed), Seq(idCol), "left")
      .select(col(idCol), col("maybe_member"),
        coalesce(col("is_member"), lit(false)).as("is_member"))
  }

  /** Persist/extend a [[buildBloom]] artifact at `path` (parquet —
    * the (mBits, k) config survives the footer round-trip in `bits`'
    * column metadata): fold `df`'s keys in by per-word OR. OR is
    * idempotent, so at-least-once delivery has exactly-once artifact
    * effect with ZERO bookkeeping — no anti-join, no delivery log —
    * which is what makes the bloom the cheapest incrementally
    * maintained dedup index (the band index needs its bucket-pruned
    * idempotence probe; this needs nothing). The merged frame
    * localizes through the provably mBits/32-bounded driver hop
    * BEFORE any write, so the rewrite never reads the path it
    * replaces.
    *
    * The rewrite is STAGED so no crash point leaves zero copies of
    * the membership artifact (a lost bloom means a full corpus
    * re-aggregation to rebuild it): the merged bitmap is written to
    * `path__stage` first, and the live directory is deleted only
    * after the stage has COMMITTED (`_SUCCESS`), then the stage
    * renamed into place — at every instant either the live artifact
    * or a committed full stage exists. An interrupted swap
    * self-heals at the next [[mergeBloomInto]] or [[loadBloom]]: a
    * committed stage with no live directory is promoted (it holds
    * the full merged bitmap); a leftover stage NEXT TO a live
    * directory is a merge that crashed before its swap began and is
    * discarded — OR-idempotence means the redelivered batch simply
    * redoes that merge, losing nothing. */
  def mergeBloomInto(path: String, df: DataFrame, keyCol: String,
      mBits: Int = 1 << 20, k: Int = 3): Unit = {
    val spark = df.sparkSession
    val add = buildBloom(df, keyCol, mBits, k)
    // existence through the Hadoop FS API, not java.io.File: the path
    // may live on any Hadoop filesystem (hdfs://, s3a://) — a local-FS
    // check is always false there and would silently REPLACE the
    // accumulated bloom with only this batch's bits (lost membership
    // bits = missed exact duplicates, violating the no-false-negatives
    // contract)
    val hadoopPath = new org.apache.hadoop.fs.Path(path)
    val fs = hadoopPath.getFileSystem(spark.sessionState.newHadoopConf())
    healBloomSwap(fs, path)
    val merged =
      if (fs.exists(hadoopPath)) {
        val existing = spark.read.parquet(path)
        existing.schema.fields.find(_.name == "bits").map(_.metadata)
          .filter(_.contains("mBits")).foreach { m =>
            require(m.getLong("mBits") == mBits && m.getLong("k") == k,
              s"mergeBloomInto: artifact at $path was built with mBits=" +
                s"${m.getLong("mBits")}, k=${m.getLong("k")} but the " +
                s"merge was invoked with $mBits/$k")
          }
        val cfg = new org.apache.spark.sql.types.MetadataBuilder()
          .putLong("mBits", mBits.toLong).putLong("k", k.toLong).build()
        existing.select(col("word"), col("bits")).unionByName(add)
          .groupBy("word")
          .agg(expr("bit_or(bits)").as("bits", cfg))
      } else add
    val stage = bloomStage(path)
    TextAnalysis.localizeStats(merged)
      .write.mode("overwrite").parquet(stage.toString)
    // the stage is committed (parquet job commit wrote _SUCCESS):
    // from here the swap is crash-safe — a crash before the delete
    // leaves both copies, between delete and rename leaves the
    // committed stage, and healBloomSwap completes either state
    if (fs.exists(hadoopPath)) { fs.delete(hadoopPath, true); () }
    fs.rename(stage, hadoopPath)
    ()
  }

  /** Read a [[mergeBloomInto]] artifact, completing any interrupted
    * rewrite swap first — the probe-side half of the staging
    * contract (a probe landing between a crash and the next merge
    * still sees one full committed copy). */
  def loadBloom(spark: org.apache.spark.sql.SparkSession,
      path: String): DataFrame = {
    val hadoopPath = new org.apache.hadoop.fs.Path(path)
    val fs = hadoopPath.getFileSystem(spark.sessionState.newHadoopConf())
    healBloomSwap(fs, path)
    spark.read.parquet(path)
  }

  private def bloomStage(path: String) =
    new org.apache.hadoop.fs.Path(path + "__stage")

  /** Self-heal for a [[mergeBloomInto]] swap: live present → any
    * stage is a pre-swap crash, discard it (the redelivered merge
    * redoes it — OR is idempotent); live absent + committed stage →
    * promote it (it is the full merged bitmap); live absent +
    * uncommitted stage → a first-ever merge crashed mid-write with
    * nothing to lose, discard. The live directory is only ever
    * deleted after a committed stage exists, so "live absent,
    * stage absent or uncommitted" cannot strand an artifact. */
  private def healBloomSwap(fs: org.apache.hadoop.fs.FileSystem,
      path: String): Unit = {
    val live = new org.apache.hadoop.fs.Path(path)
    val stage = bloomStage(path)
    if (!fs.exists(stage)) return
    if (fs.exists(live)) {
      fs.delete(stage, true)
      ()
    } else if (fs.exists(
        new org.apache.hadoop.fs.Path(stage, "_SUCCESS"))) {
      fs.rename(stage, live)
      ()
    } else {
      fs.delete(stage, true)
      ()
    }
  }

  /** Jaccard similarity of the distinct-token sets of candidate pairs.
    * `blockCol` is the blocking key (equal values are compared). */
  def jaccardPairs(df: DataFrame, textCol: String, idCol: String,
      blockCol: String, threshold: Double): DataFrame = {
    val base = df.select(col(idCol), col(blockCol),
      TextAnalysis.tokenSet(col(textCol)).as("__tk"))
    val a = base.select(col(idCol).as("a_id"), col(blockCol).as("__a_bk"), col("__tk").as("__a_tk"))
    val b = base.select(col(idCol).as("b_id"), col(blockCol).as("__b_bk"), col("__tk").as("__b_tk"))
    val inter = size(array_intersect(col("__a_tk"), col("__b_tk")))
    // symmetric alias-projections + shuffle hints: the two block-key
    // exchanges canonicalize identically, so the tokenization runs once
    // and the other side is a ReusedExchange (see bandSelfJoin).
    a.hint("shuffle_hash")
      .join(b.hint("shuffle_hash"),
        col("__a_bk") === col("__b_bk") && col("a_id") < col("b_id"))
      .withColumn("jaccard",
        inter.cast("double") / (size(col("__a_tk")) + size(col("__b_tk")) - inter))
      .filter(col("jaccard") > threshold)
      .select("a_id", "b_id", "jaccard")
  }
}
