package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling and dataset-split operators for training-data
  * pipelines. Everything keys off a stable md5 hash of the row id, so:
  *
  *  - assignments are reproducible across runs, engines, and cluster
  *    sizes (no RNG, no partition-order dependence — `df.sample` gives
  *    neither);
  *  - splits are CONSISTENT under corpus growth: a document keeps its
  *    split when new data arrives, which is what keeps eval sets
  *    uncontaminated across pipeline re-runs;
  *  - every operator is a narrow codegen'd projection/filter — no
  *    shuffle, no driver round-trip, pushdown-friendly at any scale.
  *
  * The hash bucket is the first 48 bits of md5(id) mod `buckets` —
  * identical to DuckDB's `('0x' || substr(md5(id::VARCHAR), 1, 12))::BIGINT`,
  * so an external oracle reproduces assignments bit-for-bit.
  */
object Sampling {

  /** Stable bucket in [0, buckets) from the md5 of the id rendered as a
    * decimal string. 48 bits keeps the value exact in a signed 64-bit
    * long (and in DuckDB's BIGINT parse of the same hex). */
  def hashBucket(id: Column, buckets: Int): Column =
    pmod(conv(substring(md5(id.cast("string")), 1, 12), 16, 10).cast("long"),
      lit(buckets.toLong))

  /** Split assignment from integer weights over a `buckets`-wide hash
    * space, e.g. Seq("train" -> 80, "val" -> 10, "test" -> 10) with
    * buckets = 100. Weights must sum to `buckets` so every row lands in
    * exactly one split. */
  def assignSplit(df: DataFrame, idCol: String,
      weights: Seq[(String, Int)], buckets: Int = 100,
      bucketCol: String = "bucket", splitCol: String = "split"): DataFrame = {
    require(weights.map(_._2).sum == buckets,
      s"split weights ${weights.map(_._2).sum} != bucket count $buckets")
    val bounds = weights.scanLeft(0)(_ + _._2).tail
    val b = col(bucketCol)
    val splitExpr = weights.zip(bounds).init.foldRight(lit(weights.last._1): Column) {
      case (((name, _), hi), els) => when(b < hi, name).otherwise(els)
    }
    // a null id hashes to a null bucket; without the guard it would
    // silently land in the LAST split instead of surfacing as null
    df.withColumn(bucketCol, hashBucket(col(idCol), buckets))
      .withColumn(splitCol, when(b.isNotNull, splitExpr))
  }

  /** Deterministic ~`num`/`den` sample: keeps rows whose hash bucket
    * (over `den` buckets) falls below `num`. Stable under re-runs and
    * corpus growth; the filter is a codegen'd projection that pushes
    * past column pruning like any other predicate. */
  def sampleByHash(df: DataFrame, idCol: String, num: Int, den: Int): DataFrame =
    df.filter(hashBucket(col(idCol), den) < num)

  /** Deterministic per-row shuffle key: md5 of the id — an unbiased,
    * reproducible random order (the id itself would be insertion order).
    * Hex strings compare identically everywhere, so external oracles
    * reproduce the selection. */
  private def shuffleKey(id: Column): Column = md5(id.cast("string"))

  /** Frame extended with the shuffle key and its ORDER-PRESERVING
    * prefix bucket: the integer value of the key's first `chars` hex
    * digits. Lexicographic order of the fixed-length lowercase-hex key
    * is (prefix value, rest of key) order, so any group-wide scan in
    * shuffle-key order decomposes exactly into a per-(group, bucket)
    * scan plus a per-group combine over one row per bucket — 16^chars
    * configuration-sized rows, never the data. This is what keeps the
    * group-keyed samplers off the single-task-per-group window: group
    * keys (languages, crawl sources) are low-cardinality by design, so
    * at corpus scale the dominant group IS the corpus. */
  private def withShuffleBuckets(df: DataFrame, idCol: String,
      prefixChars: Int): DataFrame = {
    require(prefixChars >= 1 && prefixChars <= 8,
      s"prefixChars must be in [1, 8], got $prefixChars")
    df.withColumn("__mk", shuffleKey(col(idCol)))
      .withColumn("__pb",
        conv(substring(col("__mk"), 1, prefixChars), 16, 10).cast("long"))
  }

  /** Corpus balancing: keep at most `cap` rows per `groupCol` value,
    * chosen in deterministic md5-shuffled order (ties: id) — the
    * "cap each domain" step that stops one crawl source from dominating
    * a training mix.
    *
    * Two-level plan, no group-wide sort: rows rank inside their
    * (group, md5-prefix-bucket) window in parallel, bucket row-counts
    * prefix-sum per group (one row per bucket — the only group-keyed
    * window, over ≤ 16^prefixChars aggregate rows), and the exact
    * group-wide rank is bucket offset + in-bucket rank, recovered by a
    * broadcast join. Rows past the cap within their own bucket are
    * pruned before the join (the offset only grows the rank), and
    * buckets whose offset already exceeds the cap drop out of the
    * broadcast side entirely. */
  def quotaPerGroup(df: DataFrame, idCol: String, groupCol: String,
      cap: Int, prefixChars: Int = 2): DataFrame = {
    require(cap > 0, s"cap must be positive, got $cap")
    val withB = withShuffleBuckets(df, idCol, prefixChars)
    val wIn = Window.partitionBy(col(groupCol), col("__pb"))
      .orderBy(col("__mk"), col(idCol))
    val wOff = Window.partitionBy(col(groupCol)).orderBy(col("__pb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val offsets = withB.groupBy(col(groupCol), col("__pb"))
      .agg(count(lit(1)).as("__c"))
      .withColumn("__off", sum("__c").over(wOff) - col("__c"))
      .filter(col("__off") < cap)
      .select(col(groupCol).as("__g"), col("__pb").as("__opb"), col("__off"))
    // <=> on the group key: a null group is still a group (the old
    // single-window form capped it; a plain equi-join would drop it)
    withB.withColumn("__rn", row_number().over(wIn))
      .filter(col("__rn") <= cap)
      .join(broadcast(offsets),
        col(groupCol) <=> col("__g") && col("__pb") === col("__opb"))
      .filter(col("__off") + col("__rn") <= cap)
      .drop("__mk", "__pb", "__rn", "__g", "__opb", "__off")
  }

  /** [[quotaPerGroup]] with PER-GROUP caps from a frame — the
    * reputation-weighted form: published web stacks don't cap every
    * domain equally, they admit more from high-centrality hosts
    * (CommonCrawl-ranking-style priors, [[GraphOps.pageRank]]) and
    * zero out the junk tail. `caps` is one row per group value
    * (`groupCol`, `capCol`); group-grain = vocabulary-plateau scale,
    * so it BROADCASTS. A group absent from `caps` gets `defaultCap`;
    * cap <= 0 drops the group entirely (the rank-gated junk tail).
    * Same two-level prefix-bucket scan as [[quotaPerGroup]] — no
    * group-wide window, so one dominant domain cannot serialize the
    * job; the only additions are the broadcast cap join and the
    * per-bucket cap carried into the offset prune.
    *
    * `caps` must be UNIQUE per group (a duplicate would silently
    * duplicate survivors through the join) — validated eagerly here,
    * a group-grain action by contract. */
  def quotaPerGroupBy(df: DataFrame, idCol: String, groupCol: String,
      caps: DataFrame, capCol: String = "cap", defaultCap: Long = 0L,
      prefixChars: Int = 2): DataFrame = {
    require(defaultCap >= 0, s"defaultCap must be >= 0, got $defaultCap")
    val dup = caps.groupBy(col(groupCol)).agg(count(lit(1)).as("__n"))
      .filter(col("__n") > 1).limit(1).collect()
    require(dup.isEmpty,
      s"quotaPerGroupBy: caps frame has duplicate rows for group " +
        s"'${dup.headOption.map(_.get(0)).orNull}' — one row per group " +
        "value required (survivors would silently duplicate)")
    val capped = broadcast(caps.select(col(groupCol).as("__cg"),
      col(capCol).cast("long").as("__cap")))
    val withB = withShuffleBuckets(df, idCol, prefixChars)
      .join(capped, col(groupCol) <=> col("__cg"), "left")
      .withColumn("__cap", coalesce(col("__cap"), lit(defaultCap)))
      .drop("__cg")
    val wIn = Window.partitionBy(col(groupCol), col("__pb"))
      .orderBy(col("__mk"), col(idCol))
    val wOff = Window.partitionBy(col(groupCol)).orderBy(col("__pb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val offsets = withB.groupBy(col(groupCol), col("__pb"))
      .agg(count(lit(1)).as("__c"), first(col("__cap")).as("__bcap"))
      .withColumn("__off", sum("__c").over(wOff) - col("__c"))
      .filter(col("__off") < col("__bcap"))
      .select(col(groupCol).as("__g"), col("__pb").as("__opb"),
        col("__off"))
    withB.withColumn("__rn", row_number().over(wIn))
      .filter(col("__rn") <= col("__cap"))
      .join(broadcast(offsets),
        col(groupCol) <=> col("__g") && col("__pb") === col("__opb"))
      .filter(col("__off") + col("__rn") <= col("__cap"))
      .drop("__mk", "__pb", "__rn", "__g", "__opb", "__off", "__cap")
  }

  /** Corpus balancing by token budget: walk each group in deterministic
    * md5-shuffled order and keep rows while the group's running
    * `tokensCol` total stays within `budget` (the first row of a group
    * is kept even if it alone exceeds the budget — an all-or-nothing
    * budget would silently drop whole groups). Emits the running total
    * as `cumCol` for audit.
    *
    * Same two-level scan as [[quotaPerGroup]] (and Packing.prefixSum),
    * keyed by (group, md5-prefix-bucket): the in-bucket running sum is
    * fully parallel, bucket totals prefix-sum per group over
    * configuration-sized aggregate rows, and the exact group-wide
    * running total is offset + local sum. Buckets starting at or past
    * the budget are pruned from the broadcast side — their rows cannot
    * start under budget (the group's first row lives in its first
    * bucket, at offset 0, so the keep-the-first-row guarantee
    * survives).
    *
    * `tokensCol` must be NON-NEGATIVE: the bucket pruning above is only
    * equivalent to a single group-wide running sum when the running
    * total is monotone. A negative count would make later rows re-enter
    * the budget and the pruned form silently drop rows the monotone form
    * keeps — so negative values fail the whole job with an explicit
    * error instead (a codegen'd guard on the scan, not an extra pass).
    * Null token counts pass through: their rows are dropped by the
    * running-sum filters, same as the single-window form. */
  def tokenBudgetPerGroup(df: DataFrame, idCol: String, groupCol: String,
      tokensCol: String, budget: Long, cumCol: String = "cum_tokens",
      prefixChars: Int = 2): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val guarded = df.withColumn(tokensCol,
      when(col(tokensCol) >= 0 || col(tokensCol).isNull, col(tokensCol))
        .otherwise(raise_error(concat(
          lit(s"tokenBudgetPerGroup: negative $tokensCol ("),
          col(tokensCol).cast("string"),
          lit(") breaks the monotone running sum the bucket pruning relies on")))))
    val withB = withShuffleBuckets(guarded, idCol, prefixChars)
    val wIn = Window.partitionBy(col(groupCol), col("__pb"))
      .orderBy(col("__mk"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wOff = Window.partitionBy(col(groupCol)).orderBy(col("__pb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val offsets = withB.groupBy(col(groupCol), col("__pb"))
      .agg(sum(col(tokensCol)).as("__t"))
      .withColumn("__off", sum("__t").over(wOff) - col("__t"))
      .filter(col("__off") < budget)
      .select(col(groupCol).as("__g"), col("__pb").as("__opb"), col("__off"))
    withB.withColumn("__local", sum(col(tokensCol)).over(wIn))
      .filter(col("__local") - col(tokensCol) < budget)
      .join(broadcast(offsets),
        col(groupCol) <=> col("__g") && col("__pb") === col("__opb"))
      .withColumn(cumCol, col("__off") + col("__local"))
      .filter(col(cumCol) - col(tokensCol) < budget)
      .drop("__mk", "__pb", "__local", "__g", "__opb", "__off")
  }

  /** Deterministic shuffle-shard assignment for training-data writers:
    * `shard` = [[hashBucket]](id, nShards) and `position` = the row's
    * 0-based dense rank within its shard in md5-shuffled order — the
    * "global shuffle, shard, stable within-shard order" step a
    * dataloader-facing writer needs, reproducible at any parallelism.
    *
    * Shards are CONFIGURED, not data-bounded: at corpus scale one
    * shard is corpus/nShards rows — far too big for the single-task
    * sort a bare `Window.partitionBy(shard)` would plan — so the rank
    * runs the same two-level (shard, md5-prefix-bucket) scan as
    * [[quotaPerGroup]]. The broadcast offset table is
    * nShards × 16^prefixChars small rows; size prefixChars so that
    * stays a few MB. */
  def shardAssignments(df: DataFrame, idCol: String, nShards: Int,
      prefixChars: Int = 2): DataFrame = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    val withB = withShuffleBuckets(df, idCol, prefixChars)
      .withColumn("__shard", hashBucket(col(idCol), nShards))
    val wIn = Window.partitionBy(col("__shard"), col("__pb"))
      .orderBy(col("__mk"), col(idCol))
    val wOff = Window.partitionBy(col("__shard")).orderBy(col("__pb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val offsets = withB.groupBy(col("__shard"), col("__pb"))
      .agg(count(lit(1)).as("__c"))
      .withColumn("__off", sum("__c").over(wOff) - col("__c"))
      .select(col("__shard").as("__os"), col("__pb").as("__opb"), col("__off"))
    withB.withColumn("__rn", row_number().over(wIn))
      .join(broadcast(offsets),
        col("__shard") === col("__os") && col("__pb") === col("__opb"))
      .withColumn("shard", col("__shard"))
      .withColumn("position", col("__off") + col("__rn") - 1)
      .drop("__mk", "__pb", "__rn", "__shard", "__os", "__opb", "__off")
  }

  /** Temperature-flattened source mixing: keep AT MOST `totalTarget`
    * rows overall, allocated per `groupCol` value proportionally to
    * n_g^(1/2) — the standard α=0.5 temperature-sampling step that
    * upweights rare sources/languages relative to their natural share
    * (α=1 reproduces the corpus mix, α→0 approaches uniform). Rows
    * within a group are chosen in deterministic md5-shuffled order.
    * The sum of targets systematically undershoots `totalTarget`: the
    * integer floor division leaves a remainder of up to #groups−1 rows
    * undistributed (deliberately — largest-remainder redistribution
    * would reintroduce the cross-engine tie-break hazard the integer
    * arithmetic exists to avoid), and a group smaller than its target
    * contributes only its size.
    *
    * Weights are INTEGER square roots (`floor(sqrt(n_g))` as BIGINT):
    * IEEE sqrt is correctly rounded in every engine, so the weights —
    * and therefore the integer-division targets — reproduce bit-for-bit
    * in an external oracle, with no float-summation-order hazard (a
    * double Σ n_g^α could round differently per engine and flip a
    * ceil at a boundary). A group's target never exceeds its size.
    * With `weightCol` (integral, enforced), a group's mass is Σ weight
    * instead of its row count — the token-weighted form of the
    * published mixes — while targets and caps stay in rows.
    *
    * Scale shape: the corpus is touched exactly TWICE, both times over
    * the same (group, md5-prefix-bucket) exchange (ReusedExchange, the
    * d16/d25 lesson): once for the bucket-count aggregate and once for
    * the row-rank window. Group counts, sqrt weights, the grand total
    * (a single-partition window over #groups rows — configuration-
    * sized, never the data; NB "__W" would silently REPLACE "__w"
    * under Spark's default case-insensitive column resolution, hence
    * "__tw"), and the per-group targets all derive from that one
    * bucket aggregate; the targets then ride the broadcast offset
    * table exactly like [[quotaPerGroup]]'s caps — no group-wide sort,
    * no second corpus scan, at any size.
    *
    * The selection deliberately DUPLICATES quotaPerGroup's two-level
    * machinery instead of sharing a caps-frame helper: a LITERAL cap
    * compiles to a partial WindowGroupLimit below the rank exchange
    * (only ~cap rows per bucket shuffle with their payload —
    * plan-pinned for d17), and a cap that arrives via a join cannot.
    * Unifying the two would silently strip that map-side prune from
    * the quota path. */
  def temperatureMix(df: DataFrame, idCol: String, groupCol: String,
      totalTarget: Long, prefixChars: Int = 2,
      targetCol: String = "mix_target",
      weightCol: Option[String] = None): DataFrame = {
    require(totalTarget > 0, s"totalTarget must be positive, got $totalTarget")
    // published mixes weight sources by TOKEN mass, not document count:
    // an optional integer weight column sizes each group by Σ weight
    // instead of row count before the sqrt flattening. INTEGER weights
    // only — the bit-exactness argument (exact integer Σ, correctly-
    // rounded IEEE sqrt, integer division) collapses the moment a
    // float-summation order can differ between engines. Targets and
    // caps stay in ROWS: the weight shapes the allocation, the
    // selection still keeps whole documents.
    weightCol.foreach { w =>
      import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
      require(Set[org.apache.spark.sql.types.DataType](
          ByteType, ShortType, IntegerType, LongType)(df.schema(w).dataType),
        s"weightCol $w must be integral for bit-exact targets, " +
          s"got ${df.schema(w).dataType}")
    }
    val withB = withShuffleBuckets(df, idCol, prefixChars)
    // the weighted bucket aggregate carries one extra column (__cw);
    // it exists ONLY on the weighted path because the offsets branch
    // prunes it away, which de-canonicalizes the two bucketCounts
    // subtrees and silently breaks their ReusedExchange — adding it
    // unconditionally cost d29/p04 one exchange each (caught by the
    // SHUFFLE_BASELINE regeneration in r13)
    val bucketCounts = weightCol match {
      case None => withB.groupBy(col(groupCol), col("__pb"))
        .agg(count(lit(1)).as("__c"))
      case Some(w) =>
        // null/negative weights fail LOUDLY here, matching the loud
        // integral-type require above: a null silently shrinks its
        // group's mass, and a negative sum makes sqrt return NaN —
        // __w casts to null and the group silently vanishes from the
        // mix instead of erroring
        val guardedW = when(col(w).isNull || col(w) < 0,
          raise_error(concat(lit(s"temperatureMix: $w must be a "),
            lit("non-null, non-negative weight, got "),
            coalesce(col(w).cast("string"), lit("NULL"))))).otherwise(col(w))
        withB.groupBy(col(groupCol), col("__pb"))
          .agg(count(lit(1)).as("__c"), sum(guardedW).as("__cw"))
    }
    val targets = (weightCol match {
      case None => bucketCounts.groupBy(col(groupCol))
        .agg(sum("__c").as("__n"))
        .withColumn("__w", floor(sqrt(col("__n"))).cast("long"))
      case Some(_) => bucketCounts.groupBy(col(groupCol))
        .agg(sum("__c").as("__n"), sum("__cw").as("__nw"))
        .withColumn("__w", floor(sqrt(col("__nw"))).cast("long"))
        .drop("__nw")
    })
      .withColumn("__tw", sum(col("__w")).over(Window.partitionBy(lit(0))))
      .withColumn(targetCol,
        least(col("__n"), expr(s"(${totalTarget}L * __w) div __tw")))
      .select(col(groupCol).as("__tg"), col(targetCol))
    val wIn = Window.partitionBy(col(groupCol), col("__pb"))
      .orderBy(col("__mk"), col(idCol))
    val wOff = Window.partitionBy(col(groupCol)).orderBy(col("__pb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val offsets = bucketCounts
      .withColumn("__off", sum("__c").over(wOff) - col("__c"))
      .join(broadcast(targets), col(groupCol) <=> col("__tg"))
      .filter(col("__off") < col(targetCol))
      .select(col(groupCol).as("__g"), col("__pb").as("__opb"),
        col("__off"), col(targetCol))
    withB.withColumn("__rn", row_number().over(wIn))
      .join(broadcast(offsets),
        col(groupCol) <=> col("__g") && col("__pb") === col("__opb"))
      .filter(col("__off") + col("__rn") <= col(targetCol))
      .drop("__mk", "__pb", "__rn", "__g", "__opb", "__off")
  }

  /** Deterministic upsampling: emit `factors(group)` copies of every
    * row in a mapped group (1 copy when unmapped), with a 1-based
    * `copyCol` index distinguishing repeats — the "repeat high-quality
    * sources N epochs" mix step. A narrow explode of a literal-bounded
    * sequence: output scales with the factor, never with a shuffle. */
  def upsample(df: DataFrame, groupCol: String, factors: Map[String, Int],
      copyCol: String = "copy"): DataFrame = {
    require(factors.values.forall(_ >= 1), s"factors must be >= 1: $factors")
    val factor = factors.foldLeft(lit(1)) { case (acc, (g, f)) =>
      when(col(groupCol) === g, f).otherwise(acc)
    }
    df.withColumn(copyCol, explode(sequence(lit(1), factor)))
  }

  /** Per-stratum deterministic sampling: `fractions` maps a stratum
    * value (of `stratumCol`) to num-out-of-`den` keep rates; strata
    * absent from the map are dropped. The keep decision still keys off
    * the ID hash only, so a row's fate is independent of which strata
    * exist — adding a stratum never resamples another. */
  def sampleStratified(df: DataFrame, idCol: String, stratumCol: String,
      fractions: Map[String, Int], den: Int): DataFrame = {
    val b = hashBucket(col(idCol), den)
    val keep = fractions.foldLeft(lit(false)) { case (acc, (s, num)) =>
      acc || (col(stratumCol) === s && b < num)
    }
    df.filter(keep)
  }

  /** Exact global 1-based rank of every row in (`orderCol`, `idCol`)
    * ascending order — the VALUE-ordered complement of the md5-order
    * two-level rank the samplers use, for the operators that need a
    * real sort order (quantile thresholds, score-band splits,
    * curriculum ordering).
    *
    * Never `row_number` over an unpartitioned window (one task holds
    * the corpus). Instead: range-repartition on the total order
    * (contiguous ordered ranges per partition), sort within partitions,
    * read off a per-partition dense local index from
    * `monotonically_increasing_id` (its value is partitionId·2^33 +
    * local position — the local position IS the within-partition rank
    * once the partition is sorted), then add broadcast per-partition
    * offsets (one config-sized count aggregate). The tie-broken
    * (orderCol, idCol) pair makes the output exactly `row_number()
    * OVER (ORDER BY orderCol, id)` regardless of where the sampled
    * range boundaries fall, so the nondeterminism of range sampling
    * never reaches the result.
    *
    * Null order values rank FIRST (Spark's ascending default); an
    * external mirror must say `ORDER BY o NULLS FIRST` explicitly —
    * DuckDB's default is NULLS LAST.
    *
    * Returns a NARROW rank-index frame — (idCol, orderCol, rankCol)
    * only, deliberately: the rank machinery touches two columns, so
    * the one corpus-keyed range exchange carries two columns and both
    * its consumers (the offset aggregate and the rank projection) read
    * identical subtrees — payload would de-canonicalize them under
    * column pruning and shuffle the corpus body twice. Callers that
    * need the payload join back on the id (or, most often, just use
    * the index frame as the artifact it is). */
  def rankByValue(df: DataFrame, orderCol: String, idCol: String,
      rankCol: String = "global_rank", partitions: Int = 0): DataFrame =
    ranked(df, orderCol, idCol, rankCol, partitions)._1

  /** [[rankByValue]]'s machinery, also exposing the config-sized
    * per-partition count frame (`__pid`, `__c`) so callers needing the
    * corpus total ([[scoreBandSplit]]) derive it from the rank
    * exchange instead of paying a second full scan of `df`. */
  private def ranked(df: DataFrame, orderCol: String, idCol: String,
      rankCol: String, partitions: Int): (DataFrame, DataFrame) = {
    val narrow = df.select(col(orderCol), col(idCol))
    val parted = (if (partitions > 0)
        narrow.repartitionByRange(partitions, col(orderCol), col(idCol))
      else narrow.repartitionByRange(col(orderCol), col(idCol)))
      .sortWithinPartitions(col(orderCol), col(idCol))
      .withColumn("__mid", monotonically_increasing_id())
      .withColumn("__pid", shiftrightunsigned(col("__mid"), 33))
      .withColumn("__loc", col("__mid").bitwiseAND(lit((1L << 33) - 1)))
    val counts = parted.groupBy("__pid")
      .agg((max(col("__loc")) + 1).as("__c"))
    val offsets = counts
      .withColumn("__off", sum("__c").over(Window.orderBy("__pid")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)) - col("__c"))
      .select(col("__pid").as("__opid"), col("__off"))
    val rk = parted.join(broadcast(offsets), col("__pid") <=> col("__opid"))
      .select(col(idCol), col(orderCol),
        (col("__off") + col("__loc") + 1).as(rankCol))
    // CORRECTNESS, not just cost, rides on ReusedExchange unifying the
    // offsets and rank-projection consumers of the range exchange:
    // RangePartitioner boundaries are seeded per-RDD, so if a future
    // pruning/AQE change de-canonicalized the two subtrees, offsets and
    // local indexes would come from INDEPENDENTLY-SAMPLED partitionings
    // and ranks silently corrupt. Assert the precondition (identical
    // canonicalized repartition subtrees) at plan-build time for every
    // caller, not just the d36 plan test. The check is scoped to the
    // TOPMOST repartition under each side of the offsets join — the
    // two copies of the range exchange ranked() itself built — so a
    // caller whose input df legally carries its own upstream
    // repartition (deeper in both subtrees) cannot trip it.
    import org.apache.spark.sql.catalyst.plans.logical.{Join, RepartitionByExpression}
    val sides = rk.queryExecution.optimizedPlan.collectFirst {
      case j: Join => Seq(j.left, j.right)
    }.getOrElse(Seq.empty)
    val repVariants = sides.flatMap(_.collectFirst {
      case r: RepartitionByExpression => r.canonicalized
    }).distinct
    // On failure, carry (truncated) canonicalized variant trees in the
    // message itself — no filesystem side effects from library code.
    def variantDump: String = repVariants.zipWithIndex.map { case (v, i) =>
      val s = v.toString
      s"\n--- variant $i ---\n${s.take(4000)}${if (s.length > 4000) "\n…[truncated]" else ""}"
    }.mkString
    require(sides.size == 2 && repVariants.size == 1,
      s"rankByValue: the two range-exchange subtrees no longer " +
        s"canonicalize identically (sides=${sides.size}, " +
        s"variants=${repVariants.size}) — offsets and ranks would " +
        "derive from independently-sampled partitionings and silently " +
        "corrupt. One known trigger: an input lineage containing a " +
        "persist()ed frame can be cache-substituted on ONE side only " +
        "(seen under non-adaptive planning in p12) — checkpoint the " +
        "score frame before ranking so both subtrees bottom at the " +
        s"same materialized rows.$variantDump")
    (rk, counts)
  }

  /** CCNet-style score-band split: every id labeled head/middle/tail
    * by exact thirds of the corpus in (`orderCol`, `idCol`) ascending
    * order (CCNet buckets by perplexity — LOW score = head = best).
    * Built on [[rankByValue]], and narrow like it: returns (id, order,
    * band). Band boundaries are exact integer arithmetic over the rank
    * and the corpus count (a one-row broadcast), so the assignment is
    * engine-reproducible; thirds are row_number-exact, not ntile
    * approximations (the boundary arithmetic gives remainder rows to
    * the EARLIER bands — n=10 splits 4/3/3). The corpus count derives
    * from the rank machinery's config-sized per-partition counts, not
    * a second full scan of `df`. */
  def scoreBandSplit(df: DataFrame, orderCol: String, idCol: String,
      bandCol: String = "band"): DataFrame = {
    val (rk, counts) = ranked(df, orderCol, idCol, "__rank", 0)
    val n = counts.agg(sum("__c").as("__nn"))
    rk.crossJoin(broadcast(n))
      .withColumn(bandCol,
        when((col("__rank") - 1) * 3 < col("__nn"), "head")
          .when((col("__rank") - 1) * 3 < col("__nn") * 2, "middle")
          .otherwise("tail"))
      .drop("__rank", "__nn")
  }
}
