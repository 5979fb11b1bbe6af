package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Contract tests for the deterministic sampling/split operators and the
  * distributed prefix-sum / sequence-packing primitives. */
class SamplingPackingSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs = (0L until 200L).map(i => (i, s"w$i " * (i % 7 + 1).toInt))
    .toDF("doc_id", "text")

  test("assignSplit rejects weights that do not cover the bucket space") {
    intercept[IllegalArgumentException] {
      Sampling.assignSplit(docs, "doc_id", Seq("train" -> 80, "val" -> 10))
    }
  }

  test("assignSplit partitions the corpus and matches bucket ranges") {
    val out = Sampling.assignSplit(docs, "doc_id",
      Seq("train" -> 80, "val" -> 10, "test" -> 10)).collect()
    assert(out.length == 200)
    out.foreach { r =>
      val b = r.getAs[Long]("bucket")
      val expected = if (b < 80) "train" else if (b < 90) "val" else "test"
      assert(r.getAs[String]("split") == expected, s"bucket $b")
    }
    val bySplit = out.groupBy(_.getAs[String]("split")).view.mapValues(_.length)
    assert(bySplit.keySet == Set("train", "val", "test"))
    assert(bySplit("train") > bySplit("val"))
  }

  test("split assignment is stable under corpus growth (subset invariance)") {
    val full = Sampling.assignSplit(docs, "doc_id",
      Seq("train" -> 90, "test" -> 10))
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    val subset = Sampling.assignSplit(docs.filter($"doc_id" < 50), "doc_id",
      Seq("train" -> 90, "test" -> 10))
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    subset.foreach { case (id, s) => assert(full(id) == s, s"doc $id resplit") }
  }

  test("sampleByHash is deterministic and roughly proportional") {
    val a = Sampling.sampleByHash(docs, "doc_id", 1, 10)
      .select("doc_id").as[Long].collect().sorted
    val b = Sampling.sampleByHash(docs, "doc_id", 1, 10)
      .select("doc_id").as[Long].collect().sorted
    assert(a.sameElements(b), "sample changed between runs")
    assert(a.length > 5 && a.length < 60, s"10% of 200 docs gave ${a.length}")
  }

  test("sampleStratified keeps only mapped strata at per-stratum rates") {
    val strat = docs.withColumn("lang", when($"doc_id" % 2 === 0, "en").otherwise("de"))
    val out = Sampling.sampleStratified(strat, "doc_id", "lang",
      Map("en" -> 10), den = 10).collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getAs[String]("lang") == "en"), "unmapped stratum leaked")
    assert(out.length == 100, "en at 10/10 must keep every en row")
  }

  test("quotaPerGroup caps each group deterministically, keeps small groups whole") {
    val df = docs.withColumn("src", when($"doc_id" < 190, $"doc_id" % 2).otherwise(2))
    val out = Sampling.quotaPerGroup(df, "doc_id", "src", cap = 20)
    val counts = out.groupBy("src").count().as[(Long, Long)].collect().toMap
    assert(counts(0L) == 20 && counts(1L) == 20, s"cap not applied: $counts")
    assert(counts(2L) == 10, "group under the cap must be kept whole")
    val again = Sampling.quotaPerGroup(df, "doc_id", "src", cap = 20)
      .select("doc_id").as[Long].collect().sorted
    assert(out.select("doc_id").as[Long].collect().sorted.sameElements(again))
  }

  test("quotaPerGroupBy applies per-group caps; default drops; cap 0 drops; dup caps loud") {
    val df = docs.withColumn("src", $"doc_id" % 4)
    val caps = Seq((0L, 5L), (1L, 0L), (2L, 100L)).toDF("src", "cap")
    val out = Sampling.quotaPerGroupBy(df, "doc_id", "src", caps)
    val counts = out.groupBy("src").count().as[(Long, Long)].collect().toMap
    assert(counts.get(0L).contains(5L), s"weighted cap not applied: $counts")
    assert(!counts.contains(1L), "cap-0 group must drop entirely")
    assert(counts.get(2L).contains(50L), "cap above group size keeps it whole")
    assert(!counts.contains(3L), "group absent from caps gets defaultCap 0")
    // defaultCap admits uncapped groups at the default rate
    val out2 = Sampling.quotaPerGroupBy(df, "doc_id", "src", caps,
      defaultCap = 7L)
    assert(out2.filter($"src" === 3).count() == 7)
    // per-group survivors match the single-window reference selection
    import org.apache.spark.sql.expressions.Window
    val ref = df.withColumn("__rn", row_number().over(
        Window.partitionBy($"src")
          .orderBy(md5($"doc_id".cast("string")), $"doc_id")))
      .join(caps, Seq("src"))
      .filter($"__rn" <= $"cap").select("doc_id")
      .as[Long].collect().sorted
    assert(out.select("doc_id").as[Long].collect().sorted
      .sameElements(ref), "weighted quota diverged from the window form")
    // duplicate caps rows fail loudly
    val e = intercept[IllegalArgumentException] {
      Sampling.quotaPerGroupBy(df, "doc_id", "src",
        caps.union(Seq((0L, 3L)).toDF("src", "cap")))
    }
    assert(e.getMessage.contains("duplicate"), e.getMessage)
  }

  test("tokenBudgetPerGroup keeps rows starting under budget, never drops a whole group") {
    val df = docs.withColumn("grp", $"doc_id" % 3)
      .withColumn("n", $"doc_id" % 5 + 10)
    val out = Sampling.tokenBudgetPerGroup(df, "doc_id", "grp", "n", budget = 100)
      .select($"grp", $"n".cast("long"), $"cum_tokens").as[(Long, Long, Long)].collect()
    assert(out.nonEmpty)
    out.foreach { case (g, n, cum) =>
      assert(cum - n < 100, s"group $g kept a row starting at ${cum - n}")
    }
    assert(out.map(_._1).toSet == Set(0L, 1L, 2L), "a group vanished")
    // a single row larger than the whole budget still survives
    val big = Seq((1L, "g", 500L), (2L, "g", 10L)).toDF("doc_id", "grp", "n")
    val kept = Sampling.tokenBudgetPerGroup(big, "doc_id", "grp", "n", budget = 100)
      .select("doc_id").as[Long].collect()
    assert(kept.length == 1, s"expected only the first-by-hash row, got ${kept.toSeq}")
  }

  test("tokenBudgetPerGroup fails loud on negative token counts") {
    // the two-level pruning is only equivalent to the monotone
    // single-window form when tokens >= 0; silence here would DROP rows
    val bad = docs.withColumn("lang", lit("en"))
      .withColumn("n_tokens", when($"doc_id" === 7, -3).otherwise(lit(5)))
    val e = intercept[Exception] {
      Sampling.tokenBudgetPerGroup(bad, "doc_id", "lang", "n_tokens",
        budget = 1000).collect()
    }
    def chain(t: Throwable): String =
      if (t == null) "" else t.getMessage + "|" + chain(t.getCause)
    assert(chain(e).contains("tokenBudgetPerGroup"), chain(e))
  }

  test("upsample repeats mapped groups with 1-based copy indexes") {
    val df = docs.withColumn("lang", when($"doc_id" % 2 === 0, "de").otherwise("fr"))
    val out = Sampling.upsample(df, "lang", Map("de" -> 3))
      .groupBy("lang", "copy").count().as[(String, Int, Long)].collect()
    val de = out.filter(_._1 == "de").map(c => c._2 -> c._3).toMap
    val fr = out.filter(_._1 == "fr").map(c => c._2 -> c._3).toMap
    assert(de == Map(1 -> 100L, 2 -> 100L, 3 -> 100L), s"de copies: $de")
    assert(fr == Map(1 -> 100L), s"fr copies: $fr")
  }

  test("distributed prefixSum matches the single-window cumulative sum") {
    // sparse, non-contiguous ordering keys across many buckets
    val vals = Seq(3L, 1L, 4L, 1L, 5L, 9L, 2L, 6L, 5L, 3L)
    val df = vals.zipWithIndex.map { case (v, i) => (i * 37L, v) }.toDF("id", "n")
    val got = Packing.prefixSum(df, "id", "n", "cum", bucketSize = 64)
      .select("id", "cum").as[(Long, Long)].collect().toMap
    val expected = vals.zipWithIndex.map { case (_, i) =>
      i * 37L -> vals.take(i + 1).sum
    }.toMap
    assert(got == expected)
    // degenerate bucket sizes agree too
    val one = Packing.prefixSum(df, "id", "n", "cum", bucketSize = 1)
      .select("id", "cum").as[(Long, Long)].collect().toMap
    assert(one == expected)
    // NEGATIVE values: the bucket total is the LAST in-bucket cumsum
    // (max_by over the order column), not the max — with negatives the
    // running sum peaks mid-bucket and a max-based total would
    // overstate every later bucket's offset. Negative ids ride along
    // (trunc-div bucketing stays monotone for them)
    val negVals = Seq(5L, -9L, 4L, -1L, -6L, 8L, -3L, 2L)
    val negDf = negVals.zipWithIndex.map { case (v, i) => (i * 37L - 74L, v) }
      .toDF("id", "n")
    val negGot = Packing.prefixSum(negDf, "id", "n", "cum", bucketSize = 64)
      .select("id", "cum").as[(Long, Long)].collect().toMap
    val negExpected = negVals.zipWithIndex.map { case (_, i) =>
      (i * 37L - 74L) -> negVals.take(i + 1).sum
    }.toMap
    assert(negGot == negExpected)
  }

  test("packSequences chunks the concatenated stream at seqLen boundaries") {
    // token counts: 3, 4, 5 with seqLen 6 -> stream of 12 tokens
    val df = Seq((0L, "a b c"), (1L, "d e f g"), (2L, "h i j k l"))
      .toDF("doc_id", "text")
    val out = Packing.packSequences(df, "doc_id", "text", seqLen = 6, bucketSize = 2)
      .orderBy("doc_id")
      .select("doc_id", "n_tokens", "start_offset", "first_seq", "last_seq")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(out(0) == ((0L, 3L, 0L, 0L, 0L)))
    // doc 1 spans tokens [3, 7) -> crosses the seq boundary at 6
    assert(out(1) == ((1L, 4L, 3L, 0L, 1L)))
    assert(out(2) == ((2L, 5L, 7L, 1L, 1L)))
  }

  test("packing plan: corpus window is bucket-partitioned, never global") {
    import org.apache.spark.sql.catalyst.plans.logical.Window
    val big = (0L until 100L).map(i => (i, "x " * 5)).toDF("doc_id", "text")
    val plan = Packing.packSequences(big, "doc_id", "text", seqLen = 64,
      bucketSize = 8).queryExecution.optimizedPlan
    val specs = plan.collect { case w: Window => w.partitionSpec }
    assert(specs.count(_.nonEmpty) >= 1, "per-bucket cumsum window missing")
    assert(specs.count(_.isEmpty) == 1,
      "exactly one single-task window (bucket totals) allowed: " + specs)
    // the bucket-totals branch must REUSE the windowed exchange, not
    // recompute the upstream: r11's max_by-over-__local derivation +
    // null-safe offsets join keep both consumers on one exchange — one
    // LocalTableScan/FileScan total, one ReusedExchange (a plain equi
    // join would plant an asymmetric IsNotNull and silently double the
    // upstream; this pin is what fails if that regresses)
    graft.ShuffleSweep.withStaticPlans(spark) {
      val phys = Packing.packSequences(big, "doc_id", "text", seqLen = 64,
        bucketSize = 8).queryExecution.executedPlan
      val flat = graft.plans.PlanWalk.flatten(phys, intoReusedExchange = false)
      val leaves = flat.count(p =>
        p.isInstanceOf[org.apache.spark.sql.execution.LocalTableScanExec] ||
        p.nodeName.contains("Scan"))
      assert(leaves == 1, s"packing upstream scanned $leaves times:\n$phys")
      assert(phys.toString.contains("ReusedExchange"),
        s"bucket-totals branch lost exchange reuse:\n$phys")
    }
  }

  test("shardAssignments: dense 0-based positions, exact single-window parity") {
    import org.apache.spark.sql.expressions.{Window => W}
    val got = Sampling.shardAssignments(docs, "doc_id", nShards = 4)
      .select($"doc_id", $"shard", $"position").as[(Long, Long, Long)]
      .collect().sortBy(_._1)
    val w = W.partitionBy("shard").orderBy(md5($"doc_id".cast("string")), $"doc_id")
    val ref = docs
      .withColumn("shard", Sampling.hashBucket($"doc_id", 4))
      .withColumn("position", row_number().over(w).cast("long") - 1)
      .select($"doc_id", $"shard", $"position").as[(Long, Long, Long)]
      .collect().sortBy(_._1)
    assert(got.sameElements(ref), "two-level shard rank diverged from single-window")
    // positions are dense 0..n-1 within every shard
    got.groupBy(_._2).foreach { case (s, rows) =>
      assert(rows.map(_._3).sorted.sameElements(rows.indices.map(_.toLong)),
        s"shard $s positions not dense")
    }
  }

  test("quota main branch caps rows map-side before the wide shuffle") {
    // Spark's WindowGroupLimit pushes the rank<=cap filter below the
    // exchange as a partial per-task top-cap, so only ~cap rows per
    // (group, bucket) shuffle WITH their payload columns; the offsets
    // branch shuffles map-combined counts. This asymmetry is why the
    // two branches deliberately do NOT share one exchange: forcing
    // identical subtrees for reuse would forfeit both map-side
    // reductions and shuffle every wide row.
    val df = docs.withColumn("src", $"doc_id" % 3)
    val out = Sampling.quotaPerGroup(df, "doc_id", "src", cap = 5)
    out.collect()
    val executed = out.queryExecution.executedPlan.toString
    assert(executed.contains("WindowGroupLimit"),
      s"map-side cap pruning missing:\n$executed")
    assert(executed.contains("Partial"),
      "WindowGroupLimit did not run below the exchange")
  }

  test("samplers treat a null group as a group (the single-window semantics)") {
    val df = docs.withColumn("src",
      when($"doc_id" % 3 === 0, lit(null).cast("string")).otherwise(lit("a")))
      .withColumn("n", lit(3).cast("int"))
    val quota = Sampling.quotaPerGroup(df, "doc_id", "src", cap = 5)
      .groupBy("src").count().collect()
      .map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    assert(quota(None) == 5, s"null group not capped: $quota")
    assert(quota(Some("a")) == 5)
    val budget = Sampling.tokenBudgetPerGroup(df, "doc_id", "src", "n", budget = 12)
      .groupBy("src").count().collect()
      .map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    assert(budget(None) == 4, s"null group dropped or unbudgeted: $budget")
    assert(budget(Some("a")) == 4)
  }

  test("two-level samplers match the single-window reference forms exactly") {
    import org.apache.spark.sql.expressions.{Window => W}
    val df = docs.withColumn("src", $"doc_id" % 3)
      .withColumn("n", ($"doc_id" % 5 + 1).cast("int"))
    val wq = W.partitionBy("src").orderBy(md5($"doc_id".cast("string")), $"doc_id")
    val refQuota = df.withColumn("rn", row_number().over(wq)).filter($"rn" <= 5)
      .select("doc_id").as[Long].collect().sorted
    val gotQuota = Sampling.quotaPerGroup(df, "doc_id", "src", cap = 5)
      .select("doc_id").as[Long].collect().sorted
    assert(gotQuota.sameElements(refQuota), "quota selection diverged")
    val wb = wq.rowsBetween(W.unboundedPreceding, W.currentRow)
    val refBudget = df.withColumn("cum", sum($"n").over(wb))
      .filter($"cum" - $"n" < 50)
      .select($"doc_id", $"cum").as[(Long, Long)].collect().sortBy(_._1)
    val gotBudget = Sampling.tokenBudgetPerGroup(df, "doc_id", "src", "n", budget = 50)
      .select($"doc_id", $"cum_tokens").as[(Long, Long)].collect().sortBy(_._1)
    assert(gotBudget.sameElements(refBudget), "budget walk diverged")
  }

  test("temperatureMix allocates ∝ floor(sqrt(n)), capped at group size") {
    // groups: a=100, b=25, c=4 → w = 10, 5, 2, W = 17; target 60 →
    // a: 60*10 div 17 = 35, b: 60*5 div 17 = 17, c: min(4, 60*2 div 17=7) = 4
    val df = (0L until 129L).map { i =>
      (i, if (i < 100) "a" else if (i < 125) "b" else "c")
    }.toDF("doc_id", "src")
    val got = Sampling.temperatureMix(df, "doc_id", "src", totalTarget = 60)
      .groupBy("src").agg(count(lit(1)).as("n"), max("mix_target").as("t"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got("a") == (35L, 35L), s"got $got")
    assert(got("b") == (17L, 17L), s"got $got")
    assert(got("c") == (4L, 4L), s"got $got")
    // flattening: a is 78% of the corpus but only 62% of the mix
    assert(got("a")._1.toDouble / 56 < 100.0 / 129)
  }

  test("temperatureMix matches the single-window reference selection exactly") {
    import org.apache.spark.sql.expressions.{Window => W}
    val df = docs.withColumn("src", $"doc_id" % 3)
    val wq = W.partitionBy("src").orderBy(md5($"doc_id".cast("string")), $"doc_id")
    val counts = df.groupBy("src").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val weights = counts.view.mapValues(n => math.sqrt(n.toDouble).toLong).toMap
    val bigW = weights.values.sum
    val targets = counts.map { case (g, n) =>
      g -> math.min(n, 90L * weights(g) / bigW) }
    val ref = df.withColumn("rn", row_number().over(wq)).collect()
      .filter(r => r.getAs[Int]("rn") <= targets(r.getAs[Long]("src")))
      .map(_.getAs[Long]("doc_id")).sorted
    val got = Sampling.temperatureMix(df, "doc_id", "src", totalTarget = 90)
      .select("doc_id").as[Long].collect().sorted
    assert(got.sameElements(ref), "temperature selection diverged")
  }

  test("rankByValue equals the single-window row_number at any partitioning") {
    import org.apache.spark.sql.expressions.{Window => W}
    // duplicate order values force the idCol tiebreak; forced partition
    // counts (1, non-divisor 7, more-partitions-than-rows 97) prove the
    // result is independent of where range boundaries fall
    val df = (0L until 83L).map(i => (i, (i * 37) % 11)).toDF("doc_id", "v")
    val ref = df.withColumn("r",
        row_number().over(W.orderBy($"v", $"doc_id")).cast("long"))
      .select($"doc_id", $"r").as[(Long, Long)].collect().toMap
    for (p <- Seq(0, 1, 7, 97)) {
      val got = Sampling.rankByValue(df, "v", "doc_id", partitions = p)
        .select($"doc_id", $"global_rank").as[(Long, Long)].collect().toMap
      assert(got == ref, s"rank diverged at partitions=$p")
    }
  }

  test("rankByValue accepts inputs that already carry an upstream repartition") {
    // the plan-build-time canonicalization assert is scoped to the two
    // range-exchange subtrees ranked() itself creates — a caller's own
    // repartition/repartitionByRange (a legal public-API input) sits
    // deeper in both subtrees and must not trip it
    import org.apache.spark.sql.expressions.{Window => W}
    val df = (0L until 40L).map(i => (i, (i * 37) % 11)).toDF("doc_id", "v")
    val ref = df.withColumn("r",
        row_number().over(W.orderBy($"v", $"doc_id")).cast("long"))
      .select($"doc_id", $"r").as[(Long, Long)].collect().toMap
    for (pre <- Seq(
        df.repartition(5, $"doc_id"),
        df.repartitionByRange(3, $"v"),
        df.repartitionByRange(7, $"v", $"doc_id").filter($"doc_id" >= 0))) {
      val got = Sampling.rankByValue(pre, "v", "doc_id")
        .select($"doc_id", $"global_rank").as[(Long, Long)].collect().toMap
      assert(got == ref, "rank diverged on pre-repartitioned input")
    }
  }

  test("packSequencesBy: zero-length docs pin last_seq = first_seq; negative lengths fail") {
    // leading zero-length doc: cum = 0, where truncating and flooring
    // division disagree on (cum - 1) div seqLen — the defined answer is
    // first_seq (the doc occupies no sequence)
    val df = Seq((1L, 0L), (2L, 5L), (3L, 0L), (4L, 3L))
      .toDF("doc_id", "n")
    val out = Packing.packSequencesBy(df, "doc_id", "n", seqLen = 4)
      .select($"doc_id", $"start_offset", $"first_seq", $"last_seq")
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(out(1L) == ((1L, 0L, 0L, 0L)))   // leading zero doc
    assert(out(2L) == ((2L, 0L, 0L, 1L)))   // spans the first boundary
    assert(out(3L) == ((3L, 5L, 1L, 1L)))   // mid-corpus zero doc
    assert(out(4L) == ((4L, 5L, 1L, 1L)))
    val neg = Seq((1L, 2L), (2L, -1L)).toDF("doc_id", "n")
    val e = intercept[Exception] {
      Packing.packSequencesBy(neg, "doc_id", "n", seqLen = 4).collect()
    }
    assert(e.getMessage.contains("negative n"), e.getMessage)
  }

  test("scoreBandSplit cuts exact thirds, remainder rows landing in head") {
    val df = (0L until 10L).map(i => (i, 100L - i)).toDF("doc_id", "score")
    // ascending score = descending doc_id; n=10 → head 4, middle 3, tail 3
    // ((rk-1)*3 < 10 → rk <= 4; (rk-1)*3 < 20 → rk <= 7)
    val got = Sampling.scoreBandSplit(df, "score", "doc_id")
      .groupBy("band").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("head" -> 4L, "middle" -> 3L, "tail" -> 3L), s"got $got")
  }

  test("temperatureMix weightCol sizes groups by Σ weight, not row count") {
    // equal ROW counts (50/50) but 16:1 token mass — unweighted would
    // split evenly; weighted: w = floor(sqrt(3200)) = 56 vs
    // floor(sqrt(200)) = 14, W = 70 → heavy: 40*56 div 70 = 32,
    // light: 40*14 div 70 = 8
    val df = (0L until 100L).map { i =>
      if (i < 50) (i, "heavy", 64) else (i, "light", 4)
    }.toDF("doc_id", "src", "w")
    val got = Sampling.temperatureMix(df, "doc_id", "src", totalTarget = 40,
        weightCol = Some("w"))
      .groupBy("src").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("heavy" -> 32L, "light" -> 8L), s"got $got")
    // a non-integral weight column must fail loudly, not round silently
    val bad = df.withColumn("w", $"w".cast("double"))
    val e = intercept[IllegalArgumentException] {
      Sampling.temperatureMix(bad, "doc_id", "src", totalTarget = 40,
        weightCol = Some("w"))
    }
    assert(e.getMessage.contains("integral"))
    // null / negative weights must also fail loudly: a null silently
    // shrinks the group's mass, a negative sum NaNs the sqrt and the
    // group silently vanishes from the mix
    def chain(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(_.getMessage).mkString(" | ")
    val nullW = df.withColumn("w",
      when($"doc_id" === 3, lit(null).cast("int")).otherwise($"w"))
    val e2 = intercept[Exception] {
      Sampling.temperatureMix(nullW, "doc_id", "src", totalTarget = 40,
        weightCol = Some("w")).collect()
    }
    assert(chain(e2).contains("non-null"), s"got: ${chain(e2)}")
    val negW = df.withColumn("w",
      when($"doc_id" === 3, lit(-5)).otherwise($"w"))
    val e3 = intercept[Exception] {
      Sampling.temperatureMix(negW, "doc_id", "src", totalTarget = 40,
        weightCol = Some("w")).collect()
    }
    assert(chain(e3).contains("non-negative"), s"got: ${chain(e3)}")
  }

  test("temperatureMix treats a null group as a group") {
    val df = docs.withColumn("src",
      when($"doc_id" % 4 === 0, lit(null).cast("string")).otherwise(lit("a")))
    val got = Sampling.temperatureMix(df, "doc_id", "src", totalTarget = 40)
      .groupBy("src").count().collect()
      .map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    // null group (50 rows, w=7) and "a" (150 rows, w=12): W=19 →
    // null: 40*7 div 19 = 14, a: 40*12 div 19 = 25
    assert(got(None) == 14, s"null group mishandled: $got")
    assert(got(Some("a")) == 25, s"got $got")
  }

  test("sampler plans: row windows are prefix-bucketed, never one task per group") {
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LWindow}
    val df = docs.withColumn("src", $"doc_id" % 3)
      .withColumn("n", ($"doc_id" % 5 + 1).cast("int"))
    val plans = Seq(
      Sampling.quotaPerGroup(df, "doc_id", "src", cap = 5)
        .queryExecution.optimizedPlan,
      Sampling.tokenBudgetPerGroup(df, "doc_id", "src", "n", budget = 50)
        .queryExecution.optimizedPlan)
    plans.foreach { plan =>
      val wins = plan.collect { case w: LWindow => w }
      assert(wins.size >= 2, s"expected row + offset windows, got ${wins.size}")
      wins.foreach { w =>
        // a window keyed by the group alone is only allowed over the
        // bucket-totals aggregate (one row per bucket, config-sized);
        // every window over row data must carry the bucket subkey
        val overAggregate = w.child.collectFirst { case a: Aggregate => a }.isDefined
        assert(w.partitionSpec.size >= 2 || overAggregate,
          s"group-wide window over row data: partitionSpec=${w.partitionSpec}")
      }
    }
  }

  test("fused chunk-pack pipeline equals the naive chunk -> pack compose") {
    // chunkedPretrainPipeline derives chunk sizes and stream offsets in
    // closed form (zero chunk-level shuffles); this is the row-identity
    // proof against the literal composition it replaces: the SAME
    // cleaned corpus through chunkTokenWindows, then a global running
    // sum over the (doc, chunk) stream. Corpus mixes sub-window docs,
    // exact-boundary lengths, multi-chunk docs, dupes, and low-quality
    // rows that must be gated out.
    val window = 10
    val stride = 7
    val corpus = ((0L until 60L).map(i =>
        (i, ("the a or tok" + (i % 13) + " ") * (i % 26).toInt + "the end")) ++
      Seq((60L, (0 until 60).map(j => s"the w$j").mkString(" ")),
        (61L, (0 until 60).map(j => s"the w$j").mkString(" ")), // exact dupe
        (62L, "short low quality text")))
      .toDF("doc_id", "text")
    val fused = graft.operators.Pipeline.chunkedPretrainPipeline(
      corpus, "text", "doc_id", window = window, stride = stride,
      seqLen = 16, bucketSize = 8)

    // naive reference: same gate + dedup, real chunker, single-window
    // running sum over the chunk stream (fine at test scale)
    val quality = TextAnalysis.qualityScore(corpus, "text", Seq("doc_id"))
      .filter(col("n_tokens") >= 20 && col("stopword_ratio") < 0.5)
      .select("doc_id")
    val ded = Dedup.dropExactDuplicates(
      corpus.join(quality, "doc_id"), "text", "doc_id")
    val chunked = TextAnalysis.chunkTokenWindows(
      ded, "text", "doc_id", window, stride)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy("doc_id", "chunk_idx")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val reference = chunked
      .withColumn("__cum", sum(col("chunk_tokens").cast("long")).over(w))
      .select(col("doc_id"), col("chunk_idx").cast("long").as("chunk_idx"),
        col("chunk_tokens").cast("long").as("chunk_tokens"),
        md5(col("chunk_text")).as("chunk_md5"),
        (col("__cum") - col("chunk_tokens")).as("start_offset"),
        expr("(__cum - chunk_tokens) div 16").as("first_seq"),
        expr("(__cum - 1) div 16").as("last_seq"))
    assert(fused.count() === reference.count())
    assert(fused.exceptAll(reference).isEmpty && reference.exceptAll(fused).isEmpty)
    // the gate really dropped the dupe and the low-quality row
    assert(fused.select("doc_id").distinct().count() < 63)
  }

  test("knnPqRefine with a full shortlist recovers brute-force ranks") {
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val base = Similarity.withNorm(emb, "vec_id", "embedding")
    val n = base.count().toInt
    val cb = Similarity.pqTrainSampled(
      base.filter($"vec_id" % 50 === 0), "vec_id", m = 8)
    val queries = base.filter($"vec_id" < 5)
    val refined = Similarity.knnPqRefine(
        Similarity.pqEncode(base, "vec_id", cb), base, queries,
        "vec_id", cb, shortlist = n - 1, k = 3)
      .orderBy("qid", "rank").collect().map(_.toSeq)
    val brute = Similarity.knnBrute(base, queries, "vec_id", 3)
      .orderBy("qid", "rank").collect().map(_.toSeq)
    assert(refined.sameElements(brute))
    // the indexed (point-lookup) variant returns the identical ranking
    spark.sql("CREATE DATABASE IF NOT EXISTS refine_idx")
    Similarity.buildVectorStore(base, "vec_id", "refine_idx.vecs", buckets = 4)
    val indexed = Similarity.knnPqRefineIndexed("refine_idx.vecs",
        Similarity.pqEncode(base, "vec_id", cb), queries,
        "vec_id", cb, shortlist = n - 1, k = 3)
      .orderBy("qid", "rank").collect().map(_.toSeq)
    assert(indexed.sameElements(brute))
  }
}
