package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SchkTest}
import org.scalatest.funsuite.AnyFunSuite
import graft.vault.{Conventions, Dv, LoadRawV2Ops, RawVaultOps}

/** ScalaCheck invariants over the load kernels (SURVEY §5: "idempotent
  * re-load ⇒ no new rows; anti-join dedup invariants") plus the naming
  * conventions. DataFrame properties run few cases with tiny generated
  * batches — each case is several Spark jobs — while the driver-side
  * naming properties run the full default case count.
  */
class PropertySpec extends AnyFunSuite {

  /** Run a ScalaCheck property through scalatest (no scalatestplus
    * bridge in the offline dependency set). */
  private def check(cases: Int, prop: Prop): Unit = {
    val res = SchkTest.check(
      SchkTest.Parameters.default.withMinSuccessfulTests(cases).withMaxSize(12), prop)
    assert(res.passed, res.status.toString)
  }
  private def forAllP[A](gen: Gen[A], cases: Int = 100)(f: A => Unit): Unit =
    check(cases, Prop.forAll(gen) { a => f(a); true })
  private def forAll2P[A](g1: Gen[A], g2: Gen[A], cases: Int)(f: (A, A) => Unit): Unit =
    check(cases, Prop.forAll(g1, g2) { (a, b) => f(a, b); true })

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val c = Conventions.default

  // ---- driver-side: naming conventions ----

  private val entityGen: Gen[String] = for {
    n <- Gen.choose(1, 12)
    s <- Gen.stringOfN(n, Gen.alphaNumChar)
  } yield s

  test("naming: every derived table name is idempotent under re-derivation") {
    forAllP(entityGen) { name =>
        assert(c.hubName(c.hubName(name)) === c.hubName(name))
        assert(c.linkName(c.linkName(name)) === c.linkName(name))
        assert(c.satName(c.satName(name)) === c.satName(name))
        assert(c.refName(c.refName(name)) === c.refName(name))
        assert(c.effectivitySatName(c.effectivitySatName(name)) ===
          c.effectivitySatName(name))
        assert(c.pitName(c.pitName(name)) === c.pitName(name))
    }
  }

  test("naming: create path (source name) and load path (vault name) agree") {
    forAllP(entityGen) { name =>
      assert(c.effectivitySatName(name) === c.effectivitySatName(c.hubName(name)))
      assert(c.pitName(name) === c.pitName(c.satName(name)))
    }
  }

  // ---- near-dup groups vs a union-find reference ----

  private val pairsGen: Gen[List[(Long, Long)]] = for {
    n <- Gen.choose(2, 40) // node id space
    m <- Gen.choose(1, 60) // edges
    edges <- Gen.listOfN(m, for {
      a <- Gen.choose(0L, n.toLong)
      b <- Gen.choose(0L, n.toLong) if a != b
    } yield (math.min(a, b), math.max(a, b)))
  } yield edges.distinct

  /** Plain driver-side union-find over the same pairs. */
  private def unionFindGroups(pairs: List[(Long, Long)]): Map[Long, Long] = {
    val parent = collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // normalize: every node labelled by its component minimum
    parent.keys.map(k => k -> find(k)).toMap
  }

  test("chunkTokenWindows covers every token with the formula count") {
    val gen = for {
      n <- Gen.choose(1, 40) // tokens per doc
      window <- Gen.choose(1, 12)
      stride <- Gen.choose(1, window)
    } yield (n, window, stride)
    forAllP(gen, cases = 12) { case (n, window, stride) =>
      val toks = (1 to n).map(i => s"t$i")
      val chunks = graft.operators.TextAnalysis.chunkTokenWindows(
          Seq((1L, toks.mkString(" "))).toDF("doc_id", "text"),
          "text", "doc_id", window, stride)
        .orderBy("chunk_idx")
        .collect()
        .map(r => (r.getInt(1), r.getString(3).split(" ").toSeq))
      val expectedCount =
        if (n <= window) 1 else ((n - window + stride - 1) / stride) + 1
      assert(chunks.length === expectedCount, s"n=$n w=$window s=$stride")
      // chunk i holds exactly tokens [i*stride, i*stride + window)
      chunks.foreach { case (idx, c) =>
        assert(c === toks.slice(idx * stride, idx * stride + window),
          s"n=$n w=$window s=$stride chunk=$idx")
      }
      // every token is covered and the last chunk is never empty
      assert(chunks.flatMap(_._2).toSet === toks.toSet)
      assert(chunks.last._2.nonEmpty)
    }
  }

  test("fused chunk-pack offsets match the naive compose on random corpora") {
    // chunkedPretrainPipeline derives chunk sizes and stream offsets in
    // CLOSED FORM (one doc-grain prefix sum, no chunk-level shuffle);
    // the SamplingPackingSpec row-identity test uses one crafted
    // corpus — this property randomizes (window, stride, seqLen, doc
    // lengths) so boundary cases (exact window multiples, stride 1,
    // single-chunk docs) are swept. Docs all pass the quality gate and
    // are unique, isolating the chunk/pack arithmetic under test.
    val gen = for {
      window <- Gen.choose(2, 12)
      stride <- Gen.choose(1, window)
      seqLen <- Gen.choose(2, 20)
      lens <- Gen.listOfN(10, Gen.choose(20, 60))
    } yield (window, stride, seqLen, lens)
    forAllP(gen, cases = 6) { case (w, s, q, lens) =>
      val corpus = lens.zipWithIndex.map { case (n, d) =>
        (d.toLong, (1 to n).map(i => s"d${d}t$i").mkString(" ")) }
        .toDF("doc_id", "text")
      val fused = graft.operators.Pipeline.chunkedPretrainPipeline(
          corpus, "text", "doc_id", window = w, stride = s, seqLen = q,
          bucketSize = 4)
        .orderBy("doc_id", "chunk_idx")
        .select("doc_id", "chunk_idx", "chunk_tokens", "chunk_md5",
          "start_offset", "first_seq", "last_seq")
        .collect().toSeq
      val chunked = graft.operators.TextAnalysis.chunkTokenWindows(
        corpus, "text", "doc_id", w, s)
      val win = org.apache.spark.sql.expressions.Window
        .orderBy("doc_id", "chunk_idx")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)
      val reference = chunked
        .withColumn("__cum", sum(col("chunk_tokens").cast("long")).over(win))
        .orderBy("doc_id", "chunk_idx")
        .select(col("doc_id"), col("chunk_idx").cast("long"),
          col("chunk_tokens").cast("long"), md5(col("chunk_text")),
          (col("__cum") - col("chunk_tokens")).as("start_offset"),
          expr(s"(__cum - chunk_tokens) div $q"),
          expr(s"(__cum - 1) div $q"))
        .collect().toSeq
      assert(fused === reference, s"w=$w s=$s q=$q lens=$lens")
    }
  }

  test("nearDupGroups matches union-find on random pair graphs") {
    forAllP(pairsGen, cases = 8) { pairs =>
      if (pairs.nonEmpty) {
        val expected = unionFindGroups(pairs)
        val got = graft.operators.Dedup
          .nearDupGroups(pairs.toDF("a_id", "b_id"))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(got === expected)
      }
    }
  }

  // ---- DataFrame kernels: small generated CDC batches, few cases ----

  /** (key, op, loadMs, attr) rows — keys collide on purpose. */
  private val batchGen: Gen[List[(Int, Int, Long, String)]] =
    Gen.nonEmptyListOf(for {
      key <- Gen.choose(0, 5)
      op <- Gen.oneOf(0, 1, 2, 3, 4)
      ld <- Gen.choose(0L, 4L)
      attr <- Gen.oneOf("a", "b", "c")
    } yield (key, op, ld * 86400000L, attr))

  private def staged(rows: List[(Int, Int, Long, String)]): DataFrame =
    rows.toDF("key", "op", "ld", "attr")
      .withColumn(c.hkey, Dv.hash(Seq(col("key"))))
      .withColumn(c.operation, col("op"))
      .withColumn(c.loadDate, col("ld"))
      .withColumn(c.cdcLoadDate, col("ld"))
      .withColumn(c.recordSource, lit("prop"))

  test("temperatureMix invariants on random group distributions") {
    // for any corpus shape: the mix never exceeds the global target,
    // never takes more than a group has, allocates by exact integer
    // arithmetic, and keeps EXACTLY the md5-order prefix of each group
    // (the selected ids are recomputed independently here, so a
    // right-count-wrong-rows regression cannot pass)
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val distGen = for {
      nGroups <- Gen.choose(1, 6)
      sizes <- Gen.listOfN(nGroups, Gen.choose(1, 40))
      target <- Gen.choose(1L, 120L)
    } yield (sizes, target)
    forAllP(distGen, cases = 12) { case (sizes, target) =>
      val rows = sizes.zipWithIndex.flatMap { case (n, g) =>
        (0 until n).map(i => (g.toLong * 1000 + i, s"g$g")) }
      val df = rows.toDF("doc_id", "src")
      val kept = graft.operators.Sampling
        .temperatureMix(df, "doc_id", "src", target)
        .select($"doc_id", $"src").as[(Long, String)].collect()
      val weights = sizes.map(n => math.sqrt(n.toDouble).toLong)
      val bigW = weights.sum
      val expectedIds = rows.groupBy(_._2).flatMap { case (g, rs) =>
        val gi = g.stripPrefix("g").toInt
        val tgt = math.min(sizes(gi).toLong, target * weights(gi) / bigW)
        rs.map(_._1).sortBy(id => (md5hex(id.toString), id))
          .take(tgt.toInt)
      }.toSet
      assert(kept.map(_._1).toSet == expectedIds,
        s"selection diverged from the md5-order prefix: sizes=$sizes " +
          s"target=$target")
      assert(kept.length <= target,
        s"mix exceeded target: ${kept.length} > $target (sizes=$sizes)")
    }
  }

  test("stripDuplicatedSpans matches a brute-force reference on random corpora") {
    // tiny vocabulary → duplicated 3-grams arise naturally; the
    // reference recomputes the full semantic (global window counts,
    // canonical = min (id, pos) site, strip tokens covered by any
    // non-canonical window) in plain Scala, so a distributed-side bug
    // in keying, merging, or reassembly cannot self-confirm
    val g = 3
    val corpusGen = for {
      nDocs <- Gen.choose(2, 6)
      docs <- Gen.listOfN(nDocs,
        Gen.choose(g, 15).flatMap(n =>
          Gen.listOfN(n, Gen.oneOf("a", "b", "c", "d")).map(_.mkString(" "))))
    } yield docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
    forAllP(corpusGen, cases = 12) { docs =>
      val occs = docs.flatMap { case (id, text) =>
        val tk = text.split(" ")
        (0 to tk.length - g).map(p => (id, p, tk.slice(p, p + g).mkString(" ")))
      }
      val dup = occs.groupBy(_._3).filter(_._2.size >= 2)
      val canon = dup.map { case (gr, os) => gr -> os.minBy(o => (o._1, o._2)) }
      val removedPos = dup.values.flatten
        .filter(o => canon(o._3) != o)
        .groupBy(_._1).map { case (d, os) =>
          d -> os.flatMap(o => o._2 until o._2 + g).toSet }
      val expected = docs.flatMap { case (id, text) =>
        val tk = text.split(" ")
        removedPos.get(id).map { rem =>
          val kept = tk.zipWithIndex.collect { case (t, i) if !rem(i) => t }
          (id, tk.length - kept.length, kept.mkString(" "))
        }
      }.toSet
      val got = graft.operators.Dedup
        .stripDuplicatedSpans(docs.toDF("doc_id", "text"), "text", "doc_id",
          spanTokens = g)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
      assert(got == expected, s"strip diverged on $docs")
    }
  }

  test("hub/satellite/effectivity loads are idempotent: replay adds zero rows") {
    implicit val conv: Conventions = c
    forAllP(batchGen, cases = 5) { rows =>
      val st = staged(rows)
      val hub0 = st.limit(0).select(col(c.hkey), col(c.loadDate), col(c.recordSource), col("key"))
      val hubNew = RawVaultOps.newHubRows(st, hub0, Seq("key"))
      assert(RawVaultOps.newHubRows(st, hub0.unionByName(hubNew), Seq("key")).isEmpty)

      val sat0 = st.limit(0).select(col(c.hkey), col(c.loadDate))
      val satNew = RawVaultOps.newSatelliteRows(st, sat0, Seq("attr"))
      assert(RawVaultOps.newSatelliteRows(st,
        sat0.unionByName(satNew.select(col(c.hkey), col(c.loadDate))), Seq("attr")).isEmpty)

      val effNew = RawVaultOps.newEffectivityRows(st, sat0)
      assert(RawVaultOps.newEffectivityRows(st,
        sat0.unionByName(effNew.select(col(c.hkey), col(c.loadDate)))).isEmpty)
    }
  }

  test("hub load never duplicates a hash key already in the hub") {
    implicit val conv: Conventions = c
    forAll2P(batchGen, batchGen, cases = 5) { (preRows, rows) =>
      // hub loads run on stampForLoad output: ONE technical load clock
      // per batch (the reference stamps current_timestamp, RawVault.py:239).
      // Per-row load dates would legitimately yield one hub row each.
      def stamped(rs: List[(Int, Int, Long, String)]) =
        staged(rs).withColumn(c.loadDate, lit(0L))
      val pre = stamped(preRows)
        .select(col(c.hkey), col(c.loadDate), col(c.recordSource), col("key"))
        .distinct()
      val added = RawVaultOps.newHubRows(stamped(rows), pre, Seq("key"))
      assert(added.join(pre, Seq(c.hkey), "left_semi").isEmpty)
      // and the result itself is unique per hkey
      val n = added.select(c.hkey).count()
      assert(added.select(c.hkey).distinct().count() === n)
    }
  }

  /** v2 satellite updates: unique (hkey, hdiff). */
  private val v2Gen: Gen[List[(Int, String, Long)]] =
    Gen.nonEmptyListOf(for {
      key <- Gen.choose(0, 3)
      attr <- Gen.oneOf("a", "b", "c", "d")
      ld <- Gen.choose(0L, 6L)
    } yield (key, attr, ld * 1000L)).map(
      _.groupBy(r => (r._1, r._2)).values.map(_.head).toList)

  private def v2Updates(rows: List[(Int, String, Long)]): DataFrame =
    rows.toDF("key", "attr", "ld")
      .select(Dv.hash(Seq(col("key"))).as(LoadRawV2Ops.Hkey),
        Dv.hash(Seq(col("attr"))).as(LoadRawV2Ops.Hdiff),
        col("ld").as(LoadRawV2Ops.LoadDate),
        lit(null).cast("long").as(LoadRawV2Ops.LoadEndDate),
        col("attr"))

  test("v2 satellite upsert is idempotent and end-dates consistently") {
    forAllP(v2Gen, cases = 5) { rows =>
      val updates = v2Updates(rows)
      val s1 = LoadRawV2Ops.upsertSatellite(updates.limit(0), updates)
      val s2 = LoadRawV2Ops.upsertSatellite(s1, updates)
      assert(s1.collect().toSet === s2.collect().toSet)
      // open rows are exactly the rows at each key's max load date
      val got = s1.collect()
      got.groupBy(_.getAs[String](LoadRawV2Ops.Hkey)).foreach { case (_, vs) =>
        val maxLd = vs.map(_.getAs[Long](LoadRawV2Ops.LoadDate)).max
        vs.foreach { r =>
          val open = r.isNullAt(r.fieldIndex(LoadRawV2Ops.LoadEndDate))
          assert(open === (r.getAs[Long](LoadRawV2Ops.LoadDate) == maxLd))
        }
      }
    }
  }
}
