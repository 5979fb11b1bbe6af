package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** BPE-apply (graft_bpe): the kernel against an independent brute-force
  * reference of the published batch loop, id assignment, and edge
  * handling. */
class BpeSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Independent reference: the textbook batch loop, re-ranking after
    * merging ALL occurrences of the best pair in one left-to-right
    * non-overlapping pass. Deliberately structured differently from
    * the kernel (immutable lists, recursion). */
  private def refEncodeWord(word: String,
      merges: Seq[(String, String)]): Seq[String] = {
    val rank = merges.zipWithIndex.toMap
    def mergeAll(toks: List[String], l: String, r: String): List[String] =
      toks match {
        case a :: b :: rest if a == l && b == r => (l + r) :: mergeAll(rest, l, r)
        case a :: rest => a :: mergeAll(rest, l, r)
        case Nil => Nil
      }
    @annotation.tailrec
    def loop(toks: List[String]): List[String] = {
      val present = toks.zip(toks.drop(1)).filter(rank.contains)
      if (present.isEmpty) toks
      else {
        val (l, r) = present.minBy(rank)
        loop(mergeAll(toks, l, r))
      }
    }
    loop(word.map(_.toString).toList)
  }

  private def refIds(text: String, merges: Seq[(String, String)]): Seq[Int] = {
    val surfaceId = merges.zipWithIndex.map { case ((l, r), i) =>
      (l + r) -> (0x110000 + i) }.toMap
    text.split(" ", -1).filter(_.nonEmpty).toSeq
      .flatMap(w => refEncodeWord(w, merges))
      .map(t => if (t.length == 1) t.codePointAt(0) else surfaceId(t))
  }

  private def sparkIds(texts: Seq[String],
      merges: Seq[(String, String)]): Map[String, Seq[Int]] =
    TextAnalysis.bpeEncode(texts.toDF("text"), "text", merges)
      .select(col("text"), col("bpe_ids"))
      .as[(String, Seq[Int])].collect().toMap

  test("kernel matches the brute-force batch loop on adversarial shapes") {
    val merges = Seq("a" -> "a", "aa" -> "a", "a" -> "b", "b" -> "a",
      "ab" -> "ab", "c" -> "d", "b" -> "cd")
    // overlapping runs, created pairs (ab+ab), pair created during
    // exhaustion (b+cd appears only after c+d merges), ties of absence
    val words = Seq("aaa", "aaaa", "aaaaa", "abab", "ababab", "bcd",
      "bcdbcd", "abcd", "aabb", "baab", "abba", "cdcd", "aacdaa", "x",
      "", "a", "cda")
    val texts = words.filter(_.nonEmpty) :+ words.mkString(" ")
    val got = sparkIds(texts, merges)
    texts.foreach { t =>
      assert(got(t) == refIds(t, merges), s"text '$t'")
    }
  }

  test("kernel matches the reference on random words over a rich merge list") {
    val merges = Seq("a" -> "b", "b" -> "c", "c" -> "a", "ab" -> "c",
      "bc" -> "a", "bc" -> "b", "ab" -> "ab", "b" -> "b", "bb" -> "bb",
      "c" -> "c")
    val rnd = new scala.util.Random(42)
    val words = (0 until 300).map(_ =>
      (0 until (1 + rnd.nextInt(12))).map(_ => "abc" (rnd.nextInt(3))).mkString)
    val texts = words.distinct
    val got = sparkIds(texts, merges)
    texts.foreach { t =>
      assert(got(t) == refIds(t, merges), s"word '$t'")
    }
  }

  test("ids: codepoints for singles, 0x110000 + rank for merges") {
    val got = sparkIds(Seq("the quick"), TextAnalysis.defaultBpeMerges)
    // t+h (rank 0) then th+e (rank 1) -> "the" = 0x110001
    // "quick": q-u-i-c-k; (o,u) absent... present pairs: (i,c)? no.
    // (u,i)? no. (c,k)? no. (q,u)? no. -> all singles
    assert(got("the quick") ==
      Seq(0x110001, 'q'.toInt, 'u'.toInt, 'i'.toInt, 'c'.toInt, 'k'.toInt))
  }

  test("empty text, runs of spaces, and nulls") {
    val df = Seq(Some(""), Some("  "), Some(" a  b "), None)
      .toDF("text")
    val got = TextAnalysis.bpeEncode(df, "text", TextAnalysis.defaultBpeMerges)
      .select("bpe_ids").collect().map(r =>
        Option(r.get(0)).map(_.asInstanceOf[scala.collection.Seq[Int]].toSeq))
    assert(got(0) == Some(Seq.empty))
    assert(got(1) == Some(Seq.empty))
    assert(got(2) == Some(Seq('a'.toInt, 'b'.toInt)))
    assert(got(3) == None)
  }

  test("merge lists with colliding surfaces or spaces fail loudly") {
    val df = Seq("x").toDF("text")
    val e1 = intercept[Exception] {
      TextAnalysis.bpeEncode(df, "text",
        Seq("a" -> "bc", "ab" -> "c")).collect()
    }
    assert(e1.getMessage.contains("same surface"), e1.getMessage)
    val e2 = intercept[Exception] {
      TextAnalysis.bpeEncode(df, "text", Seq("a b" -> "c")).collect()
    }
    assert(e2.getMessage.contains("space"), e2.getMessage)
  }

  test("trainBpeMerges learns the frequency-ordered merges of a known corpus") {
    // "aa" dominates, then the learned token pairs with b
    val docs = Seq.fill(20)("aab").map(Tuple1(_)).toDF("text")
      .union(Seq.fill(5)("ab").map(Tuple1(_)).toDF("text"))
    val got = TextAnalysis.trainBpeMerges(docs, "text", numMerges = 3)
    // iter 1: pairs a-a (20), a-b (25)?? a-b appears in "aab" (after a-a?
    // raw chars: "aab" has pairs (a,a),(a,b); "ab" has (a,b) -> (a,b)=25
    // beats (a,a)=20 -> merge 1 = (a,b). re-segment: "aab" = a,ab;
    // "ab" = ab -> pairs: (a,ab)=20 -> merge 2 = (a,ab). then nothing
    // repeats twice -> early stop.
    assert(got == Seq("a" -> "b", "a" -> "ab"), s"got $got")
    // training on top of an existing base extends, never rewrites
    val ext = TextAnalysis.trainBpeMerges(docs, "text", numMerges = 1,
      base = Seq("a" -> "b"))
    assert(ext == Seq("a" -> "b", "a" -> "ab"), s"got $ext")
    // the trained list round-trips through the encoder: "aab" is one token
    val ids = sparkIds(Seq("aab"), got)
    assert(ids("aab") == Seq(0x110000 + 1), s"got ${ids("aab")}")
  }

  test("per-merge training jobs scan the vocab histogram, not the corpus") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    // the exact frame trainBpeMerges collects each iteration, over a
    // PARQUET-backed corpus: after the histogram is persisted, the
    // per-merge plan's only leaf is the InMemoryTableScan — a file
    // scan here would mean every one of a 32k-merge train's
    // iterations re-reads the corpus
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val hist = TextAnalysis.bpeWordHistogram(docs, "text").persist()
    try {
      hist.count()
      val frame = TextAnalysis.bpePairCounts(hist, Seq("t" -> "h"))
      frame.collect()
      val flat = graft.plans.PlanWalk.flatten(frame.queryExecution.executedPlan)
      assert(flat.exists(_.isInstanceOf[InMemoryTableScanExec]),
        "per-merge job does not read the cached histogram")
      assert(!flat.exists(_.isInstanceOf[FileSourceScanExec]),
        "per-merge job re-scans the corpus parquet")
    } finally hist.unpersist()
  }

  test("histogram-weighted pair counts equal the per-occurrence corpus counts") {
    // independent check of the re-shape's algebra: Σ_word count(word) ×
    // pairs-in-word == per-occurrence pair count over the raw corpus
    val docs = Seq("aab aab ab", "aab  x", "", "ab").map(Tuple1(_)).toDF("text")
    val m = Seq("a" -> "a")
    val viaHist = TextAnalysis.bpePairCounts(
        TextAnalysis.bpeWordHistogram(docs, "text"), m)
      .as[(String, Long)].collect().toMap
    val arr = array(m.map { case (l, r) => array(lit(l), lit(r)) }: _*)
      .cast("array<array<string>>")
    val viaCorpus = docs
      .select(explode(call_function("graft_bpe_pairs", col("text"), arr)).as("p"))
      .groupBy("p").agg(count(lit(1)).as("c"))
      .as[(String, Long)].collect().toMap
    assert(viaHist == viaCorpus, s"$viaHist vs $viaCorpus")
  }

  test("decode inverts encode at word grain, incl. non-ASCII codepoints") {
    val words = Seq("the", "theater", "running", "x", "naïve", "日本語",
      "aaaab", "ing")
    val enc = TextAnalysis.bpeEncode(words.toDF("w"), "w", outCol = "ids")
    val got = TextAnalysis.bpeDecode(enc, "ids")
      .select("w", "decoded").as[(String, String)].collect()
    got.foreach { case (w, dec) => assert(dec == w, s"'$w' decoded '$dec'") }
  }

  test("multi-word streams decode to words concatenated (no whitespace token)") {
    val enc = TextAnalysis.bpeEncode(
      Seq("the cat", " padded  words ").toDF("text"), "text", outCol = "ids")
    val got = TextAnalysis.bpeDecode(enc, "ids")
      .select("text", "decoded").as[(String, String)].collect().toMap
    assert(got("the cat") == "thecat")
    assert(got(" padded  words ") == "paddedwords")
  }

  test("empty merge list: codepoint-only encode and decode round-trip") {
    // merges = Nil used to build an array<void> literal and fail
    // graft_bpe/graft_bpe_decode's type check with an analysis error;
    // the literal type is now pinned (r15 ADVICE)
    val enc = TextAnalysis.bpeEncode(Seq("abc").toDF("w"), "w",
      merges = Nil, outCol = "ids")
    val ids = enc.select("ids").as[Seq[Int]].collect().head
    assert(ids == Seq('a'.toInt, 'b'.toInt, 'c'.toInt), ids.toString)
    val dec = TextAnalysis.bpeDecode(enc, "ids", merges = Nil)
      .select("decoded").as[String].collect().head
    assert(dec == "abc")
  }

  test("decode fails loudly on out-of-range ids; null ids stay null") {
    import org.apache.spark.SparkException
    val bad = Seq(Seq(0x110000 + 999)).toDF("ids")
    val e = intercept[Exception] {
      TextAnalysis.bpeDecode(bad, "ids").collect()
    }
    def rootMsg(t: Throwable): String =
      Option(t.getCause).map(rootMsg).getOrElse(t.getMessage)
    assert((e.isInstanceOf[SparkException] || e.getMessage != null) &&
      (e.getMessage.contains("no rank") || rootMsg(e).contains("no rank")))
    val nulls = Seq(Option.empty[Seq[Int]]).toDF("ids")
    val got = TextAnalysis.bpeDecode(nulls, "ids")
      .select("decoded").as[Option[String]].collect()
    assert(got.toSeq == Seq(None))
  }

  test("byte mode: GPT-2 alphabet, space-attached chunks, published merges fire") {
    val ms = TextAnalysis.gpt2ByteMergesPrefix
    val enc = TextAnalysis.bpeEncode(
      Seq((1L, "the"), (2L, " the"), (3L, "at on")).toDF("doc_id", "text"),
      "text", ms, outCol = "ids", byteLevel = true)
    val got = enc.select("doc_id", "ids")
      .as[(Long, Seq[Int])].collect().toMap
    // "the": t | he ("h e" rank 2; "t he" is NOT a listed merge)
    assert(got(1L) == Seq('t'.toInt, 0x110000 + 2), got(1L).toString)
    // " the": the space maps to the 'Ġ' byte symbol and the published
    // chain fires through it: Ġ t -> Ġt, h e -> he, Ġt he -> Ġthe
    assert(got(2L) == Seq(0x110000 + 6), got(2L).toString)
    // "at on": "a t" (rank 9) then "Ġ" attaches to "on" -> Ġ o? not
    // listed; o n IS (rank 5): [at, Ġ, on]
    assert(got(3L) ==
      Seq(0x110000 + 9, 'Ġ'.toInt, 0x110000 + 5), got(3L).toString)
  }

  test("byte mode roundtrip is lossless over the WHOLE text, spaces included") {
    val ms = TextAnalysis.gpt2ByteMergesPrefix
    val texts = Seq("the cat sat", " lead space", "trail ", "a  b   c",
      "", "héllo wörld", "日本語 テスト", "   ")
    val enc = TextAnalysis.bpeEncode(
      texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text"),
      "text", ms, outCol = "ids", byteLevel = true)
    val got = TextAnalysis.bpeDecode(enc, "ids", ms, byteLevel = true)
      .select("text", "decoded").as[(String, String)].collect()
    got.foreach { case (t, dec) =>
      assert(dec == t, s"'$t' decoded '$dec'") }
  }

  test("byte-mode training learns loadable published-format merges") {
    val corpus = Seq(
      "the cat sat on the mat", "the dog sat on the log",
      "the bat and the rat sat").toDF("text")
    val ms = TextAnalysis.trainBpeMerges(corpus, "text", numMerges = 6,
      byteLevel = true)
    assert(ms.nonEmpty && ms.size <= 6, ms.toString)
    // whitespace is part of the vocabulary: a space-side merge must
    // appear (the corpus is dominated by ' the'-style chunks)
    assert(ms.exists { case (l, r) => (l + r).contains("Ġ") },
      s"no mapped-space merge learned: $ms")
    // closure: the trained artifact loads into the byte encoder and
    // the encode/decode round-trip stays whole-text lossless under it
    val enc = TextAnalysis.bpeEncode(corpus, "text", ms, outCol = "ids",
      byteLevel = true)
    val got = TextAnalysis.bpeDecode(enc, "ids", ms, byteLevel = true)
      .select("text", "decoded").as[(String, String)].collect()
    got.foreach { case (t, dec) => assert(dec == t, s"'$t' -> '$dec'") }
    // and the merges genuinely compress: fewer ids than bytes
    val nid = enc.select(sum(size(col("ids")))).as[Long].head()
    val nbytes = corpus.select(sum(length(col("text")))).as[Long].head()
    assert(nid < nbytes, s"$nid ids vs $nbytes bytes")
  }

  test("byte decode rejects codepoint-mode ids outside the 256-byte alphabet") {
    val bad = Seq(Seq('日'.toInt)).toDF("ids")
    val e = intercept[Exception] {
      TextAnalysis.bpeDecode(bad, "ids", TextAnalysis.gpt2ByteMergesPrefix,
        byteLevel = true).collect()
    }
    def rootMsg(t: Throwable): String =
      Option(t.getCause).map(rootMsg).getOrElse(t.getMessage)
    assert(e.getMessage.contains("alphabet") ||
      rootMsg(e).contains("alphabet"), rootMsg(e))
  }

  test("incremental trainer A/B: identical merges to the distributed loop, both modes") {
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    // codepoint mode, the d39 gate shape
    val a = TextAnalysis.trainBpeMerges(docs, "text", numMerges = 8)
    val b = TextAnalysis.trainBpeMergesIncremental(docs, "text",
      numMerges = 8)
    assert(b == a, s"codepoint A/B diverged:\n  dist=$a\n  incr=$b")
    // byte mode, the d54 gate shape ('Ġ'-prefixed whitespace merges)
    val ab = TextAnalysis.trainBpeMerges(docs, "text", numMerges = 8,
      byteLevel = true)
    val bb = TextAnalysis.trainBpeMergesIncremental(docs, "text",
      numMerges = 8, byteLevel = true)
    assert(bb == ab, s"byte A/B diverged:\n  dist=$ab\n  incr=$bb")
    // continuation from a base list (the published resume shape)
    val a2 = TextAnalysis.trainBpeMerges(docs, "text", numMerges = 4,
      base = a.take(4))
    val b2 = TextAnalysis.trainBpeMergesIncremental(docs, "text",
      numMerges = 4, base = a.take(4))
    assert(b2 == a2 && b2.take(4) == a.take(4),
      s"base-resumed A/B diverged:\n  dist=$a2\n  incr=$b2")
    // and the vocab cap fails loudly, never truncates silently
    val e = intercept[IllegalArgumentException] {
      TextAnalysis.trainBpeMergesIncremental(docs, "text",
        numMerges = 1, maxVocab = 2)
    }
    assert(e.getMessage.contains("maxVocab"), e.getMessage)
  }

  test("vocab.bpe file round-trip: published format parses and encodes identically") {
    val dir = graft.TestScratch.dir("vocab-bpe")
    val path = s"$dir/vocab.bpe"
    // the published artifact layout: version header + 'lhs rhs' lines
    val content = "#version: 0.2\n" +
      TextAnalysis.gpt2ByteMergesPrefix
        .map { case (l, r) => s"$l $r" }.mkString("\n") + "\n"
    java.nio.file.Files.write(java.nio.file.Paths.get(path),
      content.getBytes("UTF-8"))
    val loaded = TextAnalysis.loadMergeFile(spark, path)
    assert(loaded == TextAnalysis.gpt2ByteMergesPrefix,
      s"parsed merges diverged: $loaded")
    // the loaded FILE artifact drives byte mode exactly like the
    // inline fixture: same ids, lossless whole-text round-trip
    val docs = Seq((1L, "that the sun is hot"), (2L, "  spaced   text "))
      .toDF("doc_id", "text")
    val viaFile = TextAnalysis.bpeEncode(docs, "text", loaded,
      byteLevel = true).select("doc_id", "bpe_ids")
      .as[(Long, Seq[Int])].collect().toMap
    val viaInline = TextAnalysis.bpeEncode(docs, "text",
      TextAnalysis.gpt2ByteMergesPrefix, byteLevel = true)
      .select("doc_id", "bpe_ids").as[(Long, Seq[Int])].collect().toMap
    assert(viaFile == viaInline)
    val rt = TextAnalysis.bpeDecode(
        TextAnalysis.bpeEncode(docs, "text", loaded, byteLevel = true),
        "bpe_ids", loaded, byteLevel = true)
      .select("text", "decoded").as[(String, String)].collect()
    rt.foreach { case (t, d) => assert(d == t, s"'$t' -> '$d'") }
    // malformed lines fail loudly, never parse as a truncated artifact
    java.nio.file.Files.write(java.nio.file.Paths.get(path),
      "#version: 0.2\na b\nbroken\n".getBytes("UTF-8"))
    val e = intercept[IllegalArgumentException] {
      TextAnalysis.loadMergeFile(spark, path)
    }
    assert(e.getMessage.contains("not a 'lhs rhs' pair"), e.getMessage)
  }

  test("the d37 plan is narrow: zero exchanges") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val df = graft.queries.TextOps.queries("d37_bpe_encode")(
      spark, "/root/testdata/sf0.001")
    df.collect()
    val ex = graft.plans.PlanWalk.flatten(df.queryExecution.executedPlan)
      .collect { case s: ShuffleExchangeExec => s }
    assert(ex.isEmpty, s"expected a narrow plan, got ${ex.size} exchanges")
  }
}
