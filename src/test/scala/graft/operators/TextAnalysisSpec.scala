package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Unit coverage for the chunking, keyword, and tokenizer-statistic
  * operators (the rest of TextAnalysis is exercised end-to-end by the
  * d02-d27 oracle queries).
  */
class TextAnalysisSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def chunksOf(text: String, window: Int, stride: Int): Seq[(Int, Int, String)] =
    TextAnalysis.chunkTokenWindows(
        Seq((1L, text)).toDF("doc_id", "text"), "text", "doc_id", window, stride)
      .orderBy("chunk_idx")
      .collect()
      .map(r => (r.getInt(1), r.getInt(2), r.getString(3)))
      .toSeq

  test("chunking: short doc yields one whole-doc chunk") {
    assert(chunksOf("a b c", window = 5, stride = 3) === Seq((0, 3, "a b c")))
  }

  test("chunking: exact-window doc yields one chunk, not an empty tail") {
    assert(chunksOf("a b c d e", window = 5, stride = 3) ===
      Seq((0, 5, "a b c d e")))
  }

  test("chunking: overlap and short final chunk") {
    // 7 tokens, window 5, stride 3: ceil((7-5)/3)+1 = 2 chunks,
    // second starts at token 4 and runs short (4 tokens)
    assert(chunksOf("a b c d e f g", window = 5, stride = 3) === Seq(
      (0, 5, "a b c d e"),
      (1, 4, "d e f g")))
  }

  test("chunking: stride == window tiles without overlap") {
    assert(chunksOf("a b c d e f", window = 3, stride = 3) === Seq(
      (0, 3, "a b c"),
      (1, 3, "d e f")))
  }

  test("chunking: every token is covered at window+1 length") {
    // 6 tokens, window 5, stride 3: second chunk picks up token 6
    assert(chunksOf("a b c d e f", window = 5, stride = 3) === Seq(
      (0, 5, "a b c d e"),
      (1, 3, "d e f")))
  }

  test("chunking: invalid window/stride rejected") {
    val df = Seq((1L, "a")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      TextAnalysis.chunkTokenWindows(df, "text", "doc_id", window = 0, stride = 1)
    }
    intercept[IllegalArgumentException] {
      TextAnalysis.chunkTokenWindows(df, "text", "doc_id", window = 3, stride = 4)
    }
    intercept[IllegalArgumentException] {
      TextAnalysis.chunkTokenWindows(df, "text", "doc_id", window = 3, stride = 0)
    }
  }

  test("tfidf: corpus-common token ranks below distinctive repeated token") {
    // "the" is in all 3 docs (df=3); "cat"/"dog"/"fish" in one each (df=1).
    // In doc 1, "cat" has tf=2 and idf ln(4/2)+1 vs "the" tf=1 idf ln(4/4)+1
    // -> cat scores 2*(ln2+1) ~ 3.39, the scores 1.0: cat must rank first.
    val docs = Seq(
      (1L, "the cat cat"),
      (2L, "the dog"),
      (3L, "the fish")).toDF("doc_id", "text")
    val out = TextAnalysis.tfidfKeywords(docs, "text", "doc_id", k = 2)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> (r.getString(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(out((1L, 1)) === (("cat", 2L, 1L)))
    assert(out((1L, 2)) === (("the", 1L, 3L)))
    assert(out((2L, 1)) === (("dog", 1L, 1L)))
    assert(out((3L, 1)) === (("fish", 1L, 1L)))
  }

  test("tfidf: equal-score ties break by token order, k caps output") {
    // doc 1 has two df=1 tf=1 tokens with identical scores: token order
    // decides; k=1 keeps exactly one row per doc
    val docs = Seq(
      (1L, "zeta alpha"),
      (2L, "beta")).toDF("doc_id", "text")
    val out = TextAnalysis.tfidfKeywords(docs, "text", "doc_id", k = 1)
      .collect()
      .map(r => r.getLong(0) -> r.getString(2))
      .toMap
    assert(out === Map(1L -> "alpha", 2L -> "beta"))
  }

  test("vocab: coll_freq vs doc_freq separate, ties break token-asc, k caps") {
    // "b" appears 3 times across 2 docs; "a" 2 times across 2 docs;
    // "c" 2 times in 1 doc (coll tie with "a" -> token asc puts a first)
    val docs = Seq(
      (1L, "a b c c"),
      (2L, "a b b")).toDF("doc_id", "text")
    val out = TextAnalysis.vocabularyTopK(docs, "text", "doc_id", k = 2)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSeq
    assert(out === Seq(("b", 3L, 2L), ("a", 2L, 2L)))
    intercept[IllegalArgumentException] {
      TextAnalysis.vocabularyTopK(docs, "text", "doc_id", k = 0)
    }
  }

  test("bpe pairs: adjacent pairs counted, 1-token docs yield none") {
    // doc 1 "a b a b" yields pairs (a,b),(b,a),(a,b); doc 2 adds one
    // more (a,b) -> 3 total; single-token doc 3 must contribute
    // nothing (the sequence(0,-1) edge)
    val docs = Seq(
      (1L, "a b a b"),
      (2L, "a b"),
      (3L, "solo")).toDF("doc_id", "text")
    val out = TextAnalysis.bpePairStats(docs, "text", k = 10)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .toSeq
    assert(out === Seq(("a", "b", 3L), ("b", "a", 1L)))
    assert(!out.exists(p => p._1 == "solo" || p._2 == "solo"))
    intercept[IllegalArgumentException] {
      TextAnalysis.bpePairStats(docs, "text", k = 0)
    }
  }

  test("bpe pairs: count ties break (tok_a, tok_b) ascending, k caps") {
    val docs = Seq((1L, "z y x w")).toDF("doc_id", "text")
    // pairs (z,y),(y,x),(x,w) all count 1 -> ascending tok_a order
    val out = TextAnalysis.bpePairStats(docs, "text", k = 2)
      .collect()
      .map(r => (r.getString(0), r.getString(1)))
      .toSeq
    assert(out === Seq(("x", "w"), ("y", "x")))
  }

  test("gopherQualityFilter: each rule rejects its violator, the clean doc survives") {
    // one doc per failure mode + one passing all rules. The passing doc
    // needs 20+ tokens, mostly-distinct, a stopword, varied bigrams.
    // avg_word_len counts ALPHA chars only, so tokens need real letters
    val clean = (1 to 24).map(i => s"word$i").mkString(" ") + " the a of to"
    val docs = Seq(
      1L -> clean,
      2L -> "too short the a",                                  // n_tokens < 20
      3L -> (1 to 28).map(i => s"word$i").mkString(" "),        // no stopwords
      4L -> ("the dup " * 14).trim,                             // dup tokens + top-bigram mass
      5L -> (clean + "\nsame line\nsame line\nsame line")       // dup lines
    ).toDF("doc_id", "text")
    val out = TextAnalysis.gopherQualityFilter(docs, "text", Seq("doc_id"))
    assert(out.select("doc_id").as[Long].collect().toSeq == Seq(1L))
    val sig = out.collect().head
    assert(sig.getAs[Int]("n_tokens") == 28)
    assert(sig.getAs[Double]("stopword_ratio") == 4.0 / 28)
    assert(sig.getAs[Double]("dup_line_ratio") == 0.0)
  }

  test("the gate fails loudly when it would destroy caller columns") {
    // gopherQualityKept's contract is "original columns preserved" —
    // a caller column named like a signal would be silently replaced
    // then dropped, so the gate must refuse instead
    val docs = Seq((1L, "a doc the end", 99)).toDF("doc_id", "text", "n_tokens")
    val e = intercept[IllegalArgumentException] {
      TextAnalysis.gopherQualityKept(docs, "text")
    }
    assert(e.getMessage.contains("n_tokens"))
  }

  test("dsir: in-domain raw docs outscore out-of-domain, scores are stable") {
    // target slice speaks vocabulary A; raw doc 10 shares it, raw doc
    // 11 is disjoint vocabulary B — the importance weights must rank
    // 10 over 11 (the method's entire point), and the quantized
    // integer scores must be identical across two evaluations (the
    // bit-exactness claim dsirStats' scaladoc makes)
    val aText = "alpha beta gamma delta alpha beta gamma delta alpha beta"
    val docs = Seq(
      (0L, aText, true), (1L, "beta gamma delta alpha beta gamma", true),
      (10L, "gamma delta alpha beta gamma delta", false),
      (11L, "zulu yankee xray whiskey victor uniform tango sierra", false))
      .toDF("doc_id", "text", "is_tgt")
    val stats = TextAnalysis.dsirStats(docs, "text", "is_tgt", buckets = 64)
    def run(): Map[Long, Long] =
      TextAnalysis.dsirScores(docs.filter(!$"is_tgt"), "text", "doc_id",
          stats, buckets = 64)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val s1 = run()
    assert(s1(10L) > s1(11L),
      s"in-domain doc must outscore out-of-domain: $s1")
    assert(s1 == run(), "quantized scores must be run-stable")
  }

  test("gopherQualityFilter is one narrow pass: zero exchanges at any corpus size") {
    val docs = Seq((1L, "a doc the end")).toDF("doc_id", "text")
    val gate = TextAnalysis.gopherQualityFilter(docs, "text", Seq("doc_id"))
    graft.ShuffleSweep.withStaticPlans(spark) {
      assert(graft.ShuffleSweep.staticExchanges(gate) == 0,
        "the composite gate must stay a codegen'd projection+filter")
    }
  }
}
