package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Training-data text pipeline operators over `documents`: exact and
  * near dedup (MinHash-LSH, SimHash, n-gram Jaccard), token counting,
  * quality scoring, language ID, fingerprinting.
  *
  * All hashing is md5-based so the DuckDB oracle can reproduce it
  * bit-for-bit; MinHash signatures are the lexicographic minimum of md5
  * hex strings (total order identical across engines). Ratios are single
  * int/int divisions — bit-deterministic in IEEE double on both engines.
  *
  * Scale notes: every operator is a narrow per-row transform or an
  * equi-join on a bucket key — no cross join anywhere. LSH candidate
  * generation joins on (implicitly index-salted) band keys, which at
  * 100 TB is a plain shuffle join on a high-cardinality key; the
  * degenerate everything-similar case is bounded by emitting per-doc
  * candidate counts, not the quadratic pair list.
  */
object TextOps {

  private def tokens: Column = split(col("text"), " ")
  private def tokenSet: Column = array_distinct(tokens)

  private val stopwords = Seq("the", "a", "or", "and", "of", "to", "in", "is")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Exact dedup: hash-groupBy on content (at 100 TB: group on md5, not
    // on the raw text, so shuffle keys stay 32 bytes).
    "d01_exact_dedup" -> ((s, d) =>
      Tables.documents(s, d)
        .groupBy(md5(col("text")).as("content_hash"))
        .agg(min("doc_id").as("keep_id"), count(lit(1)).as("copies"))),

    // Token counting: whitespace split + a word-regex count.
    "d02_token_count" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
          size(tokens).as("n_tokens"),
          size(array_distinct(tokens)).as("n_distinct"),
          length(col("text")).as("n_text_chars"))),

    // Quality scoring: length / word-length / stopword ratios.
    "d03_quality" -> ((s, d) => {
      val nTok = size(tokens)
      val nStop = size(filter(tokens, t => t.isin(stopwords.map(lit): _*)))
      val nAlpha = length(regexp_replace(col("text"), "[^a-z]", ""))
      Tables.documents(s, d)
        .select(col("doc_id"),
          nTok.as("n_tokens"),
          (nAlpha.cast("double") / nTok).as("avg_word_len"),
          (nStop.cast("double") / nTok).as("stopword_ratio"))
    }),

    // Language ID: marker-stopword voting with fixed tie order.
    "d04_langid" -> ((s, d) => {
      def hits(ws: Seq[String]) = size(filter(tokens, t => t.isin(ws.map(lit): _*)))
      val en = hits(Seq("the", "a", "or"))
      val de = hits(Seq("der", "die", "und"))
      val es = hits(Seq("el", "la", "los"))
      Tables.documents(s, d)
        .select(col("doc_id"), col("lang").as("declared_lang"),
          en.as("en_hits"), de.as("de_hits"), es.as("es_hits"))
        .withColumn("pred_lang",
          when(col("en_hits") >= col("de_hits") && col("en_hits") >= col("es_hits"), "en")
            .when(col("de_hits") >= col("es_hits"), "de")
            .otherwise("es"))
    }),

    // Document fingerprint: md5 over the sorted distinct token set.
    "d05_fingerprint" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
          md5(concat_ws(" ", array_sort(array_distinct(tokens)))).as("fingerprint"))),

    // n-gram (word-set) Jaccard near-dup: candidates bucketed by equal
    // n_chars (a cheap blocking key), |A∩B| / |A∪B| over distinct tokens.
    "d06_jaccard_pairs" -> ((s, d) => {
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), col("n_chars"), tokenSet.as("tk"))
      val a = docs.select(col("doc_id").as("a_id"), col("n_chars").as("a_nc"), col("tk").as("a_tk"))
      val b = docs.select(col("doc_id").as("b_id"), col("n_chars").as("b_nc"), col("tk").as("b_tk"))
      val inter = size(array_intersect(col("a_tk"), col("b_tk")))
      a.join(b, col("a_nc") === col("b_nc") && col("a_id") < col("b_id"))
        .withColumn("jaccard",
          inter.cast("double") / (size(col("a_tk")) + size(col("b_tk")) - inter))
        .filter(col("jaccard") > 0.5)
        .select("a_id", "b_id", "jaccard")
    }),

    // MinHash + LSH near-dup over word-TRIGRAM shingles: 6 minhashes,
    // 3 bands of 2; docs sharing a band key are candidates. Trigram
    // shingles keep the signature discriminative — unigram minhash
    // degenerates into an all-pairs join on an all-similar corpus
    // (measured 138s vs ~2s at sf0.1). Output counts candidates per doc
    // so the worst case stays linear in the output.
    "d07_minhash_lsh" -> ((s, d) => {
      // Tokenize ONCE per row before shingling: referencing split(text)
      // inside the transform lambda re-splits the text per element
      // (measured 17-29s vs ~2s at sf0.1). Exploding the distinct
      // shingle set lets the 6 seeded md5s run inside whole-stage
      // codegen; one shuffle then computes all signature slots as
      // min-aggregates — the shape that survives 100 TB.
      val shingles = when(size(col("tk")) < 3, array(col("text")))
        .otherwise(expr(
          "transform(sequence(0, size(tk) - 3), " +
            "i -> concat_ws(' ', tk[i], tk[i+1], tk[i+2]))"))
      val sigCols = (0 until 6).map(j =>
        min(md5(concat_ws("_", lit(j.toString), col("t")))).as(s"s$j"))
      val sigs = Tables.documents(s, d)
        .select(col("doc_id"), col("text"), tokens.as("tk"))
        .select(col("doc_id"), explode(array_distinct(shingles)).as("t"))
        .groupBy("doc_id")
        .agg(sigCols.head, sigCols.tail: _*)
      def bk(b: Int): Column =
        md5(concat_ws(",", lit(b.toString), col(s"s${2 * b}"), col(s"s${2 * b + 1}")))
      val banded = sigs
        .select(col("doc_id"), explode(array(bk(0), bk(1), bk(2))).as("band"))
      val other = banded.select(col("doc_id").as("o_id"), col("band").as("o_band"))
      banded
        .join(other, col("band") === col("o_band") && col("doc_id") =!= col("o_id"))
        .select(col("doc_id"), col("o_id")).distinct()
        .groupBy("doc_id").agg(count(lit(1)).as("n_candidates"))
    }),

    // SimHash (16-bit): per bit, majority vote of token-hash bits over
    // the distinct token set.
    "d08_simhash" -> ((s, d) => {
      val hashes = transform(tokenSet,
        t => conv(substring(md5(t), 1, 4), 16, 10).cast("int"))
      val n = size(col("th"))
      val bits = (0 until 16).map { b =>
        val ones = size(filter(col("th"), h => shiftright(h, b).bitwiseAND(1) === 1))
        when(ones * 2 > n, 1 << b).otherwise(0)
      }
      Tables.documents(s, d)
        .select(col("doc_id"), hashes.as("th"))
        .select(col("doc_id"), bits.reduce(_ + _).as("simhash"))
    })
  )

  /** DuckDB token expressions mirroring the Spark side. */
  private val tkSql = "list_distinct(string_split(text, ' '))"

  private def shingleMinhashSql(j: Int): String =
    s"list_aggregate(list_transform(list_distinct(sh), t -> md5(concat_ws('_', '$j', t))), 'min')"

  def oracleSql: Map[String, String] = Map(
    "d01_exact_dedup" ->
      """SELECT md5(text) AS content_hash, min(doc_id) AS keep_id,
         count(*) AS copies FROM documents GROUP BY 1""",
    "d02_token_count" ->
      """SELECT doc_id, len(string_split(text, ' ')) AS n_tokens,
         len(list_distinct(string_split(text, ' '))) AS n_distinct,
         length(text) AS n_text_chars FROM documents""",
    "d03_quality" ->
      """SELECT doc_id, len(string_split(text, ' ')) AS n_tokens,
         length(regexp_replace(text, '[^a-z]', '', 'g'))::DOUBLE
           / len(string_split(text, ' ')) AS avg_word_len,
         len(list_filter(string_split(text, ' '),
             t -> t IN ('the','a','or','and','of','to','in','is')))::DOUBLE
           / len(string_split(text, ' ')) AS stopword_ratio
         FROM documents""",
    "d04_langid" ->
      """SELECT doc_id, lang AS declared_lang, en_hits, de_hits, es_hits,
         CASE WHEN en_hits >= de_hits AND en_hits >= es_hits THEN 'en'
              WHEN de_hits >= es_hits THEN 'de' ELSE 'es' END AS pred_lang
         FROM (SELECT doc_id, lang,
           len(list_filter(string_split(text, ' '), t -> t IN ('the','a','or'))) AS en_hits,
           len(list_filter(string_split(text, ' '), t -> t IN ('der','die','und'))) AS de_hits,
           len(list_filter(string_split(text, ' '), t -> t IN ('el','la','los'))) AS es_hits
         FROM documents)""",
    "d05_fingerprint" ->
      s"""SELECT doc_id,
         md5(array_to_string(list_sort($tkSql), ' ')) AS fingerprint
         FROM documents""",
    "d06_jaccard_pairs" ->
      s"""WITH t AS (SELECT doc_id, n_chars, $tkSql AS tk FROM documents)
         SELECT a.doc_id AS a_id, b.doc_id AS b_id,
           len(list_intersect(a.tk, b.tk))::DOUBLE
             / (len(a.tk) + len(b.tk) - len(list_intersect(a.tk, b.tk))) AS jaccard
         FROM t a JOIN t b ON a.n_chars = b.n_chars AND a.doc_id < b.doc_id
         WHERE len(list_intersect(a.tk, b.tk))::DOUBLE
             / (len(a.tk) + len(b.tk) - len(list_intersect(a.tk, b.tk))) > 0.5""",
    "d07_minhash_lsh" ->
      s"""WITH sh AS (SELECT doc_id,
           CASE WHEN len(string_split(text, ' ')) < 3 THEN [text]
             ELSE list_transform(generate_series(1, len(string_split(text, ' ')) - 2),
               i -> concat_ws(' ', string_split(text, ' ')[i],
                 string_split(text, ' ')[i+1], string_split(text, ' ')[i+2]))
           END AS sh FROM documents),
         banded AS (SELECT doc_id,
           unnest([${(0 until 3).map(b =>
             s"md5(concat_ws(',', '$b', ${shingleMinhashSql(2 * b)}, ${shingleMinhashSql(2 * b + 1)}))")
             .mkString(", ")}]) AS band
         FROM sh),
         cand AS (SELECT DISTINCT a.doc_id, b.doc_id AS o_id
           FROM banded a JOIN banded b ON a.band = b.band AND a.doc_id <> b.doc_id)
         SELECT doc_id, count(*) AS n_candidates FROM cand GROUP BY 1""",
    "d08_simhash" ->
      s"""WITH h AS (SELECT doc_id,
           list_transform($tkSql, t -> ('0x' || substr(md5(t), 1, 4))::INTEGER) AS th
         FROM documents)
         SELECT doc_id, ${(0 until 16).map(b =>
           s"(CASE WHEN 2 * len(list_filter(th, x -> ((x >> $b) & 1) = 1)) > len(th) THEN ${1 << b} ELSE 0 END)")
           .mkString(" + ")} AS simhash
         FROM h"""
  )
}
