package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The published byte-to-unicode alphabet (the GPT-2 byte-level BPE
  * base vocabulary): every byte 0..255 maps to a printable single
  * character — printable latin bytes ('!'..'~', '¡'..'¬', '®'..'ÿ')
  * map to themselves, the rest take consecutive codepoints from 256 up
  * (space 0x20 becomes 'Ġ' = U+0120, the familiar leading-space
  * marker in published merge lists). Byte-level merge lists — including
  * real published ones — are strings over exactly this alphabet, which
  * is what makes [[BpeTables]]' byte mode artifact-compatible with
  * them. */
object ByteAlphabet {
  val byteToStr: Array[String] = {
    val keep = (('!' to '~') ++ ('¡' to '¬') ++ ('®' to 'ÿ')).map(_.toInt).toSet
    var n = 0
    (0 until 256).map { b =>
      if (keep(b)) b.toChar.toString
      else { val c = (256 + n).toChar.toString; n += 1; c }
    }.toArray
  }
  /** mapped single char -> byte value; byte mode's decode direction. */
  val charToByte: java.util.HashMap[Character, Integer] = {
    val m = new java.util.HashMap[Character, Integer](512)
    byteToStr.zipWithIndex.foreach { case (s, b) => m.put(s.charAt(0), b) }
    m
  }
}

/** The BPE-apply tables and kernel: a trained merge list compiled to
  * rank/id lookups, plus the word-level encode loop. Built once per
  * plan (the expression references it via `addReferenceObj`, so every
  * task shares one instance) and read-only after construction except
  * for the bounded word cache.
  *
  * Token ids are engine-neutral by construction: a single-codepoint
  * token's id is its Unicode code point (0 .. 0x10FFFF); the token
  * produced by merge rank `r` gets id 0x110000 + r. No corpus-derived
  * vocabulary artifact is needed — the merge list IS the vocabulary,
  * so an external engine replaying the same merges assigns the same
  * ids.
  *
  * `byteLevel = true` is the published GPT-2 byte-level SCHEME — with
  * a deliberately scoped compatibility claim. What matches GPT-2:
  * the unit is the UTF-8 BYTE, mapped through [[ByteAlphabet]] (base
  * vocab exactly 256), and real published merge-list ARTIFACTS (pairs
  * over the mapped alphabet, vocab.bpe format) plug in as-is. What
  * does NOT: the pretokenizer. This chunker splits into space-ATTACHED
  * chunks (each whole space run glues to the following word, a
  * trailing run stands alone) so whitespace itself is tokenized
  * ('Ġ'-prefixed tokens) and decode is LOSSLESS over the whole text —
  * where codepoint mode drops spaces and is lossless at word grain
  * only. GPT-2's regex pretokenizer instead attaches AT MOST ONE
  * leading space and splits at letter/digit/punctuation category
  * boundaries and contractions ('s, 're, …), so encoding real text
  * through a real vocab.bpe here yields DIFFERENT token sequences
  * than GPT-2 proper (and ids differ by design anyway — see the id
  * rule above, not GPT-2's learned vocab ids). The id rule is
  * unchanged from codepoint mode (single mapped char -> its
  * codepoint, merged surface -> 0x110000 + rank), so byte mode is the
  * same machinery under a different base segmentation. */
final class BpeTables(val merges: Array[(String, String)],
    val byteLevel: Boolean = false) extends Serializable {
  // an EMPTY merge list is legal: encode degenerates to code points and
  // pairsOf to adjacent-character pairs — training's first iteration
  merges.foreach { case (l, r) =>
    require(l.nonEmpty && r.nonEmpty, s"graft_bpe: empty merge part in ($l, $r)")
    // tokens are space-split so a part with a space could never match;
    // rejecting it also keeps the "l r" rank key collision-free
    require(!l.contains(' ') && !r.contains(' '),
      s"graft_bpe: merge part with a space in ($l, $r)")
  }
  require(merges.distinct.length == merges.length,
    "graft_bpe: duplicate merge pair in the merge list")
  // two merges with one surface would make the surface->id map ambiguous
  private val surfaces = merges.map { case (l, r) => l + r }
  require(surfaces.distinct.length == surfaces.length,
    "graft_bpe: two merges produce the same surface form — ids would collide")

  /** pair -> merge rank; the space separator cannot collide because
    * merge parts are required space-free above. */
  private val rank = {
    val m = new java.util.HashMap[String, Integer](merges.length * 2)
    merges.zipWithIndex.foreach { case ((l, r), i) => m.put(l + " " + r, i) }
    m
  }
  /** merged surface -> token id (0x110000 + rank). */
  private val surfaceId = {
    val m = new java.util.HashMap[String, Integer](merges.length * 2)
    merges.zipWithIndex.foreach { case ((l, r), i) => m.put(l + r, 0x110000 + i) }
    m
  }

  /** Bounded per-plan word cache: natural text repeats words heavily,
    * so the merge loop runs once per DISTINCT word per executor. Past
    * the cap new words are encoded without caching — never an OOM
    * vector, the cap is a constant. */
  private val cache = new java.util.concurrent.ConcurrentHashMap[String, Array[Int]]()
  private val CacheCap = 1 << 16

  /** Published batch BPE (the GPT-2 reference loop): start from the
    * word's code points; repeat { find the present pair with the
    * lowest merge rank; merge ALL its occurrences left-to-right,
    * non-overlapping } until no pair is in the merge table. */
  /** A word's (codepoint mode) or chunk's (byte mode) initial
    * single-symbol segmentation. */
  private def baseTokens(unit: String): Array[String] =
    if (byteLevel)
      unit.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        .map(b => ByteAlphabet.byteToStr(b & 0xff))
    else
      word2cps(unit)

  private def word2cps(word: String): Array[String] =
    word.codePoints().toArray.map(cp => new String(Character.toChars(cp)))

  private def encodeWord(word: String): Array[Int] = {
    val cached = cache.get(word)
    if (cached != null) return cached
    var toks = baseTokens(word)
    var done = false
    while (!done && toks.length > 1) {
      var best = Int.MaxValue
      var i = 0
      while (i < toks.length - 1) {
        val r = rank.get(toks(i) + " " + toks(i + 1))
        if (r != null && r < best) best = r
        i += 1
      }
      if (best == Int.MaxValue) done = true
      else {
        val (l, r) = merges(best)
        val out = new scala.collection.mutable.ArrayBuffer[String](toks.length)
        var j = 0
        while (j < toks.length) {
          if (j < toks.length - 1 && toks(j) == l && toks(j + 1) == r) {
            out += l + r; j += 2
          } else { out += toks(j); j += 1 }
        }
        toks = out.toArray
      }
    }
    val ids = toks.map { t =>
      if (t.codePointCount(0, t.length) == 1) t.codePointAt(0)
      else {
        val id = surfaceId.get(t)
        if (id == null) throw new IllegalStateException(
          s"graft_bpe: multi-codepoint token '$t' without a producing merge")
        id.intValue()
      }
    }
    if (cache.size() < CacheCap) cache.put(word, ids)
    ids
  }

  /** Encode a whole text. Codepoint mode: split on single spaces
    * (empty words — runs of spaces, leading/trailing — contribute zero
    * tokens), encode each word, concatenate ids in order. Byte mode:
    * split into space-ATTACHED chunks — a new chunk starts at every
    * space that follows a non-space (equivalently, the regex matches
    * of `' *[^ ]+| +'`) — so every byte of the text lands in exactly
    * one chunk and decode reproduces the text verbatim. */
  def encodeText(text: UTF8String): ArrayData = {
    val s = text.toString
    val out = new scala.collection.mutable.ArrayBuffer[Int](s.length / 3 + 1)
    var start = 0
    var i = 0
    val n = s.length
    if (byteLevel) {
      while (i <= n) {
        if (i == n ||
            (s.charAt(i) == ' ' && i > 0 && s.charAt(i - 1) != ' ')) {
          if (i > start) out ++= encodeWord(s.substring(start, i))
          start = i
        }
        i += 1
      }
    } else {
      while (i <= n) {
        if (i == n || s.charAt(i) == ' ') {
          if (i > start) out ++= encodeWord(s.substring(start, i))
          start = i + 1
        }
        i += 1
      }
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out.toArray)
  }

  /** Decode an id stream back to text: codepoint ids verbatim, merge
    * ids via their rank's surface form. Word boundaries are NOT
    * represented in the id stream ([[encodeText]] drops spaces — the
    * engine-neutral scheme has no whitespace token), so decoding a
    * multi-word stream yields the words concatenated; the LOSSLESS
    * grain is the word, which the d50 gate verifies over the whole
    * corpus vocabulary. Out-of-range and negative ids fail loudly —
    * they mean the stream was produced by a different merge list. */
  def decodeIds(ids: ArrayData): UTF8String = {
    val sb = new java.lang.StringBuilder
    var i = 0
    val n = ids.numElements()
    while (i < n) {
      val id = ids.getInt(i)
      if (id >= 0x110000) {
        val r = id - 0x110000
        if (r >= merges.length) throw new IllegalArgumentException(
          s"graft_bpe_decode: merge id $id has no rank in a " +
            s"${merges.length}-merge table — wrong merge list?")
        sb.append(surfaces(r))
      } else if (id >= 0) sb.appendCodePoint(id)
      else throw new IllegalArgumentException(
        s"graft_bpe_decode: negative token id $id")
      i += 1
    }
    if (!byteLevel) UTF8String.fromString(sb.toString)
    else {
      // byte mode: the decoded surface is a string over the mapped
      // alphabet; reverse-map every char to its byte, then the bytes
      // ARE the UTF-8 text. An alphabet-foreign char fails loudly —
      // it means the ids came from a codepoint-mode stream.
      val chars = sb.toString
      val bytes = new Array[Byte](chars.length)
      var j = 0
      while (j < chars.length) {
        val b = ByteAlphabet.charToByte.get(chars.charAt(j))
        if (b == null) throw new IllegalArgumentException(
          s"graft_bpe_bytes_decode: char U+${chars.charAt(j).toInt.toHexString}" +
            " is not in the 256-byte alphabet — codepoint-mode ids?")
        bytes(j) = b.intValue().toByte
        j += 1
      }
      UTF8String.fromBytes(bytes)
    }
  }

  /** Like [[encodeWord]] but yielding the sub-token SURFACE strings —
    * the training loop's view of the current segmentation. Cached
    * separately from the id cache. */
  private val segCache = new java.util.concurrent.ConcurrentHashMap[String, Array[String]]()
  private[graft] def segmentWord(word: String): Array[String] = {
    val cached = segCache.get(word)
    if (cached != null) return cached
    var toks = baseTokens(word)
    var done = false
    while (!done && toks.length > 1) {
      var best = Int.MaxValue
      var i = 0
      while (i < toks.length - 1) {
        val r = rank.get(toks(i) + " " + toks(i + 1))
        if (r != null && r < best) best = r
        i += 1
      }
      if (best == Int.MaxValue) done = true
      else {
        val (l, r) = merges(best)
        val out = new scala.collection.mutable.ArrayBuffer[String](toks.length)
        var j = 0
        while (j < toks.length) {
          if (j < toks.length - 1 && toks(j) == l && toks(j + 1) == r) {
            out += l + r; j += 2
          } else { out += toks(j); j += 1 }
        }
        toks = out.toArray
      }
    }
    if (segCache.size() < CacheCap) segCache.put(word, toks)
    toks
  }

  /** Every adjacent sub-token pair (as "a b") under the CURRENT
    * segmentation, per word occurrence, word boundaries respected —
    * the pair-frequency view one BPE training iteration counts. */
  def pairsOf(text: UTF8String): ArrayData = {
    val s = text.toString
    val out = new scala.collection.mutable.ArrayBuffer[UTF8String](s.length / 3 + 1)
    def emit(unit: String): Unit = {
      val toks = segmentWord(unit)
      var j = 0
      while (j < toks.length - 1) {
        out += UTF8String.fromString(toks(j) + " " + toks(j + 1))
        j += 1
      }
    }
    var start = 0
    var i = 0
    val n = s.length
    if (byteLevel) {
      // the encodeText chunking: space runs attach to the next word
      while (i <= n) {
        if (i == n ||
            (s.charAt(i) == ' ' && i > 0 && s.charAt(i - 1) != ' ')) {
          if (i > start) emit(s.substring(start, i))
          start = i
        }
        i += 1
      }
    } else {
      while (i <= n) {
        if (i == n || s.charAt(i) == ' ') {
          if (i > start) emit(s.substring(start, i))
          start = i + 1
        }
        i += 1
      }
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out.toArray)
  }
}

/** `graft_bpe(text, merges)` — BPE-apply: encode a text column to
  * token ids given a trained merge list (a FOLDABLE
  * array<array<string>> of [left, right] pairs, rank = position).
  * The operator half of the d27 pair-statistics trainer: published
  * pipelines iterate pair-stats -> take best -> re-segment to learn
  * the merges, then apply them corpus-wide; this is the corpus-wide
  * apply as one narrow, codegen'd per-row call — no UDF, no shuffle,
  * the merge table rides the plan as a shared reference object.
  */
case class BpeEncodeText(left: Expression, right: Expression,
    byteLevel: Boolean = false)
    extends BinaryExpression {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val mergesOk = right.dataType match {
      case ArrayType(ArrayType(StringType, _), _) => right.foldable
      case _ => false
    }
    if (left.dataType == StringType && mergesOk)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "graft_bpe expects (string, foldable array<array<string>> merges), " +
          s"got ${left.dataType.simpleString} and ${right.dataType.simpleString}" +
          (if (!right.foldable) " (merges not foldable)" else ""))
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = left.nullable
  override def nullIntolerant: Boolean = true
  override def prettyName: String =
    if (byteLevel) "graft_bpe_bytes" else "graft_bpe"

  @transient private lazy val tables: BpeTables = {
    val arr = right.eval(null).asInstanceOf[ArrayData]
    val merges = (0 until arr.numElements()).map { i =>
      val pair = arr.getArray(i)
      require(pair != null && pair.numElements() == 2,
        s"graft_bpe: merge $i is not a [left, right] pair")
      (pair.getUTF8String(0).toString, pair.getUTF8String(1).toString)
    }.toArray
    new BpeTables(merges, byteLevel)
  }

  override protected def nullSafeEval(text: Any, m: Any): Any =
    tables.encodeText(text.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeTables", tables, classOf[BpeTables].getName)
    nullSafeCodeGen(ctx, ev, (text, _) => s"${ev.value} = $ref.encodeText($text);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BpeEncodeText =
    copy(left = newLeft, right = newRight)  // byteLevel rides the copy
}

/** `graft_bpe_decode(ids, merges)` — the inverse of `graft_bpe` at
  * word grain: codepoint ids back to their characters, merge ids back
  * to their surface forms, concatenated. The id stream carries no
  * whitespace token, so a multi-word stream decodes to the words
  * concatenated (documented in [[BpeTables.decodeIds]]); the d50 gate
  * proves the word-grain round-trip losslessly over the corpus
  * vocabulary. Same narrow codegen'd per-row shape as its siblings. */
case class BpeDecodeIds(left: Expression, right: Expression,
    byteLevel: Boolean = false)
    extends BinaryExpression {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val mergesOk = right.dataType match {
      case ArrayType(ArrayType(StringType, _), _) => right.foldable
      case _ => false
    }
    val idsOk = left.dataType match {
      case ArrayType(IntegerType, _) => true
      case _ => false
    }
    if (idsOk && mergesOk)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "graft_bpe_decode expects (array<int>, foldable " +
          s"array<array<string>> merges), got ${left.dataType.simpleString} " +
          s"and ${right.dataType.simpleString}" +
          (if (!right.foldable) " (merges not foldable)" else ""))
  }

  override def dataType: DataType = StringType
  override def nullable: Boolean = left.nullable
  override def nullIntolerant: Boolean = true
  override def prettyName: String =
    if (byteLevel) "graft_bpe_bytes_decode" else "graft_bpe_decode"

  @transient private lazy val tables: BpeTables = {
    val arr = right.eval(null).asInstanceOf[ArrayData]
    val merges = (0 until arr.numElements()).map { i =>
      val pair = arr.getArray(i)
      require(pair != null && pair.numElements() == 2,
        s"graft_bpe_decode: merge $i is not a [left, right] pair")
      (pair.getUTF8String(0).toString, pair.getUTF8String(1).toString)
    }.toArray
    new BpeTables(merges, byteLevel)
  }

  override protected def nullSafeEval(ids: Any, m: Any): Any =
    tables.decodeIds(ids.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeDecTables", tables, classOf[BpeTables].getName)
    nullSafeCodeGen(ctx, ev, (ids, _) => s"${ev.value} = $ref.decodeIds($ids);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BpeDecodeIds =
    copy(left = newLeft, right = newRight)
}

/** `graft_bpe_pairs(text, merges)` — one BPE training iteration's
  * pair-frequency view: every adjacent sub-token pair (as "a b") under
  * the segmentation the given merges produce, per word occurrence.
  * Training iterates: count these corpus-wide, append the most
  * frequent pair to the merge list, re-segment
  * ([[graft.operators.TextAnalysis.trainBpeMerges]]). */
case class BpePairsText(left: Expression, right: Expression,
    byteLevel: Boolean = false)
    extends BinaryExpression {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val mergesOk = right.dataType match {
      case ArrayType(ArrayType(StringType, _), _) => right.foldable
      case _ => false
    }
    if (left.dataType == StringType && mergesOk)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "graft_bpe_pairs expects (string, foldable array<array<string>> " +
          s"merges), got ${left.dataType.simpleString} and " +
          s"${right.dataType.simpleString}" +
          (if (!right.foldable) " (merges not foldable)" else ""))
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = left.nullable
  override def nullIntolerant: Boolean = true
  override def prettyName: String =
    if (byteLevel) "graft_bpe_bytes_pairs" else "graft_bpe_pairs"

  @transient private lazy val tables: BpeTables = {
    val arr = right.eval(null).asInstanceOf[ArrayData]
    val merges = (0 until arr.numElements()).map { i =>
      val pair = arr.getArray(i)
      require(pair != null && pair.numElements() == 2,
        s"graft_bpe_pairs: merge $i is not a [left, right] pair")
      (pair.getUTF8String(0).toString, pair.getUTF8String(1).toString)
    }.toArray
    new BpeTables(merges, byteLevel)
  }

  override protected def nullSafeEval(text: Any, m: Any): Any =
    tables.pairsOf(text.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpePairTables", tables, classOf[BpeTables].getName)
    nullSafeCodeGen(ctx, ev, (text, _) => s"${ev.value} = $ref.pairsOf($text);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BpePairsText =
    copy(left = newLeft, right = newRight)
}
