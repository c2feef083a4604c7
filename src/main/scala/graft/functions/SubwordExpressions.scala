package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Real subword tokenization, replacing the `bpeishTokenCount` regex proxy in
  * the token-budget paths: a corpus-learned substring vocabulary plus greedy
  * longest-match encoding — the WordPiece encoding family (Schuster &
  * Nakajima 2012; BERT's tokenizer applies exactly this greedy
  * longest-prefix-in-vocab walk per word). The vocabulary is the most
  * frequent word-internal substrings of the corpus, which is how
  * SentencePiece seeds its unigram vocabulary before EM pruning (Kudo &
  * Richardson 2018, §3) — learned distributedly by [[CharNGrams]] +
  * a map-side-combined frequency groupBy, collected bounded (vocab-size
  * rows) exactly like `TextAnalysis.learnVocab`.
  *
  * Everything is CODEPOINT-based (`String.codePoints`), not UTF-16 code
  * units: DuckDB's `substring`/`length` count codepoints, so the oracle can
  * replay the greedy walk character-for-character even for non-BMP text.
  *
  * Why native expressions and not higher-order Column functions: the greedy
  * walk is an imperative loop with early exit per position — as a
  * `transform`/`aggregate` lambda chain it would interpret a closure per
  * tried prefix and re-evaluate at every referencing plan node. One eval per
  * row with a HashMap probe per tried prefix (≤ maxPieceLen probes per
  * emitted piece) keeps the export path scan-bound. CodegenFallback only
  * boxes this expression's eval; the surrounding stage still
  * whole-stage-codegens.
  */
object SubwordExpressions {

  /** All codepoint substrings (with multiplicity) of lengths 1..maxLen —
    * the vocab-learning explode. Input is a WORD (already tokenized). */
  def charNGrams(word: Column, maxLen: Int): Column =
    GraftBridge.column(CharNGrams(GraftBridge.expression(word), maxLen))

  /** Greedy longest-match subword ids over the full text (word-tokenized by
    * the engine's [\t\n\f\r ] contract, then encoded word by word; unknown
    * positions emit `oovId` and advance one codepoint). Empty/NULL text →
    * empty array, so len(result) is a true subword count. */
  def subwordIds(text: Column, vocab: Map[String, Long], oovId: Long,
      maxPieceLen: Int): Column =
    GraftBridge.column(SubwordEncode(
      GraftBridge.expression(text), vocab, oovId, maxPieceLen, emitIds = true))

  /** The matched piece STRINGS of the same walk (OOV positions emit their
    * single codepoint) — concat(pieces of word) == word, the conservation
    * invariant the property tests pin. */
  def subwordPieces(text: Column, vocab: Map[String, Long],
      maxPieceLen: Int): Column =
    GraftBridge.column(SubwordEncode(
      GraftBridge.expression(text), vocab, oovId = -1L, maxPieceLen,
      emitIds = false))

  /** Total BPE piece count of a TEXT under a rank-ordered merge table —
    * the native fast path of `TextAnalysis.bpeEncodedCounts`'
    * chained-replace spec (same contract: [[WordForm]] word forms are merge-
    * encoded, every other token counts one piece). */
  def bpeCountPieces(text: Column, merges: Seq[(String, String)]): Column =
    GraftBridge.column(BpeCountPieces(GraftBridge.expression(text), merges))

  /** Total BYTE-LEVEL BPE piece count of a text under a rank-ordered
    * hex-byte merge table — the native fast path of
    * `TextAnalysis.bbpeEncodedCounts` (every token segments, no gate). */
  def bbpeCountPieces(text: Column, merges: Seq[(String, String)]): Column =
    GraftBridge.column(BpeCountPieces(GraftBridge.expression(text), merges,
      byteLevel = true))

  /** UPPERCASE fixed-width hex symbols of a string's UTF-8 bytes — the
    * byte-level BPE starting symbolization, shared by the driver-local
    * learner and the native counter (== Spark `hex(encode(w, 'UTF-8'))`
    * split into pairs == DuckDB `hex(encode(w))`). */
  private[graft] def hexBytes(w: String): Array[String] = {
    val bs = w.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val out = new Array[String](bs.length)
    var i = 0
    while (i < bs.length) {
      val b = bs(i) & 0xff
      out(i) = new String(Array(HexDigits(b >> 4), HexDigits(b & 0xf)))
      i += 1
    }
    out
  }
  private val HexDigits = "0123456789ABCDEF".toCharArray
}

/** Sequential BPE merge application as ONE scalar expression: per word, the
  * symbol array starts as codepoints and each merge (in RANK ORDER, each a
  * left-to-right non-overlapping pass) rewrites it in place — semantically
  * identical to `TextAnalysis.bpeEncodedCounts`' chained `replace`s (the
  * oracle-replayable spec), but with none of the wrapped-string rebuilding
  * and NO explode/groupBy downstream: the per-document count is computed
  * where the document is read, so the whole operator is a narrow map.
  *
  * Zipf makes the real cost tiny: a bounded per-instance word cache
  * (the standard tokenizer-implementation trick — word frequencies are so
  * skewed that the hit rate approaches 1) means the merge loop runs about
  * once per DISTINCT word per partition, not once per occurrence. The
  * cache is capped (determinism is unaffected — it only memoizes a pure
  * function). */
case class BpeCountPieces(child: Expression, merges: Seq[(String, String)],
    byteLevel: Boolean = false)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"BpeCountPieces requires a string argument, got ${other.simpleString}")
  }

  override def nullable: Boolean = false

  @transient private lazy val mergeArr: Array[(String, String)] = merges.toArray
  @transient private lazy val cache =
    new java.util.HashMap[String, java.lang.Long](1 << 12)
  private val CacheCap = 1 << 16

  /** Count for one RAW token: normalize, gate on the shared word-form
    * contract ([[WordForm]]), merge-encode word forms, 1 piece otherwise.
    * The Zipf cache is keyed on the raw token so normalization itself runs
    * once per distinct token per partition. */
  private def countTok(w0: String): Long = {
    val hit = cache.get(w0)
    if (hit != null) return hit.longValue()
    // byte level (the GPT-2 contract): no normalization, no gate — every
    // token is its UTF-8 byte sequence and always segments
    val n =
      if (byteLevel) encodeCount(w0)
      else {
        val w = WordForm.normalize(w0)
        if (WordForm.isLetterWord(w)) encodeCount(w) else 1L
      }
    if (cache.size < CacheCap) cache.put(w0, java.lang.Long.valueOf(n))
    n
  }

  private def encodeCount(w: String): Long = {
    // symbolize by CODE POINT (not UTF-16 char): an astral letter is one
    // start symbol, matching the column path's regexp symbolization and
    // the DuckDB mirror's RE2 `(.)`. Byte level symbolizes by UTF-8 BYTE
    // (fixed-width hex, the learner's representation) instead
    val syms: Array[String] =
      if (byteLevel) SubwordExpressions.hexBytes(w)
      else {
        val cps = w.codePoints().toArray
        Array.tabulate(cps.length)(i => new String(cps, i, 1))
      }
    var i = 0
    var m = syms.length
    var r = 0
    while (r < mergeArr.length && m > 1) {
      val l = mergeArr(r)._1
      val rr = mergeArr(r)._2
      var wp = 0
      i = 0
      while (i < m) {
        if (i + 1 < m && syms(i) == l && syms(i + 1) == rr) {
          syms(wp) = l + rr
          i += 2
        } else {
          syms(wp) = syms(i)
          i += 1
        }
        wp += 1
      }
      m = wp
      r += 1
    }
    m.toLong
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return 0L
    nullSafeEval(v)
  }

  override def nullSafeEval(input: Any): Any = {
    val str = input.asInstanceOf[UTF8String].toString
    var s = 0
    var e = str.length
    while (s < e && WordNGrams.isWs(str.charAt(s))) s += 1
    while (e > s && WordNGrams.isWs(str.charAt(e - 1))) e -= 1
    if (e == s) return 0L
    val toks = WordNGrams.Ws.split(str.substring(s, e), -1)
    var total = 0L
    var t = 0
    while (t < toks.length) {
      total += countTok(toks(t))
      t += 1
    }
    total
  }

  override protected def withNewChildInternal(newChild: Expression): BpeCountPieces =
    copy(child = newChild)
}

/** Emits every codepoint substring of length 1..maxLen of the input word,
  * with multiplicity, in (start, length) order — the distributed half of
  * subword-vocab learning (frequencies aggregate downstream in a map-side
  * combined groupBy; only the top-`vocabSize` rows are ever collected). */
case class CharNGrams(child: Expression, maxLen: Int)
    extends UnaryExpression with CodegenFallback {

  require(maxLen >= 1, s"maxLen must be >= 1, got $maxLen")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"CharNGrams requires a string argument, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val cps = input.asInstanceOf[UTF8String].toString.codePoints().toArray
    val len = cps.length
    // count = sum over p of min(maxLen, len-p)
    var total = 0
    var p = 0
    while (p < len) { total += math.min(maxLen, len - p); p += 1 }
    val out = new Array[Any](total)
    var k = 0
    p = 0
    while (p < len) {
      var n = 1
      val nMax = math.min(maxLen, len - p)
      while (n <= nMax) {
        out(k) = UTF8String.fromString(new String(cps, p, n))
        k += 1
        n += 1
      }
      p += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): CharNGrams =
    copy(child = newChild)
}

/** Greedy longest-match subword encoding of a TEXT: word-tokenize with the
  * engine's set-trim + [\t\n\f\r ] split (identical to [[TokenIds]]), then
  * per word walk left to right, at each codepoint position matching the
  * LONGEST vocab piece (lengths min(maxPieceLen, remaining)..1 probed
  * against an O(1) hash table); a position matching nothing emits `oovId`
  * (ids mode) / its single codepoint (pieces mode) and advances one
  * codepoint — so Σ len(piece) == len(word) always (no dropped characters,
  * unlike BERT's whole-word [UNK] collapse, which would break token-count
  * conservation). NULL/empty/whitespace-only text → EMPTY array.
  *
  * The vocab ships inside the serialized expression (config-sized: KBs for
  * the 256–64K-piece vocabs of the export path) and is indexed ONCE per
  * deserialized instance, not per row — same design as [[TokenIds]]. */
case class SubwordEncode(child: Expression, vocab: Map[String, Long],
    oovId: Long, maxPieceLen: Int, emitIds: Boolean)
    extends UnaryExpression with CodegenFallback {

  require(maxPieceLen >= 1, s"maxPieceLen must be >= 1, got $maxPieceLen")

  override def dataType: DataType =
    if (emitIds) ArrayType(LongType, containsNull = false)
    else ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"SubwordEncode requires a string argument, got ${other.simpleString}")
  }

  @transient private lazy val table: java.util.HashMap[String, java.lang.Long] = {
    val m = new java.util.HashMap[String, java.lang.Long](vocab.size * 2)
    vocab.foreach { case (k, v) => m.put(k, java.lang.Long.valueOf(v)) }
    m
  }

  override def nullable: Boolean = false
  private val EmptyResult = new GenericArrayData(Array.empty[Any])
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) EmptyResult else nullSafeEval(v)
  }

  override def nullSafeEval(input: Any): Any = {
    val str = input.asInstanceOf[UTF8String].toString
    var s = 0
    var e = str.length
    while (s < e && WordNGrams.isWs(str.charAt(s))) s += 1
    while (e > s && WordNGrams.isWs(str.charAt(e - 1))) e -= 1
    if (e == s) return EmptyResult
    val toks = WordNGrams.Ws.split(str.substring(s, e), -1)
    val out = new scala.collection.mutable.ArrayBuffer[Any](toks.length * 2)
    var t = 0
    while (t < toks.length) {
      val cps = toks(t).codePoints().toArray
      val len = cps.length
      var p = 0
      while (p < len) {
        var n = math.min(maxPieceLen, len - p)
        var hit: java.lang.Long = null
        var piece: String = null
        while (n >= 1 && hit == null) {
          piece = new String(cps, p, n)
          hit = table.get(piece)
          if (hit == null) n -= 1
        }
        if (hit != null) {
          out += (if (emitIds) hit else UTF8String.fromString(piece))
          p += n
        } else {
          out += (if (emitIds) java.lang.Long.valueOf(oovId)
                  else UTF8String.fromString(new String(cps, p, 1)))
          p += 1
        }
      }
      t += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): SubwordEncode =
    copy(child = newChild)
}
