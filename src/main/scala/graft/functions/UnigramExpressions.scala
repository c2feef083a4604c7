package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unigram-LM (SentencePiece-family) tokenization: Viterbi segmentation of a
  * word under per-piece log-probability costs (Kudo 2018, "Subword
  * Regularization", §3 — the unigram language model whose best segmentation
  * is the Viterbi path over piece probabilities). The BPE siblings in
  * [[SubwordExpressions]] learn a MERGE table; this family learns a PIECE
  * table with probabilities and segments by global optimum, not greedy
  * longest-match.
  *
  * Everything is FIXED-POINT INTEGER arithmetic so any engine, partitioning
  * or platform produces the identical segmentation (the `kmeansCentroids`
  * discipline): a piece's cost is `logFp(total) - logFp(count)` — the
  * quantized −log₂ probability in units of 2^-fracBits bits — where
  * [[UnigramExpressions.logFp]] is an EXACT integer shift-square log₂
  * (every operation is integer multiply / compare / floor-shift, so the
  * DuckDB oracle replays it bit-for-bit with a HUGEINT powers table; no
  * IEEE `log` whose last bit could differ across libms). Viterbi compares
  * `(total cost, piece count, piece sequence)` lexicographically — the
  * sequence tie-break makes the optimum UNIQUE, and pure-ASCII pieces make
  * Java's UTF-16 compare and DuckDB's UTF-8 byte compare agree.
  */
object UnigramExpressions {

  /** Fixed-point floor(log₂ x · 2^fracBits), computed exactly with the
    * renormalizing shift-square algorithm: e = ⌊log₂ x⌋ from the bit
    * length, then fracBits rounds of m ← m², emitting bit 1 and dividing by
    * 2^(e+1) when m² ≥ 2^(2e+1), else dividing by 2^e — m stays in
    * [2^e, 2^(e+1)) so nothing overflows 2(e+1) bits (BigInt here, HUGEINT
    * in the SQL mirror). The floor-truncation each round is PART OF THE
    * SPEC, not an error term: both engines truncate identically, so the
    * quantized logs are equal by construction. */
  def logFp(x: Long, fracBits: Int): Long = {
    require(x >= 1, s"logFp requires x >= 1, got $x")
    val e = 63 - java.lang.Long.numberOfLeadingZeros(x)
    var acc = e.toLong
    var m = BigInt(x)
    val hi = BigInt(1) << (2 * e + 1)
    var i = 0
    while (i < fracBits) {
      m = m * m
      if (m >= hi) { acc = (acc << 1) | 1L; m = m >> (e + 1) }
      else { acc = acc << 1; m = m >> e }
      i += 1
    }
    acc
  }

  /** Piece cost table from piece counts: cost = logFp(Σ counts) −
    * logFp(count) — the quantized −log₂ p(piece). Driver-side (the piece
    * table is vocab-sized). */
  def costs(counts: Map[String, Long], fracBits: Int): Map[String, Long] = {
    val total = counts.values.sum
    counts.map { case (p, c) => p -> (logFp(total, fracBits) - logFp(c, fracBits)) }
  }

  /** Viterbi segmentation of a WORD into vocab pieces (array<string>), the
    * E-step primitive — runs on the distinct-word relation. */
  def segment(word: Column, pieceCosts: Map[String, Long],
      maxPieceLen: Int): Column =
    GraftBridge.column(UnigramSegment(
      GraftBridge.expression(word), pieceCosts, maxPieceLen))

  /** Total unigram piece count of a TEXT — the apply-side counterpart of
    * `SubwordExpressions.bpeCountPieces`, same contract: [[WordForm]] ≤16
    * word forms are Viterbi-segmented, every other token counts one
    * piece. */
  def countPieces(text: Column, pieceCosts: Map[String, Long],
      maxPieceLen: Int): Column =
    GraftBridge.column(UnigramCountPieces(
      GraftBridge.expression(text), pieceCosts, maxPieceLen))

  /** The shared Viterbi DP: best (cost, nPieces, pieces) for `w`, or null
    * when some position is uncoverable (possible only when a character of
    * `w` is absent from the vocab — the learner always retains all
    * single characters it has seen, so this is the truly-unseen-char case).
    * Positions are CODE-POINT indexes (the astral lift: `maxPieceLen` and
    * piece boundaries count what Spark's and DuckDB's `length` count, so
    * the mirror replays the DP verbatim on astral words). DP state i holds
    * the best path for the prefix of i code points; candidates extend
    * states j ∈ [i−maxPieceLen, i−1] by the piece cps[j, i). The
    * (cost, np, path) order is a total order and lexicographic-concat
    * compatible, so per-state minimization is globally optimal. */
  private[graft] def viterbi(w: String, table: java.util.HashMap[String, java.lang.Long],
      maxPieceLen: Int): Array[String] = {
    val cps = w.codePoints().toArray
    val n = cps.length
    val cost = new Array[Long](n + 1)
    val np = new Array[Int](n + 1)
    val back = new Array[Int](n + 1) // start index of the last piece
    val ok = new Array[Boolean](n + 1)
    ok(0) = true
    var i = 1
    while (i <= n) {
      var bestJ = -1
      var bc = 0L
      var bn = 0
      var j = math.max(0, i - maxPieceLen)
      while (j < i) {
        if (ok(j)) {
          val c = table.get(new String(cps, j, i - j))
          if (c != null) {
            val cc = cost(j) + c.longValue()
            val cn = np(j) + 1
            // (cost, np) first; on full tie compare the two complete
            // candidate paths lexicographically (rare — reconstruct both)
            val better =
              if (bestJ < 0) true
              else if (cc != bc) cc < bc
              else if (cn != bn) cn < bn
              else lexLess(cps, back, j, i, bestJ)
            if (better) { bestJ = j; bc = cc; bn = cn }
          }
        }
        j += 1
      }
      if (bestJ >= 0) { ok(i) = true; cost(i) = bc; np(i) = bn; back(i) = bestJ }
      i += 1
    }
    if (!ok(n)) return null
    val out = new Array[String](np(n))
    var pos = n
    var k = np(n) - 1
    while (pos > 0) {
      out(k) = new String(cps, back(pos), pos - back(pos))
      pos = back(pos); k -= 1
    }
    out
  }

  /** Is the path ending (…, cps[j, i)) lexicographically smaller than the
    * one ending (…, cps[bestJ, i))? Materializes both full piece sequences
    * via the back pointers — only reached on exact (cost, np) ties. Pieces
    * compare in CODE-POINT order ([[WordForm.compareCodePoints]]) so the
    * tie-break matches the engines' binary string order beyond the BMP. */
  private def lexLess(cps: Array[Int], back: Array[Int], j: Int, i: Int,
      bestJ: Int): Boolean = {
    def path(lastStart: Int): List[String] = {
      var acc: List[String] = List(new String(cps, lastStart, i - lastStart))
      var pos = lastStart
      while (pos > 0) {
        acc = new String(cps, back(pos), pos - back(pos)) :: acc
        pos = back(pos)
      }
      acc
    }
    val a = path(j).iterator
    val b = path(bestJ).iterator
    while (a.hasNext && b.hasNext) {
      val cmp = WordForm.compareCodePoints(a.next(), b.next())
      if (cmp != 0) return cmp < 0
    }
    a.isEmpty && b.hasNext // shorter prefix sorts first
  }

  private[graft] def buildTable(pieceCosts: Map[String, Long]): java.util.HashMap[String, java.lang.Long] = {
    val m = new java.util.HashMap[String, java.lang.Long](pieceCosts.size * 2)
    pieceCosts.foreach { case (k, v) => m.put(k, java.lang.Long.valueOf(v)) }
    m
  }
}

/** Viterbi segmentation of one WORD → array<string> of pieces. Null/empty →
  * empty array; a word with an uncoverable position falls back to its single
  * characters (deterministic; unreachable when the vocab retains the
  * corpus's single characters, which the learner guarantees). */
case class UnigramSegment(child: Expression, pieceCosts: Map[String, Long],
    maxPieceLen: Int) extends UnaryExpression with CodegenFallback {

  require(maxPieceLen >= 1, s"maxPieceLen must be >= 1, got $maxPieceLen")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"UnigramSegment requires a string argument, got ${other.simpleString}")
  }

  @transient private lazy val table = UnigramExpressions.buildTable(pieceCosts)

  override def nullable: Boolean = false
  private val EmptyResult = new GenericArrayData(Array.empty[Any])
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) EmptyResult else nullSafeEval(v)
  }

  override def nullSafeEval(input: Any): Any = {
    val w = input.asInstanceOf[UTF8String].toString
    if (w.isEmpty) return EmptyResult
    val seg = UnigramExpressions.viterbi(w, table, maxPieceLen)
    val out: Array[Any] =
      if (seg != null) seg.map(UTF8String.fromString)
      else { // uncoverable → per-CODE-POINT singles (astral-safe)
        val cps = w.codePoints().toArray
        Array.tabulate[Any](cps.length)(i =>
          UTF8String.fromString(new String(cps, i, 1)))
      }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): UnigramSegment =
    copy(child = newChild)
}

/** Total unigram piece count of a TEXT under a learned piece-cost table —
  * whitespace-tokenize (the engine's [\t\n\f\r ] contract), Viterbi-count
  * [[WordForm]] (≤16-letter) words, one piece for any other token — each
  * token NFC-normalized first. Zipf word cache as
  * in [[BpeCountPieces]]. Narrow, zero-shuffle scan shape. */
case class UnigramCountPieces(child: Expression, pieceCosts: Map[String, Long],
    maxPieceLen: Int) extends UnaryExpression with CodegenFallback {

  require(maxPieceLen >= 1, s"maxPieceLen must be >= 1, got $maxPieceLen")

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"UnigramCountPieces requires a string argument, got ${other.simpleString}")
  }

  override def nullable: Boolean = false

  @transient private lazy val table = UnigramExpressions.buildTable(pieceCosts)
  @transient private lazy val cache =
    new java.util.HashMap[String, java.lang.Long](1 << 12)
  private val CacheCap = 1 << 16

  /** Count for one RAW token: normalize, gate on the shared word-form
    * contract ([[WordForm]] ≤16 letters), Viterbi-count word forms, 1 piece
    * otherwise. Cache keyed on the raw token (normalization runs once per
    * distinct token per partition). */
  private def countTok(w0: String): Long = {
    val hit = cache.get(w0)
    if (hit != null) return hit.longValue()
    val w = WordForm.normalize(w0)
    val n =
      if (!WordForm.isLetterWord(w, maxLen = 16)) 1L
      else {
        val seg = UnigramExpressions.viterbi(w, table, maxPieceLen)
        if (seg != null) seg.length.toLong else WordForm.cpCount(w).toLong
      }
    if (cache.size < CacheCap) cache.put(w0, java.lang.Long.valueOf(n))
    n
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

  override protected def withNewChildInternal(newChild: Expression): UnigramCountPieces =
    copy(child = newChild)
}
