package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native expression producing the word n-gram shingles of a text (tokens =
  * `\s+` split of the trimmed text; shingles joined with a single space).
  * `distinct = true` (the dedup default) keeps first occurrences only,
  * matching array_distinct; `distinct = false` keeps every positional
  * occurrence — the multiset repetition statistics (Gopher-style top-n-gram
  * coverage) need.
  *
  * Why not `transform(sequence(...), i => array_join(slice(tokens, i, n)))`:
  * higher-order functions interpret their lambda per element — for shingling
  * that is O(tokens·n) interpreted closure calls plus repeated array slicing,
  * and the expression gets re-evaluated at every plan node that references it.
  * This expression is ONE eval call per row with a tight loop (the per-row
  * cost is string building, ~µs), which keeps the dedup pipelines scan-bound.
  * CodegenFallback only boxes this expression's eval; the surrounding stage
  * still whole-stage-codegens.
  */
case class WordNGrams(child: Expression, n: Int, distinct: Boolean = true)
    extends UnaryExpression with CodegenFallback {

  require(n >= 1, s"n must be >= 1, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"WordNGrams requires a string argument, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    // EXACTLY TextAnalysis.tokens' semantics — the SET-trim over the explicit
    // [\t\n\f\r ] class (TextAnalysis.WsCharsRaw; RE2's \s, NOT Java's which
    // adds U+000B), then split on the same class, keeping interior empties
    // like SQL split; DuckDB's trim(x, chars) + string_split_regex('\s+')
    // behave identically, so every engine sees the same token list
    val str = input.asInstanceOf[UTF8String].toString
    var s = 0
    var e = str.length
    while (s < e && WordNGrams.isWs(str.charAt(s))) s += 1
    while (e > s && WordNGrams.isWs(str.charAt(e - 1))) e -= 1
    val toks = WordNGrams.Ws.split(str.substring(s, e), -1)
    val count = math.max(toks.length - n + 1, 1) // short texts yield one (short) shingle
    val seen = if (distinct) new java.util.LinkedHashSet[String](count * 2) else null
    val all = if (distinct) null else new Array[Any](count)
    var i = 0
    while (i < count) {
      val sb = new java.lang.StringBuilder()
      var j = i
      val end = math.min(i + n, toks.length)
      while (j < end) {
        if (j > i) sb.append(' ')
        sb.append(toks(j))
        j += 1
      }
      if (distinct) seen.add(sb.toString)
      else all(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    if (!distinct) return new GenericArrayData(all)
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): WordNGrams =
    copy(child = newChild)
}

object WordNGrams {
  private[functions] val Ws =
    java.util.regex.Pattern.compile(graft.operators.TextAnalysis.WsClass + "+")
  private[functions] def isWs(c: Char): Boolean =
    c == '\t' || c == '\n' || c == '\f' || c == '\r' || c == ' '
}

/** ALL bigram occurrences ("w1 w2", in order, WITH multiplicity) of the
  * LM tokenization: lower-case, trim the full [[graft.operators.TextAnalysis
  * .WsClass]] character SET from both ends, split on the class — exactly
  * `TextAnalysis.lmToks`' Column semantics (lower via UTF8String.toLowerCase,
  * the same primitive Spark's `lower` uses). Texts with fewer than 2 tokens
  * (including NULL/empty/whitespace-only) yield an empty array.
  *
  * Exists for the same reason as [[WordNGrams]]: the Column formulation
  * (`transform(slice(toks, ...), (t, i) => concat(t, " ", element_at(...)))`)
  * interprets its lambda per bigram — O(tokens) closure calls and boxed
  * array indexing per document, in the hottest path of the CCNet LM scorer
  * (three corpus-wide explodes). One eval per row, one tight loop. */
case class LmBigrams(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"LmBigrams requires a string argument, got ${other.simpleString}")
  }

  // NULL text yields an EMPTY ARRAY, not NULL — the contract the Column
  // formulation this replaced had (when().otherwise(array())), which a
  // size(allBigrams(..)) caller would observe as 0 vs NULL. UnaryExpression
  // 's default eval would short-circuit NULL past nullSafeEval.
  override def nullable: Boolean = false
  private val EmptyResult = new GenericArrayData(Array.empty[Any])
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) EmptyResult else nullSafeEval(v)
  }

  override def nullSafeEval(input: Any): Any = {
    val str = input.asInstanceOf[UTF8String].toLowerCase.toString
    var s = 0
    var e = str.length
    while (s < e && WordNGrams.isWs(str.charAt(s))) s += 1
    while (e > s && WordNGrams.isWs(str.charAt(e - 1))) e -= 1
    val toks = WordNGrams.Ws.split(str.substring(s, e), -1)
    if (toks.length < 2) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](toks.length - 1)
    var i = 0
    while (i < toks.length - 1) {
      out(i) = UTF8String.fromString(toks(i) + " " + toks(i + 1))
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): LmBigrams =
    copy(child = newChild)
}

/** Token-id encoding of a text: [[WordNGrams]]' exact tokenization (set-trim
  * over [\t\n\f\r ], split on the same class), each token looked up in an
  * in-memory vocabulary (token → id), unknowns mapped to `oovId`. NULL,
  * empty and whitespace-only text yield an EMPTY array (0 ids — agreeing
  * with `TextAnalysis.tokenCount`'s 0, NOT with `tokens()`'s [""]), so
  * token-count conservation holds exactly: len(result) == tokenCount(text).
  *
  * The vocabulary ships inside the serialized expression — right for the
  * config-sized vocabs of the export path (a 256–64K-entry map is KBs–MBs of
  * plan); a corpus-learned multi-GB vocab would ride an explicit broadcast
  * variable + join instead. It is indexed ONCE per deserialized instance
  * (i.e. once per executor task-set, not per row) into a HashMap, so the
  * per-token cost is one O(1) probe — the same reason this is a native
  * expression and not a per-element higher-order-function lambda or a
  * linear-scan literal-map lookup. */
case class TokenIds(child: Expression, vocab: Map[String, Long], oovId: Long)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"TokenIds requires a string argument, got ${other.simpleString}")
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
    val out = new Array[Any](toks.length)
    var i = 0
    while (i < toks.length) {
      val id = table.get(toks(i))
      out(i) = if (id == null) java.lang.Long.valueOf(oovId) else id
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): TokenIds =
    copy(child = newChild)
}

/** Single-pass character-trigram profile scorer for
  * [[graft.operators.TextAnalysis.langIdNgram]]: per row, walk the
  * CODE-POINT trigram windows of the input (the same windows the
  * `substr(i, 3)` spelling produces — both count code points, so astral
  * chars agree) and accumulate each profile hit's weight into a
  * per-language long array. Returns `array<long>` of scores in the
  * caller's language order; NULL input scores all-zero.
  *
  * Why an expression and not explode→broadcast-join→two aggregations:
  * the exploded trigram relation is corpus-CHARACTER-sized — hashing,
  * joining and exchanging it cost ~4.5 s at sf0.1 for a few dozen profile
  * grams. Here the whole score is ONE narrow map (no explode row
  * explosion, no join, no exchange at all); the profile ships inside the
  * expression (dozens of rows) and indexes once per deserialized
  * instance, like [[TokenIds]]. Exact long sums → bit-identical to the
  * join formulation the DuckDB oracle replays. */
case class NgramProfileScores(child: Expression,
    grams: Seq[(String, Int, Long)], nLangs: Int)
    extends UnaryExpression with CodegenFallback {

  require(nLangs >= 1, s"nLangs must be >= 1, got $nLangs")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"NgramProfileScores requires a string argument, got ${other.simpleString}")
  }

  @transient private lazy val table:
      java.util.HashMap[String, Array[(Int, Long)]] = {
    val m = new java.util.HashMap[String, Array[(Int, Long)]](grams.size * 2)
    grams.groupBy(_._1).foreach { case (g, hits) =>
      m.put(g, hits.map(h => (h._2, h._3)).toArray)
    }
    m
  }

  override def nullable: Boolean = false

  private def zeros: GenericArrayData =
    new GenericArrayData(Array.fill[Any](nLangs)(java.lang.Long.valueOf(0L)))

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) zeros else nullSafeEval(v)
  }

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val scores = new Array[Long](nLangs)
    if (s.length >= 3) {
      val cps = s.codePoints().toArray
      var i = 0
      while (i + 2 < cps.length) {
        val hits = table.get(new String(cps, i, 3))
        if (hits != null) {
          var j = 0
          while (j < hits.length) {
            scores(hits(j)._1) += hits(j)._2
            j += 1
          }
        }
        i += 1
      }
    }
    val out = new Array[Any](nLangs)
    var k = 0
    while (k < nLangs) { out(k) = java.lang.Long.valueOf(scores(k)); k += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(
      newChild: Expression): NgramProfileScores =
    copy(child = newChild)
}

/** Single-pass multi-pattern substring counter — the blocklist/abuse-term
  * scan of corpus filtering (C4's badwords pass, policy phrase audits) as
  * ONE Aho–Corasick automaton walk per row (Aho & Corasick 1975). Returns
  * `array<long>` of per-pattern occurrence counts in the caller's pattern
  * order, counting EVERY start position (overlaps included, case
  * sensitive); NULL input counts all-zero.
  *
  * Why an expression: N patterns as N `instr`/`regexp_count` calls re-scan
  * the corpus N times — a thousand-phrase blocklist over 100 TB must be
  * one pass, and the automaton makes the per-character cost O(1) amortized
  * (goto or suffix-link fallback) + O(matches). The automaton is built
  * ONCE per deserialized instance (per executor task-set, not per row),
  * like [[TokenIds]]' table; patterns ship inside the plan — right for
  * config-sized blocklists (KBs–MBs), while a corpus-learned list would
  * ride a broadcast join instead. Per-node output lists are pre-merged
  * through the suffix chain at build time, so matching never walks suffix
  * links on the hot path.
  *
  * Counting is substring-occurrence counting, which is indexing-unit
  * independent: the UTF-16 char walk here and a code-point `substr` walk
  * (the DuckDB oracle) agree on every count, because a pattern is a valid
  * string and can never match starting at a low surrogate. */
case class BlocklistCounts(child: Expression, patterns: Seq[String])
    extends UnaryExpression with CodegenFallback {

  require(patterns.nonEmpty, "at least one pattern required")
  require(patterns.forall(_.nonEmpty), "patterns must be non-empty strings")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"BlocklistCounts requires a string argument, got ${other.simpleString}")
  }

  /** (goto tables, suffix links, merged per-node pattern-id outputs). */
  @transient private lazy val automaton: (
      Array[java.util.HashMap[Character, Integer]], Array[Int], Array[Array[Int]]) = {
    val goto = scala.collection.mutable.ArrayBuffer(
      new java.util.HashMap[Character, Integer]())
    val ends = scala.collection.mutable.ArrayBuffer(List.empty[Int])
    patterns.zipWithIndex.foreach { case (p, pid) =>
      var s = 0
      var i = 0
      while (i < p.length) {
        val c = p.charAt(i)
        val nxt = goto(s).get(c)
        if (nxt == null) {
          goto += new java.util.HashMap[Character, Integer]()
          ends += Nil
          goto(s).put(c, goto.size - 1)
          s = goto.size - 1
        } else s = nxt
        i += 1
      }
      ends(s) = pid :: ends(s)
    }
    val n = goto.size
    val fail = new Array[Int](n)
    val out = new Array[Array[Int]](n)
    out(0) = ends(0).toArray
    val q = new java.util.ArrayDeque[Int]()
    goto(0).forEach { (_, v) => fail(v) = 0; q.add(v) }
    while (!q.isEmpty) {
      val u = q.poll()
      // merge the suffix chain's outputs once, at build time
      out(u) = (ends(u) ++ out(fail(u)).toList).toArray
      goto(u).forEach { (c, v) =>
        var f = fail(u)
        while (f != 0 && goto(f).get(c) == null) f = fail(f)
        val t = goto(f).get(c)
        fail(v) = if (t != null && t != v) t else 0
        q.add(v)
      }
    }
    (goto.toArray, fail, out)
  }

  override def nullable: Boolean = false

  private def zeros: GenericArrayData =
    new GenericArrayData(
      Array.fill[Any](patterns.size)(java.lang.Long.valueOf(0L)))

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) zeros else nullSafeEval(v)
  }

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val (goto, fail, out) = automaton
    val counts = new Array[Long](patterns.size)
    var state = 0
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      var nxt = goto(state).get(c)
      while (nxt == null && state != 0) {
        state = fail(state)
        nxt = goto(state).get(c)
      }
      if (nxt != null) state = nxt
      val hits = out(state)
      var j = 0
      while (j < hits.length) { counts(hits(j)) += 1L; j += 1 }
      i += 1
    }
    val res = new Array[Any](counts.length)
    var k = 0
    while (k < counts.length) { res(k) = java.lang.Long.valueOf(counts(k)); k += 1 }
    new GenericArrayData(res)
  }

  override protected def withNewChildInternal(
      newChild: Expression): BlocklistCounts =
    copy(child = newChild)
}

/** Unicode text normalization for corpus ingest: NFC canonical composition
  * (combining sequences compose, compatibility singletons like U+212B
  * ANGSTROM SIGN map to their canonical letter) followed by a scrub of the
  * characters that poison downstream tokenization — C0/C1 control chars
  * EXCEPT the engine whitespace class (\t \n \f \r stay, they are token
  * separators by the unified WsClass contract), DEL, and the zero-width
  * set (ZWSP/ZWNJ/ZWJ U+200B–U+200D, BOM/ZWNBSP U+FEFF). One pass per row;
  * mirrored in DuckDB as nfc_normalize + one RE2 character-class replace.
  */
case class NormalizeText(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"NormalizeText requires a string argument, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      WordForm.normalize(input.asInstanceOf[UTF8String].toString))

  override protected def withNewChildInternal(newChild: Expression): NormalizeText =
    copy(child = newChild)
}

/** JVM-side single source of the subword WORD-FORM contract — shared by
  * [[NormalizeText]] and the native fast-path expressions
  * ([[BpeCountPieces]], `UnigramCountPieces`), and the column-level twin of
  * `TextAnalysis.isWordForm`/`normWord`. A word form is 1..maxLen Unicode
  * LETTERS — code points, ANY plane — of the NFC-normalized,
  * control/zero-width-scrubbed token (the round-15 astral lift; see
  * `TextAnalysis.isWordForm` for the four-engine contract). These native
  * loops iterate by `codePointAt`, never by UTF-16 char, so a Deseret or
  * CJK-Extension-B letter is one symbol here exactly as it is one
  * character to Spark's UTF8String `length`/`substring`, to Java regex
  * `\p{L}`, and to DuckDB/RE2 over UTF-8. */
object WordForm {

  private def strip(c: Char): Boolean =
    (c < 0x20 && c != '\t' && c != '\n' && c != '\f' && c != '\r') ||
      (c >= 0x7f && c <= 0x9f) ||
      (c >= 0x200b && c <= 0x200d) || c == 0xfeff

  /** NFC + control/zero-width scrub — [[NormalizeText]]'s exact semantics. */
  def normalize(s: String): String = {
    val nfc = java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC)
    var clean = true
    var i = 0
    while (clean && i < nfc.length) {
      if (strip(nfc.charAt(i))) clean = false
      i += 1
    }
    if (clean) return nfc
    val sb = new java.lang.StringBuilder(nfc.length)
    i = 0
    while (i < nfc.length) {
      val c = nfc.charAt(i)
      if (!strip(c)) sb.append(c)
      i += 1
    }
    sb.toString
  }

  /** 1..maxLen letters, counted and classified by CODE POINT (call on a
    * [[normalize]]d token). `maxLen` bounds the code-point count — the
    * unit Spark's `length` and DuckDB's `length` both report — so an
    * astral-letter word caps identically on all engines. */
  def isLetterWord(s: String, maxLen: Int = Int.MaxValue): Boolean = {
    if (s.isEmpty) return false
    var i = 0
    var n = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      if (!Character.isLetter(cp)) return false
      n += 1
      if (n > maxLen) return false
      i += Character.charCount(cp)
    }
    true
  }

  /** Compare two strings in CODE-POINT order — identical to UTF-8 byte
    * order, i.e. Spark UTF8String's binary ordering and DuckDB's binary
    * collation. Java's `String.compareTo` is UTF-16 order, which sorts
    * astral code points (surrogates, 0xD800+) BELOW U+E000..U+FFFF — the
    * one place the two orders disagree. Every driver-side tokenizer
    * tie-break must use THIS order so the mirrors replay it. */
  def compareCodePoints(a: String, b: String): Int = {
    var i = 0
    var j = 0
    while (i < a.length && j < b.length) {
      val ca = a.codePointAt(i)
      val cb = b.codePointAt(j)
      if (ca != cb) return java.lang.Integer.compare(ca, cb)
      i += Character.charCount(ca)
      j += Character.charCount(cb)
    }
    java.lang.Integer.compare(a.length - i, b.length - j)
  }

  /** Code-point count (what `length` means on both engines). */
  def cpCount(s: String): Int = s.codePointCount(0, s.length)
}

object TextExpressions {
  /** Distinct word n-gram shingles as a codegen-compatible native expression. */
  def wordNGrams(text: Column, n: Int): Column =
    GraftBridge.column(WordNGrams(GraftBridge.expression(text), n))

  /** Every positional word n-gram occurrence (multiset, in order). */
  def wordNGramsAll(text: Column, n: Int): Column =
    GraftBridge.column(WordNGrams(GraftBridge.expression(text), n, distinct = false))

  /** Every LM-tokenized bigram occurrence (multiset, in order). */
  def lmBigrams(text: Column): Column =
    GraftBridge.column(LmBigrams(GraftBridge.expression(text)))

  /** Vocabulary-mapped token ids (OOV → `oovId`); empty/whitespace-only/NULL
    * text → empty array. See [[TokenIds]]. */
  def tokenIds(text: Column, vocab: Map[String, Long], oovId: Long): Column =
    GraftBridge.column(TokenIds(GraftBridge.expression(text), vocab, oovId))

  /** NFC normalization + control/zero-width scrub. See [[NormalizeText]]. */
  def normalizeText(text: Column): Column =
    GraftBridge.column(NormalizeText(GraftBridge.expression(text)))

  /** Per-pattern overlapping occurrence counts in one Aho–Corasick pass.
    * See [[BlocklistCounts]]. */
  def blocklistCounts(text: Column, patterns: Seq[String]): Column =
    GraftBridge.column(BlocklistCounts(GraftBridge.expression(text), patterns))

  /** Per-language trigram-profile scores in one pass. See
    * [[NgramProfileScores]]. */
  def ngramProfileScores(text: Column, grams: Seq[(String, Int, Long)],
      nLangs: Int): Column =
    GraftBridge.column(
      NgramProfileScores(GraftBridge.expression(text), grams, nLangs))
}
