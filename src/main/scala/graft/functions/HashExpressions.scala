package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Rabin–Karp rolling hashes over a document's UTF-8 bytes: one 64-bit
  * polynomial hash per sliding `window`-byte span, computed in O(n) with the
  * classic push/pop update (hᵢ₊₁ = (hᵢ − bᵢ·B^{w−1})·B + bᵢ₊w, mod 2⁶⁴).
  *
  * This is the fingerprinting primitive behind content-defined chunking and
  * byte-level near-dup detection: downstream operators can explode the array,
  * keep hashes matching a mask (CDC cut-points), or min-sample them as a
  * cheap byte-level MinHash. One eval per row, no per-element lambdas. Texts
  * shorter than the window yield a single hash over all bytes.
  */
case class RollingHashes(child: Expression, window: Int)
    extends UnaryExpression with CodegenFallback {

  require(window >= 1, s"window must be >= 1, got $window")

  private val B = 1000003L // polynomial base (mod 2^64 via long overflow)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"RollingHashes requires a string argument, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    val n = bytes.length
    val w = math.min(window, math.max(n, 1))
    if (n == 0) return new GenericArrayData(Array[Any](0L))
    // B^(w-1) mod 2^64 for the pop term
    var bPow = 1L
    var p = 1
    while (p < w) { bPow *= B; p += 1 }
    var h = 0L
    var i = 0
    while (i < w) { h = h * B + (bytes(i) & 0xffL); i += 1 }
    val out = new Array[Any](n - w + 1)
    out(0) = h
    var j = w
    while (j < n) {
      h = (h - (bytes(j - w) & 0xffL) * bPow) * B + (bytes(j) & 0xffL)
      out(j - w + 1) = h
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): RollingHashes =
    copy(child = newChild)
}

/** The full k-slot MinHash signature of a shingle set in ONE map-side pass —
  * sig[i] = min over shingles s of xxhash64(xxhash64(s), i), bit-identical to
  * the explode → groupBy(id) → k min-aggregates formulation (Spark's
  * `xxhash64(a, b)` folds with seed 42: H(b, H(a, 42)), and a null element
  * leaves the seed untouched — mirrored here), but with no explode, no
  * exchange of per-shingle rows, and no join back to the document: at 100 TB
  * the signature is computed where the document is read and only the fixed
  * k·8-byte array ever moves.
  *
  * An EMPTY array yields NULL — the same "this document has no signature row"
  * outcome as the explode formulation (explode emits nothing). Callers MUST
  * filter null signatures before LSH banding: Spark hash expressions are
  * never null, so a null signature would band to a CONSTANT hash and flood a
  * bucket (Dedup.minhashLshPairs applies the filter).
  */
case class MinHashSignature(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {

  require(k >= 1, s"k must be >= 1, got $k")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"MinHashSignature requires array<string>, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    import org.apache.spark.sql.catalyst.expressions.XXH64
    val shingles = input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val n = shingles.numElements()
    if (n == 0) return null
    val sig = Array.fill(k)(Long.MaxValue)
    var j = 0
    while (j < n) {
      val s = shingles.getUTF8String(j)
      // xxhash64(s) — string child folded over seed 42; a NULL element leaves
      // the seed unchanged (Spark hash semantics), it does not drop the row
      val base = if (s == null) 42L else XXH64.hashUTF8String(s, 42L)
      // xxhash64(h, i) = hashInt(i, hashLong(h, 42)) — i is an INT literal in
      // the aggregate formulation, so the per-slot mix must be hashInt
      val inner = XXH64.hashLong(base, 42L)
      var i = 0
      while (i < k) {
        val v = XXH64.hashInt(i, inner)
        if (v < sig(i)) sig(i) = v
        i += 1
      }
      j += 1
    }
    new GenericArrayData(sig)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

/** Portable 64-bit string hash: polynomial fold over the UTF-8 bytes
  * (h ← h·1000003 + b, mod 2⁶⁴ via long overflow) finished with the splitmix64
  * mixer. Exists because xxhash64 cannot be replayed by external engines: every
  * step here is plain mod-2⁶⁴ integer arithmetic, so the DuckDB oracle mirrors
  * it bit-for-bit with HUGEINT math (SparkEntry.polyHashCte). The splitmix64
  * finisher restores full avalanche — the raw polynomial's bits are structured
  * (bit 0 is a parity chain), which would bias per-bit consumers like SimHash.
  * Empty string → mix(0).
  */
case class PolyHash64(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"PolyHash64 requires a string argument, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    var h = 0L
    var i = 0
    while (i < bytes.length) { h = h * PolyHash64.B + (bytes(i) & 0xffL); i += 1 }
    PolyHash64.mix(h)
  }

  override protected def withNewChildInternal(newChild: Expression): PolyHash64 =
    copy(child = newChild)
}

object PolyHash64 {
  val B = 1000003L
  val C1 = 0xbf58476d1ce4e5b9L
  val C2 = 0x94d049bb133111ebL

  /** splitmix64 finisher (Steele et al., "Fast splittable pseudorandom number
    * generators", OOPSLA 2014 — public constants). */
  def mix(h: Long): Long = {
    var z = h
    z ^= (z >>> 30); z *= C1
    z ^= (z >>> 27); z *= C2
    z ^ (z >>> 31)
  }
}

object HashExpressions {
  /** Array of 64-bit Rabin–Karp hashes, one per `window`-byte sliding span. */
  def rollingHashes(text: Column, window: Int): Column =
    GraftBridge.column(RollingHashes(GraftBridge.expression(text), window))

  /** One-pass k-slot MinHash signature of an array<string> shingle column. */
  def minhashSignature(shingles: Column, k: Int): Column =
    GraftBridge.column(MinHashSignature(GraftBridge.expression(shingles), k))

  /** Portable (oracle-mirrorable) 64-bit hash of a string column. */
  def polyHash64(s: Column): Column =
    GraftBridge.column(PolyHash64(GraftBridge.expression(s)))
}
