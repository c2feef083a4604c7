package graft

/** Shared independent reference implementations for tests — deliberately
  * written with BigInt mod-2⁶⁴ arithmetic so they share no code (and no
  * overflow behavior) with the production expressions they check. */
object TestRefs {

  private val M = BigInt(1) << 64

  /** Reference for [[graft.functions.PolyHash64]]: UTF-8 byte-polynomial
    * fold then splitmix64, all in BigInt. */
  def polyHash64(s: String): Long = {
    val folded = s.getBytes("UTF-8").foldLeft(BigInt(0))((a, b) =>
      (a * 1000003 + (b & 0xff)) mod M)
    def xs(z: BigInt, n: Int) = z ^ (z >> n)
    def mul(z: BigInt, c: BigInt) = (z * c) mod M
    val z1 = mul(xs(folded, 30), BigInt("bf58476d1ce4e5b9", 16))
    val z2 = mul(xs(z1, 27), BigInt("94d049bb133111eb", 16))
    xs(z2, 31).longValue
  }

  /** Reference for [[graft.operators.Sampling]]'s portable hash. floorMod
    * on the seed fold, NOT `%`: a negative seed's signed remainder would
    * diverge from the engine (and from the DuckDB mirror's floorMod) — the
    * round-11 flaky-property root cause. */
  def hashRaw(id: Long, seed: Long): Long = {
    val (s1, s2) = (Math.floorMod(seed, 1000003L) + 1,
      Math.floorMod(seed, 999983L) + 1)
    val t = Math.floorMod(
      (Math.floorMod(id, 1000003) + s1) * (Math.floorMod(id, 999983) + s2),
      2147483647L)
    Math.floorMod(Math.floorMod(t * 48271, 2147483647L) * 48271, 2147483647L)
  }

  /** Reference for [[graft.operators.Similarity.kmeansCentroids]]: the full
    * driver replay — unit-normalize (dropping zero vectors), hash-ordered
    * centroid sample, then `rounds` Lloyd iterations with BigInt fixed-point
    * component sums and the same left-fold op order everywhere. EXACT (==)
    * equality with the operator is the contract under test. */
  def kmeansCentroids(raw: Seq[(Long, Seq[Float])], nLists: Int, rounds: Int,
      seed: Long = 42): Seq[Seq[Double]] = {
    val S = graft.operators.Similarity.FixedPointScale
    val vecs = raw.sortBy(_._1).flatMap { case (id, v) =>
      val dv = v.map(_.toDouble)
      val n = math.sqrt(dv.foldLeft(0.0)((a, x) => a + x * x))
      if (n > 0) Some((id, dv.map(_ / n).toSeq)) else None
    }
    def dot(a: Seq[Double], b: Seq[Double]): Double =
      a.zip(b).foldLeft(0.0)((acc, p) => acc + p._1 * p._2)
    var cents = vecs.sortBy { case (id, _) => (hashRaw(id, seed), id) }
      .take(nLists).map(_._2)
    for (_ <- 0 until rounds if cents.nonEmpty) {
      val assign = vecs.map { case (_, v) =>
        (cents.zipWithIndex.map { case (c, i) => (dot(v, c), i) }.max._2, v)
      }
      cents = assign.groupBy(_._1).toSeq.sortBy(_._1).flatMap {
        case (_, members) =>
          val dim = members.head._2.length
          val sums = Array.fill(dim)(BigInt(0))
          members.foreach { case (_, v) =>
            v.zipWithIndex.foreach { case (x, i) =>
              sums(i) += BigInt(math.floor(x * S.toDouble + 0.5).toLong)
            }
          }
          val n = members.length.toDouble
          val arr = sums.map(s => s.toDouble / n / S.toDouble)
          val nrm = math.sqrt(arr.foldLeft(0.0)((a, x) => a + x * x))
          if (nrm > 0) Some(arr.map(_ / nrm).toSeq) else None
      }
    }
    cents
  }
}
