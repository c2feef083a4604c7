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
}
