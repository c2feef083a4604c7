package graft

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder

/** One-off measurement behind SCALE.md's heavy-hitter state-encoding note:
  * `flatMapGroupsWithState` stores its state as an encoded row, so every
  * batch pays one decode (`state.getOption`) + one encode (`state.update`)
  * per open (window, tenant) group. This times that round trip at
  * maxTracked=4096 for the shipped `Map[String, Long]` state type vs the
  * paired-arrays candidate replacement, to decide whether switching is worth
  * breaking state-checkpoint compatibility.
  *
  * Run: sbt 'Test/runMain graft.StateEncodingBench'
  */
object StateEncodingBench {
  def main(args: Array[String]): Unit = {
    val n = 4096
    val reps = 2000
    val keys = (0 until n).map(i => f"user_$i%08d")
    val map: Map[String, Long] = keys.zipWithIndex.map { case (k, i) => k -> i.toLong }.toMap
    val pair: (Array[String], Array[Long]) = (keys.toArray, (0 until n).map(_.toLong).toArray)

    def time[T](label: String, enc: ExpressionEncoder[T], v: T): Double = {
      val ser = enc.createSerializer()
      val de = enc.resolveAndBind().createDeserializer()
      (1 to 200).foreach(_ => de(ser(v))) // warmup: codegen + JIT
      val t0 = System.nanoTime()
      (1 to reps).foreach(_ => de(ser(v)))
      val perOp = (System.nanoTime() - t0) / 1e3 / reps
      println(f"$label%-30s $perOp%10.1f us/round-trip ($n entries)")
      perOp
    }

    val m = time("Map[String, Long]", ExpressionEncoder[Map[String, Long]](), map)
    val a = time("(Array[String], Array[Long])",
      ExpressionEncoder[(Array[String], Array[Long])](), pair)
    println(f"ratio map/arrays = ${m / a}%.2f")
  }
}
