package graft

import graft.operators.Lineage
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins on the iterative-loop support machinery that round 18 rebuilt:
  * thread-scoped shuffle-partition overrides (the r17 implementation mutated
  * the session-global conf — a concurrent query would have silently planned
  * at the loop's width) and the observe-fused materialization that halves
  * driver actions per loop round. */
class LineageSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Partition count of the first hash exchange in the executed plan. */
  private def firstShufflePartitions(df: org.apache.spark.sql.DataFrame): Int = {
    val plan = df.queryExecution.executedPlan.toString
    val m = "hashpartitioning\\([^)]*?(\\d+)\\)".r.findFirstMatchIn(plan)
    assert(m.isDefined, s"no hash exchange in plan:\n$plan")
    m.get.group(1).toInt
  }

  test("withShufflePartitions applies to plans made on the calling thread") {
    val df = Seq(1 -> "a", 2 -> "b").toDF("k", "v")
    val sessionP = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val inLoop = Lineage.withShufflePartitions(spark, 1) {
      firstShufflePartitions(df.groupBy("k").count())
    }
    assert(inLoop == 1, "loop override not applied on the calling thread")
    assert(firstShufflePartitions(df.groupBy("k").count()) == sessionP,
      "override leaked past the loop body")
  }

  test("withShufflePartitions is THREAD-scoped: a concurrent query on the " +
      "same session keeps the session setting (r17 ADVICE — the mutation " +
      "implementation failed exactly this)") {
    val df = Seq(1 -> "a", 2 -> "b").toDF("k", "v")
    val sessionP = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val entered = new java.util.concurrent.CountDownLatch(1)
    val checked = new java.util.concurrent.CountDownLatch(1)
    @volatile var loopP = -1
    @volatile var loopErr: Throwable = null
    val t = new Thread(() => {
      try Lineage.withShufflePartitions(spark, 1) {
        loopP = firstShufflePartitions(df.groupBy("k").count())
        entered.countDown()
        checked.await() // hold the override open while the main thread plans
      } catch { case e: Throwable => loopErr = e; entered.countDown() }
    })
    t.start()
    entered.await()
    val concurrent =
      try firstShufflePartitions(df.groupBy("k").count())
      finally { checked.countDown(); t.join() }
    if (loopErr != null) throw loopErr
    assert(loopP == 1, "loop thread did not see its own override")
    assert(concurrent == sessionP,
      s"concurrent query planned at the loop width ($concurrent) — the " +
        "override leaked across threads")
  }

  test("nested withShufflePartitions clamps against the enclosing loop") {
    Lineage.withShufflePartitions(spark, 2) {
      assert(Lineage.effectiveShufflePartitions(spark) == 2)
      // a nested loop's clamp upper bound is the ENCLOSING width (r17
      // semantics, preserved by reading the thread-local effective conf)
      assert(Lineage.loopPartitions(spark, 1000L * 1000 * 1000) == 2)
    }
  }

  test("materializeObserved returns the metrics of the SAME materialization " +
      "action and a reusable leaf frame") {
    val df = spark.range(100).select(col("id"),
      (col("id") % 10 === 0).as("flag"))
    val (out, obs) = Lineage.materializeObserved(df,
      count(when(col("flag"), lit(1))).as("n_flagged"),
      count(lit(1)).as("n"))
    assert(obs("n_flagged") == 10L && obs("n") == 100L)
    // the frame is materialized and complete (leaf plan, full content)
    assert(out.count() == 100)
    assert(out.queryExecution.optimizedPlan.collectLeaves().size == 1)
    assert(out.filter(col("flag")).count() == 10)
  }
}
