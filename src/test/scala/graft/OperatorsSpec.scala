package graft

import graft.operators.{Dedup, Multimodal, Relational, Sampling, Similarity, TextAnalysis}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Training-data-pipeline operators: dedup family (exact, MinHash-LSH,
  * SimHash, n-gram Jaccard, embedding cosine), similarity search, text
  * analysis, multimodal plumbing. Uses the sf0.001 testdata tables where a
  * realistic corpus matters. */
class OperatorsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
  private lazy val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("exact dedup: duplicated corpus collapses to one keeper per text", SlowTest) {
    val doubled = docs.unionByName(docs.withColumn("doc_id", col("doc_id") + 10000))
    val d = Dedup.exact(doubled)
    assert(d.count() == docs.count()) // one row per distinct text
    assert(d.filter($"n_dups" =!= 2).count() == 0)
    // keeper is the minimum id → always the original, not the +10000 clone
    assert(d.filter($"keep_id" >= 10000).count() == 0)
    val survivors = Dedup.exactSurvivors(doubled)
    assert(survivors.count() == docs.count())
  }

  test("incremental dedup keeps only fingerprints unseen in the accumulated corpus") {
    val seen = Seq((1L, "alpha beta"), (2L, "gamma delta")).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "  ALPHA   beta "), // normalizes to a seen fingerprint → dropped
      (11L, "epsilon zeta"), // genuinely new → kept
      (12L, null.asInstanceOf[String]) // NULL fingerprint matches nothing → kept
    ).toDF("doc_id", "text")
    val got = Dedup.incrementalNew(batch, seen)
      .select("doc_id").as[Long].collect().sorted
    assert(got.toSeq == Seq(11L, 12L))
  }

  test("fuzzy incremental dedup drops near-duplicates of the accumulated corpus, keeps novel docs") {
    val base = "the quick brown fox jumps over the lazy dog while the bright " +
      "summer sun shines warmly across the quiet green valley and the river runs calmly home"
    val seen = Seq(
      (1L, base),
      (2L, "completely different reference material about distributed query engines")
    ).toDF("doc_id", "text")
    val batch = Seq(
      // one word changed out of 27 → trigram Jaccard ≈ 0.79 vs doc 1 (3 of 25
      // shingles replaced), comfortably above both the 0.5 threshold and the
      // LSH S-curve knee (P[no band collision] ≈ 1.4e-7 at k=128/b=32) → dropped
      (10L, base.replace("lazy dog", "lazy cat")),
      (11L, base), // exact re-crawl → dropped
      (12L, "an entirely novel document with no overlap whatsoever in any shingle"), // kept
      (13L, null.asInstanceOf[String]) // NULL text: no signature → kept
    ).toDF("doc_id", "text")
    val got = Dedup.incrementalNewFuzzy(batch, seen, n = 3, k = 128, bands = 32,
        threshold = 0.5)
      .select("doc_id").as[Long].collect().sorted
    assert(got.toSeq == Seq(12L, 13L))
  }

  test("whitespace-variant texts share a fingerprint") {
    val d = Seq((1L, "Hello  World"), (2L, "  hello world "), (3L, "other")).toDF("doc_id", "text")
    val fps = d.select(TextAnalysis.fingerprint($"text")).as[String].collect()
    assert(fps(0) == fps(1))
    assert(fps(0) != fps(2))
  }

  test("line dedup removes corpus-hot lines, preserves order, keeps empty docs") {
    val d = Seq(
      (1L, "alpha one\nCOOKIE NOTICE\nbeta two"),
      // CRLF line endings + a \r-only blank: normalize like the LF docs
      (2L, "COOKIE NOTICE\r\ngamma three\r\n\r"),
      (3L, "delta four\n\tCOOKIE NOTICE \nepsilon five\ndelta four"),
      (4L, "COOKIE NOTICE"),
      (5L, "  \n\n"), // whitespace-only: no lines at all
      (6L, "zeta six\neta seven")).toDF("doc_id", "text")
    // COOKIE NOTICE is in 4 distinct docs (whitespace-class-normalized: doc
    // 2's CRLF copy and doc 3's tab/space-padded copy count, doc 3's
    // repeated 'delta four' counts ONCE) — hot at cap 3
    val out = Dedup.dedupLines(d, maxDocFreq = 3)
      .as[(Long, String, Long, Long)].collect().sortBy(_._1)
    assert(out.map(_._1).toSeq == Seq(1L, 2L, 3L, 4L, 5L, 6L))
    assert(out(0) == ((1L, "alpha one\nbeta two", 2L, 1L)))
    assert(out(1) == ((2L, "gamma three", 1L, 1L)))
    // order preserved around the removed line; within-doc repeat survives
    assert(out(2) == ((3L, "delta four\nepsilon five\ndelta four", 3L, 1L)))
    assert(out(3) == ((4L, "", 0L, 1L))) // nothing left — row still present
    assert(out(4) == ((5L, "", 0L, 0L)))
    assert(out(5) == ((6L, "zeta six\neta seven", 2L, 0L)))
    // at cap 4 nothing is hot: every doc keeps all its non-empty lines
    assert(Dedup.dedupLines(d, maxDocFreq = 4)
      .filter($"n_lines_dropped" > 0).count() == 0)
  }

  test("line dedup broadcastHot=false escape hatch matches the broadcast path", SlowTest) {
    // the web-scale fallback (shuffled hash join on the line hash) must be a
    // pure plan change: identical output on the boilerplate fixture, cap 1
    // (maximally hot) through cap 4 (nothing hot)
    val d = Seq(
      (1L, "alpha one\nCOOKIE NOTICE\nbeta two"),
      (2L, "COOKIE NOTICE\r\ngamma three\r\n\r"),
      (3L, "delta four\n\tCOOKIE NOTICE \nepsilon five\ndelta four"),
      (4L, "COOKIE NOTICE"),
      (5L, "  \n\n"),
      (6L, "zeta six\neta seven")).toDF("doc_id", "text")
    for (cap <- 1L to 4L; keepEmpty <- Seq(false, true)) {
      val bc = Dedup.dedupLines(d, cap, keepEmptyLines = keepEmpty)
        .as[(Long, String, Long, Long)].collect().sortBy(_._1).toSeq
      val sh = Dedup.dedupLines(d, cap, broadcastHot = false, keepEmptyLines = keepEmpty)
        .as[(Long, String, Long, Long)].collect().sortBy(_._1).toSeq
      assert(sh == bc, s"escape hatch diverged at cap $cap, keepEmptyLines=$keepEmpty")
    }
  }

  test("line dedup keepEmptyLines preserves blank structure without affecting counts") {
    val d = Seq(
      (1L, "alpha one\n\nCOOKIE NOTICE\nbeta two"),
      (2L, "COOKIE NOTICE\r\n\r\ngamma three"),
      (3L, "delta four\n \nCOOKIE NOTICE\nepsilon five"),
      (4L, "COOKIE NOTICE\n\nCOOKIE NOTICE"), // only blanks survive
      (5L, "  \n\n")).toDF("doc_id", "text") // whitespace-only: 3 blank lines
    val out = Dedup.dedupLines(d, maxDocFreq = 3, keepEmptyLines = true)
      .as[(Long, String, Long, Long)].collect().sortBy(_._1)
    // COOKIE NOTICE is in 4 docs — hot; blank lines stay at their positions
    assert(out(0) == ((1L, "alpha one\n\nbeta two", 2L, 1L)))
    assert(out(1) == ((2L, "\ngamma three", 1L, 1L)))
    assert(out(2) == ((3L, "delta four\n\nepsilon five", 2L, 1L)))
    assert(out(3) == ((4L, "", 0L, 2L))) // one interior blank remains... as ""
    assert(out(4) == ((5L, "\n\n", 0L, 0L))) // blanks verbatim, counts zero
    // counts are identical to the default mode — blanks are invisible to them
    val plain = Dedup.dedupLines(d, maxDocFreq = 3)
      .select($"doc_id", $"n_lines_kept", $"n_lines_dropped")
      .as[(Long, Long, Long)].collect().toSet
    val kept = Dedup.dedupLines(d, maxDocFreq = 3, keepEmptyLines = true)
      .select($"doc_id", $"n_lines_kept", $"n_lines_dropped")
      .as[(Long, Long, Long)].collect().toSet
    assert(kept == plain)
  }

  test("MinHash-LSH pairs equal exact trigram-Jaccard pairs on the testdata corpus", SlowTest) {
    // at k=128, b=32, r=4 the miss probability at the corpus's minimum
    // true-pair similarity (J≥0.9) is ~1e-15, and candidates are verified
    // with exact Jaccard — so LSH output must match the exact join
    val exact = Dedup.ngramJaccardPairs(docs, 3, 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val lsh = Dedup.minhashLshPairs(docs, 3, 128, 32, 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty) // the corpus plants near-duplicates
    assert(lsh == exact)
    // null-text docs have no signature and must NOT band-join each other
    // (a null sig would hash to a CONSTANT band bucket if not filtered)
    val withNulls = docs.unionByName(
      Seq((20001L, null.asInstanceOf[String]), (20002L, null.asInstanceOf[String]),
        (20003L, null.asInstanceOf[String]))
        .toDF("doc_id", "text"), allowMissingColumns = true)
    val lsh2 = Dedup.minhashLshPairs(withNulls, 3, 16, 4, 0.5)
      .filter($"id_a" >= 20000 || $"id_b" >= 20000)
    assert(lsh2.count() == 0)
  }

  test("prefix-filtered Jaccard pairs equal brute force, from strictly fewer candidates", SlowTest) {
    // the losslessness theorem, checked on real data: prefix filtering must
    // produce the IDENTICAL pair set (values included) at t = 1/2 ...
    val exact = Dedup.ngramJaccardPairs(docs, 3, 0.5)
      .as[(Long, Long, Double)].collect().toSet
    val pref = Dedup.prefixJaccardPairs(docs, 3, 1, 2)
      .as[(Long, Long, Double)].collect().toSet
    assert(exact.nonEmpty)
    assert(pref == exact)
    // ... and at a high threshold, where prefixes are shortest
    val exact9 = Dedup.ngramJaccardPairs(docs, 3, 0.9)
      .as[(Long, Long, Double)].collect().toSet
    val pref9 = Dedup.prefixJaccardPairs(docs, 3, 9, 10)
      .as[(Long, Long, Double)].collect().toSet
    assert(pref9 == exact9)
    // the point of the operator: the indexed relation is a strict subset of
    // the full inverted index (prefixes only), so the candidate join fans
    // out less than the brute-force join on the same corpus
    val full = docs.select($"doc_id".as("id"),
        explode(Dedup.wordShingles($"text", 3)).as("s"))
      .groupBy("s").agg(count(lit(1)).as("c"))
      .agg(sum($"c" * ($"c" - 1) / 2)).as[Double].head()
    val ex = docs.select($"doc_id".as("id"),
      size(Dedup.wordShingles($"text", 3)).as("n_sh"),
      explode(Dedup.wordShingles($"text", 3)).as("s"))
    val dfreq = ex.groupBy($"s").agg(count(lit(1)).as("df"))
    val preLen = ex.join(dfreq, Seq("s"))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy($"id")
          .orderBy($"df".asc, $"s".asc)))
      .where($"rk" <= $"n_sh" - expr("(1 * n_sh + 1) div 2") + 1)
      .groupBy("s").agg(count(lit(1)).as("c"))
      .agg(sum($"c" * ($"c" - 1) / 2)).as[Double].head()
    assert(preLen < full,
      s"prefix index must fan out fewer candidate pairs: $preLen vs $full")
  }

  test("word dropout: deterministic, rate-plausible, order-preserving, seed-independent") {
    import graft.operators.TextAnalysis
    val d = docs.limit(200)
    val a1 = TextAnalysis.wordDropout(d, 10)
      .as[(Long, String, Long, Long)].collect().sortBy(_._1)
    val a2 = TextAnalysis.wordDropout(d.repartition(9), 10)
      .as[(Long, String, Long, Long)].collect().sortBy(_._1)
    assert(a1.toSeq == a2.toSeq, "same seed must regenerate the same corpus")
    val kept = a1.map(_._3).sum.toDouble
    val total = a1.map(r => r._3 + r._4).sum.toDouble
    assert(math.abs(kept / total - 0.9) < 0.02,
      s"10% dropout must keep ~90%: ${kept / total}")
    // kept tokens preserve original order (subsequence check on one doc)
    val doc = d.filter($"doc_id" === a1.head._1)
      .select($"text").as[String].head()
    val orig = doc.trim.split("\\s+").toSeq
    val aug = a1.head._2.split(" ").toSeq.filter(_.nonEmpty)
    def isSubseq(sub: Seq[String], sup: Seq[String]): Boolean = {
      var i = 0
      sup.foreach { t => if (i < sub.length && sub(i) == t) i += 1 }
      i == sub.length
    }
    assert(isSubseq(aug, orig), "augmented text must be an ordered subsequence")
    // a different seed draws a different epoch
    val b = TextAnalysis.wordDropout(d, 10, seed = 7)
      .as[(Long, String, Long, Long)].collect().sortBy(_._1)
    assert(b.map(_._2).toSeq != a1.map(_._2).toSeq)
  }

  test("pair evidence: rarest shared shingles, df-ascending, present in both docs", SlowTest) {
    val pairs = Dedup.ngramJaccardPairs(docs, 3, 0.5)
    val ev = Dedup.pairEvidence(docs, pairs, n = 3, k = 3)
    val rows = ev.as[(Long, Long, String, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.groupBy(r => (r._1, r._2)).values.foreach { rs =>
      val sorted = rs.sortBy(_._5)
      assert(sorted.map(_._5).toSeq == (1L to sorted.length.toLong),
        s"ranks must be dense from 1: ${sorted.toSeq}")
      assert(sorted.map(_._4).toSeq == sorted.map(_._4).sorted.toSeq,
        s"evidence must be rarest-first: ${sorted.toSeq}")
    }
    // every evidence shingle must actually occur in BOTH documents
    val sh = docs.select($"doc_id",
      explode(Dedup.wordShingles($"text", 3)).as("shingle"))
    val missingA = ev.join(sh.toDF("id_a", "shingle"), Seq("id_a", "shingle"),
      "left_anti")
    val missingB = ev.join(sh.toDF("id_b", "shingle"), Seq("id_b", "shingle"),
      "left_anti")
    assert(missingA.count() == 0 && missingB.count() == 0,
      "evidence shingles must be genuinely shared")
  }

  test("temporal split: past trains, future tests, the embargo zone is labeled") {
    val day = 86400000000L
    // 10 days × 10 rows: the 4/5 mass point is day 7 (cum 80 ≥ 80)
    val rows = (0 until 100).map(i => (i.toLong, (i / 10).toLong * day + 5L))
      .toDF("event_id", "ts_us")
    val got = graft.operators.Sampling.timeSplit(
        rows, "ts_us", day, 4, 5, embargoBuckets = 1)
      .select($"event_id", $"split").as[(Long, String)].collect()
      .groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    assert(got("train") == (0L until 70L).toSet, s"train: ${got("train").size}")
    assert(got("embargo") == (70L until 80L).toSet, "day 7 is the buffer")
    assert(got("test") == (80L until 100L).toSet)
    // temporal ordering invariant: max train ts < min test ts strictly
    assert(got("train").max < got("test").min)
  }

  test("weighted quantile picks the exact mass-crossing value") {
    // g1: values 1..4 with weights 1,1,6,1 → total 9, half-mass 4.5 crossed
    // at value 3 (cum 8); unweighted median would be 2.5-ish
    val rows = Seq(("g1", 1.0, 1L), ("g1", 2.0, 1L), ("g1", 3.0, 6L),
      ("g1", 4.0, 1L), ("g2", 10.0, 2L), ("g2", 20.0, 1L))
      .toDF("g", "v", "w")
    val got = graft.operators.Profiling.weightedQuantile(
        rows, Seq("g"), col("v"), col("w"), 1, 2)
      .as[(String, Double)].collect().toMap
    assert(got == Map("g1" -> 3.0, "g2" -> 10.0), s"weighted medians: $got")
    // q = 9/10 lands on the top value of g1 (cum 9 ≥ 8.1)
    val p90 = graft.operators.Profiling.weightedQuantile(
        rows, Seq("g"), col("v"), col("w"), 9, 10)
      .as[(String, Double)].collect().toMap
    assert(p90("g1") == 4.0, s"p90: $p90")
  }

  test("association rules match hand-computed support/confidence/lift") {
    val rows = Seq( // baskets: b1={x,y} (dup row collapses), b2={x,y}, b3={x}, b4={y,z}
      (1L, "x"), (1L, "y"), (1L, "x"),
      (2L, "x"), (2L, "y"),
      (3L, "x"),
      (4L, "y"), (4L, "z")).toDF("basket", "item")
    val got = graft.operators.Sessions.associationRules(rows, Seq("basket"), "item")
      .as[(String, String, Long, Long, Long, Double, Double, Double)]
      .collect().map(r => (r._1, r._2) -> r).toMap
    val xy = got(("x", "y"))
    assert(xy._3 == 2 && xy._4 == 3 && xy._5 == 3)
    assert(xy._6 == 0.5 && math.abs(xy._7 - 2.0 / 3) < 1e-12 &&
      math.abs(xy._8 - 8.0 / 9) < 1e-12, s"xy stats: $xy")
    val yz = got(("y", "z"))
    assert(yz._3 == 1 && math.abs(yz._8 - 4.0 / 3) < 1e-12, s"yz stats: $yz")
    assert(!got.contains(("x", "z")), "never-co-occurring pairs don't appear")
  }

  test("OLS trend recovers an exact line; degenerate groups yield NULL") {
    val pts = (0L to 10L).map(x => ("up", x, 3 * x + 7)) ++
      Seq(("flat", 5L, 9L), ("flat", 6L, 9L), ("one", 4L, 2L))
    val got = graft.operators.Profiling.trend(
        pts.toDF("g", "x", "y"), Seq("g"), col("x"), col("y"))
      .as[(String, Long, Option[Double], Option[Double])].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got("up") == ((11L, Some(3.0), Some(7.0))),
      s"perfect line must fit exactly: ${got("up")}")
    assert(got("flat") == ((2L, Some(0.0), Some(9.0))))
    assert(got("one") == ((1L, None, None)), "single point has no slope")
  }

  test("column-profile diff reports nulls, cardinality, and range per column") {
    val o = Seq((1L, Some(10.0)), (2L, Some(20.0)), (3L, Some(20.0)))
      .toDF("k", "v")
    val n = Seq((1L, Some(10.0)), (2L, None), (4L, Some(99.5)))
      .toDF("k", "v")
    val got = graft.operators.Profiling.profileDiff(o, n, Seq("k", "v"))
      .collect().map(r => r.getString(0) -> r).toMap
    val k = got("k")
    assert(k.getLong(k.fieldIndex("old_n_rows")) == 3 &&
      k.getLong(k.fieldIndex("new_n_distinct")) == 3 &&
      k.getDouble(k.fieldIndex("new_max")) == 4.0)
    val v = got("v")
    assert(v.getLong(v.fieldIndex("old_n_nulls")) == 0 &&
      v.getLong(v.fieldIndex("new_n_nulls")) == 1, "the minted null must surface")
    assert(v.getLong(v.fieldIndex("old_n_distinct")) == 2 &&
      v.getDouble(v.fieldIndex("new_max")) == 99.5)
  }

  test("cohort retention triangle matches a hand-computed fixture") {
    val day = 86400000000L
    val ev = Seq( // (user, day): A {0,1,3}, B {0,2}, C {1}; dup row collapses
      (1L, 0L), (1L, 1L), (1L, 3L), (1L, 3L),
      (2L, 0L), (2L, 2L),
      (3L, 1L))
      .map { case (u, d) => (u, d * day + 12345L) }
      .toDF("user_id", "ts_us")
    val got = graft.operators.Sessions.retention(ev, day)
      .as[(Long, Long, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    assert(got == Map(
      (0L, 0L) -> ((2L, 2L, 1.0)), // cohort day0 = {A, B}
      (0L, 1L) -> ((1L, 2L, 0.5)), // A returns day1
      (0L, 2L) -> ((1L, 2L, 0.5)), // B returns day2
      (0L, 3L) -> ((1L, 2L, 0.5)), // A returns day3 (dup row counts once)
      (1L, 0L) -> ((1L, 1L, 1.0))), // cohort day1 = {C}
      s"retention triangle mismatch: $got")
  }

  test("tf-cosine pairs: repetition-aware where Jaccard is blind, exact under repartitioning", SlowTest) {
    val d = Seq(
      (1L, "alpha alpha alpha beta"),
      (2L, "alpha beta"), // same token SET as doc 1 — Jaccard 1.0
      (3L, "alpha beta " * 40), // doc 2 pasted 40× — cosine must say ~identical
      (4L, "gamma delta")).toDF("doc_id", "text")
    val got = Dedup.cosineTfPairs(d, threshold = 0.0)
      .as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    // hand-computed: (3·1 + 1·1) / (√10 · √2)
    assert(math.abs(got((1L, 2L)) - 4.0 / math.sqrt(20.0)) < 1e-12)
    assert(math.abs(got((2L, 3L)) - 1.0) < 1e-12,
      s"paste-40× of the same text must score 1.0: ${got((2L, 3L))}")
    assert(!got.contains((1L, 4L)), "disjoint vocab pairs never co-occur")
    // integer sums are associative: identical values under any partitioning
    val got2 = Dedup.cosineTfPairs(d.repartition(7), threshold = 0.0)
      .as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(got2 == got)
    // trigram-term mode: positional n-grams WITH multiplicity
    val d3 = Seq((1L, "a b c b c d"), (2L, "a b c d")).toDF("doc_id", "text")
    val got3 = Dedup.cosineTfPairs(d3, threshold = 0.0, n = 3)
      .as[(Long, Long, Double)].head()
    // doc1 grams {a b c, b c b, c b c, b c d}, doc2 {a b c, b c d}:
    // idot = 2, n2 = 4 and 2 → 2/√8
    assert(got3._1 == 1L && got3._2 == 2L &&
      math.abs(got3._3 - 2.0 / math.sqrt(8.0)) < 1e-12, s"trigram cosine: $got3")
    // df cap drops the hot term from scoring entirely
    val capped = Dedup.cosineTfPairs(d, threshold = 0.0, maxDocFreq = 2)
      .as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(!capped.contains((1L, 2L)) || capped((1L, 2L)) != got((1L, 2L)),
      s"df>2 terms (alpha, beta live in 3 docs) must leave the index: $capped")
  }

  test("native MinHash signature is bit-identical to the explode + min-aggregate formulation") {
    val k = 16
    val base = docs.select($"doc_id".as("id"),
      Dedup.wordShingles($"text", 3).as("shingles"))
    val native = base.select($"id", Dedup.minhashSignature($"shingles", k).as("sig"))
      .as[(Long, Seq[Long])].collect().toMap
    val viaAgg = {
      val hashed = base.select($"id", explode($"shingles").as("s"))
        .select($"id", xxhash64($"s").as("h"))
      val sigCols = (0 until k).map(i => min(xxhash64($"h", lit(i))).as(s"m$i"))
      hashed.groupBy("id").agg(sigCols.head, sigCols.tail: _*)
        .select($"id", array((0 until k).map(i => col(s"m$i")): _*).as("sig"))
        .as[(Long, Seq[Long])].collect().toMap
    }
    assert(native == viaAgg)
    // empty shingle array: NULL signature (the explode form emits no row),
    // so empty docs can never flood an LSH band bucket
    val edge = Seq(Tuple1(Seq.empty[String]), Tuple1(Seq(null.asInstanceOf[String])))
      .toDF("shingles")
      .select(Dedup.minhashSignature($"shingles", 4).as("sig"))
      .collect()
    assert(edge(0).isNullAt(0))
    // a null ELEMENT contributes with the seed left unchanged, exactly like
    // xxhash64(null) in the aggregate formulation
    val nullElemExpected = Seq(Tuple1(1))
      .toDF("x")
      .select(array((0 until 4).map(i =>
        xxhash64(xxhash64(lit(null).cast("string")), lit(i))): _*).as("sig"))
      .as[Seq[Long]].head()
    assert(edge(1).getSeq[Long](0) == nullElemExpected)
  }

  test("SimHash: near-identical docs collide, hamming is symmetric-bounded", SlowTest) {
    val pairs = Dedup.simhashPairs(docs, maxHamming = 3)
    val exact = Dedup.ngramJaccardPairs(docs, 3, 0.9)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val sim = pairs.select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.filter($"hamming" > 3).count() == 0)
    // docs with ≥0.9 trigram overlap are token-near-identical → simhash finds most
    assert(exact.intersect(sim).size >= exact.size / 2)
  }

  test("group centroid map: identical groups score 1, orthogonal score 0, partition-invariant") {
    import graft.operators.Similarity
    val rows = Seq(
      (1L, Array(1f, 0f, 0f, 1f), "a"), (2L, Array(0f, 1f, 0f, 1f), "a"),
      (3L, Array(1f, 0f, 0f, 1f), "b"), (4L, Array(0f, 1f, 0f, 1f), "b"),
      (5L, Array(0f, 0f, 1f, 0f), "c")) // orthogonal to a/b's mean? not exactly — just a third group
      .toDF("vec_id", "embedding", "source")
    val got = Similarity.groupCentroidSim(rows, "source")
      .as[(String, String, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(math.abs(got(("a", "b")) - 1.0) < 1e-9,
      s"identical vector sets must give centroid cosine 1: ${got(("a", "b"))}")
    assert(got(("a", "c")) < 0.5 && got(("b", "c")) < 0.5)
    val got2 = Similarity.groupCentroidSim(rows.repartition(7), "source")
      .as[(String, String, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(got2 == got, "fixed-point sums must make the map partition-invariant")
  }

  test("binary-sign search with a full rerank budget equals exact brute force", SlowTest) {
    import graft.operators.Similarity
    val q = emb.filter($"vec_id" < 10)
    val n = emb.count().toInt
    // rerank >= |corpus| keeps every candidate: the hamming stage is then
    // pure reordering and the exact-cosine rerank must reproduce brute force
    val b = Similarity.binaryTopK(q, emb, 5, n)
      .as[(Long, Long, Int, Double)].collect().toSet
    val e = Similarity.bruteForceTopK(q, emb, 5)
      .as[(Long, Long, Int, Double)].collect().toSet
    assert(b == e, "full-budget binary rerank must equal exact top-k")
    // at a 32-candidate budget the result is still k rows per query and
    // every returned cosine is a true pair score (sanity, not recall)
    val small = Similarity.binaryTopK(q, emb, 5, 32)
    assert(small.groupBy("query_id").count().as[(Long, Long)].collect()
      .forall(_._2 == 5))
  }

  test("bitext mining: mined pairs form a partial matching of mutual-kNN " +
      "best-margin candidates above threshold") {
    import graft.operators.Similarity
    val src = emb.filter($"vec_id" % 2 === 0)
    val tgt = emb.filter($"vec_id" % 2 === 1)
    val k = 4
    val mined = Similarity.bitextMine(src, tgt, k, threshold = 1.0)
      .as[(Long, Long, Double, Double)].collect()
    assert(mined.nonEmpty, "fixture should mine a non-trivial pair set")
    // a MATCHING: each endpoint appears at most once (both-argmax filter)
    assert(mined.map(_._1).distinct.length == mined.length)
    assert(mined.map(_._2).distinct.length == mined.length)
    assert(mined.forall(_._4 > 1.0))
    // every mined pair is mutual k-NN: y in x's forward top-k AND x in
    // y's backward top-k (checked against the exact top-k operator)
    val fwd = Similarity.bruteForceTopK(src, tgt, k)
      .select($"query_id", $"neighbor_id")
      .as[(Long, Long)].collect().toSet
    val bwd = Similarity.bruteForceTopK(tgt, src, k)
      .select($"query_id", $"neighbor_id")
      .as[(Long, Long)].collect().toSet
    assert(mined.forall { case (s, t, _, _) =>
      fwd.contains((s, t)) && bwd.contains((t, s)) })
  }

  test("URL canonicalization: case, fragment, tracking params, trailing " +
      "slash — real params survive") {
    import graft.operators.Dedup
    val cases = Seq(
      ("HTTPS://WWW.Ex.COM/A/1/?utm_source=x&id=3&fbclid=z#top",
        "https://www.ex.com/A/1?id=3"), // host lowers, PATH case stays
      ("http://ex.com/p?utm_a=1&utm_b=2", "http://ex.com/p"),
      ("https://Ex.com/", "https://ex.com"),
      ("https://ex.com/p?page=2&ref=tw", "https://ex.com/p?page=2"),
      ("https://ex.com/p", "https://ex.com/p"))
    val got = cases.map(_._1).toDF("url")
      .select(Dedup.urlCanonical($"url")).as[String].collect().toSeq
    assert(got == cases.map(_._2), s"got $got")
  }

  test("Bradley-Terry: the driver-local MM loop equals the distributed " +
      "loop row for row", SlowTest) {
    import graft.operators.Preference
    // repeated pairs, a never-winner, both directions — the BT streaming
    // fixture's shape
    val cmp = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L), (4L, 5L),
      (2L, 1L), (1L, 4L), (1L, 5L), (2L, 4L), (3L, 5L), (1L, 2L), (2L, 3L))
      .toDF("winner", "loser")
    val counts = cmp.groupBy("winner", "loser").agg(count(lit(1)).as("n"))
    for (iters <- Seq(1, 4, 8)) {
      val local = Preference.bradleyTerryWeightedLocal(counts, iters)
        .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
      val dist = Preference.bradleyTerryWeightedDistributed(counts, iters)
        .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
      assert(local == dist, s"iters=$iters")
    }
  }

  test("BT calibration: a perfectly calibrated bucket reads emp == mid; " +
      "k-anonymity audit matches hand counts") {
    import graft.operators.{Preference, Profiling}
    // strengths 300 vs 100 → P(1 beats 2) = 0.75 → bucket 7; the log's
    // empirical rate is made exactly 3/4
    val cmp = Seq((1L, 2L), (1L, 2L), (1L, 2L), (2L, 1L))
      .toDF("winner", "loser")
    val st = Seq((1L, 300L, 3L), (2L, 100L, 1L))
      .toDF("item", "strength_fp", "wins")
    val cal = Preference.btCalibration(cmp, st, bins = 10)
      .as[(Long, Long, Long, Double, Double)].collect()
    assert(cal.toSeq == Seq((7L, 4L, 3L, 0.75, 0.75)))
    val rows = (Seq.fill(5)("a") ++ Seq.fill(2)("b") ++ Seq("c")).toDF("q")
    val audit = Profiling.kAnonymityAudit(rows, Seq($"q"), k = 3L)
      .as[(Long, Long, Long, Long, Long, Double)].collect().head
    assert(audit == ((8L, 3L, 1L, 2L, 3L, 3.0 / 8.0)))
  }

  test("bitext IVF miner with a full probe equals the exact miner", SlowTest) {
    import graft.operators.Similarity
    val src = emb.filter($"vec_id" % 2 === 0)
    val tgt = emb.filter($"vec_id" % 2 === 1)
    val exact = Similarity.bitextMine(src, tgt, 4, 1.0)
      .as[(Long, Long, Double, Double)].collect().toSet
    // nProbe == nLists scores every cell → the kNNs equal brute force and
    // the mined set must be IDENTICAL, margins included
    val full = Similarity.bitextMineIvf(src, tgt, 4, 1.0,
        nLists = 8, nProbe = 8)
      .as[(Long, Long, Double, Double)].collect().toSet
    assert(full == exact)
    // a partial probe approximates: neighborhood sums shift under the
    // probe cut, so MINED-set recall is well below kNN recall — on this
    // near-uniform synthetic fixture (an IVF worst case: no cluster
    // structure for cells to exploit) nProbe 3/8 lands ~40%; assert the
    // floor that catches a broken probe, not fixture-tuned luck
    val approx = Similarity.bitextMineIvf(src, tgt, 4, 1.0,
        nLists = 8, nProbe = 3)
      .select($"src_id", $"tgt_id").as[(Long, Long)].collect().toSet
    val exactPairs = exact.map(e => (e._1, e._2))
    assert(approx.intersect(exactPairs).size * 4 >= exactPairs.size,
      s"IVF recall collapsed: ${approx.intersect(exactPairs).size}/${exactPairs.size}")
  }

  test("batched k-center equals serial greedy at every batch size and " +
      "cuts the driver-round count once modes are covered", SlowTest) {
    import graft.operators.Similarity
    // isotropic fixture: equality must hold (rows bit-identical), though
    // near-equidistant points rarely batch — not asserted on rounds
    val kIso = 8
    val serialIso = Similarity.kcenterSelect(emb, kIso)
      .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    for (b <- Seq(1, 4)) {
      val got = Similarity.kcenterSelectBatched(emb, kIso, b)
        .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
      assert(got == serialIso, s"iso batchB=$b diverged from serial greedy")
    }
    // clustered corpus, k WELL BEYOND the mode count — the real coreset
    // regime (k ≫ modes): once every cluster holds a center, each
    // candidate's max-cos is intra-cluster-high while cross-cluster
    // mutual cosines stay near 0, so the accept-prefix condition holds
    // and batches fill
    val cl = RecallBench.clusteredCorpus(spark, 400L, 32, 8, 0.15)
    val k = 40
    val serial = Similarity.kcenterSelect(cl, k)
      .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    var roundsAt = Map.empty[Int, Int]
    for (b <- Seq(1, 8)) {
      val (df, rounds) =
        Similarity.kcenterSelectBatchedCounted(cl, k, b)
      val got = df.as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
      // the accept-prefix rule is EXACT Gonzalez — rows identical, every b
      assert(got == serial, s"clustered batchB=$b diverged from serial")
      roundsAt += b -> rounds
    }
    // batch=1 degenerates to the serial loop (k−1 rounds after the seed);
    // batch=8 must collapse the refinement phase
    info(s"driver rounds at k=$k over 8 modes: $roundsAt")
    assert(roundsAt(1) == k - 1)
    assert(roundsAt(8) * 2 <= roundsAt(1), s"rounds: $roundsAt")
  }

  test("k-center selection matches a driver-side naive farthest-point model") {
    import graft.operators.Similarity
    val k = 5
    val got = Similarity.kcenterSelect(emb, k)
      .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(got.map(_._1) == (1L to k.toLong))
    assert(got.map(_._2).distinct.length == k)
    // coverage curve is non-decreasing after rank 1 (greedy invariant)
    assert(got.drop(1).map(_._3).sliding(2).forall(p => p.length < 2 || p(0) <= p(1)))
    // naive model over collected unit vectors, same seeding and tie-breaks
    val vecs = emb.select($"vec_id", $"embedding").as[(Long, Array[Float])]
      .collect().map { case (id, v) =>
        val d = v.map(_.toDouble)
        val n = math.sqrt(d.foldLeft(0.0)((a, x) => a + x * x))
        id -> d.map(_ / n)
      }.sortBy(_._1)
    def dot(a: Array[Double], b: Array[Double]) = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      s
    }
    val firstId = got.head._2
    var picked = Vector(firstId)
    var centers = Vector(vecs.find(_._1 == firstId).get._2)
    for (r <- 2 to k) {
      val (id, v, mc) = vecs.filter(p => !picked.contains(p._1)).map {
        case (id, v) => (id, v, centers.map(c => dot(v, c)).max)
      }.minBy { case (id, _, mc) => (mc, id) }
      assert(got(r - 1)._2 == id, s"round $r picked ${got(r - 1)._2}, naive $id")
      assert(math.abs(got(r - 1)._3 - mc) < 1e-9)
      picked :+= id; centers :+= v
    }
  }

  // SlowTest: 2 × k driver rounds; the driver oracle gate covers sample_mmr
  test("MMR selection matches a driver-side naive greedy; λ=1 degenerates " +
      "to pure relevance order", SlowTest) {
    import graft.operators.Similarity
    val k = 6
    val got = Similarity.mmrSelect(emb, k, lambda = 0.5)
      .as[(Long, Long, Double, Double)].collect().sortBy(_._1).toSeq
    assert(got.map(_._1) == (1L to k.toLong))
    assert(got.map(_._2).distinct.length == k)
    // naive model over collected unit vectors: same query convention
    // (min-id vector), same IEEE op order, same (score desc, id asc) pick
    val vecs = emb.select($"vec_id", $"embedding").as[(Long, Array[Float])]
      .collect().map { case (id, v) =>
        val d = v.map(_.toDouble)
        val n = math.sqrt(d.foldLeft(0.0)((a, x) => a + x * x))
        id -> d.map(_ / n)
      }.sortBy(_._1)
    def dot(a: Array[Double], b: Array[Double]) = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      s
    }
    val (qid, qv) = vecs.head
    val cands = vecs.tail.map { case (id, v) => (id, v, dot(v, qv)) }
    var picked = Vector.empty[(Long, Array[Double])]
    for (r <- 1 to k) {
      val (id, v, rel, score) = cands
        .filter(c => !picked.exists(_._1 == c._1))
        .map { case (id, v, rel) =>
          val ms = if (picked.isEmpty) 0.0 else picked.map(p => dot(v, p._2)).max
          (id, v, rel, 0.5 * rel - 0.5 * ms)
        }.minBy { case (id, _, _, s) => (-s, id) }
      assert(got(r - 1)._2 == id, s"round $r picked ${got(r - 1)._2}, naive $id")
      assert(got(r - 1)._3 == rel, s"round $r rel mismatch")
      assert(got(r - 1)._4 == score, s"round $r score mismatch")
      picked :+= ((id, v))
    }
    // from rank 2 on the curve is non-increasing (the greedy invariant:
    // a later round's scores are pointwise ≤ the earlier round's); rank
    // 1→2 may RISE when cosines to pick 1 are negative (the empty-set
    // max-sim convention is 0, not −1), so it is excluded
    assert(got.drop(1).map(_._4).sliding(2)
      .forall(p => p.length < 2 || p(0) >= p(1)))
    // λ=1: the max-sim term vanishes — picks are exactly relevance order
    val pure = Similarity.mmrSelect(emb, k, lambda = 1.0)
      .as[(Long, Long, Double, Double)].collect().sortBy(_._1).map(_._2).toSeq
    val relOrder = cands.sortBy { case (id, _, rel) => (-rel, id) }
      .take(k).map(_._1).toSeq
    assert(pure == relOrder, s"λ=1 picks $pure != relevance order $relOrder")
  }

  test("brute-force top-k matches a driver-side naive computation") {
    val vecs = emb.select($"vec_id", $"embedding").as[(Long, Array[Float])]
      .collect().toMap.view.mapValues(_.map(_.toDouble)).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val got = Similarity.bruteForceTopK(emb.filter($"vec_id" < 3), emb, 4)
      .select($"query_id", $"neighbor_id", $"rank").as[(Long, Long, Int)]
      .collect().groupBy(_._1).view
      .mapValues(_.sortBy(_._3).map(_._2).toSeq).toMap
    for (q <- 0L until 3L) {
      val expected = vecs.keys.filter(_ != q).toSeq
        .map(i => (i, cos(vecs(q), vecs(i))))
        .sortBy { case (i, c) => (-c, i) }.take(4).map(_._1)
      assert(got(q) == expected, s"query $q")
    }
  }

  test("IVF top-k with exhaustive probe equals brute force; partial probe is well-formed", SlowTest) {
    val queries = emb.filter($"vec_id" < 5)
    val brute = Similarity.bruteForceTopK(queries, emb, 3)
      .select($"query_id", $"neighbor_id", $"rank").as[(Long, Long, Int)].collect().toSet
    val exhaustive = Similarity.ivfTopK(queries, emb, 3, nLists = 8, nProbe = 8)
      .select($"query_id", $"neighbor_id", $"rank").as[(Long, Long, Int)].collect().toSet
    assert(exhaustive == brute)
    val partial = Similarity.ivfTopK(queries, emb, 3, nLists = 16, nProbe = 4)
      .select($"query_id", $"neighbor_id", $"rank").as[(Long, Long, Int)].collect()
    assert(partial.groupBy(_._1).forall { case (_, rs) =>
      rs.length <= 3 && rs.map(_._3).sorted.sameElements(1 to rs.length)
    })
    // fitted cells, exhaustive probe: still exactly brute force — the probe
    // is recall-lossy only when nProbe < nLists, never from the centroids
    val cents = Similarity.kmeansCentroids(emb, nLists = 8, rounds = 2)
    val fitted = Similarity.ivfTopKWith(queries, emb, 3, cents, nProbe = cents.size)
      .select($"query_id", $"neighbor_id", $"rank").as[(Long, Long, Int)].collect().toSet
    assert(fitted == brute)
  }

  test("LSH-bucketed similarity pairs are a verified subset of brute force", SlowTest) {
    val brute = Dedup.embeddingPairs(emb, 0.4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val lsh = Similarity.lshBucketedPairs(emb, 0.4, nPlanes = 6, tables = 8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(lsh.subsetOf(brute)) // exact verification → no false positives
  }

  test("semantic (SemDeDup) pairs: subset of brute force; nLists=1 is exactly brute force") {
    val brute = Dedup.embeddingPairs(emb, 0.4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(brute.nonEmpty) // the corpus plants near-duplicates
    // cell-bucketed pairs carry exact cosines — only boundary-straddling
    // pairs may be missed, never invented
    val sem = Dedup.semanticPairs(emb, 0.4, nLists = 8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(sem.subsetOf(brute))
    // one cell = no boundaries: SemDeDup degrades to exact brute force
    val one = Dedup.semanticPairs(emb, 0.4, nLists = 1)
    assert(one.select("id_a", "id_b").as[(Long, Long)].collect().toSet == brute)
    assert(one.select("cell").distinct().as[Int].collect().toSeq == Seq(0))
    // empty corpus (no centroids to sample): empty result, correct schema
    val none = Dedup.semanticPairs(emb.filter($"vec_id" < 0), 0.4, nLists = 8)
    assert(none.columns.toSeq == Seq("id_a", "id_b", "cell", "cosine"))
    assert(none.count() == 0)
  }

  test("bigram LM scores are exact add-one-smoothed mean NLLs") {
    val d = Seq((1L, "a b a b"), (2L, "a b c"), (3L, "x")).toDF("doc_id", "text")
    // minCount=2 retains unigrams {a:3, b:3} (V=2) and bigram {"a b": 3};
    // c, x and the bigrams "b a"/"b c" fall into the smoothing mass
    val got = TextAnalysis.lmScores(d, d, minCount = 2)
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    val nllAB = -math.log(4.0 / 6.0)  // (C("a b")+1) / (C(a)+V+1)
    val nllOovAfterB = -math.log(1.0 / 6.0) // unretained bigram, retained w1=b
    assert(got(0)._1 == 1L && got(0)._2 == 3L)
    assert(math.abs(got(0)._3 - (2 * nllAB + nllOovAfterB) / 3) < 1e-12)
    assert(got(1)._1 == 2L && got(1)._2 == 2L)
    assert(math.abs(got(1)._3 - (nllAB + nllOovAfterB) / 2) < 1e-12)
    assert(got(2) == ((3L, 0L, 0.0))) // single token: no bigrams, row kept
    // ws-class trim: a trailing newline must not mint a phantom "" token —
    // scores are identical to the clean corpus (fit AND scoring sides)
    val dNl = Seq((1L, "a b a b\n"), (2L, "\ta b c"), (3L, "x\r\n"))
      .toDF("doc_id", "text")
    val gotNl = TextAnalysis.lmScores(dNl, dNl, minCount = 2)
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    assert(gotNl.map(t => (t._1, t._2)).toSeq == got.map(t => (t._1, t._2)).toSeq)
    gotNl.zip(got).foreach { case (a, b) => assert(math.abs(a._3 - b._3) < 1e-12) }
    // a doc made of reference-like text scores strictly lower than one made
    // of never-seen tokens (the filtering signal)
    val probe = Seq((10L, "a b a b a b"), (11L, "q r s t u v")).toDF("doc_id", "text")
    val p = TextAnalysis.lmScores(probe, d, minCount = 2)
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    assert(p(0)._3 < p(1)._3)
  }

  test("URL extraction keeps order + case; blocklist drops exact and subdomain matches") {
    val d = Seq(
      (1L, "pre https://Www.Ex.COM/a?q=1 mid http://sub.bad.net/x post"),
      (2L, "no urls here"),
      (3L, "ftp://ignored then http://bad.net"),
      (4L, "https://good.org/ok and https://notbad.net/y")).toDF("doc_id", "text")
    val ex = d.select($"doc_id",
        posexplode(TextAnalysis.urls($"text")).as(Seq("pos", "url")))
      .withColumn("domain", TextAnalysis.urlDomain($"url"))
      .as[(Long, Int, String, String)].collect().toSeq
    assert(ex == Seq(
      (1L, 0, "https://Www.Ex.COM/a?q=1", "www.ex.com"),
      (1L, 1, "http://sub.bad.net/x", "sub.bad.net"),
      (3L, 0, "http://bad.net", "bad.net"),
      (4L, 0, "https://good.org/ok", "good.org"),
      (4L, 1, "https://notbad.net/y", "notbad.net")))
    // bad.net blocks doc 3 (exact) and doc 1 (subdomain sub.bad.net) but NOT
    // doc 4's notbad.net (suffix rule requires a dot boundary); a NULL-text
    // doc has no URLs and must be KEPT (three-valued-logic regression)
    val withNull = d.unionByName(
      Seq((5L, null.asInstanceOf[String])).toDF("doc_id", "text"))
    val kept = TextAnalysis.dropBlockedDomains(withNull, Seq("bad.net"))
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(2L, 4L, 5L))
  }

  test("token counting handles empty/whitespace/multi-space text") {
    val d = Seq("", "   ", "one", "a  b\tc", " x y ").toDF("text")
    val counts = d.select(TextAnalysis.tokenCount($"text")).as[Int].collect().toSeq
    assert(counts == Seq(0, 0, 1, 3, 2))
  }

  test("langId picks the language with most stopword hits, 'und' when none") {
    val d = Seq(
      "the cat sat on the mat and it is that",
      "el perro y la casa en un que se no",
      "zzz qqq xxx").toDF("text")
    val langs = d.select(TextAnalysis.langId($"text")).as[String].collect().toSeq
    assert(langs == Seq("en", "es", "und"))
  }

  test("join-based langId agrees with the scalar fold on the corpus", SlowTest) {
    val scalar = docs.select($"doc_id", TextAnalysis.langId($"text").as("lang_pred"))
      .as[(Long, String)].collect().toMap
    val joined = TextAnalysis.langIdByJoin(docs)
      .as[(Long, String)].collect().toMap
    assert(joined == scalar)
  }

  test("scalar minhash signature matches the fast explode+groupBy path's hashes") {
    // the fast path's slot i is min(xxhash64(xxhash64(shingle), i)) — assert
    // the scalar HOF expression produces identical signatures
    val scalar = docs.limit(20)
      .select($"doc_id", Dedup.minhashSignature(Dedup.wordShingles($"text", 3), 16).as("sig"))
      .as[(Long, Seq[Long])].collect().toMap
    val exploded = docs.limit(20)
      .select($"doc_id", explode(Dedup.wordShingles($"text", 3)).as("s"))
      .select($"doc_id", xxhash64($"s").as("h"))
    val fast = exploded.groupBy("doc_id")
      .agg(array((0 until 16).map(i => min(xxhash64($"h", lit(i)))): _*).as("sig"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(scalar == fast)
  }

  test("repetition signals match hand-computed Gopher-style fractions") {
    // "a b\na b\nc d": 3 lines, 2 distinct → dup_line_frac = 1/3;
    // dup lines hold 6 of 9 line chars → dup_line_char_frac = 2/3;
    // 2-grams of [a b a b c d] = [a b, b a, a b, b c, c d] → top "a b" ×2,
    // len("a b\na b\nc d") = 11 → top2 = 2·3/11
    val d = Seq(
      (1L, "a b\na b\nc d"),
      (2L, "x y z"),     // no repeats: dup fracs 0, top2 = 3/5
      (3L, ""),          // empty: all zeros
      (4L, " \n \n ")).toDF("doc_id", "text") // whitespace lines drop
    val rows = graft.operators.TextAnalysis.repetitionSignals(d)
      .as[(Long, Long, Double, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    // 3-grams are all unique (count 1, length 5) → tie-break picks "b c d", 5/11
    assert(rows(1L) == ((1L, 3L, 1.0 - 2.0 / 3.0, 6.0 / 9.0, 6.0 / 11.0, 5.0 / 11.0)))
    assert(rows(2L) == ((2L, 1L, 0.0, 0.0, 3.0 / 5.0, 5.0 / 5.0)))
    assert(rows(3L) == ((3L, 0L, 0.0, 0.0, 0.0, 0.0)))
    // " \n \n " set-trims the whole [\t\n\f\r ] class to "" → zero tokens,
    // zero grams, all fractions 0.0; the DuckDB mirror set-trims identically.
    // Pinned so a revert to space-only trim (which minted phantom "" edge
    // tokens and scored 0.2 here) fails this test
    assert(rows(4L) == ((4L, 0L, 0.0, 0.0, 0.0, 0.0)))
  }

  test("quality filter drops short, line-duplicated and gram-repetitious docs") {
    val good = (1 to 20).map(i => s"w$i").mkString(" ") // 20 distinct tokens
    val d = Seq(
      (1L, good),                                // passes every rule
      (2L, "too short"),                         // n_tokens < 15
      (3L, (good + "\n") * 3 + good),            // 4 identical lines → dup_line_frac 0.75
      (4L, Seq.fill(20)("spam spam").mkString(" "))) // one dominant 2-gram
      .toDF("doc_id", "text")
    val kept = graft.operators.TextAnalysis.qualityFilter(d)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L))
    // thresholds are parameters, not constants: loosening them re-admits docs
    // (top-gram coverage can exceed 1.0 — overlapping occurrences count their
    // characters once per occurrence — so "no limit" means a value above 2)
    val loose = graft.operators.TextAnalysis.qualityFilter(d,
      minTokens = 1, maxDupLineFrac = 1.0, maxTop2gramCharFrac = 10.0,
      maxTop3gramCharFrac = 10.0).select("doc_id").as[Long].collect().toSet
    assert(loose == Set(1L, 2L, 3L, 4L))
  }

  test("token chunking: fixed windows advancing by chunkSize − overlap") {
    // 10 tokens, size 4, overlap 1 → stride 3, ceil(9/3)=3 chunks, each
    // consecutive pair sharing exactly one token; empty docs emit nothing;
    // short docs emit one (short) chunk
    val d = Seq((1L, (1 to 10).map("t" + _).mkString(" ")), (2L, ""), (3L, "a"))
      .toDF("doc_id", "text")
    val rows = graft.operators.TextAnalysis.chunkByTokens(d, 4, 1)
      .as[(Long, Long, String)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(rows == Seq(
      (1L, 0L, "t1 t2 t3 t4"),
      (1L, 1L, "t4 t5 t6 t7"),
      (1L, 2L, "t7 t8 t9 t10"),
      (3L, 0L, "a")))
  }

  test("int8 quantization round-trips within scale/2 per slot; zero vectors survive") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select("vec_id", "embedding")
      .unionByName(Seq((9999L, Array.fill(4)(0f))).toDF("vec_id", "embedding"))
    val q = graft.operators.Similarity.quantize(emb)
    // every slot is an integer in [-127, 127]
    val bounds = q.select(explode($"qvec").as("q")).agg(min($"q"), max($"q"))
      .as[(Long, Long)].head()
    assert(bounds._1 >= -127 && bounds._2 <= 127)
    // |dequantized − original| ≤ scale/2 per slot
    val err = graft.operators.Similarity.dequantize(q)
      .withColumnRenamed("embedding", "deq")
      .join(emb, "vec_id")
      .join(q.select($"vec_id", $"scale"), "vec_id")
      .select(max(expr(
        "aggregate(zip_with(deq, cast(embedding as array<double>), (a, b) -> abs(a - b)), " +
          "0d, (acc, x) -> greatest(acc, x)) - scale / 2")))
      .as[Double].head()
    assert(err <= 1e-12, s"round-trip error exceeds scale/2 by $err")
    // the all-zero vector quantizes to zeros with scale 0
    val z = q.filter($"vec_id" === 9999L).select($"scale", $"qvec")
      .as[(Double, Seq[Long])].head()
    assert(z._1 == 0.0 && z._2 == Seq(0L, 0L, 0L, 0L))
  }

  test("WordNGrams agrees with tokens() split semantics on edge whitespace") {
    // tokens() SET-trims the [\t\n\f\r ] class from both ends then splits on
    // the same class; the native expression must agree for every input or the
    // DuckDB mirrors (same set-trim+split) silently diverge on edge newlines
    import graft.operators.TextAnalysis.tokens
    val d = Seq("hi.\n", "\nhi.", "a b ", " a b", "\t a \n", "\n", "")
      .toDF("text")
    val viaTokens = d.select(
      transform(sequence(lit(1), greatest(size(tokens($"text")) - 1, lit(1))),
        i => array_join(slice(tokens($"text"), i, lit(2)), " ")).as("g"))
      .as[Seq[String]].collect().toSeq
    val viaNative = d
      .select(graft.functions.TextExpressions.wordNGramsAll($"text", 2))
      .as[Seq[String]].collect().toSeq
    assert(viaNative == viaTokens)
  }

  test("PolyHash64 matches the independent fold+splitmix64 reference") {
    val inputs = Seq("", "a", "hello", "the quick brown fox", "τoken-ütf8")
    val got = inputs.toDF("s")
      .select(graft.functions.HashExpressions.polyHash64($"s"))
      .as[Long].collect()
    assert(got.toSeq == inputs.map(TestRefs.polyHash64))
  }

  test("fast simhash signatures equal the scalar expression") {
    val scalar = docs.select($"doc_id", Dedup.simhash($"text").as("sig"))
      .as[(Long, Long)].collect().toMap
    val fast = Dedup.simhashSignatures(docs).as[(Long, Long)].collect().toMap
    assert(fast == scalar)
  }

  test("maxDocFreq recomputes Jaccard over surviving shingles only") {
    // hot shingle "x x x" appears in all 4 docs (df=4 > 2) and is dropped;
    // docs 1/2 share ALL surviving shingles → J=1.0; docs 3/4 share none
    val d = Seq(
      (1L, "a b c x x x"), (2L, "a b c x x x"),
      (3L, "p q r x x x"), (4L, "u v w x x x")).toDF("doc_id", "text")
    val pairs = Dedup.ngramJaccardPairs(d, 3, 0.5, maxDocFreq = 2)
      .as[(Long, Long, Double)].collect()
    assert(pairs.map(p => (p._1, p._2)).toSet == Set((1L, 2L)))
    assert(pairs.head._3 == 1.0) // would be deflated if sizes counted dropped shingles
  }

  test("empty and whitespace-only text produce zero-valued stats, not NaN") {
    val d = Seq((1L, ""), (2L, "   "), (3L, "real text here")).toDF("doc_id", "text")
    val rows = TextAnalysis.analyze(d)
      .select($"doc_id", $"n_tokens", $"mean_token_len", $"stopword_ratio", $"alpha_ratio")
      .as[(Long, Int, Double, Double, Double)].collect().sortBy(_._1)
    assert(rows(0) == ((1L, 0, 0.0, 0.0, 0.0)))
    assert(rows(1)._2 == 0 && rows(1)._3 == 0.0 && rows(1)._4 == 0.0)
    assert(rows(2)._2 == 3)
  }

  test("dot product rejects mismatched vector lengths") {
    import graft.functions.VectorExpressions
    val d = Seq((Seq(1.0, 2.0), Seq(1.0, 2.0, 3.0))).toDF("a", "b")
    val e = intercept[Exception] {
      d.select(VectorExpressions.dot($"a", $"b")).collect()
    }
    assert(e.getMessage != null)
  }

  test("codegen'd dot product equals the HOF fold") {
    import graft.functions.VectorExpressions
    val two = emb.limit(1).select(Similarity.toDoubleVec($"embedding").as("v"))
      .crossJoin(emb.limit(50).select(Similarity.toDoubleVec($"embedding").as("w")))
    val hof = two.select(
      aggregate(zip_with($"v", $"w", (x, y) => x * y), lit(0.0), (a, x) => a + x))
      .as[Double].collect().toSeq
    val fast = two.select(VectorExpressions.dot($"v", $"w")).as[Double].collect().toSeq
    assert(fast == hof)
  }

  test("c-TF-IDF: hand-computed class signature scores and ranks") {
    // A: cat×2 dog×1, B: dog×2 → f(cat)=2, f(dog)=3, A-bar = 5/2
    val d = Seq((1L, "cat cat dog", "A"), (2L, "dog dog", "B"))
      .toDF("doc_id", "text", "lang")
    val got = TextAnalysis.classTfidf(d, k = 2)
      .as[(String, String, Double, Long)].collect()
      .map(t => (t._1, t._2) -> (t._3, t._4)).toMap
    def r4(x: Double) = math.floor(x * 10000 + 0.499999) / 10000
    assert(got(("A", "cat")) == ((r4(2 * math.log(1 + 2.5 / 2)), 1L)))
    assert(got(("A", "dog")) == ((r4(1 * math.log(1 + 2.5 / 3)), 2L)))
    assert(got(("B", "dog")) == ((r4(2 * math.log(1 + 2.5 / 3)), 1L)))
    assert(got.size == 3, s"got $got")
  }

  test("blocklist: overlapping, nested, and suffix-linked patterns all count") {
    val d = Seq(
      (1L, "aaaa"),                  // "aa" at 3 overlapping starts
      (2L, "xabcx"),                 // "abc" once; suffix "bc" once
      (3L, "ababab"),                // "abab" overlaps itself: starts 0, 2
      (4L, null.asInstanceOf[String]), // NULL → zero everywhere
      (5L, "bc bc")).toDF("doc_id", "text")
    val pats = Seq("aa", "abc", "bc", "abab")
    val got = TextAnalysis.blocklistHits(d, pats)
      .as[(Long, String, Long)].collect()
      .map(t => (t._1, t._2) -> t._3).toMap
    assert(got == Map(
      (1L, "aa") -> 3L, (2L, "abc") -> 1L, (2L, "bc") -> 1L,
      (3L, "abab") -> 2L, (5L, "bc") -> 2L), s"got $got")
    // survivors: only the NULL-text doc has zero hits
    val clean = TextAnalysis.blocklistSurvivors(d, pats)
      .as[Long].collect().toSet
    assert(clean == Set(4L), s"survivors: $clean")
  }

  test("quality score is bounded and favors stopword-bearing prose") {
    val q = docs.select(TextAnalysis.qualityScore($"text").as("q"))
    assert(q.filter($"q" < 0 || $"q" > 1).count() == 0)
  }

  test("deterministic sampling: stable under reruns, splits partition, quotas cap") {
    import graft.operators.Sampling
    val s1 = Sampling.sampleByHash(docs, "doc_id", 0.25).select($"doc_id").as[Long].collect().toSet
    val s2 = Sampling.sampleByHash(docs, "doc_id", 0.25).select($"doc_id").as[Long].collect().toSet
    assert(s1 == s2 && s1.nonEmpty && s1.size < 500) // reproducible, actually samples
    // growing the corpus never flips an existing row's fate
    val bigger = docs.unionByName(docs.withColumn("doc_id", $"doc_id" + 100000))
    val s3 = Sampling.sampleByHash(bigger, "doc_id", 0.25)
      .select($"doc_id").as[Long].collect().toSet
    assert(s3.filter(_ < 100000) == s1)
    val sp = Sampling.split(docs, "doc_id", Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .groupBy("split").count().as[(String, Long)].collect().toMap
    assert(sp.keySet == Set("train", "val", "test"))
    assert(sp.values.sum == 500 && sp("train") > sp("val"))
    val q = Sampling.quotaPerKey(docs, "source", "doc_id", 5)
      .groupBy("source").count().as[(String, Long)].collect()
    assert(q.forall(_._2 == 5)) // every source has 25 docs, capped at 5
    // negative ids must hash into [0, Buckets) too (pmod, not %)
    val neg = Seq(-1L, -999L, -1000003L).toDF("doc_id")
    val buckets = neg.select(Sampling.hashBucket($"doc_id", 42)).as[Long].collect()
    assert(buckets.forall(b => b >= 0 && b < Sampling.Buckets))
  }

  test("decontamination drops exactly the docs sharing an n-gram with the benchmark") {
    val bench = Seq((100L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "alpha beta gamma something else entirely"), // shares "alpha beta gamma"
      (2L, "no overlap with the held out set at all"),
      (3L, "delta gamma beta alpha"), // same words, REVERSED order → no shared trigram
      (4L, "x y beta gamma delta z")  // shares "beta gamma delta"
    ).toDF("doc_id", "text")
    val bad = Dedup.contaminatedIds(corpus, bench, 3).as[Long].collect().toSet
    assert(bad == Set(1L, 4L))
    val kept = Dedup.decontaminate(corpus, bench, 3).select($"doc_id").as[Long].collect().toSet
    assert(kept == Set(2L, 3L))
    // self-decontamination removes everything (every doc shares with itself)
    assert(Dedup.decontaminate(corpus, corpus, 3).count() == 0)
  }

  test("contamination scores are exact distinct-shingle overlap fractions") {
    val bench = Seq((100L, "a b c d")).toDF("doc_id", "text") // {a b c, b c d}
    val corpus = Seq(
      (1L, "a b c x"),      // {a b c, b c x}        → 1/2 shared
      (2L, "a b c d e"),    // {a b c, b c d, c d e} → 2/3
      (3L, "nothing in common here"), // 0/2
      (4L, "z z"),          // < n tokens → ONE short shingle (engine-wide
                            // WordNGrams convention), unshared
      (5L, "a b c a b c")   // {a b c, b c a, c a b} distinct → 1/3 (repeat counts once)
    ).toDF("doc_id", "text")
    val got = Dedup.contaminationScores(corpus, bench, 3)
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(got == Seq(
      (1L, 2L, 1L, 0.5),
      (2L, 3L, 2L, 2.0 / 3.0),
      (3L, 2L, 0L, 0.0),
      (4L, 1L, 0L, 0.0),
      (5L, 3L, 1L, 1.0 / 3.0)))
    // the any-hit rule is the overlap > 0 special case
    val anyHit = Dedup.contaminatedIds(corpus, bench, 3).as[Long].collect().toSet
    assert(anyHit == got.filter(_._4 > 0).map(_._1).toSet)
  }

  test("sequence packing: contiguous budget positions, stable shard assignment") {
    import graft.operators.Sampling
    val packed = Sampling.packSequences(docs, "doc_id",
        TextAnalysis.tokenCount($"text"), budget = 512L, numShards = 4)
      .select($"shard", $"doc_id", TextAnalysis.tokenCount($"text").cast("long").as("n"),
        $"seq_id", $"tok_offset")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(packed.length == docs.count())
    packed.groupBy(_._1).foreach { case (_, rows) =>
      val ordered = rows.sortBy(_._2)
      // exclusive prefix sum: each doc starts where the previous one ended
      var prefix = 0L
      ordered.foreach { case (_, _, n, seqId, off) =>
        assert(seqId == prefix / 512 && off == prefix % 512)
        prefix += n
      }
    }
    // every shard in range; assignment deterministic across reruns
    assert(packed.forall { case (s, _, _, _, _) => s >= 0 && s < 4 })
    val again = Sampling.packSequences(docs, "doc_id",
        TextAnalysis.tokenCount($"text"), 512L, 4)
      .select($"doc_id", $"shard", $"seq_id", $"tok_offset")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(again == packed.map { case (s, id, _, q, o) => (id, s, q, o) }.toSet)
    // refuses to clobber an existing output-named column
    intercept[IllegalArgumentException] {
      Sampling.packSequences(docs.withColumn("shard", lit(1)), "doc_id",
        TextAnalysis.tokenCount($"text"), 512L, 4)
    }
  }

  test("quality quantile filter keeps the top of the sample-learned distribution") {
    import graft.operators.Sampling
    val kept = TextAnalysis.qualityQuantileFilter(docs, q = 0.25, sampleRate = 0.5)
      .select($"doc_id").as[Long].collect().toSet
    // the cutoff is the exact sample percentile: replay it on the driver
    val scores = docs
      .select($"doc_id", TextAnalysis.qualityScore($"text").as("qu"))
      .as[(Long, Double)].collect().toMap
    val sampleIds = Sampling.sampleByHash(docs, "doc_id", 0.5)
      .select($"doc_id").as[Long].collect()
    val sorted = sampleIds.map(scores).sorted
    val rank = 0.25 * (sorted.length - 1)
    val (lo, hi) = (sorted(rank.toInt), sorted(math.ceil(rank).toInt))
    // Spark Percentile's exact expression — NOT lo + d·(hi−lo), which can
    // differ by an ulp when lo == hi (ties are common in quality scores)
    val cut =
      if (math.ceil(rank) == math.floor(rank)) lo
      else (math.ceil(rank) - rank) * lo + (rank - math.floor(rank)) * hi
    assert(kept == scores.filter(_._2 >= cut).keySet)
    assert(kept.nonEmpty && kept.size < scores.size) // a real split
    intercept[IllegalArgumentException] {
      TextAnalysis.qualityQuantileFilter(docs, q = 1.0)
    }
  }

  test("shuffle order: dense per-shard positions, one fixed permutation per seed") {
    import graft.operators.Sampling
    val out = Sampling.shuffleOrder(docs.select($"doc_id"), "doc_id", numShards = 4)
      .as[(Long, Long, Long)].collect()
    assert(out.length == docs.count())
    assert(out.forall { case (_, s, _) => s >= 0 && s < 4 })
    // positions are dense 0..n-1 within each shard
    out.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (0L until rows.length).toSeq)
    }
    // deterministic under a different input partitioning
    val again = Sampling
      .shuffleOrder(docs.select($"doc_id").repartition(13), "doc_id", 4)
      .as[(Long, Long, Long)].collect().toSet
    assert(again == out.toSet)
    // a different seed produces a genuinely different permutation
    val other = Sampling.shuffleOrder(docs.select($"doc_id"), "doc_id", 4, seed = 7)
      .as[(Long, Long, Long)].collect().toSet
    assert(other != out.toSet)
    // the order hash must be independent of the shard hash: with the SAME
    // hash each shard would read out in residue-class (≈ id) order
    val inIdOrder = out.groupBy(_._2).forall { case (_, rows) =>
      rows.sortBy(_._3).map(_._1).toSeq == rows.map(_._1).sorted.toSeq
    }
    assert(!inIdOrder)
    // refuses to clobber an existing output-named column
    intercept[IllegalArgumentException] {
      Sampling.shuffleOrder(
        docs.select($"doc_id").withColumn("pos", lit(1)), "doc_id", 4)
    }
  }

  test("priority survivors keep the most-trusted copy per duplicate group") {
    val d = Seq(
      (1L, "alpha beta", "crawl"),
      (2L, "  Alpha   BETA ", "wiki"), // same fingerprint, curated → wins
      (3L, "alpha beta", "books"),
      (10L, "gamma", "crawl"), // no listed source in the group → lowest id
      (11L, "gamma", "crawl2"),
      (20L, "unique", "crawl")).toDF("doc_id", "text", "source")
    val got = Dedup.prioritySurvivors(d, Seq("wiki", "books"))
      .select($"doc_id").as[Long].collect().toSet
    assert(got == Set(2L, 10L, 20L))
    // listed beats unlisted regardless of id; unlisted ties break to min id
    val got2 = Dedup.prioritySurvivors(d, Seq("books"))
      .select($"doc_id").as[Long].collect().toSet
    assert(got2 == Set(3L, 10L, 20L))
    intercept[IllegalArgumentException] {
      Dedup.prioritySurvivors(d, Seq.empty)
    }
    intercept[IllegalArgumentException] {
      Dedup.prioritySurvivors(d, Seq("wiki", "wiki"))
    }
  }

  test("random projection: k dims per vector, exact dots vs driver-side planes") {
    val out = Similarity.randomProjection(emb, k = 4, dim = 64)
      .as[(Long, Long, Double)].collect()
    assert(out.length == emb.count() * 4)
    // replay one vector's projections on the driver: same planes, same
    // left-to-right multiply-add order → identical doubles
    val v = emb.filter($"vec_id" === 0).select($"embedding")
      .as[Seq[Float]].head()
    val planes = Similarity.hyperplanes(4, 64, 42L)
    val expected = planes.map(_.zip(v).map { case (a, b) => a * b.toDouble }
      .foldLeft(0.0)(_ + _))
    val got0 = out.filter(_._1 == 0L).sortBy(_._2).map(_._3).toSeq
    expected.zip(got0).foreach { case (e, g) =>
      assert(math.abs(e - g) < 1e-12, s"expected $e got $g")
    }
    intercept[IllegalArgumentException] {
      Similarity.randomProjection(emb, k = 0)
    }
  }

  test("k-means refinement equals the exact fixed-point reference, bit-for-bit") {
    val got = Similarity.kmeansCentroids(emb, nLists = 4, rounds = 2)
    val raw = emb.select($"vec_id", $"embedding").as[(Long, Seq[Float])]
      .collect().toSeq
    // TestRefs replays the whole pipeline driver-side with the same op
    // order everywhere (left-fold dots/norms, BigInt fixed-point sums)
    assert(got == TestRefs.kmeansCentroids(raw, nLists = 4, rounds = 2))
    // assignment against the refined centroids is total and in-range
    val asg = Similarity.kmeansAssign(emb, got)
      .as[(Long, Long, Double)].collect()
    assert(asg.length == raw.length)
    assert(asg.forall { case (_, c, _) => c >= 0 && c < got.length })
    intercept[IllegalArgumentException] {
      Similarity.kmeansCentroids(emb, nLists = 0, rounds = 1)
    }
  }

  test("priority survivors work with string ids; projection derives dim past null rows") {
    // string/UUID ids must survive the (rank, id) struct MIN — a numeric
    // cast would null them out and silently return an empty result
    val d = Seq(
      ("u-b", "alpha beta", "wiki"),
      ("u-a", "alpha beta", "crawl"),
      ("u-c", "other", "crawl")).toDF("doc_id", "text", "source")
    val got = Dedup.prioritySurvivors(d, Seq("wiki"))
      .select($"doc_id").as[String].collect().toSet
    assert(got == Set("u-b", "u-c"))
    // dim derivation must skip a leading null embedding instead of NPE-ing
    val withNull = Seq(
      (0L, null.asInstanceOf[Seq[Float]]),
      (1L, Seq(1.0f, 2.0f, 3.0f))).toDF("vec_id", "embedding")
    val proj = Similarity.randomProjection(withNull, k = 2)
      .as[(Long, Long, Double)].collect()
    assert(proj.map(_._1).toSet == Set(1L)) // null vector contributes no rows
    assert(proj.length == 2)
    // z-score flag columns refuse to clobber an existing column
    intercept[IllegalArgumentException] {
      graft.operators.Anomaly.zscoreFlags(
        Seq(("t0", 1.0)).toDF("tenant_id", "zscore"), Seq("tenant_id"),
        "zscore", 2.0)
    }
  }

  test("z-score flags: hand-computed scores; constant and singleton groups score 0") {
    import graft.operators.Anomaly
    val series = Seq(
      ("t0", 0L, 1.0), ("t0", 1L, 2.0), ("t0", 2L, 3.0), ("t0", 3L, 10.0),
      ("t1", 0L, 5.0), ("t1", 1L, 5.0), // constant → sd = 0 → z = 0
      ("t2", 0L, 7.0) // singleton → sd undefined → z = 0
    ).toDF("tenant_id", "window_start", "value")
    val got = Anomaly.zscoreFlags(series, Seq("tenant_id"), "value", threshold = 1.4)
      .select($"tenant_id", $"window_start", $"zscore", $"is_anomaly")
      .as[(String, Long, Double, Boolean)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    // t0: mean 4, sample sd = sqrt((9+4+1+36)/3); z(10) ≈ 1.47 > 1.4
    val sd = math.sqrt(50.0 / 3)
    assert(math.abs(got(("t0", 3L))._1 - 6.0 / sd) < 1e-12)
    assert(got(("t0", 3L))._2)
    assert(!got(("t0", 2L))._2) // |z| ≈ 0.24
    assert(got(("t1", 0L)) == ((0.0, false)))
    assert(got(("t2", 0L)) == ((0.0, false)))
    intercept[IllegalArgumentException] {
      Anomaly.zscoreFlags(series, Seq.empty, "value", 2.0)
    }
  }

  test("MAD flags: the outlier can't mask itself; ties/constants score 0") {
    import graft.operators.Anomaly
    val series = Seq(
      // t0: 8 quiet points + one huge spike. Sample stddev over the 9 values
      // is so inflated by the spike that its plain z is only ≈ 2.66 (under a
      // 3.5 bar), while median/MAD give (100−1)/(1.4826·1) ≈ 66.8 — the
      // masking failure madFlags exists to fix
      ("t0", 0L, 1.0), ("t0", 1L, 2.0), ("t0", 2L, 1.0), ("t0", 3L, 2.0),
      ("t0", 4L, 1.0), ("t0", 5L, 2.0), ("t0", 6L, 1.0), ("t0", 7L, 2.0),
      ("t0", 8L, 100.0),
      ("t1", 0L, 5.0), ("t1", 1L, 5.0), // constant → MAD = 0 → score 0
      ("t2", 0L, 7.0) // singleton → MAD = 0 → score 0
    ).toDF("tenant_id", "window_start", "value")
    val z = Anomaly.zscoreFlags(series, Seq("tenant_id"), "value", 3.5)
      .filter($"tenant_id" === "t0" && $"window_start" === 8L)
      .select($"is_anomaly").as[Boolean].head()
    assert(!z, "plain z-score should MISS the spike (masked baseline)")
    val got = Anomaly.madFlags(series, Seq("tenant_id"), "value", 3.5)
      .select($"tenant_id", $"window_start", $"mad_z", $"is_anomaly")
      .as[(String, Long, Double, Boolean)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    // t0: median 2.0 ((1+2+..+100) sorted mid of 9 values = 2), deviations
    // {1,0,1,0,1,0,1,0,98} → MAD = 1; spike scores 98/1.4826
    assert(math.abs(got(("t0", 8L))._1 - 98.0 / 1.4826) < 1e-9)
    assert(got(("t0", 8L))._2)
    assert(!got(("t0", 0L))._2)
    assert(got(("t1", 0L)) == ((0.0, false)))
    assert(got(("t2", 0L)) == ((0.0, false)))
  }

  test("PMI: hand-computed collocation scores over a tiny corpus") {
    import graft.operators.TextAnalysis
    // corpus: "a b a b" ×2 and "a c" — positional bigrams:
    //   doc1/doc2 each: (a b), (b a), (a b) → a b ×4, b a ×2; doc3: a c ×1
    val docs = Seq((1L, "a b a b"), (2L, "a b a b"), (3L, "a c"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.pmiCollocations(docs, minCount = 2)
      .as[(String, String, Long, Double)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    // totals: words = 10 (a×5, b×4, c×1), pairs = 7
    assert(got.keySet == Set(("a", "b"), ("b", "a"))) // a c is below minCount
    assert(got(("a", "b"))._1 == 4L && got(("b", "a"))._1 == 2L)
    val pmiAB = math.log((4.0 * 10 * 10) / (7.0 * 5 * 4))
    val pmiBA = math.log((2.0 * 10 * 10) / (7.0 * 4 * 5))
    assert(math.abs(got(("a", "b"))._2 - pmiAB) < 1e-12)
    assert(math.abs(got(("b", "a"))._2 - pmiBA) < 1e-12)
  }

  test("code stats: hand-computed signals on a known snippet") {
    import graft.operators.TextAnalysis
    val d = Seq(
      (1L, "def f(x):\n    return x1\n\n\tpass"),
      (2L, ""), // empty doc: one empty line, all fractions defined
      (3L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val got = TextAnalysis.codeStats(d)
      .as[(Long, Long, Long, Double, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
    // doc 1: lines = ["def f(x):", "    return x1", "", "\tpass"],
    // lens 9/13/0/5 → n=4, max=13, avg=27/4; alnum over the FULL text incl
    // the 3 newlines: deffx(5)+returnx1(8)+pass(4) = 17 of 30; indented 2/4
    assert(got(1L) == ((4L, 13L, 27.0 / 4, 17.0 / 30, 0.5)))
    assert(got(2L) == ((1L, 0L, 0.0, 0.0, 0.0)))
    assert(got(3L) == ((1L, 0L, 0.0, 0.0, 0.0))) // NULL coalesces to ""
  }

  test("PSI drift: identical snapshots score 0; a shift scores positive") {
    import graft.operators.Profiling
    val a = (1L to 100L).map(i => i % 4).toDF("b")
    val same = Profiling.psiDrift(a, a, $"b")
      .select($"psi_contrib").as[Double].collect()
    assert(same.forall(_ == 0.0), s"identical snapshots must be 0: ${same.toSeq}")
    // shifted: bucket 0 doubles at the expense of bucket 3
    val shifted = (1L to 100L).map(i => if (i % 4 == 3) 0L else i % 4).toDF("b")
    val psi = Profiling.psiDrift(a, shifted, $"b")
      .select($"psi_contrib").as[Double].collect().sum
    assert(psi > 0.1, s"a 25%-mass move must alarm: $psi")
    // bucket 3 is EMPTY on the shifted side — Laplace smoothing keeps the
    // contribution finite and the row present
    val b3 = Profiling.psiDrift(a, shifted, $"b")
      .filter($"bucket" === 3L).as[(Long, Long, Long, Double)].collect()
    assert(b3.length == 1 && b3.head._3 == 0L && !b3.head._4.isNaN &&
      !b3.head._4.isInfinite, s"empty-bucket row malformed: ${b3.toSeq}")
  }

  test("bm25Multi with one query reproduces single-query bm25 scores", SlowTest) {
    import graft.operators.TextAnalysis
    val terms = Seq("hash", "join", "shuffle", "broadcast")
    val q = terms.map(t => (0L, t)).toDF("query_id", "term")
    try {
      val multi = TextAnalysis.bm25Multi(docs, q, topK = 1000000)
        .select($"doc_id", $"n_hits", $"score")
        .as[(Long, Long, Double)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      val single = TextAnalysis.bm25(docs, terms)
        .select($"doc_id", $"n_hits", round($"score", 4).as("score"))
        .as[(Long, Long, Double)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      assert(multi == single,
        s"multi(${multi.size}) != single(${single.size})")
      assert(multi.nonEmpty)
    } finally spark.catalog.clearCache()
  }

  test("decayed count: naive-model equality, half-life boundary, tail clamp") {
    import graft.operators.Profiling
    val ref = 1000000L; val hl = 100L
    val ts = Seq(
      ("a", ref),           // b=0 → 2^30
      ("a", ref - 99L),     // b=0
      ("a", ref - 100L),    // exact boundary → b=1 → 2^29
      ("a", ref - 150L),    // b=1
      ("a", ref - 100L * 31), // b=31 → beyond shift → 0
      ("b", ref + 50L)      // future (b<0) → 0
    ).toDF("g", "ts_us")
    val got = Profiling.decayedCount(ts, Seq("g"), "ts_us", ref, hl)
      .as[(String, Long, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val expA = (1L << 30) * 2 + (1L << 29) * 2
    assert(got("a") == ((expA, expA.toDouble / (1L << 30))))
    assert(got("b") == ((0L, 0.0)))
  }

  test("quantile normalization: exact (rank−1)/(n−1) within source, ties equal") {
    import graft.operators.TextAnalysis
    // src a: 3 docs with strictly increasing quality (longer → more stop/alpha
    // structure is irrelevant — equal texts tie exactly)
    val d = Seq(
      (1L, "a", "zz qq xx vv ww"),                   // low quality (no stopwords)
      (2L, "a", "the cat and the dog are good"),     // high
      (3L, "a", "zz qq xx vv ww"),                   // TIE with doc 1
      (4L, "b", "anything at all here now")          // singleton group
    ).toDF("doc_id", "source", "text")
    val got = TextAnalysis.qualityQuantileNormalize(d, "source")
      .as[(Long, String, Double)].collect().map(r => r._1 -> r._3).toMap
    assert(got(1L) == 0.0 && got(3L) == 0.0, "tied scores share percent_rank 0")
    assert(got(2L) == 1.0, "top doc normalizes to 1.0")
    assert(got(4L) == 0.0, "singleton group is 0 by convention")
  }

  test("PCA: dominant axis found, components orthonormal, partitioning-proof") {
    import graft.operators.Similarity
    // synthetic: variance 100× larger along a known diagonal direction
    // (1,1,0,…)/√2 than anywhere else → comp1 must align with it
    val rnd = new scala.util.Random(7)
    val d = 8
    val rows = (0 until 200).map { i =>
      val t = rnd.nextGaussian() * 10.0
      val noise = Array.fill(d)(rnd.nextGaussian() * 0.1)
      val v = Array.tabulate(d)(j => noise(j).toFloat +
        (if (j < 2) (t / math.sqrt(2.0)).toFloat else 0.0f))
      (i.toLong, v.toSeq)
    }
    val df = rows.toDF("vec_id", "embedding")
    val (mu, comps) = Similarity.pcaFit(df, "embedding", k = 2, iters = 30)
    assert(mu.length == d && comps.length == 2)
    val axis = Array.tabulate(d)(j => if (j < 2) 1.0 / math.sqrt(2.0) else 0.0)
    val cos1 = comps(0).zip(axis).map { case (a, b) => a * b }.sum
    assert(math.abs(cos1) > 0.99, s"comp1 misaligned: cos=$cos1")
    comps.foreach { v =>
      val nrm = math.sqrt(v.map(x => x * x).sum)
      assert(math.abs(nrm - 1.0) < 1e-9, s"component not unit: $nrm")
    }
    val ortho = comps(0).zip(comps(1)).map { case (a, b) => a * b }.sum
    assert(math.abs(ortho) < 1e-3, s"components not orthogonal: $ortho")
    // fixed-point sums make the fit BIT-identical under any partitioning
    val (mu1, c1) = Similarity.pcaFit(df.repartition(1), "embedding", 2, 30)
    val (mu7, c7) = Similarity.pcaFit(df.repartition(7), "embedding", 2, 30)
    assert(mu1.toSeq == mu7.toSeq && mu1.toSeq == mu.toSeq)
    assert(c1.map(_.toSeq).toSeq == c7.map(_.toSeq).toSeq)
    // projection of the mean-centered dominant direction is monotone in t
    val proj = Similarity.pcaProject(df, "vec_id", "embedding", mu, comps)
      .select($"vec_id", $"p1").as[(Long, Double)].collect().toMap
    assert(proj.size == 200)
  }

  test("materialized sequences carry every document once, in offset order") {
    import graft.operators.Sampling
    val packed = Sampling.packSequences(docs, "doc_id",
      TextAnalysis.tokenCount($"text"), budget = 512L, numShards = 4)
    val seqs = Sampling.materializeSequences(packed)
      .as[(Long, Long, Long, String)].collect()
    assert(seqs.map(_._3).sum == docs.count()) // every doc in exactly one row
    // each sequence is its documents' texts in (tok_offset, doc_id) order
    val byKey = packed.select($"shard", $"seq_id", $"tok_offset", $"doc_id", $"text")
      .as[(Long, Long, Long, Long, String)].collect()
      .groupBy(r => (r._1, r._2))
    seqs.foreach { case (shard, seqId, nDocs, text) =>
      val members = byKey((shard, seqId)).sortBy(r => (r._3, r._4))
      assert(members.length == nDocs)
      assert(text == members.map(_._5).mkString("\n"))
    }
  }

  test("packSequences drops zero-token docs by default; over-budget docs pack-and-split whole") {
    import graft.operators.Sampling
    // one shard keeps the prefix arithmetic readable; budget 4 is crossed by
    // doc 4 (10 tokens) — the max(budget, largest-doc) group-bound case
    val df = Seq(
      (1L, "a b c"),
      (2L, ""),
      (3L, " \t "),
      (4L, "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10"),
      (5L, "x y")).toDF("doc_id", "text")
    val packed = Sampling.packSequences(df, "doc_id",
        TextAnalysis.tokenCount($"text"), budget = 4L, numShards = 1)
      .select($"doc_id", $"seq_id", $"tok_offset")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    // empties dropped; doc 4 starts at offset 3 of seq 0 and is kept WHOLE
    // there (pack-and-split), so doc 5's prefix lands in seq 3
    assert(packed.toSeq == Seq((1L, 0L, 0L), (4L, 0L, 3L), (5L, 3L, 1L)))
    // dropEmpty = false keeps zero-token docs: they share the next doc's
    // (seq_id, tok_offset) slot — the caller owns the group bound again
    val kept = Sampling.packSequences(df, "doc_id",
        TextAnalysis.tokenCount($"text"), 4L, 1, dropEmpty = false)
      .select($"doc_id", $"seq_id", $"tok_offset")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(kept.toSeq == Seq((1L, 0L, 0L), (2L, 0L, 3L), (3L, 0L, 3L),
      (4L, 0L, 3L), (5L, 3L, 1L)))
    // materialization conserves every surviving token and keeps the
    // over-budget doc in its starting sequence
    val seqs = Sampling.materializeSequences(Sampling.packSequences(df, "doc_id",
        TextAnalysis.tokenCount($"text"), 4L, 1), sep = " ")
      .as[(Long, Long, Long, String)].collect().sortBy(_._2)
    assert(seqs.map(_._3).sum == 3)
    assert(seqs.flatMap(_._4.split(" ")).length == 15)
    assert(seqs.head._4 == "a b c t1 t2 t3 t4 t5 t6 t7 t8 t9 t10")
  }

  test("events NTZ timestamps read as the same UTC instants under any session tz") {
    // the testdata events.parquet carries TIMESTAMP_NTZ wall clocks that ARE
    // UTC instants; EventsAdapter must yield identical epochs whether the
    // session tz is UTC (the pinned default) or not — the implicit NTZ cast
    // alone would shift every instant by the session offset
    val tz = spark.conf.get("spark.sql.session.timeZone")
    def epochs(): Seq[Double] = graft.sources.EventsAdapter
      .envelopes(spark, "/root/testdata/sf0.001")
      .select($"metric.timestamp").as[Double].collect().sorted.toSeq
    val utc = epochs()
    spark.conf.set("spark.sql.session.timeZone", "America/Los_Angeles")
    try assert(epochs() == utc, "session tz shifted the event instants")
    finally spark.conf.set("spark.sql.session.timeZone", tz)
  }

  test("upsample: floor(rate) copies + hash-gated extra; rate<1 degenerates to Bernoulli keep") {
    import graft.operators.Sampling
    val out = Sampling.upsample(docs, "source",
        Map("src0" -> 2.5, "src1" -> 0.5), "doc_id")
      .select($"doc_id", $"source", $"copy").as[(Long, String, Long)].collect()
    val byDoc = out.groupBy(_._1)
    val src = docs.select($"doc_id", $"source").as[(Long, String)].collect().toMap
    val hash = docs.select($"doc_id", Sampling.hashBucket($"doc_id", 42))
      .as[(Long, Long)].collect().toMap
    val halfCut = (0.5 * Sampling.Buckets).toLong
    src.foreach { case (id, s) =>
      val (base, cut) = s match {
        case "src0" => (2L, halfCut)
        case "src1" => (0L, halfCut)
        case _      => (1L, 0L)
      }
      val expect = base + (if (hash(id) < cut) 1L else 0L)
      val copies = byDoc.get(id).map(_.map(_._3).sorted.toSeq).getOrElse(Seq.empty)
      assert(copies == (0L until expect), s"doc $id (source $s): got $copies, want 0..${expect - 1}")
    }
    // rerun-stable: the same call reproduces the identical multiset
    val again = Sampling.upsample(docs, "source",
        Map("src0" -> 2.5, "src1" -> 0.5), "doc_id")
      .select($"doc_id", $"source", $"copy").as[(Long, String, Long)].collect()
    assert(again.sorted.toSeq == out.sorted.toSeq)
  }

  test("token-id export: conserves tokens, maps via vocab rank, OOV id for the rest") {
    import graft.operators.Sampling
    val df = Seq(
      (1L, "a b c a"),
      (2L, "\ta zz\n"),   // edge whitespace: set-trim, no phantom tokens
      (3L, " \t "),       // whitespace-only: dropped by packSequences
      (4L, "b b a")).toDF("doc_id", "text")
    // corpus counts: a×4, b×3, c×1, zz×1 → vocab(2) = {a→0, b→1}
    val vocab = TextAnalysis.learnVocab(df, 2)
    assert(vocab == Map("a" -> 0L, "b" -> 1L))
    val out = Sampling.materializeTokenIds(
        Sampling.packSequences(df, "doc_id",
          TextAnalysis.tokenCount($"text"), budget = 4L, numShards = 1),
        vocab, oovId = 99L)
      .as[(Long, Long, Long, Seq[Long])].collect().sortBy(_._2)
    // every surviving token present exactly once, in (tok_offset, id) order
    assert(out.flatMap(_._4).length == 9) // 4 + 2 + 3 tokens, doc 3 dropped
    val all = out.flatMap(_._4).toSeq
    assert(all.count(_ == 0L) == 4 && all.count(_ == 1L) == 3 &&
      all.count(_ == 99L) == 2) // c and zz are OOV
    // doc order within the single shard is by id: 1 then 2 then 4
    assert(out.head._4.startsWith(Seq(0L, 1L)), s"got ${out.head._4}")
    // vocab rank ties: count DESC then token ASC — deterministic cut
    assert(TextAnalysis.learnVocab(df, 3)("c") == 2L) // c before zz at cnt 1
  }

  test("connected components match a driver-side union-find; survivors keep cluster minima", SlowTest) {
    val pairs = Dedup.ngramJaccardPairs(docs, 3, 0.5)
    val edgeList = pairs.select($"id_a", $"id_b").as[(Long, Long)].collect()
    assert(edgeList.nonEmpty)
    // naive union-find reference
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edgeList.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expected = parent.keys.map(k => k -> find(k)).toMap
    val got = Dedup.connectedComponents(pairs).as[(Long, Long)].collect().toMap
    assert(got == expected)
    // survivors: all docs minus non-minimal cluster members
    val survivors = Dedup.nearDupSurvivors(docs, pairs).select($"doc_id").as[Long].collect().toSet
    val dropped = expected.collect { case (id, comp) if id != comp => id }.toSet
    assert(survivors == docs.select($"doc_id").as[Long].collect().toSet -- dropped)
  }

  test("connected components fail loudly when a cluster is deeper than maxIter", SlowTest) {
    // a path graph 0-1-2-...-8 has diameter 8: min-label propagation moves
    // the 0 label one hop per round, so maxIter=3 cannot converge — the
    // operator must throw, not return silently split clusters
    val path = (0L until 8L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val e = intercept[IllegalStateException] {
      Dedup.connectedComponents(path, maxIter = 3)
    }
    assert(e.getMessage.contains("not converged"))
    // the same graph converges once maxIter covers the diameter
    val ok = Dedup.connectedComponents(path, maxIter = 9)
      .as[(Long, Long)].collect().toMap
    assert(ok == (0L to 8L).map(_ -> 0L).toMap)
    // boundary: diameter EXACTLY maxIter must also converge — labels finish on
    // round maxIter and the extra probe round (the `<=` loop bound) observes
    // changed == 0; without that probe this exact case would falsely throw
    val boundary = Dedup.connectedComponents(path, maxIter = 8)
      .as[(Long, Long)].collect().toMap
    assert(boundary == (0L to 8L).map(_ -> 0L).toMap)
  }

  test("connected components use reliable checkpoints when a checkpoint dir is set", SlowTest) {
    // with spark.checkpoint.dir configured the per-round lineage truncation
    // must go through the fault-tolerant checkpoint path (blocks on the
    // checkpoint fs, recoverable after executor loss) instead of
    // localCheckpoint's executor-only storage
    val sc = spark.sparkContext
    assert(sc.getCheckpointDir.isEmpty) // suite invariant: default is local mode
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt").toFile
    sc.setCheckpointDir(dir.getAbsolutePath)
    try {
      val path = (0L until 8L).map(i => (i, i + 1)).toDF("id_a", "id_b")
      val got = Dedup.connectedComponents(path, maxIter = 9)
        .as[(Long, Long)].collect().toMap
      assert(got == (0L to 8L).map(_ -> 0L).toMap)
      // the reliable path really ran: RDD checkpoint data landed in the dir
      def rddFiles(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles.toSeq.flatMap(rddFiles)
        else Seq(f).filter(_.getName.startsWith("part-"))
      assert(rddFiles(dir).nonEmpty, "no checkpoint blocks written to the checkpoint dir")
    } finally {
      // restore the suite-wide localCheckpoint default. Relies on
      // SparkContext.setCheckpointDir wrapping the argument in
      // Option(directory) — None for null — which is unofficial but the only
      // way to CLEAR the dir on a live context; if a supported reset API
      // appears, use it here (later suites assume the localCheckpoint path)
      sc.setCheckpointDir(null)
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles.foreach(rm); f.delete()
      }
      rm(dir)
    }
  }

  test("sessionization merges touching sessions, splits strictly beyond the gap") {
    import graft.model.{Metric, MetricEnvelope}
    import graft.operators.Sessions
    def env(tsSec: Long, v: Double) = MetricEnvelope(
      Metric("m", Map("user_id" -> "u1"), tsSec * 1000.0, v, Map.empty),
      Map("tenantId" -> "t0"), 0L)
    // gap 600 s: events at 0, 300, 899 chain (diffs 300, 599); 1499 still
    // merges (diff exactly 600 = gap — touching sessions merge); 2100 splits
    // (diff 601 > gap); lone event at 10000
    val envs = Seq(env(0, 1), env(300, 2), env(899, 3), env(1499, 4),
      env(2100, 6), env(10000, 5)).toDF()
    val got = Sessions.sessionize(envs, 600L)
      .select($"session_start_us", $"session_end_us", $"n_events", $"sum_value")
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(got == Set(
      (0L, 1499000000L + 600000000L, 4L, 10.0),
      (2100000000L, 2100000000L + 600000000L, 1L, 6.0),
      (10000000000L, 10000000000L + 600000000L, 1L, 5.0)))
    // events with a missing key are excluded, not grouped under null
    val nokey = MetricEnvelope(Metric("m", Map.empty, 0.0, 1.0, Map.empty),
      Map("tenantId" -> "t0"), 0L)
    assert(Sessions.sessionize(Seq(nokey).toDF(), 600L).count() == 0)
  }

  test("PII redaction replaces emails, IPs and phone runs with typed tokens") {
    val d = Seq(
      (1L, "mail bob.smith+x@example.co.uk now"),
      (2L, "server at 10.0.255.1 rebooted"),
      (3L, "call +1 555-867-5309 today"),
      (4L, "clean text with digits 42 and 7")
    ).toDF("doc_id", "text")
    val red = d.select($"doc_id", TextAnalysis.redactPii($"text").as("r"))
      .as[(Long, String)].collect().toMap
    assert(red(1L) == "mail <EMAIL> now")
    assert(red(2L) == "server at <IP> rebooted")
    assert(red(3L) == "call <PHONE> today")
    assert(red(4L) == "clean text with digits 42 and 7")
    val counts = TextAnalysis.piiCounts(d)
      .select($"doc_id", $"n_emails", $"n_ips", $"n_phones")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(counts == Set((1L, 1L, 0L, 0L), (2L, 0L, 1L, 0L), (3L, 0L, 0L, 1L), (4L, 0L, 0L, 0L)))
    // counts reflect what redactPii ACTUALLY replaces: the digit run inside
    // an email local part is consumed by the email stage, never double-counted
    // as a phone
    val overlap = Seq((9L, "reach 5558675309111@example.com ok")).toDF("doc_id", "text")
    val o = TextAnalysis.piiCounts(overlap)
      .select($"n_emails", $"n_ips", $"n_phones").as[(Long, Long, Long)].head()
    assert(o == ((1L, 0L, 0L)))
  }

  test("gap fill: zero-fill and forward-fill densify sparse window series") {
    import graft.model.{Metric, MetricEnvelope}
    import graft.operators.GapFill
    import graft.plan.RuleCompiler
    import graft.model.AggregationSpec
    // events in windows 0 and 180 only (60 s windows) → gaps at 60 and 120
    def env(tsSec: Long, v: Double) = MetricEnvelope(
      Metric("m", Map.empty, tsSec * 1000.0, v, Map.empty),
      Map("tenantId" -> "t0"), 0L)
    val sp = AggregationSpec(name = "g", function = "sum", filteredMetricName = "m",
      groupedDimensions = Seq.empty, aggregatedMetricName = "out")
    val grouped = RuleCompiler.compileGrouped(sp, 60L)(
      Seq(env(10, 5.0), env(190, 7.0)).toDF())
    val zf = GapFill.zeroFill(grouped, 60L, Seq("tenant_id"))
      .select($"window_start", $"value").as[(Long, Double)].collect().toMap
    assert(zf == Map(0L -> 5.0, 60L -> 0.0, 120L -> 0.0, 180L -> 7.0))
    val ff = GapFill.forwardFill(grouped, 60L, Seq("tenant_id"))
      .select($"window_start", $"value").as[(Long, Double)].collect().toMap
    assert(ff == Map(0L -> 5.0, 60L -> 5.0, 120L -> 5.0, 180L -> 7.0))
  }

  test("heavy hitters: per-window top-k by count with deterministic tie-break") {
    import graft.model.{Metric, MetricEnvelope}
    import graft.operators.HeavyHitters
    def env(tsSec: Long, u: String) = MetricEnvelope(
      Metric("m", Map("user_id" -> u), tsSec * 1000.0, 1.0, Map.empty),
      Map("tenantId" -> "t0"), 0L)
    // window [0, 60): a×3, b×2, c×1; window [60, 120): c×2, d×2 (tie → c first)
    val envs = (Seq.fill(3)(env(1, "a")) ++ Seq.fill(2)(env(2, "b")) ++ Seq(env(3, "c")) ++
      Seq.fill(2)(env(61, "c")) ++ Seq.fill(2)(env(62, "d"))).toDF()
    val got = HeavyHitters.byWindow(envs, 60L, "user_id", 2)
      .select($"window_start", $"value", $"n", $"rank")
      .as[(Long, String, Long, Long)].collect().toSet
    assert(got == Set(
      (0L, "a", 3L, 1L), (0L, "b", 2L, 2L),
      (60L, "c", 2L, 1L), (60L, "d", 2L, 2L)))
    // rows missing the dimension are excluded, not ranked under null
    val nodim = MetricEnvelope(Metric("m", Map.empty, 0.0, 1.0, Map.empty),
      Map("tenantId" -> "t0"), 0L)
    assert(HeavyHitters.byWindow(Seq(nodim).toDF(), 60L, "user_id", 2).count() == 0)
  }

  test("split leakage audit reports only cross-split near-dup pairs") {
    import graft.operators.{Dedup, Sampling}
    // identical docs → J = 1.0 pairs; whether each pair leaks depends only on
    // the hash split assignment, which we recompute independently here
    val d = (1L to 40L).map(i => (i, "alpha beta gamma delta epsilon zeta"))
      .toDF("doc_id", "text")
    val splits = Seq("train" -> 0.5, "test" -> 0.5)
    val leaks = Dedup.splitLeakage(d, splits, 3, 0.5)
      .as[(Long, Long, String, String, Double)].collect()
    val assign = Sampling.split(d, "doc_id", splits)
      .select($"doc_id", $"split").as[(Long, String)].collect().toMap
    val expected = (for {
      a <- 1L to 40L; b <- (a + 1) to 40L
      if assign(a) != assign(b)
    } yield (a, b)).toSet
    assert(leaks.map(l => (l._1, l._2)).toSet == expected)
    assert(leaks.forall(l => l._5 == 1.0 && l._3 != l._4))
    assert(expected.nonEmpty) // the hash split actually separates some pairs
  }

  test("window cardinality: exact counts distincts; HLL within its error bound") {
    import graft.model.{Metric, MetricEnvelope}
    import graft.operators.HeavyHitters
    def env(tsSec: Long, u: String) = MetricEnvelope(
      Metric("m", Map("user_id" -> u), tsSec * 1000.0, 1.0, Map.empty),
      Map("tenantId" -> "t0"), 0L)
    // window [0, 60): 200 distinct users, each seen twice
    val envs = (1 to 200).flatMap(i => Seq(env(1, s"u$i"), env(2, s"u$i"))).toDF()
    val exact = HeavyHitters.distinctByWindow(envs, 60L, "user_id")
      .select($"n_distinct").as[Long].head()
    assert(exact == 200L)
    val approx = HeavyHitters.approxDistinctByWindow(envs, 60L, "user_id", rsd = 0.05)
      .select($"n_distinct").as[Long].head()
    assert(math.abs(approx - 200L) <= 200 * 0.15, s"HLL estimate $approx too far from 200")
  }

  test("stratified sampling: per-key rates, unlisted keys get the default") {
    import graft.operators.Sampling
    val bySrc = Sampling.stratifiedSample(docs, "source",
        Map("src0" -> 1.0, "src1" -> 0.5), "doc_id")
      .groupBy("source").count().as[(String, Long)].collect().toMap
    val totals = docs.groupBy("source").count().as[(String, Long)].collect().toMap
    assert(bySrc("src0") == totals("src0"))         // rate 1.0 keeps everything
    assert(bySrc.get("src1").exists(n => n > 0 && n < totals("src1"))) // ~half
    assert(!bySrc.contains("src2"))                 // default rate 0 drops
    // stratified with a uniform rate == plain hash sampling (same hash, seed)
    val uniform = Sampling.stratifiedSample(docs, "source",
        totals.keys.map(_ -> 0.25).toMap, "doc_id")
      .select($"doc_id").as[Long].collect().toSet
    val plain = Sampling.sampleByHash(docs, "doc_id", 0.25)
      .select($"doc_id").as[Long].collect().toSet
    assert(uniform == plain)
  }

  test("temperature mixing rates follow n^alpha with the Bernoulli cap") {
    import graft.operators.Sampling
    val counts = Map("big" -> 9000L, "mid" -> 900L, "small" -> 100L)
    // alpha=1: natural distribution — every source keeps the same fraction
    val nat = Sampling.temperatureRates(counts, alpha = 1.0, targetTotal = 1000L)
    assert(nat.values.forall(r => math.abs(r - 0.1) < 1e-12))
    // alpha=0: equal target share per source; small sources cap at 1.0
    // (cannot up-sample by Bernoulli), big ones downsample hard
    val eq = Sampling.temperatureRates(counts, alpha = 0.0, targetTotal = 900L)
    assert(math.abs(eq("big") - 300.0 / 9000) < 1e-12)
    assert(math.abs(eq("mid") - 300.0 / 900) < 1e-12)
    assert(eq("small") == 1.0)
    // alpha in between strictly boosts the small source's relative share
    val t = Sampling.temperatureRates(counts, alpha = 0.3, targetTotal = 1000L)
    assert(t("small") / t("big") > 1.0)
    // rates feed stratifiedSample directly: expected kept ≈ sum(r_s · n_s)
    val totals = docs.groupBy("source").count().as[(String, Long)].collect().toMap
    val rates = Sampling.temperatureRates(totals, alpha = 0.5,
      targetTotal = totals.values.sum / 4)
    val kept = Sampling.stratifiedSample(docs, "source", rates, "doc_id").count()
    val expected = rates.map { case (s, r) => r * totals(s) }.sum
    assert(math.abs(kept - expected) / expected < 0.25) // hash-Bernoulli noise
  }

  test("topNgrams ranks by document frequency with deterministic tie-break") {
    val d = Seq(
      (1L, "a b c"),    // bigrams: "a b", "b c"
      (2L, "a b a b"),  // distinct per doc: "a b", "b a" — df counts docs, not occurrences
      (3L, "b c d"),    // "b c", "c d"
      (4L, "z z"),      // "z z" (df 1 — filtered by minDocFreq=2)
      (5L, "solo"),     // < n tokens: contributes NO shingle (not a truncated one)
      (6L, "")          // empty: contributes nothing
    ).toDF("doc_id", "text")
    val got = TextAnalysis.topNgrams(d, 2, 10)
      .select("ngram", "df", "rank").as[(String, Long, Long)].collect().toSeq
    assert(got == Seq(("a b", 2L, 1L), ("b c", 2L, 2L)))
  }

  test("C4 clean: line rules, doc rules, blank lines, NULL text") {
    val d = Seq(
      // 8 non-empty lines: JS line, Menu (1 word, no punct) and the 2-word
      // trailer drop; the 5 full sentences (incl. ! ? and closing-quote
      // terminals) survive → keep_doc
      (1L, "First solid sentence stands here.\nPlease enable JavaScript now.\n" +
        "Menu\nSecond solid sentence stands here.\nThird solid sentence stands here!\n" +
        "Fourth solid sentence right here?\nFifth \"quoted\" line ends \"well.\"\n" +
        "\n  \nshort one."),
      // every line passes the LINE rules (the brace line ends in '.'), but
      // the document carries '{' → keep_doc false with zero dropped lines
      (2L, "Brace here { is code.\nOne good sentence sits here.\n" +
        "Two good sentences sit here.\nThree good sentences sit here.\n" +
        "Four good sentences sit here.\nFive good sentences sit here."),
      // "Lorem Ipsum" kills the doc case-insensitively, lines all pass
      (3L, "We sprinkle Lorem Ipsum dolor text.\nOne good sentence sits here.\n" +
        "Two good sentences sit here.\nThree good sentences sit here.\n" +
        "Four good sentences sit here."),
      (4L, null.asInstanceOf[String]),
      // no terminal punctuation anywhere → everything drops, keep_doc false
      (5L, "no terminal punctuation line\nanother unpunctuated line")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.c4Clean(d, minWordsPerLine = 3, minKeptLines = 5)
      .as[(Long, String, Long, Long, Boolean)].collect().sortBy(_._1)
    assert(out(0)._2 == "First solid sentence stands here.\n" +
      "Second solid sentence stands here.\nThird solid sentence stands here!\n" +
      "Fourth solid sentence right here?\nFifth \"quoted\" line ends \"well.\"")
    assert(out(0)._3 == 5L && out(0)._4 == 3L && out(0)._5)
    assert(out(1)._3 == 6L && out(1)._4 == 0L && !out(1)._5)
    assert(out(2)._3 == 5L && out(2)._4 == 0L && !out(2)._5)
    assert(out(3) == ((4L, "", 0L, 0L, false)))
    assert(out(4) == ((5L, "", 0L, 2L, false)))
  }

  test("tf-idf top-k: rare tokens outrank common ones, ties break by token") {
    val d = Seq(
      (1L, "apple banana apple"),
      (2L, "banana cherry"),
      (3L, "banana banana banana")).toDF("doc_id", "text")
    // N=3; df: apple 1, banana 3, cherry 1
    // idf(apple)=idf(cherry)=ln(4/2)+1, idf(banana)=ln(4/4)+1=1
    val out = TextAnalysis.tfidfTopK(d, 2)
      .as[(Long, Long, String, Long, Long, Double)].collect().groupBy(_._1)
    val d1 = out(1L).sortBy(_._2)
    assert(d1.map(_._3).toSeq == Seq("apple", "banana")) // 2(ln2+1) > 1
    assert(math.abs(d1(0)._6 - 2 * (math.log(2) + 1)) < 1e-12)
    val d2 = out(2L).sortBy(_._2)
    assert(d2.map(_._3).toSeq == Seq("cherry", "banana")) // ln2+1 > 1
    val d3 = out(3L)
    assert(d3.length == 1 && d3(0)._3 == "banana")
    assert(d3(0)._4 == 3L && d3(0)._5 == 3L && math.abs(d3(0)._6 - 3.0) < 1e-12)
  }

  test("token entropy: uniform text maxes H at ln(types); repetition drops it") {
    import graft.operators.TextAnalysis
    val d = Seq(
      (1L, "a b c d"),      // 4 distinct → H = ln 4, ttr 1
      (2L, "a a a a"),      // 1 type → H = 0, ttr 0.25
      (3L, "a a b b"),      // uniform 2 → H = ln 2
      (4L, "")).toDF("doc_id", "text") // no tokens → no row
    val out = TextAnalysis.tokenEntropy(d)
      .as[(Long, Long, Long, Double, Double)].collect().sortBy(_._1)
    assert(out.map(_._1).toSeq == Seq(1L, 2L, 3L))
    assert(out(0)._2 == 4 && out(0)._3 == 4 && out(0)._4 == 1.0 &&
      math.abs(out(0)._5 - math.log(4)) < 1e-12)
    assert(out(1)._4 == 0.25 && math.abs(out(1)._5) < 1e-12)
    assert(math.abs(out(2)._5 - math.log(2)) < 1e-12)
  }

  test("funnel: steps must be ordered and within horizon; breaks propagate") {
    import graft.operators.Sessions
    val ev = Seq(
      // user 1: full ordered funnel
      (1L, "view", 100L), (1L, "click", 200L), (1L, "purchase", 300L),
      // user 2: click BEFORE the view — funnel breaks at step 2
      (2L, "click", 50L), (2L, "view", 100L), (2L, "purchase", 200L),
      // user 3: click beyond the horizon of the view
      (3L, "view", 100L), (3L, "click", 5000L),
      // user 4: no view at all — not in the output
      (4L, "click", 10L), (4L, "purchase", 20L),
      // user 5: same-timestamp view+click (>= admits it), then nothing
      (5L, "view", 100L), (5L, "click", 100L))
      .toDF("user_id", "event_type", "ts_us")
    val out = Sessions.funnel(ev, Seq("view", "click", "purchase"),
        horizonUs = 1000L)
      .as[(Long, Long, Option[Long], Option[Long], Long)]
      .collect().sortBy(_._1)
    assert(out.map(_._1).toSeq == Seq(1L, 2L, 3L, 5L))
    assert(out(0) == ((1L, 100L, Some(200L), Some(300L), 3L)))
    // user 2: the pre-view click doesn't count, no later click exists,
    // and the purchase can't count either (step 2 broke)
    assert(out(1) == ((2L, 100L, None, None, 1L)))
    assert(out(2) == ((3L, 100L, None, None, 1L)))
    assert(out(3) == ((5L, 100L, Some(100L), None, 2L)))
  }

  test("cross-table LSH join returns a subset of the exact cross pairs with " +
      "exact cosines, and never a within-side pair", SlowTest) {
    import graft.operators.Similarity
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val left = emb.filter($"vec_id" % 2 === 0)
    val right = emb.filter($"vec_id" % 2 === 1)
    val got = Similarity.lshJoin(left, right, threshold = 0.3,
        nPlanes = 4, tables = 8)
      .as[(Long, Long, Double)].collect()
    assert(got.forall { case (l, r, _) => l % 2 == 0 && r % 2 == 1 })
    assert(got.map(p => (p._1, p._2)).distinct.length == got.length)
    // exact verify: every returned cosine equals the brute-force cosine
    val exact = Similarity.bruteForceTopK(left, emb, k = 1000)
      .as[(Long, Long, Int, Double)].collect()
      .map(r => (r._1, r._2) -> r._4).toMap
    try got.foreach { case (l, r, c) =>
      assert(c >= 0.3 && math.abs(exact((l, r)) - c) < 1e-9)
    } finally spark.catalog.clearCache()
  }

  test("cell-balanced sample caps every cell and is rerun-deterministic") {
    import graft.operators.Sampling
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    try {
      val a = Sampling.cellBalancedSample(emb, nLists = 4, perCell = 7)
        .as[(Long, Long)].collect()
      assert(a.groupBy(_._2).values.forall(_.length <= 7))
      assert(a.map(_._2).toSet.subsetOf((0L until 4L).toSet))
      val b = Sampling.cellBalancedSample(emb, nLists = 4, perCell = 7)
        .as[(Long, Long)].collect()
      assert(a.toSet == b.toSet, "sample must be identical across reruns")
    } finally spark.catalog.clearCache()
  }

  test("contamination report: asymmetric containment finds a short bench item " +
      "inside a long document") {
    import graft.operators.Dedup
    // bench 100 = "q1 q2 q3 q4" → 2 distinct 3-shingles, fully embedded in
    // doc 1's much longer text (Jaccard there is 2/9 but containment is 1);
    // doc 2 shares 1 of bench 101's 2 shingles (containment 0.5); doc 3
    // shares nothing
    val corpus = Seq(
      (1L, "a b c d e f g q1 q2 q3 q4 h i j"),
      (2L, "x y z r1 r2 r3 w"),
      (3L, "m n o p")).toDF("doc_id", "text")
    val bench = Seq(
      (100L, "q1 q2 q3 q4"),
      (101L, "r1 r2 r3 r4")).toDF("doc_id", "text")
    val out = Dedup.contaminationReport(corpus, bench, 3, minContainment = 0.4)
      .as[(Long, Long, Long, Long, Double)].collect().sortBy(_._1)
    assert(out.toSeq == Seq((1L, 100L, 2L, 2L, 1.0), (2L, 101L, 1L, 2L, 0.5)))
    // threshold drops the partial pair
    val strict = Dedup.contaminationReport(corpus, bench, 3, minContainment = 0.9)
      .as[(Long, Long, Long, Long, Double)].collect()
    assert(strict.map(r => (r._1, r._2)).toSet == Set((1L, 100L)))
  }

  test("hard negatives: same-label neighbors are excluded even when nearest") {
    import graft.operators.Similarity
    // query 0 (label A): vec 1 is IDENTICAL (cos 1) but shares the label —
    // must be skipped; vec 2 (label B) is close, vec 3 (label B) far
    val df = Seq(
      (0L, Seq(1f, 0f), "A"), (1L, Seq(1f, 0f), "A"),
      (2L, Seq(0.9f, 0.1f), "B"), (3L, Seq(0f, 1f), "B"))
      .toDF("vec_id", "embedding", "label")
    val out = Similarity.hardNegatives(df.filter($"vec_id" === 0), df, 2)
      .as[(Long, Long, String, Int, Double)].collect().sortBy(_._4)
    assert(out.map(_._2).toSeq == Seq(2L, 3L))
    assert(out.forall(_._3 == "B"))
  }

  test("PQ: a sampled centroid encodes to itself; ADC is exact on codebook members") {
    import graft.operators.Similarity
    // 4 orthogonal-ish unit vectors, d=4, m=2 (dsub=2), ksub=4: every corpus
    // vector IS a codebook entry, so each subvector encodes to the sampled
    // vector's own slice and ADC(q, x) == <q, x> exactly
    val vecs = Seq(
      (0L, Seq(1f, 0f, 0f, 0f)), (1L, Seq(0f, 1f, 0f, 0f)),
      (2L, Seq(0f, 0f, 1f, 0f)), (3L, Seq(0f, 0f, 0f, 1f)))
    val df = vecs.toDF("vec_id", "embedding")
    val books = Similarity.pqCodebooks(df, m = 2, ksub = 4)
    assert(books.size == 2 && books.forall(_.size == 4) &&
      books.forall(_.forall(_.size == 2)))
    val enc = Similarity.pqEncode(df, books).as[(Long, Seq[Long])]
      .collect().toMap
    assert(enc.size == 4 && enc.values.forall(_.size == 2))
    // reconstruction from the codes must reproduce each vector exactly
    vecs.foreach { case (id, v) =>
      val rec = enc(id).zipWithIndex.flatMap { case (code, j) =>
        books(j)(code.toInt) }
      assert(rec == v.map(_.toDouble), s"vec $id reconstructed as $rec")
    }
    // ADC against query [1,0,0,0]: exact dots → neighbor ranking is exact
    // (self excluded; all other dots are 0, ties break by neighbor_id)
    val out = Similarity.pqTopK(df.filter($"vec_id" === 0), df, k = 3,
        m = 2, ksub = 4)
      .as[(Long, Long, Int, Double)].collect().sortBy(_._3)
    assert(out.map(_._2).toSeq == Seq(1L, 2L, 3L))
    assert(out.forall(r => math.abs(r._4) < 1e-12))
  }

  test("residual IVF-PQ with exhaustive probe + full-corpus codebook is EXACT: " +
      "adc == cosine, ranking == brute force", SlowTest) {
    import graft.operators.Similarity
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .filter($"vec_id" < 40)
    val q = emb.filter($"vec_id" < 5)
    try {
      // ksub = corpus size → every residual is its own codebook entry →
      // reconstruction exact → adc = ⟨q, cent⟩ + ⟨q, r⟩ = ⟨q, x⟩ exactly
      val res = Similarity.ivfPqTopKResidual(q, emb, k = 4, nLists = 8,
          nProbe = 8, m = 8, ksub = 40)
        .as[(Long, Long, Int, Double)].collect()
      val exact = Similarity.bruteForceTopK(q, emb, 4)
        .as[(Long, Long, Int, Double)].collect()
        .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
      assert(res.length == exact.size)
      res.foreach { case (qid, nid, rank, adc) =>
        val (erank, ecos) = exact((qid, nid))
        assert(rank == erank && math.abs(adc - ecos) < 1e-9,
          s"($qid,$nid): adc=$adc rank=$rank vs exact cos=$ecos rank=$erank")
      }
    } finally spark.catalog.clearCache()
  }

  test("IVF-PQ with exhaustive probe equals flat PQ (same codebooks, same ADC)", SlowTest) {
    import graft.operators.Similarity
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    try {
      val q = emb.filter($"vec_id" < 5)
      val flat = Similarity.pqTopK(q, emb, k = 4, m = 8, ksub = 16)
        .as[(Long, Long, Int, Double)].collect().toSet
      val ivf = Similarity.ivfPqTopK(q, emb, k = 4, nLists = 16, nProbe = 16,
          m = 8, ksub = 16)
        .as[(Long, Long, Int, Double)].collect().toSet
      assert(ivf == flat, "exhaustive-probe IVF-PQ must equal flat PQ")
    } finally spark.catalog.clearCache()
  }

  test("BM25: hand-computed Lucene-formula scores; NULL text counts toward N/avgdl") {
    val d = Seq(
      (1L, "Hash join hash"),   // lm tokens [hash, join, hash], dl=3
      (2L, "shuffle time"),     // dl=2
      (3L, "nothing here at all"), // dl=4, no query term → NO row
      (4L, null.asInstanceOf[String])) // dl=0, still in N and avgdl
      .toDF("doc_id", "text")
    // N=4, avgdl=(3+2+4+0)/4=2.25; df(hash)=df(shuffle)=1
    // idf = ln(1 + (4-1+0.5)/1.5) = ln(10/3)
    val idf = math.log(1 + 3.5 / 1.5)
    val out = TextAnalysis.bm25(d, Seq("hash", "Shuffle", "shuffle "))
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    assert(out.map(_._1).toSeq == Seq(1L, 2L))
    assert(out.forall(_._2 == 1L))
    // doc1: tf(hash)=2 → 2·2.2/(2 + 1.2·(0.25 + 0.75·3/2.25)) = 4.4/3.5
    assert(math.abs(out(0)._3 - idf * 4.4 / 3.5) < 1e-12)
    // doc2: tf(shuffle)=1 → 2.2/(1 + 1.2·(0.25 + 0.75·2/2.25)) = 2.2/2.1
    assert(math.abs(out(1)._3 - idf * 2.2 / 2.1) < 1e-12)
  }

  test("duplicated-span stats: interval union over overlapping cross-doc spans") {
    val d = Seq(
      // docs 1/2 share the 6-token run "v w x y z q" → two overlapping
      // 5-shingles each; union covers 6 tokens, not 10
      (1L, "v w x y z q a b"),
      (2L, "c v w x y z q"),
      // within-doc repetition only ("k k k k k" twice in ONE doc): df=1,
      // nothing is cross-doc duplicated
      (3L, "k k k k k k"),
      (4L, "m n o")).toDF("doc_id", "text")
    val out = TextAnalysis.dupSpanStats(d, 5)
      .as[(Long, Long, Long, Long, Double)].collect().sortBy(_._1)
    assert(out(0) == ((1L, 8L, 2L, 6L, 6.0 / 8)))
    assert(out(1) == ((2L, 7L, 2L, 6L, 6.0 / 7)))
    assert(out(2) == ((3L, 6L, 0L, 0L, 0.0)))
    assert(out(3) == ((4L, 3L, 0L, 0L, 0.0)))
  }

  test("span removal cuts duplicated spans, keeps gaps, merges disjoint intervals") {
    val d = Seq(
      // overlapping dup shingles [0,5) ∪ [1,6) merge to [0,6): only "a b" survives
      (1L, "v w x y z q a b"),
      (2L, "c v w x y z q"),
      // two DISJOINT shared spans with a 2-token gap: the gap must survive
      (3L, "s1a s1b s1c s1d s1e gap1 gap2 s2a s2b s2c s2d s2e"),
      (4L, "x1 s1a s1b s1c s1d s1e y1 y2 y3 s2a s2b s2c s2d s2e"),
      (5L, "m n o")).toDF("doc_id", "text")
    val out = TextAnalysis.removeDupSpans(d, 5)
      .as[(Long, String, Long, Long, Long)].collect().sortBy(_._1)
    assert(out(0) == ((1L, "a b", 8L, 2L, 6L)))
    assert(out(1) == ((2L, "c", 7L, 1L, 6L)))
    assert(out(2) == ((3L, "gap1 gap2", 12L, 2L, 10L)))
    assert(out(3) == ((4L, "x1 y1 y2 y3", 14L, 4L, 10L)))
    assert(out(4) == ((5L, "m n o", 3L, 3L, 0L)))
  }

  test("leakage-safe split assigns clusters atomically, unpaired docs as plain split", SlowTest) {
    import graft.operators.Sampling
    // 1↔2 and 2↔3 near-dup (transitive cluster {1,2,3} keyed on min id 1);
    // 10 and 11 unpaired
    val d = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "alpha beta gamma delta zeta"),
      (3L, "alpha beta gamma delta eta"),
      (10L, "completely different text one two"),
      (11L, "another unrelated document three four")).toDF("doc_id", "text")
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val pairs = Dedup.ngramJaccardPairs(d, 3, 0.5)
    val got = Dedup.leakageSafeSplit(d, pairs, splits)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    // the cluster's split is the MIN member's plain assignment, shared by all
    val plain = Sampling.split(d, "doc_id", splits)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(got(1L) == plain(1L) && got(2L) == plain(1L) && got(3L) == plain(1L))
    assert(got(10L) == plain(10L) && got(11L) == plain(11L))
    // and by construction no cross-split near-dup pair remains
    val leaks = pairs
      .join(Dedup.leakageSafeSplit(d, pairs, splits)
        .select(col("doc_id").as("id_a"), col("split").as("split_a")), Seq("id_a"))
      .join(Dedup.leakageSafeSplit(d, pairs, splits)
        .select(col("doc_id").as("id_b"), col("split").as("split_b")), Seq("id_b"))
      .filter(col("split_a") =!= col("split_b")).count()
    assert(leaks == 0L)
  }

  test("BPE-ish token count splits letter runs from symbol runs") {
    val d = Seq("don't stop", "a1b c", "", "   ").toDF("text")
    val counts = d.select(TextAnalysis.bpeishTokenCount($"text")).as[Int].collect().toSeq
    assert(counts == Seq(4, 4, 0, 0)) // don|'|t|stop ; a|1|b|c
  }

  test("rolling hashes match a naive per-window recomputation") {
    import graft.functions.HashExpressions
    val text = "the quick brown fox jumps over the lazy dog"
    val w = 8
    val got = Seq(text).toDF("text")
      .select(HashExpressions.rollingHashes($"text", w)).as[Seq[Long]].head()
    val bytes = text.getBytes("UTF-8")
    val naive = (0 to bytes.length - w).map { i =>
      bytes.slice(i, i + w).foldLeft(0L)((h, b) => h * 1000003L + (b & 0xffL))
    }
    assert(got == naive)
    // short text: single hash over all bytes
    val short = Seq("abc").toDF("text")
      .select(HashExpressions.rollingHashes($"text", w)).as[Seq[Long]].head()
    assert(short == Seq("abc".getBytes("UTF-8").foldLeft(0L)((h, b) => h * 1000003L + (b & 0xffL))))
  }

  test("content-defined chunking reassembles to the original text and is insertion-stable") {
    val chunks = TextAnalysis.chunkByContent(docs, window = 16, maskBits = 5)
      .as[(Long, Int, String)].collect()
    val reassembled = chunks.groupBy(_._1).view
      .mapValues(_.sortBy(_._2).map(_._3).mkString).toMap
    val originals = docs.select($"doc_id", $"text").as[(Long, String)].collect().toMap
    assert(reassembled == originals)
    assert(chunks.groupBy(_._1).values.exists(_.length > 1)) // actually splits
    // content-defined: a prefix insertion leaves later chunk boundaries intact
    val doc = originals(0L)
    val edited = Seq((0L, "PREFIX INSERTED " + doc)).toDF("doc_id", "text")
    val editedChunks = TextAnalysis.chunkByContent(edited, 16, 5)
      .as[(Long, Int, String)].collect().sortBy(_._2).map(_._3)
    val origChunks = chunks.filter(_._1 == 0L).sortBy(_._2).map(_._3)
    assert(origChunks.toSet.intersect(editedChunks.toSet).nonEmpty)
  }

  test("streaming exact dedup drops within-watermark duplicates", SlowTest) {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val input = MemoryStream[(Long, java.sql.Timestamp, String)]
    val df = input.toDF().toDF("id", "ts", "text")
    val out = Dedup.streamingExact(df, "ts", "10 seconds")
    val q = out.writeStream.format("memory").queryName("sdedup")
      .outputMode("append").start()
    try {
      val t0 = 1700000000000L
      input.addData(
        (1L, new java.sql.Timestamp(t0), "same text"),
        (2L, new java.sql.Timestamp(t0 + 1000), "same text"),
        (3L, new java.sql.Timestamp(t0 + 2000), "Other"))
      q.processAllAvailable()
      val ids = spark.table("sdedup").select($"id").as[Long].collect().toSet
      assert(ids == Set(1L, 3L)) // duplicate id=2 dropped
    } finally q.stop()
  }

  test("astral string semantics: Spark column ops are code-point based and " +
      "UTF-8-binary ordered (the precondition for lifting the BMP word-form gate)") {
    // Spark stores strings as UTF-8 (UTF8String): length/substring count
    // CODE POINTS (like DuckDB), ORDER BY compares UTF-8 bytes = code-point
    // order (like DuckDB's binary collation — NOT Java's UTF-16 order,
    // where the surrogate range sorts below U+E000), and regex '.' consumes
    // a full code point. These are exactly the facts that make an astral
    // extension of isWordForm mirror-exact; this pin fails loudly if a
    // Spark upgrade ever changes them.
    import org.apache.spark.sql.functions.{length => flen, substring, regexp_replace => rre, expr}
    val df = Seq(("a😀b", "", "😀"))
      .toDF("s", "bmp_private", "astral")
    val r = df.select(
      flen($"s"),                       // 3 code points, not 4 UTF-16 units
      substring($"s", 2, 1),            // the emoji, whole
      rre($"s", "(.)", "<$1>"),         // '.' consumes the full code point
      ($"bmp_private" < $"astral")      // UTF-8 byte order: E000 < 1F600
    ).head()
    assert(r.getInt(0) == 3)
    assert(r.getString(1) == "😀")
    assert(r.getString(2) == "<a><😀><b>")
    assert(r.getBoolean(3), "Spark string ordering is not UTF-8-binary")
    // Java \p{L} is code-point based too: the astral letter U+10437 passes
    // the letters-only regex while the emoji does not
    val r2 = Seq(("𐐷", "😀")).toDF("deseret", "emoji")
      .select(expr("deseret rlike '^\\\\p{L}+$'"), expr("emoji rlike '^\\\\p{L}+$'"))
      .head()
    assert(r2.getBoolean(0) && !r2.getBoolean(1))
  }

  test("astral word-form lift: gate, native loops, orders and splits agree " +
      "by code point (round 15 — the BMP restriction is retired)") {
    import graft.functions.WordForm
    // the column gate admits astral LETTERS and still rejects emoji/mixed
    val g = Seq(("𐐷𐐷", "𝕬𝖅", "😀", "mixé𝐀", "x9"))
      .toDF("deseret", "mathbold", "emoji", "mixed_ok", "alnum")
      .select(
        TextAnalysis.isWordForm($"deseret"),
        TextAnalysis.isWordForm($"mathbold"),
        TextAnalysis.isWordForm($"emoji"),
        TextAnalysis.isWordForm($"mixed_ok"), // é and 𝐀 are both letters
        TextAnalysis.isWordForm($"alnum"),
        TextAnalysis.isWordForm($"deseret", maxLen = 1)) // 2 CODE POINTS
      .head()
    assert(g.getBoolean(0) && g.getBoolean(1) && !g.getBoolean(2) &&
      g.getBoolean(3) && !g.getBoolean(4))
    assert(!g.getBoolean(5), "maxLen must count code points")
    // the native contract matches: code-point letters, code-point maxLen
    assert(WordForm.isLetterWord("𐐷𐐷") && WordForm.isLetterWord("mixé𝐀"))
    assert(!WordForm.isLetterWord("😀") && !WordForm.isLetterWord("x9"))
    assert(!WordForm.isLetterWord("𐐷𐐷", maxLen = 1) &&
      WordForm.isLetterWord("𐐷𐐷", maxLen = 2))
    // compareCodePoints = UTF-8 byte order; Java's UTF-16 compareTo is NOT
    // (the private-use char U+E000 sorts above surrogates in UTF-16)
    assert(WordForm.compareCodePoints("", "😀") < 0)
    assert("".compareTo("😀") > 0, // the divergence the helper exists for
      "JVM changed UTF-16 ordering semantics?")
    assert(WordForm.compareCodePoints("ab", "abc") < 0 &&
      WordForm.compareCodePoints("abc", "abc") == 0)
    // the hazard that keeps zero-width split banned from per-char work:
    // Java's split("(?!^)") cuts surrogate pairs into lone surrogates,
    // while a '(.)' find-loop advances by whole code points
    assert("𐐷b".split("(?!^)").length == 3, "JVM split semantics changed?")
    val cps = Seq(Tuple1("𐐷b")).toDF("w")
      .select(org.apache.spark.sql.functions
        .regexp_extract_all($"w", lit("."), lit(0)))
      .head().getSeq[String](0)
    assert(cps == Seq("𐐷", "b"))
  }

  test("SQL function registration: graft_* callable from spark.sql") {
    graft.sql.GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT graft_dot(array(1d, 2d, 3d), array(4d, 5d, 6d)) AS d,
        |       graft_word_ngrams('a b c d', 2) AS ng,
        |       size(graft_rolling_hashes('hello world!', 4)) AS nh""".stripMargin).head()
    assert(r.getDouble(0) == 32.0)
    assert(r.getSeq[String](1) == Seq("a b", "b c", "c d"))
    assert(r.getInt(2) == 9)
  }

  test("multimodal: resize stub rescales payload and metadata together") {
    val media = Multimodal.synthesizeFromDocs(docs.limit(10))
    val resized = Multimodal.resizeStub(spark, media, 16, 8)
    val r = resized.collect()
    assert(r.length == 10)
    assert(r.forall(m => m.media.length == 16 * 8 && m.width == 16 && m.height == 8))
  }

  test("multimodal: stub decoder produces normalized histograms partition-parallel") {
    val media = Multimodal.synthesizeFromDocs(docs).repartition(4)
    val feats = Multimodal.decodeStub(spark, media)
    val f = feats.filter($"doc_id" === 0).head()
    assert(f.byte_len > 0)
    assert(math.abs(f.histogram.map(_.toDouble).sum - 1.0) < 1e-5)
    assert(feats.count() == docs.count())
  }

  test("multimodal: real PNG round-trip — decode recovers the exact pattern pixels") {
    val media = Multimodal.synthesizeImages(spark, docs.limit(20)).toDF()
    // the payloads are genuine PNG streams (magic bytes), not raw buffers
    val first = media.orderBy($"doc_id").head()
    val bytes = first.getAs[Array[Byte]]("media")
    assert((bytes(0) & 0xff) == 0x89 && bytes(1) == 'P' && bytes(2) == 'N' && bytes(3) == 'G')
    val feats = Multimodal.decodeImages(spark, media).collect()
    assert(feats.length == 20)
    feats.foreach { f =>
      val (w, h) = Multimodal.patternDims(f.doc_id)
      assert(f.width == w && f.height == h)
      var (sr, sg, sb) = (0L, 0L, 0L)
      for (y <- 0 until h; x <- 0 until w) {
        val (r, g, b) = Multimodal.patternRgb(f.doc_id, x, y)
        sr += r; sg += g; sb += b
      }
      assert(f.sum_r == sr && f.sum_g == sg && f.sum_b == sb)
    }
  }

  test("multimodal: real bilinear resize — dims update, solid color is exact, corrupt bytes survive", SlowTest) {
    // a solid-color image resizes to the SAME solid color under any
    // interpolation — the one bilinear output that is implementation-exact
    val img = new java.awt.image.BufferedImage(20, 10, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 10; x <- 0 until 20) img.setRGB(x, y, 0x336699)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val media = Seq(
      (1L, bos.toByteArray, "image/png", 20, 10),
      (2L, Array[Byte](1, 2, 3), "application/octet-stream", 0, 0)) // undecodable
      .toDF("doc_id", "media", "mime", "width", "height")
    val out = Multimodal.resizeImages(spark, media, 7, 5).collect().sortBy(_.doc_id)
    assert(out(0).width == 7 && out(0).height == 5)
    val back = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(out(0).media))
    assert(back.getWidth == 7 && back.getHeight == 5)
    for (y <- 0 until 5; x <- 0 until 7)
      assert((back.getRGB(x, y) & 0xffffff) == 0x336699)
    // corrupt row passes through untouched rather than failing the stage …
    assert(out(1).media.toSeq == Seq[Byte](1, 2, 3) && out(1).width == 0)
    // … and decodeImages flags it with the sentinel row
    val sentinel = Multimodal.decodeImages(spark, media)
      .filter($"doc_id" === 2L).head()
    assert(sentinel.width == -1 && sentinel.height == -1 && sentinel.sum_r == 0L)
  }

  test("multimodal: perceptual aHash — re-encoded near-copy within radius, pairs found, distinct apart") {
    // render doc 3's pattern, plus a copy with ONE pixel nudged: a perceptual
    // hash must land them within a few bits (here: identical or 1 off), while
    // a different pattern lands far away
    def render(docId: Long, tweak: Boolean, invert: Boolean): Array[Byte] = {
      val (w, h) = Multimodal.patternDims(docId)
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) {
        val (r0, g0, b0) = Multimodal.patternRgb(docId, x, y)
        val (r, g, b) = if (invert) (255 - r0, 255 - g0, 255 - b0) else (r0, g0, b0)
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
      }
      if (tweak) img.setRGB(0, 0, 0xffffff)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val media = Seq(
      (1L, render(3L, false, false), "image/png", 0, 0),
      (2L, render(3L, true, false), "image/png", 0, 0),
      (3L, render(3L, false, true), "image/png", 0, 0), // photographic negative
      (4L, Array[Byte](9, 9, 9), "application/octet-stream", 0, 0))
      .toDF("doc_id", "media", "mime", "width", "height")
    val hashes = Multimodal.imageAHash(spark, media).collect().toMap
    assert(hashes(4L) == -1L, "undecodable row must take the sentinel")
    val nearBits = java.lang.Long.bitCount(hashes(1L) ^ hashes(2L))
    val farBits = java.lang.Long.bitCount(hashes(1L) ^ hashes(3L))
    // inverting the image flips every block-vs-global comparison, so the
    // negative's hash is (up to ties) the complement — maximally far
    assert(nearBits <= 3, s"one-pixel tweak must stay within 3 bits, got $nearBits")
    assert(farBits > 32, s"the negative must land far away, got $farBits")
    // the banded hamming join finds exactly the near pair
    val pairs = graft.operators.Dedup.hammingPairs(
        Multimodal.imageAHash(spark, media.filter($"doc_id" =!= 4L))
          .toDF("id", "sig"), maxHamming = 3)
      .as[(Long, Long, Int)].collect().toSet
    assert(pairs.map(p => (p._1, p._2)) == Set((1L, 2L)), s"pairs: $pairs")
  }

  test("multimodal: metadata projection prunes the binary column from the scan") {
    val media = Multimodal.synthesizeFromDocs(docs)
    val meta = Multimodal.metadata(media)
    assert(!meta.queryExecution.optimizedPlan.output.map(_.name).contains("media"))
    assert(meta.count() == docs.count())
  }

  test("multimodal: PNG container walk recovers every frame; real decode per frame") {
    val docsDf = Seq.tabulate(6)(i => Tuple1(i.toLong)).toDF("doc_id")
    val vids = Multimodal.synthesizeVideos(spark, docsDf)
    val got = Multimodal.decodeFrames(spark, vids)
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect().sortBy(r => (r._1, r._2)).toSeq
    // frame counts follow the pattern-base formula; doc 3 is the planted
    // duplicate of doc 2 (same count, same patterns)
    val byDoc = got.groupBy(_._1).view.mapValues(_.size).toMap
    assert((0L to 5L).forall(d => byDoc(d) == Multimodal.frameCount(d)))
    assert(got.filter(_._1 == 3L).map(r => (r._2, r._8)) ==
      got.filter(_._1 == 2L).map(r => (r._2, r._8)))
    // frame (d, f): decoded dims and channel sums must equal the pattern
    // formulas computed directly (PNG is lossless)
    got.foreach { case (d, f, w, h, sr, sg, sb, _) =>
      val pid = Multimodal.framePatternId(d, f.toInt)
      val (ew, eh) = Multimodal.patternDims(pid)
      assert((w, h) == ((ew.toLong, eh.toLong)))
      var (xr, xg, xb) = (0L, 0L, 0L)
      for (y <- 0 until eh; x <- 0 until ew) {
        val (r, g, b) = Multimodal.framePatternRgb(pid, x, y)
        xr += r; xg += g; xb += b
      }
      assert((sr, sg, sb) == ((xr, xg, xb)), s"doc $d frame $f channel sums")
    }
  }

  test("multimodal: container walk survives trailing garbage and truncation") {
    val docsDf = Seq(Tuple1(3L)).toDF("doc_id")
    val bytes = Multimodal.synthesizeVideos(spark, docsDf)
      .select("media").as[Array[Byte]].head()
    val full = Multimodal.splitPngFrames(bytes)
    assert(full.size == Multimodal.frameCount(3L))
    // trailing garbage after the last IEND: frames still recovered
    assert(Multimodal.splitPngFrames(bytes ++ Array[Byte](1, 2, 3)).size == full.size)
    // truncation mid-frame: earlier complete frames survive, no throw
    val cut = Multimodal.splitPngFrames(bytes.dropRight(5))
    assert(cut.size == full.size - 1)
    assert(Multimodal.splitPngFrames(Array[Byte](0, 1, 2)).isEmpty)
  }

  test("NFC normalize: composes, maps singletons, scrubs controls, keeps ws class") {
    import graft.functions.TextExpressions.normalizeText
    val rows = Seq(
      (1L, "Cafe\u0301"), // e + combining acute -> composed \u00E9
      (2L, "\u212B"), // ANGSTROM SIGN -> A-ring U+00C5
      (3L, "a\u200Bb\u200Cc\u200Dd\uFEFFe"), // zero-width set scrubbed
      (4L, "x\u0007y\u0001 \u009Czw"), // BEL, SOH, C1 ST scrubbed
      (5L, "a\tb\nc\fd\re"), // engine ws class SURVIVES
      (6L, null.asInstanceOf[String])
    ).toDF("id", "t")
    val got = rows.select($"id", normalizeText($"t").as("n"))
      .as[(Long, Option[String])].collect().sortBy(_._1).toMap
    assert(got(1L) == Some("Caf\u00E9"))
    assert(got(2L) == Some("\u00C5"))
    assert(got(3L) == Some("abcde"))
    assert(got(4L) == Some("xy zw"))
    assert(got(5L) == Some("a\tb\nc\fd\re"))
    assert(got(6L).isEmpty)
  }

  test("bloom decontamination is exact: identical survivors to the broadcast path", SlowTest) {
    val corpus = docs.filter(col("doc_id") % 50 =!= 0)
    val bench = docs.filter(col("doc_id") % 50 === 0)
    val exact = Dedup.decontaminate(corpus, bench, 3)
      .select("doc_id").as[Long].collect().sorted.toSeq
    // even at an absurd fpp the confirm join must cancel every false positive
    Seq(0.01, 0.5).foreach { fpp =>
      val got = Dedup.decontaminateBloom(corpus, bench, 3, fpp = fpp)
        .select("doc_id").as[Long].collect().sorted.toSeq
      assert(got == exact, s"bloom path diverged at fpp=$fpp")
    }
  }

  test("semantic decontam: self-bench drops every nonzero vector; empty/impossible bench keep all", SlowTest) {
    val nonzero = emb.filter(
      graft.functions.VectorExpressions.dot(
        graft.operators.Similarity.toDoubleVec(col("embedding")),
        graft.operators.Similarity.toDoubleVec(col("embedding"))) > 0).count()
    // bench == corpus: every nonzero vector shares its own cell and has
    // cosine 1.0 with itself → contaminated; only zero vectors survive
    val self = Dedup.semanticDecontaminate(emb, emb, threshold = 0.999, nLists = 8)
    assert(self.count() == emb.count() - nonzero)
    // an empty benchmark contaminates nothing
    val none = Dedup.semanticDecontaminate(emb, emb.limit(0), 0.4, nLists = 8)
    assert(none.count() == emb.count())
    // an unreachable threshold contaminates nothing (cosine ≤ 1)
    val high = Dedup.semanticDecontaminate(emb, emb, threshold = 1.0001, nLists = 8)
    assert(high.count() == emb.count())
  }

  test("stratified quality cutoff: each group learns its own percentile; null group kept") {
    // stopword share rises with i within each source, so scores are 8
    // DISTINCT ascending values per group; srcB scores sit strictly below
    // srcA's (symbol soup tanks its alpha ratio) — a GLOBAL q=0.5 cutoff
    // would keep all of A and drop most of B; the stratified filter keeps
    // the top half of EACH (8 distinct values, q=0.5 interpolates between
    // ranks 3 and 4 → exactly 4 survive per group)
    val a = (0 until 8).map(i =>
      (i.toLong, ("the " * (i + 1)) + "alpha beta gamma delta", "srcA"))
    val b = (0 until 8).map(i =>
      ((100 + i).toLong, ("of " * (i + 1)) + "#1! #2! #3! #4! #5! #6!", "srcB"))
    val corpus = (a ++ b :+ ((999L, "orphan text here", null.asInstanceOf[String])))
      .toDF("doc_id", "text", "source")
    val kept = TextAnalysis.qualityQuantileFilterBy(corpus, q = 0.5,
        groupCol = "source", sampleRate = 1.0)
      .select("doc_id").as[Long].collect().toSet
    val keptA = kept.count(_ < 100)
    val keptB = kept.count(k => k >= 100 && k < 999)
    assert(keptA == 4, s"srcA kept $keptA of 8")
    assert(keptB == 4, s"srcB kept $keptB of 8")
    assert(kept.contains(999L), "null-source row must be kept")
    // cross-check against Spark's own per-group percentile on the full corpus
    val cuts = corpus.groupBy($"source")
      .agg(percentile(TextAnalysis.qualityScore($"text"), lit(0.5)).as("c"))
      .collect().map(r => Option(r.getString(0)) -> r.getDouble(1)).toMap
    val expected = corpus
      .select($"doc_id", $"source", TextAnalysis.qualityScore($"text").as("q"))
      .collect().filter { r =>
        val src = Option(r.getString(1))
        src.isEmpty || r.getDouble(2) >= cuts(src)
      }.map(_.getLong(0)).toSet
    assert(kept == expected)
  }

  test("as-of join: backward inclusive, max tie-break, left-outer, tolerance") {
    val left = Seq(
      (1L, "u1", 100L), // exact-time right row qualifies (inclusive)
      (2L, "u1", 250L), // latest of {100, 200{a,b}} → 200, tie → max eid 21
      (3L, "u2", 50L), // no right row at/before → NULLs
      (4L, "u3", 500L) // key with no right rows at all → NULLs
    ).toDF("id", "k", "t")
    val right = Seq(
      ("u1", 100L, 10L, 1.0),
      ("u1", 200L, 20L, 2.0), // tie on ts with eid 21
      ("u1", 200L, 21L, 3.0),
      ("u1", 300L, 30L, 4.0), // after every left row with this key
      ("u2", 60L, 40L, 5.0) // after u2's only left row
    ).toDF("k", "rt", "eid", "v")
    val out = Relational.asofJoin(left, right, "k", "t", "rt",
        payload = Seq("v"), rightTieBreak = "eid")
      .select("id", "asof_rt", "asof_v").as[(Long, Option[Long], Option[Double])]
      .collect().sortBy(_._1)
    assert(out.toSeq == Seq(
      (1L, Some(100L), Some(1.0)),
      (2L, Some(200L), Some(3.0)), // max-eid tie winner's payload
      (3L, None, None),
      (4L, None, None)))

    // tolerance: the 200-unit-stale match at t=250 survives a 150 window
    // but not a 40 window
    val tol = Relational.asofJoin(left, right, "k", "t", "rt",
        payload = Seq("v"), rightTieBreak = "eid", toleranceUs = 40L)
      .select("id", "asof_v").as[(Long, Option[Double])].collect().sortBy(_._1)
    assert(tol.toSeq == Seq(
      (1L, Some(1.0)), (2L, None), (3L, None), (4L, None)))

    // forward: earliest right row AT/after each left time; ties at the same
    // rt resolve to the SMALLEST eid (id 1 hits the t=100 row inclusively,
    // id 2 reaches the 300 row, id 3 takes u2's later row, id 4 none)
    val fwd = Relational.asofJoin(left, right, "k", "t", "rt",
        payload = Seq("v"), rightTieBreak = "eid", direction = "forward")
      .select("id", "asof_rt", "asof_v").as[(Long, Option[Long], Option[Double])]
      .collect().sortBy(_._1)
    assert(fwd.toSeq == Seq(
      (1L, Some(100L), Some(1.0)),
      (2L, Some(300L), Some(4.0)),
      (3L, Some(60L), Some(5.0)),
      (4L, None, None)))
  }

  test("range join binned: inclusive bounds, multi-bin intervals, overlaps") {
    val points = Seq(
      ("u1", 100L, 1L), ("u1", 150L, 2L), ("u1", 249L, 3L),
      ("u1", 250L, 4L), // == end bound: inclusive
      ("u1", 251L, 5L), // just past
      ("u2", 100L, 6L) // right time, other key
    ).toDF("k", "t", "pid")
    val intervals = Seq(
      ("u1", 100L, 250L, 100L), // spans bins 1..2 at binWidth=128
      ("u1", 140L, 160L, 101L), // overlaps the first → point 2 matches both
      ("u2", 0L, 50L, 102L) // u2's points all outside
    ).toDF("k", "s", "e", "iid")
    val out = Relational.rangeJoinBinned(points, intervals, "t", "s", "e",
        binWidth = 128L, keys = Seq("k"))
      .select("iid", "pid").as[(Long, Long)].collect().sorted
    assert(out.toSeq == Seq(
      (100L, 1L), (100L, 2L), (100L, 3L), (100L, 4L), (101L, 2L)))
  }

  test("overlap join binned: touching endpoints, multi-bin pairs meet once") {
    val lefts = Seq(
      ("u1", 100L, 300L, 1L), // spans bins 0..2 at binWidth=128
      ("u1", 400L, 450L, 2L),
      ("u2", 100L, 300L, 3L) // other key
    ).toDF("k", "ls", "le", "lid")
    val rights = Seq(
      ("u1", 0L, 100L, 10L), // touches lid=1's start exactly: inclusive
      ("u1", 150L, 290L, 11L), // nested in lid=1, shares bins 1 and 2
      ("u1", 301L, 399L, 12L), // in the gap: matches neither
      ("u1", 290L, 420L, 13L), // bridges lid=1 and lid=2
      ("u2", 50L, 150L, 14L) // u2 only — same span would also hit lid=1
    ).toDF("k", "rs", "re", "rid")
    val out = Relational.overlapJoinBinned(lefts, rights,
        "ls", "le", "rs", "re", binWidth = 128L, keys = Seq("k"))
      .select("lid", "rid").as[(Long, Long)].collect().sorted
    assert(out.toSeq == Seq(
      (1L, 10L), (1L, 11L), (1L, 13L), (2L, 13L), (3L, 14L)))
  }

  test("weighted sample: ineligible rows excluded, deterministic, scale-invariant") {
    val rows = Seq((1L, Option(10L)), (2L, Option(0L)), (3L, Option.empty[Long]),
      (4L, Option(5L)), (5L, Option(1L)), (6L, Option(-7L)), (7L, Option(2L)))
      .toDF("id", "w")
    val out = Sampling.weightedSample(rows, "id", "w", 3)
      .select("id").as[Long].collect().toSet
    assert(out.size == 3, s"expected 3 selected, got $out")
    assert(!out.contains(2L) && !out.contains(3L) && !out.contains(6L),
      s"zero/null/negative-weight rows must never be selected: $out")
    val again = Sampling.weightedSample(rows, "id", "w", 3)
      .select("id").as[Long].collect().toSet
    assert(out == again, "selection must be deterministic across runs")
    // k >= eligible rows: all of them, exactly once
    val all = Sampling.weightedSample(rows, "id", "w", 10)
      .select("id").as[Long].collect().toSeq
    assert(all.sorted == Seq(1L, 4L, 5L, 7L))
    // constant weights are scale-invariant: u^(1/c) is monotone in u for
    // any c > 0, so every constant selects the same (uniform) top-k
    val ids = (1L to 20L).map(i => (i, 1L)).toDF("id", "w")
    val ids9 = (1L to 20L).map(i => (i, 9000L)).toDF("id", "w")
    val u1 = Sampling.weightedSample(ids, "id", "w", 5)
      .select("id").as[Long].collect().toSet
    val u9 = Sampling.weightedSample(ids9, "id", "w", 5)
      .select("id").as[Long].collect().toSet
    assert(u1 == u9, s"constant-weight selections diverged: $u1 vs $u9")
  }

  test("keySkew: hand-computed shares, deterministic tie-break, topN cap") {
    import graft.operators.Profiling
    val rows = (Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq.fill(3)("c") ++
      Seq("d")).zipWithIndex.map { case (k, i) => (i.toLong, k) }
      .toDF("id", "k")
    val got = Profiling.keySkew(rows, "k", 3)
      .select($"k", $"cnt", $"share", $"rank")
      .as[(String, Long, Double, Long)].collect().sortBy(_._4)
    // ties (b, c at 3) break by key asc; d (cnt 1) is cut by topN; shares
    // are fractions of ALL 12 rows, not of the top-3
    assert(got.toSeq == Seq(
      ("a", 5L, 5.0 / 12, 1L), ("b", 3L, 3.0 / 12, 2L), ("c", 3L, 3.0 / 12, 3L)))
    intercept[IllegalArgumentException] { Profiling.keySkew(rows, "k", 0) }
    intercept[IllegalArgumentException] {
      Profiling.keySkew(rows.withColumn("share", lit(1.0)), "k", 3)
    }
  }

  test("packSequencesWhole: docs never cross the budget, overflow starts a fresh sequence") {
    // one shard keeps the greedy scan readable; budget 4. Doc order 1..6:
    //   1 (3 tok)  → seq 0, off 0, fill 3
    //   2 (2 tok)  → 3+2 > 4 → seq 1, off 0, fill 2
    //   4 (10 tok, over-budget) → 2+10 > 4 → seq 2, off 0 ALONE, fill 10
    //   5 (1 tok)  → 10+1 > 4 → seq 3, off 0, fill 1
    //   6 (2 tok)  → 1+2 ≤ 4 → seq 3, off 1, fill 3
    // empties (2 tok doc is id 2; ids 3a/3b empty+ws-only) are dropped first
    val df = Seq(
      (1L, "a b c"),
      (2L, "x y"),
      (3L, ""),
      (4L, "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10"),
      (5L, "z"),
      (6L, "p q"),
      (7L, " \t \n ")).toDF("doc_id", "text")
    val packed = Sampling.packSequencesWhole(df, "doc_id",
        TextAnalysis.tokenCount($"text"), budget = 4L, numShards = 1)
      .select($"doc_id", $"seq_id", $"tok_offset")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(packed.toSeq == Seq(
      (1L, 0L, 0L), (2L, 1L, 0L), (4L, 2L, 0L), (5L, 3L, 0L), (6L, 3L, 1L)))
    // invariants at any shard count: per-sequence token sums never exceed
    // the budget unless the sequence is one over-budget doc alone, offsets
    // are the gapless prefix sums of their sequence, seq ids are dense
    val multi = Sampling.packSequencesWhole(docs, "doc_id",
        TextAnalysis.tokenCount($"text"), budget = 64L, numShards = 4)
      .select($"shard", $"seq_id", $"tok_offset", $"doc_id",
        TextAnalysis.tokenCount($"text").cast("long").as("n"))
      .as[(Long, Long, Long, Long, Long)].collect()
    multi.groupBy(r => (r._1, r._2)).foreach { case ((sh, sq), rows) =>
      val sorted = rows.sortBy(r => (r._3, r._4))
      val total = sorted.map(_._5).sum
      assert(total <= 64L || sorted.length == 1,
        s"seq ($sh,$sq) holds $total tokens across ${sorted.length} docs")
      var off = 0L
      sorted.foreach { r =>
        assert(r._3 == off, s"gap in seq ($sh,$sq): expected $off got ${r._3}")
        off += r._5
      }
    }
    multi.groupBy(_._1).foreach { case (sh, rows) =>
      val ids = rows.map(_._2).distinct.sorted.toSeq
      assert(ids == (0L until ids.length.toLong).toSeq,
        s"shard $sh seq ids not dense: $ids")
    }
    // same contract guards as packSequences: output columns must be free
    intercept[IllegalArgumentException] {
      Sampling.packSequencesWhole(df.withColumn("seq_id", lit(1)), "doc_id",
        TextAnalysis.tokenCount($"text"), 4L, 1)
    }
  }

  test("packFill: per-sequence token totals and padding waste") {
    val df = Seq(
      (1L, "a b c"),
      (2L, "x y"),
      (4L, "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10"),
      (5L, "z"),
      (6L, "p q")).toDF("doc_id", "text")
    val packed = Sampling.packSequencesWhole(df, "doc_id",
      TextAnalysis.tokenCount($"text"), budget = 4L, numShards = 1)
    val fill = Sampling.packFill(packed, TextAnalysis.tokenCount($"text"), 4L)
      .select($"seq_id", $"n_docs", $"n_tokens", $"pad")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(fill.toSeq == Seq(
      (0L, 1L, 3L, 1L),   // doc 1
      (1L, 1L, 2L, 2L),   // doc 2
      (2L, 1L, 10L, 0L),  // over-budget doc 4: pad clamps to 0
      (3L, 2L, 3L, 1L)))  // docs 5+6
    // composes with materializeSequences unchanged: whole-packed sequences
    // concatenate intact documents only
    val seqs = Sampling.materializeSequences(packed)
      .as[(Long, Long, Long, String)].collect().sortBy(_._2)
    assert(seqs.map(_._4).toSeq ==
      Seq("a b c", "x y", "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10", "z\np q"))
  }

  test("BPE merge learning reproduces the hand-computed Sennrich example") {
    // the classic corpus: low×5 lower×2 newest×6 widest×3. Hand-run:
    //  r1: (e,s)=9 ties (s,t)=9 → lhs tie-break picks (e,s)
    //  r2: (es,t)=9   r3: (l,o)=7 ties (o,w)=7 → (l,o)   r4: (lo,w)=7
    val corpus = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" ")
    val docsDf = Seq((1L, corpus)).toDF("doc_id", "text")
    val got = TextAnalysis.bpeLearnMerges(docsDf, 4)
      .as[(Long, String, String, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq(
      (1L, "e", "s", 9L), (2L, "es", "t", 9L),
      (3L, "l", "o", 7L), (4L, "lo", "w", 7L)))
  }

  test("subword learning: the driver-local loop equals the distributed loop " +
      "row for row (BPE + WordPiece, Latin/Cyrillic/astral corpus)", SlowTest) {
    // the local loop is the default behind bpeLearnMerges /
    // wordpieceLearnMerges (corpus reduction distributed, merge loop on
    // the collected vocabulary); the distributed loop must stay
    // row-identical — including argmax tie-breaks and astral symbols
    val corpus = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest") ++
      Seq.fill(4)("слово") ++ Seq.fill(3)("𐐷𐐷𐐷𐐷") ++
      Seq.fill(2)("𝕬𝖅𝕬𝖅") ++ Seq("mixé𝐀", "x9", "😀")).mkString(" ")
    val docsDf = Seq((1L, corpus), (2L, "низкий низкий 𐐷𐐷 ok"))
      .toDF("doc_id", "text")
    for (wp <- Seq(false, true)) {
      val local = TextAnalysis
        .subwordLearnMergesLocal(docsDf, 10, "text", wordpiece = wp)
        .as[(Long, String, String, Long)].collect().sortBy(_._1).toSeq
      val dist = TextAnalysis
        .subwordLearnMerges(docsDf, 10, "text", wordpiece = wp)
        .as[(Long, String, String, Long)].collect().sortBy(_._1).toSeq
      assert(local == dist, s"wordpiece=$wp")
      assert(local.exists(m =>
          m._2.exists(_.isSurrogate) || m._3.exists(_.isSurrogate)),
        s"wordpiece=$wp: expected an astral merge in this fixture, got $local")
    }
  }

  test("batched BPE learning with batchK=1 equals the serial learner") {
    // dominance filtering degenerates to the plain argmax at k=1, so the
    // batched table must EQUAL bpeLearnMerges' — the contract that makes
    // the batched variant a safe job-count lever
    val corpus = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" ")
    val docsDf = Seq((1L, corpus)).toDF("doc_id", "text")
    val serial = TextAnalysis.bpeLearnMerges(docsDf, 4)
      .as[(Long, String, String, Long)].collect().sortBy(_._1).toSeq
    val batched = TextAnalysis.bpeLearnMergesBatched(docsDf, 4, 1)
      .as[(Long, Long, String, String, Long)].collect().sortBy(_._1).toSeq
    assert(batched.map(b => (b._1, b._3, b._4, b._5)) == serial)
    assert(batched.forall(_._2 == 1L)) // one merge per batch at k=1
  }

  test("batched WordPiece learning with batchK=1 equals the serial learner") {
    val corpus = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" ")
    val docsDf = Seq((1L, corpus)).toDF("doc_id", "text")
    val serial = TextAnalysis.wordpieceLearnMerges(docsDf, 4)
      .as[(Long, String, String, Long)].collect().sortBy(_._1).toSeq
    val batched = TextAnalysis.wordpieceLearnMergesBatched(docsDf, 4, 1)
      .as[(Long, Long, String, String, Long)].collect().sortBy(_._1).toSeq
    assert(batched.map(b => (b._1, b._3, b._4, b._5)) == serial)
  }

  test("batched BPE learning: hand-computed dominance batch on the Sennrich corpus") {
    // ranked pairs: (e,s)=9 (s,t)=9 (w,e)=8 (l,o)=7 (o,w)=7 (e,w)=6 (n,e)=6
    // (d,e)=3 (i,d)=3 (w,i)=3 (e,r)=2. Dominance: (e,s) accepted; (s,t)
    // shares s → out; (w,e) shares e → out; (l,o) disjoint → accepted;
    // (o,w) shares o → out; every later pair conflicts with SOME
    // higher-ranked pair — including (i,d), which dies to the REJECTED
    // (d,e): dominance is deliberately more conservative than greedy
    // (order-free, one anti-join). So one batch at k=4 accepts exactly 2.
    val corpus = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" ")
    val docsDf = Seq((1L, corpus)).toDF("doc_id", "text")
    val got = TextAnalysis.bpeLearnMergesBatched(docsDf, 1, 4)
      .as[(Long, Long, String, String, Long)].collect().sortBy(_._2).toSeq
    assert(got == Seq((1L, 1L, "e", "s", 9L), (1L, 2L, "l", "o", 7L)))
  }

  test("BPE merge learning on a Cyrillic corpus: hand-computed merges") {
    // мир×5 мирок×2 колесо×6 железо×3. Hand-run:
    //  r1: (л,е)=9 (both колесо and железо contribute)
    //  r2: (м,и)=7 ties (и,р)=7 → binary-UTF-8 lhs tie-break: и < м → (и,р)
    //  r3: (м,ир)=7   r4: колесо's four pairs tie at 6 → lhs и < к < ле < с
    //  order picks (к,о)
    val corpus = (Seq.fill(5)("мир") ++ Seq.fill(2)("мирок") ++
      Seq.fill(6)("колесо") ++ Seq.fill(3)("железо")).mkString(" ")
    val docsDf = Seq((1L, corpus)).toDF("doc_id", "text")
    val got = TextAnalysis.bpeLearnMerges(docsDf, 4)
      .as[(Long, String, String, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq(
      (1L, "л", "е", 9L), (2L, "и", "р", 7L),
      (3L, "м", "ир", 7L), (4L, "к", "о", 6L)))
  }

  test("learned BPE merges applied: hand-computed piece counts, non-words count 1") {
    val corpus = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" ")
    val learnDf = Seq((1L, corpus)).toDF("doc_id", "text")
    val merges = TextAnalysis.bpeLearnMerges(learnDf, 4)
      .orderBy("rank").collect().map(r => (r.getString(1), r.getString(2))).toSeq
    // merges = (e,s)(es,t)(l,o)(lo,w): low→[low]=1, lower→[low,e,r]=3,
    // newest→[n,e,w,est]=4, widest→[w,i,d,est]=4. Under the Unicode
    // word-form gate: "X9" (digit) → 1; "Low" IS a word form now but no
    // lowercase merge fires → [L,o,w]=3; Cyrillic "мир" → [м,и,р]=3;
    // decomposed "cafe"+COMBINING ACUTE NFC-composes to café (4 letters)
    // → 4 — pinning normalize-BEFORE-gate ordering
    val apply = Seq(
        (7L, "low lower newest widest X9 Low мир café"),
        (8L, "   "))
      .toDF("doc_id", "text")
    val got = TextAnalysis.bpeEncodedCounts(apply, merges)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((7L, 8L, 23L))) // empty doc 8 emits no row
  }

  test("BPE compression curve: total pieces decrease monotonically with merges", SlowTest) {
    val merges = TextAnalysis.bpeLearnMerges(docs, 40)
      .orderBy("rank").collect().map(r => (r.getString(1), r.getString(2))).toSeq
    val totals = Seq(0, 4, 12, 40).map { r =>
      val t = TextAnalysis.bpeEncodedCountsFast(docs, merges.take(r))
        .agg(sum($"n_pieces"), sum($"n_tokens"))
        .as[(Long, Long)].collect().head
      (r, t._1, t._2)
    }
    info(totals.map { case (r, p, t) =>
      f"R=$r%2d pieces=$p ratio=${p.toDouble / t}%.3f" }.mkString("  "))
    // each extra merge can only merge more adjacent pairs — strictly fewer
    // pieces on this corpus (its top-40 merges all fire)
    assert(totals.map(_._2) == totals.map(_._2).sorted.reverse)
    assert(totals.map(_._2).distinct.size == totals.size)
    // R=0 degenerates to per-character symbols for word forms
    assert(totals.head._2 > totals.head._3) // more pieces than tokens
  }

  test("native BPE apply equals the chained-replace spec under a 40-merge learned table", SlowTest) {
    val merges = TextAnalysis.bpeLearnMerges(docs, 40)
      .orderBy("rank").collect().map(r => (r.getString(1), r.getString(2))).toSeq
    assert(merges.size == 40)
    val spec = TextAnalysis.bpeEncodedCounts(docs, merges)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    val fast = TextAnalysis.bpeEncodedCountsFast(docs, merges)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(fast == spec)
  }

  test("BPE merge application is left-to-right non-overlapping on symbol runs") {
    // "aaaa": r1 counts (a,a) at 3 ADJACENT positions; applying merges
    // pairs 1-2 and 3-4 (never the overlapping middle), so r2 sees (aa,aa).
    // "aaa" merges only its first pair → r2 also counts one (aa,a).
    val docsDf = Seq((1L, "aaaa"), (2L, "aaa")).toDF("doc_id", "text")
    val got = TextAnalysis.bpeLearnMerges(docsDf, 2)
      .as[(Long, String, String, Long)].collect().sortBy(_._1).toSeq
    assert(got.head == (1L, "a", "a", 5L)) // 3 (aaaa) + 2 (aaa)
    // r2: pairs are (aa,aa)=1 from doc1 and (aa,a)=1 from doc2 —
    // tie on count, rhs tie-break picks (aa,a)
    assert(got(1) == (2L, "aa", "a", 1L))
  }

  test("template groups: digit-masked pages group; distinct content does not") {
    val fix = Seq(
      (1L, "Order 123 shipped on day 4."),
      (2L, "order   9981 SHIPPED on day 28."), // case/ws/digits differ — same template
      (3L, "Order 77 returned on day 3."),     // different words — different template
      (4L, "completely unrelated text")).toDF("doc_id", "text")
    val got = TextAnalysis.templateGroups(fix)
      .as[(String, Long, Long)].collect().toSeq
    assert(got.map(r => (r._2, r._3)) == Seq((1L, 2L))) // one group: docs 1+2
  }

  test("flesch signals: hand-computed counters and score") {
    // "the cat sat. it ran away!" → 6 words, 2 sentences, syllables:
    // the=1 cat=1 sat.=1 it=1 ran=1 away!=2 (a,a-y? 'away' → a, ay → 2) = 7
    val fix = Seq((1L, "the cat sat. it ran away!"), (2L, "")).toDF("doc_id", "text")
    val got = TextAnalysis.fleschSignals(fix)
      .as[(Long, Long, Long, Long, Option[Double])].collect().sortBy(_._1).toSeq
    val score = math.rint((206.835 - 1.015 * 6.0 / 2.0 - 84.6 * 7.0 / 6.0) * 10000) / 10000
    assert(got(0) == ((1L, 6L, 2L, 7L, Some(score))))
    assert(got(1) == ((2L, 0L, 1L, 0L, None)))
  }

  test("centroid drift: identical generations give cosine 1, membership flags track") {
    import graft.operators.Similarity
    val same = Similarity.centroidDrift(emb, emb, "label")
      .as[(Long, Option[Double], Boolean, Boolean)].collect()
    assert(same.forall { case (_, c, o, n) =>
      o && n && math.abs(c.get - 1.0) < 1e-12 })
    // a label present on one side only: NULL cosine, flags expose it
    val drift = Similarity.centroidDrift(
        emb.filter(col("label") =!= 3), emb.filter(col("label") =!= 5), "label")
      .as[(Long, Option[Double], Boolean, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(drift(3L) == ((None, false, true)))
    assert(drift(5L) == ((None, true, false)))
    assert(drift(1L)._1.isDefined)
  }

  test("JSONL source: round-trips the corpus, counts corrupt lines, drops them") {
    import graft.sources.DocumentsJsonl
    val dir = java.nio.file.Files.createTempDirectory("graft-jsonl").toString
    // write the real corpus as JSONL, then damage it with corrupt lines
    docs.select(to_json(struct(col("doc_id"), col("text"), col("source"))))
      .coalesce(1).write.text(s"$dir/clean")
    val clean = spark.read.text(s"$dir/clean")
    val damaged = clean.unionAll(Seq(
      "{truncated", "", "not json at all", "{\"text\": \"no id\"}").toDF("value"))
    val parsed = DocumentsJsonl.parse(damaged)
    assert(parsed.filter(col("corrupt")).count() == 4L)
    val roundTrip = parsed.filter(!col("corrupt"))
      .select("doc_id", "text", "source")
      .as[(Long, Option[String], Option[String])].collect().sortBy(_._1).toSeq
    val orig = docs.select("doc_id", "text", "source")
      .as[(Long, Option[String], Option[String])].collect().sortBy(_._1).toSeq
    assert(roundTrip == orig)
  }

  test("contrastive triplets: positive shares the label, negatives never do", SlowTest) {
    import graft.operators.Similarity
    val t = Similarity.contrastiveTriplets(emb.filter(col("vec_id") < 10), emb, 3)
      .join(emb.select(col("vec_id").as("query_id"), col("label").as("ql")), Seq("query_id"))
      .join(emb.select(col("vec_id").as("positive_id"), col("label").as("pl")), Seq("positive_id"))
      .join(emb.select(col("vec_id").as("negative_id"), col("label").as("nl")), Seq("negative_id"))
    assert(t.filter(!(col("ql") <=> col("pl"))).count() == 0L)
    assert(t.filter(col("ql") <=> col("nl")).count() == 0L)
    assert(t.filter(col("positive_id") === col("query_id") ||
      col("negative_id") === col("query_id")).count() == 0L)
    // structure: one positive replicated across <= negK rows per anchor
    val shape = t.groupBy("query_id")
      .agg(countDistinct(col("positive_id")).as("np"),
        countDistinct(col("negative_id")).as("nn"), count(lit(1)).as("rows"))
      .as[(Long, Long, Long, Long)].collect()
    assert(shape.forall { case (_, np, nn, rows) => np == 1 && nn == rows && rows <= 3 })
    // NOTE: no margin assertion — on these label-uncorrelated synthetics the
    // hardest of many negatives out-scores the best positive by design;
    // margin is a property of the caller's embeddings, not the miner
  }

  test("intra-doc line dedup: first occurrence wins, order preserved, NULL passes") {
    val fix = Seq(
      (1L, "nav\nbody a\nnav\nbody b\nnav"),
      (2L, "\n\nx\n\n"), // repeated blanks collapse to the first
      (3L, null.asInstanceOf[String]),
      (4L, "unique only")).toDF("doc_id", "text")
    val got = TextAnalysis.dedupLinesWithin(fix)
      .as[(Long, Option[String], Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq(
      (1L, Some("nav\nbody a\nbody b"), 5L, 2L),
      (2L, Some("\nx"), 5L, 3L),
      (3L, None, 0L, 0L),
      (4L, Some("unique only"), 1L, 0L)))
  }

  test("water-filling allocation: level, spill, remainder, and edge budgets", SlowTest) {
    def fix(counts: Map[String, Int]) =
      counts.toSeq.flatMap { case (k, n) => (1 to n).map(i => (k, i)) }
        .toDF("src", "i")
    def alloc(counts: Map[String, Int], b: Long) =
      Sampling.waterfillAlloc(fix(counts), "src", b)
        .as[(String, Long, Long)].collect().sortBy(_._1).toSeq
    // small key keeps everything, its unused share spills to the big keys;
    // remainder +1 goes to the first unsaturated key in key order
    assert(alloc(Map("a" -> 2, "b" -> 10, "c" -> 10), 9L) ==
      Seq(("a", 2L, 2L), ("b", 10L, 4L), ("c", 10L, 3L)))
    // exact level, no remainder
    assert(alloc(Map("a" -> 2, "b" -> 3, "c" -> 100), 6L) ==
      Seq(("a", 2L, 2L), ("b", 3L, 2L), ("c", 100L, 2L)))
    // budget >= total: everything; budget 0: nothing
    assert(alloc(Map("a" -> 2, "b" -> 3), 99L) ==
      Seq(("a", 2L, 2L), ("b", 3L, 3L)))
    assert(alloc(Map("a" -> 2, "b" -> 3), 0L) ==
      Seq(("a", 2L, 0L), ("b", 3L, 0L)))
    // the invariant release planning needs: sum(alloc) == min(budget, total)
    for (b <- Seq(1L, 5L, 12L, 24L, 25L, 26L)) {
      val s = alloc(Map("a" -> 7, "b" -> 1, "c" -> 13, "d" -> 4), b)
      assert(s.map(_._3).sum == math.min(b, 25L), s"budget $b: $s")
    }
    // materialization: selectByAlloc emits exactly alloc rows per key,
    // deterministically (stable under repartition)
    val data = fix(Map("a" -> 7, "b" -> 1, "c" -> 13, "d" -> 4))
      .withColumn("doc_id", col("i") + length(col("src")).cast("long") * 1000)
    val al = Sampling.waterfillAlloc(data, "src", 12L)
    val sel = Sampling.selectByAlloc(data, al, "src", "doc_id")
    val perKey = sel.groupBy("src").count()
      .as[(String, Long)].collect().sortBy(_._1).toSeq
    assert(perKey == al.as[(String, Long, Long)].collect().sortBy(_._1)
      .map(r => (r._1, r._3)).filter(_._2 > 0).toSeq)
    val sel2 = Sampling.selectByAlloc(data.repartition(9), al, "src", "doc_id")
    assert(sel2.select("src", "doc_id").as[(String, Long)].collect().sorted.toSeq ==
      sel.select("src", "doc_id").as[(String, Long)].collect().sorted.toSeq)
  }

  test("line language mix: code-switched page reports majority + minority fraction") {
    val fix = Seq(
      // 3 English lines + 1 Spanish line → majority en, 1/4 minority
      (1L, "the cat is here\nthe dog is there\nit is the end\nel que no es la"),
      (2L, "zzz qqq\nxxx"), // no stopword hits anywhere → all lines abstain
      (3L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val got = TextAnalysis.langMixByLine(fix)
      .as[(Long, Long, Long, String, Double)].collect().sortBy(_._1).toSeq
    assert(got == Seq(
      (1L, 4L, 2L, "en", 0.25),
      (2L, 0L, 0L, "und", 0.0),
      (3L, 0L, 0L, "und", 0.0)))
  }

  test("KS drift matches a hand-computed fixture; identical samples give 0") {
    import graft.operators.Profiling
    val o = Seq(1L, 1L, 2L, 3L).toDF("x")
    val n = Seq(2L, 3L, 3L, 4L).toDF("x")
    // cum old: 2,3,4,4; cum new: 0,1,3,4 → max|ca·4 − cb·4| = 8 → D = 8/16
    val got = Profiling.ksDrift(o, n, col("x"))
      .as[(Long, Long, Long, Double)].collect().head
    assert(got == ((4L, 4L, 8L, 0.5)))
    val same = Profiling.ksDrift(o, o, col("x"))
      .as[(Long, Long, Long, Double)].collect().head
    assert(same == ((4L, 4L, 0L, 0.0)))
  }

  test("html strip: blocks, comments, gluing tags, ordered entity decode") {
    val cases = Seq(
      (1L, "<p>a</p><script>var x = '<b>hi</b>';</script><p>b</p>", "a b"),
      (2L, "<td>left</td><td>right</td>", "left right"), // tags never glue words
      (3L, "<!-- drop --><STYLE>p{}</STYLE>keep", "keep"), // case-insensitive blocks
      (4L, "x &amp;lt; y", "x &lt; y"), // &amp; decodes LAST: no double-decode
      (5L, "it&#39;s &quot;q&quot; &nbsp;z", "it's \"q\" z"),
      (6L, "a <b c", "a <b c")) // malformed tag (no >) degrades to literal text
      .toDF("doc_id", "html", "expected")
    val got = cases.select($"doc_id", $"expected",
        TextAnalysis.stripHtml($"html").as("clean"))
      .as[(Long, String, String)].collect().sortBy(_._1)
    got.foreach { case (id, exp, clean) =>
      assert(clean == exp, s"doc $id: got '$clean', want '$exp'")
    }
  }

  test("export manifest: repartition-stable, flips on any content corruption") {
    val base = docs.limit(200)
    val m1 = Sampling.exportManifest(base, 8)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    val m2 = Sampling.exportManifest(base.repartition(13), 8)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(m1 == m2 && m1.map(_._2).sum == 200L)
    // corrupt ONE document's text → exactly that shard's checksum flips
    val corrupted = base.withColumn("text",
      when(col("doc_id") === 7L, concat(col("text"), lit("x")))
        .otherwise(col("text")))
    val m3 = Sampling.exportManifest(corrupted, 8)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(m3.map(r => (r._1, r._2)) == m1.map(r => (r._1, r._2)))
    assert(m1.zip(m3).count { case (a, b) => a._4 != b._4 } == 1)
  }

  test("data card matches a hand-computed fixture incl. null/empty/dup docs") {
    import graft.operators.Profiling
    val fix = Seq((1L, "a b"), (2L, "a b"), (3L, null), (4L, ""), (5L, "c"))
      .toDF("doc_id", "text")
    val got = Profiling.dataCard(fix).as[(String, Double)].collect().toMap
    assert(got == Map(
      "n_docs" -> 5.0, "n_null_docs" -> 1.0, "n_empty_docs" -> 2.0,
      "n_tokens" -> 5.0, "n_chars" -> 7.0, "n_exact_dup_docs" -> 1.0,
      "mean_doc_tokens" -> 1.0, "p50_doc_tokens" -> 1.0))
  }

  test("banding eval: exact dups always caught, count identities hold, repartition-stable") {
    val fix = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"), // J=1 with doc 1 — every slot equal
      (3L, "one two three four five six seven"),
      (4L, "one two three four nine ten eleven"), // J < 0.5 with doc 3
      (5L, "unrelated words entirely here today")).toDF("doc_id", "text")
    val row = Dedup.minhashBandingEval(fix, n = 3, k = 16, bands = 4, threshold = 0.5)
      .as[(Long, Long, Long, Long, Long, Double, Double)].collect().head
    val (nTruth, nCand, tp, fp, fn, prec, rec) = row
    assert(nTruth == 1L)         // only the exact-dup pair reaches J >= 0.5
    assert(tp == 1L && fn == 0L) // identical signatures band together always
    assert(fp == nCand - tp && tp + fn == nTruth)
    assert(prec == tp.toDouble / nCand && rec == 1.0)
    val re = Dedup.minhashBandingEval(fix.repartition(7), 3, 16, 4, 0.5)
      .as[(Long, Long, Long, Long, Long, Double, Double)].collect().head
    assert(re == row)
  }

  test("ranking metrics match a hand-computed fixture, including zero-hit queries") {
    import graft.operators.Eval
    // q1: relevant {10,20,30}; retrieved ranks: 10@1, 99@2, 20@4 → hits 2
    // q2: relevant {40}; retriever misses it entirely → all-zero row
    // q3: relevant {50,60}; nothing retrieved at all → still scored (zeros)
    val ranked = Seq(
      (1L, 10L, 1L), (1L, 99L, 2L), (1L, 98L, 3L), (1L, 20L, 4L), (1L, 97L, 5L),
      (2L, 77L, 1L), (2L, 78L, 2L),
      // rank 6 row must be ignored at k=5 even though it is relevant
      (1L, 30L, 6L)).toDF("query_id", "doc_id", "rank")
    val relevant = Seq((1L, 10L), (1L, 20L), (1L, 30L), (2L, 40L),
      (3L, 50L), (3L, 60L)).toDF("query_id", "doc_id")
    val got = Eval.rankingMetrics(ranked, relevant, k = 5)
      .as[(Long, Long, Long, Option[Long], Double, Double, Double, Double)]
      .collect().sortBy(_._1).toSeq
    val dcg = 1.0 / (math.log(2.0) / math.log(2.0)) + 1.0 / (math.log(5.0) / math.log(2.0))
    val idcg = 1.0 + 1.0 / (math.log(3.0) / math.log(2.0)) + 1.0 / 2.0
    val ndcg = math.rint(dcg / idcg * 10000) / 10000
    assert(got(0) == ((1L, 3L, 2L, Some(1L), 1.0, 0.4, 2.0 / 3.0, ndcg)))
    assert(got(1) == ((2L, 1L, 0L, None, 0.0, 0.0, 0.0, 0.0)))
    assert(got(2) == ((3L, 2L, 0L, None, 0.0, 0.0, 0.0, 0.0)))
  }

  test("generation pair stats match a hand-computed fixture") {
    import graft.operators.Eval
    // cand: [the cat sat on the mat], ref: [the cat on a mat]
    //   m1: the min(2,1)=1, cat 1, sat 0, on 1, mat 1      → 4 of c1=6, r1=5
    //   m2: only "the cat" overlaps                         → 1 of c2=5, r2=4
    //   m3/m4: nothing                                      → 0
    //   LCS: the,cat,on,mat                                 → 4
    val pairs = Seq(
      (1L, "the cat sat on the mat", "the cat on a mat"),
      (2L, "", "a b"),            // empty candidate
      (3L, " \t ", ""),           // whitespace-only vs empty
      (4L, "x y z", "x y z"))     // identical
      .toDF("doc_id", "cand", "ref")
    val got = Eval.generationPairStats(pairs)
      .as[(Long, Long, Long, Long, Long, Long, Long, Long, Long,
        Long, Long, Long, Long, Long, Long, Long)]
      .collect().sortBy(_._1).toSeq
    //            id cl rl m1 c1 r1 m2 c2 r2 m3 c3 r3 m4 c4 r4 lcs
    assert(got(0) == ((1L, 6L, 5L, 4L, 6L, 5L, 1L, 5L, 4L, 0L, 4L, 3L, 0L, 3L, 2L, 4L)))
    assert(got(1) == ((2L, 0L, 2L, 0L, 0L, 2L, 0L, 0L, 1L, 0L, 0L, 0L, 0L, 0L, 0L, 0L)))
    assert(got(2) == ((3L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L)))
    assert(got(3) == ((4L, 3L, 3L, 3L, 3L, 3L, 2L, 2L, 2L, 1L, 1L, 1L, 0L, 0L, 0L, 3L)))
    // the cap truncates both sides: 60-token cand against itself caps at 48
    val long = Seq((1L, Array.tabulate(60)(i => s"w$i").mkString(" ")))
      .toDF("doc_id", "t")
    val capped = Eval.generationPairStats(
      long.select($"doc_id", $"t".as("cand"), $"t".as("ref")))
      .select("cand_len", "ref_len", "m1", "lcs")
      .as[(Long, Long, Long, Long)].collect().head
    assert(capped == ((48L, 48L, 48L, 48L)))
  }

  test("corpus BLEU pools clipped counts; zero any-n precision zeroes it") {
    import graft.operators.Eval
    // two pairs pooled: m/c per n summed BEFORE the ratio (corpus BLEU),
    // cand 9 tokens vs ref 8 → bp = 1 (cand longer)
    val pairs = Seq(
      (1L, "a b c d", "a b c e"),
      (2L, "p q r s t", "p q r s")).toDF("doc_id", "cand", "ref")
    val stats = Eval.generationPairStats(pairs)
    val row = Eval.corpusBleu(stats)
      .select("n_pairs", "cand_tokens", "ref_tokens", "p1", "p2", "p3", "p4", "bp", "bleu")
      .as[(Long, Long, Long, Double, Double, Double, Double, Double, Double)]
      .collect().head
    // m1 = 3+4 = 7 of 9; m2 = 2+3 = 5 of 7; m3 = 1+2 of 5; m4 = 0+1 of 3
    assert(row._1 == 2L && row._2 == 9L && row._3 == 8L)
    assert(row._4 == 7.0 / 9.0 && row._5 == 5.0 / 7.0 &&
      row._6 == 3.0 / 5.0 && row._7 == 1.0 / 3.0)
    assert(row._8 == 1.0)
    val expBleu = math.floor(math.exp((math.log(7.0 / 9.0) + math.log(5.0 / 7.0) +
      math.log(3.0 / 5.0) + math.log(1.0 / 3.0)) / 4.0) * 10000 + 0.499999) / 10000
    assert(row._9 == expBleu)
    // a pair corpus with NO 4-gram overlap anywhere → bleu exactly 0,
    // and a shorter-than-ref candidate gets bp < 1
    val zero = Eval.corpusBleu(Eval.generationPairStats(
      Seq((1L, "a b c d", "d c b a e")).toDF("doc_id", "cand", "ref")))
      .select("bp", "bleu").as[(Double, Double)].collect().head
    assert(zero._2 == 0.0 && zero._1 ==
      math.floor(math.exp(1.0 - 5.0 / 4.0) * 10000 + 0.499999) / 10000)
  }

  test("chrF pair stats clip character n-grams; corpus chrF2 matches hand math") {
    import graft.operators.Eval
    // cand chars "abc", ref chars "abcd" (whitespace removed):
    //   n=1: 3 of 3 vs 4 | n=2: ab,bc of ab,bc,cd → 2 of 2 vs 3
    //   n=3: abc → 1 of 1 vs 2 | n=4: cand none, ref abcd → 0 of 0 vs 1
    val st = Eval.chrFPairStats(
      Seq((1L, "ab c", "abc d")).toDF("doc_id", "cand", "ref"))
      .drop("doc_id").as[(Long, Long, Long, Long, Long, Long, Long, Long,
        Long, Long, Long, Long, Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect().head
    assert(st == ((3L, 4L, 3L, 3L, 4L, 2L, 2L, 3L, 1L, 1L, 2L,
      0L, 0L, 1L, 0L, 0L, 0L, 0L, 0L, 0L)))
    val row = Eval.corpusChrF(Eval.chrFPairStats(
      Seq((1L, "ab c", "abc d")).toDF("doc_id", "cand", "ref")))
      .select("prec_avg", "rec_avg", "chrf2")
      .as[(Double, Double, Double)].collect().head
    val p = ((((1.0 + 1.0) + 1.0) + 0.0) + 0.0 + 0.0) / 6.0
    val r = ((((3.0 / 4.0 + 2.0 / 3.0) + 1.0 / 2.0) + 0.0) + 0.0 + 0.0) / 6.0
    assert(row == ((p, r, 5.0 * p * r / (4.0 * p + r))))
    // clipping respects multiplicity: "abab" vs "ab" → a,b clip to 1 each
    val st2 = Eval.chrFPairStats(
      Seq((1L, "abab", "ab")).toDF("doc_id", "cand", "ref"))
      .select("mc1", "cc1", "rc1", "mc2", "cc2", "rc2", "mc3", "cc3")
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)].collect().head
    assert(st2 == ((2L, 4L, 2L, 1L, 3L, 1L, 0L, 2L)))
  }

  test("memorization audit: seen share of generation shingles, Bloom-exact " +
      "at any fpp") {
    import graft.operators.Dedup
    val gens = Seq(
      (1L, Some("a b c d")),   // shingles {a b c, b c d}: first seen → 0.5
      (2L, Some("q r")),       // one short shingle, exact corpus line → 1.0
      (3L, Some("zz yy ww")),  // unseen anywhere → 0.0
      (4L, Option.empty[String])) // NULL text → restored 0-over-0 row
      .toDF("doc_id", "text")
    val corpus = Seq((10L, "x a b c y"), (11L, "q r")).toDF("doc_id", "text")
    val got = Dedup.memorizationScores(gens, corpus, n = 3)
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, 2L, 1L, 0.5), (2L, 1L, 1L, 1.0),
      (3L, 1L, 0L, 0.0), (4L, 0L, 0L, 0.0)))
    // the Bloom pre-filter never changes the output — only the exact
    // confirm decides; a sieve-like fpp must give identical rows
    val loose = Dedup.memorizationScores(gens, corpus, n = 3, fpp = 0.5)
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(loose == got)
  }

  test("pass@k: unbiased estimator from exact binomials, NULL under k samples") {
    import graft.operators.Eval
    // task A: n=4, c=2 → pass@1 = 1 − C(2,1)/C(4,1) = 0.5,
    //   pass@2 = 1 − C(2,2)/C(4,2) = 1 − 1/6, pass@4 = 1 − 0/1 = 1.0
    // task B: n=1, c=0 → pass@1 = 0.0, pass@2/4 undefined (NULL)
    // task C: n=3, c=3 → every k ≤ 3 scores 1.0 (C(0,k) = 0), pass@4 NULL
    val samples = (Seq(("A", 1), ("A", 1), ("A", 0), ("A", 0), ("B", 0)) ++
      Seq.fill(3)(("C", 1))).toDF("task_id", "correct")
    val got = Eval.passAtK(samples, ks = Seq(1, 2, 4))
      .as[(String, Long, Long, Option[Double], Option[Double], Option[Double])]
      .collect().sortBy(_._1).toSeq
    assert(got(0) == (("A", 4L, 2L, Some(0.5), Some(1.0 - 1.0 / 6.0), Some(1.0))))
    assert(got(1) == (("B", 1L, 0L, Some(0.0), None, None)))
    assert(got(2) == (("C", 3L, 3L, Some(1.0), Some(1.0), None)))
    // pass@n (k = n) is exactly "any sample correct"
    val all = Eval.passAtK(samples.filter($"task_id" === "A"), ks = Seq(4))
      .select("pass_at_4").as[Double].collect().head
    assert(all == 1.0)
  }

  test("span corruption: splice reconstruction, count identities, " +
      "fast == spec", SlowTest) {
    import graft.operators.TextAnalysis
    val d = docs.limit(150).select($"doc_id", $"text")
      .unionByName(Seq((90001L, ""), (90002L, " \t "),
        (90003L, "solo")).toDF("doc_id", "text"))
    val fast = TextAnalysis.spanCorruptFast(d)
    val spec = TextAnalysis.spanCorrupt(d)
    assert(fast.collect().toSet == spec.collect().toSet)
    val rows = fast.join(d, "doc_id")
      .select("inputs", "targets", "text", "n_spans", "n_corrupted", "n_tokens")
      .as[(String, String, String, Long, Long, Long)].collect()
    var corrupted = 0L
    rows.foreach { case (in, tg, text, nSpans, nCorr, nTok) =>
      val orig = Option(text).getOrElse("").trim.split("\\s+")
        .filter(_.nonEmpty).toSeq
      assert(nTok == orig.size)
      // parse targets into sentinel -> span
      val tgToks = tg.split(" ").filter(_.nonEmpty).toSeq
      val spans = scala.collection.mutable.Map[String, Vector[String]]()
      var cur: String = null
      tgToks.foreach { t =>
        if (t.startsWith("<extra_id_")) { cur = t; spans(cur) = Vector() }
        else spans(cur) = spans(cur) :+ t
      }
      assert(spans.size == nSpans && spans.values.map(_.size).sum == nCorr)
      // splicing the spans back at their sentinels reconstructs the doc
      val rebuilt = in.split(" ").filter(_.nonEmpty).toSeq
        .flatMap(t => if (t.startsWith("<extra_id_")) spans(t) else Seq(t))
      assert(rebuilt == orig, s"splice failed for: $text")
      corrupted += nCorr
    }
    // the default operating point corrupts a nontrivial share (~18%)
    val total = rows.map(_._6).sum
    assert(corrupted > total / 10 && corrupted < total / 2)
  }

  test("FIM transform: PSM reassembly reconstructs every selected doc", SlowTest) {
    import graft.operators.TextAnalysis
    val d = docs.limit(200).select($"doc_id", $"text")
      .unionByName(Seq((90001L, ""), (90002L, "one"))
        .toDF("doc_id", "text"))
    val rows = TextAnalysis.fimTransform(d).join(d, "doc_id")
      .select("fim_text", "is_fim", "text", "n_prefix", "n_middle", "n_suffix")
      .as[(String, Boolean, String, Long, Long, Long)].collect()
    var fims = 0
    rows.foreach { case (ft, isFim, text, np, nm, ns) =>
      val orig = Option(text).getOrElse("").trim.split("\\s+")
        .filter(_.nonEmpty).toSeq
      if (!isFim) {
        assert(ft == orig.mkString(" ") && np == orig.size && nm == 0 && ns == 0)
      } else {
        fims += 1
        assert(np + nm + ns == orig.size)
        // parse the PSM serialization back into P/S/M and reassemble
        val t = ft.split(" ").filter(_.nonEmpty).toSeq
        assert(t.head == "<fim_prefix>")
        val si = t.indexOf("<fim_suffix>")
        val mi = t.indexOf("<fim_middle>")
        val p = t.slice(1, si)
        val s2 = t.slice(si + 1, mi)
        val m = t.drop(mi + 1)
        assert(p.size == np && m.size == nm && s2.size == ns)
        assert((p ++ m ++ s2) == orig, s"PSM reassembly failed: $text")
      }
    }
    // the 50% gate selects a nontrivial share of the 202 docs
    assert(fims > 60 && fims < 140)
  }

  test("credit-card audit: the Luhn gate separates cards from digit noise") {
    val d = Seq(
      (1L, "pay 4111111111111111 today"),                     // valid Visa
      (2L, "ref 4111111111111112 nope"),                      // bad check digit
      (3L, "card 5500 0000 0000 0004 and 3782-822463-10005"), // MC + Amex
      (4L, "order 123456789012 and 12345678901234567890 x"),  // 12 + 20 digits
      (5L, "")).toDF("doc_id", "text")
    val got = TextAnalysis.ccAudit(d)
      .as[(Long, Long, Long, Boolean)].collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, 1L, 1L, true), (2L, 1L, 0L, false),
      (3L, 2L, 2L, true), (4L, 0L, 0L, false), (5L, 0L, 0L, false)))
  }

  test("audio VAD: planted silence segments land exactly, undecodable " +
      "rows emit the sentinel span") {
    import graft.operators.Multimodal
    // docId 0: rate 8000, mono, 64 frames; silence gate q1=16, q2=32 —
    // with win=8: windows 0–1 speech, 2–3 silent (zeroed exactly), 4–7
    // speech → three spans with closed-form extents
    val media = Multimodal.synthesizeAudioSilence(spark,
      Seq(0L).toDF("doc_id")).toDF()
    val got = Multimodal.vadSegments(spark, media, win = 8,
        thrMeanSq = 1000000L)
      .select(col("doc_id"), col("span"), col("is_speech"),
        col("start_sample"), col("n_samples"), col("sum_sq"), col("start_ms"))
      .as[(Long, Long, Boolean, Long, Long, Long, Long)]
      .collect().sortBy(_._2).toSeq
    assert(got.length == 3, s"got $got")
    assert(got.map(g => (g._2, g._3, g._4, g._5, g._7)) == Seq(
      (0L, true, 0L, 16L, 0L),
      (1L, false, 16L, 16L, 2L),
      (2L, true, 32L, 32L, 4L)), s"got $got")
    assert(got(1)._6 == 0L && got(0)._6 > 0L && got(2)._6 > 0L)
    // a window-boundary-free gate: docId 1 jitters the span edges by 1 —
    // the mixed boundary windows classify by energy, spans still 3
    val jit = Multimodal.vadSegments(spark,
        Multimodal.synthesizeAudioSilence(spark, Seq(1L).toDF("doc_id")).toDF(),
        win = 8, thrMeanSq = 1000000L)
      .select(col("is_speech")).as[Boolean].collect().toSeq
    assert(jit.length == 3 && jit == Seq(true, false, true), s"jit $jit")
    // garbage bytes → the −1 sentinel row, never a stage failure
    val bad = Seq((9L, Array[Byte](1, 2, 3), "audio/wav"))
      .toDF("doc_id", "media", "mime")
    val sentinel = Multimodal.vadSegments(spark, bad, 8, 1000000L)
      .as[(Long, Long, Boolean, Long, Long, Long, Long)].collect().toSeq
    assert(sentinel == Seq((9L, -1L, false, -1L, -1L, -1L, -1L)))
  }

  test("distinct-n: hand-counted ratios, empty orders keep NULL-ratio rows") {
    import graft.operators.Eval
    // corpus "a b a", "a b": 1-grams a,b,a,a,b → 5 total, 2 distinct;
    // 2-grams "a b","b a","a b" → 3 total, 2 distinct; 3-grams "a b a"
    // → 1 total, 1 distinct
    val got = Eval.distinctNgramRatio(
        Seq("a b a", "a b").toDF("cand"), maxN = 4)
      .as[(Long, Long, Long, Option[Double])].collect().sortBy(_._1).toSeq
    assert(got == Seq(
      (1L, 5L, 2L, Some(0.4)),
      (2L, 3L, 2L, Some(2.0 / 3.0)),
      (3L, 1L, 1L, Some(1.0)),
      (4L, 0L, 0L, None)), s"got $got")
    // a maximally repetitive corpus collapses the ratio
    val rep = Eval.distinctNgramRatio(
        Seq.fill(10)("x x x x").toDF("cand"), maxN = 2)
      .as[(Long, Long, Long, Option[Double])].collect().sortBy(_._1).toSeq
    assert(rep == Seq((1L, 40L, 1L, Some(0.025)),
      (2L, 30L, 1L, Some(1.0 / 30.0))), s"rep $rep")
  }

  test("multi-reference BLEU stats: max-over-refs clipping, closest-ref " +
      "brevity length, single-ref consistency") {
    import graft.operators.Eval
    val pairs = Seq(
      // m1: a,b,c all ceilinged 1 → 3; m2: {a b}∈r1, {b c}∈r2 → 2;
      // ref lens 3 and 2 vs cand 3 → closest 3
      (1L, "a b c", Seq("a b d", "b c")),
      // repeated-gram ceiling: cand a×2, refs ceilings max(1, 3)=3 → m1=2;
      // ref lens 1, 3 vs cand 2: diffs 1,1 → tie → SHORTER → 1
      (2L, "a a", Seq("a", "a a a")),
      // empty refs array: ref_len 0, zero matches
      (3L, "x y", Seq.empty[String]),
      // NULL ref element coalesces to ""
      (4L, "p q", Seq(null.asInstanceOf[String], "p q")))
      .toDF("doc_id", "cand", "refs")
    val got = Eval.generationPairStatsMultiRef(pairs, maxN = 2)
      .as[(Long, Long, Long, Long, Long, Long, Long)]
      .collect().sortBy(_._1).toSeq
    assert(got == Seq(
      (1L, 3L, 3L, 3L, 3L, 2L, 2L),
      (2L, 2L, 1L, 2L, 2L, 1L, 1L),
      (3L, 2L, 0L, 0L, 2L, 0L, 1L),
      (4L, 2L, 2L, 2L, 2L, 1L, 1L)), s"got $got")
    // one ref ≡ the single-ref stats (m/c and ref_len agree row for row)
    val d = docs.limit(60).selectExpr("doc_id", "text AS cand",
      "substr(text, 8) AS ref")
    val single = Eval.generationPairStatsFast(d)
      .select("doc_id", "cand_len", "ref_len", "m1", "c1", "m2", "c2",
        "m3", "c3", "m4", "c4").collect().toSet
    val multi = Eval.generationPairStatsMultiRef(
        d.select(col("doc_id"), col("cand"), array(col("ref")).as("refs")))
      .collect().toSet
    assert(multi == single)
  }

  test("VAD speech ratio: voiced fraction is exact; undecodable docs " +
      "report zero spans with NULL ratio") {
    import graft.operators.Multimodal
    // docId 0 (64 samples, silence k∈[16,32)): speech 48/64 = 0.75, 3 spans
    val media = Multimodal.synthesizeAudioSilence(spark,
      Seq(0L).toDF("doc_id")).toDF()
    val got = Multimodal.vadSpeechRatio(spark, media, win = 8,
        thrMeanSq = 1000000L)
      .as[(Long, Long, Long, Long, Option[Double])].collect().head
    assert(got == (0L, 3L, 48L, 64L, Some(0.75)), s"got $got")
    val bad = Seq((9L, Array[Byte](1, 2, 3), "audio/wav"))
      .toDF("doc_id", "media", "mime")
    val sentinel = Multimodal.vadSpeechRatio(spark, bad, 8, 1000000L)
      .as[(Long, Long, Long, Long, Option[Double])].collect().head
    assert(sentinel == (9L, 0L, 0L, 0L, None), s"got $sentinel")
  }

  test("paired mean randomization: brute-force hash replay, identical " +
      "scores give p = 1, swap symmetry") {
    import graft.operators.{Eval, Sampling}
    val seed = 5L
    val rr = 16
    val pairs = Seq((1L, 10L, 7L), (2L, 4L, 9L), (3L, 8L, 8L), (4L, 2L, 1L))
    val got = Eval.pairedMeanSignificance(
        pairs.toDF("doc_id", "score_a", "score_b"), resamples = rr,
        seed = seed)
      .as[(Long, Double, Double, Double, Long, Double)].collect().head
    // driver replay of the EXACT hash enumeration the operator runs
    def flip(id: Long, r: Long): Boolean =
      Math.floorMod(Sampling.hashRawLong(
        Sampling.hashRawLong(id, seed) + r, seed * 31 + 7), 2L) == 1L
    val dObs = pairs.map(p => p._2 - p._3).sum
    val ge = (1 to rr).count { r =>
      val d = pairs.map(p =>
        if (flip(p._1, r.toLong)) p._3 - p._2 else p._2 - p._3).sum
      math.abs(d) >= math.abs(dObs)
    }
    val expP = (ge + 1).toDouble / (rr + 1).toDouble
    assert(got._1 == 4L && got._4 == dObs.toDouble / 4.0 && got._6 == expP,
      s"got $got expected p $expP")
    // identical scores: every |D_r| = 0 = |D_obs| → p = 1
    val self = Eval.pairedMeanSignificance(
        pairs.map(p => (p._1, p._2, p._2)).toDF("doc_id", "score_a", "score_b"),
        resamples = rr, seed = seed)
      .as[(Long, Double, Double, Double, Long, Double)].collect().head
    assert(self._4 == 0.0 && self._6 == 1.0)
    // swapping systems negates diff, keeps p
    val ba = Eval.pairedMeanSignificance(
        pairs.map(p => (p._1, p._3, p._2)).toDF("doc_id", "score_a", "score_b"),
        resamples = rr, seed = seed)
      .as[(Long, Double, Double, Double, Long, Double)].collect().head
    assert(ba._4 == -got._4 && ba._6 == got._6 &&
      ba._2 == got._3 && ba._3 == got._2)
  }

  test("byte-level BPE distributed and batched learners match the " +
      "driver-local loop") {
    val d = Seq((1L, "ab ab x9"), (2L, "ab x9 €"), (3L, "aaa"))
      .toDF("doc_id", "text")
    val local = TextAnalysis.bbpeLearnMerges(d, 8)
      .as[(Long, String, String, Long)].collect().toSeq
    val dist = TextAnalysis.bbpeLearnMergesDistributed(d, 8)
      .as[(Long, String, String, Long)].collect().toSeq
    assert(dist == local, s"dist=$dist local=$local")
    // batchK = 1 batched ≡ the serial argmax sequence (ranks renamed to
    // (batch, rank_in_batch) — compare the merge/count sequence)
    val b1 = TextAnalysis.bbpeLearnMergesBatched(d, batchRounds = 6, batchK = 1)
      .orderBy("batch").as[(Long, Long, String, String, Long)]
      .collect().toSeq.map(r => (r._3, r._4, r._5))
    assert(b1 == local.map(r => (r._2, r._3, r._4)), s"b1=$b1")
  }

  test("DCT pHash separates gradient scenes aHash provably collapses on, " +
      "while rescale near-dups stay within 3 bits") {
    // docs 2k/2k+1 render scene gid=k at 16×16 and 24×16. Scenes 206, 356
    // and 268 were found by exhaustive search over the 405-scene family:
    // ALL SIX renders share the single aHash 0xfefcf8f0e0c08000 (the
    // half-plane mask every near-planar diagonal gradient collapses to —
    // the r14 fixture lesson), while their DCT pHashes differ by 31/31/10
    // bits between scenes and ≤2 bits between sizes of the same scene.
    val scenes = Seq(206L, 356L, 268L)
    val ids = scenes.flatMap(g => Seq(g * 2, g * 2 + 1))
    val media = Multimodal.synthesizeImagesGradient(spark,
      ids.toDF("doc_id")).toDF()
    val ah = Multimodal.imageAHash(spark, media).collect().toMap
    val ph = Multimodal.imagePHashDct(spark, media).collect().toMap
    assert(ah.values.toSet == Set(0xfefcf8f0e0c08000L), s"ah=$ah")
    def pop(x: Long) = java.lang.Long.bitCount(x)
    for (a <- scenes; b <- scenes if a < b)
      assert(pop(ph(a * 2) ^ ph(b * 2)) >= 10,
        s"scenes $a/$b not separated: ${ph(a * 2)} ${ph(b * 2)}")
    scenes.foreach(g => assert(pop(ph(g * 2) ^ ph(g * 2 + 1)) <= 3,
      s"scene $g unstable across rescale"))
    // wired into the banded hamming join: EXACTLY the 3 planted rescale
    // pairs come back, no false merges — the aHash tier would return all
    // 15 pairs here
    val pairs = Dedup.hammingPairs(
        Multimodal.imagePHashDct(spark, media).toDF("id", "sig"), 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == scenes.map(g => (g * 2, g * 2 + 1)).toSet, s"pairs=$pairs")
    val aPairs = Dedup.hammingPairs(
        Multimodal.imageAHash(spark, media).toDF("id", "sig"), 3)
      .collect()
    assert(aPairs.length == 15, s"aHash should false-merge all pairs")
  }

  test("char-trigram language id separates pt from es where the stopword " +
      "tier cannot, with exact scores and und fallback") {
    val d = Seq(
      (1L, "a canção dos meninos não era uma ilusão mas um sonho"),
      (2L, "la canción de los niños era una ilusión y el sueño"),
      (3L, "zzz qqq xxx"),
      (4L, "die kinder singen ein schönes lied und lachen nicht"))
      .toDF("doc_id", "text")
    val ng = TextAnalysis.langIdNgram(d).orderBy("doc_id")
      .as[(Long, String, Long)].collect().toSeq
    assert(ng.map(r => (r._1, r._2)) ==
      Seq((1L, "pt"), (2L, "es"), (3L, "und"), (4L, "de")), s"ng=$ng")
    assert(ng(2)._3 == 0L) // zero profile hits -> defined zero score
    assert(ng(0)._3 > 0L && ng(1)._3 > 0L)
    // the stopword tier MISLABELS the Portuguese doc as English — its only
    // stopword hit is "a"; pt shares its real stopwords with no list
    val st = TextAnalysis.langIdByJoin(d).orderBy("doc_id")
      .as[(Long, String)].collect().toSeq
    assert(st.head == ((1L, "en")), s"st=$st")
    assert(st(1) == ((2L, "es"))) // both tiers agree on the Spanish doc
  }

  test("GPT-2 pretokenizer: hand-computed goldens on every whitespace-run " +
      "shape, contractions, digit and punctuation runs") {
    def pt(s: String): Seq[String] = Seq((1L, s)).toDF("doc_id", "text")
      .select(TextAnalysis.gpt2Pretokens(col("text")).as("t"))
      .as[Seq[String]].collect().head
    // the lookahead semantics: an interior run of n whitespace chars keeps
    // n-1 as one token; the last char attaches to the next token iff it is
    // a literal space
    assert(pt("a  b") == Seq("a", " ", " b"))
    assert(pt("a   b") == Seq("a", "  ", " b"))
    assert(pt("a\t\tb") == Seq("a", "\t", "\t", "b"))
    assert(pt("x\n\n\ny") == Seq("x", "\n\n", "\n", "y"))
    assert(pt("x \ty") == Seq("x", " ", "\t", "y"))
    assert(pt("x\n y") == Seq("x", "\n", " y"))
    assert(pt("x \t\n y") == Seq("x", " \t\n", " y"))
    assert(pt("  leading") == Seq(" ", " leading"))
    assert(pt(" leading") == Seq(" leading"))
    assert(pt("trail   ") == Seq("trail", "   "))
    assert(pt("   ") == Seq("   "))
    // contractions split case-sensitively; capital 'T falls to punct + word
    assert(pt("isn't won't it'll we're I've I'm he'd") ==
      Seq("isn", "'t", " won", "'t", " it", "'ll", " we", "'re",
        " I", "'ve", " I", "'m", " he", "'d"))
    assert(pt("ISN'T") == Seq("ISN", "'", "T"))
    // letter/digit/punct runs with the one-leading-space attachment
    assert(pt("abc123def") == Seq("abc", "123", "def"))
    assert(pt("$100 12.5%") == Seq("$", "100", " 12", ".", "5", "%"))
    assert(pt("café 123") == Seq("café", " 123"))
    assert(pt("") == Seq.empty)
  }

  test("GPT-2 byte-level BPE: a space-prefixed merge wins a learn round, " +
      "and apply counts pretokens") {
    // vocab: "aa" ×1, " aa" ×3. Round 1: (61,61) count 4 beats (20,61)
    // count 3. Round 2: the SPACE-PREFIXED pair (20,6161) count 3 wins —
    // the Ġ-convention merge whitespace-split bbpe can never represent.
    val d = Seq((1L, "aa aa aa aa")).toDF("doc_id", "text")
    val merges = TextAnalysis.bbpeLearnMergesGpt2(d, 2)
      .as[(Long, String, String, Long)].collect().toSeq
    assert(merges == Seq((1L, "61", "61", 4L), (2L, "20", "6161", 3L)),
      s"merges=$merges")
    // apply: n_tokens counts PRETOKENS (4: "aa" + three " aa"), each fully
    // merged to one piece
    val mt = merges.map(m => (m._2, m._3))
    val applied = TextAnalysis
      .bbpeEncodedCounts(d, mt, gpt2 = true)
      .as[(Long, Long, Long)].collect().head
    assert(applied == ((1L, 4L, 4L)), s"applied=$applied")
    // ids: merge ids 0 ("6161") and 1 ("206161"... rank-2 merge), byte ids
    // from merges.size=2: "aa" → [0]; " aa" → [1]
    val ids = TextAnalysis.bbpeTokenIds(d, mt, gpt2 = true)
      .orderBy("pos").as[(Long, Long, Long)].collect().toSeq
    assert(ids == Seq((1L, 0L, 0L), (1L, 1L, 1L), (1L, 2L, 1L), (1L, 3L, 1L)),
      s"ids=$ids")
    // whitespace pretokens participate in learning: a "\n\n"-heavy corpus
    // learns the newline-pair merge first (0A,0A)
    val nl = Seq((1L, "p\n\n\nq\n\n\nr")).toDF("doc_id", "text")
    val m1 = TextAnalysis.bbpeLearnMergesGpt2(nl, 1)
      .as[(Long, String, String, Long)].collect().head
    assert(m1 == ((1L, "0A", "0A", 2L)), s"m1=$m1")
  }

  test("McNemar: hand-computed discordant counts, degenerate and empty inputs") {
    import graft.operators.Eval
    val rows = Seq.fill(3)((true, true)) ++ Seq.fill(4)((true, false)) ++
      Seq((false, true)) ++ Seq.fill(2)((false, false))
    val got = Eval.mcnemar(rows.toDF("correct_a", "correct_b"))
      .as[(Long, Long, Long, Long, Long, Option[Double])].collect().head
    // chi2 = (|4−1|−1)²/(4+1) = 4/5
    assert(got == (10L, 2L, 1L, 4L, 3L, Some(0.8)))
    // no discordant pairs → chi2 undefined (NULL), never 0/0
    val agree = Eval.mcnemar(Seq((true, true), (false, false))
      .toDF("correct_a", "correct_b"))
      .as[(Long, Long, Long, Long, Long, Option[Double])].collect().head
    assert(agree == (2L, 1L, 0L, 0L, 1L, None))
    // empty input → the zero-count row, not NULLs
    val empty = Eval.mcnemar(
      Seq.empty[(Boolean, Boolean)].toDF("correct_a", "correct_b"))
      .as[(Long, Long, Long, Long, Long, Option[Double])].collect().head
    assert(empty == (0L, 0L, 0L, 0L, 0L, None))
    // |n10−n01| = 1 → corrected numerator floors at 0, chi2 = 0
    val one = Eval.mcnemar(Seq((true, false), (false, true), (true, false))
      .toDF("correct_a", "correct_b"))
      .as[(Long, Long, Long, Long, Long, Option[Double])].collect().head
    assert(one._6 == Some(0.0))
  }

  test("paired randomization: identical systems give p = 1, swapping " +
      "systems negates delta and keeps p; observed BLEUs match corpusBleu") {
    import graft.operators.Eval
    val d = docs.limit(80).select(col("doc_id"), col("text"))
    val ref = TextAnalysis.wordDropout(d, dropPct = 10, seed = 42)
      .select(col("doc_id"), col("text_aug").as("ref"))
    def stats(pct: Int, seed: Long) = Eval.generationPairStatsFast(
      TextAnalysis.wordDropout(d, dropPct = pct, seed = seed)
        .select(col("doc_id"), col("text_aug").as("cand"))
        .join(ref, Seq("doc_id")))
    val sa = stats(15, 7).cache()
    val sb = stats(25, 13).cache()
    def run(x: org.apache.spark.sql.DataFrame,
        y: org.apache.spark.sql.DataFrame)
        : (Long, Double, Double, Double, Long, Double) =
      Eval.pairedBleuSignificance(x, y, resamples = 99, seed = 5)
        .as[(Long, Double, Double, Double, Long, Double)].collect().head
    // A vs A: every resample has delta 0 = |observed| → p = (99+1)/(99+1)
    val self = run(sa, sa)
    assert(self._4 == 0.0 && self._6 == 1.0, s"self=$self")
    // A vs B / B vs A: same flips, arms swapped — delta negates, p equal
    val ab = run(sa, sb)
    val ba = run(sb, sa)
    assert(ab._2 == ba._3 && ab._3 == ba._2, s"ab=$ab ba=$ba")
    assert(ab._4 == -ba._4 && ab._6 == ba._6, s"ab=$ab ba=$ba")
    // the observed BLEUs are corpusBleu's round-4 numbers exactly
    val ca = Eval.corpusBleu(sa).select("bleu").as[Double].collect().head
    val cb = Eval.corpusBleu(sb).select("bleu").as[Double].collect().head
    assert(ab._2 == ca && ab._3 == cb, s"ab=$ab ca=$ca cb=$cb")
    sa.unpersist(); sb.unpersist()
  }

  test("byte-level BPE: learn/apply/ids over UTF-8 bytes, no gate, no OOV") {
    // ab×3, x9×2, €×1 (E2 82 AC — one multi-byte token), aaa×1 (overlap:
    // left-to-right non-overlapping application must give [6161, 61])
    val d = Seq((1L, "ab ab x9"), (2L, "ab x9 €"), (3L, "aaa"))
      .toDF("doc_id", "text")
    val merges = TextAnalysis.bbpeLearnMerges(d, 8)
      .as[(Long, String, String, Long)].collect().toSeq
    // hand replay: r1 (61,62)=3; r2 tie at 2 → lhs asc picks (61,61) over
    // (78,39); r3 (78,39)=2; r4 three singles tie → "6161" < "82" < "E2";
    // r5 (82,AC); r6 (E2,82AC); r7 exhausts (early stop — 6 rows, not 8)
    assert(merges == Seq(
      (1L, "61", "62", 3L), (2L, "61", "61", 2L), (3L, "78", "39", 2L),
      (4L, "6161", "61", 1L), (5L, "82", "AC", 1L), (6L, "E2", "82AC", 1L)))
    val mt = merges.map { case (_, l, r, _) => (l, r) }
    // full table: every token collapses to ONE piece — no OOV branch,
    // multi-byte € included
    val applied = TextAnalysis.bbpeEncodedCounts(d, mt)
      .as[(Long, Long, Long)].collect().toSet
    assert(applied == Set((1L, 3L, 3L), (2L, 3L, 3L), (3L, 1L, 1L)))
    // truncated table (first 2 merges): x9 stays 2 bytes, € stays 3
    val applied2 = TextAnalysis.bbpeEncodedCounts(d, mt.take(2))
      .as[(Long, Long, Long)].collect().toSet
    assert(applied2 == Set((1L, 3L, 4L), (2L, 3L, 6L), (3L, 1L, 2L)))
    // native fast path == chained-replace spec, both tables
    for (m <- Seq(mt, mt.take(2), Seq.empty[(String, String)])) {
      val spec = TextAnalysis.bbpeEncodedCounts(d, m).collect().toSet
      val fast = TextAnalysis.bbpeEncodedCountsFast(d, m).collect().toSet
      assert(fast == spec, s"fast != spec under ${m.size} merges")
    }
    // ids: merge rank r → r−1, bytes at R+b; dense per-doc positions
    val ids = TextAnalysis.bbpeTokenIds(d, mt)
      .as[(Long, Long, Long)].collect().toSet
    assert(ids == Set((1L, 0L, 0L), (1L, 1L, 0L), (1L, 2L, 2L),
      (2L, 0L, 0L), (2L, 1L, 2L), (2L, 2L, 5L), (3L, 0L, 3L)))
    // byte ids are FIXED: under the EMPTY table "x9" is [6+0x78... no —
    // 0+0x78, 0+0x39] (R=0): any corpus, stable ids, no learned char vocab
    val rawIds = TextAnalysis.bbpeTokenIds(
        Seq((9L, "x9")).toDF("doc_id", "text"), Nil)
      .as[(Long, Long, Long)].collect().toSet
    assert(rawIds == Set((9L, 0L, 0x78L), (9L, 1L, 0x39L)))
  }

  test("generation-eval fast paths equal the fold specs row for row " +
      "(corpus + ws edges + astral)", SlowTest) {
    import graft.operators.Eval
    // real corpus pairs (different-seed dropouts) + hand edges: empty,
    // whitespace-only, identical, disjoint, repeated grams, astral text
    // (code-point contract: 𐐷 must count one char on both paths)
    val corpus = docs.limit(120).selectExpr("doc_id",
      "text AS cand", "substr(text, 8) AS ref")
    val edges = Seq(
      (9001L, "", "a b"), (9002L, " \t ", ""), (9003L, "x y z", "x y z"),
      (9004L, "q w", "e r t"), (9005L, "a a a b", "a b a"),
      (9006L, "𐐷b c", "𐐷b d"),
      (9007L, "naïve café", "naive cafe"),
      // NULL text coalesces to "" on BOTH paths (ADVICE r15: the spec
      // folds used to propagate NULL where the natives emitted zeros)
      (9008L, null, "a b"), (9009L, "a b", null), (9010L, null, null))
      .toDF("doc_id", "cand", "ref")
    for (pairs <- Seq(corpus, edges)) {
      val spec = Eval.generationPairStats(pairs).collect().toSet
      val fast = Eval.generationPairStatsFast(pairs).collect().toSet
      assert(fast == spec)
      val cSpec = Eval.chrFPairStats(pairs).collect().toSet
      val cFast = Eval.chrFPairStatsFast(pairs).collect().toSet
      assert(cFast == cSpec)
      val wSpec = Eval.werStats(pairs).collect().toSet
      val wFast = Eval.werStatsFast(pairs).collect().toSet
      assert(wFast == wSpec)
    }
  }

  test("best-of-n: expected max of a random k-subset, exact coefficients") {
    import graft.operators.Eval
    // scores {1,3,5}: k=1 → mean 3; k=2 → ({1,3}→3 + {1,5}→5 + {3,5}→5)/3
    // = 13/3; k=3 → the max, 5; k=4 → NULL (n < k)
    val samples = Seq(("T", 1L), ("T", 3L), ("T", 5L))
      .toDF("task_id", "score")
    val got = Eval.bestOfN(samples, ks = Seq(1, 2, 3, 4))
      .as[(String, Long, Option[Double], Option[Double], Option[Double],
        Option[Double])].collect().head
    assert(got == (("T", 3L, Some(3.0), Some(13.0 / 3.0), Some(5.0), None)))
  }

  test("WER: full token-Levenshtein DP, NULL on empty reference") {
    import graft.operators.Eval
    // "a b c" vs "a x c": one substitution → 1/3
    // "a b" vs "a b c d": two insertions → 2/4
    // "a b c" vs "": distance 3, wer NULL (undefined)
    // "" vs "a b": distance 2, wer 1.0
    // kitten/sitting classic: distance 3 over 1-token... use word-level:
    // "k i t t e n" vs "s i t t i n g" → 3 subs/ins → 3/7
    val pairs = Seq(
      (1L, "a b c", "a x c"),
      (2L, "a b", "a b c d"),
      (3L, "a b c", ""),
      (4L, "", "a b"),
      (5L, "k i t t e n", "s i t t i n g")).toDF("doc_id", "cand", "ref")
    val got = Eval.werStats(pairs)
      .as[(Long, Long, Long, Long, Option[Double])].collect().sortBy(_._1).toSeq
    assert(got == Seq(
      (1L, 3L, 3L, 1L, Some(1.0 / 3.0)),
      (2L, 2L, 4L, 2L, Some(0.5)),
      (3L, 3L, 0L, 3L, None),
      (4L, 0L, 2L, 2L, Some(1.0)),
      (5L, 6L, 7L, 3L, Some(3.0 / 7.0))))
  }

  test("Kendall tau: inversion fold over the a-rank order") {
    import graft.operators.Eval
    // q1: b-ranks in a-order = [2,1,3] → D=1, C−D = 1, τ = 1/3
    // q2: full reversal → τ = −1 | q3: identical → τ = 1
    // q4: single common item → τ undefined (NULL)
    val a = Seq((1L, 10L, 1L), (1L, 11L, 2L), (1L, 12L, 3L),
      (2L, 10L, 1L), (2L, 11L, 2L), (2L, 12L, 3L),
      (3L, 10L, 1L), (3L, 11L, 2L),
      (4L, 10L, 1L)).toDF("query_id", "doc_id", "rank")
    val b = Seq((1L, 10L, 2L), (1L, 11L, 1L), (1L, 12L, 3L),
      (2L, 10L, 3L), (2L, 11L, 2L), (2L, 12L, 1L),
      (3L, 10L, 1L), (3L, 11L, 2L),
      (4L, 10L, 1L)).toDF("query_id", "doc_id", "rank")
    val got = Eval.kendallTau(a, b)
      .as[(Long, Long, Long, Option[Double])].collect().sortBy(_._1).toSeq
    assert(got == Seq(
      (1L, 3L, 1L, Some(1.0 / 3.0)),
      (2L, 3L, -3L, Some(-1.0)),
      (3L, 2L, 1L, Some(1.0)),
      (4L, 1L, 0L, None)))
  }

  test("DPO pairs: struct-min argmax/argmin, low-margin prompts dropped") {
    import graft.operators.Preference
    // T1: best 9 (tie 2 vs 3 → id 2), worst 1 (id 4), margin 8
    // T2: all-equal scores → margin 0 → dropped (chosen would = rejected)
    // T3: single sample → margin 0 → dropped
    val samples = Seq(("T1", 1L, 5L), ("T1", 2L, 9L), ("T1", 3L, 9L),
      ("T1", 4L, 1L), ("T2", 5L, 7L), ("T2", 6L, 7L), ("T3", 7L, 3L))
      .toDF("task_id", "sample_id", "score")
    val got = Preference.dpoPairs(samples, minMargin = 1)
      .as[(String, Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(("T1", 2L, 4L, 9L, 1L, 8L, 4L)))
    // margin gate: at minMargin = 9 even T1 drops
    assert(Preference.dpoPairs(samples, minMargin = 9).count() == 0)
  }

  test("calibration bins + ECE: midpoint gaps, bin-ordered weighted fold") {
    import graft.operators.Eval
    // bin 0: 2 preds, 0 correct | bin 5: 1 pred, 0 | bin 9: 2 preds, 2;
    // conf = 1.0 must clamp into the top bin
    val preds = Seq((0.05, false), (0.05, false), (0.55, false),
      (0.95, true), (1.0, true)).toDF("conf", "label")
    val cb = Eval.calibrationBins(preds, bins = 10)
      .as[(Long, Long, Long, Double, Double, Double)]
      .collect().sortBy(_._1).toSeq
    val g0 = math.abs(0.0 - 1.0 / 20.0)
    val g5 = math.abs(0.0 - 11.0 / 20.0)
    val g9 = math.abs(1.0 - 19.0 / 20.0)
    assert(cb == Seq(
      (0L, 2L, 0L, 0.0, 1.0 / 20.0, g0),
      (5L, 1L, 0L, 0.0, 11.0 / 20.0, g5),
      (9L, 2L, 2L, 1.0, 19.0 / 20.0, g9)))
    val got = Eval.ece(preds, bins = 10)
      .as[(Long, Double)].collect().head
    assert(got == ((5L, (((0.0 + 2.0 * g0) + 1.0 * g5) + 2.0 * g9) / 5.0)))
  }

  test("majority vote: modal answer with smallest-answer tie-break") {
    import graft.operators.Eval
    // A: [1,1,2] gold 1 → modal 1 ×2, consensus 2/3, correct
    // B: [2,2,1,1] gold 1 → 2-2 tie breaks to answer 1 → correct
    // C: [3] gold 0 → modal 3, wrong
    val samples = Seq(("A", 1L, 1L), ("A", 1L, 1L), ("A", 2L, 1L),
      ("B", 2L, 1L), ("B", 2L, 1L), ("B", 1L, 1L), ("B", 1L, 1L),
      ("C", 3L, 0L)).toDF("task_id", "answer", "gold")
    val got = Eval.majorityVote(samples)
      .as[(String, Long, Long, Long, Double, Boolean)]
      .collect().sortBy(_._1).toSeq
    assert(got == Seq(
      ("A", 3L, 1L, 2L, 2.0 / 3.0, true),
      ("B", 4L, 1L, 2L, 0.5, true),
      ("C", 1L, 3L, 1L, 1.0, false)))
  }

  test("Welch A/B: hand-computed t and Satterthwaite df, degenerate NULLs") {
    import graft.operators.Eval
    // g1: a = {10, 14} (mean 12, var 8), b = {20, 20, 26} (mean 22,
    // var 12) → se² = 4 + 4, t = −10/√8, df = 64/24
    // g2: single-sample arm a → t/df NULL, means still reported
    // g3: only arm a present → dropped (no comparison to make)
    val d = Seq(
      ("g1", "a", 10L), ("g1", "a", 14L),
      ("g1", "b", 20L), ("g1", "b", 20L), ("g1", "b", 26L),
      ("g2", "a", 7L), ("g2", "b", 5L), ("g2", "b", 9L),
      ("g3", "a", 1L), ("g3", "a", 2L))
      .toDF("metric", "arm", "value")
    val got = Eval.abWelch(d)
      .as[(String, Long, Long, Double, Double, Double, Option[Double],
        Option[Double], Option[Double], Option[Double])]
      .collect().sortBy(_._1).toSeq
    val t1 = -10.0 / math.sqrt(4.0 + 4.0)
    val df1 = (4.0 + 4.0) * (4.0 + 4.0) /
      (4.0 * 4.0 / 1.0 + 4.0 * 4.0 / 2.0)
    assert(got == Seq(
      ("g1", 2L, 3L, 12.0, 22.0, -10.0, Some(8.0), Some(12.0),
        Some(t1), Some(df1)),
      ("g2", 1L, 2L, 7.0, 7.0, 0.0, None, Some(8.0), None, None)))
  }

  test("AUC: Mann-Whitney average-rank identity, exact to one division") {
    import graft.operators.Eval
    // pos scores {3, 2}, neg {1, 2}: ranks 1, 2.5, 2.5, 4 →
    // Σranks⁺ = 6.5, AUC = (6.5 − 3)/4 = 0.875 (pairwise: 3 wins + ½ tie)
    val d = Seq((3L, true), (2L, true), (1L, false), (2L, false))
      .toDF("score", "label")
    val got = Eval.aucRoc(d).as[(Long, Long, Option[Double])].collect().head
    assert(got == ((2L, 2L, Some(0.875))))
    // perfect separation → 1.0; one-class input → NULL
    val perfect = Eval.aucRoc(Seq((5L, true), (6L, true), (1L, false),
      (2L, false)).toDF("score", "label"))
      .as[(Long, Long, Option[Double])].collect().head
    assert(perfect == ((2L, 2L, Some(1.0))))
    val oneClass = Eval.aucRoc(Seq((5L, true), (6L, true))
      .toDF("score", "label"))
      .as[(Long, Long, Option[Double])].collect().head
    assert(oneClass == ((2L, 0L, None)))
  }

  test("grouped corpus BLEU: one-slice group reproduces the global score") {
    import graft.operators.Eval
    val pairs = Seq(
      (1L, "a b c d", "a b c e"),
      (2L, "p q r s t", "p q r s")).toDF("doc_id", "cand", "ref")
    val stats = Eval.generationPairStats(pairs)
    val global = Eval.corpusBleu(stats).collect().head
    val grouped = Eval.corpusBleuGrouped(
      stats.withColumn("lang", lit("xx")), Seq("lang")).collect().head
    assert(grouped.getString(0) == "xx" &&
      grouped.toSeq.drop(1) == global.toSeq)
    // two slices score independently: the perfect-copy slice reads 1.0
    val mixed = Eval.generationPairStats(Seq(
      (1L, "a b c d e", "a b c d e"),
      (2L, "x y z w", "w z y x")).toDF("doc_id", "cand", "ref"))
      .withColumn("lang", when(col("doc_id") === 1L, "en").otherwise("zz"))
    val byLang = Eval.corpusBleuGrouped(mixed, Seq("lang"))
      .select("lang", "bleu").as[(String, Double)]
      .collect().sortBy(_._1).toSeq
    assert(byLang == Seq(("en", 1.0), ("zz", 0.0)))
  }

  test("BLEU jackknife: leave-one-out grid scores, exact variance sums") {
    import graft.operators.Eval
    // two pairs; leaving out pair 2 zeroes the 4-gram pool → that theta
    // is 0, so se reduces to s1/(2·10^4) exactly (sqrt of a square)
    val pairs = Seq(
      (1L, "a b c d", "a b c e"),
      (2L, "p q r s t", "p q r s")).toDF("doc_id", "cand", "ref")
    val got = Eval.corpusBleuJackknife(Eval.generationPairStats(pairs))
      .as[(Long, Double, Double, Option[Double], Option[Double],
        Option[Double])].collect().head
    // theta without pair 1 = corpus BLEU of pair 2 alone (bp = 1)
    val log2s = ((math.log(4.0 / 5.0) + math.log(3.0 / 4.0)) +
      math.log(2.0 / 3.0)) + math.log(1.0 / 2.0)
    val s1 = math.floor(1.0 * math.exp(log2s / 4.0) * 10000.0 + 0.499999).toLong
    val bleu = { // the corpusBleu value over both pairs (pooled sums)
      val ls = ((math.log(7.0 / 9.0) + math.log(5.0 / 7.0)) +
        math.log(3.0 / 5.0)) + math.log(1.0 / 3.0)
      math.floor(1.0 * math.exp(ls / 4.0) * 10000 + 0.499999) / 10000
    }
    val se = math.sqrt(1.0 * (2.0 * s1 * s1 - s1 * s1).toDouble) / 2.0 / 10000.0
    assert(got._1 == 2L && got._2 == bleu)
    assert(got._3 == s1.toDouble / 20000.0)
    assert(got._4.contains(se))
    assert(got._5.contains(bleu - 1.96 * se) && got._6.contains(bleu + 1.96 * se))
    // single pair → error bars undefined
    val one = Eval.corpusBleuJackknife(Eval.generationPairStats(
      Seq((1L, "a b c", "a b c")).toDF("doc_id", "cand", "ref")))
      .select("jk_se", "ci_lo").as[(Option[Double], Option[Double])]
      .collect().head
    assert(one == ((None, None)))
  }

  test("ROUGE scores are single divisions of the exact counts") {
    import graft.operators.Eval
    val pairs = Seq(
      (1L, "the cat sat on the mat", "the cat on a mat"),
      (2L, "", "a b")).toDF("doc_id", "cand", "ref")
    val got = Eval.rougeScores(Eval.generationPairStats(pairs))
      .select("doc_id", "rouge1_p", "rouge1_r", "rouge1_f",
        "rouge2_f", "rougel_p", "rougel_r", "rougel_f")
      .as[(Long, Double, Double, Double, Double, Double, Double, Double)]
      .collect().sortBy(_._1).toSeq
    assert(got(0) == ((1L, 4.0 / 6.0, 4.0 / 5.0, 8.0 / 11.0,
      2.0 / 9.0, 4.0 / 6.0, 4.0 / 5.0, 8.0 / 11.0)))
    // zero denominators score 0.0, never NULL/NaN
    assert(got(1) == ((2L, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0)))
  }

  test("quality-keeper dedup: highest score wins, ties break to lowest id") {
    // docs 1/2/3 share a fingerprint (case + whitespace normalize away):
    // scores 5, 9, 9 → keeper is 2 (max score, tie with 3 → lower id);
    // doc 4 is alone
    val d = Seq((1L, "a b", 5L), (2L, "A  B", 9L), (3L, "a   b", 9L),
      (4L, "c", 1L)).toDF("doc_id", "text", "q")
    val got = graft.operators.Dedup.exactBest(d, col("q"))
      .select("keep_id", "keep_score_fp", "n_dups")
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq((2L, 9L, 3L), (4L, 1L, 1L)))
  }

  test("pair agreement: directed counts merge, majority share exact") {
    val cmp = (Seq.fill(3)((1L, 2L)) ++ Seq((2L, 1L)) ++
      Seq.fill(2)((1L, 3L)) ++ Seq((4L, 3L))).toDF("winner", "loser")
    val got = graft.operators.Preference.pairAgreement(cmp)
      .as[(Long, Long, Long, Long, Long, Double)]
      .collect().sortBy(r => (r._1, r._2)).toSeq
    assert(got == Seq(
      (1L, 2L, 3L, 1L, 4L, 0.75), // 1 beat 2 thrice, lost once
      (1L, 3L, 2L, 0L, 2L, 1.0),  // unanimous
      (3L, 4L, 0L, 1L, 1L, 1.0))) // single judgment, 4 won
  }

  test("containment pairs: subset-dup scores 1.0 where Jaccard reads 0.5; " +
      "directed, exact dups both ways") {
    import graft.operators.Dedup
    // doc 1's 4 shingles all appear in doc 2 (8 shingles): containment
    // 1→2 = 1.0 while Jaccard = 4/8 = 0.5 — the asymmetric relation the
    // symmetric threshold misses. docs 4/5 identical → 1.0 both ways.
    val d = Seq(
      (1L, "a b c d e f"),
      (2L, "a b c d e f g h i j"),
      (3L, "x y z w q r"),
      (4L, "p q r s t"), (5L, "p q r s t")).toDF("doc_id", "text")
    val got = Dedup.containmentPairs(d, 3, 0.8)
      .as[(Long, Long, Long, Long, Double)].collect()
      .sortBy(r => (r._1, r._2)).toSeq
    assert(got == Seq(
      (1L, 2L, 4L, 4L, 1.0),
      (4L, 5L, 3L, 3L, 1.0),
      (5L, 4L, 3L, 3L, 1.0)), s"got $got")
    // Jaccard at the same 0.8 threshold is blind to the (1,2) subset pair
    val jac = Dedup.ngramJaccardPairs(d, 3, 0.8)
      .as[(Long, Long, Double)].collect().map(r => (r._1, r._2)).toSet
    assert(!jac.contains((1L, 2L)), s"jaccard unexpectedly caught it: $jac")
    // lowering the threshold lets the reverse (diluted) direction through
    val both = Dedup.containmentPairs(d, 3, 0.5)
      .as[(Long, Long, Long, Long, Double)].collect()
      .sortBy(r => (r._1, r._2)).toSeq
    assert(both.contains((2L, 1L, 4L, 8L, 0.5)), s"got $both")
  }

  test("Krippendorff interval alpha: hand-computed squared-difference " +
      "coefficient, zero-variance NULL") {
    import graft.operators.Preference
    // u1 [1,3]: d=2·(2·10−16)=8 → 8e6//1; u2 [5,5,8]: d=2·(3·114−324)=36
    // → 36e6//2; u3 [7] unpairable. n=5, S1=22, S2=124, do=26e6,
    // n·S2−S1² = 136 → α = 1 − 4·26e6/(1e6·2·136) = 1 − 5.2/13.6
    val r = Seq(("u1", 1L), ("u1", 3L), ("u2", 5L), ("u2", 5L), ("u2", 8L),
      ("u3", 7L)).toDF("unit", "value")
    val got = Preference.krippendorffAlphaInterval(r)
      .as[(Long, Long, Long, Long, Long, Option[Double])].collect().toSeq
    assert(got == Seq((2L, 5L, 22L, 124L, 26000000L,
      Some(1.0 - 104000000.0 / 272000000.0))), s"got $got")
    // zero score variance → chance correction undefined → NULL
    val flat = Seq(("u1", 4L), ("u1", 4L), ("u2", 4L), ("u2", 4L))
      .toDF("unit", "value")
    assert(Preference.krippendorffAlphaInterval(flat)
      .select($"alpha").as[Option[Double]].collect().toSeq == Seq(None))
  }

  test("naive bayes: hand-computed posteriors, null-label rows score but " +
      "don't train, empty docs fall to the prior, ties break to min label") {
    import graft.operators.Classify
    val d = Seq(
      (1L, "cat cat", "A"), (2L, "dog", "B"),
      (3L, "cat dog", null), (4L, "", "A"))
      .toDF("doc_id", "text", "lang")
    val got = Classify.naiveBayes(d)
      .as[(Long, Option[String], String, Double)].collect()
      .map(t => t._1 -> (t._2, t._3, t._4)).toMap
    // model: A{cat:2} N_A=2, B{dog:1} N_B=1, V=2, priors 2/4 and 1/4
    assert(got(1L)._2 == "A" && got(2L)._2 == "B")
    // doc 3 (null label): A = ln(1/2)−2ln4+ln3, B = ln(1/4)−2ln3+ln2 → A
    assert(got(3L)._1.isEmpty && got(3L)._2 == "A")
    // doc 4 (no tokens): prior-only, A at ln(2/4)
    assert(got(4L)._2 == "A")
    assert(math.abs(got(4L)._3 - (-0.6931)) < 1e-9,
      s"prior-only score must be round4(ln 1/2): ${got(4L)._3}")
    val a1 = math.log(2.0 / 4) - 2 * math.log(4.0) + 2 * math.log(3.0)
    assert(math.abs(got(1L)._3 - math.floor(a1 * 10000 + 0.499999) / 10000) < 1e-9)
    // symmetric classes: identical scores, winner is the smaller label
    val sym = Classify.naiveBayes(
      Seq((1L, "x", "B"), (2L, "x", "A")).toDF("doc_id", "text", "lang"))
      .as[(Long, Option[String], String, Double)].collect()
    assert(sym.forall(_._3 == "A"), s"ties must break to min label: ${sym.toSeq}")
  }

  test("kneser-ney: hand-computed interpolated probabilities and backoff") {
    // reference "a b a b a c": bigrams ab:2, ba:2, ac:1; minCount=2 keeps
    // {ab, ba} → cw1(a)=2 n1p(a)=1, cont r(a)=r(b)=1, R=2, U=2
    val ref = Seq((1L, "a b a b a c")).toDF("doc_id", "text")
    val probe = Seq((10L, "a b"), (11L, "a c"), (12L, "q a"), (13L, "x"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.knScores(probe, ref, minCount = 2)
      .as[(Long, Long, Double)].collect().map(t => t._1 -> (t._2, t._3)).toMap
    // seen bigram: max(2−.75,0)/2 + (.75·1/2)·pcont(b)=.625+.375·.5
    assert(got(10L)._1 == 1L)
    assert(math.abs(got(10L)._2 - -math.log(0.8125)) < 1e-12)
    // unseen bigram, seen w1: discount mass only, unseen w2 ⇒ pcont 1/4
    assert(math.abs(got(11L)._2 - -math.log(0.375 * 0.25)) < 1e-12)
    // unseen w1: full backoff to pcont(a) = 1/2
    assert(math.abs(got(12L)._2 - -math.log(0.5)) < 1e-12)
    // no bigrams: kept with the (0, 0.0) convention
    assert(got(13L) == ((0L, 0.0)))
  }

  test("batch perceptron: hand-computed rounds, NULL rows drop, separable " +
      "fixture converges, predict matches the decision rule") {
    import graft.operators.Classify
    // round 1 under w=0: every margin is 0 → both defined rows update
    // (Σ y·[1,x] = (1,2)+(-1,1) = (0,3)); the NULL-feature row drops out
    // of count and update. round 2: margins 6 and 3 → converged.
    val d = Seq((1L, Some(2L)), (-1L, Some(-1L)), (1L, None))
      .toDF("y", "x1")
    val got = Classify.batchPerceptron(d, Seq("x1"), "y", rounds = 2)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, 2L, 0L, 3L), (2L, 0L, 0L, 3L)), s"got $got")
    // predict under the fitted weights: score = 0 + 3·x, sign rule > 0
    val pred = Classify.perceptronPredict(
        Seq(2L, -1L, 0L).toDF("x1"), Seq("x1"), Seq(0L, 3L))
      .select($"x1", $"score", $"pred").as[(Long, Long, Long)]
      .collect().sortBy(_._1).toSeq
    assert(pred == Seq((-1L, -3L, -1L), (0L, 0L, -1L), (2L, 6L, 1L)))
    // a linearly separable 2-feature fixture drives mistakes to 0 and
    // then holds the weights fixed (updates vanish once separated)
    val sep = (1 to 20).map(i => (1L, i.toLong + 10L, 1L)) ++
      (1 to 20).map(i => (-1L, i.toLong, 9L))
    val curve = Classify.batchPerceptron(
        sep.toDF("y", "a", "b"), Seq("a", "b"), "y", rounds = 8)
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(curve.last._2 == 0L, s"did not converge: $curve")
    val atZero = curve.find(_._2 == 0L).get
    assert(curve.filter(_._1 >= atZero._1)
      .forall(r => (r._3, r._4, r._5) == ((atZero._3, atZero._4, atZero._5))))
  }

  test("decision stumps: hand-computed optimal thresholds per feature, " +
      "matches a driver-side exhaustive search") {
    import graft.operators.Classify
    // feature a: best rule is "x ≤ 1 → −1" (1 error: the (−1, a=7) row);
    // feature b separates perfectly at "x ≤ 3 → −1"
    val d = Seq((1L, 5L, 10L), (1L, 7L, 11L), (-1L, 1L, 2L), (-1L, 7L, 3L))
      .toDF("y", "a", "b")
    val got = Classify.bestStumps(d, Seq("a", "b"), "y")
      .as[(String, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq(("a", 1L, -1L, 1L, 4L), ("b", 3L, -1L, 0L, 4L)),
      s"got $got")
    // exhaustive driver-side check on feature a: no (threshold, polarity)
    // rule over observed values does better than the reported stump
    val rows = Seq((1L, 5L), (1L, 7L), (-1L, 1L), (-1L, 7L))
    val bruteBest = (for {
      t <- rows.map(_._2).distinct
      pol <- Seq(1L, -1L)
    } yield {
      val errs = rows.count { case (y, v) =>
        val pred = if (v <= t) pol else -pol
        pred != y
      }
      (errs.toLong, t, pol)
    }).min
    val a = got.find(_._1 == "a").get
    assert((a._4, a._2, a._3) == bruteBest, s"stump $a vs brute $bruteBest")
  }

  test("boosted stumps: weight-doubling shifts the pick, hand-traced rounds") {
    import graft.operators.Classify
    // feature a labels (+,+,−,−,+) at v=1..5; c is constant noise.
    // round 1: best overall is a ≤ 2 → +1 (1 error: the (+1, a=5) row).
    // doubling that row's weight twice drags the round-3 argmin to the
    // a ≤ 4 → −1 stump — boosting visibly re-aims the ensemble.
    val d = Seq((1L, 1L, 7L), (1L, 2L, 7L), (-1L, 3L, 7L), (-1L, 4L, 7L),
      (1L, 5L, 7L)).toDF("y", "a", "c")
    val got = Classify.boostedStumps(d, Seq("a", "c"), "y", rounds = 3)
      .as[(Long, String, Long, Long, Long, Long)].collect()
      .sortBy(_._1).toSeq
    assert(got == Seq(
      (1L, "a", 2L, 1L, 1L, 5L),
      (2L, "a", 2L, 1L, 2L, 6L),
      (3L, "a", 4L, -1L, 2L, 8L)), s"got $got")
    // round 1 under unit weights == the unweighted overall-best stump
    val flat = Classify.bestStumps(d, Seq("a", "c"), "y")
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => (r._4, r._1, r._2, r._3)).min
    assert((got.head._5, got.head._2, got.head._3, got.head._4) == flat)
  }

  test("video keyframes: frame 0 keys with NULL delta, deltas match the " +
      "decoded channel sums") {
    import graft.operators.Multimodal
    val docsDf = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet").limit(30)
    val media = Multimodal.synthesizeVideos(spark, docsDf)
    val fr = Multimodal.decodeFrames(spark, media)
      .select($"doc_id", $"frame_idx", $"sum_r", $"sum_g", $"sum_b")
      .as[(Long, Long, Long, Long, Long)].collect()
    val byDoc = fr.groupBy(_._1)
    val got = Multimodal.keyframeSelect(spark, media, thr = 2000L)
      .as[(Long, Long, Option[Long], Long)].collect()
      .sortBy(r => (r._1, r._2)).toSeq
    assert(got.length == fr.length)
    got.foreach { case (d, f, delta, key) =>
      if (f == 0L) assert(delta.isEmpty && key == 1L, s"frame 0 of $d")
      else {
        val cur = byDoc(d).find(_._2 == f).get
        val prev = byDoc(d).find(_._2 == f - 1).get
        val exp = math.abs(cur._3 - prev._3) + math.abs(cur._4 - prev._4) +
          math.abs(cur._5 - prev._5)
        assert(delta.contains(exp), s"doc $d frame $f delta")
        assert(key == (if (exp > 2000L) 1L else 0L), s"doc $d frame $f key")
      }
    }
    // continuation frames exist (2..4 frames per video by construction)
    assert(got.exists(_._2 > 0L))
  }

  test("Krippendorff alpha: hand-computed nominal coefficient, degenerate NULLs") {
    import graft.operators.Preference
    // units: (1,2) m=4 ones=3 → d=6, 6e6//3 = 2e6; (1,3) m=2 unanimous → 0;
    // (2,3) m=2 split → d=2, 2e6//1 = 2e6; (3,4) m=1 → unpairable, excluded.
    // n=8, c1=6, c0=2, do_scaled=4e6 →
    // α = 1 − 7·4e6/(1e6·2·2·6) = 1 − 7/6 = −1/6 (systematic disagreement)
    val cmp = (Seq.fill(3)((1L, 2L)) ++ Seq((2L, 1L)) ++
      Seq.fill(2)((1L, 3L)) ++ Seq((2L, 3L), (3L, 2L)) ++ Seq((4L, 3L)))
      .toDF("winner", "loser")
    val got = Preference.krippendorffAlpha(cmp)
      .as[(Long, Long, Long, Long, Long, Option[Double])].collect().toSeq
    assert(got == Seq((3L, 8L, 2L, 6L, 4000000L,
      Some(1.0 - 28000000.0 / 24000000.0))))
    // perfect agreement with both labels present globally → α = 1
    val perfect = (Seq.fill(2)((1L, 2L)) ++ Seq.fill(2)((9L, 5L)))
      .toDF("winner", "loser")
    assert(Preference.krippendorffAlpha(perfect)
      .select($"alpha").as[Option[Double]].collect().toSeq == Seq(Some(1.0)))
    // one global label (every winner lexicographically smaller) → chance
    // correction undefined → NULL alpha; same for a log with no pairable unit
    val oneLabel = Seq.fill(3)((1L, 2L)).toDF("winner", "loser")
    assert(Preference.krippendorffAlpha(oneLabel)
      .select($"alpha").as[Option[Double]].collect().toSeq == Seq(None))
    val unpairable = Seq((1L, 2L), (3L, 4L)).toDF("winner", "loser")
    assert(Preference.krippendorffAlpha(unpairable)
      .select($"alpha").as[Option[Double]].collect().toSeq == Seq(None))
  }

  test("BPE token-id export: merge ids by rank, char ids by order, OOV 99999") {
    // learn "ab"×2: one merge (a,b); vocab ids: ab→0, then chars a→1, b→2
    val learn = Seq((1L, "ab ab b")).toDF("doc_id", "text")
    val merges = TextAnalysis.bpeLearnMerges(learn, 4)
      .orderBy("rank").collect().map(r => (r.getString(1), r.getString(2))).toSeq
    assert(merges == Seq(("a", "b")))
    val apply = Seq((7L, "ab b X9 a"), (8L, "  ")).toDF("doc_id", "text")
    val got = TextAnalysis.bpeTokenIds(apply, merges)
      .as[(Long, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    // NOTE ids come from the APPLY corpus' chars: sorted a→1, b→2, x? no —
    // "X9" is not a word form, so chars are {a, b}; doc 8 emits nothing
    assert(got == Seq((7L, 0L, 0L), (7L, 1L, 2L), (7L, 2L, 99999L), (7L, 3L, 1L)))
  }

  test("BPE merge learning stops early when no adjacent pairs remain") {
    val docsDf = Seq((1L, "a b c a 7 B!")).toDF("doc_id", "text")
    // only single-letter lowercase word forms → zero pairs in round 1
    assert(TextAnalysis.bpeLearnMerges(docsDf, 5).count() == 0L)
    // merges never cross word boundaries: "ab ab" learns (a,b) with count 2
    val two = Seq((1L, "ab ab")).toDF("doc_id", "text")
    val m = TextAnalysis.bpeLearnMerges(two, 5)
      .as[(Long, String, String, Long)].collect().toSeq
    assert(m == Seq((1L, "a", "b", 2L))) // round 2 finds nothing → stops
  }
}
