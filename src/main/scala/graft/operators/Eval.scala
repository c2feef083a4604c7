package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Retrieval / ranking quality evaluation — the metrics an eval harness
  * reports over a retriever's output (BM25 top-k, ANN top-k, a reranker):
  * hits@k, first-relevant rank (the MRR numerator), precision/recall@k and
  * nDCG@k, one row per benchmark query.
  *
  * Everything is engine-exact by construction: counts and ranks are
  * integers, the per-query ratios (reciprocal rank, precision, recall) are
  * a SINGLE IEEE division of integers, and the only order-dependent sums —
  * the DCG/iDCG gain folds — run as index-ordered array folds over the
  * rank-sorted gain list (the 0.0-seeded `aggregate` fold both engines
  * replay identically), with the final nDCG quotient round-4'd to absorb
  * libm `log2` ulp skew (the BM25 rank defense).
  */
object Eval {

  /** Per-query ranking metrics of `ranked` (queryIdCol, docIdCol, rankCol —
    * rank 1-based, rows with rank > k are ignored so callers can pass a
    * deeper list) against `relevant` ground-truth pairs (queryIdCol,
    * docIdCol). Emits ONE ROW PER QUERY PRESENT IN THE GROUND TRUTH — the
    * benchmark defines the query set; a query the retriever returned
    * nothing for still scores (zeros), while retrieved-but-unlabeled
    * queries are not scored at all.
    *
    * Output: (query, n_relevant, hits_at_k, first_rel_rank — NULL when no
    * relevant doc was retrieved, rr, precision_at_k, recall_at_k,
    * ndcg_at_k).
    *
    * Scale shape: the hit join is an equi-join on (query, doc) — broadcast
    * when the ground truth is benchmark-sized (the common case: thousands
    * of labeled queries vs a 100 TB corpus ranking), shuffled otherwise;
    * per-query state after it is ≤ k ranks, so the metric aggregation is
    * one map-side-combined exchange of k-bounded rows. Nothing touches the
    * corpus itself — evaluation cost is O(|ranked| + |relevant|). */
  def rankingMetrics(ranked: DataFrame, relevant: DataFrame, k: Int,
      queryIdCol: String = "query_id", docIdCol: String = "doc_id",
      rankCol: String = "rank"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val r = ranked
      .select(col(queryIdCol), col(docIdCol), col(rankCol).cast("long").as("__rank"))
      .filter(col("__rank") <= k)
    // persisted: the per-query counts AND the hit join both read the
    // relevant set, and an un-persisted ground-truth relation re-ran its
    // whole derivation (for eval_retrieval: the postings join) per consumer.
    // Hit-scale rows; the session's clearCache discipline owns the lifecycle.
    val rel = relevant.select(col(queryIdCol), col(docIdCol)).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nrel = rel.groupBy(queryIdCol).agg(count(lit(1)).as("n_relevant"))
    val hits = r.join(rel, Seq(queryIdCol, docIdCol))
      .groupBy(queryIdCol)
      .agg(count(lit(1)).as("__hits"),
        min(col("__rank")).as("first_rel_rank"),
        sort_array(collect_list(col("__rank"))).as("__ranks"))
    // index-ordered 0.0-seeded folds: both engines sum the gain list in
    // ascending-rank order, so the ONLY cross-engine wiggle is log2 ulps —
    // absorbed by the round-4 on the final quotient
    val gain = (rk: org.apache.spark.sql.Column) =>
      lit(1.0) / log2(rk.cast("double") + lit(1.0))
    val dcg = aggregate(col("__ranks"), lit(0.0), (acc, rk) => acc + gain(rk))
    val idcg = aggregate(
      sequence(lit(1L), least(col("n_relevant"), lit(k.toLong))),
      lit(0.0), (acc, rk) => acc + gain(rk))
    nrel.join(hits, Seq(queryIdCol), "left")
      .select(col(queryIdCol),
        col("n_relevant"),
        coalesce(col("__hits"), lit(0L)).as("hits_at_k"),
        col("first_rel_rank"),
        when(col("first_rel_rank").isNotNull,
          lit(1.0) / col("first_rel_rank").cast("double"))
          .otherwise(lit(0.0)).as("rr"),
        (coalesce(col("__hits"), lit(0L)).cast("double") / lit(k.toDouble))
          .as("precision_at_k"),
        (coalesce(col("__hits"), lit(0L)).cast("double") /
          col("n_relevant").cast("double")).as("recall_at_k"),
        when(col("__ranks").isNull, lit(0.0))
          .otherwise(graft.functions.StableRound.round4(dcg / idcg))
          .as("ndcg_at_k"))
  }

  // ------------------------------------------- generation-eval metrics

  /** Per-pair GENERATION-EVAL statistics — the exact integer counts BLEU
    * (Papineni et al. 2002) and ROUGE (Lin 2004) are built from, one row
    * per (candidate, reference) text pair: token lengths, clipped n-gram
    * matches m_n with candidate/reference n-gram totals c_n / r_n for
    * n = 1..maxN, and the LCS length (the ROUGE-L numerator).
    *
    * Tokens are the engine-wide whitespace tokens
    * ([[TextAnalysis.tokens]]), empty tokens dropped, both sides capped at
    * `capTokens` — generations are short by nature, and the cap is what
    * BOUNDS the per-row cost: clipped matching is the O(K log K)
    * sorted-merge fold ([[clippedSorted]])
    * and the LCS fold O(K²) integer steps, a constant per row once K is
    * fixed. Everything here is exact integer work (clipped counts are
    * Σ_g min(count_cand(g), count_ref(g));
    * the LCS fold appends dp_new[j] = if match then dp_prev[j-1]+1 else
    * max(dp_new[j-1], dp_prev[j])), so both engines agree bit-for-bit
    * with no rounding at all.
    *
    * Scale shape: ONE narrow projection over the pair scan — no explode,
    * no join, no shuffle; at 100 TB this is a map over the scan, and the
    * downstream corpus BLEU roll-up is a single map-side-combined 1-row
    * aggregate. (The alternative explode→groupBy(gram)→join formulation
    * is linear in token count but costs three corpus-sized exchanges;
    * with K bounded the zero-shuffle bounded-per-row map wins at any
    * corpus size.) */
  def generationPairStats(pairs: DataFrame, maxN: Int = 4,
      capTokens: Int = 48, idCol: String = "doc_id",
      candCol: String = "cand", refCol: String = "ref"): DataFrame = {
    require(maxN >= 1, s"maxN must be >= 1, got $maxN")
    require(capTokens >= 1, s"capTokens must be >= 1, got $capTokens")
    val tok = (c: org.apache.spark.sql.Column) =>
      slice(filter(TextAnalysis.tokens(c), x => length(x) > lit(0)),
        1, capTokens)
    // n-grams of the capped token list, space-joined (tokens carry no
    // whitespace, so the join is unambiguous)
    def grams(toks: org.apache.spark.sql.Column, n: Int) =
      when(size(toks) < n, array().cast("array<string>"))
        .otherwise(transform(sequence(lit(1), size(toks) - lit(n - 1)),
          i => array_join(slice(toks, i, lit(n)), " ")))
    // LCS via the classic DP, one row per candidate token: the row list is
    // 1-based with a leading 0 (P[j+1] = dp[j]), each new row built by a
    // sequential append fold so dp_new[j-1] is element_at(cur, -1) —
    // the exact formulation the DuckDB mirror replays with nested
    // list_reduce
    def lcs(cand: org.apache.spark.sql.Column,
        ref: org.apache.spark.sql.Column) = {
      val m = size(ref)
      val fin = aggregate(cand, array_repeat(lit(0L), m + lit(1)),
        (prev, ct) => aggregate(
          when(m === 0, array().cast("array<int>"))
            .otherwise(sequence(lit(1), m)),
          array(lit(0L)),
          (cur, j) => concat(cur, array(
            when(element_at(ref, j) === ct,
              element_at(prev, j) + lit(1L))
              .otherwise(greatest(element_at(cur, lit(-1)),
                element_at(prev, j + lit(1))))))))
      element_at(fin, lit(-1))
    }
    // NULL text coalesces to "" (the native fast path's convention) so
    // fast == spec row for row even on NULL cand/ref (ADVICE r15)
    val base = pairs.select(col(idCol),
      tok(coalesce(col(candCol), lit(""))).as("__c"),
      tok(coalesce(col(refCol), lit(""))).as("__r"))
    val withGrams = (1 to maxN).foldLeft(base)((d, n) =>
      d.withColumn(s"__cg$n", grams(col("__c"), n))
        .withColumn(s"__rg$n", grams(col("__r"), n)))
    val cols =
      col(idCol) ::
        size(col("__c")).cast("long").as("cand_len") ::
        size(col("__r")).cast("long").as("ref_len") ::
        (1 to maxN).toList.flatMap(n => List(
          clippedSorted(col(s"__cg$n"), col(s"__rg$n")).as(s"m$n"),
          size(col(s"__cg$n")).cast("long").as(s"c$n"),
          size(col(s"__rg$n")).cast("long").as(s"r$n"))) :::
        List(lcs(col("__c"), col("__r")).as("lcs"))
    withGrams.select(cols: _*)
  }

  /** Corpus BLEU-maxN (Papineni et al. 2002) over a
    * [[generationPairStats]] output — the standard corpus formulation:
    * precisions p_n = Σm_n / Σc_n pool the clipped counts over ALL pairs
    * (never an average of sentence BLEUs), BP = min(1, e^(1−r/c)) on the
    * pooled lengths, BLEU = BP · exp(Σ ln(p_n)/maxN). One output row.
    *
    * Exactness: the pooled sums are exact longs, each p_n is a single
    * IEEE division, and the ln/exp geometric mean — the one
    * transcendental — rounds through [[graft.functions.StableRound]] on
    * both engines (bp and bleu round-4). Any p_n = 0 (or an empty
    * candidate corpus) short-circuits to bleu = 0.0 with no log of zero.
    *
    * Scale shape: ONE map-side-combined aggregate to a single row — the
    * per-pair stats stream through partial sums, nothing is collected. */
  def corpusBleu(stats: DataFrame, maxN: Int = 4): DataFrame = {
    require(maxN >= 1, s"maxN must be >= 1, got $maxN")
    corpusBleuFromSums(stats.agg(
      count(lit(1)).as("n_pairs"),
      (sum("cand_len").as("cand_tokens") ::
        sum("ref_len").as("ref_tokens") ::
        (1 to maxN).toList.flatMap(n =>
          List(sum(s"m$n").as(s"m$n"), sum(s"c$n").as(s"c$n")))): _*),
      maxN)
  }

  /** Per-slice corpus BLEU — the per-language / per-domain / per-source
    * eval table: [[corpusBleu]]'s pooled formulation applied WITHIN each
    * group of `keyCols` (stats joined with slice columns first). One
    * map-side-combined exchange on the slice key, one output row per
    * slice; the arithmetic is [[corpusBleuFromSums]] verbatim, so a
    * single-slice corpus reproduces [[corpusBleu]] exactly. */
  def corpusBleuGrouped(stats: DataFrame, keyCols: Seq[String],
      maxN: Int = 4): DataFrame = {
    require(keyCols.nonEmpty, "keyCols must be non-empty")
    require(maxN >= 1, s"maxN must be >= 1, got $maxN")
    corpusBleuFromSums(stats.groupBy(keyCols.map(col): _*).agg(
      count(lit(1)).as("n_pairs"),
      (sum("cand_len").as("cand_tokens") ::
        sum("ref_len").as("ref_tokens") ::
        (1 to maxN).toList.flatMap(n =>
          List(sum(s"m$n").as(s"m$n"), sum(s"c$n").as(s"c$n")))): _*),
      maxN, keyCols)
  }

  /** [[corpusBleu]]'s arithmetic as a pure function of the pooled sums
    * (n_pairs, cand_tokens, ref_tokens, m1..mN, c1..cN) — split out
    * because the sums are ADDITIVE (a one-row count table), which is
    * what lets the streaming sink fold them through a GenStore
    * generation and recompute the identical score per micro-batch;
    * `keyCols` carries slice keys through for the grouped variant. */
  def corpusBleuFromSums(sums: DataFrame, maxN: Int = 4,
      keyCols: Seq[String] = Nil): DataFrame = {
    require(maxN >= 1, s"maxN must be >= 1, got $maxN")
    // sum() over ZERO rows yields NULL, which would leak NULL through
    // cand_tokens === 0 / anyZero into NULL bp/bleu instead of the
    // documented empty-corpus → 0.0 short-circuit (a streaming sink's
    // first empty micro-batch hits this) — coalesce every pooled sum to
    // 0L before any comparison (ADVICE r15)
    def s(name: String) = coalesce(col(name), lit(0L))
    val anyZero = (1 to maxN).map(n => s(s"m$n") === 0L)
      .reduce(_ || _) || s("cand_tokens") === 0L
    val logSum = (1 to maxN).map(n =>
      log(s(s"m$n").cast("double") / s(s"c$n").cast("double")))
      .reduce(_ + _)
    val bp = when(s("cand_tokens") >= s("ref_tokens"), lit(1.0))
      .otherwise(exp(lit(1.0) - s("ref_tokens").cast("double") /
        s("cand_tokens").cast("double")))
    val prec = (1 to maxN).toList.map(n =>
      when(s(s"c$n") === 0L, lit(0.0))
        .otherwise(s(s"m$n").cast("double") /
          s(s"c$n").cast("double")).as(s"p$n"))
    sums.select(
      (keyCols.map(col).toList :::
        coalesce(col("n_pairs"), lit(0L)).as("n_pairs") ::
        s("cand_tokens").as("cand_tokens") ::
        s("ref_tokens").as("ref_tokens") ::
        prec) :::
        List(
          when(s("cand_tokens") === 0L, lit(0.0))
            .otherwise(graft.functions.StableRound.round4(bp)).as("bp"),
          when(anyZero, lit(0.0))
            .otherwise(graft.functions.StableRound.round4(
              bp * exp(logSum / lit(maxN.toDouble)))).as("bleu")): _*)
  }

  /** Per-pair chrF statistics (Popović 2015, "chrF: character n-gram
    * F-score for automatic MT evaluation") — the tokenization-free
    * companion to BLEU/ROUGE: whitespace is removed (the capped token
    * list concatenated with no separator, then capped at `capChars` code
    * points) and clipped CHARACTER n-gram matches are counted for
    * n = 1..maxN. One row per pair: char lengths, and per n the clipped
    * matches mc_n with candidate/reference gram totals cc_n / rc_n — all
    * exact longs.
    *
    * The clipped count here is the SORTED-MERGE formulation (tag each
    * gram with its side, sort the union once, one linear fold summing
    * min(count_cand, count_ref) per equal-gram run): O(L log L) per row
    * against the distinct×scan O(D·L) of the word-gram path — at
    * capChars=256 and six n's that is ~3k fold steps per row instead of
    * ~800k string compares. Same exact integers, both formulations are
    * Σ_g min(count_cand(g), count_ref(g)).
    *
    * Scale shape: a pure narrow map over the pair scan, zero shuffles;
    * the [[corpusChrF]] roll-up is one map-side-combined single-row
    * aggregate. Character positions are CODE POINTS on both engines
    * (Spark UTF8String and DuckDB substr/length both count code points),
    * so the mirror replays astral text too. */
  def chrFPairStats(pairs: DataFrame, maxN: Int = 6, capChars: Int = 256,
      capTokens: Int = 48, idCol: String = "doc_id",
      candCol: String = "cand", refCol: String = "ref"): DataFrame = {
    require(maxN >= 1, s"maxN must be >= 1, got $maxN")
    require(capChars >= 1, s"capChars must be >= 1, got $capChars")
    val chars = (c: org.apache.spark.sql.Column) =>
      substring(array_join(
        slice(filter(TextAnalysis.tokens(c), x => length(x) > lit(0)),
          1, capTokens), ""), 1, capChars)
    def grams(s: org.apache.spark.sql.Column, n: Int) =
      when(length(s) < n, array().cast("array<string>"))
        .otherwise(transform(sequence(lit(1), length(s) - lit(n - 1)),
          i => substr(s, i, lit(n))))
    // NULL text → "" to match the native fast path (ADVICE r15)
    val base = pairs.select(col(idCol),
      chars(coalesce(col(candCol), lit(""))).as("__c"),
      chars(coalesce(col(refCol), lit(""))).as("__r"))
    val withGrams = (1 to maxN).foldLeft(base)((d, n) =>
      d.withColumn(s"__cg$n", grams(col("__c"), n))
        .withColumn(s"__rg$n", grams(col("__r"), n)))
    val cols =
      col(idCol) ::
        length(col("__c")).cast("long").as("cand_chars") ::
        length(col("__r")).cast("long").as("ref_chars") ::
        (1 to maxN).toList.flatMap(n => List(
          clippedSorted(col(s"__cg$n"), col(s"__rg$n")).as(s"mc$n"),
          size(col(s"__cg$n")).cast("long").as(s"cc$n"),
          size(col(s"__rg$n")).cast("long").as(s"rc$n")))
    withGrams.select(cols: _*)
  }

  /** Clipped multiset-intersection size of two gram lists by sorted
    * merge: tag grams with their side, sort the tagged union (struct sort
    * is lexicographic: gram, then side), then ONE linear fold that counts
    * each side within an equal-gram run and adds min(ca, cb) when the run
    * closes. Exactly Σ_g min(count_cand(g), count_ref(g)), as exact longs.
    * The seed's sentinel gram is the empty string — never a real gram
    * (grams are n ≥ 1 slices of non-empty tokens), so the first element
    * always opens a fresh run on zero counts. */
  private def clippedSorted(cg: org.apache.spark.sql.Column,
      rg: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val tagged = array_sort(concat(
      transform(cg, g => struct(g.as("g"), lit(1).as("s"))),
      transform(rg, g => struct(g.as("g"), lit(2).as("s")))))
    aggregate(tagged,
      struct(lit("").as("pg"), lit(0L).as("ca"), lit(0L).as("cb"),
        lit(0L).as("tot")),
      (st, e) => when(e.getField("g") === st.getField("pg"),
        struct(st.getField("pg").as("pg"),
          (st.getField("ca") + (e.getField("s") === 1).cast("long")).as("ca"),
          (st.getField("cb") + (e.getField("s") === 2).cast("long")).as("cb"),
          st.getField("tot").as("tot")))
        .otherwise(struct(e.getField("g").as("pg"),
          (e.getField("s") === 1).cast("long").as("ca"),
          (e.getField("s") === 2).cast("long").as("cb"),
          (st.getField("tot") +
            least(st.getField("ca"), st.getField("cb"))).as("tot"))),
      st => st.getField("tot") +
        least(st.getField("ca"), st.getField("cb")))
  }

  /** Corpus chrF2 over a [[chrFPairStats]] output — the standard pooled
    * formulation: per n, precision/recall from the corpus-pooled clipped
    * sums (each a single IEEE division of exact longs); P and R are the
    * arithmetic means over the n orders (fixed left-to-right sum order on
    * both engines); chrF2 = 5·P·R / (4·P + R) (β = 2 weights recall
    * twice). Pure finite IEEE arithmetic in a deterministic order — no
    * transcendental anywhere, so no rounding is needed. One output row. */
  def corpusChrF(stats: DataFrame, maxN: Int = 6): DataFrame = {
    require(maxN >= 1, s"maxN must be >= 1, got $maxN")
    val sums = stats.agg(
      count(lit(1)).as("n_pairs"),
      (sum("cand_chars").as("cand_chars") ::
        sum("ref_chars").as("ref_chars") ::
        (1 to maxN).toList.flatMap(n => List(
          sum(s"mc$n").as(s"__m$n"), sum(s"cc$n").as(s"__c$n"),
          sum(s"rc$n").as(s"__r$n")))): _*)
    def ratio(num: String, den: String) =
      when(col(den) === 0L, lit(0.0))
        .otherwise(col(num).cast("double") / col(den).cast("double"))
    val p = (1 to maxN).map(n => ratio(s"__m$n", s"__c$n")).reduce(_ + _) /
      lit(maxN.toDouble)
    val r = (1 to maxN).map(n => ratio(s"__m$n", s"__r$n")).reduce(_ + _) /
      lit(maxN.toDouble)
    sums.select(col("n_pairs"), col("cand_chars"), col("ref_chars"),
      p.as("prec_avg"), r.as("rec_avg"),
      when(lit(4.0) * p + r === 0.0, lit(0.0))
        .otherwise(lit(5.0) * p * r / (lit(4.0) * p + r)).as("chrf2"))
  }

  /** Native fast path of [[generationPairStats]] — identical schema and
    * identical exact integers (equality-pinned in `OperatorsSpec`), one
    * JVM eval per row instead of thousands of interpreted lambda steps
    * (measured 19 s → sub-second for the ROUGE query at sf0.1). The
    * higher-order formulation above remains the oracle-replayable spec. */
  def generationPairStatsFast(pairs: DataFrame, maxN: Int = 4,
      capTokens: Int = 48, idCol: String = "doc_id",
      candCol: String = "cand", refCol: String = "ref"): DataFrame = {
    require(maxN >= 1, s"maxN must be >= 1, got $maxN")
    val st = graft.functions.GenEvalExpressions.pairTokenStats(
      col(candCol), col(refCol), maxN, capTokens)
    pairs.select(col(idCol), st.as("__st"))
      .select(col(idCol) ::
        col("__st.cand_len").as("cand_len") ::
        col("__st.ref_len").as("ref_len") ::
        (1 to maxN).toList.flatMap(n => List(
          element_at(col("__st.m"), n).as(s"m$n"),
          element_at(col("__st.c"), n).as(s"c$n"),
          element_at(col("__st.r"), n).as(s"r$n"))) :::
        List(col("__st.lcs").as("lcs")): _*)
  }

  /** DISTINCT-N generation diversity (Li et al. 2016, "A
    * Diversity-Promoting Objective Function for Neural Conversation
    * Models"): for n = 1..maxN, the number of DISTINCT n-grams across
    * the whole generation corpus over the total n-gram count — the
    * standard mode-collapse audit (self-repetitive generators score low).
    * One row per n: (n, n_grams, n_distinct, distinct_ratio) — counts are
    * exact longs, the ratio ONE division; n with zero grams reports NULL
    * ratio. Tokenization is the gen-eval contract (set-trim, ws split,
    * drop empties, cap).
    *
    * Scale shape: one explode of per-row tagged grams (bounded by
    * maxN·capTokens per row) into ONE exchange keyed by (n, gram) for the
    * distinct count, re-aggregated to maxN rows — at 100 TB this is the
    * same shape as every n-gram profile in the text plane. */
  def distinctNgramRatio(gens: DataFrame, maxN: Int = 3,
      capTokens: Int = 48, textCol: String = "cand"): DataFrame = {
    require(maxN >= 1, s"maxN must be >= 1, got $maxN")
    val tok = slice(filter(TextAnalysis.tokens(
      coalesce(col(textCol), lit(""))), x => length(x) > lit(0)),
      1, capTokens)
    def grams(toks: org.apache.spark.sql.Column, n: Int) =
      when(size(toks) < n, array().cast("array<string>"))
        .otherwise(transform(sequence(lit(1), size(toks) - lit(n - 1)),
          i => array_join(slice(toks, i, lit(n)), " ")))
    val tagged = gens.select(tok.as("__t"))
      .select(explode(flatten(array((1 to maxN).map(n =>
        transform(grams(col("__t"), n),
          g => struct(lit(n).as("n"), g.as("g")))): _*))).as("p"))
      .select(col("p.n").as("n"), col("p.g").as("g"))
    val per = tagged.groupBy("n", "g").agg(count(lit(1)).as("__k"))
      .groupBy("n").agg(sum("__k").as("n_grams"),
        count(lit(1)).as("n_distinct"))
    // every n gets a row even when the corpus has no grams of that order
    val ns = broadcast(gens.sparkSession.range(1, maxN + 1L)
      .select(col("id").cast("int").as("n")))
    ns.join(per, Seq("n"), "left")
      .select(col("n").cast("long").as("n"),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("n_distinct"), lit(0L)).as("n_distinct"),
        when(coalesce(col("n_grams"), lit(0L)) > 0L,
          col("n_distinct").cast("double") / col("n_grams").cast("double"))
          .as("distinct_ratio"))
  }

  /** MULTI-REFERENCE BLEU statistics (Papineni et al. 2002 §2.1's full
    * formulation — what the single-ref path structurally cannot express):
    * per n-gram the clip ceiling is the MAX count over ALL references of
    * the candidate's item, and `ref_len` is the reference length CLOSEST
    * to the candidate's (ties to the shorter — the standard brevity
    * convention), so [[corpusBleu]] consumes the output unchanged.
    * `pairs` carries one row per candidate with `refsCol` an
    * array<string> of its references (refs arriving as ROWS collect per
    * candidate with ONE groupBy(collect_list) exchange first — reference
    * counts are small constants, so the array is bounded).
    *
    * Scale shape: one narrow native map over the eval relation
    * ([[graft.functions.MultiRefTokenStats]] — per-row HashMap gram
    * ceilings, no explode, no join); the corpus roll-up stays the one
    * map-side-combined single-row aggregate. */
  def generationPairStatsMultiRef(pairs: DataFrame, maxN: Int = 4,
      capTokens: Int = 48, idCol: String = "doc_id",
      candCol: String = "cand", refsCol: String = "refs"): DataFrame = {
    require(maxN >= 1, s"maxN must be >= 1, got $maxN")
    val st = graft.functions.GenEvalExpressions.multiRefTokenStats(
      col(candCol), col(refsCol), maxN, capTokens)
    pairs.select(col(idCol), st.as("__st"))
      .select(col(idCol) ::
        col("__st.cand_len").as("cand_len") ::
        col("__st.ref_len").as("ref_len") ::
        (1 to maxN).toList.flatMap(n => List(
          element_at(col("__st.m"), n).as(s"m$n"),
          element_at(col("__st.c"), n).as(s"c$n"))): _*)
  }

  /** Native fast path of [[chrFPairStats]] — same schema, same exact
    * integers, equality-pinned; see [[generationPairStatsFast]]. */
  def chrFPairStatsFast(pairs: DataFrame, maxN: Int = 6,
      capChars: Int = 256, capTokens: Int = 48, idCol: String = "doc_id",
      candCol: String = "cand", refCol: String = "ref"): DataFrame = {
    require(maxN >= 1, s"maxN must be >= 1, got $maxN")
    val st = graft.functions.GenEvalExpressions.pairCharStats(
      col(candCol), col(refCol), maxN, capTokens, capChars)
    pairs.select(col(idCol), st.as("__st"))
      .select(col(idCol) ::
        col("__st.cand_chars").as("cand_chars") ::
        col("__st.ref_chars").as("ref_chars") ::
        (1 to maxN).toList.flatMap(n => List(
          element_at(col("__st.m"), n).as(s"mc$n"),
          element_at(col("__st.c"), n).as(s"cc$n"),
          element_at(col("__st.r"), n).as(s"rc$n"))): _*)
  }

  /** Native fast path of [[werStats]] — the same edit DP in one JVM
    * pass (grams skipped: the expression runs at maxN = 0). */
  def werStatsFast(pairs: DataFrame, capTokens: Int = 48,
      idCol: String = "doc_id", candCol: String = "cand",
      refCol: String = "ref"): DataFrame = {
    val st = graft.functions.GenEvalExpressions.pairTokenStats(
      col(candCol), col(refCol), 0, capTokens)
    pairs.select(col(idCol), st.as("__st"))
      .select(col(idCol),
        col("__st.cand_len").as("cand_len"),
        col("__st.ref_len").as("ref_len"),
        col("__st.edit").as("edit_distance"))
      .withColumn("wer",
        when(col("ref_len") === 0L, lit(null).cast("double"))
          .otherwise(col("edit_distance").cast("double") /
            col("ref_len").cast("double")))
  }

  /** pass@k (Chen et al. 2021, "Evaluating Large Language Models Trained
    * on Code", eq. 1 — the unbiased estimator): per task with n samples
    * of which c are correct, pass@k = 1 − C(n−c, k)/C(n, k). One output
    * row per task: the grouping columns, n, c, and one `pass_at_<k>`
    * column per requested k (NULL when the task has fewer than k
    * samples — the estimator is undefined there).
    *
    * EXACT integer formulation (not the paper's float product): each
    * binomial runs as the classic divisibility-exact fold
    * acc ← acc·(m−k+j) ÷ j for j = 1..k — every prefix product of j
    * consecutive integers is divisible by j!, so the integer division is
    * exact at every step (including the n−c < k case, where a zero
    * factor at j = k−m collapses the fold to the correct C = 0, and any
    * negative intermediates are exact too — floor vs truncation can't
    * diverge on exact quotients). The final score is one division of
    * exact longs and one subtraction: no transcendental, no rounding.
    * Longs bound the domain to roughly C(n, k) < 2⁶³ — n into the tens
    * of thousands at the k ≤ 10 an eval harness uses.
    *
    * Scale shape: ONE map-side-combined exchange on the task key; the
    * per-task state is two longs, the k-step folds are constant per
    * output row. */
  def passAtK(samples: DataFrame, ks: Seq[Int],
      taskCols: Seq[String] = Seq("task_id"),
      correctCol: String = "correct"): DataFrame = {
    require(ks.nonEmpty && ks.forall(_ >= 1),
      s"ks must be non-empty positive, got $ks")
    require(taskCols.nonEmpty, "taskCols must be non-empty")
    val counts = samples.groupBy(taskCols.map(col): _*).agg(
      count(lit(1)).as("n"),
      sum(col(correctCol).cast("long")).as("c"))
    counts.select(taskCols.map(col) ++
      List(col("n"), col("c")) ++
      ks.map(k =>
        when(col("n") < k, lit(null).cast("double"))
          .otherwise(lit(1.0) -
            binomFold(col("n") - col("c"), k).cast("double") /
              binomFold(col("n"), k).cast("double"))
          .as(s"pass_at_$k")): _*)
  }

  /** Per-pair WORD ERROR RATE (the ASR/translation token-edit metric):
    * Levenshtein distance over the capped token sequences — insertions,
    * deletions and substitutions all cost 1 — divided once by the
    * reference length. One row per pair: (idCol, cand_len, ref_len,
    * edit_distance, wer); wer is NULL for an empty reference (undefined;
    * a non-empty candidate against an empty reference still reports its
    * edit distance = cand_len).
    *
    * The DP is the [[generationPairStats]] LCS fold with the full edit
    * recurrence: row j appends min(prev[j]+1, cur[j−1]+1, prev[j−1] +
    * [tokens differ]) and row 0 is 0..m (deletions only) — the same
    * sequential append fold both engines replay (`cur[−1]` is dp_new[j−1];
    * the DuckDB mirror nests list_reduce with the seed-as-first-element
    * trick). Exact integer work, one final division; O(K²) per row under
    * the generation-length cap, zero shuffles. */
  def werStats(pairs: DataFrame, capTokens: Int = 48,
      idCol: String = "doc_id", candCol: String = "cand",
      refCol: String = "ref"): DataFrame = {
    require(capTokens >= 1, s"capTokens must be >= 1, got $capTokens")
    val tok = (c: org.apache.spark.sql.Column) =>
      slice(filter(TextAnalysis.tokens(c), x => length(x) > lit(0)),
        1, capTokens)
    def dist(cand: org.apache.spark.sql.Column,
        ref: org.apache.spark.sql.Column) = {
      val m = size(ref)
      // row 0 = [0, 1, .., m]; Spark sequence(0, m) is safe here (m >= 0)
      val fin = aggregate(cand, sequence(lit(0L), m.cast("long")),
        (prev, ct) => aggregate(
          when(m === 0, array().cast("array<int>"))
            .otherwise(sequence(lit(1), m)),
          // new row seeds with dp[i][0] = i = prev[1] + 1 (pure deletions)
          array(element_at(prev, 1) + lit(1L)),
          (cur, j) => concat(cur, array(least(
            element_at(prev, j + lit(1)) + lit(1L),
            element_at(cur, lit(-1)) + lit(1L),
            element_at(prev, j) +
              when(element_at(ref, j) === ct, lit(0L)).otherwise(lit(1L)))))))
      element_at(fin, lit(-1))
    }
    // NULL text → "" to match the native fast path (ADVICE r15)
    pairs.select(col(idCol),
      tok(coalesce(col(candCol), lit(""))).as("__c"),
      tok(coalesce(col(refCol), lit(""))).as("__r"))
      .select(col(idCol),
        size(col("__c")).cast("long").as("cand_len"),
        size(col("__r")).cast("long").as("ref_len"),
        dist(col("__c"), col("__r")).as("edit_distance"))
      .withColumn("wer",
        when(col("ref_len") === 0L, lit(null).cast("double"))
          .otherwise(col("edit_distance").cast("double") /
            col("ref_len").cast("double")))
  }

  /** KENDALL TAU rank agreement between two rankings of the same items
    * (judge-vs-judge, reranker-vs-teacher, truncated-vs-full retrieval):
    * per query, τ_a = (C − D) / (n(n−1)/2) over the items present in
    * BOTH rankings (inner join). Contract: each ranking is a proper
    * permutation per query — DISTINCT ranks, the rankingMetrics rank
    * convention; with no ties C + D = n(n−1)/2, so D is the inversion
    * count of the b-ranks taken in a-rank order and C − D = n(n−1)/2 −
    * 2D. Everything is exact integer work until the ONE final division;
    * τ is NULL for queries with fewer than 2 common items (undefined).
    *
    * Output: (queryIdCol, n_common, concordant_minus_discordant, tau).
    *
    * Scale shape: one equi-join on (query, item), one map-side-combined
    * exchange to per-query state; the inversion count folds over the
    * a-rank-sorted array — O(k²) per query with k the ranking depth, a
    * constant per output row for the k ≤ 10³ of real eval harnesses. */
  def kendallTau(a: DataFrame, b: DataFrame,
      queryIdCol: String = "query_id", docIdCol: String = "doc_id",
      rankCol: String = "rank"): DataFrame = {
    val ra = a.select(col(queryIdCol), col(docIdCol),
      col(rankCol).cast("long").as("__ra"))
    val rb = b.select(col(queryIdCol), col(docIdCol),
      col(rankCol).cast("long").as("__rb"))
    val grouped = ra.join(rb, Seq(queryIdCol, docIdCol))
      .groupBy(queryIdCol)
      .agg(count(lit(1)).as("n_common"),
        array_sort(collect_list(struct(col("__ra").as("ra"),
          col("__rb").as("rb")))).as("__arr"))
    val arr = col("__arr")
    val inv = aggregate(
      when(size(arr) < 2, array().cast("array<int>"))
        .otherwise(sequence(lit(2), size(arr))),
      lit(0L),
      (acc, i) => acc + size(filter(slice(arr, lit(1), i - lit(1)),
        e => e.getField("rb") >
          element_at(arr, i).getField("rb"))).cast("long"))
    // C − D = (n(n−1) − 4D)/2 — the numerator is always even, so the
    // double division is exact (and < 2⁵³ at any real ranking depth);
    // τ divides the long once more by the exact n(n−1)/2
    val cmd = ((col("n_common") * (col("n_common") - lit(1L)) -
      lit(4L) * inv).cast("double") / lit(2.0)).cast("long")
    grouped
      .withColumn("__cmd", cmd)
      .select(col(queryIdCol), col("n_common"),
        col("__cmd").as("concordant_minus_discordant"),
        when(col("n_common") < 2L, lit(null).cast("double"))
          .otherwise(col("__cmd").cast("double") /
            ((col("n_common") * (col("n_common") - lit(1L)))
              .cast("double") / lit(2.0))).as("tau"))
  }

  /** Classifier CALIBRATION BINS (the reliability diagram behind ECE —
    * Guo et al. 2017, "On Calibration of Modern Neural Networks"):
    * predictions with a confidence in [0, 1] land in `bins` equal-width
    * buckets (floor(conf·bins), clamped into [0, bins−1] so conf = 1.0
    * joins the top bin); per bin the sample count, positive count, the
    * empirical accuracy (one IEEE division of exact longs) and the gap to
    * the bin MIDPOINT — the midpoint convention (as in
    * Preference.btCalibration) keeps the reference exactly replayable
    * ((2b+1)/(2·bins)) instead of an order-dependent mean of doubles.
    * One map-side-combined exchange on the bin id; ≤ `bins` output rows. */
  def calibrationBins(preds: DataFrame, bins: Int = 10,
      confCol: String = "conf", labelCol: String = "label"): DataFrame =
    calibrationBinsFromCounts(calibrationCounts(preds, bins, confCol,
      labelCol), bins)

  /** The (bin, n, n_pos) count table behind [[calibrationBins]] — split
    * out because these counts are ADDITIVE, which is what lets the
    * streaming sink fold them through a GenStore generation table and
    * recompute the identical diagram per micro-batch. */
  def calibrationCounts(preds: DataFrame, bins: Int = 10,
      confCol: String = "conf", labelCol: String = "label"): DataFrame = {
    require(bins >= 1, s"bins must be >= 1, got $bins")
    val b = greatest(least(floor(col(confCol) * bins).cast("long"),
      lit(bins - 1L)), lit(0L))
    preds.select(b.as("bin"), col(labelCol).cast("long").as("__y"))
      .groupBy("bin").agg(count(lit(1)).as("n"), sum("__y").as("n_pos"))
  }

  /** [[calibrationBins]] as a pure function of an accumulated (bin, n,
    * n_pos) count table (batch or streaming-folded — one implementation
    * for both planes). */
  def calibrationBinsFromCounts(counts: DataFrame, bins: Int): DataFrame = {
    require(bins >= 1, s"bins must be >= 1, got $bins")
    val acc = col("n_pos").cast("double") / col("n").cast("double")
    val mid = (lit(2L) * col("bin") + lit(1L)).cast("double") /
      lit(2.0 * bins)
    counts.select(col("bin"), col("n"), col("n_pos"), acc.as("acc"),
      mid.as("conf_mid"), abs(acc - mid).as("gap"))
  }

  /** Expected calibration error over [[calibrationBins]]: ECE =
    * Σ_b n_b·gap_b / N. The weighted sum folds over the BIN-SORTED array
    * (the AUC/nDCG 0.0-seeded index-order fold) so the double additions
    * happen in the same order on every engine and partitioning; the final
    * division is the only other float op. One output row (n_total, ece). */
  def ece(preds: DataFrame, bins: Int = 10, confCol: String = "conf",
      labelCol: String = "label"): DataFrame = {
    val cb = calibrationBins(preds, bins, confCol, labelCol)
    val ws = aggregate(
      sort_array(collect_list(struct(col("bin"), col("n"), col("gap")))),
      lit(0.0),
      (acc, e) => acc + e.getField("n").cast("double") * e.getField("gap"))
    cb.agg(sum("n").as("n_total"), ws.as("__ws"))
      .select(col("n_total"),
        (col("__ws") / col("n_total").cast("double")).as("ece"))
  }

  /** Self-consistency MAJORITY VOTE (Wang et al. 2022, "Self-Consistency
    * Improves Chain of Thought Reasoning"): per task, the modal answer
    * over its n samples — ties break to the SMALLEST answer
    * (deterministic on any engine and partitioning) — plus the consensus
    * share and whether the vote hits the task's gold answer (`goldCol`
    * must be task-constant; the max over the task is taken). Output:
    * taskCols, n_samples, modal_answer, modal_count, consensus
    * (modal/n — a single IEEE division of exact longs), correct.
    *
    * Scale shape: two map-side-combined exchanges — (task, answer)
    * counts, then the task roll-up where the argmax rides ONE struct-MIN
    * of (−count, answer) (lexicographic min ⇒ count desc, answer asc; no
    * window, no sort, no per-task state beyond the running min). */
  def majorityVote(samples: DataFrame, taskCols: Seq[String] = Seq("task_id"),
      answerCol: String = "answer", goldCol: String = "gold"): DataFrame = {
    require(taskCols.nonEmpty, "taskCols must be non-empty")
    val perAns = samples.groupBy((taskCols :+ answerCol).map(col): _*)
      .agg(count(lit(1)).as("__cnt"), max(col(goldCol)).as("__g"))
    perAns.groupBy(taskCols.map(col): _*)
      .agg(
        sum("__cnt").as("n_samples"),
        min(struct((-col("__cnt")).as("nc"), col(answerCol).as("a")))
          .as("__m"),
        max(col("__g")).as("__gold"))
      .select(taskCols.map(col) ++ List(
        col("n_samples"),
        col("__m.a").as("modal_answer"),
        (-col("__m.nc")).as("modal_count"),
        ((-col("__m.nc")).cast("double") / col("n_samples").cast("double"))
          .as("consensus"),
        (col("__m.a") === col("__gold")).as("correct")): _*)
  }

  /** The divisibility-exact integer binomial C(m, k) as a k-step fold:
    * acc ← acc·(m−k+j) ÷ j for j = 1..k. Every prefix product of j
    * consecutive integers divides j!, so each integer division is exact —
    * including the m < k case (a zero factor collapses to C = 0) and its
    * negative intermediates, where exactness makes floor and truncation
    * division identical. k = 0 short-circuits to 1 — Spark's sequence(1,
    * 0) counts DOWN ([1, 0], a ÷0 trap), it never means "empty" here.
    * Shared by [[passAtK]] and [[bestOfN]]. */
  private def binomFold(m: org.apache.spark.sql.Column,
      k: Int): org.apache.spark.sql.Column = {
    require(k >= 0, s"k must be >= 0, got $k")
    def intDiv(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      org.apache.spark.sql.GraftBridge.column(
        org.apache.spark.sql.catalyst.expressions.IntegralDivide(
          org.apache.spark.sql.GraftBridge.expression(a),
          org.apache.spark.sql.GraftBridge.expression(b)))
    if (k == 0) lit(1L)
    else aggregate(sequence(lit(1L), lit(k.toLong)), lit(1L),
      (acc, j) => intDiv(acc * (m - lit(k.toLong) + j), j))
  }

  /** BEST-OF-N EXPECTED-MAX CURVE (the BoN estimator of Nakano et al.
    * 2021 appx. / Gao et al. 2022, "Scaling Laws for Reward Model
    * Overoptimization"): per task with n integer-scored samples, the
    * expected MAXIMUM score of a uniformly random k-subset, for each
    * requested k — the unbiased "what does best-of-k buy me" curve read
    * off one sample set instead of resampling:
    * E[max] = Σ_i s_(i) · C(i−1, k−1) / C(n, k), scores sorted ascending.
    * NULL when the task has fewer than k samples.
    *
    * Exact: the weighted sum runs over the score-SORTED array with
    * [[binomFold]] coefficients — every term a long — and divides ONCE by
    * C(n, k). Long bound: Σ s·C(n−1, k−1) must stay under 2⁶³ (integer
    * scores, eval-harness n and k — tens of samples, k ≤ 10 — leave
    * orders of magnitude of headroom).
    *
    * Scale shape: one map-side-combined exchange on the task key; the
    * per-task state is the n-bounded score list (samples per prompt, not
    * corpus-sized), the fold O(n·k) per output row. */
  def bestOfN(samples: DataFrame, ks: Seq[Int],
      taskCols: Seq[String] = Seq("task_id"),
      scoreCol: String = "score"): DataFrame = {
    require(ks.nonEmpty && ks.forall(_ >= 1),
      s"ks must be non-empty positive, got $ks")
    require(taskCols.nonEmpty, "taskCols must be non-empty")
    val grouped = samples
      .select((taskCols.map(col) :+
        col(scoreCol).cast("long").as("__s")): _*)
      .groupBy(taskCols.map(col): _*)
      .agg(count(lit(1)).as("n_samples"),
        sort_array(collect_list(col("__s"))).as("__arr"))
    def num(k: Int) = aggregate(
      sequence(lit(1), size(col("__arr"))), lit(0L),
      (acc, i) => acc +
        element_at(col("__arr"), i) * binomFold((i - lit(1)).cast("long"), k - 1))
    grouped.select(taskCols.map(col) ++
      List(col("n_samples")) ++
      ks.map(k =>
        when(col("n_samples") < k, lit(null).cast("double"))
          .otherwise(num(k).cast("double") /
            binomFold(col("n_samples"), k).cast("double"))
          .as(s"best_of_$k")): _*)
  }

  /** WELCH TWO-SAMPLE A/B COMPARISON — the eval-harness primitive for
    * "is model/arm A actually better than B on this metric": per group,
    * both arms' counts, means, sample variances, the mean difference,
    * Welch's t statistic and its Satterthwaite degrees of freedom.
    * Callers integer-ize the metric first (the engine-wide exactBest /
    * dpoPairs score discipline): then every sufficient statistic (n, Σx,
    * Σx²) is an exact long, each variance is
    * (n·Σx² − (Σx)²) / (n·(n−1)) — integer numerator, one division —
    * and t / df are short fixed IEEE sequences whose only root is
    * `sqrt`, which IEEE 754 rounds CORRECTLY (unlike ln/exp) — so both
    * engines agree bit-for-bit with no rounding defense at all.
    *
    * Output: (groupCols..., n_a, n_b, mean_a, mean_b, diff, var_a,
    * var_b, t, df) — t and df NULL when either arm has < 2 samples or
    * both variances are 0 (degenerate).
    *
    * Scale shape: ONE map-side-combined exchange on (group, arm) then a
    * width-2 pivot per group — per-group state is six longs. */
  def abWelch(samples: DataFrame, groupCols: Seq[String] = Seq("metric"),
      armCol: String = "arm", valueCol: String = "value",
      armA: String = "a", armB: String = "b"): DataFrame = {
    require(groupCols.nonEmpty, "groupCols must be non-empty")
    val v = col(valueCol).cast("long")
    val perArm = samples.groupBy((groupCols :+ armCol).map(col): _*)
      .agg(count(lit(1)).as("__n"), sum(v).as("__s"),
        sum(v * v).as("__s2"))
    def side(tag: String, arm: String) = Seq(
      max(when(col(armCol) === arm, col("__n"))).as(s"__n$tag"),
      max(when(col(armCol) === arm, col("__s"))).as(s"__s$tag"),
      max(when(col(armCol) === arm, col("__s2"))).as(s"__q$tag"))
    val sa = side("a", armA)
    val sb = side("b", armB)
    val g = perArm.groupBy(groupCols.map(col): _*)
      .agg(sa.head, (sa.tail ++ sb): _*)
    def mean(t: String) = col(s"__s$t").cast("double") /
      col(s"__n$t").cast("double")
    // sample variance is undefined below two samples — NULL, never the
    // engine-divergent 0/0 NaN
    def vr(t: String) =
      when(col(s"__n$t") < 2L, lit(null).cast("double"))
        .otherwise(
          (col(s"__n$t") * col(s"__q$t") - col(s"__s$t") * col(s"__s$t"))
            .cast("double") /
            (col(s"__n$t") * (col(s"__n$t") - lit(1L))).cast("double"))
    val se2a = vr("a") / col("__na").cast("double")
    val se2b = vr("b") / col("__nb").cast("double")
    val degenerate = col("__na") < 2L || col("__nb") < 2L ||
      (se2a + se2b === 0.0)
    val t = (mean("a") - mean("b")) / sqrt(se2a + se2b)
    val df = (se2a + se2b) * (se2a + se2b) /
      (se2a * se2a / (col("__na") - lit(1L)).cast("double") +
        se2b * se2b / (col("__nb") - lit(1L)).cast("double"))
    g.filter(col("__na").isNotNull && col("__nb").isNotNull)
      .select(groupCols.map(col) ++ List(
        col("__na").as("n_a"), col("__nb").as("n_b"),
        mean("a").as("mean_a"), mean("b").as("mean_b"),
        (mean("a") - mean("b")).as("diff"),
        vr("a").as("var_a"), vr("b").as("var_b"),
        when(degenerate, lit(null).cast("double")).otherwise(t).as("t"),
        when(degenerate, lit(null).cast("double")).otherwise(df).as("df")): _*)
  }

  /** Exact ROC AUC of a scored, binary-labeled relation via the
    * Mann–Whitney rank-sum identity: AUC = (Σ ranks(positives) −
    * P(P+1)/2) / (P·N), ties resolved by AVERAGE rank (the textbook
    * estimator: P(s⁺ > s⁻) + ½·P(s⁺ = s⁻)) — the quality-filter /
    * classifier discrimination number an eval harness reports. Output is
    * ONE row: (n_pos, n_neg, auc); auc is NULL when either class is
    * empty (undefined).
    *
    * Exact by construction: per-score group g at cumulative offset C the
    * average rank is C + (g+1)/2, so DOUBLED rank sums stay integers —
    * S2 = Σ p_s·(2·C_s + g_s + 1) — and AUC = (S2 − P(P+1)) / (2·P·N) is
    * a SINGLE IEEE division of exact longs. The per-score fold runs over
    * the score-sorted array, identical on both engines.
    *
    * Scale shape: ONE map-side-combined exchange keyed by score value,
    * then a single-row aggregate whose state is the per-score count
    * array. The contract: callers quantize the score first (a round-4 /
    * integer-bucket score) so the DISTINCT-SCORE relation is
    * vocabulary-sized — the collected fold array is bounded by it, the
    * same bounded-driver-state contract as the histogram-quantile bins.
    * Long bound: S2 ≤ 2·rows² keeps exact below ~3·10⁹ rows — eval sets,
    * not corpora; bucket scores coarser for more. */
  def aucRoc(scored: DataFrame, scoreCol: String = "score",
      labelCol: String = "label"): DataFrame = {
    val g = scored.groupBy(scoreCol).agg(
      sum(col(labelCol).cast("long")).as("__p"),
      (count(lit(1)) - sum(col(labelCol).cast("long"))).as("__q"))
    val arr = sort_array(collect_list(struct(
      col(scoreCol).as("s"), col("__p").as("p"), col("__q").as("q"))))
    val st = aggregate(arr,
      struct(lit(0L).as("cum"), lit(0L).as("s2"),
        lit(0L).as("tp"), lit(0L).as("tq")),
      (st, e) => struct(
        (st.getField("cum") + e.getField("p") + e.getField("q")).as("cum"),
        (st.getField("s2") + e.getField("p") *
          (lit(2L) * st.getField("cum") + e.getField("p") +
            e.getField("q") + lit(1L))).as("s2"),
        (st.getField("tp") + e.getField("p")).as("tp"),
        (st.getField("tq") + e.getField("q")).as("tq")))
    g.agg(st.as("__st"))
      .select(
        col("__st.tp").as("n_pos"),
        col("__st.tq").as("n_neg"),
        when(col("__st.tp") === 0L || col("__st.tq") === 0L,
          lit(null).cast("double"))
          .otherwise(
            (col("__st.s2") - col("__st.tp") * (col("__st.tp") + lit(1L)))
              .cast("double") /
              (lit(2L) * col("__st.tp") * col("__st.tq")).cast("double"))
          .as("auc"))
  }

  /** Corpus BLEU with JACKKNIFE ERROR BARS — the "is this BLEU delta
    * real" number: leave-one-pair-out scores θ_i recompute from the
    * pooled sums minus pair i's stats (pure arithmetic per row — no
    * second corpus pass), and the jackknife standard error
    * se = sqrt((n−1)/n · Σ(θ_i − θ̄)²) comes from EXACT integer sums of
    * the round-4 FIXED-POINT θ_i grid (s_i = ⌊θ_i·10⁴ + 0.499999⌋, the
    * StableRound lattice): Σs_i and Σs_i² are longs, so the variance
    * needs no order-dependent double summation — the only floats are
    * one correctly-rounded sqrt and a couple of exactly-rounded
    * products. θ_i whose leave-out pool zeroes any m_n score 0 (the
    * corpusBleu convention). Output is ONE row: (n_pairs, bleu, jk_mean,
    * jk_se, ci_lo, ci_hi — the ±1.96·se normal interval); se and the
    * interval are NULL below two pairs. Long-exactness bound:
    * n·Σs_i² < 2⁶³ holds to ~10⁹ pairs; the doubled product in the sqrt
    * stays inside 2⁵³ to ~10⁴ pairs — eval-set scale, documented.
    *
    * Scale shape: one map-side-combined 1-row total, broadcast back
    * across the pair stats (the 1-row-broadcast-stat pattern), one more
    * map-side-combined 1-row aggregate. */
  def corpusBleuJackknife(stats: DataFrame, maxN: Int = 4): DataFrame = {
    require(maxN >= 1, s"maxN must be >= 1, got $maxN")
    val tot = stats.agg(
      count(lit(1)).as("tn"),
      (sum("cand_len").as("tcand") :: sum("ref_len").as("tref") ::
        (1 to maxN).toList.flatMap(n =>
          List(sum(s"m$n").as(s"tm$n"), sum(s"c$n").as(s"tc$n")))): _*)
    val j = stats.crossJoin(broadcast(tot))
    def lm(n: Int) = col(s"tm$n") - col(s"m$n")
    def lc(n: Int) = col(s"tc$n") - col(s"c$n")
    val lcand = col("tcand") - col("cand_len")
    val lref = col("tref") - col("ref_len")
    val anyZero = (1 to maxN).map(n => lm(n) === 0L).reduce(_ || _) ||
      lcand === 0L
    val logSum = (1 to maxN).map(n =>
      log(lm(n).cast("double") / lc(n).cast("double"))).reduce(_ + _)
    val bp = when(lcand >= lref, lit(1.0))
      .otherwise(exp(lit(1.0) - lref.cast("double") / lcand.cast("double")))
    // the leave-out score directly on the StableRound fixed-point grid
    val si = when(anyZero, lit(0L)).otherwise(
      floor(bp * exp(logSum / lit(maxN.toDouble)) * lit(10000.0) +
        lit(0.499999)).cast("long"))
    val agg = j.select(si.as("__si"))
      .agg(count(lit(1)).as("n"), sum("__si").as("ss"),
        sum(col("__si") * col("__si")).as("ss2"))
    val full = corpusBleu(stats, maxN).select(col("n_pairs"), col("bleu"))
    // se² = (n−1)·(n·Σs² − (Σs)²) / (n²·10⁸)  ⇒  se = √(·)/(n·10⁴)
    val se = sqrt((col("n") - lit(1L)).cast("double") *
      (col("n") * col("ss2") - col("ss") * col("ss")).cast("double")) /
      col("n").cast("double") / lit(10000.0)
    full.crossJoin(broadcast(agg))
      .select(col("n_pairs"), col("bleu"),
        (col("ss").cast("double") / (col("n") * lit(10000L)).cast("double"))
          .as("jk_mean"),
        when(col("n") < 2L, lit(null).cast("double")).otherwise(se)
          .as("jk_se"),
        when(col("n") < 2L, lit(null).cast("double"))
          .otherwise(col("bleu") - lit(1.96) * se).as("ci_lo"),
        when(col("n") < 2L, lit(null).cast("double"))
          .otherwise(col("bleu") + lit(1.96) * se).as("ci_hi"))
  }

  /** McNEMAR TEST for PAIRED accuracy comparison — "are systems A and B
    * different on the SAME eval items": the unpaired [[abWelch]] wastes
    * the pairing; McNemar conditions on the discordant pairs only. Input
    * is one row per item with boolean correctness of each system; output
    * is ONE row: (n, n00, n01, n10, n11, chi2) where n01 = A wrong ∧ B
    * right, n10 = A right ∧ B wrong, and chi2 is the Edwards
    * continuity-corrected statistic (max(|n10−n01|−1, 0))² / (n10+n01)
    * (≈χ²₁; 3.84 ≈ p 0.05). chi2 is NULL when no discordant pairs exist
    * (the test is undefined — the systems agree everywhere).
    *
    * Exact by construction: four long counts, an integer numerator, ONE
    * division — both engines agree bit-for-bit. Zero-row input yields
    * the zero-count row (sums coalesced — the corpusBleuFromSums
    * lesson), not NULLs.
    *
    * Scale shape: ONE map-side-combined aggregate to a single row. */
  def mcnemar(pairs: DataFrame, aCol: String = "correct_a",
      bCol: String = "correct_b"): DataFrame = {
    val a = col(aCol).cast("boolean")
    val b = col(bCol).cast("boolean")
    def cnt(p: org.apache.spark.sql.Column, as: String) =
      coalesce(sum(when(p, 1L).otherwise(0L)), lit(0L)).as(as)
    // NULL policy: an item with NULL correctness on EITHER side is excluded
    // from the test entirely (it can be classified into no contingency
    // cell); without the filter, `n` would count it while every cell's
    // `when` evaluates NULL -> otherwise(0) and the cells silently fail to
    // sum to n
    val g = pairs.filter(a.isNotNull && b.isNotNull).agg(
      count(lit(1)).as("n"),
      cnt(!a && !b, "n00"), cnt(!a && b, "n01"),
      cnt(a && !b, "n10"), cnt(a && b, "n11"))
    val disc = col("n01") + col("n10")
    val num = greatest(abs(col("n10") - col("n01")) - lit(1L), lit(0L))
    g.select(col("n"), col("n00"), col("n01"), col("n10"), col("n11"),
      when(disc === 0L, lit(null).cast("double"))
        .otherwise((num * num).cast("double") / disc.cast("double"))
        .as("chi2"))
  }

  /** PAIRED APPROXIMATE-RANDOMIZATION significance test for corpus BLEU
    * (Koehn 2004, "Statistical Significance Tests for Machine Translation
    * Evaluation"; Noreen 1989) — the right test for "is system A's BLEU
    * really above system B's" when both ran the SAME eval set: under the
    * null the two systems are exchangeable per item, so each resample
    * swaps A↔B stats independently per pair and the p-value is the share
    * of resampled |ΔBLEU| at or above the observed |ΔBLEU| (with the
    * standard +1 smoothing: p = (#{|Δ_r| ≥ |Δ_obs|} + 1) / (R + 1)).
    *
    * Determinism discipline: the per-(pair, resample) swap decision is a
    * pure function of (id, r, seed) through the engine's portable hash —
    * both engines enumerate the SAME R resamples, so the p-value is an
    * exact integer count, not a Monte-Carlo approximation that merely
    * converges. Each resampled BLEU lands on the round-4 FIXED-POINT grid
    * first (the [[corpusBleuJackknife]] lattice: s = ⌊bleu·10⁴+0.499999⌋,
    * an exact long), so Δ comparisons are LONG comparisons — no
    * float-boundary skew can flip a count.
    *
    * `statsA` / `statsB` are [[generationPairStats]]-shaped relations of
    * the two systems against the shared references, joined on `idCol`
    * (inner — items missing from either side drop, they aren't paired).
    * Output is ONE row: (n_pairs, bleu_a, bleu_b, delta, resamples,
    * p_value).
    *
    * Scale shape: the pair relation fans out ×(R+1) against a broadcast
    * resample index (the one deliberate expansion — R is bounded, ~10²–10³,
    * and eval sets are corpus-card-scale, not corpus-scale), collapses in
    * ONE map-side-combined exchange keyed by r (R+1 groups), and the rest
    * is arithmetic on an (R+1)-row relation + a 1-row broadcast compare. */
  def pairedBleuSignificance(statsA: DataFrame, statsB: DataFrame,
      resamples: Int, seed: Long = 42, maxN: Int = 4,
      idCol: String = "doc_id"): DataFrame = {
    require(resamples >= 1, s"resamples must be >= 1, got $resamples")
    require(maxN >= 1, s"maxN must be >= 1, got $maxN")
    val statNames = "cand_len" :: "ref_len" ::
      (1 to maxN).toList.flatMap(n => List(s"m$n", s"c$n"))
    def side(df: DataFrame, t: String) = df.select(
      col(idCol) +: statNames.map(n => col(n).as(s"${t}_$n")): _*)
    // persisted (pair-count-sized, eval-set scale): the ×(R+1) fan-out
    // below would otherwise RE-EVALUATE the per-pair stat computation per
    // resample row (Catalyst collapses the projection through the
    // crossJoin) — measured 13.7 s → 1.3 s on the mean variant's dropout
    // scores. Callers owning long-lived sessions clearCache.
    val joined = side(statsA, "a").join(side(statsB, "b"), Seq(idCol))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val spark = statsA.sparkSession
    // r = 0 is the OBSERVED assignment (never swapped); r = 1..R swap
    // per pair by the chained portable hash of (id, r)
    val rs = broadcast(spark.range(0L, resamples + 1L).toDF("__r"))
    val flip = col("__r") > 0L &&
      pmod(Sampling.hashRaw(
        Sampling.hashRaw(col(idCol), seed) + col("__r"), seed * 31 + 7),
        lit(2L)) === 1L
    val aggs = statNames.flatMap { nm => List(
      sum(when(flip, col(s"b_$nm")).otherwise(col(s"a_$nm"))).as(s"a_$nm"),
      sum(when(flip, col(s"a_$nm")).otherwise(col(s"b_$nm"))).as(s"b_$nm"))
    }
    val sums = joined.crossJoin(rs).groupBy("__r")
      .agg(count(lit(1)).as("n"), aggs: _*)
    // the corpusBleu arithmetic straight onto the fixed-point grid
    def si(t: String) = {
      val anyZero = (1 to maxN).map(n => col(s"${t}_m$n") === 0L)
        .reduce(_ || _) || col(s"${t}_cand_len") === 0L
      val logSum = (1 to maxN).map(n =>
        log(col(s"${t}_m$n").cast("double") /
          col(s"${t}_c$n").cast("double"))).reduce(_ + _)
      val bp = when(col(s"${t}_cand_len") >= col(s"${t}_ref_len"), lit(1.0))
        .otherwise(exp(lit(1.0) - col(s"${t}_ref_len").cast("double") /
          col(s"${t}_cand_len").cast("double")))
      when(anyZero, lit(0L)).otherwise(
        floor(bp * exp(logSum / lit(maxN.toDouble)) * lit(10000.0) +
          lit(0.499999)).cast("long"))
    }
    // persisted ((R+1)-row): the observed row and the resample scan both
    // read it — without the cache the whole fan-out aggregation runs twice
    val perR = sums.select(col("__r"), col("n"),
      si("a").as("__sa"), si("b").as("__sb"))
      .withColumn("__d", col("__sa") - col("__sb"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val obs = perR.filter(col("__r") === 0L).select(
      col("n").as("n_pairs"), col("__sa").as("__oa"),
      col("__sb").as("__ob"), col("__d").as("__od"))
    // empty-pair convention (the corpusBleuFromSums lesson): an empty inner
    // join collapses perR to zero rows and the ungrouped agg would emit one
    // all-NULL row — coalesce every agg output so the result is the DEFINED
    // zero row (n_pairs 0, scores 0.0, resamples 0, p_value 1.0)
    perR.filter(col("__r") > 0L).crossJoin(broadcast(obs))
      .agg(coalesce(max(col("n_pairs")), lit(0L)).as("n_pairs"),
        coalesce(max(col("__oa")), lit(0L)).as("__oa"),
        coalesce(max(col("__ob")), lit(0L)).as("__ob"),
        coalesce(max(col("__od")), lit(0L)).as("__od"),
        count(lit(1)).as("resamples"),
        coalesce(sum(when(abs(col("__d")) >= abs(col("__od")), 1L)
          .otherwise(0L)), lit(0L)).as("__ge"))
      .select(col("n_pairs"),
        (col("__oa").cast("double") / lit(10000.0)).as("bleu_a"),
        (col("__ob").cast("double") / lit(10000.0)).as("bleu_b"),
        (col("__od").cast("double") / lit(10000.0)).as("delta"),
        col("resamples"),
        ((col("__ge") + lit(1L)).cast("double") /
          (col("resamples") + lit(1L)).cast("double")).as("p_value"))
  }

  /** [[pairedBleuSignificance]] for corpus chrF2 — the same hash-gated
    * per-pair swap machinery over [[chrFPairStats]] relations: per
    * resample the pooled per-order clipped sums recompute [[corpusChrF]]'s
    * exact arithmetic, each score lands on the round-4 fixed-point grid,
    * and p is the exact integer exceedance count. Output:
    * (n_pairs, chrf_a, chrf_b, delta, resamples, p_value). Same scale
    * shape: pairs × (R+1) against a broadcast index, ONE map-side-combined
    * exchange keyed by r. */
  def pairedChrFSignificance(statsA: DataFrame, statsB: DataFrame,
      resamples: Int, seed: Long = 42, maxN: Int = 6,
      idCol: String = "doc_id"): DataFrame = {
    require(resamples >= 1, s"resamples must be >= 1, got $resamples")
    require(maxN >= 1, s"maxN must be >= 1, got $maxN")
    val statNames = "cand_chars" :: "ref_chars" ::
      (1 to maxN).toList.flatMap(n => List(s"mc$n", s"cc$n", s"rc$n"))
    def side(df: DataFrame, t: String) = df.select(
      col(idCol) +: statNames.map(n => col(n).as(s"${t}_$n")): _*)
    // persisted pair-sized + (R+1)-row relations — the
    // pairedBleuSignificance cache rationale (no per-resample stat
    // recompute, no double fan-out pass)
    val joined = side(statsA, "a").join(side(statsB, "b"), Seq(idCol))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val spark = statsA.sparkSession
    val rs = broadcast(spark.range(0L, resamples + 1L).toDF("__r"))
    val flip = col("__r") > 0L &&
      pmod(Sampling.hashRaw(
        Sampling.hashRaw(col(idCol), seed) + col("__r"), seed * 31 + 7),
        lit(2L)) === 1L
    val aggs = statNames.flatMap { nm => List(
      sum(when(flip, col(s"b_$nm")).otherwise(col(s"a_$nm"))).as(s"a_$nm"),
      sum(when(flip, col(s"a_$nm")).otherwise(col(s"b_$nm"))).as(s"b_$nm"))
    }
    val sums = joined.crossJoin(rs).groupBy("__r")
      .agg(count(lit(1)).as("n"), aggs: _*)
    // corpusChrF's arithmetic onto the fixed-point grid
    def si(t: String) = {
      def ratio(num: org.apache.spark.sql.Column,
          den: org.apache.spark.sql.Column) =
        when(den === 0L, lit(0.0))
          .otherwise(num.cast("double") / den.cast("double"))
      val p = (1 to maxN).map(n =>
        ratio(col(s"${t}_mc$n"), col(s"${t}_cc$n"))).reduce(_ + _) /
        lit(maxN.toDouble)
      val r = (1 to maxN).map(n =>
        ratio(col(s"${t}_mc$n"), col(s"${t}_rc$n"))).reduce(_ + _) /
        lit(maxN.toDouble)
      val chrf = when(lit(4.0) * p + r === 0.0, lit(0.0))
        .otherwise(lit(5.0) * p * r / (lit(4.0) * p + r))
      floor(chrf * lit(10000.0) + lit(0.499999)).cast("long")
    }
    val perR = sums.select(col("__r"), col("n"),
      si("a").as("__sa"), si("b").as("__sb"))
      .withColumn("__d", col("__sa") - col("__sb"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val obs = perR.filter(col("__r") === 0L).select(
      col("n").as("n_pairs"), col("__sa").as("__oa"),
      col("__sb").as("__ob"), col("__d").as("__od"))
    // empty-pair convention: see pairedBleuSignificance — defined zero row
    perR.filter(col("__r") > 0L).crossJoin(broadcast(obs))
      .agg(coalesce(max(col("n_pairs")), lit(0L)).as("n_pairs"),
        coalesce(max(col("__oa")), lit(0L)).as("__oa"),
        coalesce(max(col("__ob")), lit(0L)).as("__ob"),
        coalesce(max(col("__od")), lit(0L)).as("__od"),
        count(lit(1)).as("resamples"),
        coalesce(sum(when(abs(col("__d")) >= abs(col("__od")), 1L)
          .otherwise(0L)), lit(0L)).as("__ge"))
      .select(col("n_pairs"),
        (col("__oa").cast("double") / lit(10000.0)).as("chrf_a"),
        (col("__ob").cast("double") / lit(10000.0)).as("chrf_b"),
        (col("__od").cast("double") / lit(10000.0)).as("delta"),
        col("resamples"),
        ((col("__ge") + lit(1L)).cast("double") /
          (col("resamples") + lit(1L)).cast("double")).as("p_value"))
  }

  /** PAIRED approximate-randomization test for a generic PER-ITEM integer
    * metric (exact-match scores, pass rates, token budgets, latencies on a
    * fixed grid) — [[pairedBleuSignificance]]'s machinery with the mean
    * difference as the statistic: per resample each item's (a, b) scores
    * swap by the same chained-portable-hash gate, and because n is fixed
    * the comparison reduces to the SUM difference D_r = Σa′ − Σb′ — an
    * EXACT LONG, so exceedance counting has no float boundary at all
    * (tighter even than the BLEU variant's fixed-point grid). Callers
    * integer-ize the metric first (the [[abWelch]] discipline).
    *
    * Output is ONE row: (n_pairs, mean_a, mean_b, diff, resamples,
    * p_value) — means and diff are single divisions of exact longs,
    * p = (#{|D_r| ≥ |D_obs|} + 1) / (R + 1) one division of exact counts.
    *
    * Scale shape: identical to the BLEU variant — pairs × (R+1) against a
    * broadcast resample index, ONE map-side-combined exchange keyed by r,
    * then arithmetic on an (R+1)-row relation. */
  def pairedMeanSignificance(pairs: DataFrame, resamples: Int,
      seed: Long = 42, idCol: String = "doc_id", aCol: String = "score_a",
      bCol: String = "score_b"): DataFrame = {
    require(resamples >= 1, s"resamples must be >= 1, got $resamples")
    val spark = pairs.sparkSession
    val rs = broadcast(spark.range(0L, resamples + 1L).toDF("__r"))
    val flip = col("__r") > 0L &&
      pmod(Sampling.hashRaw(
        Sampling.hashRaw(col(idCol), seed) + col("__r"), seed * 31 + 7),
        lit(2L)) === 1L
    // persisted (pair-count-sized): without the barrier Catalyst inlines
    // the caller's score expressions through the crossJoin and recomputes
    // them per (pair, resample) row — the bench caught the dropout-score
    // fixture at 13.7 s; with the cache it is one pass over the pairs
    val base = pairs.select(col(idCol),
      col(aCol).cast("long").as("__a"), col(bCol).cast("long").as("__b"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // persisted ((R+1)-row): read by both the observed row and the
    // resample exceedance scan
    val perR = base.crossJoin(rs).groupBy("__r").agg(
        count(lit(1)).as("n"),
        sum(when(flip, col("__b")).otherwise(col("__a"))).as("__sa"),
        sum(when(flip, col("__a")).otherwise(col("__b"))).as("__sb"))
      .withColumn("__d", col("__sa") - col("__sb"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val obs = perR.filter(col("__r") === 0L).select(
      col("n").as("n_pairs"), col("__sa").as("__oa"),
      col("__sb").as("__ob"), col("__d").as("__od"))
    // empty-pair convention: see pairedBleuSignificance — defined zero row
    // (the n_pairs=0 division guard keeps means at 0.0, not IEEE NaN)
    perR.filter(col("__r") > 0L).crossJoin(broadcast(obs))
      .agg(coalesce(max(col("n_pairs")), lit(0L)).as("n_pairs"),
        coalesce(max(col("__oa")), lit(0L)).as("__oa"),
        coalesce(max(col("__ob")), lit(0L)).as("__ob"),
        coalesce(max(col("__od")), lit(0L)).as("__od"),
        count(lit(1)).as("resamples"),
        coalesce(sum(when(abs(col("__d")) >= abs(col("__od")), 1L)
          .otherwise(0L)), lit(0L)).as("__ge"))
      .select(col("n_pairs"),
        when(col("n_pairs") === 0L, lit(0.0))
          .otherwise(col("__oa").cast("double") / col("n_pairs").cast("double"))
          .as("mean_a"),
        when(col("n_pairs") === 0L, lit(0.0))
          .otherwise(col("__ob").cast("double") / col("n_pairs").cast("double"))
          .as("mean_b"),
        when(col("n_pairs") === 0L, lit(0.0))
          .otherwise(col("__od").cast("double") / col("n_pairs").cast("double"))
          .as("diff"),
        col("resamples"),
        ((col("__ge") + lit(1L)).cast("double") /
          (col("resamples") + lit(1L)).cast("double")).as("p_value"))
  }

  /** Per-pair ROUGE scores (Lin 2004) over a [[generationPairStats]]
    * output: ROUGE-1 / ROUGE-2 precision, recall and F1 from the clipped
    * n-gram counts, and ROUGE-L from the LCS length — one row per pair,
    * the exact counts carried alongside so the scores audit themselves.
    *
    * Every ratio is a SINGLE IEEE division of exact longs (F1 collapses
    * algebraically to 2m/(c+r) — never the P·R composite, which would
    * stack three divisions) so both engines agree with no rounding.
    * Zero denominators score 0.0. Pure narrow column math over the stats
    * relation: no shuffle at any scale. */
  def rougeScores(stats: DataFrame, idCol: String = "doc_id"): DataFrame = {
    def ratio(num: org.apache.spark.sql.Column,
        den: org.apache.spark.sql.Column) =
      when(den === 0L, lit(0.0)).otherwise(num.cast("double") / den.cast("double"))
    def triple(m: String, c: String, r: String, tag: String) = List(
      ratio(col(m), col(c)).as(s"rouge${tag}_p"),
      ratio(col(m), col(r)).as(s"rouge${tag}_r"),
      ratio(col(m) * lit(2L), col(c) + col(r)).as(s"rouge${tag}_f"))
    stats.select(
      (col(idCol) :: col("m1") :: col("c1") :: col("r1") ::
        col("m2") :: col("c2") :: col("r2") ::
        col("lcs") :: col("cand_len") :: col("ref_len") ::
        triple("m1", "c1", "r1", "1")) :::
        triple("m2", "c2", "r2", "2") :::
        triple("lcs", "cand_len", "ref_len", "l"): _*)
  }
}
