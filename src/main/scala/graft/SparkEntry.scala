package graft

import graft.model.{AggregationSpec, RollupSpec}
import graft.functions.SubwordExpressions
import graft.operators.{Anomaly, Classify, Dedup, Eval, FuzzyString, GapFill, HeavyHitters, Layout, Lineage, Multimodal, Preference, Profiling, Relational, Sampling, Sessions, Similarity, Sketches, Snapshot, TextAnalysis}
import graft.plan.RuleCompiler
import graft.sources.{EnvelopeJson, EventsAdapter, ScanParallelism}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — one `queries` entry per implemented operator from
  * SURVEY.md §2 (plus the training-data-pipeline extensions), each with a
  * DuckDB oracle over the same parquet tables where SQL-expressible.
  *
  * Float determinism policy: outputs that are order-INdependent (counts,
  * min/max, exact integer ratios, delta/rate on bit-identical timestamp
  * doubles) are emitted unrounded; order-dependent double sums/avgs are
  * rounded to 2 decimals on both sides. The oracle timestamp expression
  * `((epoch_us(..)/1000000.0)*1000)` replicates Spark's
  * cast(timestamp→double)·1000 IEEE op sequence bit-for-bit.
  */
object SparkEntry {

  private val HOUR = 3600L
  private val DAY = 86400L

  // ------------------------------------------------------------ inputs

  private def envs(s: SparkSession, dir: String): DataFrame =
    EventsAdapter.envelopes(s, dir)
  /** `floored = true` applies the scan-parallelism floor
    * ([[graft.sources.ScanParallelism]]). SELECTIVE by measurement, not
    * blanket: the r17 full-sweep A/B showed the floor winning 0.4–4.4 s on
    * ~40 heavy narrow-chain queries (tokenize/explode, codec walks, pair
    * machinery) but TAXING the ~80 already-sub-second queries 0.2–0.9 s
    * each (one extra exchange + 32-way trivial-task scheduling), a net
    * wash. Each query opts in where profiling showed single-core
    * starvation; the default stays the bare scan. */
  private def docs(s: SparkSession, dir: String,
      floored: Boolean = false): DataFrame =
    if (floored) ScanParallelism.flooredParquet(s, s"$dir/documents.parquet")
    else s.read.parquet(s"$dir/documents.parquet")
  private def emb(s: SparkSession, dir: String,
      floored: Boolean = false): DataFrame =
    if (floored) ScanParallelism.flooredParquet(s, s"$dir/embeddings.parquet")
    else s.read.parquet(s"$dir/embeddings.parquet")

  /** URL-blocklist config for the text_urls / text_domain_filter queries:
    * doc_id%5==0 is hit by the EXACT rule, %5==1 by the SUBDOMAIN-suffix
    * rule, and example.org is a deliberate non-match against the fixture's
    * *.example.com URLs. Single source for both engines' predicates. */
  private val UrlBlocklist = Seq("ads.tracker0.net", "tracker1.net", "example.org")

  /** The testdata corpus has no URLs, so the URL queries append two
    * deterministic ones per doc — a per-source www domain and a rotating
    * tracker domain (text/source coalesced; see dedup_lines on NULL rows). */
  private def urlDocs(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).withColumn("text", concat(
      coalesce(col("text"), lit("")),
      lit(" Visit https://www."), coalesce(col("source"), lit("")),
      lit(".example.com/a/"), (col("doc_id") % 7).cast("string"),
      lit(" or http://ads.tracker"), (col("doc_id") % 5).cast("string"),
      lit(".net/x")))

  /** URL-canonicalization dedup fixture: one synthetic source URL per doc
    * with every canonicalization hazard planted — mixed-case host, a
    * trailing slash on even ids, utm/fbclid tracking params interleaved
    * with a REAL param (`id=` must survive the strip), and a fragment.
    * Canonical key = (source, doc_id%7, doc_id%7) → planted dup groups.
    * Single source for both engines (the SQL twin respells it verbatim). */
  private def urlDupDocs(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(col("doc_id"), concat(
      lit("https://WWW."), coalesce(col("source"), lit("")),
      lit(".Example.COM/a/"), (col("doc_id") % 7).cast("string"),
      when(col("doc_id") % 2 === 0, lit("/")).otherwise(lit("")),
      lit("?utm_source=s"), (col("doc_id") % 3).cast("string"),
      lit("&id="), (col("doc_id") % 7).cast("string"),
      when(col("doc_id") % 3 === 0, lit("&fbclid=zz")).otherwise(lit("")),
      lit("#sec"), (col("doc_id") % 2).cast("string")).as("url"))

  /** C4-cleaning fixture: the testdata text is punctuation-free word soup,
    * so the query builds a deterministic multi-line "web page" around it —
    * a body sentence (first 8 space-separated pieces + '.'), a
    * please-enable-JavaScript line (always dropped), a one-word "Menu" line
    * (always dropped), a per-source sentence, a code line with '{' on
    * doc_id%37 (kills keep_doc), a lorem-ipsum line on doc_id%41 (kept as a
    * line, kills keep_doc) and a badge line ending in '!' — exercising every
    * line rule and every document rule in both directions. */
  private def c4Docs(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).withColumn("text", concat_ws("\n",
      concat(array_join(slice(split(coalesce(col("text"), lit("")), " "), 1, 8), " "),
        lit(".")),
      lit("Please enable JavaScript to view the comments."),
      lit("Menu"),
      concat(lit("Source "), coalesce(col("source"), lit("")),
        lit(" delivers honest daily articles.")),
      when(col("doc_id") % 37 === 0, lit("if (config) { render(); }"))
        .otherwise(lit("A perfectly ordinary closing sentence appears right here.")),
      when(col("doc_id") % 41 === 0,
        lit("Lorem ipsum dolor sit amet, consectetur adipiscing elit."))
        .otherwise(lit("Here is another honest sentence for the cleaner.")),
      concat(lit("Badge "), (col("doc_id") % 5).cast("string"),
        lit(" reporting in today!"))))

  /** Duplicated-span fixture: random word soup almost never repeats a
    * 5-gram across documents, so the query appends shared boilerplate tails
    * — an 11-token newsletter pitch on doc_id%4 and an 11-token copyright
    * notice on doc_id%10<2 (docs on both get adjacent spans whose bridging
    * shingles are duplicated too) — giving every df regime: unique body,
    * hot tails, and partial interval overlap. */
  private def spanDocs(s: SparkSession, dir: String,
      floored: Boolean = false): DataFrame =
    docs(s, dir, floored).withColumn("text", concat(
      coalesce(col("text"), lit("")),
      when(col("doc_id") % 4 === 0,
        lit(" subscribe to our newsletter for weekly updates and exclusive offers today"))
        .otherwise(lit("")),
      when(col("doc_id") % 10 < 2,
        lit(" all rights reserved copyright twenty twenty six by the site owners"))
        .otherwise(lit(""))))

  /** Pipeline-composition fixture: a deterministic multi-line "web page" per
    * document — two unique body sentences (tokens 1-24 and 25-44 of the
    * corpus text, each closed with '.'), a please-enable-JavaScript line and
    * a one-word "Menu" line (both dropped by the C4 stage), a per-source
    * closing note (hot in the line-dedup stage), a code line with '{' on
    * doc_id%37 (kills the C4 keep_doc rule), a global rights footer and a
    * rotating badge line (both hot) — so every chained stage has work to do
    * in both directions. */
  private def pipeDocs(s: SparkSession, dir: String,
      floored: Boolean = false): DataFrame =
    docs(s, dir, floored).withColumn("text", concat_ws("\n",
      concat(array_join(slice(split(coalesce(col("text"), lit("")), " "), 1, 24), " "),
        lit(".")),
      lit("Please enable JavaScript to view the comments."),
      lit("Menu"),
      concat(array_join(slice(split(coalesce(col("text"), lit("")), " "), 25, 20), " "),
        lit(".")),
      when(col("doc_id") % 37 === 0, lit("if (config) { render(); }"))
        .otherwise(concat(lit("Closing note from "), coalesce(col("source"), lit("")),
          lit(" desk."))),
      lit("All rights reserved by the site owners."),
      concat(lit("Badge "), (col("doc_id") % 5).cast("string"),
        lit(" reporting in today!"))))

  /** The pipeline_e2e near-dup pair stage. maxDocFreq caps the shingle
    * document-frequency BEFORE the pair self-join: a shingle shared by d docs
    * contributes O(d²) join rows, so one hot shingle (boilerplate, stop-word
    * run) makes its bucket quadratic at 100×. The capped path anti-joins hot
    * shingles away (broadcast) and recounts set sizes, keeping every join
    * bucket ≤ maxDocFreq wide. Named (not inlined in the query) so PlanSpec
    * pins the anti-join on THIS function — the one the composition executes. */
  private[graft] def pipelinePairs(decontaminated: DataFrame): DataFrame =
    Dedup.ngramJaccardPairs(decontaminated, 3, 0.5, maxDocFreq = 4)

  private def spec(fn: String, metricName: String,
      grouped: Seq[String] = Seq("user_id"),
      filtered: Map[String, String] = Map.empty,
      rejected: Map[String, String] = Map.empty,
      roll: Option[RollupSpec] = None): AggregationSpec =
    AggregationSpec(name = s"q_${metricName}_$fn", function = fn,
      filteredMetricName = metricName, filteredDimensions = filtered,
      rejectedDimensions = rejected, groupedDimensions = grouped,
      aggregatedMetricName = s"agg_${metricName}_$fn", rollup = roll)

  /** Cross-engine-stable 2-decimal rounding: Spark's round() (BigDecimal
    * HALF_UP on the binary value) and DuckDB's ROUND (multiply-based) disagree
    * when the exact value sits on a half-cent boundary — which avg() of
    * 2-decimal prices hits constantly. floor(x*100 + 0.5 − 1e-6) moves the
    * boundary 1e-6 off the lattice: cross-engine noise is ~1e-11 and genuine
    * non-boundary values sit ≥ ~1e-4 away, so both engines always agree.
    * Mirrored by sqlRound2 below. */
  private def safeRound2(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    floor(c * lit(100.0) + lit(0.499999)) / lit(100.0)

  /** 4-decimal boundary-stable rounding for every oracle-compared column
    * derived from a transcendental (ln/log/exp): each engine's libm is a
    * ≤1-ulp implementation, so the SAME expression can straddle a `.xxxx5`
    * boundary differently across builds — the r13 `text_pmi` flake class.
    * Delegates to [[graft.functions.StableRound.round4]]; mirrored by
    * sqlRound4 below (the two must move together). */
  private def safeRound4(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    graft.functions.StableRound.round4(c)

  /** Grouped parity query: purchases per user per tumbling window. */
  private def groupedQ(fn: String, windowSec: Long, round2: Boolean)(
      s: SparkSession, dir: String): DataFrame = {
    val out = RuleCompiler.compileGrouped(spec(fn, "purchase"), windowSec)(envs(s, dir))
    val v = if (round2) safeRound2(col("agg_value")) else col("agg_value")
    out.select(col("w.start").cast("long").as("window_start"), col("tenant_id"),
      col("dim_user_id").as("user_id"), v.as("value"))
  }

  /** Filter-only parity query (exercises prepare()'s F1–F4 compilation). */
  private def filterQ(sp: AggregationSpec)(s: SparkSession, dir: String): DataFrame =
    RuleCompiler.prepare(sp)(envs(s, dir))
      .select(col("dim_event_id").cast("long").as("event_id"), col("value"))

  // --------------------------------------------------- oracle SQL helpers

  /** The engine-wide whitespace character SET, as the raw characters embedded
    * in a DuckDB single-quoted literal: every oracle `trim` must be the
    * set-trim `trim(x, '$SqlWs')` — DuckDB's one-arg `trim` strips spaces
    * only, exactly like Spark's, and both engines must move together on the
    * unified [\t\n\f\r ] contract (whitespace-only text ⇒ 0 tokens). */
  private val SqlWs = TextAnalysis.WsCharsRaw

  private val TsUs = "epoch_us(CAST(ts AS TIMESTAMP))"
  /** Bit-exact mirror of Spark's (cast(ts as double) * 1000). */
  private val TsMs = s"(($TsUs / 1000000.0) * 1000)"
  private def wstart(w: Long) = s"(($TsUs // ${w}000000) * $w)"
  private val Tenant = "('t' || CAST(user_id % 3 AS VARCHAR))"
  private val PropsK = "json_extract_string(props, '$.k')"

  private def sqlRound2(e: String): String = s"(floor(($e) * 100 + 0.499999) / 100)"

  /** DuckDB mirror of safeRound4 — see its doc. */
  private def sqlRound4(e: String): String =
    s"(floor(($e) * 10000 + 0.499999) / 10000)"

  private def groupedSql(agg: String, w: Long, metricName: String): String =
    s"SELECT ${wstart(w)} AS window_start, $Tenant AS tenant_id, " +
      s"CAST(user_id AS VARCHAR) AS user_id, $agg AS value " +
      s"FROM events WHERE event_type = '$metricName' GROUP BY 1, 2, 3"

  // struct min/max mirrors FunctionCatalog's deterministic (ts, value)
  // lexicographic first/last (equal-ts ties break by value in both engines)
  private val DeltaAgg =
    s"((max({'t': $TsUs, 'v': value})).v - (min({'t': $TsUs, 'v': value})).v)"
  private val RateAgg =
    s"(CASE WHEN max($TsMs) = min($TsMs) THEN 0.0 " +
      s"ELSE $DeltaAgg / ((max($TsMs) - min($TsMs)) / 1000) END)"

  /** The positional word n-gram list comprehension over `toks` — THE single
    * SQL mirror of WordNGrams' slice loop; every n-gram-consuming oracle
    * (shingles, repetition grams) builds on this one string. */
  private def ngramsOfToks(n: Int): String =
    s"[array_to_string(toks[i:i+${n - 1}], ' ') " +
      s"for i in generate_series(1, greatest(len(toks)-${n - 1}, 1))]"

  /** Distinct word n-gram shingle CTE (mirror of Dedup.wordShingles —
    * `ngramsOfToks` + list_distinct). `minToks > 0` drops docs with fewer
    * tokens (empty text trims to a single-element [''], so it is dropped by
    * any minToks >= 2, matching tokenCount == 0 on the Spark side). */
  private def shinglesCte(n: Int, minToks: Int = 0): String =
    s"WITH t AS (SELECT doc_id, list_distinct(${ngramsOfToks(n)}) AS sh " +
      s"FROM (SELECT doc_id, string_split_regex(trim(text, '$SqlWs'), '\\s+') AS toks FROM documents)" +
      (if (minToks > 0) s" WHERE len(toks) >= $minToks" else "") + ")"

  private val ShinglesCte = shinglesCte(3)

  /** Exact n-gram Jaccard pairs via the shingle EQUI-JOIN (inverted-index
    * form), not the n² cross-self-join with per-pair list_intersect: only
    * pairs sharing ≥ 1 shingle are enumerated (a 0-intersection pair has
    * J = 0 < 0.5 and never appears either way), |A∩B| = the co-occurrence
    * count over DISTINCT shingles, |A|/|B| from the size relation — the
    * same integers, so the DOUBLE division is bit-identical to the list
    * form. The quadratic original cost 6-8 s per mirror at sf0.01 and this
    * fragment feeds ~9 of them (cluster family, survivors, split-safe,
    * leakage audit, minhash/ngram/prefix). */
  private val JaccardPairsSql =
    s"$ShinglesCte, e AS (SELECT doc_id, unnest(sh) AS s FROM t), " +
      "szj AS (SELECT doc_id, count(*) AS n FROM e GROUP BY 1) " +
      "SELECT id_a, id_b, jaccard FROM (" +
      "SELECT a.doc_id AS id_a, b.doc_id AS id_b, " +
      "CAST(count(*) AS DOUBLE) / " +
      "(any_value(sa.n) + any_value(sb.n) - count(*)) AS jaccard " +
      "FROM e a JOIN e b ON a.s = b.s AND a.doc_id < b.doc_id " +
      "JOIN szj sa ON sa.doc_id = a.doc_id JOIN szj sb ON sb.doc_id = b.doc_id " +
      "GROUP BY a.doc_id, b.doc_id) WHERE jaccard >= 0.5"

  /** Dense per-tenant hourly signup grid: `a` = observed hourly counts, `g` =
    * every hour between each tenant's first and last observed window — the
    * shared skeleton of the zero-fill and forward-fill oracles. */
  private val DenseGridCtes =
    s"WITH a AS (SELECT ${wstart(HOUR)} AS window_start, $Tenant AS tenant_id, " +
      "CAST(count(*) AS DOUBLE) AS v FROM events WHERE event_type = 'signup' " +
      "GROUP BY 1, 2), " +
      "s AS (SELECT tenant_id, min(window_start) AS lo, max(window_start) AS hi " +
      "FROM a GROUP BY 1), " +
      "g AS (SELECT tenant_id, unnest(generate_series(lo, hi, 3600)) AS window_start FROM s)"

  /** Transitive closure over the n-gram Jaccard pair set → `comp(id,
    * component)` with component = min reachable id — THE single mirror of
    * Dedup.connectedComponents, shared by the cluster and survivors oracles. */
  private val ClusterComponentsCte =
    s"WITH RECURSIVE p AS ($JaccardPairsSql), edges AS (" +
      "SELECT id_a AS src, id_b AS dst FROM p UNION SELECT id_b, id_a FROM p" +
      "), reach(a, b) AS (SELECT src, dst FROM edges " +
      "UNION SELECT r.a, e.dst FROM reach r JOIN edges e ON r.b = e.src), " +
      "comp AS (SELECT a AS id, least(a, min(b)) AS component FROM reach GROUP BY a)"

  private val CosD =
    "list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))"

  /** Unit-vector CTE mirroring Similarity.unitVectors' exact op sequence
    * (norm from a sequential sum of squares, then per-component divide —
    * DuckDB's list functions fold left like graft's DotProduct, so the doubles
    * are bit-identical and downstream sign/argmax decisions agree). */
  private val UnitVecCte =
    "u AS (SELECT vec_id, list_transform(dv, x -> x / nrm) AS v FROM " +
      "(SELECT vec_id, dv, sqrt(list_inner_product(dv, dv)) AS nrm FROM " +
      "(SELECT vec_id, CAST(embedding AS DOUBLE[]) AS dv FROM embeddings)) " +
      "WHERE nrm > 0)"

  /** Full IVF mirror (nLists=16, nProbe=4, k=5, queries = vec_id < 10):
    * centroid selection replays the portable-hash ordering, assignment is the
    * same lexicographic (score, cell) max as Spark's array_max, probing the
    * same (score desc, cell desc) top-nProbe. */
  private val IvfTopkSql = {
    val h = hashRawSql("vec_id")
    s"WITH $UnitVecCte, " +
      s"cent AS (SELECT row_number() OVER (ORDER BY $h, vec_id) - 1 AS cell, v " +
      s"FROM u QUALIFY row_number() OVER (ORDER BY $h, vec_id) <= 16), " +
      "asg AS (SELECT u.vec_id AS neighbor_id, any_value(u.v) AS cu, " +
      "(max({'s': list_inner_product(c.v, u.v), 'c': c.cell})).c AS cell " +
      "FROM u, cent c GROUP BY u.vec_id), " +
      "prb AS (SELECT query_id, qu, cell FROM (" +
      "SELECT q.vec_id AS query_id, q.v AS qu, c.cell, " +
      "row_number() OVER (PARTITION BY q.vec_id " +
      "ORDER BY list_inner_product(c.v, q.v) DESC, c.cell DESC) AS pr " +
      "FROM u q, cent c WHERE q.vec_id < 10) WHERE pr <= 4) " +
      "SELECT query_id, neighbor_id, rank, ROUND(cosine, 4) AS cosine FROM (" +
      "SELECT p.query_id, a.neighbor_id, list_inner_product(p.qu, a.cu) AS cosine, " +
      "CAST(row_number() OVER (PARTITION BY p.query_id " +
      "ORDER BY list_inner_product(p.qu, a.cu) DESC, a.neighbor_id ASC) AS BIGINT) AS rank " +
      "FROM prb p JOIN asg a ON p.cell = a.cell AND p.query_id <> a.neighbor_id) " +
      "WHERE rank <= 5"
  }

  /** PQ-ADC mirror (m=8, ksub=16, dsub=8, k=5, queries vec_id < 10): the
    * codebook is the hash-ordered sample (cent, as IVF), entry (j,i) = the
    * j-th 8-dim slice of sampled vector i. Encoding replays Spark's
    * lexicographic (−dist², −i) argmax per (vector, subspace); the ADC
    * score joins exploded codes to the per-query LUT and sums — double
    * addition order differs from Spark's static unrolled sum only in the
    * last ulps, absorbed by ROUND. */
  private val PqTopkSql = {
    val h = hashRawSql("vec_id")
    s"WITH $UnitVecCte, " +
      s"cent AS (SELECT row_number() OVER (ORDER BY $h, vec_id) - 1 AS i, v " +
      s"FROM u QUALIFY row_number() OVER (ORDER BY $h, vec_id) <= 16), " +
      "js AS (SELECT unnest(generate_series(0, 7)) AS j), " +
      "enc AS (SELECT vec_id, j, " +
      "-((max({'s': -list_inner_product(d, d), 'c': -i})).c) AS code FROM (" +
      "SELECT u.vec_id, js.j, c.i, list_transform(generate_series(1, 8), " +
      "k -> u.v[js.j * 8 + k] - c.v[js.j * 8 + k]) AS d FROM u, js, cent c) " +
      "GROUP BY vec_id, j), " +
      "lut AS (SELECT q.vec_id AS query_id, js.j, c.i, " +
      "list_inner_product(q.v[js.j * 8 + 1 : js.j * 8 + 8], " +
      "c.v[js.j * 8 + 1 : js.j * 8 + 8]) AS ip " +
      "FROM u q, js, cent c WHERE q.vec_id < 10) " +
      "SELECT query_id, neighbor_id, rank, ROUND(adc, 4) AS adc FROM (" +
      "SELECT query_id, neighbor_id, adc, CAST(row_number() OVER (" +
      "PARTITION BY query_id ORDER BY adc DESC, neighbor_id ASC) AS BIGINT) AS rank " +
      "FROM (SELECT l.query_id, e.vec_id AS neighbor_id, sum(l.ip) AS adc " +
      "FROM enc e JOIN lut l ON l.j = e.j AND l.i = e.code " +
      "WHERE l.query_id <> e.vec_id GROUP BY 1, 2)) WHERE rank <= 5"
  }

  /** Lloyd-refined-PQ mirror (m=8, ksub=16, rounds=2, k=5): PqTopkSql's
    * hash-sampled codebooks as round 0, then each Lloyd round replayed
    * exactly — argmin-L2 re-encode against the previous books, fixed-point
    * HUGEINT component sums (floor(x·2⁴⁰ + 0.5)), one (s/n)/S double mean
    * per component, empty cells KEEPING their previous entry via the
    * coalesce left join — then the standard enc/LUT/ADC search over the
    * refined books. Every refined centroid double is bit-identical to
    * Similarity.pqCodebooksKmeans' output. */
  private val PqKmeansTopkSql = {
    val h = hashRawSql("vec_id")
    val S = Similarity.FixedPointScale
    def lloydRound(r: Int): String = {
      val prev = s"cb${r - 1}"
      s"enc$r AS (SELECT vec_id, j, " +
        "-((max({'s': -list_inner_product(d, d), 'c': -i})).c) AS code FROM (" +
        "SELECT u.vec_id, b.j, b.i, list_transform(generate_series(1, 8), " +
        s"k -> u.v[b.j * 8 + k] - b.sv[k]) AS d FROM u, $prev b) " +
        "GROUP BY vec_id, j), " +
        s"fx$r AS (SELECT e.j, e.code AS i, k - 1 AS p, " +
        s"sum(CAST(floor(u.v[e.j * 8 + k] * $S + 0.5) AS HUGEINT)) AS s, " +
        "count(*) AS n " +
        s"FROM enc$r e JOIN u USING (vec_id), " +
        "LATERAL (SELECT unnest(generate_series(1, 8)) AS k) " +
        "GROUP BY e.j, e.code, p), " +
        s"cm$r AS (SELECT j, i, list(CAST(s AS DOUBLE) / CAST(n AS DOUBLE) / $S " +
        s"ORDER BY p) AS sv FROM fx$r GROUP BY j, i), " +
        s"cb$r AS (SELECT b.j, b.i, coalesce(m.sv, b.sv) AS sv " +
        s"FROM $prev b LEFT JOIN cm$r m ON m.j = b.j AND m.i = b.i)"
    }
    s"WITH $UnitVecCte, " +
      s"cent AS (SELECT row_number() OVER (ORDER BY $h, vec_id) - 1 AS i, v " +
      s"FROM u QUALIFY row_number() OVER (ORDER BY $h, vec_id) <= 16), " +
      "js AS (SELECT unnest(generate_series(0, 7)) AS j), " +
      "cb0 AS (SELECT js.j, c.i, c.v[js.j * 8 + 1 : js.j * 8 + 8] AS sv " +
      "FROM cent c, js), " +
      lloydRound(1) + ", " + lloydRound(2) + ", " +
      "encf AS (SELECT vec_id, j, " +
      "-((max({'s': -list_inner_product(d, d), 'c': -i})).c) AS code FROM (" +
      "SELECT u.vec_id, b.j, b.i, list_transform(generate_series(1, 8), " +
      "k -> u.v[b.j * 8 + k] - b.sv[k]) AS d FROM u, cb2 b) " +
      "GROUP BY vec_id, j), " +
      "lut AS (SELECT q.vec_id AS query_id, b.j, b.i, " +
      "list_inner_product(q.v[b.j * 8 + 1 : b.j * 8 + 8], b.sv) AS ip " +
      "FROM u q, cb2 b WHERE q.vec_id < 10) " +
      "SELECT query_id, neighbor_id, rank, ROUND(adc, 4) AS adc FROM (" +
      "SELECT query_id, neighbor_id, adc, CAST(row_number() OVER (" +
      "PARTITION BY query_id ORDER BY adc DESC, neighbor_id ASC) AS BIGINT) AS rank " +
      "FROM (SELECT l.query_id, e.vec_id AS neighbor_id, sum(l.ip) AS adc " +
      "FROM encf e JOIN lut l ON l.j = e.j AND l.i = e.code " +
      "WHERE l.query_id <> e.vec_id GROUP BY 1, 2)) WHERE rank <= 5"
  }

  /** IVF-PQ mirror (nLists=ksub=16 share ONE hash sample, nProbe=4, m=8,
    * dsub=8, k=5): IvfTopkSql's cell assignment + probe ranking composed
    * with PqTopkSql's encoding + LUT join, restricted to probed cells. */
  private val IvfPqTopkSql = {
    val h = hashRawSql("vec_id")
    s"WITH $UnitVecCte, " +
      s"cent AS (SELECT row_number() OVER (ORDER BY $h, vec_id) - 1 AS i, v " +
      s"FROM u QUALIFY row_number() OVER (ORDER BY $h, vec_id) <= 16), " +
      "js AS (SELECT unnest(generate_series(0, 7)) AS j), " +
      "asg AS (SELECT u.vec_id, (max({'s': list_inner_product(c.v, u.v), " +
      "'c': c.i})).c AS cell FROM u, cent c GROUP BY u.vec_id), " +
      "enc AS (SELECT vec_id, j, " +
      "-((max({'s': -list_inner_product(d, d), 'c': -i})).c) AS code FROM (" +
      "SELECT u.vec_id, js.j, c.i, list_transform(generate_series(1, 8), " +
      "k -> u.v[js.j * 8 + k] - c.v[js.j * 8 + k]) AS d FROM u, js, cent c) " +
      "GROUP BY vec_id, j), " +
      "prb AS (SELECT query_id, cell FROM (" +
      "SELECT q.vec_id AS query_id, c.i AS cell, " +
      "row_number() OVER (PARTITION BY q.vec_id " +
      "ORDER BY list_inner_product(c.v, q.v) DESC, c.i DESC) AS pr " +
      "FROM u q, cent c WHERE q.vec_id < 10) WHERE pr <= 4), " +
      "lut AS (SELECT q.vec_id AS query_id, js.j, c.i, " +
      "list_inner_product(q.v[js.j * 8 + 1 : js.j * 8 + 8], " +
      "c.v[js.j * 8 + 1 : js.j * 8 + 8]) AS ip " +
      "FROM u q, js, cent c WHERE q.vec_id < 10) " +
      "SELECT query_id, neighbor_id, rank, ROUND(adc, 4) AS adc FROM (" +
      "SELECT query_id, neighbor_id, adc, CAST(row_number() OVER (" +
      "PARTITION BY query_id ORDER BY adc DESC, neighbor_id ASC) AS BIGINT) AS rank " +
      "FROM (SELECT p.query_id, a.vec_id AS neighbor_id, sum(l.ip) AS adc " +
      "FROM prb p JOIN asg a ON p.cell = a.cell AND p.query_id <> a.vec_id " +
      "JOIN enc e ON e.vec_id = a.vec_id " +
      "JOIN lut l ON l.query_id = p.query_id AND l.j = e.j AND l.i = e.code " +
      "GROUP BY 1, 2)) WHERE rank <= 5"
  }

  /** Residual IVF-PQ mirror: cells as IvfPqTopkSql; residual r = v −
    * cent[cell]; residual codebook = ksub hash-sample of the RESIDUALS
    * under seed 42+7919; enc = per-subspace argmin over residual slices;
    * score = ⟨q, cent[cell]⟩ + Σ_j lut_r. */
  private val IvfPqResTopkSql = {
    val h = hashRawSql("vec_id")
    val hr = hashRawSql("vec_id", 42L + 7919L)
    s"WITH $UnitVecCte, " +
      s"cent AS (SELECT row_number() OVER (ORDER BY $h, vec_id) - 1 AS i, v " +
      s"FROM u QUALIFY row_number() OVER (ORDER BY $h, vec_id) <= 16), " +
      "js AS (SELECT unnest(generate_series(0, 7)) AS j), " +
      "asg AS (SELECT u.vec_id, (max({'s': list_inner_product(c.v, u.v), " +
      "'c': c.i})).c AS cell FROM u, cent c GROUP BY u.vec_id), " +
      "res AS (SELECT a.vec_id, a.cell, list_transform(generate_series(1, 64), " +
      "k -> u.v[k] - c.v[k]) AS r FROM asg a JOIN u ON u.vec_id = a.vec_id " +
      "JOIN cent c ON c.i = a.cell), " +
      s"rs AS (SELECT row_number() OVER (ORDER BY $hr, vec_id) - 1 AS i, r " +
      s"FROM res QUALIFY row_number() OVER (ORDER BY $hr, vec_id) <= 16), " +
      "enc AS (SELECT vec_id, j, " +
      "-((max({'s': -list_inner_product(d, d), 'c': -i})).c) AS code FROM (" +
      "SELECT res.vec_id, js.j, rs.i, list_transform(generate_series(1, 8), " +
      "k -> res.r[js.j * 8 + k] - rs.r[js.j * 8 + k]) AS d FROM res, js, rs) " +
      "GROUP BY vec_id, j), " +
      "lutr AS (SELECT q.vec_id AS query_id, js.j, rs.i, " +
      "list_inner_product(q.v[js.j * 8 + 1 : js.j * 8 + 8], " +
      "rs.r[js.j * 8 + 1 : js.j * 8 + 8]) AS ip " +
      "FROM u q, js, rs WHERE q.vec_id < 10), " +
      "cd AS (SELECT q.vec_id AS query_id, c.i AS cell, " +
      "list_inner_product(q.v, c.v) AS cdot FROM u q, cent c WHERE q.vec_id < 10), " +
      "prb AS (SELECT query_id, cell FROM (" +
      "SELECT q.vec_id AS query_id, c.i AS cell, " +
      "row_number() OVER (PARTITION BY q.vec_id " +
      "ORDER BY list_inner_product(c.v, q.v) DESC, c.i DESC) AS pr " +
      "FROM u q, cent c WHERE q.vec_id < 10) WHERE pr <= 4) " +
      "SELECT query_id, neighbor_id, rank, ROUND(adc, 4) AS adc FROM (" +
      "SELECT query_id, neighbor_id, adc, CAST(row_number() OVER (" +
      "PARTITION BY query_id ORDER BY adc DESC, neighbor_id ASC) AS BIGINT) AS rank " +
      "FROM (SELECT p.query_id, a.vec_id AS neighbor_id, " +
      "any_value(d.cdot) + sum(l.ip) AS adc " +
      "FROM prb p JOIN asg a ON p.cell = a.cell AND p.query_id <> a.vec_id " +
      "JOIN cd d ON d.query_id = p.query_id AND d.cell = p.cell " +
      "JOIN enc e ON e.vec_id = a.vec_id " +
      "JOIN lutr l ON l.query_id = p.query_id AND l.j = e.j AND l.i = e.code " +
      "GROUP BY 1, 2)) WHERE rank <= 5"
  }

  /** Shared SemDeDup SQL fragments (nLists=8, threshold 0.4): centroid
    * selection + argmax assignment reuse the IVF mirror verbatim; the
    * within-cell pair subquery is consumed by BOTH the pairs oracle and the
    * survivors closure — never duplicate these (a parameter change must
    * reach both queries together). */
  private val SemanticCellAsgSql = {
    val h = hashRawSql("vec_id")
    s"cent AS (SELECT row_number() OVER (ORDER BY $h, vec_id) - 1 AS cell, v " +
      s"FROM u QUALIFY row_number() OVER (ORDER BY $h, vec_id) <= 8), " +
      "asg AS (SELECT u.vec_id AS id, any_value(u.v) AS v, " +
      "(max({'s': list_inner_product(c.v, u.v), 'c': c.cell})).c AS cell " +
      "FROM u, cent c GROUP BY u.vec_id)"
  }
  private val SemanticPairsCoreSql =
    "SELECT a.id AS id_a, b.id AS id_b, a.cell, list_inner_product(a.v, b.v) AS c " +
      "FROM asg a JOIN asg b ON a.cell = b.cell AND a.id < b.id"

  /** SemDeDup mirror: within-cell pairs with exact cosine. */
  private val SemanticPairsSql =
    s"WITH $UnitVecCte, $SemanticCellAsgSql " +
      "SELECT id_a, id_b, CAST(cell AS BIGINT) AS cell, ROUND(c, 4) AS cosine " +
      s"FROM ($SemanticPairsCoreSql) WHERE c >= 0.4"

  /** Threshold-sweep mirror: the shared within-cell pair core at the
    * loosest cutoff, a threshold-list explode, and the two exact rollups
    * (pairs; distinct greater-side ids = the min-keeps drop bound). */
  private val ThresholdSweepSql =
    s"WITH $UnitVecCte, $SemanticCellAsgSql, " +
      s"base AS (SELECT id_a, id_b, c FROM ($SemanticPairsCoreSql) WHERE c >= 0.25), " +
      "pt AS (SELECT t.threshold, id_a, id_b FROM base, " +
      "(SELECT unnest([0.25, 0.3, 0.35, 0.4, 0.45]) AS threshold) t " +
      "WHERE c >= t.threshold), " +
      "np AS (SELECT threshold, CAST(count(*) AS BIGINT) AS n_pairs FROM pt GROUP BY 1), " +
      "nd AS (SELECT threshold, CAST(count(DISTINCT id_b) AS BIGINT) AS n_dropped_lb " +
      "FROM pt GROUP BY 1) " +
      "SELECT np.threshold, n_pairs, n_dropped_lb FROM np JOIN nd USING (threshold)"

  /** URL-fixture CTE + regex/blocklist fragments shared by the two URL
    * oracles — the regexes are spelled with the explicit whitespace class so
    * Java (Spark) and RE2 (DuckDB) tokenize URLs identically. */
  private val UrlDocsCteSql =
    "d AS (SELECT doc_id, COALESCE(text, '') || ' Visit https://www.' || " +
      "COALESCE(source, '') || '.example.com/a/' || CAST(doc_id % 7 AS VARCHAR) || " +
      "' or http://ads.tracker' || CAST(doc_id % 5 AS VARCHAR) || '.net/x' AS text " +
      "FROM documents)"
  private val UrlReSql = TextAnalysis.UrlRe
  private val DomainReSql = TextAnalysis.UrlDomainRe
  private val UrlBlockCondSql = UrlBlocklist
    .map(b => s"dom = '$b' OR ends_with(dom, '.$b')").mkString(" OR ")

  /** Transitive closure over the semantic pair set — the same recursive-CTE
    * mirror of Dedup.connectedComponents as [[ClusterComponentsCte]], but fed
    * by the shared [[SemanticPairsCoreSql]] within-cell pairs. */
  private val SemanticComponentsCte =
    s"WITH RECURSIVE $UnitVecCte, $SemanticCellAsgSql, " +
      s"p AS (SELECT id_a, id_b FROM ($SemanticPairsCoreSql) WHERE c >= 0.4), " +
      "edges AS (SELECT id_a AS src, id_b AS dst FROM p UNION SELECT id_b, id_a FROM p), " +
      "reach(a, b) AS (SELECT src, dst FROM edges " +
      "UNION SELECT r.a, e.dst FROM reach r JOIN edges e ON r.b = e.src), " +
      "comp AS (SELECT a AS id, least(a, min(b)) AS component FROM reach GROUP BY a)"

  /** Full sign-LSH mirror (threshold 0.4, nPlanes=6, tables=8, seed 42): the
    * hyperplanes are deterministic given the seed, so they are EMBEDDED here
    * as double literals (shortest round-trip Double.toString — DuckDB parses
    * back the identical binary double) and the bucket/join/verify pipeline is
    * replayed exactly. No recall argument needed: both engines compute the
    * same buckets. Dim 64 is the testdata embeddings' fixed width. */
  private val LshPairsSql = {
    def fmtPlane(p: Seq[Double]) =
      "[" + p.map(java.lang.Double.toString).mkString(", ") + "]"
    val perTable = (0 until 8).map { t =>
      val planes = Similarity.hyperplanes(6, 64, 42L + t)
      val bucket = planes.zipWithIndex.map { case (p, i) =>
        s"(CASE WHEN list_inner_product(v, ${fmtPlane(p)}) >= 0 THEN ${1L << i} ELSE 0 END)"
      }.mkString(" + ")
      s"SELECT vec_id, v, $t AS tbl, ($bucket) AS bucket FROM u"
    }.mkString(" UNION ALL ")
    s"WITH $UnitVecCte, bk AS ($perTable), " +
      "cand AS (SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b " +
      "FROM bk a JOIN bk b ON a.tbl = b.tbl AND a.bucket = b.bucket " +
      "AND a.vec_id < b.vec_id) " +
      "SELECT id_a, id_b, ROUND(cosine, 4) AS cosine FROM (" +
      "SELECT c.id_a, c.id_b, list_inner_product(ua.v, ub.v) AS cosine " +
      "FROM cand c JOIN u ua ON ua.vec_id = c.id_a JOIN u ub ON ub.vec_id = c.id_b) " +
      "WHERE cosine >= 0.4"
  }

  /** Cross-table LSH join mirror: even vec_ids vs odd vec_ids through the
    * same replayed hyperplane buckets as LshPairsSql, candidates deduped
    * before the exact-cosine verify. */
  private val LshJoinSql = {
    def fmtPlane(p: Seq[Double]) =
      "[" + p.map(java.lang.Double.toString).mkString(", ") + "]"
    val perTable = (0 until 8).map { t =>
      val planes = Similarity.hyperplanes(6, 64, 42L + t)
      val bucket = planes.zipWithIndex.map { case (p, i) =>
        s"(CASE WHEN list_inner_product(v, ${fmtPlane(p)}) >= 0 THEN ${1L << i} ELSE 0 END)"
      }.mkString(" + ")
      s"SELECT vec_id, v, $t AS tbl, ($bucket) AS bucket FROM u"
    }.mkString(" UNION ALL ")
    s"WITH $UnitVecCte, bk AS ($perTable), " +
      "cand AS (SELECT DISTINCT a.vec_id AS left_id, b.vec_id AS right_id " +
      "FROM bk a JOIN bk b ON a.tbl = b.tbl AND a.bucket = b.bucket " +
      "WHERE a.vec_id % 2 = 0 AND b.vec_id % 2 = 1) " +
      "SELECT left_id, right_id, ROUND(cosine, 4) AS cosine FROM (" +
      "SELECT c.left_id, c.right_id, list_inner_product(ua.v, ub.v) AS cosine " +
      "FROM cand c JOIN u ua ON ua.vec_id = c.left_id JOIN u ub ON ub.vec_id = c.right_id) " +
      "WHERE cosine >= 0.4"
  }

  /** Deterministic-k-means mirror (nLists=8, rounds=2, seed 42): centroid
    * sampling and argmax assignment reuse the IVF idioms; each Lloyd round's
    * component mean is the HUGEINT replay of kmeansCentroids' fixed-point
    * sum — floor(x·2⁴⁰ + 0.5) integers summed exactly, converted to DOUBLE
    * once per (cell, pos), then the same left-fold normalization — so every
    * refined centroid double is bit-identical to the Spark side. Labels
    * compact order-preservingly on the Spark side each round; the mirror
    * keeps original labels (argmax ties agree — compaction preserves order)
    * and maps to dense ranks of the FINAL centroid list at the end. */
  private val KmeansCentCtes = {
    val S = Similarity.FixedPointScale
    val h = hashRawSql("vec_id")
    def lloydRound(i: Int, prev: String): String =
      s"asg$i AS (SELECT u.vec_id, any_value(u.v) AS v, " +
        "(max({'s': list_inner_product(c.v, u.v), 'c': c.cell})).c AS cell " +
        s"FROM u, $prev c GROUP BY u.vec_id), " +
        s"fx$i AS (SELECT cell, i - 1 AS pos, " +
        s"sum(CAST(floor(v[i] * $S + 0.5) AS HUGEINT)) AS s, count(*) AS n " +
        s"FROM asg$i, LATERAL (SELECT unnest(generate_series(1, len(v))) AS i) " +
        "GROUP BY cell, pos), " +
        s"cm$i AS (SELECT cell, list(CAST(s AS DOUBLE) / CAST(n AS DOUBLE) / $S " +
        s"ORDER BY pos) AS v FROM fx$i GROUP BY cell), " +
        s"cent$i AS (SELECT cell, list_transform(v, x -> x / nrm) AS v FROM (" +
        s"SELECT cell, v, sqrt(list_inner_product(v, v)) AS nrm FROM cm$i) " +
        "WHERE nrm > 0)"
    s"$UnitVecCte, " +
      s"cent0 AS (SELECT row_number() OVER (ORDER BY $h, vec_id) - 1 AS cell, v " +
      s"FROM u QUALIFY row_number() OVER (ORDER BY $h, vec_id) <= 8), " +
      lloydRound(1, "cent0") + ", " + lloydRound(2, "cent1")
  }

  private val KmeansAssignSql =
    s"WITH $KmeansCentCtes, " +
      "fin AS (SELECT u.vec_id, " +
      "max({'s': list_inner_product(c.v, u.v), 'c': c.cell}) AS m " +
      "FROM u, cent2 c GROUP BY u.vec_id), " +
      "lbl AS (SELECT cell, row_number() OVER (ORDER BY cell) - 1 AS dense " +
      "FROM cent2) " +
      "SELECT f.vec_id, CAST(l.dense AS BIGINT) AS cell, " +
      "ROUND((f.m).s, 4) AS score FROM fin f JOIN lbl l ON (f.m).c = l.cell"

  /** The margin + mutual-argmax tail shared by the exact and IVF bitext
    * mirrors — expects CTEs `fk`/`bk` (src_id, tgt_id, cosine, rank), one
    * per direction: rank-ordered 0.0-seeded neighborhood folds, the
    * fixed-order /8.0 denominator (2k with k=4), both margin argmaxes,
    * the mutual + threshold(1.0) filter. One definition, the
    * stopword-list rule. */
  private val BitextTailSql = {
    def fold(terms: String) =
      s"list_reduce(list_prepend(0.0, $terms), (a, b) -> a + b)"
    s", ns AS (SELECT src_id, ${fold("list(cosine ORDER BY rank)")} AS nn_src " +
      "FROM fk GROUP BY 1), " +
      s"nt AS (SELECT tgt_id, ${fold("list(cosine ORDER BY rank)")} AS nn_tgt " +
      "FROM bk GROUP BY 1), " +
      "cand AS (SELECT f.src_id, f.tgt_id, f.cosine, " +
      "f.cosine / (ns.nn_src / 8.0 + nt.nn_tgt / 8.0) AS margin " +
      "FROM fk f JOIN bk b ON b.src_id = f.src_id AND b.tgt_id = f.tgt_id " +
      "JOIN ns ON ns.src_id = f.src_id JOIN nt ON nt.tgt_id = f.tgt_id), " +
      "mx AS (SELECT src_id, tgt_id, cosine, margin, " +
      "row_number() OVER (PARTITION BY src_id ORDER BY margin DESC, tgt_id ASC) AS rf, " +
      "row_number() OVER (PARTITION BY tgt_id ORDER BY margin DESC, src_id ASC) AS rb " +
      "FROM cand) " +
      "SELECT src_id, tgt_id, ROUND(cosine, 4) AS cosine, " +
      "ROUND(margin, 4) AS margin FROM mx WHERE rf = 1 AND rb = 1 AND margin > 1.0"
  }

  /** One direction of the bitext-IVF mirror — the IvfTopkSql idiom with
    * side parity filters: centroids hash-sampled from the CORPUS side
    * (parity `cPar`), cell assignment over that side, probe ranking for
    * the QUERY side (parity `qPar`); ends in `${p}knn(qid, nid, cosine,
    * rank)`. */
  private def bitextIvfSideCtes(p: String, qPar: Int, cPar: Int,
      nLists: Int, nProbe: Int, k: Int): String = {
    val h = hashRawSql("vec_id")
    s"${p}cent AS (SELECT row_number() OVER (ORDER BY $h, vec_id) - 1 AS cell, v " +
      s"FROM u WHERE vec_id % 2 = $cPar " +
      s"QUALIFY row_number() OVER (ORDER BY $h, vec_id) <= $nLists), " +
      s"${p}asg AS (SELECT u.vec_id AS nid, any_value(u.v) AS cu, " +
      "(max({'s': list_inner_product(c.v, u.v), 'c': c.cell})).c AS cell " +
      s"FROM u, ${p}cent c WHERE u.vec_id % 2 = $cPar GROUP BY u.vec_id), " +
      s"${p}prb AS (SELECT qid, qu, cell FROM (" +
      "SELECT q.vec_id AS qid, q.v AS qu, c.cell, " +
      "row_number() OVER (PARTITION BY q.vec_id " +
      "ORDER BY list_inner_product(c.v, q.v) DESC, c.cell DESC) AS pr " +
      s"FROM u q, ${p}cent c WHERE q.vec_id % 2 = $qPar) WHERE pr <= $nProbe), " +
      s"${p}knn AS (SELECT qid, nid, cosine, rank FROM (" +
      s"SELECT p.qid, a.nid, list_inner_product(p.qu, a.cu) AS cosine, " +
      "row_number() OVER (PARTITION BY p.qid " +
      "ORDER BY list_inner_product(p.qu, a.cu) DESC, a.nid ASC) AS rank " +
      s"FROM ${p}prb p JOIN ${p}asg a ON p.cell = a.cell AND p.qid <> a.nid) " +
      s"WHERE rank <= $k)"
  }

  /** Greedy k-center mirror (k=8, seed 42): round 1 is the hash-ordered
    * first unit vector; each later round scores every unpicked vector's
    * max list_inner_product against the prior one-row center CTEs (the
    * same left-fold doubles as Spark's greatest-of-dots) and takes the
    * (mc ASC, vec_id ASC) argmin — chained MATERIALIZED CTEs, the
    * pageRank-oracle rule. */
  private val KcenterSql = {
    val k = 8
    val h = hashRawSql("vec_id")
    val sb = new StringBuilder(s"WITH $UnitVecCte, ")
    sb ++= "k1 AS MATERIALIZED (SELECT vec_id, v, 0.0 AS mc FROM u " +
      s"ORDER BY $h, vec_id LIMIT 1)"
    for (r <- 2 to k) {
      val prev = (1 until r).map(i => s"SELECT vec_id, v FROM k$i")
        .mkString(" UNION ALL ")
      sb ++= s", k$r AS MATERIALIZED (SELECT vec_id, any_value(nv) AS v, " +
        "max(list_inner_product(cv, nv)) AS mc FROM (" +
        s"SELECT n.vec_id, n.v AS nv, c.v AS cv FROM u n, ($prev) c " +
        s"WHERE n.vec_id NOT IN (SELECT vec_id FROM ($prev))) " +
        "GROUP BY vec_id ORDER BY mc ASC, vec_id ASC LIMIT 1)"
    }
    val un = (1 to k).map(r => s"SELECT $r AS rank, vec_id, mc FROM k$r")
      .mkString(" UNION ALL ")
    sb ++= s" SELECT CAST(rank AS BIGINT) AS rank, vec_id, " +
      s"ROUND(mc, 4) AS max_cos FROM ($un)"
    sb.toString
  }

  /** MMR mirror (k=8, λ=0.5): query = min-id unit vector, candidates = the
    * rest with their query cosine materialized once; each round's argmax of
    * `0.5·rel − 0.5·max(cos to picks)` is a chained materialized CTE with
    * the identical IEEE op order and (score DESC, vec_id ASC) tie-break —
    * one transposed pick anywhere changes all later rows. */
  private val MmrSql = {
    val k = 8
    val sb = new StringBuilder(s"WITH $UnitVecCte, ")
    sb ++= "mq AS MATERIALIZED (SELECT vec_id AS qid, v AS qv FROM u " +
      "ORDER BY vec_id LIMIT 1), "
    sb ++= "mc0 AS MATERIALIZED (SELECT u.vec_id, u.v, " +
      "list_inner_product(u.v, mq.qv) AS rel FROM u, mq " +
      "WHERE u.vec_id <> mq.qid), "
    sb ++= "m1 AS MATERIALIZED (SELECT vec_id, v, rel, " +
      "0.5 * rel - 0.5 * 0.0 AS score FROM mc0 " +
      "ORDER BY score DESC, vec_id ASC LIMIT 1)"
    for (r <- 2 to k) {
      val prev = (1 until r).map(i => s"SELECT vec_id, v FROM m$i")
        .mkString(" UNION ALL ")
      sb ++= s", m$r AS MATERIALIZED (SELECT vec_id, any_value(nv) AS v, " +
        "any_value(rel) AS rel, 0.5 * any_value(rel) - " +
        "0.5 * max(list_inner_product(pv, nv)) AS score FROM (" +
        s"SELECT n.vec_id, n.v AS nv, n.rel AS rel, p.v AS pv FROM mc0 n, ($prev) p " +
        s"WHERE n.vec_id NOT IN (SELECT vec_id FROM ($prev))) " +
        "GROUP BY vec_id ORDER BY score DESC, vec_id ASC LIMIT 1)"
    }
    val un = (1 to k).map(r => s"SELECT $r AS rank, vec_id, rel, score FROM m$r")
      .mkString(" UNION ALL ")
    sb ++= s" SELECT CAST(rank AS BIGINT) AS rank, vec_id, " +
      s"ROUND(rel, 4) AS rel, ROUND(score, 4) AS score FROM ($un)"
    sb.toString
  }

  /** IVF probe against the Lloyd-refined cent2 cells (k=5, nProbe=3,
    * queries = vec_id < 10) — the IvfTopkSql probe verbatim with fitted
    * centroids; the output carries no cell label, so the mirror's original
    * labels and Spark's order-preservingly compacted ones join identically. */
  private val IvfKmeansSql =
    s"WITH $KmeansCentCtes, " +
      "asgf AS (SELECT u.vec_id AS neighbor_id, any_value(u.v) AS cu, " +
      "(max({'s': list_inner_product(c.v, u.v), 'c': c.cell})).c AS cell " +
      "FROM u, cent2 c GROUP BY u.vec_id), " +
      "prb AS (SELECT query_id, qu, cell FROM (" +
      "SELECT q.vec_id AS query_id, q.v AS qu, c.cell, " +
      "row_number() OVER (PARTITION BY q.vec_id " +
      "ORDER BY list_inner_product(c.v, q.v) DESC, c.cell DESC) AS pr " +
      "FROM u q, cent2 c WHERE q.vec_id < 10) WHERE pr <= 3) " +
      "SELECT query_id, neighbor_id, rank, ROUND(cosine, 4) AS cosine FROM (" +
      "SELECT p.query_id, a.neighbor_id, list_inner_product(p.qu, a.cu) AS cosine, " +
      "CAST(row_number() OVER (PARTITION BY p.query_id " +
      "ORDER BY list_inner_product(p.qu, a.cu) DESC, a.neighbor_id ASC) AS BIGINT) AS rank " +
      "FROM prb p JOIN asgf a ON p.cell = a.cell AND p.query_id <> a.neighbor_id) " +
      "WHERE rank <= 5"

  /** Random-projection mirror (k=8, dim=64, seed 42): the same seeded
    * hyperplanes as the query side, embedded as round-trip double literals;
    * list_inner_product folds left like graft's DotProduct so the projected
    * doubles are bit-identical before the shared 4-decimal round. */
  private val EmbProjectSql = {
    def fmtPlane(p: Seq[Double]) =
      "[" + p.map(java.lang.Double.toString).mkString(", ") + "]"
    val planes = Similarity.hyperplanes(8, 64, 42L)
    val rows = planes.zipWithIndex.map { case (p, i) =>
      s"SELECT vec_id, $i AS pos, list_inner_product(dv, ${fmtPlane(p)}) AS proj FROM dvt"
    }.mkString(" UNION ALL ")
    "WITH dvt AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS dv FROM embeddings) " +
      s"SELECT vec_id, CAST(pos AS BIGINT) AS pos, ROUND(proj, 4) AS proj FROM ($rows)"
  }

  /** Per-doc n-gram count CTE over `src`(doc_id, text) — the repetition
    * mirror's gram stage, parameterized so the pipeline-composition oracle
    * reuses the exact fragment (one definition, same rule as the stopword
    * lists: never duplicate). */
  private def gramCteOver(n: Int, cte: String, src: String): String =
    s"$cte AS (SELECT doc_id, len, g, count(*) AS cnt FROM (" +
      "SELECT doc_id, length(text) AS len, " +
      s"unnest(${ngramsOfToks(n)}) AS g " +
      s"FROM (SELECT doc_id, text, string_split_regex(trim(text, '$SqlWs'), '\\s+') AS toks " +
      s"FROM $src)) GROUP BY 1, 2, 3)"

  /** Top-gram char-coverage CTE over a [[gramCteOver]] output — the same
    * lexicographic (count, gram length, gram) struct max as the operator. */
  private def topCteOver(src: String, cte: String, outCol: String): String = {
    val top = s"max({'c': cnt, 'gl': length(g), 'g': g})"
    s"$cte AS (SELECT doc_id, CASE WHEN len > 0 THEN " +
      s"CAST(($top).c * ($top).gl AS DOUBLE) / CAST(len AS DOUBLE) " +
      s"ELSE 0.0 END AS $outCol FROM $src GROUP BY doc_id, len)"
  }

  /** Shared CTE chain for the repetition-signals mirror: `d` (sentence
    * boundaries → line breaks, matching the query-side regexp_replace),
    * `la` (line multiset sums), `t2`/`t3` (top-gram coverage). */
  private val RepetitionCtes = {
    def gramCte(n: Int, cte: String): String = gramCteOver(n, cte, "d")
    def topCte(src: String, cte: String, outCol: String): String =
      topCteOver(src, cte, outCol)
    "WITH d AS (SELECT doc_id, " +
      "regexp_replace(text, '\\. ', '.' || chr(10), 'g') AS text FROM documents), " +
      s"l0 AS (SELECT doc_id, trim(x, '$SqlWs') AS line FROM (SELECT doc_id, " +
      s"unnest(string_split(text, chr(10))) AS x FROM d) WHERE length(trim(x, '$SqlWs')) > 0), " +
      "lc AS (SELECT doc_id, line, count(*) AS cnt FROM l0 GROUP BY 1, 2), " +
      "la AS (SELECT doc_id, sum(cnt) AS n_lines, count(*) AS n_distinct, " +
      "sum(cnt * length(line)) AS line_chars, " +
      "sum(CASE WHEN cnt > 1 THEN cnt * length(line) ELSE 0 END) AS dup_line_chars " +
      "FROM lc GROUP BY 1), " +
      s"${gramCte(2, "g2c")}, ${topCte("g2c", "t2", "top2gram_char_frac")}, " +
      s"${gramCte(3, "g3c")}, ${topCte("g3c", "t3", "top3gram_char_frac")}"
  }

  private val DupLineFracSql =
    "CASE WHEN COALESCE(n_lines, 0) > 0 THEN " +
      "1.0 - CAST(n_distinct AS DOUBLE) / CAST(n_lines AS DOUBLE) ELSE 0.0 END"

  private val RepetitionJoins =
    "FROM d LEFT JOIN la USING (doc_id) LEFT JOIN t2 USING (doc_id) " +
      "LEFT JOIN t3 USING (doc_id)"

  /** Repetition-signals mirror: every fraction is an exact integer ratio with
    * the same op sequence as the operator. */
  private val RepetitionSql =
    s"$RepetitionCtes SELECT d.doc_id, CAST(COALESCE(n_lines, 0) AS BIGINT) AS n_lines, " +
      s"$DupLineFracSql AS dup_line_frac, " +
      "CASE WHEN COALESCE(line_chars, 0) > 0 THEN " +
      "CAST(dup_line_chars AS DOUBLE) / CAST(line_chars AS DOUBLE) ELSE 0.0 END " +
      "AS dup_line_char_frac, " +
      "COALESCE(top2gram_char_frac, 0.0) AS top2gram_char_frac, " +
      "COALESCE(top3gram_char_frac, 0.0) AS top3gram_char_frac " +
      RepetitionJoins

  /** Quality-filter mirror: the same signal CTEs, reduced to the surviving
    * doc ids under the default Gopher-style thresholds. LAZY because it
    * interpolates TokN, declared further down — a strict val here captures
    * null into the SQL string (Scala object vals initialize in declaration
    * order). */
  private lazy val QualityFilterSql =
    s"$RepetitionCtes, tk AS (SELECT doc_id, $TokN AS n FROM d) " +
      "SELECT d.doc_id " + RepetitionJoins + " JOIN tk USING (doc_id) " +
      "WHERE n BETWEEN 15 AND 100000 " +
      s"AND $DupLineFracSql <= 0.3 " +
      "AND COALESCE(top2gram_char_frac, 0.0) <= 0.2 " +
      "AND COALESCE(top3gram_char_frac, 0.0) <= 0.18"

  /** End-to-end pipeline mirror: the per-stage oracles composed as ONE
    * recursive CTE chain over the [[pipeDocs]] page fixture — C4 clean
    * (text_c4_clean's line/doc rules), line dedup (dedup_lines' df>3 scrub),
    * quality filter (the repetition-signal thresholds via the shared
    * [[gramCteOver]]/[[topCteOver]] fragments), decontamination
    * (dedup_decontam's any-hit rule on the doc_id%50 bench slice), n-gram
    * Jaccard pairs + recursive component closure feeding the leakage-safe
    * split case, then the export tail (shuffle → re-id → pack → materialize)
    * with the same prefix-sum/window arithmetic as the sample_* mirrors.
    * LAZY for the same declaration-order reason as [[QualityFilterSql]]. */
  private lazy val PipelineE2eSql = {
    val ws = TextAnalysis.WsCharsRaw
    val fixture =
      // the body-slice pieces COALESCE once more: DuckDB's array_to_string
      // over an EMPTY slice (docs shorter than the slice start) is NULL, and
      // one NULL would blank the whole '||' page while Spark's concat_ws
      // builds it fine — the cross-engine NULL class dedup_lines documents
      "pg AS (SELECT doc_id, " +
        "COALESCE(array_to_string(string_split(COALESCE(text, ''), ' ')[1:24], ' '), '')" +
        " || '.' || chr(10) || " +
        "'Please enable JavaScript to view the comments.' || chr(10) || " +
        "'Menu' || chr(10) || " +
        "COALESCE(array_to_string(string_split(COALESCE(text, ''), ' ')[25:44], ' '), '')" +
        " || '.' || chr(10) || " +
        "CASE WHEN doc_id % 37 = 0 THEN 'if (config) { render(); }' " +
        "ELSE 'Closing note from ' || COALESCE(source, '') || ' desk.' END || chr(10) || " +
        "'All rights reserved by the site owners.' || chr(10) || " +
        "'Badge ' || CAST(doc_id % 5 AS VARCHAR) || ' reporting in today!' AS text " +
        "FROM documents)"
    val c4 =
      "c4l AS (SELECT doc_id, text AS txt, list_filter(list_transform(" +
        s"string_split(text, chr(10)), x -> trim(x, '$ws')), " +
        "x -> length(x) > 0) AS lines FROM pg), " +
        "c4k AS (SELECT doc_id, txt, list_filter(lines, x -> " +
        "regexp_matches(x, '[.!?\"]$') AND len(string_split_regex(x, '\\s+')) >= 3 AND " +
        "NOT contains(lower(x), 'javascript')) AS kept FROM c4l), " +
        "cc AS (SELECT doc_id, array_to_string(kept, chr(10)) AS text FROM c4k " +
        "WHERE NOT contains(txt, '{') AND NOT contains(lower(txt), 'lorem ipsum') " +
        "AND len(kept) >= 4)"
    val lineDedup =
      "ldx AS (SELECT doc_id, unnest(generate_series(1, len(arr))) AS pos, arr " +
        "FROM (SELECT doc_id, string_split(text, chr(10)) AS arr FROM cc)), " +
        "ldnz AS (SELECT doc_id, pos, line FROM (SELECT doc_id, pos, " +
        "regexp_replace(arr[pos], '^[\\t\\n\\f\\r ]+|[\\t\\n\\f\\r ]+$', '', 'g') AS line " +
        "FROM ldx) WHERE length(line) > 0), " +
        "ldhot AS (SELECT line FROM (SELECT line, count(DISTINCT doc_id) AS df " +
        "FROM ldnz GROUP BY 1) WHERE df > 3), " +
        "ld AS (SELECT cc.doc_id, COALESCE(reb.text, '') AS text FROM cc LEFT JOIN (" +
        "SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS text FROM ldnz " +
        "WHERE line NOT IN (SELECT line FROM ldhot) GROUP BY 1) reb USING (doc_id))"
    val quality =
      s"ql0 AS (SELECT doc_id, trim(x, '$SqlWs') AS line FROM (SELECT doc_id, " +
        s"unnest(string_split(text, chr(10))) AS x FROM ld) WHERE length(trim(x, '$SqlWs')) > 0), " +
        "qla AS (SELECT doc_id, sum(cnt) AS n_lines, count(*) AS n_distinct FROM (" +
        "SELECT doc_id, line, count(*) AS cnt FROM ql0 GROUP BY 1, 2) GROUP BY 1), " +
        s"${gramCteOver(2, "qg2", "ld")}, ${topCteOver("qg2", "qt2", "t2")}, " +
        s"${gramCteOver(3, "qg3", "ld")}, ${topCteOver("qg3", "qt3", "t3")}, " +
        "qf AS (SELECT ld.doc_id, ld.text FROM ld LEFT JOIN qla USING (doc_id) " +
        "LEFT JOIN qt2 USING (doc_id) LEFT JOIN qt3 USING (doc_id) " +
        s"WHERE $TokN BETWEEN 15 AND 100000 AND $DupLineFracSql <= 0.3 " +
        "AND COALESCE(t2, 0.0) <= 0.2 AND COALESCE(t3, 0.0) <= 0.18)"
    val decontam =
      s"dsh AS (SELECT doc_id, list_distinct(${ngramsOfToks(3)}) AS sh " +
        s"FROM (SELECT doc_id, string_split_regex(trim(text, '$SqlWs'), '\\s+') AS toks FROM qf)), " +
        "bench AS (SELECT DISTINCT unnest(sh) AS s FROM dsh WHERE doc_id % 50 = 0), " +
        "bad AS (SELECT DISTINCT c.doc_id FROM (SELECT doc_id, unnest(sh) AS s " +
        "FROM dsh WHERE doc_id % 50 <> 0) c JOIN bench USING (s)), " +
        "dc AS (SELECT doc_id, text FROM qf WHERE doc_id % 50 <> 0 " +
        "AND doc_id NOT IN (SELECT doc_id FROM bad))"
    val split =
      // df-capped pair mirror (maxDocFreq=4, same shape as
      // JaccardCappedPairsSql): drop shingles in > 4 surviving docs, recount
      // set sizes post-filter, Jaccard over the surviving sets only
      "psh AS (SELECT dsh.doc_id, dsh.sh FROM dsh JOIN dc USING (doc_id)), " +
        "pe AS (SELECT doc_id, unnest(sh) AS s FROM psh), " +
        "pdf AS (SELECT s, count(*) AS df FROM pe GROUP BY 1), " +
        "psur AS (SELECT pe.doc_id, pe.s FROM pe JOIN pdf USING (s) WHERE df <= 4), " +
        "psz AS (SELECT doc_id, count(*) AS n FROM psur GROUP BY 1), " +
        "pp AS (SELECT id_a, id_b FROM (SELECT a.doc_id AS id_a, b.doc_id AS id_b, " +
        "CAST(count(*) AS DOUBLE) / " +
        "(any_value(sa.n) + any_value(sb.n) - count(*)) AS jaccard " +
        "FROM psur a JOIN psur b ON a.s = b.s AND a.doc_id < b.doc_id " +
        "JOIN psz sa ON sa.doc_id = a.doc_id JOIN psz sb ON sb.doc_id = b.doc_id " +
        "GROUP BY a.doc_id, b.doc_id) WHERE jaccard >= 0.5), " +
        "edges AS (SELECT id_a AS src, id_b AS dst FROM pp UNION SELECT id_b, id_a FROM pp), " +
        "reach(a, b) AS (SELECT src, dst FROM edges " +
        "UNION SELECT r.a, e.dst FROM reach r JOIN edges e ON r.b = e.src), " +
        "comp AS (SELECT a AS id, least(a, min(b)) AS component FROM reach GROUP BY a), " +
        "tr AS (SELECT dc.doc_id, dc.text FROM dc LEFT JOIN comp ON dc.doc_id = comp.id " +
        s"WHERE ${splitCaseSql("COALESCE(comp.component, dc.doc_id)")} = 'train')"
    val export =
      "sh2 AS (SELECT doc_id, text, shard, row_number() OVER (" +
        "PARTITION BY shard ORDER BY h2 ASC, doc_id ASC) - 1 AS pos FROM (" +
        s"SELECT doc_id, text, ${pmSql(hashRawSql("doc_id"), "8")} AS shard, " +
        s"${hashRawSql("doc_id", 43)} AS h2 FROM tr)), " +
        "sn AS (SELECT shard * 4294967296 + pos AS nid, text FROM sh2), " +
        s"pk AS (SELECT nid, text, ${pmSql(hashRawSql("nid"), "4")} AS shard, $TokN AS n, " +
        s"sum($TokN) OVER (PARTITION BY ${pmSql(hashRawSql("nid"), "4")} ORDER BY nid " +
        // dropEmpty mirror — provably a no-op here (quality guarantees ≥ 15
        // tokens) but kept so the fragment stays an exact packSequences mirror
        s"ROWS UNBOUNDED PRECEDING) AS cum FROM sn WHERE $TokN > 0)"
    // every named CTE here ends up MATERIALIZED via the registry-wide
    // [[materializeCtes]] rewrite — this chain is the worst offender it
    // exists for (dsh feeds bench/bad/psh; qf feeds dsh and dc; ld feeds
    // ql0/qg2/qg3/qf; cc feeds ldx and ld — inlined, the whole
    // C4→dedup→quality prefix re-executed ~10×: 488 s → 0.8 s measured)
    "WITH RECURSIVE " +
      Seq(fixture, c4, lineDedup, quality, decontam, split, export).mkString(", ") +
      " SELECT CAST(shard AS BIGINT) AS shard, seq_id, " +
      "CAST(count(*) AS BIGINT) AS n_docs, " +
      "string_agg(text, chr(10) ORDER BY tok_offset, nid) AS seq_text " +
      "FROM (SELECT nid, text, shard, CAST((cum - n) // 256 AS BIGINT) AS seq_id, " +
      "CAST((cum - n) % 256 AS BIGINT) AS tok_offset FROM pk) " +
      "GROUP BY shard, seq_id"
  }

  /** Capped n-gram Jaccard mirror (maxDocFreq=4): shingles in more than 4
    * docs are dropped and Jaccard is recomputed over the SURVIVING sets —
    * sizes recounted post-filter, exactly like the operator. */
  private val JaccardCappedPairsSql =
    s"$ShinglesCte, e AS (SELECT doc_id, unnest(sh) AS s FROM t), " +
      "dfq AS (SELECT s, count(*) AS df FROM e GROUP BY 1), " +
      "surv AS (SELECT e.doc_id, e.s FROM e JOIN dfq USING (s) WHERE df <= 4), " +
      "sz AS (SELECT doc_id, count(*) AS n FROM surv GROUP BY 1) " +
      "SELECT id_a, id_b, jaccard FROM (" +
      "SELECT a.doc_id AS id_a, b.doc_id AS id_b, " +
      "CAST(count(*) AS DOUBLE) / (any_value(sa.n) + any_value(sb.n) - count(*)) AS jaccard " +
      "FROM surv a JOIN surv b ON a.s = b.s AND a.doc_id < b.doc_id " +
      "JOIN sz sa ON sa.doc_id = a.doc_id JOIN sz sb ON sb.doc_id = b.doc_id " +
      "GROUP BY a.doc_id, b.doc_id) WHERE jaccard >= 0.5"

  private val enStops = TextAnalysis.stopwords("en")
  private def sqlList(xs: Seq[String]) = xs.map(x => s"'$x'").mkString(", ")
  private val LowerToks = s"string_split_regex(trim(lower(text), '$SqlWs'), '\\s+')"
  private val RawToks = s"string_split_regex(trim(text, '$SqlWs'), '\\s+')"

  /** DuckDB twin of [[graft.operators.TextAnalysis.gpt2Pretokens]]: the
    * SAME lookahead-free reformulation of the GPT-2 splitter — strip
    * chr(1), the R2/R1 marker-insertion regexp_replaces, then
    * regexp_extract_all with the explicit-class pattern (RE2 and Java
    * agree on every construct used: literal classes, `\p{L}`/`\p{N}`,
    * greedy `+`, leftmost-first alternation). */
  private val Gpt2ToksSql: String = {
    val ws = "[ \\t\\n\\f\\r]"
    val nsw = "[\\t\\n\\f\\r]"
    val nonWs = "[^ \\t\\n\\f\\r\\x01]"
    val extract = "''s|''t|''re|''ve|''m|''ll|''d| ?\\p{L}+| ?\\p{N}+" +
      "| ?[^ \\t\\n\\f\\r\\x01\\p{L}\\p{N}]+|[ \\t\\n\\f\\r]+"
    val r2 = s"regexp_replace(replace(text, chr(1), ''), " +
      s"'($ws)($nsw)($nonWs)', '\\1' || chr(1) || '\\2' || chr(1) || '\\3', 'g')"
    val r1 = s"regexp_replace($r2, '($ws)( )($nonWs)', " +
      s"'\\1' || chr(1) || '\\2\\3', 'g')"
    s"regexp_extract_all($r1, '$extract')"
  }
  private val TokN = s"(CASE WHEN length(trim(text, '$SqlWs')) = 0 THEN 0 ELSE len($RawToks) END)"

  /** DuckDB twin of [[graft.functions.WordForm.normalize]] (NFC + the
    * control/zero-width scrub — the text_normalize contract), applied to
    * every token before the subword word-form gate. */
  private def sqlNorm(e: String): String =
    s"regexp_replace(nfc_normalize($e), " +
      "'[\\x01-\\x08\\x0B\\x0E-\\x1F\\x{7F}-\\x{9F}\\x{200B}-\\x{200D}\\x{FEFF}]', '', 'g')"

  /** DuckDB twin of [[graft.operators.TextAnalysis.isWordForm]]: 1..maxLen
    * Unicode letters — ANY plane, the round-15 astral lift — over an
    * ALREADY-normalized expression. RE2's `\p{L}` and Java's are both
    * code-point classifiers, DuckDB's `length` counts code points exactly
    * as Spark's does on UTF8String, so the gate (and its cap) mean the
    * same thing on both engines for astral letters too. maxLen 0 = no
    * length cap. */
  private def sqlWordGate(e: String, maxLen: Int = 0): String = {
    val cap = if (maxLen > 0) s" AND length($e) <= $maxLen" else ""
    s"(regexp_matches($e, '^\\p{L}+$$')$cap)"
  }

  /** Non-Latin decoration block for the subword-learning / fertility
    * fixtures (the decorate-the-fixture pattern of text_normalize): the
    * synthetic corpus is pure ASCII, so the multilingual word-form gate
    * would never fire on it. Four deterministic extra documents — Cyrillic,
    * German with BOTH composed and decomposed umlauts/acutes (NFC must
    * unify them), Greek, and whitespace-segmented Chinese stopwords (votes
    * `zh` in the language id, giving text_fertility its non-Latin row).
    * Ids start at 900000, beyond any generated doc_id at any SF. Single
    * source for BOTH engines: the Spark union and the mdocs VALUES CTE are
    * built from this one Seq. */
  private val MultiDocRows: Seq[(Long, String)] = Seq(
    (900003L, "мир мир мир низкий низкий новый слово слово слово слово"),
    (900007L, "grüße straße straße über über schön café café X9 123"),
    (900011L, "αθηνα αθηνα θαλασσα θαλασσα μικρος λογος λογος νερο"),
    (900019L, "的 是 了 在 我 有 和 就 不 人 的 是 了 在 我 有 和 就 不 人"))

  /** documents(doc_id, text) ∪ [[MultiDocRows]] — the corpus every subword
    * learner/encoder query and the fertility audit run on. */
  private def docsMulti(s: SparkSession, dir: String,
      floored: Boolean = false): DataFrame = {
    import s.implicits._
    docs(s, dir, floored).select(col("doc_id"), col("text"))
      .unionByName(MultiDocRows.toDF("doc_id", "text"))
  }

  /** DuckDB twin of [[docsMulti]] — prepend to any subword/fertility mirror
    * whose CTEs read `FROM mdocs`. Decoration texts contain no quotes, so
    * raw embedding is safe. */
  private val MdocsCte: String =
    "mdocs(doc_id, text) AS (SELECT doc_id, text FROM documents UNION ALL " +
      MultiDocRows.map { case (id, t) => s"SELECT $id, '$t'" }
        .mkString(" UNION ALL ") + ")"

  /** Astral-plane decoration block for the BMP-exclusion audit
    * (text_astral_oov): the synthetic corpus and [[MultiDocRows]] are
    * BMP-only, so the astral counters would read zero everywhere. Three
    * deterministic extra documents carry the cases the audit must tell
    * apart, all Unicode 3.1-era code points so Java and RE2 `\p{L}`
    * classifications agree: Deseret + CJK Extension B + Gothic +
    * mathematical-bold words (astral LETTERS — the recoverable OOV mass),
    * a mixed BMP+astral-letter word (also recoverable), emoji runs (astral
    * NON-letters — never admissible by any letter gate), and plain BMP
    * word forms interleaved as controls. Ids start at 910000 (beyond
    * [[MultiDocRows]]' 900000 block). Single source for BOTH engines. */
  private val AstralDocRows: Seq[(Long, String)] = Seq(
    (910001L, "𐐷𐐷𐐷 hello 𠀀𠀀 world 𐌰𐌰𐌰 мир"),
    (910007L, "😀 😀😀 mixé𝐀 𝐀𝐁𝐂 plain x9 123"),
    (910013L, "𝕬𝖅 café 𐐷hello straße 😀ok"),
    // repetition-heavy astral words so astral PAIRS actually WIN merge
    // rounds in the astral subword-learning proofs (text_*_astral): the
    // (𐐷,𐐷) pair count beats every BMP pair of the decoration corpus
    (910019L, "𐐷𐐷𐐷𐐷 𐐷𐐷𐐷𐐷 𐐷𐐷𐐷𐐷 𠀀𠀀𠀀 𠀀𠀀𠀀 𝕬𝖅𝕬𝖅 𝕬𝖅𝕬𝖅"))

  /** [[docsMulti]] ∪ [[AstralDocRows]] — the corpus the astral-exclusion
    * audit runs on. */
  private def docsAstral(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    docsMulti(s, dir).unionByName(AstralDocRows.toDF("doc_id", "text"))
  }

  /** DuckDB twin of [[docsAstral]]. */
  private val AdocsCte: String =
    s"$MdocsCte, adocs(doc_id, text) AS (SELECT doc_id, text FROM mdocs " +
      "UNION ALL " +
      AstralDocRows.map { case (id, t) => s"SELECT $id, '$t'" }
        .mkString(" UNION ALL ") + ")"

  /** GPT-2 pretokenizer decoration block (the decorate-the-fixture
    * pattern): the synthetic corpus is prose-like, so the splitter's edge
    * branches — contraction suffixes, digit runs, punctuation runs,
    * multi-space runs yielding their last space, tab-before-word,
    * paragraph "\n\n" tokens — need planted coverage, plus a
    * space-prefix-dominant doc so a " word"-shaped merge provably WINS a
    * learn round (the Ġ-convention proof). Ids start at 920000, beyond
    * [[AstralDocRows]]' block. Texts contain apostrophes — the SQL twin
    * doubles them. Single source for BOTH engines. */
  private val Gpt2DocRows: Seq[(Long, String)] = Seq(
    (920003L, "the cat isn't on the mat, the cat won't sit there"),
    (920007L, "alpha  beta   gamma\n\nnew paragraph\tcode:\tx=1 y=22"),
    (920011L, "abc123 456 789 12.5% $100 x50 don're it'll C3PO"),
    (920019L, "the the the the the the the the the the the the"))

  /** [[docsMulti]] ∪ [[Gpt2DocRows]] — the corpus the GPT-2-pretokenized
    * byte-level queries run on. */
  private def docsGpt2(s: SparkSession, dir: String,
      floored: Boolean = false): DataFrame = {
    import s.implicits._
    docsMulti(s, dir, floored).unionByName(Gpt2DocRows.toDF("doc_id", "text"))
  }

  /** Language-ID decoration block: Portuguese/Spanish pairs the STOPWORD
    * tier cannot separate (they share surface stopwords; the pt docs'
    * only stopword hit is English "a", so the stopword tier labels them
    * "en") but the char-trigram tier separates on "ção/ción"-class
    * morphology — plus German and French controls. All lowercase (no
    * case-folding subtleties), ids from 930000. Single source for BOTH
    * engines. */
  private val LangIdDocRows: Seq[(Long, String)] = Seq(
    (930001L, "a canção dos meninos não era uma ilusão mas um sonho"),
    (930007L, "la canción de los niños era una ilusión y el sueño"),
    (930011L, "não há tradução sem atenção às expressões da canção"),
    (930013L, "las naciones del mundo hablan una lengua que es común"),
    (930017L, "die kinder singen ein schönes lied und lachen nicht"),
    (930019L, "les enfants chantent une belle chanson dans les rues"))

  /** documents ∪ [[LangIdDocRows]] — the corpus the n-gram language-id
    * queries run on. */
  private def docsLang(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    docs(s, dir).select(col("doc_id"), col("text"))
      .unionByName(LangIdDocRows.toDF("doc_id", "text"))
  }

  /** DuckDB twin of [[docsLang]]. */
  private val LdocsCte: String =
    "ldocs(doc_id, text) AS (SELECT doc_id, text FROM documents UNION ALL " +
      LangIdDocRows.map { case (id, t) => s"SELECT $id, '$t'" }
        .mkString(" UNION ALL ") + ")"

  /** DuckDB twin of [[docsGpt2]] (apostrophes doubled; embedded real
    * newlines/tabs are legal inside SQL string literals). */
  private val GdocsCte: String =
    s"$MdocsCte, gdocs(doc_id, text) AS (SELECT doc_id, text FROM mdocs " +
      "UNION ALL " +
      Gpt2DocRows.map { case (id, t) =>
        s"SELECT $id, '${t.replace("'", "''")}'" }
        .mkString(" UNION ALL ") + ")"

  /** Fixture-only astral LEARN corpus for the astral subword proofs
    * (text_bpe_merges_astral and friends): the multilingual decoration ∪
    * the astral decoration, NO parquet scan — the proofs pin cross-engine
    * astral exactness (code-point symbolization, ordering, ids), which is
    * fixture-sized work; the at-scale plan shape is already pinned by the
    * non-astral siblings on the full corpus. */
  private def docsAstralSmall(s: SparkSession): DataFrame = {
    import s.implicits._
    (MultiDocRows ++ AstralDocRows).toDF("doc_id", "text")
  }

  /** DuckDB twin of [[docsAstralSmall]]. */
  private val AsdocsCte: String =
    "asdocs(doc_id, text) AS (" +
      (MultiDocRows ++ AstralDocRows)
        .map { case (id, t) => s"SELECT CAST($id AS BIGINT) AS doc_id, '$t' AS text" }
        .mkString(" UNION ALL ") + ")"

  /** The WITH-prefix corpus CTE chain for a given subword-mirror corpus
    * name — every subword oracle builder is parameterized by this so the
    * same learn/apply/ids replay runs over the production corpus (mdocs)
    * or the astral proof fixture (asdocs). */
  private def corpusCte(corpus: String): String = corpus match {
    case "mdocs"  => MdocsCte
    case "adocs"  => AdocsCte
    case "asdocs" => AsdocsCte
    case "gdocs"  => GdocsCte
    case other    => throw new IllegalArgumentException(s"unknown corpus $other")
  }

  /** Shared CTE prefix for the subword-tokenization mirrors: word instances
    * with per-doc index (wd), substring frequencies → the 256-piece vocab in
    * (count DESC, piece ASC) rank order (bvocab — exactly
    * TextAnalysis.learnSubwordVocab), and the greedy longest-match walk
    * replayed as a recursive CTE (enc): each step consumes the LONGEST vocab
    * piece matching at the cursor (correlated top-1 over the vocab by piece
    * length — unique, since equal-length matches at one position are the
    * same string), falling back to the single codepoint with OOV id 99999.
    * DuckDB's substring/length count codepoints, as does the Scala
    * expression — the walk replays character-for-character. */
  private val BpeCtes =
    s"wd AS (SELECT doc_id, i AS wi, toks[i] AS w " +
      s"FROM (SELECT doc_id, $RawToks AS toks FROM documents), " +
      "LATERAL (SELECT unnest(generate_series(1, len(toks))) AS i) " +
      "WHERE toks[i] <> ''), " +
      "sub AS (SELECT substring(w, p, n) AS piece FROM wd, " +
      "LATERAL (SELECT unnest(generate_series(1, length(w))) AS p), " +
      "LATERAL (SELECT unnest(generate_series(1, least(4, length(w) - p + 1))) AS n)), " +
      "bvocab AS (SELECT piece, CAST(row_number() OVER (ORDER BY cnt DESC, piece ASC) - 1 AS BIGINT) AS tid " +
      "FROM (SELECT piece, count(*) AS cnt FROM sub GROUP BY piece) " +
      "ORDER BY cnt DESC, piece ASC LIMIT 256), " +
      // the longest vocab match per (distinct word, position) is
      // PRE-computed with plain length-bucketed left joins, so the
      // recursive walk below needs only an equi-join on (w, pos) — the
      // `reach` pattern. The former formulation (a correlated ORDER
      // BY/LIMIT-1 subquery over bvocab INSIDE the recursion) returned
      // garbage once bvocab was MATERIALIZED (DuckDB 1.0: ~88% of lookups
      // came back NULL and the walk degraded to per-codepoint OOV —
      // caught by the round-13 full gate), and correlated-subquery-over-
      // materialized-CTE-in-recursion is now a banned construct here
      "bpm AS (SELECT w, p, " +
      "COALESCE(b4.piece, b3.piece, b2.piece, b1.piece, substring(w, p, 1)) AS piece, " +
      "COALESCE(b4.tid, b3.tid, b2.tid, b1.tid, 99999) AS tid " +
      "FROM (SELECT w, length(w) AS wl, " +
      "unnest(generate_series(1, length(w))) AS p " +
      "FROM (SELECT DISTINCT w FROM wd)) dp " +
      "LEFT JOIN bvocab b4 ON dp.wl - dp.p + 1 >= 4 " +
      "AND length(b4.piece) = 4 AND b4.piece = substring(dp.w, dp.p, 4) " +
      "LEFT JOIN bvocab b3 ON dp.wl - dp.p + 1 >= 3 " +
      "AND length(b3.piece) = 3 AND b3.piece = substring(dp.w, dp.p, 3) " +
      "LEFT JOIN bvocab b2 ON dp.wl - dp.p + 1 >= 2 " +
      "AND length(b2.piece) = 2 AND b2.piece = substring(dp.w, dp.p, 2) " +
      "LEFT JOIN bvocab b1 ON length(b1.piece) = 1 " +
      "AND b1.piece = substring(dp.w, dp.p, 1)), " +
      "enc AS (WITH RECURSIVE st(doc_id, wi, w, pos, spos, piece, tid) AS (" +
      "SELECT doc_id, wi, w, 1, CAST(0 AS BIGINT), CAST(NULL AS VARCHAR), CAST(NULL AS BIGINT) FROM wd " +
      "UNION ALL SELECT e.doc_id, e.wi, e.w, e.pos + length(m.piece), " +
      "CAST(e.pos AS BIGINT), m.piece, m.tid FROM st e " +
      "JOIN bpm m ON m.w = e.w AND m.p = e.pos " +
      "WHERE e.pos <= length(e.w)) " +
      "SELECT doc_id, wi, spos, piece, tid FROM st WHERE piece IS NOT NULL)"
  private val StopRatioSql =
    s"(CASE WHEN $TokN = 0 THEN 0.0 ELSE " +
      s"CAST(len(list_filter($LowerToks, x -> x IN (${sqlList(enStops)}))) AS DOUBLE) / len($RawToks) END)"
  private val AlphaRatioSql =
    "(CASE WHEN length(text) = 0 THEN 0.0 ELSE " +
      "CAST(length(regexp_replace(text, '[^a-zA-Z ]', '', 'g')) AS DOUBLE) / length(text) END)"
  /** THE mirror of TextAnalysis.qualityScore — shared by the text_stats
    * projection and the quantile-cutoff oracle (never respell). */
  private val QualitySql =
    s"((CASE WHEN $TokN BETWEEN 5 AND 10000 THEN 1.0 ELSE 0.0 END) * 0.2 + " +
      s"$StopRatioSql * 0.4 + $AlphaRatioSql * 0.4)"

  private val langStops: Seq[(String, Seq[String])] =
    TextAnalysis.stopwords.toSeq.sortBy(_._1)

  /** DuckDB mirror of [[graft.functions.RollingHashes]]: per-doc byte list
    * (testdata text is pure ASCII, so bytes == chars) and the per-position
    * Rabin–Karp hash recomputed O(n·w) with HUGEINT mod-2⁶⁴ arithmetic —
    * bit-equal to the JVM's overflowing-long fold. Yields CTEs `b(doc_id, n,
    * bytes)` and `rh(doc_id, n, hashes)`. */
  private def rollingHashCte(window: Int, src: String = "documents"): String =
    "WITH b AS (SELECT doc_id, length(text) AS n, " +
      "[CAST(CAST(('0x' || substr(h, 2*i+1, 2)) AS INT) AS HUGEINT) " +
      "for i in range(len(h)//2)] AS bytes " +
      s"FROM (SELECT doc_id, hex(encode(text)) AS h, text FROM $src)), " +
      "rh AS (SELECT doc_id, n, CASE WHEN len(bytes) = 0 THEN [CAST(0 AS HUGEINT)] " +
      s"ELSE [list_reduce(bytes[i+1 : i+least($window, len(bytes))], " +
      "(acc, x) -> (acc * 1000003 + x) % 18446744073709551616) " +
      s"for i in range(greatest(len(bytes) - $window, 0) + 1)] END AS hashes FROM b)"

  /** Mirror of Sampling.hashRaw(id, seed); pmod spelled out since DuckDB's %
    * keeps the dividend's sign. The residue offsets replay hashRaw's
    * floorMod(seed, prime) + 1 (seed 42 → both offsets 43). The id
    * expression must already be BIGINT-typed (products reach ~2⁴⁵). */
  private def pmSql(x: String, m: String) = s"((($x) % $m + $m) % $m)"
  private def hashRawSql(id: String, seed: Long = 42): String = {
    val s1 = java.lang.Math.floorMod(seed, 1000003L) + 1
    val s2 = java.lang.Math.floorMod(seed, 999983L) + 1
    val t = pmSql(s"(${pmSql(id, "1000003")} + $s1) * (${pmSql(id, "999983")} + $s2)",
      "2147483647")
    pmSql(s"${pmSql(s"$t * 48271", "2147483647")} * 48271", "2147483647")
  }
  /** DuckDB twin of Eval.binomFold — C(m, k) as the divisibility-exact
    * integer fold via a seed-as-first-element list_reduce (k = 0 gives
    * the bare seed 1: generate_series(1, 0) is empty in DuckDB). */
  private def binomSql(m: String, k: Int): String =
    s"list_reduce(list_prepend(CAST(1 AS BIGINT), " +
      s"[CAST(j AS BIGINT) for j in generate_series(1, $k)]), " +
      s"(acc, j) -> (acc * (($m) - $k + j)) // j)"

  private val HashRaw = hashRawSql("doc_id")
  private def hashBSql(id: String) = pmSql(hashRawSql(id), Sampling.Buckets.toString)
  private val HashB = hashBSql("doc_id")

  /** THE mirror of Sampling.splitAssignment for the 80/10/10 split — used by
    * both the sample_split and audit_split_leakage oracles (one definition,
    * same rule as the stopword lists: never duplicate). Cuts computed with
    * the same double arithmetic as the Scala scanLeft. */
  private def splitCaseSql(id: String): String =
    s"CASE WHEN ${hashBSql(id)} < ${(0.8 * Sampling.Buckets).toLong} THEN 'train' " +
      s"WHEN ${hashBSql(id)} < ${((0.8 + 0.1) * Sampling.Buckets).toLong} THEN 'val' " +
      "ELSE 'test' END"

  // --- portable PolyHash64 mirror (HUGEINT mod-2⁶⁴ arithmetic) ---

  private val Mod64 = "18446744073709551616" // 2^64

  /** Shared CTE chain of the `text_bm25_topk` / `eval_retrieval` mirrors:
    * the full multi-query BM25 pipeline (doc lengths, corpus stats, postings
    * restricted to the query-term set, round-4 scores) ending in `rk` =
    * (query_id, doc_id, n_hits, score, rank) with rank UNFILTERED — each
    * consumer applies its own `rank <= k`. Also exposes `q` (query terms),
    * `toks` (lowered doc tokens) and `terms` for the relevance ground
    * truth. */
  private lazy val Bm25TopkCtes: String =
    "dl AS (SELECT doc_id, CASE WHEN text IS NULL OR " +
      s"len(trim(text, '${TextAnalysis.WsCharsRaw}')) = 0 THEN 0.0 ELSE " +
      s"CAST(len(string_split_regex(trim(text, '${TextAnalysis.WsCharsRaw}'), '\\s+')) AS DOUBLE) END AS dl " +
      "FROM documents), " +
      "stats AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(dl) AS avgdl FROM dl), " +
      "toks AS (SELECT doc_id, unnest(string_split_regex(" +
      s"trim(lower(text), '${TextAnalysis.WsCharsRaw}'), '\\s+')) AS tok " +
      "FROM documents WHERE text IS NOT NULL), " +
      "q AS (SELECT DISTINCT query_id, term FROM (SELECT doc_id AS query_id, " +
      s"unnest(tk[1:3]) AS term FROM (SELECT doc_id, string_split_regex(" +
      s"trim(lower(text), '${TextAnalysis.WsCharsRaw}'), '\\s+') AS tk " +
      "FROM documents WHERE doc_id % 100 = 0 AND text IS NOT NULL)) " +
      "WHERE len(term) > 0), " +
      "terms AS (SELECT DISTINCT term FROM q), " +
      "tf AS (SELECT doc_id, tok, count(*) AS tf FROM toks " +
      "JOIN terms ON tok = term GROUP BY 1, 2), " +
      "dfx AS (SELECT tok, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY 1), " +
      "sc AS (SELECT query_id, doc_id, CAST(count(*) AS BIGINT) AS n_hits, " +
      "(floor((sum(ln(1.0 + (n_docs - df + 0.5) / (df + 0.5)) * " +
      "CAST(tf AS DOUBLE) * 2.2 / (CAST(tf AS DOUBLE) + 1.2 * (0.25 + 0.75 * dl / avgdl)))) * 10000 + 0.499999) / 10000) AS score " +
      "FROM tf JOIN dfx USING (tok) JOIN dl USING (doc_id) CROSS JOIN stats " +
      "JOIN q ON q.term = tf.tok GROUP BY 1, 2), " +
      "rk AS (SELECT *, CAST(row_number() OVER (PARTITION BY query_id " +
      "ORDER BY score DESC, doc_id ASC) AS BIGINT) AS rank FROM sc)"
  /** (z · c) mod 2⁶⁴ with every intermediate < 2⁹⁷ (HUGEINT is signed 128-bit;
    * a direct product of two 64-bit values would overflow it): split c into
    * 32-bit halves — z·cLo + ((z·cHi mod 2³²) << 32), all mod 2⁶⁴. */
  private def mulMod64Sql(z: String, c: Long): String = {
    val cHi = c >>> 32
    val cLo = c & 0xffffffffL
    s"((($z) * $cLo + (((($z) % 4294967296) * $cHi) % 4294967296) * 4294967296) % $Mod64)"
  }

  /** CTE chain `tok → … → ph(doc_id, h)`: one portable 64-bit token hash per
    * (doc, whitespace token) — the exact DuckDB replay of
    * [[graft.functions.PolyHash64]] (byte-polynomial fold then splitmix64,
    * each mixer step its own CTE so the fold is never duplicated). Testdata
    * text is ASCII, so the hex(encode(..)) byte list is the UTF-8 byte
    * sequence the JVM hashes. */
  private val PolyHashCte = {
    import graft.functions.PolyHash64.{B, C1, C2}
    s"WITH tok AS (SELECT doc_id, unnest(string_split_regex(trim(text, '$SqlWs'), '\\s+')) AS t " +
      "FROM documents), " +
      "hx AS (SELECT doc_id, hex(encode(t)) AS x FROM tok), " +
      "byt AS (SELECT doc_id, [CAST(CAST('0x' || substr(x, 2*i+1, 2) AS INT) AS HUGEINT) " +
      "for i in range(len(x)//2)] AS bytes FROM hx), " +
      "f0 AS (SELECT doc_id, list_reduce(list_prepend(CAST(0 AS HUGEINT), bytes), " +
      s"(acc, b) -> (acc * $B + b) % $Mod64) AS z FROM byt), " +
      "m1 AS (SELECT doc_id, xor(z, z >> 30) AS z FROM f0), " +
      s"m2 AS (SELECT doc_id, ${mulMod64Sql("z", C1)} AS z FROM m1), " +
      "m3 AS (SELECT doc_id, xor(z, z >> 27) AS z FROM m2), " +
      s"m4 AS (SELECT doc_id, ${mulMod64Sql("z", C2)} AS z FROM m3), " +
      "ph AS (SELECT doc_id, xor(z, z >> 31) AS h FROM m4)"
  }

  /** Parametric PolyHash64 mirror: CTE steps hashing string expression
    * `strExpr` of relation `src` (carrying columns `keep`) into relation
    * `out(keep..., h)` with h the UNSIGNED HUGEINT in [0, 2⁶⁴) — compose
    * with [[signedSql]] when the consumer orders by the JVM's signed long.
    * Same fold/mixer chain as [[PolyHashCte]] (which predates this helper
    * and stays verbatim so its dependent oracles are untouched). */
  private def polyHashSteps(keep: String, strExpr: String, src: String,
      out: String): String = {
    import graft.functions.PolyHash64.{B, C1, C2}
    s"hx_$out AS (SELECT $keep, hex(encode($strExpr)) AS x FROM $src), " +
      s"byt_$out AS (SELECT $keep, [CAST(CAST('0x' || substr(x, 2*i+1, 2) AS INT) AS HUGEINT) " +
      s"for i in range(len(x)//2)] AS bytes FROM hx_$out), " +
      s"f0_$out AS (SELECT $keep, list_reduce(list_prepend(CAST(0 AS HUGEINT), bytes), " +
      s"(acc, b) -> (acc * $B + b) % $Mod64) AS z FROM byt_$out), " +
      s"m1_$out AS (SELECT $keep, xor(z, z >> 30) AS z FROM f0_$out), " +
      s"m2_$out AS (SELECT $keep, ${mulMod64Sql("z", C1)} AS z FROM m1_$out), " +
      s"m3_$out AS (SELECT $keep, xor(z, z >> 27) AS z FROM m2_$out), " +
      s"m4_$out AS (SELECT $keep, ${mulMod64Sql("z", C2)} AS z FROM m3_$out), " +
      s"$out AS (SELECT $keep, xor(z, z >> 31) AS h FROM m4_$out)"
  }

  /** Full DuckDB replay of [[Dedup.minhashBandingEval]]: portable per-slot
    * signature (hashRaw chains over the signed PolyHash64 shingle hash —
    * the slots themselves replay, unlike the production xxhash64
    * signature), UNION-ALL banding, the band equi-join, the all-pairs
    * Jaccard ground truth (the oracle is the brute-force spec), and the
    * full-outer count roll-up. */
  private def bandingEvalOracleSql(k: Int, bands: Int): String = {
    val rows = k / bands
    val minCols = (0 until k)
      .map(i => s"min(${hashRawSql("hh", i + 1)}) AS s$i").mkString(", ")
    val bd = (0 until bands).map { b =>
      val vs = (0 until rows)
        .map(j => s"s${b * rows + j} AS v${j + 1}").mkString(", ")
      s"SELECT doc_id, $b AS band, $vs FROM sig"
    }.mkString(" UNION ALL ")
    val on = (1 to rows).map(j => s"a.v$j = b.v$j").mkString(" AND ")
    s"$ShinglesCte, e AS (SELECT doc_id, unnest(sh) AS s FROM t), " +
      polyHashSteps("doc_id", "s", "e", "ph") + ", " +
      s"hs AS (SELECT doc_id, ${signedSql("h")} AS hh FROM ph), " +
      s"sig AS (SELECT doc_id, $minCols FROM hs GROUP BY doc_id), " +
      s"bd AS ($bd), " +
      "c AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b " +
      s"FROM bd a JOIN bd b ON a.band = b.band AND $on AND a.doc_id < b.doc_id), " +
      // ground truth in the shingle equi-join form (see JaccardPairsSql) —
      // the n² list_intersect original was this mirror's whole cost
      "szj AS (SELECT doc_id, count(*) AS n FROM e GROUP BY 1), " +
      "tr AS (SELECT id_a, id_b FROM (SELECT a.doc_id AS id_a, b.doc_id AS id_b, " +
      "CAST(count(*) AS DOUBLE) / " +
      "(any_value(sa.n) + any_value(sb.n) - count(*)) AS j " +
      "FROM e a JOIN e b ON a.s = b.s AND a.doc_id < b.doc_id " +
      "JOIN szj sa ON sa.doc_id = a.doc_id JOIN szj sb ON sb.doc_id = b.doc_id " +
      "GROUP BY a.doc_id, b.doc_id) WHERE j >= 0.5), " +
      "m AS (SELECT CASE WHEN c.id_a IS NOT NULL THEN 1 ELSE 0 END AS is_c, " +
      "CASE WHEN tr.id_a IS NOT NULL THEN 1 ELSE 0 END AS is_t " +
      "FROM c FULL JOIN tr ON c.id_a = tr.id_a AND c.id_b = tr.id_b) " +
      "SELECT CAST(sum(is_t) AS BIGINT) AS n_truth, " +
      "CAST(sum(is_c) AS BIGINT) AS n_candidates, " +
      "CAST(sum(is_c * is_t) AS BIGINT) AS tp, " +
      "CAST(sum(is_c * (1 - is_t)) AS BIGINT) AS fp, " +
      "CAST(sum((1 - is_c) * is_t) AS BIGINT) AS fn, " +
      "CAST(sum(is_c * is_t) AS DOUBLE) / CAST(sum(is_c) AS DOUBLE) AS cand_precision, " +
      "CAST(sum(is_c * is_t) AS DOUBLE) / CAST(sum(is_t) AS DOUBLE) AS cand_recall " +
      "FROM m"
  }

  /** The analytic aHash CTE chain: given a relation exposing pattern ids as
    * `pid`, yields `ah(pid, phash)` — Multimodal.patternDims/patternRgb
    * pixels over a generate_series grid, ITU-601 luma ×1000, ⌊·8/dim⌋
    * blocking, exact cross-product block-vs-global compare, HUGEINT bit sum
    * folded to the signed 64-bit signature (the DuckDB twin of
    * Multimodal.imageAHash ∘ synthesizeImages, no codec needed). */
  /** DuckDB twin of [[graft.operators.Multimodal.framePatternId]] /
    * [[graft.operators.Multimodal.frameCount]]: the (doc, frame) → pattern-id
    * relation for the mm_frames_* mirrors (predecessor-planted duplicates,
    * affine-scrambled pattern ids). */
  private val FramesCte: String = {
    val base = "(doc_id - CASE WHEN doc_id % 7 = 3 THEN 1 ELSE 0 END)"
    // both pre-scramble mods mirror framePatternId exactly: they keep the
    // int64 product bound for any doc_id (and are the identity at every
    // generated SF, so pattern ids are unchanged)
    s"fr AS (SELECT doc_id, f, (((($base % 2147483648) * 8 + f) " +
      "% 2147483648) * 1103515245 + 12345) % 2147483648 AS pid " +
      "FROM documents, " +
      s"LATERAL (SELECT unnest(generate_series(0, $base % 3 + 1)) AS f))"
  }

  /** Channel formulas: the image (near-planar gradient) and frame
    * (quadratic texture) pattern families — twins of
    * [[graft.operators.Multimodal.patternRgb]] / `framePatternRgb`. */
  private val ImageRgbSql: (String, String, String) =
    ("(pid * 7 + x * 3 + y * 5) % 256",
      "(pid + x * 11 + y) % 256",
      "(pid * 3 + x + y * 13) % 256")
  private val FrameRgbSql: (String, String, String) =
    ("(pid * 7 + (3 + pid % 5) * x * x + (5 + pid % 7) * y * y + x * y) % 256",
      "(pid + (11 + pid % 3) * x * x + y * y + (7 + pid % 11) * x) % 256",
      "(pid * 3 + x * x + (13 + pid % 13) * y * y + (5 + pid % 2) * x * y) % 256")
  private def graySql(rgb: (String, String, String)): String =
    s"(${rgb._1}) * 299 + (${rgb._2}) * 587 + (${rgb._3}) * 114"

  private def aHashCtes(pidSrc: String,
      rgb: (String, String, String) = ImageRgbSql): String =
    s"px AS (SELECT pid, width, height, x, y, " +
      s"${graySql(rgb)} AS gray, " +
      "(x * 8) // width AS bi, (y * 8) // height AS bj " +
      s"FROM (SELECT pid, CAST(pid % 16 + 8 AS BIGINT) AS width, " +
      s"CAST(pid % 12 + 8 AS BIGINT) AS height FROM $pidSrc), " +
      "LATERAL (SELECT unnest(generate_series(0, width - 1)) AS x), " +
      "LATERAL (SELECT unnest(generate_series(0, height - 1)) AS y)), " +
      "blk AS (SELECT pid, bj, bi, sum(gray) AS bs, count(*) AS bn " +
      "FROM px GROUP BY 1, 2, 3), " +
      "tot AS (SELECT pid, sum(gray) AS ts, count(*) AS n FROM px GROUP BY 1), " +
      "sg AS (SELECT b.pid, sum(CASE WHEN b.bs * t.n > t.ts * b.bn " +
      "THEN CAST(1 AS HUGEINT) << CAST(b.bj * 8 + b.bi AS INT) " +
      "ELSE CAST(0 AS HUGEINT) END) AS sig " +
      "FROM blk b JOIN tot t USING (pid) GROUP BY 1), " +
      "ah AS (SELECT pid, CAST(CASE WHEN sig >= 9223372036854775808 " +
      "THEN sig - 18446744073709551616 ELSE sig END AS BIGINT) AS phash FROM sg)"

  /** Full DuckDB replay of [[graft.operators.Multimodal.imagePHashDct]]
    * over the gradient scene family: per-doc scene parameters
    * (Multimodal.gradientParams — every division a nonneg floor with the
    * sign OUTSIDE, so `//` replays the JVM exactly), the 32×32
    * nearest-neighbor luma grid, the separable integer DCT against the
    * EMBEDDED fixed-point cosine table (literals read from
    * Multimodal.DctCos at oracle-build time — single source, no trig
    * re-evaluation), the rank-32 AC median (value at a rank is
    * deterministic under ties), and the >median bit fold with the aHash
    * HUGEINT→BIGINT wrap. Yields CTE `phb(doc_id, phash)`. */
  private def pHashDctCtes: String = {
    val cosVals = (for (k <- 0 until 8; n <- 0 until 32)
      yield s"($k, $n, ${graft.operators.Multimodal.DctCos(k)(n)})")
      .mkString(", ")
    "gq AS (SELECT doc_id, w, h, gid % 3 - 1 AS ax, (gid // 3) % 3 - 1 AS ay, " +
      "(gid // 9) % 5 - 2 AS cxy, (gid // 45) % 3 - 1 AS qx, " +
      "(gid // 135) % 3 - 1 AS qy FROM " +
      "(SELECT doc_id, (doc_id // 2) % 405 AS gid, " +
      "CASE WHEN doc_id % 2 = 0 THEN 16 ELSE 24 END AS w, 16 AS h " +
      "FROM documents)), " +
      s"dcos(k, n, c) AS (VALUES $cosVals), " +
      "g32 AS (SELECT doc_id, j, i, 1000 * greatest(0, least(255, " +
      "128 + ax * (((i * w) // 32) * 48 // w) " +
      "+ ay * (((j * h) // 32) * 48 // h) " +
      "+ cxy * (((i * w) // 32) * ((j * h) // 32) * 48 // (w * h)) " +
      "+ qx * (((i * w) // 32) * ((i * w) // 32) * 48 // (w * w)) " +
      "+ qy * (((j * h) // 32) * ((j * h) // 32) * 48 // (h * h)))) AS g " +
      "FROM gq, LATERAL (SELECT unnest(generate_series(0, 31)) AS i), " +
      "LATERAL (SELECT unnest(generate_series(0, 31)) AS j)), " +
      "pt1 AS (SELECT doc_id, j, d.k AS v, sum(g * d.c) AS t FROM g32 " +
      "JOIN dcos d ON d.n = i GROUP BY 1, 2, 3), " +
      "pt2 AS (SELECT doc_id, d.k AS u, v, sum(d.c * t) AS f FROM pt1 " +
      "JOIN dcos d ON d.n = j GROUP BY 1, 2, 3), " +
      "pac AS (SELECT doc_id, u, v, f, row_number() OVER " +
      "(PARTITION BY doc_id ORDER BY f) AS rn " +
      "FROM pt2 WHERE NOT (u = 0 AND v = 0)), " +
      "pmd AS (SELECT doc_id, f AS med FROM pac WHERE rn = 32), " +
      "psg AS (SELECT a.doc_id, sum(CASE WHEN a.f > m.med " +
      "THEN CAST(1 AS HUGEINT) << CAST(a.u * 8 + a.v AS INT) " +
      "ELSE CAST(0 AS HUGEINT) END) AS sig " +
      "FROM pac a JOIN pmd m USING (doc_id) GROUP BY 1), " +
      "phb AS (SELECT doc_id, CAST(CASE WHEN sig >= 9223372036854775808 " +
      "THEN sig - 18446744073709551616 ELSE sig END AS BIGINT) AS phash " +
      "FROM psg)"
  }

  /** Blocklist fixture phrases, shared verbatim by the Spark query and the
    * DuckDB mirror. Chosen to exercise the automaton's hard cases on the
    * corpus vocabulary: "able" is a proper suffix of "table" (suffix-link
    * hit), "table table" overlaps its own "table"s, and "big query" /
    * "query big" overlap each other inside "... query big query ...". */
  private val BlocklistPats = Seq(
    "table", "able", "table table", "big query", "query big", "merge batch")

  /** The same phrases as a DuckDB CTE `p(pat)`. */
  private lazy val BlocklistPatsCteSql: String =
    "p AS (SELECT unnest([" +
      BlocklistPats.map(p => s"'$p'").mkString(", ") + "]) AS pat)"

  /** Shared WITH-prefix for the Naive Bayes oracles: the full model fit
    * (class-token counts, class totals, vocab, doc term/length tables) and
    * the per-(doc, class) score in the identical sparse refactor
    * score = ln(D_c/D) − T_d·ln(N_c+V) + Σ tf·ln(C+1), ending in CTE `sc`
    * with the stable-rounded negated score `ns` ready for the struct-min
    * argmax. */
  private lazy val NbWithSql: String =
    "WITH tk AS (SELECT doc_id, cls, w FROM (SELECT doc_id, lang AS cls, " +
      "unnest(string_split_regex(trim(lower(text), " +
      s"'${TextAnalysis.WsCharsRaw}'), '\\s+')) AS w FROM documents " +
      "WHERE lang IS NOT NULL AND text IS NOT NULL) WHERE w <> ''), " +
      "ct AS MATERIALIZED (SELECT cls, w, count(*) AS cnt FROM tk GROUP BY 1, 2), " +
      "cl AS MATERIALIZED (SELECT d.cls, d.ndocs, COALESCE(t.ntok, 0) AS ntok " +
      "FROM (SELECT lang AS cls, count(*) AS ndocs FROM documents " +
      "WHERE lang IS NOT NULL GROUP BY 1) d LEFT JOIN (" +
      "SELECT cls, sum(cnt) AS ntok FROM ct GROUP BY 1) t USING (cls)), " +
      "v AS (SELECT count(DISTINCT w) AS vsize FROM ct), " +
      "dt AS (SELECT count(*) AS dtot FROM documents), " +
      "dtf AS (SELECT doc_id, w, count(*) AS tf FROM tk GROUP BY 1, 2), " +
      "dl AS (SELECT doc_id, count(*) AS tlen FROM tk GROUP BY 1), " +
      "co AS (SELECT doc_id, cls, sum(tf * ln(CAST(cnt + 1 AS DOUBLE))) AS s " +
      "FROM dtf JOIN ct USING (w) GROUP BY 1, 2), " +
      "sc AS (SELECT b.doc_id, b.lang, c.cls, " +
      s"-${sqlRound4("ln(CAST(c.ndocs AS DOUBLE) / CAST(dt.dtot AS DOUBLE)) " +
        "- b.tlen * ln(CAST(c.ntok + v.vsize AS DOUBLE)) + COALESCE(co.s, 0.0)")} " +
      "AS ns FROM (SELECT d.doc_id, d.lang, COALESCE(dl.tlen, 0) AS tlen " +
      "FROM documents d LEFT JOIN dl USING (doc_id)) b " +
      "CROSS JOIN cl c CROSS JOIN v CROSS JOIN dt " +
      "LEFT JOIN co ON co.doc_id = b.doc_id AND co.cls = c.cls)"

  /** Shared transition-graph extraction prefix for the unweighted graph
    * oracles (bfs / kcore / linkpred): identical to the weighted family's
    * prefix but with multiplicity collapsed, matching the operators'
    * leading `.distinct()`. */
  private lazy val GraphDistinctEdgesSql: String =
    s"ev AS (SELECT user_id, $TsUs AS t, event_id, " +
      "CAST(json_extract_string(props, '$.k') AS BIGINT) AS node FROM events " +
      "WHERE json_extract_string(props, '$.k') IS NOT NULL), " +
      "tr AS (SELECT node AS src, lead(node) OVER (" +
      "PARTITION BY user_id ORDER BY t, event_id) AS dst FROM ev), " +
      "edges AS (SELECT DISTINCT src, dst FROM tr WHERE dst IS NOT NULL)"

  /** Full DuckDB replay of Graph.kcore: `rounds` unrolled peeling rounds
    * over the symmetrized simple graph — each round keeps the nodes whose
    * degree among current survivors is ≥ k; peeling is idempotent after
    * the fixpoint, so extra unrolled rounds are no-ops and the truncated
    * semantics meet Spark's early exit bit-for-bit. */
  private def kcoreOracleSql(k: Int, rounds: Int): String = {
    val head = s"WITH $GraphDistinctEdgesSql, " +
      "sym AS MATERIALIZED (SELECT DISTINCT src, dst FROM (" +
      "SELECT src, dst FROM edges UNION ALL SELECT dst, src FROM edges) " +
      "WHERE src <> dst), " +
      "a0 AS MATERIALIZED (SELECT DISTINCT src AS node FROM sym)"
    val iterCtes = (1 to rounds).map { i =>
      s"a$i AS MATERIALIZED (SELECT node FROM (SELECT s.src AS node, " +
        s"count(*) AS dg FROM sym s JOIN a${i - 1} x ON s.src = x.node " +
        s"JOIN a${i - 1} y ON s.dst = y.node GROUP BY 1) WHERE dg >= $k)"
    }.mkString(", ")
    s"$head, $iterCtes SELECT s.src AS node, CAST(count(*) AS BIGINT) AS core_deg " +
      s"FROM sym s JOIN a$rounds x ON s.src = x.node " +
      s"JOIN a$rounds y ON s.dst = y.node GROUP BY 1"
  }

  /** Full DuckDB replay of Graph.labelPropagation: same symmetrized weighted
    * edge relation, every synchronous round unrolled as a MATERIALIZED CTE
    * with the identical lexicographic min({-wsum, label}) vote. */
  private def labelPropOracleSql(iters: Int): String = {
    val head = s"WITH ev AS (SELECT user_id, $TsUs AS t, event_id, " +
      "CAST(json_extract_string(props, '$.k') AS BIGINT) AS node FROM events " +
      "WHERE json_extract_string(props, '$.k') IS NOT NULL), " +
      "tr AS (SELECT node AS src, lead(node) OVER (" +
      "PARTITION BY user_id ORDER BY t, event_id) AS dst FROM ev), " +
      "edges AS (SELECT src, dst, count(*) AS w FROM tr WHERE dst IS NOT NULL " +
      "GROUP BY 1, 2), " +
      "sym AS MATERIALIZED (SELECT src, dst, sum(w) AS w FROM (" +
      "SELECT src, dst, w FROM edges UNION ALL SELECT dst, src, w FROM edges) " +
      "WHERE src <> dst GROUP BY 1, 2), " +
      "l0 AS MATERIALIZED (SELECT DISTINCT src AS node, src AS label FROM sym)"
    val iterCtes = (1 to iters).map { i =>
      s"l$i AS MATERIALIZED (SELECT node, (min({'nw': -wsum, 'l': label})).l " +
        "AS label FROM (SELECT e.dst AS node, l.label, sum(e.w) AS wsum " +
        s"FROM sym e JOIN l${i - 1} l ON e.src = l.node GROUP BY 1, 2) GROUP BY node)"
    }.mkString(", ")
    s"$head, $iterCtes SELECT node, label AS community FROM l$iters"
  }

  /** Full DuckDB replay of Sketches.amsF2 over events.user_id: the same
    * seeded parity signs, counter sums, floor-divided means-of-squares, and
    * odd-count median pick — exact integers at every step. */
  private def amsF2OracleSql(d1: Int, d2: Int): String = {
    val zs = (0 until d1 * d2).map(i =>
      s"sum(CAST((h // ${1L << i}) % 2 AS BIGINT) * 2 - 1) AS z$i").mkString(", ")
    val ms = (0 until d2).map { g =>
      val sq = (0 until d1).map(j => s"z${g * d1 + j} * z${g * d1 + j}")
        .mkString(" + ")
      s"($sq) // $d1 AS m$g"
    }.mkString(", ")
    val arr = (0 until d2).map(g => s"m$g").mkString(", ")
    s"WITH s0 AS (SELECT CAST(user_id AS VARCHAR) AS sval FROM events), " +
      polyHashSteps("sval", "sval", "s0", "phf2") + ", " +
      s"z AS (SELECT $zs FROM phf2), m AS (SELECT $ms FROM z) " +
      s"SELECT CAST(list_sort([$arr])[${(d2 + 1) / 2}] AS BIGINT) AS est_f2 FROM m"
  }

  /** Full DuckDB replay of Sketches.hllDistinct: polyHash the stringified
    * id, bucket on the low p bits, rho from `length(bin(w))` (both engines
    * print minimal binary), register max, then the identical all-integer
    * estimator — 2^K-scaled harmonic sum in HUGEINT, alpha as the shared
    * ⌊α·10⁶⌋, linear counting through the SAME [[Sketches.hllLnLut]] table
    * inlined as VALUES. */
  private def hllOracleSql(p: Int): String = {
    val m = 1 << p
    val K = 65 - p
    val num = (BigInt(graft.operators.Sketches.hllAlphaScaled(m)) * m * m *
      (BigInt(1) << K)).toString
    val lutVals = graft.operators.Sketches.hllLnLut(m)
      .map { case (v, l) => s"($v, $l)" }.mkString(", ")
    s"WITH src0 AS (SELECT event_type, CAST(user_id AS VARCHAR) AS sval FROM events), " +
      polyHashSteps("event_type", "sval", "src0", "ph") + ", " +
      s"b AS (SELECT event_type, CAST(h % $m AS BIGINT) AS bkt, " +
      s"CAST(h // $m AS BIGINT) AS w FROM ph), " +
      s"r AS (SELECT event_type, bkt, max(CASE WHEN w = 0 THEN $K " +
      s"ELSE $K - length(bin(w)) END) AS reg FROM b GROUP BY 1, 2), " +
      s"st AS (SELECT event_type, count(*) AS cnt, " +
      s"sum(CAST(CAST(1 AS BIGINT) << ($K - reg) AS HUGEINT)) AS s1 FROM r GROUP BY 1), " +
      s"es AS (SELECT event_type, $m - cnt AS v, " +
      s"CAST((CAST($m - cnt AS HUGEINT) * ${1L << K} + s1) AS HUGEINT) AS sp FROM st), " +
      s"raw AS (SELECT event_type, v, " +
      s"CAST(CAST('$num' AS HUGEINT) // (sp * 1000000) AS BIGINT) AS e FROM es), " +
      s"lut(lv, lnfp) AS (VALUES $lutVals) " +
      s"SELECT event_type, CAST(CASE WHEN e * 2 <= ${5L * m} AND v > 0 " +
      s"THEN ($m * l.lnfp) // ${1L << 20} ELSE e END AS BIGINT) AS est_distinct " +
      "FROM raw LEFT JOIN lut l ON l.lv = raw.v"
  }

  /** Full DuckDB replay of Similarity.pcaFit + pcaProject: fixed-point mean
    * and upper-triangle covariance sums, then the power iteration UNROLLED
    * — every reduction is `list_reduce(list_prepend(0.0, …))`, the same
    * 0.0-seeded index-order fold the Scala driver runs, so the components
    * (and therefore the projections) match double-for-double with no
    * convergence assumption: both engines run exactly `iters` rounds. */
  private def pcaOracleSql(d: Int, k: Int, iters: Int): String = {
    val S = "CAST(1048576 AS DOUBLE)"
    val z = "CAST(0 AS DOUBLE)"
    def fold(terms: String) =
      s"list_reduce(list_prepend($z, $terms), (a, b) -> a + b)"
    def gs = s"generate_series(1, $d)"
    // every chained CTE is MATERIALIZED (the pageRank-oracle rule): DuckDB
    // inlines plain CTEs at each reference, which across `iters` chained
    // rounds re-expands the whole predecessor tree exponentially
    val sb = new StringBuilder
    sb ++= "WITH e AS MATERIALIZED (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS x FROM embeddings " +
      s"WHERE embedding IS NOT NULL AND len(embedding) = $d), " +
      "nn AS MATERIALIZED (SELECT count(*) AS n FROM e), " +
      s"mi AS (SELECT unnest($gs) AS i, x FROM e), " +
      s"ms AS (SELECT i, sum(CAST(floor(x[i] * $S) AS BIGINT)) AS s FROM mi GROUP BY i), " +
      s"mu AS MATERIALIZED (SELECT list(CAST(s AS DOUBLE) / (CAST(n AS DOUBLE) * $S) ORDER BY i) AS mu " +
      "FROM ms CROSS JOIN nn GROUP BY n), " +
      s"cj AS (SELECT unnest($gs) AS j, x FROM e), " +
      s"cjk AS (SELECT j, unnest(generate_series(j, $d)) AS k2, x FROM cj), " +
      "cfp AS (SELECT j, k2, sum(CAST(floor((x[j] - mu[j]) * (x[k2] - mu[k2]) " +
      s"* $S) AS BIGINT)) AS s FROM cjk CROSS JOIN mu GROUP BY 1, 2), " +
      "cfull AS (SELECT j, k2, s FROM cfp UNION ALL SELECT k2, j, s FROM cfp WHERE j < k2), " +
      "mat_1 AS MATERIALIZED (SELECT list(rl ORDER BY j) AS m FROM (" +
      s"SELECT j, list(CAST(s AS DOUBLE) / (CAST(n AS DOUBLE) * $S) ORDER BY k2) AS rl " +
      "FROM cfull CROSS JOIN nn GROUP BY j, n))"
    for (c <- 1 to k) {
      sb ++= s", v_${c}_0 AS MATERIALIZED (SELECT [CAST(1 AS DOUBLE) / sqrt(CAST($d AS DOUBLE)) " +
        s"for i in $gs] AS v)"
      for (t <- 1 to iters) {
        sb ++= s", w_${c}_$t AS MATERIALIZED (SELECT [${fold(s"[m[j][i] * v[i] for i in $gs]")} " +
          s"for j in $gs] AS w FROM mat_$c, v_${c}_${t - 1})"
        sb ++= s", v_${c}_$t AS MATERIALIZED (SELECT [w[i] / sqrt(${fold(s"[w[i2] * w[i2] for i2 in $gs]")}) " +
          s"for i in $gs] AS v FROM w_${c}_$t)"
      }
      if (c < k) {
        sb ++= s", mv_$c AS MATERIALIZED (SELECT [${fold(s"[m[j][i] * v[i] for i in $gs]")} " +
          s"for j in $gs] AS mv FROM mat_$c, v_${c}_$iters)"
        sb ++= s", l_$c AS MATERIALIZED (SELECT ${fold(s"[v[i] * mv[i] for i in $gs]")} AS l " +
          s"FROM v_${c}_$iters, mv_$c)"
        sb ++= s", mat_${c + 1} AS MATERIALIZED (SELECT [[m[j][i] - l * v[j] * v[i] for i in $gs] " +
          s"for j in $gs] AS m FROM mat_$c, v_${c}_$iters, l_$c)"
      }
    }
    val projs = (1 to k).map { c =>
      s"ROUND(${fold(s"[(x[i] - mu[i]) * pv$c.v[i] for i in $gs]")}, 4) AS p$c"
    }.mkString(", ")
    val joins = (1 to k).map(c => s"CROSS JOIN v_${c}_$iters pv$c").mkString(" ")
    sb ++= s" SELECT vec_id, $projs FROM e CROSS JOIN mu $joins"
    sb.toString
  }

  /** Full DuckDB replay of [[TextAnalysis.bpeLearnMerges]]: the
    * word-frequency vocabulary under the shared word-form contract
    * (NFC-normalized BMP-letter forms — sqlNorm + sqlWordGate, the
    * TextAnalysis.isWordForm twin), each symbol chr(31)-wrapped by the same
    * `(.)` regex, then
    * `rounds` chained (adjacent-pairs → argmax → replace) rounds. Merge
    * application is a PLAIN `replace()` on both engines because every
    * symbol carries its own wrappers ([[TextAnalysis.BpeSep]]): replace-all
    * scans left-to-right non-overlapping — exactly BPE's application order —
    * and the wrappers stop sub-symbol matches. Every chained CTE is
    * MATERIALIZED (the pageRank-oracle rule). */
  /** The shared learn-chain prefix: word-form frequencies (bw) and the
    * ␟-wrapped start symbolization (v_0) — the twin of
    * TextAnalysis.subwordBase, used by the serial AND batched mirrors. */
  private def bpeBaseCtes(corpus: String = "mdocs",
      byteLevel: Boolean = false, gpt2: Boolean = false): String = {
    val sp = "chr(31)"
    if (byteLevel)
      // byte level (GPT-2 family): NO normalization, NO word-form gate —
      // every non-empty raw token (whitespace-split, or GPT-2-pretokenized
      // when gpt2) participates; the start symbolization is the token's
      // UTF-8 bytes as ␟-wrapped uppercase hex pairs
      // (DuckDB hex(encode(w)) == Spark hex(encode(w, 'UTF-8')))
      "bw AS MATERIALIZED (" +
        "SELECT w, CAST(count(*) AS BIGINT) AS freq FROM " +
        (if (gpt2) s"(SELECT unnest($Gpt2ToksSql) AS w FROM $corpus) "
         else s"(SELECT unnest($RawToks) AS w FROM $corpus WHERE $TokN > 0) ") +
        "WHERE w <> '' GROUP BY w)" +
        ", v_0 AS MATERIALIZED (SELECT regexp_replace(hex(encode(w)), " +
        s"'(..)', $sp || '\\1' || $sp, 'g') AS sym, freq FROM bw)"
    else
      "bw AS MATERIALIZED (" +
        "SELECT t AS w, CAST(count(*) AS BIGINT) AS freq FROM " +
        s"(SELECT ${sqlNorm("t0")} AS t FROM " +
        s"(SELECT unnest($RawToks) AS t0 FROM $corpus WHERE $TokN > 0)) " +
        s"WHERE ${sqlWordGate("t")} GROUP BY t)" +
        ", v_0 AS MATERIALIZED (SELECT regexp_replace(w, '(.)', " +
        s"$sp || '\\1' || $sp, 'g') AS sym, freq FROM bw)"
  }

  private def bpeLearnCtes(rounds: Int, wordpiece: Boolean = false,
      corpus: String = "mdocs", byteLevel: Boolean = false,
      gpt2: Boolean = false): String = {
    val sp = "chr(31)"
    val sb = new StringBuilder
    sb ++= bpeBaseCtes(corpus, byteLevel, gpt2)
    for (r <- 1 to rounds) {
      sb ++= s", y_$r AS (SELECT string_split(substr(sym, 2, length(sym) - 2), " +
        s"$sp || $sp) AS s, freq FROM v_${r - 1})"
      sb ++= s", x_$r AS (SELECT s, freq, " +
        "unnest(generate_series(1, len(s) - 1)) AS i " +
        s"FROM y_$r WHERE len(s) >= 2)"
      if (wordpiece) {
        // per-symbol counts over the same symbolization; the winner
        // maximizes cnt/(ca·cb) — one IEEE division of exact longs
        sb ++= s", sc_$r AS MATERIALIZED (SELECT t, sum(freq) AS c FROM " +
          s"(SELECT unnest(s) AS t, freq FROM y_$r) GROUP BY 1)"
        sb ++= s", b_$r AS MATERIALIZED (SELECT lhs, rhs, cnt, $r AS rank FROM (" +
          "SELECT p.lhs, p.rhs, p.cnt, CAST(p.cnt AS DOUBLE) / " +
          "(CAST(a.c AS DOUBLE) * CAST(b.c AS DOUBLE)) AS score " +
          s"FROM (SELECT s[i] AS lhs, s[i + 1] AS rhs, sum(freq) AS cnt " +
          s"FROM x_$r GROUP BY 1, 2) p " +
          s"JOIN sc_$r a ON a.t = p.lhs JOIN sc_$r b ON b.t = p.rhs) " +
          "ORDER BY score DESC, lhs, rhs LIMIT 1)"
      } else {
        sb ++= s", b_$r AS MATERIALIZED (SELECT s[i] AS lhs, s[i + 1] AS rhs, " +
          s"sum(freq) AS cnt, $r AS rank FROM x_$r GROUP BY 1, 2 " +
          "ORDER BY cnt DESC, lhs, rhs LIMIT 1)"
      }
      sb ++= s", v_$r AS MATERIALIZED (SELECT replace(sym, " +
        s"$sp || lhs || $sp || $sp || rhs || $sp, " +
        s"$sp || lhs || rhs || $sp) AS sym, freq FROM v_${r - 1}, b_$r)"
    }
    sb.toString
  }

  /** Token-id export mirror shared by the BPE and WordPiece families:
    * the learning chain, merge ids via min-rank over concatenated pair
    * strings, char ids by code-point rank over the learned word relation,
    * per-token chained-replace pieces enumerated in order, 99999 OOV rows
    * for non-word-forms. */
  private def subwordIdsOracleSql(rounds: Int, wordpiece: Boolean = false,
      corpus: String = "mdocs"): String = {
    val sp = "chr(31)"
    // COALESCE-to-sentinel guard: when a learn round exhausts, its b_r is
    // EMPTY and the scalar subquery yields NULL — an unguarded replace()
    // would NULL the whole symbolization, while the Spark side just applies
    // fewer merges. chr(1) never matches payload, so exhausted rounds no-op
    // (the batched learner's existing trick).
    val rep = (1 to rounds).foldLeft(
      s"regexp_replace(nw, '(.)', $sp || '\\1' || $sp, 'g')") { (acc, r) =>
      s"replace($acc, COALESCE((SELECT $sp || lhs || $sp || $sp || rhs || $sp FROM b_$r), chr(1)), " +
        s"COALESCE((SELECT $sp || lhs || rhs || $sp FROM b_$r), chr(1)))"
    }
    val munion = (1 to rounds)
      .map(r => s"SELECT lhs || rhs AS piece, rank FROM b_$r")
      .mkString(" UNION ALL ")
    // char-id base = the ACTUAL merge-row count, not the requested round
    // count: the Spark side assigns char ids from merges.size, and the two
    // diverge whenever the learner exhausts before `rounds` merges
    s"WITH ${corpusCte(corpus)}, ${bpeLearnCtes(rounds, wordpiece, corpus)}, " +
      s"mcnt AS (SELECT count(*) AS c FROM ($munion)), " +
      "bchars AS (SELECT DISTINCT substring(w, p, 1) AS piece FROM bw, " +
      "LATERAL (SELECT unnest(generate_series(1, length(w))) AS p)), " +
      s"bmid AS (SELECT piece, CAST(min(rank) - 1 AS BIGINT) AS pid FROM ($munion) GROUP BY piece), " +
      s"bcid AS (SELECT piece, CAST((SELECT c FROM mcnt) + row_number() OVER (ORDER BY piece) - 1 AS BIGINT) AS pid FROM bchars), " +
      "vocabid AS (SELECT piece, pid FROM bmid UNION ALL SELECT piece, pid FROM bcid), " +
      s"bdw AS (SELECT doc_id, i AS wi, ${sqlNorm("toks[i]")} AS nw FROM " +
      s"(SELECT doc_id, $RawToks AS toks FROM $corpus), " +
      "LATERAL (SELECT unnest(generate_series(1, len(toks))) AS i) " +
      "WHERE toks[i] <> ''), " +
      s"bps AS (SELECT doc_id, wi, CASE WHEN ${sqlWordGate("nw")} " +
      s"THEN string_split(substr($rep, 2, length($rep) - 2), $sp || $sp) " +
      "ELSE [nw] END AS ps FROM bdw), " +
      "pm AS (SELECT doc_id, wi, po, COALESCE(v.pid, 99999) AS piece_id " +
      "FROM (SELECT doc_id, wi, po, ps[po] AS piece FROM bps, " +
      "LATERAL (SELECT unnest(generate_series(1, len(ps))) AS po)) x " +
      "LEFT JOIN vocabid v USING (piece)) " +
      "SELECT doc_id, CAST(row_number() OVER (PARTITION BY doc_id " +
      "ORDER BY wi, po) - 1 AS BIGINT) AS pos, " +
      "CAST(piece_id AS BIGINT) AS piece_id FROM pm"
  }

  /** Compression-curve mirror: the learn chain's merge rows joined with
    * each round's corpus piece total (Σ freq·symbols over v_r). */
  private def bpeCurveOracleSql(rounds: Int,
      wordpiece: Boolean = false, byteLevel: Boolean = false): String = {
    val sp = "chr(31)"
    val rows = (1 to rounds).map { r =>
      s"SELECT CAST(rank AS BIGINT) AS rank, lhs, rhs, " +
        "CAST(cnt AS BIGINT) AS pair_count, " +
        "(SELECT CAST(sum(freq * len(string_split(substr(sym, 2, " +
        s"length(sym) - 2), $sp || $sp))) AS BIGINT) FROM v_$r) " +
        s"AS total_pieces FROM b_$r"
    }.mkString(" UNION ALL ")
    s"WITH $MdocsCte, " +
      s"${bpeLearnCtes(rounds, wordpiece, byteLevel = byteLevel)} $rows"
  }

  private def bpeLearnOracleSql(rounds: Int, wordpiece: Boolean = false,
      corpus: String = "mdocs", byteLevel: Boolean = false,
      gpt2: Boolean = false): String = {
    val union = (1 to rounds).map(r => s"SELECT * FROM b_$r")
      .mkString(" UNION ALL ")
    s"WITH ${corpusCte(corpus)}, " +
      s"${bpeLearnCtes(rounds, wordpiece, corpus, byteLevel, gpt2)} " +
      "SELECT CAST(rank AS BIGINT) AS rank, lhs, rhs, " +
      s"CAST(cnt AS BIGINT) AS pair_count FROM ($union)"
  }

  /** Full DuckDB replay of [[graft.operators.TextAnalysis
    * .bpeLearnMergesBatched]]: the serial chain's pair counting per round,
    * then the ORDER-FREE dominance filter (a pair is accepted iff no
    * higher-ranked pair shares a symbol — one join + grouping, never a
    * sequential scan), the ≤ k cap, and all accepted merges applied as a
    * chained `replace` (accepted pairs are symbol-disjoint so the replaces
    * commute; missing ar slots no-op via a chr(1) sentinel, which the
    * normalization scrub guarantees never occurs in a symbolization). */
  private def bpeBatchedLearnOracleSql(rounds: Int, k: Int,
      wordpiece: Boolean = false, byteLevel: Boolean = false): String = {
    val sp = "chr(31)"
    val sb = new StringBuilder
    sb ++= bpeBaseCtes(byteLevel = byteLevel)
    for (t <- 1 to rounds) {
      sb ++= s", y_$t AS (SELECT string_split(substr(sym, 2, length(sym) - 2), " +
        s"$sp || $sp) AS s, freq FROM v_${t - 1})"
      sb ++= s", x_$t AS (SELECT s, freq, " +
        "unnest(generate_series(1, len(s) - 1)) AS i " +
        s"FROM y_$t WHERE len(s) >= 2)"
      if (wordpiece) {
        // likelihood-scored ranking — the serial wordpiece mirror's
        // symbol-count join, then the same dominance machinery below
        sb ++= s", sc_$t AS MATERIALIZED (SELECT t, sum(freq) AS c FROM " +
          s"(SELECT unnest(s) AS t, freq FROM y_$t) GROUP BY 1)"
        sb ++= s", r_$t AS MATERIALIZED (SELECT lhs, rhs, cnt, " +
          "row_number() OVER (ORDER BY score DESC, lhs, rhs) AS rn FROM (" +
          "SELECT p.lhs, p.rhs, p.cnt, CAST(p.cnt AS DOUBLE) / " +
          "(CAST(a.c AS DOUBLE) * CAST(b.c AS DOUBLE)) AS score " +
          s"FROM (SELECT s[i] AS lhs, s[i + 1] AS rhs, sum(freq) AS cnt " +
          s"FROM x_$t GROUP BY 1, 2) p " +
          s"JOIN sc_$t a ON a.t = p.lhs JOIN sc_$t b ON b.t = p.rhs))"
      } else {
        sb ++= s", r_$t AS MATERIALIZED (SELECT lhs, rhs, cnt, " +
          "row_number() OVER (ORDER BY cnt DESC, lhs, rhs) AS rn FROM (" +
          s"SELECT s[i] AS lhs, s[i + 1] AS rhs, sum(freq) AS cnt " +
          s"FROM x_$t GROUP BY 1, 2))"
      }
      sb ++= s", c_$t AS (SELECT q.rn AS rn FROM r_$t q JOIN r_$t h " +
        "ON h.rn < q.rn AND (h.lhs = q.lhs OR h.lhs = q.rhs " +
        "OR h.rhs = q.lhs OR h.rhs = q.rhs) GROUP BY q.rn)"
      sb ++= s", a_$t AS MATERIALIZED (SELECT * FROM (" +
        "SELECT r.lhs AS lhs, r.rhs AS rhs, r.cnt AS cnt, " +
        "row_number() OVER (ORDER BY r.rn) AS ar " +
        s"FROM r_$t r LEFT JOIN c_$t c ON c.rn = r.rn WHERE c.rn IS NULL) " +
        s"WHERE ar <= $k)"
      val rep = (1 to k).foldLeft("sym") { (acc, j) =>
        s"replace($acc, COALESCE((SELECT $sp || lhs || $sp || $sp || rhs || $sp " +
          s"FROM a_$t WHERE ar = $j), chr(1)), " +
          s"COALESCE((SELECT $sp || lhs || rhs || $sp FROM a_$t WHERE ar = $j), " +
          "chr(1)))"
      }
      sb ++= s", v_$t AS MATERIALIZED (SELECT $rep AS sym, freq FROM v_${t - 1})"
    }
    val union = (1 to rounds)
      .map(t => s"SELECT $t AS batch, ar, lhs, rhs, cnt FROM a_$t")
      .mkString(" UNION ALL ")
    s"WITH $MdocsCte, ${sb.toString} " +
      "SELECT CAST(batch AS BIGINT) AS batch, " +
      "CAST(ar AS BIGINT) AS rank_in_batch, lhs, rhs, " +
      s"CAST(cnt AS BIGINT) AS pair_count FROM ($union)"
  }

  /** Mirror of [[TextAnalysis.bpeEncodedCounts]] fed by the learned table:
    * the SAME learning CTE chain, then every document token re-encoded —
    * lowercase word forms run the merges in rank order (each merge a
    * scalar-subquery `replace` over the 1-row `b_r`), any other token
    * counts one piece. */
  /** Learning + application CTE chain ending in `bn(doc_id, n_tokens, n)` —
    * per-doc token and learned-BPE piece counts; shared by the apply and
    * pack-on-learned-counts mirrors. */
  private def bpeApplyCtes(rounds: Int, wordpiece: Boolean = false,
      corpus: String = "mdocs"): String = {
    val sp = "chr(31)"
    // exhausted-round guard: see subwordIdsOracleSql (empty b_r -> NULL
    // replace operand would NULL the symbolization; chr(1) no-ops instead)
    val rep = (1 to rounds).foldLeft(
      s"regexp_replace(nw, '(.)', $sp || '\\1' || $sp, 'g')") { (acc, r) =>
      s"replace($acc, COALESCE((SELECT $sp || lhs || $sp || $sp || rhs || $sp FROM b_$r), chr(1)), " +
        s"COALESCE((SELECT $sp || lhs || rhs || $sp FROM b_$r), chr(1)))"
    }
    s"${bpeLearnCtes(rounds, wordpiece, corpus)}, " +
      s"dw AS (SELECT doc_id, w, ${sqlNorm("w")} AS nw FROM " +
      s"(SELECT doc_id, unnest($RawToks) AS w FROM $corpus WHERE $TokN > 0)), " +
      s"pc AS (SELECT doc_id, CASE WHEN ${sqlWordGate("nw")} " +
      s"THEN len(string_split(substr($rep, 2, length($rep) - 2), $sp || $sp)) " +
      "ELSE 1 END AS p FROM dw), " +
      "bn AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens, " +
      "CAST(sum(p) AS BIGINT) AS n FROM pc GROUP BY doc_id)"
  }

  private def bpeApplyOracleSql(rounds: Int, wordpiece: Boolean = false,
      corpus: String = "mdocs"): String =
    s"WITH ${corpusCte(corpus)}, ${bpeApplyCtes(rounds, wordpiece, corpus)} " +
      "SELECT doc_id, n_tokens, n AS n_pieces FROM bn"

  /** Byte-level learning + application CTE chain ending in
    * `bn(doc_id, n_tokens, n)` — the [[bpeApplyCtes]] twin with the
    * hex-byte symbolization, no norm, no gate, no OOV branch. */
  private def bbpeApplyCtes(rounds: Int, corpus: String = "mdocs",
      gpt2: Boolean = false): String = {
    val sp = "chr(31)"
    // exhausted-round guard: see subwordIdsOracleSql
    val rep = (1 to rounds).foldLeft(
      s"regexp_replace(hex(encode(w)), '(..)', $sp || '\\1' || $sp, 'g')") {
      (acc, r) =>
        s"replace($acc, COALESCE((SELECT $sp || lhs || $sp || $sp || rhs || $sp FROM b_$r), chr(1)), " +
          s"COALESCE((SELECT $sp || lhs || rhs || $sp FROM b_$r), chr(1)))"
    }
    s"${bpeLearnCtes(rounds, wordpiece = false, corpus, byteLevel = true, gpt2)}, " +
      "dw AS (SELECT doc_id, w FROM " +
      (if (gpt2) s"(SELECT doc_id, unnest($Gpt2ToksSql) AS w FROM $corpus) "
       else s"(SELECT doc_id, unnest($RawToks) AS w FROM $corpus WHERE $TokN > 0) ") +
      "WHERE w <> ''), " +
      s"pc AS (SELECT doc_id, len(string_split(substr($rep, 2, " +
      s"length($rep) - 2), $sp || $sp)) AS p FROM dw), " +
      "bn AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens, " +
      "CAST(sum(p) AS BIGINT) AS n FROM pc GROUP BY doc_id)"
  }

  private def bbpeApplyOracleSql(rounds: Int,
      corpus: String = "mdocs", gpt2: Boolean = false): String =
    s"WITH ${corpusCte(corpus)}, ${bbpeApplyCtes(rounds, corpus, gpt2)} " +
      "SELECT doc_id, n_tokens, n AS n_pieces FROM bn"

  /** Byte-level token-id export mirror: the learn chain, merge ids via
    * min-rank over concatenated hex pair strings, byte ids FIXED at
    * mergeCount+byte (the 256-row generate_series — no corpus-derived
    * char vocab, no OOV rows: every piece is a merge product or a single
    * byte), per-token chained-replace pieces enumerated in order, dense
    * (token, piece) position per document. */
  private def bbpeIdsOracleSql(rounds: Int,
      corpus: String = "mdocs", gpt2: Boolean = false): String = {
    val sp = "chr(31)"
    // exhausted-round guard: see subwordIdsOracleSql
    val rep = (1 to rounds).foldLeft(
      s"regexp_replace(hex(encode(w)), '(..)', $sp || '\\1' || $sp, 'g')") {
      (acc, r) =>
        s"replace($acc, COALESCE((SELECT $sp || lhs || $sp || $sp || rhs || $sp FROM b_$r), chr(1)), " +
          s"COALESCE((SELECT $sp || lhs || rhs || $sp FROM b_$r), chr(1)))"
    }
    val munion = (1 to rounds)
      .map(r => s"SELECT lhs || rhs AS piece, rank FROM b_$r")
      .mkString(" UNION ALL ")
    // byte-id base = ACTUAL merge-row count (Spark side uses merges.size),
    // not the requested round count — see subwordIdsOracleSql
    s"WITH ${corpusCte(corpus)}, " +
      s"${bpeLearnCtes(rounds, wordpiece = false, corpus, byteLevel = true, gpt2)}, " +
      s"mcnt AS (SELECT count(*) AS c FROM ($munion)), " +
      s"bmid AS (SELECT piece, CAST(min(rank) - 1 AS BIGINT) AS pid " +
      s"FROM ($munion) GROUP BY piece), " +
      s"bbyte AS (SELECT printf('%02X', b) AS piece, " +
      s"CAST((SELECT c FROM mcnt) + b AS BIGINT) AS pid FROM " +
      "(SELECT unnest(generate_series(0, 255)) AS b)), " +
      "vocabid AS (SELECT piece, pid FROM bmid " +
      "UNION ALL SELECT piece, pid FROM bbyte), " +
      s"bdw AS (SELECT doc_id, i AS wi, toks[i] AS w FROM " +
      (if (gpt2) s"(SELECT doc_id, $Gpt2ToksSql AS toks FROM $corpus), "
       else s"(SELECT doc_id, $RawToks AS toks FROM $corpus), ") +
      "LATERAL (SELECT unnest(generate_series(1, len(toks))) AS i) " +
      "WHERE toks[i] <> ''), " +
      s"bps AS (SELECT doc_id, wi, string_split(substr($rep, 2, " +
      s"length($rep) - 2), $sp || $sp) AS ps FROM bdw), " +
      "pm AS (SELECT doc_id, wi, po, v.pid AS piece_id " +
      "FROM (SELECT doc_id, wi, po, ps[po] AS piece FROM bps, " +
      "LATERAL (SELECT unnest(generate_series(1, len(ps))) AS po)) x " +
      "JOIN vocabid v USING (piece)) " +
      "SELECT doc_id, CAST(row_number() OVER (PARTITION BY doc_id " +
      "ORDER BY wi, po) - 1 AS BIGINT) AS pos, " +
      "CAST(piece_id AS BIGINT) AS piece_id FROM pm"
  }

  /** The VAD mirror's span chain — planted-silence samples (gate
    * q1 ≤ k < q2), 64-sample window energies, mean-square threshold,
    * gaps-and-islands merge — ending in
    * `spn(doc_id, rate, ch, sp, w0, n_samples, sum_sq)`; shared by the
    * span and voiced-fraction mirrors. */
  private val AudioVadCtes: String =
    "ap AS (SELECT doc_id, 8000 + (doc_id % 4) * 4000 AS rate, " +
      "1 + doc_id % 2 AS ch, " +
      "(doc_id % 256 + 64) * (1 + doc_id % 2) AS total FROM documents), " +
      "aq AS (SELECT doc_id, rate, ch, total, total // 4 + doc_id % 8 AS q1, " +
      "total // 2 + doc_id % 8 AS q2 FROM ap), " +
      "sam AS (SELECT doc_id, rate, ch, k, " +
      "CASE WHEN k >= q1 AND k < q2 THEN 0 " +
      "ELSE (doc_id * 31 + 7 * k * k + 13 * k) % 65536 - 32768 END AS s " +
      "FROM aq, LATERAL (SELECT unnest(generate_series(0, total - 1)) AS k)), " +
      "we AS (SELECT doc_id, any_value(rate) AS rate, any_value(ch) AS ch, " +
      "k // 64 AS w, CAST(count(*) AS BIGINT) AS n, " +
      "CAST(sum(s * s) AS BIGINT) AS e FROM sam GROUP BY doc_id, k // 64), " +
      "cls AS (SELECT doc_id, rate, ch, w, n, e, " +
      "CASE WHEN e > 1000000 * n THEN 1 ELSE 0 END AS sp FROM we), " +
      "isl AS (SELECT doc_id, rate, ch, w, n, e, sp, " +
      "w - row_number() OVER (PARTITION BY doc_id, sp ORDER BY w) AS grp " +
      "FROM cls), " +
      "spn AS (SELECT doc_id, any_value(rate) AS rate, any_value(ch) AS ch, " +
      "sp, min(w) AS w0, CAST(sum(n) AS BIGINT) AS n_samples, " +
      "CAST(sum(e) AS BIGINT) AS sum_sq FROM isl GROUP BY doc_id, sp, grp)"

  /** Analytic audio-fingerprint chain over `src(key, pid, nudge)` →
    * `aaf(key, afp)`: per-key PCM parameters from the pattern id, samples
    * offset by `nudge` (wrapped in 16-bit two's complement — the
    * Multimodal.synthesizeAudioPerturbed model; nudge 0 is the plain
    * waveform), window energies over a generate_series (sample k → window
    * k·65 // total, the aHash pigeonhole), energy-difference sign bits
    * summed in HUGEINT and folded to the signed 64-bit signature — the
    * DuckDB twin of Multimodal.audioFingerprint ∘ synthesizeAudio*, no
    * codec needed because PCM is lossless. */
  private def audioFpCtes(src: String): String =
    s"aap AS (SELECT key, pid, nudge, (pid % 256 + 64) * (1 + pid % 2) AS total " +
      s"FROM $src), " +
      "aae AS (SELECT key, (k * 65) // total AS w, s * s AS e2 FROM (" +
      "SELECT key, total, k, " +
      "(((pid * 31 + 7 * k * k + 13 * k) % 65536 + nudge) % 65536 + 65536) % 65536 - 32768 AS s " +
      "FROM aap, LATERAL (SELECT unnest(generate_series(0, total - 1)) AS k))), " +
      "aaw AS (SELECT key, w, sum(e2) AS ew FROM aae GROUP BY 1, 2), " +
      "aag AS (SELECT g.key, g.wn, COALESCE(aaw.ew, 0) AS ew FROM (" +
      "SELECT key, unnest(generate_series(0, 64)) AS wn FROM aap) g " +
      "LEFT JOIN aaw ON aaw.key = g.key AND aaw.w = g.wn), " +
      "aas AS (SELECT a.key, sum(CASE WHEN a.ew > b.ew " +
      "THEN CAST(1 AS HUGEINT) << CAST(a.wn AS INT) " +
      "ELSE CAST(0 AS HUGEINT) END) AS sig " +
      "FROM aag a JOIN aag b ON b.key = a.key AND b.wn = a.wn + 1 " +
      "WHERE a.wn < 64 GROUP BY 1), " +
      "aaf AS (SELECT key, CAST(CASE WHEN sig >= 9223372036854775808 " +
      "THEN sig - 18446744073709551616 ELSE sig END AS BIGINT) AS afp FROM aas)"

  /** Mirror of [[graft.operators.Preference.bradleyTerry]] over the
    * events-derived comparison fixture: per-user event-type totals, pairs
    * with distinct totals vote winner/loser, then `iters` MM rounds
    * replayed with the same fixed-point floor divisions (S² = scale²,
    * virtual win each way per observed pair, per-round sum normalizer). */
  /** Length-bucketed batch assignment CTEs (lb → r with rn) — the DuckDB
    * twin of [[graft.operators.Sampling.lengthBucketBatches]] at
    * bucketWidth 32 / batchSize 8 / 8 shards, shared by the assignment and
    * padding-efficiency mirrors. */
  private lazy val LenBucketCtes: String =
    s"lb AS (SELECT doc_id, CAST($TokN AS BIGINT) AS n, " +
      s"$TokN // 32 AS bucket, ${pmSql(HashRaw, "8")} AS shard " +
      s"FROM documents WHERE $TokN > 0), " +
      "r AS (SELECT doc_id, n, bucket, shard, row_number() OVER (" +
      "PARTITION BY bucket, shard ORDER BY doc_id) - 1 AS rn FROM lb)"

  /** Comparisons synthesized from per-user event-type spend totals (larger
    * total wins, ties skipped), the judging user carried as `rater` — the
    * preference log shared by eval_bradley_terry, eval_pair_agreement and
    * eval_rater_agreement (the first two group on winner/loser only, so
    * the extra column costs them nothing). */
  private def btComparisons(s: SparkSession, dir: String): DataFrame = {
    val totals = EventsAdapter.rawEvents(s, dir)
      .groupBy(col("user_id"), col("event_type"))
      .agg(sum(floor(col("value") * 100).cast("long")).as("v"))
    val b = totals.select(col("user_id"), col("event_type").as("et_b"),
      col("v").as("vb"))
    totals.select(col("user_id"), col("event_type").as("et_a"),
        col("v").as("va"))
      .join(b, Seq("user_id"))
      .filter(col("et_a") < col("et_b") && col("va") =!= col("vb"))
      .select(
        col("user_id").as("rater"),
        when(col("va") > col("vb"), col("et_a")).otherwise(col("et_b")).as("winner"),
        when(col("va") > col("vb"), col("et_b")).otherwise(col("et_a")).as("loser"))
  }

  /** DuckDB twin of [[btComparisons]] — the tot/cmp CTE prefix shared by
    * the three preference mirrors. */
  private val BtCmpCtes: String =
    "tot AS (SELECT user_id, event_type, " +
      "sum(CAST(floor(value * 100) AS BIGINT)) AS v FROM events GROUP BY 1, 2), " +
      "cmp AS (SELECT a.user_id AS rater, " +
      "CASE WHEN a.v > b.v THEN a.event_type ELSE b.event_type END AS winner, " +
      "CASE WHEN a.v > b.v THEN b.event_type ELSE a.event_type END AS loser " +
      "FROM tot a JOIN tot b ON a.user_id = b.user_id " +
      "AND a.event_type < b.event_type AND a.v <> b.v)"

  /** Generation-eval fixture: two INDEPENDENT deterministic word-dropout
    * corruptions of the same document — candidate = 15% drop (seed 7),
    * reference = 10% drop (seed 42) — joined back on doc_id. Neither side
    * is a subsequence of the other, so every BLEU precision, every clipped
    * n-gram overlap and the LCS are non-trivial, while the whole pair
    * corpus stays exactly replayable from the (seed, pct) hash rule. */
  private def genPairs(s: SparkSession, dir: String,
      floored: Boolean = false): DataFrame = {
    val d = docs(s, dir, floored)
    TextAnalysis.wordDropout(d, dropPct = 15, seed = 7)
      .select(col("doc_id"), col("text_aug").as("cand"))
      .join(TextAnalysis.wordDropout(d, dropPct = 10, seed = 42)
        .select(col("doc_id"), col("text_aug").as("ref")), Seq("doc_id"))
  }

  /** DuckDB twin of [[clfPreds]] + the bin/count stage shared by both
    * calibration mirrors: g(bin, n, n_pos). */
  private val ClfBinCtes: String =
    "p AS (SELECT ((CAST(floor(value * 100) AS BIGINT) % 100 + 100) % 100) " +
      "AS c FROM events), " +
      "b AS (SELECT greatest(least(CAST(floor((CAST(c AS DOUBLE) / 100.0) " +
      "* 10) AS BIGINT), 9), 0) AS bin, " +
      "CASE WHEN c >= 50 THEN 1 ELSE 0 END AS y FROM p), " +
      "g AS (SELECT bin, CAST(count(*) AS BIGINT) AS n, " +
      "CAST(sum(y) AS BIGINT) AS n_pos FROM b GROUP BY 1)"

  /** CC-audit fixture rows appended to the corpus: Luhn-valid test
    * numbers (plain Visa, spaced MasterCard, dashed Amex), a bad check
    * digit, a 13-digit Luhn failure, and non-candidates (too short /
    * too long) — the digit noise the checksum gate must reject. */
  private val CcDocRows: Seq[(Long, String)] = Seq(
    (99001L, "pay 4111111111111111 today"),
    (99002L, "ref 4111111111111112 bad check digit"),
    (99003L, "card 5500 0000 0000 0004 spaced"),
    (99004L, "amex 3782-822463-10005 dashed"),
    (99005L, "order 1234567890123 thirteen digits failing luhn"),
    (99006L, "short 411 222 and long 12345678901234567890 stay out"))

  private def docsCc(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    docs(s, dir).select(col("doc_id"), col("text"))
      .unionByName(CcDocRows.toDF("doc_id", "text"))
  }

  /** DuckDB twin of [[docsCc]]. */
  private val DccCte: String =
    "dcc AS (SELECT doc_id, text FROM documents UNION ALL SELECT * FROM " +
      "(VALUES " + CcDocRows.map { case (id, t) =>
        s"(CAST($id AS BIGINT), '$t')" }.mkString(", ") +
      ") t(doc_id, text))"

  /** Classifier-prediction fixture for the calibration queries:
    * confidence = sign-folded centi-value percent ((⌊100v⌋ % 100 + 100)
    * % 100, then ONE exact division by 100), label = confidence ≥ 0.5 —
    * a monotone step, the maximally miscalibrated shape (bins saturate
    * to accuracy 0 below the step and 1 above it). */
  private def clfPreds(s: SparkSession, dir: String): DataFrame = {
    val c100 = (floor(col("value") * 100).cast("long") % 100 + 100) % 100
    EventsAdapter.rawEvents(s, dir).select(
      (c100.cast("double") / lit(100.0)).as("conf"),
      (c100 >= 50).as("label"))
  }

  /** DuckDB twin of [[genPairs]] COMPOSED with Eval.generationPairStats'
    * token step (re-tokenize, drop empties, cap at 48): gp(doc_id, cs, rs).
    * The dropout keep rule is the text_augment mirror's, at (15, seed 7)
    * and (10, seed 42); re-tokenizing concat_ws(' ', kept) is the identity
    * on the kept list except when it is [''] (empty source text), which
    * the `x <> ''` filter removes on both engines. */
  private def genKeptSql(pct: Int, seed: Long): String =
    s"[toks[i] for i in generate_series(1, len(toks)) if " +
      s"(${hashRawSql("(doc_id * 1000003 + (i - 1))", seed)}) % 100 >= $pct]"

  /** One `${p}gp(doc_id, cs, rs)` pair CTE with the candidate dropout at
    * (candPct, candSeed) against the FIXED (10, seed 42) reference —
    * prefix-parameterized so the paired A/B mirror can run two systems
    * against the shared reference off one `gt`. */
  private def genPairCtePfx(p: String, candPct: Int, candSeed: Long): String =
    s"${p}gp AS (SELECT doc_id, " +
      s"[x for x in ${genKeptSql(candPct, candSeed)} if x <> ''][1:48] AS cs, " +
      s"[x for x in ${genKeptSql(10, 42)} if x <> ''][1:48] AS rs FROM gt)"

  private val GtCte: String =
    s"gt AS (SELECT doc_id, $RawToks AS toks FROM documents)"

  private val GenPairCtes: String =
    s"$GtCte, ${genPairCtePfx("", 15, 7)}"

  /** The per-pair generation-stats mirror over [[GenPairCtes]]'s gp —
    * DuckDB twin of Eval.generationPairStats(maxN = 4, capTokens = 48):
    * ms(doc_id, cand_len, ref_len, m1..m4, c1..c4, r1..r4, lcs). Clipped
    * counts are the same Σ_g min(count_cand, count_ref) over distinct
    * candidate grams; the LCS is the same append-fold DP, run as a nested
    * list_reduce (DuckDB 1.0's list_reduce takes no seed, so the seed
    * rides as the FIRST ELEMENT: the outer fold starts from the zero row
    * and consumes one ref-position match mask per candidate token, the
    * inner fold starts from [0] and appends dp_new[j] = mask[j]=1 ?
    * prev[j]+1 : max(cur[-1], prev[j+1]) — bit-identical integer work to
    * the Spark fold). */
  /** The `${p}gg`/`${p}ms` stats chain over an existing `${p}gp` — the
    * per-pair generation-stats mirror, prefix-parameterized. */
  private def genStatsChainPfx(p: String): String = {
    def grams(src: String, n: Int) =
      if (n == 1) src
      else s"[array_to_string($src[i:i+${n - 1}], ' ') for i in " +
        s"generate_series(1, len($src) - ${n - 1})]"
    def clip(n: Int) =
      s"CAST(coalesce(list_sum([least(len(list_filter(cg$n, x -> x = g)), " +
        s"len(list_filter(rg$n, x -> x = g))) for g in list_distinct(cg$n)])" +
        s", 0) AS BIGINT) AS m$n"
    val lcs =
      "CAST(list_reduce(" +
        "[[CAST(0 AS BIGINT) for _ in generate_series(0, len(rs))]] || " +
        "[[CASE WHEN rs[j] = ct THEN CAST(1 AS BIGINT) ELSE 0 END " +
        "for j in generate_series(1, len(rs))] for ct in cs], " +
        "(a, mask) -> list_reduce(" +
        "[[CAST(0 AS BIGINT)]] || [[CAST(j AS BIGINT)] " +
        "for j in generate_series(1, len(rs))], " +
        "(cur, jl) -> list_append(cur, " +
        "CASE WHEN mask[CAST(jl[1] AS INT)] = 1 " +
        "THEN a[CAST(jl[1] AS INT)] + 1 " +
        "ELSE greatest(cur[-1], a[CAST(jl[1] AS INT) + 1]) END)))[-1] " +
        "AS BIGINT) AS lcs"
    s"${p}gg AS (SELECT doc_id, cs, rs, " +
      (1 to 4).map(n =>
        s"${grams("cs", n)} AS cg$n, ${grams("rs", n)} AS rg$n")
        .mkString(", ") +
      s" FROM ${p}gp), " +
      s"${p}ms AS (SELECT doc_id, " +
      "CAST(len(cs) AS BIGINT) AS cand_len, " +
      "CAST(len(rs) AS BIGINT) AS ref_len, " +
      (1 to 4).map(n =>
        s"${clip(n)}, CAST(len(cg$n) AS BIGINT) AS c$n, " +
          s"CAST(len(rg$n) AS BIGINT) AS r$n").mkString(", ") +
      s", $lcs FROM ${p}gg)"
  }

  private val GenStatsCtes: String =
    s"$GenPairCtes, ${genStatsChainPfx("")}"

  /** Per-DOC chrF stats over an existing `${p}gp` — the relational clipped
    * counts of the eval_gen_chrf mirror kept at document grain and
    * pivoted wide: ends in `${p}cw(doc_id, cand_chars, ref_chars,
    * mc1..6, cc1..6, rc1..6)`, the [[graft.operators.Eval.chrFPairStats]]
    * row shape the paired-test mirror swaps per resample. */
  private def chrfDocStatsCtes(p: String): String = {
    val pivots = (1 to 6).flatMap(n => Seq(
      s"CAST(max(CASE WHEN pn.n = $n THEN pn.m END) AS BIGINT) AS mc$n",
      s"CAST(max(CASE WHEN pn.n = $n THEN pn.ct END) AS BIGINT) AS cc$n",
      s"CAST(max(CASE WHEN pn.n = $n THEN pn.rt END) AS BIGINT) AS rc$n"))
      .mkString(", ")
    s"${p}ch AS (SELECT doc_id, substr(array_to_string(cs, ''), 1, 256) AS c, " +
      s"substr(array_to_string(rs, ''), 1, 256) AS r FROM ${p}gp), " +
      s"${p}cgr AS (SELECT doc_id, n, " +
      "[substr(c, i, n) for i in generate_series(1, length(c) - n + 1)] AS cg, " +
      "[substr(r, i, n) for i in generate_series(1, length(r) - n + 1)] AS rg " +
      s"FROM ${p}ch, (SELECT unnest(generate_series(1, 6)) AS n) ns), " +
      s"${p}ccx AS (SELECT doc_id, n, g, CAST(count(*) AS BIGINT) AS k FROM " +
      s"(SELECT doc_id, n, unnest(cg) AS g FROM ${p}cgr) GROUP BY 1, 2, 3), " +
      s"${p}rcx AS (SELECT doc_id, n, g, CAST(count(*) AS BIGINT) AS k FROM " +
      s"(SELECT doc_id, n, unnest(rg) AS g FROM ${p}cgr) GROUP BY 1, 2, 3), " +
      s"${p}mm AS (SELECT cc.doc_id, cc.n, " +
      "CAST(sum(least(cc.k, rc.k)) AS BIGINT) AS m " +
      s"FROM ${p}ccx cc JOIN ${p}rcx rc ON cc.doc_id = rc.doc_id " +
      "AND cc.n = rc.n AND cc.g = rc.g GROUP BY 1, 2), " +
      s"${p}tt AS (SELECT doc_id, n, CAST(len(cg) AS BIGINT) AS ct, " +
      s"CAST(len(rg) AS BIGINT) AS rt FROM ${p}cgr), " +
      s"${p}pn AS (SELECT tt.doc_id, tt.n, coalesce(mm.m, 0) AS m, tt.ct, " +
      s"tt.rt FROM ${p}tt tt LEFT JOIN ${p}mm mm ON mm.doc_id = tt.doc_id " +
      "AND mm.n = tt.n), " +
      s"${p}cl AS (SELECT doc_id, CAST(length(c) AS BIGINT) AS cand_chars, " +
      s"CAST(length(r) AS BIGINT) AS ref_chars FROM ${p}ch), " +
      s"${p}cw AS (SELECT pn.doc_id, any_value(cl.cand_chars) AS cand_chars, " +
      s"any_value(cl.ref_chars) AS ref_chars, $pivots " +
      s"FROM ${p}pn pn JOIN ${p}cl cl ON cl.doc_id = pn.doc_id " +
      "GROUP BY pn.doc_id)"
  }

  /** The BT fit's CTE chain (sym/mt/wt/p0..p$iters) over a `cmp` CTE —
    * shared by the strengths mirror and the calibration mirror. */
  private def bradleyTerryCtes(iters: Int, scale: Long): String = {
    val s2 = scale * scale
    val rounds = (1 to iters).map { k =>
      val prev = s"p${k - 1}"
      s"d$k AS (SELECT mt.i AS item, " +
        s"sum((m * $s2) // greatest(pa.p + pb.p, 1)) AS d " +
        s"FROM mt JOIN $prev pa ON pa.item = mt.i " +
        s"JOIN $prev pb ON pb.item = mt.j GROUP BY 1), " +
        s"r$k AS (SELECT item, (wins * $s2) // d AS praw " +
        s"FROM wt JOIN d$k USING (item)), " +
        s"p$k AS (SELECT item, (praw * $scale * (SELECT count(*) FROM wt)) " +
        s"// (SELECT sum(praw) FROM r$k) AS p FROM r$k)"
    }.mkString(", ")
    "sym AS (SELECT winner AS i, loser AS j FROM cmp " +
      "UNION ALL SELECT loser AS i, winner AS j FROM cmp), " +
      "mt AS (SELECT i, j, count(*) + 2 AS m FROM sym GROUP BY 1, 2), " +
      "w0 AS (SELECT winner AS item, count(*) AS c FROM cmp GROUP BY 1), " +
      "wt AS (SELECT np.item, COALESCE(w0.c, 0) + np.c AS wins FROM " +
      "(SELECT i AS item, count(*) AS c FROM mt GROUP BY 1) np " +
      "LEFT JOIN w0 USING (item)), " +
      s"p0 AS (SELECT item, CAST($scale AS BIGINT) AS p FROM wt), " +
      rounds
  }

  private def bradleyTerryOracleSql(iters: Int, scale: Long): String =
    s"WITH $BtCmpCtes, ${bradleyTerryCtes(iters, scale)} " +
      s"SELECT item, CAST(p AS BIGINT) AS strength_fp, " +
      s"CAST(wins AS BIGINT) AS wins FROM p$iters JOIN wt USING (item)"

  /** Calibration mirror: the fit chain, then per comparison the
    * lower-id item's predicted win probability (one double division of
    * the exact fixed-point strengths), floor-bucketed; exact counts and
    * one division per bucket row. */
  private def btCalibrationOracleSql(iters: Int, scale: Long,
      bins: Int): String =
    s"WITH $BtCmpCtes, ${bradleyTerryCtes(iters, scale)}, " +
      "ab AS (SELECT least(winner, loser) AS a, greatest(winner, loser) AS b, " +
      "CASE WHEN winner <= loser THEN 1 ELSE 0 END AS wa FROM cmp), " +
      s"prc AS (SELECT wa, CAST(sa.p AS DOUBLE) / CAST(sa.p + sb.p AS DOUBLE) AS pa " +
      s"FROM ab JOIN p$iters sa ON sa.item = ab.a " +
      s"JOIN p$iters sb ON sb.item = ab.b) " +
      "SELECT bucket, n_cmp, n_a_wins, " +
      "CAST(n_a_wins AS DOUBLE) / CAST(n_cmp AS DOUBLE) AS emp_rate, " +
      s"(CAST(bucket AS DOUBLE) + 0.5) / $bins.0 AS expected_mid FROM (" +
      s"SELECT least(CAST(floor(pa * $bins) AS BIGINT), ${bins - 1}) AS bucket, " +
      "CAST(count(*) AS BIGINT) AS n_cmp, CAST(sum(wa) AS BIGINT) AS n_a_wins " +
      "FROM prc GROUP BY 1)"

  /** Shared CTE chain of the span-decontamination mirrors: the planted-
    * quote host fixture (`cp` — doubled own text; %13==5 hosts embed their
    * bucket's benchmark item), CDC chunking (the dedup_cdc_chunks bound
    * math, window 16 / mask 5), distinct-trigram shingles per chunk and
    * per benchmark doc, and `hitp(doc_id, chunk_idx, bench_id, n_shared,
    * chunk_shingles, overlap)` — the unfiltered span scores both the
    * report and the removal oracle read. */
  private lazy val ContamSpanCtes: String =
    rollingHashCte(16, "cp").replaceFirst("^WITH ",
      "bs AS (SELECT doc_id AS bench_id, text FROM documents " +
        "WHERE doc_id % 50 = 0), " +
        "cp AS (SELECT a.doc_id, CASE WHEN a.doc_id % 13 = 5 AND " +
        "b.text IS NOT NULL THEN concat_ws(' ', a.text, b.text, a.text) " +
        "ELSE concat_ws(' ', a.text, a.text) END AS text " +
        "FROM documents a LEFT JOIN bs b ON b.bench_id = a.doc_id - a.doc_id % 50 " +
        "WHERE a.doc_id % 50 <> 0), ") +
      ", bd AS (SELECT doc_id, n, " +
      "list_concat(list_concat([CAST(0 AS BIGINT)], " +
      "[CAST(i + 16 AS BIGINT) for i in range(len(hashes)) if hashes[i+1] % 32 = 0]), " +
      "[CAST(n AS BIGINT)]) AS bounds FROM rh), " +
      "cx AS (SELECT doc_id, unnest(generate_series(1, len(bounds) - 1)) AS i, " +
      "bounds, n FROM bd), " +
      "ct AS (SELECT cx.doc_id, CAST(row_number() OVER (PARTITION BY cx.doc_id " +
      "ORDER BY cx.i) - 1 AS BIGINT) AS chunk_idx, " +
      "substr(cp.text, bounds[i] + 1, least(bounds[i + 1], n) - bounds[i]) AS chunk " +
      "FROM cx JOIN cp ON cx.doc_id = cp.doc_id " +
      "WHERE bounds[i + 1] > bounds[i] AND bounds[i] < n " +
      "AND least(bounds[i + 1], n) - bounds[i] > 0), " +
      s"csh AS (SELECT doc_id, chunk_idx, list_distinct(${ngramsOfToks(3)}) AS sh " +
      s"FROM (SELECT doc_id, chunk_idx, " +
      s"string_split_regex(trim(chunk, '$SqlWs'), '\\s+') AS toks FROM ct)), " +
      "ce AS (SELECT doc_id, chunk_idx, len(sh) AS chunk_shingles, " +
      "unnest(sh) AS s FROM csh), " +
      s"bsh AS (SELECT bench_id, unnest(list_distinct(${ngramsOfToks(3)})) AS s " +
      s"FROM (SELECT bench_id, string_split_regex(trim(text, '$SqlWs'), '\\s+') " +
      "AS toks FROM bs)), " +
      "hitp AS (SELECT doc_id, chunk_idx, bench_id, " +
      "CAST(count(*) AS BIGINT) AS n_shared, " +
      "CAST(any_value(chunk_shingles) AS BIGINT) AS chunk_shingles, " +
      "CAST(count(*) AS DOUBLE) / any_value(chunk_shingles) AS overlap " +
      "FROM ce JOIN bsh USING (s) GROUP BY 1, 2, 3)"

  // ------------------------------------------- unigram-LM tokenizer mirrors

  private val UnigramMaxWordLen = 16
  private val UnigramMaxPieceLen = 4

  /** Exact mirror of [[graft.functions.UnigramExpressions.logFp]] over a
    * keyed relation `src(key, x)` → `$prefix(key, acc)`: e from the binary
    * bit length (printf('%b') — no IEEE log anywhere), then `fracBits`
    * unrolled renormalizing shift-square steps in HUGEINT (m ≤ 2^(e+1), so
    * m² ≤ 2^126 fits; `//` and `<<` on HUGEINT are exact). Each step's
    * floor-truncation is part of the shared spec, so acc equals the JVM
    * BigInt computation bit for bit. */
  private def unigramLogCtes(prefix: String, src: String, fracBits: Int): String = {
    val head = s"${prefix}0 AS (SELECT key, " +
      "CAST(1 AS HUGEINT) << (2 * e + 1) AS th, " +
      "CAST(1 AS HUGEINT) << e AS d0, CAST(1 AS HUGEINT) << (e + 1) AS d1, " +
      "CAST(x AS HUGEINT) AS m, CAST(e AS BIGINT) AS acc " +
      s"FROM (SELECT key, x, length(printf('%b', x)) - 1 AS e FROM $src))"
    val steps = (1 to fracBits).map { i =>
      s"$prefix$i AS (SELECT key, th, d0, d1, " +
        "CASE WHEN m * m >= th THEN (m * m) // d1 ELSE (m * m) // d0 END AS m, " +
        "acc * 2 + CASE WHEN m * m >= th THEN 1 ELSE 0 END AS acc " +
        s"FROM $prefix${i - 1})"
    }
    (head +: steps).mkString(", ") +
      s", $prefix AS (SELECT key, acc FROM $prefix$fracBits)"
  }

  /** Piece-cost table from a vocab CTE `vocab(piece, cnt)` →
    * `$prefix(piece, cost)`: cost = logFp(Σ cnt) − logFp(cnt), the '' key
    * carrying the total (pieces are never empty). */
  private def unigramCostCtes(vocabCte: String, prefix: String,
      fracBits: Int): String =
    // the total rides as BIGINT: DuckDB's sum() yields HUGEINT, which
    // printf('%b') can't format (and would silently retype x via the UNION)
    s"${prefix}in AS (SELECT piece AS key, cnt AS x FROM $vocabCte " +
      s"UNION ALL SELECT '', CAST(sum(cnt) AS BIGINT) FROM $vocabCte), " +
      unigramLogCtes(s"${prefix}lg", s"${prefix}in", fracBits) + ", " +
      s"$prefix AS (SELECT l.key AS piece, t.acc - l.acc AS cost " +
      s"FROM ${prefix}lg l, (SELECT acc FROM ${prefix}lg WHERE key = '') t " +
      "WHERE l.key <> '')"

  /** Viterbi DP over the distinct-word relation `uw(w, freq)` under a cost
    * CTE `pc(piece, cost)` → `${prefix}seg(w, np, path)`: dp state i =
    * best (cost, np, path) for the length-i prefix, candidates extend
    * states i−maxPieceLen..i−1 by the matching piece, argmin per word via
    * row_number ORDER BY (cost, np, path) — DuckDB's elementwise VARCHAR[]
    * order is binary (= code-point) order, exactly the
    * WordForm.compareCodePoints tie-break the JVM DP uses, so the unique
    * optimum agrees on any plane. Words surface at their exact length's
    * state (lengths are code points on both engines). */
  private def unigramDpCtes(prefix: String, pcCte: String): String = {
    val dp0 = s"${prefix}0 AS (SELECT w, CAST(0 AS BIGINT) AS cost, " +
      "0 AS np, CAST([] AS VARCHAR[]) AS path FROM uw)"
    val dps = (1 to UnigramMaxWordLen).map { i =>
      val branches = (math.max(0, i - UnigramMaxPieceLen) until i).map { j =>
        s"SELECT d.w, d.cost + pc.cost AS cost, d.np + 1 AS np, " +
          s"list_append(d.path, pc.piece) AS path FROM $prefix$j d " +
          s"JOIN $pcCte pc ON length(d.w) >= $i " +
          s"AND pc.piece = substring(d.w, ${j + 1}, ${i - j})"
      }.mkString(" UNION ALL ")
      s"$prefix$i AS (SELECT w, cost, np, path FROM (" +
        "SELECT w, cost, np, path, row_number() OVER (" +
        "PARTITION BY w ORDER BY cost, np, path) AS rn " +
        s"FROM ($branches)) WHERE rn = 1)"
    }
    val seg = (1 to UnigramMaxWordLen).map(i =>
      s"SELECT w, np, path FROM $prefix$i WHERE length(w) = $i")
      .mkString(" UNION ALL ")
    (dp0 +: dps).mkString(", ") + s", ${prefix}seg AS ($seg)"
  }

  /** One EM round r: costs from vocab `uv{r-1}`, Viterbi-segment every
    * word, re-count pieces by corpus word frequency, floor unused single
    * chars at 1 (coverage — the SentencePiece never-prune-singles rule),
    * prune everything else unused → `uv$r(piece, cnt)`. */
  private def unigramRoundCtes(r: Int, fracBits: Int): String =
    unigramCostCtes(s"uv${r - 1}", s"upc$r", fracBits) + ", " +
      unigramDpCtes(s"udp${r}_", s"upc$r") + ", " +
      s"uec$r AS (SELECT piece, CAST(sum(freq) AS BIGINT) AS cnt FROM (" +
      s"SELECT u.freq, unnest(s.path) AS piece FROM udp${r}_seg s " +
      "JOIN uw u USING (w)) GROUP BY 1), " +
      s"uv$r AS (SELECT piece, cnt FROM uec$r UNION ALL " +
      s"SELECT piece, CAST(1 AS BIGINT) AS cnt FROM uv${r - 1} " +
      s"WHERE length(piece) = 1 AND piece NOT IN (SELECT piece FROM uec$r))"

  /** Base CTEs: the distinct-word relation under the shared tokens
    * contract (the NFC + ≤16-BMP-letter learning scope of
    * [[TextAnalysis.unigramLearn]]), the weighted substring seed scores,
    * and the seed vocab = top `seedSize` by (score DESC, piece ASC) ∪ all
    * single characters. */
  private def unigramBaseCtes(seedSize: Int, corpus: String = "mdocs"): String =
    s"uw AS (SELECT w, CAST(count(*) AS BIGINT) AS freq FROM " +
      s"(SELECT ${sqlNorm("w0")} AS w FROM " +
      s"(SELECT unnest($RawToks) AS w0 FROM $corpus)) " +
      s"WHERE ${sqlWordGate("w", UnigramMaxWordLen)} GROUP BY w), " +
      "usd AS (SELECT piece, CAST(sum(freq) AS BIGINT) AS cnt FROM (" +
      "SELECT substring(w, p, n) AS piece, freq FROM uw, " +
      "LATERAL (SELECT unnest(generate_series(1, length(w))) AS p), " +
      s"LATERAL (SELECT unnest(generate_series(1, " +
      s"least($UnigramMaxPieceLen, length(w) - p + 1))) AS n)) GROUP BY 1), " +
      "usr AS (SELECT piece, cnt, row_number() OVER (" +
      "ORDER BY cnt DESC, piece ASC) AS rn FROM usd), " +
      s"uv0 AS (SELECT piece, cnt FROM usr " +
      s"WHERE rn <= $seedSize OR length(piece) = 1)"

  /** Full replay of [[TextAnalysis.unigramLearn]] → the final ranked piece
    * table with counts and quantized costs. */
  private def unigramPiecesOracleSql(rounds: Int, seedSize: Int,
      fracBits: Int): String =
    s"WITH $MdocsCte, ${unigramBaseCtes(seedSize)}, " +
      (1 to rounds).map(unigramRoundCtes(_, fracBits)).mkString(", ") + ", " +
      unigramCostCtes(s"uv$rounds", "upcf", fracBits) +
      " SELECT CAST(row_number() OVER (ORDER BY v.cnt DESC, v.piece ASC) " +
      "AS BIGINT) AS rank, v.piece, v.cnt AS count, c.cost AS cost_fp " +
      s"FROM uv$rounds v JOIN upcf c USING (piece)"

  /** Learning + one more DP under the FINAL costs, applied per document —
    * the full chain ending in `un(doc_id, n_tokens, n)`: word-form
    * tokens take their Viterbi piece count, any other token counts 1 (the
    * [[TextAnalysis.unigramEncodedCounts]] contract). Shared by the apply
    * and the pack-on-unigram-counts mirrors. */
  private def unigramApplyCtes(rounds: Int, seedSize: Int,
      fracBits: Int, corpus: String = "mdocs"): String =
    s"${unigramBaseCtes(seedSize, corpus)}, " +
      (1 to rounds).map(unigramRoundCtes(_, fracBits)).mkString(", ") + ", " +
      unigramCostCtes(s"uv$rounds", "upcf", fracBits) + ", " +
      unigramDpCtes("udpa_", "upcf") + ", " +
      s"awd AS (SELECT doc_id, i AS wi, toks[i] AS w, " +
      s"${sqlNorm("toks[i]")} AS nw FROM " +
      s"(SELECT doc_id, $RawToks AS toks FROM $corpus), " +
      "LATERAL (SELECT unnest(generate_series(1, len(toks))) AS i) " +
      "WHERE toks[i] <> ''), " +
      "un AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens, " +
      s"CAST(sum(CASE WHEN ${sqlWordGate("nw", UnigramMaxWordLen)} " +
      "THEN s.np ELSE 1 END) AS BIGINT) " +
      "AS n FROM awd LEFT JOIN udpa_seg s ON s.w = awd.nw GROUP BY doc_id)"

  private def unigramApplyOracleSql(rounds: Int, seedSize: Int,
      fracBits: Int, corpus: String = "mdocs"): String =
    s"WITH ${corpusCte(corpus)}, ${unigramApplyCtes(rounds, seedSize, fracBits, corpus)} " +
      "SELECT doc_id, n_tokens, n AS n_pieces FROM un"

  /** The [[graft.operators.Eval.rankingMetrics]] metric block as SQL: given
    * a ranked CTE (query_id, `docCol`, rank) and a ground-truth CTE
    * (query_id, `docCol`), emits the per-query metric SELECT — integer hit
    * counts, single-division ratios, the rank-ordered 0.0-seeded DCG folds
    * with the round-4 nDCG defense. Shared by every eval_* mirror (one
    * definition, the stopword-list rule). */
  private def rankingMetricsSql(ranked: String, truth: String,
      docCol: String, k: Int): String =
    s"nr AS (SELECT query_id, CAST(count(*) AS BIGINT) AS n_relevant " +
      s"FROM $truth GROUP BY 1), " +
      "h AS (SELECT query_id, CAST(count(*) AS BIGINT) AS hits, " +
      "min(rank) AS frr, " +
      "list(1.0 / log2(CAST(rank AS DOUBLE) + 1.0) ORDER BY rank) AS gains " +
      s"FROM $ranked JOIN $truth USING (query_id, $docCol) " +
      s"WHERE rank <= $k GROUP BY 1) " +
      "SELECT nr.query_id, n_relevant, COALESCE(hits, 0) AS hits_at_k, " +
      "frr AS first_rel_rank, " +
      "CASE WHEN frr IS NULL THEN 0.0 ELSE 1.0 / CAST(frr AS DOUBLE) END AS rr, " +
      s"CAST(COALESCE(hits, 0) AS DOUBLE) / $k.0 AS precision_at_k, " +
      "CAST(COALESCE(hits, 0) AS DOUBLE) / CAST(n_relevant AS DOUBLE) AS recall_at_k, " +
      "CASE WHEN gains IS NULL THEN 0.0 ELSE (floor((" +
      "list_reduce(list_prepend(0.0, gains), (a, b) -> a + b) / " +
      "list_reduce(list_prepend(0.0, [1.0 / log2(CAST(i AS DOUBLE) + 1.0) " +
      s"for i in generate_series(1, least(n_relevant, $k))]), (a, b) -> a + b)" +
      ") * 10000 + 0.499999) / 10000) END AS ndcg_at_k " +
      "FROM nr LEFT JOIN h USING (query_id)"

  /** Mirror of [[graft.operators.Sampling.waterfillAlloc]] as a CTE chain
    * ending in `wf(key, n_rows, alloc)` — the windowed interval solve in
    * pure integers (`cExpr` = the per-key weight sum, e.g. `count(*)` or a
    * token sum; budget a literal). One definition for every waterfill
    * mirror (the stopword-list rule). */
  private def waterfillCtes(budget: Long, cExpr: String): String =
    s"c AS (SELECT source AS key, $cExpr AS c FROM documents GROUP BY 1), " +
      "o AS (SELECT key, c, row_number() OVER (ORDER BY c ASC, key ASC) AS i, " +
      "COALESCE(sum(c) OVER (ORDER BY c ASC, key ASC " +
      "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS p_prev, " +
      "COALESCE(lag(c) OVER (ORDER BY c ASC, key ASC), 0) AS c_prev FROM c), " +
      "t AS (SELECT count(*) AS k, sum(c) AS n FROM c), " +
      s"lv AS (SELECT (($budget - p_prev) // (k - i + 1)) AS lvl, " +
      s"$budget - (p_prev + (($budget - p_prev) // (k - i + 1)) * (k - i + 1)) AS rem " +
      s"FROM o, t WHERE p_prev <= $budget " +
      s"AND (($budget - p_prev) // (k - i + 1)) < c " +
      s"AND (($budget - p_prev) // (k - i + 1)) >= c_prev), " +
      "a AS (SELECT key, c, lv.lvl, lv.rem, " +
      "CASE WHEN lv.lvl IS NOT NULL AND c > lv.lvl THEN 1 ELSE 0 END AS ov " +
      "FROM o LEFT JOIN lv ON true), " +
      "r AS (SELECT *, row_number() OVER (PARTITION BY ov ORDER BY key ASC) AS rn FROM a), " +
      "wf AS (SELECT key, CAST(c AS BIGINT) AS n_rows, " +
      "CAST(CASE WHEN lvl IS NULL THEN c ELSE least(c, lvl) + " +
      "(CASE WHEN ov = 1 AND rn <= rem THEN 1 ELSE 0 END) END AS BIGINT) AS alloc " +
      "FROM r)"

  /** Mirror of [[Similarity]]'s fixed-point per-label centroid unit
    * vectors as a CTE chain ending in `outName(g, v)` — parameterized by a
    * generation WHERE clause so emb_class_sim and drift_centroid share the
    * one definition. */
  private def centroidCtes(outName: String, where: String): String =
    s"u_$outName AS (SELECT vec_id, label, list_transform(dv, x -> x / nrm) AS v " +
      "FROM (SELECT vec_id, label, dv, sqrt(list_inner_product(dv, dv)) AS nrm " +
      "FROM (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS dv " +
      s"FROM embeddings $where)) WHERE nrm > 0), " +
      s"px_$outName AS (SELECT label AS g, i AS pos, " +
      s"CAST(floor(v[i] * 1099511627776 + 0.5) AS HUGEINT) AS fx FROM u_$outName, " +
      "LATERAL (SELECT unnest(generate_series(1, 64)) AS i)), " +
      s"sm_$outName AS (SELECT g, pos, sum(fx) AS s, CAST(count(*) AS BIGINT) AS n " +
      s"FROM px_$outName GROUP BY 1, 2), " +
      s"ct_$outName AS (SELECT g, list(CAST(s AS DOUBLE) / n / 1099511627776.0 " +
      s"ORDER BY pos) AS mean FROM sm_$outName GROUP BY 1), " +
      s"$outName AS (SELECT g, list_transform(mean, x -> x / sqrt(" +
      "list_reduce(list_prepend(CAST(0 AS DOUBLE), [m * m for m in mean]), " +
      s"(p, q) -> p + q))) AS v FROM ct_$outName WHERE " +
      "list_reduce(list_prepend(CAST(0 AS DOUBLE), [m * m for m in mean]), " +
      "(p, q) -> p + q) > 0)"

  /** Map the unsigned mod-2⁶⁴ hash back to the JVM's signed long domain so
    * ORDER BY agrees with Spark's signed comparison. */
  private def signedSql(h: String): String =
    s"CAST(CASE WHEN $h >= 9223372036854775808 THEN $h - $Mod64 ELSE $h END AS BIGINT)"

  /** Mirror of [[graft.operators.Layout.spread31]] /
    * [[graft.operators.Layout.zValue]]: the same mask-shift chain in BIGINT
    * bit operators. Each fold step duplicates its accumulator textually
    * (2⁵ copies of the innermost term) — DuckDB CSE collapses them. */
  private def spreadSql(v: String): String =
    Seq(("16", "281470681808895"), ("8", "71777214294589695"),
      ("4", "1085102592571150095"), ("2", "3689348814741910323"),
      ("1", "6148914691236517205"))
      .foldLeft(s"(($v) & 2147483647)") { case (acc, (sh, mask)) =>
        s"((($acc) | (($acc) << $sh)) & $mask)"
      }

  private def zorderSql(x: String, y: String): String =
    s"(${spreadSql(x)} | (${spreadSql(y)} << 1))"

  /** Mirror of [[graft.operators.Layout.zValueN]]: the per-bit interleave
    * spelled out term by term (n·bitsEach OR-terms). */
  private def zorderNSql(dims: Seq[String], bitsEach: Int): String =
    dims.zipWithIndex.flatMap { case (d, i) =>
      (0 until bitsEach).map(j =>
        s"(((($d) >> $j) & 1) << ${j * dims.size + i})")
    }.mkString("(", " | ", ")")

  /** Mirror of [[graft.operators.Graph.pageRank]] over
    * [[graft.operators.Graph.transitionEdges]] of the events table: the
    * power iteration unrolled into one CTE per round. All operands are
    * non-negative, so DuckDB's `//` (floor) equals Spark's `div` (trunc);
    * DuckDB's sum() promotion to HUGEINT is folded back per round by the
    * CAST to BIGINT — the same value Spark's exact long sums hold.
    *
    * Every round CTE is MATERIALIZED: each references its predecessor
    * twice (contribution join + dangling-mass subquery), so DuckDB's
    * default CTE inlining would re-expand the whole chain 2^iters times —
    * the mirror of the Spark side's per-round localCheckpoint. */
  /** Batch-perceptron mirror (bias + 3 integer text stats, label
    * lang=en): weights live in 1-row CTEs chained per round — round r's
    * mistake filter evaluates margins under w_{r-1}, the update sums ride
    * the same filter, and the output unions one (round, n_mis, w0..w3)
    * row per round. All-integer, so the replay is exact. */
  private def perceptronCtes(rounds: Int): String = {
    val k = 4
    val sb = new StringBuilder
    sb ++= "f AS (SELECT doc_id, CASE WHEN lang = 'en' THEN 1 ELSE -1 END AS y, " +
      "CAST(1 AS BIGINT) AS x0, " +
      s"CAST($TokN AS BIGINT) AS x1, " +
      s"CAST(len(list_distinct($RawToks)) AS BIGINT) AS x2, " +
      "CAST(length(text) AS BIGINT) AS x3 FROM documents), "
    sb ++= "w0 AS (SELECT " +
      (0 until k).map(i => s"CAST(0 AS BIGINT) AS c$i").mkString(", ") + ")"
    for (r <- 1 to rounds) {
      val p = r - 1
      val marg = "f.y * (" +
        (0 until k).map(i => s"w$p.c$i * f.x$i").mkString(" + ") + ")"
      sb ++= s", u$r AS (SELECT " +
        s"CAST(count(*) FILTER (WHERE $marg <= 0) AS BIGINT) AS mis, " +
        (0 until k).map(i =>
          s"CAST(coalesce(sum(f.y * f.x$i) FILTER (WHERE $marg <= 0), 0) " +
            s"AS BIGINT) AS d$i").mkString(", ") +
        s" FROM f, w$p)"
      sb ++= s", w$r AS (SELECT " +
        (0 until k).map(i => s"w$p.c$i + u$r.d$i AS c$i").mkString(", ") +
        s" FROM w$p, u$r)"
    }
    sb.toString
  }

  /** Shared feature CTE of the stump mirrors: y = lang=en, three integer
    * text stats. */
  private val StumpBaseCte: String =
    "b AS (SELECT CASE WHEN lang = 'en' THEN 1 ELSE -1 END AS y, " +
      s"CAST($TokN AS BIGINT) AS f_ntok, " +
      s"CAST(len(list_distinct($RawToks)) AS BIGINT) AS f_ndist, " +
      "CAST(length(text) AS BIGINT) AS f_nchar FROM documents)"

  /** Boosted-stumps mirror: per round, the weighted candidate pipeline
    * (melt with the CASE-product weight of the prior rounds' stump
    * scalars, weighted cumulative counts, both polarities) and the
    * global (err, feature, v, pol) struct-min into a 1-row s{r} CTE the
    * NEXT round's weights cross-join — one transposed pick anywhere
    * changes every later round. */
  private def boostedStumpsOracleSql(rounds: Int): String = {
    val sb = new StringBuilder(s"WITH $StumpBaseCte")
    def wExpr(r: Int): String =
      if (r == 1) "CAST(1 AS BIGINT)"
      else (1 until r).map { j =>
        val x = s"CASE s$j.feature WHEN 'f_ntok' THEN b.f_ntok " +
          "WHEN 'f_ndist' THEN b.f_ndist ELSE b.f_nchar END"
        s"(CASE WHEN (CASE WHEN $x <= s$j.v THEN s$j.pol ELSE -s$j.pol END) " +
          "<> b.y THEN 2 ELSE 1 END)"
      }.mkString("CAST(", " * ", " AS BIGINT)")
    for (r <- 1 to rounds) {
      val joins = "b" + (1 until r).map(j => s", s$j").mkString
      val arms = Seq("f_ntok", "f_ndist", "f_nchar").map(f =>
        s"SELECT '$f' AS feature, b.$f AS v, b.y AS y, ${wExpr(r)} AS w " +
          s"FROM $joins").mkString(" UNION ALL ")
      sb ++= s", m$r AS (SELECT * FROM ($arms) " +
        "WHERE v IS NOT NULL AND y IS NOT NULL)"
      sb ++= s", g$r AS (SELECT feature, v, " +
        "CAST(sum(CASE WHEN y = 1 THEN w ELSE 0 END) AS BIGINT) AS np, " +
        "CAST(sum(CASE WHEN y = -1 THEN w ELSE 0 END) AS BIGINT) AS nn " +
        s"FROM m$r GROUP BY 1, 2)"
      sb ++= s", c$r AS (SELECT feature, v, " +
        "sum(np) OVER (PARTITION BY feature ORDER BY v) AS cp, " +
        "sum(nn) OVER (PARTITION BY feature ORDER BY v) AS cn, " +
        "sum(np) OVER (PARTITION BY feature) AS p, " +
        "sum(nn) OVER (PARTITION BY feature) AS n " +
        s"FROM g$r)"
      sb ++= s", e$r AS (SELECT feature, v, CAST(1 AS BIGINT) AS pol, " +
        s"cn + p - cp AS err, p + n AS wt FROM c$r " +
        "UNION ALL SELECT feature, v, CAST(-1 AS BIGINT), " +
        s"cp + n - cn, p + n FROM c$r)"
      sb ++= s", s$r AS (SELECT (mn).f AS feature, (mn).v AS v, " +
        "(mn).pol AS pol, CAST((mn).e AS BIGINT) AS err, " +
        "CAST((mn).wt AS BIGINT) AS wt FROM " +
        "(SELECT min({'e': err, 'f': feature, 'v': v, 'pol': pol, " +
        s"'wt': wt}) AS mn FROM e$r))"
    }
    sb ++= " " + (1 to rounds).map(r =>
      s"SELECT CAST($r AS BIGINT) AS round, feature, v AS threshold, " +
        s"pol AS polarity, err AS w_errors, wt AS w_total FROM s$r")
      .mkString(" UNION ALL ")
    sb.toString
  }

  private def perceptronOracleSql(rounds: Int): String =
    s"WITH ${perceptronCtes(rounds)} " +
      (1 to rounds).map(r =>
        s"SELECT CAST($r AS BIGINT) AS round, u$r.mis AS n_mis, " +
          (0 until 4).map(i => s"w$r.c$i AS w$i").mkString(", ") +
          s" FROM u$r, w$r").mkString(" UNION ALL ")

  /** Uncertainty-sampling mirror: the same fit, then every doc scored
    * under the final weights and the 20 smallest |score| taken with the
    * (abs, doc_id) tie-break. */
  private def perceptronUncertainSql(rounds: Int, k: Int): String =
    s"WITH ${perceptronCtes(rounds)} " +
      "SELECT doc_id, score FROM (SELECT f.doc_id, " +
      (0 until 4).map(i => s"w$rounds.c$i * f.x$i").mkString(" + ") +
      s" AS score FROM f, w$rounds) WHERE score IS NOT NULL " +
      s"ORDER BY abs(score), doc_id LIMIT $k"

  private def pageRankOracleSql(iters: Int, scale: Long, dampNum: Long,
      dampDen: Long): String = {
    val base = (dampDen - dampNum) * scale / dampDen
    val head = s"WITH ev AS (SELECT user_id, $TsUs AS t, event_id, " +
      "CAST(json_extract_string(props, '$.k') AS BIGINT) AS node FROM events " +
      "WHERE json_extract_string(props, '$.k') IS NOT NULL), " +
      "tr AS (SELECT node AS src, lead(node) OVER (" +
      "PARTITION BY user_id ORDER BY t, event_id) AS dst FROM ev), " +
      "edges AS MATERIALIZED (SELECT src, dst, count(*) AS w FROM tr WHERE dst IS NOT NULL " +
      "GROUP BY 1, 2), " +
      "nodes AS MATERIALIZED (SELECT DISTINCT node FROM (SELECT src AS node FROM edges " +
      "UNION ALL SELECT dst AS node FROM edges)), " +
      "outw AS MATERIALIZED (SELECT src, sum(w) AS outw FROM edges GROUP BY 1), " +
      "eo AS MATERIALIZED (SELECT e.src, e.dst, e.w, o.outw " +
      "FROM edges e JOIN outw o USING (src)), " +
      s"r0 AS MATERIALIZED (SELECT node, CAST($scale AS BIGINT) AS r FROM nodes)"
    val iterCtes = (1 to iters).map { i =>
      val p = s"r${i - 1}"
      s"r$i AS MATERIALIZED (SELECT n.node, CAST($base + ($dampNum * (COALESCE(c.c, 0) + " +
        s"(SELECT COALESCE(sum(r), 0) FROM $p WHERE node NOT IN " +
        s"(SELECT src FROM outw)) // (SELECT count(*) FROM nodes))) // $dampDen " +
        "AS BIGINT) AS r FROM nodes n LEFT JOIN (SELECT e.dst AS node, " +
        s"sum((r.r * e.w) // e.outw) AS c FROM eo e JOIN $p r ON e.src = r.node " +
        "GROUP BY 1) c ON n.node = c.node)"
    }.mkString(", ")
    s"$head, $iterCtes SELECT node, r AS rank_fp FROM r$iters"
  }

  /** SimHash pair mirror: 64 per-doc bit sums (±1 per token hash bit), then
    * hamming = count of bits whose sums disagree in sign — identical to
    * bit_count(xor) over the assembled signatures, without building a 64-bit
    * value that would overflow BIGINT at bit 63. Pigeonhole banding on the
    * Spark side is exact for maxHamming=3, so the oracle is simply ALL pairs
    * with hamming ≤ 3. */
  private val SimhashPairsSql = {
    val bitSums = (0 until 64)
      .map(i => s"sum(CASE WHEN (h >> $i) & 1 = 1 THEN 1 ELSE -1 END) AS b$i")
      .mkString(", ")
    val hamming = (0 until 64)
      .map(i => s"(CASE WHEN (a.b$i > 0) <> (b.b$i > 0) THEN 1 ELSE 0 END)")
      .mkString(" + ")
    s"$PolyHashCte, sig AS (SELECT doc_id, $bitSums FROM ph GROUP BY doc_id) " +
      "SELECT id_a, id_b, hamming FROM (SELECT a.doc_id AS id_a, b.doc_id AS id_b, " +
      s"CAST($hamming AS BIGINT) AS hamming FROM sig a JOIN sig b ON a.doc_id < b.doc_id) " +
      "WHERE hamming <= 3"
  }

  private def langIdSql(table: String): String = {
    val hits = langStops.map { case (l, ws) =>
      s"len(list_filter($LowerToks, x -> x IN (${sqlList(ws)}))) AS h_$l"
    }.mkString(", ")
    val gr = "greatest(" + langStops.map(l => s"h_${l._1}").mkString(", ") + ")"
    // first-in-order argmax == the Scala fold's strict-greater replacement
    val cases = langStops.map { case (l, _) => s"WHEN h_$l = $gr THEN '$l'" }.mkString(" ")
    s"SELECT doc_id, CASE WHEN $gr = 0 THEN 'und' $cases END AS lang_pred " +
      s"FROM (SELECT doc_id, $hits FROM $table)"
  }
  private val LangIdSql = langIdSql("documents")

  /** DuckDB twin of [[graft.operators.TextAnalysis.langIdNgram]]: the
    * fixed trigram-profile VALUES CTE (single literal source —
    * TextAnalysis.LangNgramProfiles), per-doc trigram windows over
    * lower(text), profile join, per-language exact long sums, argmax via
    * row_number ORDER BY (score DESC, lang) — the (−score, lang)
    * struct-min total order. Yields CTEs prof/lng/lsc/lbst. */
  private val LangNgramCtes: String = {
    val vals = graft.operators.TextAnalysis.LangNgramProfiles
      .map { case (l, g, w) => s"('$l', '$g', $w)" }.mkString(", ")
    s"prof(lang, gram, w) AS (VALUES $vals), " +
      "lng AS (SELECT doc_id, substr(lt, i, 3) AS gram FROM " +
      "(SELECT doc_id, lower(text) AS lt FROM ldocs), " +
      "LATERAL (SELECT unnest(generate_series(1, length(lt) - 2)) AS i)), " +
      "lsc AS (SELECT doc_id, lang, CAST(sum(w) AS BIGINT) AS score " +
      "FROM lng JOIN prof USING (gram) GROUP BY doc_id, lang), " +
      "lbst AS (SELECT doc_id, lang, score FROM " +
      "(SELECT doc_id, lang, score, row_number() OVER (PARTITION BY doc_id " +
      "ORDER BY score DESC, lang) AS rn FROM lsc) WHERE rn = 1)"
  }

  private val LangIdNgramSql: String =
    s"WITH $LdocsCte, $LangNgramCtes " +
      "SELECT d.doc_id, COALESCE(b.lang, 'und') AS lang_pred, " +
      "CAST(COALESCE(b.score, 0) AS BIGINT) AS score " +
      "FROM ldocs d LEFT JOIN lbst b USING (doc_id)"

  /** Disagreement report between the stopword tier and the trigram tier,
    * both over the SAME decorated corpus. */
  private val LangIdNgramDiffSql: String =
    s"WITH $LdocsCte, $LangNgramCtes, st AS (${langIdSql("ldocs")}) " +
      "SELECT s.doc_id, s.lang_pred AS lang_stop, " +
      "COALESCE(b.lang, 'und') AS lang_ngram " +
      "FROM st s LEFT JOIN lbst b USING (doc_id) " +
      "WHERE s.lang_pred <> COALESCE(b.lang, 'und')"

  // ------------------------------------------------------------- contract

  /** Flagship: full rule pipeline (filter → window → group → avg → envelope
    * projection) on sf0.001; driver smoke-checks rows > 0. */
  def entry(spark: SparkSession): DataFrame =
    RuleCompiler.compile(spec("avg", "purchase"), DAY)(
      envs(spark, "/root/testdata/sf0.001"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // S2 — JSON serialize → parse round-trip with corrupt-record dropping
    "s2_json_roundtrip" -> ((s, dir) => {
      import s.implicits._
      // scan-parallelism floor applied BELOW the envelope projection for
      // THIS query only (floorScan): the serialize→parse round-trip is
      // ~3.5 s of single-core JSON work over a one-split scan (r17
      // profiling: to_json alone was a 2.9 s single-task stage), so the
      // fan-out must sit under to_json — while the ~40 cheap
      // filter/aggregate envelope queries lose more to the extra exchange
      // than their sub-second aggregation saves (measured, r17)
      val good = EnvelopeJson.serialize(
        EventsAdapter.envelopes(s, dir, floorScan = true))
      val bad = Seq("{not json", "{\"metric\": 12}").toDF("value")
      EnvelopeJson.parse(good.unionByName(bad))
        .groupBy(col("metric.name").as("name")).agg(count(lit(1)).as("n"))
    }),
    // F1 — metric-name equality filter
    "f1_name_filter" -> filterQ(spec("count", "click", grouped = Seq("event_id"))),
    // F2 — conjunctive dimension equality filter
    "f2_dim_filter" -> filterQ(spec("count", "click", grouped = Seq("event_id"),
      filtered = Map("k" -> "42"))),
    // F3 — dimension reject incl. "" wildcard (any value of key)
    "f3_dim_reject" -> filterQ(spec("count", "view", grouped = Seq("event_id"),
      rejected = Map("k" -> "7", "vip" -> ""))),
    // F4 — grouped-key existence predicate (rows lacking `vip` are dropped)
    "f4_group_presence" -> ((s, dir) =>
      RuleCompiler.compileGrouped(
        spec("count", "signup", grouped = Seq("vip", "user_id")), DAY)(envs(s, dir))
        .select(col("w.start").cast("long").as("window_start"), col("tenant_id"),
          col("dim_vip").as("vip"), col("dim_user_id").as("user_id"),
          col("agg_value").as("value"))),
    // F5 — multi-rule fan-out over one source, via the shared-scan config
    // compiler (one job, name-isin pre-filter pushed into every branch)
    "f5_multi_rule" -> ((s, dir) => {
      RuleCompiler.compileAll(Seq(
          (spec("count", "click", grouped = Seq.empty), HOUR),
          (spec("sum", "purchase", grouped = Seq.empty), DAY)))(envs(s, dir))
        .select(col("metric.name").as("name"),
        col("meta").getItem("tenantId").as("tenant_id"),
        col("metric.timestamp").as("ts_ms"),
        safeRound2(col("metric.value")).as("value"))
    }),
    // W1 — epoch-aligned tumbling event-time windows (1 h)
    "w1_count_1h" -> ((s, dir) =>
      RuleCompiler.compileGrouped(spec("count", "click", grouped = Seq.empty), HOUR)(envs(s, dir))
        .select(col("w.start").cast("long").as("window_start"), col("tenant_id"),
          col("agg_value").as("value"))),
    // W2x — graft extension: SLIDING event-time windows (1 h sliding 15 min;
    // the reference only tumbles) — each click counts in 4 windows, the
    // Expand sits below the partial aggregation
    "w2_sliding" -> ((s, dir) =>
      RuleCompiler.compileGroupedSliding(
        spec("count", "click", grouped = Seq.empty), HOUR, 900L)(envs(s, dir))
        .select(col("w.start").cast("long").as("window_start"), col("tenant_id"),
          col("agg_value").as("value"))),
    // A1–A7 — the seven aggregate functions (per user per day over purchases)
    "a1_sum_1d" -> groupedQ("sum", DAY, round2 = true),
    "a2_count_1d" -> groupedQ("count", DAY, round2 = false),
    "a3_avg_1d" -> groupedQ("avg", DAY, round2 = true),
    "a4_min_1d" -> groupedQ("min", DAY, round2 = false),
    "a5_max_1d" -> groupedQ("max", DAY, round2 = false),
    "a6_delta_1d" -> groupedQ("delta", DAY, round2 = false),
    "a7_rate_1d" -> groupedQ("rate", DAY, round2 = false),
    // extension aggregates beyond the reference's seven
    "a8_stddev_1d" -> groupedQ("stddev", DAY, round2 = true),
    "a9_p50_1d" -> groupedQ("p50", DAY, round2 = true),
    "a10_p95_1d" -> groupedQ("p95", DAY, round2 = true),
    "a11_p99_1d" -> groupedQ("p99", DAY, round2 = true),
    // R1 — rollup: per-user avg re-aggregated to a per-tenant sum
    "r1_rollup_1d" -> ((s, dir) =>
      RuleCompiler.compileGrouped(
        spec("avg", "purchase", roll = Some(RollupSpec("sum", Seq.empty))), DAY)(envs(s, dir))
        .select(col("w.start").cast("long").as("window_start"), col("tenant_id"),
          safeRound2(col("agg_value")).as("value"))),
    // R1b — graft extension: rollup into COARSER windows (hourly per-user
    // avgs re-aggregated to a per-tenant daily sum)
    "r2_rollup_rewindow" -> ((s, dir) =>
      RuleCompiler.compileGrouped(
        spec("avg", "purchase",
          roll = Some(RollupSpec("sum", Seq.empty, Some(DAY)))), HOUR)(envs(s, dir))
        .select(col("w.start").cast("long").as("window_start"), col("tenant_id"),
          safeRound2(col("agg_value")).as("value"))),
    // D1 — graft extension: gap-based sessionization (session_window) per
    // (tenant, user); 1 h inactivity gap
    "d1_sessionize" -> ((s, dir) =>
      Sessions.sessionize(envs(s, dir), 3600L)
        .select(col("session_start_us"), col("session_end_us"), col("tenant_id"),
          col("key").as("user_id"), col("n_events"),
          safeRound2(col("sum_value")).as("sum_value"))),
    // D2 — graft extension: top-5 users by event count per (day, tenant)
    "d2_heavyhitters" -> ((s, dir) =>
      HeavyHitters.byWindow(envs(s, dir), DAY, "user_id", 5)
        .withColumnRenamed("value", "user_id")),
    // D4 — graft extension: exact distinct active users per (day, tenant)
    "d4_distinct" -> ((s, dir) =>
      HeavyHitters.distinctByWindow(envs(s, dir), DAY, "user_id")),
    // D5 — graft extension: key-skew profile (the pre-shuffle diagnostic —
    // top-5 hottest sources with their share of the whole corpus)
    "d5_keyskew" -> ((s, dir) =>
      Profiling.keySkew(docs(s, dir), "source", 5)
        .select("source", "cnt", "share", "rank")),
    // D6 — graft extension: salted two-stage count (the skew mitigation
    // d5_keyskew's measurement feeds; result is exactly groupBy-count for
    // ANY salt assignment, which is why a plain GROUP BY oracles it)
    "d6_saltedcount" -> ((s, dir) =>
      Profiling.saltedCount(docs(s, dir), "source", 8)
        .select("source", "cnt")),
    // SM — graft extension: token-budget mixture sampling (source weights
    // → per-source keep rates; src2's 0.9 share exceeds its corpus so its
    // rate clamps at 1.0, exercising the keep-whole branch)
    "sample_mixture" -> ((s, dir) =>
      Sampling.mixtureSample(docs(s, dir), "doc_id", "source",
          TextAnalysis.tokenCount(col("text")),
          Seq(("src0", 0.5), ("src1", 0.02), ("src2", 0.9)), 2000L)
        .select("doc_id", "source")),
    // L1 — graft extension: the Z-order (Morton) clustering key over
    // (user, day) — the write-layout primitive that makes parquet zone
    // maps selective on both dimensions (LayoutSpec measures the actual
    // file-pruning win; this query pins the key's bit arithmetic)
    "layout_zorder" -> ((s, dir) =>
      EventsAdapter.rawEvents(s, dir).select(col("event_id"),
        Layout.zValue(col("user_id"), expr("ts_us div 86400000000L")).as("z"))),
    // L2 — graft extension: the 3-dimensional Z key (user × day × hour) —
    // the general per-bit interleave for clustering on 3+ dimensions
    "layout_zorder3" -> ((s, dir) =>
      EventsAdapter.rawEvents(s, dir).select(col("event_id"),
        Layout.zValueN(Seq(col("user_id"), expr("ts_us div 86400000000L"),
          expr("(ts_us div 3600000000L) % 24L")), 20).as("z"))),
    // L3 — graft extension: the Hilbert curve key over the same (user,
    // day) dims (order 21) — the continuous curve whose equal-count file
    // cuts bound tighter boxes than Z's quadrant jumps; the per-level
    // rotation walk is a codegen'd custom expression, the oracle replays
    // it as a recursive CTE over the identical integer arithmetic
    "layout_hilbert" -> ((s, dir) =>
      EventsAdapter.rawEvents(s, dir).select(col("event_id"),
        Layout.hilbertValue(col("user_id"),
          expr("ts_us div 86400000000L"), 21).as("h"))),
    // G2 — graft extension: fixed-point weighted PageRank over the
    // interaction-transition graph (per-user consecutive props.k
    // transitions) — 10 power iterations, all-integer, bit-identical to
    // the oracle's unrolled 10-CTE replay
    "graph_pagerank" -> ((s, dir) => {
      val ev = EventsAdapter.rawEvents(s, dir)
        .select(col("user_id"), col("ts_us"), col("event_id"),
          get_json_object(col("props"), "$.k").cast("long").as("node"))
        .where(col("node").isNotNull)
      graft.operators.Graph.pageRank(
        graft.operators.Graph.transitionEdges(
          ev, "user_id", Seq("ts_us", "event_id"), "node"), iters = 10)
    }),
    // G5 — graft extension: deterministic negative-edge sampling over the
    // transition graph (3 slots per node via the seeded permutation,
    // true edges anti-joined) — contrastive link-prediction training data
    "graph_negatives" -> ((s, dir) => {
      val ev = EventsAdapter.rawEvents(s, dir)
        .select(col("user_id"), col("ts_us"), col("event_id"),
          get_json_object(col("props"), "$.k").cast("long").as("node"))
        .where(col("node").isNotNull)
      graft.operators.Graph.negativeEdges(
        graft.operators.Graph.transitionEdges(
          ev, "user_id", Seq("ts_us", "event_id"), "node"), k = 3)
    }),
    // G4 — graft extension: deterministic synchronous label-propagation
    // communities (5 rounds, weight-majority with min-label tie-break) —
    // the mid-resolution grouping between connected components and
    // per-node signals; oracle replays every round
    "graph_labelprop" -> ((s, dir) => {
      val ev = EventsAdapter.rawEvents(s, dir)
        .select(col("user_id"), col("ts_us"), col("event_id"),
          get_json_object(col("props"), "$.k").cast("long").as("node"))
        .where(col("node").isNotNull)
      graft.operators.Graph.labelPropagation(
        graft.operators.Graph.transitionEdges(
          ev, "user_id", Seq("ts_us", "event_id"), "node"), iters = 5)
    }),
    // G3 — graft extension: per-node triangle counts over the same
    // interaction-transition graph via the degree-oriented wedge join —
    // the local-clustering signal (link-farm / mirror-family detector)
    // beside PageRank's global authority signal
    "graph_triangles" -> ((s, dir) => {
      val ev = EventsAdapter.rawEvents(s, dir)
        .select(col("user_id"), col("ts_us"), col("event_id"),
          get_json_object(col("props"), "$.k").cast("long").as("node"))
        .where(col("node").isNotNull)
      graft.operators.Graph.triangleCounts(
        graft.operators.Graph.transitionEdges(
          ev, "user_id", Seq("ts_us", "event_id"), "node"))
    }),
    // G6 — graft extension: multi-source BFS hop distances over the
    // transition graph from the seed set {node % 20 == 0} — the
    // seed-distance curation tier ("everything within 4 link-hops of a
    // trusted seed"); level-synchronous frontier rounds, exact by level
    // order, oracle = the textbook recursive CTE + min(d)
    "graph_bfs" -> ((s, dir) => {
      val ev = EventsAdapter.rawEvents(s, dir)
        .select(col("user_id"), col("ts_us"), col("event_id"),
          get_json_object(col("props"), "$.k").cast("long").as("node"))
        .where(col("node").isNotNull)
      val edges = graft.operators.Graph.transitionEdges(
        ev, "user_id", Seq("ts_us", "event_id"), "node")
      val srcs = edges.select(col("src").as("node"))
        .unionByName(edges.select(col("dst").as("node")))
        .where(col("node") % 20 === 0).distinct()
      graft.operators.Graph.bfsDistances(edges, srcs, maxHops = 4)
    }),
    // G7 — graft extension: truncated k-core peeling (k=3, ≤8 rounds) over
    // the undirected transition graph — the dense-backbone extractor;
    // survivors with their within-core degree, oracle = 8 unrolled
    // peeling rounds (idempotent past the fixpoint)
    "graph_kcore" -> ((s, dir) => {
      val ev = EventsAdapter.rawEvents(s, dir)
        .select(col("user_id"), col("ts_us"), col("event_id"),
          get_json_object(col("props"), "$.k").cast("long").as("node"))
        .where(col("node").isNotNull)
      graft.operators.Graph.kcore(
        graft.operators.Graph.transitionEdges(
          ev, "user_id", Seq("ts_us", "event_id"), "node"),
        k = 3, maxRounds = 8)
    }),
    // G8 — graft extension: link-prediction scores for distance-2
    // non-edges (common neighbors, resource-allocation on the 10⁻⁶ grid,
    // Adamic–Adar on the stable 10⁻⁴ grid), mid-node degree cap 4096 as
    // the hub skew valve, cn ≥ 2
    "graph_linkpred" -> ((s, dir) => {
      val ev = EventsAdapter.rawEvents(s, dir)
        .select(col("user_id"), col("ts_us"), col("event_id"),
          get_json_object(col("props"), "$.k").cast("long").as("node"))
        .where(col("node").isNotNull)
      graft.operators.Graph.linkPredictionScores(
        graft.operators.Graph.transitionEdges(
          ev, "user_id", Seq("ts_us", "event_id"), "node"),
        maxDeg = 1L << 12, minCommon = 2)
        .select(col("a"), col("b"), col("cn"), col("ra_fp"),
          safeRound4(col("aa")).as("aa"))
    }),
    // SK1 — graft extension: KMV (bottom-k) distinct-count estimate of
    // active users per event type. k=64 < the sf0.01 cardinality, so the
    // gate exercises the ESTIMATOR branch there (and the exact m<k branch
    // at sf0.001, where each type has 15 users)
    "sketch_kmv_distinct" -> ((s, dir) =>
      Sketches.kmvDistinct(
        EventsAdapter.rawEvents(s, dir).select(col("event_type"), col("user_id")),
        Seq("event_type"), col("user_id"), 64)),
    // SK5 — graft extension: PORTABLE HyperLogLog distinct users per event
    // type — the same question sketch_kmv_distinct answers, through the
    // industry-standard register sketch: low-p-bit bucketing of the
    // portable hash, max leading-zero registers, all-integer harmonic sum;
    // both registers and estimate replay bit-for-bit in the oracle
    "sketch_hll_distinct" -> ((s, dir) =>
      Sketches.hllDistinct(
        EventsAdapter.rawEvents(s, dir).select(col("event_type"), col("user_id")),
        Seq("event_type"), col("user_id"), p = 8)),
    // SK6 — graft extension: AMS F2 (self-join-size) estimate over the
    // user_id key — the join-fan-out planning probe (F2 = the row count an
    // equi-self-join produces); 40 portable ±1 counters, medians-of-means,
    // all-integer so the estimate replays bit-for-bit
    "sketch_ams_f2" -> ((s, dir) =>
      Sketches.amsF2(EventsAdapter.rawEvents(s, dir), col("user_id"))),
    // SK3 — graft extension: mergeable fixed-bin histogram quantiles per
    // event type (64 bins × 10.0 over [0, 640)) — the corpus-scale
    // alternative to exact percentile's per-group value buffering
    "sketch_hist_quantile" -> ((s, dir) =>
      Sketches.histQuantiles(EventsAdapter.rawEvents(s, dir),
        Seq("event_type"), "value", 0.0, 10.0, 64, Seq(0.5, 0.95, 0.99))),
    // SK2 — graft extension: cross-source textual-overlap (Jaccard)
    // estimate from per-source KMV sketches over 3-gram shingle hashes —
    // the source-level contamination/redundancy profile, corpus touched
    // exactly once
    "sketch_kmv_overlap" -> ((s, dir) =>
      Sketches.kmvOverlap(
        docs(s, dir).select(col("source"),
          explode(Dedup.wordShingles(col("text"), 3)).as("sh")),
        "source", graft.functions.HashExpressions.polyHash64(col("sh")), 128)),
    // CDC1 — graft extension: apply a deterministic changeset (updates on
    // keys %10==3, deletes on %10==7, inserts re-keyed +1e6 from %10==1)
    // to the orders snapshot via the single-shuffle union+top-1 merge
    "cdc_merge" -> ((s, dir) => {
      val base = s.read.parquet(s"$dir/orders.parquet")
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
          col("o_totalprice"))
      val upd = base.filter(col("o_orderkey") % 10 === 3)
        .withColumn("o_totalprice", safeRound2(col("o_totalprice") * 1.1))
        .withColumn("__del", lit(false))
      val del = base.filter(col("o_orderkey") % 10 === 7)
        .withColumn("__del", lit(true))
      val ins = base.filter(col("o_orderkey") % 10 === 1)
        .withColumn("o_orderkey", col("o_orderkey") + 1000000L)
        .withColumn("o_orderstatus", lit("N"))
        .withColumn("__del", lit(false))
      Snapshot.mergeChanges(base, upd.unionByName(del).unionByName(ins),
          "o_orderkey", "__del")
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
          safeRound2(col("o_totalprice")).as("o_totalprice"))
    }),
    // CDC2 — graft extension: snapshot diff between two derived orders
    // snapshots (old drops %7==0, new drops %5==0 and bumps price on %3==0)
    "cdc_diff" -> ((s, dir) => {
      val base = s.read.parquet(s"$dir/orders.parquet")
        .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
      val oldSnap = base.filter(col("o_orderkey") % 7 =!= 0)
      val newSnap = base.filter(col("o_orderkey") % 5 =!= 0)
        .withColumn("o_totalprice",
          when(col("o_orderkey") % 3 === 0, safeRound2(col("o_totalprice") * 1.05))
            .otherwise(col("o_totalprice")))
      Snapshot.diff(oldSnap, newSnap, "o_orderkey",
        Seq("o_totalprice", "o_orderstatus"))
    }),
    // CDC3 — graft extension: SCD-2 validity intervals of each user's
    // event-type state (consecutive same-type observations collapse)
    "cdc_scd2" -> ((s, dir) =>
      Snapshot.scd2(
        EventsAdapter.rawEvents(s, dir)
          .select(col("user_id"), col("ts_us"), col("event_type"), col("event_id")),
        "user_id", "ts_us", Seq("event_type"), "event_id")),
    // R3 — graft extension: multi-granularity aggregate (CUBE over
    // event_type × user band) in ONE pass — Expand + a single exchange
    // instead of four scans; gid disambiguates super-aggregate NULLs
    "agg_cube" -> ((s, dir) =>
      EventsAdapter.rawEvents(s, dir)
        .select(col("event_type"), (col("user_id") % 3).as("user_band"),
          col("value"))
        .cube(col("event_type"), col("user_band"))
        // exact integer cents: the grand-total row sums the whole table and
        // double addition is partial-agg-order-dependent — longs are not
        .agg(grouping_id().as("gid"), count(lit(1)).as("n"),
          sum(floor(col("value") * 100).cast("long")).as("sum_cents"))),
    // J7 — graft extension: Levenshtein fuzzy self-join over distinct part
    // names via SymSpell deletion neighborhoods (bucket-join + banded
    // confirm, never all-pairs)
    "join_editdist" -> ((s, dir) =>
      FuzzyString.editDistancePairs(
        s.read.parquet(s"$dir/part.parquet").select(col("p_name")).distinct(),
        "p_name", "p_name", maxDist = 2)
        .select(col("id_a").as("name_a"), col("id_b").as("name_b"), col("dist"))),
    // A13 — robust (median/MAD) anomaly flags over the same zero-filled
    // hourly series as a12 — outliers can't inflate their own baseline
    "a13_mad" -> ((s, dir) => {
      val series = GapFill.zeroFill(
        RuleCompiler.compileGrouped(
          spec("count", "signup", grouped = Seq.empty), HOUR)(envs(s, dir)),
        HOUR, Seq("tenant_id"))
      // flag re-derived from the rounded score — same boundary-stability
      // rule as a12_anomaly
      Anomaly.madFlags(series, Seq("tenant_id"), "value", threshold = 3.5)
        .select(col("window_start"), col("tenant_id"), col("value"),
          safeRound2(col("mad_z")).as("mad_z"),
          (abs(safeRound2(col("mad_z"))) > 3.5).as("is_anomaly"))
    }),
    // T-PMI — graft extension: bigram collocations by pointwise mutual
    // information (positional counts, corpus totals on 1-row broadcasts)
    "text_pmi" -> ((s, dir) =>
      TextAnalysis.pmiCollocations(docs(s, dir), minCount = 5)
        .select(col("w1"), col("w2"), col("n_pair"),
          safeRound4(col("pmi")).as("pmi"))),
    // SK4 — graft extension: Count-Min sketch over event user_ids (d=4,
    // w=32 — deliberately undersized so collisions demonstrably only
    // OVER-estimate), probed for every distinct user
    "sketch_cms" -> ((s, dir) => {
      val ev = EventsAdapter.rawEvents(s, dir)
      Sketches.cmsEstimate(
        Sketches.cmsBuild(ev, col("user_id"), d = 4, w = 32),
        ev.select(col("user_id")).distinct(), "user_id", d = 4, w = 32)
    }),
    // T-OOV — per-doc out-of-vocabulary profile vs the top-16 learned
    // token vocab (16 < the corpus's 31 types, so OOV is non-trivial)
    "text_oov" -> ((s, dir) => TextAnalysis.oovStats(docs(s, dir), 16)),
    // T-CODE — The-Stack-style code-file signals over a newline-decorated
    // fixture (testdata text is single-line prose; the decoration adds an
    // indented line and a doc_id-length prefix line so every signal does
    // real work — the text_normalize decorate-the-fixture pattern)
    "text_code_stats" -> ((s, dir) => {
      val decorated = docs(s, dir).withColumn("text",
        concat_ws("\n", coalesce(col("text"), lit("")), lit("  indented"),
          coalesce(col("text"), lit(""))
            .substr(lit(1), (col("doc_id") % 40).cast("int"))))
      TextAnalysis.codeStats(decorated)
    }),
    // D10 — drift monitor: PSI between two pseudo-snapshots (even vs odd
    // doc ids) over 100-char document-length buckets
    "drift_psi" -> ((s, dir) => {
      val d = docs(s, dir)
      val bucket = least(expr("n_chars div 100"), lit(19L))
      Profiling.psiDrift(
          d.filter(col("doc_id") % 2 === 0), d.filter(col("doc_id") % 2 === 1),
          bucket)
        .withColumn("psi_contrib", safeRound4(col("psi_contrib")))
    }),
    // embedding-space drift: per-label centroid cosine between generations
    // (full-outer — appearance/disappearance IS drift)
    "drift_centroid" -> ((s, dir) => {
      val e = emb(s, dir)
      Similarity.centroidDrift(e.filter(col("vec_id") % 2 === 0),
          e.filter(col("vec_id") % 2 === 1), "label")
        .select(col("label"), round(col("cosine"), 4).as("cosine"),
          col("in_old"), col("in_new"))
    }),
    // KS drift — the nonparametric sibling of drift_psi: exact integer
    // cross-product CDF distance over the same generation split, one IEEE
    // division at the end
    "drift_ks" -> ((s, dir) => {
      val d = docs(s, dir)
      Profiling.ksDrift(
        d.filter(col("doc_id") % 2 === 0), d.filter(col("doc_id") % 2 === 1),
        least(expr("n_chars div 100"), lit(19L)))
    }),
    // A14 — graft extension: exact weighted median of value per event type
    // (weights = user_id%5+1; integer cross-product threshold — engine-
    // portable row pick)
    "a14_wmedian" -> ((s, dir) =>
      Profiling.weightedQuantile(
        EventsAdapter.rawEvents(s, dir)
          .select(col("event_type"), col("value"),
            (col("user_id") % 5 + 1).as("w")),
        Seq("event_type"), col("value"), col("w"), 1, 2)),
    // AGG2 — graft extension: pivoted per-tenant event-type counts (the
    // transpose convenience over the same one-exchange grouped aggregate)
    "agg_pivot" -> ((s, dir) =>
      EventsAdapter.rawEvents(s, dir)
        .select(expr("'t' || cast(user_id % 3 as string)").as("tenant_id"),
          col("event_type"))
        .groupBy("tenant_id")
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .count()
        .na.fill(0L)),
    // SPLIT-T — graft extension: temporal holdout with a 1-day embargo at
    // the exact 4/5 mass point of the daily distribution — train on the
    // past, test on the future, buffer labeled (never silently dropped)
    "sample_split_time" -> ((s, dir) =>
      Sampling.timeSplit(
          EventsAdapter.rawEvents(s, dir).select(col("event_id"), col("ts_us")),
          "ts_us", 86400000000L, 4, 5, embargoBuckets = 1)
        .select(col("event_id"), col("split"))),
    // D12 — graft extension: pairwise association rules over (user, day)
    // event-type baskets — support/confidence/lift from exact counts
    "d12_assoc" -> ((s, dir) => {
      val ev = EventsAdapter.rawEvents(s, dir)
        .select(col("user_id"),
          expr("(CAST(ts_us AS BIGINT) div 86400000000L)").as("day"),
          col("event_type"))
      Sessions.associationRules(ev, Seq("user_id", "day"), "event_type")
        .select(col("item_a"), col("item_b"), col("n_ab"), col("n_a"), col("n_b"),
          round(col("support"), 4).as("support"),
          round(col("confidence_ab"), 4).as("confidence_ab"),
          round(col("lift"), 4).as("lift"))
    }),
    // D11 — graft extension: per-tenant daily-volume OLS trend (exact
    // integer sums, one fixed IEEE sequence at the end) — the direction-
    // and-rate reading of any per-bucket aggregate
    "d11_trend" -> ((s, dir) => {
      val daily = EventsAdapter.rawEvents(s, dir)
        .groupBy(expr("'t' || cast(user_id % 3 as string)").as("tenant_id"),
          expr("(CAST(ts_us AS BIGINT) div 86400000000L)").as("day"))
        .agg(count(lit(1)).as("y"))
      Profiling.trend(daily, Seq("tenant_id"), col("day"), col("y"))
        .select(col("tenant_id"), col("n_points"),
          round(col("slope"), 4).as("slope"),
          round(col("intercept"), 4).as("intercept"))
    }),
    // DR2 — graft extension: column-profile diff between the cdc_diff
    // snapshot generations (row/null/distinct counts, min/max) — the
    // schema-level drift companion to drift_psi's distributional lens
    "profile_diff" -> ((s, dir) => {
      val base = s.read.parquet(s"$dir/orders.parquet")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      val oldSnap = base.filter(col("o_orderkey") % 7 =!= 0)
      val newSnap = base.filter(col("o_orderkey") % 5 =!= 0)
        .withColumn("o_totalprice",
          when(col("o_orderkey") % 3 === 0, safeRound2(col("o_totalprice") * 1.05))
            .otherwise(col("o_totalprice")))
      Profiling.profileDiff(oldSnap, newSnap,
        Seq("o_orderkey", "o_custkey", "o_totalprice"))
    }),
    // T-BM25k — batch retrieval join: top-5 BM25 docs per benchmark query
    // (queries = first 3 tokens of every doc_id % 100 == 0 document)
    "text_bm25_topk" -> ((s, dir) => {
      val d = docs(s, dir, floored = true)
      val queries = d.filter(col("doc_id") % 100 === 0 && col("text").isNotNull)
        .select(col("doc_id").as("query_id"),
          explode(slice(split(trim(lower(col("text")), TextAnalysis.WsCharsRaw),
            s"${TextAnalysis.WsClass}+"), 1, 3)).as("term"))
      TextAnalysis.bm25Multi(d, queries, topK = 5)
    }),
    // ranking-quality evaluation of the BM25 retrieval join: conjunctive
    // ground truth (a doc is relevant iff it contains EVERY query term) —
    // hits@5, MRR numerator, exact-ratio precision/recall, fold-pinned nDCG
    "eval_retrieval" -> ((s, dir) => {
      val d = docs(s, dir, floored = true)
      val queries = d.filter(col("doc_id") % 100 === 0 && col("text").isNotNull)
        .select(col("doc_id").as("query_id"),
          explode(slice(split(trim(lower(col("text")), TextAnalysis.WsCharsRaw),
            s"${TextAnalysis.WsClass}+"), 1, 3)).as("term"))
      // the ground-truth side SHARES the retrieval join's persisted postings
      // (bm25MultiWithPostings): the postings relation is exactly the
      // distinct (doc, matched-term) pairs the conjunctive ground truth
      // needs — deriving it independently (the r16 shape) re-scanned and
      // re-tokenized the whole corpus a second time, plus three more
      // query-table derivations, each a corpus scan (doc_id % 100 doesn't
      // push down). The query-term table is normalized ONCE here and fed to
      // both sides (bm25Multi re-normalizes idempotently)
      // qt is the SAME persisted normalized query-term table the retrieval
      // join broadcasts (r17 derived + persisted a duplicate copy here: one
      // extra corpus scan, two cache entries of one relation — VERDICT r17)
      val (ranked, postings, qtShared) =
        TextAnalysis.bm25MultiFull(d, queries, topK = 5)
      val qt = qtShared.select(col("query_id"), col("tok").as("term"))
      val nt = qt.groupBy("query_id").agg(count(lit(1)).as("nt"))
      // postings is grouped by (doc, tok) — already distinct pairs
      val dt = postings.select(col("doc_id"), col("tok"))
      val relevant = dt.join(broadcast(qt), qt("term") === dt("tok"))
        .groupBy(col("query_id"), col("doc_id"))
        .agg(count(lit(1)).as("matched"))
        .join(broadcast(nt), Seq("query_id"))
        .filter(col("matched") === col("nt"))
        .select("query_id", "doc_id")
      Eval.rankingMetrics(ranked, relevant, k = 5)
    }),
    // Matryoshka-style truncation eval: does half-dim retrieval still find
    // the full-dim neighbors? ranked = top-5 by 32-dim truncated cosine,
    // ground truth = top-5 by the full 64-dim cosine — rankingMetrics
    // composed with the ANN family (recall@5 here IS truncation recall)
    "eval_ann_trunc" -> ((s, dir) => {
      val e = emb(s, dir)
      val full = Similarity.bruteForceTopK(e.filter(col("vec_id") < 10), e, 5)
        .select(col("query_id"), col("neighbor_id"))
      def half(df: DataFrame) =
        df.select(col("vec_id"), slice(col("embedding"), 1, 32).as("embedding"))
      val trunc = Similarity.bruteForceTopK(half(e.filter(col("vec_id") < 10)),
          half(e), 5)
        .select(col("query_id"), col("neighbor_id"),
          col("rank").cast("long").as("rank"))
      Eval.rankingMetrics(trunc, full, k = 5, docIdCol = "neighbor_id")
    }),
    // D9 — graft extension: exponentially-decayed event counts per type
    // (7-day half-life, whole-half-life quantization → pure long sums,
    // exact on every engine; ref = max event time)
    "d9_decayed" -> ((s, dir) => {
      val ev = EventsAdapter.rawEvents(s, dir)
      val ref = ev.agg(max(col("ts_us"))).first().getLong(0)
      Profiling.decayedCount(ev, Seq("event_type"), "ts_us", ref,
        halfLifeUs = 604800000000L)
    }),
    // J8 — canonical entity groups: connected components over the fuzzy
    // edit-distance pairs (names within distance 2 merge; canonical = the
    // lexicographic minimum of the cluster)
    "join_editdist_cluster" -> ((s, dir) =>
      Dedup.connectedComponents(
        FuzzyString.editDistancePairs(
          s.read.parquet(s"$dir/part.parquet").select(col("p_name")).distinct(),
          "p_name", "p_name", maxDist = 2))
        .select(col("id").as("name"), col("component").as("canonical"))),
    // T-QN — cross-source quality calibration: percent_rank of the quality
    // score within each source (exact integer ratio — engine-stable)
    "text_quality_qnorm" -> ((s, dir) =>
      TextAnalysis.qualityQuantileNormalize(docs(s, dir), "source")),
    // E-PCA — graft extension: deterministic PCA (fixed-point covariance +
    // driver power iteration, 2 components × 30 fixed rounds) projecting
    // every embedding — the SemDeDup/OPQ whitening step, bit-replayed by
    // the oracle including the full iteration
    "emb_pca" -> ((s, dir) => {
      val e = emb(s, dir)
      val (mu, comps) = Similarity.pcaFit(e, "embedding", k = 2, iters = 30)
      Similarity.pcaProject(e, "vec_id", "embedding", mu, comps)
        .select(col("vec_id"), round(col("p1"), 4).as("p1"),
          round(col("p2"), 4).as("p2"))
    }),
    // D3 — graft extension: dense hourly series (zero-filled gaps) of
    // per-tenant signup counts
    "d3_gapfill" -> ((s, dir) =>
      GapFill.zeroFill(
        RuleCompiler.compileGrouped(
          spec("count", "signup", grouped = Seq.empty), HOUR)(envs(s, dir)),
        HOUR, Seq("tenant_id"))),
    // D13 — lag/rolling feature export over the DENSE grid: lag_1/lag_24
    // (NULL through the cold start) + 7-window trailing mean — the
    // forecasting-feature table, engine-exact on integer-valued series
    "d13_lags" -> ((s, dir) =>
      GapFill.lagFeatures(
        RuleCompiler.compileGrouped(
          spec("count", "signup", grouped = Seq.empty), HOUR)(envs(s, dir)),
        HOUR, Seq("tenant_id"), lags = Seq(1, 24), rollWidths = Seq(7))),
    // D7 — graft extension: 7-day trailing spend per user per day — the
    // rolling-feature primitive (RANGE frame over pre-aggregated buckets)
    "d7_trailing" -> ((s, dir) =>
      GapFill.trailingAggregate(
          EventsAdapter.rawEvents(s, dir).filter(col("event_type") === "purchase"),
          "ts_us", "value", Seq("user_id"),
          bucketUs = 86400000000L, lookbackBuckets = 7)
        .select(col("user_id"), col("bucket_start"), col("n_events"),
          col("trail_n"), safeRound2(col("trail_sum")).as("trail_sum"))),
    // D8 — graft extension: view → click → purchase funnel within 7 days
    // per step (per-user step times + steps reached)
    "d8_funnel" -> ((s, dir) =>
      Sessions.funnel(EventsAdapter.rawEvents(s, dir),
          Seq("view", "click", "purchase"), horizonUs = 604800000000L)
        .select(col("user_id"), col("step_1_us"), col("step_2_us"),
          col("step_3_us"), col("n_steps"))),
    // D10 — graft extension: the cohort-retention triangle (users grouped
    // by first active day, counted per age) — one corpus exchange, then
    // user-bucket-sized relations only
    "d10_retention" -> ((s, dir) =>
      Sessions.retention(EventsAdapter.rawEvents(s, dir),
        bucketUs = 86400000000L)),
    // D3b — forward fill: gaps carry the last observed value
    "d3b_forwardfill" -> ((s, dir) =>
      GapFill.forwardFill(
        RuleCompiler.compileGrouped(
          spec("count", "signup", grouped = Seq.empty), HOUR)(envs(s, dir)),
        HOUR, Seq("tenant_id"))),
    // P1/P2 — envelope projection; output timestamp = window start (ms)
    "p1_envelope" -> ((s, dir) =>
      RuleCompiler.compile(spec("avg", "purchase"), DAY)(envs(s, dir))
        .select(col("metric.name").as("name"),
          col("metric.dimensions").getItem("user_id").as("user_id"),
          col("metric.timestamp").as("ts_ms"),
          safeRound2(col("metric.value")).as("value"))),

    // ----- training-data-pipeline extensions -----
    "dedup_exact" -> ((s, dir) => Dedup.exact(docs(s, dir))),
    // QUALITY-keeper exact dedup: duplicates are PLANTED (doc_id % 9 == 4
    // becomes a double-spaced copy of its predecessor — same normalized
    // fingerprint, longer raw text) and the keeper is the LONGEST copy
    // (score = raw length, the least-truncated-copy curation rule), so the
    // winner provably differs from dedup_exact's min-id keeper
    "dedup_exact_best" -> ((s, dir) => {
      val d = docs(s, dir)
      val prev = d.select((col("doc_id") + 1).as("doc_id"),
        regexp_replace(col("text"), " ", "  ").as("__alt"))
      val decorated = d.join(prev, Seq("doc_id"), "left")
        .select(col("doc_id"),
          when(col("doc_id") % 9 === 4 && col("__alt").isNotNull, col("__alt"))
            .otherwise(col("text")).as("text"))
      Dedup.exactBest(decorated, length(col("text")).cast("long"))
    }),
    // templated machine-generated pages: digit-masked fingerprints group
    // "order #1234 shipped..." with "order #9871 shipped..." — the
    // boilerplate class both exact dedup and shingling underweight
    "dedup_template" -> ((s, dir) =>
      TextAnalysis.templateGroups(
        docs(s, dir).withColumn("text",
          when(col("doc_id") % 5 === 0,
            concat(lit("Order "), col("doc_id").cast("string"),
              lit(" shipped to customer "), (col("doc_id") * 7).cast("string"),
              lit(" on day "), (col("doc_id") % 28).cast("string")))
            .otherwise(col("text"))))),
    "dedup_ngram" -> ((s, dir) => Dedup.ngramJaccardPairs(docs(s, dir, floored = true), 3, 0.5)),
    // ASYMMETRIC containment pairs (the LSH-Ensemble relation): a short
    // doc quoted whole inside a long one scores ≈1 here and ≈0 on
    // Jaccard — directed subset-duplication the symmetric family misses
    "dedup_containment" -> ((s, dir) =>
      Dedup.containmentPairs(docs(s, dir), 3, 0.8)),
    // the AUDIT lens: for every near-dup pair, the 3 rarest shared
    // shingles — human-reviewable evidence for WHY two documents matched
    "dedup_evidence" -> ((s, dir) => {
      val d = docs(s, dir)
      Dedup.pairEvidence(d, Dedup.ngramJaccardPairs(d, 3, 0.5), n = 3, k = 3)
    }),
    // the WEIGHTED near-dup lens: bag-of-trigrams cosine over integer term
    // frequencies — exact long dot/norm sums (the q8i portability trick on
    // sparse text), so the score replays bit-for-bit; trigram terms, same
    // granularity posture as the Jaccard family (unigrams are the measured
    // quadratic trap on a natural-language-sized vocabulary — see scaladoc)
    "dedup_cosine" -> ((s, dir) =>
      Dedup.cosineTfPairs(
          docs(s, dir, floored = true).where(TextAnalysis.tokenCount(col("text")) > 0),
          threshold = 0.8, n = 3)
        .select(col("id_a"), col("id_b"), round(col("cosine"), 4).as("cosine"))),
    // the EXACT-output skew-safe path: prefix-filtered candidate generation
    // (SSJoin/All-Pairs) under the (df, shingle) global order — provably the
    // SAME pair set as the uncapped flagship (the oracle is the brute-force
    // spec), with the inverted index built over document prefixes only
    "dedup_prefix" -> ((s, dir) =>
      Dedup.prefixJaccardPairs(docs(s, dir), 3, 1, 2)),
    // the 100 TB-safe path: hot shingles (df > 4) dropped, Jaccard over
    // survivors — exercises the skew cap the uncapped flagship leaves off
    "dedup_ngram_capped" -> ((s, dir) =>
      Dedup.ngramJaccardPairs(docs(s, dir), 3, 0.5, maxDocFreq = 4)),
    "dedup_minhash" -> ((s, dir) =>
      Dedup.minhashLshPairs(docs(s, dir), n = 3, k = 128, bands = 32, threshold = 0.5)),
    // the dataset-card header: one (metric, value) summary relation per
    // corpus release — counts, token/char totals, exact-dup count, mean +
    // exact-median doc length, in ONE aggregation pass
    "report_datacard" -> ((s, dir) => Profiling.dataCard(docs(s, dir))),
    // k-ANONYMITY release gate over customer quasi-identifiers (nation,
    // market segment, 1000-unit balance band — cents-exact, offset +1000
    // so the band stays non-negative and floor/`div`//`//` agree): the
    // dataset's actual k, the sub-k cell mass, the suppression share at
    // k = 10
    "report_kanon" -> ((s, dir) =>
      Profiling.kAnonymityAudit(
        s.read.parquet(s"$dir/customer.parquet"),
        Seq(col("c_nationkey"), col("c_mktsegment"),
          expr("CAST(floor((c_acctbal + 1000) * 100) AS BIGINT) div 100000")),
        k = 10L)),
    // the per-shard integrity record shipped beside an export: row/token
    // totals + an order-insensitive mod-2⁶⁴ content checksum (re-run it on
    // the delivered shards; any dropped/duplicated/corrupt doc flips it)
    "report_manifest" -> ((s, dir) =>
      Sampling.exportManifest(docs(s, dir), numShards = 8)),
    // the per-source slice of the same card — what a mixing decision reads
    "report_datacard_by" -> ((s, dir) =>
      Profiling.dataCardBy(docs(s, dir), Seq("source"))),
    // hard-budget mixing: water-filling allocation across sources — every
    // source keeps up to the common level, small sources' unused share
    // spills upward, Σ alloc == budget exactly (rates only hit it in
    // expectation)
    "sample_waterfill" -> ((s, dir) =>
      Sampling.waterfillAlloc(docs(s, dir), "source", budget = 300L)),
    // the same allocator in TOKEN units — the budget a trainer actually has
    "sample_waterfill_tokens" -> ((s, dir) =>
      Sampling.waterfillAlloc(docs(s, dir), "source", budget = 20000L,
        TextAnalysis.tokenCount(col("text")))),
    // the allocation MATERIALIZED: per-key hash-rank gate capped by alloc —
    // exactly budget rows come back, per key, deterministically
    "sample_waterfill_rows" -> ((s, dir) => {
      val d = docs(s, dir)
      Sampling.selectByAlloc(d,
          Sampling.waterfillAlloc(d, "source", budget = 300L),
          "source", "doc_id")
        .select("doc_id", "source")
    }),
    // the banding miss-rate MEASURED: candidate pairs of a portable
    // 64-slot/16-band MinHash vs the exact Jaccard ≥ 0.5 ground truth —
    // the empirical (k, bands) tuning number for the dedup family
    "dedup_banding_eval" -> ((s, dir) =>
      Dedup.minhashBandingEval(docs(s, dir, floored = true), n = 3, k = 64, bands = 16,
        threshold = 0.5)),
    "dedup_simhash" -> ((s, dir) =>
      Dedup.simhashPairs(docs(s, dir), maxHamming = 3)
        .select(col("id_a"), col("id_b"), col("hamming").cast("long").as("hamming"))),
    "dedup_cluster" -> ((s, dir) =>
      Dedup.connectedComponents(Dedup.ngramJaccardPairs(docs(s, dir, floored = true), 3, 0.5))),
    // the CHAINING audit: per near-dup cluster, member/edge counts and the
    // weakest edge — a big cluster held together by a 0.51-Jaccard bridge
    // is a transitive-merge artifact, not a duplicate family
    "dedup_cluster_diameter" -> ((s, dir) => {
      val pairs = Dedup.ngramJaccardPairs(docs(s, dir, floored = true), 3, 0.5)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val cc = Dedup.connectedComponents(pairs)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val sizes = cc.groupBy("component").agg(count(lit(1)).as("n_members"))
      val edges = pairs
        .join(cc.withColumnRenamed("id", "id_a"), Seq("id_a"))
        .groupBy("component")
        .agg(count(lit(1)).as("n_edges"),
          round(min(col("jaccard")), 4).as("min_edge_jaccard"))
      sizes.join(edges, Seq("component"))
    }),
    // duplication DEPTH, not just membership: the cluster-size histogram
    // ("how many 2-clusters vs 50-doc boilerplate blobs") — the number that
    // decides whether near-dup removal is a trim or a massacre
    "dedup_cluster_sizes" -> ((s, dir) =>
      Dedup.connectedComponents(Dedup.ngramJaccardPairs(docs(s, dir, floored = true), 3, 0.5))
        .groupBy("component").agg(count(lit(1)).as("cluster_size"))
        .groupBy("cluster_size")
        .agg(count(lit(1)).as("n_clusters"),
          (col("cluster_size") * count(lit(1))).as("n_docs"))),
    // the kept rows themselves, for both dedup families
    "dedup_exact_survivors" -> ((s, dir) =>
      Dedup.exactSurvivors(docs(s, dir)).select("doc_id")),
    "dedup_neardup_survivors" -> ((s, dir) =>
      Dedup.nearDupSurvivors(docs(s, dir, floored = true),
        Dedup.ngramJaccardPairs(docs(s, dir, floored = true), 3, 0.5)).select("doc_id")),
    // benchmark decontamination: docs sharing a word trigram with the held-out
    // "benchmark" slice (doc_id % 50 == 0) are dropped from the corpus
    "dedup_decontam" -> ((s, dir) => {
      val d = docs(s, dir)
      Dedup.decontaminate(d.filter(col("doc_id") % 50 =!= 0),
        d.filter(col("doc_id") % 50 === 0), 3).select("doc_id")
    }),
    // the same decontamination through the Bloom-pre-filter scale path
    // (benchmark too big to broadcast): EXACT same survivors, same oracle
    "dedup_decontam_bloom" -> ((s, dir) => {
      val d = docs(s, dir)
      Dedup.decontaminateBloom(d.filter(col("doc_id") % 50 =!= 0),
        d.filter(col("doc_id") % 50 === 0), 3).select("doc_id")
    }),
    // corpus-level line dedup (C4/RefinedWeb boilerplate scrub): lines in > 3
    // distinct docs are removed everywhere. The testdata corpus is one line
    // per doc with no cross-doc repeats, so the query wraps each body in
    // deterministic boilerplate — a per-source banner (df = docs/source,
    // hot) and a global footer (df = all docs, hot) that must be dropped,
    // plus a doc_id%200 badge line (df ≤ 3 at sf0.01, kept) — exercising
    // both sides of the cap and order-preserving rebuild
    "dedup_lines" -> ((s, dir) =>
      Dedup.dedupLines(
        // source/text coalesced on BOTH sides: concat_ws skips NULL pieces
        // while the oracle's '||' would propagate them — a NULL testdata row
        // must not make the two sides diverge
        docs(s, dir).withColumn("text", concat_ws("\n",
          concat(lit("BANNER "), coalesce(col("source"), lit(""))),
          coalesce(col("text"), lit("")),
          concat(lit("badge "), (col("doc_id") % 200).cast("string")),
          lit("ALL RIGHTS RESERVED"))),
        maxDocFreq = 3)),
    // same scrub with keepEmptyLines=true: blank boilerplate separators
    // survive the rebuild verbatim (paragraph structure) while staying
    // invisible to the hot rule and both counts
    "dedup_lines_keepempty" -> ((s, dir) =>
      Dedup.dedupLines(
        docs(s, dir).withColumn("text", concat_ws("\n",
          concat(lit("BANNER "), coalesce(col("source"), lit(""))),
          lit(""),
          coalesce(col("text"), lit("")),
          concat(lit("badge "), (col("doc_id") % 200).cast("string")),
          lit(""),
          lit("ALL RIGHTS RESERVED"))),
        maxDocFreq = 3, keepEmptyLines = true)),
    // incremental ingestion dedup: "today's crawl" (all docs) minus the
    // fingerprints already in the accumulated corpus (doc_id%4 != 3) — the
    // genuinely new quarter survives
    "dedup_incremental" -> ((s, dir) => {
      val d = docs(s, dir)
      Dedup.incrementalNew(d, d.filter(col("doc_id") % 4 =!= 3))
        .select("doc_id")
    }),
    // fuzzy incremental: the "new crawl" quarter (doc_id%4 == 3) minus docs
    // NEAR-duplicating (LSH candidates, exact-Jaccard-verified ≥ 0.5) the
    // accumulated corpus — re-crawls that changed a word still dedup
    "dedup_incremental_fuzzy" -> ((s, dir) => {
      val d = docs(s, dir, floored = true)
      Dedup.incrementalNewFuzzy(d.filter(col("doc_id") % 4 === 3),
          d.filter(col("doc_id") % 4 =!= 3),
          n = 3, k = 128, bands = 32, threshold = 0.5)
        .select("doc_id")
    }),
    // graded contamination: per-doc fraction of distinct trigrams shared
    // with the benchmark slice (the overlap-ratio upgrade of dedup_decontam)
    "dedup_decontam_scores" -> ((s, dir) => {
      val d = docs(s, dir)
      Dedup.contaminationScores(d.filter(col("doc_id") % 50 =!= 0),
        d.filter(col("doc_id") % 50 === 0), 3)
    }),
    // per-benchmark-ITEM report: which eval item leaked into which doc, by
    // asymmetric containment |doc ∩ bench| / |bench| (Jaccard dilutes a
    // short eval question inside a long document; containment doesn't)
    "dedup_decontam_report" -> ((s, dir) => {
      val d = docs(s, dir)
      Dedup.contaminationReport(d.filter(col("doc_id") % 50 =!= 0),
          d.filter(col("doc_id") % 50 === 0), 3, minContainment = 0.05)
        .select(col("doc_id"), col("bench_id"), col("n_shared"),
          col("bench_shingles"), col("containment"))
    }),
    // leakage audit: near-dup pairs straddling the 80/10/10 split — the
    // documents that would leak eval text into training
    "audit_split_leakage" -> ((s, dir) =>
      Dedup.splitLeakage(docs(s, dir, floored = true),
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), 3, 0.5)),
    "dedup_embedding" -> ((s, dir) =>
      Dedup.embeddingPairs(emb(s, dir), 0.4)
        .select(col("id_a"), col("id_b"), round(col("cosine"), 4).as("cosine"))),
    // SemDeDup: same 0.4 cosine bar as dedup_embedding but pairs only form
    // within one of 8 IVF cells — the cluster-bucketed scale path (its output
    // is the subset of dedup_embedding's pairs that share a cell)
    "dedup_semantic" -> ((s, dir) =>
      Dedup.semanticPairs(emb(s, dir), threshold = 0.4, nLists = 8)
        .select(col("id_a"), col("id_b"), col("cell").cast("long").as("cell"),
          round(col("cosine"), 4).as("cosine"))),
    // the threshold TUNING TABLE over the same cell-bucketed candidates:
    // pair count + min-keeps drop lower bound per candidate cutoff — walk
    // loose→tight and pick the knee before committing a dedup threshold
    "dedup_threshold_sweep" -> ((s, dir) =>
      Dedup.semanticThresholdSweep(emb(s, dir),
        thresholds = Seq(0.25, 0.3, 0.35, 0.4, 0.45), nLists = 8)),
    // embedding-space decontamination: corpus vectors semantically close
    // (same SemDeDup cell, cosine ≥ 0.25) to the held-out bench slice are
    // dropped — catches paraphrases n-gram decontam can't see
    "dedup_decontam_sem" -> ((s, dir) => {
      val e = emb(s, dir)
      Dedup.semanticDecontaminate(e.filter(col("vec_id") % 50 =!= 0),
        e.filter(col("vec_id") % 50 === 0), threshold = 0.25, nLists = 8)
        .select("vec_id")
    }),
    // one representative per semantic cluster (SemDeDup's keep step):
    // pairs → connected components → drop non-minimal members
    "dedup_semantic_survivors" -> ((s, dir) =>
      Dedup.nearDupSurvivors(emb(s, dir),
        Dedup.semanticPairs(emb(s, dir), threshold = 0.4, nLists = 8),
        idCol = "vec_id").select("vec_id")),
    "sim_topk" -> ((s, dir) =>
      Similarity.bruteForceTopK(emb(s, dir).filter(col("vec_id") < 10), emb(s, dir), 5)
        .select(col("query_id"), col("neighbor_id"), col("rank").cast("long").as("rank"),
          round(col("cosine"), 4).as("cosine"))),
    // MARGIN-BASED BITEXT MINING (Artetxe & Schwenk 2019) — the
    // parallel-corpus miner of a multilingual pipeline: the two "language
    // sides" are the even/odd embedding halves, candidates are mutual
    // 4-NN, the margin ratio normalizes cosine by both neighborhoods, and
    // a pair ships only as BOTH endpoints' best margin above 1.0. The
    // oracle replays unit vectors, left-fold dots, rank-ordered
    // neighborhood folds, the fixed-order denominator and both argmax
    // selections — one transposed rank anywhere changes the mined set
    "sim_bitext_mine" -> ((s, dir) =>
      Similarity.bitextMine(
          emb(s, dir, floored = true).filter(col("vec_id") % 2 === 0),
          emb(s, dir, floored = true).filter(col("vec_id") % 2 === 1),
          k = 4, threshold = 1.0)
        .select(col("src_id"), col("tgt_id"),
          round(col("cosine"), 4).as("cosine"),
          round(col("margin"), 4).as("margin"))),
    // the SCALE path of the miner: both direction k-NNs via the IVF
    // cell-probe join (centroids hash-sampled from each corpus side),
    // the margin/mutual tail unchanged — the faiss/CCMatrix shape
    "sim_bitext_ivf" -> ((s, dir) =>
      Similarity.bitextMineIvf(
          emb(s, dir).filter(col("vec_id") % 2 === 0),
          emb(s, dir).filter(col("vec_id") % 2 === 1),
          k = 4, threshold = 1.0, nLists = 8, nProbe = 3)
        .select(col("src_id"), col("tgt_id"),
          round(col("cosine"), 4).as("cosine"),
          round(col("margin"), 4).as("margin"))),
    // SIM-MAP — graft extension: per-label centroid cosine map (corpus
    // cartography: which classes/sources overlap semantically) — exact
    // fixed-point component sums, fully distributed, group-sized output
    "emb_class_sim" -> ((s, dir) =>
      Similarity.groupCentroidSim(emb(s, dir), "label")
        .select(col("g_a"), col("g_b"), round(col("cosine"), 4).as("cosine"))),
    // SIM-B1 — graft extension: 1-bit binary-sign candidates (popcount
    // hamming over packed sign words) + exact-cosine rerank of the top 32
    // — the 512×-compression end of the quantization ladder
    "sim_topk_b1" -> ((s, dir) =>
      Similarity.binaryTopK(emb(s, dir).filter(col("vec_id") < 10), emb(s, dir),
          k = 5, rerank = 32)
        .select(col("query_id"), col("neighbor_id"), col("rank").cast("long").as("rank"),
          round(col("cosine"), 4).as("cosine"))),
    "sim_lsh_pairs" -> ((s, dir) =>
      Similarity.lshBucketedPairs(emb(s, dir, floored = true), threshold = 0.4, nPlanes = 6, tables = 8)
        .select(col("id_a"), col("id_b"), round(col("cosine"), 4).as("cosine"))),
    // cross-TABLE LSH join (fuzzy entity matching): even-id vectors matched
    // against odd-id vectors through shared hyperplane buckets
    "sim_lsh_join" -> ((s, dir) =>
      Similarity.lshJoin(emb(s, dir, floored = true).filter(col("vec_id") % 2 === 0),
          emb(s, dir, floored = true).filter(col("vec_id") % 2 === 1),
          threshold = 0.4, nPlanes = 6, tables = 8)
        .select(col("left_id"), col("right_id"),
          round(col("cosine"), 4).as("cosine"))),
    "sim_ivf_topk" -> ((s, dir) =>
      Similarity.ivfTopK(emb(s, dir).filter(col("vec_id") < 10), emb(s, dir),
          k = 5, nLists = 16, nProbe = 4)
        .select(col("query_id"), col("neighbor_id"), col("rank").cast("long").as("rank"),
          round(col("cosine"), 4).as("cosine"))),
    // int8 quantization, flattened to (vector, slot) rows so the driver's
    // scalar hasher can compare every quantized value and scale exactly
    "emb_quantize" -> ((s, dir) =>
      Similarity.quantize(emb(s, dir))
        .select(col("vec_id"), col("scale"), posexplode(col("qvec")))
        .select(col("vec_id"), col("pos").cast("long").as("pos"),
          col("col").as("q"), col("scale"))),
    // compressed-domain search (faiss SQ8-style): exact top-k over the
    // int8-quantized-then-dequantized corpus — the 4×-smaller memory
    // footprint ANN path, exercised end to end (quantize ∘ dequantize ∘
    // brute-force compose; recall loss is the quantization error only)
    "sim_topk_q8" -> ((s, dir) => {
      val dq = Similarity.dequantize(Similarity.quantize(emb(s, dir)))
      Similarity.bruteForceTopK(dq.filter(col("vec_id") < 10), dq, 5)
        .select(col("query_id"), col("neighbor_id"),
          col("rank").cast("long").as("rank"),
          round(col("cosine"), 4).as("cosine"))
    }),
    // TRUE compressed-domain search: integer dot products over the int8
    // slots (scales cancel for cosine) — no dequantize anywhere in the plan;
    // the 4×-memory AND integer-arithmetic SQ8 path
    "sim_topk_q8i" -> ((s, dir) => {
      val qz = Similarity.quantize(emb(s, dir))
      Similarity.quantizedTopK(qz.filter(col("vec_id") < 10), qz, 5)
        .select(col("query_id"), col("neighbor_id"),
          col("rank").cast("long").as("rank"),
          round(col("cosine"), 4).as("cosine"))
    }),
    // hard-negative mining: per query, top-5 most-similar vectors with a
    // DIFFERENT label (null-safe inequality) — contrastive training fuel
    "sim_hard_negatives" -> ((s, dir) =>
      Similarity.hardNegatives(emb(s, dir).filter(col("vec_id") < 10),
          emb(s, dir), 5)
        .select(col("query_id"), col("neighbor_id"),
          col("neg_label").cast("long").as("neg_label"),
          col("rank").cast("long").as("rank"),
          round(col("cosine"), 4).as("cosine"))),
    // the contrastive TRIPLET table: hardest in-label positive × top-3
    // hard negatives per anchor — what an embedding trainer consumes
    "train_triplets" -> ((s, dir) =>
      Similarity.contrastiveTriplets(emb(s, dir).filter(col("vec_id") < 10),
          emb(s, dir), negK = 3)
        .select(col("query_id"), col("positive_id"), col("negative_id"),
          col("neg_rank"), round(col("pos_cosine"), 4).as("pos_cosine"),
          round(col("neg_cosine"), 4).as("neg_cosine"))),
    // product-quantization ADC search (m=8 subspaces × ksub=16 sampled
    // codebook entries): candidates are scored by m table lookups — the
    // 64×-compression step beyond SQ8's 4× for billion-vector corpora
    "sim_topk_pq" -> ((s, dir) =>
      Similarity.pqTopK(emb(s, dir).filter(col("vec_id") < 10), emb(s, dir),
          k = 5, m = 8, ksub = 16)
        .select(col("query_id"), col("neighbor_id"),
          col("rank").cast("long").as("rank"),
          round(col("adc"), 4).as("adc"))),
    // Lloyd-refined PQ (faiss's per-subspace k-means training): same ADC
    // search as sim_topk_pq over codebooks refined by 2 exact fixed-point
    // Lloyd rounds — the oracle replays the training round-for-round
    "sim_topk_pq_kmeans" -> ((s, dir) =>
      Similarity.pqTopKWith(emb(s, dir).filter(col("vec_id") < 10),
          emb(s, dir), k = 5,
          Similarity.pqCodebooksKmeans(emb(s, dir), 8, 16, rounds = 2))
        .select(col("query_id"), col("neighbor_id"),
          col("rank").cast("long").as("rank"),
          round(col("adc"), 4).as("adc"))),
    // IVF-PQ: cells prune to nProbe/nLists of the corpus, PQ-ADC scores the
    // rest — the canonical billion-scale ANN composition end to end
    "sim_ivfpq_topk" -> ((s, dir) =>
      Similarity.ivfPqTopK(emb(s, dir).filter(col("vec_id") < 10), emb(s, dir),
          k = 5, nLists = 16, nProbe = 4, m = 8, ksub = 16)
        .select(col("query_id"), col("neighbor_id"),
          col("rank").cast("long").as("rank"),
          round(col("adc"), 4).as("adc"))),
    // residual IVF-PQ (full faiss semantics): codes quantize x − centroid,
    // ADC adds the ⟨q, centroid⟩ cell term — codebook resolution spent on
    // within-cell displacement
    "sim_ivfpq_res" -> ((s, dir) =>
      Similarity.ivfPqTopKResidual(emb(s, dir).filter(col("vec_id") < 10),
          emb(s, dir), k = 5, nLists = 16, nProbe = 4, m = 8, ksub = 16)
        .select(col("query_id"), col("neighbor_id"),
          col("rank").cast("long").as("rank"),
          round(col("adc"), 4).as("adc"))),
    "text_stats" -> ((s, dir) => TextAnalysis.analyze(docs(s, dir))),
    // Flesch reading-ease with deterministic counters (sentence runs,
    // vowel-group syllables) — the readability face of the quality family
    "text_flesch" -> ((s, dir) => TextAnalysis.fleschSignals(docs(s, dir))),
    "text_tokens" -> ((s, dir) =>
      docs(s, dir).select(col("doc_id"),
        TextAnalysis.tokenCount(col("text")).cast("long").as("n_ws"),
        TextAnalysis.bpeishTokenCount(col("text")).cast("long").as("n_bpeish"))),
    "text_rollhash" -> ((s, dir) =>
      docs(s, dir).select(col("doc_id"),
        size(TextAnalysis.rollingFingerprints(col("text"), 32, 4)).cast("long")
          .as("n_cutpoints"))),
    "text_chunks" -> ((s, dir) =>
      TextAnalysis.chunkByContent(docs(s, dir), window = 16, maskBits = 5)
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_chunks"), sum(length(col("chunk"))).as("total_len"))),
    "text_langid" -> ((s, dir) => TextAnalysis.langIdByJoin(docs(s, dir))),
    // CHAR-TRIGRAM language id (the CLD/fastText-style profile tier):
    // fixed integer trigram weights, exact long scores, (−score, lang)
    // argmax — separates pt/es where stopword lists cannot
    "text_langid_ngram" -> ((s, dir) =>
      TextAnalysis.langIdNgram(docsLang(s, dir))),
    // where the two tiers DISAGREE on the same corpus (the pt fixture docs
    // read "en" to the stopword tier — their only stopword hit is "a")
    "text_langid_ngram_diff" -> ((s, dir) => {
      val dl = docsLang(s, dir)
      val stop = TextAnalysis.langIdByJoin(dl)
        .withColumnRenamed("lang_pred", "lang_stop")
      val ng = TextAnalysis.langIdNgram(dl)
        .select(col("doc_id"), col("lang_pred").as("lang_ngram"))
      stop.join(ng, "doc_id")
        .filter(col("lang_stop") =!= col("lang_ngram"))
    }),
    // code-switching detector: per-LINE language votes rolled up to
    // majority language + minority-line fraction per document
    "text_langid_lines" -> ((s, dir) =>
      TextAnalysis.langMixByLine(docs(s, dir))),
    // WITHIN-doc repeated-line removal over a planted-repeat construction
    // (every doc carries a nav block twice); corpus df capping never sees
    // these — df counts documents, not repeats inside one
    "text_dedup_lines_intra" -> ((s, dir) =>
      TextAnalysis.dedupLinesWithin(
        docs(s, dir).withColumn("text",
          concat(lit("NAV HOME\n"), col("text"),
            lit("\nNAV HOME\nmid\nNAV HOME"))))),
    // token-budget chunking: 64-token windows, 16-token overlap; md5 keeps
    // the compared payload small while pinning every chunk boundary
    "text_chunk_tokens" -> ((s, dir) =>
      TextAnalysis.chunkByTokens(docs(s, dir), 64, 16)
        .select(col("doc_id"), col("chunk_id"),
          md5(col("chunk_text")).as("chunk_md5"),
          length(col("chunk_text")).cast("long").as("chunk_len"))),
    // corpus statistics: top-20 bigrams by document frequency
    "text_topngrams" -> ((s, dir) => TextAnalysis.topNgrams(docs(s, dir), 2, 20)),
    // Unicode ingest normalization (NFC + control/zero-width scrub): the
    // ASCII corpus is decorated with a combining-acute café, an ANGSTROM
    // SIGN (NFC → Å), a ZWSP, a BOM and a BEL so both transformations do
    // real work on every row (same decorate-the-fixture pattern as
    // dedup_lines / text_urls)
    "text_normalize" -> ((s, dir) => {
      val decorated = docs(s, dir).withColumn("text", concat(
        lit("Cafe\u0301 \u212B "), // e + COMBINING ACUTE; ANGSTROM SIGN
        coalesce(col("text"), lit("")),
        lit(" \u200Bzero\uFEFFwidth \u0007bell"))) // ZWSP, BOM, BEL
      val norm = graft.functions.TextExpressions.normalizeText(col("text"))
      decorated.select(col("doc_id"),
        md5(norm).as("norm_md5"),
        length(norm).cast("long").as("n_norm"),
        length(col("text")).cast("long").as("n_raw"))
    }),
    "text_pii" -> ((s, dir) => TextAnalysis.piiCounts(docs(s, dir))),
    // fill-in-the-middle: hash-gated docs re-serialized PSM
    // (<fim_prefix> P <fim_suffix> S <fim_middle> M), the rest verbatim
    "text_fim" -> ((s, dir) => TextAnalysis.fimTransform(docs(s, dir))),
    // T5-style span corruption (native walk; the registry's denoising
    // (inputs, targets) pair fixture) — hash-gated span starts, merged
    // intervals, one sentinel per maximal run
    "text_span_corrupt" -> ((s, dir) =>
      TextAnalysis.spanCorruptFast(docs(s, dir))),
    // checksum-validated card audit over the corpus + planted fixtures:
    // the Luhn gate keeps test Visa/MC/Amex numbers and rejects the same
    // digit mass with a wrong check digit
    "text_cc_audit" -> ((s, dir) => TextAnalysis.ccAudit(docsCc(s, dir))),
    // CCNet-style LM scoring: bigram LM self-fit on the corpus (minCount=5),
    // each doc scored by mean add-one-smoothed negative log-likelihood
    "text_lm_nll" -> ((s, dir) => {
      val d = docs(s, dir)
      TextAnalysis.lmScores(d, d, minCount = 5)
        .select(col("doc_id"), col("n_bigrams"),
          safeRound4(col("mean_nll")).as("mean_nll"))
    }),
    // URL extraction over the synthetic-URL fixture: one row per URL with
    // its position and lower-cased domain
    // c-TF-IDF signature terms per language: the cluster-labeling step
    // (top-10 terms per label on the stable grid, ties to the term)
    "text_ctfidf" -> ((s, dir) =>
      TextAnalysis.classTfidf(docs(s, dir), k = 10)),
    // single-pass Aho–Corasick blocklist audit: per-doc occurrence counts
    // for every pattern with ≥ 1 hit (overlaps counted — the fixture's
    // "table table" / "big query"+"query big" pairs exercise them)
    "text_blocklist" -> ((s, dir) =>
      TextAnalysis.blocklistHits(docs(s, dir), BlocklistPats)),
    // the survivors gate: docs with zero blocklist occurrences
    "text_blocklist_clean" -> ((s, dir) =>
      TextAnalysis.blocklistSurvivors(docs(s, dir), BlocklistPats)),
    "text_urls" -> ((s, dir) =>
      urlDocs(s, dir)
        .select(col("doc_id"),
          posexplode(TextAnalysis.urls(col("text"))).as(Seq("pos", "url")))
        .select(col("doc_id"), col("pos").cast("long").as("pos"), col("url"),
          TextAnalysis.urlDomain(col("url")).as("domain"))),
    // URL-canonicalization dedup (the FineWeb/CC web-crawl key): lowercase
    // scheme+host, strip fragment + tracking params (real params survive),
    // drop the trailing slash, then exact-group by the canonical string —
    // the planted case/slash/utm/fragment variants collapse per
    // (source, path) group or the hash gate fails
    "dedup_url" -> ((s, dir) => Dedup.dedupUrl(urlDupDocs(s, dir))),
    // C4/RefinedWeb-style URL-blocklist filter: drops doc_id%5 ∈ {0,1}
    // (exact + subdomain-suffix matches; example.org never matches)
    "text_domain_filter" -> ((s, dir) =>
      TextAnalysis.dropBlockedDomains(urlDocs(s, dir), UrlBlocklist)
        .select("doc_id")),
    // C4 line+doc cleaning over the synthetic multi-line page fixture: the
    // JS and Menu lines always drop, keep_doc flips on the {-code and
    // lorem-ipsum docs and on pages with < 5 surviving lines
    "text_c4_clean" -> ((s, dir) =>
      TextAnalysis.c4Clean(c4Docs(s, dir), minWordsPerLine = 3, minKeptLines = 5)),
    // per-doc top-5 keywords by smoothed tf-idf (corpus df over all docs)
    "text_tfidf" -> ((s, dir) =>
      TextAnalysis.tfidfTopK(docs(s, dir), 5)
        .select(col("doc_id"), col("rank"), col("tok"), col("tf"), col("df"),
          safeRound4(col("tfidf")).as("tfidf"))),
    // T-AUG — graft extension: deterministic word-dropout augmentation
    // (10% positional-hash dropout) — a reproducible, re-derivable
    // augmented corpus, computed as a pure narrow map (no explode/shuffle)
    "text_augment" -> ((s, dir) =>
      TextAnalysis.wordDropout(docs(s, dir), dropPct = 10)),
    // token-distribution quality signals: Shannon entropy + type-token
    // ratio (low entropy = repetitive/template text)
    "text_entropy" -> ((s, dir) =>
      TextAnalysis.tokenEntropy(docs(s, dir))
        .select(col("doc_id"), col("n_tokens"), col("n_types"),
          safeRound4(col("ttr")).as("ttr"), safeRound4(col("entropy")).as("entropy"))),
    // Okapi BM25 over a fixed 4-term query (mixed-df terms); rounding
    // absorbs the order-dependent double sum's last ulps
    "text_bm25" -> ((s, dir) =>
      TextAnalysis.bm25(docs(s, dir), Seq("hash", "join", "shuffle", "broadcast"))
        .select(col("doc_id"), col("n_hits"), safeRound4(col("score")).as("score"))),
    // REAL subword tokenization (WordPiece-style greedy longest-match over
    // a corpus-learned 256-piece substring vocab, pieces ≤ 4 codepoints,
    // OOV 99999) — every (doc, position, token_id) compared exactly against
    // the mirror's recursive-CTE replay of the same greedy walk
    "text_bpe" -> ((s, dir) => {
      val vocab = TextAnalysis.learnSubwordVocab(docs(s, dir, floored = true), 256, 4)
      docs(s, dir, floored = true).select(col("doc_id"),
          posexplode(SubwordExpressions.subwordIds(col("text"), vocab, 99999L, 4)))
        .select(col("doc_id"), col("pos").cast("long").as("pos"),
          col("col").as("token_id"))
    }),
    // BPE merge LEARNING (Sennrich 2016 alg. 1) — the merge table a BPE
    // tokenizer ships, learned on the distinct-word relation; every round's
    // argmax and count compared exactly against the mirror's chained replay
    "text_bpe_merges" -> ((s, dir) =>
      TextAnalysis.bpeLearnMerges(docsMulti(s, dir), 12)),
    // the batched (multi-merge-per-round) learner — the R/k job-count lever
    // of the production recipe: 3 rounds × up to 4 dominance-filtered
    // non-conflicting merges; the oracle replays ranking, dominance filter,
    // cap and the commuting batched application exactly
    "text_bpe_merges_batched" -> ((s, dir) =>
      TextAnalysis.bpeLearnMergesBatched(docsMulti(s, dir),
        batchRounds = 3, batchK = 4)),
    // the learned tokenizer APPLIED: per-doc piece counts under the
    // 12-merge table learned from the corpus itself (12-row driver collect,
    // then one narrow explode + chained-replace pass)
    "text_bpe_apply" -> ((s, dir) => {
      val d = docsMulti(s, dir, floored = true)
      val merges = TextAnalysis.bpeLearnMerges(d, 12)
        .orderBy("rank").collect()
        .map(r => (r.getString(1), r.getString(2))).toSeq
      TextAnalysis.bpeEncodedCounts(d, merges)
    }),
    // the packer driven by the LEARNED tokenizer's counts — learn → apply →
    // pack, end to end (budget 512 pieces, 8 shards)
    "sample_pack_learned" -> ((s, dir) => {
      val d = docsMulti(s, dir)
      val merges = TextAnalysis.bpeLearnMerges(d, 12)
        .orderBy("rank").collect()
        .map(r => (r.getString(1), r.getString(2))).toSeq
      Sampling.packSequences(d, "doc_id",
          SubwordExpressions.bpeCountPieces(col("text"), merges), 512L, 8)
        .select("doc_id", "shard", "seq_id", "tok_offset")
    }),
    // the NATIVE zero-shuffle apply path behind the SAME oracle — the
    // sequential-merge scalar expression must reproduce the chained-replace
    // spec row for row
    "text_bpe_apply_fast" -> ((s, dir) => {
      val d = docsMulti(s, dir)
      val merges = TextAnalysis.bpeLearnMerges(d, 12)
        .orderBy("rank").collect()
        .map(r => (r.getString(1), r.getString(2))).toSeq
      TextAnalysis.bpeEncodedCountsFast(d, merges)
    }),
    // BYTE-LEVEL BPE merge learning (the GPT-2/tiktoken production family):
    // same loop, starting symbols are UTF-8 BYTES as fixed-width hex and
    // EVERY token participates (digits/punct/code) — no gate, no OOV
    "text_bbpe_merges" -> ((s, dir) =>
      TextAnalysis.bbpeLearnMerges(docsMulti(s, dir), 12)),
    // the byte-level compression curve: total_pieces starts at the
    // corpus's UTF-8 byte budget and walks down as merges land
    "text_bbpe_curve" -> ((s, dir) =>
      TextAnalysis.bbpeLearnCurve(docsMulti(s, dir), 10)),
    // the DISTRIBUTED byte-level learn sibling (vocabularies beyond driver
    // memory): row-identical to the driver-local loop, gated against the
    // SAME oracle
    "text_bbpe_merges_dist" -> ((s, dir) =>
      TextAnalysis.bbpeLearnMergesDistributed(docsMulti(s, dir), 12)),
    // the batched byte-level learner: dominance-filtered multi-merge
    // rounds over hex-byte symbols — the R/k job-count lever at R ≈ 50k
    "text_bbpe_merges_batched" -> ((s, dir) =>
      TextAnalysis.bbpeLearnMergesBatched(docsMulti(s, dir),
        batchRounds = 3, batchK = 4)),
    // the learned byte-level table APPLIED: per-doc token and piece counts;
    // an unmerged token costs its UTF-8 byte count
    "text_bbpe_apply" -> ((s, dir) => {
      val d = docsMulti(s, dir)
      val merges = TextAnalysis.bbpeLearnMerges(d, 12)
        .orderBy("rank").collect()
        .map(r => (r.getString(1), r.getString(2))).toSeq
      TextAnalysis.bbpeEncodedCounts(d, merges)
    }),
    // the NATIVE zero-shuffle byte-level apply behind the SAME oracle
    "text_bbpe_apply_fast" -> ((s, dir) => {
      val d = docsMulti(s, dir)
      val merges = TextAnalysis.bbpeLearnMerges(d, 12)
        .orderBy("rank").collect()
        .map(r => (r.getString(1), r.getString(2))).toSeq
      TextAnalysis.bbpeEncodedCountsFast(d, merges)
    }),
    // byte-level token-id export: merge ranks then the FIXED 256-byte
    // alphabet — stable ids on ANY corpus (no learned char vocab), and no
    // OOV sentinel exists by construction
    "text_bbpe_ids" -> ((s, dir) => {
      val d = docsMulti(s, dir, floored = true)
      val merges = TextAnalysis.bbpeLearnMerges(d, 12)
        .orderBy("rank").collect()
        .map(r => (r.getString(1), r.getString(2))).toSeq
      TextAnalysis.bbpeTokenIds(d, merges)
    }),
    // byte-level BPE under the GPT-2 REGEX PRETOKENIZER (the tiktoken
    // vocabulary shape): merges never cross a pretoken boundary,
    // space-prefixed words (" the") learn as single units, contractions
    // split, digit runs isolate — on the contraction/whitespace-decorated
    // corpus where a space-prefixed merge provably wins a round
    "text_bbpe_merges_gpt2" -> ((s, dir) =>
      TextAnalysis.bbpeLearnMergesGpt2(docsGpt2(s, dir), 12)),
    // the GPT-2-pretokenized table APPLIED: per-doc pretoken and piece
    // counts (whitespace-run pretokens count like any other byte sequence)
    "text_bbpe_apply_gpt2" -> ((s, dir) => {
      val d = docsGpt2(s, dir)
      val merges = TextAnalysis.bbpeLearnMergesGpt2(d, 12)
        .orderBy("rank").collect()
        .map(r => (r.getString(1), r.getString(2))).toSeq
      TextAnalysis.bbpeEncodedCounts(d, merges, gpt2 = true)
    }),
    // GPT-2-pretokenized token-id export: space-prefixed pieces carry
    // their own ids (the Ġ convention), dense position per document
    "text_bbpe_ids_gpt2" -> ((s, dir) => {
      val d = docsGpt2(s, dir, floored = true)
      val merges = TextAnalysis.bbpeLearnMergesGpt2(d, 12)
        .orderBy("rank").collect()
        .map(r => (r.getString(1), r.getString(2))).toSeq
      TextAnalysis.bbpeTokenIds(d, merges, gpt2 = true)
    }),
    // learn → apply → pack end to end on the byte-level counts
    "sample_pack_bbpe" -> ((s, dir) => {
      val d = docsMulti(s, dir)
      val merges = TextAnalysis.bbpeLearnMerges(d, 12)
        .orderBy("rank").collect()
        .map(r => (r.getString(1), r.getString(2))).toSeq
      Sampling.packSequences(d, "doc_id",
          SubwordExpressions.bbpeCountPieces(col("text"), merges), 512L, 8)
        .select("doc_id", "shard", "seq_id", "tok_offset")
    }),
    // WORDPIECE merge learning (the BERT tokenizer family): same loop as
    // BPE, winner maximizes count(ab)/(count(a)·count(b)) — rare-but-
    // cohesive pairs beat merely frequent ones; 10 likelihood-scored rounds
    "text_wordpiece_merges" -> ((s, dir) =>
      TextAnalysis.wordpieceLearnMerges(docsMulti(s, dir), 10)),
    // the batched WordPiece sibling of text_bpe_merges_batched: identical
    // dominance machinery, likelihood-scored ranking
    "text_wordpiece_merges_batched" -> ((s, dir) =>
      TextAnalysis.wordpieceLearnMergesBatched(docsMulti(s, dir),
        batchRounds = 3, batchK = 4)),
    // the learned WordPiece table APPLIED via the same chained-replace
    // encoder as BPE (10-row driver collect, one narrow pass)
    "text_wordpiece_apply" -> ((s, dir) => {
      val d = docsMulti(s, dir)
      val merges = TextAnalysis.wordpieceLearnMerges(d, 10)
        .orderBy("rank").collect()
        .map(r => (r.getString(1), r.getString(2))).toSeq
      TextAnalysis.bpeEncodedCounts(d, merges)
    }),
    // the NATIVE zero-shuffle WordPiece apply behind the SAME oracle —
    // the bpe_apply_fast contract for the likelihood-scored table
    "text_wordpiece_apply_fast" -> ((s, dir) => {
      val d = docsMulti(s, dir)
      val merges = TextAnalysis.wordpieceLearnMerges(d, 10)
        .orderBy("rank").collect()
        .map(r => (r.getString(1), r.getString(2))).toSeq
      TextAnalysis.bpeEncodedCountsFast(d, merges)
    }),
    // UNIGRAM-LM tokenizer LEARNING (Kudo 2018, SentencePiece family;
    // Viterbi-EM) — the piece-probability table the other modern tokenizer
    // family ships: substring seeding, 2 EM rounds of fixed-point Viterbi
    // segmentation + count re-estimation, single-char coverage floor. The
    // oracle replays seed, both EM rounds, the shift-square log₂, and the
    // final cost table exactly
    "text_unigram_pieces" -> ((s, dir) => {
      import s.implicits._
      val vocab = TextAnalysis.unigramLearn(docsMulti(s, dir), rounds = 2, seedSize = 120)
      val cost = graft.functions.UnigramExpressions.costs(vocab.toMap, 6)
      vocab.zipWithIndex.map { case ((p, c), i) => (i + 1L, p, c, cost(p)) }
        .toDF("rank", "piece", "count", "cost_fp")
    }),
    // the learned unigram vocab APPLIED: per-doc token and Viterbi piece
    // counts via the native zero-shuffle expression (the bpe_apply_fast
    // plan shape); the oracle replays the same DP with the same quantized
    // costs, so a single mis-segmented word anywhere fails the gate
    "text_unigram_apply" -> ((s, dir) => {
      val d = docsMulti(s, dir)
      val vocab = TextAnalysis.unigramLearn(d, rounds = 2, seedSize = 120)
      val cost = graft.functions.UnigramExpressions.costs(vocab.toMap, 6)
      TextAnalysis.unigramEncodedCounts(d, cost)
    }),
    // the trainer-facing TOKEN-ID EXPORT under the learned unigram
    // tokenizer: every document's Viterbi piece sequence as (doc_id, pos,
    // piece_id) rows — piece ids are the learned vocab's (count DESC,
    // piece ASC) ranks (0-based), out-of-scope tokens emit the 99999 OOV
    // id, positions are the dense (token, piece) order. The oracle replays
    // segmentation AND the rank assignment, so one transposed id anywhere
    // fails the gate
    "text_unigram_ids" -> ((s, dir) => {
      val d = docsMulti(s, dir, floored = true)
      val vocab = TextAnalysis.unigramLearn(d, rounds = 2, seedSize = 120)
      val cost = graft.functions.UnigramExpressions.costs(vocab.toMap, 6)
      val rankOf = vocab.zipWithIndex
        .map { case ((p, _), i) => p -> i.toLong }.toMap
      val toks = d.select(col("doc_id"),
          posexplode(TextAnalysis.tokens(col("text"))).as(Seq("tpos", "w")))
        .filter(length(col("w")) > 0)
        .withColumn("nw", graft.functions.TextExpressions
          .normalizeText(col("w")))
      val isw = TextAnalysis.isWordForm(col("nw"), maxLen = 16)
      val pieces = toks.select(col("doc_id"), col("tpos"),
          posexplode(
            when(isw,
              graft.functions.UnigramExpressions.segment(col("nw"), cost, 4))
              .otherwise(array(col("nw")))).as(Seq("ppos", "piece")),
          col("nw"))
      pieces.select(col("doc_id"),
          (row_number().over(org.apache.spark.sql.expressions.Window
            .partitionBy("doc_id").orderBy(col("tpos"), col("ppos"))) - 1)
            .cast("long").as("pos"),
          when(isw,
            coalesce(element_at(typedLit(rankOf), col("piece")), lit(99999L)))
            .otherwise(lit(99999L)).as("piece_id"))
    }),
    // the trainer-facing TOKEN-ID EXPORT under the learned BPE tokenizer —
    // the text_unigram_ids twin for the first tokenizer family: merge ids
    // by rank, then the learn corpus' characters in code-point order,
    // 99999 OOV for everything else; the oracle replays the merge replay,
    // the char vocabulary AND the id assignment
    // the packer on the WordPiece table — learn → apply → pack for the
    // third tokenizer family (budget 512 pieces, 8 shards)
    "sample_pack_wordpiece" -> ((s, dir) => {
      val d = docsMulti(s, dir)
      val merges = TextAnalysis.wordpieceLearnMerges(d, 10)
        .orderBy("rank").collect()
        .map(r => (r.getString(1), r.getString(2))).toSeq
      Sampling.packSequences(d, "doc_id",
          SubwordExpressions.bpeCountPieces(col("text"), merges), 512L, 8)
        .select("doc_id", "shard", "seq_id", "tok_offset")
    }),
    // the WordPiece twin of text_bpe_ids — same encoder, the
    // likelihood-scored 10-merge table, same id contract
    "text_wordpiece_ids" -> ((s, dir) => {
      val d = docsMulti(s, dir)
      val merges = TextAnalysis.wordpieceLearnMerges(d, 10)
        .orderBy("rank").collect()
        .map(r => (r.getString(1), r.getString(2))).toSeq
      TextAnalysis.bpeTokenIds(d, merges)
    }),
    "text_bpe_ids" -> ((s, dir) => {
      val d = docsMulti(s, dir)
      val merges = TextAnalysis.bpeLearnMerges(d, 12)
        .orderBy("rank").collect()
        .map(r => (r.getString(1), r.getString(2))).toSeq
      TextAnalysis.bpeTokenIds(d, merges)
    }),
    // ASTRAL SUBWORD PROOFS — the round-15 lift made the word-form gate
    // code-point based on every engine; these four pin it END TO END on a
    // fixture corpus where astral pairs WIN merge rounds (the (𐐷,𐐷) pair
    // outweighs every BMP pair): merge learning with astral winners, the
    // native fast apply's code-point symbolization, the unigram Viterbi's
    // code-point DP, and the token-id export's astral char vocabulary in
    // code-point order. Fixture-only corpus (no parquet scan) — the proofs
    // pin cross-engine exactness; scale shape is the non-astral siblings'.
    // the COMPRESSION CURVE of the same learn: merge table + corpus piece
    // total after every round — the vocabulary-size selection tool (steep
    // drops = high-value merges, the plateau = stop growing the vocab)
    "text_bpe_curve" -> ((s, dir) =>
      TextAnalysis.bpeLearnCurve(docsMulti(s, dir), 12)),
    "text_wordpiece_curve" -> ((s, dir) =>
      TextAnalysis.wordpieceLearnCurve(docsMulti(s, dir), 10)),
    "text_bpe_merges_astral" -> ((s, dir) =>
      TextAnalysis.bpeLearnMerges(docsAstralSmall(s), 8)),
    "text_bpe_apply_fast_astral" -> ((s, dir) => {
      val d = docsAstralSmall(s)
      val merges = TextAnalysis.bpeLearnMerges(d, 8)
        .orderBy("rank").collect()
        .map(r => (r.getString(1), r.getString(2))).toSeq
      TextAnalysis.bpeEncodedCountsFast(d, merges)
    }),
    "text_unigram_apply_astral" -> ((s, dir) => {
      val d = docsAstralSmall(s)
      val vocab = TextAnalysis.unigramLearn(d, rounds = 2, seedSize = 120)
      val cost = graft.functions.UnigramExpressions.costs(vocab.toMap, 6)
      TextAnalysis.unigramEncodedCounts(d, cost)
    }),
    "text_bpe_ids_astral" -> ((s, dir) => {
      val d = docsAstralSmall(s)
      val merges = TextAnalysis.bpeLearnMerges(d, 8)
        .orderBy("rank").collect()
        .map(r => (r.getString(1), r.getString(2))).toSeq
      TextAnalysis.bpeTokenIds(d, merges)
    }),
    // the packer driven by the LEARNED unigram tokenizer's counts — learn →
    // Viterbi apply → pack end to end, the sample_pack_learned loop for the
    // second tokenizer family (budget 512 pieces, 8 shards)
    "sample_pack_unigram" -> ((s, dir) => {
      val d = docsMulti(s, dir, floored = true)
      val vocab = TextAnalysis.unigramLearn(d, rounds = 2, seedSize = 120)
      val cost = graft.functions.UnigramExpressions.costs(vocab.toMap, 6)
      Sampling.packSequences(d, "doc_id",
          graft.functions.UnigramExpressions.countPieces(col("text"), cost, 4),
          512L, 8)
        .select("doc_id", "shard", "seq_id", "tok_offset")
    }),
    // the packing/budget path driven by REAL subword counts instead of the
    // whitespace proxy — same pack-and-split recurrence as sample_pack,
    // n = greedy-encoded piece count per document
    "sample_pack_bpe" -> ((s, dir) => {
      val vocab = TextAnalysis.learnSubwordVocab(docs(s, dir, floored = true), 256, 4)
      Sampling.packSequences(docs(s, dir, floored = true), "doc_id",
          size(SubwordExpressions.subwordIds(col("text"), vocab, 99999L, 4))
            .cast("long"), 512L, 8)
        .select("doc_id", "shard", "seq_id", "tok_offset")
    }),
    // HTML → text extraction over a deterministically synthesized page
    // (script/style payloads, comments, attributes, entities, word-gluing
    // tags) — step zero of a web-corpus pipeline, pure narrow map
    "text_html_strip" -> ((s, dir) => {
      val html = concat(
        lit("<html><!-- c --><head><script type='t'>var a = '<p>';" +
          "</script><style>p { color: red }</style></head><body>" +
          "<h1>Title</h1><p>"),
        col("text"),
        lit("</p><br/><td>cell</td><div class=\"x\">&amp;amp; &lt;b&gt; " +
          "it&#39;s</div></body></html>"))
      docs(s, dir)
        .select(col("doc_id"), TextAnalysis.stripHtml(html).as("clean"))
        .select(col("doc_id"), md5(col("clean")).as("clean_md5"),
          TextAnalysis.tokenCount(col("clean")).cast("long").as("n_tokens"))
    }),
    // cross-doc dedup at CDC-CHUNK granularity (planted whole-doc copies:
    // doc%7==3 takes its predecessor's text, so every chunk of a copy is a
    // dup) — the incremental-crawl signal "how much of this page's content
    // already exists", at sub-document resolution
    "dedup_cdc_chunks" -> ((s, dir) => {
      val d0 = docs(s, dir)
      val prev = d0.select((col("doc_id") + 1).as("doc_id"),
        col("text").as("prev_text"))
      val d = d0.join(prev, Seq("doc_id"), "left")
        .select(col("doc_id"),
          when(col("doc_id") % 7 === 3, coalesce(col("prev_text"), col("text")))
            .otherwise(col("text")).as("text"))
      val ch = TextAnalysis.chunkByContent(d, 16, 5)
        .select(col("doc_id"), col("chunk_idx"), md5(col("chunk")).as("ch"))
      val w = org.apache.spark.sql.expressions.Window.partitionBy("ch")
        .orderBy(col("doc_id").asc, col("chunk_idx").asc)
      ch.withColumn("rn", row_number().over(w))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_chunks"),
          sum(when(col("rn") > 1, 1L).otherwise(0L)).as("n_dup_chunks"))
    }),
    // PARAGRAPH-level decontamination attribution: hosts are doubled own
    // text (doc-level overlap dilutes toward ~1/3 even for a full planted
    // quote — and arbitrarily lower for longer hosts), doc_id % 13 == 5
    // hosts embed their bucket's benchmark item verbatim mid-document; the
    // CDC-chunked span report catches the quoted paragraph at overlap ≈ 1
    // regardless of host length. Oracle replays chunking, shingling and
    // scoring exactly
    "report_contam_spans" -> ((s, dir) => {
      val d = docs(s, dir, floored = true)
      val bench = d.filter(col("doc_id") % 50 === 0).select("doc_id", "text")
      val host = d.filter(col("doc_id") % 50 =!= 0)
        .join(bench.select(col("doc_id").as("bid"), col("text").as("btext")),
          col("doc_id") - col("doc_id") % 50 === col("bid"), "left")
        .select(col("doc_id"),
          when(col("doc_id") % 13 === 5 && col("btext").isNotNull,
            concat_ws(" ", col("text"), col("btext"), col("text")))
            .otherwise(concat_ws(" ", col("text"), col("text"))).as("text"))
      Dedup.contaminationSpans(host, bench, 3, 16, 5, 0.5)
        .select(col("doc_id"), col("chunk_idx").cast("long").as("chunk_idx"),
          col("bench_id"), col("n_shared"), col("chunk_shingles"), col("overlap"))
    }),
    // the ACTIONABLE half: cut the contaminated spans out and KEEP the
    // document — where whole-doc decontamination throws away a long page
    // for one quoted paragraph, this excises the quoted chunks and rebuilds
    // the text (chunks partition the text, so the rebuild is exact); every
    // corpus doc comes back with its kept/removed chunk accounting
    "dedup_decontam_spans" -> ((s, dir) => {
      val d = docs(s, dir, floored = true)
      val bench = d.filter(col("doc_id") % 50 === 0).select("doc_id", "text")
      val host = d.filter(col("doc_id") % 50 =!= 0)
        .join(bench.select(col("doc_id").as("bid"), col("text").as("btext")),
          col("doc_id") - col("doc_id") % 50 === col("bid"), "left")
        .select(col("doc_id"),
          when(col("doc_id") % 13 === 5 && col("btext").isNotNull,
            concat_ws(" ", col("text"), col("btext"), col("text")))
            .otherwise(concat_ws(" ", col("text"), col("text"))).as("text"))
      Dedup.decontaminateSpans(host, bench, 3, 16, 5, 0.5)
    }),
    // exact-substring duplication signal: fraction of tokens covered by
    // cross-doc duplicated 5-gram spans (boilerplate-tail fixture)
    "text_dup_spans" -> ((s, dir) =>
      TextAnalysis.dupSpanStats(spanDocs(s, dir, floored = true), 5)),
    // the CUT half over the same fixture: duplicated spans removed, text
    // rebuilt from the surviving tokens (canonical lower-cased rejoin)
    "text_dedup_spans" -> ((s, dir) =>
      TextAnalysis.removeDupSpans(spanDocs(s, dir, floored = true), 5)),
    // cluster-aware leakage-safe split: every near-dup cluster is assigned
    // atomically (the prevention counterpart of audit_split_leakage, same
    // pair source); unpaired docs reproduce sample_split exactly
    "sample_split_safe" -> ((s, dir) =>
      Dedup.leakageSafeSplit(docs(s, dir, floored = true),
        Dedup.ngramJaccardPairs(docs(s, dir, floored = true), 3, 0.5),
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
        .select("doc_id", "split")),
    // Gopher-style repetition signals; sentence boundaries become line breaks
    // so the duplicate-line fractions see multi-line documents
    "text_repetition" -> ((s, dir) =>
      TextAnalysis.repetitionSignals(
        docs(s, dir).withColumn("text",
          regexp_replace(col("text"), "\\. ", ".\n")))),
    // the end-to-end quality FILTER over the same signals (default thresholds
    // drop ~9% of sf0.01 docs — a real split, not a no-op)
    "text_quality_filter" -> ((s, dir) =>
      TextAnalysis.qualityFilter(
        docs(s, dir).withColumn("text",
          regexp_replace(col("text"), "\\. ", ".\n")))
        .select("doc_id")),
    // corpus-learned quality cutoff: drop the worst quartile, threshold
    // measured on a deterministic half-corpus hash-sample
    "text_quality_cutoff" -> ((s, dir) =>
      TextAnalysis.qualityQuantileFilter(docs(s, dir), q = 0.25, sampleRate = 0.5)
        .select("doc_id")),
    // stratified: each source learns its OWN 25th-percentile cutoff, so one
    // clean source can't crowd out a noisier-but-wanted one
    "text_quality_cutoff_by" -> ((s, dir) =>
      TextAnalysis.qualityQuantileFilterBy(docs(s, dir), q = 0.25,
        groupCol = "source", sampleRate = 0.5).select("doc_id")),
    "sample_bernoulli" -> ((s, dir) =>
      Sampling.sampleByHash(docs(s, dir), "doc_id", 0.25).select("doc_id")),
    "sample_split" -> ((s, dir) =>
      Sampling.split(docs(s, dir), "doc_id",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)).select("doc_id", "split")),
    "sample_quota" -> ((s, dir) =>
      Sampling.quotaPerKey(docs(s, dir), "source", "doc_id", 5)
        .select("doc_id", "source")),
    // stratified source rebalance: keep all of src0, half of src1, none of
    // the unlisted sources
    "sample_stratified" -> ((s, dir) =>
      Sampling.stratifiedSample(docs(s, dir), "source",
        Map("src0" -> 1.0, "src1" -> 0.5), "doc_id").select("doc_id", "source")),
    // pack-and-split sequence packing: 512-token budget, 8 hash shards
    "sample_pack" -> ((s, dir) =>
      Sampling.packSequences(docs(s, dir), "doc_id",
          TextAnalysis.tokenCount(col("text")), 512L, 8)
        .select("doc_id", "shard", "seq_id", "tok_offset")),
    // the terminal export step: packed sequences materialized as text
    "sample_pack_seqs" -> ((s, dir) =>
      Sampling.materializeSequences(
        Sampling.packSequences(docs(s, dir), "doc_id",
          TextAnalysis.tokenCount(col("text")), 512L, 8))
        .select("shard", "seq_id", "n_docs", "seq_text")),
    // temperature up-sampling realized as copies: src0 ×2.5 (2 copies + a
    // hash-gated third), src1 ×0.5 (Bernoulli keep), everything else ×1
    "sample_upsample" -> ((s, dir) =>
      Sampling.upsample(docs(s, dir), "source",
          Map("src0" -> 2.5, "src1" -> 0.5), "doc_id")
        .select("doc_id", "source", "copy")),
    // weighted sampling without replacement: 100 docs ∝ token mass
    // (Efraimidis–Spirakis hash-keys, no global sort — TakeOrdered top-k)
    "sample_weighted" -> ((s, dir) =>
      Sampling.weightedSample(
          docs(s, dir).select(col("doc_id"), col("source"),
            TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens")),
          "doc_id", "n_tokens", 100)
        .select("doc_id", "source", "n_tokens")),
    // cluster-balanced diversity sample: ≤ 20 vectors per IVF cell, chosen
    // by the portable hash — caps each semantic region instead of
    // mirroring corpus density
    "sample_cell_balanced" -> ((s, dir) =>
      Sampling.cellBalancedSample(emb(s, dir), nLists = 8, perCell = 20)
        .select(col("vec_id"), col("cell"))),
    // DSIR-style importance resampling: expected-100-row Bernoulli sample
    // weighted by n_chars, integer-exact hash gate (no exp/ln anywhere —
    // the weight column is caller-supplied, so the gate stays replayable)
    "sample_importance" -> ((s, dir) =>
      Sampling.importanceResample(docs(s, dir), col("n_chars"), 100)
        .select("doc_id", "source", "n_chars")),
    // trainer-facing token-id export: 256-token corpus-learned vocab (rank by
    // count desc, token asc), OOV id 9999; the array<long> result is
    // posexploded to (shard, seq_id, pos, token_id) rows so the oracle
    // compares every id at every position exactly
    "sample_pack_ids" -> ((s, dir) => {
      val vocab = TextAnalysis.learnVocab(docs(s, dir), 256)
      Sampling.materializeTokenIds(
          Sampling.packSequences(docs(s, dir), "doc_id",
            TextAnalysis.tokenCount(col("text")), 512L, 8),
          vocab, oovId = 9999L)
        .select(col("shard"), col("seq_id"), posexplode(col("token_ids")))
        .select(col("shard"), col("seq_id"), col("pos").cast("long").as("pos"),
          col("col").as("token_id"))
    }),
    // document-ATOMIC (no-split) greedy packing: 512-token budget, 8 hash
    // shards — a doc that would cross the budget starts a new sequence, an
    // over-budget doc sits alone. The overflow-reset recurrence is replayed
    // exactly by the oracle's per-shard recursive CTE
    "sample_pack_whole" -> ((s, dir) =>
      Sampling.packSequencesWhole(docs(s, dir), "doc_id",
          TextAnalysis.tokenCount(col("text")), 512L, 8)
        .select("doc_id", "shard", "seq_id", "tok_offset")),
    // per-sequence fill accounting over the whole-doc packing: the padding
    // waste a fixed-length trainer pays for keeping documents intact
    "sample_pack_fill" -> ((s, dir) =>
      Sampling.packFill(
          Sampling.packSequencesWhole(docs(s, dir), "doc_id",
            TextAnalysis.tokenCount(col("text")), 512L, 8),
          TextAnalysis.tokenCount(col("text")), 512L)
        .select("shard", "seq_id", "n_docs", "n_tokens", "pad")),
    // deterministic training-export shuffle: 8 shards, hash-ordered
    // positions — the reproducible global permutation without a global sort
    "sample_shuffle" -> ((s, dir) =>
      Sampling.shuffleOrder(docs(s, dir).select("doc_id"), "doc_id", 8)
        .select("doc_id", "shard", "pos")),
    // source-priority corpus-merge dedup: groups of 4 consecutive docs get
    // the group base doc's text (synthesized duplicate groups — testdata
    // texts are all distinct) with their own source labels; the curated-list
    // copy must win over plain lowest-doc_id order
    "dedup_priority" -> ((s, dir) => {
      val d = docs(s, dir)
      val base = d.filter(col("doc_id") % 4 === 0)
        .select(expr("doc_id div 4").as("g"), col("text").as("gtext"))
      val fixture = d.withColumn("g", expr("doc_id div 4"))
        .join(base, "g")
        .select(col("doc_id"), col("gtext").as("text"), col("source"))
      Dedup.prioritySurvivors(fixture, Seq("src7", "src2", "src13"))
        .select("doc_id", "source")
    }),
    // JL random projection: 64 → 8 dims with the sign-LSH hyperplane
    // generator, full precision (one exploded row per reduced dim)
    "emb_project" -> ((s, dir) =>
      Similarity.randomProjection(emb(s, dir), k = 8, dim = 64)
        .select(col("vec_id"), col("pos"), round(col("proj"), 4).as("proj"))),
    // deterministic spherical k-means (8 cells, 2 Lloyd rounds of exact
    // fixed-point component means) + final assignment — bit-reproducible
    // refined centroids, replayed round-for-round by the HUGEINT oracle
    "sim_kmeans" -> ((s, dir) => {
      val e = emb(s, dir)
      Similarity.kmeansAssign(e, Similarity.kmeansCentroids(e, 8, rounds = 2))
        .select(col("vec_id"), col("cell"), round(col("score"), 4).as("score"))
    }),
    // GREEDY k-CENTER diversity coreset (Gonzalez 1985 farthest-point
    // traversal): 8 maximally spread exemplars — hash-seeded round 1,
    // then argmin-of-max-cosine rounds with id tie-breaks; max_cos is the
    // coverage curve. The oracle replays the seeding and every round's
    // candidate scores via chained materialized CTEs — one transposed
    // pick anywhere changes all later rows
    "sample_kcenter" -> ((s, dir) =>
      Similarity.kcenterSelect(emb(s, dir), k = 8)
        .select(col("rank"), col("vec_id"),
          round(col("max_cos"), 4).as("max_cos"))),
    // BATCHED k-center: TakeOrdered(B) + the driver-local accept-prefix
    // walk — EXACTLY Gonzalez greedy at any batch size (the prefix rule
    // ends the batch before any pick serial could have reordered), so
    // the oracle is the SERIAL replay itself: the driver gate pins
    // batched == serial every round
    "sample_kcenter_batched" -> ((s, dir) =>
      Similarity.kcenterSelectBatched(emb(s, dir), k = 8, batchB = 4)
        .select(col("rank"), col("vec_id"),
          round(col("max_cos"), 4).as("max_cos"))),
    // MMR diverse selection (Carbonell & Goldstein 1998): relevance to the
    // min-id query vector traded against max-cosine to prior picks at
    // λ=0.5 — the "about THIS topic, but don't repeat" curation pick; the
    // oracle replays every greedy round as chained materialized CTEs
    "sample_mmr" -> ((s, dir) =>
      Similarity.mmrSelect(emb(s, dir), k = 8, lambda = 0.5)
        .select(col("rank"), col("vec_id"),
          round(col("rel"), 4).as("rel"),
          round(col("score"), 4).as("score"))),
    // IVF ANN over the SAME fitted cells — the kmeans→IVF composition
    "sim_ivf_kmeans" -> ((s, dir) => {
      val e = emb(s, dir)
      Similarity.ivfTopKWith(e.filter(col("vec_id") < 10), e, k = 5,
          Similarity.kmeansCentroids(e, 8, rounds = 2), nProbe = 3)
        .select(col("query_id"), col("neighbor_id"),
          col("rank").cast("long").as("rank"),
          round(col("cosine"), 4).as("cosine"))
    }),
    // z-score threshold alarms over the dense hourly signup series — the
    // batch analog of the reference ecosystem's downstream alarm engine
    "a12_anomaly" -> ((s, dir) => {
      val series = GapFill.zeroFill(
        RuleCompiler.compileGrouped(
          spec("count", "signup", grouped = Seq.empty), HOUR)(envs(s, dir)),
        HOUR, Seq("tenant_id"))
      // the FLAG is re-derived from the rounding-stabilized zscore (not the
      // operator's raw-double flag): a |z| landing within cross-engine float
      // noise of the threshold would otherwise flip between Spark and DuckDB
      // — the exact boundary class safeRound2 exists to kill
      Anomaly.zscoreFlags(series, Seq("tenant_id"), "value", threshold = 2.0)
        .select(col("window_start"), col("tenant_id"), col("value"),
          safeRound2(col("zscore")).as("zscore"),
          (abs(safeRound2(col("zscore"))) > 2.0).as("is_anomaly"))
    }),
    "mm_meta" -> ((s, dir) =>
      Multimodal.metadata(Multimodal.synthesizeFromDocs(docs(s, dir)))
        .select(col("doc_id"), col("mime"), col("width").cast("long").as("width"),
          col("height").cast("long").as("height"), col("pixels").cast("long").as("pixels"))),
    // REAL multi-frame containers end to end: 2..4 genuine PNG frames
    // concatenated per doc (a "video"), a spec-compliant PNG chunk walk to
    // recover frame boundaries, a real decode per frame, and the per-frame
    // aHash — the oracle replays dims, channel sums AND the 64-bit frame
    // signature analytically from the framePatternId closed form
    "mm_frames_decode" -> ((s, dir) =>
      Multimodal.decodeFrames(s,
        Multimodal.synthesizeVideos(s, docs(s, dir, floored = true)))),
    // scene-change keyframes: per video, the L1 channel-sum delta vs the
    // previous frame, flagged against a fixed threshold (frame 0 always
    // keys — NULL delta) — the cheap cut detector frame-sampling runs
    // before expensive per-frame featurizing; exact longs, analytic replay
    "mm_video_keyframes" -> ((s, dir) =>
      Multimodal.keyframeSelect(s,
        Multimodal.synthesizeVideos(s, docs(s, dir, floored = true)), thr = 20000L)),
    // frame-level NEAR-dup across videos: doc_id % 7 == 3 renders its
    // predecessor's video (planted, the mm_dedup discipline — bounded
    // duplicate groups, linear pair count), per-frame signatures run the
    // pigeonhole-banded hamming self-join — never the frame-pair space
    "mm_frames_neardup" -> ((s, dir) => {
      // persist: the signature relation feeds BOTH sides of the banded
      // self-join — unpersisted, the whole synthesize+chunk-walk+decode
      // chain executes twice (the minhashLshPairs persist rationale);
      // Bench/Verify clearCache() between queries reclaims it
      val sigs = Multimodal.decodeFrames(s,
          Multimodal.synthesizeVideos(s, docs(s, dir, floored = true)))
        .select((col("doc_id") * 8 + col("frame_idx")).as("id"),
          col("fhash").as("sig"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      Dedup.hammingPairs(sigs, 3)
        .select(col("id_a"), col("id_b"), col("hamming").cast("long").as("hamming"))
    }),
    // VIDEO-level exact dedup: the per-video signature is the ordered
    // frame-hash sequence (frame order matters — a re-cut is not a dup),
    // group-compacted with the mm_dedup min-keeper/count contract; the
    // planted predecessor copies share patterns AND frame count.
    // Only (doc_id, frame_idx, fhash) rows ever shuffle; the fold is one
    // exchange keyed by video, the compaction one keyed by signature
    "mm_video_dedup" -> ((s, dir) => {
      val fr = Multimodal.decodeFrames(s,
        Multimodal.synthesizeVideos(s, docs(s, dir, floored = true)))
      fr.groupBy(col("doc_id"))
        .agg(array_join(
          transform(
            array_sort(collect_list(struct(col("frame_idx"), col("fhash")))),
            x => x.getField("fhash").cast("string")), ",").as("vsig"))
        .groupBy("vsig")
        .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_dups"))
    }),
    // REAL codec round-trip: deterministic RGB pattern → actual PNG bytes
    // (javax.imageio encode) → actual PNG decode → exact channel sums. The
    // oracle computes the same sums ANALYTICALLY from the pattern formulas —
    // a hash match proves encode, decode and extraction are all lossless
    "mm_decode" -> ((s, dir) =>
      Multimodal.decodeImages(s,
          Multimodal.synthesizeImages(s, docs(s, dir, floored = true)).toDF())
        .toDF()
        .select(col("doc_id"), col("width").cast("long").as("width"),
          col("height").cast("long").as("height"),
          col("sum_r"), col("sum_g"), col("sum_b"))),
    // MM5 — graft extension: perceptual average-hash through the REAL PNG
    // decode path — the oracle recomputes the 64-bit signature analytically
    // from the pattern's closed form, so a single flipped bit anywhere in
    // codec, grayscale, blocking, or thresholding fails the gate
    "mm_phash" -> ((s, dir) =>
      Multimodal.imageAHash(s,
        Multimodal.synthesizeImages(s, docs(s, dir, floored = true)).toDF()).toDF()),
    // DCT perceptual hash over the GRADIENT scene family (the r14 lesson
    // as an operator proof): near-planar scenes aHash collapses separate
    // under the low-frequency DCT structure; the oracle recomputes the
    // full 32×32-grid integer DCT signature analytically
    "mm_phash_dct" -> ((s, dir) =>
      Multimodal.imagePHashDct(s,
        Multimodal.synthesizeImagesGradient(s, docs(s, dir, floored = true)).toDF()).toDF()),
    // pHash wired into the banded hamming join: consecutive docs render
    // the SAME scene at different sizes (planted rescale near-dups, ≤3
    // bits apart); the oracle verifies by brute force over the analytic
    // signatures
    "mm_phash_dct_neardup" -> ((s, dir) => {
      val sigs = Multimodal.imagePHashDct(s,
          Multimodal.synthesizeImagesGradient(s, docs(s, dir, floored = true)).toDF())
        .toDF("id", "sig")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      Dedup.hammingPairs(sigs, 3)
        .select(col("id_a"), col("id_b"),
          col("hamming").cast("long").as("hamming"))
    }),
    // MM6 — graft extension: image exact-dedup end to end — duplicates are
    // PLANTED (doc_id % 7 == 3 renders its predecessor's pattern), each
    // distinct pattern is encoded as a real PNG exactly once, hashed through
    // the real decode path, and doc ids group-compact per signature with the
    // min-keeper/count contract of Dedup.exact
    "mm_dedup" -> ((s, dir) => {
      val pats = docs(s, dir, floored = true).select(col("doc_id"),
        (col("doc_id") - when(col("doc_id") % 7 === 3, 1).otherwise(0)).as("pid"))
      val hashes = Multimodal.imageAHash(s,
          Multimodal.synthesizeImages(s,
            pats.select(col("pid").as("doc_id")).distinct()).toDF())
        .toDF("pid", "phash")
      pats.join(hashes, "pid")
        .groupBy("phash")
        .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_dups"))
    }),
    // MM6b — graft extension: the decode plane through a LOSSY codec (real
    // javax.imageio JPEG encode → real JPEG decode). Lossy pixels aren't
    // analytically replayable, so the gate pins the PLANTED duplicate
    // structure instead: each distinct quadratic pattern is encoded ONCE,
    // the planted copy (doc_id % 7 == 3 → predecessor's pattern) shares the
    // stream, and doc ids group-compact on the DECODED content key
    // (dims + exact channel sums). Decoder-reported dims surface in the
    // output — they survive the lossy round-trip exactly, so the oracle
    // checks them per group; a failed decode collapses groups onto the
    // sentinel and fails the gate
    "mm_decode_jpeg" -> ((s, dir) => {
      val pats = docs(s, dir).select(col("doc_id"),
        (col("doc_id") - when(col("doc_id") % 7 === 3, 1).otherwise(0)).as("pid"))
      val feats = Multimodal.decodeImages(s,
          Multimodal.synthesizeImagesJpeg(s,
            pats.select(col("pid").as("doc_id")).distinct()).toDF())
        .toDF()
        .select(col("doc_id").as("pid"), col("width"), col("height"),
          col("sum_r"), col("sum_g"), col("sum_b"))
      pats.join(feats, "pid")
        .groupBy("width", "height", "sum_r", "sum_g", "sum_b")
        .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_dups"))
        .select(col("width").cast("long").as("width"),
          col("height").cast("long").as("height"),
          col("keep_id"), col("n_dups"))
    }),
    // MM7 — graft extension: REAL container round-trip for the audio
    // modality — deterministic 16-bit PCM → genuine RIFF/WAVE bytes → a
    // spec-compliant chunk-walking decode → integer-exact features. The
    // oracle replays the sample formula analytically (PCM is lossless, so
    // the decoded samples ARE the formula) — a hash match proves header
    // write, chunk walk, and sample interpretation are all exact
    // MM — audio VAD: frame-energy silence/speech segmentation through the
    // REAL RIFF decode, over the planted-silence fixture (speech–silence–
    // speech with closed-form extents); exact long energies, integer-
    // division timestamps — the audio quality-filter tier
    "mm_audio_vad" -> ((s, dir) =>
      Multimodal.vadSegments(s,
          Multimodal.synthesizeAudioSilence(s, docs(s, dir)).toDF(),
          win = 64, thrMeanSq = 1000000L)
        .select(col("doc_id"), col("span"), col("is_speech"),
          col("start_sample"), col("n_samples"), col("sum_sq"),
          col("start_ms"))),
    // per-doc voiced fraction over the same fixture — the audio quality
    // filter number (exact long sample counts, one division)
    "mm_audio_vad_ratio" -> ((s, dir) =>
      Multimodal.vadSpeechRatio(s,
          Multimodal.synthesizeAudioSilence(s, docs(s, dir)).toDF(),
          win = 64, thrMeanSq = 1000000L)
        .select(col("doc_id"), col("n_spans"), col("speech_samples"),
          col("total_samples"), col("speech_ratio"))),
    // per-shard VAD quality rollup — the one-shot twin the streaming sink
    // (StreamingVad.vadRatioSink) must land on bit-identically
    "mm_audio_vad_shards" -> ((s, dir) =>
      Multimodal.vadShardRollup(s,
          Multimodal.synthesizeAudioSilence(s, docs(s, dir)).toDF(),
          win = 64, thrMeanSq = 1000000L, numShards = 8)
        .select(col("shard"), col("n_docs"), col("n_undecodable"),
          col("n_spans"), col("speech_samples"), col("total_samples"),
          col("speech_ratio"))),
    "mm_audio" -> ((s, dir) =>
      Multimodal.decodeAudio(s,
          Multimodal.synthesizeAudio(s, docs(s, dir)).toDF())
        .select(col("doc_id"),
          col("sample_rate").cast("long").as("sample_rate"),
          col("channels").cast("long").as("channels"),
          col("bits").cast("long").as("bits"),
          col("n_frames"), col("duration_ms"), col("sum_amp"), col("sum_sq"))),
    // MM8 — graft extension: audio exact-dedup through the REAL RIFF parse
    // — duplicates are PLANTED (doc_id % 7 == 3 renders its predecessor's
    // waveform), each distinct waveform is encoded as a genuine WAV
    // exactly once, fingerprinted through the chunk-walking decode
    // (Haitsma–Kalker energy-difference sign bits), and doc ids
    // group-compact per signature with the min-keeper/count contract —
    // the mm_dedup pattern for the audio modality
    "mm_audio_dedup" -> ((s, dir) => {
      val pats = docs(s, dir).select(col("doc_id"),
        (col("doc_id") - when(col("doc_id") % 7 === 3, 1).otherwise(0)).as("pid"))
      val fps = Multimodal.audioFingerprint(s,
          Multimodal.synthesizeAudio(s,
            pats.select(col("pid").as("doc_id")).distinct()).toDF())
        .toDF("pid", "afp")
      pats.join(fps, "pid")
        .groupBy("afp")
        .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_dups"))
    }),

    // MM9 — graft extension: audio NEAR-dup end to end — doc_id % 11 == 4
    // renders its predecessor's waveform nudged by +1 per sample (wrapped
    // 16-bit, the re-encode drift model), fingerprints ride the REAL
    // encode→RIFF-parse→energy-sign path, and the pair search is
    // Dedup.hammingPairs' pigeonhole-banded equi-join (exact at
    // maxHamming=7 < 8 bands; the oracle is the brute-force pair spec)
    "mm_audio_neardup" -> ((s, dir) => {
      val pats = docs(s, dir, floored = true).select(col("doc_id"),
        (col("doc_id") - when(col("doc_id") % 11 === 4, 1).otherwise(0)).as("pid"),
        when(col("doc_id") % 11 === 4, 1).otherwise(0).as("nudge"))
      val fps = Multimodal.audioFingerprint(s,
          Multimodal.synthesizeAudioPerturbed(s, pats).toDF())
        .toDF("id", "sig")
      Dedup.hammingPairs(fps, 7)
        .select(col("id_a"), col("id_b"), col("hamming").cast("long").as("hamming"))
    }),
    // length-bucketed batching: the padding-waste killer for variable-length
    // training — bucket by n div 32, deterministic batches of 8 within each
    // (bucket, shard) cell; the oracle replays the full assignment
    "sample_length_buckets" -> ((s, dir) =>
      Sampling.lengthBucketBatches(docs(s, dir), "doc_id",
        TextAnalysis.tokenCount(col("text")), bucketWidth = 32, batchSize = 8)),
    // padding-efficiency audit over the same batch assignment: per
    // (bucket, shard) the exact padded-slot count and the real-token share
    "report_pack_efficiency" -> ((s, dir) =>
      Sampling.packEfficiency(
        Sampling.lengthBucketBatches(docs(s, dir), "doc_id",
          TextAnalysis.tokenCount(col("text")), bucketWidth = 32, batchSize = 8))),
    // curriculum staging: 4 quality stages from 3 sampled-percentile cutoffs
    // (broadcast), deterministic shuffled order within (stage, shard) cells —
    // a complete easiest-first training schedule, no global sort anywhere
    "sample_curriculum" -> ((s, dir) =>
      // floored (r18): the cutoff sample AND the stage assignment each run
      // the composite quality score over the corpus — both are narrow maps
      // above the scan, single-core without the floor (Finding-1 shape)
      Sampling.curriculumStages(docs(s, dir, floored = true), "doc_id",
        TextAnalysis.qualityScore(col("text")), stages = 4, sampleRate = 0.5)),
    // AGG3 — graft extension: GROUPING SETS sibling of agg_cube — only the
    // two marginals and the grand total (no (type, band) cells), still ONE
    // Expand + a single exchange; gid disambiguates the super-aggregates
    "agg_gsets" -> ((s, dir) =>
      EventsAdapter.rawEvents(s, dir)
        .select(col("event_type"), (col("user_id") % 3).as("user_band"),
          col("value"))
        .groupingSets(
          Seq(Seq(col("event_type")), Seq(col("user_band")), Seq.empty),
          col("event_type"), col("user_band"))
        .agg(grouping_id().as("gid"), count(lit(1)).as("n"),
          sum(floor(col("value") * 100).cast("long")).as("sum_cents"))),
    // tokenizer-fertility audit: BPE-ish pieces per whitespace word, by
    // voted language — exact long sums, one division per language row
    "text_fertility" -> ((s, dir) =>
      TextAnalysis.tokenizerFertility(docsMulti(s, dir))),
    // the astral-mass audit (post-lift: what the astral lift RECOVERS and
    // what a letter gate still excludes): exact token-mass counters over
    // the astral-decorated corpus — letter-vs-astral classification must
    // agree between Java and RE2 for every fixture code point or the hash
    // gate fails
    "text_astral_oov" -> ((s, dir) =>
      TextAnalysis.astralOovAudit(docsAstral(s, dir))),
    // Bradley–Terry preference strengths (the reward-model data-plane op):
    // comparisons synthesized from per-user event-type spend totals (larger
    // total wins, ties skipped), then 8 fixed-point MM rounds — every floor
    // division replayed exactly by the oracle's unrolled CTE chain
    "eval_bradley_terry" -> ((s, dir) =>
      Preference.bradleyTerry(btComparisons(s, dir), iters = 8)),
    // reliability audit of the SAME fit: bucket comparisons by the
    // model's predicted win probability for the lower-id item, compare
    // the bucket's empirical win rate to its midpoint — the calibration
    // screen before strengths are read as probabilities
    "eval_bt_calibration" -> ((s, dir) => {
      val cmp = btComparisons(s, dir)
      Preference.btCalibration(cmp,
        Preference.bradleyTerry(cmp, iters = 8), bins = 10)
    }),
    // judgment-agreement audit over the SAME synthesized preference log:
    // per compared pair, the two directed counts and the majority share —
    // the noise screen that runs before any reward-model fit
    "eval_pair_agreement" -> ((s, dir) =>
      Preference.pairAgreement(btComparisons(s, dir))),
    // per-rater majority-agreement screen (the Cohen's-kappa-style rater
    // audit before a Bradley–Terry fit trusts the log): every judgment on a
    // strictly-majority-decided pair either sides with the majority or not;
    // tied pairs adjudicate nothing and leave both counts
    "eval_rater_agreement" -> ((s, dir) =>
      Preference.raterAgreement(btComparisons(s, dir))),
    // Krippendorff's alpha over the SAME preference log: chance-corrected
    // reliability (1 = perfect, 0 = chance) — units are unordered item
    // pairs, labels the judgment direction; the only per-unit division
    // rides a 1e-6 integer floor grid so both engines sum exact longs
    "eval_krippendorff" -> ((s, dir) =>
      Preference.krippendorffAlpha(btComparisons(s, dir))),
    // interval alpha over a 0–9 RATING framing of the same log (unit =
    // event type, rating = each user's spend total folded onto the 0–9
    // grid): squared-difference disagreement via exact moment algebra —
    // the score-scale annotation audit nominal alpha cannot express
    "eval_krippendorff_interval" -> ((s, dir) => {
      val totals = EventsAdapter.rawEvents(s, dir)
        .groupBy(col("user_id"), col("event_type"))
        .agg(sum(floor(col("value") * 100).cast("long")).as("v"))
      Preference.krippendorffAlphaInterval(
        totals.select(col("event_type").as("unit"),
          expr("(((v % 100) + 100) % 100) div 10").as("value")))
    }),
    // corpus BLEU-4 over the generation-eval pair fixture (two
    // different-seed dropout corruptions of each doc): clipped counts
    // pooled over all pairs — the standard corpus formulation, never an
    // average of sentence BLEUs — then the one ln/exp step rounds stable
    "eval_gen_bleu" -> ((s, dir) =>
      Eval.corpusBleu(Eval.generationPairStatsFast(genPairs(s, dir, floored = true)))),
    // per-language corpus BLEU: the same pooled arithmetic within each
    // documents.lang slice — the per-slice eval table
    "eval_gen_bleu_by_lang" -> ((s, dir) =>
      Eval.corpusBleuGrouped(
        Eval.generationPairStatsFast(genPairs(s, dir, floored = true))
          .join(docs(s, dir, floored = true).select(col("doc_id"), col("lang")),
            Seq("doc_id")),
        keyCols = Seq("lang"))),
    // corpus BLEU with jackknife error bars: leave-one-pair-out scores
    // on the StableRound fixed-point grid, exact integer variance sums
    "eval_gen_bleu_ci" -> ((s, dir) =>
      Eval.corpusBleuJackknife(
        Eval.generationPairStatsFast(genPairs(s, dir, floored = true)))),
    // PAIRED approximate-randomization test (Koehn 2004): system A =
    // 15%-dropout (seed 7), system B = 20%-dropout (seed 13), SAME
    // references — 200 hash-gated per-pair swap resamples, each resampled
    // BLEU on the round-4 grid, p = (#{|Δr| ≥ |Δobs|}+1)/(R+1) — an exact
    // integer count both engines enumerate identically
    "eval_ab_paired" -> ((s, dir) => {
      val d = docs(s, dir, floored = true)
      val ref = TextAnalysis.wordDropout(d, dropPct = 10, seed = 42)
        .select(col("doc_id"), col("text_aug").as("ref"))
      def stats(pct: Int, seed: Long) = Eval.generationPairStatsFast(
        TextAnalysis.wordDropout(d, dropPct = pct, seed = seed)
          .select(col("doc_id"), col("text_aug").as("cand"))
          .join(ref, Seq("doc_id")))
      Eval.pairedBleuSignificance(stats(15, 7), stats(20, 13),
        resamples = 200, seed = 11)
    }),
    // distinct-n generation diversity (Li 2016): distinct/total n-grams
    // over the dropout-generation corpus, n = 1..3 — the mode-collapse
    // audit; exact long counts, one division per row
    "eval_gen_distinct_n" -> ((s, dir) =>
      Eval.distinctNgramRatio(
        TextAnalysis.wordDropout(docs(s, dir, floored = true), dropPct = 15, seed = 7)
          .select(col("text_aug").as("cand")))),
    // MULTI-REFERENCE corpus BLEU (Papineni §2.1's full clip): two
    // independent dropout references per candidate — per-gram ceilings
    // max over refs, brevity length = closest ref (ties shorter); the
    // pooled roll-up is corpusBleu unchanged
    "eval_gen_bleu_multiref" -> ((s, dir) => {
      val d = docs(s, dir, floored = true)
      def drop(pct: Int, seed: Long, as: String) =
        TextAnalysis.wordDropout(d, dropPct = pct, seed = seed)
          .select(col("doc_id"), col("text_aug").as(as))
      val pairs = drop(15, 7, "cand")
        .join(drop(10, 42, "ref1"), Seq("doc_id"))
        .join(drop(12, 99, "ref2"), Seq("doc_id"))
        .select(col("doc_id"), col("cand"),
          array(col("ref1"), col("ref2")).as("refs"))
      Eval.corpusBleu(Eval.generationPairStatsMultiRef(pairs))
    }),
    // the chrF sibling of eval_ab_paired: the same swap machinery over
    // per-pair char-gram stats, each resampled chrF2 on the round-4 grid
    "eval_ab_paired_chrf" -> ((s, dir) => {
      val d = docs(s, dir, floored = true)
      val ref = TextAnalysis.wordDropout(d, dropPct = 10, seed = 42)
        .select(col("doc_id"), col("text_aug").as("ref"))
      def stats(pct: Int, seed: Long) = Eval.chrFPairStatsFast(
        TextAnalysis.wordDropout(d, dropPct = pct, seed = seed)
          .select(col("doc_id"), col("text_aug").as("cand"))
          .join(ref, Seq("doc_id")))
      Eval.pairedChrFSignificance(stats(15, 7), stats(20, 13),
        resamples = 200, seed = 11)
    }),
    // the GENERIC paired randomization (mean difference of per-item
    // integer metrics): does 15% word dropout reduce mean token count —
    // per-pair sums swap by the same hash gate, D_r is an exact LONG
    "eval_ab_paired_mean" -> ((s, dir) => {
      val d = docs(s, dir)
      val a = d.select(col("doc_id"),
        TextAnalysis.tokenCount(col("text")).cast("long").as("score_a"))
      val b = TextAnalysis.wordDropout(d, dropPct = 15, seed = 7)
        .select(col("doc_id"),
          TextAnalysis.tokenCount(col("text_aug")).cast("long").as("score_b"))
      Eval.pairedMeanSignificance(a.join(b, Seq("doc_id")),
        resamples = 200, seed = 11)
    }),
    // McNemar paired-accuracy test over a synthesized paired prediction
    // log: per event, system A correct = c100 ≥ 40, system B correct =
    // (31·c100+7) mod 100 ≥ 50 — discordant counts + the continuity-
    // corrected statistic, one division of exact longs
    "eval_mcnemar" -> ((s, dir) => {
      val c100 = (floor(col("value") * 100).cast("long") % 100 + 100) % 100
      Eval.mcnemar(EventsAdapter.rawEvents(s, dir).select(
        (c100 >= 40).as("correct_a"),
        ((c100 * 31 + 7) % 100 >= 50).as("correct_b")))
    }),
    // per-doc ROUGE-1/2/L over the same pair fixture: exact clipped
    // counts and the LCS carried alongside single-division P/R/F scores
    "eval_gen_rouge" -> ((s, dir) =>
      Eval.rougeScores(Eval.generationPairStatsFast(genPairs(s, dir, floored = true)))),
    // corpus chrF2 over the same pair fixture: character n-grams of the
    // whitespace-removed capped text, clipped by the sorted-merge fold,
    // pooled per order — pure finite IEEE arithmetic, no rounding at all
    "eval_gen_chrf" -> ((s, dir) =>
      Eval.corpusChrF(Eval.chrFPairStatsFast(genPairs(s, dir, floored = true)))),
    // generation memorization audit: 30%-dropout "generations" scored for
    // trigram-level memorization against the corpus they derive from —
    // every deletion site mints novel trigrams, so seen ratios spread
    // strictly inside (0, 1]; the Bloom-on-generations scale path runs
    // even at fixture size (the fpp sliver dies in the exact confirm)
    "eval_gen_memorization" -> ((s, dir) =>
      Dedup.memorizationScores(
        TextAnalysis.wordDropout(docs(s, dir), dropPct = 30, seed = 99)
          .select(col("doc_id"), col("text_aug").as("text")),
        docs(s, dir), n = 3)),
    // pass@k over a synthesized eval log: every event is one sample for
    // its (event_type, user) task, "correct" = even floor(value·100) —
    // the unbiased estimator as divisibility-exact integer binomial folds
    "eval_pass_at_k" -> ((s, dir) =>
      Eval.passAtK(
        EventsAdapter.rawEvents(s, dir).select(
          col("event_type"), col("user_id"),
          (floor(col("value") * 100).cast("long") % 2 === 0).as("correct")),
        ks = Seq(1, 2, 4), taskCols = Seq("event_type", "user_id"))),
    // per-pair word error rate over the same generation fixture: the full
    // token-Levenshtein DP as the LCS-style append fold, one division
    "eval_gen_wer" -> ((s, dir) =>
      Eval.werStatsFast(genPairs(s, dir, floored = true))),
    // Kendall tau between two rankings of the same users per event type —
    // by total centi-spend vs by event count (row_number permutations
    // with the (score desc, user asc) deterministic tie-break); the
    // inversion fold runs over the a-rank-sorted per-query array
    "eval_rank_corr" -> ((s, dir) => {
      val t = EventsAdapter.rawEvents(s, dir)
        .groupBy(col("event_type"), col("user_id"))
        .agg(sum(floor(col("value") * 100).cast("long")).as("va"),
          count(lit(1)).as("vb"))
      import org.apache.spark.sql.expressions.Window
      val wa = Window.partitionBy("event_type")
        .orderBy(col("va").desc, col("user_id").asc)
      val wb = Window.partitionBy("event_type")
        .orderBy(col("vb").desc, col("user_id").asc)
      Eval.kendallTau(
        t.select(col("event_type").as("query_id"),
          col("user_id").as("doc_id"), row_number().over(wa).as("rank")),
        t.select(col("event_type").as("query_id"),
          col("user_id").as("doc_id"), row_number().over(wb).as("rank")))
    }),
    // DPO pair mining over a synthesized judge log: every event scores a
    // sample (event_id) for its (event_type|user) prompt; chosen/rejected
    // ride two struct-mins, low-margin prompts (< 10 centi-points) drop
    "train_dpo_pairs" -> ((s, dir) =>
      Preference.dpoPairs(
        EventsAdapter.rawEvents(s, dir).select(
          concat_ws("|", col("event_type"), col("user_id")).as("task_id"),
          col("event_id").cast("long").as("sample_id"),
          (floor(col("value") * 100).cast("long") % 1000).as("score")),
        minMargin = 10)),
    // in-engine quality-classifier fit: batch perceptron (all-integer
    // mistake-driven updates, so the fitted weights are a pure function
    // of the corpus) predicting lang=en from three cheap integer text
    // stats; output = the per-round training curve + weights, the oracle
    // replays every round as chained 1-row weight CTEs
    // MULTINOMIAL NAIVE BAYES (add-one smoothing, sparse ln(C+1)
    // refactor): self-fit on the lang label, every doc scored; argmax on
    // the stable 10⁻⁴ grid with min-label ties
    "train_nb" -> ((s, dir) =>
      Classify.naiveBayes(docs(s, dir))),
    // the confusion matrix of the NB self-fit — the one-screen summary of
    // what the learned router confuses
    "train_nb_confusion" -> ((s, dir) =>
      Classify.naiveBayes(docs(s, dir))
        .groupBy(col("lang"), col("pred")).agg(count(lit(1)).as("n"))),
    // interpolated Kneser–Ney bigram LM scoring (d=0.75, minCount=2) —
    // the continuation-probability upgrade of text_lm_nll's add-one model
    "text_lm_kn" -> ((s, dir) => {
      val d = docs(s, dir)
      TextAnalysis.knScores(d, d, minCount = 2)
        .select(col("doc_id"), col("n_bigrams"),
          safeRound4(col("mean_nll")).as("mean_nll"))
    }),
    "train_perceptron" -> ((s, dir) => {
      val d = docs(s, dir)
      Classify.batchPerceptron(
        d.select(
          when(col("lang") === "en", 1L).otherwise(lit(-1L)).as("y"),
          TextAnalysis.tokenCount(col("text")).cast("long").as("f_ntok"),
          size(array_distinct(TextAnalysis.tokens(col("text"))))
            .cast("long").as("f_ndist"),
          length(col("text")).cast("long").as("f_nchar")),
        Seq("f_ntok", "f_ndist", "f_nchar"), "y", rounds = 4)
    }),
    // OPTIMAL DECISION STUMPS (the AdaBoost base learner): per feature,
    // the exactly-best 1-D threshold rule from cumulative label counts —
    // the interpretable "cut at n_tokens ≤ t" face of the filter family
    "train_stumps" -> ((s, dir) => {
      val d = docs(s, dir)
      Classify.bestStumps(
        d.select(
          when(col("lang") === "en", 1L).otherwise(lit(-1L)).as("y"),
          TextAnalysis.tokenCount(col("text")).cast("long").as("f_ntok"),
          size(array_distinct(TextAnalysis.tokens(col("text"))))
            .cast("long").as("f_ndist"),
          length(col("text")).cast("long").as("f_nchar")),
        Seq("f_ntok", "f_ndist", "f_nchar"), "y")
    }),
    // BOOSTED STUMPS (integer weight-doubling rounds — the exact-
    // arithmetic cousin of discrete AdaBoost): each round's globally-best
    // weighted stump, misclassified rows' weights doubled for the next —
    // the ensemble curve of what the filter still misses
    "train_stumps_boosted" -> ((s, dir) => {
      val d = docs(s, dir)
      Classify.boostedStumps(
        d.select(
          when(col("lang") === "en", 1L).otherwise(lit(-1L)).as("y"),
          TextAnalysis.tokenCount(col("text")).cast("long").as("f_ntok"),
          size(array_distinct(TextAnalysis.tokens(col("text"))))
            .cast("long").as("f_ndist"),
          length(col("text")).cast("long").as("f_nchar")),
        Seq("f_ntok", "f_ndist", "f_nchar"), "y", rounds = 3)
    }),
    // UNCERTAINTY SAMPLING (active-learning batch selection): fit the
    // perceptron, score every doc under the final weights, take the 20
    // docs nearest the decision boundary (smallest |score|, doc_id ties)
    // — the "label these next" pick, composed from the same exact fit
    "sample_uncertain" -> ((s, dir) => {
      val d = docs(s, dir)
      val featCols = Seq("f_ntok", "f_ndist", "f_nchar")
      val feats = d.select(
        col("doc_id"),
        when(col("lang") === "en", 1L).otherwise(lit(-1L)).as("y"),
        TextAnalysis.tokenCount(col("text")).cast("long").as("f_ntok"),
        size(array_distinct(TextAnalysis.tokens(col("text"))))
          .cast("long").as("f_ndist"),
        length(col("text")).cast("long").as("f_nchar"))
      val fit = Classify.batchPerceptron(feats, featCols, "y", rounds = 4)
        .filter(col("round") === 4).collect()(0)
      val w = (0 until 4).map(i => fit.getLong(2 + i))
      Classify.perceptronPredict(feats, featCols, w)
        .filter(col("score").isNotNull)
        .orderBy(abs(col("score")).asc, col("doc_id").asc)
        .limit(20)
        .select(col("doc_id"), col("score"))
    }),
    // reliability diagram + ECE of a synthesized classifier: confidence =
    // (floor(value·100) mod 100, sign-folded)/100, label = conf ≥ 0.5 —
    // a monotone step, so the diagram shows saturated extremes and the
    // ECE is large by construction; both replay to the bin midpoints
    "eval_calibration_bins" -> ((s, dir) =>
      Eval.calibrationBins(clfPreds(s, dir), bins = 10)),
    "eval_ece" -> ((s, dir) => Eval.ece(clfPreds(s, dir), bins = 10)),
    // self-consistency majority vote: every event is a sample answering
    // its (event_type, user) task with floor(value·100) mod 5, gold =
    // user mod 5 (task-constant) — modal answer via one struct-min, ties
    // to the smallest answer
    "eval_majority_vote" -> ((s, dir) =>
      Eval.majorityVote(
        EventsAdapter.rawEvents(s, dir).select(
          col("event_type"), col("user_id"),
          (floor(col("value") * 100).cast("long") % 5).as("answer"),
          (col("user_id") % 5).cast("long").as("gold")),
        taskCols = Seq("event_type", "user_id"))),
    // Welch A/B comparison per metric: arms from user parity with a
    // planted +25-centipoint effect on arm b — exact integer sufficient
    // statistics, the only root an IEEE-correctly-rounded sqrt
    "eval_ab_welch" -> ((s, dir) =>
      Eval.abWelch(EventsAdapter.rawEvents(s, dir).select(
        col("event_type").as("metric"),
        when(col("user_id") % 2 === 0, lit("a")).otherwise(lit("b"))
          .as("arm"),
        (floor(col("value") * 100).cast("long") +
          (col("user_id") % 2) * 25).as("value")))),
    // best-of-n expected-max curve over the same judge log as the DPO
    // pairs: what best-of-k buys per prompt, read off one sample set
    "eval_best_of_n" -> ((s, dir) =>
      Eval.bestOfN(
        EventsAdapter.rawEvents(s, dir).select(
          concat_ws("|", col("event_type"), col("user_id")).as("task_id"),
          (floor(col("value") * 100).cast("long") % 1000).as("score")),
        ks = Seq(1, 2, 4))),
    // exact ROC AUC of a synthesized quality classifier: integer-bucketed
    // score (floor(value·100) mod 16) vs a label sharing its low bits
    // (mod 4 = 0) — strong-but-imperfect separation; the rank-sum
    // identity stays integer to the one final division
    "eval_auc" -> ((s, dir) =>
      Eval.aucRoc(EventsAdapter.rawEvents(s, dir).select(
        (floor(col("value") * 100).cast("long") % 16).as("score"),
        (floor(col("value") * 100).cast("long") % 4 === 0).as("label")))),
    // end-to-end pipeline composition — the real training-data shape, every
    // stage an already-oracled operator, chained through the (doc_id, text)
    // column contract: C4 clean → corpus line dedup → Gopher quality filter
    // → benchmark decontamination (doc_id%50 slice as the held-out bench) →
    // near-dup pairs + leakage-safe split (train slice) → deterministic
    // shuffle (re-id by shard·2³²+pos, the documented shuffle→pack
    // composition) → sequence packing → materialized training sequences
    //
    // The pair stage lives in [[pipelinePairs]] so its 100 TB-critical shape
    // (df-capped shingle join) is pinned by PlanSpec on the exact function
    // this composition calls — connectedComponents' eager checkpoints sever
    // the pair plan from the final query plan, so it can't be pinned there.
    "pipeline_e2e" -> ((s, dir) => {
      val cleaned = TextAnalysis.c4Clean(pipeDocs(s, dir, floored = true),
          minWordsPerLine = 3, minKeptLines = 4)
        .filter(col("keep_doc"))
        .select(col("doc_id"), col("text_clean").as("text"))
      val lineDeduped = Dedup.dedupLines(cleaned, maxDocFreq = 3)
        .select(col("doc_id"), col("text_clean").as("text"))
      // persist the two multiply-consumed intermediates: `quality` feeds the
      // corpus AND bench slices of decontamination (each a full re-execution
      // of C4 clean → line dedup → quality filter without the cache), and
      // `decontaminated` feeds the pair stage, the split join and the train
      // projection. Both are post-filter SURVIVOR sets — tiny relative to
      // the input corpus — so the cache is rows-that-survived, never the raw
      // corpus; Bench/Verify clear the catalog cache between queries
      val quality = TextAnalysis.qualityFilter(lineDeduped).select("doc_id", "text")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      // materialize the corpus-scale pass (C4 → line dedup → quality) ONCE
      // at full parallelism and measure the survivor count; everything
      // downstream is survivor-sized and runs at a survivor-derived
      // partition count (Lineage.withLoopPartitions — the session setting
      // stays the upper bound, so a production-scale survivor set keeps
      // full cluster parallelism; only small ones stop paying dozens of
      // session-partition stages across decontaminate/pairs/split/pack)
      val nQuality = quality.count()
      // decontaminated is CHECKPOINTED (lineage truncated), not just
      // persisted: five downstream consumers (pair stage, CC edges, split
      // join, train projection, renumber) each carry the full upstream
      // logical plan into Catalyst again when only the data is cached —
      // measured ~7 s of pure driver analysis time per composed run at
      // sf0.1. The eager materialization stores the survivor SET (167 docs
      // at test scale; always post-filter, corpus-fraction-sized) and gives
      // every consumer an O(1) leaf plan; Lineage.materialize upgrades it to
      // a reliable checkpoint when a checkpoint dir is configured (the
      // executor-loss contract shared with the iterative graph operators)
      val sessionP = Lineage.effectiveShufflePartitions(s)
      // r18 NEGATIVE RESULTS, recorded so the next round doesn't retry them
      // (phase-labelled ProfileBench A/Bs, 3 runs each): the r17 shape —
      // ONE survivor-derived clamp over the whole decontaminate → pairs →
      // split → pack chain — beat every restructuring tried. (a) Running
      // the compute-dense pair/split machinery at session width: 11–12.8 s
      // vs 7.3–9.8 s wrapped (32-way trivial-task inflation, summed task
      // time 110 → 200 s). (b) Additionally materializing `decontaminated`
      // at an explicit compute-derived width (~64 docs/task, exempt from
      // AQE coalescing) so the narrow shingle stages parallelize: 11.0–12.9
      // s — the extra width costs more in scheduling than the single-core
      // shingle work it recovers at this scale. (c) Widening the clamp
      // itself (64/256 rows per partition): no task-count change — AQE's
      // byte-based coalescing collapses the tiny exchanges regardless. What
      // DID move the query: the connectedComponents convergence probe now
      // rides the round's own materialization (Lineage.materializeObserved),
      // which removed one full job per label round from the split phase.
      val loopP = Lineage.loopPartitions(s, nQuality)
      Lineage.withLoopConf(s, loopP) {
        val decontaminated = Lineage.materialize(Dedup.decontaminate(
            quality.filter(col("doc_id") % 50 =!= 0),
            quality.filter(col("doc_id") % 50 === 0), 3))
        val train = Dedup.leakageSafeSplit(decontaminated,
            pipelinePairs(decontaminated),
            Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
          .filter(col("split") === "train").select("doc_id", "text")
        val renumbered = Sampling.shuffleOrder(train, "doc_id", 8)
          .select((col("shard") * lit(4294967296L) + col("pos")).as("nid"), col("text"))
        val packed = Sampling.materializeSequences(
            Sampling.packSequences(renumbered, "nid",
              TextAnalysis.tokenCount(col("text")), 256L, 4),
            idCol = "nid")
          .select(col("shard"), col("seq_id"), col("n_docs"), col("seq_text"))
        // lazy tail binds its exchanges at the caller's action, outside
        // this wrap — materialize inside it when the clamp shrank (r17
        // Finding 7); production-scale survivors keep the lazy tail
        if (loopP < sessionP) Lineage.materialize(packed) else packed
      }
    }),

    // ----- relational extensions: as-of + binned range joins -----
    // For each purchase, the user's latest click at/before it (backward
    // inclusive as-of; ties on click time resolve to the max click event_id;
    // purchases with no prior click keep NULL asof_* columns)
    "join_asof" -> ((s, dir) => {
      val ev = EventsAdapter.rawEvents(s, dir)
      Relational.asofJoin(
        ev.filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("ts_us"), col("value")),
        ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts_us").as("c_ts"),
            col("event_id").as("c_eid"), col("value").as("c_value")),
        key = "user_id", leftTime = "ts_us", rightTime = "c_ts",
        payload = Seq("c_value"), rightTieBreak = "c_eid")
    }),
    // SKEW-SAFE as-of: the same backward as-of computed per (user, hour
    // chunk) with cross-chunk carriers — shares join_asof's oracle, so the
    // gate proves row-for-row equality with the unsalted algorithm
    "join_asof_split" -> ((s, dir) => {
      val ev = EventsAdapter.rawEvents(s, dir)
      Relational.asofJoinTimeSplit(
        ev.filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("ts_us"), col("value")),
        ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts_us").as("c_ts"),
            col("event_id").as("c_eid"), col("value").as("c_value")),
        key = "user_id", leftTime = "ts_us", rightTime = "c_ts",
        payload = Seq("c_value"), rightTieBreak = "c_eid",
        chunkUs = 3600000000L)
    }),
    // same, with a 6 h staleness tolerance: clicks older than that are
    // reported as no-match (NULL), exercising the tolerance branch
    "join_asof_tol" -> ((s, dir) => {
      val ev = EventsAdapter.rawEvents(s, dir)
      Relational.asofJoin(
        ev.filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("ts_us"), col("value")),
        ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts_us").as("c_ts"),
            col("event_id").as("c_eid"), col("value").as("c_value")),
        key = "user_id", leftTime = "ts_us", rightTime = "c_ts",
        payload = Seq("c_value"), rightTieBreak = "c_eid",
        toleranceUs = 6L * 3600 * 1000000)
    }),
    // forward direction: the user's NEXT click at/after each purchase
    // (ties → smallest click event_id)
    "join_asof_fwd" -> ((s, dir) => {
      val ev = EventsAdapter.rawEvents(s, dir)
      Relational.asofJoin(
        ev.filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("ts_us"), col("value")),
        ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts_us").as("c_ts"),
            col("event_id").as("c_eid"), col("value").as("c_value")),
        key = "user_id", leftTime = "ts_us", rightTime = "c_ts",
        payload = Seq("c_value"), rightTieBreak = "c_eid",
        direction = "forward")
    }),
    // nearest direction with a 6 h tolerance: whichever click (before or
    // after the purchase) is closer in time, ties to the backward side
    "join_asof_near" -> ((s, dir) => {
      val ev = EventsAdapter.rawEvents(s, dir)
      Relational.asofJoin(
        ev.filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("ts_us"), col("value")),
        ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts_us").as("c_ts"),
            col("event_id").as("c_eid"), col("value").as("c_value")),
        key = "user_id", leftTime = "ts_us", rightTime = "c_ts",
        payload = Seq("c_value"), rightTieBreak = "c_eid",
        toleranceUs = 6L * 3600 * 1000000, direction = "nearest")
    }),
    // purchases attributed to the user's view windows [view, view+30 min]
    // (inclusive) via the binned range join — never a cartesian; count +
    // revenue per view anchor
    "join_range" -> ((s, dir) => {
      val ev = EventsAdapter.rawEvents(s, dir)
      Relational.rangeJoinBinned(
          ev.filter(col("event_type") === "purchase")
            .select(col("user_id"), col("ts_us"), col("value")),
          ev.filter(col("event_type") === "view")
            .select(col("event_id").as("anchor_id"), col("user_id"),
              col("ts_us").as("w_start"),
              (col("ts_us") + lit(43200000000L)).as("w_end")),
          pointTime = "ts_us", startCol = "w_start", endCol = "w_end",
          // 6 h bins under 12 h intervals: each interval explodes to 2–3
          // bin rows, each point hashes to exactly one
          binWidth = 21600000000L, keys = Seq("user_id"))
        .groupBy("anchor_id")
        .agg(count(lit(1)).as("n_purchases"),
          safeRound2(sum("value")).as("sum_value"))
    }),
    // interval×interval: view windows [ts, ts+12h] overlapped with click
    // windows [ts, ts+6h] per user, via the binned overlap join (pairs meet
    // exactly once in the overlap's first bin — no dedup pass)
    "join_overlap" -> ((s, dir) => {
      val ev = EventsAdapter.rawEvents(s, dir)
      Relational.overlapJoinBinned(
          ev.filter(col("event_type") === "view")
            .select(col("event_id").as("anchor_id"), col("user_id"),
              col("ts_us").as("v_start"),
              (col("ts_us") + lit(43200000000L)).as("v_end")),
          ev.filter(col("event_type") === "click")
            .select(col("user_id"), col("ts_us").as("c_start"),
              (col("ts_us") + lit(21600000000L)).as("c_end"),
              col("value").as("c_value")),
          "v_start", "v_end", "c_start", "c_end",
          binWidth = 21600000000L, keys = Seq("user_id"))
        .groupBy("anchor_id")
        .agg(count(lit(1)).as("n_overlaps"),
          safeRound2(sum("c_value")).as("sum_value"))
    }))

  /** As-of mirror: rank the qualifying clicks per purchase and keep rank 1 —
    * backward ties broken by c_eid DESC (the operator's max-tie-break),
    * forward by (c_ts, c_eid) ASC (its min-tie-break). A purchase with no
    * qualifying click survives the LEFT JOIN as one null-extended row
    * (rn = 1, NULL asof_*) — the left-outer contract. */
  private def asofOracleSql(toleranceUs: Long,
      direction: String = "backward"): String = {
    val back = direction == "backward"
    // nearest: both directions qualify (within the symmetric tolerance) and
    // the rank is (|Δt|, backward-preferred, then the DIRECTIONAL tie-break:
    // largest c_eid among backward ties, smallest among forward)
    val tol =
      if (direction == "nearest")
        (if (toleranceUs < 0) ""
         else s"AND abs(c.c_ts - p.ts_us) <= $toleranceUs ")
      else if (toleranceUs < 0) ""
      else if (back) s"AND c.c_ts >= p.ts_us - $toleranceUs "
      else s"AND c.c_ts <= p.ts_us + $toleranceUs "
    val cond =
      if (direction == "nearest") "TRUE"
      else if (back) "c.c_ts <= p.ts_us" else "c.c_ts >= p.ts_us"
    val order =
      if (direction == "nearest")
        "abs(c.c_ts - p.ts_us) ASC NULLS LAST, " +
          "(CASE WHEN c.c_ts <= p.ts_us THEN 0 ELSE 1 END) ASC, " +
          "(CASE WHEN c.c_ts <= p.ts_us THEN -c.c_eid ELSE c.c_eid END) ASC"
      else if (back) "c.c_ts DESC NULLS LAST, c.c_eid DESC"
      else "c.c_ts ASC NULLS LAST, c.c_eid ASC"
    s"WITH p AS (SELECT event_id, user_id, $TsUs AS ts_us, value " +
      "FROM events WHERE event_type = 'purchase'), " +
      s"c AS (SELECT user_id, $TsUs AS c_ts, event_id AS c_eid, " +
      "value AS c_value FROM events WHERE event_type = 'click'), " +
      "j AS (SELECT p.event_id, p.user_id, p.ts_us, p.value, c.c_ts, c.c_value, " +
      "row_number() OVER (PARTITION BY p.event_id " +
      s"ORDER BY $order) AS rn " +
      s"FROM p LEFT JOIN c ON c.user_id = p.user_id AND $cond $tol) " +
      "SELECT event_id, user_id, ts_us, value, c_ts AS asof_c_ts, " +
      "c_value AS asof_c_value FROM j WHERE rn = 1"
  }

  /** Decontamination mirror, shared by the exact-broadcast and the
    * Bloom-pre-filter operators (identical output by construction). */
  private lazy val DecontamSql =
    s"$ShinglesCte, bench AS (SELECT DISTINCT unnest(sh) AS s FROM t " +
      "WHERE doc_id % 50 = 0), bad AS (SELECT DISTINCT c.doc_id FROM " +
      "(SELECT doc_id, unnest(sh) AS s FROM t WHERE doc_id % 50 <> 0) c " +
      "JOIN bench USING (s)) SELECT doc_id FROM documents " +
      "WHERE doc_id % 50 <> 0 AND doc_id NOT IN (SELECT doc_id FROM bad)"

  /** Registry tiers (round-11 verdict task #8): the gate grew ~12
    * queries/round, so the sweep is split into a CORE tier — full reference
    * parity (every SURVEY §2 row with a batch oracle) plus at least one
    * representative per extension family — and an EXTENDED tier (every
    * remaining variant/composition). `graft.Verify` and `graft.Bench` honor
    * `SPARK_GRAFT_TIER=core|extended|all` (default `all`: at current size
    * the full sweep is ~90 s verify + ~2 min bench, inside the driver
    * budget — the tier switch is the pressure valve for when it isn't, and
    * the fast local iteration loop today). `TierSpec` pins the invariants:
    * tiers partition the registry and every family keeps a core
    * representative. */
  val coreTier: Set[String] = Set(
    // reference parity (SURVEY §2, oracle-checkable rows)
    "s2_json_roundtrip", "f1_name_filter", "f2_dim_filter", "f3_dim_reject",
    "f4_group_presence", "f5_multi_rule", "w1_count_1h",
    "a1_sum_1d", "a2_count_1d", "a3_avg_1d", "a4_min_1d", "a5_max_1d",
    "a6_delta_1d", "a7_rate_1d", "a8_stddev_1d", "a9_p50_1d", "a10_p95_1d",
    "a11_p99_1d", "a12_anomaly",
    "p1_envelope", "r1_rollup_1d", "r2_rollup_rewindow",
    // one representative per extension family
    "dedup_exact", "dedup_minhash", "dedup_decontam", "dedup_semantic",
    "dedup_incremental",
    "sim_topk", "sim_ivfpq_topk", "sim_kmeans",
    "emb_quantize",
    "sample_pack", "sample_split", "sample_importance",
    "text_stats", "text_bpe", "text_c4_clean",
    "join_asof", "join_range",
    "sketch_kmv_distinct", "graph_pagerank", "layout_zorder",
    "eval_retrieval", "report_datacard", "w2_sliding", "train_triplets",
    "cdc_merge", "agg_cube", "drift_psi", "profile_diff",
    "mm_decode",
    "d1_sessionize", "d7_trailing",
    "audit_split_leakage",
    "pipeline_e2e")

  def extendedTier: Set[String] = queries.keySet -- coreTier

  /** The tier selected by `SPARK_GRAFT_TIER` (core|extended|all; unset =
    * all) — the single filter point Verify and Bench share. */
  def tierFilter(): String => Boolean =
    sys.env.getOrElse("SPARK_GRAFT_TIER", "all") match {
      case "core"     => coreTier.contains
      case "extended" => extendedTier.contains
      case "all"      => _ => true
      case other => throw new IllegalArgumentException(
        s"SPARK_GRAFT_TIER must be core|extended|all, got '$other'")
    }

  /** Force-materialize every plain CTE in an oracle statement. DuckDB 1.0
    * INLINES a CTE at each reference, so a chain of multiply-referenced
    * stages re-executes its whole prefix per reference — measured round 13:
    * pipeline_e2e 488 s → 0.8 s, text_chunks 38.5 s → 2.7 s from this one
    * rewrite, and the full-gate DuckDB pass dropped from ~12 min toward the
    * driver's budget (2 of the 3 prior rounds returned an EMPTY correctness
    * artifact because that pass timed out). The rewrite is purely
    * evaluation-strategy: `name AS (SELECT` → `name AS MATERIALIZED
    * (SELECT`. Recursive CTEs (which DuckDB cannot materialize) are all
    * declared with a column list — `reach(a, b) AS (` — so the \\w+ head
    * never matches them; already-materialized CTEs say `AS MATERIALIZED (`
    * and are left alone. */
  private[graft] def materializeCtes(sql: String): String =
    sql.replaceAll("(\\w+) AS \\(SELECT", "$1 AS MATERIALIZED (SELECT")

  def oracleSql: Map[String, String] =
    oracleSqlRaw.map { case (k, v) => k -> materializeCtes(v) }

  private[graft] def oracleSqlRaw: Map[String, String] = Map(
    // normalization mirror: utf8proc NFC == java.text.Normalizer NFC for
    // the fixture's chars; the scrub class is the same code-point set as
    // NormalizeText.strip (x00 unrepresentable in a VARCHAR on either side)
    "text_normalize" ->
      ("SELECT doc_id, md5(norm) AS norm_md5, " +
        "CAST(length(norm) AS BIGINT) AS n_norm, " +
        "CAST(length(raw) AS BIGINT) AS n_raw FROM (" +
        "SELECT doc_id, regexp_replace(nfc_normalize(raw), " +
        "'[\\x01-\\x08\\x0B\\x0E-\\x1F\\x{7F}-\\x{9F}\\x{200B}-\\x{200D}\\x{FEFF}]', " +
        "'', 'g') AS norm, raw FROM (" +
        "SELECT doc_id, 'Cafe' || chr(769) || ' ' || chr(8491) || ' ' || " +
        "coalesce(text, '') || ' ' || chr(8203) || 'zero' || chr(65279) || " +
        "'width ' || chr(7) || 'bell' AS raw FROM documents))"),
    "join_asof" -> asofOracleSql(toleranceUs = -1L),
    // the time-split variant must be row-for-row identical to the unsalted
    // as-of — SAME oracle, so the gate checks exactly that
    "join_asof_split" -> asofOracleSql(toleranceUs = -1L),
    "join_asof_tol" -> asofOracleSql(toleranceUs = 6L * 3600 * 1000000),
    "join_asof_fwd" -> asofOracleSql(toleranceUs = -1L, direction = "forward"),
    "join_asof_near" ->
      asofOracleSql(toleranceUs = 6L * 3600 * 1000000, direction = "nearest"),
    // range-join mirror: plain inequality join (DuckDB plans an IEJoin;
    // the Spark side's binning must not change the match set)
    "join_range" ->
      (s"WITH v AS (SELECT event_id AS anchor_id, user_id, $TsUs AS w_start " +
        "FROM events WHERE event_type = 'view'), " +
        s"b AS (SELECT user_id, $TsUs AS ts_us, value " +
        "FROM events WHERE event_type = 'purchase') " +
        "SELECT v.anchor_id, CAST(count(*) AS BIGINT) AS n_purchases, " +
        s"${sqlRound2("SUM(b.value)")} AS sum_value " +
        "FROM v JOIN b ON b.user_id = v.user_id " +
        "AND b.ts_us >= v.w_start AND b.ts_us <= v.w_start + 43200000000 " +
        "GROUP BY 1"),
    // overlap-join mirror: plain interval-overlap inequality join — the
    // Spark side's bin-and-first-bin-keep must not change the pair set
    "join_overlap" ->
      (s"WITH v AS (SELECT event_id AS anchor_id, user_id, $TsUs AS v_start, " +
        s"$TsUs + 43200000000 AS v_end FROM events WHERE event_type = 'view'), " +
        s"c AS (SELECT user_id, $TsUs AS c_start, $TsUs + 21600000000 AS c_end, " +
        "value FROM events WHERE event_type = 'click') " +
        "SELECT v.anchor_id, CAST(count(*) AS BIGINT) AS n_overlaps, " +
        s"${sqlRound2("SUM(c.value)")} AS sum_value " +
        "FROM v JOIN c ON c.user_id = v.user_id " +
        "AND v.v_start <= c.c_end AND c.c_start <= v.v_end " +
        "GROUP BY 1"),
    "s2_json_roundtrip" ->
      "SELECT event_type AS name, count(*) AS n FROM events GROUP BY 1",
    "f1_name_filter" ->
      "SELECT event_id, value FROM events WHERE event_type = 'click'",
    "f2_dim_filter" ->
      s"SELECT event_id, value FROM events WHERE event_type = 'click' AND $PropsK = '42'",
    "f3_dim_reject" ->
      (s"SELECT event_id, value FROM events WHERE event_type = 'view' " +
        s"AND NOT (COALESCE($PropsK = '7', FALSE) OR user_id % 10 = 0)"),
    "f4_group_presence" ->
      (s"SELECT ${wstart(DAY)} AS window_start, $Tenant AS tenant_id, '1' AS vip, " +
        "CAST(user_id AS VARCHAR) AS user_id, CAST(count(*) AS DOUBLE) AS value " +
        "FROM events WHERE event_type = 'signup' AND user_id % 10 = 0 GROUP BY 1, 2, 3, 4"),
    "f5_multi_rule" ->
      (s"SELECT 'agg_click_count' AS name, $Tenant AS tenant_id, " +
        s"CAST(${wstart(HOUR)} * 1000 AS DOUBLE) AS ts_ms, " +
        s"${sqlRound2("CAST(count(*) AS DOUBLE)")} AS value " +
        "FROM events WHERE event_type = 'click' GROUP BY 1, 2, 3 " +
        "UNION ALL " +
        s"SELECT 'agg_purchase_sum' AS name, $Tenant AS tenant_id, " +
        s"CAST(${wstart(DAY)} * 1000 AS DOUBLE) AS ts_ms, ${sqlRound2("SUM(value)")} AS value " +
        "FROM events WHERE event_type = 'purchase' GROUP BY 1, 2, 3"),
    "w1_count_1h" ->
      (s"SELECT ${wstart(HOUR)} AS window_start, $Tenant AS tenant_id, " +
        "CAST(count(*) AS DOUBLE) AS value FROM events WHERE event_type = 'click' GROUP BY 1, 2"),
    // sliding mirror: each event explodes to its size/slide window starts
    "w2_sliding" ->
      (s"WITH e AS (SELECT $Tenant AS tenant_id, " +
        s"($TsUs // 900000000) * 900 AS whi FROM events " +
        "WHERE event_type = 'click'), " +
        "x AS (SELECT tenant_id, " +
        "unnest(generate_series(whi - 2700, whi, 900)) AS window_start FROM e) " +
        "SELECT CAST(window_start AS BIGINT) AS window_start, tenant_id, " +
        "CAST(count(*) AS DOUBLE) AS value FROM x GROUP BY 1, 2"),
    "a1_sum_1d" -> groupedSql(sqlRound2("SUM(value)"), DAY, "purchase"),
    "a2_count_1d" -> groupedSql("CAST(count(*) AS DOUBLE)", DAY, "purchase"),
    "a3_avg_1d" -> groupedSql(sqlRound2("AVG(value)"), DAY, "purchase"),
    "a4_min_1d" -> groupedSql("MIN(value)", DAY, "purchase"),
    "a5_max_1d" -> groupedSql("MAX(value)", DAY, "purchase"),
    "a6_delta_1d" -> groupedSql(DeltaAgg, DAY, "purchase"),
    "a7_rate_1d" -> groupedSql(RateAgg, DAY, "purchase"),
    "a8_stddev_1d" -> groupedSql(sqlRound2("COALESCE(stddev_samp(value), 0.0)"), DAY, "purchase"),
    "a9_p50_1d" -> groupedSql(sqlRound2("quantile_cont(value, 0.5)"), DAY, "purchase"),
    "a10_p95_1d" -> groupedSql(sqlRound2("quantile_cont(value, 0.95)"), DAY, "purchase"),
    "a11_p99_1d" -> groupedSql(sqlRound2("quantile_cont(value, 0.99)"), DAY, "purchase"),
    "r1_rollup_1d" ->
      (s"SELECT window_start, tenant_id, ${sqlRound2("SUM(uavg)")} AS value FROM (" +
        s"SELECT ${wstart(DAY)} AS window_start, $Tenant AS tenant_id, user_id, " +
        "AVG(value) AS uavg FROM events WHERE event_type = 'purchase' " +
        "GROUP BY 1, 2, 3) GROUP BY 1, 2"),
    "r2_rollup_rewindow" ->
      (s"SELECT (hw // 86400) * 86400 AS window_start, tenant_id, " +
        s"${sqlRound2("SUM(uavg)")} AS value FROM (" +
        s"SELECT ${wstart(HOUR)} AS hw, $Tenant AS tenant_id, user_id, " +
        "AVG(value) AS uavg FROM events WHERE event_type = 'purchase' " +
        "GROUP BY 1, 2, 3) GROUP BY 1, 2"),
    "d1_sessionize" ->
      // gaps-and-islands mirror of session_window: a new session starts when
      // the gap to the previous event EXCEEDS 1 h (Spark merges sessions that
      // touch: next_start <= prev_end); event_id tie-breaks equal timestamps
      // so LAG and the running sum see the same order
      // the µs base replicates Spark's ms-double → timestamp cast bit-for-bit:
      // (((us/1e6)*1000)/1000)*1e6 truncated toward zero — the double
      // round-trip loses ~1 µs exactly where the JVM loses it
      (s"WITH e AS (SELECT $Tenant AS tenant_id, CAST(user_id AS VARCHAR) AS ukey, " +
        s"CAST(trunc((($TsMs) / 1000) * 1000000) AS BIGINT) AS us, value, event_id FROM events), " +
        "m AS (SELECT *, CASE WHEN LAG(us) OVER w IS NULL " +
        "OR us - LAG(us) OVER w > 3600000000 THEN 1 ELSE 0 END AS new_s " +
        "FROM e WINDOW w AS (PARTITION BY tenant_id, ukey ORDER BY us, event_id)), " +
        "s AS (SELECT *, SUM(new_s) OVER (PARTITION BY tenant_id, ukey " +
        "ORDER BY us, event_id ROWS UNBOUNDED PRECEDING) AS sid FROM m) " +
        "SELECT MIN(us) AS session_start_us, MAX(us) + 3600000000 AS session_end_us, " +
        "tenant_id, ukey AS user_id, CAST(count(*) AS BIGINT) AS n_events, " +
        s"${sqlRound2("SUM(value)")} AS sum_value " +
        "FROM s GROUP BY tenant_id, ukey, sid"),
    "text_pii" ->
      // counts are per redaction STAGE (IPs on email-redacted text, phones on
      // email+IP-redacted) — exactly the replacements redactPii performs
      (s"SELECT doc_id, " +
        s"CAST(len(regexp_extract_all(text, '${TextAnalysis.EmailRe}')) AS BIGINT) AS n_emails, " +
        s"CAST(len(regexp_extract_all(no_email, '${TextAnalysis.Ipv4Re}')) AS BIGINT) AS n_ips, " +
        s"CAST(len(regexp_extract_all(no_ip, '${TextAnalysis.PhoneRe}')) AS BIGINT) AS n_phones, " +
        s"md5(regexp_replace(no_ip, '${TextAnalysis.PhoneRe}', '<PHONE>', 'g')) AS redacted_md5 " +
        "FROM (SELECT doc_id, text, no_email, " +
        s"regexp_replace(no_email, '${TextAnalysis.Ipv4Re}', '<IP>', 'g') AS no_ip " +
        "FROM (SELECT doc_id, text, " +
        s"regexp_replace(text, '${TextAnalysis.EmailRe}', '<EMAIL>', 'g') AS no_email " +
        "FROM documents))"),
    "d2_heavyhitters" ->
      (s"SELECT window_start, tenant_id, user_id, n, rank FROM (" +
        "SELECT window_start, tenant_id, user_id, n, " +
        "CAST(row_number() OVER (PARTITION BY window_start, tenant_id " +
        "ORDER BY n DESC, user_id ASC) AS BIGINT) AS rank FROM (" +
        s"SELECT ${wstart(DAY)} AS window_start, $Tenant AS tenant_id, " +
        "CAST(user_id AS VARCHAR) AS user_id, count(*) AS n " +
        "FROM events GROUP BY 1, 2, 3)) WHERE rank <= 5"),
    "sample_stratified" ->
      (s"SELECT doc_id, source FROM documents WHERE $HashB < " +
        s"(CASE WHEN source = 'src0' THEN ${Sampling.Buckets} " +
        s"WHEN source = 'src1' THEN ${(0.5 * Sampling.Buckets).toLong} ELSE 0 END)"),
    "d4_distinct" ->
      (s"SELECT ${wstart(DAY)} AS window_start, $Tenant AS tenant_id, " +
        "count(DISTINCT CAST(user_id AS VARCHAR)) AS n_distinct " +
        "FROM events GROUP BY 1, 2"),
    // key-skew mirror: share = cnt / total with both sides cast to DOUBLE
    // before the divide (Spark divides two casted doubles; DuckDB's
    // HUGEINT/HUGEINT would round differently)
    "d5_keyskew" ->
      ("WITH c AS (SELECT source, count(*) AS cnt FROM documents GROUP BY source), " +
        "t AS (SELECT sum(cnt) AS total FROM c) " +
        "SELECT source, CAST(cnt AS BIGINT) AS cnt, " +
        "CAST(cnt AS DOUBLE) / CAST(total AS DOUBLE) AS share, " +
        // NULLS LAST explicit on the mirror AND asc_nulls_last on the
        // engine (Profiling.keySkew): Spark's bare asc is NULLS FIRST,
        // DuckDB's bare ASC is NULLS LAST — a NULL key at the top-N
        // boundary would otherwise diverge
        "CAST(row_number() OVER (ORDER BY cnt DESC, source ASC NULLS LAST) AS BIGINT) AS rank " +
        "FROM c, t QUALIFY rank <= 5"),
    // the salted two-stage count is count() for ANY salt assignment — the
    // oracle is the plain GROUP BY (the salt never reaches the result)
    "d6_saltedcount" ->
      "SELECT source, count(*) AS cnt FROM documents GROUP BY source",
    // Z-order mirror: the identical mask-shift Morton spread in BIGINT
    // bit arithmetic (31-bit inputs keep every intermediate positive)
    "layout_zorder" ->
      (s"SELECT event_id, ${zorderSql("user_id", s"($TsUs // 86400000000)")} AS z " +
        "FROM events"),
    // mixture mirror: identical rate arithmetic (targetTokens·wt / toks,
    // clamped at 1.0) and the shared portable hash gate
    "sample_mixture" ->
      (s"WITH tot AS (SELECT source, CAST(sum($TokN) AS DOUBLE) AS toks " +
        "FROM documents GROUP BY 1), " +
        "w AS (SELECT * FROM (VALUES ('src0', 0.5), ('src1', 0.02), " +
        "('src2', 0.9)) AS t(source, wt)), " +
        "r AS (SELECT source, least(1.0, (2000.0 * wt) / toks) AS rate " +
        "FROM tot JOIN w USING (source)) " +
        "SELECT doc_id, source FROM documents JOIN r USING (source) " +
        s"WHERE $HashB < CAST(floor(rate * 9973.0) AS BIGINT)"),
    "layout_zorder3" ->
      (s"SELECT event_id, ${zorderNSql(Seq("user_id",
        s"($TsUs // 86400000000)", s"(($TsUs // 3600000000) % 24)"), 20)} AS z " +
        "FROM events"),
    // Hilbert mirror (order 21): the per-level rotation walk as a recursive
    // CTE — rx/ry from the PRE-step x/y, the d increment's xor, the
    // reflect-and-swap, s halving to 0; identical integer arithmetic
    "layout_hilbert" ->
      ("WITH RECURSIVE hw(event_id, x, y, d, s) AS (" +
        "SELECT event_id, (user_id & 2097151) AS x, " +
        s"(($TsUs // 86400000000) & 2097151) AS y, " +
        "CAST(0 AS BIGINT) AS d, CAST(1048576 AS BIGINT) AS s FROM events " +
        "UNION ALL SELECT event_id, " +
        "CASE WHEN (y & s) <> 0 THEN x WHEN (x & s) <> 0 THEN s - 1 - y " +
        "ELSE y END AS x, " +
        "CASE WHEN (y & s) <> 0 THEN y WHEN (x & s) <> 0 THEN s - 1 - x " +
        "ELSE x END AS y, " +
        "d + s * s * CAST(xor(3 * (CASE WHEN (x & s) <> 0 THEN 1 ELSE 0 END), " +
        "CASE WHEN (y & s) <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS d, " +
        "s // 2 AS s FROM hw WHERE s > 0) " +
        "SELECT event_id, d AS h FROM hw WHERE s = 0"),
    // PageRank mirror: same edge extraction (lead over (t, event_id)),
    // then the 10 power iterations UNROLLED as CTEs with the identical
    // all-integer arithmetic — floor division everywhere, both engines
    "graph_pagerank" -> pageRankOracleSql(10, 1L << 20, 85, 100),
    // label-propagation mirror: 5 unrolled synchronous rounds
    "graph_labelprop" -> labelPropOracleSql(5),
    // negative-sampling mirror: same two-hash permutation (shard %8, order
    // by the independent seed-43 hash), +slot stride mod shard size,
    // self/true-edge filters as an ANTI JOIN
    "graph_negatives" ->
      (s"WITH ev AS (SELECT user_id, $TsUs AS t, event_id, " +
        "CAST(json_extract_string(props, '$.k') AS BIGINT) AS node FROM events " +
        "WHERE json_extract_string(props, '$.k') IS NOT NULL), " +
        "tr AS (SELECT node AS src, lead(node) OVER (" +
        "PARTITION BY user_id ORDER BY t, event_id) AS dst FROM ev), " +
        "edges AS (SELECT DISTINCT src, dst FROM tr WHERE dst IS NOT NULL), " +
        "und AS (SELECT DISTINCT src, dst FROM (SELECT src, dst FROM edges " +
        "UNION ALL SELECT dst, src FROM edges)), " +
        "nodes AS (SELECT DISTINCT node FROM (SELECT src AS node FROM edges " +
        "UNION ALL SELECT dst FROM edges)), " +
        "ord AS (SELECT node, shard, row_number() OVER (" +
        "PARTITION BY shard ORDER BY h2 ASC, node ASC) - 1 AS pos FROM (" +
        s"SELECT node, ${pmSql(hashRawSql("node"), "8")} AS shard, " +
        s"${hashRawSql("node", 43)} AS h2 FROM nodes)), " +
        "sz AS (SELECT shard, count(*) AS sz FROM ord GROUP BY 1), " +
        "cand AS (SELECT o.node AS src, o.shard, s.step, " +
        "(o.pos + s.step) % z.sz AS tpos FROM ord o JOIN sz z USING (shard), " +
        "LATERAL (SELECT unnest(generate_series(1, 3)) AS step) s), " +
        "neg AS (SELECT c.src, t.node AS neg_dst, c.step AS slot FROM cand c " +
        "JOIN ord t ON t.shard = c.shard AND t.pos = c.tpos " +
        "WHERE t.node <> c.src) " +
        "SELECT n.src, n.neg_dst, CAST(n.slot AS BIGINT) AS slot FROM neg n " +
        "ANTI JOIN und e ON e.src = n.src AND e.dst = n.neg_dst"),
    // triangle mirror: same edge extraction, then the identical
    // degree-(deg, node)-oriented wedge join + closure probe — row-value
    // comparisons replay Spark's struct comparisons field-for-field
    "graph_triangles" ->
      (s"WITH ev AS (SELECT user_id, $TsUs AS t, event_id, " +
        "CAST(json_extract_string(props, '$.k') AS BIGINT) AS node FROM events " +
        "WHERE json_extract_string(props, '$.k') IS NOT NULL), " +
        "tr AS (SELECT node AS src, lead(node) OVER (" +
        "PARTITION BY user_id ORDER BY t, event_id) AS dst FROM ev), " +
        "edges AS (SELECT DISTINCT src, dst FROM tr WHERE dst IS NOT NULL), " +
        "und AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b " +
        "FROM edges WHERE src <> dst), " +
        "deg AS (SELECT node, CAST(count(*) AS BIGINT) AS deg FROM (" +
        "SELECT a AS node FROM und UNION ALL SELECT b FROM und) GROUP BY 1), " +
        "o AS MATERIALIZED (SELECT " +
        "CASE WHEN (da.deg, u.a) < (db.deg, u.b) THEN u.a ELSE u.b END AS u, " +
        "CASE WHEN (da.deg, u.a) < (db.deg, u.b) THEN u.b ELSE u.a END AS v, " +
        "CASE WHEN (da.deg, u.a) < (db.deg, u.b) THEN db.deg ELSE da.deg END AS dv " +
        "FROM und u JOIN deg da ON da.node = u.a JOIN deg db ON db.node = u.b), " +
        "wd AS (SELECT o1.u, o1.v, o2.v AS w FROM o o1 JOIN o o2 " +
        "ON o1.u = o2.u AND (o1.dv, o1.v) < (o2.dv, o2.v)), " +
        "t AS (SELECT wd.u, wd.v, wd.w FROM wd JOIN o " +
        "ON o.u = wd.v AND o.v = wd.w) " +
        "SELECT node, CAST(count(*) AS BIGINT) AS triangles FROM (" +
        "SELECT unnest([u, v, w]) AS node FROM t) GROUP BY 1"),
    // BFS mirror: same edge extraction, then the textbook recursive CTE —
    // UNION-dedup on (node, d) pairs bounds the recursion, min(d) is the
    // hop distance (level order IS distance order on both engines)
    "graph_bfs" ->
      (s"WITH RECURSIVE $GraphDistinctEdgesSql, " +
        "srcs AS (SELECT DISTINCT node FROM (SELECT src AS node FROM edges " +
        "UNION ALL SELECT dst FROM edges) WHERE node % 20 = 0), " +
        "reach(node, d) AS (SELECT node, 0 AS d FROM srcs " +
        "UNION SELECT e.dst, r.d + 1 FROM reach r JOIN edges e " +
        "ON e.src = r.node WHERE r.d < 4) " +
        "SELECT node, CAST(min(d) AS BIGINT) AS hops FROM reach GROUP BY 1"),
    // k-core mirror: 8 unrolled peeling rounds over the symmetrized simple
    // graph — idempotent past the fixpoint, so the truncated-peeling
    // semantics match Spark's early exit exactly
    "graph_kcore" -> kcoreOracleSql(3, 8),
    // link-prediction mirror: mid-keyed wedge join under the same deg ≤
    // 4096 hub cap, exact cn / fixed-point RA, Adamic–Adar through ln()
    // absorbed by the shared stable 10⁻⁴ rounding
    "graph_linkpred" ->
      (s"WITH $GraphDistinctEdgesSql, " +
        "und AS MATERIALIZED (SELECT DISTINCT least(src, dst) AS a, " +
        "greatest(src, dst) AS b FROM edges WHERE src <> dst), " +
        "sym AS (SELECT a AS z, b AS nb FROM und " +
        "UNION ALL SELECT b AS z, a AS nb FROM und), " +
        "deg AS (SELECT z, CAST(count(*) AS BIGINT) AS deg FROM sym GROUP BY 1), " +
        "mids AS MATERIALIZED (SELECT s.z, s.nb, d.deg FROM sym s " +
        "JOIN deg d ON s.z = d.z AND d.deg <= 4096), " +
        "wd AS (SELECT m1.nb AS a, m2.nb AS b, m1.deg FROM mids m1 " +
        "JOIN mids m2 ON m1.z = m2.z AND m1.nb < m2.nb), " +
        "sc AS (SELECT a, b, CAST(count(*) AS BIGINT) AS cn, " +
        "CAST(sum(1000000 // deg) AS BIGINT) AS ra_fp, " +
        "sum(1.0 / ln(CAST(deg AS DOUBLE))) AS aa FROM wd GROUP BY 1, 2 " +
        "HAVING count(*) >= 2) " +
        "SELECT sc.a, sc.b, sc.cn, sc.ra_fp, " +
        s"${sqlRound4("sc.aa")} AS aa FROM sc " +
        "WHERE NOT EXISTS (SELECT 1 FROM und u WHERE u.a = sc.a AND u.b = sc.b)"),
    // KMV distinct mirror: k smallest distinct portable hashes per type,
    // then the identical all-integer estimator ((k−1)·P // (h_k+1); exact
    // count when fewer than k distinct hashes exist)
    "sketch_kmv_distinct" ->
      (s"WITH h AS (SELECT event_type, ${hashRawSql("user_id")} AS h FROM events), " +
        "d AS (SELECT DISTINCT event_type, h FROM h), " +
        "r AS (SELECT event_type, h, row_number() OVER (" +
        "PARTITION BY event_type ORDER BY h) AS rk FROM d), " +
        "s AS (SELECT event_type, count(*) AS m, max(h) AS hk FROM r " +
        "WHERE rk <= 64 GROUP BY 1) " +
        "SELECT event_type, CAST(CASE WHEN m < 64 THEN m " +
        "ELSE (CAST(63 AS BIGINT) * 2147483647) // (hk + 1) END AS BIGINT) " +
        "AS est_distinct FROM s"),
    // portable-HLL mirror: registers + the all-integer estimator, LUT and
    // alpha generated from the same Scala source of truth as the engine
    "sketch_hll_distinct" -> hllOracleSql(8),
    // AMS mirror: the same 40 polyHash sign bits, counter sums, squares,
    // floor-divided means, and odd-count median — integer end to end
    "sketch_ams_f2" -> amsF2OracleSql(8, 5),
    // histogram-quantile mirror: identical bin clamp, cumulative bin
    // counts, and ceil(q·n) rank threshold; the SELECTed edge expression
    // (lo + bin·width) matches the Spark op sequence IEEE-for-IEEE
    "sketch_hist_quantile" ->
      ("WITH b AS (SELECT event_type, CAST(least(greatest(floor((value - 0.0) / 10.0), " +
        "0), 63) AS BIGINT) AS bin FROM events), " +
        "c AS (SELECT event_type, bin, count(*) AS cnt FROM b GROUP BY 1, 2), " +
        "w AS (SELECT event_type, bin, CAST(sum(cnt) OVER (PARTITION BY event_type " +
        "ORDER BY bin ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum, " +
        "CAST(sum(cnt) OVER (PARTITION BY event_type) AS BIGINT) AS n FROM c) " +
        "SELECT event_type, " +
        "min(CASE WHEN cum >= CAST(ceil(0.5 * n) AS BIGINT) THEN 0.0 + bin * 10.0 END) AS p50, " +
        "min(CASE WHEN cum >= CAST(ceil(0.95 * n) AS BIGINT) THEN 0.0 + bin * 10.0 END) AS p95, " +
        "min(CASE WHEN cum >= CAST(ceil(0.99 * n) AS BIGINT) THEN 0.0 + bin * 10.0 END) AS p99 " +
        "FROM w GROUP BY 1"),
    // KMV overlap mirror: per-source bottom-128 over signed shingle hashes,
    // the pair's union bottom-128, and n_both/n_union_k — row_number over
    // the DISTINCT hash set == the Spark side's dense_rank over raw rows
    "sketch_kmv_overlap" ->
      (s"WITH t AS (SELECT source, unnest(list_distinct(${ngramsOfToks(3)})) AS sh " +
        s"FROM (SELECT source, string_split_regex(trim(text, '$SqlWs'), '\\s+') AS toks " +
        "FROM documents)), " +
        "dsh AS (SELECT DISTINCT source, sh FROM t), " +
        polyHashSteps("source", "sh", "dsh", "ph_ov") + ", " +
        s"hs AS (SELECT source, ${signedSql("h")} AS h FROM ph_ov), " +
        "dd AS (SELECT DISTINCT source, h FROM hs), " +
        "sk AS (SELECT source, h FROM (SELECT source, h, row_number() OVER (" +
        "PARTITION BY source ORDER BY h) AS rk FROM dd) WHERE rk <= 128), " +
        "pr AS (SELECT a.source AS g_a, b.source AS g_b FROM " +
        "(SELECT DISTINCT source FROM sk) a JOIN (SELECT DISTINCT source FROM sk) b " +
        "ON a.source < b.source), " +
        "mem AS (SELECT p.g_a, p.g_b, s.h, " +
        "max(CASE WHEN s.source = p.g_a THEN 1 ELSE 0 END) AS ina, " +
        "max(CASE WHEN s.source = p.g_b THEN 1 ELSE 0 END) AS inb " +
        "FROM pr p JOIN sk s ON s.source IN (p.g_a, p.g_b) GROUP BY 1, 2, 3), " +
        "top AS (SELECT * FROM (SELECT g_a, g_b, h, ina, inb, row_number() OVER (" +
        "PARTITION BY g_a, g_b ORDER BY h) AS rk FROM mem) WHERE rk <= 128) " +
        "SELECT g_a, g_b, CAST(count(*) AS BIGINT) AS n_union_k, " +
        "CAST(sum(ina * inb) AS BIGINT) AS n_both, " +
        "CAST(sum(ina * inb) AS DOUBLE) / count(*) AS jaccard_est " +
        "FROM top GROUP BY 1, 2"),
    // CDC merge mirror: same changeset derivation, replayed as the
    // union + precedence-top-1 the Spark side runs (changes win over base,
    // deletes drop the key)
    "cdc_merge" ->
      ("WITH base AS (SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice FROM orders), " +
        s"ch AS (SELECT o_orderkey, o_custkey, o_orderstatus, ${sqlRound2("o_totalprice * 1.1")} AS o_totalprice, " +
        "FALSE AS del FROM base WHERE o_orderkey % 10 = 3 " +
        "UNION ALL SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, TRUE FROM base WHERE o_orderkey % 10 = 7 " +
        "UNION ALL SELECT o_orderkey + 1000000, o_custkey, 'N', o_totalprice, FALSE FROM base WHERE o_orderkey % 10 = 1), " +
        "u AS (SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, 0 AS prec, FALSE AS del FROM base " +
        "UNION ALL SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, 1, del FROM ch), " +
        "r AS (SELECT *, row_number() OVER (PARTITION BY o_orderkey ORDER BY prec DESC) AS rn FROM u) " +
        s"SELECT o_orderkey, o_custkey, o_orderstatus, ${sqlRound2("o_totalprice")} AS o_totalprice " +
        "FROM r WHERE rn = 1 AND NOT del"),
    // snapshot-diff mirror: FULL OUTER JOIN on the key, null-safe compare
    // (IS NOT DISTINCT FROM ≡ Spark's <=>), unchanged keys dropped
    "cdc_diff" ->
      ("WITH o AS (SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders WHERE o_orderkey % 7 <> 0), " +
        s"n AS (SELECT o_orderkey, CASE WHEN o_orderkey % 3 = 0 THEN ${sqlRound2("o_totalprice * 1.05")} " +
        "ELSE o_totalprice END AS o_totalprice, o_orderstatus FROM orders WHERE o_orderkey % 5 <> 0) " +
        "SELECT COALESCE(n.o_orderkey, o.o_orderkey) AS o_orderkey, " +
        "CASE WHEN o.o_orderkey IS NULL THEN 'added' WHEN n.o_orderkey IS NULL THEN 'removed' " +
        "ELSE 'changed' END AS change, " +
        "o.o_totalprice AS old_o_totalprice, n.o_totalprice AS new_o_totalprice, " +
        "o.o_orderstatus AS old_o_orderstatus, n.o_orderstatus AS new_o_orderstatus " +
        "FROM o FULL OUTER JOIN n ON o.o_orderkey = n.o_orderkey " +
        "WHERE o.o_orderkey IS NULL OR n.o_orderkey IS NULL OR NOT (" +
        "o.o_totalprice IS NOT DISTINCT FROM n.o_totalprice " +
        "AND o.o_orderstatus IS NOT DISTINCT FROM n.o_orderstatus)"),
    // SCD-2 mirror: identical version-boundary lag (a boundary row IS its
    // version's first observation), then lead() over the boundary survivors
    // — SQL window functions evaluate after WHERE on both engines
    "cdc_scd2" ->
      (s"WITH e AS (SELECT user_id, $TsUs AS ts_us, event_type, event_id FROM events), " +
        "v AS (SELECT user_id, ts_us, event_id, event_type, " +
        "(lag(ts_us) OVER w IS NULL " +
        "OR (event_type IS DISTINCT FROM lag(event_type) OVER w)) AS b " +
        "FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)) " +
        "SELECT user_id, event_type, ts_us AS valid_from, " +
        "lead(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS valid_to " +
        "FROM v WHERE b"),
    // CUBE mirror: DuckDB GROUPING(a, b) packs bits leftmost-most-significant
    // exactly like Spark's grouping_id(); integer cents keep the grand-total
    // sum order-independent
    "agg_cube" ->
      ("SELECT event_type, user_id % 3 AS user_band, " +
        "CAST(GROUPING(event_type, user_band) AS BIGINT) AS gid, " +
        "CAST(count(*) AS BIGINT) AS n, " +
        "CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents " +
        "FROM events GROUP BY CUBE(event_type, user_band)"),
    // fuzzy-join mirror: DuckDB's levenshtein is the same unit-cost edit
    // distance; the all-pairs form is the ground truth the deletion-
    // neighborhood candidates must reproduce exactly
    "join_editdist" ->
      ("WITH d AS (SELECT DISTINCT p_name FROM part) " +
        "SELECT a.p_name AS name_a, b.p_name AS name_b, " +
        "CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist " +
        "FROM d a JOIN d b ON a.p_name < b.p_name " +
        "WHERE levenshtein(a.p_name, b.p_name) <= 2"),
    // MAD mirror: DuckDB median == quantile_cont(0.5) == Spark's exact
    // interpolated median; score association pinned op-for-op, flag from
    // the SAME rounded score (boundary-stable, as a12)
    "a13_mad" ->
      (s"$DenseGridCtes, ser AS (SELECT g.window_start, g.tenant_id, " +
        "COALESCE(a.v, 0.0) AS value FROM g LEFT JOIN a " +
        "ON g.tenant_id = a.tenant_id AND g.window_start = a.window_start), " +
        "z AS (SELECT window_start, tenant_id, value, " +
        "median(value) OVER (PARTITION BY tenant_id) AS m FROM ser), " +
        "z2 AS (SELECT window_start, tenant_id, value, m, " +
        "median(abs(value - m)) OVER (PARTITION BY tenant_id) AS mad FROM z) " +
        "SELECT window_start, tenant_id, value, " +
        s"${sqlRound2("CASE WHEN mad > 0 THEN (value - m) / (1.4826 * mad) ELSE 0.0 END")} AS mad_z, " +
        s"(abs(${sqlRound2("CASE WHEN mad > 0 THEN (value - m) / (1.4826 * mad) ELSE 0.0 END")}) > 3.5) " +
        "AS is_anomaly FROM z2"),
    // PMI mirror: positional (not distinct) n-gram counts, corpus totals,
    // and the SAME left-associated double quotient inside ln()
    "text_pmi" ->
      (s"WITH dtk AS (SELECT string_split_regex(trim(text, '$SqlWs'), '\\s+') AS toks " +
        "FROM documents), " +
        "uni AS (SELECT unnest(toks) AS w FROM dtk), " +
        "u2 AS (SELECT w FROM uni WHERE w <> ''), " +
        "wc AS (SELECT w, count(*) AS n_w FROM u2 GROUP BY 1), " +
        "tw AS (SELECT count(*) AS n_tot_words FROM u2), " +
        s"bi AS (SELECT unnest(${ngramsOfToks(2)}) AS pair FROM dtk WHERE len(toks) >= 2), " +
        "pc AS (SELECT pair, count(*) AS n_pair FROM bi GROUP BY 1 HAVING count(*) >= 5), " +
        "tp AS (SELECT count(*) AS n_tot_pairs FROM bi) " +
        "SELECT string_split(pair, ' ')[1] AS w1, string_split(pair, ' ')[2] AS w2, " +
        "CAST(n_pair AS BIGINT) AS n_pair, " +
        "(floor((ln((CAST(n_pair AS DOUBLE) * n_tot_words * n_tot_words) / " +
        "(CAST(n_tot_pairs AS DOUBLE) * c1.n_w * c2.n_w))) * 10000 + 0.499999) / 10000) AS pmi " +
        "FROM pc CROSS JOIN tp CROSS JOIN tw " +
        "JOIN wc c1 ON c1.w = string_split(pair, ' ')[1] " +
        "JOIN wc c2 ON c2.w = string_split(pair, ' ')[2]"),
    // Count-Min mirror: the same portable-hash rows (seeds 1..4) rebuilt
    // cell-for-cell, probed with a LEFT JOIN and min-over-rows
    "sketch_cms" -> {
      val unions = (0 until 4).map { i =>
        s"SELECT $i AS r, ${pmSql(hashRawSql("user_id", i + 1), "32")} AS b FROM events"
      }.mkString(" UNION ALL ")
      val probes = (0 until 4).map { i =>
        s"SELECT user_id, $i AS r, ${pmSql(hashRawSql("user_id", i + 1), "32")} AS b FROM pr"
      }.mkString(" UNION ALL ")
      s"WITH cells AS (SELECT r, b, count(*) AS cnt FROM ($unions) GROUP BY 1, 2), " +
        "pr AS (SELECT DISTINCT user_id FROM events), " +
        s"pb AS ($probes) " +
        "SELECT user_id, CAST(min(COALESCE(cnt, 0)) AS BIGINT) AS est " +
        "FROM pb LEFT JOIN cells USING (r, b) GROUP BY 1"
    },
    "emb_pca" -> pcaOracleSql(64, 2, 30),
    // fuzzy-cluster mirror: recursive closure over the levenshtein pair
    // set (the dedup_cluster pattern on string ids)
    "join_editdist_cluster" ->
      ("WITH RECURSIVE d AS (SELECT DISTINCT p_name FROM part), " +
        "p AS (SELECT a.p_name AS name_a, b.p_name AS name_b FROM d a JOIN d b " +
        "ON a.p_name < b.p_name WHERE levenshtein(a.p_name, b.p_name) <= 2), " +
        "edges AS (SELECT name_a AS src, name_b AS dst FROM p " +
        "UNION SELECT name_b, name_a FROM p), " +
        "reach(a, b) AS (SELECT src, dst FROM edges " +
        "UNION SELECT r.a, e.dst FROM reach r JOIN edges e ON r.b = e.src), " +
        "comp AS (SELECT a AS name, least(a, min(b)) AS canonical FROM reach GROUP BY a) " +
        "SELECT name, canonical FROM comp"),
    // qnorm mirror: identical percent_rank over the shared QualitySql score
    "text_quality_qnorm" ->
      (s"SELECT doc_id, source, percent_rank() OVER (" +
        s"PARTITION BY source ORDER BY $QualitySql) AS qnorm FROM documents"),
    // OOV mirror: identical (cnt DESC, token ASC) top-16 vocab cut,
    // exact per-doc counts and integer-ratio fraction
    "text_oov" ->
      (s"WITH vocab AS (SELECT t FROM (SELECT t, count(*) AS cnt FROM (" +
        s"SELECT unnest($RawToks) AS t FROM documents) WHERE t <> '' GROUP BY t) " +
        "ORDER BY cnt DESC, t ASC LIMIT 16), " +
        s"tk AS (SELECT doc_id, t FROM (SELECT doc_id, unnest($RawToks) AS t " +
        "FROM documents) WHERE t <> '') " +
        "SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens, " +
        "CAST(sum(CASE WHEN t IN (SELECT t FROM vocab) THEN 0 ELSE 1 END) AS BIGINT) AS n_oov, " +
        "CAST(sum(CASE WHEN t IN (SELECT t FROM vocab) THEN 0 ELSE 1 END) AS DOUBLE) / " +
        "CAST(count(*) AS DOUBLE) AS oov_frac FROM tk GROUP BY 1"),
    // code-stats mirror: same decoration, newline split with empties kept,
    // exact integer ratios throughout (no rounding anywhere)
    "text_code_stats" ->
      ("WITH d AS (SELECT doc_id, COALESCE(text, '') || chr(10) || '  indented' || chr(10) || " +
        "substr(COALESCE(text, ''), 1, CAST(doc_id % 40 AS INT)) AS t FROM documents), " +
        "l AS (SELECT doc_id, t, string_split(t, chr(10)) AS lines FROM d) " +
        "SELECT doc_id, CAST(len(lines) AS BIGINT) AS n_lines, " +
        "CAST(list_max([len(x) for x in lines]) AS BIGINT) AS max_line_len, " +
        "CAST(list_sum([len(x) for x in lines]) AS DOUBLE) / CAST(len(lines) AS DOUBLE) AS avg_line_len, " +
        "CASE WHEN len(t) > 0 THEN CAST(len(regexp_replace(t, '[^a-zA-Z0-9]', '', 'g')) AS DOUBLE) / " +
        "CAST(len(t) AS DOUBLE) ELSE 0.0 END AS alnum_frac, " +
        "CAST(len(list_filter(lines, x -> starts_with(x, ' ') OR starts_with(x, chr(9)))) AS DOUBLE) / " +
        "CAST(len(lines) AS DOUBLE) AS indent_frac FROM l"),
    // PSI mirror: same Laplace-smoothed shares ((n+1)/(tot+k)) over the
    // full-outer bucket join, association-pinned (q−p)·ln(q/p)
    // KS mirror: distinct-value cumulative counts, integer cross products,
    // one terminal division
    "drift_ks" ->
      ("WITH u AS (SELECT least(n_chars // 100, 19) AS v, " +
        "CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END AS a, " +
        "CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 0 END AS b FROM documents), " +
        "g AS (SELECT v, sum(a) AS na, sum(b) AS nb FROM u GROUP BY v), " +
        "c AS (SELECT sum(na) OVER (ORDER BY v) AS ca, " +
        "sum(nb) OVER (ORDER BY v) AS cb FROM g), " +
        "t AS (SELECT sum(na) AS n, sum(nb) AS m FROM g) " +
        "SELECT CAST(max(n) AS BIGINT) AS n, CAST(max(m) AS BIGINT) AS m, " +
        "CAST(max(abs(ca * m - cb * n)) AS BIGINT) AS ks_num, " +
        "CAST(max(abs(ca * m - cb * n)) AS DOUBLE) / " +
        "CAST(max(n) * max(m) AS DOUBLE) AS ks FROM c, t"),
    "drift_psi" ->
      (s"WITH o AS (SELECT bucket, count(*) AS n_old FROM (" +
        "SELECT least(n_chars // 100, 19) AS bucket " +
        "FROM documents WHERE doc_id % 2 = 0) GROUP BY 1), " +
        "nn AS (SELECT bucket, count(*) AS n_new FROM (" +
        "SELECT least(n_chars // 100, 19) AS bucket " +
        "FROM documents WHERE doc_id % 2 = 1) GROUP BY 1), " +
        "j AS (SELECT COALESCE(o.bucket, nn.bucket) AS bucket, " +
        "COALESCE(n_old, 0) AS n_old, COALESCE(n_new, 0) AS n_new " +
        "FROM o FULL OUTER JOIN nn ON o.bucket = nn.bucket), " +
        "t AS (SELECT bucket, n_old, n_new, sum(n_old) OVER () AS tot_old, " +
        "sum(n_new) OVER () AS tot_new, count(*) OVER () AS k FROM j) " +
        "SELECT CAST(bucket AS BIGINT) AS bucket, CAST(n_old AS BIGINT) AS n_old, " +
        "CAST(n_new AS BIGINT) AS n_new, " +
        "(floor(((CAST(n_new + 1 AS DOUBLE) / CAST(tot_new + k AS DOUBLE) - " +
        "CAST(n_old + 1 AS DOUBLE) / CAST(tot_old + k AS DOUBLE)) * " +
        "ln((CAST(n_new + 1 AS DOUBLE) / CAST(tot_new + k AS DOUBLE)) / " +
        "(CAST(n_old + 1 AS DOUBLE) / CAST(tot_old + k AS DOUBLE)))) * 10000 + 0.499999) / 10000) AS psi_contrib " +
        "FROM t"),
    // multi-query BM25 mirror: shared postings over the distinct query-term
    // set, per-(query, doc) round-4 scores, rank on the ROUNDED score (the
    // operator's libm/sum-order defense) with doc-id tie-break
    "text_bm25_topk" ->
      (s"WITH $Bm25TopkCtes " +
        "SELECT query_id, doc_id, n_hits, score, rank FROM rk WHERE rank <= 5"),
    // ranking-metrics mirror: conjunctive ground truth (doc holds EVERY
    // query term), integer hit counts, single-division ratios, and the
    // same rank-ordered 0.0-seeded DCG folds (round-4 absorbs log2 ulps)
    "eval_retrieval" ->
      (s"WITH $Bm25TopkCtes, " +
        "qn AS (SELECT query_id, count(DISTINCT term) AS nt FROM q GROUP BY 1), " +
        "dt AS (SELECT DISTINCT doc_id, tok FROM toks JOIN terms ON tok = term), " +
        "rel AS (SELECT query_id, doc_id FROM dt JOIN q ON q.term = dt.tok " +
        "JOIN qn USING (query_id) GROUP BY query_id, doc_id " +
        "HAVING count(*) = max(nt)), " +
        rankingMetricsSql("rk", "rel", "doc_id", 5)),
    // Matryoshka-style ANN eval: the SAME metric block over half-dim
    // truncated-cosine top-k (ranked) vs full-dim top-k (ground truth)
    "eval_ann_trunc" ->
      ("WITH fullr AS (SELECT query_id, neighbor_id FROM (" +
        "SELECT q.vec_id AS query_id, b.vec_id AS neighbor_id, " +
        "row_number() OVER (PARTITION BY q.vec_id ORDER BY " +
        "list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) DESC, " +
        "b.vec_id ASC) AS rank " +
        "FROM embeddings q, embeddings b WHERE q.vec_id < 10 AND b.vec_id <> q.vec_id) " +
        "WHERE rank <= 5), " +
        "tr AS (SELECT query_id, neighbor_id, rank FROM (" +
        "SELECT q.vec_id AS query_id, b.vec_id AS neighbor_id, " +
        "CAST(row_number() OVER (PARTITION BY q.vec_id ORDER BY " +
        "list_cosine_similarity((CAST(q.embedding AS DOUBLE[]))[1:32], " +
        "(CAST(b.embedding AS DOUBLE[]))[1:32]) DESC, " +
        "b.vec_id ASC) AS BIGINT) AS rank " +
        "FROM embeddings q, embeddings b WHERE q.vec_id < 10 AND b.vec_id <> q.vec_id) " +
        "WHERE rank <= 5), " +
        rankingMetricsSql("tr", "fullr", "neighbor_id", 5)),
    // decayed-count mirror: same whole-half-life buckets (// floors like
    // div on the non-negative ages), same 2^(30−b) long contributions
    "d9_decayed" ->
      (s"WITH r AS (SELECT max($TsUs) AS ref FROM events), " +
        s"bb AS (SELECT event_type, (ref - $TsUs) // 604800000000 AS b " +
        "FROM events CROSS JOIN r), " +
        "s AS (SELECT event_type, sum(CASE WHEN b BETWEEN 0 AND 30 THEN " +
        "(CAST(1 AS BIGINT) << CAST(30 - b AS INT)) ELSE CAST(0 AS BIGINT) END) AS fp " +
        "FROM bb GROUP BY 1) " +
        "SELECT event_type, CAST(fp AS BIGINT) AS decayed_fp, " +
        "CAST(fp AS DOUBLE) / CAST(1073741824 AS DOUBLE) AS decayed FROM s"),
    // funnel mirror: per-step earliest-qualifying-event mins through LEFT
    // joins — NULLs propagate exactly like the operator's when() guard
    // dropout mirror: the same positional hash gate inside a filtered list
    // comprehension (engine index is 0-based — hence i − 1)
    "text_augment" ->
      (s"WITH t AS (SELECT doc_id, $RawToks AS toks FROM documents), " +
        "k AS (SELECT doc_id, toks, [toks[i] for i in " +
        "generate_series(1, len(toks)) if " +
        s"(${hashRawSql("(doc_id * 1000003 + (i - 1))")}) % 100 >= 10] AS kept " +
        "FROM t) " +
        "SELECT doc_id, array_to_string(kept, ' ') AS text_aug, " +
        "CAST(len(kept) AS BIGINT) AS n_kept, " +
        "CAST(len(toks) - len(kept) AS BIGINT) AS n_dropped FROM k"),
    // temporal-split mirror: same bucket counts, the same integer-exact
    // mass-point pick, the same three-zone case
    "sample_split_time" ->
      (s"WITH b AS (SELECT event_id, $TsUs // 86400000000 AS d FROM events), " +
        "cc AS (SELECT d, count(*) AS w FROM b GROUP BY 1), " +
        "cw AS (SELECT d, sum(w) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING) AS cum, " +
        "sum(w) OVER () AS tot FROM cc), " +
        "ct AS (SELECT min(CASE WHEN cum * 5 >= tot * 4 THEN d END) AS cut FROM cw) " +
        "SELECT event_id, CASE WHEN d <= cut - 1 THEN 'train' " +
        "WHEN d <= cut THEN 'embargo' ELSE 'test' END AS split " +
        "FROM b CROSS JOIN ct"),
    // weighted-median mirror: same running-frame cumulative weight and
    // integer cross-product threshold
    "a14_wmedian" ->
      ("WITH b AS (SELECT event_type, value AS v, " +
        "CAST(user_id % 5 + 1 AS BIGINT) AS w FROM events), " +
        "c AS (SELECT event_type, v, sum(w) OVER (PARTITION BY event_type " +
        "ORDER BY v ROWS UNBOUNDED PRECEDING) AS cum, " +
        "sum(w) OVER (PARTITION BY event_type) AS tot FROM b) " +
        "SELECT event_type, min(CASE WHEN cum * 2 >= tot * 1 THEN v END) AS wq " +
        "FROM c GROUP BY 1"),
    // pivot mirror: CASE-sum columns over the same grouped aggregate
    "agg_pivot" ->
      (s"SELECT $Tenant AS tenant_id, " +
        Seq("click", "error", "purchase", "signup", "view").map(t =>
          s"CAST(sum(CASE WHEN event_type = '$t' THEN 1 ELSE 0 END) AS BIGINT) AS \"$t\"")
          .mkString(", ") +
        " FROM events GROUP BY 1"),
    // association mirror: same distinct baskets, pair join, and
    // single-division stats over exact counts
    "d12_assoc" ->
      (s"WITH bk AS (SELECT DISTINCT user_id, $TsUs // 86400000000 AS day, " +
        "event_type AS item FROM events), " +
        "nb AS (SELECT CAST(count(*) AS BIGINT) AS n FROM (" +
        "SELECT DISTINCT user_id, day FROM bk)), " +
        "ic AS (SELECT item, CAST(count(*) AS BIGINT) AS ni FROM bk GROUP BY 1), " +
        "pr AS (SELECT a.item AS item_a, b.item AS item_b, " +
        "CAST(count(*) AS BIGINT) AS n_ab FROM bk a JOIN bk b " +
        "ON a.user_id = b.user_id AND a.day = b.day AND a.item < b.item " +
        "GROUP BY 1, 2) " +
        "SELECT item_a, item_b, n_ab, ia.ni AS n_a, ib.ni AS n_b, " +
        "ROUND(CAST(n_ab AS DOUBLE) / CAST(nb.n AS DOUBLE), 4) AS support, " +
        "ROUND(CAST(n_ab AS DOUBLE) / CAST(ia.ni AS DOUBLE), 4) AS confidence_ab, " +
        "ROUND(CAST(n_ab * nb.n AS DOUBLE) / CAST(ia.ni * ib.ni AS DOUBLE), 4) AS lift " +
        "FROM pr JOIN ic ia ON ia.item = pr.item_a " +
        "JOIN ic ib ON ib.item = pr.item_b CROSS JOIN nb"),
    // trend mirror: the same five exact sums and the same IEEE sequence
    // (slope once, intercept from it)
    "d11_trend" ->
      (s"WITH daily AS (SELECT $Tenant AS tenant_id, " +
        s"$TsUs // 86400000000 AS day, CAST(count(*) AS BIGINT) AS y " +
        "FROM events GROUP BY 1, 2), " +
        "st AS (SELECT tenant_id, CAST(count(*) AS BIGINT) AS n_points, " +
        "sum(day) AS sx, sum(y) AS sy, sum(day * y) AS sxy, " +
        "sum(day * day) AS sxx FROM daily GROUP BY 1) " +
        "SELECT tenant_id, n_points, ROUND(slope, 4) AS slope, " +
        "ROUND(CASE WHEN slope IS NULL THEN NULL ELSE " +
        "(CAST(sy AS DOUBLE) - slope * CAST(sx AS DOUBLE)) / n_points END, 4) " +
        "AS intercept FROM (SELECT *, " +
        "CASE WHEN n_points * sxx - sx * sx <> 0 THEN " +
        "CAST(n_points * sxy - sx * sy AS DOUBLE) / " +
        "CAST(n_points * sxx - sx * sx AS DOUBLE) END AS slope FROM st)"),
    // profile-diff mirror: one UNION-ALL profile block per column per side,
    // full-outer joined on the column name; min/max as DOUBLE on both sides
    "profile_diff" -> {
      def prof(src: String, pfx: String): String =
        Seq("o_orderkey", "o_custkey", "o_totalprice").map { c =>
          s"SELECT '$c' AS column, CAST(count(*) AS BIGINT) AS ${pfx}_n_rows, " +
            s"CAST(count(*) - count($c) AS BIGINT) AS ${pfx}_n_nulls, " +
            s"CAST(count(DISTINCT $c) AS BIGINT) AS ${pfx}_n_distinct, " +
            s"CAST(min($c) AS DOUBLE) AS ${pfx}_min, " +
            s"CAST(max($c) AS DOUBLE) AS ${pfx}_max FROM $src"
        }.mkString(" UNION ALL ")
      "WITH base AS (SELECT o_orderkey, o_custkey, o_totalprice FROM orders), " +
        "o AS (SELECT * FROM base WHERE o_orderkey % 7 <> 0), " +
        s"n AS (SELECT o_orderkey, o_custkey, CASE WHEN o_orderkey % 3 = 0 " +
        s"THEN ${sqlRound2("o_totalprice * 1.05")} ELSE o_totalprice END AS o_totalprice " +
        "FROM base WHERE o_orderkey % 5 <> 0), " +
        s"po AS (${prof("o", "old")}), pn AS (${prof("n", "new")}) " +
        "SELECT po.column, old_n_rows, old_n_nulls, old_n_distinct, old_min, old_max, " +
        "new_n_rows, new_n_nulls, new_n_distinct, new_min, new_max " +
        "FROM po FULL OUTER JOIN pn ON po.column = pn.column"
    },
    // retention mirror: distinct (user, day), min-day cohort, (cohort, age)
    // counts, cohort-size join — both engines' integer division truncates
    // toward zero identically (ts >= 0 in this fixture)
    "d10_retention" ->
      (s"WITH ud AS (SELECT DISTINCT user_id AS k, $TsUs // 86400000000 AS d " +
        "FROM events), " +
        "ch AS (SELECT k, min(d) AS c FROM ud GROUP BY 1), " +
        "act AS (SELECT c AS cohort_bucket, d - c AS age, " +
        "CAST(count(*) AS BIGINT) AS n_active FROM ud JOIN ch USING (k) " +
        "GROUP BY 1, 2), " +
        "sz AS (SELECT c AS cohort_bucket, CAST(count(*) AS BIGINT) AS n_cohort " +
        "FROM ch GROUP BY 1) " +
        "SELECT a.cohort_bucket, a.age, a.n_active, s.n_cohort, " +
        "CAST(a.n_active AS DOUBLE) / s.n_cohort AS retention " +
        "FROM act a JOIN sz s USING (cohort_bucket)"),
    "d8_funnel" ->
      (s"WITH s1 AS (SELECT user_id, min($TsUs) AS step_1_us FROM events " +
        "WHERE event_type = 'view' GROUP BY 1), " +
        "s2 AS (SELECT s1.user_id, s1.step_1_us, " +
        s"min(CASE WHEN $TsUs >= s1.step_1_us AND $TsUs <= s1.step_1_us + 604800000000 " +
        s"THEN $TsUs END) AS step_2_us " +
        "FROM s1 LEFT JOIN events e ON e.user_id = s1.user_id " +
        "AND e.event_type = 'click' GROUP BY 1, 2), " +
        "s3 AS (SELECT s2.user_id, s2.step_1_us, s2.step_2_us, " +
        s"min(CASE WHEN $TsUs >= s2.step_2_us AND $TsUs <= s2.step_2_us + 604800000000 " +
        s"THEN $TsUs END) AS step_3_us " +
        "FROM s2 LEFT JOIN events e ON e.user_id = s2.user_id " +
        "AND e.event_type = 'purchase' GROUP BY 1, 2, 3) " +
        "SELECT user_id, step_1_us, step_2_us, step_3_us, " +
        "CAST((CASE WHEN step_1_us IS NOT NULL THEN 1 ELSE 0 END) + " +
        "(CASE WHEN step_2_us IS NOT NULL THEN 1 ELSE 0 END) + " +
        "(CASE WHEN step_3_us IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_steps " +
        "FROM s3"),
    // trailing-window mirror: integer-exact day buckets, RANGE frame of
    // 6 preceding buckets; safeRound2 absorbs the window-sum order delta.
    // The bucket is FLOOR division spelled out (`//` truncates toward zero
    // in DuckDB, exactly like Spark's `div`) — same adjustment as
    // GapFill.trailingAggregate, a no-op for the positive-epoch testdata
    "d7_trailing" ->
      ("WITH b AS (SELECT user_id, " +
        s"((($TsUs // 86400000000) + (CASE WHEN $TsUs % 86400000000 < 0 " +
        "THEN -1 ELSE 0 END)) * 86400000000) AS bucket_start, " +
        "count(*) AS n_events, SUM(value) AS bsum " +
        "FROM events WHERE event_type = 'purchase' GROUP BY 1, 2) " +
        "SELECT user_id, bucket_start, CAST(n_events AS BIGINT) AS n_events, " +
        "CAST(SUM(n_events) OVER w AS BIGINT) AS trail_n, " +
        s"${sqlRound2("SUM(bsum) OVER w")} AS trail_sum " +
        "FROM b WINDOW w AS (PARTITION BY user_id ORDER BY bucket_start " +
        "RANGE BETWEEN 518400000000 PRECEDING AND CURRENT ROW)"),
    "d3_gapfill" ->
      (s"$DenseGridCtes SELECT g.window_start, g.tenant_id, " +
        "COALESCE(a.v, 0.0) AS value " +
        "FROM g LEFT JOIN a ON g.tenant_id = a.tenant_id " +
        "AND g.window_start = a.window_start"),
    // lag/rolling features over the same dense grid: lags stay NULL through
    // the cold start; the trailing mean's frame sums are integer-exact
    "d13_lags" ->
      (s"$DenseGridCtes, dn AS (SELECT g.window_start, g.tenant_id, " +
        "COALESCE(a.v, 0.0) AS value FROM g LEFT JOIN a " +
        "ON g.tenant_id = a.tenant_id AND g.window_start = a.window_start) " +
        "SELECT window_start, tenant_id, value, " +
        "lag(value, 1) OVER (PARTITION BY tenant_id ORDER BY window_start) AS lag_1, " +
        "lag(value, 24) OVER (PARTITION BY tenant_id ORDER BY window_start) AS lag_24, " +
        "avg(value) OVER (PARTITION BY tenant_id ORDER BY window_start " +
        "ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS rollmean_7 FROM dn"),
    // forward fill: gaps carry the last observed value; the grid starts at
    // each group's first observed window so the running last is never null
    "d3b_forwardfill" ->
      (s"$DenseGridCtes SELECT window_start, tenant_id, value FROM (" +
        "SELECT g.window_start, g.tenant_id, " +
        "last_value(a.v IGNORE NULLS) OVER (PARTITION BY g.tenant_id " +
        "ORDER BY g.window_start ROWS UNBOUNDED PRECEDING) AS value " +
        "FROM g LEFT JOIN a ON g.tenant_id = a.tenant_id " +
        "AND g.window_start = a.window_start)"),
    "p1_envelope" ->
      (s"SELECT 'agg_purchase_avg' AS name, CAST(user_id AS VARCHAR) AS user_id, " +
        s"CAST(${wstart(DAY)} * 1000 AS DOUBLE) AS ts_ms, ${sqlRound2("AVG(value)")} AS value " +
        "FROM events WHERE event_type = 'purchase' GROUP BY 1, 2, 3"),
    "dedup_exact" ->
      (s"SELECT md5(regexp_replace(lower(trim(text, '$SqlWs')), '\\s+', ' ', 'g')) AS fingerprint, " +
        "MIN(doc_id) AS keep_id, count(*) AS n_dups FROM documents GROUP BY 1"),
    // quality-keeper mirror: the planted double-spaced predecessor copies,
    // (−score, id) struct MIN — the labelProp argmin pattern — over the
    // same normalized fingerprint
    "dedup_exact_best" ->
      ("WITH prevd AS (SELECT doc_id + 1 AS doc_id, " +
        "regexp_replace(text, ' ', '  ', 'g') AS alt FROM documents), " +
        "dd AS (SELECT d.doc_id, CASE WHEN d.doc_id % 9 = 4 AND alt IS NOT NULL " +
        "THEN alt ELSE d.text END AS text FROM documents d LEFT JOIN prevd USING (doc_id)), " +
        s"fp AS (SELECT doc_id, CAST(length(text) AS BIGINT) AS q, " +
        s"md5(regexp_replace(lower(trim(text, '$SqlWs')), '\\s+', ' ', 'g')) AS fingerprint FROM dd) " +
        "SELECT fingerprint, (min({'nq': -q, 'id': doc_id})).id AS keep_id, " +
        "-((min({'nq': -q, 'id': doc_id})).nq) AS keep_score_fp, " +
        "CAST(count(*) AS BIGINT) AS n_dups FROM fp GROUP BY 1"),
    // template mirror: digits masked BEFORE whitespace collapse, same
    // planted notification pages
    "dedup_template" ->
      ("WITH d AS (SELECT doc_id, CASE WHEN doc_id % 5 = 0 THEN " +
        "'Order ' || CAST(doc_id AS VARCHAR) || ' shipped to customer ' || " +
        "CAST(doc_id * 7 AS VARCHAR) || ' on day ' || CAST(doc_id % 28 AS VARCHAR) " +
        "ELSE text END AS text FROM documents) " +
        s"SELECT md5(regexp_replace(regexp_replace(lower(trim(text, '$SqlWs')), " +
        "'[0-9]+', '#', 'g'), '\\s+', ' ', 'g')) AS template_md5, " +
        "MIN(doc_id) AS keep_id, count(*) AS n_docs FROM d " +
        "GROUP BY 1 HAVING count(*) > 1"),
    "dedup_ngram" -> JaccardPairsSql,
    // containment mirror: the same inverted-index pair counts, each
    // unordered pair emitted DIRECTED against its own shingle count
    "dedup_containment" ->
      (s"$ShinglesCte, e AS (SELECT doc_id, unnest(sh) AS s FROM t), " +
        "szj AS (SELECT doc_id, count(*) AS n FROM e GROUP BY 1), " +
        "p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, " +
        "CAST(count(*) AS BIGINT) AS inter, " +
        "CAST(any_value(sa.n) AS BIGINT) AS na, " +
        "CAST(any_value(sb.n) AS BIGINT) AS nb " +
        "FROM e a JOIN e b ON a.s = b.s AND a.doc_id < b.doc_id " +
        "JOIN szj sa ON sa.doc_id = a.doc_id " +
        "JOIN szj sb ON sb.doc_id = b.doc_id " +
        "GROUP BY a.doc_id, b.doc_id) " +
        "SELECT contained_id, container_id, n_inter, n_contained, containment " +
        "FROM (SELECT id_a AS contained_id, id_b AS container_id, " +
        "inter AS n_inter, na AS n_contained, " +
        "CAST(inter AS DOUBLE) / CAST(na AS DOUBLE) AS containment FROM p " +
        "UNION ALL SELECT id_b, id_a, inter, nb, " +
        "CAST(inter AS DOUBLE) / CAST(nb AS DOUBLE) FROM p) " +
        "WHERE containment >= 0.8"),
    // prefix filtering is LOSSLESS, so its mirror IS the brute-force pair
    // spec — the oracle equality proves the candidate pruning drops nothing
    "dedup_prefix" -> JaccardPairsSql,
    // evidence mirror: the brute-force pair set, shared shingles via the
    // exploded distinct-shingle relation, (df, shingle) rank, top 3
    "dedup_evidence" ->
      (s"$ShinglesCte, " +
        "e AS (SELECT doc_id AS id, unnest(sh) AS shingle FROM t), " +
        "szj AS (SELECT id, count(*) AS n FROM e GROUP BY 1), " +
        // pair stage in the shingle equi-join form (see JaccardPairsSql)
        "p AS (SELECT id_a, id_b FROM (SELECT a.id AS id_a, b.id AS id_b, " +
        "CAST(count(*) AS DOUBLE) / " +
        "(any_value(sa.n) + any_value(sb.n) - count(*)) AS jaccard " +
        "FROM e a JOIN e b ON a.shingle = b.shingle AND a.id < b.id " +
        "JOIN szj sa ON sa.id = a.id JOIN szj sb ON sb.id = b.id " +
        "GROUP BY a.id, b.id) WHERE jaccard >= 0.5), " +
        "dfq AS (SELECT shingle, CAST(count(*) AS BIGINT) AS df FROM e GROUP BY 1), " +
        "sh2 AS (SELECT p.id_a, p.id_b, a.shingle FROM p " +
        "JOIN e a ON a.id = p.id_a JOIN e b ON b.id = p.id_b " +
        "AND b.shingle = a.shingle) " +
        "SELECT id_a, id_b, shingle, df, CAST(rank AS BIGINT) AS rank FROM (" +
        "SELECT s.id_a, s.id_b, s.shingle, dfq.df, row_number() OVER (" +
        "PARTITION BY s.id_a, s.id_b ORDER BY dfq.df ASC, s.shingle ASC) AS rank " +
        "FROM sh2 s JOIN dfq USING (shingle)) WHERE rank <= 3"),
    // tf-cosine mirror: integer tf/norm/dot sums (exact on both engines),
    // one sqrt/multiply/divide at the end — same arithmetic step for step
    "dedup_cosine" ->
      (s"WITH tf AS (SELECT doc_id AS id, t, CAST(count(*) AS BIGINT) AS tf FROM (" +
        s"SELECT doc_id, unnest(${ngramsOfToks(3)}) AS t FROM (" +
        s"SELECT doc_id, $RawToks AS toks FROM documents " +
        s"WHERE length(trim(text, '$SqlWs')) <> 0)) GROUP BY 1, 2), " +
        "nrm AS (SELECT id, sum(tf * tf) AS n2 FROM tf GROUP BY 1), " +
        "p AS (SELECT a.id AS id_a, b.id AS id_b, sum(a.tf * b.tf) AS idot " +
        "FROM tf a JOIN tf b ON a.t = b.t AND a.id < b.id GROUP BY 1, 2) " +
        "SELECT id_a, id_b, ROUND(c, 4) AS cosine FROM (" +
        "SELECT p.id_a, p.id_b, CAST(idot AS DOUBLE) / " +
        "(sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE))) AS c " +
        "FROM p JOIN nrm na ON na.id = p.id_a JOIN nrm nb ON nb.id = p.id_b) " +
        "WHERE c >= 0.8"),
    "dedup_ngram_capped" -> JaccardCappedPairsSql,
    "dedup_simhash" -> SimhashPairsSql,
    // banding-eval mirror: portable slot replay + brute-force truth +
    // full-outer count roll-up
    "dedup_banding_eval" -> bandingEvalOracleSql(64, 16),
    // k-anonymity mirror: the same quasi-identifier cells, exact counts,
    // one division
    "report_kanon" ->
      ("WITH g AS (SELECT c_nationkey, c_mktsegment, " +
        "CAST(floor((c_acctbal + 1000) * 100) AS BIGINT) // 100000 AS band, " +
        "CAST(count(*) AS BIGINT) AS n FROM customer GROUP BY 1, 2, 3) " +
        "SELECT CAST(sum(n) AS BIGINT) AS n_rows, " +
        "CAST(count(*) AS BIGINT) AS n_groups, " +
        "CAST(min(n) AS BIGINT) AS k_anonymity, " +
        "CAST(sum(CASE WHEN n < 10 THEN 1 ELSE 0 END) AS BIGINT) AS n_risky_groups, " +
        "CAST(sum(CASE WHEN n < 10 THEN n ELSE 0 END) AS BIGINT) AS n_risky_rows, " +
        "CAST(sum(CASE WHEN n < 10 THEN n ELSE 0 END) AS DOUBLE) / " +
        "CAST(sum(n) AS DOUBLE) AS risky_row_share FROM g"),
    // data-card mirror: same one-pass stats, stacked to (metric, value)
    "report_datacard" ->
      (s"WITH b AS (SELECT COALESCE($TokN, 0) AS tc, " +
        "COALESCE(length(text), 0) AS len, text IS NULL AS tnull, " +
        s"md5(regexp_replace(lower(trim(text, '$SqlWs')), '\\s+', ' ', 'g')) AS fp " +
        "FROM documents), " +
        "a AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs, " +
        "CAST(sum(CASE WHEN tnull THEN 1 ELSE 0 END) AS DOUBLE) AS n_null_docs, " +
        "CAST(sum(CASE WHEN tc = 0 THEN 1 ELSE 0 END) AS DOUBLE) AS n_empty_docs, " +
        "CAST(sum(tc) AS DOUBLE) AS n_tokens, " +
        "CAST(sum(len) AS DOUBLE) AS n_chars, " +
        "CAST(count(fp) - count(DISTINCT fp) AS DOUBLE) AS n_exact_dup_docs, " +
        "quantile_cont(tc, 0.5) AS p50_doc_tokens FROM b) " +
        "SELECT 'n_docs' AS metric, n_docs AS value FROM a UNION ALL " +
        "SELECT 'n_null_docs', n_null_docs FROM a UNION ALL " +
        "SELECT 'n_empty_docs', n_empty_docs FROM a UNION ALL " +
        "SELECT 'n_tokens', n_tokens FROM a UNION ALL " +
        "SELECT 'n_chars', n_chars FROM a UNION ALL " +
        "SELECT 'n_exact_dup_docs', n_exact_dup_docs FROM a UNION ALL " +
        "SELECT 'mean_doc_tokens', n_tokens / n_docs FROM a UNION ALL " +
        "SELECT 'p50_doc_tokens', p50_doc_tokens FROM a"),
    // per-source card: the same stats grouped by source
    "report_datacard_by" ->
      (s"WITH b AS (SELECT source, COALESCE($TokN, 0) AS tc, " +
        "COALESCE(length(text), 0) AS len, text IS NULL AS tnull, " +
        s"md5(regexp_replace(lower(trim(text, '$SqlWs')), '\\s+', ' ', 'g')) AS fp " +
        "FROM documents), " +
        "a AS (SELECT source, CAST(count(*) AS DOUBLE) AS n_docs, " +
        "CAST(sum(CASE WHEN tnull THEN 1 ELSE 0 END) AS DOUBLE) AS n_null_docs, " +
        "CAST(sum(CASE WHEN tc = 0 THEN 1 ELSE 0 END) AS DOUBLE) AS n_empty_docs, " +
        "CAST(sum(tc) AS DOUBLE) AS n_tokens, " +
        "CAST(sum(len) AS DOUBLE) AS n_chars, " +
        "CAST(count(fp) - count(DISTINCT fp) AS DOUBLE) AS n_exact_dup_docs, " +
        "quantile_cont(tc, 0.5) AS p50_doc_tokens FROM b GROUP BY source) " +
        "SELECT source, 'n_docs' AS metric, n_docs AS value FROM a UNION ALL " +
        "SELECT source, 'n_null_docs', n_null_docs FROM a UNION ALL " +
        "SELECT source, 'n_empty_docs', n_empty_docs FROM a UNION ALL " +
        "SELECT source, 'n_tokens', n_tokens FROM a UNION ALL " +
        "SELECT source, 'n_chars', n_chars FROM a UNION ALL " +
        "SELECT source, 'n_exact_dup_docs', n_exact_dup_docs FROM a UNION ALL " +
        "SELECT source, 'mean_doc_tokens', n_tokens / n_docs FROM a UNION ALL " +
        "SELECT source, 'p50_doc_tokens', p50_doc_tokens FROM a"),
    // water-filling mirror: the same windowed interval solve in integers
    "sample_waterfill" ->
      (s"WITH ${waterfillCtes(300L, "count(*)")} " +
        "SELECT key, n_rows, alloc FROM wf"),
    // the materialized selection: the same solve, then the quotaPerKey
    // hash-rank gate capped by each key's alloc
    "sample_waterfill_rows" ->
      (s"WITH ${waterfillCtes(300L, "count(*)")} " +
        "SELECT doc_id, source FROM (SELECT doc_id, source, " +
        s"row_number() OVER (PARTITION BY source ORDER BY $HashB ASC, " +
        "doc_id ASC) AS rk FROM documents) q " +
        "JOIN wf ON q.source = wf.key WHERE q.rk <= wf.alloc"),
    // token-unit water-filling: identical solve over token sums (budget
    // 20000 at sf0.01 sits below the total, so the level actually binds)
    "sample_waterfill_tokens" ->
      (s"WITH ${waterfillCtes(20000L, s"sum($TokN)")} " +
        "SELECT key, n_rows, alloc FROM wf"),
    // manifest mirror: shuffleOrder's shard hash, HUGEINT checksum sum
    // folded to the signed domain — NULL fingerprints skipped by both sums
    "report_manifest" ->
      (s"WITH f AS (SELECT doc_id, COALESCE($TokN, 0) AS tc, " +
        s"md5(regexp_replace(lower(trim(text, '$SqlWs')), '\\s+', ' ', 'g')) AS fp " +
        "FROM documents), " +
        polyHashSteps("doc_id, tc", "fp", "f", "ph") + " " +
        s"SELECT ${pmSql(HashRaw, "8")} AS shard, " +
        "CAST(count(*) AS BIGINT) AS n_docs, " +
        "CAST(sum(tc) AS BIGINT) AS n_tokens, " +
        s"${signedSql(pmSql("sum(h)", Mod64))} AS checksum " +
        "FROM ph GROUP BY 1"),
    "sim_ivf_topk" -> IvfTopkSql,
    "sim_topk_pq" -> PqTopkSql,
    "sim_topk_pq_kmeans" -> PqKmeansTopkSql,
    "sim_ivfpq_topk" -> IvfPqTopkSql,
    "sim_ivfpq_res" -> IvfPqResTopkSql,
    // hard-negative mirror: the sim_topk probe plus the null-safe label
    // inequality (IS DISTINCT FROM ≡ Spark's !(a <=> b))
    "sim_hard_negatives" ->
      ("WITH ul AS (SELECT e.vec_id, list_transform(dv, x -> x / nrm) AS v, label FROM " +
        "(SELECT vec_id, dv, sqrt(list_inner_product(dv, dv)) AS nrm, label FROM " +
        "(SELECT vec_id, CAST(embedding AS DOUBLE[]) AS dv, label FROM embeddings)) e " +
        "WHERE nrm > 0) " +
        "SELECT query_id, neighbor_id, neg_label, rank, ROUND(c, 4) AS cosine FROM (" +
        "SELECT q.vec_id AS query_id, b.vec_id AS neighbor_id, " +
        "CAST(b.label AS BIGINT) AS neg_label, " +
        "list_inner_product(q.v, b.v) AS c, " +
        "CAST(row_number() OVER (PARTITION BY q.vec_id ORDER BY " +
        "list_inner_product(q.v, b.v) DESC, b.vec_id ASC) AS BIGINT) AS rank " +
        "FROM ul q, ul b WHERE q.vec_id < 10 AND b.vec_id <> q.vec_id " +
        "AND q.label IS DISTINCT FROM b.label) WHERE rank <= 5"),
    // triplet mirror: the positive leg is the same rank pipeline under
    // null-safe label EQUALITY, joined to the top-3 negative legs
    "train_triplets" ->
      ("WITH ul AS (SELECT e.vec_id, list_transform(dv, x -> x / nrm) AS v, label FROM " +
        "(SELECT vec_id, dv, sqrt(list_inner_product(dv, dv)) AS nrm, label FROM " +
        "(SELECT vec_id, CAST(embedding AS DOUBLE[]) AS dv, label FROM embeddings)) e " +
        "WHERE nrm > 0), " +
        "pos AS (SELECT query_id, positive_id, pc FROM (" +
        "SELECT q.vec_id AS query_id, b.vec_id AS positive_id, " +
        "list_inner_product(q.v, b.v) AS pc, " +
        "row_number() OVER (PARTITION BY q.vec_id ORDER BY " +
        "list_inner_product(q.v, b.v) DESC, b.vec_id ASC) AS rk " +
        "FROM ul q, ul b WHERE q.vec_id < 10 AND b.vec_id <> q.vec_id " +
        "AND q.label IS NOT DISTINCT FROM b.label) WHERE rk = 1), " +
        "neg AS (SELECT query_id, negative_id, neg_rank, nc FROM (" +
        "SELECT q.vec_id AS query_id, b.vec_id AS negative_id, " +
        "list_inner_product(q.v, b.v) AS nc, " +
        "CAST(row_number() OVER (PARTITION BY q.vec_id ORDER BY " +
        "list_inner_product(q.v, b.v) DESC, b.vec_id ASC) AS BIGINT) AS neg_rank " +
        "FROM ul q, ul b WHERE q.vec_id < 10 AND b.vec_id <> q.vec_id " +
        "AND q.label IS DISTINCT FROM b.label) WHERE neg_rank <= 3) " +
        "SELECT query_id, positive_id, negative_id, neg_rank, " +
        "ROUND(pc, 4) AS pos_cosine, ROUND(nc, 4) AS neg_cosine " +
        "FROM pos JOIN neg USING (query_id)"),
    // same double ops as Similarity.quantize: max|x|/127 scale, then
    // floor(x/scale + 0.5) per slot — exact integers, identical doubles
    "emb_quantize" ->
      ("SELECT vec_id, CAST(i AS BIGINT) AS pos, " +
        "CAST(CASE WHEN scale > 0 THEN floor(dv[i + 1] / scale + 0.5) " +
        "ELSE 0 END AS BIGINT) AS q, scale " +
        "FROM (SELECT vec_id, dv, " +
        "list_max(list_transform(dv, x -> abs(x))) / 127.0 AS scale " +
        "FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS dv FROM embeddings)), " +
        "LATERAL (SELECT unnest(generate_series(0, len(dv) - 1)) AS i)"),
    // quantize→dequantize replayed inline (same floor-half-up integers as
    // the emb_quantize mirror), then the sim_topk probe over the
    // reconstructed vectors
    "sim_topk_q8" ->
      ("WITH dq AS (SELECT vec_id, CASE WHEN scale > 0 THEN " +
        "list_transform(dv, x -> CAST(floor(x / scale + 0.5) AS BIGINT) * scale) " +
        "ELSE list_transform(dv, x -> 0.0) END AS v FROM (" +
        "SELECT vec_id, dv, list_max(list_transform(dv, x -> abs(x))) / 127.0 AS scale " +
        "FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS dv FROM embeddings))) " +
        "SELECT query_id, neighbor_id, rank, ROUND(c, 4) AS cosine FROM (" +
        "SELECT q.vec_id AS query_id, b.vec_id AS neighbor_id, " +
        "list_cosine_similarity(q.v, b.v) AS c, " +
        "row_number() OVER (PARTITION BY q.vec_id ORDER BY " +
        "list_cosine_similarity(q.v, b.v) DESC, b.vec_id ASC) AS rank " +
        "FROM dq q, dq b WHERE q.vec_id < 10 AND b.vec_id <> q.vec_id) " +
        "WHERE rank <= 5"),
    // compressed-domain mirror: the same int8 slots as emb_quantize, scored
    // by integer dot products — idot/(√idot_aa·√idot_bb); every intermediate
    // is an exact integer < 2^53, so DuckDB's double list_dot_product replay
    // is bit-identical to the engine's long-arithmetic LongDotProduct
    "sim_topk_q8i" ->
      ("WITH qz AS (SELECT vec_id, CASE WHEN scale > 0 THEN " +
        "list_transform(dv, x -> CAST(CAST(floor(x / scale + 0.5) AS BIGINT) AS DOUBLE)) " +
        "ELSE list_transform(dv, x -> 0.0) END AS v FROM (" +
        "SELECT vec_id, dv, list_max(list_transform(dv, x -> abs(x))) / 127.0 AS scale " +
        "FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS dv FROM embeddings))), " +
        "n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm " +
        "FROM qz WHERE list_dot_product(v, v) > 0) " +
        "SELECT query_id, neighbor_id, rank, ROUND(c, 4) AS cosine FROM (" +
        "SELECT q.vec_id AS query_id, b.vec_id AS neighbor_id, " +
        "list_dot_product(q.v, b.v) / (q.nrm * b.nrm) AS c, " +
        "row_number() OVER (PARTITION BY q.vec_id ORDER BY " +
        "list_dot_product(q.v, b.v) / (q.nrm * b.nrm) DESC, b.vec_id ASC) AS rank " +
        "FROM n q, n b WHERE q.vec_id < 10 AND b.vec_id <> q.vec_id) " +
        "WHERE rank <= 5"),
    "sim_lsh_pairs" -> LshPairsSql,
    "sim_lsh_join" -> LshJoinSql,
    // transitive closure over the same pair set: component = min reachable id
    "dedup_cluster" ->
      s"$ClusterComponentsCte SELECT id, component FROM comp",
    // chaining-audit mirror: the shared recursive closure + the pair
    // relation it was built from, rolled up per component
    "dedup_cluster_diameter" ->
      (s"$ClusterComponentsCte, " +
        "cs AS (SELECT component, CAST(count(*) AS BIGINT) AS n_members " +
        "FROM comp GROUP BY 1), " +
        "ej AS (SELECT c.component, CAST(count(*) AS BIGINT) AS n_edges, " +
        "ROUND(min(p.jaccard), 4) AS min_edge_jaccard " +
        "FROM p JOIN comp c ON p.id_a = c.id GROUP BY 1) " +
        "SELECT component, n_members, n_edges, min_edge_jaccard " +
        "FROM cs JOIN ej USING (component)"),
    // duplication-depth histogram: component sizes rolled up twice
    "dedup_cluster_sizes" ->
      (s"$ClusterComponentsCte, cs AS (SELECT component, " +
        "CAST(count(*) AS BIGINT) AS cluster_size FROM comp GROUP BY 1) " +
        "SELECT cluster_size, CAST(count(*) AS BIGINT) AS n_clusters, " +
        "CAST(cluster_size * count(*) AS BIGINT) AS n_docs " +
        "FROM cs GROUP BY 1"),
    // survivors = corpus minus non-minimal cluster members
    "dedup_neardup_survivors" ->
      (s"$ClusterComponentsCte SELECT doc_id FROM documents " +
        "WHERE doc_id NOT IN (SELECT id FROM comp WHERE id <> component)"),
    "dedup_exact_survivors" ->
      ("SELECT doc_id FROM documents WHERE doc_id IN (SELECT MIN(doc_id) " +
        s"FROM documents GROUP BY md5(regexp_replace(lower(trim(text, '$SqlWs')), '\\s+', ' ', 'g')))"),
    // MinHash-LSH with k=128, b=32, r=4 has recall ≈ 1 − 1.5e-15 at the
    // dataset's minimum true-pair similarity (J ≥ 0.9) and exact verification,
    // so its output equals the exact-Jaccard pair set.
    "dedup_minhash" -> JaccardPairsSql,
    "audit_split_leakage" ->
      (s"WITH p AS ($JaccardPairsSql) " +
        "SELECT id_a, id_b, split_a, split_b, jaccard FROM (" +
        s"SELECT id_a, id_b, ${splitCaseSql("id_a")} AS split_a, " +
        s"${splitCaseSql("id_b")} AS split_b, jaccard FROM p) " +
        "WHERE split_a <> split_b"),
    "dedup_decontam" -> DecontamSql,
    // the Bloom path is a pre-filter, not a semantic change: the confirm
    // semi-join makes the survivors EXACTLY the non-contaminated set, so the
    // oracle is the same query
    "dedup_decontam_bloom" -> DecontamSql,
    // incremental mirror: NOT EXISTS reproduces anti-join NULL semantics
    // exactly (a NULL fingerprint matches nothing and survives)
    "dedup_incremental" ->
      ("WITH fp AS (SELECT doc_id, " +
        s"md5(regexp_replace(lower(trim(text, '$SqlWs')), '\\s+', ' ', 'g')) AS f FROM documents) " +
        "SELECT b.doc_id FROM fp b WHERE NOT EXISTS (" +
        "SELECT 1 FROM fp s WHERE s.doc_id % 4 <> 3 AND s.f = b.f)"),
    // fuzzy incremental mirror: EXACT cross-corpus Jaccard over the same
    // trigram shingle sets — valid as the LSH oracle by the dedup_minhash
    // recall argument (k=128, b=32, r=4 ⇒ recall ≈ 1−1.5e-15 at the corpus's
    // minimum true-pair similarity, and verification is exact either way).
    // NULL-text rows: NULL shingle list ⇒ NULL Jaccard ⇒ no match ⇒ kept,
    // exactly the Spark side's no-signature path
    // rewritten to the shingle equi-join (see JaccardPairsSql scaladoc): a
    // batch doc matches the seen corpus iff some shared-shingle pair
    // reaches J >= 0.5 — same integers, same doubles as the correlated
    // NOT-EXISTS list form it replaces (which cost 11 s at sf0.01); docs
    // with a NULL shingle list unnest to no rows, match nothing, and
    // survive, exactly the no-signature path
    "dedup_incremental_fuzzy" ->
      (s"$ShinglesCte, e AS (SELECT doc_id, unnest(sh) AS s FROM t), " +
        "szj AS (SELECT doc_id, count(*) AS n FROM e GROUP BY 1), " +
        "hit AS (SELECT b.doc_id FROM e b " +
        "JOIN e s ON b.s = s.s AND b.doc_id % 4 = 3 AND s.doc_id % 4 <> 3 " +
        "JOIN szj nb ON nb.doc_id = b.doc_id JOIN szj ns ON ns.doc_id = s.doc_id " +
        "GROUP BY b.doc_id, s.doc_id " +
        "HAVING CAST(count(*) AS DOUBLE) / " +
        "(any_value(nb.n) + any_value(ns.n) - count(*)) >= 0.5) " +
        "SELECT b.doc_id FROM t b WHERE b.doc_id % 4 = 3 " +
        "AND b.doc_id NOT IN (SELECT doc_id FROM hit)"),
    // line dedup mirror: df per trimmed non-empty line (the operator counts
    // df on the 64-bit line hash — collision odds are immaterial), lines in
    // > 3 docs dropped, survivors rejoined in original position order; the
    // boilerplate construction matches the query side exactly
    "dedup_lines" ->
      ("WITH d AS (SELECT doc_id, 'BANNER ' || COALESCE(source, '') || chr(10) || " +
        "COALESCE(text, '') || " +
        "chr(10) || 'badge ' || CAST(doc_id % 200 AS VARCHAR) || chr(10) || " +
        "'ALL RIGHTS RESERVED' AS text FROM documents), " +
        "ls AS (SELECT doc_id, string_split(text, chr(10)) AS arr FROM d), " +
        "ex AS (SELECT doc_id, unnest(generate_series(1, len(arr))) AS pos, arr FROM ls), " +
        // the engine-wide whitespace-class trim (CRLF corpora normalize like LF)
        "l0 AS (SELECT doc_id, pos, regexp_replace(arr[pos], " +
        "'^[\\t\\n\\f\\r ]+|[\\t\\n\\f\\r ]+$', '', 'g') AS line FROM ex), " +
        "lines AS (SELECT doc_id, pos, line FROM l0 WHERE length(line) > 0), " +
        "hot AS (SELECT line FROM (SELECT line, count(DISTINCT doc_id) AS df " +
        "FROM lines GROUP BY 1) WHERE df > 3), " +
        "kept AS (SELECT doc_id, pos, line FROM lines " +
        "WHERE line NOT IN (SELECT line FROM hot)), " +
        "reb AS (SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS text_clean, " +
        "count(*) AS n_kept FROM kept GROUP BY 1), " +
        "tot AS (SELECT doc_id, count(*) AS n_all FROM lines GROUP BY 1) " +
        "SELECT d.doc_id, COALESCE(reb.text_clean, '') AS text_clean, " +
        "CAST(COALESCE(reb.n_kept, 0) AS BIGINT) AS n_lines_kept, " +
        "CAST(COALESCE(tot.n_all, 0) - COALESCE(reb.n_kept, 0) AS BIGINT) " +
        "AS n_lines_dropped " +
        "FROM d LEFT JOIN reb USING (doc_id) LEFT JOIN tot USING (doc_id)"),
    // keepEmptyLines mirror: blank lines bypass the hot filter and the
    // counts (both sides range kept/total over non-empty lines only) but
    // survive into text_clean at their original positions
    "dedup_lines_keepempty" ->
      ("WITH d AS (SELECT doc_id, 'BANNER ' || COALESCE(source, '') || chr(10) || " +
        "chr(10) || COALESCE(text, '') || " +
        "chr(10) || 'badge ' || CAST(doc_id % 200 AS VARCHAR) || chr(10) || chr(10) || " +
        "'ALL RIGHTS RESERVED' AS text FROM documents), " +
        "ls AS (SELECT doc_id, string_split(text, chr(10)) AS arr FROM d), " +
        "ex AS (SELECT doc_id, unnest(generate_series(1, len(arr))) AS pos, arr FROM ls), " +
        "l0 AS (SELECT doc_id, pos, regexp_replace(arr[pos], " +
        "'^[\\t\\n\\f\\r ]+|[\\t\\n\\f\\r ]+$', '', 'g') AS line FROM ex), " +
        "hot AS (SELECT line FROM (SELECT line, count(DISTINCT doc_id) AS df " +
        "FROM l0 WHERE length(line) > 0 GROUP BY 1) WHERE df > 3), " +
        "kept AS (SELECT doc_id, pos, line FROM l0 " +
        "WHERE length(line) = 0 OR line NOT IN (SELECT line FROM hot)), " +
        "reb AS (SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS text_clean, " +
        "count(*) FILTER (WHERE length(line) > 0) AS n_kept FROM kept GROUP BY 1), " +
        "tot AS (SELECT doc_id, count(*) AS n_all FROM l0 " +
        "WHERE length(line) > 0 GROUP BY 1) " +
        "SELECT d.doc_id, COALESCE(reb.text_clean, '') AS text_clean, " +
        "CAST(COALESCE(reb.n_kept, 0) AS BIGINT) AS n_lines_kept, " +
        "CAST(COALESCE(tot.n_all, 0) - COALESCE(reb.n_kept, 0) AS BIGINT) " +
        "AS n_lines_dropped " +
        "FROM d LEFT JOIN reb USING (doc_id) LEFT JOIN tot USING (doc_id)"),
    "dedup_embedding" ->
      (s"SELECT id_a, id_b, ROUND(c, 4) AS cosine FROM (" +
        s"SELECT a.vec_id AS id_a, b.vec_id AS id_b, $CosD AS c " +
        "FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id) WHERE c >= 0.4"),
    "dedup_semantic" -> SemanticPairsSql,
    "dedup_threshold_sweep" -> ThresholdSweepSql,
    // cross-set variant of the same cell machinery: the union's centroid
    // sample/argmax IS the shared u/cent/asg (corpus+bench partition the
    // table); contaminated = same-cell cross pair with cosine ≥ 0.4
    "dedup_decontam_sem" ->
      (s"WITH $UnitVecCte, $SemanticCellAsgSql, " +
        "bad AS (SELECT DISTINCT a.id FROM asg a JOIN asg b ON a.cell = b.cell " +
        "AND a.id % 50 <> 0 AND b.id % 50 = 0 " +
        "WHERE list_inner_product(a.v, b.v) >= 0.25) " +
        "SELECT vec_id FROM embeddings WHERE vec_id % 50 <> 0 " +
        "AND vec_id NOT IN (SELECT id FROM bad)"),
    "dedup_semantic_survivors" ->
      (s"$SemanticComponentsCte SELECT vec_id FROM embeddings " +
        "WHERE vec_id NOT IN (SELECT id FROM comp WHERE id <> component)"),
    // bigram LM mirror: same counts, same add-one smoothing, same V; the
    // only float divergence is ln()'s last ulp + summation order, absorbed
    // by ROUND(_, 4) on both engines
    "text_lm_nll" ->
      // trim(x, chars) is the native SET-trim in BOTH engines — the literal
      // contains the real control characters (JSON-escaped in transit)
      ("WITH toks AS (SELECT doc_id, string_split_regex(" +
        s"trim(lower(text), '${TextAnalysis.WsCharsRaw}'), '\\s+') AS tk " +
        "FROM documents WHERE text IS NOT NULL), " +
        "bi AS (SELECT doc_id, [tk[i] || ' ' || tk[i+1] for i in " +
        "generate_series(1, len(tk) - 1)] AS bs FROM toks WHERE len(tk) >= 2), " +
        "refuni AS (SELECT w, count(*) AS cw FROM (SELECT unnest(tk) AS w FROM toks) " +
        "WHERE w <> '' GROUP BY w HAVING count(*) >= 5), " +
        "refbig AS (SELECT b, count(*) AS cb FROM (SELECT unnest(bs) AS b FROM bi) " +
        "GROUP BY b HAVING count(*) >= 5), " +
        "v AS (SELECT CAST(count(*) AS DOUBLE) AS vsize FROM refuni), " +
        "db AS (SELECT doc_id, unnest(bs) AS b FROM bi), " +
        "sc AS (SELECT doc_id, count(*) AS nb, " +
        "avg(-ln(CAST(COALESCE(cb, 0) + 1 AS DOUBLE) / " +
        "(CAST(COALESCE(cw, 0) AS DOUBLE) + vsize + 1.0))) AS nll " +
        "FROM db LEFT JOIN refbig USING (b) " +
        "LEFT JOIN refuni ON split_part(db.b, ' ', 1) = refuni.w " +
        "CROSS JOIN v GROUP BY doc_id) " +
        "SELECT d.doc_id, CAST(COALESCE(nb, 0) AS BIGINT) AS n_bigrams, " +
        "(floor((COALESCE(nll, 0.0)) * 10000 + 0.499999) / 10000) AS mean_nll " +
        "FROM documents d LEFT JOIN sc USING (doc_id)"),
    // overlap-ratio mirror: membership on shingle TEXT (operator keys on the
    // 64-bit hash — same collision note as dedup_lines)
    "dedup_decontam_scores" ->
      (s"$ShinglesCte, bench AS (SELECT DISTINCT unnest(sh) AS s FROM t " +
        "WHERE doc_id % 50 = 0), " +
        "c AS (SELECT doc_id, unnest(sh) AS s FROM t WHERE doc_id % 50 <> 0), " +
        "sc AS (SELECT c.doc_id, count(*) AS n_sh, count(b.s) AS n_hit " +
        "FROM c LEFT JOIN bench b USING (s) GROUP BY c.doc_id) " +
        "SELECT d.doc_id, CAST(COALESCE(sc.n_sh, 0) AS BIGINT) AS n_shingles, " +
        "CAST(COALESCE(sc.n_hit, 0) AS BIGINT) AS n_shared, " +
        "CASE WHEN COALESCE(sc.n_sh, 0) > 0 " +
        "THEN CAST(COALESCE(sc.n_hit, 0) AS DOUBLE) / sc.n_sh ELSE 0.0 END AS overlap " +
        "FROM (SELECT doc_id FROM documents WHERE doc_id % 50 <> 0) d " +
        "LEFT JOIN sc USING (doc_id)"),
    // containment-report mirror: per-bench-item distinct shingles, hit
    // counts per (doc, bench) pair, integer-ratio containment (exact
    // doubles on both engines — no rounding needed for the threshold)
    "dedup_decontam_report" ->
      (s"$ShinglesCte, b AS (SELECT doc_id AS bench_id, unnest(sh) AS s " +
        "FROM t WHERE doc_id % 50 = 0), " +
        "bn AS (SELECT bench_id, count(*) AS bench_shingles FROM b GROUP BY 1), " +
        "c AS (SELECT doc_id, unnest(sh) AS s FROM t WHERE doc_id % 50 <> 0) " +
        "SELECT doc_id, bench_id, CAST(n_shared AS BIGINT) AS n_shared, " +
        "CAST(bench_shingles AS BIGINT) AS bench_shingles, containment FROM (" +
        "SELECT c.doc_id, b.bench_id, count(*) AS n_shared, " +
        "any_value(bn.bench_shingles) AS bench_shingles, " +
        "CAST(count(*) AS DOUBLE) / any_value(bn.bench_shingles) AS containment " +
        "FROM c JOIN b USING (s) JOIN bn ON b.bench_id = bn.bench_id " +
        "GROUP BY 1, 2) WHERE containment >= 0.05"),
    // c-TF-IDF mirror: same class/corpus token counts, mean-per-class A,
    // the same pre-rank stable rounding and term tie-break
    "text_ctfidf" ->
      ("WITH tk AS (SELECT label, w FROM (SELECT lang AS label, " +
        "unnest(string_split_regex(trim(lower(text), " +
        s"'${TextAnalysis.WsCharsRaw}'), '\\s+')) AS w FROM documents " +
        "WHERE lang IS NOT NULL AND text IS NOT NULL) WHERE w <> ''), " +
        "ctf AS MATERIALIZED (SELECT label, w, count(*) AS tf " +
        "FROM tk GROUP BY 1, 2), " +
        "fw AS (SELECT w, sum(tf) AS fw FROM ctf GROUP BY 1), " +
        "aavg AS (SELECT CAST(sum(tf) AS DOUBLE) / " +
        "CAST(count(DISTINCT label) AS DOUBLE) AS aavg FROM ctf), " +
        "s AS (SELECT label, w, " +
        s"${sqlRound4("CAST(tf AS DOUBLE) * ln(1.0 + aavg / CAST(fw AS DOUBLE))")} " +
        "AS score FROM ctf JOIN fw USING (w) CROSS JOIN aavg), " +
        "r AS (SELECT label, w, score, row_number() OVER (" +
        "PARTITION BY label ORDER BY score DESC, w ASC) AS rank FROM s) " +
        "SELECT label, w AS term, score, CAST(rank AS BIGINT) AS rank " +
        "FROM r WHERE rank <= 10"),
    // blocklist mirror: every start position via the lateral position
    // walk — substr on code points, but substring-occurrence counts are
    // indexing-unit independent, so the automaton and the walk agree
    "text_blocklist" ->
      (s"WITH $BlocklistPatsCteSql, " +
        "h AS (SELECT d.doc_id, p.pat AS pattern, count(*) AS hits " +
        "FROM documents d CROSS JOIN p, LATERAL (SELECT " +
        "unnest(generate_series(1, len(d.text) - len(p.pat) + 1)) AS i) g " +
        "WHERE d.text IS NOT NULL " +
        "AND substr(d.text, g.i, len(p.pat)) = p.pat GROUP BY 1, 2) " +
        "SELECT doc_id, pattern, CAST(hits AS BIGINT) AS hits FROM h"),
    "text_blocklist_clean" ->
      (s"WITH $BlocklistPatsCteSql, " +
        "h AS (SELECT DISTINCT d.doc_id FROM documents d CROSS JOIN p, " +
        "LATERAL (SELECT unnest(generate_series(1, " +
        "len(d.text) - len(p.pat) + 1)) AS i) g " +
        "WHERE d.text IS NOT NULL " +
        "AND substr(d.text, g.i, len(p.pat)) = p.pat) " +
        "SELECT doc_id FROM documents " +
        "WHERE doc_id NOT IN (SELECT doc_id FROM h)"),
    "text_urls" ->
      (s"WITH $UrlDocsCteSql, ex AS (SELECT doc_id, " +
        s"regexp_extract_all(text, '$UrlReSql') AS us FROM d) " +
        "SELECT doc_id, CAST(pos - 1 AS BIGINT) AS pos, us[pos] AS url, " +
        s"lower(regexp_extract(us[pos], '$DomainReSql', 1)) AS domain " +
        "FROM (SELECT doc_id, unnest(generate_series(1, len(us))) AS pos, us FROM ex)"),
    "text_domain_filter" ->
      (s"WITH $UrlDocsCteSql SELECT doc_id FROM d WHERE len(list_filter(" +
        s"list_transform(regexp_extract_all(text, '$UrlReSql'), " +
        s"u -> lower(regexp_extract(u, '$DomainReSql', 1))), " +
        s"dom -> ($UrlBlockCondSql))) = 0"),
    // C4 cleaning mirror: the page construction matches c4Docs exactly;
    // line rules as list_filter lambdas, doc rules on the original text
    "text_c4_clean" ->
      ("WITH d AS (SELECT doc_id, " +
        "array_to_string(string_split(COALESCE(text, ''), ' ')[1:8], ' ') || '.' || chr(10) || " +
        "'Please enable JavaScript to view the comments.' || chr(10) || " +
        "'Menu' || chr(10) || " +
        "'Source ' || COALESCE(source, '') || ' delivers honest daily articles.' || chr(10) || " +
        "CASE WHEN doc_id % 37 = 0 THEN 'if (config) { render(); }' " +
        "ELSE 'A perfectly ordinary closing sentence appears right here.' END || chr(10) || " +
        "CASE WHEN doc_id % 41 = 0 THEN 'Lorem ipsum dolor sit amet, consectetur adipiscing elit.' " +
        "ELSE 'Here is another honest sentence for the cleaner.' END || chr(10) || " +
        "'Badge ' || CAST(doc_id % 5 AS VARCHAR) || ' reporting in today!' AS text " +
        "FROM documents), " +
        "l AS (SELECT doc_id, text AS txt, list_filter(list_transform(" +
        s"string_split(text, chr(10)), x -> trim(x, '${TextAnalysis.WsCharsRaw}')), " +
        "x -> length(x) > 0) AS lines FROM d), " +
        "k AS (SELECT doc_id, txt, lines, list_filter(lines, x -> " +
        "regexp_matches(x, '[.!?\"]$') AND len(string_split_regex(x, '\\s+')) >= 3 AND " +
        "NOT contains(lower(x), 'javascript')) AS kept FROM l) " +
        "SELECT doc_id, array_to_string(kept, chr(10)) AS text_clean, " +
        "CAST(len(kept) AS BIGINT) AS n_lines_kept, " +
        "CAST(len(lines) - len(kept) AS BIGINT) AS n_lines_dropped, " +
        "(NOT contains(txt, '{') AND NOT contains(lower(txt), 'lorem ipsum') " +
        "AND len(kept) >= 5) AS keep_doc FROM k"),
    // tf-idf mirror: same LM tokenization, same smoothed idf, same
    // (score desc, token asc) tie-break; ROUND absorbs ln()'s last ulp
    "text_tfidf" ->
      ("WITH toks AS (SELECT doc_id, unnest(string_split_regex(" +
        s"trim(lower(text), '${TextAnalysis.WsCharsRaw}'), '\\s+')) AS tok " +
        "FROM documents WHERE text IS NOT NULL), " +
        "tf AS (SELECT doc_id, tok, count(*) AS tf FROM toks WHERE tok <> '' GROUP BY 1, 2), " +
        "dfx AS (SELECT tok, count(*) AS df FROM tf GROUP BY 1), " +
        "n AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM documents), " +
        "sc AS (SELECT doc_id, tok, tf, df, " +
        "CAST(tf AS DOUBLE) * (ln((n_docs + 1.0) / (CAST(df AS DOUBLE) + 1.0)) + 1.0) AS tfidf " +
        "FROM tf JOIN dfx USING (tok) CROSS JOIN n) " +
        "SELECT doc_id, CAST(rank AS BIGINT) AS rank, tok, CAST(tf AS BIGINT) AS tf, " +
        "CAST(df AS BIGINT) AS df, (floor((tfidf) * 10000 + 0.499999) / 10000) AS tfidf FROM (" +
        "SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, tok ASC) AS rank " +
        "FROM sc) WHERE rank <= 5"),
    // entropy mirror: H = ln N − (Σ tf·ln tf)/N, ttr = types/tokens;
    // ROUND absorbs ln-sum order deltas, the ratios are exact
    "text_entropy" ->
      ("WITH tf AS (SELECT doc_id, tok, count(*) AS tf FROM (" +
        "SELECT doc_id, unnest(string_split_regex(" +
        s"trim(lower(text), '${TextAnalysis.WsCharsRaw}'), '\\s+')) AS tok " +
        "FROM documents WHERE text IS NOT NULL) WHERE tok <> '' GROUP BY 1, 2) " +
        "SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens, " +
        "CAST(n_types AS BIGINT) AS n_types, " +
        "(floor((CAST(n_types AS DOUBLE) / CAST(n_tokens AS DOUBLE)) * 10000 + 0.499999) / 10000) AS ttr, " +
        "(floor((ln(CAST(n_tokens AS DOUBLE)) - s / CAST(n_tokens AS DOUBLE)) * 10000 + 0.499999) / 10000) AS entropy " +
        "FROM (SELECT doc_id, sum(tf) AS n_tokens, count(*) AS n_types, " +
        "sum(CAST(tf AS DOUBLE) * ln(CAST(tf AS DOUBLE))) AS s FROM tf GROUP BY 1)"),
    // BM25 mirror: same LM tokenization, Lucene idf = ln(1+(N-df+.5)/(df+.5)),
    // dl = whitespace token count, N/avgdl over ALL docs (NULL text counts
    // toward both); ROUND absorbs the order-dependent sum's last ulps
    "text_bm25" ->
      ("WITH dl AS (SELECT doc_id, CASE WHEN text IS NULL OR " +
        s"len(trim(text, '${TextAnalysis.WsCharsRaw}')) = 0 THEN 0.0 ELSE " +
        s"CAST(len(string_split_regex(trim(text, '${TextAnalysis.WsCharsRaw}'), '\\s+')) AS DOUBLE) END AS dl " +
        "FROM documents), " +
        "stats AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(dl) AS avgdl FROM dl), " +
        "toks AS (SELECT doc_id, unnest(string_split_regex(" +
        s"trim(lower(text), '${TextAnalysis.WsCharsRaw}'), '\\s+')) AS tok " +
        "FROM documents WHERE text IS NOT NULL), " +
        "tf AS (SELECT doc_id, tok, count(*) AS tf FROM toks " +
        "WHERE tok IN ('hash', 'join', 'shuffle', 'broadcast') GROUP BY 1, 2), " +
        "dfx AS (SELECT tok, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY 1) " +
        "SELECT doc_id, CAST(count(*) AS BIGINT) AS n_hits, " +
        "(floor((sum(ln(1.0 + (n_docs - df + 0.5) / (df + 0.5)) * " +
        "CAST(tf AS DOUBLE) * 2.2 / (CAST(tf AS DOUBLE) + 1.2 * (0.25 + 0.75 * dl / avgdl)))) * 10000 + 0.499999) / 10000) AS score " +
        "FROM tf JOIN dfx USING (tok) JOIN dl USING (doc_id) CROSS JOIN stats " +
        "GROUP BY doc_id"),
    // URL-dedup mirror: the same fixture VALUES and the same
    // canonicalization regexp chain (RE2's (?i) and no-match-'' extract
    // semantics match Java's), then the exact group-by
    "dedup_url" ->
      ("WITH ud AS (SELECT doc_id, 'https://WWW.' || COALESCE(source, '') || " +
        "'.Example.COM/a/' || CAST(doc_id % 7 AS VARCHAR) || " +
        "(CASE WHEN doc_id % 2 = 0 THEN '/' ELSE '' END) || " +
        "'?utm_source=s' || CAST(doc_id % 3 AS VARCHAR) || " +
        "'&id=' || CAST(doc_id % 7 AS VARCHAR) || " +
        "(CASE WHEN doc_id % 3 = 0 THEN '&fbclid=zz' ELSE '' END) || " +
        "'#sec' || CAST(doc_id % 2 AS VARCHAR) AS url FROM documents), " +
        "n1 AS (SELECT doc_id, regexp_replace(url, '#.*$', '') AS nf FROM ud), " +
        "n2 AS (SELECT doc_id, regexp_extract(nf, '^([^?]*)', 1) AS base0, " +
        "regexp_extract(nf, '\\?(.*)$', 1) AS query FROM n1), " +
        "n3 AS (SELECT doc_id, base0, regexp_replace(regexp_replace(" +
        "'&' || query, '&(utm_[^=&]*|fbclid|gclid|ref)=[^&]*', '', 'g'), " +
        "'^&+', '') AS q2 FROM n2), " +
        "n4 AS (SELECT doc_id, q2, regexp_replace(" +
        "lower(regexp_extract(base0, '(?i)^(https?://[^/]*)', 1)) || " +
        "regexp_replace(base0, '(?i)^https?://[^/]*', ''), '/$', '') AS b " +
        "FROM n3) " +
        "SELECT url_canon, CAST(min(doc_id) AS BIGINT) AS keep_id, " +
        "CAST(count(*) AS BIGINT) AS n_dups FROM (" +
        "SELECT doc_id, CASE WHEN length(q2) > 0 THEN b || '?' || q2 " +
        "ELSE b END AS url_canon FROM n4) GROUP BY 1"),
    // duplicated-span mirror: membership on shingle TEXT (the operator keys
    // on the 64-bit hash — same collision note as dedup_lines); interval
    // union via the identical lead() recurrence
    "text_dup_spans" ->
      ("WITH d AS (SELECT doc_id, COALESCE(text, '') || " +
        "CASE WHEN doc_id % 4 = 0 THEN " +
        "' subscribe to our newsletter for weekly updates and exclusive offers today' " +
        "ELSE '' END || CASE WHEN doc_id % 10 < 2 THEN " +
        "' all rights reserved copyright twenty twenty six by the site owners' " +
        "ELSE '' END AS text FROM documents), " +
        "t AS (SELECT doc_id, string_split_regex(" +
        s"trim(lower(text), '${TextAnalysis.WsCharsRaw}'), '\\s+') AS tk " +
        s"FROM d WHERE length(trim(text, '${TextAnalysis.WsCharsRaw}')) > 0), " +
        "p AS (SELECT doc_id, i - 1 AS pos, array_to_string(tk[i:i+4], ' ') AS s FROM " +
        "(SELECT doc_id, tk, unnest(generate_series(1, len(tk) - 4)) AS i " +
        "FROM t WHERE len(tk) >= 5)), " +
        "hot AS (SELECT s FROM (SELECT s, count(DISTINCT doc_id) AS df FROM p GROUP BY 1) " +
        "WHERE df >= 2), " +
        "dp AS (SELECT doc_id, least(5, COALESCE(" +
        "lead(pos) OVER (PARTITION BY doc_id ORDER BY pos) - pos, 5)) AS covered " +
        "FROM p WHERE s IN (SELECT s FROM hot)), " +
        "cv AS (SELECT doc_id, count(*) AS nds, sum(covered) AS dt FROM dp GROUP BY 1), " +
        "nn AS (SELECT doc_id, len(tk) AS n FROM t) " +
        "SELECT doc.doc_id, CAST(COALESCE(nn.n, 0) AS BIGINT) AS n_tokens, " +
        "CAST(COALESCE(cv.nds, 0) AS BIGINT) AS n_dup_shingles, " +
        "CAST(COALESCE(cv.dt, 0) AS BIGINT) AS dup_tokens, " +
        "CASE WHEN COALESCE(nn.n, 0) > 0 " +
        "THEN CAST(COALESCE(cv.dt, 0) AS DOUBLE) / nn.n ELSE 0.0 END AS dup_token_frac " +
        "FROM documents doc LEFT JOIN nn USING (doc_id) LEFT JOIN cv USING (doc_id)"),
    // span-removal mirror: same duplicated positions, covered token indices
    // via the correlated fixed-length-interval probe, survivors re-agg'd in
    // position order
    "text_dedup_spans" ->
      ("WITH d AS (SELECT doc_id, COALESCE(text, '') || " +
        "CASE WHEN doc_id % 4 = 0 THEN " +
        "' subscribe to our newsletter for weekly updates and exclusive offers today' " +
        "ELSE '' END || CASE WHEN doc_id % 10 < 2 THEN " +
        "' all rights reserved copyright twenty twenty six by the site owners' " +
        "ELSE '' END AS text FROM documents), " +
        "t AS (SELECT doc_id, string_split_regex(" +
        s"trim(lower(text), '${TextAnalysis.WsCharsRaw}'), '\\s+') AS tk " +
        s"FROM d WHERE length(trim(text, '${TextAnalysis.WsCharsRaw}')) > 0), " +
        "p AS (SELECT doc_id, i - 1 AS pos, array_to_string(tk[i:i+4], ' ') AS s FROM " +
        "(SELECT doc_id, tk, unnest(generate_series(1, len(tk) - 4)) AS i " +
        "FROM t WHERE len(tk) >= 5)), " +
        "hot AS (SELECT s FROM (SELECT s, count(DISTINCT doc_id) AS df FROM p GROUP BY 1) " +
        "WHERE df >= 2), " +
        "dp AS (SELECT doc_id, pos FROM p WHERE s IN (SELECT s FROM hot)), " +
        "tok AS (SELECT doc_id, j - 1 AS j, tk[j] AS w FROM " +
        "(SELECT doc_id, tk, unnest(generate_series(1, len(tk))) AS j FROM t)), " +
        "kept AS (SELECT doc_id, j, w FROM tok k1 WHERE NOT EXISTS (" +
        "SELECT 1 FROM dp WHERE dp.doc_id = k1.doc_id " +
        "AND k1.j BETWEEN dp.pos AND dp.pos + 4)), " +
        "reb AS (SELECT doc_id, string_agg(w, ' ' ORDER BY j) AS text_clean, " +
        "count(*) AS nk FROM kept GROUP BY 1), " +
        "nn AS (SELECT doc_id, len(tk) AS n FROM t) " +
        "SELECT doc.doc_id, COALESCE(reb.text_clean, '') AS text_clean, " +
        "CAST(COALESCE(nn.n, 0) AS BIGINT) AS n_tokens, " +
        "CAST(COALESCE(reb.nk, 0) AS BIGINT) AS n_tokens_kept, " +
        "CAST(COALESCE(nn.n, 0) - COALESCE(reb.nk, 0) AS BIGINT) AS n_tokens_dropped " +
        "FROM documents doc LEFT JOIN nn USING (doc_id) LEFT JOIN reb USING (doc_id)"),
    // leakage-safe split mirror: the recursive-CTE component closure feeds
    // the SAME split-case hash, keyed on COALESCE(component, doc_id)
    "sample_split_safe" ->
      (s"$ClusterComponentsCte SELECT d.doc_id, " +
        s"${splitCaseSql("COALESCE(comp.component, d.doc_id)")} AS split " +
        "FROM documents d LEFT JOIN comp ON d.doc_id = comp.id"),
    // centroid-map mirror: same unit chain, fixed-point HUGEINT component
    // sums, (s/n)/S mean sequence, 0.0-seeded norm fold, pair inner product
    "emb_class_sim" ->
      (s"WITH ${centroidCtes("cn", "")} " +
        "SELECT a.g AS g_a, b.g AS g_b, " +
        "ROUND(list_inner_product(a.v, b.v), 4) AS cosine " +
        "FROM cn a JOIN cn b ON a.g < b.g"),
    // centroid-drift mirror: the same fixed-point centroid chain once per
    // generation, full-outer on the group so appear/vanish is visible
    "drift_centroid" ->
      (s"WITH ${centroidCtes("ca", "WHERE vec_id % 2 = 0")}, " +
        s"${centroidCtes("cb", "WHERE vec_id % 2 = 1")} " +
        "SELECT COALESCE(a.g, b.g) AS label, " +
        "CASE WHEN a.g IS NOT NULL AND b.g IS NOT NULL THEN " +
        "ROUND(list_inner_product(a.v, b.v), 4) END AS cosine, " +
        "a.g IS NOT NULL AS in_old, b.g IS NOT NULL AS in_new " +
        "FROM ca a FULL OUTER JOIN cb b ON a.g = b.g"),
    // binary-sign mirror: identical sign-bit packing (HUGEINT bit sum folded
    // to the signed 64-bit word), popcount-XOR hamming, top-32 candidates by
    // (hamming, neighbor_id), exact-cosine rerank — candidate sets agree
    // across engines because sign bits never touch IEEE division
    "sim_topk_b1" ->
      ("WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings), " +
        "wmask AS (SELECT vec_id, v, list_reduce(list_prepend(CAST(0 AS HUGEINT), " +
        "[CASE WHEN v[i] > 0 THEN CAST(1 AS HUGEINT) << CAST(i - 1 AS INT) " +
        "ELSE CAST(0 AS HUGEINT) END for i in generate_series(1, 64)]), " +
        "(a, b) -> a + b) AS s FROM e), " +
        "wrd AS (SELECT vec_id, v, CAST(CASE WHEN s >= 9223372036854775808 " +
        "THEN s - 18446744073709551616 ELSE s END AS BIGINT) AS w FROM wmask), " +
        "cand AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, " +
        "q.v AS qv, c.v AS cv FROM wrd q JOIN wrd c ON q.vec_id < 10 " +
        "AND c.vec_id <> q.vec_id QUALIFY row_number() OVER (" +
        "PARTITION BY q.vec_id ORDER BY bit_count(xor(q.w, c.w)) ASC, " +
        "c.vec_id ASC) <= 32) " +
        "SELECT query_id, neighbor_id, rank, ROUND(c, 4) AS cosine FROM (" +
        "SELECT query_id, neighbor_id, list_cosine_similarity(qv, cv) AS c, " +
        "row_number() OVER (PARTITION BY query_id ORDER BY " +
        "list_cosine_similarity(qv, cv) DESC, neighbor_id ASC) AS rank " +
        "FROM cand) WHERE rank <= 5"),
    "sim_topk" ->
      ("SELECT query_id, neighbor_id, rank, ROUND(c, 4) AS cosine FROM (" +
        "SELECT q.vec_id AS query_id, b.vec_id AS neighbor_id, " +
        "list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) AS c, " +
        "row_number() OVER (PARTITION BY q.vec_id ORDER BY " +
        "list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) DESC, " +
        "b.vec_id ASC) AS rank " +
        "FROM embeddings q, embeddings b WHERE q.vec_id < 10 AND b.vec_id <> q.vec_id) " +
        "WHERE rank <= 5"),
    // bitext-mining mirror: Spark's exact IEEE op sequence — unit vectors
    // (elementwise /sqrt(left-fold)), left-fold dots, rank-ordered
    // 0.0-seeded neighborhood sums, nn_src/8.0 + nn_tgt/8.0 denominator —
    // then both margin argmaxes and the mutual + threshold filter
    "sim_bitext_mine" ->
      (s"WITH $UnitVecCte, " +
        "sc AS (SELECT s.vec_id AS src_id, t.vec_id AS tgt_id, " +
        "list_inner_product(s.v, t.v) AS cosine " +
        "FROM u s, u t WHERE s.vec_id % 2 = 0 AND t.vec_id % 2 = 1), " +
        "fk AS (SELECT src_id, tgt_id, cosine, rank FROM (" +
        "SELECT src_id, tgt_id, cosine, row_number() OVER (" +
        "PARTITION BY src_id ORDER BY cosine DESC, tgt_id ASC) AS rank FROM sc) " +
        "WHERE rank <= 4), " +
        "bk AS (SELECT src_id, tgt_id, cosine, rank FROM (" +
        "SELECT src_id, tgt_id, cosine, row_number() OVER (" +
        "PARTITION BY tgt_id ORDER BY cosine DESC, src_id ASC) AS rank FROM sc) " +
        "WHERE rank <= 4) " +
        BitextTailSql),
    // the IVF-accelerated miner's mirror: per direction, centroids
    // hash-sampled from the corpus side, cell assignment + probe ranking
    // (the sim_ivf_topk idiom), then the IDENTICAL margin/mutual tail
    "sim_bitext_ivf" ->
      (s"WITH $UnitVecCte, " +
        bitextIvfSideCtes("f", qPar = 0, cPar = 1, nLists = 8, nProbe = 3, k = 4) + ", " +
        bitextIvfSideCtes("b", qPar = 1, cPar = 0, nLists = 8, nProbe = 3, k = 4) + ", " +
        "fk AS (SELECT qid AS src_id, nid AS tgt_id, cosine, rank FROM fknn), " +
        "bk AS (SELECT nid AS src_id, qid AS tgt_id, cosine, rank FROM bknn) " +
        BitextTailSql),
    "text_stats" ->
      (s"SELECT doc_id, $TokN AS n_tokens, " +
        s"(CASE WHEN $TokN = 0 THEN 0.0 ELSE " +
        s"CAST(list_sum(list_transform($RawToks, x -> length(x))) AS DOUBLE) / len($RawToks) END) AS mean_token_len, " +
        s"$StopRatioSql AS stopword_ratio, $AlphaRatioSql AS alpha_ratio, " +
        s"(CASE WHEN $TokN = 0 THEN 0.0 ELSE " +
        s"1.0 - CAST(len(list_distinct($RawToks)) AS DOUBLE) / len($RawToks) END) AS repetition_ratio, " +
        s"$QualitySql AS quality, " +
        s"md5(regexp_replace(lower(trim(text, '$SqlWs')), '\\s+', ' ', 'g')) AS fingerprint " +
        "FROM documents"),
    "text_langid" -> LangIdSql,
    "text_langid_ngram" -> LangIdNgramSql,
    "text_langid_ngram_diff" -> LangIdNgramDiffSql,
    // intra-doc line dedup mirror: positional first-occurrence via a
    // (doc, line) row_number, survivors rejoined in position order
    "text_dedup_lines_intra" ->
      ("WITH d AS (SELECT doc_id, CASE WHEN text IS NULL THEN NULL ELSE " +
        "'NAV HOME' || chr(10) || text || chr(10) || 'NAV HOME' || chr(10) || " +
        "'mid' || chr(10) || 'NAV HOME' END AS text FROM documents), " +
        "ls AS (SELECT doc_id, string_split(text, chr(10)) AS arr FROM d), " +
        "ex AS (SELECT doc_id, unnest(generate_series(1, len(arr))) AS pos, arr FROM ls), " +
        "l0 AS (SELECT doc_id, pos, arr[pos] AS line FROM ex), " +
        "k AS (SELECT doc_id, pos, line, row_number() OVER (" +
        "PARTITION BY doc_id, line ORDER BY pos) AS rn FROM l0), " +
        "s AS (SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS t, " +
        "count(*) AS n_kept FROM k WHERE rn = 1 GROUP BY 1) " +
        "SELECT d.doc_id, CASE WHEN d.text IS NULL THEN NULL " +
        "ELSE COALESCE(s.t, '') END AS text_dedup, " +
        "CAST(COALESCE(len(string_split(d.text, chr(10))), 0) AS BIGINT) AS n_lines, " +
        "CAST(COALESCE(len(string_split(d.text, chr(10))) - s.n_kept, 0) AS BIGINT) AS n_removed " +
        "FROM d LEFT JOIN s USING (doc_id)"),
    // line-mix mirror: per-line stopword votes with the (hits DESC, lang
    // ASC) argmax, rolled up to majority/minority per document
    "text_langid_lines" -> {
      val stopVals = TextAnalysis.stopwords.toSeq.sortBy(_._1)
        .flatMap { case (l, ws) => ws.map(w => s"('$l', '$w')") }.mkString(", ")
      s"WITH st(lang, tok) AS (VALUES $stopVals), " +
        "ls AS (SELECT doc_id, string_split(text, chr(10)) AS arr FROM documents " +
        "WHERE text IS NOT NULL), " +
        "ex AS (SELECT doc_id, unnest(generate_series(1, len(arr))) AS ln, arr FROM ls), " +
        s"tk AS (SELECT doc_id, ln, unnest(string_split_regex(" +
        s"trim(lower(arr[ln]), '$SqlWs'), '\\s+')) AS tok FROM ex), " +
        "h AS (SELECT doc_id, ln, lang, count(*) AS hits FROM tk " +
        "JOIN st USING (tok) GROUP BY 1, 2, 3), " +
        "lb AS (SELECT doc_id, ln, lang AS llang FROM (SELECT *, " +
        "row_number() OVER (PARTITION BY doc_id, ln " +
        "ORDER BY hits DESC, lang ASC) AS rk FROM h) WHERE rk = 1), " +
        "pl AS (SELECT doc_id, llang, count(*) AS nl FROM lb GROUP BY 1, 2), " +
        "mj AS (SELECT doc_id, llang AS lang_major, nl AS n_major FROM (" +
        "SELECT *, row_number() OVER (PARTITION BY doc_id " +
        "ORDER BY nl DESC, llang ASC) AS rk FROM pl) WHERE rk = 1), " +
        "ag AS (SELECT doc_id, CAST(sum(nl) AS BIGINT) AS n_classified, " +
        "CAST(count(*) AS BIGINT) AS n_langs FROM pl GROUP BY 1) " +
        "SELECT d.doc_id, COALESCE(n_classified, 0) AS n_classified, " +
        "COALESCE(n_langs, 0) AS n_langs, " +
        "COALESCE(lang_major, 'und') AS lang_major, " +
        "COALESCE(CAST(n_classified - n_major AS DOUBLE) / " +
        "CAST(n_classified AS DOUBLE), 0.0) AS frac_minor " +
        "FROM documents d LEFT JOIN ag USING (doc_id) LEFT JOIN mj USING (doc_id)"
    },
    // quantile cutoff: the interpolation replays Spark Percentile's exact
    // expression — (higher − pos)·lo + (pos − lower)·hi with the
    // higher == lower short-circuit — rather than quantile_cont, whose
    // algebraically-equal lo + d·(hi − lo) can differ by an ulp when
    // lo == hi (quality scores tie constantly); the empty-sample COALESCE
    // mirrors the operator's keep-everything NULL guard
    "text_quality_cutoff" ->
      (s"WITH smp AS (SELECT $QualitySql AS qu FROM documents " +
        s"WHERE ${hashBSql("doc_id")} < ${(0.5 * Sampling.Buckets).toLong}), " +
        "o AS (SELECT qu, row_number() OVER (ORDER BY qu) - 1 AS rn FROM smp), " +
        "p AS (SELECT 0.25 * CAST(count(*) - 1 AS DOUBLE) AS pos FROM o), " +
        "cut AS (SELECT CASE WHEN ceil(pos) = floor(pos) THEN lo.qu " +
        "ELSE (ceil(pos) - pos) * lo.qu + (pos - floor(pos)) * hi.qu END AS c " +
        "FROM p, o lo, o hi WHERE lo.rn = CAST(floor(pos) AS BIGINT) " +
        "AND hi.rn = CAST(ceil(pos) AS BIGINT)) " +
        s"SELECT doc_id FROM documents WHERE $QualitySql >= " +
        "COALESCE((SELECT c FROM cut), CAST('-infinity' AS DOUBLE))"),
    // grouped mirror: Spark `percentile`'s rank interpolation replayed per
    // source partition; docs LEFT JOIN cutoffs (a NULL source never matches
    // → kept, exactly the operator's conservative default)
    "text_quality_cutoff_by" ->
      (s"WITH smp AS (SELECT source, $QualitySql AS qu FROM documents " +
        s"WHERE ${hashBSql("doc_id")} < ${(0.5 * Sampling.Buckets).toLong}), " +
        "o AS (SELECT source, qu, row_number() OVER (PARTITION BY source " +
        "ORDER BY qu) - 1 AS rn FROM smp), " +
        "p AS (SELECT source, 0.25 * CAST(count(*) - 1 AS DOUBLE) AS pos " +
        "FROM o GROUP BY source), " +
        "cut AS (SELECT p.source, CASE WHEN ceil(pos) = floor(pos) THEN lo.qu " +
        "ELSE (ceil(pos) - pos) * lo.qu + (pos - floor(pos)) * hi.qu END AS c " +
        "FROM p JOIN o lo ON lo.source IS NOT DISTINCT FROM p.source " +
        "AND lo.rn = CAST(floor(pos) AS BIGINT) " +
        "JOIN o hi ON hi.source IS NOT DISTINCT FROM p.source " +
        "AND hi.rn = CAST(ceil(pos) AS BIGINT)) " +
        s"SELECT doc_id FROM documents d LEFT JOIN cut ON d.source = cut.source " +
        s"WHERE $QualitySql >= " +
        "COALESCE(cut.c, CAST('-infinity' AS DOUBLE))"),
    "text_repetition" -> RepetitionSql,
    "text_quality_filter" -> QualityFilterSql,
    "text_topngrams" ->
      (s"${shinglesCte(2, minToks = 2)} " +
        "SELECT ngram, df, rank FROM (SELECT ngram, df, " +
        "CAST(row_number() OVER (ORDER BY df DESC, ngram ASC) AS BIGINT) AS rank " +
        "FROM (SELECT ngram, count(*) AS df FROM " +
        "(SELECT doc_id, unnest(sh) AS ngram FROM t) GROUP BY 1 HAVING count(*) >= 2)) " +
        "WHERE rank <= 20"),
    "sample_bernoulli" ->
      (s"SELECT doc_id FROM documents WHERE $HashB < ${(0.25 * Sampling.Buckets).toLong}"),
    "sample_split" ->
      (s"SELECT doc_id, ${splitCaseSql("doc_id")} AS split FROM documents"),
    "sample_quota" ->
      (s"SELECT doc_id, source FROM (SELECT doc_id, source, row_number() OVER (" +
        s"PARTITION BY source ORDER BY $HashB ASC, doc_id ASC) AS rk FROM documents) " +
        "WHERE rk <= 5"),
    // CASTs: DuckDB's sum() over INT promotes to HUGEINT and // / % on it
    // return DOUBLE — without them the oracle emits 5.0 where Spark emits 5.
    // The WHERE mirrors packSequences' default dropEmpty (no-op on this
    // corpus, which has no zero-token docs — kept exact anyway)
    "sample_pack" ->
      (s"SELECT doc_id, ${pmSql(HashRaw, "8")} AS shard, " +
        "CAST((cum - n) // 512 AS BIGINT) AS seq_id, " +
        s"CAST((cum - n) % 512 AS BIGINT) AS tok_offset FROM (SELECT doc_id, $TokN AS n, " +
        s"sum($TokN) OVER (PARTITION BY ${pmSql(HashRaw, "8")} ORDER BY doc_id " +
        s"ROWS UNBOUNDED PRECEDING) AS cum FROM documents WHERE $TokN > 0)"),
    // packed-sequence materialization: same prefix-sum positions as
    // sample_pack, then ORDER BY (tok_offset, doc_id) string_agg per
    // (shard, seq_id) — the array_sort(collect_list(struct)) mirror
    "sample_pack_seqs" ->
      ("SELECT shard, seq_id, CAST(count(*) AS BIGINT) AS n_docs, " +
        "string_agg(text, chr(10) ORDER BY tok_offset, doc_id) AS seq_text " +
        "FROM (SELECT doc_id, text, shard, " +
        "CAST((cum - n) // 512 AS BIGINT) AS seq_id, " +
        "CAST((cum - n) % 512 AS BIGINT) AS tok_offset FROM (" +
        s"SELECT doc_id, text, ${pmSql(HashRaw, "8")} AS shard, $TokN AS n, " +
        s"sum($TokN) OVER (PARTITION BY ${pmSql(HashRaw, "8")} ORDER BY doc_id " +
        s"ROWS UNBOUNDED PRECEDING) AS cum FROM documents WHERE $TokN > 0)) " +
        "GROUP BY shard, seq_id"),
    // subword-tokenization mirror: the greedy longest-match walk replayed by
    // the shared recursive CTE (BpeCtes); flat position = rank by (word
    // index, piece start) within the doc — the expression's emission order
    "text_bpe" ->
      (s"WITH $BpeCtes SELECT doc_id, " +
        "CAST(row_number() OVER (PARTITION BY doc_id ORDER BY wi, spos) - 1 AS BIGINT) AS pos, " +
        "tid AS token_id FROM enc"),
    // html-strip mirror: the same single-sourced regex chain + ordered
    // entity decodes over the same synthesized page
    "text_html_strip" -> {
      val entityChain = TextAnalysis.HtmlEntities.foldLeft("t") {
        case (acc, (e, v)) =>
          s"replace($acc, '$e', '${v.replace("'", "''")}')"
      }
      "WITH h AS (SELECT doc_id, '<html><!-- c --><head>" +
        "<script type=''t''>var a = ''<p>'';</script>" +
        "<style>p { color: red }</style></head><body><h1>Title</h1><p>' " +
        "|| text || '</p><br/><td>cell</td><div class=\"x\">&amp;amp; " +
        "&lt;b&gt; it&#39;s</div></body></html>' AS html FROM documents), " +
        s"s1 AS (SELECT doc_id, regexp_replace(html, " +
        s"'${TextAnalysis.HtmlBlockRe}', ' ', 'g') AS t FROM h), " +
        s"s2 AS (SELECT doc_id, regexp_replace(t, " +
        s"'${TextAnalysis.HtmlCommentRe}', ' ', 'g') AS t FROM s1), " +
        s"s3 AS (SELECT doc_id, regexp_replace(t, " +
        s"'${TextAnalysis.HtmlTagRe}', ' ', 'g') AS t FROM s2), " +
        s"c AS (SELECT doc_id, trim(regexp_replace($entityChain, " +
        s"'[$SqlWs]+', ' ', 'g'), ' ') AS clean FROM s3) " +
        "SELECT doc_id, md5(clean) AS clean_md5, " +
        "CAST(CASE WHEN length(clean) = 0 THEN 0 " +
        "ELSE len(string_split(clean, ' ')) END AS BIGINT) AS n_tokens FROM c"
    },
    // merge-learning mirror: `rounds` chained (pairs → argmax → replace)
    // CTE rounds over the chr(31)-wrapped word vocabulary
    "text_bpe_merges" -> bpeLearnOracleSql(12),
    "text_bbpe_merges" -> bpeLearnOracleSql(12, byteLevel = true),
    // the distributed sibling answers the SAME replay — the driver gate
    // pins distributed == driver-local row for row
    "text_bbpe_merges_dist" -> bpeLearnOracleSql(12, byteLevel = true),
    "text_bbpe_merges_batched" ->
      bpeBatchedLearnOracleSql(3, 4, byteLevel = true),
    "text_bbpe_curve" -> bpeCurveOracleSql(10, byteLevel = true),
    "text_bbpe_apply" -> bbpeApplyOracleSql(12),
    "text_bbpe_apply_fast" -> bbpeApplyOracleSql(12),
    "text_bbpe_ids" -> bbpeIdsOracleSql(12),
    "text_bbpe_merges_gpt2" ->
      bpeLearnOracleSql(12, byteLevel = true, corpus = "gdocs", gpt2 = true),
    "text_bbpe_apply_gpt2" ->
      bbpeApplyOracleSql(12, corpus = "gdocs", gpt2 = true),
    "text_bbpe_ids_gpt2" ->
      bbpeIdsOracleSql(12, corpus = "gdocs", gpt2 = true),
    // byte-level pack mirror: the byte-level apply chain's per-doc counts
    // feeding the same prefix-sum pack recurrence
    "sample_pack_bbpe" ->
      (s"WITH $MdocsCte, ${bbpeApplyCtes(12)} " +
        "SELECT doc_id, shard, CAST((cum - n) // 512 AS BIGINT) AS seq_id, " +
        "CAST((cum - n) % 512 AS BIGINT) AS tok_offset FROM (" +
        s"SELECT doc_id, ${pmSql(HashRaw, "8")} AS shard, n, " +
        s"sum(n) OVER (PARTITION BY ${pmSql(HashRaw, "8")} ORDER BY doc_id " +
        "ROWS UNBOUNDED PRECEDING) AS cum " +
        "FROM mdocs JOIN bn USING (doc_id) WHERE n > 0)"),
    "text_bpe_merges_batched" -> bpeBatchedLearnOracleSql(3, 4),
    "text_wordpiece_merges_batched" ->
      bpeBatchedLearnOracleSql(3, 4, wordpiece = true),
    "text_wordpiece_merges" -> bpeLearnOracleSql(10, wordpiece = true),
    "text_wordpiece_apply" -> bpeApplyOracleSql(10, wordpiece = true),
    // learned-tokenizer application mirror: learning chain + per-token
    // rank-order replace chain + piece-count roll-up
    "text_bpe_apply" -> bpeApplyOracleSql(12),
    // unigram-LM learning mirror: seed → 2 Viterbi-EM rounds → ranked
    // pieces with shift-square fixed-point costs, all replayed exactly
    "text_unigram_pieces" -> unigramPiecesOracleSql(2, 120, 6),
    // the same chain plus a final DP under the learned costs, rolled up
    // per document with the 1-piece fallback for out-of-scope tokens
    "text_unigram_apply" -> unigramApplyOracleSql(2, 120, 6),
    // the native fast path answers to the IDENTICAL mirror
    "text_bpe_apply_fast" -> bpeApplyOracleSql(12),
    // pack-on-learned-counts: the sample_pack recurrence over the learned
    // per-doc piece counts
    "sample_pack_learned" ->
      (s"WITH $MdocsCte, ${bpeApplyCtes(12)} " +
        "SELECT doc_id, shard, CAST((cum - n) // 512 AS BIGINT) AS seq_id, " +
        "CAST((cum - n) % 512 AS BIGINT) AS tok_offset FROM (" +
        s"SELECT doc_id, ${pmSql(HashRaw, "8")} AS shard, n, " +
        s"sum(n) OVER (PARTITION BY ${pmSql(HashRaw, "8")} ORDER BY doc_id " +
        "ROWS UNBOUNDED PRECEDING) AS cum " +
        "FROM mdocs JOIN bn USING (doc_id) WHERE n > 0)"),
    // token-id export mirror: the full learning chain, piece ids as the
    // (count DESC, piece ASC) ranks over the final vocab, matching words'
    // path pieces enumerated in order, out-of-scope tokens as one OOV row,
    // dense (token, piece) position per document
    "text_unigram_ids" ->
      (s"WITH $MdocsCte, ${unigramApplyCtes(2, 120, 6)}, " +
        "urk AS (SELECT piece, CAST(row_number() OVER (" +
        "ORDER BY cnt DESC, piece ASC) - 1 AS BIGINT) AS pid FROM uv2), " +
        "pm AS (SELECT doc_id, wi, po, COALESCE(pid, 99999) AS piece_id " +
        "FROM (SELECT a.doc_id, a.wi, po, s.path[po] AS piece " +
        "FROM awd a JOIN udpa_seg s ON s.w = a.nw, " +
        "LATERAL (SELECT unnest(generate_series(1, len(s.path))) AS po)) x " +
        "LEFT JOIN urk USING (piece) " +
        "UNION ALL SELECT doc_id, wi, 1 AS po, 99999 AS piece_id FROM awd " +
        s"WHERE NOT ${sqlWordGate("nw", UnigramMaxWordLen)}) " +
        "SELECT doc_id, CAST(row_number() OVER (PARTITION BY doc_id " +
        "ORDER BY wi, po) - 1 AS BIGINT) AS pos, " +
        "CAST(piece_id AS BIGINT) AS piece_id FROM pm"),
    // BPE token-id export mirror: the learning chain, merge ids via
    // min-rank over the concatenated pair strings, char ids by code-point
    // rank over the learn relation's characters, per-token chained-replace
    // pieces enumerated in order, OOV rows for non-word-forms
    // wordpiece pack mirror: the 10-round likelihood-scored chain's
    // per-doc counts feeding the same prefix-sum pack recurrence
    "sample_pack_wordpiece" ->
      (s"WITH $MdocsCte, ${bpeApplyCtes(10, wordpiece = true)} " +
        "SELECT doc_id, shard, CAST((cum - n) // 512 AS BIGINT) AS seq_id, " +
        "CAST((cum - n) % 512 AS BIGINT) AS tok_offset FROM (" +
        s"SELECT doc_id, ${pmSql(HashRaw, "8")} AS shard, n, " +
        s"sum(n) OVER (PARTITION BY ${pmSql(HashRaw, "8")} ORDER BY doc_id " +
        "ROWS UNBOUNDED PRECEDING) AS cum " +
        "FROM mdocs JOIN bn USING (doc_id) WHERE n > 0)"),
    "text_wordpiece_apply_fast" -> bpeApplyOracleSql(10, wordpiece = true),
    "text_bpe_ids" -> subwordIdsOracleSql(12),
    "text_wordpiece_ids" -> subwordIdsOracleSql(10, wordpiece = true),
    // astral-proof mirrors: the SAME learn/apply/ids replays over the
    // fixture-only astral corpus — RE2's code-point `(.)` symbolization,
    // binary (= code-point) collation and code-point `length`/`substring`
    // replay the lifted gate exactly
    "text_bpe_curve" -> bpeCurveOracleSql(12),
    "text_wordpiece_curve" -> bpeCurveOracleSql(10, wordpiece = true),
    "text_bpe_merges_astral" -> bpeLearnOracleSql(8, corpus = "asdocs"),
    "text_bpe_apply_fast_astral" -> bpeApplyOracleSql(8, corpus = "asdocs"),
    "text_unigram_apply_astral" -> unigramApplyOracleSql(2, 120, 6, corpus = "asdocs"),
    "text_bpe_ids_astral" -> subwordIdsOracleSql(8, corpus = "asdocs"),
    // the unigram learn→apply→pack mirror: the full Viterbi-EM chain's
    // per-doc counts feeding the same prefix-sum pack recurrence
    "sample_pack_unigram" ->
      (s"WITH $MdocsCte, ${unigramApplyCtes(2, 120, 6)} " +
        "SELECT doc_id, shard, CAST((cum - n) // 512 AS BIGINT) AS seq_id, " +
        "CAST((cum - n) % 512 AS BIGINT) AS tok_offset FROM (" +
        s"SELECT doc_id, ${pmSql(HashRaw, "8")} AS shard, n, " +
        s"sum(n) OVER (PARTITION BY ${pmSql(HashRaw, "8")} ORDER BY doc_id " +
        "ROWS UNBOUNDED PRECEDING) AS cum " +
        "FROM mdocs JOIN un USING (doc_id) WHERE n > 0)"),
    // pack-and-split recurrence on REAL subword counts: per-doc piece count
    // from the same encoding CTE, then the sample_pack prefix-sum positions
    "sample_pack_bpe" ->
      (s"WITH $BpeCtes, bn AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n " +
        "FROM enc GROUP BY doc_id) " +
        "SELECT doc_id, shard, CAST((cum - n) // 512 AS BIGINT) AS seq_id, " +
        "CAST((cum - n) % 512 AS BIGINT) AS tok_offset FROM (" +
        s"SELECT doc_id, ${pmSql(HashRaw, "8")} AS shard, n, " +
        s"sum(n) OVER (PARTITION BY ${pmSql(HashRaw, "8")} ORDER BY doc_id " +
        "ROWS UNBOUNDED PRECEDING) AS cum " +
        "FROM documents JOIN bn USING (doc_id) WHERE n > 0)"),
    // upsample mirror: copies = floor(rate) + (hash < frac(rate)·Buckets);
    // LATERAL generate_series enumerates the copies, zero-copy rows drop
    "sample_upsample" ->
      (s"SELECT doc_id, source, CAST(copy AS BIGINT) AS copy FROM (" +
        "SELECT doc_id, source, " +
        "(CASE source WHEN 'src0' THEN 2 WHEN 'src1' THEN 0 ELSE 1 END) + " +
        s"(CASE WHEN $HashB < (CASE source " +
        s"WHEN 'src0' THEN ${(0.5 * Sampling.Buckets).toLong} " +
        s"WHEN 'src1' THEN ${(0.5 * Sampling.Buckets).toLong} ELSE 0 END) " +
        "THEN 1 ELSE 0 END) AS copies FROM documents), " +
        "LATERAL (SELECT unnest(generate_series(0, copies - 1)) AS copy) " +
        "WHERE copies > 0"),
    // A-ES weighted-sample mirror: identical integer hash → u ∈ (0,1] →
    // POW(u, 1/w) keys, top-100 by (key DESC, doc_id ASC). The selection
    // depends on floats only through pow(): IEEE-identical operands on both
    // engines, and the kept/dropped boundary keys are far beyond ulp apart
    "sample_weighted" ->
      ("SELECT doc_id, source, n_tokens FROM (" +
        s"SELECT doc_id, source, CAST($TokN AS BIGINT) AS n_tokens, " +
        s"POW(($HashRaw + 1) / 2147483647.0, 1.0 / $TokN) AS wkey " +
        s"FROM documents WHERE $TokN > 0) " +
        "ORDER BY wkey DESC, doc_id ASC LIMIT 100"),
    // cell-balanced mirror: the IVF assignment replay (hash-sampled
    // centroids, lexicographic (score, cell) argmax) + a per-cell portable-
    // hash rank cap
    "sample_cell_balanced" -> {
      val h = hashRawSql("vec_id")
      s"WITH $UnitVecCte, " +
        s"cent AS (SELECT row_number() OVER (ORDER BY $h, vec_id) - 1 AS cell, v " +
        s"FROM u QUALIFY row_number() OVER (ORDER BY $h, vec_id) <= 8), " +
        "asg AS (SELECT u.vec_id, " +
        "(max({'s': list_inner_product(c.v, u.v), 'c': c.cell})).c AS cell " +
        "FROM u, cent c GROUP BY u.vec_id) " +
        "SELECT vec_id, CAST(cell AS BIGINT) AS cell FROM asg " +
        s"QUALIFY row_number() OVER (PARTITION BY cell ORDER BY $h, vec_id) <= 20"
    },
    // importance-resample mirror: W is accumulated in fixed point —
    // floor(w·2²⁰) summed as exact DECIMAL(38,0), order-independent on any
    // engine — then divided back; the gate replays ((100·w)/W)·9973
    // floor-for-floor (same IEEE ops), and the bucket compare is integer
    "sample_importance" ->
      ("WITH t AS (SELECT CAST(sum(CAST(floor(" +
        "CAST(greatest(coalesce(n_chars, 0), 0) AS DOUBLE) * 1048576.0" +
        ") AS DECIMAL(38,0))) AS DOUBLE) / 1048576.0 AS wsum " +
        "FROM documents) " +
        "SELECT doc_id, source, n_chars FROM documents, t " +
        "WHERE CAST(greatest(coalesce(n_chars, 0), 0) AS DOUBLE) > 0 " +
        s"AND $HashB < CAST(floor(least(1.0, " +
        "(100.0 * CAST(greatest(coalesce(n_chars, 0), 0) AS DOUBLE)) / wsum) " +
        "* 9973.0) AS BIGINT)"),
    // token-id export mirror: vocab = top-256 tokens by (count DESC, token
    // ASC) with 0-based rank ids; same pack CTE as sample_pack_seqs; each
    // packed doc's tokens enumerated in order (LATERAL index, like the
    // emb_quantize slot mirror), vocab-joined with OOV 9999; pos = rank by
    // (tok_offset, doc_id, token index) within the (shard, seq_id) group —
    // exactly the array_sort(struct)-flatten order on the Spark side
    "sample_pack_ids" ->
      (s"WITH vocab AS (SELECT t, CAST(row_number() OVER (ORDER BY cnt DESC, t ASC) - 1 AS BIGINT) AS tid " +
        s"FROM (SELECT t, count(*) AS cnt FROM (SELECT unnest($RawToks) AS t FROM documents) " +
        "WHERE t <> '' GROUP BY t) ORDER BY cnt DESC, t ASC LIMIT 256), " +
        "pk AS (SELECT doc_id, text, shard, " +
        "CAST((cum - n) // 512 AS BIGINT) AS seq_id, " +
        "CAST((cum - n) % 512 AS BIGINT) AS tok_offset FROM (" +
        s"SELECT doc_id, text, ${pmSql(HashRaw, "8")} AS shard, $TokN AS n, " +
        s"sum($TokN) OVER (PARTITION BY ${pmSql(HashRaw, "8")} ORDER BY doc_id " +
        s"ROWS UNBOUNDED PRECEDING) AS cum FROM documents WHERE $TokN > 0)), " +
        "dt AS (SELECT doc_id, shard, seq_id, tok_offset, i - 1 AS ti, toks[i] AS t FROM " +
        s"(SELECT doc_id, shard, seq_id, tok_offset, $RawToks AS toks FROM pk), " +
        "LATERAL (SELECT unnest(generate_series(1, len(toks))) AS i)) " +
        "SELECT shard, seq_id, " +
        "CAST(row_number() OVER (PARTITION BY shard, seq_id " +
        "ORDER BY tok_offset, doc_id, ti) - 1 AS BIGINT) AS pos, " +
        "CAST(COALESCE(tid, 9999) AS BIGINT) AS token_id " +
        "FROM dt LEFT JOIN vocab USING (t)"),
    // whole-doc greedy packing mirror: the overflow-reset recurrence replayed
    // per shard by a linear recursive CTE — each step advances every shard's
    // scan one document (rn join), carrying (seq_id, fill) exactly like the
    // engine's per-partition state; base case places the first doc at
    // (0, 0) even when over-budget, matching the fill == 0 admission rule
    "sample_pack_whole" ->
      ("WITH RECURSIVE d AS (SELECT doc_id, shard, n, " +
        "row_number() OVER (PARTITION BY shard ORDER BY doc_id) AS rn FROM (" +
        s"SELECT doc_id, ${pmSql(HashRaw, "8")} AS shard, $TokN AS n " +
        s"FROM documents WHERE $TokN > 0)), " +
        "pk(shard, rn, doc_id, seq_id, tok_offset, fill) AS (" +
        "SELECT shard, rn, doc_id, CAST(0 AS BIGINT), CAST(0 AS BIGINT), " +
        "CAST(n AS BIGINT) FROM d WHERE rn = 1 " +
        "UNION ALL SELECT d.shard, d.rn, d.doc_id, " +
        "CASE WHEN pk.fill + d.n > 512 THEN pk.seq_id + 1 ELSE pk.seq_id END, " +
        "CASE WHEN pk.fill + d.n > 512 THEN CAST(0 AS BIGINT) ELSE pk.fill END, " +
        "CASE WHEN pk.fill + d.n > 512 THEN CAST(d.n AS BIGINT) ELSE pk.fill + d.n END " +
        "FROM pk JOIN d ON d.shard = pk.shard AND d.rn = pk.rn + 1) " +
        "SELECT doc_id, shard, seq_id, tok_offset FROM pk"),
    // fill accounting: group the same recursive packing by sequence; pad is
    // the unused budget (0 only for a lone over-budget doc's sequence)
    "sample_pack_fill" ->
      ("WITH RECURSIVE d AS (SELECT doc_id, shard, n, " +
        "row_number() OVER (PARTITION BY shard ORDER BY doc_id) AS rn FROM (" +
        s"SELECT doc_id, ${pmSql(HashRaw, "8")} AS shard, $TokN AS n " +
        s"FROM documents WHERE $TokN > 0)), " +
        "pk(shard, rn, seq_id, fill) AS (" +
        "SELECT shard, rn, CAST(0 AS BIGINT), CAST(n AS BIGINT) FROM d WHERE rn = 1 " +
        "UNION ALL SELECT d.shard, d.rn, " +
        "CASE WHEN pk.fill + d.n > 512 THEN pk.seq_id + 1 ELSE pk.seq_id END, " +
        "CASE WHEN pk.fill + d.n > 512 THEN CAST(d.n AS BIGINT) ELSE pk.fill + d.n END " +
        "FROM pk JOIN d ON d.shard = pk.shard AND d.rn = pk.rn + 1) " +
        "SELECT shard, seq_id, CAST(count(*) AS BIGINT) AS n_docs, " +
        "CAST(sum(n) AS BIGINT) AS n_tokens, " +
        "CAST(greatest(512 - sum(n), 0) AS BIGINT) AS pad " +
        "FROM pk JOIN d USING (shard, rn) GROUP BY shard, seq_id"),
    // export shuffle: shard = hash(id, seed 42) mod 8, pos = rank within the
    // shard by the independent seed-43 hash (id tie-break), 0-based
    "sample_shuffle" ->
      ("SELECT doc_id, shard, CAST(row_number() OVER (" +
        "PARTITION BY shard ORDER BY h2 ASC, doc_id ASC) - 1 AS BIGINT) AS pos " +
        s"FROM (SELECT doc_id, ${pmSql(HashRaw, "8")} AS shard, " +
        s"${hashRawSql("doc_id", 43)} AS h2 FROM documents)"),
    // priority survivors: same synthesized duplicate groups as the query,
    // winner = argmin (rank, doc_id) per text fingerprint
    "dedup_priority" ->
      ("WITH base AS (SELECT doc_id // 4 AS g, text AS gtext FROM documents " +
        "WHERE doc_id % 4 = 0), " +
        "fx AS (SELECT d.doc_id, b.gtext AS text, d.source FROM documents d " +
        "JOIN base b ON d.doc_id // 4 = b.g), " +
        "r AS (SELECT doc_id, source, " +
        s"md5(regexp_replace(lower(trim(text, '$SqlWs')), '\\s+', ' ', 'g')) AS f, " +
        "CASE source WHEN 'src7' THEN 1 WHEN 'src2' THEN 2 WHEN 'src13' THEN 3 " +
        "ELSE 4 END AS rank FROM fx) " +
        "SELECT doc_id, source FROM (SELECT doc_id, source, row_number() OVER (" +
        "PARTITION BY f ORDER BY rank ASC, doc_id ASC) AS rn FROM r) WHERE rn = 1"),
    "emb_project" -> EmbProjectSql,
    "sim_kmeans" -> KmeansAssignSql,
    "sample_kcenter" -> KcenterSql,
    "sample_kcenter_batched" -> KcenterSql,
    "sample_mmr" -> MmrSql,
    "sim_ivf_kmeans" -> IvfKmeansSql,
    // z-score alarms over the dense signup series: group stats via window
    // aggregates on the same grid as the gap-fill oracle
    "a12_anomaly" ->
      (s"$DenseGridCtes, ser AS (SELECT g.window_start, g.tenant_id, " +
        "COALESCE(a.v, 0.0) AS value FROM g LEFT JOIN a " +
        "ON g.tenant_id = a.tenant_id AND g.window_start = a.window_start), " +
        "z AS (SELECT window_start, tenant_id, value, " +
        "avg(value) OVER (PARTITION BY tenant_id) AS m, " +
        "stddev_samp(value) OVER (PARTITION BY tenant_id) AS sd FROM ser) " +
        "SELECT window_start, tenant_id, value, " +
        s"${sqlRound2("CASE WHEN sd > 0 THEN (value - m) / sd ELSE 0.0 END")} AS zscore, " +
        // flag from the SAME rounded zscore as the Spark side (boundary-stable)
        s"(abs(${sqlRound2("CASE WHEN sd > 0 THEN (value - m) / sd ELSE 0.0 END")}) > 2.0) " +
        "AS is_anomaly FROM z"),
    // rolling fingerprints: window 32, maskBits 4 → keep hashes ≡ 0 mod 16
    "text_rollhash" ->
      (s"${rollingHashCte(32)} SELECT doc_id, " +
        "CAST(len(list_filter(hashes, x -> x % 16 = 0)) AS BIGINT) AS n_cutpoints FROM rh"),
    // CDC chunking: window 16, maskBits 5 → cut AFTER byte i+16 when
    // hashes[i] ≡ 0 mod 32; chunk lens from consecutive (0 ∪ cuts ∪ n) bounds,
    // clamped to n and dropped when empty — mirrors TextAnalysis.chunkByContent
    "text_chunks" ->
      (s"${rollingHashCte(16)}, bd AS (SELECT doc_id, n, " +
        "list_concat(list_concat([CAST(0 AS BIGINT)], " +
        "[CAST(i + 16 AS BIGINT) for i in range(len(hashes)) if hashes[i+1] % 32 = 0]), " +
        "[CAST(n AS BIGINT)]) AS bounds FROM rh), " +
        "ch AS (SELECT doc_id, [least(bounds[i+2], n) - bounds[i+1] " +
        "for i in range(len(bounds)-1) " +
        "if bounds[i+2] > bounds[i+1] AND bounds[i+1] < n] AS chunk_lens FROM bd) " +
        "SELECT doc_id, CAST(len(chunk_lens) AS BIGINT) AS n_chunks, " +
        "CAST(COALESCE(list_sum(chunk_lens), 0) AS BIGINT) AS total_len " +
        "FROM ch WHERE len(chunk_lens) > 0"),
    // CDC-chunk dedup mirror: the planted-copy relation feeds the SAME
    // rolling-hash bound math as text_chunks, chunk text reconstructed by
    // substr over the bounds, first-occurrence attribution by row_number
    "dedup_cdc_chunks" ->
      (rollingHashCte(16, "cp").replaceFirst("^WITH ",
        "WITH cp AS (SELECT a.doc_id, CASE WHEN a.doc_id % 7 = 3 THEN " +
          "COALESCE(b.text, a.text) ELSE a.text END AS text " +
          "FROM documents a LEFT JOIN documents b ON b.doc_id = a.doc_id - 1), ") +
        ", bd AS (SELECT doc_id, n, " +
        "list_concat(list_concat([CAST(0 AS BIGINT)], " +
        "[CAST(i + 16 AS BIGINT) for i in range(len(hashes)) if hashes[i+1] % 32 = 0]), " +
        "[CAST(n AS BIGINT)]) AS bounds FROM rh), " +
        "cx AS (SELECT doc_id, unnest(generate_series(1, len(bounds) - 1)) AS i, " +
        "bounds, n FROM bd), " +
        "ck AS (SELECT cx.doc_id, cx.i, md5(substr(cp.text, bounds[i] + 1, " +
        "least(bounds[i + 1], n) - bounds[i])) AS ch " +
        "FROM cx JOIN cp ON cx.doc_id = cp.doc_id " +
        "WHERE bounds[i + 1] > bounds[i] AND bounds[i] < n " +
        "AND least(bounds[i + 1], n) - bounds[i] > 0), " +
        "r AS (SELECT doc_id, row_number() OVER (PARTITION BY ch " +
        "ORDER BY doc_id, i) AS rn FROM ck) " +
        "SELECT doc_id, CAST(count(*) AS BIGINT) AS n_chunks, " +
        "CAST(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_chunks " +
        "FROM r GROUP BY 1"),
    // span-attribution mirror: the planted-quote host fixture, the CDC
    // bound math of dedup_cdc_chunks (window 16, mask 5), chunk text by
    // substr over the bounds with 0-based kept-chunk reindexing, distinct
    // trigram shingles on both sides, hit counts per (chunk, bench) pair —
    // string-equality shingle match (the hash join on the Spark side is
    // equality of the same strings)
    "report_contam_spans" ->
      (s"WITH $ContamSpanCtes " +
        "SELECT doc_id, chunk_idx, bench_id, n_shared, chunk_shingles, " +
        "overlap FROM hitp WHERE overlap >= 0.5"),
    // span-REMOVAL mirror: the same chain, flagged (doc, chunk) pairs
    // anti-joined away, surviving chunks re-concatenated in index order
    // (chunks partition the text, so '' is the right separator), all
    // corpus docs kept with the empty/zero defaults
    "dedup_decontam_spans" ->
      (s"WITH $ContamSpanCtes, " +
        "fl AS (SELECT DISTINCT doc_id, chunk_idx FROM hitp WHERE overlap >= 0.5), " +
        "keptc AS (SELECT ct.doc_id, ct.chunk_idx, ct.chunk FROM ct " +
        "LEFT JOIN fl USING (doc_id, chunk_idx) WHERE fl.doc_id IS NULL), " +
        "reb AS (SELECT doc_id, string_agg(chunk, '' ORDER BY chunk_idx) " +
        "AS text_clean FROM keptc GROUP BY 1), " +
        "tot AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_chunks FROM ct GROUP BY 1), " +
        "rem AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_removed FROM fl GROUP BY 1) " +
        "SELECT cp.doc_id, COALESCE(reb.text_clean, '') AS text_clean, " +
        "COALESCE(tot.n_chunks, 0) AS n_chunks, " +
        "COALESCE(rem.n_removed, 0) AS n_removed " +
        "FROM cp LEFT JOIN reb USING (doc_id) LEFT JOIN tot USING (doc_id) " +
        "LEFT JOIN rem USING (doc_id)"),
    // chunk math: stride 48, nc = max(ceil((n-16)/48), 1), chunk i covers
    // 1-based token slots [i·48+1, i·48+64] — all integer arithmetic
    "text_chunk_tokens" ->
      (s"WITH t AS (SELECT doc_id, string_split_regex(trim(text, '$SqlWs'), '\\s+') AS toks " +
        s"FROM documents WHERE $TokN > 0), " +
        "c AS (SELECT doc_id, toks, greatest((len(toks) - 16 + 47) // 48, 1) AS nc FROM t), " +
        "e AS (SELECT doc_id, toks, unnest(generate_series(0, nc - 1)) AS chunk_id FROM c) " +
        "SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id, " +
        "md5(array_to_string(toks[chunk_id*48 + 1 : chunk_id*48 + 64], ' ')) AS chunk_md5, " +
        "CAST(length(array_to_string(toks[chunk_id*48 + 1 : chunk_id*48 + 64], ' ')) AS BIGINT) " +
        "AS chunk_len FROM e"),
    // flesch mirror: identical counters (sentence runs, per-token vowel
    // groups with the min-1 floor) and the identical IEEE op order
    "text_flesch" ->
      (s"WITH f AS (SELECT doc_id, CAST($TokN AS BIGINT) AS n_words, " +
        "greatest(CAST(COALESCE(len(regexp_extract_all(text, '[.!?]+')), 0) AS BIGINT), 1) AS n_sentences, " +
        s"CAST(CASE WHEN $TokN > 0 THEN list_reduce(list_prepend(0, " +
        s"[greatest(len(regexp_extract_all(t, '[aeiouy]+')), 1) for t in $LowerToks]), " +
        "(a, b) -> a + b) ELSE 0 END AS BIGINT) AS n_syllables FROM documents) " +
        "SELECT doc_id, n_words, n_sentences, n_syllables, " +
        "CASE WHEN n_words > 0 THEN ROUND(206.835 - " +
        "1.015 * CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE) - " +
        "84.6 * CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE), 4) " +
        "END AS flesch FROM f"),
    "text_tokens" ->
      (s"SELECT doc_id, CAST(CASE WHEN length(trim(text, '$SqlWs')) = 0 THEN 0 ELSE len($RawToks) END AS BIGINT) AS n_ws, " +
        "CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[^a-zA-Z\\s]+')) AS BIGINT) AS n_bpeish " +
        "FROM documents"),
    "mm_meta" ->
      ("SELECT doc_id, 'application/x-fake' AS mime, " +
        "CAST(n_chars % 64 + 1 AS BIGINT) AS width, " +
        "CAST(n_chars % 48 + 1 AS BIGINT) AS height, " +
        "CAST((n_chars % 64 + 1) * (n_chars % 48 + 1) AS BIGINT) AS pixels FROM documents"),
    // multi-frame mirror: the (doc, frame) → pattern-id relation, channel
    // sums and the aHash signature replayed analytically per distinct
    // pattern (PNG is lossless; the decoded frame pixels ARE the pattern)
    "mm_frames_decode" ->
      (s"WITH $FramesCte, " +
        aHashCtes("(SELECT DISTINCT pid FROM fr)", FrameRgbSql) + ", " +
        "cs AS (SELECT pid, width, height, " +
        s"CAST(sum(${FrameRgbSql._1}) AS BIGINT) AS sum_r, " +
        s"CAST(sum(${FrameRgbSql._2}) AS BIGINT) AS sum_g, " +
        s"CAST(sum(${FrameRgbSql._3}) AS BIGINT) AS sum_b " +
        "FROM (SELECT pid, CAST(pid % 16 + 8 AS BIGINT) AS width, " +
        "CAST(pid % 12 + 8 AS BIGINT) AS height " +
        "FROM (SELECT DISTINCT pid FROM fr)), " +
        "LATERAL (SELECT unnest(generate_series(0, width - 1)) AS x), " +
        "LATERAL (SELECT unnest(generate_series(0, height - 1)) AS y) " +
        "GROUP BY pid, width, height) " +
        "SELECT doc_id, CAST(f AS BIGINT) AS frame_idx, width, height, " +
        "sum_r, sum_g, sum_b, phash AS fhash " +
        "FROM fr JOIN cs USING (pid) JOIN ah USING (pid)"),
    // keyframe mirror: the same analytic channel sums, the same lag-window
    // L1 delta and threshold flag (frame 0 → NULL delta, always keyed)
    "mm_video_keyframes" ->
      (s"WITH $FramesCte, " +
        "cs AS (SELECT pid, " +
        s"CAST(sum(${FrameRgbSql._1}) AS BIGINT) AS sum_r, " +
        s"CAST(sum(${FrameRgbSql._2}) AS BIGINT) AS sum_g, " +
        s"CAST(sum(${FrameRgbSql._3}) AS BIGINT) AS sum_b " +
        "FROM (SELECT pid, CAST(pid % 16 + 8 AS BIGINT) AS width, " +
        "CAST(pid % 12 + 8 AS BIGINT) AS height " +
        "FROM (SELECT DISTINCT pid FROM fr)), " +
        "LATERAL (SELECT unnest(generate_series(0, width - 1)) AS x), " +
        "LATERAL (SELECT unnest(generate_series(0, height - 1)) AS y) " +
        "GROUP BY pid) " +
        "SELECT doc_id, frame_idx, delta, " +
        "CAST(CASE WHEN delta IS NULL OR delta > 20000 THEN 1 ELSE 0 END " +
        "AS BIGINT) AS is_key FROM (" +
        "SELECT doc_id, CAST(f AS BIGINT) AS frame_idx, " +
        "abs(sum_r - lag(sum_r) OVER w) + abs(sum_g - lag(sum_g) OVER w) + " +
        "abs(sum_b - lag(sum_b) OVER w) AS delta " +
        "FROM fr JOIN cs USING (pid) " +
        "WINDOW w AS (PARTITION BY doc_id ORDER BY f))"),
    // frame near-dup mirror: analytic per-frame signatures, exhaustive
    // hamming self-join (the oracle may pay the pair space; the engine must
    // not — its plan is the banded pigeonhole join)
    "mm_frames_neardup" ->
      (s"WITH $FramesCte, " +
        aHashCtes("(SELECT DISTINCT pid FROM fr)", FrameRgbSql) + ", " +
        "fsig AS (SELECT doc_id * 8 + f AS fid, phash FROM fr JOIN ah USING (pid)) " +
        "SELECT a.fid AS id_a, b.fid AS id_b, " +
        "CAST(bit_count(xor(a.phash, b.phash)) AS BIGINT) AS hamming " +
        "FROM fsig a JOIN fsig b ON a.fid < b.fid " +
        "WHERE bit_count(xor(a.phash, b.phash)) <= 3"),
    // video dedup mirror: analytic per-frame signatures folded in frame
    // order into the per-video signature string, then min-keeper/count
    "mm_video_dedup" ->
      (s"WITH $FramesCte, " +
        aHashCtes("(SELECT DISTINCT pid FROM fr)", FrameRgbSql) + ", " +
        "vs AS (SELECT doc_id, string_agg(CAST(phash AS VARCHAR), ',' " +
        "ORDER BY f) AS vsig FROM fr JOIN ah USING (pid) GROUP BY doc_id) " +
        "SELECT vsig, min(doc_id) AS keep_id, " +
        "CAST(count(*) AS BIGINT) AS n_dups FROM vs GROUP BY 1"),
    // codec-path mirror: the per-doc pattern (Multimodal.patternDims/
    // patternRgb) replayed analytically over a generate_series pixel grid —
    // DuckDB needs no image codec because PNG is lossless, so the decoded
    // pixels ARE the pattern; integer sums keep the compare exact
    "mm_decode" ->
      ("SELECT doc_id, width, height, " +
        "CAST(sum((doc_id * 7 + x * 3 + y * 5) % 256) AS BIGINT) AS sum_r, " +
        "CAST(sum((doc_id + x * 11 + y) % 256) AS BIGINT) AS sum_g, " +
        "CAST(sum((doc_id * 3 + x + y * 13) % 256) AS BIGINT) AS sum_b " +
        "FROM (SELECT doc_id, CAST(doc_id % 16 + 8 AS BIGINT) AS width, " +
        "CAST(doc_id % 12 + 8 AS BIGINT) AS height FROM documents), " +
        "LATERAL (SELECT unnest(generate_series(0, width - 1)) AS x), " +
        "LATERAL (SELECT unnest(generate_series(0, height - 1)) AS y) " +
        "GROUP BY doc_id, width, height"),
    // aHash mirror: the pattern's pixels over a generate_series grid,
    // ITU-601 luma ×1000, ⌊·8/dim⌋ blocking, exact cross-product compare,
    // bit sum in HUGEINT folded back to the signed 64-bit signature
    "mm_phash" ->
      (s"WITH ${aHashCtes("(SELECT doc_id AS pid FROM documents)")} " +
        "SELECT pid AS doc_id, phash FROM ah"),
    "mm_phash_dct" ->
      s"WITH $pHashDctCtes SELECT doc_id, phash FROM phb",
    "mm_phash_dct_neardup" ->
      (s"WITH $pHashDctCtes " +
        "SELECT a.doc_id AS id_a, b.doc_id AS id_b, " +
        "CAST(bit_count(xor(a.phash, b.phash)) AS BIGINT) AS hamming " +
        "FROM phb a JOIN phb b ON a.doc_id < b.doc_id " +
        "WHERE bit_count(xor(a.phash, b.phash)) <= 3"),
    // image exact-dedup mirror: the SAME analytic signature over the
    // DISTINCT planted-duplicate pattern ids, joined back and grouped —
    // log-compaction semantics (min keeper, duplicate count) per signature
    "mm_dedup" ->
      ("WITH pats AS (SELECT doc_id, doc_id - CASE WHEN doc_id % 7 = 3 " +
        "THEN 1 ELSE 0 END AS pid FROM documents), " +
        aHashCtes("(SELECT DISTINCT pid FROM pats)") + " " +
        "SELECT phash, min(doc_id) AS keep_id, CAST(count(*) AS BIGINT) AS n_dups " +
        "FROM pats JOIN ah USING (pid) GROUP BY 1"),
    // lossy-codec mirror: no pixel values needed — the planted group
    // structure IS the expected answer (per pattern id: its analytic dims,
    // min doc_id, group size). The engine side only matches if the real
    // JPEG round-trip kept planted copies identical and distinct quadratic
    // patterns distinct on the decoded-content key
    "mm_decode_jpeg" ->
      ("WITH pats AS (SELECT doc_id, doc_id - CASE WHEN doc_id % 7 = 3 " +
        "THEN 1 ELSE 0 END AS pid FROM documents) " +
        "SELECT CAST(pid % 16 + 8 AS BIGINT) AS width, " +
        "CAST(pid % 12 + 8 AS BIGINT) AS height, " +
        "min(doc_id) AS keep_id, CAST(count(*) AS BIGINT) AS n_dups " +
        "FROM pats GROUP BY pid"),
    // audio-codec mirror: the per-doc PCM parameters (Multimodal.audioParams)
    // and interleaved sample formula (audioSample) replayed analytically over
    // a generate_series — DuckDB needs no audio codec because PCM is
    // lossless; all-BIGINT arithmetic keeps the compare exact
    // audio VAD mirror: the planted-silence waveform replayed analytically
    // (silence gate q1 ≤ k < q2), 64-sample window energies, the same
    // mean-square threshold compare, spans via gaps-and-islands
    "mm_audio_vad" ->
      (s"WITH $AudioVadCtes " +
        "SELECT doc_id, CAST(row_number() OVER (PARTITION BY doc_id " +
        "ORDER BY w0) - 1 AS BIGINT) AS span, sp = 1 AS is_speech, " +
        "CAST(w0 * 64 AS BIGINT) AS start_sample, n_samples, sum_sq, " +
        "CAST((w0 * 64 // ch) * 1000 // rate AS BIGINT) AS start_ms FROM spn"),
    // per-doc voiced-fraction rollup of the same span chain — the audio
    // quality-filter number; exact long sample counts, ONE division
    "mm_audio_vad_ratio" ->
      (s"WITH $AudioVadCtes " +
        "SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans, " +
        "CAST(sum(CASE WHEN sp = 1 THEN n_samples ELSE 0 END) AS BIGINT) " +
        "AS speech_samples, " +
        "CAST(sum(n_samples) AS BIGINT) AS total_samples, " +
        "CAST(sum(CASE WHEN sp = 1 THEN n_samples ELSE 0 END) AS DOUBLE) / " +
        "CAST(sum(n_samples) AS DOUBLE) AS speech_ratio " +
        "FROM spn GROUP BY doc_id"),
    "mm_audio_vad_shards" ->
      (s"WITH $AudioVadCtes, " +
        "vr AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans, " +
        "CAST(sum(CASE WHEN sp = 1 THEN n_samples ELSE 0 END) AS BIGINT) AS sp_s, " +
        "CAST(sum(n_samples) AS BIGINT) AS tot_s FROM spn GROUP BY doc_id) " +
        // every fixture doc decodes (spn covers all of documents), so the
        // undecodable count is the analytic 0 per shard
        s"SELECT CAST(${pmSql(hashRawSql("doc_id"), "8")} AS BIGINT) AS shard, " +
        "CAST(count(*) AS BIGINT) AS n_docs, " +
        "CAST(0 AS BIGINT) AS n_undecodable, " +
        "CAST(sum(n_spans) AS BIGINT) AS n_spans, " +
        "CAST(sum(sp_s) AS BIGINT) AS speech_samples, " +
        "CAST(sum(tot_s) AS BIGINT) AS total_samples, " +
        "CAST(sum(sp_s) AS DOUBLE) / CAST(sum(tot_s) AS DOUBLE) AS speech_ratio " +
        "FROM vr GROUP BY 1"),
    "mm_audio" ->
      ("SELECT doc_id, CAST(8000 + (doc_id % 4) * 4000 AS BIGINT) AS sample_rate, " +
        "CAST(1 + doc_id % 2 AS BIGINT) AS channels, CAST(16 AS BIGINT) AS bits, " +
        "CAST(doc_id % 256 + 64 AS BIGINT) AS n_frames, " +
        "CAST((doc_id % 256 + 64) * 1000 // (8000 + (doc_id % 4) * 4000) AS BIGINT) AS duration_ms, " +
        "CAST(sum(s) AS BIGINT) AS sum_amp, CAST(sum(s * s) AS BIGINT) AS sum_sq " +
        "FROM (SELECT doc_id, (doc_id * 31 + 7 * k * k + 13 * k) % 65536 - 32768 AS s " +
        "FROM documents, LATERAL (SELECT unnest(generate_series(0, " +
        "(doc_id % 256 + 64) * (1 + doc_id % 2) - 1)) AS k)) " +
        "GROUP BY doc_id"),
    // audio-fingerprint dedup mirror: the planted-duplicate pattern ids,
    // per-pid window energies from the analytic PCM formula (sample k →
    // window k·65 // total, the aHash pigeonhole), energy-difference sign
    // bits summed in HUGEINT and folded to the signed 64-bit signature,
    // then the min-keeper/count grouping — the mm_dedup mirror pattern
    "mm_audio_dedup" ->
      ("WITH pats AS (SELECT doc_id, doc_id - CASE WHEN doc_id % 7 = 3 " +
        "THEN 1 ELSE 0 END AS pid FROM documents), " +
        audioFpCtes("(SELECT pid AS key, pid, 0 AS nudge FROM " +
          "(SELECT DISTINCT pid FROM pats))") + " " +
        "SELECT afp, min(doc_id) AS keep_id, CAST(count(*) AS BIGINT) AS n_dups " +
        "FROM pats JOIN (SELECT key AS pid, afp FROM aaf) af USING (pid) GROUP BY 1"),
    // audio NEAR-dup mirror: the nudged-copy fixture (doc_id % 11 == 4
    // renders its predecessor's waveform with every sample offset by 1,
    // wrapped in 16-bit two's complement — the analytic model of a lossy
    // re-encode's DC drift), both fingerprints replayed analytically, then
    // the BRUTE-FORCE hamming pair spec (the engine side answers with the
    // pigeonhole-banded join, exact by construction at maxHamming < bands)
    "mm_audio_neardup" ->
      ("WITH pats AS (SELECT doc_id, doc_id - CASE WHEN doc_id % 11 = 4 " +
        "THEN 1 ELSE 0 END AS pid, CASE WHEN doc_id % 11 = 4 THEN 1 ELSE 0 END " +
        "AS nudge FROM documents), " +
        audioFpCtes("(SELECT doc_id AS key, pid, nudge FROM pats)") + " " +
        "SELECT a.key AS id_a, b.key AS id_b, " +
        "CAST(bit_count(xor(a.afp, b.afp)) AS BIGINT) AS hamming " +
        "FROM aaf a JOIN aaf b ON a.key < b.key " +
        "WHERE bit_count(xor(a.afp, b.afp)) <= 7"),
    // length-bucketed batching mirror: bucket = n // width, deterministic
    // row_number within (bucket, shard), batch index and position by
    // integer division — all replayed exactly
    "sample_length_buckets" ->
      (s"WITH $LenBucketCtes " +
        "SELECT doc_id, n, CAST(bucket AS BIGINT) AS bucket, " +
        "CAST(shard AS BIGINT) AS shard, CAST(rn // 8 AS BIGINT) AS batch_idx, " +
        "CAST(rn % 8 AS BIGINT) AS pos_in_batch FROM r"),
    // padding-efficiency mirror: per-batch max/rows/token sums from the
    // same assignment CTEs, rolled up per (bucket, shard) with the padded
    // slots exact and one IEEE division
    "report_pack_efficiency" ->
      (s"WITH $LenBucketCtes, " +
        "b AS (SELECT bucket, shard, rn // 8 AS bi, max(n) AS mx, " +
        "CAST(count(*) AS BIGINT) AS rws, CAST(sum(n) AS BIGINT) AS tok " +
        "FROM r GROUP BY 1, 2, 3) " +
        "SELECT CAST(bucket AS BIGINT) AS bucket, CAST(shard AS BIGINT) AS shard, " +
        "CAST(count(*) AS BIGINT) AS n_batches, CAST(sum(rws) AS BIGINT) AS n_rows, " +
        "CAST(sum(tok) AS BIGINT) AS n_tokens, " +
        "CAST(sum(mx * rws - tok) AS BIGINT) AS pad_slots, " +
        "CAST(sum(tok) AS DOUBLE) / " +
        "CAST(sum(tok) + sum(mx * rws - tok) AS DOUBLE) AS efficiency " +
        "FROM b GROUP BY 1, 2"),
    // curriculum mirror: the three sampled-percentile cutoffs replay Spark
    // `percentile`'s rank interpolation (the text_quality_cutoff pattern,
    // once per q), stage = cutoffs cleared, then the (stage, shard) window
    // replays the shuffled in-stage order exactly
    "sample_curriculum" -> {
      val cuts = Seq(1, 2, 3).map { k =>
        s"p$k AS (SELECT ${k / 4.0} * CAST(count(*) - 1 AS DOUBLE) AS pos FROM o), " +
          s"c$k AS (SELECT CASE WHEN ceil(pos) = floor(pos) THEN lo.qu " +
          "ELSE (ceil(pos) - pos) * lo.qu + (pos - floor(pos)) * hi.qu END AS c " +
          s"FROM p$k, o lo, o hi WHERE lo.rn = CAST(floor(pos) AS BIGINT) " +
          "AND hi.rn = CAST(ceil(pos) AS BIGINT))"
      }.mkString(", ")
      val stage = Seq(1, 2, 3).map(k =>
        s"(CASE WHEN $QualitySql >= COALESCE((SELECT c FROM c$k), " +
          "CAST('infinity' AS DOUBLE)) THEN 1 ELSE 0 END)").mkString(" + ")
      s"WITH smp AS (SELECT $QualitySql AS qu FROM documents " +
        s"WHERE $HashB < ${(0.5 * Sampling.Buckets).toLong}), " +
        "o AS (SELECT qu, row_number() OVER (ORDER BY qu) - 1 AS rn FROM smp), " +
        s"$cuts, " +
        s"st AS (SELECT doc_id, $stage AS stage, $HashRaw AS h FROM documents) " +
        "SELECT doc_id, CAST(stage AS BIGINT) AS stage, " +
        s"CAST(${pmSql("h", "8")} AS BIGINT) AS shard, " +
        "CAST(row_number() OVER (PARTITION BY stage, " + pmSql("h", "8") +
        " ORDER BY h, doc_id) - 1 AS BIGINT) AS pos FROM st"
    },
    // grouping-sets mirror: same gid bit order as Spark's grouping_id()
    // (first grouping column = MSB), same exact-cents sum as agg_cube
    "agg_gsets" ->
      ("SELECT event_type, user_id % 3 AS user_band, " +
        "CAST(GROUPING(event_type, user_band) AS BIGINT) AS gid, " +
        "CAST(count(*) AS BIGINT) AS n, " +
        "CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents " +
        "FROM events GROUP BY GROUPING SETS ((event_type), (user_band), ())"),
    // fertility mirror: the langid vote CTE joined to exact piece/word
    // counts; one IEEE division per language row
    "text_fertility" ->
      (s"WITH $MdocsCte, lid AS (${langIdSql("mdocs")}), " +
        s"tk AS (SELECT doc_id, $TokN AS nw, " +
        "len(regexp_extract_all(text, '[a-zA-Z]+|[^a-zA-Z\\s]+')) AS np " +
        "FROM mdocs) " +
        "SELECT lang_pred, CAST(count(*) AS BIGINT) AS n_docs, " +
        "CAST(sum(nw) AS BIGINT) AS n_words, CAST(sum(np) AS BIGINT) AS n_pieces, " +
        "CASE WHEN sum(nw) > 0 THEN CAST(sum(np) AS DOUBLE) / CAST(sum(nw) AS DOUBLE) " +
        "ELSE 0.0 END AS fertility " +
        "FROM tk JOIN lid USING (doc_id) GROUP BY 1"),
    // astral-audit mirror: the same normalized-token relation, RE2's
    // letter class and astral range in place of Java's; counts are exact
    // longs, the share one IEEE division
    "text_astral_oov" ->
      (s"WITH $AdocsCte, " +
        s"tok AS (SELECT unnest($RawToks) AS w0 FROM adocs), " +
        s"nt AS (SELECT ${sqlNorm("w0")} AS w FROM tok WHERE w0 <> '') " +
        "SELECT CAST(count(*) AS BIGINT) AS n_tokens, " +
        s"CAST(sum(CASE WHEN ${sqlWordGate("w")} THEN 1 ELSE 0 END) AS BIGINT) " +
        "AS n_word_forms, " +
        "CAST(sum(CASE WHEN regexp_matches(w, '^\\p{L}+$') AND " +
        "regexp_matches(w, '[\\x{10000}-\\x{10FFFF}]') THEN 1 ELSE 0 END) " +
        "AS BIGINT) AS n_astral_letter, " +
        "CAST(sum(CASE WHEN regexp_matches(w, '[\\x{10000}-\\x{10FFFF}]') " +
        "THEN 1 ELSE 0 END) AS BIGINT) AS n_astral_any, " +
        "CAST(sum(CASE WHEN regexp_matches(w, '[\\x{10000}-\\x{10FFFF}]') AND " +
        "NOT regexp_matches(w, '^\\p{L}+$') THEN 1 ELSE 0 END) " +
        "AS BIGINT) AS n_astral_excluded, " +
        "CAST(sum(CASE WHEN regexp_matches(w, '^\\p{L}+$') AND " +
        "regexp_matches(w, '[\\x{10000}-\\x{10FFFF}]') THEN 1 ELSE 0 END) " +
        "AS DOUBLE) / CAST(count(*) AS DOUBLE) AS astral_letter_share " +
        "FROM nt"),
    "eval_bradley_terry" -> bradleyTerryOracleSql(8, 1L << 20),
    "eval_bt_calibration" -> btCalibrationOracleSql(8, 1L << 20, 10),
    // agreement mirror: ordered-pair counts merged into the unordered pair,
    // majority share as one IEEE division of exact longs
    "eval_pair_agreement" ->
      (s"WITH $BtCmpCtes, " +
        "cnt AS (SELECT winner, loser, CAST(count(*) AS BIGINT) AS n " +
        "FROM cmp GROUP BY 1, 2), " +
        "pa AS (SELECT least(winner, loser) AS item_a, " +
        "greatest(winner, loser) AS item_b, " +
        "CAST(sum(CASE WHEN winner < loser THEN n ELSE 0 END) AS BIGINT) AS wins_a, " +
        "CAST(sum(CASE WHEN winner < loser THEN 0 ELSE n END) AS BIGINT) AS wins_b " +
        "FROM cnt GROUP BY 1, 2) " +
        "SELECT item_a, item_b, wins_a, wins_b, wins_a + wins_b AS n_total, " +
        "CAST(greatest(wins_a, wins_b) AS DOUBLE) / " +
        "CAST(wins_a + wins_b AS DOUBLE) AS agree_ratio FROM pa"),
    // rater-agreement mirror: per-rater ordered-pair counts → unordered
    // direction counts; the pair majority re-aggregates that compaction
    // (strictly decided pairs only), the verdict joins back and rolls up
    // per rater — one IEEE division of exact longs, NULL when a rater
    // judged no adjudicated pair
    "eval_rater_agreement" ->
      (s"WITH $BtCmpCtes, " +
        "rcnt AS (SELECT rater, winner, loser, CAST(count(*) AS BIGINT) AS n " +
        "FROM cmp GROUP BY 1, 2, 3), " +
        "un AS (SELECT rater, least(winner, loser) AS item_a, " +
        "greatest(winner, loser) AS item_b, " +
        "CASE WHEN winner < loser THEN n ELSE 0 END AS na, " +
        "CASE WHEN winner < loser THEN 0 ELSE n END AS nb FROM rcnt), " +
        "maj AS (SELECT item_a, item_b, sum(na) > sum(nb) AS maj_a " +
        "FROM un GROUP BY 1, 2 HAVING sum(na) <> sum(nb)) " +
        "SELECT rater, CAST(sum(na + nb) AS BIGINT) AS n_judged, " +
        "CAST(sum(CASE WHEN maj_a IS NOT NULL THEN na + nb ELSE 0 END) AS BIGINT) " +
        "AS n_adjudicated, " +
        "CAST(sum(CASE WHEN maj_a THEN na WHEN NOT maj_a THEN nb ELSE 0 END) " +
        "AS BIGINT) AS n_agree, " +
        "CASE WHEN sum(CASE WHEN maj_a IS NOT NULL THEN na + nb ELSE 0 END) > 0 " +
        "THEN CAST(sum(CASE WHEN maj_a THEN na WHEN NOT maj_a THEN nb ELSE 0 END) " +
        "AS DOUBLE) / " +
        "CAST(sum(CASE WHEN maj_a IS NOT NULL THEN na + nb ELSE 0 END) AS DOUBLE) " +
        "END AS agree_ratio " +
        "FROM un LEFT JOIN maj USING (item_a, item_b) GROUP BY 1"),
    // Krippendorff mirror: identical unit/label framing, the same 1e-6
    // integer floor grid for the per-unit division, the same fixed double
    // expression for the final alpha
    "eval_krippendorff" ->
      (s"WITH $BtCmpCtes, " +
        "ku AS (SELECT least(winner, loser) AS a, greatest(winner, loser) AS b, " +
        "CASE WHEN winner < loser THEN 1 ELSE 0 END AS lab FROM cmp), " +
        "kg AS (SELECT a, b, CAST(count(*) AS BIGINT) AS m, " +
        "CAST(sum(lab) AS BIGINT) AS ones FROM ku GROUP BY 1, 2 " +
        "HAVING count(*) >= 2), " +
        "kt AS (SELECT CAST(count(*) AS BIGINT) AS units, " +
        "CAST(sum(m) AS BIGINT) AS n_values, " +
        "CAST(sum(m - ones) AS BIGINT) AS n_zero, " +
        "CAST(sum(ones) AS BIGINT) AS n_one, " +
        "CAST(sum((2 * ones * (m - ones) * 1000000) // (m - 1)) AS BIGINT) " +
        "AS do_scaled FROM kg) " +
        "SELECT units, n_values, n_zero, n_one, do_scaled, " +
        "CASE WHEN n_zero = 0 OR n_one = 0 THEN NULL ELSE " +
        "1.0 - (CAST(n_values - 1 AS DOUBLE) * CAST(do_scaled AS DOUBLE)) / " +
        "(1000000.0 * 2.0 * CAST(n_zero AS DOUBLE) * CAST(n_one AS DOUBLE)) " +
        "END AS alpha FROM kt"),
    // interval-alpha mirror: identical 0–9 rating derivation, the same
    // moment algebra (2·(m·Σv² − (Σv)²) per unit, pooled S₁/S₂ for the
    // expected term), the same 1e-6 floor grid and final expression
    "eval_krippendorff_interval" ->
      ("WITH tot AS (SELECT user_id, event_type, " +
        "sum(CAST(floor(value * 100) AS BIGINT)) AS v FROM events GROUP BY 1, 2), " +
        "rt AS (SELECT event_type AS u, (((v % 100) + 100) % 100) // 10 AS val " +
        "FROM tot), " +
        "g AS (SELECT u, CAST(count(*) AS BIGINT) AS m, " +
        "CAST(sum(val) AS BIGINT) AS s1, CAST(sum(val * val) AS BIGINT) AS s2 " +
        "FROM rt GROUP BY 1 HAVING count(*) >= 2), " +
        "k AS (SELECT CAST(count(*) AS BIGINT) AS units, " +
        "CAST(sum(m) AS BIGINT) AS n_values, " +
        "CAST(sum(s1) AS BIGINT) AS v_sum, " +
        "CAST(sum(s2) AS BIGINT) AS v_sumsq, " +
        "CAST(sum((2 * (m * s2 - s1 * s1) * 1000000) // (m - 1)) AS BIGINT) " +
        "AS do_scaled FROM g) " +
        "SELECT units, n_values, v_sum, v_sumsq, do_scaled, " +
        "CASE WHEN n_values * v_sumsq - v_sum * v_sum = 0 THEN NULL ELSE " +
        "1.0 - (CAST(n_values - 1 AS DOUBLE) * CAST(do_scaled AS DOUBLE)) / " +
        "(1000000.0 * 2.0 * " +
        "CAST(n_values * v_sumsq - v_sum * v_sum AS DOUBLE)) " +
        "END AS alpha FROM k"),
    // corpus BLEU mirror: the same pooled exact sums, single-division
    // precisions, ln-sum in the same left-to-right order, and the one
    // transcendental product rounded stable on both engines
    // paired approximate-randomization mirror: two stats chains off one
    // gt, the per-(pair, r) chained-hash swap gate, per-r pooled sums,
    // each resampled BLEU on the same floor grid as the jackknife, then
    // the exact integer exceedance count — one division for p
    "eval_ab_paired" -> {
      val r = 200
      val seed = 11L
      val stat = Seq("cand_len", "ref_len") ++
        (1 to 4).flatMap(n => Seq(s"m$n", s"c$n"))
      val flip = pmSql(hashRawSql(
        s"(${hashRawSql("doc_id", seed)}) + r", seed * 31 + 7), "2")
      def si(t: String) = {
        val zero = (1 to 4).map(n => s"${t}_m$n = 0").mkString(" OR ") +
          s" OR ${t}_cand_len = 0"
        val bp = s"(CASE WHEN ${t}_cand_len >= ${t}_ref_len THEN 1.0 " +
          s"ELSE exp(1.0 - CAST(${t}_ref_len AS DOUBLE) / " +
          s"CAST(${t}_cand_len AS DOUBLE)) END)"
        val lg = "((" + (1 to 4).map(n =>
          s"ln(CAST(${t}_m$n AS DOUBLE) / CAST(${t}_c$n AS DOUBLE))")
          .mkString(" + ") + ") / 4.0)"
        s"CASE WHEN $zero THEN 0 ELSE " +
          s"CAST(floor($bp * exp($lg) * 10000.0 + 0.499999) AS BIGINT) END"
      }
      s"WITH $GtCte, ${genPairCtePfx("a", 15, 7)}, ${genStatsChainPfx("a")}, " +
        s"${genPairCtePfx("b", 20, 13)}, ${genStatsChainPfx("b")}, " +
        "j AS (SELECT a.doc_id, " +
        stat.map(nm => s"a.$nm AS a_$nm, b.$nm AS b_$nm").mkString(", ") +
        " FROM ams a JOIN bms b USING (doc_id)), " +
        s"g AS (SELECT r, CASE WHEN r > 0 AND $flip = 1 THEN 1 ELSE 0 END " +
        "AS fl, " + stat.map(nm => s"a_$nm, b_$nm").mkString(", ") +
        s" FROM j, LATERAL (SELECT unnest(generate_series(0, $r)) AS r)), " +
        "s AS (SELECT r, CAST(count(*) AS BIGINT) AS n, " +
        stat.map(nm =>
          s"CAST(sum(CASE WHEN fl = 1 THEN b_$nm ELSE a_$nm END) AS BIGINT) " +
            s"AS a_$nm, " +
            s"CAST(sum(CASE WHEN fl = 1 THEN a_$nm ELSE b_$nm END) AS BIGINT) " +
            s"AS b_$nm").mkString(", ") +
        " FROM g GROUP BY r), " +
        s"d AS (SELECT r, n, ${si("a")} AS sa, ${si("b")} AS sb, " +
        s"${si("a")} - (${si("b")}) AS dd FROM s), " +
        "o AS (SELECT n AS n_pairs, sa AS oa, sb AS ob, dd AS od FROM d " +
        "WHERE r = 0) " +
        "SELECT o.n_pairs, CAST(o.oa AS DOUBLE) / 10000.0 AS bleu_a, " +
        "CAST(o.ob AS DOUBLE) / 10000.0 AS bleu_b, " +
        "CAST(o.od AS DOUBLE) / 10000.0 AS delta, " +
        "CAST(count(*) AS BIGINT) AS resamples, " +
        "CAST(sum(CASE WHEN abs(d.dd) >= abs(o.od) THEN 1 ELSE 0 END) + 1 " +
        "AS DOUBLE) / CAST(count(*) + 1 AS DOUBLE) AS p_value " +
        "FROM d, o WHERE d.r > 0 GROUP BY 1, 2, 3, 4"
    },
    // distinct-n mirror: the same kept-list generations, per-n gram
    // comprehensions, exact counts, one division; zero-gram orders keep
    // their row with NULL ratio
    "eval_gen_distinct_n" ->
      (s"WITH $GtCte, " +
        s"gk AS (SELECT [x for x in ${genKeptSql(15, 7)} if x <> ''][1:48] " +
        "AS t FROM gt), " +
        "e AS (SELECT n, unnest(CASE WHEN len(t) < n THEN [] " +
        "ELSE [array_to_string(t[i:i+n-1], ' ') for i in " +
        "generate_series(1, len(t) - n + 1)] END) AS g " +
        "FROM gk, (SELECT unnest(generate_series(1, 3)) AS n) ns), " +
        "per AS (SELECT n, CAST(count(*) AS BIGINT) AS n_grams, " +
        "CAST(count(DISTINCT g) AS BIGINT) AS n_distinct FROM e GROUP BY n) " +
        "SELECT CAST(ns.n AS BIGINT) AS n, " +
        "coalesce(per.n_grams, 0) AS n_grams, " +
        "coalesce(per.n_distinct, 0) AS n_distinct, " +
        "CASE WHEN coalesce(per.n_grams, 0) > 0 THEN " +
        "CAST(per.n_distinct AS DOUBLE) / CAST(per.n_grams AS DOUBLE) END " +
        "AS distinct_ratio " +
        "FROM (SELECT unnest(generate_series(1, 3)) AS n) ns " +
        "LEFT JOIN per ON per.n = ns.n"),
    // multi-reference BLEU mirror: candidate + TWO reference kept-lists
    // off one gt, per-gram clip ceilings maxed over the refs (distinct-
    // gram comprehension), closest-ref brevity length, the standard
    // pooled corpus tail
    "eval_gen_bleu_multiref" -> {
      def grams(src: String, n: Int) =
        if (n == 1) src
        else s"[array_to_string($src[i:i+${n - 1}], ' ') for i in " +
          s"generate_series(1, len($src) - ${n - 1})]"
      def clip(n: Int) =
        s"CAST(coalesce(list_sum([least(len(list_filter(cg$n, x -> x = g)), " +
          s"greatest(len(list_filter(ag$n, x -> x = g)), " +
          s"len(list_filter(bg$n, x -> x = g)))) " +
          s"for g in list_distinct(cg$n)]), 0) AS BIGINT) AS m$n"
      s"WITH $GtCte, " +
        "gpm AS (SELECT doc_id, " +
        s"[x for x in ${genKeptSql(15, 7)} if x <> ''][1:48] AS cs, " +
        s"[x for x in ${genKeptSql(10, 42)} if x <> ''][1:48] AS r1, " +
        s"[x for x in ${genKeptSql(12, 99)} if x <> ''][1:48] AS r2 FROM gt), " +
        "gg2 AS (SELECT doc_id, cs, r1, r2, " +
        (1 to 4).map(n => s"${grams("cs", n)} AS cg$n, " +
          s"${grams("r1", n)} AS ag$n, ${grams("r2", n)} AS bg$n")
          .mkString(", ") +
        " FROM gpm), " +
        "ms2 AS (SELECT doc_id, CAST(len(cs) AS BIGINT) AS cand_len, " +
        "CAST(CASE WHEN abs(len(r1) - len(cs)) < abs(len(r2) - len(cs)) " +
        "THEN len(r1) WHEN abs(len(r2) - len(cs)) < abs(len(r1) - len(cs)) " +
        "THEN len(r2) ELSE least(len(r1), len(r2)) END AS BIGINT) AS ref_len, " +
        (1 to 4).map(n =>
          s"${clip(n)}, CAST(len(cg$n) AS BIGINT) AS c$n").mkString(", ") +
        " FROM gg2), " +
        "s AS (SELECT CAST(count(*) AS BIGINT) AS n_pairs, " +
        "CAST(sum(cand_len) AS BIGINT) AS cand_tokens, " +
        "CAST(sum(ref_len) AS BIGINT) AS ref_tokens, " +
        (1 to 4).map(n => s"CAST(sum(m$n) AS BIGINT) AS sm$n, " +
          s"CAST(sum(c$n) AS BIGINT) AS sc$n").mkString(", ") +
        " FROM ms2) " +
        "SELECT n_pairs, cand_tokens, ref_tokens, " +
        (1 to 4).map(n => s"CASE WHEN sc$n = 0 THEN 0.0 ELSE " +
          s"CAST(sm$n AS DOUBLE) / CAST(sc$n AS DOUBLE) END AS p$n")
          .mkString(", ") + ", " +
        "CASE WHEN cand_tokens = 0 THEN 0.0 ELSE " +
        sqlRound4("CASE WHEN cand_tokens >= ref_tokens THEN 1.0 " +
          "ELSE exp(1.0 - CAST(ref_tokens AS DOUBLE) / " +
          "CAST(cand_tokens AS DOUBLE)) END") +
        " END AS bp, " +
        "CASE WHEN sm1 = 0 OR sm2 = 0 OR sm3 = 0 OR sm4 = 0 " +
        "OR cand_tokens = 0 THEN 0.0 ELSE " +
        sqlRound4("(CASE WHEN cand_tokens >= ref_tokens THEN 1.0 " +
          "ELSE exp(1.0 - CAST(ref_tokens AS DOUBLE) / " +
          "CAST(cand_tokens AS DOUBLE)) END) * " +
          "exp((((ln(CAST(sm1 AS DOUBLE) / CAST(sc1 AS DOUBLE)) + " +
          "ln(CAST(sm2 AS DOUBLE) / CAST(sc2 AS DOUBLE))) + " +
          "ln(CAST(sm3 AS DOUBLE) / CAST(sc3 AS DOUBLE))) + " +
          "ln(CAST(sm4 AS DOUBLE) / CAST(sc4 AS DOUBLE))) / 4.0)") +
        " END AS bleu FROM s"
    },
    // paired chrF mirror: two per-doc chrF stats chains off one gt, the
    // same swap gate, per-r pooled per-order sums, each resampled chrF2
    // on the floor grid (fixed left-to-right ratio sums), exceedance count
    "eval_ab_paired_chrf" -> {
      val r = 200
      val seed = 11L
      val stat = Seq("cand_chars", "ref_chars") ++
        (1 to 6).flatMap(n => Seq(s"mc$n", s"cc$n", s"rc$n"))
      val flip = pmSql(hashRawSql(
        s"(${hashRawSql("doc_id", seed)}) + r", seed * 31 + 7), "2")
      def si(t: String) = {
        def pr(den: String) = "(" + (1 to 6).map(n =>
          s"CASE WHEN ${t}_$den$n = 0 THEN 0.0 ELSE " +
            s"CAST(${t}_mc$n AS DOUBLE) / CAST(${t}_$den$n AS DOUBLE) END")
          .mkString(" + ") + ") / 6.0"
        val p = pr("cc")
        val rr = pr("rc")
        s"CAST(floor((CASE WHEN 4.0 * ($p) + ($rr) = 0.0 THEN 0.0 " +
          s"ELSE 5.0 * ($p) * ($rr) / (4.0 * ($p) + ($rr)) END) " +
          "* 10000.0 + 0.499999) AS BIGINT)"
      }
      s"WITH $GtCte, ${genPairCtePfx("a", 15, 7)}, ${chrfDocStatsCtes("a")}, " +
        s"${genPairCtePfx("b", 20, 13)}, ${chrfDocStatsCtes("b")}, " +
        "j AS (SELECT a.doc_id, " +
        stat.map(nm => s"a.$nm AS a_$nm, b.$nm AS b_$nm").mkString(", ") +
        " FROM acw a JOIN bcw b USING (doc_id)), " +
        s"g AS (SELECT r, CASE WHEN r > 0 AND $flip = 1 THEN 1 ELSE 0 END " +
        "AS fl, " + stat.map(nm => s"a_$nm, b_$nm").mkString(", ") +
        s" FROM j, LATERAL (SELECT unnest(generate_series(0, $r)) AS r)), " +
        "s AS (SELECT r, CAST(count(*) AS BIGINT) AS n, " +
        stat.map(nm =>
          s"CAST(sum(CASE WHEN fl = 1 THEN b_$nm ELSE a_$nm END) AS BIGINT) " +
            s"AS a_$nm, " +
            s"CAST(sum(CASE WHEN fl = 1 THEN a_$nm ELSE b_$nm END) AS BIGINT) " +
            s"AS b_$nm").mkString(", ") +
        " FROM g GROUP BY r), " +
        s"d AS (SELECT r, n, sa, sb, sa - sb AS dd FROM " +
        s"(SELECT r, n, ${si("a")} AS sa, ${si("b")} AS sb FROM s)), " +
        "o AS (SELECT n AS n_pairs, sa AS oa, sb AS ob, dd AS od FROM d " +
        "WHERE r = 0) " +
        "SELECT o.n_pairs, CAST(o.oa AS DOUBLE) / 10000.0 AS chrf_a, " +
        "CAST(o.ob AS DOUBLE) / 10000.0 AS chrf_b, " +
        "CAST(o.od AS DOUBLE) / 10000.0 AS delta, " +
        "CAST(count(*) AS BIGINT) AS resamples, " +
        "CAST(sum(CASE WHEN abs(d.dd) >= abs(o.od) THEN 1 ELSE 0 END) + 1 " +
        "AS DOUBLE) / CAST(count(*) + 1 AS DOUBLE) AS p_value " +
        "FROM d, o WHERE d.r > 0 GROUP BY 1, 2, 3, 4"
    },
    // generic paired-mean randomization mirror: per-doc token counts vs
    // the 15%-dropout token counts, the same hash swap gate, per-r LONG
    // sum differences, exact exceedance count
    "eval_ab_paired_mean" -> {
      val r = 200
      val seed = 11L
      val flip = pmSql(hashRawSql(
        s"(${hashRawSql("doc_id", seed)}) + r", seed * 31 + 7), "2")
      s"WITH $GtCte, " +
        s"pa AS (SELECT doc_id, CAST($TokN AS BIGINT) AS a FROM documents), " +
        s"pb AS (SELECT doc_id, CAST(len([x for x in ${genKeptSql(15, 7)} " +
        "if x <> '']) AS BIGINT) AS b FROM gt), " +
        "j AS (SELECT doc_id, a, b FROM pa JOIN pb USING (doc_id)), " +
        s"g AS (SELECT r, CASE WHEN r > 0 AND $flip = 1 THEN 1 ELSE 0 END " +
        s"AS fl, a, b FROM j, LATERAL (SELECT unnest(generate_series(0, $r)) AS r)), " +
        "s AS (SELECT r, CAST(count(*) AS BIGINT) AS n, " +
        "CAST(sum(CASE WHEN fl = 1 THEN b ELSE a END) AS BIGINT) AS s_a, " +
        "CAST(sum(CASE WHEN fl = 1 THEN a ELSE b END) AS BIGINT) AS s_b " +
        "FROM g GROUP BY r), " +
        "d AS (SELECT r, n, s_a, s_b, s_a - s_b AS dd FROM s), " +
        "o AS (SELECT n AS n_pairs, s_a AS oa, s_b AS ob, dd AS od FROM d " +
        "WHERE r = 0) " +
        "SELECT o.n_pairs, " +
        "CAST(o.oa AS DOUBLE) / CAST(o.n_pairs AS DOUBLE) AS mean_a, " +
        "CAST(o.ob AS DOUBLE) / CAST(o.n_pairs AS DOUBLE) AS mean_b, " +
        "CAST(o.od AS DOUBLE) / CAST(o.n_pairs AS DOUBLE) AS diff, " +
        "CAST(count(*) AS BIGINT) AS resamples, " +
        "CAST(sum(CASE WHEN abs(d.dd) >= abs(o.od) THEN 1 ELSE 0 END) + 1 " +
        "AS DOUBLE) / CAST(count(*) + 1 AS DOUBLE) AS p_value " +
        "FROM d, o WHERE d.r > 0 GROUP BY 1, 2, 3, 4"
    },
    // McNemar mirror: the same modular paired-correctness fixture, four
    // exact counts, the continuity-corrected statistic as one division
    "eval_mcnemar" ->
      ("WITH p AS (SELECT ((CAST(floor(value * 100) AS BIGINT) % 100 " +
        "+ 100) % 100) AS c FROM events), " +
        "b AS (SELECT CASE WHEN c >= 40 THEN 1 ELSE 0 END AS a, " +
        "CASE WHEN (c * 31 + 7) % 100 >= 50 THEN 1 ELSE 0 END AS bb FROM p), " +
        "g AS (SELECT CAST(count(*) AS BIGINT) AS n, " +
        "CAST(coalesce(sum(CASE WHEN a = 0 AND bb = 0 THEN 1 ELSE 0 END), 0) AS BIGINT) AS n00, " +
        "CAST(coalesce(sum(CASE WHEN a = 0 AND bb = 1 THEN 1 ELSE 0 END), 0) AS BIGINT) AS n01, " +
        "CAST(coalesce(sum(CASE WHEN a = 1 AND bb = 0 THEN 1 ELSE 0 END), 0) AS BIGINT) AS n10, " +
        "CAST(coalesce(sum(CASE WHEN a = 1 AND bb = 1 THEN 1 ELSE 0 END), 0) AS BIGINT) AS n11 FROM b) " +
        "SELECT n, n00, n01, n10, n11, " +
        "CASE WHEN n01 + n10 = 0 THEN NULL ELSE " +
        "CAST(greatest(abs(n10 - n01) - 1, 0) * " +
        "greatest(abs(n10 - n01) - 1, 0) AS DOUBLE) / " +
        "CAST(n01 + n10 AS DOUBLE) END AS chi2 FROM g"),
    "eval_gen_bleu" ->
      (s"WITH $GenStatsCtes, " +
        "s AS (SELECT CAST(count(*) AS BIGINT) AS n_pairs, " +
        "CAST(sum(cand_len) AS BIGINT) AS cand_tokens, " +
        "CAST(sum(ref_len) AS BIGINT) AS ref_tokens, " +
        (1 to 4).map(n => s"CAST(sum(m$n) AS BIGINT) AS sm$n, " +
          s"CAST(sum(c$n) AS BIGINT) AS sc$n").mkString(", ") +
        " FROM ms) " +
        "SELECT n_pairs, cand_tokens, ref_tokens, " +
        (1 to 4).map(n => s"CASE WHEN sc$n = 0 THEN 0.0 ELSE " +
          s"CAST(sm$n AS DOUBLE) / CAST(sc$n AS DOUBLE) END AS p$n")
          .mkString(", ") + ", " +
        "CASE WHEN cand_tokens = 0 THEN 0.0 ELSE " +
        sqlRound4("CASE WHEN cand_tokens >= ref_tokens THEN 1.0 " +
          "ELSE exp(1.0 - CAST(ref_tokens AS DOUBLE) / " +
          "CAST(cand_tokens AS DOUBLE)) END") +
        " END AS bp, " +
        "CASE WHEN sm1 = 0 OR sm2 = 0 OR sm3 = 0 OR sm4 = 0 " +
        "OR cand_tokens = 0 THEN 0.0 ELSE " +
        sqlRound4("(CASE WHEN cand_tokens >= ref_tokens THEN 1.0 " +
          "ELSE exp(1.0 - CAST(ref_tokens AS DOUBLE) / " +
          "CAST(cand_tokens AS DOUBLE)) END) * " +
          "exp((((ln(CAST(sm1 AS DOUBLE) / CAST(sc1 AS DOUBLE)) + " +
          "ln(CAST(sm2 AS DOUBLE) / CAST(sc2 AS DOUBLE))) + " +
          "ln(CAST(sm3 AS DOUBLE) / CAST(sc3 AS DOUBLE))) + " +
          "ln(CAST(sm4 AS DOUBLE) / CAST(sc4 AS DOUBLE))) / 4.0)") +
        " END AS bleu FROM s"),
    // corpus chrF mirror: the clipped counts replayed RELATIONALLY
    // (unnest → per-(doc, n, gram) counts → join → sum(least)) — the
    // values are engine-independent identities, so the mirror needn't
    // mimic the Spark fold; pooled ratios and the β=2 composite are the
    // same fixed-order finite IEEE arithmetic (no transcendental)
    "eval_gen_chrf" ->
      (s"WITH $GenPairCtes, " +
        "ch AS (SELECT doc_id, " +
        "substr(array_to_string(cs, ''), 1, 256) AS c, " +
        "substr(array_to_string(rs, ''), 1, 256) AS r FROM gp), " +
        "cgr AS (SELECT doc_id, n, " +
        "[substr(c, i, n) for i in generate_series(1, length(c) - n + 1)] AS cg, " +
        "[substr(r, i, n) for i in generate_series(1, length(r) - n + 1)] AS rg " +
        "FROM ch, (SELECT unnest(generate_series(1, 6)) AS n) ns), " +
        "cc AS (SELECT doc_id, n, g, CAST(count(*) AS BIGINT) AS k FROM " +
        "(SELECT doc_id, n, unnest(cg) AS g FROM cgr) GROUP BY 1, 2, 3), " +
        "rc AS (SELECT doc_id, n, g, CAST(count(*) AS BIGINT) AS k FROM " +
        "(SELECT doc_id, n, unnest(rg) AS g FROM cgr) GROUP BY 1, 2, 3), " +
        "mm AS (SELECT cc.n AS n, CAST(sum(least(cc.k, rc.k)) AS BIGINT) AS m " +
        "FROM cc JOIN rc ON cc.doc_id = rc.doc_id AND cc.n = rc.n " +
        "AND cc.g = rc.g GROUP BY 1), " +
        "tt AS (SELECT n, CAST(sum(len(cg)) AS BIGINT) AS ct, " +
        "CAST(sum(len(rg)) AS BIGINT) AS rt FROM cgr GROUP BY 1), " +
        "pn AS (SELECT tt.n AS n, coalesce(mm.m, 0) AS m, tt.ct, tt.rt " +
        "FROM tt LEFT JOIN mm USING (n)), " +
        "s AS (SELECT " +
        (1 to 6).map(n =>
          s"max(CASE WHEN n = $n THEN m END) AS m$n, " +
            s"max(CASE WHEN n = $n THEN ct END) AS ct$n, " +
            s"max(CASE WHEN n = $n THEN rt END) AS rt$n").mkString(", ") +
        " FROM pn), " +
        "hd AS (SELECT CAST(count(*) AS BIGINT) AS n_pairs, " +
        "CAST(sum(length(c)) AS BIGINT) AS cand_chars, " +
        "CAST(sum(length(r)) AS BIGINT) AS ref_chars FROM ch), " +
        "fin AS (SELECT " +
        "(" + (1 to 6).map(n => s"(CASE WHEN ct$n = 0 THEN 0.0 ELSE " +
          s"CAST(m$n AS DOUBLE) / CAST(ct$n AS DOUBLE) END)").mkString(" + ") +
        ") / 6.0 AS prec_avg, " +
        "(" + (1 to 6).map(n => s"(CASE WHEN rt$n = 0 THEN 0.0 ELSE " +
          s"CAST(m$n AS DOUBLE) / CAST(rt$n AS DOUBLE) END)").mkString(" + ") +
        ") / 6.0 AS rec_avg FROM s) " +
        "SELECT n_pairs, cand_chars, ref_chars, prec_avg, rec_avg, " +
        "CASE WHEN 4.0 * prec_avg + rec_avg = 0.0 THEN 0.0 ELSE " +
        "5.0 * prec_avg * rec_avg / (4.0 * prec_avg + rec_avg) END AS chrf2 " +
        "FROM hd, fin"),
    // FIM mirror: the same three doc-level hash draws, the same slice
    // arithmetic; empty parts drop from the PSM join on both engines
    "text_fim" -> {
      val h0 = hashRawSql("doc_id", 42)
      val h1 = hashRawSql("doc_id", 43)
      val h2 = hashRawSql("doc_id", 44)
      def seg(sl: String) =
        s"coalesce(array_to_string($sl, ' '), '')"
      s"WITH tf AS (SELECT doc_id, [x for x in $RawToks if x <> ''] AS tk " +
        "FROM documents), " +
        "sf2 AS (SELECT doc_id, tk, CAST(len(tk) AS BIGINT) AS n, " +
        s"($h0) % 100 < 50 AS isf, " +
        s"($h1) % (CAST(len(tk) AS BIGINT) + 1) AS ar FROM tf), " +
        "sg AS (SELECT doc_id, tk, n, isf, ar, " +
        s"ar + ($h2) % (n - ar + 1) AS br FROM sf2) " +
        "SELECT doc_id, " +
        "CASE WHEN isf THEN coalesce(array_to_string([x for x in " +
        s"['<fim_prefix>', ${seg("tk[1:CAST(ar AS INT)]")}, " +
        s"'<fim_suffix>', ${seg("tk[CAST(br AS INT) + 1:CAST(n AS INT)]")}, " +
        s"'<fim_middle>', ${seg("tk[CAST(ar AS INT) + 1:CAST(br AS INT)]")}] " +
        "if length(x) > 0], ' '), '') " +
        s"ELSE ${seg("tk")} END AS fim_text, " +
        "isf AS is_fim, " +
        "CASE WHEN isf THEN ar ELSE n END AS n_prefix, " +
        "CASE WHEN isf THEN br - ar ELSE 0 END AS n_middle, " +
        "CASE WHEN isf THEN n - br ELSE 0 END AS n_suffix FROM sg"
    },
    // span-corruption mirror: the same hash gates (start + length), the
    // same bounded-lookback merged-interval rule, sentinel ranks from a
    // prefix count — every decision a pure function of (doc, pos, seed)
    "text_span_corrupt" -> {
      val h1 = hashRawSql("(doc_id * 1000003 + (j - 1))", 42)
      val h2 = hashRawSql("(doc_id * 1000003 + (j - 1))", 42 + 7919)
      def sent(iExpr: String) =
        s"'<extra_id_' || CAST(len([1 for j in generate_series(1, $iExpr) " +
          s"if rs[CAST(j AS INT)]]) - 1 AS VARCHAR) || '>'"
      s"WITH tt AS (SELECT doc_id, [x for x in $RawToks if x <> ''] AS tk " +
        "FROM documents), " +
        "ss AS (SELECT doc_id, tk, len(tk) AS n, " +
        s"[($h1) % 100 < 6 for j in generate_series(1, len(tk))] AS st, " +
        s"[2 + ($h2) % 3 for j in generate_series(1, len(tk))] AS ln " +
        "FROM tt), " +
        "cc2 AS (SELECT doc_id, tk, n, " +
        "[len([1 for j in generate_series(greatest(i - 3, 1), i) " +
        "if st[CAST(j AS INT)] and j + ln[CAST(j AS INT)] > i]) > 0 " +
        "for i in generate_series(1, n)] AS co FROM ss), " +
        "rr2 AS (SELECT doc_id, tk, n, co, " +
        "[co[CAST(i AS INT)] and (i = 1 or not co[CAST(i AS INT) - 1]) " +
        "for i in generate_series(1, n)] AS rs FROM cc2) " +
        "SELECT doc_id, " +
        // DuckDB's array_to_string([]) is NULL where Spark's concat_ws
        // is '' — coalesce pins the empty-output convention
        "coalesce(array_to_string([x for x in [CASE WHEN rs[CAST(i AS INT)] " +
        "THEN " + sent("i") +
        " WHEN not co[CAST(i AS INT)] THEN tk[CAST(i AS INT)] " +
        "END for i in generate_series(1, n)] if x IS NOT NULL], ' '), '') " +
        "AS inputs, " +
        "coalesce(array_to_string([x for x in [CASE WHEN rs[CAST(i AS INT)] " +
        "THEN " + sent("i") + " || ' ' || tk[CAST(i AS INT)] " +
        "WHEN co[CAST(i AS INT)] THEN tk[CAST(i AS INT)] " +
        "END for i in generate_series(1, n)] if x IS NOT NULL], ' '), '') " +
        "AS targets, " +
        "CAST(len([1 for i in generate_series(1, n) " +
        "if rs[CAST(i AS INT)]]) AS BIGINT) AS n_spans, " +
        "CAST(len([1 for i in generate_series(1, n) " +
        "if co[CAST(i AS INT)]]) AS BIGINT) AS n_corrupted, " +
        "CAST(n AS BIGINT) AS n_tokens FROM rr2"
    },
    // CC-audit mirror: the same maximal-run extraction (RE2 and Java
    // agree on the one-separator pattern), the same digit collapse and
    // the same Luhn digit-transform sum per candidate
    "text_cc_audit" ->
      (s"WITH $DccCte, " +
        "cx AS (SELECT doc_id, [g for g in " +
        "[regexp_replace(r, '[ -]', '', 'g') for r in " +
        "regexp_extract_all(coalesce(text, ''), '[0-9](?:[ -]?[0-9])+')] " +
        "if length(g) >= 13 and length(g) <= 19] AS cands FROM dcc), " +
        "vx AS (SELECT doc_id, cands, [d for d in cands if " +
        "(list_sum([CASE WHEN (length(d) - i) % 2 = 1 THEN " +
        "CASE WHEN (ascii(d[CAST(i AS INT)]) - 48) * 2 > 9 " +
        "THEN (ascii(d[CAST(i AS INT)]) - 48) * 2 - 9 " +
        "ELSE (ascii(d[CAST(i AS INT)]) - 48) * 2 END " +
        "ELSE ascii(d[CAST(i AS INT)]) - 48 END " +
        "for i in generate_series(1, length(d))])) % 10 = 0] AS valid " +
        "FROM cx) " +
        "SELECT doc_id, CAST(len(cands) AS BIGINT) AS n_cc_candidates, " +
        "CAST(len(valid) AS BIGINT) AS n_cc_valid, " +
        "len(valid) > 0 AS has_cc FROM vx"),
    // pass@k mirror: the SAME divisibility-exact binomial fold (seed-as-
    // first-element list_reduce; every intermediate division is exact, so
    // floor-vs-truncation can't diverge), one final division per k
    "eval_pass_at_k" -> {
      def pass(k: Int) =
        s"CASE WHEN n < $k THEN NULL ELSE 1.0 - " +
          s"CAST(${binomSql("n - c", k)} AS DOUBLE) / " +
          s"CAST(${binomSql("n", k)} AS DOUBLE) END AS pass_at_$k"
      "WITH b AS (SELECT event_type, user_id, " +
        "CASE WHEN CAST(floor(value * 100) AS BIGINT) % 2 = 0 " +
        "THEN 1 ELSE 0 END AS ok FROM events), " +
        "t AS (SELECT event_type, user_id, CAST(count(*) AS BIGINT) AS n, " +
        "CAST(sum(ok) AS BIGINT) AS c FROM b GROUP BY 1, 2) " +
        s"SELECT event_type, user_id, n, c, ${pass(1)}, ${pass(2)}, " +
        s"${pass(4)} FROM t"
    },
    // Welch mirror: the same exact (n, Σx, Σx²) per arm, the same
    // division/sqrt sequence — sqrt is correctly rounded on both engines
    "eval_ab_welch" -> {
      def vr(t: String) =
        s"(CASE WHEN n$t < 2 THEN NULL ELSE " +
          s"CAST(n$t * q$t - s$t * s$t AS DOUBLE) / " +
          s"CAST(n$t * (n$t - 1) AS DOUBLE) END)"
      def se2(t: String) = s"(${vr(t)} / CAST(n$t AS DOUBLE))"
      val diff = "(CAST(sa AS DOUBLE) / CAST(na AS DOUBLE) - " +
        "CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE))"
      val degen = s"na < 2 OR nb < 2 OR (${se2("a")} + ${se2("b")}) = 0.0"
      "WITH b AS (SELECT event_type AS metric, " +
        "CASE WHEN user_id % 2 = 0 THEN 'a' ELSE 'b' END AS arm, " +
        "CAST(floor(value * 100) AS BIGINT) + (user_id % 2) * 25 AS v " +
        "FROM events), " +
        "g AS (SELECT metric, arm, CAST(count(*) AS BIGINT) AS n, " +
        "CAST(sum(v) AS BIGINT) AS s, CAST(sum(v * v) AS BIGINT) AS q " +
        "FROM b GROUP BY 1, 2), " +
        "p AS (SELECT metric, " +
        "max(CASE WHEN arm = 'a' THEN n END) AS na, " +
        "max(CASE WHEN arm = 'a' THEN s END) AS sa, " +
        "max(CASE WHEN arm = 'a' THEN q END) AS qa, " +
        "max(CASE WHEN arm = 'b' THEN n END) AS nb, " +
        "max(CASE WHEN arm = 'b' THEN s END) AS sb, " +
        "max(CASE WHEN arm = 'b' THEN q END) AS qb " +
        "FROM g GROUP BY 1) " +
        "SELECT metric, na AS n_a, nb AS n_b, " +
        "CAST(sa AS DOUBLE) / CAST(na AS DOUBLE) AS mean_a, " +
        "CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE) AS mean_b, " +
        s"$diff AS diff, ${vr("a")} AS var_a, ${vr("b")} AS var_b, " +
        s"CASE WHEN $degen THEN NULL ELSE " +
        s"$diff / sqrt(${se2("a")} + ${se2("b")}) END AS t, " +
        s"CASE WHEN $degen THEN NULL ELSE " +
        s"(${se2("a")} + ${se2("b")}) * (${se2("a")} + ${se2("b")}) / " +
        s"(${se2("a")} * ${se2("a")} / CAST(na - 1 AS DOUBLE) + " +
        s"${se2("b")} * ${se2("b")} / CAST(nb - 1 AS DOUBLE)) END AS df " +
        "FROM p WHERE na IS NOT NULL AND nb IS NOT NULL"
    },
    // best-of-n mirror: the same score-ordered weighted sum of binomial
    // coefficients, one division by C(n, k) per curve point
    "eval_best_of_n" -> {
      def bo(k: Int) =
        s"CASE WHEN n_samples < $k THEN NULL ELSE " +
          s"CAST(coalesce(list_sum([l[CAST(i AS INT)] * " +
          s"${binomSql("i - 1", k - 1)} for i in " +
          s"generate_series(1, len(l))]), 0) AS DOUBLE) / " +
          s"CAST(${binomSql("n_samples", k)} AS DOUBLE) END AS best_of_$k"
      "WITH b AS (SELECT event_type || '|' || CAST(user_id AS VARCHAR) " +
        "AS task_id, CAST(floor(value * 100) AS BIGINT) % 1000 AS sc " +
        "FROM events), " +
        "g AS (SELECT task_id, CAST(count(*) AS BIGINT) AS n_samples, " +
        "list(sc ORDER BY sc) AS l FROM b GROUP BY 1) " +
        s"SELECT task_id, n_samples, ${bo(1)}, ${bo(2)}, ${bo(4)} FROM g"
    },
    // WER mirror: the same edit DP as nested seed-as-first-element
    // list_reduce — row 0 counts 0..m, each row seeds with prev[1]+1
    // (pure deletions) and appends the three-way min
    "eval_gen_wer" ->
      (s"WITH $GenPairCtes, " +
        "w AS (SELECT doc_id, CAST(len(cs) AS BIGINT) AS cand_len, " +
        "CAST(len(rs) AS BIGINT) AS ref_len, " +
        "CAST(list_reduce(" +
        "[[CAST(j AS BIGINT) for j in generate_series(0, len(rs))]] || " +
        "[[CASE WHEN rs[j] = ct THEN CAST(1 AS BIGINT) ELSE 0 END " +
        "for j in generate_series(1, len(rs))] for ct in cs], " +
        "(a, mask) -> list_reduce(" +
        "[[a[1] + 1]] || [[CAST(j AS BIGINT)] " +
        "for j in generate_series(1, len(rs))], " +
        "(cur, jl) -> list_append(cur, least(" +
        "a[CAST(jl[1] AS INT) + 1] + 1, " +
        "cur[-1] + 1, " +
        "a[CAST(jl[1] AS INT)] + CASE WHEN mask[CAST(jl[1] AS INT)] = 1 " +
        "THEN 0 ELSE 1 END))))[-1] AS BIGINT) AS edit_distance FROM gp) " +
        "SELECT doc_id, cand_len, ref_len, edit_distance, " +
        "CASE WHEN ref_len = 0 THEN NULL ELSE " +
        "CAST(edit_distance AS DOUBLE) / CAST(ref_len AS DOUBLE) END " +
        "AS wer FROM w"),
    // rank-correlation mirror: the same permutations, the inversion count
    // as a comprehension over the ra-ORDERED struct list, exact integers
    // to the one tau division
    "eval_rank_corr" ->
      ("WITH t AS (SELECT event_type, user_id, " +
        "sum(CAST(floor(value * 100) AS BIGINT)) AS va, " +
        "CAST(count(*) AS BIGINT) AS vb FROM events GROUP BY 1, 2), " +
        "r AS (SELECT event_type, user_id, " +
        "CAST(row_number() OVER (PARTITION BY event_type " +
        "ORDER BY va DESC, user_id ASC) AS BIGINT) AS ra, " +
        "CAST(row_number() OVER (PARTITION BY event_type " +
        "ORDER BY vb DESC, user_id ASC) AS BIGINT) AS rb FROM t), " +
        "g AS (SELECT event_type AS query_id, " +
        "CAST(count(*) AS BIGINT) AS n_common, " +
        "list({'ra': ra, 'rb': rb} ORDER BY ra) AS l FROM r GROUP BY 1), " +
        "iv AS (SELECT query_id, n_common, CAST(coalesce(list_sum(" +
        "[len([x for x in l[1:CAST(i AS INT) - 1] if " +
        "struct_extract(x, 'rb') > struct_extract(l[CAST(i AS INT)], 'rb')]) " +
        "for i in generate_series(2, len(l))]), 0) AS BIGINT) AS d FROM g), " +
        "c AS (SELECT query_id, n_common, " +
        "CAST(CAST(n_common * (n_common - 1) - 4 * d AS DOUBLE) / 2.0 " +
        "AS BIGINT) AS cmd FROM iv) " +
        "SELECT query_id, n_common, cmd AS concordant_minus_discordant, " +
        "CASE WHEN n_common < 2 THEN NULL ELSE CAST(cmd AS DOUBLE) / " +
        "(CAST(n_common * (n_common - 1) AS DOUBLE) / 2.0) END AS tau " +
        "FROM c"),
    // Naive Bayes mirror: same counts, same sparse ln(C+1) refactor, same
    // stable-grid argmax with the min-label tie struct
    "train_nb" ->
      (s"$NbWithSql SELECT doc_id, lang, " +
        "(min({'ns': ns, 'c': cls})).c AS pred, " +
        "-(min({'ns': ns, 'c': cls})).ns AS score FROM sc GROUP BY 1, 2"),
    "train_nb_confusion" ->
      (s"$NbWithSql, pr AS (SELECT doc_id, lang, " +
        "(min({'ns': ns, 'c': cls})).c AS pred FROM sc GROUP BY 1, 2) " +
        "SELECT lang, pred, CAST(count(*) AS BIGINT) AS n FROM pr GROUP BY 1, 2"),
    // Kneser–Ney mirror: retained-bigram counts, continuation table, the
    // same d=0.75 interpolation; ln absorbed by the stable 10⁻⁴ rounding
    "text_lm_kn" ->
      ("WITH toks AS (SELECT doc_id, string_split_regex(" +
        s"trim(lower(text), '${TextAnalysis.WsCharsRaw}'), '\\s+') AS tk " +
        "FROM documents WHERE text IS NOT NULL), " +
        "bi AS (SELECT doc_id, [tk[i] || ' ' || tk[i+1] for i in " +
        "generate_series(1, len(tk) - 1)] AS bs FROM toks WHERE len(tk) >= 2), " +
        "refbig AS MATERIALIZED (SELECT b, count(*) AS cb FROM (" +
        "SELECT unnest(bs) AS b FROM bi) GROUP BY 1 HAVING count(*) >= 2), " +
        "w1t AS (SELECT split_part(b, ' ', 1) AS w1, sum(cb) AS cw1, " +
        "count(*) AS n1p FROM refbig GROUP BY 1), " +
        "cont AS (SELECT split_part(b, ' ', 2) AS w2, count(*) AS r " +
        "FROM refbig GROUP BY 1), " +
        "sca AS (SELECT sum(r) AS rr, count(*) AS u FROM cont), " +
        "db AS (SELECT doc_id, unnest(bs) AS b FROM bi), " +
        "sc AS (SELECT doc_id, count(*) AS nb, avg(-ln(" +
        "CASE WHEN cw1 IS NOT NULL THEN " +
        "greatest(CAST(COALESCE(cb, 0) AS DOUBLE) - 0.75, 0.0) / " +
        "CAST(cw1 AS DOUBLE) + (0.75 * CAST(n1p AS DOUBLE) / " +
        "CAST(cw1 AS DOUBLE)) * (CAST(COALESCE(r, 0) + 1 AS DOUBLE) / " +
        "CAST(rr + u AS DOUBLE)) ELSE CAST(COALESCE(r, 0) + 1 AS DOUBLE) / " +
        "CAST(rr + u AS DOUBLE) END)) AS nll " +
        "FROM db LEFT JOIN refbig USING (b) " +
        "LEFT JOIN w1t ON split_part(db.b, ' ', 1) = w1t.w1 " +
        "LEFT JOIN cont ON split_part(db.b, ' ', 2) = cont.w2 " +
        "CROSS JOIN sca GROUP BY doc_id) " +
        "SELECT d.doc_id, CAST(COALESCE(nb, 0) AS BIGINT) AS n_bigrams, " +
        s"${sqlRound4("COALESCE(nll, 0.0)")} AS mean_nll " +
        "FROM documents d LEFT JOIN sc USING (doc_id)"),
    // perceptron mirror: the same feature projection, every round's
    // mistake filter and integer update as chained 1-row weight CTEs —
    // a single transposed mistake anywhere changes all later weights
    "train_perceptron" -> perceptronOracleSql(4),
    "sample_uncertain" -> perceptronUncertainSql(4, 20),
    // stump mirror: the same melt, cumulative label counts over the
    // value domain, both polarities, the same (err, v, pol) struct-min
    "train_stumps" ->
      (s"WITH $StumpBaseCte, " +
        "m AS (SELECT 'f_ntok' AS feature, f_ntok AS v, y FROM b " +
        "UNION ALL SELECT 'f_ndist', f_ndist, y FROM b " +
        "UNION ALL SELECT 'f_nchar', f_nchar, y FROM b), " +
        "m2 AS (SELECT * FROM m WHERE v IS NOT NULL AND y IS NOT NULL), " +
        "g AS (SELECT feature, v, " +
        "CAST(sum(CASE WHEN y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS np, " +
        "CAST(sum(CASE WHEN y = -1 THEN 1 ELSE 0 END) AS BIGINT) AS nn " +
        "FROM m2 GROUP BY 1, 2), " +
        "c AS (SELECT feature, v, " +
        "sum(np) OVER (PARTITION BY feature ORDER BY v) AS cp, " +
        "sum(nn) OVER (PARTITION BY feature ORDER BY v) AS cn, " +
        "sum(np) OVER (PARTITION BY feature) AS p, " +
        "sum(nn) OVER (PARTITION BY feature) AS n FROM g), " +
        "e AS (SELECT feature, v, CAST(1 AS BIGINT) AS pol, " +
        "cn + p - cp AS err, p + n AS r FROM c " +
        "UNION ALL SELECT feature, v, CAST(-1 AS BIGINT), " +
        "cp + n - cn, p + n FROM c) " +
        "SELECT feature, (mn).v AS threshold, (mn).pol AS polarity, " +
        "CAST((mn).e AS BIGINT) AS n_errors, CAST((mn).r AS BIGINT) AS n_rows " +
        "FROM (SELECT feature, min({'e': err, 'v': v, 'pol': pol, 'r': r}) " +
        "AS mn FROM e GROUP BY 1)"),
    "train_stumps_boosted" -> boostedStumpsOracleSql(3),
    // DPO-pair mirror: the same two struct-mins and the same margin gate
    "train_dpo_pairs" ->
      ("WITH b AS (SELECT event_type || '|' || CAST(user_id AS VARCHAR) " +
        "AS task_id, CAST(event_id AS BIGINT) AS sid, " +
        "CAST(floor(value * 100) AS BIGINT) % 1000 AS sc FROM events), " +
        "g AS (SELECT task_id, min({'ns': -sc, 'i': sid}) AS bb, " +
        "min({'s': sc, 'i': sid}) AS ww, " +
        "CAST(count(*) AS BIGINT) AS n_samples FROM b GROUP BY 1) " +
        "SELECT task_id, (bb).i AS chosen_id, (ww).i AS rejected_id, " +
        "CAST(-(bb).ns AS BIGINT) AS chosen_score, (ww).s AS rejected_score, " +
        "CAST(-(bb).ns - (ww).s AS BIGINT) AS margin, n_samples FROM g " +
        "WHERE -(bb).ns - (ww).s >= 10"),
    // calibration mirrors: the same sign-folded centi-value confidence,
    // the same double binning expression (c/100·10, floored, clamped),
    // midpoint gaps from exact longs; the ECE weighted sum folds the
    // bin-ORDERED list through a 0.0-seeded list_reduce — the same
    // addition order as the Spark sorted-array fold
    "eval_calibration_bins" ->
      (s"WITH $ClfBinCtes " +
        "SELECT bin, n, n_pos, CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE) " +
        "AS acc, CAST(2 * bin + 1 AS DOUBLE) / 20.0 AS conf_mid, " +
        "abs(CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE) - " +
        "CAST(2 * bin + 1 AS DOUBLE) / 20.0) AS gap FROM g"),
    "eval_ece" ->
      (s"WITH $ClfBinCtes, " +
        "g2 AS (SELECT bin, n, abs(CAST(n_pos AS DOUBLE) / " +
        "CAST(n AS DOUBLE) - CAST(2 * bin + 1 AS DOUBLE) / 20.0) AS gap " +
        "FROM g), " +
        "t AS (SELECT CAST(sum(n) AS BIGINT) AS n_total, " +
        "list_reduce(list_prepend(CAST(0.0 AS DOUBLE), " +
        "list(CAST(n AS DOUBLE) * gap ORDER BY bin)), (a, x) -> a + x) " +
        "AS ws FROM g2) " +
        "SELECT n_total, ws / CAST(n_total AS DOUBLE) AS ece FROM t"),
    // majority-vote mirror: the same struct-min argmax ((-count, answer)
    // lexicographic), one division for the consensus share
    "eval_majority_vote" ->
      ("WITH b AS (SELECT event_type, user_id, " +
        "CAST(floor(value * 100) AS BIGINT) % 5 AS ans, " +
        "CAST(user_id % 5 AS BIGINT) AS gold FROM events), " +
        "g AS (SELECT event_type, user_id, ans, " +
        "CAST(count(*) AS BIGINT) AS cnt, max(gold) AS gold " +
        "FROM b GROUP BY 1, 2, 3), " +
        "m AS (SELECT event_type, user_id, CAST(sum(cnt) AS BIGINT) AS " +
        "n_samples, min({'nc': -cnt, 'a': ans}) AS mm, max(gold) AS gold " +
        "FROM g GROUP BY 1, 2) " +
        "SELECT event_type, user_id, n_samples, (mm).a AS modal_answer, " +
        "CAST(-(mm).nc AS BIGINT) AS modal_count, " +
        "CAST(-(mm).nc AS DOUBLE) / CAST(n_samples AS DOUBLE) AS consensus, " +
        "(mm).a = gold AS correct FROM m"),
    // AUC mirror: per-score class counts, the same doubled average-rank
    // sum over the score-ordered running offset, one division at the end
    "eval_auc" ->
      ("WITH b AS (SELECT CAST(floor(value * 100) AS BIGINT) % 16 AS s, " +
        "CASE WHEN CAST(floor(value * 100) AS BIGINT) % 4 = 0 " +
        "THEN 1 ELSE 0 END AS y FROM events), " +
        "g AS (SELECT s, CAST(sum(y) AS BIGINT) AS p, " +
        "CAST(count(*) - sum(y) AS BIGINT) AS q FROM b GROUP BY 1), " +
        "w AS (SELECT p, q, CAST(coalesce(sum(p + q) OVER (ORDER BY s " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) " +
        "AS cum FROM g), " +
        "t AS (SELECT CAST(sum(p) AS BIGINT) AS tp, " +
        "CAST(sum(q) AS BIGINT) AS tq, " +
        "CAST(sum(p * (2 * cum + p + q + 1)) AS BIGINT) AS s2 FROM w) " +
        "SELECT tp AS n_pos, tq AS n_neg, " +
        "CASE WHEN tp = 0 OR tq = 0 THEN NULL ELSE " +
        "CAST(s2 - tp * (tp + 1) AS DOUBLE) / " +
        "CAST(2 * tp * tq AS DOUBLE) END AS auc FROM t"),
    // memorization mirror: the generation rebuild replays the dropout →
    // re-join → re-split chain (so the all-dropped [''] edge matches),
    // membership is the string-keyed LEFT join (the hash-collision
    // convention of the decontamination mirrors), one division per row
    "eval_gen_memorization" ->
      (s"WITH gk AS (SELECT doc_id, [toks[i] for i in " +
        "generate_series(1, len(toks)) if " +
        s"(${hashRawSql("(doc_id * 1000003 + (i - 1))", 99)}) % 100 >= 30] " +
        s"AS kept FROM (SELECT doc_id, $RawToks AS toks FROM documents)), " +
        "g2 AS (SELECT doc_id, string_split_regex(" +
        "array_to_string(kept, ' '), '\\s+') AS toks FROM gk), " +
        s"gsh AS (SELECT doc_id, unnest(list_distinct(${ngramsOfToks(3)})) " +
        "AS s FROM g2), " +
        s"ctk AS (SELECT string_split_regex(trim(text, '$SqlWs'), '\\s+') " +
        "AS toks FROM documents), " +
        s"csh AS (SELECT DISTINCT unnest(list_distinct(${ngramsOfToks(3)})) " +
        "AS s FROM ctk), " +
        "sc AS (SELECT gsh.doc_id, CAST(count(*) AS BIGINT) AS n_ngrams, " +
        "CAST(count(csh.s) AS BIGINT) AS n_seen " +
        "FROM gsh LEFT JOIN csh ON gsh.s = csh.s GROUP BY 1) " +
        "SELECT doc_id, n_ngrams, n_seen, " +
        "CASE WHEN n_ngrams > 0 THEN CAST(n_seen AS DOUBLE) / " +
        "CAST(n_ngrams AS DOUBLE) ELSE 0.0 END AS seen_ratio FROM sc"),
    // per-language BLEU mirror: the same pooled sums and arithmetic,
    // grouped by the documents.lang slice
    "eval_gen_bleu_by_lang" ->
      (s"WITH $GenStatsCtes, " +
        "sl AS (SELECT d.lang AS lang, ms.doc_id, ms.cand_len, " +
        "ms.ref_len, " +
        (1 to 4).map(n => s"ms.m$n, ms.c$n").mkString(", ") +
        " FROM ms JOIN documents d USING (doc_id)), " +
        "s AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_pairs, " +
        "CAST(sum(cand_len) AS BIGINT) AS cand_tokens, " +
        "CAST(sum(ref_len) AS BIGINT) AS ref_tokens, " +
        (1 to 4).map(n => s"CAST(sum(m$n) AS BIGINT) AS sm$n, " +
          s"CAST(sum(c$n) AS BIGINT) AS sc$n").mkString(", ") +
        " FROM sl GROUP BY 1) " +
        "SELECT lang, n_pairs, cand_tokens, ref_tokens, " +
        (1 to 4).map(n => s"CASE WHEN sc$n = 0 THEN 0.0 ELSE " +
          s"CAST(sm$n AS DOUBLE) / CAST(sc$n AS DOUBLE) END AS p$n")
          .mkString(", ") + ", " +
        "CASE WHEN cand_tokens = 0 THEN 0.0 ELSE " +
        sqlRound4("CASE WHEN cand_tokens >= ref_tokens THEN 1.0 " +
          "ELSE exp(1.0 - CAST(ref_tokens AS DOUBLE) / " +
          "CAST(cand_tokens AS DOUBLE)) END") +
        " END AS bp, " +
        "CASE WHEN sm1 = 0 OR sm2 = 0 OR sm3 = 0 OR sm4 = 0 " +
        "OR cand_tokens = 0 THEN 0.0 ELSE " +
        sqlRound4("(CASE WHEN cand_tokens >= ref_tokens THEN 1.0 " +
          "ELSE exp(1.0 - CAST(ref_tokens AS DOUBLE) / " +
          "CAST(cand_tokens AS DOUBLE)) END) * " +
          "exp((((ln(CAST(sm1 AS DOUBLE) / CAST(sc1 AS DOUBLE)) + " +
          "ln(CAST(sm2 AS DOUBLE) / CAST(sc2 AS DOUBLE))) + " +
          "ln(CAST(sm3 AS DOUBLE) / CAST(sc3 AS DOUBLE))) + " +
          "ln(CAST(sm4 AS DOUBLE) / CAST(sc4 AS DOUBLE))) / 4.0)") +
        " END AS bleu FROM s"),
    // BLEU-jackknife mirror: the same leave-one-out arithmetic per pair
    // on the same fixed-point grid, exact integer variance sums, the
    // same sqrt/division sequence
    "eval_gen_bleu_ci" -> {
      def lv(t: String, c: String) = s"(t$t - $c)"
      val lZero = (1 to 4).map(n => s"${lv(s"m$n", s"m$n")} = 0")
        .mkString(" OR ") + s" OR ${lv("cand", "cand_len")} = 0"
      val lBp = s"(CASE WHEN ${lv("cand", "cand_len")} >= " +
        s"${lv("ref", "ref_len")} THEN 1.0 ELSE " +
        s"exp(1.0 - CAST(${lv("ref", "ref_len")} AS DOUBLE) / " +
        s"CAST(${lv("cand", "cand_len")} AS DOUBLE)) END)"
      val lLog = "((" + (1 to 4).map(n =>
        s"ln(CAST(${lv(s"m$n", s"m$n")} AS DOUBLE) / " +
          s"CAST(${lv(s"c$n", s"c$n")} AS DOUBLE))").mkString(" + ") +
        ") / 4.0)"
      val fZero = (1 to 4).map(n => s"tm$n = 0").mkString(" OR ") +
        " OR tcand = 0"
      val fBp = "(CASE WHEN tcand >= tref THEN 1.0 ELSE " +
        "exp(1.0 - CAST(tref AS DOUBLE) / CAST(tcand AS DOUBLE)) END)"
      val fLog = "((" + (1 to 4).map(n =>
        s"ln(CAST(tm$n AS DOUBLE) / CAST(tc$n AS DOUBLE))")
        .mkString(" + ") + ") / 4.0)"
      val seExpr = "sqrt(CAST(n - 1 AS DOUBLE) * " +
        "CAST(n * ss2 - ss * ss AS DOUBLE)) / CAST(n AS DOUBLE) / 10000.0"
      s"WITH $GenStatsCtes, " +
        "tt2 AS (SELECT CAST(count(*) AS BIGINT) AS tn, " +
        "CAST(sum(cand_len) AS BIGINT) AS tcand, " +
        "CAST(sum(ref_len) AS BIGINT) AS tref, " +
        (1 to 4).map(n => s"CAST(sum(m$n) AS BIGINT) AS tm$n, " +
          s"CAST(sum(c$n) AS BIGINT) AS tc$n").mkString(", ") +
        " FROM ms), " +
        "jx AS (SELECT CASE WHEN " + lZero + " THEN 0 ELSE " +
        s"CAST(floor($lBp * exp($lLog) * 10000.0 + 0.499999) AS BIGINT) " +
        "END AS si FROM ms, tt2), " +
        "ag AS (SELECT CAST(count(*) AS BIGINT) AS n, " +
        "CAST(sum(si) AS BIGINT) AS ss, " +
        "CAST(sum(si * si) AS BIGINT) AS ss2 FROM jx), " +
        "fl AS (SELECT tn AS n_pairs, CASE WHEN " + fZero +
        s" THEN 0.0 ELSE ${sqlRound4(s"$fBp * exp($fLog)")} END AS bleu " +
        "FROM tt2) " +
        "SELECT n_pairs, bleu, " +
        "CAST(ss AS DOUBLE) / CAST(n * 10000 AS DOUBLE) AS jk_mean, " +
        s"CASE WHEN n < 2 THEN NULL ELSE $seExpr END AS jk_se, " +
        s"CASE WHEN n < 2 THEN NULL ELSE bleu - 1.96 * $seExpr END AS ci_lo, " +
        s"CASE WHEN n < 2 THEN NULL ELSE bleu + 1.96 * $seExpr END AS ci_hi " +
        "FROM fl, ag"
    },
    // per-doc ROUGE mirror: the same exact counts, every score a single
    // IEEE division (F1 as 2m/(c+r), never the P·R composite)
    "eval_gen_rouge" ->
      (s"WITH $GenStatsCtes " +
        "SELECT doc_id, m1, c1, r1, m2, c2, r2, lcs, cand_len, ref_len, " +
        Seq(("m1", "c1", "r1", "1"), ("m2", "c2", "r2", "2"),
          ("lcs", "cand_len", "ref_len", "l")).map { case (m, c, r, t) =>
          s"CASE WHEN $c = 0 THEN 0.0 ELSE CAST($m AS DOUBLE) / " +
            s"CAST($c AS DOUBLE) END AS rouge${t}_p, " +
            s"CASE WHEN $r = 0 THEN 0.0 ELSE CAST($m AS DOUBLE) / " +
            s"CAST($r AS DOUBLE) END AS rouge${t}_r, " +
            s"CASE WHEN $c + $r = 0 THEN 0.0 ELSE " +
            s"CAST($m * 2 AS DOUBLE) / CAST($c + $r AS DOUBLE) END " +
            s"AS rouge${t}_f"
        }.mkString(", ") +
        " FROM ms"),
    "pipeline_e2e" -> PipelineE2eSql)
}
