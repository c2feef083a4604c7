package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Edit-distance (Levenshtein) self-join for entity resolution over string
  * keys — near-identical titles, author spellings, URLs-off-by-a-char. The
  * naive form is an all-pairs O(n²·L²) comparison; the scale path here is
  * the SymSpell deletion-neighborhood theorem (Garbe 2012, public): if
  * lev(a, b) <= d then a and b share at least one common variant reachable
  * by deleting <= d characters from each. So: expand each string to its
  * deletion neighborhood (|s| choose <= d variants — ~L²/2 for d = 2),
  * equi-join on the variant, and confirm survivors with one banded
  * Levenshtein pass. Same bucket-join-then-verify shape as MinHash LSH
  * (`Dedup.minhashLshPairs`), with a deterministic (not probabilistic)
  * candidate guarantee.
  */
object FuzzyString {

  /** One-character deletions of every string in `arr`, flattened. Empty
    * strings map to no variants (guard required: `sequence(1, 0)` would
    * generate a DESCENDING range, not an empty one). */
  private def delEach(arr: Column): Column =
    flatten(transform(arr, s =>
      when(length(s) === 0, array().cast("array<string>"))
        .otherwise(transform(sequence(lit(1), length(s)),
          i => concat(s.substr(lit(1), i - lit(1)),
            s.substr(i + lit(1), length(s) - i))))))

  /** The deletion neighborhood of `s`: s itself plus every variant reachable
    * by deleting up to `maxDist` characters, deduplicated. All built-in
    * codegen'd expressions — no UDF in the expansion. */
  def deletionNeighborhood(s: Column, maxDist: Int): Column = {
    require(maxDist >= 1 && maxDist <= 2,
      s"deletion neighborhood supports maxDist 1..2, got $maxDist")
    val v0 = array(s)
    val v1 = delEach(v0)
    val all = if (maxDist == 1) concat(v0, v1)
              else concat(v0, v1, delEach(v1))
    array_distinct(all)
  }

  /** All pairs of rows whose `strCol` values are within Levenshtein
    * distance `maxDist`: (id_a, id_b, s_a, s_b, dist) with id_a < id_b.
    * `idCol` must be unique per row (it defines pair identity and order).
    *
    * Scale shape: explode to (id, s, variant) — fan-out is ~L²/2 rows per
    * string at d = 2, linear in corpus size — then ONE keyed self-join on
    * the variant (shuffle hash on a short string key) with the banded
    * Levenshtein confirm (`levenshtein(l, r, threshold)` early-exits at
    * threshold+1, O(d·L) not O(L²)). The confirm is written above the
    * candidate dedup but Catalyst pushes it through the distinct into the
    * join condition — the better plan: collisions are verified as they
    * stream out of the join (cheap, banded) so the dedup aggregation only
    * buffers TRUE matches, bounding its state by the result size rather
    * than the collision count. Never all-pairs. Skew:
    * a variant shared by k strings yields k²/2 candidates — short strings
    * (length <= d+1 hits the "" variant) are the hazard; filter them out
    * upstream or cap variant doc-frequency like `ngramJaccardPairs`' df
    * cap if profiled hot (dropping a variant loses only pairs whose EVERY
    * common variant is hot, so cap high).
    */
  def editDistancePairs(df: DataFrame, idCol: String, strCol: String,
      maxDist: Int): DataFrame = {
    val ex = df.select(col(idCol).as("__fz_id"), col(strCol).as("__fz_s"),
      explode(deletionNeighborhood(col(strCol), maxDist)).as("__fz_v"))
    val a = ex.toDF("id_a", "s_a", "v_a")
    val b = ex.toDF("id_b", "s_b", "v_b")
    a.join(b, col("v_a") === col("v_b") && col("id_a") < col("id_b"))
      .select("id_a", "id_b", "s_a", "s_b")
      .distinct()
      // threshold form returns -1 above maxDist (banded algorithm), the
      // true distance at or below it
      .withColumn("dist",
        levenshtein(col("s_a"), col("s_b"), maxDist).cast("long"))
      .filter(col("dist") >= 0)
  }
}
