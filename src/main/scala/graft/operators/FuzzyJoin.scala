package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** EXACT edit-distance similarity joins via FastSS deletion
  * neighborhoods (Bocek et al., "Fast Similarity Search in Large
  * Dictionaries", 2007): two strings with Levenshtein distance ≤ k
  * share at least one member of their ≤k-deletion neighborhoods, so
  * candidates come from ONE hash equi-join on the variant key and the
  * exact `levenshtein` kernel (codegen) verifies — never an all-pairs
  * product. The entity-resolution / fuzzy-dedup primitive (typo'd
  * titles, OCR'd names) the reference would push to an external
  * fuzzy-match service.
  *
  * Scale shape: a string of length L emits O(L) variants at k=1 and
  * O(L²) at k=2 — keys only, no payload; the join shuffles (id,
  * variant) pairs and the verify runs on the candidate set, which the
  * neighborhood property keeps proportional to the true result (plus
  * hash-collision noise bounded by `maxBucket`, the banded-dedup
  * mega-bucket guard). k ≤ 2 enforced — beyond that the neighborhood
  * blowup favors q-gram filtering instead.
  *
  * This is a SHORT-STRING operator (names, titles, SKUs): the `maxLen`
  * guard (default 128) FAILS LOUDLY — a distributed `raise_error`, the
  * tileExplode fan-out-guard discipline — when a row's string exceeds
  * it, rather than truncating (truncated-prefix keys would break the
  * exactness guarantee: prefix edit distance of a true pair can exceed
  * k, so a prefix-keyed candidate set can miss pairs) or silently
  * dropping (a caller that fed longer strings would lose pairs with no
  * signal). Callers that WANT the admission filter opt in with
  * `dropLongStrings = true`, which excludes over-long rows — exact over
  * the admitted rows, documented data loss over the rest. A
  * document-length corpus belongs in the n-gram/minhash family
  * ([[Dedup.ngramJaccardNearDupPairs]]), not here: at k=2 a 10 kB text
  * would emit ~10⁸ variant keys per row before any cap could help.
  */
object FuzzyJoin {

  /** All single-deletion variants; empty array for the empty string. */
  private def del1(s: Column): Column =
    when(length(s) <= 0, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), length(s)), i =>
        concat(s.substr(lit(1), i - 1), s.substr(i + 1, length(s)))))

  /** The ≤k-deletion neighborhood, original included, deduplicated. */
  private[graft] def neighborhood(s: Column, k: Int): Column = {
    require(k == 1 || k == 2, s"maxDist must be 1 or 2, got $k")
    val base = concat(array(s), del1(s))
    val full = if (k == 1) base
      else concat(base, flatten(transform(del1(s), t => del1(t))))
    array_distinct(full)
  }

  /** Default length bound (raise-or-exclude per `dropLongStrings`) —
    * see the class doc. */
  val DefaultMaxLen = 128

  private def keyed(df: DataFrame, strCol: String, idCol: String,
                    k: Int, maxLen: Int, dropLongStrings: Boolean): DataFrame = {
    require(maxLen > 0, s"maxLen must be positive, got $maxLen")
    // guard rides the string the keys derive from, so projection
    // pruning can't skip it; raise_error fails the job with the
    // offending length instead of silently losing the row's pairs
    val guarded =
      if (dropLongStrings) col(strCol)
      else coalesce(
        when(length(col(strCol)) > maxLen, raise_error(concat(
          lit(s"string longer than maxLen=$maxLen in edit-distance join " +
            s"(length "), length(col(strCol)).cast("string"),
          lit(s") — raise maxLen, or pass dropLongStrings=true to " +
            s"exclude long rows")))).cast("string"),
        col(strCol))
    // candidate keys are HASHES of the deletion variants, not the
    // variant strings: equal variants hash equal (the neighborhood
    // property is preserved — no false negatives), a 64-bit collision
    // only ADDS a candidate the levenshtein verify removes, and the
    // exploded/shuffled key column shrinks from an O(maxLen) string to
    // 8 bytes — at corpus scale the candidate join moves ~3x fewer
    // bytes and probes a long-keyed hash table instead of string keys
    df.filter(col(strCol).isNotNull &&
        (if (dropLongStrings) length(col(strCol)) <= maxLen else lit(true)))
      .select(col(idCol).as("__fid"), guarded.as("__fstr"))
      .withColumn("__fkey",
        explode(transform(neighborhood(col("__fstr"), k), v => xxhash64(v))))
  }

  /** Self-join: all pairs (id_a < id_b) with
    * `levenshtein(str_a, str_b) <= maxDist`. Exact over the rows
    * admitted by `maxLen` — the neighborhood property guarantees every
    * true pair shares a candidate key; the verify removes the rest.
    * `maxBucket` drops variant keys shared by more than that many rows
    * (stop-fragment buckets), the documented recall/cost knob of the
    * banded-dedup family. Rows longer than `maxLen` chars FAIL the job
    * loudly unless `dropLongStrings = true` excludes them (never
    * truncation) — the O(L²)-keys-per-row guard, see the class doc. */
  def editDistancePairs(df: DataFrame, strCol: String, idCol: String,
                        maxDist: Int = 1,
                        maxBucket: Int = Int.MaxValue,
                        maxLen: Int = DefaultMaxLen,
                        dropLongStrings: Boolean = false): DataFrame = {
    val nb = Dedup.capBuckets(
      keyed(df, strCol, idCol, maxDist, maxLen, dropLongStrings),
      Seq("__fkey"), maxBucket)
    // the id column IS the string for name-keyed callers — carry it once
    // (halves the candidate rows' bytes) and alias it back on output
    val sameCol = strCol == idCol
    val a =
      if (sameCol) nb.select(col("__fid").as("id_a"), col("__fkey"))
      else nb.select(col("__fid").as("id_a"), col("__fstr").as("str_a"),
        col("__fkey"))
    val b =
      if (sameCol) nb.select(col("__fid").as("id_b"), col("__fkey"))
      else nb.select(col("__fid").as("id_b"), col("__fstr").as("str_b"),
        col("__fkey"))
    val strA = if (sameCol) col("id_a") else col("str_a")
    val strB = if (sameCol) col("id_b") else col("str_b")
    val joined = a.join(b, Seq("__fkey"))
      .filter(col("id_a") < col("id_b") &&
        // free candidate cut BEFORE the distinct shuffle: a pair whose
        // lengths differ by more than maxDist can never verify
        // (levenshtein ≥ |len(a) − len(b)|), so dropping it here is
        // result-identical and removes the pair from the distinct
        abs(length(strA) - length(strB)) <= maxDist)
    (if (sameCol)
      joined.select("id_a", "id_b").distinct()
        .select(col("id_a"), col("id_b"),
          col("id_a").as("str_a"), col("id_b").as("str_b"))
    else
      joined.select("id_a", "id_b", "str_a", "str_b").distinct())
      .withColumn("dist", levenshtein(col("str_a"), col("str_b")))
      .filter(col("dist") <= maxDist)
  }

  /** Cross-join form: each left row matched to every right row within
    * `maxDist` — the typo-lookup / dictionary-correction shape. Output:
    * leftId, leftStr, rightId, rightStr, dist. `maxBucket` caps the
    * variant-key bucket width on BOTH sides — a stop-fragment key on
    * either relation would otherwise blow up the candidate product. */
  def editDistanceJoin(left: DataFrame, leftStr: String, leftId: String,
                       right: DataFrame, rightStr: String, rightId: String,
                       maxDist: Int = 1,
                       maxBucket: Int = Int.MaxValue,
                       maxLen: Int = DefaultMaxLen,
                       dropLongStrings: Boolean = false): DataFrame = {
    // a side may use its string AS its id — emit each name once
    def named(df: DataFrame, id: String, str: String): DataFrame =
      if (id == str) df.select(col("__fstr").as(str), col("__fkey"))
      else df.select(col("__fid").as(id), col("__fstr").as(str), col("__fkey"))
    val a = named(Dedup.capBuckets(
      keyed(left, leftStr, leftId, maxDist, maxLen, dropLongStrings),
      Seq("__fkey"), maxBucket), leftId, leftStr)
    val b = named(Dedup.capBuckets(
      keyed(right, rightStr, rightId, maxDist, maxLen, dropLongStrings),
      Seq("__fkey"), maxBucket), rightId, rightStr)
    val outCols = Seq(leftId, leftStr, rightId, rightStr).distinct
    a.join(b, Seq("__fkey"))
      // same pre-distinct length cut as editDistancePairs — lossless
      .filter(abs(length(col(leftStr)) - length(col(rightStr))) <= maxDist)
      .select(outCols.map(col): _*).distinct()
      .withColumn("dist", levenshtein(col(leftStr), col(rightStr)))
      .filter(col("dist") <= maxDist)
  }
}
