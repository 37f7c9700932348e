package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Binned range join: match point rows to interval rows on
  * `lo ≤ point ≤ hi` (plus optional equi keys) WITHOUT the
  * nested-loop-join trap.
  *
  * Catalyst plans a pure range predicate as BroadcastNestedLoopJoin —
  * O(|points| × |intervals|) comparisons and a broadcast of one whole
  * side, which stops working the moment neither side fits in memory.
  * This operator turns the range predicate into an equi-join:
  *
  *   1. each interval explodes to the fixed-width bins it overlaps
  *      (`floor(lo/w) .. floor(hi/w)`) — output rows per interval =
  *      `span/w + 1`, bounded by `maxBinsPerInterval` (a distributed
  *      `raise_error` guard, so a pathological interval fails loudly
  *      instead of exploding a task);
  *   2. each point computes its single bin `floor(p/w)`;
  *   3. one hash equi-join on (keys…, bin), then the exact bound
  *      filter.
  *
  * A point's bin is unique and an interval emits each overlapped bin
  * once, so every true (point, interval) match joins EXACTLY once — no
  * post-join distinct. At 100 TB: shuffle volume is |points| +
  * Σ(interval spans)/w narrow rows, the join is an ordinary shuffled
  * (or broadcast, Catalyst's choice) hash join, and bin width tunes the
  * replication-vs-selectivity trade the way bucket count tunes any
  * band join.
  *
  * Output: all point columns + all interval columns (shared equi keys
  * appear once); column sets must otherwise be disjoint.
  *
  * Reference scope: ADAMpro joins only on `ap_id` equality
  * (`Entity.scala:91-110`); range predicates there are scan filters,
  * never join conditions. Beyond-reference training-pipeline surface
  * (IP-to-range lookups, value-band enrichment, incident-window
  * correlation).
  */
object RangeJoin {

  /** One row per fixed-width bin the interval overlaps, inverted
    * (lo > hi) intervals dropped; the span guard rides the sequence
    * bound so projection pruning can't skip it. Shared by both join
    * forms. */
  private def explodeToBins(df: DataFrame, loCol: String, hiCol: String,
                            binWidth: Double, maxBins: Long): DataFrame = {
    val loBin = floor(col(loCol) / binWidth).cast("long")
    val hiBin = floor(col(hiCol) / binWidth).cast("long")
    val spanGuard = when(hiBin - loBin >= maxBins,
      raise_error(concat(
        lit(s"interval spans more than $maxBins bins of width $binWidth at "),
        col(loCol).cast("string"), lit(".."), col(hiCol).cast("string"))))
    df.filter(col(loCol) <= col(hiCol))
      .withColumn("ap_bin",
        explode(sequence(loBin, coalesce(spanGuard.cast("long"), hiBin))))
  }

  def pointsInIntervals(points: DataFrame, pointCol: String,
                        intervals: DataFrame, loCol: String, hiCol: String,
                        binWidth: Double, keys: Seq[String] = Nil,
                        maxBinsPerInterval: Long = 10000L): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    require(maxBinsPerInterval > 0, "maxBinsPerInterval must be positive")
    val pCols = points.columns.toSet -- keys
    val iCols = intervals.columns.toSet -- keys
    val overlap = pCols.intersect(iCols)
    require(overlap.isEmpty,
      s"non-key columns ${overlap.mkString(",")} appear on both sides")
    require(!pCols.contains("ap_bin") && !iCols.contains("ap_bin"),
      "ap_bin is reserved")

    val binned = explodeToBins(intervals, loCol, hiCol, binWidth, maxBinsPerInterval)
    val pts = points.withColumn("ap_bin", floor(col(pointCol) / binWidth).cast("long"))

    pts.join(binned, keys :+ "ap_bin")
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("ap_bin")
  }

  /** Interval-OVERLAP join: match `[loL, hiL]` to `[loR, hiR]` whenever
    * they touch (`loL ≤ hiR && loR ≤ hiL`, inclusive), plus optional
    * equi keys — the interval-interval member of the family (session
    * overlap, concurrent-validity joins).
    *
    * Both sides explode to their covered bins (same span guard as the
    * point form), one hash equi-join on (keys…, bin), then the exact
    * overlap filter AND the exactly-once predicate: a pair is kept only
    * at the bin containing the OVERLAP START `max(loL, loR)` — a point
    * that lies inside both intervals, so both sides provably emitted
    * that bin, and only one bin can contain it. No post-join distinct,
    * no multiplicity blow-up from long intervals sharing many bins.
    *
    * Output: all columns of both sides (shared keys once); non-key
    * column sets must be disjoint. */
  def intervalsOverlap(left: DataFrame, loL: String, hiL: String,
                       right: DataFrame, loR: String, hiR: String,
                       binWidth: Double, keys: Seq[String] = Nil,
                       maxBinsPerInterval: Long = 10000L): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    require(maxBinsPerInterval > 0, "maxBinsPerInterval must be positive")
    val lCols = left.columns.toSet -- keys
    val rCols = right.columns.toSet -- keys
    val overlap = lCols.intersect(rCols)
    require(overlap.isEmpty,
      s"non-key columns ${overlap.mkString(",")} appear on both sides")
    require(!(lCols ++ rCols).contains("ap_bin"), "ap_bin is reserved")

    explodeToBins(left, loL, hiL, binWidth, maxBinsPerInterval)
      .join(explodeToBins(right, loR, hiR, binWidth, maxBinsPerInterval), keys :+ "ap_bin")
      .filter(col(loL) <= col(hiR) && col(loR) <= col(hiL) &&
        col("ap_bin") === floor(greatest(col(loL), col(loR)) / binWidth).cast("long"))
      .drop("ap_bin")
  }
}
