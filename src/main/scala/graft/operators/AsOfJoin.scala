package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructField, StructType, TimestampType}

/** As-of join: attach to every left row the single nearest right row of
  * the same key — most recent at-or-before (`backward`) or earliest
  * at-or-after (`forward`) in event time, optionally within a tolerance
  * horizon. The time-series/point-in-time primitive (feature lookups,
  * click→purchase attribution, slowly-changing-dimension reads) that
  * plain equi/range joins can't express without a per-row top-1.
  *
  * Spark-first plan shape: NOT a range join (whose output multiplies by
  * every in-window candidate before a top-1 re-aggregation) but a tagged
  * union + ONE running `last(_, ignoreNulls)` window:
  *
  *   1. both sides project to a common narrow shape and union — right
  *      rows carry a match-payload struct, left rows carry the original
  *      row struct;
  *   2. one shuffle partitions by the join key and sorts by
  *      (event time, side, tie) — the only exchange in the plan;
  *   3. a running `[unbounded preceding, current row]` frame evaluates
  *      `last(payload, ignoreNulls)` in a single O(1)-per-row pass, so
  *      each left row reads the nearest preceding right row directly.
  *
  * At 100 TB that is: shuffle volume = |left| + |right| narrow rows
  * (never the |left|×|candidates| intermediate of the range-join form),
  * per-partition work linear in partition size, and no driver-side
  * state. Skewed keys degrade to a single sorted scan per hot key —
  * the same bound as any per-key ordered computation.
  *
  * Direction and strictness are encoded purely in the sort: event time
  * is negated for `forward` (so "most recent preceding" becomes
  * "earliest following"), and the side tag orders right rows before
  * left rows at equal timestamps iff the match is inclusive. Ties among
  * right rows at the same timestamp resolve deterministically to the
  * highest `tieCol` for `backward` and the lowest for `forward` —
  * i.e. `ORDER BY r.ts DESC, r.tie DESC LIMIT 1` / `ASC, ASC LIMIT 1`
  * semantics, replayable in ANSI SQL.
  *
  * Reference scope: vitrivr/ADAMpro has no temporal join at all
  * (joins are `ap_id` equi-joins, `Entity.scala:91-110`); this is part
  * of the beyond-reference training-pipeline surface.
  *
  * @param left     frame to enrich; all its columns pass through
  * @param right    frame supplying matches
  * @param keys     equi-join key columns (present on both sides)
  * @param tsCol    event-time column (timestamp-castable, both sides)
  * @param tieCol   right-side numeric column breaking equal-time ties
  *                 deterministically
  * @param payload  right-side columns to attach (null when unmatched);
  *                 names must not collide with left columns
  * @param direction `backward` (r.ts ≤/< l.ts) or `forward` (r.ts ≥/> l.ts)
  * @param strict   exclude right rows at exactly the left timestamp
  * @param toleranceMicros max |l.ts − r.ts| in microseconds; farther
  *                 matches are nulled out (the "as-of within horizon"
  *                 form that keeps streaming state bounded)
  */
object AsOfJoin {

  /** Matched right-side event time is returned as this column. */
  val MatchedTsCol = "ap_asof_ts"

  def asOf(left: DataFrame, right: DataFrame,
           keys: Seq[String], tsCol: String, tieCol: String,
           payload: Seq[String],
           direction: String = "backward",
           strict: Boolean = false,
           toleranceMicros: Option[Long] = None): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"direction must be backward|forward, got '$direction'")
    require(keys.nonEmpty, "at least one join key required")
    require(payload.nonEmpty, "at least one payload column required")
    val leftCols = left.columns.toSeq
    require(payload.intersect(leftCols).isEmpty,
      s"payload columns ${payload.intersect(leftCols).mkString(",")} collide with left columns")
    require(!leftCols.contains(MatchedTsCol),
      s"left may not already contain $MatchedTsCol")
    toleranceMicros.foreach(t => require(t >= 0, "tolerance must be >= 0"))

    // forward = backward over negated time (and negated ties, so the
    // deterministic winner flips from max to min)
    val sgn = if (direction == "backward") 1L else -1L
    def us(c: Column): Column = unix_micros(c.cast("timestamp"))

    // Equi-join semantics: a right row with a NULL join key or NULL event
    // time can never be a match (NULL = NULL is not true; a NULL-time row
    // has no position on the time axis), yet unfiltered it would sort
    // first in the window (ap_sort NULL, nulls-first) and be served by
    // the running last() as a bogus null-timestamp match. Drop them here.
    // Left rows are NOT filtered — null-key left rows land in partitions
    // containing no right rows and null-time left rows sort before every
    // right row, so both fall through unmatched, matching the LATERAL
    // top-1 oracle form.
    val rightClean = right.filter(
      (col(tsCol).isNotNull +: keys.map(k => col(k).isNotNull)).reduce(_ && _))

    val matchType = StructType(
      StructField("ap_rts", TimestampType) +: payload.map(p => right.schema(p)))
    val leftRowType = StructType(left.schema.fields)

    // inclusive: right sorts BEFORE left at equal time (visible to the
    // running frame); strict: after (invisible)
    val (lSide, rSide) = if (strict) (0, 1) else (1, 0)

    val l2 = left.select(
      keys.map(col) ++ Seq(
        (us(col(tsCol)) * sgn).as("ap_sort"),
        lit(lSide).as("ap_side"),
        lit(0L).as("ap_tie"),
        lit(null).cast(matchType).as("ap_match"),
        struct(leftCols.map(col): _*).as("ap_lrow")): _*)
    val r2 = rightClean.select(
      keys.map(col) ++ Seq(
        (us(col(tsCol)) * sgn).as("ap_sort"),
        lit(rSide).as("ap_side"),
        (col(tieCol).cast("long") * sgn).as("ap_tie"),
        struct(col(tsCol).cast("timestamp").as("ap_rts") +: payload.map(col): _*)
          .as("ap_match"),
        lit(null).cast(leftRowType).as("ap_lrow")): _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("ap_sort").asc, col("ap_side").asc, col("ap_tie").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matched = l2.unionByName(r2)
      .withColumn("ap_m", last(col("ap_match"), ignoreNulls = true).over(w))
      .filter(col("ap_lrow").isNotNull)

    val bounded = toleranceMicros match {
      case Some(t) =>
        val diff = abs(us(col("ap_lrow").getField(tsCol)) - us(col("ap_m").getField("ap_rts")))
        matched.withColumn("ap_m", when(col("ap_m").isNotNull && diff <= t, col("ap_m")))
      case None => matched
    }

    bounded.select(
      leftCols.map(c => col("ap_lrow").getField(c).as(c)) ++
        Seq(col("ap_m").getField("ap_rts").as(MatchedTsCol)) ++
        payload.map(p => col("ap_m").getField(p).as(p)): _*)
  }
}
