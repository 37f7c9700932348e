package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM pretraining: concatenate documents in a
  * deterministic order and cut the token stream at fixed `budget`
  * boundaries (the GPT-style pack-then-chunk layout — documents may
  * straddle chunk boundaries). Emits, per document, its shard, its start
  * offset in the shard's concatenated token stream, the first chunk it
  * lands in, and how many chunks it spans.
  *
  * Determinism + portability: the shard is the PORTABLE rolling key hash
  * ([[Sampling.keyHash]]) mod `nShards`, and the order within a shard is
  * the id — so the exact packing is reproducible across runs and
  * replayable by an external SQL engine (one window cumsum), unlike
  * `monotonically_increasing_id`/`rand()` layouts.
  *
  * Scale shape: one shuffle, keyed by the shard; each shard's window
  * cumsum is independent, so parallelism = `nShards` and no global
  * ordering bottleneck exists (a single global pack order would funnel
  * 100 TB through one partition). Offsets are exact integer arithmetic
  * (`div`, not floating floor) so they hold past 2^53 tokens.
  */
object Packing {

  /** Chunk assignments for pack-then-chunk pretraining layout.
    * Output: (id, shard, start_off, first_chunk, n_chunks); zero-token
    * docs report n_chunks 0 (they occupy no chunk).
    *
    * Duplicate ids are tolerated: the cumulative sum runs over a ROWS
    * frame ordered by (id, tok), so tied ids get disjoint consecutive
    * offsets instead of the default RANGE frame's shared end-offset
    * (which would report overlapping starts and a wrong n_chunks for
    * the earlier row). Two rows with identical (id, tok) receive the
    * two interchangeable slots, so the output is still deterministic
    * as a set. */
  private def chunkOf(off: org.apache.spark.sql.Column, budget: Long) =
    call_function("div", off, lit(budget))

  /** Shared offset frame: (id, shard, tok, end_off) after the per-shard
    * cumulative sum — the one shuffle both public forms build on. */
  private def offsets(df: DataFrame, idCol: String, tokenCol: String,
                      budget: Long, nShards: Int): DataFrame = {
    require(budget > 0, s"budget must be positive: $budget")
    require(nShards > 0, s"nShards must be positive: $nShards")
    val w = Window.partitionBy("shard").orderBy("id", "tok")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(col(idCol).as("id"), col(tokenCol).cast("long").as("tok"))
      .withColumn("shard", pmod(Sampling.keyHash(col("id")), lit(nShards)))
      .withColumn("end_off", sum("tok").over(w))
  }

  def chunkAssignments(df: DataFrame, idCol: String, tokenCol: String,
                       budget: Long, nShards: Int): DataFrame =
    offsets(df, idCol, tokenCol, budget, nShards)
      .select(col("id"), col("shard"),
        (col("end_off") - col("tok")).as("start_off"),
        chunkOf(col("end_off") - col("tok"), budget).as("first_chunk"),
        when(col("tok") === 0, lit(0L))
          .otherwise(chunkOf(col("end_off") - 1, budget) -
            chunkOf(col("end_off") - col("tok"), budget) + 1).as("n_chunks"))

  /** The chunk-boundary map a packing pipeline materializes for the
    * loader: ONE ROW PER (document, chunk) the document occupies —
    * (id, shard, chunk_idx, tok_in_chunk), where `tok_in_chunk` is how
    * many of the document's tokens land in that chunk (partial at both
    * straddled boundaries). Zero-token documents emit nothing.
    *
    * Plan shape: the same single shard-keyed window shuffle as
    * [[chunkAssignments]] plus a codegen `explode(sequence(...))` — the
    * fan-out is bounded by ceil(tok/budget)+1 rows per document, so
    * output stays O(total tokens / budget + documents). Per-chunk token
    * sums then reconcile: grouping by (shard, chunk_idx) must give
    * `budget` for every interior chunk. */
  def chunkRows(df: DataFrame, idCol: String, tokenCol: String,
                budget: Long, nShards: Int): DataFrame = {
    val off = offsets(df, idCol, tokenCol, budget, nShards)
      .filter(col("tok") > 0)
      .withColumn("start_off", col("end_off") - col("tok"))
    off
      .withColumn("chunk_idx", explode(sequence(
        chunkOf(col("start_off"), budget), chunkOf(col("end_off") - 1, budget))))
      .select(col("id"), col("shard"), col("chunk_idx"),
        (least(col("end_off"), (col("chunk_idx") + 1) * budget) -
          greatest(col("start_off"), col("chunk_idx") * budget)).as("tok_in_chunk"))
  }
}
