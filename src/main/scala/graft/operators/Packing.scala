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
  def chunkAssignments(df: DataFrame, idCol: String, tokenCol: String,
                       budget: Long, nShards: Int): DataFrame = {
    require(budget > 0, s"budget must be positive: $budget")
    require(nShards > 0, s"nShards must be positive: $nShards")
    val w = Window.partitionBy("shard").orderBy("id", "tok")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    def chunkOf(off: org.apache.spark.sql.Column) =
      call_function("div", off, lit(budget))
    df.select(col(idCol).as("id"), col(tokenCol).cast("long").as("tok"))
      .withColumn("shard", pmod(Sampling.keyHash(col("id")), lit(nShards)))
      .withColumn("end_off", sum("tok").over(w))
      .select(col("id"), col("shard"),
        (col("end_off") - col("tok")).as("start_off"),
        chunkOf(col("end_off") - col("tok")).as("first_chunk"),
        when(col("tok") === 0, lit(0L))
          .otherwise(chunkOf(col("end_off") - 1) -
            chunkOf(col("end_off") - col("tok")) + 1).as("n_chunks"))
  }
}
