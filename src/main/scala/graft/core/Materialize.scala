package graft.core

import org.apache.spark.sql.DataFrame

/** Eager materialization with lineage truncation — the one primitive
  * behind every "compute the expensive relation ONCE, then let N
  * consumers re-read it" shape (winnow/minhash pair relations, the
  * connected-components iteration frontier, the bigram multiplicities
  * table).
  *
  * Mode is decided by the session, not the operator:
  *
  *  - **Reliable** (`df.checkpoint(eager = true)`) when
  *    `sparkContext.setCheckpointDir(...)` has been called — blocks are
  *    written to the (typically HDFS/object-store) checkpoint dir, so on
  *    a real cluster an executor loss recomputes nothing and loses
  *    nothing. This is the 100 TB mode: set a checkpoint dir in any
  *    multi-executor deployment — AND set
  *    `spark.cleaner.referenceTracking.cleanCheckpoints=true`
  *    ([[GraftSession]] does): without it Spark never deletes reliable
  *    checkpoint files, so per-iteration call sites (the
  *    connected-components frontier, per-batch corpus extension)
  *    accumulate unbounded files in the checkpoint dir. With it the
  *    ContextCleaner removes each checkpoint's files when the frame is
  *    garbage-collected, the same lifecycle the cached blocks follow.
  *  - **Local** (`df.localCheckpoint(eager = true)`) otherwise — blocks
  *    live in executor storage (MEMORY_AND_DISK), which is faster but
  *    NOT fault-tolerant: an executor loss makes the frame
  *    unrecoverable mid-query. Correct for `local[*]` (single JVM —
  *    executor loss is process death) and for clusters that accept
  *    job-retry-on-loss semantics.
  *
  * Operators that persist-then-release a SIDE relation (cache + explicit
  * `unpersist` after the checkpoint) keep that discipline; this helper
  * only decides where the checkpointed blocks go.
  */
object Materialize {
  def apply(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined)
      df.checkpoint(eager = true)
    else df.localCheckpoint(eager = true)

  /** `import graft.core.Materialize.Ops` for `df.materialized`. */
  implicit class Ops(private val df: DataFrame) extends AnyVal {
    def materialized: DataFrame = Materialize(df)
  }
}
