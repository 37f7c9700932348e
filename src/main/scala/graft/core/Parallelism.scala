package graft.core

import org.apache.spark.sql.{Column, DataFrame}

/** Scale-adaptive minimum parallelism for CPU-heavy per-row kernels.
  *
  * A small input (one parquet file under the scan split size, a single
  * unsplittable file, a dim table) plans as ONE scan task, so an
  * expensive per-row kernel downstream (codec decode, CDC boundary
  * walk, signature hashing) serializes on one core while the rest of
  * the cluster idles — measured r21 baseline: `audio_neardup_ahash`
  * 12.5 s wall at 15.5 s process-CPU on 32 cores (≈1.2 busy threads).
  *
  * [[fanOut]] repartitions such a frame to the session's default
  * parallelism BEFORE the kernel; when the input already carries at
  * least that many partitions (the at-scale case — a 100 TB table scans
  * as thousands of splits) it returns the frame UNCHANGED, adding no
  * exchange. Both halves of the optimization guide's partitioning trap
  * are avoided: no constant tuned for local mode (the target derives
  * from the running session), and no shuffle added where the data is
  * already spread. The shuffle that IS added moves only the columns the
  * caller kept — fan out the narrow id/text frame, not the payload,
  * wherever possible. */
object Parallelism {

  /** `df` spread over at least `spark.sparkContext.defaultParallelism`
    * partitions: hash-partitioned by `keys` when given (deterministic,
    * no pre-sort), round-robin otherwise. No-op when already that wide. */
  def fanOut(df: DataFrame, keys: Column*): DataFrame = {
    if (sys.env.contains("SPARK_GRAFT_NO_FANOUT")) return df
    // streaming frames cannot be probed via .rdd (AnalysisException) —
    // pass them through unchanged so the stream-capable operators
    // (cdcChunks, the signature stages) stay usable outside foreachBatch
    if (df.isStreaming) return df
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= target) df
    else if (keys.isEmpty) df.repartition(target)
    else df.repartition(target, keys: _*)
  }
}
