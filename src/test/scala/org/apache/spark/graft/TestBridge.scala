package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Test-only access to `private[spark]` session state: SparkContext has
  * no public way to UNSET a checkpoint dir, and the suites share one
  * session — a spec that exercises the reliable-checkpoint mode must be
  * able to restore local mode for everything that runs after it. */
object TestBridge {
  def clearCheckpointDir(sc: SparkContext): Unit = sc.checkpointDir = None
}
