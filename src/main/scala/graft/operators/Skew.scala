package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for pathologically hot join keys.
  *
  * First-line answers at scale are (a) broadcast the small side and
  * (b) AQE's skew-join split (both on by default here). Salting is the
  * remaining tool for the case they can't cover: the build side is too
  * big to broadcast AND a single key is hot enough that even a split
  * partition is one task's worth of one key. Replicating the build side
  * `nSalts`× and spreading the probe side's rows across salts turns one
  * hot key's probe rows into `nSalts` parallel tasks, at the cost of
  * `nSalts`× build-side shuffle volume — a knob, not a default.
  */
object Skew {

  val SaltCol = "ap_salt"

  /** Salted inner equi-join on `key`: `probe`'s rows spread uniformly
    * (deterministic row hash) over `nSalts` salts; `build` is replicated
    * once per salt. Result equals `probe.join(build, key)` exactly. */
  def saltedJoin(probe: DataFrame, build: DataFrame, key: String, nSalts: Int): DataFrame = {
    require(nSalts > 0, s"nSalts must be positive, got $nSalts")
    require(!probe.columns.contains(SaltCol) && !build.columns.contains(SaltCol),
      s"$SaltCol column already present")
    val salted = probe.withColumn(SaltCol,
      pmod(xxhash64(monotonically_increasing_id()), lit(nSalts.toLong)).cast("int"))
    val replicated = build.withColumn(SaltCol,
      explode(sequence(lit(0), lit(nSalts - 1))))
    salted.join(replicated, Seq(key, SaltCol)).drop(SaltCol)
  }
}
