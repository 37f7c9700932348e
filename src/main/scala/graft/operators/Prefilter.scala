package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

/** Candidate-id prefilter strategies for sequential scans — the
  * reference's Bloom / chunked-isin / semi-join trichotomy
  * (`SequentialScanExpression.scala:88-121`), chosen by candidate
  * cardinality.
  *
  * At scale: the semi-join is the default (fully distributed, any
  * cardinality); Bloom collapses the filter to a broadcast bitset when
  * candidates are small (≤5000 in the reference) — the scan side then
  * needs NO shuffle at all; chunked-isin is the middle ground that
  * pushes literal IN-lists into the data source.
  */
object Prefilter {

  sealed trait Method
  case object SemiJoin extends Method
  case object Bloom extends Method
  case object ChunkedIsin extends Method

  /** Reference cap for the Bloom strategy (`SequentialScanExpression.scala:92`). */
  val BloomMaxIds = 5000L
  val BloomFpp = 0.05
  val IsinChunk = 500

  /** Max candidate ids the chunked-isin strategy will collect to the
    * driver. The reference only renders IN-lists under a cardinality cap;
    * without one, a caller with 10⁸ candidates OOMs the driver. Above the
    * cap the call degrades to the distributed semi-join (same result set). */
  val IsinMaxIds = 100000L

  def apply(df: DataFrame, candidates: DataFrame, idCol: String, method: Method,
            isinMaxIds: Long = IsinMaxIds): DataFrame =
    method match {
      case SemiJoin =>
        df.join(candidates.select(idCol).distinct(), Seq(idCol), "left_semi")
      case Bloom =>
        val bf: BloomFilter = candidates.stat.bloomFilter(idCol, BloomMaxIds, BloomFpp)
        val mightContain = udf((id: Long) => bf.mightContain(id))
        // Bloom admits false positives — a correctness-preserving
        // prefilter for candidates-then-rerank, same as the reference.
        df.filter(mightContain(col(idCol)))
      case ChunkedIsin =>
        val distinctIds = candidates.select(idCol).distinct()
        // one job: collect at most cap+1 ids; overflow = above the cap
        val cap = math.min(isinMaxIds, Int.MaxValue - 1L).toInt
        val ids = distinctIds.limit(cap + 1).collect().map(_.get(0))
        if (ids.length > isinMaxIds) apply(df, distinctIds, idCol, SemiJoin)
        else if (ids.isEmpty) df.limit(0)
        else df.filter(ids.grouped(IsinChunk)
          .map(chunk => col(idCol).isin(chunk.toSeq: _*))
          .reduce(_ || _))
    }

  /** Cardinality-based auto selection (reference heuristic): Bloom for
    * small sets (broadcast bitset, no shuffle), chunked-isin in the
    * middle band (literal IN-lists push into the source scan), the
    * distributed semi-join above the collect cap. */
  def auto(df: DataFrame, candidates: DataFrame, idCol: String): DataFrame = {
    val n = candidates.count()
    val method =
      if (n <= BloomMaxIds) Bloom
      else if (n <= IsinMaxIds) ChunkedIsin
      else SemiJoin
    apply(df, candidates, idCol, method)
  }
}
