package graft.index

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Sharded navigable-small-world graph index — the graph-based ANN
  * family (Malkov et al., "Approximate nearest neighbor algorithm based
  * on navigable small world graphs", Inf. Systems 2014; the flat
  * single-layer core of HNSW, TPAMI 2020). 13th index type, beyond the
  * reference's inventory (reference `IndexTypes.scala` stops at the
  * hash/quantization/tree families).
  *
  * Spark-first shape: ONE graph per shard, shards assigned by
  * `id mod nShards`. Build and search are genuine per-partition
  * imperative logic (greedy beam walks over an adjacency list), so this
  * is the documented `mapPartitions`-tier exception: `groupByKey(shard)
  * .flatMapGroups` builds each shard's graph independently — no
  * cross-shard edges, no driver state, embarrassingly parallel across
  * executors. Search broadcasts the query in the task closure, beam-
  * walks every shard concurrently, and emits each shard's `ef` best ids;
  * the global top-k comes from the exact re-rank the planner always
  * runs over index candidates.
  *
  * Scale: this is the standard sharded-HNSW serving architecture. State
  * per task = one shard's `(vec, adjacency)` arrays — size it with
  * `nShards ≈ n / 1e6` at corpus scale (a 64-dim float shard of 1M
  * nodes ≈ 0.6 GB). The graph relation is narrow parquet
  * `(shard, id, vec, neighbors)`; a query touches every shard once —
  * latency is one beam walk, not a corpus scan, and the walk visits
  * O(ef·M·log n) nodes of the shard's n.
  *
  * Determinism (what makes the exact-oracle battery row possible):
  * insertion order is ascending id, beam and neighbor pruning order by
  * `(distance, id)`, shard assignment is `pmod(id)` — identical graphs
  * and identical candidate sets under any partitioning of the build
  * input. When `ef ≥ shard size` the walk degenerates to an exhaustive
  * shard scan, so small-scale candidate cover is provable while the
  * beam bound is what runs at corpus scale.
  */
class NSWIndex(val graph: DataFrame, // (shard, id, vec, neighbors)
               val nShards: Int, val m: Int, val ef: Int,
               val idCol: String) extends VectorIndex {

  override def indexType: String = "nsw"
  override def isExact: Boolean = false

  /** Graph edges were selected under L2. */
  override def conformsTo(distName: String): Boolean =
    graft.functions.Distances.isL2Family(distName)

  /** Per-shard beam width: `ef` IS the search beam (HNSW ef_search
    * semantics — the structural knob, tuned at build/config time),
    * floored only so the union across shards can still hold k rows. */
  private def beamWidth(k: Int): Int =
    math.max(ef, math.ceil(k.toDouble / math.max(1, nShards)).toInt)

  override def candidates(q: Seq[Double], k: Int, timesK: Int): DataFrame = {
    import graph.sparkSession.implicits._
    val qa = q.toArray
    val efq = beamWidth(k)
    val id = idCol
    graph.select(col("shard"), col("id"), col("vec"), col("neighbors"))
      .as[(Int, Long, Seq[Double], Seq[Long])]
      .groupByKey(_._1)
      .flatMapGroups { (_, rows) =>
        NSWIndex.searchShard(rows, qa, efq)
      }
      .toDF(id)
  }

  /** ONE pass over the graph relation running all Q beams per shard —
    * the multi-vector (MaxSim) path costs one job instead of Q. Each
    * shard's node array is materialized once and walked Q times;
    * per-query results are bit-identical to sequential [[candidates]]
    * (same beam, same entry, same tie order). */
  override def candidatesBatch(qs: Seq[Seq[Double]], k: Int,
                               timesK: Int): DataFrame = {
    require(qs.nonEmpty, "at least one query vector required")
    import graph.sparkSession.implicits._
    val qArr = qs.map(_.toArray)
    val efq = beamWidth(k)
    val id = idCol
    graph.select(col("shard"), col("id"), col("vec"), col("neighbors"))
      .as[(Int, Long, Seq[Double], Seq[Long])]
      .groupByKey(_._1)
      .flatMapGroups { (_, rows) =>
        val nodes = rows.toArray.sortBy(_._2)
        if (nodes.isEmpty) Iterator.empty
        else {
          val ids = nodes.map(_._2)
          val pos = ids.zipWithIndex.toMap
          val vecs = nodes.map(_._3.toArray)
          val adj = nodes.map(
            _._4.flatMap(pos.get).to(scala.collection.immutable.ArraySeq))
          qArr.iterator.zipWithIndex.flatMap { case (q, qi) =>
            NSWIndex.beam(vecs, adj(_), q, efq, nBuilt = nodes.length)
              .iterator.map(i => (qi, ids(i)))
          }
        }
      }
      .toDF("qid", id)
  }

  /** Recall diagnostic: fraction of `truth` ids inside the candidates. */
  def recallOf(q: Seq[Double], k: Int, truth: Seq[Long],
               timesK: Int = VectorIndex.TimesK): Double = {
    val cand = candidates(q, k, timesK).collect().map(_.getLong(0)).toSet
    truth.count(cand.contains).toDouble / truth.size
  }
}

object NSWIndex {

  private def sqDist(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { val d = a(i) - b(i); s += d * d; i += 1 }
    s
  }

  /** Beam search over one in-memory shard graph from the first node
    * (lowest id — the deterministic entry point). Returns the `ef` best
    * (distance, id)-ordered local indexes visited. */
  private[index] def beam(vecs: Array[Array[Double]],
                          adj: Int => scala.collection.IndexedSeq[Int],
                          q: Array[Double], ef: Int,
                          nBuilt: Int): Array[Int] = {
    // (dist, idx) ordering; candidates = min-heap, result = max-heap
    implicit val ord: Ordering[(Double, Int)] = Ordering.Tuple2(
      Ordering.Double.TotalOrdering, Ordering.Int)
    val visited = new java.util.BitSet(nBuilt)
    val cand = scala.collection.mutable.PriorityQueue.empty[(Double, Int)](ord.reverse)
    val best = scala.collection.mutable.PriorityQueue.empty[(Double, Int)](ord)
    val entry = 0
    val d0 = sqDist(vecs(entry), q)
    visited.set(entry)
    cand.enqueue((d0, entry))
    best.enqueue((d0, entry))
    while (cand.nonEmpty) {
      val (dc, c) = cand.dequeue()
      if (dc > best.head._1 && best.size >= ef) {
        cand.clear() // the closest open candidate is worse than the beam
      } else {
        val ns = adj(c)
        var i = 0
        while (i < ns.length) {
          val nb = ns(i)
          if (nb < nBuilt && !visited.get(nb)) {
            visited.set(nb)
            val dn = sqDist(vecs(nb), q)
            if (best.size < ef || dn < best.head._1 ||
                (dn == best.head._1 && nb < best.head._2)) {
              cand.enqueue((dn, nb))
              best.enqueue((dn, nb))
              if (best.size > ef) best.dequeue()
            }
          }
          i += 1
        }
      }
    }
    best.dequeueAll.map((e: (Double, Int)) => e._2).toArray
  }

  /** Sequential NSW construction for one shard: nodes in ascending-id
    * order; node i links to its `m` nearest among a beam search of the
    * graph built so far; edges are bidirectional, adjacency pruned to
    * `2m` closest (the HNSW `M_max` rule). */
  private[index] def buildShard(ids: Array[Long], vecs: Array[Array[Double]],
                                m: Int, efC: Int): Array[Array[Int]] = {
    val n = ids.length
    val adj = Array.fill(n)(scala.collection.mutable.ArrayBuffer.empty[Int])
    val mMax = 2 * m
    def prune(node: Int): Unit = {
      val a = adj(node)
      if (a.length > mMax) {
        val kept = a.toArray
          .map(nb => (sqDist(vecs(node), vecs(nb)), nb))
          .sortBy(identity)
          .take(mMax).map(_._2)
        a.clear()
        a ++= kept
      }
    }
    var i = 1
    while (i < n) {
      val found = beam(vecs, adj(_), vecs(i), efC, nBuilt = i)
      val nearest = found
        .map(nb => (sqDist(vecs(i), vecs(nb)), nb))
        .sortBy(identity)
        .take(m).map(_._2)
      nearest.foreach { nb =>
        adj(i) += nb
        adj(nb) += i
        prune(nb)
      }
      prune(i)
      i += 1
    }
    adj.map(_.toArray)
  }

  private[index] def searchShard(rows: Iterator[(Int, Long, Seq[Double], Seq[Long])],
                                 q: Array[Double], ef: Int): Iterator[Long] = {
    val nodes = rows.toArray.sortBy(_._2)
    if (nodes.isEmpty) return Iterator.empty
    val ids = nodes.map(_._2)
    val pos = ids.zipWithIndex.toMap
    val vecs = nodes.map(_._3.toArray)
    val adj = nodes.map(_._4.flatMap(pos.get).to(scala.collection.immutable.ArraySeq))
    beam(vecs, adj(_), q, ef, nBuilt = nodes.length).iterator.map(ids(_))
  }

  /** Build the sharded graph index. `nShards` sizes per-task state
    * (shard ≈ n/nShards nodes must fit one executor task); `m`/`efC`
    * are the NSW degree and construction beam. */
  def build(df: DataFrame, idCol: String, vecCol: String,
            nShards: Int = 4, m: Int = 8, efC: Int = 64,
            ef: Int = 128): NSWIndex = {
    val spark = df.sparkSession
    import spark.implicits._
    val graph = df
      .select(pmod(col(idCol), lit(nShards)).cast("int").as("shard"),
        col(idCol).cast("long").as("id"),
        col(vecCol).cast("array<double>").as("vec"))
      .as[(Int, Long, Seq[Double])]
      .groupByKey(_._1)
      .flatMapGroups { (shard, rows) =>
        val nodes = rows.toArray.sortBy(_._2)
        val ids = nodes.map(_._2)
        val vecs = nodes.map(_._3.toArray)
        val adj = buildShard(ids, vecs, m, efC)
        nodes.indices.iterator.map { i =>
          (shard, ids(i), nodes(i)._3, adj(i).map(ids(_)).toSeq)
        }
      }
      .toDF("shard", "id", "vec", "neighbors")
      .persist(StorageLevel.MEMORY_AND_DISK)
    graph.count()
    new NSWIndex(graph, nShards, m, ef, idCol)
  }

  /** Rehydrate from a persisted graph relation (IndexStore). */
  def fromSaved(graph: DataFrame, nShards: Int, m: Int, ef: Int,
                idCol: String): NSWIndex =
    new NSWIndex(graph, nShards, m, ef, idCol)
}
