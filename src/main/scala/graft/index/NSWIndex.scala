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
  * input. Reachability from the entry node is a build-time INVARIANT
  * ([[NSWIndex.ensureReachable]] repairs any node the 2m-closest prune
  * disconnected), so when `ef ≥ shard size` the walk PROVABLY
  * degenerates to an exhaustive shard scan — candidate cover at small
  * scale is a property, not fixture luck — while the beam bound is what
  * runs at corpus scale.
  */
class NSWIndex(val graph: DataFrame, // (shard, id, vec, neighbors)
               val nShards: Int, val m: Int, val ef: Int,
               val idCol: String,
               // opt-in recall knob for isotropic regimes: seed the beam
               // with this many deterministic entry nodes per shard
               // (spread over the ascending-id order) instead of one —
               // costs a few extra seed distances, buys escape routes out
               // of a poorly-linked entry neighborhood. 1 = classic NSW.
               val nProbes: Int = 1,
               // build-side twin of nProbes: this graph was built with
               // HNSW Algorithm-4 diverse selection (keep-pruned-
               // connections); carried so extend() keeps inserting the
               // same way. Search is unaffected by the flag itself.
               val heuristic: Boolean = false) extends VectorIndex {

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

  /** Serving-cache token: shard graphs deserialized on a task's first
    * query are kept JVM-resident under this key (per partition), so
    * repeat queries walk resident arrays instead of re-reading the
    * relation — the vector-DB serving pattern. A new token per index
    * instance (build/extend/load) is the invalidation. */
  private val cacheToken: String = java.util.UUID.randomUUID().toString

  /** Queries run as `mapPartitions` over the shard-partitioned cached
    * graph relation — NO exchange per query (the `groupByKey` form
    * shuffles the whole graph every call). A partition may carry more
    * than one shard (hash packing); each is walked independently, in
    * shard order, so results never depend on the packing. */
  private def walkAll(qArr: Array[Array[Double]], efq: Int)
  : Dataset[(Int, Long)] = {
    import graph.sparkSession.implicits._
    val token = cacheToken
    val probes = nProbes
    graph.select(col("shard"), col("id"), col("vec"), col("neighbors"))
      .as[(Int, Long, Seq[Double], Seq[Long])]
      .mapPartitions { it =>
        val shards = NSWIndex.residentShards(token, it)
        shards.iterator.flatMap { g =>
          val entries = NSWIndex.entryPoints(g.ids.length, probes)
          qArr.iterator.zipWithIndex.flatMap { case (q, qi) =>
            NSWIndex.beamMulti(g.vecs(_), g.adj(_), q, efq,
                nBuilt = g.ids.length, entries = entries)
              .iterator.map(i => (qi, g.ids(i)))
          }
        }
      }
  }

  override def candidates(q: Seq[Double], k: Int, timesK: Int): DataFrame = {
    import graph.sparkSession.implicits._
    walkAll(Array(q.toArray), beamWidth(k)).map(_._2).toDF(idCol)
  }

  /** ONE pass over the graph relation running all Q beams per shard —
    * the multi-vector (MaxSim) path costs one job instead of Q. Each
    * shard's node array is materialized once and walked Q times;
    * per-query results are bit-identical to sequential [[candidates]]
    * (same beam, same entry, same tie order). */
  override def candidatesBatch(qs: Seq[Seq[Double]], k: Int,
                               timesK: Int): DataFrame = {
    require(qs.nonEmpty, "at least one query vector required")
    walkAll(qs.map(_.toArray).toArray, beamWidth(k)).toDF("qid", idCol)
  }

  /** Eagerly drop this index's JVM-resident shard graphs in the calling
    * JVM (local mode: the only JVM). On remote executors no call
    * arrives, so resident entries are held SOFTLY — the GC reclaims a
    * superseded instance's graphs under memory pressure and the map
    * entries are swept on the next cache fill (see
    * [[NSWIndex.residentShards]]); a long-running serving process
    * therefore cannot leak one graph copy per build/extend/load. */
  def release(): Unit = NSWIndex.dropResident(cacheToken)

  /** Incrementally insert a batch of new vectors into the shard
    * graphs — the index-maintenance path for appended entity rows (the
    * alternative to a full rebuild on staleness). New nodes insert in
    * ascending-id order via the same beam/connect/prune routine the
    * builder uses, against each shard's EXISTING graph; ids already in
    * the index are dropped (idempotent re-appends). The extended graph
    * is deterministic given (existing graph, batch), though not
    * necessarily identical to a from-scratch build (insertion order
    * differs — standard incremental-HNSW behavior); degree caps and
    * search semantics are unchanged. One `flatMapGroups` pass, no
    * cross-shard traffic. */
  def extend(newDf: DataFrame, newIdCol: String, newVecCol: String): NSWIndex = {
    import graph.sparkSession.implicits._
    import org.apache.spark.sql.functions.typedLit
    val mC = m
    val efIns = ef
    val heur = heuristic
    val existing = graph.select(col("shard"), col("id"), col("vec"),
      col("neighbors"), lit(false).as("is_new"))
    val incoming = newDf.select(
      pmod(col(newIdCol), lit(nShards)).cast("int").as("shard"),
      col(newIdCol).cast("long").as("id"),
      col(newVecCol).cast("array<double>").as("vec"),
      typedLit(Seq.empty[Long]).as("neighbors"),
      lit(true).as("is_new"))
    val extended = existing.unionByName(incoming)
      .as[(Int, Long, Seq[Double], Seq[Long], Boolean)]
      .groupByKey(_._1)
      .flatMapGroups { (shard, it) =>
        val rows = it.toArray
        val old = rows.filter(!_._5).sortBy(_._2)
        val oldIds = old.map(_._2).toSet
        val fresh = rows.filter(_._5).filter(r => !oldIds.contains(r._2))
          .sortBy(_._2).distinctBy(_._2)
        val ids = scala.collection.mutable.ArrayBuffer.from(old.map(_._2))
        val pos = old.map(_._2).zipWithIndex.toMap
        val vecs = scala.collection.mutable.ArrayBuffer.from(
          old.map(_._3.toArray))
        val adj = scala.collection.mutable.ArrayBuffer.from(old.map(
          _._4.flatMap(pos.get).to(scala.collection.mutable.ArrayBuffer)))
        fresh.foreach { r =>
          NSWIndex.insertNode(vecs, adj, r._3.toArray, mC, efIns, heur)
          ids += r._2
        }
        // incremental inserts prune existing adjacencies too — re-assert
        // the reachability invariant over the extended shard
        if (fresh.nonEmpty) NSWIndex.ensureReachable(vecs, adj)
        ids.indices.iterator.map { i =>
          (shard, ids(i), vecs(i).toSeq, adj(i).map(ids(_)).toSeq)
        }
      }
      .toDF("shard", "id", "vec", "neighbors")
      .repartition(nShards, col("shard"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    extended.count()
    new NSWIndex(extended, nShards, m, ef, idCol, nProbes, heuristic)
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

  /** Deterministic multi-entry points for a shard of `n` built nodes:
    * local indexes spread evenly over the ascending-id order (entry 0
    * always included, so `nProbes = 1` is the classic single-entry
    * walk). Spreading by id — not by geometry — costs nothing and is
    * replay-identical under any partitioning. */
  private[graft] def entryPoints(n: Int, nProbes: Int): Array[Int] = {
    val p = math.max(1, math.min(nProbes, n))
    Array.tabulate(p)(j => (j.toLong * n / p).toInt).distinct
  }

  /** Multi-restart beam: one INDEPENDENT classic walk per entry node
    * (each with its own visited set and beam — a shared beam would
    * terminate later restarts instantly against the first walk's
    * results), merged to the `ef` best distinct local indexes. This is
    * the isotropic-regime recall knob: cost scales ~linearly with
    * `entries.length`, each restart buys an escape route out of a
    * poorly-linked entry neighborhood. `entries = [0]` IS [[beam]]. */
  private[graft] def beamMulti(vecs: Int => Array[Double],
                               adj: Int => scala.collection.IndexedSeq[Int],
                               q: Array[Double], ef: Int, nBuilt: Int,
                               entries: Array[Int]): Array[Int] = {
    if (entries.length == 1) return beam(vecs, adj, q, ef, nBuilt, entries(0))
    implicit val ord: Ordering[(Double, Int)] = Ordering.Tuple2(
      Ordering.Double.TotalOrdering, Ordering.Int)
    val merged = scala.collection.mutable.PriorityQueue.empty[(Double, Int)](ord)
    val seen = new java.util.BitSet(nBuilt)
    entries.foreach { e =>
      beam(vecs, adj, q, ef, nBuilt, e).foreach { i =>
        if (!seen.get(i)) {
          seen.set(i)
          merged.enqueue((sqDist(vecs(i), q), i))
          if (merged.size > ef) merged.dequeue()
        }
      }
    }
    merged.dequeueAll.map((e: (Double, Int)) => e._2).toArray
  }

  /** Beam search over one in-memory shard graph from a deterministic
    * entry node. Returns the `ef` best (distance, id)-ordered local
    * indexes visited. */
  private[graft] def beam(vecs: Int => Array[Double],
                          adj: Int => scala.collection.IndexedSeq[Int],
                          q: Array[Double], ef: Int,
                          nBuilt: Int,
                          entry: Int = 0): Array[Int] = {
    // (dist, idx) ordering; candidates = min-heap, result = max-heap
    implicit val ord: Ordering[(Double, Int)] = Ordering.Tuple2(
      Ordering.Double.TotalOrdering, Ordering.Int)
    val visited = new java.util.BitSet(nBuilt)
    val cand = scala.collection.mutable.PriorityQueue.empty[(Double, Int)](ord.reverse)
    val best = scala.collection.mutable.PriorityQueue.empty[(Double, Int)](ord)
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

  /** HNSW Algorithm-4 diverse neighbor selection with
    * keep-pruned-connections: scan candidates in ascending
    * `(distance, index)` order, keep `c` when it is closer to the base
    * point than to every already-kept neighbor (otherwise `c` is
    * "shadowed" — the graph can reach it THROUGH the kept one), then
    * back-fill remaining capacity with the closest shadowed candidates.
    * Keeping a shadowing survivor plus a long-range link instead of two
    * mutually-close neighbors is what preserves navigability on
    * isotropic data, where the plain closest-prune collapses every
    * adjacency into one tight angular cluster. Deterministic: candidate
    * order and the strict `<` test break ties identically everywhere. */
  private def selectDiverse(vecs: Int => Array[Double], base: Array[Double],
                            cands: Array[(Double, Int)],
                            limit: Int): Array[Int] = {
    val kept = scala.collection.mutable.ArrayBuffer.empty[Int]
    val shadowed = scala.collection.mutable.ArrayBuffer.empty[Int]
    cands.sortBy(identity).foreach { case (dc, c) =>
      if (kept.length < limit &&
          kept.forall(s => dc < sqDist(vecs(c), vecs(s)))) kept += c
      else shadowed += c
    }
    (kept ++ shadowed.take(limit - kept.length)).toArray
  }

  /** Insert one node into an in-construction shard graph: beam search
    * of the existing graph, connect to the `m` nearest found, edges
    * bidirectional, adjacency pruned to `2m` closest (the HNSW `M_max`
    * rule). With `heuristic = true` both the new node's links and the
    * overflow prune use [[selectDiverse]] (HNSW Algorithm 4 +
    * keep-pruned-connections) instead of plain closest — the build-side
    * recall lever for isotropic regimes (SCALING.md run 29 measures
    * it). Shared by the builder and incremental [[NSWIndex.extend]]. */
  private[index] def insertNode(
      vecs: scala.collection.mutable.ArrayBuffer[Array[Double]],
      adj: scala.collection.mutable.ArrayBuffer[scala.collection.mutable.ArrayBuffer[Int]],
      v: Array[Double], m: Int, efC: Int,
      heuristic: Boolean = false): Unit = {
    val i = vecs.length
    vecs += v
    adj += scala.collection.mutable.ArrayBuffer.empty[Int]
    if (i == 0) return
    val mMax = 2 * m
    def prune(node: Int): Unit = {
      val a = adj(node)
      if (a.length > mMax) {
        val pairs = a.toArray.map(nb => (sqDist(vecs(node), vecs(nb)), nb))
        val kept =
          if (heuristic) selectDiverse(vecs(_), vecs(node), pairs, mMax)
          else pairs.sortBy(identity).take(mMax).map(_._2)
        a.clear()
        a ++= kept
      }
    }
    val found = beam(vecs(_), adj(_), v, efC, nBuilt = i)
    val foundPairs = found.map(nb => (sqDist(v, vecs(nb)), nb))
    val nearest =
      if (heuristic) selectDiverse(vecs(_), v, foundPairs, m)
      else foundPairs.sortBy(identity).take(m).map(_._2)
    nearest.foreach { nb =>
      adj(i) += nb
      adj(nb) += i
      prune(nb)
    }
    prune(i)
  }

  /** Build-time connectivity REPAIR — what turns "empirically connected"
    * into an invariant: bidirectional insert + 2m-closest pruning can
    * strip a node of every IN-edge on the entry side (all its neighbors
    * pruned their edge back), leaving it unreachable from entry node 0
    * no matter how large `ef` is. A directed BFS from node 0 finds the
    * unreachable set; each unreachable node `u` (ascending local index)
    * gets ONE repair edge `nearestReachable → u`, after which `u`'s own
    * out-edges are BFS-absorbed (so a severed cluster costs one repair
    * edge, not one per node). Repair edges are deliberately exempt from
    * the degree cap — they exist precisely because the cap severed the
    * last in-path. Deterministic (ties break on the lower index); cost is
    * O(E) for the BFS plus O(U·n·d) for the U repairs, with U ~ 0 on
    * non-adversarial data. Returns the repair-edge count (diagnostic).
    *
    * This is what makes the documented guarantee — `ef ≥ shard size`
    * degenerates to an exhaustive shard scan — a PROVABLE property
    * rather than a fixture-connectivity accident: with every node
    * reachable and no beam pruning, the walk visits the whole shard. */
  private[graft] def ensureReachable(
      vecs: scala.collection.IndexedSeq[Array[Double]],
      adj: scala.collection.mutable.ArrayBuffer[scala.collection.mutable.ArrayBuffer[Int]]): Int = {
    val n = vecs.length
    if (n == 0) return 0
    val reach = new java.util.BitSet(n)
    val stack = new java.util.ArrayDeque[Integer]()
    def mark(start: Int): Unit = {
      reach.set(start)
      stack.push(start)
      while (!stack.isEmpty) {
        val c = stack.pop().intValue()
        val ns = adj(c)
        var i = 0
        while (i < ns.length) {
          val nb = ns(i)
          if (!reach.get(nb)) { reach.set(nb); stack.push(nb) }
          i += 1
        }
      }
    }
    mark(0)
    var repaired = 0
    var u = 0
    while (u < n) {
      if (!reach.get(u)) {
        var bestD = Double.PositiveInfinity
        var best = 0
        var r = 0
        while (r < n) {
          if (reach.get(r)) {
            val d = sqDist(vecs(r), vecs(u))
            if (d < bestD) { bestD = d; best = r }
          }
          r += 1
        }
        adj(best) += u
        repaired += 1
        mark(u)
      }
      u += 1
    }
    repaired
  }

  /** Sequential NSW construction for one shard: nodes in ascending-id
    * order through [[insertNode]], then connectivity repair. */
  private[index] def buildShard(ids: Array[Long], vecs: Array[Array[Double]],
                                m: Int, efC: Int,
                                heuristic: Boolean = false): Array[Array[Int]] = {
    val vb = scala.collection.mutable.ArrayBuffer.empty[Array[Double]]
    val ab = scala.collection.mutable.ArrayBuffer
      .empty[scala.collection.mutable.ArrayBuffer[Int]]
    vecs.foreach(v => insertNode(vb, ab, v, m, efC, heuristic))
    ensureReachable(vb, ab)
    ab.map(_.toArray).toArray
  }

  /** One shard's resident search structure. */
  private[index] final case class ShardGraph(ids: Array[Long],
                                             vecs: Array[Array[Double]],
                                             adj: Array[Array[Int]])

  /** (token, partitionId) → parsed shard graphs of that partition,
    * SOFTLY referenced: a long-running serving JVM that builds/extends/
    * loads many index instances mints a fresh token each time, and no
    * executor-side release() call exists — without soft references each
    * superseded instance would leak one deserialized graph copy per JVM
    * for the process lifetime. The GC reclaims unreferenced graphs under
    * memory pressure (oldest-referenced first per the soft-ref contract),
    * and [[sweepCleared]] prunes the emptied map entries so the key set
    * stays bounded too. A reclaimed entry is a cache MISS, not an error:
    * the next query re-parses the partition from the persisted relation. */
  private val resident = new java.util.concurrent.ConcurrentHashMap[
    String, java.lang.ref.SoftReference[Array[ShardGraph]]]()

  /** Drop map entries whose soft referent was GC-reclaimed. */
  private def sweepCleared(): Unit = {
    val it = resident.entrySet().iterator()
    while (it.hasNext) if (it.next().getValue.get() == null) it.remove()
  }

  private[index] def residentShards(
      token: String,
      it: Iterator[(Int, Long, Seq[Double], Seq[Long])]): Array[ShardGraph] = {
    val key = token + "#" + org.apache.spark.TaskContext.getPartitionId()
    val ref = resident.get(key)
    val hit = if (ref == null) null else ref.get()
    if (hit != null) hit // resident: skip deserializing the partition
    else {
      val parsed = it.toArray.groupBy(_._1).toArray.sortBy(_._1).map {
        case (_, rows) =>
          val nodes = rows.sortBy(_._2)
          val ids = nodes.map(_._2)
          val pos = ids.zipWithIndex.toMap
          ShardGraph(ids, nodes.map(_._3.toArray),
            nodes.map(_._4.flatMap(pos.get).toArray))
      }
      sweepCleared()
      resident.put(key, new java.lang.ref.SoftReference(parsed))
      parsed
    }
  }

  private[index] def dropResident(token: String): Unit = {
    val it = resident.keySet().iterator()
    while (it.hasNext) if (it.next().startsWith(token + "#")) it.remove()
    sweepCleared()
  }

  /** Resident-cache introspection for specs/diagnostics: live entry
    * count under a token (cleared refs not counted). */
  private[index] def residentCount(token: String): Int = {
    var n = 0
    val it = resident.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getKey.startsWith(token + "#") && e.getValue.get() != null) n += 1
    }
    n
  }

  /** Build the sharded graph index. `nShards` sizes per-task state
    * (shard ≈ n/nShards nodes must fit one executor task); `m`/`efC`
    * are the NSW degree and construction beam.
    *
    * `heuristic` (HNSW Algorithm-4 diverse selection +
    * keep-pruned-connections) defaults TRUE for new builds: SCALING.md
    * Run 29 measured it strictly better on isotropic data — recall
    * 0.79 vs 0.42 at identical build cost and ~2.4× faster walks, 0.99
    * under the `m=16, efC=128, ef=256` budget ladder — so it is what a
    * new user gets. Graphs persisted before the flag existed (or built
    * with `heuristic = false`) replay bit-identically: the flag is
    * stored with the index and [[fromSaved]] restores it, so only NEW
    * builds see the new default. */
  def build(df: DataFrame, idCol: String, vecCol: String,
            nShards: Int = 4, m: Int = 8, efC: Int = 64,
            ef: Int = 128, nProbes: Int = 1,
            heuristic: Boolean = true): NSWIndex = {
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
        val adj = buildShard(ids, vecs, m, efC, heuristic)
        nodes.indices.iterator.map { i =>
          (shard, ids(i), nodes(i)._3, adj(i).map(ids(_)).toSeq)
        }
      }
      .toDF("shard", "id", "vec", "neighbors")
      // shard-partitioned BEFORE the persist: queries then run as
      // mapPartitions over the cached relation — zero exchanges per
      // query (one partition may pack several shards; the walk handles
      // each independently)
      .repartition(nShards, col("shard"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    graph.count()
    new NSWIndex(graph, nShards, m, ef, idCol, nProbes, heuristic)
  }

  /** Rehydrate from a persisted graph relation (IndexStore). */
  def fromSaved(graph: DataFrame, nShards: Int, m: Int, ef: Int,
                idCol: String, nProbes: Int = 1,
                heuristic: Boolean = false): NSWIndex =
    new NSWIndex(graph.repartition(nShards, col("shard")), nShards, m, ef,
      idCol, nProbes, heuristic)
}
