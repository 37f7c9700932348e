package graft.api

import scala.concurrent.ExecutionContext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

import graft.core.{Entity, Partitioning}
import graft.functions.Distances
import graft.index._
import graft.operators._
import graft.plans.{Planner, Progressive, ResultCache}

/** Programmatic API mirroring the reference's `communication/api` surface
  * (`EntityOp`, `IndexOp`, `QueryOp` — `QueryOp.scala:34-161`): a user of
  * ADAMpro's Scala API can switch to these entry points one-for-one.
  * gRPC transport is intentionally out of scope (SURVEY §7.1) — this is
  * the seam a thin server would wrap.
  */
object EntityOps {
  def create(spark: SparkSession, base: String, name: String): Entity =
    Entity.create(spark, base, name)
  def open(spark: SparkSession, base: String, name: String): Entity =
    Entity.open(spark, base, name)
  def exists(base: String, name: String): Boolean = Entity.exists(base, name)
  def list(base: String): Seq[String] = Entity.list(base)
  def insert(e: Entity, df: DataFrame): Entity = e.insert(df)
  def count(e: Entity): Long = e.count()
  def delete(e: Entity, predicate: Column): Long = e.deleteWhere(predicate)
  def vacuum(e: Entity, partitions: Int = 8): Entity = e.vacuum(partitions)
  def sparsify(e: Entity, vecCol: String): Entity = e.sparsify(vecCol)
  def drop(e: Entity): Unit = e.drop()
  def preview(e: Entity, k: Int = 100): DataFrame = Projections.preview(e.read(), k)
  def repartition(df: DataFrame, mode: Partitioning.Mode): DataFrame =
    Partitioning.repartition(df, mode)
}

object IndexOps {
  /** Every type name [[create]] accepts — the wire layer keys stored
    * index names as `<type>_<attribute>` and needs the exact list to
    * parse them back. */
  val knownTypes: Seq[String] =
    Seq("vaf", "vav", "vap", "ecp", "pq", "sh", "lsh", "mi", "ivfpq", "sq",
      "bsq", "opq", "nsw")

  /** Index factory by type name — reference `IndexTypes.scala:20-45`.
    * `options` carries per-type build parameters the way the reference's
    * `IndexMessage.options` feeds its generator factories (e.g.
    * `{"ntables": "8", "probes": "2"}` for lsh). Keys are lowercase;
    * an option the chosen type does not consume is an ERROR — a typo'd
    * tuning knob must not silently build a default index. */
  def create(indexType: String, df: DataFrame, idCol: String, vecCol: String,
             options: Map[String, String] = Map.empty): VectorIndex = {
    val opts = scala.collection.mutable.Map(options.map {
      case (k, v) => k.toLowerCase -> v }.toSeq: _*)
    def int(key: String, dflt: Int): Int = opts.remove(key).map(_.toInt).getOrElse(dflt)
    def dbl(key: String, dflt: Double): Double =
      opts.remove(key).map(_.toDouble).getOrElse(dflt)
    val idx = indexType.toLowerCase match {
      case "vaf" => VAIndex.buildFixed(df, idCol, vecCol,
        p = dbl("p", 2.0), bits = int("bits", -1))
      case "vav" => VAIndex.buildVariable(df, idCol, vecCol,
        p = dbl("p", 2.0), totalBits = int("totalbits", -1))
      case "vap" => VAIndex.buildPlus(df, idCol, vecCol)
      case "ecp" => ECPIndex.build(df, idCol, vecCol,
        maxLeaders = int("maxleaders", 200), assign = int("assign", 1))
      case "pq" => PQIndex.build(df, idCol, vecCol,
        nsq = int("nsq", 8), nCentroids = int("ncentroids", 16))
      case "sh" => SHIndex.build(df, idCol, vecCol, nBits = int("nbits", 32))
      case "lsh" => LSHIndex.build(df, idCol, vecCol, nTables = int("ntables", 16),
        nHashes = int("nhashes", 2), probes = int("probes", 0))
      case "mi" => MIIndex.build(df, idCol, vecCol,
        ki = int("ki", 10), ks = int("ks", 10))
      case "ivfpq" => IVFPQIndex.build(df, idCol, vecCol, nsq = int("nsq", 8),
        nCentroids = int("ncentroids", 16), assign = int("assign", 1))
      case "sq" => SQIndex.build(df, idCol, vecCol)
      case "bsq" => BSQIndex.build(df, idCol, vecCol)
      case "opq" => OPQIndex.build(df, idCol, vecCol, nsq = int("nsq", 8),
        nCentroids = int("ncentroids", 16), optIters = int("optiters", 6))
      case "nsw" => NSWIndex.build(df, idCol, vecCol,
        nShards = int("nshards", 4), m = int("m", 8),
        efC = int("efc", 64), ef = int("ef", 128),
        nProbes = int("nprobes", 1),
        // HNSW Algorithm-4 diverse selection + keep-pruned-connections —
        // DEFAULT ON for new builds (SCALING.md Run 29: strictly better
        // recall/speed on isotropic data); heuristic=0 opts back into
        // the plain closest-prune NSW. Persisted graphs are untouched:
        // the flag is stored with the index and restored on load.
        heuristic = int("heuristic", 1) != 0)
      case other => throw new IllegalArgumentException(s"unknown index type: $other")
    }
    require(opts.isEmpty,
      s"unknown options for $indexType: ${opts.keys.toSeq.sorted.mkString(", ")}")
    idx
  }

  /** The reference's 8 index types (`IndexTypes.scala:20-45`). */
  val referenceTypes: Seq[String] =
    Seq("vaf", "vav", "vap", "ecp", "pq", "sh", "lsh", "mi")

  /** Build every structure (reference `generateAllIndexes`). By default
    * the FULL family, including the beyond-reference ivfpq/sq — a user
    * asking for "all indexes" should get everything the planner can use;
    * `extended = false` pins the reference's 8. */
  def createAll(df: DataFrame, idCol: String, vecCol: String,
                extended: Boolean = true): Seq[VectorIndex] =
    (if (extended) knownTypes else referenceTypes).map(create(_, df, idCol, vecCol))

  // Persistence through the entity store (reference `Index.scala:442-471`)
  def save(e: Entity, name: String, idx: VectorIndex): Entity = e.saveIndex(name, idx)
  def load(e: Entity, name: String): IndexStore.Loaded = e.loadIndex(name)
  def list(e: Entity): Seq[String] = e.listIndexes
  def drop(e: Entity, name: String): Unit = e.dropIndex(name)

  /** The build-recipe keys [[refresh]] consumes next to the per-type
    * options: recorded by the wire handlers at create time. */
  val InfoType = "indextype"
  val InfoAttribute = "attribute"
  val InfoIdCol = "idcol"

  /** Rebuild a persisted index from its recorded build recipe — the
    * stale-index refresh path: after entity mutations flag an index
    * stale (reference `Index.scala:162-169`), one call rebuilds it over
    * the CURRENT data with its ORIGINAL type/attribute/options instead
    * of a silently different default configuration. */
  def refresh(e: Entity, name: String): String = {
    val info = e.indexBuildInfo(name)
    val tp = info.getOrElse(InfoType, throw new IllegalStateException(
      s"index $name has no recorded build recipe — drop and recreate it"))
    val attribute = info.getOrElse(InfoAttribute, throw new IllegalStateException(
      s"index $name records no attribute — drop and recreate it"))
    val idCol = info.getOrElse(InfoIdCol, Entity.ApId)
    // Incremental maintenance when it is provably sound: the graph index
    // can absorb appended rows in place, and "append-only since save"
    // is exactly "saved stamp has the same entity version" (delete /
    // vacuum / sparsify bump the version; inserts only move the count).
    // A negative saved count means the index was built mid-insert —
    // rebuild rather than reason about the pending window.
    val incremental = tp.toLowerCase == "nsw" &&
      e.indexSavedStamp(name).exists(s => s._1 == e.stamp._1 && s._2 >= 0)
    val idx =
      if (incremental) {
        val nsw = e.loadIndex(name).index.asInstanceOf[NSWIndex]
        val appended = e.read().join(
          nsw.graph.select(col("id").as(idCol)), Seq(idCol), "left_anti")
        nsw.extend(appended, idCol, attribute)
      } else {
        val opts = info - InfoType - InfoAttribute - InfoIdCol
        // a pre-r20 nsw recipe records no heuristic option (plain was
        // the build default then, and only EXPLICIT options persist) —
        // rebuild with the PERSISTED graph's own flag, never the
        // current default, so refresh keeps its "same configuration"
        // promise across default changes
        val pinned =
          if (tp.toLowerCase == "nsw" && !opts.contains("heuristic"))
            opts + ("heuristic" -> (if (e.loadIndex(name).index
              .asInstanceOf[NSWIndex].heuristic) "1" else "0"))
          else opts
        create(tp, e.read(), idCol, attribute, pinned)
      }
    e.saveIndex(name, idx, info)
    name
  }

  /** Refresh every stale index of the entity; returns refreshed names. */
  def refreshStale(e: Entity): Seq[String] =
    e.listIndexes.sorted.filter(n => e.loadIndex(n).stale).map(refresh(e, _))
}

/** Planner training + introspection (reference `QueryPlannerOp`). */
object PlannerOps {
  def train(spark: SparkSession, entity: DataFrame, idCol: String, vecCol: String,
            indexes: Seq[VectorIndex], distName: String = "euclidean",
            k: Int = 100, nQueries: Int = 3)
           (implicit ec: ExecutionContext): Int =
    Planner.train(spark, entity, idCol, vecCol, indexes, distName, k, nQueries)

  def scoredPaths(indexes: Seq[VectorIndex], distName: String): Seq[(String, Double)] =
    Planner.scoredPaths(indexes, distName)
}

final case class NnQuery(vecCol: String, q: Seq[Double], distName: String, k: Int,
                         weights: Option[Seq[Double]] = None)

object QueryOps {
  private val cache = new ResultCache()

  def distanceColumn(nnq: NnQuery): Column = distanceOn(col(nnq.vecCol), nnq)

  /** The dense distance expression over an arbitrary vector column. */
  private def distanceOn(v: Column, nnq: NnQuery): Column = {
    val q = Distances.vecLit(nnq.q)
    nnq.weights match {
      case None => Distances.byName(nnq.distName)(v, q)
      case Some(ws) =>
        val w = Distances.vecLit(ws)
        // every spelling resolves through the shared canonical-alias
        // table — the same resolution byName/conformsTo/sparseKind use
        Distances.canonical(nnq.distName) match {
          case "manhattan" => Distances.manhattanW(v, q, w)
          case "euclidean" => Distances.euclideanW(v, q, w)
          case "sqeuclidean" => Distances.sqEuclideanW(v, q, w)
          case "chebyshev" => Distances.chebyshevW(v, q, w)
          case "modulo" => Distances.moduloW(v, q, w)
          case "chisquared" => Distances.chiSquaredW(v, q, w)
          case "hamming" => Distances.hammingW(v, q, w)
          // reference parity: Jaccard warns-and-ignores weights, KL's
          // elementwise term never multiplies w — both resolve unweighted
          case "jaccard" | "kullbackleibler" => Distances.byName(nnq.distName)(v, q)
          case m if m.startsWith("minkowski-") && m.stripPrefix("minkowski-").toDoubleOption.isDefined =>
            Distances.minkowskiW(v, q, w, m.stripPrefix("minkowski-").toDouble)
          case other => throw new IllegalArgumentException(
            s"no weighted variant of distance '$other' — drop the weights or use a Minkowski-family distance")
        }
    }
  }

  /** Map a distance name onto the sparse kernel family (kind, p) —
    * ONLY for names [[Distances.byName]] resolves to the same metric,
    * so sparsifying an entity can never silently change what a query
    * computes (byName defaults unknown names to euclidean; those must
    * take the densify fallback and default identically). Similarities
    * (dot/cosinesim) are deliberately absent: kNN sorts ascending. */
  private def sparseKind(distName: String): Option[(String, Double)] =
    Distances.canonical(distName) match {
      case "manhattan" => Some((graft.functions.VectorKernel.Manhattan, 1.0))
      case "euclidean" => Some((graft.functions.VectorKernel.Euclidean, 2.0))
      case "sqeuclidean" => Some((graft.functions.VectorKernel.SqEuclidean, 2.0))
      case "cosine" => Some((graft.functions.VectorKernel.CosineDist, 2.0))
      case _ => None
    }

  /** Distance column adapted to the entity's physical vector encoding:
    * a SPARSIFIED entity (struct column) takes the O(nnz) sparse kernel
    * directly for decomposable distances; non-decomposable or weighted
    * queries densify per row; dense columns use [[distanceColumn]]. A
    * reference user who sparsified an entity keeps querying it through
    * the same endpoints. */
  def distanceColumnFor(entity: DataFrame, nnq: NnQuery): Column =
    entity.schema.find(_.name == nnq.vecCol).map(_.dataType) match {
      case Some(_: org.apache.spark.sql.types.StructType) =>
        sparseKind(nnq.distName) match {
          case Some((kind, p)) if nnq.weights.isEmpty =>
            graft.functions.SparseDistances.toQuery(kind, col(nnq.vecCol), nnq.q, p)
          case _ =>
            val dense = graft.functions.SparseVectors.densify(col(nnq.vecCol))
            distanceOn(dense, nnq)
        }
      case _ => distanceColumn(nnq)
    }

  /** Exact sequential kNN (reference `QueryOp.sequential`) — sparse or
    * dense vector encodings both served. */
  def sequential(entity: DataFrame, idCol: String, nnq: NnQuery): DataFrame =
    Knn.knn(entity, distanceColumnFor(entity, nnq), nnq.k, col(idCol))

  /** Scan a specific index with exact rerank (reference `QueryOp.index`).
    * Refuses a non-conforming distance family — e.g. L2-built VA bounds
    * over a Manhattan query would prune true neighbours and return
    * silently wrong results (reference `isQueryConform`). */
  def index(entity: DataFrame, idCol: String, idx: VectorIndex, nnq: NnQuery): DataFrame = {
    require(idx.conformsTo(nnq.distName),
      s"index ${idx.indexType} does not answer distance '${nnq.distName}' " +
        "— scan would be silently lossy; use a conforming index or the sequential plan")
    // indexes are built over dense vectors; refuse a sparsified entity
    // up front instead of failing deep in the kernel type check
    require(!entity.schema.find(_.name == nnq.vecCol)
        .exists(_.dataType.isInstanceOf[org.apache.spark.sql.types.StructType]),
      s"entity column '${nnq.vecCol}' is sparsified — stored indexes cover the dense " +
        "encoding; rebuild the index or use the sequential plan (sparse kernels)")
    nnq.weights match {
      case Some(ws) =>
        // most index structures prune with the UNWEIGHTED metric, so a
        // weighted rerank over their candidates can miss true weighted
        // neighbours — only an index whose bounds honor the weights
        // losslessly (VA with w ≥ 0) may serve the query
        require(idx.conformsToWeighted(nnq.distName, ws),
          s"index ${idx.indexType} cannot answer this weighted query " +
            "— candidate pruning uses the unweighted metric; use a VA index " +
            "with non-negative weights or the sequential plan")
        idx.knnW(entity, idCol, distanceColumn(nnq), nnq.q, ws, nnq.k)
      case None =>
        idx.knn(entity, idCol, distanceColumn(nnq), nnq.q, nnq.k)
    }
  }

  /** Choose the hint-walked plan for this entity. A SPARSIFIED entity
    * (struct vector column) restricts the walk to the sequential plan —
    * stored indexes cover the dense encoding, so an index plan would
    * fail deep in the kernel type check. */
  def choosePlan(entity: DataFrame, indexes: Seq[VectorIndex],
                 hints: Seq[Planner.Hint], nnq: NnQuery): Planner.Plan = {
    val sparse = entity.schema.find(_.name == nnq.vecCol)
      .exists(_.dataType.isInstanceOf[org.apache.spark.sql.types.StructType])
    // weighted queries plan only onto indexes whose candidate pruning
    // honors the weights losslessly (VA bounds scale per-dim by w); the
    // rest prune with the unweighted metric and are excluded — same
    // restriction shape as sparse entities
    val usable =
      if (sparse) Nil
      else nnq.weights match {
        case Some(ws) => indexes.filter(_.conformsToWeighted(nnq.distName, ws))
        case None => indexes
      }
    Planner.choose(hints, usable, nnq.distName)
  }

  /** Execute an already-chosen plan with encoding-aware distance
    * dispatch (sparse kernels for sparsified entities, like
    * [[sequential]]). */
  def runPlan(plan: Planner.Plan, entity: DataFrame, idCol: String,
              nnq: NnQuery): DataFrame =
    Planner.run(plan, entity, idCol, distanceColumnFor(entity, nnq), nnq.q, nnq.k,
      nnq.weights)

  /** Hint-planned kNN (reference `QueryOp.expression` + hint grammar). */
  def planned(entity: DataFrame, idCol: String, indexes: Seq[VectorIndex],
              hints: Seq[Planner.Hint], nnq: NnQuery): DataFrame =
    runPlan(choosePlan(entity, indexes, hints, nnq), entity, idCol, nnq)

  /** Boolean query (reference `QueryOp.booleanQuery`). */
  def booleanQuery(entity: DataFrame, predicates: Seq[BooleanPredicates.Predicate]): DataFrame =
    entity.filter(BooleanPredicates.conjunction(predicates))

  /** Full-text query dispatch — `mode`: all | any | phrase | bm25
    * (bm25 needs `idCol`). The capability the reference fronts through
    * Solr handler params on its external scan. */
  def text(entity: DataFrame, textCol: String, mode: String, terms: Seq[String],
           idCol: String = "", k: Int = 10): DataFrame = mode match {
    case "all" => TextSearch.matchAll(entity, textCol, terms)
    case "any" => TextSearch.matchAny(entity, textCol, terms)
    case "phrase" => TextSearch.phraseMatch(entity, textCol, terms)
    case "bm25" =>
      require(idCol.nonEmpty, "bm25 requires idCol")
      TextSearch.bm25TopK(entity, idCol, textCol, terms, k)
    case other => throw new IllegalArgumentException(s"unknown text mode: $other")
  }

  /** Filtered kNN — Boolean predicate + ranking combined. */
  def filteredKnn(entity: DataFrame, idCol: String,
                  predicates: Seq[BooleanPredicates.Predicate], nnq: NnQuery): DataFrame =
    Knn.knnFiltered(entity, BooleanPredicates.conjunction(predicates),
      distanceColumnFor(entity, nnq), nnq.k, col(idCol))

  /** All plans racing; observations as they land (reference
    * `QueryOp.parallel` / progressive). Optional hints restrict the
    * racing set (reference `QueryHintsParallelPathChooser`). */
  def parallel(spark: SparkSession, entity: DataFrame, idCol: String,
               indexes: Seq[VectorIndex], nnq: NnQuery,
               hints: Seq[Planner.Hint] = Nil, groupPrefix: String = "graft-")
              (onNext: Progressive.Observation => Unit = _ => ())
              (implicit ec: ExecutionContext): Seq[Progressive.Observation] =
    Progressive.parallel(spark, planSpecsFor(entity, idCol, indexes, nnq, hints),
      groupPrefix)(onNext)

  /** Best result by a deadline (reference `QueryOp.timedParallel`).
    * Hints restrict the racing set exactly as in [[parallel]]. */
  def timedParallel(spark: SparkSession, entity: DataFrame, idCol: String,
                    indexes: Seq[VectorIndex], nnq: NnQuery, deadlineMs: Long,
                    hints: Seq[Planner.Hint] = Nil)
                   (implicit ec: ExecutionContext): Progressive.Observation =
    Progressive.timed(spark, planSpecsFor(entity, idCol, indexes, nnq, hints), deadlineMs)

  /** Memoized execution keyed by a query fingerprint (reference
    * `CacheExpression`). */
  def cached(fingerprint: String)(compute: => DataFrame): DataFrame =
    cache.getOrElseCompute(fingerprint)(compute)

  private def planSpecs(entity: DataFrame, idCol: String, indexes: Seq[VectorIndex],
                        nnq: NnQuery): Seq[Progressive.PlanSpec] = {
    val seq = Progressive.PlanSpec("sequential", 1.0, () => sequential(entity, idCol, nnq))
    // weighted queries race only indexes whose candidate pruning honors
    // the weights losslessly (VA bounds scale per-dim by w ≥ 0): the
    // rest prune over the UNWEIGHTED metric, and a confidence-1.0
    // "exact" index plan would win the race with a silently wrong top-k
    val usable = nnq.weights match {
      case Some(ws) => indexes.filter(_.conformsToWeighted(nnq.distName, ws))
      case None => indexes.filter(_.conformsTo(nnq.distName))
    }
    seq +: usable.map(idx =>
      Progressive.PlanSpec(s"index:${idx.indexType}", idx.confidence,
        () => index(entity, idCol, idx, nnq)))
  }

  /** Restrict the racing plan set by hints — the reference's
    * `QueryHintsParallelPathChooser` next to the hint-less
    * `SimpleParallelPathChooser` (`DataQuery.scala:281-287`): each hint
    * contributes the plan it would choose; no hints = race everything. */
  def planSpecsFor(entity: DataFrame, idCol: String, indexes: Seq[VectorIndex],
                   nnq: NnQuery, hints: Seq[Planner.Hint]): Seq[Progressive.PlanSpec] = {
    val all = planSpecs(entity, idCol, indexes, nnq)
    if (hints.isEmpty) all
    else {
      val chosen = hints.map(h => Planner.choose(Seq(h), indexes, nnq.distName).describe).toSet
      val picked = all.filter(s => chosen.contains(s.description))
      // unreachable today (choose always yields a plan matching a spec
      // by construction) — but fall back to the EXPLICIT sequential
      // spec, not a positional head, if the invariant ever breaks
      if (picked.nonEmpty) picked
      else all.filter(_.description == "sequential")
    }
  }
}
