package graft.index

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.storage.StorageLevel

/** p-stable LSH index (reference `lsh/LSHIndexGenerator.scala:64-70`,
  * `hashfunction/EuclideanHashFunction.scala:13-30`): `nTables` hash
  * tables, each an AND-combination of `nHashes` projections
  * `⌊(v·g + b)/w⌋`; a row is a candidate iff ANY table key matches the
  * query's key for that table (`LSHIndex.scala:53-78`).
  *
  * Projections are deterministic pseudo-random Gaussians (splitmix64 +
  * Box–Muller) so the index needs no fitted model; the bucket width `w`
  * is estimated from the mean pairwise distance of a sample (reference
  * radius heuristic `LSHIndexGenerator.scala:56-60`). Scan = explode
  * table keys once at build into `(id, table, key)` and semi-join the
  * query keys — O(matching buckets), no full scan of vectors.
  */
class LSHIndex(val tables: DataFrame, // (id, table, key)
               val projections: Array[Array[Array[Double]]], // [table][hash][dim]
               val offsets: Array[Array[Double]],
               val w: Double,
               val idCol: String,
               val probes: Int = 0) extends VectorIndex {

  override def indexType: String = "lsh"
  override def isExact: Boolean = false

  /** Distance must match the training distance family (reference
    * `LSHIndex.scala:85`) — Euclidean here. */
  override def conformsTo(distName: String): Boolean =
    graft.functions.Distances.isL2Family(distName)

  override def candidates(q: Seq[Double], k: Int, timesK: Int): DataFrame = {
    val keys = LSHKeysExpr.keys(q.toArray, projections, offsets, w)
    val nHashes = projections.head.length
    val deltas = LSHIndex.probeDeltas(nHashes, probes)
    val cond = keys.zipWithIndex.map { case (key, t) =>
      if (deltas.size == 1) col("table") === t && col("key") === key
      else col("table") === t && col("key").isin(deltas.map(key + _): _*)
    }.reduce(_ || _)
    tables.filter(cond).select(col(idCol)).distinct()
  }
}

object LSHIndex {

  /** Multi-probe key deltas: every per-hash bucket offset in
    * [-probes, probes], mapped into key space through the polynomial
    * packing (`key = Σ bucket_h · M^(nHashes-1-h)`). Probing the
    * neighbouring buckets of each table recovers the recall that would
    * otherwise need ~(2·probes+1)^nHashes× more tables — the classic
    * multi-probe LSH trade (query-side work for index size), which at
    * 100 TB means a 4× smaller table relation for equal recall. */
  private[index] def probeDeltas(nHashes: Int, probes: Int): Seq[Long] = {
    if (probes <= 0) return Seq(0L)
    val M = 1000003L // LSHKeysExpr packing base
    (0 until nHashes).foldLeft(Seq(0L)) { (acc, h) =>
      val scale = Iterator.fill(nHashes - 1 - h)(M).foldLeft(1L)(_ * _)
      for (d <- acc; off <- -probes to probes) yield d + off * scale
    }.distinct
  }

  def build(df: DataFrame, idCol: String, vecCol: String, nTables: Int = 16,
            nHashes: Int = 2, wOpt: Double = -1.0, sampleN: Int = 500,
            seed: Long = 42L, probes: Int = 0): LSHIndex = {
    val dims = df.select(size(col(vecCol))).head().getInt(0)
    val projections = Array.tabulate(nTables, nHashes, dims)((t, h, d) =>
      LSHKeysExpr.gaussian(seed + t * 7919L + h * 104729L + d))
    val offsets = Array.tabulate(nTables, nHashes)((t, h) =>
      LSHKeysExpr.uniform(seed + 31L * t + h))

    val w =
      if (wOpt > 0) wOpt
      else { // mean pairwise distance over a small sample
        val n = df.count()
        val s = (if (n <= sampleN) df
          else df.sample(withReplacement = false, sampleN.toDouble / n, seed))
          .select(col(vecCol).cast("array<double>")).collect()
          .map(_.getSeq[Double](0).toArray)
        val rnd = new scala.util.Random(seed)
        val pairs = (0 until math.min(1000, s.length * 4)).map { _ =>
          val a = s(rnd.nextInt(s.length))
          val b = s(rnd.nextInt(s.length))
          math.sqrt(ECPIndex.sqDist(a.toSeq, b))
        }
        math.max(1e-9, pairs.sum / pairs.size * 0.75)
      }

    val scaledOffsets = offsets.map(_.map(_ * w))
    val keyed = df.select(col(idCol),
        posexplode(Bridge.column(LSHKeysExpr(
          Bridge.expression(col(vecCol)), projections, scaledOffsets, w)))
          .as(Seq("table", "key")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    new LSHIndex(keyed, projections, scaledOffsets, w, idCol, probes)
  }
}

/** All table keys for one vector: key_t = polynomial combine of the
  * `nHashes` bucket indices of table t. Output `array<long>`. */
case class LSHKeysExpr(child: Expression, projections: Array[Array[Array[Double]]],
                       offsets: Array[Array[Double]], w: Double)
  extends UnaryExpression with VecArrayInput {

  override def checkInputDataTypes(): TypeCheckResult =
    checkVec(child, "lsh_keys", FloatType, DoubleType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "lsh_keys"

  private def isFloat = child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val fl = isFloat
    val vec = Array.tabulate(v.numElements())(i =>
      if (fl) v.getFloat(i).toDouble else v.getDouble(i))
    new GenericArrayData(LSHKeysExpr.keys(vec, projections, offsets, w))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val pRef = ctx.addReferenceObj("lshProj", projections, "double[][][]")
    val oRef = ctx.addReferenceObj("lshOff", offsets, "double[][]")
    val getter = if (isFloat) "getFloat" else "getDouble"
    // fresh names: two instances of this expression in one generated
    // method would otherwise redeclare `vec`/`i` (janino rejects it and
    // the whole projection falls back to the interpreted path)
    val vec = ctx.freshName("vec")
    val i = ctx.freshName("i")
    nullSafeCodeGen(ctx, ev, c =>
      s"""double[] $vec = new double[$c.numElements()];
         |for (int $i = 0; $i < $vec.length; $i++) $vec[$i] = (double) $c.$getter($i);
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.index.LSHKeysExpr.keys($vec, $pRef, $oRef, $w));""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object LSHKeysExpr {
  private def mix64(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }
  private def unit(seed: Long): Double =
    ((mix64(seed) >>> 11).toDouble / (1L << 53).toDouble)

  def gaussian(seed: Long): Double = {
    val u1 = math.max(unit(seed), 1e-12)
    val u2 = unit(seed + 0x5DEECE66DL)
    math.sqrt(-2.0 * math.log(u1)) * math.cos(2.0 * math.Pi * u2)
  }
  def uniform(seed: Long): Double = unit(seed)

  def keys(vec: Array[Double], projections: Array[Array[Array[Double]]],
           offsets: Array[Array[Double]], w: Double): Array[Long] = {
    val nTables = projections.length
    val out = new Array[Long](nTables)
    var t = 0
    while (t < nTables) {
      var key = 1125899906842597L
      var h = 0
      while (h < projections(t).length) {
        val proj = projections(t)(h)
        var dotv = 0.0
        var d = 0
        val nd = math.min(vec.length, proj.length)
        while (d < nd) { dotv += vec(d) * proj(d); d += 1 }
        val bucket = math.floor((dotv + offsets(t)(h)) / w).toLong
        key = key * 1000003L + bucket
        h += 1
      }
      out(t) = key
      t += 1
    }
    out
  }
}
