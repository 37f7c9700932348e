package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL surface for the graft expression kernels: registers `vec_*`,
  * `minhash_sig`, `simhash`, `shingle_hashes`, and `densify` so they are
  * callable from `spark.sql(...)` and `selectExpr`.
  *
  * Two wiring paths:
  *  - config: `spark.sql.extensions=graft.functions.GraftExtensions`
  *    (build-time, cluster-wide);
  *  - runtime: `GraftFunctions.register(spark)` on a live session.
  */
object GraftFunctions {

  private def vecBuilder(kind: String): Seq[Expression] => Expression = {
    case Seq(a, b) => VectorDistanceExpr(a, b, kind)
    case args => throw new IllegalArgumentException(
      s"vec_$kind expects 2 arguments, got ${args.length}")
  }

  private def intArg(e: Expression, what: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(s"$what must be an int literal, got $other")
  }

  val builders: Seq[(String, Seq[Expression] => Expression)] =
    VectorKernel.All.toSeq.sorted.map(k => s"vec_$k" -> vecBuilder(k)) ++ Seq(
      "minhash_sig" -> {
        case Seq(th, n, nh) => MinHashSigExpr(th, intArg(n, "n"), intArg(nh, "numHashes"), 0)
        case args => throw new IllegalArgumentException(
          s"minhash_sig(tokenHashes, n, numHashes) expects 3 args, got ${args.length}")
      },
      "simhash" -> {
        case Seq(th) => SimHashExpr(th)
        case args => throw new IllegalArgumentException(
          s"simhash(tokenHashes) expects 1 arg, got ${args.length}")
      },
      "shingle_hashes" -> {
        case Seq(th, n) => ShingleHashesExpr(th, intArg(n, "n"))
        case args => throw new IllegalArgumentException(
          s"shingle_hashes(tokenHashes, n) expects 2 args, got ${args.length}")
      },
      "densify" -> {
        case Seq(sv) => DensifyExpr(sv)
        case args => throw new IllegalArgumentException(
          s"densify(sparseStruct) expects 1 arg, got ${args.length}")
      },
      "bounded_topk" -> {
        // cast here — raw SQL args may be int/float and the aggregate's
        // update() trusts double/long buffers
        case Seq(d, id, k) => BoundedTopK(
          org.apache.spark.sql.catalyst.expressions.Cast(d, org.apache.spark.sql.types.DoubleType),
          org.apache.spark.sql.catalyst.expressions.Cast(id, org.apache.spark.sql.types.LongType),
          intArg(k, "k"))
        case args => throw new IllegalArgumentException(
          s"bounded_topk(distance, id, k) expects 3 args, got ${args.length}")
      })

  /** Register into a live session's function registry. */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    builders.foreach { case (name, builder) =>
      registry.createOrReplaceTempFunction(name, builder, "scala_udf")
    }
  }
}

/** `spark.sql.extensions` entry point: the SQL function surface plus
  * the transparent kNN index-acceleration rule (a no-op until an index
  * is registered with [[graft.plans.KnnIndexRewrite]]). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.builders.foreach { case (name, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft.functions", name), builder))
    }
    ext.injectOptimizerRule(_ => graft.plans.KnnIndexRewrite)
  }
}
