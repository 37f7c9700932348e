package graft

import org.apache.spark.sql.functions._

import graft.api.{EntityOps, IndexOps, NnQuery, QueryOps}
import graft.core.{Entity, Tables}
import graft.operators._

/** Runnable end-to-end tour of the library against the bundled
  * testdata — the "a reference user could switch" walkthrough:
  * entity lifecycle → index build + kNN → training-data pipeline
  * (dedup, boilerplate strip, mixture sampling, packing) → temporal
  * joins → event analytics. Run:
  * `sbt "runMain graft.Demo /root/testdata/sf0.001 /tmp/graft-demo"`.
  * Prints one line per step; exits nonzero if any step misbehaves. */
object Demo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val base = args.lift(1).getOrElse(
      java.nio.file.Files.createTempDirectory("graft-demo").toString)
    val spark = graft.core.GraftSession.builder("local[4]", 8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def step(name: String)(cond: => Boolean): Unit = {
      val ok = cond
      println(f"[demo] $name%-46s ${if (ok) "ok" else "FAIL"}")
      if (!ok) sys.exit(1)
    }

    // leftovers from a previous failed run (sys.exit skips cleanup)
    // must not break the rerun
    Seq("demo_docs", "demo_vecs").filter(Entity.list(base).contains)
      .foreach(n => Entity.open(spark, base, n).drop())

    // 1. entity lifecycle with snapshot retention
    val e = EntityOps.create(spark, base, "demo_docs")
    e.retainVersions(2)
    e.insert(Tables.documents(spark, sfDir).limit(40))
    step("entity create + insert")(e.count() == 40)
    e.deleteWhere(col("doc_id") >= 35)
    step("delete keeps a readable snapshot")(
      e.count() == 35 && e.readVersion(e.versions.head).count() == 40)

    // 2. vectors: index build, persisted scan, exact rerank
    val emb = EntityOps.create(spark, base, "demo_vecs")
    emb.insert(Tables.embeddings(spark, sfDir))
    val idx = IndexOps.create("vaf", emb.read(), "vec_id", "embedding")
    emb.saveIndex("vaf_embedding", idx)
    val q = Tables.embeddings(spark, sfDir).filter(col("vec_id") === 0)
      .select("embedding").head().getSeq[Float](0).map(_.toDouble)
    val knn = QueryOps.index(emb.read(), "vec_id",
      emb.loadIndex("vaf_embedding").index, NnQuery("embedding", q, "euclidean", 5))
    step("VA-indexed kNN returns the query point first")(
      knn.select("vec_id").head().getLong(0) == 0L)

    // 3. the training-data pipeline, declaratively
    val packed = Pipeline.run(Tables.documents(spark, sfDir), "text", "doc_id", Seq(
      Pipeline.Stage("exact_dedup", Map.empty),
      Pipeline.Stage("strip_chunks", Map.empty),
      Pipeline.Stage("shuffle", Map("seed" -> "42")),
      Pipeline.Stage("pack", Map("budget" -> "512", "shards" -> "4"))))
    step("dedup -> strip -> shuffle -> pack pipeline")(packed.count() > 0)

    // 4. temporal joins over the events feed
    val ev = Tables.events(spark, sfDir)
    val asof = AsOfJoin.asOf(
      ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("p_id"), col("ts"), col("user_id")),
      ev.filter(col("event_type") === "click")
        .select(col("event_id").as("c_id"), col("ts"), col("user_id")),
      Seq("user_id"), "ts", "c_id", Seq("c_id"),
      toleranceMicros = Some(1800L * 1000000L))
    step("as-of attribution (one window, no join)")(asof.count() > 0)

    // 5. event analytics
    val funnel = EventAnalytics.funnel(ev, Seq("click", "view", "purchase"))
    step("funnel depths in one aggregation")(funnel.count() > 0)
    step("retention cohorts")(EventAnalytics.retention(ev).count() > 0)

    e.drop(); emb.drop()
    println("[demo] all steps ok")
    spark.stop()
  }
}
