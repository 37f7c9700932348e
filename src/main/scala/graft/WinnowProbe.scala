package graft

import org.apache.spark.sql.functions._

import graft.core.Tables

/** Winnow overlap cost decomposition: where does the battery's slowest
  * query spend its time (kernel vs self-join), and what does the bucket
  * histogram look like — the input to choosing a `maxBucket` cap. Run:
  * `sbt "runMain graft.WinnowProbe /root/testdata/sf0.1"`; results
  * recorded in SCALING.md. */
object WinnowProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.core.GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val docs = Tables.documents(spark, d).select(col("doc_id"), col("text"))
    val base = docs.unionByName(docs.filter(col("doc_id") < 50)
      .select((col("doc_id") + 10000L).as("doc_id"),
        concat(lit("NEW PREFIX "), col("text")).as("text")))
    val rel = graft.operators.Winnow.hashRelation(base, "text", "doc_id", 8, 15)
      .persist()
    t("hash relation (kernel + distinct)")(rel.count())
    println("[probe] rel rows = " + rel.count())
    val hist = rel.groupBy("fp_hash").count()
      .select(when(col("count") <= 2, "<=2").when(col("count") <= 8, "3-8")
        .when(col("count") <= 64, "9-64").when(col("count") <= 512, "65-512")
        .otherwise(">512").as("bucket"), col("count"))
      .groupBy("bucket").agg(count(lit(1)).as("n_hashes"),
        sum(col("count") * col("count")).as("sum_sq"))
      .collect()
    hist.foreach(r => println(s"[probe] bucket ${r.getString(0)}: " +
      s"${r.getLong(1)} hashes, pair-work ${r.getLong(2)}"))
    def pairsOf(r: org.apache.spark.sql.DataFrame): Long =
      r.select(col("id").as("id_a"), col("fp_hash"))
        .join(r.select(col("id").as("id_b"), col("fp_hash")), Seq("fp_hash"))
        .filter(col("id_a") < col("id_b"))
        .groupBy("id_a", "id_b").agg(count(lit(1))).count()
    t("self-join, uncapped")(println("[probe] pairs = " + pairsOf(rel)))
    val capped = graft.operators.Dedup.capBuckets(rel, Seq("fp_hash"), 64)
      .persist()
    capped.count()
    t("self-join, maxBucket=64")(println("[probe] pairs = " + pairsOf(capped)))
    spark.stop()
  }
}
