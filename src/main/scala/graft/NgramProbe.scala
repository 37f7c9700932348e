package graft

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.{Dedup, FuzzyJoin}

/** Dev harness: per-stage timing + executed-plan dump for the PPJoin
  * (`ngramJaccardPlan`) and FastSS (`editDistancePairs`) pipelines —
  * attributes the wall of the two slowest workload queries to their
  * internal stages so optimization targets the measured stage, not a
  * guess. `runMain graft.NgramProbe <sfDir> [cpus]` */
object NgramProbe {

  private def t[A](label: String)(body: => A): A = {
    val t0 = System.nanoTime()
    val r = body
    println(f"[probe] $label%-34s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = args.lift(1).getOrElse("32")
    val spark = graft.core.GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()

    // ---- ngram_jaccard_neardup ----
    val docs = Tables.documents(spark, sfDir)
    (1 to 2).foreach { round =>
      println(s"== ngram round $round ==")
      t("ngram full operator") {
        Dedup.ngramJaccardNearDupPairs(docs, "text", "doc_id", 0.5).count()
      }
    }
    // staged (replicates ngramJaccardPlan's internals)
    val sh = docs.select(col("doc_id").as("id"),
        graft.functions.HashSig.shingleHashes(
          graft.operators.Dedup.tokenHashes(col("text")), 3).as("sh"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    t("sh fill (persist + count)") { sh.count() }
    val posting = sh.select(col("id"), size(col("sh")).as("sz"), explode(col("sh")).as("s"))
    val freq = posting.groupBy("s").agg(count(lit(1)).as("df"))
    t("freq count") { freq.count() }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("id").orderBy(col("df").asc, col("s").asc)
    val prefix = posting.join(freq, "s")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= col("sz") - ceil(lit(0.5) * col("sz") - lit(1e-9)) + 1)
      .select("s", "id", "sz")
    t("prefix count") { prefix.count() }
    val cand = prefix.select(col("s"), col("id").as("id_a"), col("sz").as("sz_a"))
      .join(prefix.select(col("s"), col("id").as("id_b"), col("sz").as("sz_b")), Seq("s"))
      .filter(col("id_a") < col("id_b") &&
        least(col("sz_a"), col("sz_b")) >= lit(0.5) * greatest(col("sz_a"), col("sz_b")) - lit(1e-9))
      .select("id_a", "id_b").distinct()
    t("cand count") { cand.count() }
    val jac = size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
      size(array_union(col("sh_a"), col("sh_b"))).cast("double")
    val pairs = cand
      .join(sh.select(col("id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .join(sh.select(col("id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
      .withColumn("jaccard", jac)
      .filter(col("jaccard") >= 0.5)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))
    t("pairs count (verify)") { pairs.count() }
    println(pairs.queryExecution.executedPlan.toString.linesIterator.take(60).mkString("\n"))
    sh.unpersist()

    // ---- fuzzy_name_components / editDistancePairs ----
    val names = Tables.part(spark, sfDir).select("p_name").distinct()
    (1 to 2).foreach { round =>
      println(s"== fuzzy round $round ==")
      t("editDistancePairs(2) count") {
        FuzzyJoin.editDistancePairs(names, "p_name", "p_name", 2).count()
      }
    }
    (1 to 4).foreach { round =>
      t(s"fuzzy_name_components full $round") {
        SparkEntry.queries("fuzzy_name_components")(spark, sfDir).count()
      }
    }
    val pairsF = FuzzyJoin.editDistancePairs(names, "p_name", "p_name", 2)
    println(pairsF.queryExecution.executedPlan.toString.linesIterator.take(50).mkString("\n"))
    spark.stop()
  }
}
