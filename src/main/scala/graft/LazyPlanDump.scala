package graft

import java.nio.file.{Files, Paths}

/** Dev harness: dump the LAZY (pre-checkpoint) formatted plans of the
  * eagerly-materialized operators — the public query plans show only
  * `Scan ExistingRDD`, so the optimization evidence lives here.
  * `runMain graft.LazyPlanDump <sfDir> <outDir> <suffix>` */
object LazyPlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0); val outDir = args(1); val suffix = args(2)
    val spark = graft.core.GraftSession.builder("local[8]", 8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    val fmt = org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    val docs = graft.core.Tables.documents(spark, sfDir)
    val res = graft.operators.Dedup.ngramJaccardPlan(docs, "text", "doc_id", 0.5, 3)
    Files.writeString(Paths.get(s"$outDir/ngram_jaccard_lazy_$suffix.txt"),
      res._1.queryExecution.explainString(fmt))
    // release whichever cache shape this revision returns (works across
    // the r21 (DataFrame) and r22 (Seq[DataFrame]) signatures for A/B dumps)
    (res._2: Any) match {
      case s: Seq[_] => s.foreach {
        case d: org.apache.spark.sql.DataFrame => d.unpersist(); case _ => () }
      case d: org.apache.spark.sql.DataFrame => d.unpersist()
      case _ => ()
    }
    println(s"[lazydump] wrote ngram_jaccard_lazy_$suffix")
    spark.stop()
  }
}
