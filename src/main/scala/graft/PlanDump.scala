package graft

import java.nio.file.{Files, Paths}

/** Dump `.explain("formatted")` of named queries to files — the
  * before/after plan evidence for optimization rounds.
  * `runMain graft.PlanDump <sfDir> <outDir> <suffix> <query>...` writes
  * `<outDir>/<query>_<suffix>.txt` per query. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0); val outDir = args(1); val suffix = args(2)
    val names = args.drop(3)
    val spark = graft.core.GraftSession.builder("local[8]", 8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    names.foreach { n =>
      try {
        val df = SparkEntry.queries(n)(spark, sfDir)
        val formatted = org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        val txt = df.queryExecution.explainString(formatted)
        Files.writeString(Paths.get(s"$outDir/${n}_$suffix.txt"), txt)
        println(s"[plandump] wrote $n ($suffix)")
      } catch { case e: Throwable =>
        println(s"[plandump] $n FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
