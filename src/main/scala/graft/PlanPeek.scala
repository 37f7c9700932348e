package graft

/** Scratch diagnostic: print a query's executed plan before and after
  * execution (AQE final plan) — used while authoring Plans gates. */
object PlanPeek {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq else Seq("bigram_logppl")
    val spark = graft.core.GraftSession.builder("local[8]", 8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, sfDir)
      println(s"===== $n BEFORE execution =====")
      println(df.queryExecution.executedPlan.toString)
      val cnt = df.count()
      println(s"===== $n AFTER execution (rows=$cnt) =====")
      println(df.queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
