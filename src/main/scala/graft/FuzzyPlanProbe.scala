package graft

/** Dev harness: print the FINAL adaptive plan of editDistancePairs after
  * execution — shows whether AQE reused the neighborhood exchange.
  * `runMain graft.FuzzyPlanProbe <sfDir>` */
object FuzzyPlanProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.core.GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = graft.core.Tables.part(spark, sfDir).select("p_name").distinct()
    val pairs = graft.operators.FuzzyJoin.editDistancePairs(names, "p_name", "p_name", 2)
    val t0 = System.nanoTime()
    pairs.count()
    println(f"[fuzzyplan] count wall ${(System.nanoTime() - t0) / 1e9}%.3f s")
    val p = pairs.queryExecution.executedPlan.toString
    println(p.linesIterator.filter(l => l.contains("Exchange") || l.contains("Join") ||
      l.contains("Generate") || l.contains("Reused") || l.contains("AQEShuffleRead") ||
      l.contains("HashAggregate")).mkString("\n"))
    spark.stop()
  }
}
