package graft

/** Dev harness: per-query wall of plan materialization in the
  * plan_shapes audit, sequential — identifies which builders dominate
  * the gate. `runMain graft.PlanAuditProbe <sfDir>` */
object PlanAuditProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.core.GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()
    try SparkEntry.warmIndexes(spark, sfDir) catch { case _: Throwable => () }
    try SparkEntry.warmLayouts(spark, sfDir) catch { case _: Throwable => () }
    try SparkEntry.warmCorpusIndexes(spark, sfDir) catch { case _: Throwable => () }
    val names = Plans.auditPlanNames
    val timed = names.map { n =>
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, sfDir).queryExecution.executedPlan.toString
      n -> (System.nanoTime() - t0) / 1e9
    }
    timed.sortBy(-_._2).take(25).foreach { case (n, t) =>
      println(f"[auditprobe] $n%-34s $t%7.3f s") }
    println(f"[auditprobe] TOTAL sequential ${timed.map(_._2).sum}%.3f s")
    spark.stop()
  }
}
