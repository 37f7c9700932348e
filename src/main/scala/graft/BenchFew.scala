package graft

/** Dev harness: time a SUBSET of SparkEntry.queries with the Bench
  * methodology (count() action, min of N runs, process-CPU recorded) —
  * for optimization iteration without paying the full battery.
  * `runMain graft.BenchFew <sfDir> <cpus> <runs> <query>...` */
object BenchFew {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = args(1).toInt
    val nRuns = args(2).toInt
    val names = args.drop(3)
    val spark = graft.core.GraftSession.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()
    try SparkEntry.warmIndexes(spark, sfDir) catch { case _: Throwable => () }
    try SparkEntry.warmLayouts(spark, sfDir) catch { case _: Throwable => () }
    try SparkEntry.warmCorpusIndexes(spark, sfDir) catch { case _: Throwable => () }
    def cpuNanos(): Long =
      java.lang.management.ManagementFactory.getOperatingSystemMXBean match {
        case os: com.sun.management.OperatingSystemMXBean => os.getProcessCpuTime
        case _ => -1L
      }
    names.foreach { name =>
      spark.sparkContext.setJobDescription(s"benchfew: $name")
      val times = (1 to nRuns).map { _ =>
        val c0 = cpuNanos(); val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, sfDir).count()
        ((System.nanoTime() - t0) / 1e9, (cpuNanos() - c0) / 1e9)
      }
      val best = times.minBy(_._1)
      println(f"[benchfew] $name%-28s min=${best._1}%7.3f cpu=${best._2}%7.3f " +
        s"runs=${times.map(t => f"${t._1}%.2f").mkString("[", ",", "]")}")
    }
    spark.stop()
  }
}
