package graft

/** One-JVM plan sweep: dump every declared query's formatted physical
  * plan to a directory, so a round's plan audit (cartesian products,
  * BroadcastNestedLoopJoin, filters that missed the scan, unexpected
  * Exchanges) greps files instead of launching one JVM per query via
  * Smoke. Construction-time jobs (fixture builds, iterative loops)
  * run as they would for the real query; queries whose CONSTRUCTION
  * throws are recorded as `<name>.ERROR.txt` rather than aborting the
  * sweep.
  *
  * Usage: runMain graft.PlanAudit [sfDir] [outDir]
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val out = args.lift(1).getOrElse("/tmp/graft-plans")
    val spark = Session.local()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(out))
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (n, fn) =>
      try {
        val plan = fn(spark, dir).queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        java.nio.file.Files.write(
          java.nio.file.Paths.get(s"$out/$n.txt"), plan.getBytes("UTF-8"))
      } catch {
        case e: Throwable =>
          java.nio.file.Files.write(
            java.nio.file.Paths.get(s"$out/$n.ERROR.txt"),
            String.valueOf(e).getBytes("UTF-8"))
      }
    }
    println(s"PLANAUDIT wrote ${SparkEntry.queries.size} plans to $out")
    spark.stop()
  }
}
