package graft


/** Local smoke harness: drives the driver contract's t1 check
  * (`SparkEntry.entry` rows > 0) and optionally dumps the formatted
  * physical plan of one named query for scale review.
  *
  * Usage: runMain graft.Smoke [queryName] [sfDir]
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = Session.local()
    spark.sparkContext.setLogLevel("ERROR")
    args.headOption match {
      case Some(q) =>
        val dir = args.lift(1).getOrElse("/root/testdata/sf0.001")
        val df = SparkEntry.queries(q)(spark, dir)
        df.explain("formatted")
        println(s"SMOKE $q rows=${df.count()}")
      case None =>
        val df = SparkEntry.entry(spark)
        println(s"SMOKE entry rows=${df.count()}")
        df.show(3, truncate = false)
    }
    spark.stop()
  }
}
