package graft

import org.apache.spark.sql._

/** Scratch timing probe (not part of the driver contract). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")

    def tm(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime; val n = f
      println(f"PROBE $name%-26s ${(System.nanoTime - t0) / 1e9}%8.2f s  rows=$n")
    }

    (1 to 6).foreach { i =>
      tm(s"ngram_jaccard_$i")(
        graft.ops.TextOps.dedupNgramJaccard(spark, dir).count())
    }
    tm("etl_fact_1")(graft.etl.StarSchema.factBuild(spark, dir).count())
    tm("etl_fact_2")(graft.etl.StarSchema.factBuild(spark, dir).count())
    spark.stop()
  }
}
