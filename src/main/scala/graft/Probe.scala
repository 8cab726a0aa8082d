package graft

import org.apache.spark.sql._
import org.apache.spark.sql.functions._

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
      println(f"PROBE $name%-22s ${(System.nanoTime - t0) / 1e9}%8.2f s  rows=$n")
    }

    val docs = graft.io.Tables.load(spark, dir, "documents")
    def words(c: Column) = split(c, " ")
    val wordRows = docs.select(col("doc_id"),
      explode(array_distinct(words(col("text")))).as("word"))
      .withColumn("h", xxhash64(col("word")))
    tm("wordRows")(wordRows.count())
    val bitSums = (0 until 64).map(b =>
      sum(when(col("h").bitwiseAND(lit(1L << b)) =!= 0L, 1).otherwise(-1)).as(s"s_$b"))
    val sums = wordRows.groupBy(col("doc_id")).agg(bitSums.head, bitSums.tail: _*)
    tm("sums64")(sums.count())
    val sim = sums.select(col("doc_id"),
      (0 until 64).map(b => when(col(s"s_$b") > 0, lit(1L << b)).otherwise(0L))
        .reduce(_.bitwiseOR(_)).as("simhash"))
    tm("sim")(sim.count())
    val banded = sim.select(col("doc_id"), col("simhash"),
      explode(array((0 until 4).map(i => struct(lit(i).as("band"),
        col("simhash").bitwiseAND(lit(0xFFFFL << (16 * i))).as("bits"))): _*)).as("bb"))
      .select(col("doc_id"), col("simhash"), col("bb.band").as("band"),
        col("bb.bits").as("bits"))
    val joined = banded.alias("x").join(banded.alias("y"),
      col("x.band") === col("y.band") && col("x.bits") === col("y.bits") &&
        col("x.doc_id") < col("y.doc_id"))
    tm("band_join_raw")(joined.count())
    val dist = joined
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        col("x.simhash").as("sh_a"), col("y.simhash").as("sh_b"))
      .distinct()
    tm("after_distinct")(dist.count())
    tm("full")(graft.ops.TextOps.dedupSimhash(spark, dir).count())
    tm("full_again")(graft.ops.TextOps.dedupSimhash(spark, dir).count())
    spark.stop()
  }
}
