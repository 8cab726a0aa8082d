package graft

import org.apache.spark.sql._
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

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
    def shingles(d: DataFrame): DataFrame = d
      .withColumn("ws", words(col("text")))
      .where(size(col("ws")) >= 3)
      .select(col("doc_id"),
        explode(transform(sequence(lit(0), size(col("ws")) - 3),
          i => concat_ws(" ",
            element_at(col("ws"), i + 1),
            element_at(col("ws"), i + 2),
            element_at(col("ws"), i + 3)))).as("shingle"))
      .distinct()

    def jacc(sh: DataFrame): DataFrame = {
      val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
      val a = sh.select(col("doc_id").as("doc_a"), col("shingle"))
      val b = sh.select(col("doc_id").as("doc_b"), col("shingle"))
      a.join(b, Seq("shingle"))
        .where(col("doc_a") < col("doc_b"))
        .groupBy(col("doc_a"), col("doc_b"))
        .agg(count(lit(1)).as("n_common"))
        .join(sizes.select(col("doc_id").as("doc_a"), col("n_sh").as("n_a")), Seq("doc_a"))
        .join(sizes.select(col("doc_id").as("doc_b"), col("n_sh").as("n_b")), Seq("doc_b"))
        .withColumn("jaccard", round(col("n_common")
          / (col("n_a") + col("n_b") - col("n_common")).cast("double"), 4))
        .where(col("jaccard") >= 0.2)
        .select(col("doc_a"), col("doc_b"), col("jaccard"))
        .orderBy("doc_a", "doc_b")
    }

    // warm
    tm("warm_asis")(jacc(shingles(docs)).count())
    tm("asis")(jacc(shingles(docs)).count())
    val persisted = shingles(docs).persist(StorageLevel.MEMORY_AND_DISK)
    tm("persisted_1st")(jacc(persisted).count())
    tm("persisted_2nd")(jacc(persisted).count())
    persisted.unpersist()
    spark.stop()
  }
}
