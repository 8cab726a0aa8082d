package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.io.Tables

/** Salted rewrites must be bit-equivalent to their unsalted plans. */
class SkewSpec extends SparkSpec {

  private lazy val events = Tables.load(spark, sf, "events")

  test("saltedAgg(sum, count) equals plain groupBy-agg") {
    val plain = events.groupBy(col("event_type"))
      .agg(round(sum("value"), 4).as("total"), count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
      .toSet
    val salted = Skew.saltedAgg(events, Seq("event_type"), salts = 8,
      partials = Seq(
        "total" -> (sum("value"), (c: org.apache.spark.sql.Column) =>
          round(sum(c), 4)),
        "n" -> (count(lit(1)), (c: org.apache.spark.sql.Column) => sum(c))))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
      .toSet
    assert(salted == plain)
  }

  test("saltedJoin(left) equals plain left join, including unmatched rows") {
    val dims = spark.createDataFrame(Seq(
      ("click", 1), ("view", 2))).toDF("event_type", "weight")
    val plain = events.join(dims, Seq("event_type"), "left")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("weight").as("w"))
      .collect().map(r => (r.getString(0), r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Long]))).toSet
    val salted = Skew.saltedJoin(events, dims, "event_type", salts = 8,
        joinType = "left")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("weight").as("w"))
      .collect().map(r => (r.getString(0), r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Long]))).toSet
    assert(salted == plain)
  }

  test("q_skew_join (salted, shuffle-hash) equals the flat broadcast join") {
    val flat = {
      val dim = events.select(col("event_type")).distinct()
        .withColumn("type_weight", length(col("event_type")))
      events.join(dim, "event_type")
        .groupBy("event_type", "type_weight")
        .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total"))
        .collect()
        .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
        .toSet
    }
    val salted = ScaleOps.qSkewJoin(spark, sf).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(salted == flat)
  }

  test("salted join spreads a hot key over multiple partitions") {
    import spark.implicits._
    // one hot key: every row the same value
    val hot = (1 to 10000).map(_ => "hot").toDF("k")
    val dim = Seq(("hot", 1)).toDF("k", "v")
    val parts = Skew.saltedJoin(hot.repartition(8), dim, "k", salts = 8)
      .groupBy(spark_partition_id().as("pid")).count()
      .count()
    assert(parts > 1, s"hot key stayed on $parts partition(s)")
  }
}
