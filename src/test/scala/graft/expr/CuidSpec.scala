package graft.expr

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CuidSpec extends SparkSpec {

  test("cuid format: 'c' + 9 base36 chars") {
    import spark.implicits._
    val ids = (1 to 100).toDF("i")
      .withColumn("id", Cuid.cuid()).select("id")
      .collect().map(_.getString(0))
    assert(ids.forall(_.matches("^c[0-9a-z]{9}$")))
  }

  test("cuid uniqueness across 100k rows and partitions") {
    val n = 100000
    val ids = spark.range(n).repartition(8)
      .withColumn("id", Cuid.cuid()).select("id")
    assert(ids.distinct().count() == n)
  }

  test("cuid survives dedup-then-keygen (one key per distinct row)") {
    import spark.implicits._
    val d = Seq("x", "x", "y", "y", "z").toDF("name")
      .dropDuplicates("name")
      .withColumn("id", Cuid.cuid())
    assert(d.count() == 3)
    assert(d.select("id").distinct().count() == 3)
  }
}
