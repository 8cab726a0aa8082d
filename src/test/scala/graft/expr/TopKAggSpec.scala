package graft.expr

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TopKAggSpec extends SparkSpec {

  test("heap top-k equals the windowed-rank formulation row for row") {
    val cols = Seq("l_returnflag", "l_orderkey", "l_linenumber",
      "l_extendedprice", "rn")
    val heap = graft.ops.Relational.qTopkHeap(spark, sf)
      .select(cols.head, cols.tail: _*).collect().map(_.toSeq).toSeq
    val window = graft.ops.Relational.qTopkPerGroup(spark, sf)
      .select(cols.head, cols.tail: _*).collect().map(_.toSeq).toSeq
    assert(heap == window)
  }

  test("ties resolve by (tie1 asc, tie2 asc); short groups emit all rows") {
    import spark.implicits._
    val df = Seq(
      // group a: 4 rows, two tied at score 5.0 -> tie1 then tie2 decide
      ("a", 5.0, 2L, 9L), ("a", 5.0, 2L, 1L), ("a", 7.0, 9L, 9L),
      ("a", 1.0, 1L, 1L),
      // group b: only 2 rows for k=3 -> both emitted, best first
      ("b", 2.0, 1L, 1L), ("b", 3.0, 1L, 1L)
    ).toDF("g", "score", "t1", "t2")
    val rows = df.groupBy(col("g"))
      .agg(TopKAgg.topK(3, col("score"), col("t1"), col("t2")).as("top"))
      .select(col("g"), posexplode(col("top")).as(Seq("pos", "r")))
      .select(col("g"), col("pos"), col("r.score"), col("r.tie1"),
        col("r.tie2"))
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getDouble(2), r.getLong(3),
        r.getLong(4)))
      .toList
    assert(rows == List(
      ("a", 0, 7.0, 9L, 9L),
      ("a", 1, 5.0, 2L, 1L), // tied score: smaller tie2 wins rank 1
      ("a", 2, 5.0, 2L, 9L),
      ("b", 0, 3.0, 1L, 1L),
      ("b", 1, 2.0, 1L, 1L)))
  }

  test("NaN scores rank greatest regardless of arrival order; " +
    "null-score rows are ignored (aggregate null semantics)") {
    import spark.implicits._
    val df = Seq[(String, java.lang.Double, Long, Long)](
      // NaN arrives LAST, after the buffer is already full at k=2 —
      // a primitive > comparison would drop it here
      ("a", 9.0, 1L, 1L), ("a", 8.0, 2L, 2L), ("a", Double.NaN, 3L, 3L),
      // null score is skipped, leaving a single-row group
      ("b", null, 1L, 1L), ("b", 4.0, 2L, 2L)
    ).toDF("g", "score", "t1", "t2")
    val rows = df.groupBy(col("g"))
      .agg(TopKAgg.topK(2, col("score"), col("t1"), col("t2")).as("top"))
      .select(col("g"), posexplode(col("top")).as(Seq("pos", "r")))
      .select(col("g"), col("pos"), col("r.score"), col("r.tie1"))
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getDouble(2), r.getLong(3)))
      .toList
    assert(rows.filter(_._1 == "a").map(r => (r._4, r._3.isNaN)) ==
      List((3L, true), (1L, false)), s"NaN must rank first: $rows")
    assert(rows.filter(_._1 == "b") == List(("b", 0, 4.0, 2L)))
  }

  test("serialize/deserialize round-trips and merge respects the bound") {
    val agg = TopKAgg(2, null, null, null)
    val a = agg.createAggregationBuffer()
    val b = agg.createAggregationBuffer()
    Seq((1.0, 1L, 1L), (3.0, 3L, 3L)).foreach(e =>
      a ++= Seq(e)) // build via serialize path below, not update (null exprs)
    a.sortInPlaceBy { case (s, t1, t2) => (-s, t1, t2) }
    Seq((2.0, 2L, 2L), (4.0, 4L, 4L)).foreach(e => b ++= Seq(e))
    b.sortInPlaceBy { case (s, t1, t2) => (-s, t1, t2) }
    val a2 = agg.deserialize(agg.serialize(a))
    assert(a2 == a)
    val merged = agg.merge(a2, b)
    assert(merged.toList == List((4.0, 4L, 4L), (3.0, 3L, 3L))) // k = 2
  }
}
