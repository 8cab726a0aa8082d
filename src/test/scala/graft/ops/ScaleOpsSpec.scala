package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Semantics of the scale-technique queries beyond what the DuckDB
  * oracle pins: upsert row classes and hash-sampling determinism. */
class ScaleOpsSpec extends SparkSpec {

  test("upsert merge: untouched, updated and inserted classes all present; " +
    "exactly one row per key; latest wins") {
    val rows = ScaleOps.qUpsertMerge(spark, sf)
      .select("o_orderkey", "o_totalprice", "src").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getString(2)))
    val byKey = rows.groupBy(_._1)
    byKey.foreach { case (k, grp) =>
      assert(grp.length == 1, s"key $k merged to ${grp.length} rows")
    }
    rows.foreach { case (k, _, src) =>
      // incoming (key % 2 == 0) must win over base; keys in neither
      // branch (key % 3 == 0 && odd) must be absent
      if (k % 2 == 0) assert(src == "update", s"key $k kept base over update")
      else {
        assert(k % 3 != 0, s"key $k should not exist in the merge")
        assert(src == "base")
      }
    }
    val srcs = rows.map(_._3).toSet
    assert(srcs == Set("base", "update"))
    // updated rows carry the re-priced value, not the base price
    val orig = graft.io.Tables.load(spark, sf, "orders")
      .select(col("o_orderkey"), col("o_totalprice"))
      .where(col("o_orderkey") % 2 === 0).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // every update row (sf0.001 is small) — a sorted-head sample would
    // always check the same smallest keys
    rows.filter(_._3 == "update").foreach { case (k, p, _) =>
      val expected = math.floor(orig(k) * 1.1 * 100 + 0.5) / 100
      assert(p == expected, s"key $k: $p != re-priced $expected")
    }
  }

  test("hash sampling is deterministic and lands near the 2/16 rate") {
    val a = ScaleOps.qSampleHash(spark, sf).collect().map(_.toSeq).toSeq
    val b = ScaleOps.qSampleHash(spark, sf).collect().map(_.toSeq).toSeq
    assert(a == b, "two runs of the hash sample differ")
    val sampled = a.map(_(1).asInstanceOf[Long]).sum.toDouble
    val total = graft.io.Tables.load(spark, sf, "lineitem").count().toDouble
    val rate = sampled / total
    assert(rate > 0.08 && rate < 0.17, s"sample rate $rate far from 2/16")
  }
}
