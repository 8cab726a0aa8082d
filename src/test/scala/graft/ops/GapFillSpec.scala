package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Planted-grid falsifiability spec for `q_gap_fill` (the hash gate is
  * differential vs DuckDB's independent LOCF, but these fixtures pin
  * the exact semantics: grid extent, gap flagging, forward-fill value
  * choice, and the (epoch_us, event_id) last-event tie-break that a
  * nondeterministic pick would break).
  */
class GapFillSpec extends SparkSpec {

  import spark.implicits._

  private val h = 3600L
  private val t0 = 1704067200L // 2024-01-01 00:00:00 UTC, hour-aligned

  private def ev(rows: Seq[(Long, Long, Long, Double)]) =
    rows.toDF("user_id", "sec", "event_id", "value")
      .withColumn("ts", timestamp_seconds(col("sec")))
      .select("user_id", "ts", "event_id", "value")

  test("gap fill: two-hour hole is flagged and carries the last " +
    "in-hour value, not the first") {
    // user 1: hour 0 has two events (LOCF must carry the LATER, 2.0),
    // hours 1-2 empty, hour 3 has one event
    val out = Functions.gapFillHourly(ev(Seq(
      (1L, t0 + 900, 1L, 1.0), (1L, t0 + 2700, 2L, 2.0),
      (1L, t0 + 3 * h + 300, 3L, 3.0)
    ))).orderBy("hour_start").collect()
    assert(out.length == 4, "grid spans first..last hour inclusive")
    assert(out.map(_.getAs[Long]("hour_start")).toSeq ==
      Seq(t0, t0 + h, t0 + 2 * h, t0 + 3 * h))
    assert(out.map(_.getAs[Long]("n_events")).toSeq == Seq(2L, 0L, 0L, 1L))
    assert(out.map(_.getAs[Boolean]("is_gap")).toSeq ==
      Seq(false, true, true, false))
    assert(out.map(_.getAs[Double]("filled_value")).toSeq ==
      Seq(2.0, 2.0, 2.0, 3.0))
  }

  test("gap fill: same-timestamp events tie-break on event_id — the " +
    "higher id wins the hour") {
    val out = Functions.gapFillHourly(ev(Seq(
      (2L, t0 + 100, 11L, 6.0), (2L, t0 + 100, 10L, 5.0)
    ))).collect()
    assert(out.length == 1)
    assert(out.head.getAs[Double]("filled_value") == 6.0)
    assert(!out.head.getAs[Boolean]("is_gap"))
  }

  test("gap fill matches an independent in-memory LOCF on random " +
    "event sets (differential oracle, not just planted cases)") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    // reference: per user, bucket by hour, walk the grid carrying the
    // last (sec, event_id)-max value — deliberately a different
    // algorithm (in-memory fold) from the window/join plan
    def reference(rows: List[(Long, Long, Long, Double)])
        : Map[(Long, Long), (Long, Boolean, Double)] =
      rows.groupBy(_._1).flatMap { case (u, evs) =>
        val byHour = evs.groupBy(_._2 / 3600)
        val h0 = byHour.keys.min; val h1 = byHour.keys.max
        var lastVal = 0.0
        (h0 to h1).map { h =>
          val in = byHour.getOrElse(h, Nil)
          if (in.nonEmpty) lastVal = in.maxBy(e => (e._2, e._3))._4
          (u, h * 3600L) -> (in.length.toLong, in.isEmpty, lastVal)
        }
      }
    val evGen: Gen[List[(Long, Long, Long)]] = Gen.listOfN(25,
      Gen.zip(Gen.choose(1L, 4L), Gen.choose(0L, 100000L),
        Gen.choose(0L, 99L)))
    (1 to 20).foreach { i =>
      val raw = evGen(Gen.Parameters.default, Seed(2000L + i)).get
      // unique event_ids via the index; values exact in binary (x/4)
      val rows = raw.zipWithIndex.map { case ((u, sec, v), id) =>
        (u, sec, id.toLong, v / 4.0)
      }
      val expected = reference(rows)
      val got = Functions.gapFillHourly(
        ev(rows.map(r => (r._1, r._2, r._3, r._4))))
        .collect().map(r =>
          (r.getLong(0), r.getAs[Long]("hour_start")) ->
            ((r.getAs[Long]("n_events"), r.getAs[Boolean]("is_gap"),
              r.getAs[Double]("filled_value")))).toMap
      assert(got == expected, s"case $i diverged from the reference")
    }
  }

  test("gap fill: users never bleed into each other's grids") {
    // user 3 spans 2 hours with a gapless grid; user 4 one hour —
    // a partition leak would extend 4's grid or fill from 3's values
    val out = Functions.gapFillHourly(ev(Seq(
      (3L, t0 + 100, 20L, 7.0), (3L, t0 + h + 100, 21L, 8.0),
      (4L, t0 + 100, 22L, 9.0)
    ))).collect().groupBy(_.getAs[Long]("user_id"))
    assert(out(3L).length == 2 && out(4L).length == 1)
    assert(out(4L).head.getAs[Double]("filled_value") == 9.0)
  }
}
