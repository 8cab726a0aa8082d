package graft.ops

import graft.SparkSpec

/** Repetition-filter invariants beyond the row-level oracle: internal
  * consistency of the counts, the threshold law for the keep flag, and
  * a planted worst-case showing the signal actually fires. */
class TextFilterSpec extends SparkSpec {

  test("repetition filter: counts are consistent and keep follows the " +
    "thresholds on every row") {
    val rows = TextOps.qRepetitionFilter(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_2grams")
      val d = r.getAs[Long]("n_distinct_2grams")
      val dup = r.getAs[Double]("dup_2gram_frac")
      val top = r.getAs[Double]("top_2gram_frac")
      assert(d >= 1 && d <= n, s"doc ${r.getLong(0)}: distinct $d of $n")
      assert(dup >= 0.0 && dup < 1.0, s"doc ${r.getLong(0)}: dup $dup")
      assert(top > 0.0, s"doc ${r.getLong(0)}: top $top")
      assert(r.getAs[Boolean]("keep") == (dup <= 0.35 && top <= 0.08),
        s"doc ${r.getLong(0)}: keep flag diverges from thresholds")
    }
    // the corpus must exercise BOTH verdicts or the filter is vacuous
    assert(rows.exists(_.getAs[Boolean]("keep")))
    assert(rows.exists(!_.getAs[Boolean]("keep")))
  }

  test("repetition filter: a pathological repeated-phrase doc scores " +
    "near-1 duplication and is dropped") {
    import spark.implicits._
    // 50× "lorem ipsum" → 99 2-grams, 2 distinct → dup ≈ 0.98,
    // top 2-gram ("ipsum lorem" × 49 or "lorem ipsum" × 50) owns
    // most of the chars → both signals fire
    val doc = Seq.fill(50)("lorem ipsum").mkString(" ")
    val dir = java.nio.file.Files
      .createTempDirectory("graft-rep").toString
    Seq((1L, doc, "en", "src0", doc.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = TextOps.qRepetitionFilter(spark, dir).collect().head
    assert(r.getAs[Double]("dup_2gram_frac") > 0.9)
    assert(r.getAs[Double]("top_2gram_frac") > 0.08)
    assert(!r.getAs[Boolean]("keep"))
  }
}
