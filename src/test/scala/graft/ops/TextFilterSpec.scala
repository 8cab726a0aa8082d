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

  test("substring dup: planted shared spans produce exact run lengths " +
    "and untouched docs score zero") {
    import spark.implicits._
    // k = 6. doc 1 and doc 2 share one verbatim 8-token span (u* / v*
    // context tokens are all unique) → 3 duplicated window positions
    // each, max_dup_len exactly 8; doc 3 is fully unique → zero dup.
    val span = "s1 s2 s3 s4 s5 s6 s7 s8"
    val docs = Seq(
      (1L, s"u1 u2 u3 $span u4 u5 u6"),
      (2L, s"v1 v2 v3 v4 $span v5 v6"),
      (3L, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"),
    ).toDF("doc_id", "text")
    val out = TextOps.substringSignals(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    // doc 1: 14 tokens → 9 windows; windows fully inside the span:
    // 8 − 6 + 1 = 3 (boundary windows mix unique context, never match)
    assert(out(1L).getAs[Int]("n_windows") == 9)
    assert(out(1L).getAs[Int]("n_dup_pos") == 3)
    assert(out(1L).getAs[Int]("max_dup_len") == 8)
    assert(out(2L).getAs[Int]("n_dup_pos") == 3)
    assert(out(2L).getAs[Int]("max_dup_len") == 8)
    assert(out(3L).getAs[Int]("n_dup_pos") == 0)
    assert(out(3L).getAs[Int]("max_dup_len") == 0)
    assert(out(3L).getAs[Double]("dup_ratio") == 0.0)
  }

  test("substring dup: of two disjoint shared runs the LONGER one is " +
    "reported, and islands never bridge a gap") {
    import spark.implicits._
    // doc 1 shares a 6-token span AND a separate 7-token span with
    // doc 2, split by unique tokens → runs of 1 and 2 windows;
    // max_dup_len must report the 7-token one, not 6, and not a
    // bridged 1+2=3-window run (which would read 8)
    val a = "a1 a2 a3 a4 a5 a6"
    val b = "b1 b2 b3 b4 b5 b6 b7"
    val docs = Seq(
      (1L, s"u1 $a u2 u3 $b u4"),
      (2L, s"v1 v2 $a v3 $b v4 v5"),
    ).toDF("doc_id", "text")
    val out = TextOps.substringSignals(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[Int]("n_dup_pos") == 3) // 1 + 2 windows
    assert(out(1L).getAs[Int]("max_dup_len") == 7)
    assert(out(2L).getAs[Int]("max_dup_len") == 7)
  }

  test("containment: a snippet fully embedded in a long page scores " +
    "1.0 while its Jaccard stays under the symmetric keep bar") {
    import spark.implicits._
    val snippet = (1 to 30).map(i => f"s$i%02d").mkString(" ")
    val filler = (1 to 200).map(i => f"f$i%03d").mkString(" ")
    val dir = java.nio.file.Files
      .createTempDirectory("graft-contain").toString
    Seq(
      (1L, snippet, "en", "src0", snippet.length.toLong),
      (2L, s"$snippet $filler", "en", "src0",
        (snippet.length + filler.length + 1).toLong),
      (3L, (1 to 40).map(i => f"z$i%02d").mkString(" "), "en", "src0", 0L),
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = TextOps.qContainment(spark, dir).collect()
    assert(out.length == 1, "only the embedded pair may survive")
    val r = out.head
    assert(r.getLong(0) == 1L && r.getLong(1) == 2L)
    // every snippet shingle appears in the page → full containment
    assert(r.getAs[Double]("containment_ab") == 1.0)
    // ...while the symmetric metric sits far below the 0.2 keep bar
    assert(r.getAs[Double]("jaccard") < 0.2,
      "fixture must be the case Jaccard-only dedup misses")
    assert(r.getAs[Double]("containment_ba") < 0.2)
  }

  test("winnowing: a shared w+k-1 = 7-word run guarantees a shared " +
    "selected fingerprint; disjoint docs share none; the selection " +
    "covers every window") {
    import spark.implicits._
    val run = "s1 s2 s3 s4 s5 s6 s7" // exactly w + k − 1 words
    val docs = Seq(
      (1L, s"u01 u02 u03 u04 u05 $run u06 u07 u08 u09"),
      (2L, s"v01 v02 $run v03 v04 v05 v06 v07"),
      (3L, (1 to 20).map(i => f"x$i%02d").mkString(" ")),
    ).toDF("doc_id", "text")
    val sel = TextOps.winnowSelected(docs).collect()
      .groupBy(_.getLong(0))
    val fps = sel.view.mapValues(_.map(_.getAs[String]("wmin")).toSet).toMap
    // the winnowing guarantee (Schleimer et al. 2003, thm. in §2):
    // any ≥ w+k−1-word verbatim overlap shares a selected fingerprint
    assert((fps(1L) intersect fps(2L)).nonEmpty)
    // fully disjoint vocabularies can never share a fingerprint
    assert((fps(1L) intersect fps(3L)).isEmpty)
    assert((fps(2L) intersect fps(3L)).isEmpty)
    // cover bound: every w-window contributes a min, and a single
    // position's fingerprint can be the min of at most w windows →
    // ≥ ⌈n_windows / w⌉ distinct selections on a unique-token doc
    val nWin3 = sel(3L).length // one row per window by construction
    assert(nWin3 == 20 - 4 + 1 - 3, "window count on a 20-word doc")
    assert(fps(3L).size >= (nWin3 + 3) / 4)
    assert(fps(3L).size <= nWin3)
  }

  test("gopher rules: every rule fires on its planted violator and " +
    "boundary docs land exactly on the inclusive side") {
    import spark.implicits._
    def w(n: Int, len: Int, tag: String): Seq[String] =
      (1 to n).map(i => (tag + "%0" + (len - tag.length) + "d").format(i))
    val docs = Seq(
      // 1: 30 words, awl 119/30 ≈ 3.967, ttr 1, has "the" → all pass
      1L -> ("the" +: w(29, 4, "a")).mkString(" "),
      // 2: 29 words → word-count fails, everything else passes
      2L -> ("the" +: w(28, 4, "a")).mkString(" "),
      // 3: 91 words → word-count fails high side
      3L -> ("the" +: w(90, 4, "a")).mkString(" "),
      // 4: awl exactly 114/30 = 3.8 → inclusive-in
      4L -> (("the" +: w(24, 4, "a")) ++ w(5, 3, "b")).mkString(" "),
      // 5: one char shorter → 113/30 ≈ 3.767 → out
      5L -> (("the" +: w(23, 4, "a")) ++ w(6, 3, "b")).mkString(" "),
      // 6: awl exactly 165/30 = 5.5 → inclusive-in at the top
      6L -> (("the" +: w(17, 6, "c")) ++ w(12, 5, "d")).mkString(" "),
      // 7: one char longer → 166/30 ≈ 5.533 → out
      7L -> (("the" +: w(17, 6, "c")) ++ w(11, 5, "d") :+ "e00001")
        .mkString(" "),
      // 8: zero stopwords → stopword rule fails alone
      8L -> w(30, 4, "a").mkString(" "),
      // 9: 40 words, 18 distinct → ttr exactly 0.45 → inclusive-in
      9L -> (Seq.fill(23)("the") ++ w(17, 4, "a")).mkString(" "),
      // 10: 40 words, 17 distinct → ttr 0.425 → out
      10L -> (Seq.fill(24)("the") ++ w(16, 4, "a")).mkString(" "),
    ).toDF("doc_id", "text")
    val out = TextOps.gopherFlags(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    def flags(id: Long) = (
      out(id).getAs[Boolean]("pass_word_count"),
      out(id).getAs[Boolean]("pass_word_len"),
      out(id).getAs[Boolean]("pass_stopword"),
      out(id).getAs[Boolean]("pass_ttr"))
    assert(flags(1L) == (true, true, true, true))
    assert(out(1L).getAs[Boolean]("keep"))
    assert(flags(2L) == (false, true, true, true))
    assert(flags(3L) == (false, true, true, true))
    assert(out(4L).getAs[Double]("avg_word_len") == 3.8)
    assert(flags(4L) == (true, true, true, true))
    assert(flags(5L)._2 == false)
    assert(out(6L).getAs[Double]("avg_word_len") == 5.5)
    assert(flags(6L)._2 == true)
    assert(flags(7L)._2 == false)
    assert(flags(8L) == (true, true, false, true))
    assert(out(9L).getAs[Double]("ttr") == 0.45)
    assert(flags(9L)._4 == true)
    assert(flags(10L)._4 == false)
    assert(!out(10L).getAs[Boolean]("keep"))
  }
}
