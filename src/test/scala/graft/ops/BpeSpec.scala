package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Differential + planted verification for BPE merge learning.
  *
  * The DataFrame job is replayed by a deliberately DIFFERENT
  * in-memory implementation (per-word list recursion instead of
  * pair-key shuffles and regexp application) with the same two
  * conventions pinned: overlapping occurrences COUNT ("aaaa" holds
  * three (a,a) pairs) and merges apply leftmost NON-overlapping
  * ("aaaa" + (a,a) → "aa aa"). The learned sequence is deterministic
  * (exact integer counts, (count DESC, pair ASC) tie-break), so the
  * two implementations must agree exactly — the q_funnel property-
  * oracle discipline applied to an operator no SQL oracle can
  * express. */
class BpeSpec extends SparkSpec {

  import spark.implicits._

  /** Plain-Scala reference BPE over a (word → freq) map. */
  private def referenceBpe(vocab: Map[String, Long], rounds: Int)
      : Seq[(Int, String, String, String, Long)] = {
    var cur: Map[List[String], Long] = vocab.map { case (w, f) =>
      (w.map(_.toString).toList :+ "</w>") -> f
    }
    def applyMerge(syms: List[String], l: String,
                   r: String): List[String] = syms match {
      case a :: b :: rest if a == l && b == r =>
        (a + b) :: applyMerge(rest, l, r)
      case a :: rest => a :: applyMerge(rest, l, r)
      case Nil => Nil
    }
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(Int, String, String, String, Long)]
    var continue = true
    var round = 0
    while (round < rounds && continue) {
      val counts = scala.collection.mutable.Map
        .empty[(String, String), Long].withDefaultValue(0L)
      cur.foreach { case (syms, f) =>
        syms.zip(syms.tail).foreach(p => counts(p) += f)
      }
      if (counts.isEmpty || counts.values.max < 2) continue = false
      else {
        val ((l, r), n) = counts.toSeq
          .minBy { case ((a, b), c) => (-c, a, b) }
        out += ((round + 1, l, r, l + r, n))
        cur = cur.map { case (syms, f) => applyMerge(syms, l, r) -> f }
        round += 1
      }
    }
    out.toSeq
  }

  test("engine merge sequence equals the in-memory reference on the " +
    "real corpus (20 rounds)") {
    val wordFreq = graft.io.Tables.load(spark, sf, "documents")
      .select(explode(split(col("text"), " ")).as("w"))
      .where(length(col("w")) > 0)
      .groupBy("w").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val expected = referenceBpe(wordFreq, 20)
    val got = TextOps.bpeMerges(
      TextOps.bpeVocab(graft.io.Tables.load(spark, sf, "documents")), 20)
    assert(got == expected,
      s"merge sequences diverged:\nengine=$got\nreference=$expected")
    assert(got.size == 20, s"expected 20 merges, learned ${got.size}")
  }

  test("hand-computed merges on the classic Sennrich-style fixture") {
    // newest×6 + widest×3 share 'e s','es t','est </w>' with count 9 —
    // the canonical worked example; tie-breaks never fire here
    val vocab = Seq(
      ("l o w </w>", 5L), ("l o w e r </w>", 2L),
      ("n e w e s t </w>", 6L), ("w i d e s t </w>", 3L)
    ).toDF("word_syms", "freq")
    val got = TextOps.bpeMerges(vocab, 3)
    assert(got == Seq(
      (1, "e", "s", "es", 9L),
      (2, "es", "t", "est", 9L),
      (3, "est", "</w>", "est</w>", 9L)), s"got $got")
  }

  test("overlap rule: 'aaaa' counts 3 (a,a) pairs, merges leftmost " +
    "non-overlapping, then stops when nothing co-occurs twice") {
    val vocab = Seq(("a a a a </w>", 1L)).toDF("word_syms", "freq")
    val got = TextOps.bpeMerges(vocab, 10)
    // count 3 (overlaps counted), ONE merge learned; the follow-up
    // round sees (aa,aa)=1 and (aa,</w>)=1 → below the floor → stop
    assert(got == Seq((1, "a", "a", "aa", 3L)), s"got $got")
  }

  test("encode: per-word token counts equal the reference encoding, " +
    "and doc rollups are consistent") {
    val wordFreq = graft.io.Tables.load(spark, sf, "documents")
      .select(explode(split(col("text"), " ")).as("w"))
      .where(length(col("w")) > 0)
      .groupBy("w").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val merges = referenceBpe(wordFreq, 20)
    // reference encode: apply merges in rank order with the same
    // leftmost non-overlapping rule
    def encode(w: String): List[String] =
      merges.foldLeft(w.map(_.toString).toList :+ "</w>") {
        case (syms, (_, l, r, _, _)) =>
          def go(s: List[String]): List[String] = s match {
            case a :: b :: rest if a == l && b == r => (a + b) :: go(rest)
            case a :: rest => a :: go(rest)
            case Nil => Nil
          }
          go(syms)
      }
    val expectedTokens = wordFreq.keys.map(w => w -> encode(w).length).toMap
    // engine per-word counts via the same column path the query uses
    val engineTokens = spark.createDataFrame(
      wordFreq.keys.toSeq.map(Tuple1(_))).toDF("word")
      .withColumn("syms",
        concat(trim(regexp_replace(col("word"), "(.)", "$1 ")),
          lit(" </w>")))
      .select(col("word"), size(split(
        TextOps.bpeApply(col("syms"), merges), " ")).as("n"))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(engineTokens == expectedTokens,
      "column encode diverged from the reference encode")
    // the gated rollup: n_tokens per doc = Σ per-word counts, and the
    // word count matches a plain split
    val out = TextOps.qBpeEncode(spark, sf).collect()
    assert(out.nonEmpty)
    val docs = graft.io.Tables.load(spark, sf, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .collect().map(r => r.getLong(0) ->
        r.getSeq[String](1).filter(_.nonEmpty)).toMap
    out.foreach { r =>
      val ws = docs(r.getLong(0))
      assert(r.getLong(1) == ws.length, s"doc ${r.getLong(0)} word count")
      assert(r.getLong(2) == ws.map(expectedTokens).sum.toLong,
        s"doc ${r.getLong(0)} token rollup")
    }
  }

  test("size-adaptive execution: the in-driver small-vocab path and " +
    "the distributed loop learn the identical merge sequence (forced " +
    "through the cap override), including tie-break and stop rounds") {
    val vocab = Seq(
      ("l o w </w>", 5L), ("l o w e r </w>", 2L),
      ("n e w e s t </w>", 6L), ("w i d e s t </w>", 3L),
      ("a a a a </w>", 1L), ("b a </w>", 2L)
    ).toDF("word_syms", "freq")
    val drv = TextOps.bpeMerges(vocab, 10)
    val dist = TextOps.bpeMerges(vocab, 10, driverCap = 0)
    assert(drv == dist,
      s"paths diverged:\ndriver=$drv\ndistributed=$dist")
    assert(drv.nonEmpty)
  }

  test("q_bpe_merges is ranked and matches the reference at a second " +
    "SF (different word frequencies → different, equally-verified " +
    "sequence)") {
    val dir = "/root/testdata/sf0.01"
    val a = TextOps.qBpeMerges(spark, dir).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).toSeq
    assert(a.nonEmpty && a.map(_._1) == (1 to a.length))
    val wordFreq = graft.io.Tables.load(spark, dir, "documents")
      .select(explode(split(col("text"), " ")).as("w"))
      .where(length(col("w")) > 0)
      .groupBy("w").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(a == referenceBpe(wordFreq, 20),
      "engine diverged from the reference at sf0.01")
  }
}
