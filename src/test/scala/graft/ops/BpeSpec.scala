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
