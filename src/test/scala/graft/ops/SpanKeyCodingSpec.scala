package graft.ops

import graft.SparkSpec

/** Equality contract for the xxhash64-coded shuffle-key variants of
  * the span-dedup queries: coding changes the WIDTH of the key every
  * corpus-wide exchange moves (8-byte long vs ~40-byte window string
  * / 32-char md5 hex), never the result. Both coded variants also
  * hash-gate against their string anchors' DuckDB oracles in the
  * driver; this spec makes the same guarantee visible in-suite and
  * per-row (a collision-merged df count or a miscoded distinct would
  * diverge here first). The shuffle-byte DROP the coding buys is
  * pinned in [[ShuffleVolumeSpec]]. */
class SpanKeyCodingSpec extends SparkSpec {

  private def rowsOf(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
    df.collect().toSeq.map(_.toSeq)

  test("q_substring_dup_coded is row-for-row identical to the string " +
    "anchor") {
    val anchor = rowsOf(TextOps.qSubstringDup(spark, sf))
    val coded = rowsOf(TextOps.qSubstringDupCoded(spark, sf))
    assert(anchor.nonEmpty)
    assert(coded == anchor,
      "xxhash64 key coding must not change any span-duplication signal")
  }

  test("q_winnow_fingerprint_coded is row-for-row identical to the " +
    "string anchor") {
    val anchor = rowsOf(TextOps.qWinnowFingerprint(spark, sf))
    val coded = rowsOf(TextOps.qWinnowFingerprintCoded(spark, sf))
    assert(anchor.nonEmpty)
    assert(coded == anchor,
      "xxhash64 key coding must not change any fingerprint-sharing count")
  }
}
