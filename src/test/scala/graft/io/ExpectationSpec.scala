package graft.io

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Ingest expectations ([[Tables.declareExpectations]] /
  * [[Tables.ingestExpected]]):
  *
  *  - the split is exact and a row failing SEVERAL rules carries all
  *    of them in its `_violations` list;
  *  - a NULL predicate result is a violation (unevaluable != met);
  *  - fail-mode aborts BEFORE anything is written;
  *  - replay of an epoch recommits identical rows on both stores —
  *    no duplication, no drift;
  *  - the rules are table policy: a second "session" (fresh read of
  *    the sidecar) enforces the same contract, and ingesting into an
  *    undeclared table is loud.
  */
class ExpectationSpec extends SparkSpec {

  private def mk(): (String, org.apache.spark.sql.DataFrame) = {
    import spark.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("graft-expect-s").toString
    val p = s"$root/arch"
    // k=0..99; v null for k%10==9
    val df = (0L until 100L)
      .map(i => (i, if (i % 10 == 9) None else Some(i * 2), s"g${i % 2}"))
      .toDF("k", "v", "g")
    Tables.declareExpectations(spark, p, Seq(
      "k_mod" -> "k % 4 <> 1",     // fails k=1,5,9,…
      "v_pos" -> "v >= 0"))        // NULL v → violation
    (p, df)
  }

  test("exact split, multi-rule violation lists, null = violation") {
    val (p, df) = mk()
    val rep = Tables.ingestExpected(
      df.withColumn("ingest_epoch", lit(0L)),
      p, Seq("ingest_epoch"), _ == "ingest_epoch=0", epoch = 0L)
    // violations: k%4==1 → 25 rows; v null → k%10==9 → 10 rows;
    // overlap k≡1 mod 4 AND k≡9 mod 10 → k≡9 mod 20 → 5 rows
    assert(rep.quarantined == 30L && rep.clean == 70L, s"$rep")
    assert(rep.byRule == Map("k_mod" -> 25L, "v_pos" -> 10L), s"$rep")
    val quar = Tables.readManifested(spark, s"${p}_quarantine")
    assert(quar.count() == 30L)
    assert(quar.where(size(col("_violations")) === 2).count() == 5L,
      "rows failing both rules must carry both names")
    val clean = Tables.readManifested(spark, p)
    assert(clean.count() == 70L &&
      clean.where(col("v").isNull).count() == 0L)
  }

  test("fail-mode aborts before any write; undeclared table is loud") {
    val (p, df) = mk()
    intercept[IllegalStateException] {
      Tables.ingestExpected(df.withColumn("ingest_epoch", lit(0L)),
        p, Seq("ingest_epoch"), _ == "ingest_epoch=0", epoch = 0L,
        failOnViolation = true)
    }
    assert(!Tables.manifestExists(spark, p),
      "fail-mode wrote the archive anyway")
    assert(!Tables.manifestExists(spark, s"${p}_quarantine"),
      "fail-mode wrote quarantine anyway")
    // a clean batch sails through fail-mode
    val rep = Tables.ingestExpected(
      df.where(col("k") % 4 =!= 1 && col("v").isNotNull)
        .withColumn("ingest_epoch", lit(0L)),
      p, Seq("ingest_epoch"), _ == "ingest_epoch=0", epoch = 0L,
      failOnViolation = true)
    assert(rep.quarantined == 0L && rep.version == 1L)

    val undeclared = java.nio.file.Files
      .createTempDirectory("graft-expect-u").toString + "/arch"
    val ex = intercept[IllegalArgumentException] {
      Tables.ingestExpected(df, undeclared, Seq("g"), _ => false, 0L)
    }
    assert(ex.getMessage.contains("declareExpectations"))
  }

  test("replay of an epoch recommits identical rows on both stores") {
    val (p, df) = mk()
    val batch = df.withColumn("ingest_epoch", lit(3L))
    val r1 = Tables.ingestExpected(batch, p, Seq("ingest_epoch"),
      _ == "ingest_epoch=3", epoch = 3L)
    val snapA = Tables.readManifested(spark, p)
      .orderBy("k").collect().toSeq
    val quarA = Tables.readManifested(spark, s"${p}_quarantine")
      .select("k").orderBy("k").collect().toSeq
    val r2 = Tables.ingestExpected(batch, p, Seq("ingest_epoch"),
      _ == "ingest_epoch=3", epoch = 3L)
    assert(r1.clean == r2.clean && r1.byRule == r2.byRule)
    assert(Tables.readManifested(spark, p)
      .orderBy("k").collect().toSeq == snapA,
      "replay changed the archive")
    assert(Tables.readManifested(spark, s"${p}_quarantine")
      .select("k").orderBy("k").collect().toSeq == quarA,
      "replay duplicated quarantine rows")
  }

  test("rules are table policy: read back from the sidecar in " +
    "declaration order; redeclare replaces") {
    val (p, _) = mk()
    assert(Tables.expectations(spark, p) ==
      Seq("k_mod" -> "k % 4 <> 1", "v_pos" -> "v >= 0"))
    Tables.declareExpectations(spark, p, Seq("only" -> "k < 1000"))
    assert(Tables.expectations(spark, p) == Seq("only" -> "k < 1000"))
    intercept[IllegalArgumentException] {
      Tables.declareExpectations(spark, p,
        Seq("dup" -> "k < 1", "dup" -> "k < 2"))
    }
  }
}
