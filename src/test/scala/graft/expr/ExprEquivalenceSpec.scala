package graft.expr

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.SparkSpec

/** The custom Catalyst pieces must be bit-equivalent to the built-in
  * formulations they replaced — checked over ScalaCheck-generated
  * inputs, interpreted AND codegen paths (collect runs codegen;
  * single-row eval exercises nullSafeEval). */
class ExprEquivalenceSpec extends SparkSpec {

  private val vecGen: Gen[Seq[Double]] =
    Gen.chooseNum(0, 16).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(-1e3, 1e3).map(x =>
        math.floor(x * 100) / 100)))

  test("DotProduct == aggregate(zip_with(a,b,*), 0, +) on random vectors") {
    import spark.implicits._
    // equal lengths: zip_with null-pads the shorter side (-> null
    // result), while DotProduct stops at the shorter — the engine
    // only ever dots same-dimension embeddings, where both agree
    val pairGen = vecGen.flatMap(a =>
      Gen.listOfN(a.length, Gen.chooseNum(-1e3, 1e3).map(x =>
        math.floor(x * 100) / 100)).map(b => (a, b)))
    val pairs = Gen.listOfN(60, pairGen).sample.get
    val df = pairs.toDF("a", "b")
      .select(
        VectorExprs.dotProduct(col("a"), col("b")).as("custom"),
        aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
          lit(0.0), (acc, v) => acc + v).as("builtin"))
    val rows = df.collect()
    rows.foreach { r =>
      val (c, b) = (r.getDouble(0), r.getDouble(1))
      assert(c == b, s"custom=$c builtin=$b") // bit equality, same order
    }
  }

  test("DotProduct: null array -> null; mismatched lengths -> null (like the HOF chain)") {
    import spark.implicits._
    val df = Seq(
      (Some(Seq(1.0, 2.0)), Option.empty[Seq[Double]]),
      (Some(Seq(1.0, 2.0, 5.0)), Some(Seq(3.0, 4.0))),
      (Some(Seq(1.0, 2.0)), Some(Seq(3.0, 4.0))),
    ).toDF("a", "b")
      .select(VectorExprs.dotProduct(col("a"), col("b")).as("d"))
    val rows = df.collect()
    assert(rows(0).isNullAt(0))
    assert(rows(1).isNullAt(0)) // a silent partial dot would be worse
    assert(rows(2).getDouble(0) == 11.0)
  }

  test("SimHashAgg == the 64-column sum(when) formulation on random hash groups") {
    import spark.implicits._
    val rowsGen = Gen.listOfN(300,
      Gen.zip(Gen.chooseNum(0L, 20L), Gen.long))
    val data = rowsGen.sample.get
    val df = data.toDF("g", "h")
    val custom = df.groupBy(col("g"))
      .agg(SimHashAgg.simhash(col("h")).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val bitSums = (0 until 64).map(b =>
      sum(when(col("h").bitwiseAND(lit(1L << b)) =!= 0L, 1).otherwise(-1))
        .as(s"s_$b"))
    val reference = df.groupBy(col("g"))
      .agg(bitSums.head, bitSums.tail: _*)
      .select(col("g"),
        (0 until 64).map(b =>
          when(col(s"s_$b") > 0, lit(1L << b)).otherwise(0L))
          .reduce(_.bitwiseOR(_)).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(custom == reference)
  }
}
