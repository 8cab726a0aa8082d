package graft.expr

import graft.SparkSpec

/** The engine's custom expressions as SQL functions
  * ([[graft.plans.GraftExtensions]] `injectFunction`): the SQL
  * surface reaches the same codegen'd kernels the Column API uses. */
class SqlFunctionsSpec extends SparkSpec {

  test("dot_product: SQL call evaluates the fused kernel") {
    val d = spark.sql(
      "SELECT dot_product(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
      .head().getDouble(0)
    assert(d === 11.0)
    // mismatched lengths → null, the HOF-chain contract
    assert(spark.sql(
      "SELECT dot_product(array(1.0d), array(1.0d, 2.0d)) AS d")
      .head().isNullAt(0))
  }

  test("sorted_array_contains: SQL call binary-searches") {
    val r = spark.sql(
      """SELECT sorted_array_contains(array(1L, 3L, 5L), 3L) AS hit,
        |       sorted_array_contains(array(1L, 3L, 5L), 4L) AS miss
        |""".stripMargin).head()
    assert(r.getBoolean(0) && !r.getBoolean(1))
  }

  test("cuid: SQL call emits distinct keys of the asked length") {
    val rows = spark.sql(
      "SELECT cuid() AS a, cuid(16) AS b FROM range(50)")
      .collect()
    assert(rows.forall(r =>
      r.getString(0).length == 10 && r.getString(1).length == 16))
    assert(rows.map(_.getString(0)).distinct.length === 50)
    // the two call sites draw distinct seeds: streams never collide
    assert(rows.forall(r => !r.getString(1).startsWith(r.getString(0))))
  }

  test("arity misuse is loud") {
    intercept[Exception] {
      spark.sql("SELECT dot_product(array(1.0d))").collect()
    }
    intercept[Exception] {
      spark.sql("SELECT cuid('x')").collect()
    }
  }
}
