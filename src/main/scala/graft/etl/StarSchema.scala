package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.Tables

/** The flagship query (SURVEY.md §7.2): the reference's fact build
  * (EP3, songs-etl `cf_transform/main.py:98-176`) re-phrased over the
  * driver's TPC-H-ish testdata.
  *
  * Operator chain mirrors the reference exactly:
  * scan ×5 → Deduplicate (D1) → Join ×4 left (C1/C2) → literal (B6) →
  * Project+cast (B4) — but as ONE lazy Catalyst plan instead of five
  * eagerly-materialized pandas steps.
  *
  * Scale notes (100 TB): lineitem is the fact side and stays
  * shuffle-partitioned; `part`/`supplier`/`customer`-sized dims are
  * broadcast (no shuffle for any join). The only shuffle in the whole
  * plan is the dedup's hash aggregate. orders–lineitem is the one
  * potentially large-large join: at warehouse scale both sides would be
  * bucketed by orderkey (see Tables.writeConformed sort layout); here
  * AQE picks sort-merge vs broadcast from runtime stats.
  */
object StarSchema {

  def factBuild(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(spark, dir, "lineitem")
      .dropDuplicates() // D1: full-row distinct, pre-join
    val ord = Tables.load(spark, dir, "orders")
    val cust = Tables.load(spark, dir, "customer")
    val part = Tables.load(spark, dir, "part")
    val supp = Tables.load(spark, dir, "supplier")

    li
      .join(ord, li("l_orderkey") === ord("o_orderkey"), "left")
      .join(broadcast(cust), ord("o_custkey") === cust("c_custkey"), "left")
      .join(broadcast(part), li("l_partkey") === part("p_partkey"), "left")
      .join(broadcast(supp), li("l_suppkey") === supp("s_suppkey"), "left")
      .select(
        lit("spark").as("dim_platform_id"), // B6: literal platform stamp
        col("l_orderkey"), col("l_linenumber"),
        col("o_custkey"), col("c_name"),
        col("p_name"), col("s_name"),
        col("l_quantity"), col("l_extendedprice"),
        // E2 analog: the fact's event-time column, emitted as DATE so
        // the DuckDB oracle compares canonically.
        col("l_shipdate").cast("date").as("ship_date"))
      // (l_orderkey, l_linenumber) is NOT unique in the synthetic data
      // (planted dupes feed the dedup path) — order over every
      // distinguishing output column for a deterministic total order.
      // asc_nulls_last on the left-join columns: Spark defaults to
      // NULLS FIRST ascending, DuckDB's oracle ORDER BY to NULLS
      // LAST — an orphan key would sort to opposite ends.
      .orderBy(col("l_orderkey"), col("l_linenumber"),
        col("p_name").asc_nulls_last, col("s_name").asc_nulls_last,
        col("l_quantity"), col("l_extendedprice"), col("ship_date"))
  }

  val factBuildOracle: String =
    """SELECT 'spark' AS dim_platform_id,
      |       l_orderkey, l_linenumber, o_custkey, c_name, p_name, s_name,
      |       l_quantity, l_extendedprice,
      |       CAST(l_shipdate AS DATE) AS ship_date
      |FROM (SELECT DISTINCT * FROM lineitem) l
      |LEFT JOIN orders   ON l_orderkey = o_orderkey
      |LEFT JOIN customer ON o_custkey  = c_custkey
      |LEFT JOIN part     ON l_partkey  = p_partkey
      |LEFT JOIN supplier ON l_suppkey  = s_suppkey
      |ORDER BY l_orderkey, l_linenumber, p_name, s_name,
      |         l_quantity, l_extendedprice, ship_date""".stripMargin

  /** Dimension build analog (EP2, songs-etl
    * `cf_create_artists_dimension/main.py:63-93`): scan → null-filter
    * (B3) → dedup on the natural key (D2, *intended* order: dedup
    * before keygen — see SURVEY.md §2.1 D4) → stable surrogate key.
    * Surrogate here is deterministic (dense_rank over natural key) so
    * the DuckDB oracle can check it; the nondeterministic cuid()
    * variant lives in graft.expr.Cuid and is exercised in tests.
    */
  def dimBuild(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    Tables.load(spark, dir, "part")
      .where(col("p_brand").isNotNull) // B3
      .select(col("p_brand").as("name"))
      .dropDuplicates("name") // D2 (intended semantics)
      // Unpartitioned window = single-partition execution, which is
      // intentional HERE ONLY: it runs on the post-dedup dimension
      // (~25 brands; dimensions stay KB-sized at any fact scale, the
      // premise the whole star schema rests on). Never rank an
      // unbounded table this way — for fact-sized data use
      // zipWithIndex-style (partition offsets + local rank).
      .withColumn("dim_id",
        dense_rank().over(Window.orderBy(col("name"))).cast("long"))
      .select(col("dim_id"), col("name"))
      .orderBy("dim_id")
  }

  val dimBuildOracle: String =
    """SELECT CAST(dense_rank() OVER (ORDER BY name) AS BIGINT) AS dim_id, name
      |FROM (SELECT DISTINCT p_brand AS name FROM part WHERE p_brand IS NOT NULL)
      |ORDER BY dim_id""".stripMargin
}
