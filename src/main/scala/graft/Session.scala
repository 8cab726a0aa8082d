package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's tuned defaults — the one place
  * that encodes how a graft session should be configured, for the
  * driver mains and for library users alike.
  *
  * - `local[N]` with shuffle partitions = N: on a single box, more
  *   shuffle partitions than cores only adds task overhead. On a real
  *   cluster, set shuffle partitions ≈ 2-3× total executor cores (or
  *   rely on AQE coalescing, which is on by default in Spark 4).
  * - UTC session timezone: every timestamp oracle comparison assumes
  *   it.
  * - `nanosAsLong`: some testdata generations write `events.ts` as
  *   parquet TIMESTAMP(NANOS), which Spark has no native type for
  *   (SPARK-40819); under this conf they read as long nanos and
  *   graft.io.Tables.normalizeTs truncates to micros (newer
  *   generations write plain micros, where the conf is inert).
  */
object Session {
  def cpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")

  def local(appName: String = "graft"): SparkSession = {
    val b = SparkSession.builder()
      .appName(appName)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
    // debugging hook: SPARK_GRAFT_EXTRA_CONF="k=v;k2=v2" overlays
    // session confs (e.g. toggling an optimizer rule for an A/B run)
    sys.env.get("SPARK_GRAFT_EXTRA_CONF").foreach(_.split(';')
      .filter(_.contains('=')).foreach { kv =>
        val Array(k, v) = kv.split("=", 2)
        b.config(k.trim, v.trim)
      })
    val s = b.getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
