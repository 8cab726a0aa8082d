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
    val overlay = sys.env.get("SPARK_GRAFT_EXTRA_CONF").toSeq
      .flatMap(_.split(';').filter(_.contains('=')).map { kv =>
        val Array(k, v) = kv.split("=", 2)
        k.trim -> v.trim
      })
    overlay.foreach { case (k, v) => b.config(k, v) }
    val s = b.getOrCreate()
    // getOrCreate applies MODIFIABLE confs to a pre-existing session
    // but silently drops STATIC ones (spark.sql.extensions, master,
    // …) — an A/B overlay or extension toggle that didn't take would
    // corrupt a bench comparison while looking like a clean run, so
    // verify every explicitly-requested key actually landed and fail
    // loudly when a pre-existing session swallowed one
    val wanted = overlay :+
      ("spark.sql.extensions" -> "graft.plans.GraftExtensions")
    val swallowed = swallowedConfs(s, wanted)
    if (swallowed.nonEmpty)
      throw new IllegalStateException(
        "a pre-existing SparkSession swallowed requested conf(s) " +
          swallowed.map { case (k, v) => s"$k=$v" }.mkString(", ") +
          " — static confs cannot be applied to a live session; stop " +
          "it (or run in a fresh JVM) before an A/B or extension " +
          "toggle, or the comparison silently measures the old conf")
    s.sparkContext.setLogLevel("WARN")
    // durable SQL catalog: when SPARK_GRAFT_REGISTRY names a
    // warehouse root, load its persisted live-SQL registrations so
    // this fresh JVM resolves the same names the registering session
    // did (graft.io.Tables.loadLiveSqlRegistry for the on-disk shape)
    sys.env.get("SPARK_GRAFT_REGISTRY")
      .foreach(r => graft.io.Tables.loadLiveSqlRegistry(s, r))
    s
  }

  /** The subset of `wanted` (key, value) pairs the session does NOT
    * carry — non-empty exactly when a pre-existing session swallowed
    * a static conf that a fresh session would have honored. */
  private[graft] def swallowedConfs(s: SparkSession,
      wanted: Seq[(String, String)]): Seq[(String, String)] =
    wanted.filter { case (k, v) =>
      !confCarries(k, s.conf.getOption(k), v) &&
        // runtime conf misses static SparkConf-only keys; check there
        !confCarries(k, s.sparkContext.getConf.getOption(k), v)
    }

  /** Does a session conf value honor the requested one?
    * `spark.sql.extensions` is a comma-separated LIST: a session
    * that carries ours alongside other extensions has honored the
    * request (the extensions are all active) — membership, not
    * whole-string equality. Every other key compares exactly. */
  private[graft] def confCarries(k: String, actual: Option[String],
      v: String): Boolean =
    if (k == "spark.sql.extensions")
      actual.exists(_.split(',').map(_.trim).contains(v))
    else actual.contains(v)
}
