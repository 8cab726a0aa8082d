package graft.plans

import org.apache.spark.sql.SparkSessionExtensions

/** The engine's Catalyst extension point, registered via
  * `spark.sql.extensions=graft.plans.GraftExtensions` (set by
  * [[graft.Session]]; any externally-built session opts in with the
  * same one-line conf). Everything the engine can express with the
  * declarative DataFrame API stays declarative — these injections are
  * reserved for plan shapes the stock optimizer cannot reach:
  *
  *  - [[RangeBinJoin]] — band joins become binned equi-joins, so an
  *    inequality join the planner would run quadratic runs
  *    shuffle-bounded instead.
  *  - [[AutoFileSkip]] — filters over scans of analyzed manifested
  *    archives prune their file lists through the Bloom / zone-map
  *    sidecars at plan time, without the caller asking.
  *  - [[ManifestStatsRule]] — under CBO, scans of commit-stats
  *    archives carry the row counts / column stats their commits
  *    recorded, so selective dims flip to broadcast with no ANALYZE.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(extensions: SparkSessionExtensions): Unit = {
    extensions.injectOptimizerRule(_ => RangeBinJoin)
    extensions.injectOptimizerRule(session => AutoFileSkip(session))
    extensions.injectOptimizerRule(session => ManifestStatsRule(session))
  }
}
