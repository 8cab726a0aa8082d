package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

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
  *  - [[ResolveLiveArchives]] — SQL names registered as LIVE archive
  *    relations resolve to the archive's current manifest at analysis
  *    time, so `spark.sql` tracks commits without re-registration.
  *
  * The engine's custom expressions also register as SQL functions
  * (`dot_product`, `sorted_array_contains`, `cuid`), so the SQL
  * surface — live relations included — reaches the same codegen'd
  * kernels the Column API uses instead of falling back to HOF
  * chains or losing the capability entirely.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(extensions: SparkSessionExtensions): Unit = {
    extensions.injectOptimizerRule(_ => RangeBinJoin)
    extensions.injectOptimizerRule(session => AutoFileSkip(session))
    extensions.injectOptimizerRule(session => ManifestStatsRule(session))
    extensions.injectResolutionRule(session => ResolveLiveArchives(session))

    extensions.injectFunction((
      FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[graft.expr.DotProduct].getName,
        "dot_product"),
      (args: Seq[Expression]) => {
        if (args.size != 2) throw new IllegalArgumentException(
          "dot_product(a, b) takes exactly two ARRAY<DOUBLE> arguments")
        graft.expr.DotProduct(args(0), args(1))
      }))

    extensions.injectFunction((
      FunctionIdentifier("sorted_array_contains"),
      new ExpressionInfo(classOf[graft.expr.SortedArrayContains].getName,
        "sorted_array_contains"),
      (args: Seq[Expression]) => {
        if (args.size != 2) throw new IllegalArgumentException(
          "sorted_array_contains(arr, v) takes an ascending-sorted " +
            "ARRAY<BIGINT> and a BIGINT")
        graft.expr.SortedArrayContains(args(0), args(1))
      }))

    extensions.injectFunction((
      FunctionIdentifier("cuid"),
      new ExpressionInfo(classOf[graft.expr.Cuid].getName, "cuid"),
      (args: Seq[Expression]) => args match {
        // fresh seed per call site, exactly like the Column API —
        // a shared constant seed would emit identical key streams
        case Seq() => graft.expr.Cuid(10, scala.util.Random.nextLong())
        case Seq(Literal(n: Int, IntegerType)) =>
          graft.expr.Cuid(n, scala.util.Random.nextLong())
        case _ => throw new IllegalArgumentException(
          "cuid() or cuid(<int literal length>)")
      }))
  }
}
