package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, SubqueryAlias}
import org.apache.spark.sql.catalyst.rules.Rule

import graft.io.Tables

/** LIVE SQL relations over manifested archives.
  *
  * [[Tables.registerManifestedSql]] publishes a SNAPSHOT view — the
  * manifest resolved at registration, commits after it invisible
  * until re-registration. That is the right default for a dashboard,
  * but it leaves the SQL surface one step behind the API: every API
  * read ([[Tables.readManifested]]) resolves the CURRENT manifest per
  * query, while the SQL user must know to re-register. A live
  * registration closes that gap the Spark way: an analyzer
  * RESOLUTION rule (injected by [[GraftExtensions]]) substitutes a
  * registered name's `UnresolvedRelation` with the archive's
  * current-read plan AT ANALYSIS TIME, so `spark.sql("… FROM name")`
  * always answers from the latest committed manifest — still never a
  * half-landed commit (each query is one consistent snapshot; the
  * manifest CAS is the atomicity), just always the newest one.
  *
  * Because the substitution happens before optimization and splices
  * the very plan the API read produces, the whole optimizer surface
  * rides along unchanged: [[AutoFileSkip]] prunes files through the
  * sidecars, [[ManifestStatsRule]] attaches commit-time stats under
  * CBO, and a tombstone-masked registration serves the DV-consuming
  * live state ([[Tables.readManifestedMasked]]). A DSv2 catalog
  * would be the other route to always-current SQL, but its scans
  * plan as `DataSourceV2Relation` — OUTSIDE the file-source relation
  * shape every sidecar rule matches — so it would trade currency for
  * the engine's entire pruning/stats surface; the resolution rule
  * keeps both.
  *
  * Precedence: Spark's own `ResolveRelations` runs in the same
  * fixpoint, so a temp view or catalog table with the same name wins
  * and the live registration is shadowed (pinned in
  * LiveArchiveSpec). Names are matched case-insensitively,
  * single-part only. Registrations are session-scoped metadata —
  * zero data movement; per-query cost is one manifest-pointer
  * resolve (the file listing behind it is memoized per version by
  * the snapshot memo).
  */
object LiveArchives {

  /** One live registration: where the archive lives and how to read
    * it. `tombPath`/`keyCol` serve the tombstone-masked live state;
    * `asOf` pins a manifest version (reproducible-dashboard shape —
    * re-resolved per query, so it survives session cache clears and
    * keeps answering after further commits, unlike a snapshot view
    * it never advances). */
  final case class LiveReg(path: String, tombPath: Option[String],
      keyCol: Option[String], asOf: Option[Long])

  private val regs =
    new java.util.concurrent.ConcurrentHashMap[String, LiveReg]()

  private def key(spark: SparkSession, name: String): String =
    s"${System.identityHashCode(spark)}#${name.toLowerCase(java.util.Locale.ROOT)}"

  def register(spark: SparkSession, name: String, reg: LiveReg): Unit = {
    require(name.nonEmpty && !name.contains("."),
      s"live archive names are single-part, got '$name'")
    require(reg.tombPath.isDefined == reg.keyCol.isDefined,
      "tombPath and keyCol come together (both or neither)")
    require(reg.asOf.isEmpty || reg.tombPath.isEmpty,
      "asOf pins a physical snapshot — tombstone masking applies to " +
        "the live state only")
    regs.put(key(spark, name), reg)
  }

  def unregister(spark: SparkSession, name: String): Unit =
    regs.remove(key(spark, name))

  private[plans] def lookup(spark: SparkSession,
                            name: String): Option[LiveReg] =
    Option(regs.get(key(spark, name)))

  private[plans] def resolve(spark: SparkSession,
                             reg: LiveReg): LogicalPlan = {
    val df = (reg.asOf, reg.tombPath, reg.keyCol) match {
      case (Some(v), _, _) => Tables.readManifestedAt(spark, reg.path, v)
      case (_, Some(t), Some(k)) =>
        Tables.readManifestedMasked(spark, reg.path, t, k)
      case _ => Tables.readManifested(spark, reg.path)
    }
    df.queryExecution.analyzed
  }
}

/** The analyzer rule: a single-part relation name with a live
  * registration in THIS session resolves to the archive's
  * current-read plan. Runs at the end of the resolution fixpoint —
  * anything Spark's own resolution already claimed (temp views,
  * catalog tables) never reaches it. */
case class ResolveLiveArchives(session: SparkSession)
    extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsUp {
      case u: UnresolvedRelation if u.multipartIdentifier.size == 1 &&
          LiveArchives.lookup(session, u.multipartIdentifier.head)
            .isDefined =>
        val name = u.multipartIdentifier.head
        val reg = LiveArchives.lookup(session, name).get
        SubqueryAlias(name, LiveArchives.resolve(session, reg))
    }
}
