package graft.plans

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.QueryPlan
import org.apache.spark.sql.catalyst.plans.logical.{DeleteFromTable, Filter, InsertIntoStatement, LogicalPlan, SubqueryAlias}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.functions.col

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
  * current-read plan, and an INSERT over such a name becomes a
  * [[WriteArchiveCommand]] — the SQL write path onto the engine's
  * commit verbs. Runs at the end of the resolution fixpoint —
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

      // the INSERT target is an ARGUMENT of InsertIntoStatement, not
      // a child — tree traversals never descend into it (Spark's own
      // ResolveRelations handles it with an explicit case, and so
      // must this rule). Matching the STILL-UNRESOLVED relation also
      // settles precedence for free: a same-name temp view or
      // catalog table is resolved by Spark's rules earlier in the
      // batch, so this case only ever sees names nothing else
      // claimed — a write can never hijack past a shadow.
      case i @ InsertIntoStatement(u: UnresolvedRelation, partSpec,
          cols, q, overwrite, ifPartitionNotExists, byName)
          if u.multipartIdentifier.size == 1 && q.resolved &&
            LiveArchives.lookup(session, u.multipartIdentifier.head)
              .isDefined =>
        val name = u.multipartIdentifier.head
        val reg = LiveArchives.lookup(session, name).get
        if (partSpec.nonEmpty) throw new IllegalArgumentException(
          s"INSERT into live archive '$name': static PARTITION " +
            "specs are not supported — partition values come from " +
            "the rows (dynamic), like every engine commit verb")
        if (ifPartitionNotExists) throw new IllegalArgumentException(
          s"INSERT into live archive '$name': IF NOT EXISTS has no " +
            "manifested-commit equivalent")
        if (reg.asOf.isDefined) throw new IllegalArgumentException(
          s"live archive '$name' is pinned asOf v${reg.asOf.get} — " +
            "a pinned snapshot is read-only")
        WriteArchiveCommand(name, reg.path, cols, q, overwrite, byName)

      // DELETE FROM <live name> WHERE … — the SQL face of the RTBF
      // lifecycle. The table IS a child of DeleteFromTable, so by
      // this point the read case has substituted it; the temp-view
      // check keeps a shadowing view's DELETE on Spark's own error
      // path (a view resolves to the same SubqueryAlias-by-name
      // shape, and a write must never hijack past a shadow).
      case DeleteFromTable(a: SubqueryAlias, cond)
          if a.identifier.qualifier.isEmpty && cond.resolved &&
            a.child.resolved &&
            LiveArchives.lookup(session, a.identifier.name).isDefined &&
            session.sessionState.catalog
              .getTempView(a.identifier.name).isEmpty &&
            session.sessionState.catalog
              .getGlobalTempView(a.identifier.name).isEmpty =>
        val name = a.identifier.name
        val reg = LiveArchives.lookup(session, name).get
        if (reg.asOf.isDefined) throw new IllegalArgumentException(
          s"live archive '$name' is pinned asOf v${reg.asOf.get} — " +
            "a pinned snapshot is read-only")
        if (reg.tombPath.isEmpty || reg.keyCol.isEmpty)
          throw new IllegalArgumentException(
            s"live archive '$name' was registered without " +
              "tombPath/keyCol — DELETE needs the tombstone store " +
              "and the row-identity column; re-register with both")
        DeleteArchiveCommand(name, reg.path, reg.tombPath.get,
          reg.keyCol.get, cond, a.child)
    }
}

/** `INSERT INTO <live archive>` → the FAST-APPEND commit
  * ([[Tables.appendManifested]] — bytes landed are the inserted
  * rows'); `INSERT OVERWRITE` → dynamic partition overwrite
  * ([[Tables.upsertManifested]] replacing exactly the partitions the
  * inserted rows contain, carrying the rest — the
  * `partitionOverwriteMode=dynamic` semantics, which is the only
  * overwrite a manifested archive's commit model expresses). The
  * source query aligns to the archive's schema by position (or by
  * name under `BY NAME` / an explicit column list covering the
  * schema exactly), with types cast to the archive's. Partition
  * columns are read off the live manifest's entry keys — the archive
  * itself is the one source of truth for its layout. */
case class WriteArchiveCommand(name: String, path: String,
    userCols: Seq[String], query: LogicalPlan,
    overwrite: Boolean, byName: Boolean) extends LeafRunnableCommand {

  override def innerChildren: Seq[QueryPlan[_]] = Seq(query)

  override def run(session: SparkSession): Seq[Row] = {
    val src = org.apache.spark.sql.GraftColumnBridge.ofRows(session, query)
    val target = Tables.readManifested(session, path).schema
    val (_, parts) = Tables.resolveManifest(session, path)
    require(parts.nonEmpty,
      s"live archive '$name' at $path lists no partitions — nothing " +
        "was ever written, so its partition layout is unknown; seed " +
        "it with writeManifested first")
    val partCols = parts.keys.head.split("/").toSeq
      .map(_.split("=", 2)(0))
    val named =
      if (userCols.nonEmpty) {
        require(userCols.size == src.schema.size,
          s"INSERT column list names ${userCols.size} columns but the " +
            s"query produces ${src.schema.size}")
        val want = target.fields.map(_.name.toLowerCase).toSet
        require(userCols.map(_.toLowerCase).toSet == want,
          s"INSERT column list must cover the archive's columns " +
            s"exactly (${target.fields.map(_.name).mkString(", ")}) — " +
            "a partial insert would need null partition keys")
        src.toDF(userCols: _*)
      } else if (byName) src
      else {
        require(src.schema.size == target.size,
          s"INSERT by position into '$name' needs ${target.size} " +
            s"columns (${target.fields.map(_.name).mkString(", ")}), " +
            s"got ${src.schema.size}")
        src.toDF(target.fields.map(_.name).toIndexedSeq: _*)
      }
    val aligned = named.select(target.fields.toSeq.map(f =>
      col(f.name).cast(f.dataType).as(f.name)): _*)
    if (overwrite)
      Tables.upsertManifested(aligned, path, partCols, _ => false)
    else
      Tables.appendManifested(aligned, path, partCols)
    Seq.empty
  }
}

/** `DELETE FROM <live archive> WHERE …` → the RTBF lifecycle: the
  * victim KEYS (the masked live rows matching the predicate,
  * projected to the registration's `keyCol`) land as a tombstone
  * epoch on the DELETE lane (≥ `DeleteEpochBase`, next free), and
  * the deletion-vector sidecar is rebuilt at delete time — exactly
  * the discipline [[Tables.computeDeletionVectors]] documents — so
  * subsequent masked reads stay on the positional fast path and the
  * eventual physical retirement knows its victim files without a
  * scan. Rows disappear from every masked view immediately; bytes
  * are not rewritten until a fold retires them (mask semantics, the
  * only delete a 100 TB store can afford per-statement). Idempotent:
  * re-deleting the same predicate re-lands the same keys at a new
  * epoch — the masked state is unchanged. */
case class DeleteArchiveCommand(name: String, path: String,
    tombPath: String, keyCol: String, condition: Expression,
    source: LogicalPlan) extends LeafRunnableCommand {

  override def innerChildren: Seq[QueryPlan[_]] = Seq(source)

  override def run(session: SparkSession): Seq[Row] = {
    val victims = org.apache.spark.sql.GraftColumnBridge
      .ofRows(session, Filter(condition, source))
      .select(col(keyCol))
    if (victims.isEmpty) return Seq.empty // nothing matched: no epoch
    val (_, delMax) = Tables.readTombstonesWithEpochs(session, tombPath)
      .map(Tables.laneMaxes).getOrElse((-1L, -1L))
    val epoch = math.max(Tables.DeleteEpochBase, delMax + 1)
    Tables.ingestTombstones(victims, tombPath, epoch)
    Tables.computeDeletionVectors(session, path, tombPath, keyCol)
    Seq.empty
  }
}
