package graft.catalog

import org.apache.spark.sql.{Column, DataFrame, GraftColumnBridge, Row, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, EqualTo, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{Assignment, DeleteFromTable, InsertAction, InsertStarAction, LogicalPlan, MergeAction, MergeIntoTable, SubqueryAlias, UpdateAction, UpdateStarAction, UpdateTable}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.functions._

import graft.operators.{FactVersioned, Versioned}

/** SQL DML — `MERGE INTO` / `DELETE FROM` — over [[GraftCatalog]]
  * tables, routed THROUGH the stores' own committers. The reference's
  * load lifecycle is MERGE semantics end to end
  * (`src/db/load.py:77-92,203-228`: staging upsert, promote, semi-join
  * delete), and its analytic users speak SQL (`README.md:12`) — this
  * completes that surface on the versioned stores: the committers
  * ([[FactVersioned.upsert]]/[[FactVersioned.replacePartitions]],
  * [[Versioned.commit]]) already implement the semantics with commit
  * cost ∝ touched partitions; only statement ROUTING was missing.
  *
  * Spark's native MERGE/DELETE planning requires
  * `SupportsRowLevelOperations` — a distributed per-task write
  * protocol these stores deliberately don't implement (a task cannot
  * claim generations; commits are driver-orchestrated partition
  * swaps), and whose group-based copy-on-write rewrites the WHOLE
  * table unless the scan also implements runtime group filtering. The
  * routing here is instead a POST-HOC analyzer resolution rule (the
  * lakehouse-engine precedent: Delta's DeltaAnalysis → MergeInto
  * command): a resolved `MergeIntoTable`/`DeleteFromTable` whose
  * target is a graft table becomes a runnable command that evaluates
  * the statement with DataFrame operators and commits through the
  * store — claim/marker protocol, conflict detection, retention, and
  * the ∝-touched write contract all apply unchanged.
  *
  * Supported shapes (everything else fails loudly with guidance):
  *  - `MERGE INTO g.t USING src ON t.k = src.k [AND ...]
  *     WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *`
  *    — the canonical upsert; explicit column assignments are accepted
  *    when UPDATE and INSERT assign the same expression per column
  *    (anything else is not an upsert and has no ∝-touched commit
  *    shape). ON must be a conjunction of target-column = source-column
  *    equalities (the upsert keys).
  *  - `DELETE FROM g.t WHERE <any predicate, subqueries included>` —
  *    deleted rows' partitions are rewritten without them; a partition
  *    deleted empty is dropped (the J2 semi-join delete at partition
  *    scale). Commit ∝ partitions holding matches.
  *  - `UPDATE g.t SET col = expr, ... WHERE <predicate>` — matched
  *    rows' partitions are rewritten with the assignments applied;
  *    partition-column (partition-moving) and `vgen` assignments are
  *    rejected. Commit ∝ partitions holding matches.
  *
  * Session wiring: analyzer rule sets are snapshotted when a session's
  * state materializes, so [[enable]] injects the rule into the
  * (shared, mutable) `SparkSessionExtensions` and returns a NEW
  * session — same SparkContext, shared tables/catalogs — whose fresh
  * analyzer carries it. `spark.sql.catalog.*` confs are copied over.
  * Config-time users get the rule from `graft.GraftExtensions`
  * directly. */
object GraftDml {

  private val injected = new java.util.WeakHashMap[
    SparkSessionExtensions, java.lang.Boolean]()

  /** Install the DML rule and return a session whose analyzer has it.
    * Idempotent per underlying extensions instance. */
  def enable(spark: SparkSession): SparkSession = {
    val ext = GraftColumnBridge.extensionsOf(spark)
    injected.synchronized {
      if (!injected.containsKey(ext)) {
        install(ext)
        injected.put(ext, java.lang.Boolean.TRUE)
      }
    }
    val fresh = spark.newSession()
    spark.conf.getAll
      .filter { case (k, _) => k.startsWith("spark.sql.catalog.") }
      .foreach { case (k, v) => fresh.conf.set(k, v) }
    fresh
  }

  /** Register on a SparkSessionExtensions (config-time entry —
    * composed into [[graft.GraftExtensions]]). Installs the DML
    * resolution rule AND the maintenance-statement parser
    * ([[GraftSqlParser]]: OPTIMIZE / VACUUM / DESCRIBE HISTORY) — the
    * full SQL write-and-lifecycle surface turns on together. */
  def install(ext: SparkSessionExtensions): Unit = {
    ext.injectPostHocResolutionRule(s => GraftDmlRule(s))
    ext.injectParser((_, delegate) => new GraftSqlParser(delegate))
  }

  /** The writable graft table under alias wrappers, with its relation. */
  private[catalog] def graftTarget(
      plan: LogicalPlan): Option[(DataSourceV2Relation, GraftWritableTable)] =
    plan match {
      case SubqueryAlias(_, child) => graftTarget(child)
      case r: DataSourceV2Relation => r.table match {
        case t: GraftWritableTable => Some((r, t))
        case _ => None
      }
      case _ => None
    }

  /** The commit basis a DML command over `table` must declare:
    * Some(resolution-pinned head) for fact tables, None for dims. */
  private[catalog] def basisGenOf(table: GraftWritableTable): Option[Long] =
    table match {
      case f: WritableFactTable => Some(f.resolvedGen)
      case _ => None
    }

  private[catalog] def unsupported(msg: String): Nothing =
    throw new UnsupportedOperationException(s"GraftDml: $msg")

  /** Upsert keys from the ON condition: a conjunction of
    * target-attribute = source-attribute equalities over identical
    * column names. */
  private[catalog] def keysOf(
      cond: Expression,
      target: DataSourceV2Relation,
      source: LogicalPlan): Seq[String] = {
    val tSet = target.outputSet
    val sSet = source.outputSet
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case org.apache.spark.sql.catalyst.expressions.And(l, r) =>
        conjuncts(l) ++ conjuncts(r)
      case other => Seq(other)
    }
    conjuncts(cond).map {
      case EqualTo(a: AttributeReference, b: AttributeReference)
          if tSet.contains(a) && sSet.contains(b) &&
            a.name.equalsIgnoreCase(b.name) => a.name
      case EqualTo(b: AttributeReference, a: AttributeReference)
          if tSet.contains(a) && sSet.contains(b) &&
            a.name.equalsIgnoreCase(b.name) => a.name
      case other => unsupported(
        s"MERGE ON must be a conjunction of target.col = source.col " +
          s"equalities on identical names (the upsert keys); got: " +
          s"${other.sql}")
    }
  }

  /** The per-column update expressions of the canonical upsert shape:
    * star actions resolve each target column to the same-named source
    * attribute; explicit assignments must agree between UPDATE and
    * INSERT per column (canonicalized) — otherwise the statement is
    * not an upsert. `vgen` (commit-assigned provenance) is skipped. */
  private[catalog] def upsertColumns(
      m: MergeIntoTable,
      target: DataSourceV2Relation,
      source: LogicalPlan): Seq[(String, Expression)] = {
    if (m.notMatchedBySourceActions.nonEmpty)
      unsupported("WHEN NOT MATCHED BY SOURCE is not an upsert — use " +
        "the operator API (FactVersioned.replacePartitions) instead")
    def assignMap(a: MergeAction): Option[Map[String, Expression]] = a match {
      case u: UpdateAction if u.condition.isEmpty =>
        Some(u.assignments.map(asg => nameOf(asg) -> asg.value).toMap)
      case i: InsertAction if i.condition.isEmpty =>
        Some(i.assignments.map(asg => nameOf(asg) -> asg.value).toMap)
      case UpdateStarAction(None) | InsertStarAction(None) => None
      case other => unsupported(
        s"only unconditional UPDATE SET * / INSERT * (or all-column " +
          s"assignments) are supported; got: $other")
    }
    def nameOf(asg: Assignment): String = asg.key match {
      case a: AttributeReference => a.name.toLowerCase
      case other => unsupported(s"cannot assign to ${other.sql}")
    }
    val dataCols = target.output
      .filterNot(_.name.equalsIgnoreCase(FactVersioned.VGenCol))
    def resolveStar(): Seq[(String, Expression)] = dataCols.map { tc =>
      val src = source.output.filter(_.name.equalsIgnoreCase(tc.name)) match {
        case Seq(one) => one
        case Seq() => unsupported(
          s"INSERT */UPDATE SET *: source has no column '${tc.name}'")
        case many => unsupported(
          s"source column '${tc.name}' is ambiguous (${many.size} matches)")
      }
      tc.name -> (src: Expression)
    }
    require(m.matchedActions.length == 1 && m.notMatchedActions.length == 1,
      "GraftDml: MERGE must have exactly one WHEN MATCHED THEN UPDATE " +
        "and one WHEN NOT MATCHED THEN INSERT action (the upsert shape)")
    (assignMap(m.matchedActions.head), assignMap(m.notMatchedActions.head))
      match {
      case (None, None) => resolveStar()
      case (up, ins) =>
        val u = up.getOrElse(resolveStar().map {
          case (n, e) => n.toLowerCase -> e }.toMap)
        val i = ins.getOrElse(resolveStar().map {
          case (n, e) => n.toLowerCase -> e }.toMap)
        dataCols.map { tc =>
          val n = tc.name.toLowerCase
          (u.get(n), i.get(n)) match {
            case (Some(ue), Some(ie))
                if ue.canonicalized == ie.canonicalized => tc.name -> ue
            case (Some(_), Some(_)) => unsupported(
              s"UPDATE and INSERT assign different expressions to " +
                s"'${tc.name}' — not an upsert; use the operator API")
            case _ => unsupported(
              s"MERGE must assign every column; '${tc.name}' is missing")
          }
        }
    }
  }
}

/** Opaque wrapper keeping an already-analyzed expression OUT of the
  * command plan's expression traversal: checkAnalysis restricts where
  * IN/EXISTS subqueries may appear (Filter/Join/DML nodes — not a
  * custom command), but the condition was fully resolved INSIDE the
  * original DeleteFromTable (an allowed context) before the rule
  * swapped the node; at run time it re-enters an allowed context as a
  * DataFrame filter. */
final class AnalyzedCondition(val expr: Expression) extends Serializable

/** Same opacity for the merge's validated per-column expressions. */
final class AnalyzedColumns(val cols: Seq[(String, Expression)])
  extends Serializable

/** The post-hoc resolution rule: resolved MERGE/DELETE over a graft
  * table → runnable command through the store's committer. */
case class GraftDmlRule(session: SparkSession) extends Rule[LogicalPlan] {
  import GraftDml._

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformDown {
      case d @ DeleteFromTable(t, cond) if d.resolved =>
        graftTarget(t) match {
          case Some((_, table)) =>
            GraftDeleteCommand(t, new AnalyzedCondition(cond),
              table.graftTablePath,
              basisGenOf(table), table.retentionForDml)
          case None => d
        }
      case u @ UpdateTable(t, assignments, cond) if u.resolved =>
        graftTarget(t) match {
          case Some((rel, table)) =>
            val pcol =
              if (table.isInstanceOf[WritableFactTable])
                Some(FactVersioned.partitionColumn(
                  session, table.graftTablePath))
              else None
            assignments.foreach { asg =>
              val name = asg.key match {
                case a: AttributeReference => a.name
                case other => unsupported(s"cannot assign to ${other.sql}")
              }
              if (pcol.exists(_.equalsIgnoreCase(name)))
                unsupported(s"UPDATE of the partition column '$name' " +
                  "moves rows between partitions, which has no " +
                  "single-partition rewrite shape — DELETE the rows " +
                  "from their current partition and re-INSERT them " +
                  "with the new value (or rewrite both partitions " +
                  "with FactVersioned.replacePartitions)")
              if (name.equalsIgnoreCase(FactVersioned.VGenCol))
                unsupported(s"'${FactVersioned.VGenCol}' is " +
                  "commit-assigned provenance and cannot be updated")
            }
            GraftUpdateCommand(t,
              new AnalyzedColumns(assignments.map(asg =>
                asg.key.asInstanceOf[AttributeReference].name -> asg.value)),
              new AnalyzedCondition(cond.getOrElse(
                org.apache.spark.sql.catalyst.expressions.Literal.TrueLiteral)),
              table.graftTablePath,
              basisGenOf(table), table.retentionForDml)
          case None => u
        }
      case m: MergeIntoTable if m.resolved =>
        graftTarget(m.targetTable) match {
          case Some((rel, table)) =>
            val keys = keysOf(m.mergeCondition, rel, m.sourceTable)
            require(keys.nonEmpty, "GraftDml: MERGE ON yielded no keys")
            val cols = upsertColumns(m, rel, m.sourceTable)
            GraftMergeCommand(m.sourceTable,
              new AnalyzedColumns(cols), keys,
              table.graftTablePath,
              table.isInstanceOf[WritableFactTable], table.retentionForDml)
          case None => m
        }
    }
}

/** `MERGE INTO` as an upsert through the store committer. The update
  * frame is the source projected through the validated per-column
  * expressions; fact tables commit ∝ touched partitions via
  * [[FactVersioned.upsert]], dimension tables commit a fresh full-copy
  * generation (current rows whose key has no update + updates).
  *
  * Two SQL-MERGE invariants are enforced before anything commits:
  *  - cardinality — a source with >1 row per key errors (Postgres/
  *    Delta posture; the fact path's [[FactVersioned.upsert]] enforces
  *    it natively, the dim path checks here);
  *  - partition stability — a source row whose key EXISTS in the
  *    target but carries a different partition-column value would
  *    leave the stale target row in its (untouched) partition and
  *    commit two rows for one key; detected by joining the source
  *    against the target's (keys, pcol) projection — column-pruned,
  *    with the (bounded, ≤10000-partition) source broadcast against
  *    it — and rejected with delete+insert guidance. Delta pays an
  *    analogous full target join inside every MERGE; this is the same
  *    cost class, paid only on the SQL door. */
case class GraftMergeCommand(
    source: LogicalPlan,
    cols: AnalyzedColumns,
    keys: Seq[String],
    path: String,
    isFact: Boolean,
    retain: Int) extends LeafRunnableCommand {

  override def run(spark: SparkSession): Seq[Row] = {
    val updates = GraftColumnBridge.ofRows(spark, source)
      .select(cols.cols.map { case (n, e) =>
        GraftColumnBridge.column(e).as(n) }: _*)
      .drop(FactVersioned.VGenCol)
    if (isFact) {
      val pcol = FactVersioned.partitionColumn(spark, path)
      val moved = FactVersioned.read(spark, path)
        .select(keys.map(col) :+ col(pcol).as("__graft_target_p"): _*)
        .join(broadcast(
          updates.select(keys.map(col) :+ col(pcol).as("__graft_src_p"): _*)),
          keys)
        .where(!(col("__graft_src_p") <=> col("__graft_target_p")))
        .limit(1).collect()
      if (moved.nonEmpty) {
        val r = moved.head
        val ex = keys.zipWithIndex
          .map { case (k, i) => s"$k=${r.get(i)}" }.mkString(", ")
        throw new IllegalStateException(
          s"GraftDml: MERGE moves key ($ex) from partition " +
            s"'$pcol=${r.get(keys.length)}' to " +
            s"'$pcol=${r.get(keys.length + 1)}' — a partition-moving " +
            "MERGE would leave the stale row in its untouched " +
            "partition. DELETE the key from its current partition " +
            "first, then MERGE (or rewrite both partitions with " +
            "FactVersioned.replacePartitions).")
      }
      FactVersioned.upsert(spark, path, updates, keys, pcol,
        retain = retain)
    } else {
      FactVersioned.requireKeyUnique(updates, keys, "GraftDml MERGE")
      val current = Versioned.read(spark, path)
      Versioned.commit(
        current.join(updates.select(keys.map(col): _*).distinct(),
            keys, "left_anti")
          .unionByName(updates),
        path, retain = retain)
    }
    Seq.empty
  }
}

/** `UPDATE ... SET ... WHERE cond` as a partition rewrite: only
  * partitions holding matching rows are read and rewritten, with the
  * assignments applied to matching rows and every other row carried
  * verbatim (`CASE WHEN cond THEN expr ELSE col END` per assigned
  * column — rows where `cond` is NULL are NOT updated, SQL
  * three-valued logic). Partition-column and `vgen` assignments were
  * rejected at resolution (a partition-moving update has no
  * single-partition rewrite shape). Dimension tables commit the
  * updated content as a fresh full-copy generation. */
case class GraftUpdateCommand(
    relation: LogicalPlan,
    assignments: AnalyzedColumns,
    cond: AnalyzedCondition,
    path: String,
    basisGen: Option[Long], // Some(resolved head) = fact; None = dim
    retain: Int) extends LeafRunnableCommand {
  private def isFact: Boolean = basisGen.isDefined

  override def run(spark: SparkSession): Seq[Row] = {
    val t = GraftColumnBridge.ofRows(spark, relation)
    val c: Column = GraftColumnBridge.column(cond.expr)
    val assigned: Map[String, Column] = assignments.cols.map {
      case (n, e) => n.toLowerCase -> GraftColumnBridge.column(e)
    }.toMap
    def updatedCols(df: DataFrame): Seq[Column] = df.columns.toSeq.map { n =>
      assigned.get(n.toLowerCase) match {
        case Some(expr) => when(c, expr).otherwise(col(n)).as(n)
        case None => col(n)
      }
    }
    if (isFact) {
      val pcol = FactVersioned.partitionColumn(spark, path)
      val touchedRows = t.where(c).select(pcol).distinct()
        .limit(10001).collect()
      require(touchedRows.length <= 10000,
        "GraftDml: UPDATE touches more than 10000 partitions — " +
          "this is a rewrite, not an incremental commit")
      if (touchedRows.isEmpty) return Seq.empty // no matches: no commit
      val touched = touchedRows.map(_.get(0)).toIndexedSeq
      val scoped = t.where(col(pcol).isin(touched: _*))
      val content = scoped.select(updatedCols(scoped): _*)
        .drop(FactVersioned.VGenCol)
      // basis = the resolution-time head (see GraftDeleteCommand)
      FactVersioned.replacePartitions(spark, path, content, pcol, touched,
        retain = retain, basisGen = basisGen)
    } else {
      if (t.where(c).isEmpty) return Seq.empty
      Versioned.commit(t.select(updatedCols(t): _*), path, retain = retain)
    }
    Seq.empty
  }
}

/** `DELETE FROM ... WHERE cond` as a partition rewrite: only
  * partitions holding matching rows are read and rewritten (without
  * the matches); a partition deleted empty is dropped from the new
  * generation (partition-delete semantics, conflict-detected like any
  * touched dir). SQL three-valued logic: rows where `cond` is NULL are
  * KEPT (only true deletes). Dimension tables commit the remaining
  * rows as a fresh full-copy generation. */
case class GraftDeleteCommand(
    relation: LogicalPlan,
    cond: AnalyzedCondition,
    path: String,
    basisGen: Option[Long], // Some(resolved head) = fact; None = dim
    retain: Int) extends LeafRunnableCommand {
  private def isFact: Boolean = basisGen.isDefined

  override def run(spark: SparkSession): Seq[Row] = {
    val t = GraftColumnBridge.ofRows(spark, relation)
    val c: Column = GraftColumnBridge.column(cond.expr)
    val keepCond = coalesce(c, lit(false)) === lit(false)
    if (isFact) {
      val pcol = FactVersioned.partitionColumn(spark, path)
      val touchedRows = t.where(c).select(pcol).distinct()
        .limit(10001).collect()
      require(touchedRows.length <= 10000,
        "GraftDml: DELETE touches more than 10000 partitions — " +
          "this is a rewrite, not an incremental commit")
      if (touchedRows.isEmpty) return Seq.empty // no matches: no commit
      val touched = touchedRows.map(_.get(0)).toIndexedSeq
      val keep = t.where(keepCond)
        .where(col(pcol).isin(touched: _*))
        .drop(FactVersioned.VGenCol)
      // basis = the RESOLUTION-time head whose files this command read:
      // an intervening foreign commit is then a detected conflict, not
      // a silent overwrite from a stale read
      FactVersioned.replacePartitions(spark, path, keep, pcol, touched,
        retain = retain, basisGen = basisGen)
    } else {
      if (t.where(c).isEmpty) return Seq.empty
      Versioned.commit(t.where(keepCond), path, retain = retain)
    }
    Seq.empty
  }
}
