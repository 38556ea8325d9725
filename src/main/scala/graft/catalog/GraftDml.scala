package graft.catalog

import org.apache.spark.sql.{Column, DataFrame, GraftColumnBridge, Row, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{And, Attribute, AttributeReference, EqualTo, Expression, Literal}
import org.apache.spark.sql.catalyst.plans.logical.{Assignment, DeleteAction, DeleteFromTable, InsertAction, InsertStarAction, LogicalPlan, MergeAction, MergeIntoTable, SubqueryAlias, UpdateAction, UpdateStarAction, UpdateTable}
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
  *  - `MERGE INTO g.t USING src ON t.k = src.k [AND ...]` with any mix
  *    of `WHEN MATCHED [AND cond] THEN UPDATE` (star, or explicit
  *    assignments — PARTIAL allowed: unassigned columns keep the
  *    target row's values, the Delta/Postgres posture), `WHEN MATCHED
  *    [AND cond] THEN DELETE`, and `WHEN NOT MATCHED [AND cond] THEN
  *    INSERT` clauses — applied first-match-wins per SOURCE row (the
  *    CDC-apply shape: `AND src.op = 'D' THEN DELETE`). MATCHED-clause
  *    conditions and UPDATE assignment values may reference source AND
  *    target columns (`WHEN MATCHED AND t.status = 'open'`, `SET v =
  *    t.v + s.d`): the match probe carries exactly the referenced
  *    target columns, so routing still happens per source row and the
  *    commit stays ∝ touched partitions. NOT-MATCHED clauses are
  *    source-only (the row has no target side); unassigned INSERT
  *    columns are NULL. ON must be a conjunction of target-column =
  *    source-column equalities (the merge keys). Enforced before
  *    anything commits: source key-uniqueness (the Postgres/Delta
  *    cardinality posture) and partition stability (an UPDATE that
  *    would move a key between partitions is rejected — the stale-row
  *    hole).
  *  - `WHEN NOT MATCHED BY SOURCE THEN DELETE` — the full-sync shape,
  *    accepted with a PARTITION-SCOPING condition on fact tables
  *    (`AND t.p = <literal> [AND ...]`): scoped target rows whose key
  *    the source never names are deleted, and the rewrite stays ∝ the
  *    scoped partitions that actually lose rows. The unscoped
  *    fact-table shape stays rejected (whole-table rewrite; operator
  *    API covers it); dimension tables (full-copy commits anyway)
  *    accept any target-only condition or none.
  *  - `DELETE FROM g.t WHERE <any predicate, subqueries included>` —
  *    deleted rows' partitions are rewritten without them; a partition
  *    deleted empty is dropped (the J2 semi-join delete at partition
  *    scale). Commit ∝ partitions holding matches.
  *  - `UPDATE g.t SET col = expr, ... WHERE <predicate>` — matched
  *    rows' partitions are rewritten with the assignments applied;
  *    partition-column (partition-moving) and `vgen` assignments are
  *    rejected. Commit ∝ partitions holding matches.
  * Multi-column partitioned tables are first-class through every
  * statement (touched sets are leaf-dir TUPLES); the maintenance
  * statements (OPTIMIZE/VACUUM/DESCRIBE HISTORY/RESTORE/DESCRIBE
  * DETAIL) live in [[GraftMaintenance]], installed together with this
  * rule.
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
    * resolution rules AND the maintenance-statement parser
    * ([[GraftSqlParser]]) — the full SQL write-and-lifecycle surface
    * turns on together. */
  def install(ext: SparkSessionExtensions): Unit = {
    ext.injectResolutionRule(s => GraftMergeVgenRule(s))
    ext.injectPostHocResolutionRule(s => GraftDmlRule(s))
    ext.injectParser((_, delegate) => new GraftSqlParser(delegate))
  }

  /** The match-probe flag and carried-target-column naming shared by
    * resolution (which plants references to them) and execution (which
    * rides them on the probe). */
  private[catalog] val MatchFlag = "__graft_m"
  private[catalog] def tpName(i: Int) = s"__graft_tp$i"
  private[catalog] def carriedName(n: String) = s"__graft_t_${n.toLowerCase}"

  /** Conf capping the MERGE probe's broadcast hint (bytes, catalyst
    * size estimate; ≤ 0 disables the hint entirely). Under the cap the
    * probe frames are hinted broadcast (the fast small-batch path —
    * skipping AQE's shuffle-then-convert detour); above it they join
    * plain and AQE picks the strategy at runtime, so a production CDC
    * source of hundreds of millions of keys never rides an
    * unconditional broadcast into the 8 GB / driver-memory wall. */
  private[catalog] val ProbeBroadcastConf = "spark.graft.dml.probeBroadcastThreshold"
  private[catalog] val ProbeBroadcastDefault: Long = 64L * 1024 * 1024

  /** Hint `df` broadcast only when its catalyst size estimate sits
    * under the threshold — the size-conditional probe posture. The
    * conf accepts Spark's byte-suffix forms (`256m`, `1g`, bare
    * bytes); an unparseable value FAILS instead of silently reverting
    * to the default (an operator who raised the cap must not get
    * surprise broadcasts). */
  private[catalog] def maybeBroadcast(
      spark: SparkSession, df: DataFrame): DataFrame = {
    val threshold = spark.conf.getOption(ProbeBroadcastConf)
      .map { s =>
        try org.apache.spark.network.util.JavaUtils.byteStringAsBytes(s)
        catch {
          case e: NumberFormatException => throw new IllegalArgumentException(
            s"$ProbeBroadcastConf must be a byte size ('67108864', " +
              s"'64m', '1g'; <= 0 disables the hint), got '$s'", e)
        }
      }
      .getOrElse(ProbeBroadcastDefault)
    if (threshold > 0 &&
        df.queryExecution.optimizedPlan.stats.sizeInBytes <= threshold)
      broadcast(df)
    else df
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

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case other => Seq(other)
  }

  /** Upsert keys from the ON condition: a conjunction of
    * target-attribute = source-attribute equalities over identical
    * column names. */
  private[catalog] def keysOf(
      cond: Expression,
      target: DataSourceV2Relation,
      source: LogicalPlan): Seq[String] = {
    val tSet = target.outputSet
    val sSet = source.outputSet
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

  /** The merge's validated clause program. Each WHEN clause becomes
    * (condition, assignments); `vgen` (commit-assigned provenance) is
    * skipped everywhere.
    *
    * Reference semantics, per clause family:
    *  - MATCHED clauses see the source row AND its matched target row:
    *    conditions and UPDATE values may reference both. Target
    *    references are rewritten at resolution — a key column to the
    *    same-named source attribute (equal by the ON condition), a
    *    partition column to the probe's target-partition slot, any
    *    other column to a carried probe column — so routing stays
    *    per-SOURCE-row and the probe carries exactly the referenced
    *    columns. Partial UPDATE assignments keep unassigned columns'
    *    target values through the same carried slots.
    *  - NOT MATCHED (insert) clauses have no target side: target
    *    references are rejected with guidance; unassigned columns
    *    insert NULL (the Delta posture).
    *  - NOT MATCHED BY SOURCE accepts exactly one DELETE clause;
    *    fact tables require a partition-scoping condition (rewrite ∝
    *    scoped partitions), dimensions (full-copy commits) accept any
    *    target-only condition or none. */
  private[catalog] def mergeProgram(
      m: MergeIntoTable,
      target: DataSourceV2Relation,
      source: LogicalPlan,
      keys: Seq[String],
      pcols: Seq[String]): MergeProgram = {
    val dataCols = target.output
      .filterNot(_.name.equalsIgnoreCase(FactVersioned.VGenCol))
    val carried = scala.collection.mutable.LinkedHashSet[String]()

    def nameOf(asg: Assignment): String = asg.key match {
      case a: AttributeReference => a.name.toLowerCase
      case other => unsupported(s"cannot assign to ${other.sql}")
    }
    def srcAttr(name: String): Option[Attribute] =
      source.output.filter(_.name.equalsIgnoreCase(name)) match {
        case Seq(one) => Some(one)
        case _ => None
      }
    /** The matched target row's value of non-key column `name`: a
      * reference to the probe-carried slot (partition columns already
      * ride as tp columns). */
    def carriedRef(name: String): Expression = {
      val i = pcols.indexWhere(_.equalsIgnoreCase(name))
      if (i >= 0) UnresolvedAttribute(Seq(tpName(i)))
      else {
        carried += dataCols.find(_.name.equalsIgnoreCase(name)).get.name
        UnresolvedAttribute(Seq(carriedName(name)))
      }
    }
    /** Rewrite a MATCHED-clause expression: target references become
      * probe-carried slots (keys: the equal source attribute); any
      * reference to neither side is rejected with guidance instead of
      * a raw missing-attribute failure at run time. */
    def matchedExpr(e: Expression, clause: String): Expression = {
      val r = e.transform {
        case a: AttributeReference if target.outputSet.contains(a) =>
          if (a.name.equalsIgnoreCase(FactVersioned.VGenCol))
            unsupported(s"'${FactVersioned.VGenCol}' is commit-assigned " +
              "provenance and cannot be referenced in MERGE clauses")
          else if (keys.exists(_.equalsIgnoreCase(a.name)))
            srcAttr(a.name).getOrElse(unsupported(
              s"$clause references target key '${a.name}' but the " +
                "source has no unambiguous column of that name"))
          else carriedRef(a.name)
      }
      r.foreach {
        case a: AttributeReference if !source.outputSet.contains(a) =>
          unsupported(s"$clause references column '${a.name}', which is " +
            "neither a MERGE source column nor a target column")
        case _ => ()
      }
      r
    }
    /** NOT-MATCHED clauses have no target row: source columns only. */
    def sourceOnlyExpr(e: Expression, clause: String): Expression = {
      e.foreach {
        case a: AttributeReference if target.outputSet.contains(a) =>
          unsupported(s"$clause may reference SOURCE columns only — a " +
            s"NOT MATCHED row has no target side; got: ${a.name}")
        case a: AttributeReference if !source.outputSet.contains(a) =>
          unsupported(s"$clause references column '${a.name}', which is " +
            "neither a MERGE source column nor a target column")
        case _ => ()
      }
      e
    }
    def resolveStar(clause: String): Seq[(String, Expression)] =
      dataCols.map { tc =>
        tc.name -> (srcAttr(tc.name).getOrElse(unsupported(
          s"$clause SET */INSERT *: source has no unambiguous column " +
            s"'${tc.name}'")): Expression)
      }
    /** UPDATE assignments — PARTIAL allowed: unassigned columns keep
      * the matched target row's value (carried slot / equal key). */
    def updateAssigns(
        assignments: Seq[Assignment]): Seq[(String, Expression)] = {
      val byName = assignments.map(asg => nameOf(asg) -> asg.value).toMap
      dataCols.map { tc =>
        byName.get(tc.name.toLowerCase) match {
          case Some(e) =>
            tc.name -> matchedExpr(e, "WHEN MATCHED ... UPDATE")
          case None if keys.exists(_.equalsIgnoreCase(tc.name)) =>
            tc.name -> (srcAttr(tc.name).getOrElse(unsupported(
              s"source lacks merge key '${tc.name}'")): Expression)
          case None => tc.name -> carriedRef(tc.name)
        }
      }
    }
    /** INSERT assignments — unassigned columns are NULL. */
    def insertAssigns(
        assignments: Seq[Assignment]): Seq[(String, Expression)] = {
      val byName = assignments.map(asg => nameOf(asg) -> asg.value).toMap
      dataCols.map { tc =>
        byName.get(tc.name.toLowerCase) match {
          case Some(e) =>
            tc.name -> sourceOnlyExpr(e, "WHEN NOT MATCHED ... INSERT")
          case None => tc.name -> (Literal(null, tc.dataType): Expression)
        }
      }
    }

    val matched = m.matchedActions.map {
      case u: UpdateAction =>
        (u.condition.map(matchedExpr(_, "WHEN MATCHED")),
          Some(updateAssigns(u.assignments)))
      case UpdateStarAction(cond) =>
        (cond.map(matchedExpr(_, "WHEN MATCHED")),
          Some(resolveStar("WHEN MATCHED ... UPDATE")))
      case DeleteAction(cond) =>
        (cond.map(matchedExpr(_, "WHEN MATCHED ... DELETE")),
          None: Option[Seq[(String, Expression)]])
      case other => unsupported(s"unsupported WHEN MATCHED action: $other")
    }
    val notMatched = m.notMatchedActions.map {
      case i: InsertAction =>
        (i.condition.map(sourceOnlyExpr(_, "WHEN NOT MATCHED")),
          insertAssigns(i.assignments))
      case InsertStarAction(cond) =>
        (cond.map(sourceOnlyExpr(_, "WHEN NOT MATCHED")),
          resolveStar("WHEN NOT MATCHED ... INSERT"))
      case other => unsupported(s"unsupported WHEN NOT MATCHED action: $other")
    }

    /** BY SOURCE: one DELETE clause; target-only condition rewritten
      * to plain names (it is evaluated on target-side frames). */
    def bySourceCond(e: Expression): Expression = {
      val r = e.transform {
        case a: AttributeReference if target.outputSet.contains(a) =>
          if (a.name.equalsIgnoreCase(FactVersioned.VGenCol))
            unsupported(s"'${FactVersioned.VGenCol}' is commit-assigned " +
              "provenance and cannot be referenced in MERGE clauses")
          else UnresolvedAttribute(Seq(a.name))
      }
      r.foreach {
        case a: AttributeReference =>
          unsupported("WHEN NOT MATCHED BY SOURCE conditions may " +
            "reference TARGET columns only — the row has no source " +
            s"side; got: ${a.name}")
        case _ => ()
      }
      r
    }
    val bySource: Option[Expression] = m.notMatchedBySourceActions match {
      case Seq() => None
      case Seq(DeleteAction(cond)) if pcols.nonEmpty =>
        val c = cond.getOrElse(unsupported(
          "WHEN NOT MATCHED BY SOURCE on a fact table needs a " +
            "partition-scoping condition (AND t.<pcol> = <literal> " +
            "[AND ...]) — the unscoped clause rewrites the whole " +
            "table; scope it, or use FactVersioned.replacePartitions"))
        Some(conjuncts(c).map {
          case eq @ EqualTo(a: AttributeReference, _: Literal)
              if target.outputSet.contains(a) &&
                pcols.exists(_.equalsIgnoreCase(a.name)) => bySourceCond(eq)
          case eq @ EqualTo(_: Literal, a: AttributeReference)
              if target.outputSet.contains(a) &&
                pcols.exists(_.equalsIgnoreCase(a.name)) => bySourceCond(eq)
          case other => unsupported(
            "WHEN NOT MATCHED BY SOURCE conditions on a fact table must " +
              "be conjunctions of <target partition column> = <literal> " +
              s"(the rewrite scope); got: ${other.sql}")
        }.reduce(And))
      case Seq(DeleteAction(cond)) =>
        Some(cond.map(bySourceCond).getOrElse(Literal.TrueLiteral))
      case _ => unsupported(
        "WHEN NOT MATCHED BY SOURCE supports exactly one THEN DELETE " +
          "clause (the full-sync delete-missing shape) — an UPDATE of " +
          "rows the source never names has no per-source-row routing; " +
          "use the operator API (FactVersioned.replacePartitions)")
    }

    require(matched.nonEmpty || notMatched.nonEmpty || bySource.nonEmpty,
      "GraftDml: MERGE needs at least one WHEN clause")
    new MergeProgram(matched, notMatched, bySource, carried.toSeq)
  }

  /** Restrict `t` to exactly the touched partition tuples: per-column
    * NULL-SAFE membership tests (literal, partition-prunable — a
    * superset cross product for multi-column tables) tightened to the
    * exact tuple set by a broadcast null-safe semi-join when more than
    * one column partitions the table. The store supports null
    * partition values (`__HIVE_DEFAULT_PARTITION__` dirs), and SQL
    * 3VL `isin` would silently drop every keeper row of the null
    * partition — each column's test therefore adds an explicit
    * `IS NULL` arm when null is among its touched values. `touchedRows`
    * carry the tuples in `pcols` order with `tupSchema` (≤ 10000 rows
    * by the caller's cap). */
  private[catalog] def scopedTo(
      spark: SparkSession,
      t: DataFrame,
      pcols: Seq[String],
      touchedRows: Array[Row],
      tupSchema: org.apache.spark.sql.types.StructType): DataFrame = {
    val perCol = pcols.zipWithIndex.map { case (p, i) =>
      val vals = touchedRows.map(_.get(i)).distinct.toIndexedSeq
      val nonNull = vals.filter(_ != null)
      val base =
        if (nonNull.nonEmpty) col(p).isin(nonNull: _*) else lit(false)
      if (vals.contains(null)) base || col(p).isNull else base
    }.reduce(_ && _)
    if (pcols.length == 1) t.where(perCol)
    else {
      val tupDf = spark.createDataFrame(
          spark.sparkContext.parallelize(touchedRows.toIndexedSeq, 1),
          tupSchema)
        .select(pcols.zipWithIndex.map { case (p, i) =>
          col(p).as(s"__graft_pv$i") }: _*)
      val cond = pcols.zipWithIndex
        .map { case (p, i) => col(p) <=> col(s"__graft_pv$i") }
        .reduce(_ && _)
      t.where(perCol).join(broadcast(tupDf), cond, "left_semi")
    }
  }

  /** Null-safe anti-join on `cols`: rows of `left` whose `cols` tuple
    * appears in `right` are dropped, with NULLs comparing EQUAL (`<=>`)
    * — a plain `===` anti-join would KEEP null-keyed rows it was meant
    * to remove (SQL 3VL). */
  private[catalog] def antiNullSafe(
      left: DataFrame, right: DataFrame, cols: Seq[String]): DataFrame = {
    val r = right.select(cols.zipWithIndex.map { case (c, i) =>
      col(c).as(s"__graft_r$i") }: _*)
    val cond = cols.zipWithIndex
      .map { case (c, i) => left(c) <=> r(s"__graft_r$i") }
      .reduce(_ && _)
    left.join(r, cond, "left_anti")
  }
}

/** A merge's validated clause program — opaque (like
  * [[AnalyzedCondition]]) so checkAnalysis never traverses the
  * already-resolved expressions. Matched clauses: (condition,
  * Some(assignments) = UPDATE / None = DELETE), applied
  * first-match-wins in statement order; not-matched clauses:
  * (condition, insert assignments), same ordering. `bySourceDelete`:
  * the (target-only, fact: partition-scoping) condition of a WHEN NOT
  * MATCHED BY SOURCE THEN DELETE clause. `carried`: the target data
  * columns matched clauses reference (beyond keys and partition
  * columns), which the match probe must carry. */
final class MergeProgram(
    val matched: Seq[(Option[Expression], Option[Seq[(String, Expression)]])],
    val notMatched: Seq[(Option[Expression], Seq[(String, Expression)])],
    val bySourceDelete: Option[Expression],
    val carried: Seq[String])
  extends Serializable

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

/** Parse-time wrapper around a MERGE's source ([[GraftSqlParser]]
  * plants it): reports `resolved = false` so the analyzer's MERGE
  * star expansion (which resolves EVERY target column — the reserved
  * `vgen` provenance slot included — against same-named source
  * columns, throwing on a miss) waits until [[GraftMergeVgenRule]]
  * has decided whether the source needs a NULL `vgen` appended.
  * Unwrapped verbatim for non-graft targets — one extra analyzer
  * iteration, zero semantic change. */
case class VgenWiden(child: LogicalPlan)
    extends org.apache.spark.sql.catalyst.plans.logical.UnaryNode {
  override def output: Seq[Attribute] = child.output
  override lazy val resolved: Boolean = false
  override protected def withNewChildInternal(
      newChild: LogicalPlan): VgenWiden = copy(child = newChild)
}

/** Resolution-time source widening: a MERGE into a graft FACT table
  * gets a NULL [[FactVersioned.VGenCol]] appended to its source when
  * the source lacks one — the reserved provenance column is
  * commit-assigned (its input values are ignored), so star expansion
  * must not force users to hand-write `CAST(NULL AS BIGINT) AS vgen`
  * into every MERGE source. The [[VgenWiden]] marker (parse-time)
  * holds expansion off until this rule runs; the widening Project goes
  * INSIDE the source's alias so qualified references (`s.vgen`) keep
  * resolving. */
case class GraftMergeVgenRule(session: SparkSession) extends Rule[LogicalPlan] {
  private def widen(p: LogicalPlan): LogicalPlan = p match {
    case SubqueryAlias(id, child) => SubqueryAlias(id, widen(child))
    case other =>
      org.apache.spark.sql.catalyst.plans.logical.Project(
        other.output :+
          org.apache.spark.sql.catalyst.expressions.Alias(
            Literal(null, org.apache.spark.sql.types.LongType),
            FactVersioned.VGenCol)(),
        other)
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformDown {
      case m @ MergeIntoTable(t, w: VgenWiden, _, _, _, _, _)
          if t.resolved && w.child.resolved =>
        val needs = GraftDml.graftTarget(t)
          .exists(_._2.isInstanceOf[WritableFactTable]) &&
          !w.child.output.exists(
            _.name.equalsIgnoreCase(FactVersioned.VGenCol))
        m.copy(sourceTable = if (needs) widen(w.child) else w.child)
    }
}

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
            val pcols =
              if (table.isInstanceOf[WritableFactTable])
                FactVersioned.partitionColumns(
                  session, table.graftTablePath)
              else Nil
            assignments.foreach { asg =>
              val name = asg.key match {
                case a: AttributeReference => a.name
                case other => unsupported(s"cannot assign to ${other.sql}")
              }
              if (pcols.exists(_.equalsIgnoreCase(name)))
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
            val pcols =
              if (table.isInstanceOf[WritableFactTable])
                FactVersioned.partitionColumns(
                  session, table.graftTablePath)
              else Nil
            val program = mergeProgram(m, rel, m.sourceTable, keys, pcols)
            GraftMergeCommand(m.sourceTable, program, keys,
              table.graftTablePath,
              basisGenOf(table), table.retentionForDml)
          case None => m
        }
    }
}

/** `MERGE INTO` through the store committer, evaluating the validated
  * clause program per SOURCE row:
  *
  *  1. the source's keys are probed against the target's (keys, pcols,
  *     referenced-columns) projection — column-pruned, SIZE-ADAPTIVE:
  *     the broadcast hint applies only under a size-estimate cap
  *     ([[GraftDml.maybeBroadcast]], conf
  *     `spark.graft.dml.probeBroadcastThreshold`), so a small batch
  *     takes the fast broadcast path while a production CDC batch of
  *     hundreds of millions of keys joins plain — AQE picks the
  *     runtime strategy — instead of hitting the 8 GB broadcast /
  *     driver-memory wall (Delta's probe is a shuffle join for exactly
  *     this reason; same cost class, paid only on this door);
  *  2. each source row routes to its first true clause — matched rows
  *     walk the WHEN MATCHED clauses (UPDATE projects the row through
  *     that clause's assignments, with unassigned columns keeping the
  *     probe-carried target values; DELETE records the key), unmatched
  *     rows walk the WHEN NOT MATCHED inserts; rows matching no clause
  *     are no-ops (their target rows carry over verbatim);
  *  3. a WHEN NOT MATCHED BY SOURCE THEN DELETE clause (fact:
  *     partition-scoped) deletes scoped target rows whose key the
  *     source never names — cost ∝ scoped partitions that actually
  *     lose rows;
  *  4. one commit rewrites exactly the touched partitions: current
  *     rows minus updated/deleted keys, plus the projected updates and
  *     inserts. Deleted rows' partitions come from the TARGET's
  *     partition value (authoritative — a delete needs no source
  *     pcol); fact commits pin the resolution-time basis so foreign
  *     commits conflict instead of silently losing.
  *
  * Two SQL-MERGE invariants are enforced before anything commits:
  *  - cardinality — a source with >1 row per key errors (Postgres /
  *    Delta posture); sequenced changelogs must be newest-wins
  *    deduplicated first ([[graft.operators.Upsert.batchWinners]]);
  *  - partition stability — an UPDATE-routed source row whose key
  *    lives in a different target partition would strand the stale
  *    row there; rejected with delete+insert guidance. */
case class GraftMergeCommand(
    source: LogicalPlan,
    program: MergeProgram,
    keys: Seq[String],
    path: String,
    basisGen: Option[Long], // Some(resolved head) = fact; None = dim
    retain: Int) extends LeafRunnableCommand {
  import GraftDml.{MatchFlag, antiNullSafe, carriedName, tpName}

  private def isFact: Boolean = basisGen.isDefined

  private def condCol(c: Option[Expression]): Column =
    c.map(GraftColumnBridge.column).getOrElse(lit(true))

  private def project(
      df: DataFrame, assigns: Seq[(String, Expression)]): DataFrame =
    df.select(assigns.map { case (n, e) =>
      GraftColumnBridge.column(e).as(n) }: _*)

  /** Route `enriched` (source + match flag/carried target cols)
    * through the program: (update/insert frames, delete rows with
    * their target partition tuple). First-match-wins with SQL 3VL (a
    * NULL condition routes past the clause). `onUpdateHit` sees each
    * UPDATE clause's routed rows BEFORE projection (the fact path's
    * partition-stability check). */
  private def route(
      enriched: DataFrame,
      tpNames: Seq[String],
      onUpdateHit: (DataFrame, Seq[(String, Expression)]) => Unit =
        (_, _) => ())
      : (Seq[DataFrame], Seq[DataFrame], Option[DataFrame]) = {
    val isMatched = col(MatchFlag) === 1
    var skip: Column = lit(true)
    val updates = Seq.newBuilder[DataFrame]
    var deletes: Option[DataFrame] = None
    program.matched.foreach { case (c, assigns) =>
      val cc = coalesce(condCol(c), lit(false))
      val hit = enriched.where(isMatched && skip && cc)
      assigns match {
        case Some(a) =>
          onUpdateHit(hit, a)
          updates += project(hit, a)
        case None =>
          val d = hit.select(keys.map(col) ++ tpNames.map(col): _*)
          deletes = Some(deletes.map(_.unionByName(d)).getOrElse(d))
      }
      skip = skip && !cc
    }
    var skipI: Column = lit(true)
    val inserts = Seq.newBuilder[DataFrame]
    program.notMatched.foreach { case (c, a) =>
      val cc = coalesce(condCol(c), lit(false))
      inserts += project(
        enriched.where(col(MatchFlag).isNull && skipI && cc), a)
      skipI = skipI && !cc
    }
    (updates.result(), inserts.result(), deletes)
  }

  override def run(spark: SparkSession): Seq[Row] = {
    val src = GraftColumnBridge.ofRows(spark, source)
    FactVersioned.requireKeyUnique(src, keys, "GraftDml MERGE")
    if (isFact) runFact(spark, src) else runDim(spark, src)
    Seq.empty
  }

  private def runFact(spark: SparkSession, src: DataFrame): Unit = {
    val pcols = FactVersioned.partitionColumns(spark, path)
    val tpNames = pcols.indices.map(tpName)
    val srcKeys = src.select(keys.map(col): _*).distinct()
    val probeCols = keys.map(col) ++
      pcols.zip(tpNames).map { case (p, tp) => col(p).as(tp) } ++
      program.carried.map(c => col(c).as(carriedName(c)))
    // size-adaptive probe: the broadcast hint applies ONLY under the
    // size-estimate cap (GraftDml.maybeBroadcast) — a small CDC batch
    // takes the fast broadcast path, a huge one joins plain and AQE
    // picks the strategy at runtime (Delta's probe posture)
    val matchedKeys = FactVersioned.read(spark, path, basisGen)
      .select(probeCols: _*)
      .join(GraftDml.maybeBroadcast(spark, srcKeys), keys, "left_semi")
      .withColumn(MatchFlag, lit(1))
    // the enriched source feeds every clause filter, the move check,
    // the touched collect and the final union — materialize it ONCE
    // (spill-safe; bounded by the source) so each consumer doesn't
    // re-run the source plan AND the full-target key probe
    val enriched = src
      .join(GraftDml.maybeBroadcast(spark, matchedKeys), keys, "left")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try runFactRouted(spark, enriched, srcKeys, pcols, tpNames)
    finally enriched.unpersist(blocking = false)
  }

  private def runFactRouted(
      spark: SparkSession,
      enriched: DataFrame,
      srcKeys: DataFrame,
      pcols: Seq[String],
      tpNames: Seq[String]): Unit = {
    // partition stability: only UPDATE-routed rows can strand a stale
    // target row (deletes use the target's own partition; inserts have
    // no target row) — each update clause's hits are checked against
    // the CLAUSE'S OWN assigned partition expressions, pre-projection
    val moveCheck = (hit: DataFrame, a: Seq[(String, Expression)]) => {
      val pExprs = pcols.map { p =>
        a.find(_._1.equalsIgnoreCase(p))
          .map(x => GraftColumnBridge.column(x._2))
          .getOrElse(throw new IllegalStateException(
            s"GraftDml: MERGE update clause lacks partition column $p"))
      }
      val movedCond = pExprs.zip(tpNames)
        .map { case (e, tp) => !(e <=> col(tp)) }.reduce(_ || _)
      val m = hit.where(movedCond)
        .select(keys.map(col) ++ tpNames.map(col) ++
          pExprs.zipWithIndex.map { case (e, i) => e.as(s"__graft_sp$i") }: _*)
        .limit(1).collect()
      if (m.nonEmpty) {
        val r = m.head
        val ex = keys.zipWithIndex
          .map { case (k, i) => s"$k=${r.get(i)}" }.mkString(", ")
        val fromP = pcols.zipWithIndex.map { case (p, i) =>
          s"$p=${r.get(keys.length + i)}" }.mkString("/")
        val toP = pcols.zipWithIndex.map { case (p, i) =>
          s"$p=${r.get(keys.length + pcols.length + i)}" }.mkString("/")
        throw new IllegalStateException(
          s"GraftDml: MERGE moves key ($ex) from partition '$fromP' to " +
            s"'$toP' — a partition-moving MERGE would leave the stale " +
            "row in its untouched partition. DELETE the key from its " +
            "current partition first, then MERGE (or rewrite both " +
            "partitions with FactVersioned.replacePartitions).")
      }
    }
    val (updates, inserts, deletes) = route(enriched, tpNames, moveCheck)
    // BY SOURCE deletions: scoped target rows whose key the source
    // never names. Cost ∝ the scoped partitions (partition-pruned
    // read); only leaves that actually LOSE rows enter the touched set.
    val bySrcDel: Option[DataFrame] = program.bySourceDelete.map { cond =>
      FactVersioned.read(spark, path, basisGen)
        .where(GraftColumnBridge.column(cond))
        .join(srcKeys, keys, "left_anti")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    }
    try {
      val newRows = (updates ++ inserts).reduceOption(_ unionByName _)
      val touchedRows = (newRows.map(_.select(pcols.map(col): _*)).toSeq ++
          deletes.map(_.select(tpNames.zip(pcols).map {
            case (tp, p) => col(tp).as(p) }: _*)).toSeq ++
          bySrcDel.map(_.select(pcols.map(col): _*)).toSeq)
        .reduceOption(_ unionByName _)
        .map(_.distinct().limit(10001).collect())
        .getOrElse(Array.empty[Row])
      require(touchedRows.length <= 10000,
        "GraftDml: MERGE touches more than 10000 partitions — " +
          "this is a rewrite, not an incremental commit")
      if (touchedRows.isEmpty) return // nothing routed: no commit
      val touched: Seq[Seq[Any]] = touchedRows.toIndexedSeq
        .map(r => pcols.indices.map(r.get))
      val touchedDirs = touched.map(v =>
        FactVersioned.partitionDirPath(pcols, v))
      val current = FactVersioned.readDirs(spark, path, basisGen, touchedDirs)
      // reduceOption: an insert-only MERGE (the insert-if-absent idiom)
      // has no UPDATE and no DELETE clause — nothing to anti-join away
      val changedKeys = (updates.map(_.select(keys.map(col): _*)) ++
          deletes.map(_.select(keys.map(col): _*)).toSeq)
        .reduceOption(_ unionByName _).map(_.distinct())
      var result = changedKeys
        .fold(current)(ck => current.join(ck, keys, "left_anti"))
      bySrcDel.foreach { d =>
        result = antiNullSafe(result,
          d.select((keys ++ pcols).map(col): _*), keys ++ pcols)
      }
      val content = newRows.fold(result)(result.unionByName(_))
      FactVersioned.replacePartitionsBy(spark, path, content, pcols, touched,
        retain = retain, basisGen = basisGen,
        properties = Map("operation" -> "MERGE"))
      ()
    } finally bySrcDel.foreach(_.unpersist(blocking = false))
  }

  private def runDim(spark: SparkSession, src: DataFrame): Unit = {
    val current = Versioned.read(spark, path)
    val srcKeys = src.select(keys.map(col): _*).distinct()
    val probeCols = keys.map(col) ++
      program.carried.map(c => col(c).as(carriedName(c)))
    // size-adaptive, like the fact probe: hint only under the cap
    val matchedKeys = current.select(probeCols: _*)
      .join(GraftDml.maybeBroadcast(spark, srcKeys), keys, "left_semi")
      .withColumn(MatchFlag, lit(1))
    val enriched = src
      .join(GraftDml.maybeBroadcast(spark, matchedKeys), keys, "left")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try runDimRouted(spark, enriched, srcKeys)
    finally enriched.unpersist(blocking = false)
  }

  private def runDimRouted(
      spark: SparkSession,
      enriched: DataFrame,
      srcKeys: DataFrame): Unit = {
    val current = Versioned.read(spark, path)
    // dims have no partitions: no target-partition columns to ride
    val (updates, inserts, deletes) = route(enriched, Nil)
    val changed = (updates.map(_.select(keys.map(col): _*)) ++
        deletes.map(_.select(keys.map(col): _*)).toSeq)
      .reduceOption(_ unionByName _).map(_.distinct())
    val newRows = (updates ++ inserts)
      .reduceOption(_ unionByName _)
    val bySrcDel = program.bySourceDelete.map { cond =>
      current.where(GraftColumnBridge.column(cond))
        .join(srcKeys, keys, "left_anti")
    }
    if (changed.forall(_.isEmpty) && newRows.forall(_.isEmpty) &&
        bySrcDel.forall(_.isEmpty))
      return // nothing routed: no commit
    var kept = changed.fold(current)(c => current.join(c, keys, "left_anti"))
    bySrcDel.foreach { d =>
      kept = GraftDml.antiNullSafe(kept, d.select(keys.map(col): _*), keys)
    }
    Versioned.commit(newRows.fold(kept)(kept.unionByName(_)),
      path, retain = retain)
    ()
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
      val pcols = FactVersioned.partitionColumns(spark, path)
      val sel = t.where(c).select(pcols.map(col): _*)
      val touchedRows = sel.distinct().limit(10001).collect()
      require(touchedRows.length <= 10000,
        "GraftDml: UPDATE touches more than 10000 partitions — " +
          "this is a rewrite, not an incremental commit")
      if (touchedRows.isEmpty) return Seq.empty // no matches: no commit
      val touched: Seq[Seq[Any]] = touchedRows.toIndexedSeq
        .map(r => pcols.indices.map(r.get))
      val scoped = GraftDml.scopedTo(spark, t, pcols, touchedRows,
        sel.schema)
      val content = scoped.select(updatedCols(scoped): _*)
        .drop(FactVersioned.VGenCol)
      // basis = the resolution-time head (see GraftDeleteCommand)
      FactVersioned.replacePartitionsBy(spark, path, content, pcols,
        touched, retain = retain, basisGen = basisGen)
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
      val pcols = FactVersioned.partitionColumns(spark, path)
      val sel = t.where(c).select(pcols.map(col): _*)
      val touchedRows = sel.distinct().limit(10001).collect()
      require(touchedRows.length <= 10000,
        "GraftDml: DELETE touches more than 10000 partitions — " +
          "this is a rewrite, not an incremental commit")
      if (touchedRows.isEmpty) return Seq.empty // no matches: no commit
      val touched: Seq[Seq[Any]] = touchedRows.toIndexedSeq
        .map(r => pcols.indices.map(r.get))
      val keep = GraftDml.scopedTo(spark, t.where(keepCond), pcols,
          touchedRows, sel.schema)
        .drop(FactVersioned.VGenCol)
      // basis = the RESOLUTION-time head whose files this command read:
      // an intervening foreign commit is then a detected conflict, not
      // a silent overwrite from a stale read
      FactVersioned.replacePartitionsBy(spark, path, keep, pcols, touched,
        retain = retain, basisGen = basisGen,
        properties = Map("operation" -> "DELETE"))
    } else {
      if (t.where(c).isEmpty) return Seq.empty
      Versioned.commit(t.where(keepCond), path, retain = retain)
    }
    Seq.empty
  }
}
