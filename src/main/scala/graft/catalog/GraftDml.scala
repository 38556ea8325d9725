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
  *  - `MERGE INTO g.t USING src ON t.k = src.k [AND ...]` with any mix
  *    of `WHEN MATCHED [AND cond] THEN UPDATE` (star or explicit
  *    assignments), `WHEN MATCHED [AND cond] THEN DELETE`, and
  *    `WHEN NOT MATCHED [AND cond] THEN INSERT` clauses — applied
  *    first-match-wins per SOURCE row (the CDC-apply shape: `AND
  *    src.op = 'D' THEN DELETE`). Clause conditions may reference
  *    SOURCE columns only (per-source-row routing is what keeps the
  *    commit ∝ touched partitions); ON must be a conjunction of
  *    target-column = source-column equalities (the merge keys).
  *    Enforced before anything commits: source key-uniqueness (the
  *    Postgres/Delta cardinality posture) and partition stability
  *    (an UPDATE that would move a key between partitions is
  *    rejected — the stale-row hole). `WHEN NOT MATCHED BY SOURCE`
  *    stays rejected (whole-table shape; operator API covers it).
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
  * statements (OPTIMIZE/VACUUM/DESCRIBE HISTORY/RESTORE) live in
  * [[GraftMaintenance]], installed together with this rule.
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

  /** The merge's validated clause program. Each WHEN clause becomes
    * (condition, assignments): star actions resolve each target column
    * to the same-named source attribute; explicit assignments must
    * cover every data column; DELETE clauses carry no assignments.
    * `vgen` (commit-assigned provenance) is skipped everywhere.
    *
    * Clause conditions may reference SOURCE columns only (`WHEN
    * MATCHED AND src.op = 'D' THEN DELETE` — the CDC-apply shape):
    * routing is then decided per SOURCE row, which is what keeps the
    * commit ∝ touched partitions (a target-referencing condition would
    * make every target row's fate data-dependent — a whole-table
    * rewrite shape; the operator API covers it). */
  private[catalog] def mergeProgram(
      m: MergeIntoTable,
      target: DataSourceV2Relation,
      source: LogicalPlan): MergeProgram = {
    if (m.notMatchedBySourceActions.nonEmpty)
      unsupported("WHEN NOT MATCHED BY SOURCE rewrites target rows the " +
        "source never names (whole-table shape) — use the operator API " +
        "(FactVersioned.replacePartitions) instead")
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
    def explicit(assignments: Seq[Assignment]): Seq[(String, Expression)] = {
      val byName = assignments.map(asg => nameOf(asg) -> asg.value).toMap
      dataCols.map { tc =>
        byName.get(tc.name.toLowerCase) match {
          case Some(e) => tc.name -> e
          case None => unsupported(
            s"MERGE must assign every column; '${tc.name}' is missing")
        }
      }
    }
    def sourceOnly(
        c: Option[Expression], clause: String): Option[Expression] = {
      c.foreach { e =>
        val foreign = e.references.filterNot(source.outputSet.contains)
        if (foreign.nonEmpty) unsupported(
          s"$clause condition may reference SOURCE columns only " +
            "(per-source-row routing keeps the commit ∝ touched " +
            s"partitions); got: ${foreign.map(_.name).mkString(", ")}")
      }
      c
    }
    val matched = m.matchedActions.map {
      case u: UpdateAction =>
        (sourceOnly(u.condition, "WHEN MATCHED"), Some(explicit(u.assignments)))
      case UpdateStarAction(cond) =>
        (sourceOnly(cond, "WHEN MATCHED"), Some(resolveStar()))
      case org.apache.spark.sql.catalyst.plans.logical.DeleteAction(cond) =>
        (sourceOnly(cond, "WHEN MATCHED ... DELETE"),
          None: Option[Seq[(String, Expression)]])
      case other => unsupported(s"unsupported WHEN MATCHED action: $other")
    }
    val notMatched = m.notMatchedActions.map {
      case i: InsertAction =>
        (sourceOnly(i.condition, "WHEN NOT MATCHED"), explicit(i.assignments))
      case InsertStarAction(cond) =>
        (sourceOnly(cond, "WHEN NOT MATCHED"), resolveStar())
      case other => unsupported(s"unsupported WHEN NOT MATCHED action: $other")
    }
    require(matched.nonEmpty || notMatched.nonEmpty,
      "GraftDml: MERGE needs at least one WHEN clause")
    new MergeProgram(matched, notMatched)
  }

  /** Restrict `t` to exactly the touched partition tuples: per-column
    * `isin` lists (literal, partition-prunable — a superset cross
    * product for multi-column tables) tightened to the exact tuple set
    * by a broadcast semi-join when more than one column partitions the
    * table. `touchedRows` carry the tuples in `pcols` order with
    * `tupSchema` (≤ 10000 rows by the caller's cap). */
  private[catalog] def scopedTo(
      spark: SparkSession,
      t: DataFrame,
      pcols: Seq[String],
      touchedRows: Array[Row],
      tupSchema: org.apache.spark.sql.types.StructType): DataFrame = {
    val crossIsin = pcols.zipWithIndex.map { case (p, i) =>
      col(p).isin(touchedRows.map(_.get(i)).distinct.toIndexedSeq: _*)
    }.reduce(_ && _)
    if (pcols.length == 1) t.where(crossIsin)
    else {
      val tupDf = spark.createDataFrame(
        spark.sparkContext.parallelize(touchedRows.toIndexedSeq, 1),
        tupSchema)
      t.where(crossIsin).join(broadcast(tupDf), pcols, "left_semi")
    }
  }
}

/** A merge's validated clause program — opaque (like
  * [[AnalyzedCondition]]) so checkAnalysis never traverses the
  * already-resolved expressions. Matched clauses: (source-only
  * condition, Some(assignments) = UPDATE / None = DELETE), applied
  * first-match-wins in statement order; not-matched clauses:
  * (condition, insert assignments), same ordering. */
final class MergeProgram(
    val matched: Seq[(Option[Expression], Option[Seq[(String, Expression)]])],
    val notMatched: Seq[(Option[Expression], Seq[(String, Expression)])])
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
            val program = mergeProgram(m, rel, m.sourceTable)
            GraftMergeCommand(m.sourceTable, program, keys,
              table.graftTablePath,
              basisGenOf(table), table.retentionForDml)
          case None => m
        }
    }
}

/** `MERGE INTO` through the store committer, evaluating the validated
  * clause program per SOURCE row (conditions are source-only, enforced
  * at resolution):
  *
  *  1. the source's keys are probed against the target's (keys, pcol)
  *     projection — column-pruned, with the source's distinct keys
  *     broadcast against it (Delta pays an analogous full target join
  *     inside every MERGE; same cost class, paid only on this door);
  *  2. each source row routes to its first true clause — matched rows
  *     walk the WHEN MATCHED clauses (UPDATE projects the row through
  *     that clause's assignments; DELETE records the key), unmatched
  *     rows walk the WHEN NOT MATCHED inserts; rows matching no clause
  *     are no-ops (their target rows carry over verbatim);
  *  3. one commit rewrites exactly the touched partitions: current
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
  private def isFact: Boolean = basisGen.isDefined
  private val MatchFlag = "__graft_m"
  /** Target-partition columns riding the match probe (one per
    * partition column; empty for dims). */
  private def tpName(i: Int) = s"__graft_tp$i"

  private def condCol(c: Option[Expression]): Column =
    c.map(GraftColumnBridge.column).getOrElse(lit(true))

  private def project(
      df: DataFrame, assigns: Seq[(String, Expression)]): DataFrame =
    df.select(assigns.map { case (n, e) =>
      GraftColumnBridge.column(e).as(n) }: _*)

  /** Route `enriched` (source + match flag/target partition cols)
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
    val matchedKeys = FactVersioned.read(spark, path)
      .select(keys.map(col) ++ pcols.zip(tpNames).map {
        case (p, tp) => col(p).as(tp) }: _*)
      .join(broadcast(src.select(keys.map(col): _*).distinct()),
        keys, "left_semi")
      .withColumn(MatchFlag, lit(1))
    // the enriched source feeds every clause filter, the move check,
    // the touched collect and the final union — materialize it ONCE
    // (spill-safe; bounded by the source, which the 10000-partition
    // cap already bounds) so each consumer doesn't re-run the source
    // plan AND the full-target key probe behind the broadcast
    val enriched = src.join(broadcast(matchedKeys), keys, "left")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try runFactRouted(spark, enriched, pcols, tpNames)
    finally enriched.unpersist(blocking = false)
  }

  private def runFactRouted(
      spark: SparkSession,
      enriched: DataFrame,
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
    val newRows = (updates ++ inserts).reduceOption(_ unionByName _)
    val touchedRows = (newRows.map(_.select(pcols.map(col): _*)).toSeq ++
        deletes.map(_.select(tpNames.zip(pcols).map {
          case (tp, p) => col(tp).as(p) }: _*)).toSeq)
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
    val changedKeys = (updates.map(_.select(keys.map(col): _*)).toSeq ++
        deletes.map(_.select(keys.map(col): _*)).toSeq)
      .reduce(_ unionByName _).distinct()
    val result = current.join(changedKeys, keys, "left_anti")
    val content = newRows.fold(result)(result.unionByName(_))
    FactVersioned.replacePartitionsBy(spark, path, content, pcols, touched,
      retain = retain, basisGen = basisGen,
      properties = Map("operation" -> "MERGE"))
    ()
  }

  private def runDim(spark: SparkSession, src: DataFrame): Unit = {
    val current = Versioned.read(spark, path)
    val matchedKeys = current.select(keys.map(col): _*)
      .join(broadcast(src.select(keys.map(col): _*).distinct()),
        keys, "left_semi")
      .withColumn(MatchFlag, lit(1))
    val enriched = src.join(broadcast(matchedKeys), keys, "left")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try runDimRouted(spark, enriched)
    finally enriched.unpersist(blocking = false)
  }

  private def runDimRouted(spark: SparkSession, enriched: DataFrame): Unit = {
    val current = Versioned.read(spark, path)
    // dims have no partitions: no target-partition columns to ride
    val (updates, inserts, deletes) = route(enriched, Nil)
    val changed = (updates.map(_.select(keys.map(col): _*)).toSeq ++
        deletes.map(_.select(keys.map(col): _*)).toSeq)
      .reduceOption(_ unionByName _).map(_.distinct())
    val newRows = (updates ++ inserts)
      .reduceOption(_ unionByName _)
    if (changed.forall(_.isEmpty) && newRows.forall(_.isEmpty))
      return // nothing routed: no commit
    val kept = changed.fold(current)(c => current.join(c, keys, "left_anti"))
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
