package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Expression}
import org.apache.spark.sql.connector.catalog.{CatalogV2Util, SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.internal.connector.SupportsPushDownCatalystFilters
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DSv2 NAME-TRANSLATION shim for graft's renamed fact tables (the
  * catalog half of `FactVersioned`'s column mapping — see
  * `renameColumns` there). A renamed column keeps its PHYSICAL on-file
  * name; the catalog presents the LOGICAL schema and this shim
  * translates at the scan seam:
  *
  *  - `pruneColumns` maps the required logical columns to physical
  *    before delegating, so column pruning still reaches the parquet
  *    reader;
  *  - `pushFilters` rewrites attribute NAMES logical→physical on the
  *    way down (parquet/partition filter translation is name-based)
  *    and back on the returned residuals (resolution downstream is by
  *    exprId — `withName` keeps ids intact, so this is plan hygiene,
  *    not correctness);
  *  - the built `Scan` reports its read schema under logical names
  *    (positions/types unchanged — DSv2 execution is positional, so
  *    the physical reader's batches bind to the logical attributes
  *    as-is).
  *
  * Lives in `org.apache.spark.sql` because
  * [[SupportsPushDownCatalystFilters]] — the interface
  * `FileScanBuilder` actually implements for filter pushdown — is
  * `private[sql]` in the Scala pickle (same precedent as
  * [[GraftColumnBridge]]). Never engaged for never-renamed tables:
  * the catalog only wraps when a generation's column map is non-empty.
  */
object GraftRenameShim {

  /** `inner` reads PHYSICAL columns; the returned table presents
    * `logicalSchema` and translates scans through `logicalToPhysical`
    * (lower-cased logical keys; identity entries absent; DOTTED keys
    * are nested-field renames mapping a logical path to its physical
    * LEAF name — r15). */
  def table(
      inner: Table with SupportsRead,
      logicalSchema: StructType,
      logicalToPhysical: Map[String, String]): Table with SupportsRead =
    new GraftRenamedTable(inner, logicalSchema, logicalToPhysical)
}

/** Schema-level name translation at every depth, derived from the
  * LOGICAL schema + the colmap (top-level entries + dotted nested
  * entries). Positions and types never change — only names — so the
  * physical reader's batches bind to the logical attributes
  * positionally, nested structs included. */
private class GraftNameMaps(
    logical: StructType,
    cmap: Map[String, String]) {
  import org.apache.spark.sql.types.{ArrayType, DataType, MapType}

  private val top: Map[String, String] =
    cmap.filterNot(_._1.contains('.'))
  private val nested: Map[Seq[String], String] =
    cmap.collect { case (k, v) if k.contains('.') => k.split('.').toSeq -> v }

  /** lower-cased PHYSICAL dotted path → logical field spelling, for
    * every renamed field (top-level and nested). Built once from the
    * full logical schema; pruned physical sub-schemas look up by their
    * accumulated physical paths. */
  private val physRev: Map[Seq[String], String] = {
    val out = Map.newBuilder[Seq[String], String]
    def walk(dt: DataType, lpath: Seq[String], ppath: Seq[String]): Unit =
      dt match {
        case s: StructType => s.fields.foreach { f =>
          val lp = lpath :+ f.name.toLowerCase
          val pname =
            if (lpath.isEmpty) top.getOrElse(f.name.toLowerCase, f.name)
            else nested.getOrElse(lp, f.name)
          val pp = ppath :+ pname.toLowerCase
          if (!pname.equalsIgnoreCase(f.name)) out += (pp -> f.name)
          walk(f.dataType, lp, pp)
        }
        case a: ArrayType => walk(a.elementType, lpath, ppath)
        case m: MapType => walk(m.valueType, lpath, ppath)
        case _ => ()
      }
    walk(logical, Nil, Nil)
    out.result()
  }

  /** A logical (sub-)schema under PHYSICAL names at every depth. */
  def toPhys(st: StructType): StructType = {
    def walk(dt: DataType, lpath: Seq[String]): DataType = dt match {
      case s: StructType => StructType(s.fields.map { f =>
        val lp = lpath :+ f.name.toLowerCase
        val pname =
          if (lpath.isEmpty) top.getOrElse(f.name.toLowerCase, f.name)
          else nested.getOrElse(lp, f.name)
        f.copy(name = pname, dataType = walk(f.dataType, lp))
      })
      case a: ArrayType => a.copy(elementType = walk(a.elementType, lpath))
      case m: MapType => m.copy(valueType = walk(m.valueType, lpath))
      case other => other
    }
    walk(st, Nil).asInstanceOf[StructType]
  }

  /** A physical (sub-)schema under LOGICAL names at every depth. */
  def toLogical(st: StructType): StructType = {
    def walk(dt: DataType, ppath: Seq[String]): DataType = dt match {
      case s: StructType => StructType(s.fields.map { f =>
        val pp = ppath :+ f.name.toLowerCase
        f.copy(name = physRev.getOrElse(pp, f.name),
          dataType = walk(f.dataType, pp))
      })
      case a: ArrayType => a.copy(elementType = walk(a.elementType, ppath))
      case m: MapType => m.copy(valueType = walk(m.valueType, ppath))
      case other => other
    }
    walk(st, Nil).asInstanceOf[StructType]
  }
}

private class GraftRenamedTable(
    inner: Table with SupportsRead,
    logical: StructType,
    cmap: Map[String, String]) extends Table with SupportsRead {
  // top-level entries drive attribute/partition translation; the full
  // map (dotted nested entries included) drives schema translation
  private val l2p: Map[String, String] = cmap.filterNot(_._1.contains('.'))
  private val maps = new GraftNameMaps(logical, cmap)
  override def name(): String = inner.name()
  override def schema(): StructType = logical
  override def columns(): Array[org.apache.spark.sql.connector.catalog.Column] =
    CatalogV2Util.structTypeToV2Columns(logical)
  // a renamed PARTITION column keeps its physical dir spelling — the
  // inner table's inferred partitioning reports that; translate back
  // to the logical name (the logical schema's spelling) for users
  override def partitioning(): Array[Transform] = {
    val rev = l2p.map { case (l, p) => p.toLowerCase -> l }
    inner.partitioning().map { t =>
      t.references().toSeq match {
        case Seq(r) if t.name() == "identity" &&
            r.fieldNames().length == 1 &&
            rev.contains(r.fieldNames().head.toLowerCase) =>
          val lower = rev(r.fieldNames().head.toLowerCase)
          org.apache.spark.sql.connector.expressions.Expressions.identity(
            logical.fieldNames.find(_.equalsIgnoreCase(lower))
              .getOrElse(lower))
        case _ => t
      }
    }
  }
  override def properties(): java.util.Map[String, String] =
    inner.properties()
  override def capabilities(): java.util.Set[TableCapability] =
    inner.capabilities()
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftRenamingScanBuilder(inner.newScanBuilder(options), l2p, maps)
}

/** Rewrites NamedReferences inside DSv2 connector expression trees
  * through a name map (top-level column segment only; nested-field
  * renames — r15 — keep their LOGICAL tail here, which is correctness-
  * safe: Spark's parquet filter/aggregate translation skips columns
  * absent from the file schema, so a renamed nested leaf merely loses
  * footer-level pruning for that one field, never misreads). Shapes it
  * can't rebuild are returned unchanged by [[renameRefs]] / signalled
  * by [[None]] from [[renameRefsStrict]] so callers can decline
  * instead of mistranslate. */
private object GraftV2ExprRename {
  import org.apache.spark.sql.connector.expressions.{Expression => V2Expr, FieldReference, GeneralScalarExpression, NamedReference}
  import org.apache.spark.sql.connector.expressions.aggregate._
  import org.apache.spark.sql.connector.expressions.filter.Predicate

  def renameRefsStrict(e: V2Expr, f: String => String): Option[V2Expr] =
    e match {
      case nr: NamedReference =>
        val parts = nr.fieldNames().toIndexedSeq
        Some(FieldReference(f(parts.head) +: parts.tail))
      case p: Predicate =>
        val kids = p.children().map(renameRefsStrict(_, f))
        if (kids.exists(_.isEmpty)) None
        else Some(new Predicate(p.name(), kids.map(_.get)))
      case g: GeneralScalarExpression =>
        val kids = g.children().map(renameRefsStrict(_, f))
        if (kids.exists(_.isEmpty)) None
        else Some(new GeneralScalarExpression(g.name(), kids.map(_.get)))
      case l: org.apache.spark.sql.connector.expressions.Literal[_] =>
        Some(l)
      case other if other.references().isEmpty => Some(other)
      case _ => None
    }

  /** Best-effort variant for REPORTING paths (EXPLAIN text): an
    * untranslatable shape passes through verbatim rather than hiding
    * the filter from the plan. */
  def renameRefs(e: Predicate, f: String => String): Predicate =
    renameRefsStrict(e, f) match {
      case Some(p: Predicate) => p
      case _ => e
    }

  def renameAgg(agg: Aggregation, f: String => String): Option[Aggregation] = {
    def fn(a: AggregateFunc): Option[AggregateFunc] = a match {
      case m: Min => renameRefsStrict(m.column, f).map(new Min(_))
      case m: Max => renameRefsStrict(m.column, f).map(new Max(_))
      case c: Count =>
        renameRefsStrict(c.column, f).map(new Count(_, c.isDistinct))
      case c: CountStar => Some(c)
      case s: Sum => renameRefsStrict(s.column, f).map(new Sum(_, s.isDistinct))
      case a0: Avg => renameRefsStrict(a0.column, f).map(new Avg(_, a0.isDistinct))
      case _ => None // GeneralAggregateFunc/UDAF: decline, don't mistranslate
    }
    val aggs = agg.aggregateExpressions().map(fn)
    val groups = agg.groupByExpressions().map(renameRefsStrict(_, f))
    if (aggs.exists(_.isEmpty) || groups.exists(_.isEmpty)) None
    else Some(new Aggregation(aggs.map(_.get), groups.map(_.get)))
  }
}

private class GraftRenamingScanBuilder(
    inner: ScanBuilder,
    l2p: Map[String, String],
    maps: GraftNameMaps) extends ScanBuilder
    with SupportsPushDownRequiredColumns
    with SupportsPushDownCatalystFilters
    with org.apache.spark.sql.connector.read.SupportsPushDownAggregates {
  private val p2l: Map[String, String] =
    l2p.map { case (l, p) => p.toLowerCase -> l }
  private def pname(l: String): String = l2p.getOrElse(l.toLowerCase, l)
  private def lname(p: String): String = p2l.getOrElse(p.toLowerCase, p)

  override def pruneColumns(requiredSchema: StructType): Unit = inner match {
    case s: SupportsPushDownRequiredColumns =>
      // translate at EVERY depth: the parquet reader clips the file
      // schema by NAME, so a logical nested spelling reaching it would
      // null-fill a renamed field instead of reading its values
      s.pruneColumns(maps.toPhys(requiredSchema))
    case _ => ()
  }

  override def pushFilters(filters: Seq[Expression]): Seq[Expression] =
    inner match {
      case s: SupportsPushDownCatalystFilters =>
        val phys = filters.map(_.transform {
          case a: AttributeReference => a.withName(pname(a.name))
        })
        s.pushFilters(phys).map(_.transform {
          case a: AttributeReference => a.withName(lname(a.name))
        })
      case _ => filters
    }

  // reporting path (EXPLAIN's `PushedFilters:`): translate the inner
  // scan's physical column names back to the user's logical names —
  // resolution downstream is by exprId, so this is display fidelity,
  // but a plan printing `v > 350` for a column the user knows as
  // `amount` is a debugging trap
  override def pushedFilters()
      : Array[org.apache.spark.sql.connector.expressions.filter.Predicate] =
    inner match {
      case s: SupportsPushDownCatalystFilters =>
        s.pushedFilters.map(GraftV2ExprRename.renameRefs(_, lname))
      case _ => Array.empty
    }

  // parquet MIN/MAX/COUNT pushdown (spark.sql.parquet.aggregatePushDown)
  // reaches the inner builder under PHYSICAL names; without the
  // forwarding a renamed table silently loses footer-stats aggregation
  // that identity tables keep. Shapes the translator can't rebuild are
  // DECLINED (full-scan fallback), never mistranslated.
  override def supportCompletePushDown(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation)
      : Boolean = inner match {
    case s: org.apache.spark.sql.connector.read.SupportsPushDownAggregates =>
      GraftV2ExprRename.renameAgg(agg, pname)
        .exists(s.supportCompletePushDown)
    case _ => false
  }

  override def pushAggregation(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation)
      : Boolean = inner match {
    case s: org.apache.spark.sql.connector.read.SupportsPushDownAggregates =>
      GraftV2ExprRename.renameAgg(agg, pname).exists(s.pushAggregation)
    case _ => false
  }

  override def build(): Scan = new GraftRenamingScan(inner.build(), p2l, maps)
}

private class GraftRenamingScan(
    inner: Scan, p2l: Map[String, String],
    maps: GraftNameMaps) extends Scan
    with org.apache.spark.sql.connector.read.SupportsReportStatistics
    with org.apache.spark.sql.connector.read.SupportsRuntimeV2Filtering
    with org.apache.spark.sql.internal.connector.SupportsMetadata {
  private val l2p: Map[String, String] =
    p2l.map { case (p, l) => l.toLowerCase -> p }
  override def readSchema(): StructType =
    maps.toLogical(inner.readSchema())

  /** Rewrite physical column names to logical in EXPLAIN text
    * (identifier-boundary matches — `v` must not rewrite inside
    * `avg`; '/'-adjacent tokens are excluded so a FILESYSTEM PATH
    * segment that happens to equal a physical column name is never
    * mistranslated in `description()`'s embedded Location).
    * Display-only: resolution is by exprId everywhere; without this a
    * plan prints `PushedFilters: [v > 350]` for a column the user
    * knows as `amount` — a debugging trap. */
  private def logicalText(s: String): String =
    p2l.foldLeft(s) { case (acc, (p, l)) =>
      acc.replaceAll(
        "(?i)(?<![A-Za-z0-9_/])" + java.util.regex.Pattern.quote(p) +
          "(?![A-Za-z0-9_/])", java.util.regex.Matcher.quoteReplacement(l))
    }

  // runtime (dynamic) filtering, e.g. DPP: Spark 4.1's own FileScan
  // does not implement it, but delegate when a future inner scan does
  // — attributes surface under LOGICAL names, runtime predicates
  // translate back to physical on the way down. A non-filtering inner
  // scan reports no filterable attributes (harmless no-op).
  override def filterAttributes()
      : Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    inner match {
      case s: org.apache.spark.sql.connector.read.SupportsRuntimeV2Filtering =>
        s.filterAttributes().map(nr =>
          GraftV2ExprRename.renameRefsStrict(
              nr, p => p2l.getOrElse(p.toLowerCase, p))
            .collect { case n: org.apache.spark.sql.connector.expressions.NamedReference => n }
            .getOrElse(nr))
      case _ => Array.empty
    }

  override def filter(
      predicates: Array[org.apache.spark.sql.connector.expressions.filter.Predicate])
      : Unit = inner match {
    case s: org.apache.spark.sql.connector.read.SupportsRuntimeV2Filtering =>
      s.filter(predicates.map(GraftV2ExprRename.renameRefs(
        _, l => l2p.getOrElse(l.toLowerCase, l))))
    case _ => ()
  }
  override def toBatch: Batch = inner.toBatch
  override def description(): String = logicalText(inner.description())

  // scan metrics (numFiles, filesSize, …) pass through — identity
  // tables report them via BatchScanExec, and a renamed table losing
  // its scan metrics would blind both the UI and the pruning specs
  override def supportedCustomMetrics()
      : Array[org.apache.spark.sql.connector.metric.CustomMetric] =
    inner.supportedCustomMetrics()
  override def reportDriverMetrics()
      : Array[org.apache.spark.sql.connector.metric.CustomTaskMetric] =
    inner.reportDriverMetrics()
  override def getMetaData(): Map[String, String] = inner match {
    case s: org.apache.spark.sql.internal.connector.SupportsMetadata =>
      // Location is a filesystem path — a dir segment could collide
      // with a physical column name; leave paths verbatim
      s.getMetaData().map { case (k, v) =>
        k -> (if (k.equalsIgnoreCase("Location")) v else logicalText(v))
      }
    case _ => Map.empty
  }
  // the execution decides columnar support from the scan — delegate,
  // or a renamed table would silently lose vectorized reading
  override def columnarSupportMode()
      : Scan.ColumnarSupportMode = inner.columnarSupportMode()
  // size estimates feed join planning (auto-broadcast) — without the
  // delegation a renamed table reads as defaultSizeInBytes (huge) and
  // never broadcasts
  override def estimateStatistics()
      : org.apache.spark.sql.connector.read.Statistics = inner match {
    case s: org.apache.spark.sql.connector.read.SupportsReportStatistics =>
      s.estimateStatistics()
    case _ => new org.apache.spark.sql.connector.read.Statistics {
      override def sizeInBytes(): java.util.OptionalLong =
        java.util.OptionalLong.empty()
      override def numRows(): java.util.OptionalLong =
        java.util.OptionalLong.empty()
    }
  }
}
