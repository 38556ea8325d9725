package graft.catalog

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{And, Attribute, EqualNullSafe, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, In, LessThan, LessThanOrEqual, Literal, Pmod}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.types.{IntegerType, StringType}

/** Hidden-partitioning predicate mapping (r17 — the read half of
  * [[PartitionTransforms]]): a filter on the TRANSFORM SOURCE column of
  * a transform-partitioned fact table gains the equivalent conjunct on
  * the GENERATED partition column, so the scan partition-prunes without
  * the user ever naming `ts_day` — `WHERE ts BETWEEN a AND b` reads
  * only the matching day dirs. This is Iceberg's hidden-partitioning
  * contract expressed as ONE Catalyst optimizer rule: the added
  * conjunct is ordinary catalyst, so Spark's own pushdown carries it
  * into the parquet scan's partition filters — nothing else changes.
  *
  * Soundness: the time renderings (`yyyy`, `yyyy-MM`, `yyyy-MM-dd`,
  * `yyyy-MM-dd-HH`) are lexicographically MONOTONIC in the source
  * instant, so `src >= L` implies `gen >= F(L)` (ranges widen to the
  * containing partition, never narrow), equality maps exactly, and
  * `bucket` maps equality/IN through the same Murmur3 hash the write
  * side materializes. Rows with NULL source fail the ORIGINAL
  * conjunct, so the derived conjunct (also NULL for them) excludes
  * nothing the original kept. Conjuncts are only derived from the
  * filter's TOP-LEVEL conjunction — under OR/NOT the implication does
  * not hold conjunct-wise, so those are left alone (the filter stays
  * correct; it just reads more partitions).
  *
  * Scope: HEAD reads through the catalog (the table handle carries the
  * spec). `VERSION AS OF` reads resolve to raw parquet tables and stay
  * unpruned-but-correct; path-door reads ([[graft.operators
  * .FactVersioned.read]]) can filter on the generated column directly.
  *
  * Idempotent by construction (optimizer rules run to fixed point): a
  * derived conjunct that is already semantically present is not added
  * again. */
case class GraftTransformPruneRule(session: SparkSession)
    extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case f @ Filter(cond, r: DataSourceV2Relation) =>
      specOf(r) match {
        case Some((spec, srcAttr, genAttr)) =>
          val conjuncts = splitConj(cond)
          val derived = conjuncts.flatMap(mapConjunct(_, spec, srcAttr,
            genAttr))
          val fresh = derived.filterNot(d =>
            conjuncts.exists(_.semanticEquals(d)))
          if (fresh.isEmpty) f
          else Filter((conjuncts ++ fresh).reduce(And), r)
        case None => f
      }
  }

  private def specOf(r: DataSourceV2Relation)
      : Option[(PartitionTransforms.Spec, Attribute, Attribute)] =
    r.table match {
      case t: GraftWritableTable =>
        t.transformSpec.flatMap { spec =>
          for {
            src <- r.output.find(_.name.equalsIgnoreCase(spec.source))
            gen <- r.output.find(_.name.equalsIgnoreCase(spec.genCol))
          } yield (spec, src, gen)
        }
      case _ => None
    }

  private def splitConj(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConj(l) ++ splitConj(r)
    case other => Seq(other)
  }

  private def isSrc(e: Expression, src: Attribute): Boolean = e match {
    case a: Attribute => a.semanticEquals(src)
    case _ => false
  }

  /** Eagerly render F(lit) for a foldable source-side expression:
    * the generated column's value for that constant, as a Literal —
    * pushdown needs a real literal, not a foldable subtree. None when
    * evaluation fails or yields NULL (skip, stay correct). */
  private def rendered(
      spec: PartitionTransforms.Spec, lit: Expression): Option[Literal] =
    try {
      spec.kind match {
        case "bucket" =>
          val e = Pmod(
            new org.apache.spark.sql.catalyst.expressions.Murmur3Hash(
              Seq(lit)),
            Literal(spec.n, IntegerType))
          Option(e.eval(null)).map(v => Literal(v, IntegerType))
        case k =>
          val fmt = k match {
            case "years" => "yyyy"
            case "months" => "yyyy-MM"
            case "days" => "yyyy-MM-dd"
            case "hours" => "yyyy-MM-dd-HH"
          }
          val e = org.apache.spark.sql.catalyst.expressions
            .DateFormatClass(lit, Literal(fmt),
              Some(session.sessionState.conf.sessionLocalTimeZone))
          Option(e.eval(null)).map(v => Literal(v, StringType))
      }
    } catch { case _: Exception => None }

  /** The derived conjunct for one top-level conjunct, if its shape is
    * mappable. Ranges only map for the monotonic time transforms;
    * bucket maps equality/IN only. */
  private def mapConjunct(
      c: Expression,
      spec: PartitionTransforms.Spec,
      src: Attribute,
      gen: Attribute): Option[Expression] = {
    val timeKind = spec.kind != "bucket"
    def lower(l: Expression) = // src >= l  ⇒  gen >= F(l)
      if (timeKind && l.foldable)
        rendered(spec, l).map(GreaterThanOrEqual(gen, _))
      else None
    def upper(l: Expression) = // src <= l  ⇒  gen <= F(l)
      if (timeKind && l.foldable)
        rendered(spec, l).map(LessThanOrEqual(gen, _))
      else None
    c match {
      case EqualTo(a, l) if isSrc(a, src) && l.foldable =>
        rendered(spec, l).map(EqualTo(gen, _))
      case EqualTo(l, a) if isSrc(a, src) && l.foldable =>
        rendered(spec, l).map(EqualTo(gen, _))
      case EqualNullSafe(a, l) if isSrc(a, src) && l.foldable =>
        rendered(spec, l).map(EqualTo(gen, _))
      case EqualNullSafe(l, a) if isSrc(a, src) && l.foldable =>
        rendered(spec, l).map(EqualTo(gen, _))
      case GreaterThan(a, l) if isSrc(a, src) => lower(l)
      case GreaterThanOrEqual(a, l) if isSrc(a, src) => lower(l)
      case LessThan(l, a) if isSrc(a, src) => lower(l)
      case LessThanOrEqual(l, a) if isSrc(a, src) => lower(l)
      case LessThan(a, l) if isSrc(a, src) => upper(l)
      case LessThanOrEqual(a, l) if isSrc(a, src) => upper(l)
      case GreaterThan(l, a) if isSrc(a, src) => upper(l)
      case GreaterThanOrEqual(l, a) if isSrc(a, src) => upper(l)
      case In(a, lits) if isSrc(a, src) && lits.nonEmpty &&
          lits.forall(_.foldable) =>
        val vals = lits.map(rendered(spec, _))
        if (vals.forall(_.isDefined))
          Some(In(gen, vals.flatten.distinct))
        else None
      case _ => None
    }
  }
}
