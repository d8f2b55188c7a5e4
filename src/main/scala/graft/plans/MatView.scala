package graft.plans

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference,
  Cast, Coalesce, Expression, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{
  AggregateExpression, Count, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan,
  Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation,
  LogicalRelation}
import org.apache.spark.sql.types.DataType

/** Materialized-view rewrite — the one capability in the engine that
  * genuinely needs a custom Catalyst `Rule[LogicalPlan]` (SURVEY §4's
  * "none needed for §2" decision stands; this is the beyond-§2
  * warehouse tier): an aggregation written against a BASE table is
  * transparently re-planned onto a pre-aggregated view when the view
  * can answer it, the way warehouse engines serve dashboard rollups
  * without touching the fact table. At 100 TB the difference is a
  * full fact scan vs a read of |group cells| rows.
  *
  * Scope (deliberately narrow — every condition is checked, no partial
  * rewrites): the query must be `Aggregate(G, out, scan(base))` (an
  * attribute-only Project in between is looked through; a Filter
  * BLOCKS the rewrite — the view has no row-level data), with G a
  * subset of the view's grouping columns (rollup queries re-aggregate
  * the partials), and every output either a grouping attribute or an
  * alias of SUM(x)/COUNT(1) covered by a registered partial. SUM
  * re-aggregates as SUM(sum_partial); COUNT re-aggregates as
  * SUM(cnt_partial) coalesced to 0 so the output keeps COUNT's
  * non-null contract. Exactness: registered SUM inputs carry their
  * decimal cast (the money discipline) — decimal addition is exact and
  * order-independent, so partial-of-partials ≡ one-pass, which is what
  * `mv_rewrite`'s oracle hash-verifies against the BASE-table SQL.
  *
  * Output stability: the rewritten Aggregate reproduces the original
  * output attributes — same names, types, AND exprIds (every rewritten
  * column is an `Alias(..., name)(exprId = original)`) — so nothing
  * above the node (sorts, projections, the write) sees any change.
  * Installed via [[graft.GraftExtensions]] (`injectOptimizerRule`);
  * inert unless a view is registered for the scanned path, so the
  * other 200+ registry plans are untouched (views register against
  * dedicated base paths). `MatViewSpec` pins: the rewritten plan scans
  * ONLY the view, results equal the pre-registration run, and
  * filter/uncovered-agg/distinct shapes are NOT rewritten. */
object MatView {

  /** One covered aggregate: `func` ("sum" | "count") over base column
    * `inputCol` (sum only; cast to `castTo` when present — the match is
    * exact, a differently-cast sum is NOT covered), stored in view
    * column `mvCol`. */
  final case class AggSpec(func: String, inputCol: String,
      castTo: Option[DataType], mvCol: String)

  /** A registered view: pre-aggregation of `basePath` at `groupCols`
    * granularity, stored at `mvPath`. */
  final case class MvDef(basePath: String, mvPath: String,
      groupCols: Seq[String], aggs: Seq[AggSpec])

  private val catalog = TrieMap.empty[String, MvDef]

  /** Scheme-normalized path key: a file index reports its root paths
    * with the URI scheme (`file:/tmp/...`) while callers register the
    * raw filesystem path — both must land on one key. */
  private def norm(p: String): String =
    p.stripPrefix("file:").stripSuffix("/")

  def register(d: MvDef): Unit = catalog.put(norm(d.basePath), d)
  def deregister(basePath: String): Unit = catalog.remove(norm(basePath))
  private[plans] def lookup(paths: Seq[String]): Option[MvDef] =
    paths.map(norm).flatMap(catalog.get).headOption

  /** The rewrite rule. One instance per session via
    * `injectOptimizerRule` — runs in the operator-optimization batch,
    * after resolution, so it sees typed attributes and can preserve
    * their ids. Fixed-point safe: the rewritten child is the view
    * relation, whose path is never registered as a base. */
  final case class MvRewrite(session: SparkSession)
      extends Rule[LogicalPlan] {

    override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
      case agg @ Aggregate(groups, out, child, _) =>
        (for {
          paths <- scanPaths(child)
          mv <- lookup(paths)
          rewritten <- rewrite(groups, out, mv)
        } yield rewritten).getOrElse(agg)
    }

    /** Root paths of a bare file scan (or attribute-only Project over
      * one). Anything else — Filter, computed Project, joins — is not
      * answerable from the view and blocks the rewrite. */
    private def scanPaths(p: LogicalPlan): Option[Seq[String]] = p match {
      case Project(projList, rel)
          if projList.forall(_.isInstanceOf[AttributeReference]) =>
        scanPaths(rel)
      case l: LogicalRelation => l.relation match {
        case fs: HadoopFsRelation =>
          Some(fs.location.rootPaths.map(_.toString))
        case _ => None
      }
      case _ => None
    }

    private def rewrite(groups: Seq[Expression],
        out: Seq[NamedExpression], mv: MvDef): Option[LogicalPlan] = {
      // a FRESH analyzed relation per rewrite: reusing one plan across
      // queries would collide attribute ids
      val mvPlan = session.read.parquet(mv.mvPath).queryExecution.analyzed
      def mvAttr(name: String): Option[AttributeReference] =
        mvPlan.output.collectFirst {
          case a: AttributeReference if a.name == name => a
        }
      val groupAttrs: Option[Seq[AttributeReference]] =
        groups.foldLeft(Option(Seq.empty[AttributeReference])) {
          case (acc, g: AttributeReference)
              if mv.groupCols.contains(g.name) =>
            acc.flatMap(s => mvAttr(g.name).map(s :+ _))
          case _ => None
        }
      def coveredSum(c: Expression): Option[AggSpec] = c match {
        case a: AttributeReference => mv.aggs.find(sp =>
          sp.func == "sum" && sp.inputCol == a.name && sp.castTo.isEmpty)
        case cast: Cast => cast.child match {
          case a: AttributeReference => mv.aggs.find(sp =>
            sp.func == "sum" && sp.inputCol == a.name &&
              sp.castTo.contains(cast.dataType))
          case _ => None
        }
        case _ => None
      }
      def rewriteOne(ne: NamedExpression): Option[NamedExpression] =
        ne match {
          case a: AttributeReference if groups.exists {
              case g: AttributeReference => g.exprId == a.exprId
              case _ => false
            } =>
            mvAttr(a.name).map(m => Alias(m, a.name)(exprId = a.exprId))
          case al @ Alias(ae: AggregateExpression, name)
              if !ae.isDistinct && ae.filter.isEmpty =>
            ae.aggregateFunction match {
              case s: Sum =>
                for {
                  spec <- coveredSum(s.child)
                  m <- mvAttr(spec.mvCol)
                  reagg = Sum(m).toAggregateExpression()
                } yield Alias(
                  if (reagg.dataType == al.dataType) reagg
                  else Cast(reagg, al.dataType),
                  name)(exprId = al.exprId)
              case c: Count if c.children.forall(_.isInstanceOf[Literal]) =>
                for {
                  spec <- mv.aggs.find(_.func == "count")
                  m <- mvAttr(spec.mvCol)
                } yield Alias(
                  Coalesce(Seq(Sum(m).toAggregateExpression(),
                    Literal(0L))),
                  name)(exprId = al.exprId)
              case _ => None
            }
          case _ => None
        }
      for {
        ga <- groupAttrs
        newOut <- out.foldLeft(Option(Seq.empty[NamedExpression])) {
          (acc, ne) => acc.flatMap(s => rewriteOne(ne).map(s :+ _))
        }
      } yield Aggregate(ga, newOut, mvPlan, None)
    }
  }
}
