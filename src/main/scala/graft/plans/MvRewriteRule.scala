package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Add, Alias, AttributeReference, Cast, Coalesce, Divide, Expression, Floor, Literal, Multiply, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Average, Count, Max, Min, Sum}
import org.apache.spark.sql.execution.datasources.HadoopFsRelation
import org.apache.spark.sql.types.DoubleType
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.internal.SQLConf

/** Materialized-view query rewrite (the `Rule[LogicalPlan]` tier of the
  * extension ladder, like [[ApproxNdvRule]]): when
  * `spark.graft.mv.lineitem.path` points at a [[graft.engine.MatView]]
  * summary, any eligible aggregate over the lineitem BASE relation is
  * transparently redirected to the view — the query text doesn't
  * change, the answer doesn't change, the scan shrinks by the cell
  * fan-in (~10⁴× at warehouse scale).
  *
  * Eligibility (all checked, else the plan passes through untouched):
  *  - the subtree is Aggregate over optional pruning-Projects/Filters
  *    over a parquet relation with lineitem's exact column signature;
  *  - grouping keys are plain columns ⊆ the view's dimensions;
  *  - every filter references dimensions only (a predicate on a
  *    non-dimension column can't be answered post-aggregation);
  *  - every aggregate call is COUNT(literal), SUM / AVG / MIN /
  *    MAX(l_quantity), or the exact-cents revenue sum
  *    SUM(floor(l_extendedprice·100 + 0.5)) — all re-aggregable from
  *    the five states the view carries. COUNT becomes SUM(mv_cnt)
  *    (coalesced to 0 for the empty-input edge); the cents sum becomes
  *    SUM(mv_sum_price_cents); SUM(l_quantity) re-sums the partial
  *    sums, which the alias remapping below routes to
  *    `mv_sum_l_quantity` unchanged; AVG re-derives as
  *    Σ partial-sums / Σ partial-counts; MIN/MAX fold the cell
  *    minima/maxima (monoids, like the sums).
  *
  * Mechanics: the view relation is wrapped in a Project that aliases
  * each view column to the ORIGINAL base attribute's exprId, so the
  * untouched grouping keys, filters, and Sum children resolve against
  * the view without rewriting them — only Count nodes change shape.
  * The rewrite is idempotent (the view's signature has mv_ columns, so
  * the rewritten subtree can't match again) and runs per-query, so a
  * session flips the conf on/off at will.
  */
object MvRewriteRule extends Rule[LogicalPlan] {

  val PathKey = "spark.graft.mv.lineitem.path"

  /** Root path of the BASE table the view was built from. The rewrite
    * only fires on relations whose file-source root matches — a column
    * signature alone would silently answer a schema-identical relation
    * holding DIFFERENT data (another scale factor, a persisted subset)
    * from the wrong view (ADVICE r11). Set alongside [[PathKey]] by the
    * view builder; when unset the rule never fires.
    */
  val BaseKey = "spark.graft.mv.lineitem.base"

  private val lineitemSig = Set("l_orderkey", "l_partkey", "l_suppkey",
    "l_linenumber", "l_quantity", "l_extendedprice", "l_discount", "l_tax",
    "l_returnflag", "l_linestatus", "l_shipdate")

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val path = SQLConf.get.getConfString(PathKey, "")
    val base = SQLConf.get.getConfString(BaseKey, "")
    if (path.isEmpty || base.isEmpty) plan
    else plan.transformUp {
      case agg: Aggregate => tryRewrite(agg, path, base).getOrElse(agg)
    }
  }

  /** Does this relation scan exactly the conf'd base table? Compared on
    * the file source's root paths (URI-normalized), not column names.
    */
  private def isBaseRelation(rel: LogicalRelation, base: String): Boolean =
    rel.relation match {
      case fs: HadoopFsRelation =>
        val want = new org.apache.hadoop.fs.Path(base).toUri.getPath
        val roots = fs.location.rootPaths.map(_.toUri.getPath)
        roots.nonEmpty && roots.forall(r => r == want || r.startsWith(want + "/"))
      case _ => false
    }

  private def tryRewrite(agg: Aggregate, mvPath: String,
      basePath: String): Option[LogicalPlan] = {
    // unwrap pruning Projects / Filters down to the base relation,
    // keeping the filter conditions in application order (outermost
    // first — re-applied below in the same nesting)
    var filters = List.empty[Expression]
    var cur: LogicalPlan = agg.child
    var ok = true
    while (ok && !cur.isInstanceOf[LogicalRelation]) cur = cur match {
      case Project(list, child) if list.forall(_.isInstanceOf[AttributeReference]) =>
        child
      case Filter(cond, child) => filters = filters :+ cond; child
      case _ => ok = false; cur
    }
    if (!ok) return None
    val rel = cur.asInstanceOf[LogicalRelation]
    if (rel.output.map(_.name).toSet != lineitemSig) return None
    if (!isBaseRelation(rel, basePath)) return None

    val dims = graft.engine.MatView.lineitemDims.toSet
    val baseByName = rel.output.map(a => a.name -> a).toMap
    // grouping keys: plain dimension columns only
    if (!agg.groupingExpressions.forall {
      case a: AttributeReference => dims(a.name)
      case _ => false
    }) return None
    // filters touch dimensions only
    if (!filters.forall(_.references.forall(a => dims(a.name)))) return None

    // every aggregate call must be COUNT(literal) or SUM(l_quantity),
    // plain (no DISTINCT / FILTER clause); everything outside aggregate
    // calls may reference dimensions only
    val aggCalls = agg.aggregateExpressions.flatMap(_.collect {
      case ae: AggregateExpression => ae
    })
    // the exact-cents revenue idiom, as the optimizer folds it:
    // floor((l_extendedprice * 100.0) + 0.5) — LongType, so its partial
    // sums re-add exactly and SUM redirects to the precomputed column
    def isCents(e: Expression): Boolean = e match {
      case Floor(Add(Multiply(a: AttributeReference, Literal(h, _), _),
          Literal(half, _), _))
        if a.name == "l_extendedprice" && h == 100.0 && half == 0.5 => true
      case _ => false
    }
    val supported = aggCalls.forall {
      case AggregateExpression(Count(Seq(_: Literal)), _, false, None, _) => true
      case AggregateExpression(Sum(a: AttributeReference, _), _, false, None, _)
        if a.name == "l_quantity" => true
      case AggregateExpression(Sum(c, _), _, false, None, _) if isCents(c) => true
      // AVG(l_quantity) re-aggregates from the two states the view
      // already carries: Σ partial-sums / Σ partial-counts
      case AggregateExpression(Average(a: AttributeReference, _), _, false, None, _)
        if a.name == "l_quantity" && a.dataType == DoubleType => true
      // MIN/MAX are monoids the view carries as dedicated states
      case AggregateExpression(Min(a: AttributeReference), _, false, None, _)
        if a.name == "l_quantity" => true
      case AggregateExpression(Max(a: AttributeReference), _, false, None, _)
        if a.name == "l_quantity" => true
      case _ => false
    }
    if (!supported) return None
    val outsideRefs = agg.aggregateExpressions.flatMap(_.collect {
      case a: AttributeReference => a
    }).filterNot(a => aggCalls.exists(_.references.contains(a)))
    if (!outsideRefs.forall(a => dims(a.name))) return None

    // the view relation (fresh attribute ids), aliased back to the base
    // attribute ids so the plan above resolves unchanged
    val spark = SparkSession.active
    val mvRel = spark.read.parquet(mvPath).queryExecution.analyzed
    val mvByName = mvRel.output.map(a => a.name -> a).toMap
    if (!(dims + "mv_cnt" + "mv_sum_l_quantity" + "mv_sum_price_cents"
        + "mv_min_l_quantity" + "mv_max_l_quantity")
        .subsetOf(mvByName.keySet))
      return None
    val cntAttr = mvByName("mv_cnt")
    val priceAttr = mvByName("mv_sum_price_cents")
    val minAttr = mvByName("mv_min_l_quantity")
    val maxAttr = mvByName("mv_max_l_quantity")
    val aliases: Seq[NamedExpression] =
      dims.toSeq.sorted.map { d =>
        Alias(mvByName(d), d)(exprId = baseByName(d).exprId)
      } :+ Alias(mvByName("mv_sum_l_quantity"), "l_quantity")(
        exprId = baseByName("l_quantity").exprId) :+ cntAttr :+ priceAttr :+
        minAttr :+ maxAttr
    val mvProject = Project(aliases, mvRel)
    val newChild = filters.foldRight(mvProject: LogicalPlan)(Filter(_, _))

    val newAggExprs = agg.aggregateExpressions.map(_.transform {
      case ae @ AggregateExpression(Count(Seq(_: Literal)), _, false, None, _) =>
        // COUNT(*) over base rows = Σ mv_cnt; coalesce for the global-
        // aggregate-over-empty-input edge where COUNT is 0 but SUM null
        Coalesce(Seq(ae.copy(aggregateFunction = Sum(cntAttr)), Literal(0L)))
      case ae @ AggregateExpression(Sum(c, _), _, false, None, _) if isCents(c) =>
        ae.copy(aggregateFunction = Sum(priceAttr)) // re-sum exact partials
      case ae @ AggregateExpression(Average(a: AttributeReference, _), _, false, None, _)
          if a.name == "l_quantity" =>
        // AVG = Σ partial-sums / Σ partial-counts (the alias remap below
        // already routes `a` to mv_sum_l_quantity); the double division
        // reproduces Average's sum/count semantics exactly, including
        // null over empty input (Sum is null there)
        Divide(ae.copy(aggregateFunction = Sum(a)),
          Cast(ae.copy(aggregateFunction = Sum(cntAttr)), DoubleType))
      case ae @ AggregateExpression(Min(a: AttributeReference), _, false, None, _)
          if a.name == "l_quantity" =>
        ae.copy(aggregateFunction = Min(minAttr)) // min of cell minima
      case ae @ AggregateExpression(Max(a: AttributeReference), _, false, None, _)
          if a.name == "l_quantity" =>
        ae.copy(aggregateFunction = Max(maxAttr)) // max of cell maxima
    }.asInstanceOf[NamedExpression])
    Some(agg.copy(aggregateExpressions = newAggExprs, child = newChild))
  }

  /** Idempotently attach to a live session via experimental methods. */
  def register(spark: SparkSession): Unit = {
    val ex = spark.experimental
    if (!ex.extraOptimizations.contains(MvRewriteRule))
      ex.extraOptimizations = ex.extraOptimizations :+ MvRewriteRule
  }
}
