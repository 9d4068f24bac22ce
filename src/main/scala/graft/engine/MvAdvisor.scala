package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, EqualTo, Expression, IsNotNull, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, Join, LogicalPlan, Project}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Materialized-view ADVISOR — the missing middle of the loop the repo
  * already has both ends of: [[WorkloadCse]] mines repeated subplans
  * (SparkCruise's find half) and [[graft.plans.MvRewriteRule]] answers
  * queries from a registry view (the use half); this synthesizes the
  * registry ENTRY in between. Given a named workload, it classifies
  * every Aggregate whose subtree is view-shaped — optional pruning
  * Projects / Filters over a single parquet relation, or over an INNER
  * equi-join of two — and folds the family into one candidate per base:
  * the union of grouping + filter dimensions (the view grain that
  * answers every query in the family) and the set of aggregate calls
  * seen (the states the view must carry).
  *
  * Metadata plane only — analyzed/optimized plans, nothing executes.
  * The output is what a warehouse operator reviews before adding a
  * [[MvViewDef]]/[[MvJoinViewDef]]: "these N dashboard queries would all
  * be answered by a view on THIS base at THIS grain." At 100 TB the
  * advisor is how a 300-query workload's view catalog stays grounded in
  * measured repetition instead of guesswork.
  */
object MvAdvisor {

  /** One synthesized candidate: `base` renders the scan root (or
    * `left ⋈ right ON lKey = rKey`), `dims` is the union grain, `aggs`
    * the distinct aggregate calls (canonical text), `queries` the
    * family members it would answer.
    */
  final case class ViewCandidate(
      base: String,
      dims: Seq[String],
      aggs: Seq[String],
      queries: Seq[String])

  private def rootPath(rel: LogicalRelation): Option[String] =
    rel.relation match {
      case fs: HadoopFsRelation =>
        fs.location.rootPaths.headOption.map(_.toString)
      case _ => None
    }

  /** Unwrap pruning Projects / Filters; collect filter conjuncts. */
  private def unwrap(p: LogicalPlan): Option[(LogicalPlan, Seq[Expression])] = {
    var fs = Seq.empty[Expression]
    var c = p
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(l, r) => conjuncts(l) ++ conjuncts(r)
      case other => Seq(other)
    }
    var done = false
    while (!done) c match {
      case Project(list, child)
        if list.forall(_.isInstanceOf[AttributeReference]) => c = child
      case Filter(cond, child) => fs = fs ++ conjuncts(cond); c = child
      case _ => done = true
    }
    Some((c, fs))
  }

  /** Classify one Aggregate: Some((base, dims, aggs)) when view-shaped. */
  private def classify(agg: Aggregate): Option[(String, Set[String], Set[String])] = {
    val (core, filters) = unwrap(agg.child).get
    val groupDims = agg.groupingExpressions.flatMap {
      case a: AttributeReference => Some(a.name)
      case _ => None
    }
    if (groupDims.size != agg.groupingExpressions.size) return None
    val aggCalls = agg.aggregateExpressions.flatMap(_.collect {
      case ae: AggregateExpression => ae
    })
    if (aggCalls.isEmpty || aggCalls.exists(ae => ae.isDistinct || ae.filter.nonEmpty))
      return None
    val aggTexts = aggCalls.map(ae => ae.aggregateFunction.sql(isDistinct = false))
    core match {
      case rel: LogicalRelation =>
        val base = rootPath(rel).getOrElse(return None)
        val fDims = filters.flatMap(_.references.map(_.name))
        Some((base, (groupDims ++ fDims).toSet, aggTexts.toSet))
      case Join(l, r, Inner, Some(cond), _) =>
        val (lc, lf) = unwrap(l).get
        val (rc, rf) = unwrap(r).get
        (lc, rc) match {
          case (lr: LogicalRelation, rr: LogicalRelation) =>
            val keys = cond match {
              case EqualTo(a: AttributeReference, b: AttributeReference) =>
                Seq(a.name, b.name).sorted
              case _ => return None
            }
            val lp = rootPath(lr).getOrElse(return None)
            val rp = rootPath(rr).getOrElse(return None)
            val base = (if (lp <= rp) Seq(lp, rp) else Seq(rp, lp))
              .mkString(" ⋈ ") + s" ON ${keys.mkString(" = ")}"
            // inferred IsNotNull(joinkey) guards are join plumbing, not grain
            val fDims = (filters ++ lf ++ rf).filterNot {
              case IsNotNull(a: AttributeReference) => keys.contains(a.name)
              case _ => false
            }.flatMap(_.references.map(_.name))
            Some((base, (groupDims ++ fDims).toSet, aggTexts.toSet))
          case _ => None
        }
      case _ => None
    }
  }

  /** The advisor: one candidate per base, dims/aggs unioned over the
    * family, ranked by family size (descending, then base).
    */
  def advise(frames: Map[String, DataFrame]): Seq[ViewCandidate] = {
    val hits = frames.toSeq.flatMap { case (name, df) =>
      df.queryExecution.optimizedPlan.collect { case a: Aggregate => a }
        .flatMap(classify).map { case (base, dims, aggs) =>
          (base, dims, aggs, name)
        }
    }
    hits.groupBy(_._1).toSeq.map { case (base, family) =>
      ViewCandidate(base,
        family.flatMap(_._2).distinct.sorted,
        family.flatMap(_._3).distinct.sorted,
        family.map(_._4).distinct.sorted)
    }.sortBy(c => (-c.queries.size, c.base))
  }

  /** CLI entry: `runMain graft.engine.MvAdvisor <sfDir> <query...>` —
    * prints the view candidates for the named SparkEntry queries.
    */
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args.drop(1).toSeq
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val frames = names.map(n => n -> graft.SparkEntry.queries(n)(spark, sfDir)).toMap
    advise(frames).foreach { c =>
      println(s"[mv-advisor] base=${c.base} dims=${c.dims.mkString(",")} " +
        s"aggs=${c.aggs.mkString(";")} queries=${c.queries.mkString(",")}")
    }
    spark.stop()
  }
}
