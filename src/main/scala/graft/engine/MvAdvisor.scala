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

  /** Close the find → BUILD → REGISTER loop (VERDICT r13 item 4): turn
    * one advisor row into a live view the [[graft.plans.MvRewriteRule]]
    * answers from — synthesize the [[MvViewDef]]/[[MvJoinViewDef]] from
    * the candidate (grain = the advised dims; states inferred from the
    * advised aggregate calls: each plain `sum/avg/min/max(col)` text is
    * a measure — one state per advised column, so a multi-measure
    * dashboard family materializes ONCE — and the exact-cents idiom
    * `sum(FLOOR(col * 100.0 + 0.5))` is the cents state), build the
    * summary with the SAME builders the
    * hand registry uses, write it to `mvPath`, register the def in the
    * dynamic catalog, and set its conf keys so the rewrite arms
    * immediately. Returns the def (Left = single-table, Right = join).
    *
    * The candidate's `base` string is the advisor's own rendering —
    * qualified root path(s), join key names sorted — so everything the
    * build needs is recovered from it plus the base tables' schemas
    * (key → side assignment is by column membership; TPC-H-style
    * prefixes make that unambiguous, and the require trips if not).
    */
  def materialize(spark: SparkSession, c: ViewCandidate, name: String,
      mvPath: String): Either[MvViewDef, MvJoinViewDef] = {
    // one SUM/MIN/MAX/CNTNN state per advised measure — MatView carries
    // any number of measure states per view (VERDICT r14 item 2: the
    // real dashboard tier is multi-measure on day one)
    val measures = c.aggs.flatMap {
      case MeasureAggRe(_, m) => Some(m)
      case _ => None
    }.distinct.sorted
    val cents = c.aggs.flatMap(centsColOf).distinct
    require(cents.size <= 1, s"multiple cents states advised: $cents")
    if (!c.base.contains(" ⋈ ")) {
      val (dir, table) = splitTablePath(c.base)
      val base = Tables.load(spark, dir, table)
      val cols = base.columns.toSet
      require(c.dims.forall(cols), s"advised dims ${c.dims} not all in $table")
      // an advised state missing from the base schema is a synthesis bug,
      // not a state to drop silently (ADVICE r14): the view would build
      // without it and the rewrite would quietly never fire
      require(measures.forall(cols),
        s"advised measures $measures not all in $table")
      require(cents.forall(cols), s"advised cents $cents not in $table")
      val d = MvViewDef(name, cols, c.dims, measures, cents.headOption)
      MatView.aggregate(base, d).write.mode("overwrite").parquet(mvPath)
      MatView.register(d)
      spark.conf.set(d.pathKey, mvPath)
      spark.conf.set(d.baseKey, c.base)
      Left(d)
    } else {
      val Array(basesPart, keysPart) = c.base.split(" ON ", 2)
      val Array(p1, p2) = basesPart.split(" ⋈ ", 2)
      val keys = keysPart.split(" = ", 2).map(_.trim)
      val (d1, t1) = splitTablePath(p1.trim)
      val (d2, t2) = splitTablePath(p2.trim)
      val f1 = Tables.load(spark, d1, t1)
      val f2 = Tables.load(spark, d2, t2)
      val c1 = f1.columns.toSet
      val c2 = f2.columns.toSet
      val k1 = keys.filter(c1).toSeq
      val k2 = keys.filter(c2).toSeq
      require(k1.size == 1 && k2.size == 1 && k1.head != k2.head,
        s"cannot assign join keys ${keys.toSeq} to sides unambiguously")
      require(c.dims.forall(dc => c1(dc) || c2(dc)),
        s"advised dims ${c.dims} not all in $t1/$t2")
      require(measures.forall(m => c1(m) || c2(m)),
        s"advised measures $measures not all in $t1/$t2")
      require(cents.forall(m => c1(m) || c2(m)),
        s"advised cents $cents not in $t1/$t2")
      val d = MvJoinViewDef(name, t1, c1, k1.head, t2, c2, k2.head, c.dims,
        measures, cents.headOption)
      MatView.aggregateJoin(f1, f2, d).write.mode("overwrite").parquet(mvPath)
      MatView.registerJoin(d)
      spark.conf.set(d.pathKey, mvPath)
      spark.conf.set(d.leftBaseKey, p1.trim)
      spark.conf.set(d.rightBaseKey, p2.trim)
      Right(d)
    }
  }

  /** `sum(col)` / `avg(col)` / `min(col)` / `max(col)` over a bare
    * column — the aggregate texts a measure state answers. */
  private val MeasureAggRe = "(?i)(sum|avg|min|max)\\((\\w+)\\)".r

  /** Extract the column of the exact-cents idiom
    * `sum(FLOOR(col * 100.0 + 0.5))` from a canonical aggregate text
    * (parenthesization varies with the optimizer's rendering, so this
    * matches structurally: sum-of-floor containing `col * 100.0`).
    */
  private[engine] def centsColOf(agg: String): Option[String] = {
    val a = agg.toLowerCase
    if (!(a.startsWith("sum(floor(") && a.contains("100.0"))) None
    else "[a-z_][a-z0-9_]*".r.findAllIn(a.stripPrefix("sum(floor("))
      .find(t => t != "floor" && t != "cast" && t != "as" &&
        t != "double" && t != "bigint")
  }

  /** Split a qualified table root ("…/sf0.01/part.parquet") into the
    * (directory, table-name) pair [[Tables.load]] expects. */
  private def splitTablePath(p: String): (String, String) = {
    val cut = p.lastIndexOf('/')
    require(cut > 0 && p.endsWith(".parquet"), s"not a table root path: $p")
    (p.substring(0, cut), p.substring(cut + 1).stripSuffix(".parquet"))
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
