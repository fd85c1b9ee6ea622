package graft.lake

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Expand, Filter, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation
import org.apache.spark.sql.types.DoubleType

/** Transparent materialized-view query rewriting: a Catalyst optimizer
  * rule that redirects matching grouped aggregates over a lake BASE table
  * to a registered [[MaterializedView]] — the classic answering-queries-
  * using-views rewrite (Goldstein & Larson, SIGMOD 2001), expressed as a
  * `Rule[LogicalPlan]` so any query — DataFrame or SQL — benefits without
  * the author knowing the view exists.
  *
  * A rewrite fires only when ALL of:
  *   - the aggregate's child is a plain latest-version lake batch scan of
  *     a registered base (no time travel / branch / change feed — their
  *     results differ from the view's snapshot by construction);
  *   - the view is CURRENT: its refresh cursor equals the base's head
  *     version (a stale view never answers; the check is metadata-only);
  *   - grouping expressions reference only view key columns (full key
  *     set, any subset, or derived expressions of keys — every view row
  *     is constant in all keys, so re-aggregation to any coarser grouping
  *     is exact);
  *   - residual Filter conditions reference only key columns (key
  *     predicates commute with the group-by: a view row's rows all share
  *     its key values). The lake scan keeps every pushed filter residual
  *     in the plan, so no predicate can hide inside the scan;
  *   - every aggregate translates losslessly: `count(*)` → `sum(mv_cnt)`,
  *     `sum(c)` → `sum(sum_c)`, `max(c)` → `max(max_c)`, `min(c)` →
  *     `min(min_c)`, `avg(c)` → `sum(sum_c)/sum(mv_cnt)` (only for
  *     non-nullable `c`, where row count equals value count); no
  *     DISTINCT, no FILTER clauses.
  *
  * At 100 TB this is the difference between a dashboard group-by reading
  * the whole fact table and reading a groups-sized view kept current for
  * CDF-delta cost — the scan swap happens in the optimizer, so pruning,
  * AQE and codegen all apply to the rewritten plan unchanged. */
object MvRewrite extends Rule[LogicalPlan] {

  final case class ViewDef(viewRoot: String, basePath: String,
      baseNorm: String, keys: Set[String], sumCols: Set[String],
      maxCols: Set[String], minCols: Set[String])

  /** A registered star-join view ([[JoinMaterializedView]]):
    * @param tables  normalized roots of fact + every dim (set equality
    *                against the query's scan set is the match gate)
    * @param joinPairs declared equi-join pairs as unordered
    *                `Set((norm, col), (norm, col))` — each query conjunct
    *                must hit one, and all must be hit
    * @param keyOf   (table norm, column name) → view column, for grouping
    *                and filter re-sourcing
    * @param sumCols/maxCols/minCols measure columns BY (fact norm, name) */
  final case class JoinViewDef(viewRoot: String, factNorm: String,
      tables: Set[String],
      joinPairs: Seq[Set[(String, String)]],
      keyOf: Map[(String, String), String],
      sumCols: Set[(String, String)], maxCols: Set[(String, String)],
      minCols: Set[(String, String)])

  // baseNorm -> rewrite candidates for that base, narrowest key set
  // first (so a query grouping on a subset is answered from the smallest
  // covering view). Re-registering a view root replaces its entry.
  private val registry = new ConcurrentHashMap[String, List[ViewDef]]()

  // fact norm -> join-view candidates whose fact it is
  private val joinRegistry =
    new ConcurrentHashMap[String, List[JoinViewDef]]()

  /** Register a view for rewriting and enable the rule in the session. */
  def register(spark: SparkSession, viewRoot: String): ViewDef = {
    val mv = MaterializedView.open(spark, viewRoot)
    val d = ViewDef(viewRoot, mv.base.root, norm(mv.base.root),
      mv.keys.toSet, mv.sumCols.toSet, mv.maxCols.toSet, mv.minCols.toSet)
    registry.merge(d.baseNorm, List(d), (old, add) =>
      (add ::: old.filterNot(_.viewRoot == d.viewRoot))
        .sortBy(_.keys.size))
    enable(spark)
    d
  }

  /** Register a star-join view for rewriting. The definition (fact, dims,
    * join pairs, exposed keys, measures) comes from the view's own
    * properties via [[JoinMaterializedView.open]]. */
  def registerJoin(spark: SparkSession, viewRoot: String): JoinViewDef = {
    val jmv = JoinMaterializedView.open(spark, viewRoot)
    val factNorm = norm(jmv.fact.root)
    val factCols = jmv.fact.read().columns.toSet
    val dimsN = jmv.dims.map { case (d, ds) => (d, norm(ds.root)) }
    val keyOf = jmv.keys.map { k =>
      val src: (String, String) =
        if (factCols.contains(k)) (factNorm, k)
        else dimsN.collectFirst {
          case (d, n) if d.expose.contains(k) => (n, k)
        }.getOrElse(throw new IllegalArgumentException(
          s"view key $k is neither a fact column nor an exposed dim column"))
      src -> k
    }.toMap
    val d = JoinViewDef(
      viewRoot = viewRoot,
      factNorm = factNorm,
      tables = (factNorm +: dimsN.map(_._2)).toSet,
      joinPairs = dimsN.map { case (dm, n) =>
        Set((factNorm, dm.factCol), (n, dm.dimCol)) },
      keyOf = keyOf,
      sumCols = jmv.sumCols.map(c => (factNorm, c)).toSet,
      maxCols = jmv.maxCols.map(c => (factNorm, c)).toSet,
      minCols = jmv.minCols.map(c => (factNorm, c)).toSet)
    require(d.tables.size == dimsN.size + 1,
      "fact and dim roots must be distinct for join matching")
    joinRegistry.merge(factNorm, List(d), (old, add) =>
      (add ::: old.filterNot(_.viewRoot == d.viewRoot))
        .sortBy(_.keyOf.size))
    enable(spark)
    d
  }

  def unregister(spark: SparkSession, viewRoot: String): Unit = {
    registry.replaceAll((_, ds) => ds.filterNot(_.viewRoot == viewRoot))
    registry.entrySet().removeIf(_.getValue.isEmpty)
    joinRegistry.replaceAll((_, ds) => ds.filterNot(_.viewRoot == viewRoot))
    joinRegistry.entrySet().removeIf(_.getValue.isEmpty)
  }

  /** Idempotently add this rule to the session's extra optimizations. */
  def enable(spark: SparkSession): Unit = synchronized {
    if (!spark.experimental.extraOptimizations.exists(_ eq this))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ this
  }

  private def norm(p: String): String =
    new org.apache.hadoop.fs.Path(p).toUri.toString.stripSuffix("/")

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (registry.isEmpty && joinRegistry.isEmpty) return plan
    plan.transformUp {
      case agg: Aggregate if agg.child.isInstanceOf[Expand] =>
        tryRewriteExpand(agg, agg.child.asInstanceOf[Expand]).getOrElse(agg)
      case agg: Aggregate =>
        tryRewrite(agg).orElse(tryRewriteJoin(agg)).getOrElse(agg)
    }
  }

  /** Unwrap optional attribute-only Project / residual Filter down to the
    * base scan; anything else is not a shape we can reason about. */
  private def unwrap(plan: LogicalPlan)
      : Option[(Option[Expression], DataSourceV2ScanRelation)] = plan match {
    case r: DataSourceV2ScanRelation => Some((None, r))
    case Filter(c, r: DataSourceV2ScanRelation) => Some((Some(c), r))
    case Project(pl, r: DataSourceV2ScanRelation)
        if pl.forall(_.isInstanceOf[AttributeReference]) => Some((None, r))
    case Project(pl, Filter(c, r: DataSourceV2ScanRelation))
        if pl.forall(_.isInstanceOf[AttributeReference]) => Some((Some(c), r))
    case _ => None
  }

  /** Normalized root of a PLAIN latest-version lake batch scan; None for
    * anything pinned (time travel / branch / change feed / rowid — their
    * results differ from any view snapshot by construction). */
  private def lakeRoot(rel: DataSourceV2ScanRelation): Option[String] = {
    val root = rel.relation.table match {
      // the table carries its own read options (catalog time travel lands
      // there, not on the relation), so the pinned check covers both doors
      case lt: LakeTable if !lt.isPinnedHandle => norm(lt.rootPath)
      case _ => return None
    }
    val opts = rel.relation.options
    if (Seq("changesFrom", "versionAsOf", "tag", "branch", "rowid")
        .exists(opts.containsKey)) return None
    Some(root)
  }

  /** Rewrite candidates for this scan, narrowest key set first; None when
    * the scan is not a plain latest-version batch read of a registered
    * base. */
  private def candidates(rel: DataSourceV2ScanRelation)
      : Option[List[ViewDef]] =
    lakeRoot(rel).flatMap(r => Option(registry.get(r)))

  private def tryRewrite(agg: Aggregate): Option[Aggregate] =
    for {
      (cond, rel) <- unwrap(agg.child)
      cands <- candidates(rel)
      res <- cands.iterator.flatMap(d => rewriteWith(agg, cond, rel, d))
        .nextOption()
    } yield res

  /** Freshness gate (metadata-only) + the view's scan relation: a stale
    * view never answers. */
  private def freshViewRel(d: ViewDef): Option[DataSourceV2ScanRelation] = {
    val spark = SparkSession.active
    val cursor = scala.util.Try(
      LakeDataset.open(spark, d.viewRoot).manifest
        .properties(MaterializedView.PropBaseVersion).toLong).toOption
    val head = scala.util.Try(
      LakeDataset.open(spark, d.basePath).version).toOption
    if (cursor.isEmpty || cursor != head) return None
    scala.util.Try(viewScanRelation(spark, d.viewRoot)).toOption.flatten
  }

  /** ROLLUP / CUBE / GROUPING SETS: the analyzer compiles them to
    * `Aggregate(keys + gid, aggs, Expand(rows, out, Project(base)))` —
    * one projection row per grouping set, value columns passed through
    * every row. The view substitutes SURGICALLY: the Project re-sources
    * key columns from the view (original exprIds kept, so the Expand
    * rows and the Aggregate's grouping side stay verbatim), value
    * passthrough positions are replaced by the view's partial-aggregate
    * columns, and each aggregate call folds exactly as in the flat path
    * (count(*)→sum(mv_cnt), sum→sum, max/min→max/min, avg for
    * non-nullable → sum/cnt). One view scan serves every grouping set —
    * at 100 TB a CUBE over the fact table becomes a CUBE over the
    * groups-sized view, Expand fan-out included. */
  private def tryRewriteExpand(agg: Aggregate, ex: Expand)
      : Option[Aggregate] = {
    // only grouping-analytics Expands (DISTINCT-agg Expands lack the id)
    if (!ex.output.exists(_.name == "spark_grouping_id")) return None
    for {
      (cond, rel) <- unwrap(ex.child)
      cands <- candidates(rel)
      res <- cands.iterator
        .flatMap(d => rewriteExpandWith(agg, ex, cond, rel, d))
        .nextOption()
    } yield res
  }

  private def rewriteExpandWith(agg: Aggregate, ex: Expand,
      cond: Option[Expression], rel: DataSourceV2ScanRelation,
      d: ViewDef): Option[Aggregate] = {
    val viewRel = freshViewRel(d).getOrElse(return None)
    val viewAttr = viewRel.output.map(a => a.name -> a).toMap
    val baseNameOf = rel.output.map(a => a.exprId -> a.name).toMap

    // classify each Expand output position
    val groupingOut = AttributeSet(
      agg.groupingExpressions.flatMap(_.references))
    val nPos = ex.output.size
    val keep = Array.fill(nPos)(false)
    // base key source attrs the kept grouping positions reference
    val keySrcs = scala.collection.mutable.LinkedHashMap
      .empty[ExprId, AttributeReference]
    (0 until nPos).foreach { p =>
      val entries = ex.projections.map(_(p))
      val o = ex.output(p)
      if (groupingOut.contains(o)) {
        if (entries.forall(_.isInstanceOf[Literal])) keep(p) = true // gid
        else {
          val srcs = entries.collect {
            case a: AttributeReference => a
          }.distinct
          val attrOrNull = entries.forall {
            case _: AttributeReference => true
            case Literal(null, _) => true
            case _ => false
          }
          // grouping position: one key-source attr, possibly nulled out
          if (srcs.size != 1 || !attrOrNull) return None
          val src = srcs.head
          if (!baseNameOf.get(src.exprId).exists(d.keys.contains))
            return None
          keySrcs.getOrElseUpdate(src.exprId, src)
          keep(p) = true
        }
      }
      // value passthrough positions: dropped; aggregates re-source below
    }

    // view partial-aggregate columns the rewritten aggregates read; each
    // becomes one Project alias + one passthrough Expand column
    val extra = scala.collection.mutable.LinkedHashMap
      .empty[String, AttributeReference]
    def need(viewCol: String): Option[AttributeReference] =
      viewAttr.get(viewCol).map { va =>
        extra.getOrElseUpdate(viewCol,
          AttributeReference(viewCol, va.dataType, nullable = true)())
      }
    def srcName(a: AttributeReference): Option[String] =
      baseNameOf.get(a.exprId)

    def translateAgg(ae: AggregateExpression): Option[Expression] = {
      if (ae.isDistinct || ae.filter.isDefined) return None
      ae.aggregateFunction match {
        case c: Count if c.children.forall(_.isInstanceOf[Literal]) =>
          need("mv_cnt").map(a =>
            Coalesce(Seq(Sum(a).toAggregateExpression(), Literal(0L))))
        case s: Sum => s.child match {
          case a: AttributeReference =>
            srcName(a).filter(d.sumCols.contains)
              .flatMap(n => need(s"sum_$n"))
              .map(x => Sum(x).toAggregateExpression())
          case _ => None
        }
        case m: Max => m.child match {
          case a: AttributeReference =>
            srcName(a).filter(d.maxCols.contains)
              .flatMap(n => need(s"max_$n"))
              .map(x => Max(x).toAggregateExpression())
          case _ => None
        }
        case m: Min => m.child match {
          case a: AttributeReference =>
            srcName(a).filter(d.minCols.contains)
              .flatMap(n => need(s"min_$n"))
              .map(x => Min(x).toAggregateExpression())
          case _ => None
        }
        case av: Average => av.child match {
          case a: AttributeReference if !a.nullable =>
            srcName(a).filter(d.sumCols.contains).flatMap { n =>
              for { s <- need(s"sum_$n"); c <- need("mv_cnt") } yield
                Divide(
                  Cast(Sum(s).toAggregateExpression(), DoubleType),
                  Cast(Sum(c).toAggregateExpression(), DoubleType))
            }
          case _ => None
        }
        case _ => None
      }
    }

    val keptOut = AttributeSet(
      (0 until nPos).filter(keep).map(ex.output(_)))
    def translate(e: Expression): Option[Expression] = e match {
      case ae: AggregateExpression => translateAgg(ae)
      case a: AttributeReference =>
        if (keptOut.contains(a)) Some(a) else None
      case l: Literal => Some(l)
      case other if other.children.nonEmpty && other.deterministic =>
        val kids = other.children.map(translate)
        if (kids.forall(_.isDefined))
          Some(other.withNewChildren(kids.map(_.get)))
        else None
      case _ => None
    }

    val newAggs = agg.aggregateExpressions.map {
      case a: AttributeReference if keptOut.contains(a) => Some(a)
      case al @ Alias(child, name) =>
        translate(child).map(nc =>
          Alias(nc, name)(exprId = al.exprId, qualifier = al.qualifier))
      case _ => None
    }
    if (newAggs.exists(_.isEmpty)) return None
    val sameTypes = newAggs.map(_.get).zip(agg.aggregateExpressions)
      .forall { case (n, o) => n.dataType == o.dataType }
    if (!sameTypes) return None

    // new Project: view keys re-aliased to the original base exprIds,
    // plus the partial-aggregate columns the translations requested
    def keyView(b: AttributeReference): Option[Attribute] =
      baseNameOf.get(b.exprId).filter(d.keys.contains).flatMap(viewAttr.get)
    val keyAliases = keySrcs.values.toSeq.map { b =>
      keyView(b).map(v => Alias(v, b.name)(exprId = b.exprId))
    }
    if (keyAliases.exists(_.isEmpty)) return None
    val extraAliases = extra.toSeq.map { case (colName, attr) =>
      Alias(viewAttr(colName), colName)(exprId = attr.exprId)
    }

    // residual filter: key predicates only, re-sourced to the view
    def condToView(e: Expression): Option[Expression] = e match {
      case a: AttributeReference => keyView(a)
      case l: Literal => Some(l)
      case other if other.children.nonEmpty && other.deterministic =>
        val kids = other.children.map(condToView)
        if (kids.forall(_.isDefined))
          Some(other.withNewChildren(kids.map(_.get)))
        else None
      case _ => None
    }
    val viewChild: LogicalPlan = cond match {
      case None => viewRel
      case Some(c) => Filter(condToView(c).getOrElse(return None), viewRel)
    }
    val newProject =
      Project(keyAliases.map(_.get) ++ extraAliases, viewChild)

    val keptIdx = (0 until nPos).filter(keep)
    val extraAttrs = extra.values.toSeq
    val newRows = ex.projections.map(row =>
      keptIdx.map(row(_)) ++ extraAttrs)
    val newOut = keptIdx.map(ex.output(_)) ++ extraAttrs
    val newExpand = Expand(newRows, newOut, newProject)
    Some(Aggregate(
      agg.groupingExpressions, newAggs.map(_.get), newExpand))
  }

  // ------------------------------------------------------ star-join views

  /** Flatten an inner-join tree down to (filters, join conditions, scans);
    * attribute-only Projects are transparent, anything else aborts. */
  private def flattenJoin(p: LogicalPlan): Option[(List[Expression],
      List[Expression], List[DataSourceV2ScanRelation])] = p match {
    case Join(l, r, Inner, cond, _) =>
      for {
        (fl, jl, sl) <- flattenJoin(l)
        (fr, jr, sr) <- flattenJoin(r)
      } yield (fl ++ fr, cond.toList ++ jl ++ jr, sl ++ sr)
    case Filter(c, child) =>
      flattenJoin(child).map { case (f, j, s) => (c :: f, j, s) }
    case Project(pl, child) if pl.forall(_.isInstanceOf[AttributeReference]) =>
      flattenJoin(child)
    case r: DataSourceV2ScanRelation => Some((Nil, Nil, List(r)))
    case _ => None
  }

  private def splitConj(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConj(l) ++ splitConj(r)
    case other => Seq(other)
  }

  /** Aggregate over an inner-join tree of lake scans → answered from a
    * registered star-join view when the scan set, the equi-join pairs,
    * the grouping/filter columns and every aggregate all match the view
    * definition (Goldstein & Larson §3's SPJG containment, specialized to
    * exact star-shape match). */
  private def tryRewriteJoin(agg: Aggregate): Option[Aggregate] = {
    if (joinRegistry.isEmpty) return None
    for {
      (filters, joinConds, scans) <- flattenJoin(agg.child)
      if scans.size >= 2
      roots <- {
        val rs = scans.map(lakeRoot)
        if (rs.forall(_.isDefined)) Some(rs.map(_.get)) else None
      }
      // every table exactly once (self-joins don't match a star view)
      if roots.distinct.size == roots.size
      cands <- roots.iterator.flatMap(r => Option(joinRegistry.get(r)))
        .nextOption()
      res <- cands.iterator
        .filter(_.tables == roots.toSet)
        .flatMap(d =>
          rewriteJoinWith(agg, filters, joinConds, scans, roots, d))
        .nextOption()
    } yield res
  }

  /** Freshness gate for a join view: fact cursor == fact head AND every
    * dim version vector entry == that dim's head. Metadata-only. */
  private def freshJoinViewRel(d: JoinViewDef)
      : Option[DataSourceV2ScanRelation] = {
    val spark = SparkSession.active
    scala.util.Try {
      val jmv = JoinMaterializedView.open(spark, d.viewRoot)
      val current = jmv.factVersion == jmv.fact.version &&
        jmv.dimVersions == jmv.dims.map(_._2.version)
      if (current) viewScanRelation(spark, d.viewRoot) else None
    }.toOption.flatten
  }

  private def rewriteJoinWith(agg: Aggregate, filters: List[Expression],
      joinConds: List[Expression], scans: List[DataSourceV2ScanRelation],
      roots: List[String], d: JoinViewDef): Option[Aggregate] = {
    // (exprId → (table norm, column name)) across every scan in the tree
    val srcOf: Map[ExprId, (String, String)] =
      scans.zip(roots).flatMap { case (s, r) =>
        s.output.map(a => a.exprId -> ((r, a.name)))
      }.toMap

    // Join conditions: each conjunct must be an equality on exactly one
    // declared pair; all declared pairs must be hit (every dim joined the
    // way the view joined it), and nothing else may hide in the ON.
    val conjs = joinConds.flatMap(splitConj)
    val matched = scala.collection.mutable.Set.empty[Int]
    conjs.foreach {
      case EqualTo(a: AttributeReference, b: AttributeReference) =>
        val pair = Set(srcOf.getOrElse(a.exprId, return None),
          srcOf.getOrElse(b.exprId, return None))
        val idx = d.joinPairs.indexOf(pair)
        if (idx < 0) return None
        matched += idx
      case _ => return None
    }
    if (matched.size != d.joinPairs.size) return None

    val viewRel = freshJoinViewRel(d).getOrElse(return None)
    val viewAttr = viewRel.output.map(a => a.name -> a).toMap

    def keyAttr(a: AttributeReference): Option[AttributeReference] =
      srcOf.get(a.exprId).flatMap(d.keyOf.get).flatMap(viewAttr.get)

    def sumOf(name: String): Option[Expression] =
      viewAttr.get(name).map(v => Sum(v).toAggregateExpression())

    def measure(a: AttributeReference,
        set: Set[(String, String)]): Option[String] =
      srcOf.get(a.exprId).filter(set.contains).map(_._2)

    def translateAgg(ae: AggregateExpression): Option[Expression] = {
      if (ae.isDistinct || ae.filter.isDefined) return None
      ae.aggregateFunction match {
        case c: Count if c.children.forall(_.isInstanceOf[Literal]) =>
          sumOf("mv_cnt").map(s => Coalesce(Seq(s, Literal(0L))))
        case s: Sum => s.child match {
          case a: AttributeReference =>
            measure(a, d.sumCols).flatMap(n => sumOf(s"sum_$n"))
          case _ => None
        }
        case m: Max => m.child match {
          case a: AttributeReference =>
            measure(a, d.maxCols).flatMap(n => viewAttr.get(s"max_$n"))
              .map(v => Max(v).toAggregateExpression())
          case _ => None
        }
        case m: Min => m.child match {
          case a: AttributeReference =>
            measure(a, d.minCols).flatMap(n => viewAttr.get(s"min_$n"))
              .map(v => Min(v).toAggregateExpression())
          case _ => None
        }
        case av: Average => av.child match {
          case a: AttributeReference if !a.nullable =>
            measure(a, d.sumCols).flatMap { n =>
              for { s <- sumOf(s"sum_$n"); c <- sumOf("mv_cnt") }
                yield Divide(Cast(s, DoubleType), Cast(c, DoubleType))
            }
          case _ => None
        }
        case _ => None
      }
    }

    def translate(e: Expression): Option[Expression] = e match {
      case ae: AggregateExpression => translateAgg(ae)
      case a: AttributeReference => keyAttr(a)
      case l: Literal => Some(l)
      case other if other.children.nonEmpty && other.deterministic =>
        val kids = other.children.map(translate)
        if (kids.forall(_.isDefined))
          Some(other.withNewChildren(kids.map(_.get)))
        else None
      case _ => None
    }

    // Residual filters: key predicates re-source to the view; bare
    // IsNotNull on a join column is IMPLIED by the view's inner join
    // (null-keyed rows never entered the view) and drops — Spark's
    // InferFiltersFromConstraints plants exactly these under inner joins.
    val joinCols: Set[(String, String)] = d.joinPairs.flatten.toSet
    val residual = filters.flatMap(splitConj).flatMap {
      case IsNotNull(a: AttributeReference)
          if srcOf.get(a.exprId).exists(joinCols.contains) => None
      case f => Some(translate(f).getOrElse(return None))
    }

    val newGroups = agg.groupingExpressions.map(translate)
    if (newGroups.exists(_.isEmpty)) return None
    val newAggs = agg.aggregateExpressions.map {
      case a: AttributeReference =>
        keyAttr(a).map(v =>
          Alias(v, a.name)(exprId = a.exprId, qualifier = a.qualifier))
      case al @ Alias(child, name) =>
        translate(child).map(nc =>
          Alias(nc, name)(exprId = al.exprId, qualifier = al.qualifier))
      case _ => None
    }
    if (newAggs.exists(_.isEmpty)) return None
    val sameTypes = newAggs.map(_.get).zip(agg.aggregateExpressions)
      .forall { case (n, o) => n.dataType == o.dataType }
    if (!sameTypes) return None

    val newChild: LogicalPlan = residual match {
      case Nil => viewRel
      case cs => Filter(cs.reduce(And), viewRel)
    }
    Some(Aggregate(newGroups.map(_.get), newAggs.map(_.get), newChild))
  }

  private def rewriteWith(agg: Aggregate, cond: Option[Expression],
      rel: DataSourceV2ScanRelation, d: ViewDef): Option[Aggregate] = {
    val viewRel = freshViewRel(d).getOrElse(return None)
    val viewAttr = viewRel.output.map(a => a.name -> a).toMap
    val baseNameOf = rel.output.map(a => a.exprId -> a.name).toMap

    def keyAttr(a: AttributeReference): Option[AttributeReference] =
      baseNameOf.get(a.exprId).filter(d.keys.contains).flatMap(viewAttr.get)

    def sumOf(name: String): Option[Expression] =
      viewAttr.get(name).map(v => Sum(v).toAggregateExpression())

    def translateAgg(ae: AggregateExpression): Option[Expression] = {
      if (ae.isDistinct || ae.filter.isDefined) return None
      ae.aggregateFunction match {
        case c: Count if c.children.forall(_.isInstanceOf[Literal]) =>
          sumOf("mv_cnt").map(s => Coalesce(Seq(s, Literal(0L))))
        case s: Sum => s.child match {
          case a: AttributeReference =>
            baseNameOf.get(a.exprId).filter(d.sumCols.contains)
              .flatMap(n => sumOf(s"sum_$n"))
          case _ => None
        }
        case m: Max => m.child match {
          case a: AttributeReference =>
            baseNameOf.get(a.exprId).filter(d.maxCols.contains)
              .flatMap(n => viewAttr.get(s"max_$n"))
              .map(v => Max(v).toAggregateExpression())
          case _ => None
        }
        case m: Min => m.child match {
          case a: AttributeReference =>
            baseNameOf.get(a.exprId).filter(d.minCols.contains)
              .flatMap(n => viewAttr.get(s"min_$n"))
              .map(v => Min(v).toAggregateExpression())
          case _ => None
        }
        // avg = sum/count(non-null); mv_cnt counts rows, so only columns
        // that cannot hold nulls translate (row count == value count)
        case av: Average => av.child match {
          case a: AttributeReference if !a.nullable =>
            baseNameOf.get(a.exprId).filter(d.sumCols.contains).flatMap {
              n =>
                for { s <- sumOf(s"sum_$n"); c <- sumOf("mv_cnt") }
                  yield Divide(Cast(s, DoubleType), Cast(c, DoubleType))
            }
          case _ => None
        }
        case _ => None
      }
    }

    def translate(e: Expression): Option[Expression] = e match {
      case ae: AggregateExpression => translateAgg(ae)
      case a: AttributeReference => keyAttr(a)
      case l: Literal => Some(l)
      case other if other.children.nonEmpty && other.deterministic =>
        val kids = other.children.map(translate)
        if (kids.forall(_.isDefined))
          Some(other.withNewChildren(kids.map(_.get)))
        else None
      case _ => None
    }

    val newGroups = agg.groupingExpressions.map(translate)
    if (newGroups.exists(_.isEmpty)) return None
    val newAggs = agg.aggregateExpressions.map {
      case a: AttributeReference =>
        keyAttr(a).map(v =>
          Alias(v, a.name)(exprId = a.exprId, qualifier = a.qualifier))
      case al @ Alias(child, name) =>
        translate(child).map(nc =>
          Alias(nc, name)(exprId = al.exprId, qualifier = al.qualifier))
      case _ => None
    }
    if (newAggs.exists(_.isEmpty)) return None
    // the rewritten plan must expose byte-identical output types
    val sameTypes = newAggs.map(_.get).zip(agg.aggregateExpressions)
      .forall { case (n, o) => n.dataType == o.dataType }
    if (!sameTypes) return None

    val newChild: Option[LogicalPlan] = cond match {
      case None => Some(viewRel)
      case Some(c) => translate(c).map(tc => Filter(tc, viewRel))
    }
    newChild.map(ch =>
      Aggregate(newGroups.map(_.get), newAggs.map(_.get), ch))
  }

  /** A ready-to-execute scan relation over the view: the view read goes
    * through Spark's own analysis + optimization (so V2ScanRelationPushDown
    * builds the scan and its V1 wrapper exactly as for any other read),
    * and we lift out the resulting relation node with fresh attribute ids.
    * The nested optimization re-enters this rule, but the view root is
    * never a registered base, so it no-ops. */
  private def viewScanRelation(spark: SparkSession,
      viewRoot: String): Option[DataSourceV2ScanRelation] =
    spark.read.format("lake").load(viewRoot)
      .queryExecution.optimizedPlan match {
      case r: DataSourceV2ScanRelation => Some(r)
      case _ => None
    }
}
