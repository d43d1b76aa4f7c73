package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Cross, Inner, LeftSemi}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType, StringType, StructType}

import graft.vector.TopKAgg

/** Fuses the naive "rank-then-filter" top-k formulation into graft's
  * bounded-heap aggregate, so a caller who writes the declarative
  * pattern
  *
  * {{{
  *   scored.withColumn("rank",
  *       row_number().over(Window.partitionBy($"query_id")
  *         .orderBy($"__s".desc, $"id")))
  *     .where($"rank" <= k)
  * }}}
  *
  * (or its SQL equivalent — e.g. a radius search followed by a top-k,
  * the reference's `search(radius=…, limit=…)`) gets the SAME physical
  * plan as [[graft.vector.Ranked.topK]]: a partial [[TopKAgg]] heap per
  * partition, one k-row-per-group shuffle, no sort, no Window exec.
  * The un-fused plan shuffles EVERY in-radius row to sort it; the fused
  * plan moves at most k rows per query per partition — at 100 TB that
  * is the difference between shuffling terabytes and kilobytes.
  *
  * Match conditions (all must hold, otherwise the plan is untouched):
  *  - Filter is exactly `rank <= lit` / `rank < lit` on the Window's
  *    single row_number column;
  *  - one partition attribute; ordering is (score [asc|desc], id asc)
  *    with score double and id long/string ([[TopKAgg]]'s domain) —
  *    the id tie-break also makes row_number deterministic, which is
  *    what licenses the rewrite;
  *  - the score attribute is NON-NULLABLE: [[TopKAgg]] ignores null
  *    scores while the window form would rank them (first under asc),
  *    so a nullable score is never rewritten. Library shapes qualify
  *    naturally — a radius predicate (`__s >= r`) narrows the filtered
  *    attribute to non-nullable in the logical plan;
  *  - the window child's output is exactly {partition, score, id}: the
  *    aggregate can only carry those three through.
  *
  * Registered by [[graft.GraftExtensions]] via `injectOptimizerRule`
  * (post-optimization batch, so Spark's own InferWindowGroupLimit may
  * already have inserted a WindowGroupLimit below the Window — both
  * shapes are matched and the group-limit node is dropped along with
  * the Window).
  */
object RankLimitToTopK extends Rule[LogicalPlan] with PredicateHelper {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond,
        Window(Seq(rankAlias @ Alias(WindowExpression(RowNumber(),
            WindowSpecDefinition(Seq(part: AttributeReference), orderSpec, _)), _)),
          _, _, wchild, _))
        if rankLimit(cond, rankAlias.toAttribute).isDefined =>
      val k = rankLimit(cond, rankAlias.toAttribute).get
      // InferWindowGroupLimit may have slid a WindowGroupLimit between
      // the Window and its real child: the heap subsumes it
      val child = wchild match {
        case WindowGroupLimit(_, _, _, _, inner) => inner
        case other => other
      }
      rewrite(part, orderSpec, child, k, rankAlias).getOrElse(f)
  }

  /** `rank <= k` / `rank < k+1` over the window's rank attribute. */
  private def rankLimit(cond: Expression, rank: Attribute): Option[Int] = cond match {
    case LessThanOrEqual(r: AttributeReference, IntegerLiteral(k))
      if r.exprId == rank.exprId && k > 0 => Some(k)
    case LessThan(r: AttributeReference, IntegerLiteral(k))
      if r.exprId == rank.exprId && k > 1 => Some(k - 1)
    case _ => None
  }

  /** No null score can reach the window: either the child's attribute
    * copy is non-nullable outright, or the score is projected from an
    * expression that a null-INTOLERANT comparison (a radius predicate
    * `__s >= r`, possibly pushed into a join condition by the
    * optimizer) already filtered below the projection — a comparison on
    * a semantically-equal expression evaluates to null for null scores
    * and the Filter/Join drops those rows. */
  private def provablyNonNull(score: AttributeReference, child: LogicalPlan): Boolean =
    child.output.exists(a => a.exprId == score.exprId && !a.nullable) || (child match {
      // bare filter under the window (no projection — e.g. a 3-column
      // source): a conjunct guarding the score attribute itself
      case f: Filter =>
        splitConjunctivePredicates(f.condition).exists(guardsNonNull(_, score))
      case Project(projList, grandchild) =>
        val scoreExpr = projList.collectFirst {
          case a @ Alias(e, _) if a.exprId == score.exprId => e
          case a: AttributeReference if a.exprId == score.exprId => a // pass-through
        }
        // A guard below the projection is only trustworthy if no node
        // between it and the window can reintroduce null rows: outer
        // joins null-EXTEND, and multi-child nodes (Union) or
        // outer/expanding generators can surface rows from legs a
        // guard in ANOTHER leg never saw — a Filter in the Union's
        // head leg carries the union-output exprIds, so it would
        // falsely prove the whole Union. Any such node voids every
        // proof below it.
        def nullExtending(p: LogicalPlan): Boolean = p.exists {
          case j: Join => j.joinType match {
            case Inner | Cross | LeftSemi => false
            case _ => true // outer joins null-extend; anti keeps null-cond rows
          }
          case _: Union => true
          case _: Expand => true
          case g: Generate => g.outer
          case _ => false
        }
        scoreExpr.exists { e =>
          !e.nullable || (!nullExtending(grandchild) && grandchild.collect {
            // a row survives a Filter / inner-equivalent join condition
            // only if the condition is TRUE — so a top-level CONJUNCT
            // comparing e drops null-e rows. (LeftAnti is excluded
            // above: it KEEPS rows whose condition is null.)
            case Filter(cond, _) => cond
            case j: Join if j.joinType == Inner || j.joinType == Cross ||
              j.joinType == LeftSemi => j.condition.getOrElse(Literal(true))
          }.flatMap(splitConjunctivePredicates).exists(guardsNonNull(_, e)))
        }
      case _ => false
    })

  /** Is the conjunct ITSELF a null-intolerant comparison with `e` on
    * either side? Deliberately not a tree search: a comparison nested
    * inside an Or / Not / conditional does not force the row out when
    * e is null (`x >= 0.5 OR id < 10` passes null-x rows), so only a
    * top-level conjunct counts. (`<=>` is null-safe and excluded.) */
  private def guardsNonNull(conjunct: Expression, e: Expression): Boolean =
    conjunct match {
      case _: EqualNullSafe => false
      case IsNotNull(x) => x.semanticEquals(e)
      case b: BinaryComparison => b.left.semanticEquals(e) || b.right.semanticEquals(e)
      case _ => false
    }

  private def rewrite(part: AttributeReference, orderSpec: Seq[SortOrder],
                      child: LogicalPlan, k: Int,
                      rankAlias: Alias): Option[LogicalPlan] = orderSpec match {
    case Seq(SortOrder(score: AttributeReference, scoreDir, _, _),
             SortOrder(id: AttributeReference, Ascending, _, _))
        if score.dataType == DoubleType &&
          provablyNonNull(score, child) &&
          (id.dataType == LongType || id.dataType == StringType) &&
          // TopKAgg drops null-id rows while row_number would rank them
          // (NullsFirst under asc): the id needs the same non-null
          // proof as the score (non-nullable attribute, or a
          // null-intolerant guard below — e.g. `id.isNotNull` over a
          // parquet source whose schema is nullable)
          provablyNonNull(id, child) &&
          child.outputSet == AttributeSet(Seq(part, score, id)) &&
          child.output.length == 3 =>
      val asc = scoreDir == Ascending
      val top = Alias(TopKAgg(score, id, k, asc).toAggregateExpression(), "__top")()
      val agg = Aggregate(Seq(part), Seq(part, top), child)
      val elemType = new StructType()
        .add("score", DoubleType, nullable = false)
        .add("id", id.dataType, nullable = false)
      val pos = AttributeReference("__pos", IntegerType, nullable = false)()
      val elem = AttributeReference("__r", elemType, nullable = false)()
      val gen = Generate(PosExplode(top.toAttribute), unrequiredChildIndex = Nil,
        outer = false, qualifier = None, generatorOutput = Seq(pos, elem), agg)
      // reproduce the Filter's exact output: the window child's columns
      // (same exprIds, so downstream Projects keep resolving) + rank
      val byId = Map(
        score.exprId -> Alias(GetStructField(elem, 0, Some("score")), score.name)(
          exprId = score.exprId),
        id.exprId -> Alias(GetStructField(elem, 1, Some("id")), id.name)(
          exprId = id.exprId))
      val childCols: Seq[NamedExpression] = child.output.map { a =>
        if (a.exprId == part.exprId) part else byId(a.exprId)
      }
      val rank = Alias(Add(pos, Literal(1)), rankAlias.name)(exprId = rankAlias.exprId)
      Some(Project(childCols :+ rank, gen))
    case _ => None
  }
}
