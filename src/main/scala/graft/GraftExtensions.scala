package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

import graft.vector.{TopKAgg, VectorScore}

/** SQL-surface registration of graft's native expressions via
  * `SparkSessionExtensions`, so `spark.sql` users get the vector
  * functions without touching the Scala API:
  *
  * {{{
  *   SELECT vec_cosine(a.embedding, b.embedding) FROM ...
  *   SELECT query_id, topk(score, id, 10, false) FROM scored GROUP BY query_id
  * }}}
  *
  * Wire up with
  * `SparkSession.builder().withExtensions(new GraftExtensions)` (done by
  * [[GraftSession.builder]]).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String): ExpressionInfo =
    new ExpressionInfo(classOf[VectorScore].getName, name)

  private def litInt(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(s"$what must be an int literal, got $other")
  }

  private def litBool(e: Expression, what: String): Boolean = e match {
    case Literal(v: Boolean, _) => v
    case other => throw new IllegalArgumentException(s"$what must be a boolean literal, got $other")
  }

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((FunctionIdentifier("vec_cosine"), info("vec_cosine"),
      (args: Seq[Expression]) => VectorScore("cosine", args(0), args(1))))
    e.injectFunction((FunctionIdentifier("vec_l2"), info("vec_l2"),
      (args: Seq[Expression]) => VectorScore("l2", args(0), args(1))))
    e.injectFunction((FunctionIdentifier("vec_ip"), info("vec_ip"),
      (args: Seq[Expression]) => VectorScore("ip", args(0), args(1))))
    // topk(score, id, k, asc) -> array<struct<score,id>> best-first
    e.injectFunction((FunctionIdentifier("topk"), info("topk"),
      (args: Seq[Expression]) => TopKAgg(args(0), args(1),
        litInt(args(2), "k"), litBool(args(3), "asc")).toAggregateExpression()))
    // rank-then-filter -> bounded-heap rewrite (radius+limit fusion)
    e.injectOptimizerRule(_ => graft.plans.RankLimitToTopK)
  }
}
