package graft.vector

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Dense-vector similarity metrics of the reference engine.
  *
  * The reference exposes COSINE / L2 / IP as its vector-index metrics
  * (/root/reference/aiotcvectordb/model/enum.py MetricType, used by
  * HNSWParams/vector search in model/collection.py). Scores here follow
  * the same conventions: cosine and IP are similarities (larger =
  * closer), L2 is the euclidean distance (smaller = closer).
  */
sealed abstract class VectorMetric(val name: String) {
  /** true when larger scores mean "closer" (cosine, ip). */
  def largerIsBetter: Boolean
}
object VectorMetric {
  case object Cosine extends VectorMetric("cosine") { val largerIsBetter = true }
  case object L2 extends VectorMetric("l2") { val largerIsBetter = false }
  case object InnerProduct extends VectorMetric("ip") { val largerIsBetter = true }
  def apply(name: String): VectorMetric = name.toLowerCase match {
    case "cosine" => Cosine
    case "l2" | "euclidean" => L2
    case "ip" | "dot" | "inner_product" => InnerProduct
    case other => throw new IllegalArgumentException(s"unknown metric: $other")
  }
}

/** Codegen'd score between two dense vectors (`array<float>` or
  * `array<double>` columns), computed in double precision.
  *
  * A native Catalyst Expression (not a UDF) so the whole KNN scoring
  * pipeline stays inside whole-stage codegen: per row the generated code
  * is a single primitive loop with no boxing, no Row materialization and
  * no serialization — the difference between this and a Scala UDF is
  * ~10x on the brute-force scan path, which is what a 100 TB exact-KNN
  * sweep executes per partition.
  *
  * Float inputs are widened element-wise to double (exact), so scores
  * are bit-identical to the DuckDB oracle's `list_cosine_similarity` /
  * `list_distance` / `list_dot_product` over `::DOUBLE[]` casts.
  */
case class VectorScore(metricName: String, left: Expression, right: Expression)
    extends BinaryExpression {

  @transient private lazy val metric = VectorMetric(metricName)

  private def isVec(t: DataType): Boolean = t match {
    case ArrayType(FloatType | DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (isVec(left.dataType) && isVec(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double> inputs, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")

  override def dataType: DataType = DoubleType

  override def prettyName: String = s"vector_${metric.name}"

  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    val af = isFloat(left); val bf = isFloat(right)
    var dot = 0.0; var na = 0.0; var nb = 0.0; var ss = 0.0
    var i = 0
    while (i < n) {
      val x = if (af) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bf) b.getFloat(i).toDouble else b.getDouble(i)
      metric match {
        case VectorMetric.L2 => val d = x - y; ss += d * d
        case VectorMetric.Cosine => dot += x * y; na += x * x; nb += y * y
        case VectorMetric.InnerProduct => dot += x * y
      }
      i += 1
    }
    metric match {
      case VectorMetric.L2 => math.sqrt(ss)
      case VectorMetric.Cosine => dot / (math.sqrt(na) * math.sqrt(nb))
      case VectorMetric.InnerProduct => dot
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val getX = if (isFloat(left)) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      val getY = if (isFloat(right)) s"(double) $b.getFloat($i)" else s"$b.getDouble($i)"
      metric match {
        case VectorMetric.L2 =>
          val ss = ctx.freshName("ss")
          val d = ctx.freshName("d")
          s"""
             |double $ss = 0.0;
             |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
             |for (int $i = 0; $i < $n; $i++) {
             |  double $x = $getX; double $y = $getY;
             |  double $d = $x - $y; $ss += $d * $d;
             |}
             |${ev.value} = java.lang.Math.sqrt($ss);
           """.stripMargin
        case VectorMetric.Cosine =>
          val dot = ctx.freshName("dot")
          val na = ctx.freshName("na")
          val nb = ctx.freshName("nb")
          s"""
             |double $dot = 0.0, $na = 0.0, $nb = 0.0;
             |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
             |for (int $i = 0; $i < $n; $i++) {
             |  double $x = $getX; double $y = $getY;
             |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
             |}
             |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
           """.stripMargin
        case VectorMetric.InnerProduct =>
          val dot = ctx.freshName("dot")
          s"""
             |double $dot = 0.0;
             |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
             |for (int $i = 0; $i < $n; $i++) {
             |  double $x = $getX; double $y = $getY;
             |  $dot += $x * $y;
             |}
             |${ev.value} = $dot;
           """.stripMargin
      }
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorScore {
  /** Column-level entry points. */
  def cosine(a: Column, b: Column): Column = score("cosine", a, b)
  def l2(a: Column, b: Column): Column = score("l2", a, b)
  def ip(a: Column, b: Column): Column = score("ip", a, b)
  def score(metric: String, a: Column, b: Column): Column =
    GraftShims.column(VectorScore(VectorMetric(metric).name,
      GraftShims.expression(a), GraftShims.expression(b)))

  /** Unit-normalize a vector column (array<float|double> →
    * array<double> on the unit sphere). The GATE-SPACE projection of a
    * cosine-built quantized index (r12 verdict #1): on the unit sphere
    * cos(q,x) ≥ r ⇔ ‖q̂−x̂‖₂ ≤ √(2−2r), so the L2 triangle certificates
    * (per-row resid, per-cell rho) serve cosine radius/top-k EXACTLY
    * once the stored codes quantize x̂ instead of x. Zero vectors pass
    * through unchanged — their cosine is NaN on the FLAT path and the
    * metric-space exact rerank drops them the same way (a NaN never
    * satisfies ≥ r), so the gate space never needs a special case. */
  def unitNorm(vec: Column): Column = {
    import org.apache.spark.sql.functions._
    val v = vec.cast("array<double>")
    val n = sqrt(aggregate(v, lit(0.0), (acc, x) => acc + x * x))
    when(v.isNull, v).otherwise(
      when(n > lit(0.0), transform(v, x => x / n)).otherwise(v))
  }

  /** Driver-side twin of [[unitNorm]] for collected query batches. */
  def unitNormArr(v: Array[Double]): Array[Double] = {
    var ss = 0.0; var i = 0
    while (i < v.length) { ss += v(i) * v(i); i += 1 }
    val n = math.sqrt(ss)
    if (n == 0.0) v
    else {
      val out = new Array[Double](v.length)
      var j = 0
      while (j < v.length) { out(j) = v(j) / n; j += 1 }
      out
    }
  }
}
