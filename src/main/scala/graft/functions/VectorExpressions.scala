package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression for cosine similarity over two embedding
  * array columns (`array<float>` or `array<double>`).
  *
  * Why not `zip_with`/`aggregate`: Spark's higher-order array functions are
  * `CodegenFallback` — each row drops out of whole-stage codegen into
  * interpreted lambda evaluation and allocates an intermediate array for
  * the products. On a brute-force similarity scan (the X3 baseline,
  * [[graft.sim.Similarity.bruteForceTopK]]) that is the entire hot path.
  * This expression generates a single fused loop (dot product and both
  * norms in one pass, no allocation), so the scan stays inside
  * whole-stage codegen — the "(b) custom Expression" tier of the
  * custom-operator preference order (SURVEY.md §7.4).
  *
  * Semantics match the higher-order-function formulation exactly: elements
  * are widened to double and accumulated left-to-right, so results are
  * bit-identical to the round-1 `zip_with`-based implementation (and to any
  * sequential-fold engine, e.g. the DuckDB oracle). Zero-norm inputs yield
  * 0.0. Array elements are assumed non-null (embedding vectors; nulls in
  * numeric vector data indicate corrupt input upstream).
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(lt, _), ArrayType(rt, _))
        if Seq(lt, rt).forall(t => t == FloatType || t == DoubleType) =>
      TypeCheckResult.TypeCheckSuccess
    case _ =>
      TypeCheckResult.TypeCheckFailure(
        s"cosine_similarity expects array<float>/array<double> inputs, " +
          s"got ${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (xs, ys) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val n = math.min(xs.numElements(), ys.numElements())
    val (lf, rf) = (elemType(left) == FloatType, elemType(right) == FloatType)
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = if (lf) xs.getFloat(i).toDouble else xs.getDouble(i)
      val y = if (rf) ys.getFloat(i).toDouble else ys.getDouble(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    def getter(e: Expression, arr: String, i: String): String =
      if (elemType(e) == FloatType) s"(double) $arr.getFloat($i)" else s"$arr.getDouble($i)"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val (n, dot, na, nb, i) =
        (ctx.freshName("n"), ctx.freshName("dot"), ctx.freshName("na"),
          ctx.freshName("nb"), ctx.freshName("i"))
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  final double x = ${getter(left, a, i)};
         |  final double y = ${getter(right, b, i)};
         |  $dot += x * y; $na += x * x; $nb += y * y;
         |}
         |${ev.value} = ($na == 0.0 || $nb == 0.0)
         |  ? 0.0 : $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

object VectorFunctions {

  val FunctionName = "graft_cosine_similarity"

  /** Idempotently register the expression in the session's function
    * registry — it becomes available to the Column DSL (via
    * `call_function`) AND to plain SQL
    * (`SELECT graft_cosine_similarity(a, b)`). */
  def register(spark: SparkSession): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry.createOrReplaceTempFunction(
        FunctionName,
        { exprs =>
          require(exprs.length == 2, s"$FunctionName expects 2 arguments")
          CosineSimilarity(exprs.head, exprs(1))
        },
        "built-in")

  /** Cosine similarity as a Column — codegen'd single-pass loop. */
  def cosine_similarity(a: Column, b: Column): Column = {
    register(SparkSession.active)
    call_function(FunctionName, a, b)
  }
}
