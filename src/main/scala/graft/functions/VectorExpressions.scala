package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Shared shell for binary vector expressions over two embedding array
  * columns (`array<float>` or `array<double>`).
  *
  * Why not `zip_with`/`aggregate`: Spark's higher-order array functions are
  * `CodegenFallback` — each row drops out of whole-stage codegen into
  * interpreted lambda evaluation and allocates an intermediate array for
  * the products. On a brute-force similarity scan (the X3 baseline,
  * [[graft.sim.Similarity.bruteForceTopK]]) that is the entire hot path.
  * These expressions generate a single fused loop (no allocation), so the
  * scan stays inside whole-stage codegen — the "(b) custom Expression" tier
  * of the custom-operator preference order (SURVEY.md §7.4).
  *
  * Mismatched-length inputs yield NULL (matching the higher-order
  * `zip_with` formulation, whose null-padded products null the aggregate):
  * ragged or corrupt embeddings must not produce a confident wrong number.
  * Array elements are assumed non-null (nulls in numeric vector data
  * indicate corrupt input upstream).
  */
trait VectorBinaryExpression extends BinaryExpression {

  override def dataType: DataType = DoubleType

  /** Result can be NULL on length mismatch even for non-null inputs. */
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(lt, _), ArrayType(rt, _))
        if Seq(lt, rt).forall(t => t == FloatType || t == DoubleType) =>
      TypeCheckResult.TypeCheckSuccess
    case _ =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects array<float>/array<double> inputs, " +
          s"got ${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  protected def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  protected def genGetter(e: Expression, arr: String, i: String): String =
    if (elemType(e) == FloatType) s"(double) $arr.getFloat($i)" else s"$arr.getDouble($i)"
}

/** Cosine similarity: dot product and both norms in one fused pass.
  * Semantics match the higher-order-function formulation exactly on
  * equal-length inputs: elements are widened to double and accumulated
  * left-to-right, so results are bit-identical to a `zip_with`-based
  * implementation (and to any sequential-fold engine, e.g. the DuckDB
  * oracle). Zero-norm inputs yield 0.0; mismatched lengths yield NULL. */
case class CosineSimilarity(left: Expression, right: Expression)
    extends VectorBinaryExpression {

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (xs, ys) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val n = xs.numElements()
    if (n != ys.numElements()) return null
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

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val (n, dot, na, nb, i) =
        (ctx.freshName("n"), ctx.freshName("dot"), ctx.freshName("na"),
          ctx.freshName("nb"), ctx.freshName("i"))
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    final double x = ${genGetter(left, a, i)};
         |    final double y = ${genGetter(right, b, i)};
         |    $dot += x * y; $na += x * x; $nb += y * y;
         |  }
         |  ${ev.value} = ($na == 0.0 || $nb == 0.0)
         |    ? 0.0 : $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

/** Σ aᵢ·bᵢ as one fused codegen'd loop — the building block for IVF cell
  * assignment and random-projection banding ([[graft.sim.Similarity]]),
  * where the per-row hot path is a dot product against a broadcast literal
  * vector. Left-to-right double accumulation; mismatched lengths → NULL. */
case class DotProduct(left: Expression, right: Expression)
    extends VectorBinaryExpression {

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (xs, ys) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val n = xs.numElements()
    if (n != ys.numElements()) return null
    val (lf, rf) = (elemType(left) == FloatType, elemType(right) == FloatType)
    var dot = 0.0
    var i = 0
    while (i < n) {
      val x = if (lf) xs.getFloat(i).toDouble else xs.getDouble(i)
      val y = if (rf) ys.getFloat(i).toDouble else ys.getDouble(i)
      dot += x * y
      i += 1
    }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val (n, dot, i) = (ctx.freshName("n"), ctx.freshName("dot"), ctx.freshName("i"))
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $dot += ${genGetter(left, a, i)} * ${genGetter(right, b, i)};
         |  }
         |  ${ev.value} = $dot;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Unit-normalize an embedding: `x / ‖x‖₂` as one fused codegen'd pass
  * (accumulate the sum of squares, then divide each element by the norm).
  * The all-zero vector has no direction; it maps to itself (all zeros),
  * which downstream cosine/dot treat as "similar to nothing" (score 0).
  * Output is always `array<double>` — normalization leaves the unit sphere
  * of floats, so widening is the honest type.
  *
  * Composes with [[CosineSimilarity]]: `cosine(l2_normalize(a),
  * l2_normalize(b))` is recognized by
  * [[graft.plans.NormalizedCosineToDot]] and strength-reduced to the
  * norm-free [[DotProduct]]. */
case class L2Normalize(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(t, _) if t == FloatType || t == DoubleType =>
      TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects an array<float>/array<double> input, got ${other.simpleString}")
  }

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val n = xs.numElements()
    val out = new Array[Double](n)
    var ss = 0.0
    var i = 0
    while (i < n) {
      val x = if (isFloat) xs.getFloat(i).toDouble else xs.getDouble(i)
      out(i) = x; ss += x * x
      i += 1
    }
    if (ss != 0.0) {
      val norm = math.sqrt(ss)
      i = 0
      while (i < n) { out(i) = out(i) / norm; i += 1 }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val (n, buf, ss, norm, i) =
        (ctx.freshName("n"), ctx.freshName("buf"), ctx.freshName("ss"),
          ctx.freshName("norm"), ctx.freshName("i"))
      val getter =
        if (isFloat) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      s"""
         |final int $n = $a.numElements();
         |final double[] $buf = new double[$n];
         |double $ss = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  final double x = $getter;
         |  $buf[$i] = x; $ss += x * x;
         |}
         |if ($ss != 0.0) {
         |  final double $norm = java.lang.Math.sqrt($ss);
         |  for (int $i = 0; $i < $n; $i++) { $buf[$i] = $buf[$i] / $norm; }
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($buf);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): L2Normalize =
    copy(child = newChild)
}

object VectorFunctions {

  val CosineFunctionName = "graft_cosine_similarity"
  val DotFunctionName = "graft_dot_product"
  val L2NormalizeFunctionName = "graft_l2_normalize"

  /** Back-compat alias for the cosine function name. */
  val FunctionName: String = CosineFunctionName

  /** Idempotently register the expressions in the session's function
    * registry — they become available to the Column DSL (via
    * `call_function`) AND to plain SQL
    * (`SELECT graft_cosine_similarity(a, b)`). */
  def register(spark: SparkSession): Unit = {
    val registry = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
    registry.createOrReplaceTempFunction(
      CosineFunctionName,
      { exprs =>
        require(exprs.length == 2, s"$CosineFunctionName expects 2 arguments")
        CosineSimilarity(exprs.head, exprs(1))
      },
      "built-in")
    registry.createOrReplaceTempFunction(
      DotFunctionName,
      { exprs =>
        require(exprs.length == 2, s"$DotFunctionName expects 2 arguments")
        DotProduct(exprs.head, exprs(1))
      },
      "built-in")
    registry.createOrReplaceTempFunction(
      L2NormalizeFunctionName,
      { exprs =>
        require(exprs.length == 1, s"$L2NormalizeFunctionName expects 1 argument")
        L2Normalize(exprs.head)
      },
      "built-in")
  }

  /** The same three functions as `SparkSessionExtensions.injectFunction`
    * descriptors, so sessions launched with
    * `spark.sql.extensions=graft.GraftExtensions` get them at session
    * creation — no imperative `register` call needed (the SQL-only user's
    * path). */
  def descriptions: Seq[(org.apache.spark.sql.catalyst.FunctionIdentifier,
      org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      Seq[Expression] => Expression)] = {
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
    def info(clazz: Class[_], name: String, usage: String) =
      new ExpressionInfo(clazz.getCanonicalName, null, name, usage, "")
    Seq(
      (FunctionIdentifier(CosineFunctionName),
        info(classOf[CosineSimilarity], CosineFunctionName,
          s"$CosineFunctionName(a, b) - cosine similarity of two embedding arrays (codegen'd fused loop)"),
        { exprs: Seq[Expression] =>
          require(exprs.length == 2, s"$CosineFunctionName expects 2 arguments")
          CosineSimilarity(exprs.head, exprs(1))
        }),
      (FunctionIdentifier(DotFunctionName),
        info(classOf[DotProduct], DotFunctionName,
          s"$DotFunctionName(a, b) - dot product of two embedding arrays (codegen'd fused loop)"),
        { exprs: Seq[Expression] =>
          require(exprs.length == 2, s"$DotFunctionName expects 2 arguments")
          DotProduct(exprs.head, exprs(1))
        }),
      (FunctionIdentifier(L2NormalizeFunctionName),
        info(classOf[L2Normalize], L2NormalizeFunctionName,
          s"$L2NormalizeFunctionName(a) - unit-normalize an embedding array (codegen'd fused loop)"),
        { exprs: Seq[Expression] =>
          require(exprs.length == 1, s"$L2NormalizeFunctionName expects 1 argument")
          L2Normalize(exprs.head)
        }))
  }

  /** Cosine similarity as a Column — codegen'd single-pass loop. */
  def cosine_similarity(a: Column, b: Column): Column = {
    register(SparkSession.active)
    call_function(CosineFunctionName, a, b)
  }

  /** Dot product as a Column — codegen'd single-pass loop. */
  def dot_product(a: Column, b: Column): Column = {
    register(SparkSession.active)
    call_function(DotFunctionName, a, b)
  }

  /** Unit-normalize as a Column — codegen'd single-pass loop. Composed
    * under [[cosine_similarity]] it is strength-reduced to [[dot_product]]
    * by [[graft.plans.NormalizedCosineToDot]]. */
  def l2_normalize(a: Column): Column = {
    register(SparkSession.active)
    call_function(L2NormalizeFunctionName, a)
  }
}
