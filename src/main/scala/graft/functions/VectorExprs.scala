package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression,
  Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expressions for the vector hot paths.
  *
  * The per-pair dot product dominates the exact embedding-dedup and
  * brute-force ANN baselines (O(n^2) pairs x dim element products). The
  * unrolled `element_at` chain ([[graft.ann.Ann.dotN]]) is codegen'd but
  * carries per-element bounds/null checks and a ~dim-deep Add tree in
  * both the plan and the generated code; this expression evaluates the
  * same left-to-right accumulation ((((0+x0)+x1)+...) as ONE codegen'd
  * loop over the array data — bit-identical values (null-free,
  * equal-length vectors, which parquet embedding columns are), a plan
  * node of constant size, and several times less work per pair.
  *
  * Reference analog: the scalar kernels the reference's native engine
  * compiles for its similarity paths (src/core/text/simhash.rs:35-60 is
  * the same shape over bit words). No UDFs: this is a first-class
  * Expression with `doGenCode`, visible to whole-stage codegen.
  */
/** @param dim cap on the number of leading elements accumulated
  *   (Int.MaxValue = full vectors). The ANN/dedup callers pass their
  *   declared dim so SCORING uses the same dim-prefix the LSH signature
  *   ([[graft.ann.Ann.rhpSignatureCompact]]) bucketed on — over-length
  *   vectors previously scored on the full vector while bucketing on
  *   the prefix (ADVICE r5). Equal-length-dim inputs (the parquet
  *   embedding columns) are unaffected. */
case class DotProduct(left: Expression, right: Expression,
    dim: Int = Int.MaxValue)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two ARRAY<DOUBLE> arguments, got " +
        s"${left.dataType.catalogString} / ${right.dataType.catalogString}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(math.min(x.numElements(), y.numElements()), dim)
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min(
         |  java.lang.Math.min($a.numElements(), $b.numElements()), $dim);
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): DotProduct = copy(newLeft, newRight)
}

object VectorExprs {
  private val NAME = "graft_dot"

  /** Register the expression in the session's function registry (idempotent)
    * so plain `call_function` builds it — the public-API route to a custom
    * Expression without a Column(Expression) constructor. The optional
    * third argument is the dim cap, passed as a foldable int literal and
    * evaluated at build time. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      NAME,
      { exprs: Seq[Expression] =>
        if (exprs.length >= 3)
          DotProduct(exprs(0), exprs(1),
            exprs(2).eval(null).asInstanceOf[Number].intValue())
        else DotProduct(exprs(0), exprs(1))
      },
      "built-in")

  /** dot(a,b) — bit-identical to [[graft.ann.Ann.dotN]]'s accumulation.
    * `dim > 0` caps the accumulation at the leading dim elements. */
  def dotFast(spark: SparkSession, a: Column, b: Column,
      dim: Int = 0): Column = {
    register(spark)
    if (dim > 0)
      call_function(NAME, a, b, org.apache.spark.sql.functions.lit(dim))
    else call_function(NAME, a, b)
  }
}
