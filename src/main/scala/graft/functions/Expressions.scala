package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Custom Catalyst expressions (SURVEY.md §4.3): the normal-distribution
  * kernels Spark SQL lacks, as codegen-native `Expression`s rather than
  * UDFs — they stay inside whole-stage codegen in the NOOB/pOOBAH hot
  * paths (the generated code calls the static Scala kernels directly, no
  * boxing, no serialization).
  */
object Expressions {

  private val kernel = "graft.functions.StatFuncs"

  /** Children are always cast to double at the column-function layer. */
  abstract class DoubleKernel extends UnaryExpression {
    override def dataType: DataType = DoubleType
    def fn: String // static method on StatFuncs
    override def nullSafeEval(v: Any): Any = call(v.asInstanceOf[Double])
    def call(v: Double): Double
    override protected def doGenCode(ctx: CodegenContext,
        ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$kernel$$.MODULE$$.$fn($c)")
  }

  /** erfc(x) — double precision (SPECFUN rational approximations). */
  case class Erfc(child: Expression) extends DoubleKernel {
    override def fn: String = "erfc"
    override def call(v: Double): Double = StatFuncs.erfc(v)
    override protected def withNewChildInternal(c: Expression): Erfc = copy(c)
  }

  /** log(1 − Φ(z)) — stable in the deep tail via erfcx scaling. */
  case class NormLogSf(child: Expression) extends DoubleKernel {
    override def fn: String = "normLogSf"
    override def call(v: Double): Double = StatFuncs.normLogSf(v)
    override protected def withNewChildInternal(c: Expression): NormLogSf =
      copy(c)
  }

  /** Φ⁻¹(p) — Acklam + Halley refinement. */
  case class NormInv(child: Expression) extends DoubleKernel {
    override def fn: String = "normInv"
    override def call(v: Double): Double = StatFuncs.normInv(v)
    override protected def withNewChildInternal(c: Expression): NormInv =
      copy(c)
  }

  import GraftBridge.{column, expression}

  def erfc(c: Column): Column = column(Erfc(expression(c)))
  def normLogSf(c: Column): Column = column(NormLogSf(expression(c)))
  def normInv(c: Column): Column = column(NormInv(expression(c)))

  /** Register the kernels as SQL functions on a session
    * (`SELECT erfc(x)`, `norm_log_sf(z)`, `norm_inv(p)`). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("erfc", es => Erfc(es.head), "builtin")
    reg.createOrReplaceTempFunction("norm_log_sf",
      es => NormLogSf(es.head), "builtin")
    reg.createOrReplaceTempFunction("norm_inv",
      es => NormInv(es.head), "builtin")
  }
}
