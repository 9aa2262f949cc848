package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression,
  UnaryExpression}
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

  /** Children are cast to double explicitly (the kernels are
    * double-only and don't participate in implicit coercion). */
  def toD(e: Expression): Expression =
    if (e.dataType == DoubleType) e else Cast(e, DoubleType)

  def erfc(c: Column): Column = column(Erfc(toD(expression(c))))
  def normLogSf(c: Column): Column = column(NormLogSf(toD(expression(c))))
  def normInv(c: Column): Column = column(NormInv(toD(expression(c))))

  /** Register the kernels as SQL functions on a session
    * (`SELECT erfc(x)`, `norm_log_sf(z)`, `norm_inv(p)`). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("erfc",
      es => Erfc(toD(es.head)), "built-in")
    reg.createOrReplaceTempFunction("norm_log_sf",
      es => NormLogSf(toD(es.head)), "built-in")
    reg.createOrReplaceTempFunction("norm_inv",
      es => NormInv(toD(es.head)), "built-in")
  }
}

/** SparkSessionExtensions hook: `.withExtensions(new GraftExtensions)`
  * or `spark.sql.extensions=graft.functions.GraftExtensions` injects the
  * statistical kernels into every session's SQL surface at build time —
  * the registration path a cluster deployment uses (no per-session
  * register() call). */
class GraftExtensions
    extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

  override def apply(
      e: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    e.injectFunction((FunctionIdentifier("erfc"),
      new ExpressionInfo(classOf[Expressions.Erfc].getName, "erfc"),
      (es: Seq[Expression]) => Expressions.Erfc(Expressions.toD(es.head))))
    e.injectFunction((FunctionIdentifier("norm_log_sf"),
      new ExpressionInfo(classOf[Expressions.NormLogSf].getName,
        "norm_log_sf"),
      (es: Seq[Expression]) => Expressions.NormLogSf(Expressions.toD(es.head))))
    e.injectFunction((FunctionIdentifier("norm_inv"),
      new ExpressionInfo(classOf[Expressions.NormInv].getName, "norm_inv"),
      (es: Seq[Expression]) => Expressions.NormInv(Expressions.toD(es.head))))
  }
}
