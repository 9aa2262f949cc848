package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression,
  UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, LongType,
  StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static hash kernels called from generated code. */
object HashFuncs {
  /** Rabin-Karp polynomial hash over UTF-8 bytes (base 31, wrapping
    * 64-bit: h = fold(0)(h * 31 + byte)) finished with the splitmix64
    * avalanche mixer. Chosen over xxhash64 because every step is
    * replayable in any engine with 64-bit modular integer arithmetic
    * (the DuckDB oracles recompute it in UHUGEINT mod 2^64), while
    * remaining a few multiply/xor ops per byte — codegen keeps it in the
    * whole-stage pipeline. The finalizer matters: the raw fold of a short
    * token leaves the high bits zero, which collapses SimHash distances;
    * the mixer is a bijection, so equality/collision behavior (all that
    * MinHash/Jaccard need) is unchanged while every bit becomes fair.
    * Bytes are read unsigned so the fold matches a codepoint fold on
    * ASCII data.
    */
  def polyHash64(s: UTF8String): Long = {
    val b = s.getBytes
    var h = 0L
    var i = 0
    while (i < b.length) { h = h * 31L + (b(i) & 0xff); i += 1 }
    h = (h ^ (h >>> 30)) * 0xbf58476d1ce4e5b9L
    h = (h ^ (h >>> 27)) * 0x94d049bb133111ebL
    h ^ (h >>> 31)
  }
}

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

  /** poly_hash64(str) — portable Rabin-Karp 64-bit fingerprint (see
    * HashFuncs.polyHash64). Backs MinHash / SimHash / rolling-hash dedup
    * so their whole hash families stay DuckDB-oracle-checkable. */
  case class PolyHash64(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType
    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      if (child.dataType == StringType)
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"poly_hash64 requires STRING, got ${child.dataType.sql}")
    override def nullSafeEval(v: Any): Any =
      HashFuncs.polyHash64(v.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext,
        ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        c => s"graft.functions.HashFuncs$$.MODULE$$.polyHash64($c)")
    override protected def withNewChildInternal(c: Expression): PolyHash64 =
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
  def polyHash64(c: Column): Column = column(PolyHash64(expression(c)))

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
    reg.createOrReplaceTempFunction("poly_hash64",
      es => PolyHash64(es.head), "built-in")
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
    e.injectFunction((FunctionIdentifier("poly_hash64"),
      new ExpressionInfo(classOf[Expressions.PolyHash64].getName,
        "poly_hash64"),
      (es: Seq[Expression]) => Expressions.PolyHash64(es.head)))
  }
}
