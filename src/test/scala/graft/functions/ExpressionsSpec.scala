package graft.functions

import graft.SparkSpec
import org.apache.commons.math3.special.Erf
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

class ExpressionsSpec extends SparkSpec {
  import spark.implicits._

  test("Erfc expression evaluates via codegen and interpreted paths") {
    val df = Seq(-2.0, -0.3, 0.0, 0.5, 3.0).toDF("x")
      .withColumn("e", Expressions.erfc($"x"))
    val got = df.collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    for ((x, v) <- got)
      assert(math.abs(v - Erf.erfc(x)) < 1e-12, s"x=$x")
    // null propagates
    val n = Seq[Option[Double]](None).toDF("x")
      .select(Expressions.erfc($"x")).head()
    assert(n.isNullAt(0))
  }

  test("session-registered SQL functions") {
    Expressions.register(spark)
    val r = spark.sql(
      "SELECT erfc(0.5) AS a, norm_log_sf(2.0) AS b, norm_inv(0.975) AS c")
      .head()
    assert(math.abs(r.getDouble(0) - Erf.erfc(0.5)) < 1e-12)
    assert(math.abs(r.getDouble(1) - StatFuncs.normLogSf(2.0)) < 1e-12)
    assert(math.abs(r.getDouble(2) - 1.959963984540054) < 1e-9)
  }

  test("GraftExtensions applies its injections without error") {
    // a fresh SparkSession can't be built while the shared test session
    // lives (getOrCreate reuses it), so exercise the injection callback
    // directly against a fresh extensions container
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext) // must register all without throwing
  }

  test("SQL surface: hash kernels + top_k callable from spark.sql") {
    Expressions.register(spark)
    val r = spark.sql("""
      SELECT poly_hash64('abc') AS ph,
             simhash64('a b c') AS sh,
             token_hashes('a b') AS th""").head()
    assert(r.getLong(0) === HashFuncs.polyHash64(
      org.apache.spark.unsafe.types.UTF8String.fromString("abc")))
    assert(r.getLong(1) === HashFuncs.simHash64(
      org.apache.spark.unsafe.types.UTF8String.fromString("a b c")))
    assert(r.getSeq[Long](2).length === 2)
  }
}
