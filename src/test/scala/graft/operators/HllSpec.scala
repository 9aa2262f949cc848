package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HllSpec extends SparkSpec {
  import spark.implicits._

  private def ids(range: Range, key: String) =
    range.map(i => (key, i.toLong)).toDF("k", "v")

  test("sketch merge is lossless: registers of a union == max-merge of " +
      "per-part registers (the 100 TB roll-up contract)") {
    val a = ids(1 to 4000, "x")
    val b = ids(2000 to 7000, "x") // overlapping halves
    val direct = Hll.registers(a.union(b), Seq("k"), "v")
    val merged = Hll.merge(
      Hll.registers(a, Seq("k"), "v")
        .union(Hll.registers(b, Seq("k"), "v")), Seq("k"))
    assert(direct.except(merged).isEmpty && merged.except(direct).isEmpty)
  }

  test("estimate is within the ~3x sigma band of exact cardinality " +
      "and is duplicate-insensitive") {
    val n = 20000
    val once = ids(1 to n, "k1")
    val thrice = once.union(once).union(once)
    val e1 = Hll.estimate(Hll.registers(once, Seq("k"), "v"), Seq("k"))
      .select($"est_distinct").as[Double].head()
    val e3 = Hll.estimate(Hll.registers(thrice, Seq("k"), "v"), Seq("k"))
      .select($"est_distinct").as[Double].head()
    assert(e1 == e3, "duplicates must not move the sketch")
    // sigma ~= 1.04/sqrt(1024) ~ 3.25%; allow 3 sigma ~ 10%
    assert(math.abs(e1 - n) / n < 0.10, s"estimate $e1 vs exact $n")
  }

  test("small cardinalities hit the linear-counting branch exactly") {
    val tiny = ids(1 to 50, "t")
    val row = Hll.estimate(Hll.registers(tiny, Seq("k"), "v"), Seq("k"))
      .select($"occupied", $"zeros", $"est_distinct")
      .as[(Long, Long, Double)].head()
    val (occ, zeros, est) = row
    assert(occ + zeros == Hll.M)
    val expected = BigDecimal(
        Hll.M.toDouble * math.log(Hll.M.toDouble / zeros.toDouble))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(est == expected)
    assert(math.abs(est - 50) < 5)
  }
}
