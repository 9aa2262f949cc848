package graft.operators

import graft.SparkSpec
import graft.functions.StatFuncs
import org.apache.spark.sql.functions._

/** Distributed sort-merge ECDF vs the binary-search reference
  * (StatFuncs.ecdfCount), including ties between query and background
  * values (right-continuous: equal background counts), null values, and
  * groups with no background. */
class EcdfSpec extends SparkSpec {
  import spark.implicits._

  test("ecdfLookup matches ecdfCount per group, ties included") {
    val bgLocal = Map(
      "a" -> Array(1.0, 2.0, 2.0, 5.0, 9.0),
      "b" -> Array(4.0, 4.0, 4.0))
    val bg = bgLocal.toSeq.flatMap { case (g, vs) => vs.map(g -> _) }
      .toDF("g", "v")
    val qs = Seq(("a", Some(0.5)), ("a", Some(2.0)), ("a", Some(9.0)),
      ("a", Some(10.0)), ("b", Some(4.0)), ("b", Some(3.9)),
      ("c", Some(1.0)), ("a", None)).toDF("g", "v")
    val got = Ecdf.ecdfLookup(qs, bg, Seq("g"), "v", "F")
      .as[(String, Option[Double], Option[Double])].collect()
    got.foreach { case (g, v, f) =>
      val want = for {
        vv <- v
        arr <- bgLocal.get(g)
      } yield StatFuncs.ecdfCount(arr, vv).toDouble / arr.length
      assert(f === want, s"group=$g v=$v")
    }
    assert(got.length === 8)
  }
}
