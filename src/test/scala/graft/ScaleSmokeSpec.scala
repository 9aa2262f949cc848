package graft

/** CI smoke for the ScaleBench machinery (the generator + the scaled
  * run path feed a judge-graded artifact, so they must not rot between
  * the rounds that execute the full 14-minute rung): generate x1/x2
  * replicas of sf0.001 into a temp dir, check the copy discipline —
  * exact 2× row counts, disjoint key ranges, caesar-shifted text that
  * is NOT a near-duplicate of its source copy — and run two registered
  * queries end-to-end on the replica to prove the scaled dirs satisfy
  * the `Q.t` table contract. */
class ScaleSmokeSpec extends SparkSpec {
  import spark.implicits._

  private lazy val root = java.nio.file.Files
    .createTempDirectory("graft-scale-smoke").toString

  test("generate: x2 replica doubles rows, shifts keys, rotates text") {
    val base = sf("sf0.001")
    ScaleBench.generate(spark, base, s"$root/x2", 2)
    val b = spark.read.parquet(s"$base/lineitem.parquet")
    val g = spark.read.parquet(s"$root/x2/lineitem.parquet")
    assert(g.count() == 2 * b.count())
    // copy 1 shifted beyond copy 0's key domain — the join keys of the
    // two copies can never collide
    val maxBase = b.agg(org.apache.spark.sql.functions
      .max($"l_orderkey")).head.getLong(0)
    val n1 = g.filter($"l_orderkey" > maxBase).count()
    assert(n1 == b.count(), s"copy-1 rows: $n1 vs ${b.count()}")
    val d = spark.read.parquet(s"$root/x2/documents.parquet")
    val db = spark.read.parquet(s"$base/documents.parquet")
    assert(d.count() == 2 * db.count())
    // caesar rotation: copy-1 text differs from copy-0 but preserves
    // length (token/char distributions carry over)
    val pair = d.select($"doc_id" % 100000000L, $"text")
      .toDF("k", "text")
      .groupBy($"k")
      .agg(org.apache.spark.sql.functions.countDistinct($"text")
        .as("variants"),
        org.apache.spark.sql.functions.countDistinct(
          org.apache.spark.sql.functions.length($"text")).as("lens"))
    assert(pair.filter($"variants" =!= 2).count() == 0,
      "every doc must get a distinct rotated copy")
    assert(pair.filter($"lens" =!= 1).count() == 0,
      "rotation must preserve text length")
  }

  test("registered queries run on the generated replica dirs") {
    ScaleBench.generate(spark, sf("sf0.001"), s"$root/x2", 2)
    // one lineitem-derived and one documents-derived query
    assert(SparkEntry.queries("q82_masks_endtoend")(
      spark, s"$root/x2").count() > 0)
    assert(SparkEntry.queries("q124_dedup_eval")(
      spark, s"$root/x2").count() > 0)
    spark.catalog.clearCache()
  }
}
