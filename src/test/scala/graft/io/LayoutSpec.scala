package graft.io

import graft.SparkSpec
import graft.functions.{Expressions, HashFuncs}
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("zorder2 kernel: known interleave + column/SQL surfaces agree") {
    // a=5 (101), b=3 (011) → bits 0,1,3,4 set = 27
    assert(HashFuncs.zorder2(5L, 3L, 4) == 27L)
    assert(HashFuncs.zorder2(0L, 0L, 16) == 0L)
    // every bit of a lands even, of b lands odd
    assert(HashFuncs.zorder2((1L << 9), 0L, 10) == (1L << 18))
    assert(HashFuncs.zorder2(0L, (1L << 9), 10) == (1L << 19))
    val viaSql = spark.sql("SELECT zorder2(5, 3, 4) AS z").as[Long].head()
    assert(viaSql == 27L)
    val viaCol = Seq((5L, 3L)).toDF("a", "b")
      .select(Expressions.zorder2($"a", $"b", 4)).as[Long].head()
    assert(viaCol == 27L)
  }

  test("zorder2 is monotone-compatible with box locality") {
    // all points with both dims < 2^k have zkey < 2^(2k): the property
    // zone maps rely on — a small box is a small key range
    val k = 4
    for (a <- 0 until 16; b <- 0 until 16)
      assert(HashFuncs.zorder2(a.toLong, b.toLong, 8) < (1L << (2 * k)))
    assert(HashFuncs.zorder2(16L, 0L, 8) >= (1L << (2 * k)))
  }

  test("saveZOrdered clusters BOTH dimensions; linear layout only one") {
    val dir = java.nio.file.Files.createTempDirectory("layout").toString
    // full 256×256 grid: every (a, b) combination once
    val grid = spark.range(65536)
      .select(($"id" % 256).as("a"), ($"id" / 256).cast("long").as("b"))
    Store.saveZOrdered(grid, s"$dir/z", "a", "b", bits = 8, nFiles = 16)
    grid.repartitionByRange(16, $"a").sortWithinPartitions("a")
      .write.parquet(s"$dir/linear")

    def filesTouched(path: String,
        pred: org.apache.spark.sql.Column): Long =
      spark.read.parquet(path).filter(pred)
        .select(col("_metadata.file_path")).distinct().count()

    // predicate on the SECOND dimension: linear-by-a scatters it across
    // every file; z-order confines it to the low-zkey region
    val zB = filesTouched(s"$dir/z", $"b" < 16)
    val linB = filesTouched(s"$dir/linear", $"b" < 16)
    assert(linB == 16, s"linear layout should scatter b: $linB")
    assert(zB <= 8, s"z-order should confine b < 16 to few files: $zB")
    // predicate on the first dimension: z-order still prunes
    val zA = filesTouched(s"$dir/z", $"a" < 16)
    assert(zA <= 8, s"z-order should confine a < 16 to few files: $zA")
  }

  test("compactionPlan: greedy bins, oversized-file isolation, guards") {
    import graft.io.Store
    import spark.implicits._
    // 4 small files then one oversized then more small, target 100
    val files = Seq(("a", 40L), ("b", 40L), ("c", 40L), ("d", 40L),
      ("e", 250L), ("f", 40L), ("g", 40L)).toDF("path", "bytes")
    val plan = Store.compactionPlan(files, "path", "bytes", 100L)
      .select($"path", $"offset", $"bin")
      .as[(String, Long, Long)].collect().sortBy(_._1).toSeq
    // offsets are the exclusive prefix sums in path order
    assert(plan.map(_._2) == Seq(0L, 40L, 80L, 120L, 160L, 410L, 450L))
    // greedy: a,b,c share bin 0 (c STARTS inside it), d+e bin 1 (e
    // starts at 160 — a bin may overshoot by one file, never split),
    // f bin 4 (e pushed the offset past bins 2-3), g bin 4
    assert(plan.map(_._3) == Seq(0L, 0L, 0L, 1L, 1L, 4L, 4L))
    // column-name guards
    intercept[IllegalArgumentException] {
      Store.compactionPlan(files.withColumnRenamed("bytes", "offset"),
        "path", "offset", 100L)
    }
    intercept[IllegalArgumentException] {
      Store.compactionPlan(files, "path", "bytes", 0L)
    }
    // empty listing → empty plan
    assert(Store.compactionPlan(files.limit(0), "path", "bytes", 100L)
      .count() == 0L)
  }
}
