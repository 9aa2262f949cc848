package graft.io

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IoSpec extends SparkSpec {
  import spark.implicits._

  test("sample sheet: [Data] block skip + snake case + sentrix renames") {
    val dir = java.nio.file.Files.createTempDirectory("sheet")
    val f = dir.resolve("sheet.csv")
    java.nio.file.Files.writeString(f,
      """[Header],,,
        |Date,2024-01-01,,
        |[Data],,,
        |Sample_ID,SentrixBarcode_A,SentrixPosition_A,SampleType
        |s1,207001,R01C01,LNCAP
        |s2,207001,R02C01,PREC
        |""".stripMargin)
    val sheet = SampleSheet.read(spark, f.toString)
    assert(sheet.columns.toSeq ==
      Seq("sample_id", "sentrix_id", "sentrix_position", "sample_type"))
    assert(sheet.count() == 2)
    assert(sheet.filter($"sample_id" === "s1").head()
      .getAs[String]("sample_type") == "LNCAP")
  }

  test("sample sheet: plain csv without [Data] block") {
    val dir = java.nio.file.Files.createTempDirectory("sheet2")
    val f = dir.resolve("s.csv")
    java.nio.file.Files.writeString(f,
      "sample_id,age\ns1,42\n")
    val sheet = SampleSheet.read(spark, f.toString)
    assert(sheet.columns.toSeq == Seq("sample_id", "age"))
  }

  test("sheet inference from the three filename grammars") {
    val df = SampleSheet.inferFromFilenames(spark, Seq(
      "/d/GSM123_207001_R01C01_Grn.idat",
      "/d/207002_R02C01_Grn.idat",
      "/d/GSM999-weird-name-Grn.idat"))
    val rows = df.collect().map(r => r.getString(0) ->
      (Option(r.getString(2)), Option(r.getString(3)))).toMap
    assert(rows("GSM123") == (Some("207001"), Some("R01C01")))
    assert(rows("207002_R02C01") == (Some("207002"), Some("R02C01")))
    assert(rows.contains("GSM999"))
  }

  test("idat file matching by sample_id and sentrix key") {
    val files = Seq("/d/GSM1_111_R01C01_Grn.idat", "/d/GSM1_111_R01C01_Red.idat",
      "/d/222_R02C02_Grn.idat", "/d/222_R02C02_Red.idat")
    val sheet = Seq(
      Map("sample_id" -> "GSM1"),
      Map("sample_id" -> "x2", "sentrix_id" -> "222",
        "sentrix_position" -> "R02C02"))
    val matched = SampleSheet.matchIdatFiles(sheet, files)
    assert(matched.toSet == Set(
      ("GSM1", "G", files(0)), ("GSM1", "R", files(1)),
      ("x2", "G", files(2)), ("x2", "R", files(3))))
  }

  test("sesame import: type II values move from UG to MG; mask extracted") {
    val dir = java.nio.file.Files.createTempDirectory("sesame")
    val f = dir.resolve("sampleA.csv")
    java.nio.file.Files.writeString(f,
      """Probe_ID,MG,MR,UG,UR,mask
        |cg1,,,200.0,300.0,FALSE
        |cg3,310.0,311.0,300.0,301.0,TRUE
        |""".stripMargin)
    val manifest = Seq(
      ("cg1", "II", null: String, "cg", ""),
      ("cg3", "I", "G", "cg", ""))
      .toDF("probe_id", "inf_type", "channel", "probe_type", "mask_info")
    val (sig, masks) = Sesame.read(spark, Seq(f.toString), manifest)
    val cg1 = sig.filter($"probe_id" === "cg1").head()
    assert(cg1.getAs[Float]("meth_g") == 200f) // moved from UG
    assert(cg1.isNullAt(cg1.fieldIndex("unmeth_g")))
    assert(cg1.getAs[Float]("unmeth_r") == 300f)
    assert(cg1.getAs[String]("sample_label") == "sampleA")
    val cg3 = sig.filter($"probe_id" === "cg3").head()
    assert(cg3.getAs[Float]("meth_g") == 310f)
    assert(masks.collect().map(_.getString(2)).toSeq == Seq("cg3"))
  }

  test("store round-trips signal + masks partitioned by sample") {
    val dir = java.nio.file.Files.createTempDirectory("store").toString
    val sig = Seq(("s1", "cg1", "II", null: String, "cg", "",
      Some(1f), None: Option[Float], None: Option[Float], Some(2f),
      None: Option[Float]))
      .toDF("sample_label", "probe_id", "inf_type", "channel", "probe_type",
        "mask_info", "meth_g", "meth_r", "unmeth_g", "unmeth_r", "p_value")
    val masks = Seq(("m1", "s1", "cg1")).toDF("mask_name", "sample_label",
      "probe_id")
    Store.save(dir, sig, masks)
    val back = Store.loadSignal(spark, dir)
    assert(back.count() == 1)
    assert(back.head().getAs[String]("sample_label") == "s1")
    assert(Store.loadMasks(spark, dir).count() == 1)
    // partition pruning: reading one sample touches its directory only
    assert(new java.io.File(s"$dir/signal/sample_label=s1").exists())
  }

  test("bucketed store: probe-keyed join and aggregation of bucketed " +
      "tables plan no shuffle at all") {
    val dir = java.nio.file.Files.createTempDirectory("bstore").toString
    val sig = (1 to 500).map(i => (s"cg$i", s"s${i % 4}", i.toDouble))
      .toDF("probe_id", "sample_label", "value")
    val bet = (1 to 500).map(i => (s"cg$i", i / 500.0))
      .toDF("probe_id", "beta")
    Store.saveBucketedByProbe(sig, "bspec_sig", s"$dir/sig", nBuckets = 8)
    Store.saveBucketedByProbe(bet, "bspec_bet", s"$dir/bet", nBuckets = 8)
    // force the shuffle-join path (a KB fixture would otherwise
    // broadcast): at 100 TB neither side broadcasts, which is exactly
    // when bucket co-location matters
    val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      // co-located probe join: bucket metadata makes the shuffle vanish
      val j = Store.loadBucketed(spark, "bspec_sig")
        .join(Store.loadBucketed(spark, "bspec_bet"), "probe_id")
      assert(j.count() == 500)
      val jPlan = j.queryExecution.executedPlan.toString
      assert(!jPlan.contains("Exchange"), jPlan.take(2000))
      assert(jPlan.contains("Bucketed: true"), jPlan.take(2000))
      // probe-keyed aggregation: likewise shuffle-free
      val g = Store.loadBucketed(spark, "bspec_sig")
        .groupBy("probe_id").count()
      assert(g.count() == 500)
      val gPlan = g.queryExecution.executedPlan.toString
      assert(!gPlan.contains("Exchange"), gPlan.take(2000))
      // values survive the round trip
      assert(j.filter($"probe_id" === "cg7").head().getAs[Double]("beta")
        == 7 / 500.0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
      spark.sql("DROP TABLE IF EXISTS bspec_sig")
      spark.sql("DROP TABLE IF EXISTS bspec_bet")
    }
  }

  test("sheet write round-trips through read, incl quoted cells") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("sheetw").toString
    val sheet = Seq(("GSM1", "a,comma", "plain"),
      ("GSM2", "with \"quote\"", "x")).toDF("sample_id", "note", "grp")
    val path = s"$dir/sheet.csv"
    SampleSheet.write(sheet, path)
    val back = SampleSheet.read(spark, path).orderBy("sample_id").collect()
    assert(back.length === 2)
    assert(back(0).getAs[String]("note") === "a,comma")
    assert(back(1).getAs[String]("note") === "with \"quote\"")
  }

  test("fetch: file URL download + zip and tar.gz extraction") {
    val dir = java.nio.file.Files.createTempDirectory("fetch").toFile
    // build a zip fixture
    val zipF = new java.io.File(dir, "src.zip")
    val zos = new java.util.zip.ZipOutputStream(
      new java.io.FileOutputStream(zipF))
    zos.putNextEntry(new java.util.zip.ZipEntry("inner/a.txt"))
    zos.write("hello zip".getBytes)
    zos.closeEntry(); zos.close()
    val zOut = new java.io.File(dir, "zout")
    val zFiles = Fetch.downloadFromLink(zipF.toURI.toString,
      zOut.toString, Some("bundle.zip"))
    val aTxt = zFiles.find(_.getName == "a.txt").get
    assert(new String(java.nio.file.Files.readAllBytes(aTxt.toPath)) ===
      "hello zip")
    // build a tar.gz fixture (ustar: 512-byte header + padded payload)
    val payload = "GSM123_Grn.idat bytes".getBytes
    val header = new Array[Byte](512)
    val nameB = "GSM123/GSM123_Grn.idat".getBytes
    System.arraycopy(nameB, 0, header, 0, nameB.length)
    val sizeOctal = ("%011o" format payload.length) + "\u0000"
    System.arraycopy(sizeOctal.getBytes, 0, header, 124,
      sizeOctal.length)
    header(156) = '0'
    val tarF = new java.io.File(dir, "src.tar.gz")
    val tos = new java.util.zip.GZIPOutputStream(
      new java.io.FileOutputStream(tarF))
    tos.write(header); tos.write(payload)
    tos.write(new Array[Byte]((512 - payload.length % 512) % 512))
    tos.write(new Array[Byte](1024)) // two terminator blocks
    tos.close()
    val tOut = new java.io.File(dir, "tout")
    val tFiles = Fetch.downloadFromLink(tarF.toURI.toString,
      tOut.toString, Some("geo.tar.gz"))
    val idat = tFiles.find(_.getName.endsWith(".idat")).get
    assert(new String(java.nio.file.Files.readAllBytes(idat.toPath)) ===
      "GSM123_Grn.idat bytes")
  }

  test("mergeUpsert on a bucketed base plans no base-side Exchange") {
    val dir = java.nio.file.Files.createTempDirectory("bmerge").toString
    val base = (1 to 400).map(i => (s"cg$i", i.toDouble))
      .toDF("probe_id", "value")
    Store.saveBucketedByProbe(base, "bmerge_base", s"$dir/base",
      nBuckets = 8)
    val updates = (1 to 50).map(i => (s"cg$i", i * 2.0, i % 10 == 0))
      .toDF("probe_id", "value", "is_delete")
    val prevThresh =
      spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val merged = Store.mergeUpsert(
        Store.loadBucketed(spark, "bmerge_base"), updates, "probe_id")
      assert(merged.count() == 395) // 5 deletes, no inserts
      // the base side reads its buckets in place; only the (small)
      // update side pays an Exchange
      val plan = merged.queryExecution.executedPlan.toString
      assert(plan.contains("Bucketed: true"), plan.take(2000))
      assert(plan.linesIterator.count(_.contains("Exchange")) <= 1,
        plan.take(2000))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
    }
  }

  test("mergeUpsert: whole-row replace, delete, insert, untouched") {
    import spark.implicits._
    val base = Seq(
      (1L, Option("one"), Option("en")),
      (2L, Option("two"), Option("en")),
      (3L, Option("three"), Option("de")),
      (4L, Option("four"), Option("fr"))
    ).toDF("id", "text", "lang")
    val updates = Seq(
      // update with a NULL payload column: must REPLACE, not coalesce
      (2L, Option.empty[String], Option("es"), false),
      (3L, Option("drei"), Option("de"), true), // delete
      (9L, Option("nine"), Option("en"), false) // insert
    ).toDF("id", "text", "lang", "is_delete")
    val out = Store.mergeUpsert(base, updates, "id")
      .orderBy($"id").collect()
      .map(r => r.getLong(0) -> (Option(r.getString(1)),
        Option(r.getString(2)))).toMap
    assert(out.keySet == Set(1L, 2L, 4L, 9L))      // 3 deleted
    assert(out(1L) == ((Some("one"), Some("en")))) // untouched
    assert(out(2L) == ((None, Some("es"))))        // null REPLACES
    assert(out(9L) == ((Some("nine"), Some("en"))))
  }

  test("mergeUpsert rejects duplicate update keys (MERGE semantics) " +
      "unless the caller opts out") {
    import spark.implicits._
    val base = Seq((1L, Option("one"))).toDF("id", "text")
    val dupUpdates = Seq(
      (1L, Option("uno"), false),
      (1L, Option("eins"), false)).toDF("id", "text", "is_delete")
    val e = intercept[IllegalArgumentException] {
      Store.mergeUpsert(base, dupUpdates, "id")
    }
    assert(e.getMessage.contains("one source row per key"))
    // opt-out keeps the documented full-outer fan-out behavior
    val out = Store.mergeUpsert(base, dupUpdates, "id",
      checkDuplicates = false).collect()
    assert(out.length == 2)
  }
}
