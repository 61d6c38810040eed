package graft.format

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** NestedCommonFormat V5 nested columns (`jsonEncoding=nested`):
  * round-trips through the field-shredded layout, the internal-file
  * structure, variant fields, loud failure modes, and encoding
  * preservation on rewrite. The reference errors on ALL Complex
  * columns (src/column/mod.rs:59-61).
  */
class NestedColumnSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestSession.spark

  private def tmp(tag: String): String =
    Files.createTempDirectory(s"graft-$tag").toString + "/t"

  private def jsonRows: Seq[(Long, String)] = Seq(
    1L -> """{"a": 1, "b": {"c": "x", "d": 2.5}, "e": "s1"}""",
    2L -> """{"a": 2, "b": {"c": "y"}, "e": "s2"}""",
    3L -> null,
    4L -> """{}""",
    5L -> """{"a": 9223372036854775807, "b": {"d": -0.5}}""",
    6L -> """{"a": 1, "e": "s1"}""" // repeated values share dict entries
  )

  private def writeNested(dir: String): Unit = {
    import spark.implicits._
    jsonRows.map { case (t, j) => (1700000000000L + t, j) }
      .toDF("__time", "props").coalesce(1)
      .write.format("druid")
      .option("complexTypes", "props:json")
      .option("jsonEncoding", "nested")
      .mode("overwrite").save(dir)
  }

  test("round-trip: field extraction equals the blob encoding's") {
    import spark.implicits._
    val nestedDir = tmp("nested")
    val blobDir = tmp("nestedblob")
    writeNested(nestedDir)
    jsonRows.map { case (t, j) => (1700000000000L + t, j) }
      .toDF("__time", "props").coalesce(1)
      .write.format("druid").option("complexTypes", "props:json")
      .mode("overwrite").save(blobDir)
    def extract(dir: String) = spark.read.format("druid").load(dir)
      .select(
        get_json_object(col("props"), "$.a").cast("long").as("a"),
        get_json_object(col("props"), "$.b.c").as("c"),
        get_json_object(col("props"), "$.b.d").cast("double").as("d"),
        get_json_object(col("props"), "$.e").as("e"),
        col("props").isNull.as("is_null"))
      .orderBy(col("a").asc_nulls_first, col("e").asc_nulls_first)
      .collect().map(_.toSeq).toSeq
    assert(extract(nestedDir) == extract(blobDir))
  }

  test("internal smoosh files exist and the main file leads with V5") {
    val dir = tmp("nestedfiles")
    writeNested(dir)
    val segDir = graft.sources.druid.DruidTableUtil.discoverSegments(dir).head
    val seg = DruidSegment.open(segDir)
    Seq(NestedColumn.StringDictFile, NestedColumn.LongDictFile,
        NestedColumn.DoubleDictFile, NestedColumn.NullIndexFile,
        s"${NestedColumn.FieldFilePrefix}0").foreach { part =>
      assert(seg.smoosh.has(NestedColumn.internalName("props", part)),
        s"missing internal file props.$part")
    }
    val (desc, buf, dataBase, _) = seg.columnSlice("props")
    assert(desc.valueType == "COMPLEX" &&
      desc.partTypes.headOption.contains(NestedColumn.PartType))
    assert((buf.get(dataBase) & 0xff) == NestedColumn.V5)
    seg.column("props") match {
      case NestedColumnData(nc) =>
        // fields sorted; typeInfo bits reflect observed leaf types
        assert(nc.fieldPaths.toSeq == Seq("$.a", "$.b.c", "$.b.d", "$.e"))
        val types = nc.fieldPaths.zip(nc.fieldTypes).toMap
        assert(types("$.a") == NestedColumn.TypeLong)
        assert(types("$.b.c") == NestedColumn.TypeString)
        assert(types("$.b.d") == NestedColumn.TypeDouble)
        assert(nc.length == jsonRows.size)
        assert(nc.nullRows.getCardinality == 1)
        // reconstruction: row 3 (index 2) is null, row 4 (index 3) = {}
        assert(nc.jsonAt(2) == null)
        assert(nc.jsonAt(3) == "{}")
        assert(nc.jsonAt(0).contains("\"c\":\"x\""))
      case other => fail(s"expected NestedColumnData, got $other")
    }
  }

  test("variant field (long + string across rows) keeps both types") {
    import spark.implicits._
    val dir = tmp("nestedvariant")
    Seq(
      (1700000000001L, """{"v": 1}"""),
      (1700000000002L, """{"v": "one"}"""),
      (1700000000003L, """{"v": 2.5}"""))
      .toDF("__time", "props").coalesce(1)
      .write.format("druid").option("complexTypes", "props:json")
      .option("jsonEncoding", "nested").mode("overwrite").save(dir)
    val segDir = graft.sources.druid.DruidTableUtil.discoverSegments(dir).head
    val nc = DruidSegment.open(segDir).column("props")
      .asInstanceOf[NestedColumnData].nested
    assert(nc.fieldTypes(0) == (NestedColumn.TypeLong |
      NestedColumn.TypeString | NestedColumn.TypeDouble))
    assert(nc.jsonAt(0) == """{"v":1}""")
    assert(nc.jsonAt(1) == """{"v":"one"}""")
    assert(nc.jsonAt(2) == """{"v":2.5}""")
  }

  test("struct columns (df nested types) can land nested directly") {
    import spark.implicits._
    val dir = tmp("nestedstruct")
    Seq((1700000000001L, 7L, "x"), (1700000000002L, 8L, "y"))
      .toDF("__time", "k", "s")
      .select(col("__time"), struct(col("k"), col("s")).as("props"))
      .coalesce(1)
      .write.format("druid").option("jsonEncoding", "nested")
      .mode("overwrite").save(dir)
    val got = spark.read.format("druid").load(dir)
      .select(get_json_object(col("props"), "$.k").cast("long").as("k"),
        get_json_object(col("props"), "$.s").as("s"))
      .orderBy("k").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == Seq((7L, "x"), (8L, "y")))
  }

  test("booleans store as LONG 0/1 (Druid strict-booleans ingest)") {
    import spark.implicits._
    val dir = tmp("nestedbool")
    Seq((1700000000001L, """{"f": true}"""), (1700000000002L, """{"f": false}"""))
      .toDF("__time", "props").coalesce(1)
      .write.format("druid").option("complexTypes", "props:json")
      .option("jsonEncoding", "nested").mode("overwrite").save(dir)
    val got = spark.read.format("druid").load(dir)
      .select(get_json_object(col("props"), "$.f").cast("long"))
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(got == Seq(0L, 1L))
  }

  test("arrays of primitives round-trip through the array dictionary") {
    import spark.implicits._
    val dir = tmp("nestedarr")
    Seq(
      (1700000000001L, """{"tags": ["a", "b"], "k": 1}"""),
      (1700000000002L, """{"tags": ["b"], "nums": [1, 2.5, null]}"""),
      (1700000000003L, """{"tags": [], "k": 2}"""),
      (1700000000004L, """{"tags": ["a", "b"]}"""), // dict-shared with row 1
      (1700000000005L, """{"k": 3}"""))
      .toDF("__time", "props").coalesce(1)
      .write.format("druid").option("complexTypes", "props:json")
      .option("jsonEncoding", "nested").mode("overwrite").save(dir)
    val segDir = graft.sources.druid.DruidTableUtil.discoverSegments(dir).head
    val seg = DruidSegment.open(segDir)
    assert(seg.smoosh.has(NestedColumn.internalName("props",
      NestedColumn.ArrayDictFile)))
    val nc = seg.column("props").asInstanceOf[NestedColumnData].nested
    assert((nc.fieldTypes(nc.fieldIndex("$.tags")) &
      NestedColumn.TypeArray) != 0)
    assert(nc.jsonAt(0) == """{"k":1,"tags":["a","b"]}""")
    assert(nc.jsonAt(1) == """{"nums":[1,2.5,null],"tags":["b"]}""")
    assert(nc.jsonAt(2) == """{"k":2,"tags":[]}""")
    assert(nc.jsonAt(3) == """{"tags":["a","b"]}""")
    // an array-typed field never offers a bitmap selection (scalar
    // probes cannot model array text), scalar fields still do
    assert(nc.eqBitmap("$.tags", Seq("a")).isEmpty)
    assert(nc.eqBitmap("$.k", Seq("2")).isDefined)
    // end-to-end through Spark: element extraction works on the surface
    val got = spark.read.format("druid").load(dir)
      .select(get_json_object(col("props"), "$.tags[0]").as("t0"))
      .collect().map(r => Option(r.getString(0))).toSeq
    assert(got == Seq(Some("a"), Some("b"), None, Some("a"), None))
  }

  test("arrays of objects shred element-wise; unreconstructable shapes fail loudly") {
    import spark.implicits._
    def attempt(json: String): String = {
      val dir = tmp("nestedarrbad")
      val e = intercept[Throwable] {
        Seq((1700000000001L, json)).toDF("__time", "props").coalesce(1)
          .write.format("druid").option("complexTypes", "props:json")
          .option("jsonEncoding", "nested").mode("overwrite").save(dir)
      }
      var c: Throwable = e
      while (c.getCause != null && c.getCause != c) c = c.getCause
      String.valueOf(c.getMessage)
    }
    // arrays of objects are IN scope now (dr76 gates query semantics;
    // here: round-trip + bracketed field paths + sparse second rows)
    val dir = tmp("nestedarrobj")
    Seq(
      (1700000000001L,
       """{"a": [{"b": 1, "t": ["x","y"]}, {"b": 2, "c": {"d": "z"}}]}"""),
      (1700000000002L, """{"a": [{"b": 9}]}"""),
      (1700000000003L, null.asInstanceOf[String]))
      .toDF("__time", "props").coalesce(1)
      .write.format("druid").option("complexTypes", "props:json")
      .option("jsonEncoding", "nested").mode("overwrite").save(dir)
    val back = spark.read.format("druid").load(dir)
      .selectExpr(
        "get_json_object(props, '$.a[0].b') AS b0",
        "get_json_object(props, '$.a[1].b') AS b1",
        "get_json_object(props, '$.a[1].c.d') AS d1",
        "get_json_object(props, '$.a[0].t[1]') AS t01",
        "props")
      .orderBy("b0").collect()
    assert(back.length == 3)
    assert(back(0).isNullAt(0) && back(0).isNullAt(4)) // null row stays null
    assert(back(1).getString(0) == "1" && back(1).getString(1) == "2")
    assert(back(1).getString(2) == "z" && back(1).getString(3) == "y")
    assert(back(2).getString(0) == "9" && back(2).isNullAt(1))
    // rebuilt texts parse back to the ingested trees (order-insensitive)
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    assert(om.readTree(back(2).getString(4)) ==
      om.readTree("""{"a": [{"b": 9}]}"""))
    assert(om.readTree(back(1).getString(4)) == om.readTree(
      """{"a": [{"b": 1, "t": ["x","y"]}, {"b": 2, "c": {"d": "z"}}]}"""))

    // still loud: nested arrays, mixed object/scalar arrays, and
    // elements that would shred to nothing
    assert(attempt("""{"a": [[1]]}""").contains("array elements"))
    assert(attempt("""{"a": [{"b": 1}, 2]}""").contains("mixes"))
    assert(attempt("""{"a": [{}]}""").contains("no non-null leaf"))
    assert(attempt("""{"a": [{"b": null}]}""").contains("no non-null leaf"))
  }

  test("real-Druid front-coded array dictionary fails loudly, never misreads") {
    import spark.implicits._
    // Real Druid stores the V5 array dictionary FRONT-CODED
    // (FrontCodedIntArrayIndexed); its buffers can lead with the same
    // 0x00 version byte as our plain id-sequence layout, so without a
    // flags/consumption check the reader would parse garbage id
    // sequences instead of refusing. Write a segment WITH arrays, then
    // byte-patch the array dictionary to the front-coded leading shape
    // (version 0x00, bucket-size byte 0x04) and assert the refusal
    // names the front-coded variant.
    val dir = tmp("nestedfrontcoded")
    Seq((1700000000001L, """{"a": [1, 2], "b": 1}"""),
        (1700000000002L, """{"a": [3], "b": 2}"""))
      .toDF("__time", "props").coalesce(1)
      .write.format("druid").option("complexTypes", "props:json")
      .option("jsonEncoding", "nested").mode("overwrite").save(dir)
    val segDir = graft.sources.druid.DruidTableUtil.discoverSegments(dir).head
    val entry = DruidSegment.open(segDir).smoosh
      .entry(NestedColumn.internalName("props", NestedColumn.ArrayDictFile))
      .getOrElse(fail("array dictionary internal file missing"))
    val raf = new java.io.RandomAccessFile(
      new java.io.File(segDir, f"${entry.chunk}%05d.smoosh"), "rw")
    try {
      raf.seek(entry.start.toLong)
      raf.write(Array[Byte](0x00, 0x04)) // version 0, bucketSize 4
    } finally raf.close()
    val e = intercept[DruidFormatException] {
      DruidSegment.open(segDir).column("props")
    }
    assert(e.getMessage.contains("front-cod"), e.getMessage)
    assert(e.getMessage.contains("array dictionary"), e.getMessage)
  }

  test("real-Druid SMILE __raw internal file fails loudly at column open") {
    import spark.implicits._
    // Real Druid V5 segments also carry the raw rows SMILE-encoded as
    // `<col>.__raw`. This reader rebuilds JSON from the shredded
    // fields and never validates that reconstruction against a SMILE
    // blob (no real fixture offline) — so __raw presence marks a
    // segment this writer cannot have produced, and the open must
    // refuse rather than return approximated full-column JSON.
    // Simulate by appending a __raw entry to meta.smoosh.
    val dir = tmp("nestedraw")
    writeNested(dir)
    val segDir = graft.sources.druid.DruidTableUtil.discoverSegments(dir).head
    val meta = new java.io.File(segDir, "meta.smoosh").toPath
    Files.writeString(meta,
      Files.readString(meta) +
        NestedColumn.internalName("props", NestedColumn.RawFile) +
        ",0,0,10\n")
    val e = intercept[DruidFormatException] {
      DruidSegment.open(segDir).column("props")
    }
    assert(e.getMessage.contains("__raw"), e.getMessage)
    assert(e.getMessage.contains("SMILE"), e.getMessage)
  }

  test("non-object roots and path-metacharacter keys fail loudly") {
    import spark.implicits._
    def attempt(json: String): Throwable = {
      val dir = tmp("nestedbad")
      intercept[Throwable] {
        Seq((1700000000001L, json)).toDF("__time", "props").coalesce(1)
          .write.format("druid").option("complexTypes", "props:json")
          .option("jsonEncoding", "nested").mode("overwrite").save(dir)
      }
    }
    def rootOf(e: Throwable): String = {
      var c = e; while (c.getCause != null && c.getCause != c) c = c.getCause
      String.valueOf(c.getMessage)
    }
    assert(rootOf(attempt(""""scalar"""")).contains("root must be a JSON object"))
    assert(rootOf(attempt("""{"a.b": 1}""")).contains("path metacharacter"))
  }

  test("read-then-rewrite preserves the nested encoding (metadata tag)") {
    import spark.implicits._
    val dir = tmp("nestedsrc")
    val dir2 = tmp("nesteddst")
    writeNested(dir)
    // no options at all on the rewrite: the druid.complexType =
    // nestedCommonFormat metadata rides the schema
    spark.read.format("druid").load(dir)
      .write.format("druid").mode("overwrite").save(dir2)
    val segDir = graft.sources.druid.DruidTableUtil.discoverSegments(dir2).head
    val (desc, _, _) = DruidSegment.open(segDir).columnHeader("props")
    assert(desc.partTypes.headOption.contains(NestedColumn.PartType),
      s"rewrite degraded the nested column to ${desc.partTypes}")
    val a = spark.read.format("druid").load(dir2)
      .select(get_json_object(col("props"), "$.a").cast("long"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getLong(0)).toSet
    assert(a == Set(1L, 2L, 9223372036854775807L, null))
  }

  test("segment validator passes a nested segment") {
    val dir = tmp("nestedvalid")
    writeNested(dir)
    val issues = SegmentValidator.validateTable(dir).flatMap(_._2)
    assert(issues.isEmpty, issues.mkString("; "))
  }

  test("vByte round-trips") {
    Seq(0, 1, 127, 128, 300, 16383, 16384, Int.MaxValue).foreach { v =>
      val b = NestedColumn.vByte(v)
      val (got, next) = NestedColumn.readVByte(
        java.nio.ByteBuffer.wrap(b), 0)
      assert(got == v && next == b.length, s"vByte($v)")
    }
  }
}
