package graft.format

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets.UTF_8

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.ObjectNode

/** Druid NestedCommonFormat nested columns (the modern "auto" /
  * COMPLEX&lt;json&gt; type, format V5) — reader + writer.
  *
  * Modern Druid (>= 24) stores nested data NOT as opaque blobs but as
  * a field-shredded layout: a list of leaf field paths, global value
  * dictionaries shared across fields, and one dictionary-encoded
  * sub-column per field, all inside the smoosh under internal logical
  * files named `<column>.<part>` (Druid's
  * ColumnSerializerUtils.getInternalFileName convention). The
  * reference errors on ALL Complex columns (src/column/mod.rs:59-61),
  * so this is beyond-parity interop — the same class as the CONCISE
  * bitmap work.
  *
  * Layout implemented here (after the ColumnDescriptor JSON header,
  * part type "nestedCommonFormat"):
  *
  * main logical file:
  *   [version byte 0x05]
  *   [VByte column-name length][column name UTF-8]   (Druid V5 carries
  *                                                    its own name)
  *   [fields: GenericIndexed of jq-ish path strings "$.a.b", sorted]
  *   [fieldTypes: ONE byte per field — bitmask STRING=1 LONG=2
  *    DOUBLE=4 ARRAY=8]
  *
  * internal logical files (smoosh entries named "<col>.<part>"):
  *   <col>.__stringDictionary  GenericIndexed object-strings, sorted,
  *                             element 0 = null (global id 0 = null)
  *   <col>.__longDictionary    FixedIndexed longs (8B BE), sorted
  *   <col>.__doubleDictionary  FixedIndexed doubles (8B BE), sorted
  *   <col>.__arrayDictionary   arrays of primitives as sequences of
  *                             global ELEMENT ids: [version 0][flags]
  *                             [i32 count][per array: i32 len +
  *                             len * i32 gids], sorted lexicographically
  *                             (real Druid front-codes these; we store
  *                             them plain — same id-sequence model)
  *   <col>.__nullIndex         roaring bitmap of null ROWS (the same
  *                             one-element GenericIndexed + 0x01 type
  *                             byte shape as every other bitmap here)
  *   <col>.__field_<i>         per-field sub-column, concatenated:
  *       [localDict: FixedIndexed ints — sorted GLOBAL ids]
  *       [rows: VSizeInts of per-row LOCAL ids]
  *       [bitmaps: GenericIndexed, one 0x01-prefixed roaring bitmap
  *        per local id — rows where the field holds that value]
  *
  * Global dictionary id space (Druid's stacked-ranges scheme):
  * id 0 = null; string ids [0, nStr); long ids [nStr, nStr+nLong);
  * double ids [nStr+nLong, nStr+nLong+nDouble); array ids stack after
  * doubles.
  *
  * The decode surface is the same JSON STRING the blob encoding
  * (`jsonEncoding=blob`, the default) produces: each row's object is
  * REBUILT from the per-field columns + global dictionaries — no SMILE
  * codec needed (real Druid's `__raw` blob is SMILE-encoded; this
  * reader never touches `__raw`, which is also why it stays readable
  * offline). Missing fields and explicit JSON nulls both land as
  * global id 0 and reconstruct as an ABSENT key — the distinction
  * Druid itself does not preserve; `get_json_object` answers null for
  * both. JSON booleans are stored as LONG 0/1 (Druid's strict-booleans
  * ingest behavior).
  *
  * Fidelity note: structure (version byte, in-file column name, fields
  * list + type-info bytes, internal-file naming, stacked global id
  * ranges, FixedIndexed/GenericIndexed building blocks) follows the
  * documented V5 design; exact byte-level compatibility with a given
  * Druid release is validated only against THIS writer's output — the
  * sandbox has no real nested fixture (FIXTURES.md §1). A mismatched
  * real-world segment fails loudly at a version/size check, never
  * silently misreads; `druid-tool validate` remains the first-contact
  * tripwire.
  */
object NestedColumn {
  val V5: Int = 0x05
  val PartType = "nestedCommonFormat"

  val StringDictFile = "__stringDictionary"
  val LongDictFile = "__longDictionary"
  val DoubleDictFile = "__doubleDictionary"
  val ArrayDictFile = "__arrayDictionary"
  val NullIndexFile = "__nullIndex"
  val FieldFilePrefix = "__field_"
  /** Real Druid's SMILE-encoded raw-rows file — never written or read
    * here; its PRESENCE marks a real-Druid segment and trips a loud
    * refusal at column open (see the reader). */
  val RawFile = "__raw"

  /** Internal smoosh name for a column part (real Druid:
    * ColumnSerializerUtils.getInternalFileName).
    */
  def internalName(col: String, part: String): String = s"$col.$part"

  // field type-info bits (one byte per field)
  val TypeString = 0x01
  val TypeLong = 0x02
  val TypeDouble = 0x04
  val TypeArray = 0x08

  private val mapper = new ObjectMapper()

  // ---- VByte (Druid's io.druid VByte: 7-bit groups, the TERMINATING
  //      byte carries the 0x80 flag; most-significant group first) ----
  private[format] def vByte(v: Int): Array[Byte] = {
    require(v >= 0, s"vByte: negative $v")
    val groups = scala.collection.mutable.ArrayBuffer[Int]()
    var x = v
    do { groups.prepend(x & 0x7f); x >>>= 7 } while (x != 0)
    groups.indices.map { i =>
      (if (i == groups.size - 1) groups(i) | 0x80 else groups(i)).toByte
    }.toArray
  }
  private[format] def readVByte(buf: ByteBuffer, pos: Int): (Int, Int) = {
    var v = 0
    var p = pos
    var b = 0
    do {
      b = buf.get(p) & 0xff
      v = (v << 7) | (b & 0x7f)
      p += 1
    } while ((b & 0x80) == 0)
    (v, p)
  }

  // -------------------------------------------------------- writer

  /** Encode a nested column from per-row JSON texts (null entry = null
    * row). Returns (main column binary WITHOUT the descriptor header,
    * internal logical files to add to the smoosh).
    *
    * Scope (fails LOUDLY outside it, by design — blob encoding remains
    * the always-works default): the root of every non-null row must be
    * a JSON object; leaf values are strings, integral numbers (long),
    * floating numbers (double), booleans (stored as LONG 0/1), or
    * null; arrays of scalars ride the array dictionary; arrays of
    * OBJECTS shred element-wise into `path[i].k` fields (the
    * StructuredDataProcessor shape) — mixed object/scalar arrays and
    * elements with no non-null leaf are rejected (no faithful
    * rendering / unreconstructable); object keys must not contain
    * '.', '[' or ']' (they would be ambiguous inside jq-ish paths).
    */
  /** Per-stage nanos of the LAST write() on this thread. Dev-probe
    * instrumentation (NestedWriteProbe): the sf10 probe measured a
    * ~40% nested-encode premium over blob and this attributes it per
    * stage. A handful of nanoTime calls per column write — negligible
    * next to the megabytes encoded between them. */
  private[graft] val lastStageNanos =
    new ThreadLocal[Seq[(String, Long)]] {
      override def initialValue: Seq[(String, Long)] = Nil
    }

  def write(colName: String, jsonTexts: Array[String])
      : (Array[Byte], Seq[(String, Array[Byte])]) = {
    val tWrite0 = System.nanoTime()
    val n = jsonTexts.length
    val nullRows = new java.util.BitSet(n)
    // path -> (row -> typed value); values: String | java.lang.Long |
    // java.lang.Double
    val fieldVals =
      scala.collection.mutable.LinkedHashMap[String, Array[AnyRef]]()

    // does this subtree contribute at least one field? (empty objects /
    // all-null leaves shred to NOTHING, so a rebuilt row would silently
    // lose them — the writer rejects those shapes loudly instead)
    def hasLeaf(v: JsonNode): Boolean =
      if (v.isNull) false
      else if (v.isObject) {
        val it = v.properties().iterator()
        var found = false
        while (it.hasNext && !found) found = hasLeaf(it.next().getValue)
        found
      } else if (v.isArray) {
        val els = { val b = Vector.newBuilder[JsonNode]
          v.elements().forEachRemaining(b += _); b.result() }
        // scalar arrays (incl. empty) are a field value themselves;
        // object arrays need a reconstructable element
        if (els.forall(el => !el.isObject)) true else els.exists(hasLeaf)
      } else true

    def flatten(row: Int, prefix: String, node: JsonNode): Unit = {
      if (!node.isObject)
        throw new IllegalArgumentException(
          s"nested column '$colName' row $row: root must be a JSON " +
            s"object (got ${node.getNodeType}); use jsonEncoding=blob " +
            "for non-object payloads")
      node.properties().forEach { e =>
        val k = e.getKey
        if (k.exists(c => c == '.' || c == '[' || c == ']'))
          throw new IllegalArgumentException(
            s"nested column '$colName': key '$k' contains a path " +
              "metacharacter (./[/]); use jsonEncoding=blob")
        val path = s"$prefix.$k"
        val v = e.getValue
        if (v.isObject) flatten(row, path, v)
        else if (v.isNull) () // explicit null == absent, Druid-style
        else if (v.isArray) {
          val els = { val b = Vector.newBuilder[JsonNode]
            v.elements().forEachRemaining(b += _); b.result() }
          if (els.exists(_.isObject)) {
            // element-wise shredding, the StructuredDataProcessor
            // shape: `path[i].k` fields per element. All elements must
            // be objects (mixed scalar/object arrays have no faithful
            // field rendering) with at least one non-null leaf each
            // (an element that shreds to nothing cannot be rebuilt).
            if (!els.forall(_.isObject))
              throw new IllegalArgumentException(
                s"nested column '$colName' field $path: array mixes " +
                  "objects and scalars; use jsonEncoding=blob")
            els.zipWithIndex.foreach { case (el, i) =>
              if (!hasLeaf(el))
                throw new IllegalArgumentException(
                  s"nested column '$colName' field $path[$i]: array " +
                    "element has no non-null leaf (it would shred to " +
                    "nothing and be lost on rebuild); use " +
                    "jsonEncoding=blob")
              flatten(row, s"$path[$i]", el)
            }
          } else {
            val elems = Vector.newBuilder[AnyRef]
            els.foreach { el =>
              if (el.isNull) elems += null
              else if (el.isTextual) elems += el.asText()
              else if (el.isBoolean)
                elems += java.lang.Long.valueOf(if (el.asBoolean()) 1L else 0L)
              else if (el.isIntegralNumber && el.canConvertToLong)
                elems += java.lang.Long.valueOf(el.asLong())
              else if (el.isFloatingPointNumber)
                elems += java.lang.Double.valueOf(el.asDouble())
              else throw new IllegalArgumentException(
                s"nested column '$colName' field $path: array elements " +
                  s"must be scalars or objects (got ${el.getNodeType}); " +
                  "use jsonEncoding=blob")
            }
            fieldVals.getOrElseUpdate(path, new Array[AnyRef](n))(row) =
              elems.result()
          }
        } else {
          val typed: AnyRef =
            if (v.isTextual) v.asText()
            else if (v.isBoolean) java.lang.Long.valueOf(if (v.asBoolean()) 1L else 0L)
            else if (v.isIntegralNumber) {
              if (!v.canConvertToLong)
                throw new IllegalArgumentException(
                  s"nested column '$colName' field $path: integer " +
                    "exceeds 64 bits; use jsonEncoding=blob")
              java.lang.Long.valueOf(v.asLong())
            } else if (v.isFloatingPointNumber)
              java.lang.Double.valueOf(v.asDouble())
            else
              throw new IllegalArgumentException(
                s"nested column '$colName' field $path: unsupported " +
                  s"JSON node ${v.getNodeType}")
          fieldVals.getOrElseUpdate(path, new Array[AnyRef](n))(row) = typed
        }
      }
    }

    var r = 0
    while (r < n) {
      val t = jsonTexts(r)
      if (t == null) nullRows.set(r)
      else flatten(r, "$", mapper.readTree(t))
      r += 1
    }
    val tParsed = System.nanoTime()

    val fields = fieldVals.keys.toArray.sorted
    // global dictionaries. Hash-pool then sort ONCE: the old SortedSet
    // paid a tree insert per VALUE (n x fields), this pays a hash probe
    // per value and a sort per DISTINCT — the NestedWriteProbe measured
    // the dictionary stage at ~20% of encode time before the swap
    val strings = new java.util.HashSet[String]()
    val longs = new java.util.HashSet[java.lang.Long]()
    val doubles = new java.util.HashSet[java.lang.Double]()
    def pool(v: AnyRef): Unit = v match {
      case s: String           => strings.add(s)
      case l: java.lang.Long   => longs.add(l)
      case d: java.lang.Double => doubles.add(d)
      case arr: Vector[_]      => arr.foreach(e => pool(e.asInstanceOf[AnyRef]))
      case null                => ()
    }
    fieldVals.values.foreach(_.foreach(pool))
    val strArr = {
      val a = strings.toArray(new Array[String](strings.size))
      java.util.Arrays.sort(a.asInstanceOf[Array[AnyRef]], null)
      a
    }
    val longArr = {
      val a = new Array[Long](longs.size)
      val it = longs.iterator(); var i = 0
      while (it.hasNext) { a(i) = it.next().longValue(); i += 1 }
      java.util.Arrays.sort(a); a
    }
    val dblArr = {
      val a = new Array[Double](doubles.size)
      val it = doubles.iterator(); var i = 0
      while (it.hasNext) { a(i) = it.next().doubleValue(); i += 1 }
      java.util.Arrays.sort(a); a
    }
    val nStr = 1 + strArr.length // id 0 = null

    // value -> global id maps (one hash probe per value beats a
    // binary search per value in the per-field gid pass)
    val gidOf = new java.util.HashMap[AnyRef, Integer](
      2 * (strArr.length + longArr.length + dblArr.length) + 16)
    strArr.indices.foreach(i => gidOf.put(strArr(i), 1 + i))
    longArr.indices.foreach(i =>
      gidOf.put(java.lang.Long.valueOf(longArr(i)), nStr + i))
    dblArr.indices.foreach(i =>
      gidOf.put(java.lang.Double.valueOf(dblArr(i)),
        nStr + longArr.length + i))

    def scalarIdOf(v: AnyRef): Int =
      if (v == null) 0 else gidOf.get(v).intValue()
    // array dictionary: distinct element-gid sequences, sorted
    // lexicographically; array gids stack after the double range
    import scala.math.Ordering.Implicits.seqOrdering
    val arrSeqs: Array[Vector[Int]] = fieldVals.values.iterator
      .flatMap(_.iterator).collect { case a: Vector[_] =>
        a.map(e => scalarIdOf(e.asInstanceOf[AnyRef]))
      }.toSet.toArray.sorted
    val arrBase = nStr + longArr.length + dblArr.length
    val arrIdx: Map[Vector[Int], Int] = arrSeqs.zipWithIndex.toMap
    val tDicts = System.nanoTime()

    def globalIdOf(v: AnyRef): Int = v match {
      case a: Vector[_] =>
        arrBase + arrIdx(a.map(e => scalarIdOf(e.asInstanceOf[AnyRef])))
      case other => scalarIdOf(other)
    }

    // per-field type-info byte
    val typeBytes = fields.map { f =>
      var bits = 0
      fieldVals(f).foreach {
        case _: String           => bits |= TypeString
        case _: java.lang.Long   => bits |= TypeLong
        case _: java.lang.Double => bits |= TypeDouble
        case _: Vector[_]        => bits |= TypeArray
        case null                => ()
      }
      bits.toByte
    }

    // main file
    val main = {
      val bos = new java.io.ByteArrayOutputStream()
      bos.write(V5)
      val nameBytes = colName.getBytes(UTF_8)
      bos.write(vByte(nameBytes.length))
      bos.write(nameBytes)
      bos.write(GenericIndexed.writeObjectStrings(
        fields.toIndexedSeq, sorted = true))
      bos.write(typeBytes)
      bos.toByteArray
    }

    def fixedIndexedInts(vs: Array[Int]): Array[Byte] = {
      val bb = ByteBuffer.allocate(6 + vs.length * 4)
      bb.put(0: Byte).put(FixedIndexed.SortedFlag.toByte).putInt(vs.length)
      vs.foreach(bb.putInt)
      bb.array()
    }
    def fixedIndexedLongs(vs: Array[Long]): Array[Byte] = {
      val bb = ByteBuffer.allocate(6 + vs.length * 8)
      bb.put(0: Byte).put(FixedIndexed.SortedFlag.toByte).putInt(vs.length)
      vs.foreach(bb.putLong)
      bb.array()
    }
    def fixedIndexedDoubles(vs: Array[Double]): Array[Byte] = {
      val bb = ByteBuffer.allocate(6 + vs.length * 8)
      bb.put(0: Byte).put(FixedIndexed.SortedFlag.toByte).putInt(vs.length)
      vs.foreach(bb.putDouble)
      bb.array()
    }
    def roaring(rows: Iterable[Int]): Array[Byte] = {
      val bm = new org.roaringbitmap.RoaringBitmap()
      rows.foreach(bm.add)
      bm.runOptimize()
      val b = new java.io.ByteArrayOutputStream()
      val d = new java.io.DataOutputStream(b)
      d.writeByte(0x01)
      bm.serialize(d)
      d.flush()
      b.toByteArray
    }

    val internal = scala.collection.mutable.ArrayBuffer[(String, Array[Byte])]()
    internal += internalName(colName, StringDictFile) ->
      GenericIndexed.writeObjectStrings(
        (null +: strArr.toSeq), sorted = true)
    internal += internalName(colName, LongDictFile) -> fixedIndexedLongs(longArr)
    internal += internalName(colName, DoubleDictFile) -> fixedIndexedDoubles(dblArr)
    internal += internalName(colName, ArrayDictFile) -> {
      val size = 6 + arrSeqs.map(a => 4 + a.length * 4).sum
      val bb = ByteBuffer.allocate(size)
      bb.put(0: Byte).put(FixedIndexed.SortedFlag.toByte).putInt(arrSeqs.length)
      arrSeqs.foreach { a => bb.putInt(a.length); a.foreach(bb.putInt) }
      bb.array()
    }
    internal += internalName(colName, NullIndexFile) ->
      GenericIndexed.writeLengthPrefixed(
        Seq(roaring(nullRows.stream().toArray.toSeq)), sorted = false)
    val tDictEmit = System.nanoTime()

    var nsGids = 0L; var nsBuild = 0L; var nsEmit = 0L
    fields.zipWithIndex.foreach { case (f, fi) =>
      val vals = fieldVals(f)
      val tf0 = System.nanoTime()
      val globals = Array.tabulate(n)(i => globalIdOf(vals(i)))
      val tf1 = System.nanoTime()
      val localDict = globals.distinct.sorted
      // one pass over the rows builds BOTH the local-id sequence and
      // every value bitmap (a per-value filter scan would be
      // O(dictSize * rows) — quadratic on high-cardinality fields)
      val localRows = new Array[Int](n)
      val bms = Array.fill(localDict.length)(new org.roaringbitmap.RoaringBitmap())
      var i = 0
      while (i < n) {
        val li = java.util.Arrays.binarySearch(localDict, globals(i))
        localRows(i) = li
        bms(li).add(i)
        i += 1
      }
      val tf2 = System.nanoTime()
      val rowsBin = VSizeInts.write(localRows.toIndexedSeq,
        VSizeInts.bytesNeeded(math.max(1, localDict.length - 1)))
      val bitmaps = bms.toIndexedSeq.map { bm =>
        bm.runOptimize()
        val b = new java.io.ByteArrayOutputStream()
        val d = new java.io.DataOutputStream(b)
        d.writeByte(0x01)
        bm.serialize(d)
        d.flush()
        b.toByteArray
      }
      val bos = new java.io.ByteArrayOutputStream()
      bos.write(fixedIndexedInts(localDict))
      bos.write(rowsBin)
      bos.write(GenericIndexed.writeLengthPrefixed(bitmaps, sorted = false))
      internal += internalName(colName, s"$FieldFilePrefix$fi") -> bos.toByteArray
      val tf3 = System.nanoTime()
      nsGids += tf1 - tf0; nsBuild += tf2 - tf1; nsEmit += tf3 - tf2
    }

    lastStageNanos.set(Seq(
      "parse_flatten" -> (tParsed - tWrite0),
      "global_dicts" -> (tDicts - tParsed),
      "dict_emit" -> (tDictEmit - tDicts),
      "field_gids" -> nsGids,
      "field_rows_bitmaps" -> nsBuild,
      "field_emit" -> nsEmit))
    (main, internal.toSeq)
  }
}

/** Druid FixedIndexed: fixed-width sorted value lists —
  * [version 0x00][flags][i32 count][count * width bytes, BE].
  * Flags: 0x01 = hasNull slot (rejected here — nulls live in the
  * string dictionary's slot 0 in the nested format), 0x02 = sorted.
  */
object FixedIndexed {
  val NullFlag = 0x01
  val SortedFlag = 0x02

  final class Ints(buf: ByteBuffer, val base: Int) {
    checkHeader(buf, base)
    val length: Int = buf.getInt(base + 2)
    def get(i: Int): Int = buf.getInt(base + 6 + i * 4)
    def totalSize: Int = 6 + length * 4
  }
  final class Longs(buf: ByteBuffer, val base: Int) {
    checkHeader(buf, base)
    val length: Int = buf.getInt(base + 2)
    def get(i: Int): Long = buf.getLong(base + 6 + i * 8)
    def totalSize: Int = 6 + length * 8
  }
  final class Doubles(buf: ByteBuffer, val base: Int) {
    checkHeader(buf, base)
    val length: Int = buf.getInt(base + 2)
    def get(i: Int): Double = buf.getDouble(base + 6 + i * 8)
    def totalSize: Int = 6 + length * 8
  }
  private def checkHeader(buf: ByteBuffer, base: Int): Unit = {
    val v = buf.get(base) & 0xff
    if (v != 0) fail(f"FixedIndexed: bad version 0x$v%02x")
    val flags = buf.get(base + 1) & 0xff
    if ((flags & NullFlag) != 0)
      fail("FixedIndexed: null-slot flag unsupported in nested dictionaries")
  }
}

/** Reader over one nested column: main slice + internal smoosh files.
  * Reconstructs each row's JSON text from the per-field columns; never
  * touches `__raw` (SMILE in real Druid).
  */
final class NestedColumn(smoosh: SmooshReader, colName: String,
                         buf: ByteBuffer, base: Int, end: Int) {
  import NestedColumn._

  private val version = buf.get(base) & 0xff
  if (version != V5)
    fail(s"nested column '$colName': unsupported NestedCommonFormat " +
      f"version 0x$version%02x (V5 = 0x05 is the implemented layout)")
  private val (nameLen, nameStart) = readVByte(buf, base + 1)
  private val inFileName = {
    val b = new Array[Byte](nameLen)
    val d = buf.duplicate(); d.position(nameStart); d.get(b)
    new String(b, UTF_8)
  }
  if (inFileName != colName)
    fail(s"nested column '$colName': in-file name '$inFileName' " +
      "mismatches the logical file (corrupt or incompatible layout)")

  val fieldsIndexed = new GenericIndexed(buf, nameStart + nameLen)
  val fieldPaths: Array[String] =
    Array.tabulate(fieldsIndexed.numElements)(fieldsIndexed.objectStringAt)
  val fieldTypes: Array[Int] = {
    val tBase = fieldsIndexed.base + fieldsIndexed.totalSize
    if (tBase + fieldPaths.length > end)
      fail(s"nested column '$colName': type-info bytes run past the file")
    Array.tabulate(fieldPaths.length)(i => buf.get(tBase + i) & 0xff)
  }

  private def slice(part: String): (ByteBuffer, Int, Int) =
    smoosh.slice(internalName(colName, part))

  private val stringDict: GenericIndexed = {
    val (b, o, _) = slice(StringDictFile)
    new GenericIndexed(b, o)
  }
  private val longDict: FixedIndexed.Longs = {
    val (b, o, _) = slice(LongDictFile)
    new FixedIndexed.Longs(b, o)
  }
  private val doubleDict: FixedIndexed.Doubles = {
    val (b, o, _) = slice(DoubleDictFile)
    new FixedIndexed.Doubles(b, o)
  }
  private val nStr = stringDict.numElements
  if (nStr < 1 || stringDict.objectStringAt(0) != null)
    fail(s"nested column '$colName': global string dictionary must " +
      "carry null at slot 0")

  // Real-Druid V5 residue tripwire: real Druid also writes the raw
  // rows as a SMILE-encoded `__raw` internal file. This reader
  // reconstructs JSON text from the shredded fields instead, and the
  // fidelity of that reconstruction against an authoritative SMILE
  // blob is unvalidated offline (no real nested fixture, FIXTURES.md
  // §1) — so a segment that CARRIES `__raw` is by definition not
  // this writer's output, and opening it silently could misreport
  // full-column SELECTs (key order, absent-vs-null). Refuse loudly.
  if (smoosh.has(internalName(colName, RawFile)))
    fail(s"nested column '$colName': segment carries a SMILE-encoded " +
      s"'$RawFile' internal file — a real-Druid V5 segment, not this " +
      "writer's output. Reading it is unsupported: JSON reconstruction " +
      "from the shredded fields is unvalidated against the " +
      "authoritative SMILE blob (FIXTURES.md §1); re-ingest from " +
      "source data instead of misreading")

  // array dictionary: sequences of global ELEMENT ids (absent on
  // segments written before array support — zero arrays then).
  // Parsing is strict — flags byte, bounds, and EXACT slice
  // consumption — because real Druid stores this dictionary
  // FRONT-CODED (FrontCodedIntArrayIndexed), whose buffers can also
  // lead with a 0x00 version byte: without these checks a
  // front-coded dictionary would misread as garbage id sequences
  // instead of failing loudly.
  private val arrayDict: Array[Array[Int]] = {
    val name = internalName(colName, ArrayDictFile)
    if (!smoosh.has(name)) Array.empty
    else {
      val (b, o, len) = smoosh.slice(name)
      val e = o + len
      def unsupported(what: String): Nothing =
        fail(s"nested column '$colName': array dictionary $what — not " +
          "this writer's plain id-sequence layout; real Druid " +
          "front-codes array dictionaries (FrontCodedIntArrayIndexed), " +
          "which is unsupported — refusing to misread")
      val v = b.get(o) & 0xff
      if (v != 0) unsupported(f"version 0x$v%02x")
      val flags = b.get(o + 1) & 0xff
      if (flags != FixedIndexed.SortedFlag)
        unsupported(f"flags byte 0x$flags%02x")
      val count = b.getInt(o + 2)
      if (count < 0 || count.toLong * 4 > (e - o).toLong)
        unsupported(s"implausible entry count $count for ${e - o} bytes")
      var pos = o + 6
      val out = Array.fill(count) {
        if (pos + 4 > e) unsupported("entry runs past the file")
        val len = b.getInt(pos); pos += 4
        if (len < 0 || pos + len.toLong * 4 > e)
          unsupported(s"implausible array length $len at offset ${pos - o}")
        val a = Array.tabulate(len)(i => b.getInt(pos + i * 4))
        pos += len * 4
        a
      }
      if (pos != e)
        unsupported(s"${e - pos} trailing bytes after $count entries")
      out
    }
  }

  val nullRows: org.roaringbitmap.buffer.ImmutableRoaringBitmap = {
    val (b, o, _) = slice(NullIndexFile)
    val gi = new GenericIndexed(b, o)
    val (s, e) = gi.elementRange(0)
    val tpe = b.get(s + 4) & 0xff // skip the 4-byte length prefix
    if (tpe != 0x01)
      fail(s"nested column '$colName': null index bitmap type $tpe != roaring")
    val d = b.duplicate(); d.position(s + 5); d.limit(e)
    new org.roaringbitmap.buffer.ImmutableRoaringBitmap(d.slice())
  }

  /** One per-field sub-column. */
  final class Field(part: String) {
    private val (fbuf, fbase, flen) = slice(part)
    val localDict = new FixedIndexed.Ints(fbuf, fbase)
    val rows = new VSizeInts(fbuf, fbase + localDict.totalSize)
    private val bitmapsBase = fbase + localDict.totalSize + rows.totalSize
    val bitmaps: Option[GenericIndexed] =
      if (bitmapsBase >= fbase + flen) None
      else Some(new GenericIndexed(fbuf, bitmapsBase))
    /** Global id of this field's value in `row`. */
    def globalId(row: Int): Int = localDict.get(rows.get(row))
    /** Local id of a global id, or -1 (binary search, dict sorted). */
    def localIdOf(gid: Int): Int = {
      var lo = 0; var hi = localDict.length - 1
      while (lo <= hi) {
        val mid = (lo + hi) >>> 1
        val v = localDict.get(mid)
        if (v == gid) return mid
        else if (v < gid) lo = mid + 1
        else hi = mid - 1
      }
      -1
    }
    /** Value bitmap for a local id: rows whose field holds that value. */
    def bitmapAt(li: Int): Option[org.roaringbitmap.buffer.ImmutableRoaringBitmap] =
      bitmaps.map { gi =>
        val (s, e) = gi.elementRange(li)
        val tpe = fbuf.get(s + 4) & 0xff // skip 4-byte length prefix
        if (tpe != 0x01)
          fail(s"nested field '$part': value bitmap type $tpe != roaring")
        val d = fbuf.duplicate(); d.position(s + 5); d.limit(e)
        new org.roaringbitmap.buffer.ImmutableRoaringBitmap(d.slice())
      }
  }

  val fields: Array[Field] =
    Array.tabulate(fieldPaths.length)(i => new Field(s"$FieldFilePrefix$i"))

  /** Row count: from any field's row column; a fieldless column (all
    * rows null) answers the null-bitmap cardinality.
    */
  val length: Int =
    if (fields.nonEmpty) fields(0).rows.length
    else nullRows.getCardinality

  /** Typed value for a global id: null | String | java.lang.Long |
    * java.lang.Double (the stacked-ranges scheme).
    */
  def globalValue(gid: Int): AnyRef =
    if (gid == 0) null
    else if (gid < nStr) stringDict.objectStringAt(gid)
    else if (gid < nStr + longDict.length)
      java.lang.Long.valueOf(longDict.get(gid - nStr))
    else if (gid < nStr + longDict.length + doubleDict.length)
      java.lang.Double.valueOf(doubleDict.get(gid - nStr - longDict.length))
    else if (gid < nStr + longDict.length + doubleDict.length + arrayDict.length)
      arrayDict(gid - nStr - longDict.length - doubleDict.length)
        .map(globalValue).toVector
    else fail(s"nested column '$colName': global id $gid out of range")

  private val mapper = new ObjectMapper()
  /** One jq-path step: a key, optionally followed by ONE array index
    * (`arr[3]` — the writer's array-of-objects shredding; deeper
    * bracket shapes like `$[0]` or `a[0][1]` never come from our
    * writer and fail loudly below).
    */
  private final case class PathStep(key: String, idx: Int)

  // pre-split paths (skip the "$." prefix)
  private val splitPaths: Array[Array[PathStep]] =
    fieldPaths.map { p =>
      p.stripPrefix("$.").split('.').map { seg =>
        val b = seg.indexOf('[')
        if (b < 0) PathStep(seg, -1)
        else {
          val close = seg.indexOf(']', b)
          if (b == 0 || close != seg.length - 1 ||
              !seg.substring(b + 1, close).forall(_.isDigit))
            fail(s"nested column '$colName': unsupported field path " +
              s"'$p' (only `key` and `key[N]` steps are modeled)")
          PathStep(seg.substring(0, b), seg.substring(b + 1, close).toInt)
        }
      }
    }

  /** Reconstructed JSON text of `row` (null for a null row). Keys come
    * out in sorted-path order — field extraction (`get_json_object`)
    * is order-insensitive, raw-text comparison is not. Array-of-object
    * elements materialize as placeholders grown in index order (the
    * writer guarantees every index shreds at least one field, so no
    * placeholder survives the row's full rebuild).
    */
  def jsonAt(row: Int): String = {
    if (nullRows.contains(row)) return null
    val root = mapper.createObjectNode()
    var i = 0
    while (i < fields.length) {
      val v = globalValue(fields(i).globalId(row))
      if (v != null) {
        var node: ObjectNode = root
        val path = splitPaths(i)
        var k = 0
        while (k < path.length - 1) {
          val st = path(k)
          if (st.idx < 0) {
            val next = node.get(st.key)
            node =
              if (next != null) next.asInstanceOf[ObjectNode]
              else node.putObject(st.key)
          } else {
            val nextArr = node.get(st.key)
            val arr =
              if (nextArr != null)
                nextArr.asInstanceOf[com.fasterxml.jackson.databind.node.ArrayNode]
              else node.putArray(st.key)
            while (arr.size() <= st.idx) arr.addObject()
            node = arr.get(st.idx).asInstanceOf[ObjectNode]
          }
          k += 1
        }
        val last = path(path.length - 1)
        if (last.idx >= 0)
          fail(s"nested column '$colName': field path " +
            s"'${fieldPaths(i)}' ends in an array index — scalar array " +
            "elements ride the array dictionary, never shredded fields")
        v match {
          case s: String           => node.put(last.key, s)
          case l: java.lang.Long   => node.put(last.key, l.longValue())
          case d: java.lang.Double => node.put(last.key, d.doubleValue())
          case a: Vector[_] =>
            val arr = node.putArray(last.key)
            a.foreach {
              case null                => arr.addNull()
              case s: String           => arr.add(s)
              case l: java.lang.Long   => arr.add(l.longValue())
              case d: java.lang.Double => arr.add(d.doubleValue())
              case other => fail(
                s"nested column '$colName': unexpected array element $other")
            }
        }
      }
      i += 1
    }
    mapper.writeValueAsString(root)
  }

  def jsonBytesAt(row: Int): Array[Byte] = {
    val s = jsonAt(row)
    if (s == null) null else s.getBytes(UTF_8)
  }

  /** Index of a field path in the sorted fields list, or -1. */
  def fieldIndex(path: String): Int = {
    var lo = 0; var hi = fieldPaths.length - 1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      val c = fieldPaths(mid).compareTo(path)
      if (c == 0) return mid
      else if (c < 0) lo = mid + 1
      else hi = mid - 1
    }
    -1
  }

  /** Global id of a string value, or -1 (dictionary sorted from slot 1;
    * slot 0 is null). */
  def stringGlobalId(v: String): Int = {
    var lo = 1; var hi = nStr - 1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      val c = stringDict.objectStringAt(mid).compareTo(v)
      if (c == 0) return mid
      else if (c < 0) lo = mid + 1
      else hi = mid - 1
    }
    -1
  }

  private def longGlobalId(v: Long): Int = {
    var lo = 0; var hi = longDict.length - 1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      val d = longDict.get(mid)
      if (d == v) return nStr + mid
      else if (d < v) lo = mid + 1
      else hi = mid - 1
    }
    -1
  }

  private def doubleGlobalId(v: Double): Int = {
    var lo = 0; var hi = doubleDict.length - 1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      val d = doubleDict.get(mid)
      if (d == v) return nStr + longDict.length + mid
      else if (d < v) lo = mid + 1
      else hi = mid - 1
    }
    -1
  }

  /** Rows whose field at `path` holds a value whose get_json_object
    * text rendering can equal ANY of `values` — a SUPERSET row
    * selection served entirely from the per-field value bitmaps (the
    * caller's predicate stays the residual final word). Returns None
    * when the field carries no bitmaps (selection unavailable); a path
    * absent from the fields list selects ZERO rows (no row holds a
    * non-null value there, and `text = null` never equals a literal).
    * A value string is probed against all three global dictionaries —
    * long 5 and string "5" both render as "5".
    */
  def eqBitmap(path: String, values: Seq[String])
      : Option[org.roaringbitmap.buffer.MutableRoaringBitmap] = {
    val acc = new org.roaringbitmap.buffer.MutableRoaringBitmap()
    // defensive: wildcard paths are never pushed by the rules, but a
    // hand-set option must not under-select. Bracketed EXACT-field
    // paths (`$.arr[0].k`, the array-of-objects shredding) are fine —
    // fieldIndex matches them literally.
    if (path.contains('*')) return None
    val fi = fieldIndex(path)
    if (fi < 0) {
      // an INTERIOR node (a strict prefix of some field — object OR
      // array element): get_json_object returns that node's JSON text
      // there, which a literal CAN equal — no per-field bitmap models
      // that, so no selection (the residual decides). '[' is a segment
      // boundary like '.': "$.arr" is interior to "$.arr[0].k". Only a
      // path that is neither a field nor a prefix of one is all-null
      // -> zero rows.
      val dotPrefix = path + "."
      val brkPrefix = path + "["
      if (fieldPaths.exists(p =>
            p.startsWith(dotPrefix) || p.startsWith(brkPrefix))) return None
      // an index into a SCALAR-ARRAY field ("$.labels[1]" where
      // "$.labels" rides the array dictionary): element texts CAN
      // match but no per-element bitmaps exist — decline rather than
      // claim zero rows (which would under-select)
      var b = path.indexOf('[')
      while (b >= 0) {
        val pfi = fieldIndex(path.substring(0, b))
        if (pfi >= 0 && (fieldTypes(pfi) & TypeArray) != 0) return None
        b = path.indexOf('[', b + 1)
      }
      return Some(acc)
    }
    if ((fieldTypes(fi) & TypeArray) != 0) return None
    val f = fields(fi)
    if (f.bitmaps.isEmpty) return None
    def add(gid: Int): Unit =
      if (gid >= 0) {
        val li = f.localIdOf(gid)
        if (li >= 0) f.bitmapAt(li).foreach(acc.or)
      }
    values.foreach { v =>
      add(stringGlobalId(v))
      try add(longGlobalId(java.lang.Long.parseLong(v)))
      catch { case _: NumberFormatException => () }
      try {
        val d = java.lang.Double.parseDouble(v)
        if (!d.isNaN) add(doubleGlobalId(d))
      } catch { case _: NumberFormatException => () }
    }
    Some(acc)
  }
}
