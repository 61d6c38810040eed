package graft.sources.druid

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path, Paths}

import com.fasterxml.jackson.databind.ObjectMapper

import graft.format.DruidSegment

/** Per-segment planning metadata: everything a query needs to prune and
  * split without touching the segment itself.
  *
  * `zones` are per-numeric-column [min, max] value ranges (zone maps):
  * a pushed range/equality filter outside a segment's zone skips the
  * whole segment at planning — dimension-based segment skipping on top
  * of the `__time` interval pruning. Bounds are conservatively widened
  * one ulp at write time so long→double rounding can never prune a
  * segment that still holds matching rows. Absent (empty) for segments
  * indexed by the fallback open path — absence disables pruning, never
  * correctness.
  *
  * `strZones` are the string-dimension analog: per-column [min, max]
  * over non-null values, compared with `String.compareTo` on BOTH the
  * write and prune sides (only self-consistency matters — the zone is
  * a membership envelope, so equality/IN values outside it prove the
  * segment holds no matching row; range predicates are never pruned
  * with it because Spark orders strings by UTF-8 bytes, not UTF-16).
  *
  * `nullCounts`, when present, maps EVERY column the segment stores to
  * its null-row count (0 included — key presence doubles as a
  * column-presence record, so a missing key under a present map means
  * the segment predates the column and every row is null). Powers
  * complete COUNT(col) pushdown and planning-time pruning of all-null
  * segments under IS NOT NULL. None (old manifests, fallback opens)
  * disables both, never correctness.
  */
final case class SegMeta(dir: String, startMs: Long, endMs: Long,
                         rows: Int, exactInterval: Boolean,
                         zones: Map[String, (Double, Double)] = Map.empty,
                         strZones: Map[String, (String, String)] = Map.empty,
                         nullCounts: Option[Map[String, Long]] = None,
                         exactLongZones: Map[String, (Long, Long)] = Map.empty,
                         exactDoubleZones: Map[String, (Double, Double)] = Map.empty,
                         longSums: Map[String, Long] = Map.empty,
                         timeSorted: Boolean = false)

/** Table-level segment manifest (`_graft_manifest.json` under the table
  * root), written by the DSv2 commit and read at planning time.
  *
  * At 100 TB a table holds 10^4-10^5 segments; opening each one on the
  * driver per query — even in parallel — is minutes of planning. The
  * manifest makes planning a single small-file read. It is strictly a
  * CACHE: if it is absent, unreadable, or does not cover exactly the
  * segment directories present (e.g. segments copied in by hand), the
  * planner falls back to opening segment metadata in parallel.
  */
object SegmentCatalog {
  val FileName = "_graft_manifest.json"
  private val mapper = new ObjectMapper()

  /** Manifest entries when present AND consistent with the directory
    * listing; None otherwise.
    */
  def load(root: String, segmentDirs: Seq[String]): Option[Seq[SegMeta]] = {
    val p = Paths.get(root, FileName)
    if (!Files.isRegularFile(p)) return None
    try {
      val node = mapper.readTree(new String(Files.readAllBytes(p), UTF_8))
      val segs = node.get("segments")
      if (segs == null || !segs.isObject) return None
      val names = scala.collection.mutable.LinkedHashMap[String, SegMeta]()
      val it = segs.fieldNames()
      while (it.hasNext) {
        val name = it.next()
        val v = segs.get(name)
        val zones = Option(v.get("zones")).filter(_.isObject).map { z =>
          val zb = Map.newBuilder[String, (Double, Double)]
          val zit = z.fieldNames()
          while (zit.hasNext) {
            val c = zit.next()
            val arr = z.get(c)
            if (arr.isArray && arr.size() == 2)
              zb += c -> (arr.get(0).asDouble(), arr.get(1).asDouble())
          }
          zb.result()
        }.getOrElse(Map.empty[String, (Double, Double)])
        val strZones = Option(v.get("szones")).filter(_.isObject).map { z =>
          val zb = Map.newBuilder[String, (String, String)]
          val zit = z.fieldNames()
          while (zit.hasNext) {
            val c = zit.next()
            val arr = z.get(c)
            if (arr.isArray && arr.size() == 2 &&
                arr.get(0).isTextual && arr.get(1).isTextual)
              zb += c -> (arr.get(0).asText(), arr.get(1).asText())
          }
          zb.result()
        }.getOrElse(Map.empty[String, (String, String)])
        val nullCounts = Option(v.get("nulls")).filter(_.isObject).map { z =>
          val zb = Map.newBuilder[String, Long]
          val zit = z.fieldNames()
          while (zit.hasNext) {
            val c = zit.next()
            zb += c -> z.get(c).asLong()
          }
          zb.result()
        }
        val xl = Option(v.get("xzonesl")).filter(_.isObject).map { z =>
          val zb = Map.newBuilder[String, (Long, Long)]
          val zit = z.fieldNames()
          while (zit.hasNext) {
            val c = zit.next()
            val arr = z.get(c)
            if (arr.isArray && arr.size() == 2)
              zb += c -> (arr.get(0).asLong(), arr.get(1).asLong())
          }
          zb.result()
        }.getOrElse(Map.empty[String, (Long, Long)])
        val xd = Option(v.get("xzonesd")).filter(_.isObject).map { z =>
          val zb = Map.newBuilder[String, (Double, Double)]
          val zit = z.fieldNames()
          while (zit.hasNext) {
            val c = zit.next()
            val arr = z.get(c)
            if (arr.isArray && arr.size() == 2)
              zb += c -> (arr.get(0).asDouble(), arr.get(1).asDouble())
          }
          zb.result()
        }.getOrElse(Map.empty[String, (Double, Double)])
        val lsums = Option(v.get("lsums")).filter(_.isObject).map { z =>
          val zb = Map.newBuilder[String, Long]
          val zit = z.fieldNames()
          while (zit.hasNext) {
            val c = zit.next()
            zb += c -> z.get(c).asLong()
          }
          zb.result()
        }.getOrElse(Map.empty[String, Long])
        names(name) = SegMeta(
          Paths.get(root, name).toString,
          v.get("start").asLong(), v.get("end").asLong(),
          v.get("rows").asInt(),
          Option(v.get("exact")).exists(_.asBoolean(false)),
          zones, strZones, nullCounts, xl, xd, lsums,
          timeSorted = Option(v.get("sorted")).exists(_.asBoolean(false)))
      }
      val actual = segmentDirs.map(d => Paths.get(d).getFileName.toString).toSet
      if (names.keySet != actual) None // stale: segments added/removed by hand
      else Some(segmentDirs.map(d => names(Paths.get(d).getFileName.toString)))
    } catch { case _: Exception => None }
  }

  /** Table-level union read schema from the manifest, only when the
    * manifest is present AND covers exactly `segmentDirs` (same
    * staleness rule as `load` — a hand-copied segment could carry
    * columns the cached schema doesn't know about).
    */
  def loadSchema(root: String,
                 segmentDirs: Seq[String]): Option[org.apache.spark.sql.types.StructType] = {
    val p = Paths.get(root, FileName)
    if (!Files.isRegularFile(p)) return None
    try {
      val node = mapper.readTree(new String(Files.readAllBytes(p), UTF_8))
      val schemaNode = node.get("schema")
      if (schemaNode == null || !schemaNode.isTextual) return None
      val segs = node.get("segments")
      if (segs == null || !segs.isObject) return None
      val names = scala.collection.mutable.Set[String]()
      val it = segs.fieldNames()
      while (it.hasNext) names += it.next()
      val actual = segmentDirs.map(d => Paths.get(d).getFileName.toString).toSet
      if (names != actual) return None
      org.apache.spark.sql.types.DataType.fromJson(schemaNode.asText()) match {
        case st: org.apache.spark.sql.types.StructType => Some(st)
        case _ => None
      }
    } catch { case _: Exception => None }
  }

  /** Write the manifest for exactly `entries` (names relative to root).
    * `schema` is the table's union read schema; None omits the field
    * (readers fall back to parallel opens).
    */
  def write(root: String, entries: Seq[SegMeta],
            schema: Option[org.apache.spark.sql.types.StructType] = None): Unit = {
    val rootNode = mapper.createObjectNode()
    schema.foreach(st => rootNode.put("schema", st.json))
    val segsNode = rootNode.putObject("segments")
    entries.foreach { m =>
      val name = Paths.get(m.dir).getFileName.toString
      val n = segsNode.putObject(name)
      n.put("start", m.startMs); n.put("end", m.endMs)
      n.put("rows", m.rows); n.put("exact", m.exactInterval)
      n.put("sorted", m.timeSorted)
      if (m.zones.nonEmpty) {
        val z = n.putObject("zones")
        m.zones.toSeq.sortBy(_._1).foreach { case (c, (lo, hi)) =>
          val a = z.putArray(c); a.add(lo); a.add(hi)
        }
      }
      if (m.strZones.nonEmpty) {
        val z = n.putObject("szones")
        m.strZones.toSeq.sortBy(_._1).foreach { case (c, (lo, hi)) =>
          val a = z.putArray(c); a.add(lo); a.add(hi)
        }
      }
      m.nullCounts.foreach { nc =>
        val z = n.putObject("nulls")
        nc.toSeq.sortBy(_._1).foreach { case (c, cnt) => z.put(c, cnt) }
      }
      if (m.exactLongZones.nonEmpty) {
        val z = n.putObject("xzonesl")
        m.exactLongZones.toSeq.sortBy(_._1).foreach { case (c, (lo, hi)) =>
          val a = z.putArray(c); a.add(lo); a.add(hi)
        }
      }
      if (m.exactDoubleZones.nonEmpty) {
        val z = n.putObject("xzonesd")
        m.exactDoubleZones.toSeq.sortBy(_._1).foreach { case (c, (lo, hi)) =>
          val a = z.putArray(c); a.add(lo); a.add(hi)
        }
      }
      if (m.longSums.nonEmpty) {
        val z = n.putObject("lsums")
        m.longSums.toSeq.sortBy(_._1).foreach { case (c, s) => z.put(c, s) }
      }
    }
    Files.write(Paths.get(root, FileName),
      mapper.writeValueAsString(rootNode).getBytes(UTF_8))
  }

  /** Planning metadata for every segment under `root`: manifest when
    * valid, else parallel metadata opens (the manifest-less path).
    */
  def metaFor(root: String): Seq[SegMeta] = {
    val dirs = DruidTableUtil.discoverSegments(root)
    load(root, dirs).getOrElse(openAll(dirs))
  }

  /** Open segment metadata in parallel (bounded by the slowest single
    * open, not the segment count).
    */
  def openAll(dirs: Seq[String]): Seq[SegMeta] = {
    import scala.collection.parallel.CollectionConverters._
    dirs.par.map { d =>
      val seg = DruidSegment.open(d)
      val m = seg.metadata
      SegMeta(d, m.intervalStartMs, m.intervalEndMs, seg.numRows,
        seg.metadataDrd.exists(_.exactInterval))
    }.seq
  }
}
