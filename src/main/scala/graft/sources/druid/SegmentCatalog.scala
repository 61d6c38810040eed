package graft.sources.druid

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path, Paths}

import com.fasterxml.jackson.databind.ObjectMapper

import graft.format.DruidSegment

/** Per-segment planning metadata: everything a query needs to prune and
  * split without touching the segment itself.
  */
final case class SegMeta(dir: String, startMs: Long, endMs: Long,
                         rows: Int, exactInterval: Boolean)

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
        names(name) = SegMeta(
          Paths.get(root, name).toString,
          v.get("start").asLong(), v.get("end").asLong(),
          v.get("rows").asInt(),
          Option(v.get("exact")).exists(_.asBoolean(false)))
      }
      val actual = segmentDirs.map(d => Paths.get(d).getFileName.toString).toSet
      if (names.keySet != actual) None // stale: segments added/removed by hand
      else Some(segmentDirs.map(d => names(Paths.get(d).getFileName.toString)))
    } catch { case _: Exception => None }
  }

  /** Write the manifest for exactly `entries` (names relative to root). */
  def write(root: String, entries: Seq[SegMeta]): Unit = {
    val body = entries.map { m =>
      val name = Paths.get(m.dir).getFileName.toString
      s""""$name":{"start":${m.startMs},"end":${m.endMs},""" +
        s""""rows":${m.rows},"exact":${m.exactInterval}}"""
    }.mkString(s"""{"segments":{""", ",", "}}")
    Files.write(Paths.get(root, FileName), body.getBytes(UTF_8))
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
