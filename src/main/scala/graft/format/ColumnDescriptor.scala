package graft.format

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets.UTF_8

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

/** The JSON header at the start of every column logical file:
  * `[jsonLen i32 BE][JSON ColumnDescriptor][binary column data]`
  * (reference src/column/mod.rs:22-47; descriptor fields
  * src/segment/column_descriptor.rs:14-35).
  */
final case class ColumnDescriptor(
    valueType: String, // STRING | LONG | FLOAT | DOUBLE | COMPLEX
    hasMultipleValues: Boolean,
    partTypes: Seq[String],
    // our extension: original logical type for columns whose physical
    // storage widens (e.g. "timestamp_micros" for a non-__time timestamp
    // stored as LONG micros). Absent in real Druid segments; unknown
    // JSON fields are ignored by both sides, so interop is unaffected.
    logicalType: Option[String] = None)

object ColumnDescriptor {
  private val mapper = new ObjectMapper()

  /** Parse the header; returns the descriptor and the absolute offset of
    * the binary column data within `buf`.
    */
  def parse(buf: ByteBuffer, base: Int): (ColumnDescriptor, Int) = {
    val jsonLen = buf.getInt(base)
    val jsonBytes = new Array[Byte](jsonLen)
    val dup = buf.duplicate()
    dup.position(base + 4)
    dup.get(jsonBytes)
    val node: JsonNode = mapper.readTree(new String(jsonBytes, UTF_8))
    val parts = Option(node.get("parts")).map { p =>
      (0 until p.size()).map(i => p.get(i).get("type").asText())
    }.getOrElse(Nil)
    val desc = ColumnDescriptor(
      valueType = node.get("valueType").asText(),
      hasMultipleValues =
        Option(node.get("hasMultipleValues")).exists(_.asBoolean(false)),
      partTypes = parts,
      logicalType = Option(node.get("logicalType")).map(_.asText()))
    (desc, base + 4 + jsonLen)
  }

  /** Serialize a descriptor + column binary into one logical file. */
  def wrapColumn(valueType: String, partType: String,
                 binary: Array[Byte],
                 hasMultipleValues: Boolean = false,
                 logicalType: Option[String] = None): Array[Byte] = {
    val lt = logicalType.map(t => s""""logicalType":"$t",""").getOrElse("")
    val json =
      s"""{"valueType":"$valueType",$lt"hasMultipleValues":$hasMultipleValues,""" +
        s""""parts":[{"type":"$partType"}]}"""
    val jsonBytes = json.getBytes(UTF_8)
    val out = ByteBuffer.allocate(4 + jsonBytes.length + binary.length)
    out.putInt(jsonBytes.length).put(jsonBytes).put(binary)
    out.array()
  }
}
