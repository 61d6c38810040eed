package graft.format

import java.nio.ByteBuffer

/** `version.bin`: one big-endian i32 that must equal 9.
  * Reference: src/segment/version.rs:8-25.
  */
object Version {
  val V9 = 9

  def read(data: Array[Byte]): Int = {
    if (data.length < 4) fail(s"version.bin too short: ${data.length} bytes")
    val v = ByteBuffer.wrap(data).getInt(0)
    if (v != V9) fail(s"unsupported segment version $v (expected $V9)")
    v
  }

  def bytes: Array[Byte] = ByteBuffer.allocate(4).putInt(V9).array()
}
