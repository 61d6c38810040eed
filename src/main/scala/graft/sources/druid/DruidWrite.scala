package graft.sources.druid

import java.nio.file.{Files, Paths}
import java.util.Comparator
import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types._

import graft.write.SegmentWriter
import graft.write.SegmentWriter._

/** Write path: `df.write.format("druid").save(dir)` — each Spark
  * partition becomes one immutable v9 segment directory under `dir`
  * (`segment-<partition>-<task>`), which the read side discovers as a
  * multi-segment table. The reference has no writer at all; this is the
  * ingest half of "data-processing capabilities", and at scale the
  * partitioning of the incoming DataFrame controls segment sizing
  * (repartition by time range upstream for time-pruned reads).
  *
  * Rows buffer in memory per task (segments are immutable columnar
  * files, same as Druid's own indexer which builds per-segment in
  * memory) — size partitions accordingly.
  */
class DruidWriteBuilder(root: String, schema: StructType,
                        bitmapIndexes: Boolean = true)
    extends WriteBuilder with SupportsTruncate {
  private var doTruncate = false
  override def truncate(): WriteBuilder = { doTruncate = true; this }

  override def build(): Write = new Write {
    override def toBatch: BatchWrite =
      new DruidBatchWrite(root, schema, doTruncate, bitmapIndexes)
  }
}

final case class DruidCommitMessage(dir: String) extends WriterCommitMessage

class DruidBatchWrite(root: String, schema: StructType, truncate: Boolean,
                      bitmapIndexes: Boolean)
    extends BatchWrite {

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    val rootPath = Paths.get(root)
    if (truncate && Files.exists(rootPath)) {
      Files.walk(rootPath).sorted(Comparator.reverseOrder())
        .forEach(p => Files.delete(p))
    }
    Files.createDirectories(rootPath)
    new DruidDataWriterFactory(root, schema, bitmapIndexes)
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = ()
  override def abort(messages: Array[WriterCommitMessage]): Unit =
    messages.collect { case DruidCommitMessage(d) =>
      val p = Paths.get(d)
      if (Files.exists(p))
        Files.walk(p).sorted(Comparator.reverseOrder()).forEach(f => Files.delete(f))
    }
}

class DruidDataWriterFactory(root: String, schema: StructType,
                             bitmapIndexes: Boolean)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DruidDataWriter(root, schema, partitionId, taskId, bitmapIndexes)
}

class DruidDataWriter(root: String, schema: StructType,
                      partitionId: Int, taskId: Long,
                      bitmapIndexes: Boolean = true)
    extends DataWriter[InternalRow] {

  private val fields = schema.fields
  private val timeIdx = fields.indexWhere(_.name == "__time")
  private val buffers: Array[ArrayBuffer[Any]] = fields.map(_ => new ArrayBuffer[Any]())

  override def write(row: InternalRow): Unit = {
    var i = 0
    while (i < fields.length) {
      buffers(i) += (if (row.isNullAt(i)) null else fields(i).dataType match {
        case StringType => row.getUTF8String(i).toString
        case LongType => row.getLong(i)
        case IntegerType => row.getInt(i).toLong
        case TimestampType | TimestampNTZType => row.getLong(i) // micros
        case DoubleType => row.getDouble(i)
        case FloatType => row.getFloat(i)
        case BinaryType => row.getBinary(i)
        case ArrayType(StringType, _) =>
          val arr = row.getArray(i)
          (0 until arr.numElements()).map(k =>
            if (arr.isNullAt(k)) null else arr.getUTF8String(k).toString): Seq[String]
        case other => throw new IllegalArgumentException(
          s"druid writer: unsupported type $other for '${fields(i).name}'")
      })
      i += 1
    }
  }

  override def commit(): WriterCommitMessage = {
    val n = if (buffers.isEmpty) 0 else buffers(0).length
    val time: Array[Long] =
      if (timeIdx >= 0) buffers(timeIdx).map {
        case null => 0L
        case m: Long => Math.floorDiv(m, 1000L) // micros -> millis (floor, not truncate)
      }.toArray
      else Array.fill(n)(0L)

    def nullIdx(buf: ArrayBuffer[Any]): Array[Int] =
      buf.iterator.zipWithIndex.collect { case (null, i) => i }.toArray

    val columns = fields.zipWithIndex
      .filter { case (_, i) => i != timeIdx }
      .map { case (f, i) =>
        val buf = buffers(i)
        f.name -> (f.dataType match {
          case StringType => StringValues(buf.map(_.asInstanceOf[String]).toArray)
          case LongType | IntegerType =>
            LongValues(buf.map(v => if (v == null) 0L else v.asInstanceOf[Long]).toArray,
              nullIdx(buf))
          case TimestampType | TimestampNTZType =>
            LongValues(buf.map(v => if (v == null) 0L else Math.floorDiv(v.asInstanceOf[Long], 1000L)).toArray,
              nullIdx(buf))
          case DoubleType =>
            DoubleValues(buf.map(v => if (v == null) 0.0 else v.asInstanceOf[Double]).toArray,
              nullIdx(buf))
          case FloatType =>
            FloatValues(buf.map(v => if (v == null) 0f else v.asInstanceOf[Float]).toArray,
              nullIdx(buf))
          case BinaryType =>
            ComplexValues("binary", buf.map(_.asInstanceOf[Array[Byte]]).toArray)
          case ArrayType(StringType, _) =>
            MultiStringValues(buf.map(v =>
              if (v == null) null else v.asInstanceOf[Seq[String]]).toArray)
          case other => throw new IllegalArgumentException(s"unsupported $other")
        })
      }.toSeq

    val dir = Paths.get(root, f"segment-$partitionId%05d-$taskId")
    SegmentWriter.write(dir, time, columns, stringBitmaps = bitmapIndexes)
    DruidCommitMessage(dir.toString)
  }

  override def abort(): Unit = ()
  override def close(): Unit = ()
}
