package graft.sources.druid

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.Comparator
import scala.collection.mutable.ArrayBuffer
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types._

import graft.write.SegmentWriter
import graft.write.SegmentWriter._

/** Write path: `df.write.format("druid").save(dir)` — each Spark
  * partition becomes one immutable v9 segment directory under `dir`,
  * which the read side discovers as a multi-segment table. The
  * reference has no writer at all; this is the ingest half of
  * "data-processing capabilities", and at scale the partitioning of the
  * incoming DataFrame controls segment sizing (repartition by time
  * range upstream for time-pruned reads).
  *
  * Commit protocol: tasks write segments into a hidden
  * `.staging-<job>` directory under the destination (invisible to
  * segment discovery), and BatchWrite.commit moves them into place —
  * only then does overwrite delete the previous segments. A job that
  * fails mid-write leaves the destination exactly as it was.
  *
  * Rows buffer in memory per task in typed columnar builders (segments
  * are immutable columnar files, same as Druid's own indexer which
  * builds per-segment in memory) — memory per task is ~the primitive
  * data size, not boxed objects; size partitions accordingly.
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

  // job-unique token: staging dir name + segment-name suffix, so repeat
  // writes to the same destination never collide on partition/task ids
  private val jobId = java.util.UUID.randomUUID().toString.take(8)
  private val stagingDir = Paths.get(root, s".staging-$jobId")

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    Files.createDirectories(stagingDir)
    new DruidDataWriterFactory(stagingDir.toString, jobId, schema, bitmapIndexes)
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val rootPath = Paths.get(root)
    // segments present before this job (overwrite deletes them LAST)
    val previous: Seq[Path] =
      if (!truncate) Nil
      else {
        val s = Files.list(rootPath)
        try s.iterator().asScala.filter(p =>
          Files.isDirectory(p) && graft.format.DruidSegment.isSegmentDir(p)).toSeq
        finally s.close()
      }
    // same-filesystem moves (staging lives under the destination): the
    // committed segments appear atomically, one directory at a time
    messages.collect { case DruidCommitMessage(d) =>
      val src = Paths.get(d)
      Files.move(src, rootPath.resolve(src.getFileName),
        StandardCopyOption.ATOMIC_MOVE)
    }
    if (truncate) previous.foreach(deleteRecursively)
    deleteRecursively(stagingDir)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    // nothing committed ever left staging: drop it, destination intact
    deleteRecursively(stagingDir)

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p))
      Files.walk(p).sorted(Comparator.reverseOrder()).forEach(f => Files.delete(f))
}

class DruidDataWriterFactory(stagingRoot: String, jobId: String,
                             schema: StructType, bitmapIndexes: Boolean)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DruidDataWriter(stagingRoot, jobId, schema, partitionId, taskId, bitmapIndexes)
}

/** Per-task writer buffering rows in TYPED columnar builders: numeric
  * values land in growable primitive arrays (no per-value boxing, no
  * per-value pattern match after setup), so task memory tracks the data
  * size and a multi-million-row partition encodes within a bounded heap.
  */
class DruidDataWriter(stagingRoot: String, jobId: String, schema: StructType,
                      partitionId: Int, taskId: Long,
                      bitmapIndexes: Boolean = true)
    extends DataWriter[InternalRow] {

  // ---- typed builders ----

  private final class LongBuilder {
    private var a = new Array[Long](1024)
    private var n = 0
    def add(v: Long): Unit = {
      if (n == a.length) a = java.util.Arrays.copyOf(a, n * 2)
      a(n) = v; n += 1
    }
    def result(): Array[Long] = java.util.Arrays.copyOf(a, n)
  }
  private final class IntBuilder {
    private var a = new Array[Int](64)
    private var n = 0
    def add(v: Int): Unit = {
      if (n == a.length) a = java.util.Arrays.copyOf(a, n * 2)
      a(n) = v; n += 1
    }
    def result(): Array[Int] = java.util.Arrays.copyOf(a, n)
  }
  private final class DoubleBuilder {
    private var a = new Array[Double](1024)
    private var n = 0
    def add(v: Double): Unit = {
      if (n == a.length) a = java.util.Arrays.copyOf(a, n * 2)
      a(n) = v; n += 1
    }
    def result(): Array[Double] = java.util.Arrays.copyOf(a, n)
  }
  private final class FloatBuilder {
    private var a = new Array[Float](1024)
    private var n = 0
    def add(v: Float): Unit = {
      if (n == a.length) a = java.util.Arrays.copyOf(a, n * 2)
      a(n) = v; n += 1
    }
    def result(): Array[Float] = java.util.Arrays.copyOf(a, n)
  }

  private sealed trait ColBuf {
    def append(row: InternalRow, i: Int, rowIdx: Int): Unit
    def values(): ColumnValues
  }
  private final class LongBuf(fromInt: Boolean) extends ColBuf {
    val b = new LongBuilder; val nulls = new IntBuilder
    def append(row: InternalRow, i: Int, rowIdx: Int): Unit =
      if (row.isNullAt(i)) { nulls.add(rowIdx); b.add(0L) }
      else b.add(if (fromInt) row.getInt(i).toLong else row.getLong(i))
    def values(): ColumnValues = LongValues(b.result(), nulls.result())
  }
  private final class TimestampBuf(ntz: Boolean) extends ColBuf {
    val b = new LongBuilder; val nulls = new IntBuilder
    def append(row: InternalRow, i: Int, rowIdx: Int): Unit =
      if (row.isNullAt(i)) { nulls.add(rowIdx); b.add(0L) }
      else b.add(row.getLong(i)) // micros, full precision
    def values(): ColumnValues = TimestampValues(b.result(), nulls.result(), ntz)
  }
  private final class DoubleBuf extends ColBuf {
    val b = new DoubleBuilder; val nulls = new IntBuilder
    def append(row: InternalRow, i: Int, rowIdx: Int): Unit =
      if (row.isNullAt(i)) { nulls.add(rowIdx); b.add(0.0) }
      else b.add(row.getDouble(i))
    def values(): ColumnValues = DoubleValues(b.result(), nulls.result())
  }
  private final class FloatBuf extends ColBuf {
    val b = new FloatBuilder; val nulls = new IntBuilder
    def append(row: InternalRow, i: Int, rowIdx: Int): Unit =
      if (row.isNullAt(i)) { nulls.add(rowIdx); b.add(0f) }
      else b.add(row.getFloat(i))
    def values(): ColumnValues = FloatValues(b.result(), nulls.result())
  }
  private final class StringBuf extends ColBuf {
    val b = new ArrayBuffer[String](1024)
    def append(row: InternalRow, i: Int, rowIdx: Int): Unit =
      b += (if (row.isNullAt(i)) null else row.getUTF8String(i).toString)
    def values(): ColumnValues = StringValues(b.toArray)
  }
  private final class BinaryBuf extends ColBuf {
    val b = new ArrayBuffer[Array[Byte]](1024)
    def append(row: InternalRow, i: Int, rowIdx: Int): Unit =
      b += (if (row.isNullAt(i)) null else row.getBinary(i))
    def values(): ColumnValues = ComplexValues("binary", b.toArray)
  }
  private final class MultiStringBuf extends ColBuf {
    val b = new ArrayBuffer[Seq[String]](1024)
    def append(row: InternalRow, i: Int, rowIdx: Int): Unit =
      b += (if (row.isNullAt(i)) null
      else {
        val arr = row.getArray(i)
        (0 until arr.numElements()).map(k =>
          if (arr.isNullAt(k)) null else arr.getUTF8String(k).toString)
      })
    def values(): ColumnValues = MultiStringValues(b.toArray)
  }
  /** `__time`: epoch millis (floor from micros), Druid's native unit. */
  private final class TimeBuf extends ColBuf {
    val b = new LongBuilder
    def append(row: InternalRow, i: Int, rowIdx: Int): Unit =
      b.add(if (row.isNullAt(i)) 0L else Math.floorDiv(row.getLong(i), 1000L))
    def values(): ColumnValues = LongValues(b.result())
    def millis: Array[Long] = b.result()
  }

  private val fields = schema.fields
  private val timeIdx = fields.indexWhere(_.name == "__time")
  private val bufs: Array[ColBuf] = fields.zipWithIndex.map { case (f, i) =>
    if (i == timeIdx) new TimeBuf
    else f.dataType match {
      case LongType => new LongBuf(fromInt = false)
      case IntegerType => new LongBuf(fromInt = true)
      case TimestampType => new TimestampBuf(ntz = false)
      case TimestampNTZType => new TimestampBuf(ntz = true)
      case DoubleType => new DoubleBuf
      case FloatType => new FloatBuf
      case StringType => new StringBuf
      case BinaryType => new BinaryBuf
      case ArrayType(StringType, _) => new MultiStringBuf
      case other => throw new IllegalArgumentException(
        s"druid writer: unsupported type $other for '${f.name}'")
    }
  }
  private var rowCount = 0

  override def write(row: InternalRow): Unit = {
    var i = 0
    while (i < bufs.length) {
      bufs(i).append(row, i, rowCount)
      i += 1
    }
    rowCount += 1
  }

  override def commit(): WriterCommitMessage = {
    val time: Array[Long] =
      if (timeIdx >= 0) bufs(timeIdx).asInstanceOf[TimeBuf].millis
      else new Array[Long](rowCount)
    val columns = fields.indices
      .filter(_ != timeIdx)
      .map(i => fields(i).name -> bufs(i).values())
    val dir = Paths.get(stagingRoot, f"segment-$partitionId%05d-$taskId-$jobId")
    SegmentWriter.write(dir, time, columns, stringBitmaps = bitmapIndexes)
    DruidCommitMessage(dir.toString)
  }

  override def abort(): Unit = ()
  override def close(): Unit = ()
}
