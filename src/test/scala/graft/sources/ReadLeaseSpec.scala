package graft.sources

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.sources.druid.{ReadLease, SegmentCatalog}

/** Reader leases: deferred deletion becomes reader-AWARE, not just
  * wall-clock. A read slower than the trash grace period must still
  * complete while tombstone + purge run concurrently — the r13 design
  * lost planned generations once grace lapsed mid-read.
  */
class ReadLeaseSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def write(out: String, n: Int, parts: Int = 2): Unit = {
    import spark.implicits._
    (0 until n).map(i => (new java.sql.Timestamp(1700000000000L + i * 1000L), i.toLong))
      .toDF("__time", "n").repartition(parts)
      .write.format("druid").mode("overwrite").save(out)
  }

  /** Run `f` with `graft.lease.ttl.ms` pinned (suites run sequentially
    * in the forked test JVM, so a scoped sysprop is race-free).
    */
  private def withTtl[A](ms: Long)(f: => A): A = {
    val prev = scala.sys.props.get("graft.lease.ttl.ms")
    scala.sys.props("graft.lease.ttl.ms") = ms.toString
    try f finally prev match {
      case Some(v) => scala.sys.props("graft.lease.ttl.ms") = v
      case None => scala.sys.props -= "graft.lease.ttl.ms"
    }
  }

  test("acquire/renew/live/sweep lifecycle") {
    val root = Files.createTempDirectory("graft-lease0").toString
    Files.createDirectories(Paths.get(root, "segment-0"))
    // not a druid table yet (no segment content) but a directory:
    // acquire still works — leases are per table ROOT
    val t = ReadLease.acquire(root)
    assert(t.isDefined)
    val now = System.currentTimeMillis()
    val live = ReadLease.live(root, now)
    assert(live.size == 1 && live.head.id == t.get.id)
    assert(live.head.expires > now && live.head.created <= now)
    // renew extends expiry, created unchanged
    Thread.sleep(5)
    ReadLease.renew(t.get)
    val renewed = ReadLease.live(root, now)
    assert(renewed.head.created == t.get.created)
    assert(renewed.head.expires >= live.head.expires)
    // an expired lease is not live and sweeps away
    assert(ReadLease.live(root, renewed.head.expires + 1).isEmpty)
    assert(ReadLease.sweepExpired(root, renewed.head.expires + 1) == 1)
    assert(ReadLease.live(root, now).isEmpty)
  }

  test("purge respects leases created at/before the tombstone; later leases never block") {
    val out = Files.createTempDirectory("graft-lease1").toString + "/t"
    write(out, 100, parts = 1)
    // lease BEFORE the tombstone: this read could have planned gen0
    val lease = ReadLease.acquire(out)
    assert(lease.isDefined)
    val gen0 = graft.sources.druid.DruidTableUtil.discoverSegments(out)
    Thread.sleep(5)
    write(out, 60, parts = 1) // overwrite tombstones gen0 (after lease)
    // grace elapsed (1ms) but the lease holds the generation
    Thread.sleep(5)
    assert(SegmentCatalog.purgeTombstoned(out, graceMs = 1L) == 0,
      "a live lease older than the tombstone must block the purge")
    assert(gen0.forall(d => Files.isDirectory(Paths.get(d))))
    // a lease created AFTER the tombstone never planned gen0 and must
    // not block reclamation once the original lease is gone
    val leaseFile = Paths.get(out, ReadLease.DirName, s"${lease.get.id}.json")
    assert(Files.deleteIfExists(leaseFile))
    val later = ReadLease.acquire(out)
    assert(later.isDefined)
    assert(SegmentCatalog.purgeTombstoned(out, graceMs = 1L) == 1,
      "a lease created after the tombstone must not block it")
    assert(gen0.forall(d => !Files.exists(Paths.get(d))))
  }

  test("grace 0 is the operator force-kill: leases are bypassed") {
    val out = Files.createTempDirectory("graft-lease2").toString + "/t"
    write(out, 100, parts = 1)
    val lease = ReadLease.acquire(out)
    assert(lease.isDefined)
    val gen0 = graft.sources.druid.DruidTableUtil.discoverSegments(out)
    Thread.sleep(5)
    write(out, 60, parts = 1)
    assert(SegmentCatalog.purgeTombstoned(out, graceMs = 0L) == 1,
      "grace 0 (kill) reaps regardless of leases, like Druid's kill task")
    assert(gen0.forall(d => !Files.exists(Paths.get(d))))
  }

  test("an expired lease stops protecting (crashed readers cannot pin trash)") {
    withTtl(30L) {
      val out = Files.createTempDirectory("graft-lease3").toString + "/t"
      write(out, 100, parts = 1)
      val lease = ReadLease.acquire(out)
      assert(lease.isDefined)
      write(out, 60, parts = 1)
      Thread.sleep(80) // lease (ttl 30ms) expires; grace (1ms) expires
      assert(SegmentCatalog.purgeTombstoned(out, graceMs = 1L) == 1)
    }
  }

  test("overflow-safe grace: Long.MaxValue means never purge, not purge-all") {
    val out = Files.createTempDirectory("graft-lease4").toString + "/t"
    write(out, 100, parts = 1)
    val gen0 = graft.sources.druid.DruidTableUtil.discoverSegments(out)
    write(out, 60, parts = 1)
    assert(SegmentCatalog.purgeTombstoned(out, graceMs = Long.MaxValue) == 0,
      "a huge grace must never wrap negative and purge everything")
    assert(gen0.forall(d => Files.isDirectory(Paths.get(d))))
  }

  test("a DSv2 scan acquires a lease at planning and ships it to readers") {
    val out = Files.createTempDirectory("graft-lease5").toString + "/t"
    write(out, 500, parts = 2)
    val before = ReadLease.live(out, System.currentTimeMillis()).size
    assert(spark.read.format("druid").load(out).count() == 500)
    val after = ReadLease.live(out, System.currentTimeMillis())
    assert(after.size > before, "planning a druid scan must write a lease")
  }

  test("a read slower than a TINY grace completes while tombstone + purge race it") {
    // the r13 hole this feature closes: grace 1ms, a read held
    // DETERMINISTICALLY in flight by a latch gate (no wall-clock
    // sleeps to mis-time on a loaded host). Without leases the purge
    // reaps the planned generation mid-read and pending splits abort
    // on the vanished dirs; with the lease the purge skips and the
    // read finishes against the generation it planned. Repeated purges
    // simulate maintenance riding other commits during the read.
    val out = Files.createTempDirectory("graft-lease6").toString + "/t"
    write(out, 400, parts = 4)
    val gen0 = graft.sources.druid.DruidTableUtil.discoverSegments(out)
    assert(gen0.size == 4)

    import org.apache.spark.sql.functions._
    ReadLeaseSpecGate.reset()
    // rows 0/100/200/300 land in SOME task each; any task hitting one
    // signals the test and then blocks until released — the read is
    // provably mid-flight (planned, lease written) while we purge
    val brake = udf { (n: Long) =>
      if (n % 100 == 0) {
        ReadLeaseSpecGate.started.countDown()
        ReadLeaseSpecGate.release.await(60, java.util.concurrent.TimeUnit.SECONDS)
      }
      n
    }
    val df = spark.read.format("druid").load(out)
      .select(brake(col("n")).as("n"))

    val result = new java.util.concurrent.atomic.AtomicLong(-1L)
    val err = new java.util.concurrent.atomic.AtomicReference[Throwable]()
    val reader = new Thread(() =>
      try result.set(df.agg(sum("n")).head.getLong(0))
      catch { case e: Throwable => err.set(e) })
    reader.start()
    assert(ReadLeaseSpecGate.started.await(
      60, java.util.concurrent.TimeUnit.SECONDS), "read never started")

    // swap the table out from under the in-flight read, then purge
    // with a tiny (expired) grace — the lease must hold the trash
    write(out, 80, parts = 1)
    Thread.sleep(5) // grace 1ms provably elapsed
    var purged = 0
    (1 to 5).foreach { _ =>
      purged += SegmentCatalog.purgeTombstoned(out, graceMs = 1L)
    }
    gen0.foreach(d => assert(Files.isDirectory(Paths.get(d)),
      s"$d reaped while a leased read was in flight"))
    ReadLeaseSpecGate.release.countDown()
    reader.join(120000)
    assert(err.get() == null,
      s"read aborted mid-flight despite its lease: ${err.get()}")
    assert(result.get() == (0 until 400).map(_.toLong).sum,
      "the read must complete against the generation it planned")
    assert(purged == 0,
      s"purge reaped $purged leased dirs while the read ran")
    // after the read, force-kill reclaims (keeps the spec fast instead
    // of waiting out the lease ttl)
    assert(SegmentCatalog.purgeTombstoned(out, graceMs = 0L) == 4)
    assert(spark.read.format("druid").load(out).count() == 80)
  }
}

/** JVM-global latch gate for the in-flight-read race spec (local mode:
  * executor threads share the JVM, so statics are visible to tasks).
  */
object ReadLeaseSpecGate {
  @volatile var started: java.util.concurrent.CountDownLatch = _
  @volatile var release: java.util.concurrent.CountDownLatch = _
  def reset(): Unit = {
    started = new java.util.concurrent.CountDownLatch(1)
    release = new java.util.concurrent.CountDownLatch(1)
  }
}
