package graft.sql

import org.apache.spark.sql.SparkSession

/** Once-per-session guard for SQL function registration.
  *
  * Query definitions call their `register(...)` on every invocation —
  * they must be self-contained, because the driver may run any single
  * query in a fresh session. The registry writes themselves are
  * idempotent but not free (each re-registration builds identifiers
  * and UDF wrappers for dozens of functions), and at bench scale the
  * per-query repetition shows up as fixed overhead on sub-second
  * queries. This guard makes the second and later calls one
  * ConcurrentHashMap hit.
  *
  * Keyed by the session OBJECT in a WeakHashMap, not by identity
  * hash: identity hashes are not unique, so a GC'd session's stale
  * entry could collide with a new session and silently skip its
  * registration (undefined-function errors at query time). Weak keys
  * also mean entries die with the session instead of accumulating
  * for the life of the JVM.
  */
object Registration {
  private val done =
    new java.util.WeakHashMap[SparkSession, java.util.Set[String]]()
  // per-session mutex objects so `body` runs under a lock — two threads
  // registering the same key concurrently would otherwise both execute
  // it (safe only if body is idempotent, which we don't want to rely
  // on). Weak keys, same lifetime story as `done`.
  private val locks =
    new java.util.WeakHashMap[SparkSession, Object]()

  def once(spark: SparkSession, key: String)(body: => Unit): Unit = {
    val lock = locks.synchronized {
      locks.computeIfAbsent(spark, _ => new Object)
    }
    // the per-session lock is held across the membership check AND the
    // body call, so exactly one thread registers; sessions don't block
    // each other (their locks are distinct), and `done` has its own
    // monitor so this never deadlocks against it
    lock.synchronized {
      val seen = done.synchronized {
        done.computeIfAbsent(spark,
          _ => new java.util.HashSet[String]()).contains(key)
      }
      if (!seen) {
        body // marked done only on success, so a failed registration retries
        done.synchronized(done.get(spark).add(key))
      }
    }
  }
}
