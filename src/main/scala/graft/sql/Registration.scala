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

  def once(spark: SparkSession, key: String)(body: => Unit): Unit = {
    val seen = done.synchronized {
      val keys = done.computeIfAbsent(spark,
        _ => new java.util.HashSet[String]())
      keys.contains(key)
    }
    if (!seen) {
      body // marked done only on success, so a failed registration retries
      done.synchronized(done.get(spark).add(key))
    }
  }
}
