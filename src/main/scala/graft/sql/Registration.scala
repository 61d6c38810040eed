package graft.sql

import java.util.concurrent.ConcurrentHashMap

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
  * Keyed by session identity, not globally: a new session (new
  * function registry) must re-register.
  */
object Registration {
  private val done = ConcurrentHashMap.newKeySet[String]()

  def once(spark: SparkSession, key: String)(body: => Unit): Unit = {
    val k = System.identityHashCode(spark) + "/" + key
    if (!done.contains(k)) {
      body
      done.add(k)
    }
  }
}
