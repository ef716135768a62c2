package graft.util

import scala.collection.concurrent.TrieMap
import org.apache.spark.sql.SparkSession

/** Session-scoped memo cache for driver-built dimension tables
  * (layout YAML loads, tilings, reconstructions — all ≤10k-row
  * checkpointed DataFrames built once per session).
  *
  * Entries are keyed by (session, key). Every access first evicts
  * entries whose session's SparkContext has stopped, so a long-lived
  * JVM that creates and stops sessions repeatedly cannot accumulate
  * checkpointed DataFrames or session references of dead sessions.
  * Weak-key maps cannot express this: the cached DataFrame values
  * strongly reference their own SparkSession, which would keep a weak
  * key alive forever. Explicit eviction-on-access is deterministic and
  * costs one scan of a map whose size is the live-session count.
  */
final class SessionCache[K, V] {
  private val m = TrieMap.empty[(SparkSession, K), V]

  def getOrElseUpdate(spark: SparkSession, key: K)(build: => V): V = {
    m.keysIterator.filter(_._1.sparkContext.isStopped).foreach(m.remove)
    m.getOrElseUpdate((spark, key), build)
  }
}
