package graft

/** Minimal thread-safe LRU for the driver-side metadata caches
  * (round 18: the tombstone LocalRelation caches previously dropped
  * EVERY live entry via a wholesale `.clear()` when they crossed their
  * cap — one overflowing store evicted 1024 hot ones). Access-ordered
  * LinkedHashMap under a single lock: these caches see a handful of
  * driver-side lookups per query, so contention is nil. */
final class LruCache[K, V](maxEntries: Int) {
  private val m = new java.util.LinkedHashMap[K, V](64, 0.75f, true) {
    override def removeEldestEntry(e: java.util.Map.Entry[K, V]): Boolean =
      size() > maxEntries
  }
  def get(k: K): V = m.synchronized(m.get(k))
  def put(k: K, v: V): Unit = m.synchronized { m.put(k, v); () }
  def clear(): Unit = m.synchronized(m.clear())
  def size(): Int = m.synchronized(m.size())
}
