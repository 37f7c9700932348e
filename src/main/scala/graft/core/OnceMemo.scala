package graft.core

import scala.collection.concurrent.TrieMap

/** One-time memoizer whose builder runs AT MOST ONCE per key.
  *
  * `TrieMap.getOrElseUpdate` may evaluate two RACING builders and keep
  * one result — tolerable for pure values, not for the one-time
  * artifacts memoized here: layout builders wipe-and-rewrite a FIXED
  * scratch directory (a racing double-build is a wipe-during-write),
  * index/store builders persist through rename-swap paths, and corpus
  * builders run multi-job Spark work worth deduplicating — all of
  * which the parallel plan audit now constructs CONCURRENTLY.
  *
  * Coarse one-lock-per-memo is deliberate: builds happen once per
  * (JVM, key); every later lookup takes the lock-free fast path.
  */
final class OnceMemo[K, V] {
  private val m = TrieMap.empty[K, V]

  def getOrElseUpdate(k: K, build: => V): V =
    m.getOrElse(k, synchronized(m.getOrElseUpdate(k, build)))

  def keys: Iterable[K] = m.keys
  def remove(k: K): Option[V] = m.remove(k)
}
