package graft.seen

import java.nio.ByteBuffer
import scala.collection.mutable.ArrayBuffer

/** Partial-key cuckoo filter over 64-bit keys — the deletable half of the
  * north rule's "Bloom/cuckoo URL-seen set".
  *
  * Design (Fan, Andersen, Kaminsky, Mitzenmacher, "Cuckoo Filter: Practically
  * Better Than Bloom", CoNEXT 2014 — public paper):
  *  - 16-bit fingerprints, 4 slots per bucket, power-of-two bucket count;
  *  - bucket pair: i1 = h(key), i2 = i1 XOR h'(fp) — the XOR is involutive,
  *    so lookup/relocate/delete never need the original key;
  *  - inserts relocate (kick) up to [[CuckooFilter.MaxKicks]] victims, then
  *    overflow into a small stash — the filter NEVER reports a false
  *    negative, matching the Bloom gate's contract;
  *  - **multiset semantics**: inserting duplicate fingerprints keeps every
  *    copy and `delete` removes exactly one, so deleting a key that WAS
  *    inserted can never remove evidence of a different colliding key —
  *    the delete-safety precondition (delete only inserted keys) is enforced
  *    by the caller ([[UrlSeen.antiJoinCuckoo]] semi-joins expired ⊆ seen).
  *
  * Why it exists next to Bloom: identical no-false-negative gate semantics
  * at ~2-4x the bits/key, but with O(1) DELETE — a re-crawl/expiry window at
  * 10^10-frontier scale removes expired URLs from the sketch in place, where
  * the Bloom build can only be discarded and rebuilt from the full seen
  * table. False-positive rate ≈ 2·slots/2^16 ≈ 1.2e-4 at the design load
  * factor (0.84), two orders below the Bloom gate's 3% — the exact verify
  * join downstream stays, so fpp only tunes pruning, never correctness.
  *
  * Membership/delete results are placement-independent (they depend only on
  * the multiset of (bucket-pair, fingerprint)), so nondeterministic merge
  * order in a distributed build cannot change query output.
  *
  * Not thread-safe; one instance per aggregation buffer / task.
  */
final class CuckooFilter private (
    val numBuckets: Int,
    private val table: Array[Short],
    private val stash: ArrayBuffer[(Int, Short)]) extends Serializable {

  import CuckooFilter._

  private val mask = numBuckets - 1

  private def fingerprint(key: Long): Short = {
    val f = (mix(key) & 0xFFFFL).toInt
    (if (f == 0) EmptyFpSubstitute else f).toShort
  }
  private def bucketOf(key: Long): Int = ((mix(key) >>> 20) & mask).toInt
  /** Involutive: altBucket(altBucket(i, f), f) == i. */
  private def altBucket(i: Int, f: Short): Int = (i ^ (mix(f & 0xFFFFL) & mask)).toInt

  private def tryPut(bucket: Int, f: Short): Boolean = {
    val base = bucket * SlotsPerBucket
    var s = 0
    while (s < SlotsPerBucket) {
      if (table(base + s) == 0) { table(base + s) = f; return true }
      s += 1
    }
    false
  }

  private def bucketHas(bucket: Int, f: Short): Boolean = {
    val base = bucket * SlotsPerBucket
    var s = 0
    while (s < SlotsPerBucket) {
      if (table(base + s) == f) return true
      s += 1
    }
    false
  }

  private def bucketRemove(bucket: Int, f: Short): Boolean = {
    val base = bucket * SlotsPerBucket
    var s = 0
    while (s < SlotsPerBucket) {
      if (table(base + s) == f) { table(base + s) = 0; return true }
      s += 1
    }
    false
  }

  /** Insert one copy of (bucket-pair, fingerprint). Never fails: kicks up to
    * MaxKicks victims, then stashes — no-false-negative is unconditional. */
  private[seen] def insertFp(i: Int, f: Short): Unit = {
    if (tryPut(i, f)) return
    val alt = altBucket(i, f)
    if (tryPut(alt, f)) return
    // deterministic eviction walk: rotate the victim slot with the kick count
    var curI = alt
    var curF = f
    var n = 0
    while (n < MaxKicks) {
      val slot = curI * SlotsPerBucket + (n & (SlotsPerBucket - 1))
      val evicted = table(slot)
      table(slot) = curF
      curF = evicted
      curI = altBucket(curI, curF)
      if (tryPut(curI, curF)) return
      n += 1
    }
    stash += ((curI, curF))
  }

  def insert(key: Long): Unit = insertFp(bucketOf(key), fingerprint(key))

  /** No false negatives for every inserted-and-not-deleted key. */
  def mightContain(key: Long): Boolean = {
    val f = fingerprint(key)
    val i1 = bucketOf(key)
    val i2 = altBucket(i1, f)
    bucketHas(i1, f) || bucketHas(i2, f) ||
      stash.exists(e => e._2 == f && (e._1 == i1 || e._1 == i2))
  }

  /** Remove ONE copy of the key's fingerprint from its bucket pair. Only
    * call for keys that were inserted (the cuckoo-filter delete contract);
    * returns false when no copy is present (caller bug — a delete of a
    * never-inserted key would otherwise eat a colliding key's copy). */
  def delete(key: Long): Boolean = {
    val f = fingerprint(key)
    val i1 = bucketOf(key)
    val i2 = altBucket(i1, f)
    if (bucketRemove(i1, f) || bucketRemove(i2, f)) return true
    val idx = stash.indexWhere(e => e._2 == f && (e._1 == i1 || e._1 == i2))
    if (idx >= 0) { stash.remove(idx); true } else false
  }

  /** Fold `other`'s fingerprint multiset into this filter (aggregate merge).
    * Requires identical numBuckets (same bucket geometry). */
  def mergeInPlace(other: CuckooFilter): CuckooFilter = {
    require(other.numBuckets == numBuckets,
      s"cuckoo merge across geometries: $numBuckets vs ${other.numBuckets}")
    var slot = 0
    while (slot < other.table.length) {
      val f = other.table(slot)
      if (f != 0) insertFp(slot / SlotsPerBucket, f)
      slot += 1
    }
    other.stash.foreach { case (i, f) => insertFp(i, f) }
    this
  }

  def occupiedSlots: Int = table.count(_ != 0) + stash.size
  def stashSize: Int = stash.size

  def serialized: Array[Byte] = {
    val buf = ByteBuffer.allocate(4 + 4 + table.length * 2 + 4 + stash.size * 6)
    buf.putInt(FormatVersion)
    buf.putInt(numBuckets)
    table.foreach(buf.putShort)
    buf.putInt(stash.size)
    stash.foreach { case (i, f) => buf.putInt(i); buf.putShort(f) }
    buf.array()
  }
}

object CuckooFilter {
  val SlotsPerBucket = 4
  val MaxKicks = 500
  /** Target load factor for sizing (Fan et al. report ~0.95 achievable at
    * 4 slots; 0.84 leaves kick headroom so the stash stays empty in practice). */
  val TargetLoad = 0.84
  private val FormatVersion = 1
  private val EmptyFpSubstitute = 0x9E37

  /** splitmix64 finalizer — same public mixer family the corpus generator
    * uses; independent bits feed fingerprint (low 16) and bucket (20..). */
  private def mix(x: Long): Long = {
    var z = x + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  def create(expectedItems: Long): CuckooFilter = {
    val needed = math.max(1L, math.ceil(expectedItems / (SlotsPerBucket * TargetLoad)).toLong)
    val buckets = java.lang.Long.highestOneBit(needed) match {
      case b if b >= needed => b
      case b => b << 1
    }
    require(buckets * SlotsPerBucket <= Int.MaxValue,
      s"cuckoo filter too large for one bucket: $expectedItems items — raise the bucket count")
    new CuckooFilter(buckets.toInt, new Array[Short](buckets.toInt * SlotsPerBucket),
      ArrayBuffer.empty)
  }

  def deserialize(bytes: Array[Byte]): CuckooFilter = {
    val buf = ByteBuffer.wrap(bytes)
    val version = buf.getInt
    require(version == FormatVersion, s"unknown cuckoo filter format $version")
    val numBuckets = buf.getInt
    val table = new Array[Short](numBuckets * SlotsPerBucket)
    var i = 0
    while (i < table.length) { table(i) = buf.getShort; i += 1 }
    val stashN = buf.getInt
    val stash = ArrayBuffer.fill(stashN)((buf.getInt, buf.getShort))
    new CuckooFilter(numBuckets, table, stash)
  }
}
