package graft.text

/** Winnowing document fingerprints (Schleimer/Wilkerson/Aiken,
  * SIGMOD'03): Karp–Rabin rolling hashes over character k-grams, then
  * the minimum hash per sliding window — a deterministic, position-
  * robust fingerprint set for near-dup detection at corpus scale.
  */
object Winnow {

  val Base: Long = 1000003L

  /** Rolling Karp–Rabin hashes of every k-gram (one pass, O(n)). */
  def rollingHashes(text: String, k: Int): Array[Long] = {
    val n = text.length
    if (n < k) return Array.empty
    var pow = 1L
    var i = 0
    while (i < k - 1) { pow *= Base; i += 1 }
    val out = new Array[Long](n - k + 1)
    var h = 0L
    i = 0
    while (i < k) { h = h * Base + text.charAt(i); i += 1 }
    out(0) = h
    i = k
    while (i < n) {
      h = (h - text.charAt(i - k) * pow) * Base + text.charAt(i)
      out(i - k + 1) = h
      i += 1
    }
    out
  }

  /** Winnowed fingerprint set: min hash of each window of `w`
    * consecutive k-gram hashes, deduplicated, sorted. Guarantees at
    * least one shared fingerprint for any shared substring of length
    * ≥ w + k - 1. */
  def fingerprints(text: String, k: Int = 5, w: Int = 4): Array[Long] = {
    val hs = rollingHashes(text, k)
    if (hs.isEmpty) return Array.empty
    val picks = scala.collection.mutable.LinkedHashSet.empty[Long]
    var i = 0
    val last = math.max(hs.length - w, 0)
    while (i <= last) {
      var min = hs(i)
      var j = i + 1
      val end = math.min(i + w, hs.length)
      while (j < end) { if (hs(j) < min) min = hs(j); j += 1 }
      picks += min
      i += 1
    }
    picks.toArray.sorted
  }
}
