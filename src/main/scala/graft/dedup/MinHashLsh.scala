package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** MinHash/LSH near-duplicate detection as a library API — the
  * 100 TB dedup shape: signature (narrow, codegen'd) → band buckets →
  * ONE shuffle → intra-bucket pair expansion. No self-join; pair count
  * is bounded by bucket occupancy, not corpus size.
  *
  * Two signature flavors share the banding:
  *  - [[xxhashSignature]] — production (one long per hash,
  *    [[graft.sql.MinHashSig]]);
  *  - [[md5Signature]] — cross-engine-verifiable hex digests
  *    ([[graft.sql.Md5MinHash]], bit-equal to a DuckDB oracle).
  */
object MinHashLsh {

  /** h0..h{k-1} long minhashes per row of `docs(idCol, textCol)`. */
  def xxhashSignature(docs: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame = {
    val sigExpr = graft.sql.MinHashSig.sig(col(textCol), k)
    docs.select(col(idCol).as("doc_id") +:
      (0 until k).map(i => element_at(sigExpr, i + 1).as(s"h$i")): _*)
  }

  /** h0..h{k-1} md5-hex minhashes (lexicographic minima). */
  def md5Signature(docs: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame = {
    val sigExpr = graft.sql.Md5MinHash.sig(col(textCol), k)
    docs.select(col(idCol).as("doc_id") +:
      (0 until k).map(i => element_at(sigExpr, i + 1).as(s"h$i")): _*)
  }

  /** Candidate pairs sharing ≥1 of `k/rowsPerBand` bands: bucket docs
    * per (band, band-hash), expand intra-bucket pairs with a nested
    * transform, count shared bands per pair. Output:
    * (d1, d2, n_bands), d1 < d2.
    *
    * Two hash exchanges run on hash-width keys: the band bucketing and
    * the pair-count aggregation (both map-side combined). `ordered`
    * adds a THIRD, range-partitioned exchange for a total sort — only
    * the oracle-parity twin (q24) needs it; production candidate
    * generation at corpus scale should keep the default.
    *
    * The persist is a CollapseProject barrier: the band projection
    * feeds a Generate (explode), where codegen subexpression
    * elimination does not apply — without it the signature expression
    * re-evaluates once per referenced column. Callers should
    * `spark.catalog.clearCache()` (or unpersist) when done.
    *
    * `maxBucket` drops pathological buckets (a band value shared by
    * thousands of docs carries no near-dup signal and would expand
    * quadratically — standard stop-fingerprint hygiene; 0 = unbounded).
    */
  /** Intra-bucket pair expansion: an id-array column → exploded
    * `(d1, d2)` structs with d1 < d2 for a SORTED input array. The
    * 1-based slice bounds are subtle — this single definition is
    * shared by [[bandPairs]] and the winnowing candidate query (q36)
    * so they cannot drift. */
  def pairsOf(ids: Column): Column =
    explode(flatten(transform(ids, (a, i) =>
      transform(slice(ids, i + 2, size(ids)), b =>
        struct(a.as("d1"), b.as("d2"))))))

  /** Shared banding stage: sorted id-arrays per (band, band-hash)
    * bucket, singleton buckets dropped, `maxBucket` hygiene applied
    * (0 = unbounded). */
  private def buckets(sigDf: DataFrame, k: Int, rowsPerBand: Int,
      bandHash: (Column, Column) => Column, maxBucket: Int): DataFrame = {
    require(rowsPerBand == 2, "current banding packs 2 rows per band")
    val sig = sigDf.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nBands = k / rowsPerBand
    val banded = sig.select(col("doc_id"),
      array((0 until nBands).map(b =>
        struct(lit(b).as("band"),
          bandHash(col(s"h${2 * b}"), col(s"h${2 * b + 1}")).as("bh"))): _*)
        .as("bands"))
      .select(col("doc_id"), explode(col("bands")).as("b"))
      .select(col("doc_id"), col("b.band").as("band"), col("b.bh").as("bh"))
    val bucketed = banded
      .groupBy(col("band"), col("bh"))
      .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
      .filter(size(col("ids")) > 1)
    if (maxBucket > 0) bucketed.filter(size(col("ids")) <= maxBucket)
    else bucketed
  }

  def bandPairs(sigDf: DataFrame, k: Int, rowsPerBand: Int,
      bandHash: (Column, Column) => Column, maxBucket: Int = 10000,
      ordered: Boolean = false): DataFrame = {
    val pairs = buckets(sigDf, k, rowsPerBand, bandHash, maxBucket)
      .select(pairsOf(col("ids")).as("p"))
      .groupBy(col("p.d1").as("d1"), col("p.d2").as("d2"))
      .agg(count(lit(1)).as("n_bands"))
    if (ordered) pairs.orderBy(col("d1"), col("d2")) else pairs
  }

  /** Connectivity-preserving candidate EDGES for clustering: per
    * (band, bucket) emit a STAR — the bucket's min doc as hub, one
    * edge to every other member — instead of all intra-bucket pairs.
    * Within a bucket every doc is already a mutual candidate, so the
    * star spans exactly the same connected components as the
    * quadratic pair expansion while emitting O(|bucket|) rows instead
    * of O(|bucket|²) — the difference between a dedup-clustering job
    * that finishes and one that explodes on a corpus with massive
    * duplicate families (the exact buckets near-dup detection exists
    * to find; no `maxBucket` cap needed, the default is unbounded).
    * Feed the result to [[graft.ops.ConnectedComponents]]. Output:
    * distinct (d1, d2), d1 < d2, no per-pair band counts (meaningless
    * for connectivity). */
  def bandStarEdges(sigDf: DataFrame, k: Int, rowsPerBand: Int,
      bandHash: (Column, Column) => Column, maxBucket: Int = 0): DataFrame =
    buckets(sigDf, k, rowsPerBand, bandHash, maxBucket)
      .select(element_at(col("ids"), 1).as("d1"),
        explode(slice(col("ids"), lit(2), size(col("ids")))).as("d2"))
      .distinct()
}
