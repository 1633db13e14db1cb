package graft.queries

/** DuckDB SQL generator that recomputes Spark's `xxhash64` — the full
  * XXH64 algorithm (32-byte stripe accumulators, merge rounds, 8-byte
  * / 4-byte / single-byte tails, avalanche; Spark's
  * catalyst.expressions.XXH64 follows the reference spec, verified by
  * disassembly AND by end-to-end output equality) — in HUGEINT
  * arithmetic mod 2^64, so q43's production minhash-LSH pairs get a
  * freestanding oracle instead of rows-only status.
  *
  * Wrapping arithmetic comes from the shared [[Wrap64]] primitives:
  * values live in [0, 2^64) as HUGEINT; every 64×64 multiply is split
  * 32/32 (a full product overflows signed-128 HUGEINT); rotations are
  * shift-and-add on disjoint bit ranges; signed `Long` comparisons
  * (the minhash minima, the final hash values) go through an explicit
  * 2^63 pivot. The per-shingle hash runs as LAYERED CTEs — one layer
  * per algorithm stage, eight seed columns wide — because inlining the
  * merge/avalanche chain would square the expression at every step.
  *
  * Checked cell-by-cell against an independent Python implementation
  * of the xxHash spec (validated on the published test vectors) and
  * end-to-end against the engine's q43 output before wiring.
  */
object XxHashOracleSql {

  import Wrap64.{M, mulmod, rotl, xsh, signed, unsigned}

  private val P1 = BigInt("9E3779B185EBCA87", 16)
  private val P2 = BigInt("C2B2AE3D27D4EB4F", 16)
  private val P3 = BigInt("165667B19E3779F9", 16)
  private val P4 = BigInt("85EBCA77C2B2AE63", 16)
  private val P5 = BigInt("27D4EB2F165667C5", 16)
  private val K = 8
  private val seeds = 0 until K
  private val nb = K / 2

  /** Little-endian lane of `nbytes` ASCII chars at 1-based pos expr.
    * ASCII-ONLY by construction: `ord` yields the CODEPOINT while
    * Spark's xxhash64 consumes UTF-8 BYTES — they agree only below
    * 0x80 (and ord > 255 would also corrupt the byte-lane packing).
    * The `shingles` CTE asserts this with an `error()` guard rather
    * than silently diverging on a non-ASCII corpus. */
  private def lane(s: String, p: String, nbytes: Int): String =
    "(" + (0 until nbytes).map { i =>
      val t = s"CAST(ord(substring($s, CAST(($p) + $i AS INT), 1)) AS HUGEINT)"
      if (i == 0) t else s"$t * ${BigInt(1) << (8 * i)}"
    }.mkString(" + ") + ")"

  private def rnd(acc: String, laneE: String): String =
    mulmod(rotl(s"(($acc) + ${mulmod(laneE, P2)}) % $M", 31), P1)

  private def r0(v: String): String = mulmod(rotl(mulmod(v, P2), 31), P1)

  /** The q43 oracle: minhash signatures (XXH64 of each shingle, seeds
    * 0..7, signed minima per doc) → band hashes
    * `xxhash64(h2b, h2b+1)` = hashLong-chained from seed 42 → buckets
    * (maxBucket 10000) → intra-bucket pairs with shared-band counts. */
  def q43Sql: String = {
    val cLanes =
      s"""c_lanes AS (
         SELECT doc_id, sh, n,
           list_transform(range(0, n // 32), j -> struct_pack(
             l1 := ${lane("sh", "1 + j*32", 8)},
             l2 := ${lane("sh", "9 + j*32", 8)},
             l3 := ${lane("sh", "17 + j*32", 8)},
             l4 := ${lane("sh", "25 + j*32", 8)})) AS stripes,
           list_transform(range(0, (n % 32) // 8),
             j -> ${lane("sh", "(n // 32) * 32 + 1 + j*8", 8)}) AS words,
           CASE WHEN n % 8 >= 4
             THEN ${lane("sh", "n - (n % 8) + 1", 4)} ELSE 0 END AS w4,
           list_transform(range(0, n % 4),
             j -> ${lane("sh", "n - (n % 4) + 1 + j", 1)}) AS tbytes
         FROM shingles)"""

    val stCols = seeds.map { s =>
      val v1 = (BigInt(s) + P1 + P2) % M
      val v2 = (BigInt(s) + P2) % M
      val v3 = BigInt(s)
      val v4 = (BigInt(s) - P1 + M) % M
      s"""list_reduce(list_prepend(struct_pack(
           l1 := CAST($v1 AS HUGEINT), l2 := CAST($v2 AS HUGEINT),
           l3 := CAST($v3 AS HUGEINT), l4 := CAST($v4 AS HUGEINT)),
           stripes), (a, e) -> struct_pack(
           l1 := ${rnd("a.l1", "e.l1")}, l2 := ${rnd("a.l2", "e.l2")},
           l3 := ${rnd("a.l3", "e.l3")}, l4 := ${rnd("a.l4", "e.l4")}))
         AS st$s"""
    }
    val cSt = "c_st AS (SELECT doc_id, sh, n, words, w4, tbytes, " +
      stCols.mkString(", ") + " FROM c_lanes)"

    val h0Cols = seeds.map { s =>
      val conv = s"(${rotl(s"st$s.l1", 1)} + ${rotl(s"st$s.l2", 7)} + " +
        s"${rotl(s"st$s.l3", 12)} + ${rotl(s"st$s.l4", 18)}) % $M"
      s"CASE WHEN n >= 32 THEN ($conv) " +
        s"ELSE CAST(${(BigInt(s) + P5) % M} AS HUGEINT) END AS h0_$s"
    }
    val cH0 = "c_h0 AS (SELECT doc_id, sh, n, words, w4, tbytes, " +
      seeds.map(s => s"st$s").mkString(", ") + ", " +
      h0Cols.mkString(", ") + " FROM c_st)"

    val mergeCtes = Seq("l1", "l2", "l3", "l4").zipWithIndex.map {
      case (part, k0) =>
        val k = k0 + 1
        val cols = seeds.map { s =>
          val step =
            s"(${mulmod(s"xor(h${k - 1}_$s, ${r0(s"st$s.$part")})", P1)} + $P4) % $M"
          s"CASE WHEN n >= 32 THEN ($step) ELSE h${k - 1}_$s END AS h${k}_$s"
        }
        val keep = "doc_id, sh, n, words, w4, tbytes" +
          (if (k < 4) ", " + seeds.map(s => s"st$s").mkString(", ") else "")
        s"c_h$k AS (SELECT $keep, " + cols.mkString(", ") + s" FROM c_h${k - 1})"
    }

    val twCols = seeds.map { s =>
      val step = s"(${mulmod(rotl(s"xor(a, ${r0("w")})", 27), P1)} + $P4) % $M"
      s"list_reduce(list_prepend((h4_$s + n) % $M, words), (a, w) -> $step) AS t_$s"
    }
    val cTw = "c_tw AS (SELECT doc_id, sh, n, w4, tbytes, " +
      twCols.mkString(", ") + " FROM c_h4)"

    val f4Cols = seeds.map { s =>
      val step =
        s"(${mulmod(rotl(s"xor(t_$s, (w4 * $P1) % $M)", 23), P2)} + $P3) % $M"
      s"CASE WHEN n % 8 >= 4 THEN ($step) ELSE t_$s END AS f_$s"
    }
    val cF4 = "c_f4 AS (SELECT doc_id, n, tbytes, " +
      f4Cols.mkString(", ") + " FROM c_tw)"

    val bCols = seeds.map { s =>
      val step = mulmod(rotl(s"xor(a, (c * $P5) % $M)", 11), P1)
      s"list_reduce(list_prepend(f_$s, tbytes), (a, c) -> $step) AS b_$s"
    }
    val cB = "c_b AS (SELECT doc_id, " + bCols.mkString(", ") + " FROM c_f4)"

    val x1 = "c_x1 AS (SELECT doc_id, " + seeds.map(s =>
      s"${mulmod(xsh(s"b_$s", 33), P2)} AS x1_$s").mkString(", ") + " FROM c_b)"
    val x2 = "c_x2 AS (SELECT doc_id, " + seeds.map(s =>
      s"${mulmod(xsh(s"x1_$s", 29), P3)} AS x2_$s").mkString(", ") + " FROM c_x1)"
    val x3 = "c_hash AS (SELECT doc_id, " + seeds.map(s =>
      s"${signed(xsh(s"x2_$s", 32))} AS hv_$s").mkString(", ") + " FROM c_x2)"

    val cSig = "sig AS (SELECT doc_id, " + seeds.map(s =>
      s"min(hv_$s) AS h$s").mkString(", ") + " FROM c_hash GROUP BY doc_id)"

    // band hashes: Spark's xxhash64(a, b) = hashLong(b, hashLong(a, 42));
    // each hashLong = fixed 8-byte tail + avalanche, layered below
    val seedInit = (BigInt(42) + P5 + 8) % M
    val bandCtes = Seq(
      "c_i0 AS (SELECT *, " + (0 until nb).map { b =>
        s"(${mulmod(rotl(s"xor(CAST($seedInit AS HUGEINT), ${r0(unsigned(s"h${2 * b}"))})", 27), P1)} + $P4) % $M AS i0_$b"
      }.mkString(", ") + " FROM sig)",
      "c_i1 AS (SELECT *, " + (0 until nb).map(b =>
        s"${mulmod(xsh(s"i0_$b", 33), P2)} AS i1_$b").mkString(", ") + " FROM c_i0)",
      "c_i2 AS (SELECT *, " + (0 until nb).map(b =>
        s"${mulmod(xsh(s"i1_$b", 29), P3)} AS i2_$b").mkString(", ") + " FROM c_i1)",
      "c_i3 AS (SELECT *, " + (0 until nb).map(b =>
        s"${xsh(s"i2_$b", 32)} AS inner_$b").mkString(", ") + " FROM c_i2)",
      "c_o0 AS (SELECT *, " + (0 until nb).map { b =>
        s"(${mulmod(rotl(s"xor((inner_$b + ${(P5 + 8) % M}) % $M, ${r0(unsigned(s"h${2 * b + 1}"))})", 27), P1)} + $P4) % $M AS o0_$b"
      }.mkString(", ") + " FROM c_i3)",
      "c_o1 AS (SELECT *, " + (0 until nb).map(b =>
        s"${mulmod(xsh(s"o0_$b", 33), P2)} AS o1_$b").mkString(", ") + " FROM c_o0)",
      "c_o2 AS (SELECT *, " + (0 until nb).map(b =>
        s"${mulmod(xsh(s"o1_$b", 29), P3)} AS o2_$b").mkString(", ") + " FROM c_o1)",
      "c_bh AS (SELECT doc_id, " + (0 until nb).map(b =>
        s"${signed(xsh(s"o2_$b", 32))} AS bh_$b").mkString(", ") + " FROM c_o2)")

    val bandsUnion = (0 until nb).map(b =>
      s"SELECT doc_id, $b AS band, bh_$b AS bh FROM c_bh").mkString(" UNION ALL ")

    s"""WITH tt AS (
         SELECT doc_id, string_split_regex(trim(text), '\\s+') AS tk
         FROM documents),
       ss AS (SELECT doc_id, unnest(CASE WHEN len(tk) >= 3
           THEN list_distinct(list_transform(range(1, len(tk) - 1),
             i -> array_to_string(tk[i:i+2], ' ')))
           ELSE [array_to_string(tk, ' ')] END) AS sh
         FROM tt),
       shingles AS (SELECT doc_id, sh,
         CASE WHEN octet_length(encode(sh)) = length(sh)
              THEN CAST(length(sh) AS BIGINT)
              ELSE CAST(error('xxhash64 oracle requires ASCII shingles: the lanes hash character codepoints while Spark hashes UTF-8 bytes') AS BIGINT)
         END AS n FROM ss),
       $cLanes,
       $cSt,
       $cH0,
       ${mergeCtes.mkString(",\n       ")},
       $cTw,
       $cF4,
       $cB,
       $x1,
       $x2,
       $x3,
       $cSig,
       ${bandCtes.mkString(",\n       ")},
       bands AS ($bandsUnion),
       buckets AS (
         SELECT band, bh, list_sort(list(doc_id)) AS ids
         FROM bands GROUP BY band, bh),
       ok AS (SELECT ids FROM buckets WHERE len(ids) > 1 AND len(ids) <= 10000),
       e1 AS (SELECT ids, unnest(range(1, len(ids) + 1)) AS i FROM ok),
       e2 AS (SELECT ids, i, unnest(range(1, len(ids) + 1)) AS j FROM e1),
       p AS (SELECT ids[CAST(i AS INT)] AS d1, ids[CAST(j AS INT)] AS d2
             FROM e2 WHERE j > i)
       SELECT d1, d2, CAST(count(*) AS BIGINT) AS n_bands
       FROM p GROUP BY d1, d2"""
  }
}
