package graft.queries

/** Shared 64-bit wrapping-arithmetic SQL primitives for the DuckDB
  * oracle generators ([[Queries]]' WrapSql, [[XxHashOracleSql]]).
  * Values live in HUGEINT as unsigned [0, 2^64); every multiply by a
  * constant is split 32/32 so no intermediate exceeds ~2^96 (a full
  * 64×64 product can overflow signed-128 HUGEINT); signed `Long`
  * semantics are recovered through an explicit 2^63 pivot.
  */
private[queries] object Wrap64 {
  val M: BigInt = BigInt(1) << 64
  val H32: BigInt = BigInt(1) << 32

  /** (a * c) mod 2^64 with a < 2^64 and a CONSTANT multiplier. */
  def mulmod(a: String, c: BigInt): String = {
    val cl = c % H32
    s"((($a) % $H32) * $c + (((($a) >> 32) * $cl) % $H32) * $H32) % $M"
  }

  /** Rotate-left by r on the unsigned 64-bit value (shift-and-add on
    * disjoint bit ranges — no overflow, no sign issues). */
  def rotl(x: String, r: Int): String =
    s"((($x) % ${BigInt(1) << (64 - r)}) * ${BigInt(1) << r} + (($x) >> ${64 - r}))"

  def xsh(x: String, s: Int): String = s"xor(($x), ($x) >> $s)"

  /** Unsigned [0,2^64) HUGEINT → the Scala `Long` it represents. */
  def signed(x: String): String =
    s"CAST(CASE WHEN ($x) >= ${BigInt(1) << 63} THEN ($x) - $M ELSE ($x) END AS BIGINT)"

  /** A signed BIGINT column/expr → its unsigned [0,2^64) HUGEINT. */
  def unsigned(x: String): String =
    s"(CAST($x AS HUGEINT) + CASE WHEN ($x) < 0 THEN CAST($M AS HUGEINT) ELSE 0 END)"
}
