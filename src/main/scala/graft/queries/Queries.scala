package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sql.SpanOps

/** One driver-contract query: a Spark implementation plus (when the
  * operator is SQL-expressible) a DuckDB oracle producing the same
  * rows/columns. Column names are kept identical on both sides (the
  * driver hashes values under sorted column names).
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

/** The engine's operator surface exposed over the driver's test tables
  * (TESTDATA.md): the reference's operator inventory (SURVEY.md §2) on
  * the relational tables, plus the extraction/text/dedup/similarity
  * operators a large-scale training-data pipeline needs, over
  * `documents` and `embeddings`.
  *
  * Determinism rules: every query ends in a total ORDER BY; every
  * floating aggregate is rounded; joins/windows carry explicit
  * tie-breaks.
  */
object Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  // ===================================================================
  // Relational operator inventory (S/F/J/A/W/O/U of SURVEY.md §2)
  // ===================================================================

  private val q01 = QueryDef("q01_agg",
    (s, d) => t(s, d, "lineitem")
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_price"),
        round(avg(col("l_discount")), 3).as("avg_disc"),
        count(lit(1)).as("n"))
      .orderBy(col("l_returnflag"), col("l_linestatus")),
    Some("""SELECT l_returnflag, l_linestatus,
            round(sum(l_quantity), 2) AS sum_qty,
            round(sum(l_extendedprice), 2) AS sum_price,
            round(avg(l_discount), 3) AS avg_disc,
            count(*) AS n
            FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2"""))

  // window chosen inside the synthetic data range (shipdates start
  // 1995-01-02) so the filter+sort+limit chain is exercised on real rows
  private val q02 = QueryDef("q02_filter_sort_limit",
    (s, d) => t(s, d, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01") &&
        col("l_shipdate") < lit("1997-01-01") && col("l_discount") >= 0.05)
      .select(col("l_orderkey"), col("l_linenumber"),
        round(col("l_extendedprice") * (lit(1) - col("l_discount")), 2).as("revenue"))
      .orderBy(desc("revenue"), col("l_orderkey"), col("l_linenumber"))
      .limit(100),
    Some("""SELECT l_orderkey, l_linenumber,
            round(l_extendedprice * (1 - l_discount), 2) AS revenue
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate < TIMESTAMP '1997-01-01' AND l_discount >= 0.05
            ORDER BY revenue DESC, l_orderkey, l_linenumber LIMIT 100"""))

  private val q03 = QueryDef("q03_join_broadcast",
    (s, d) => t(s, d, "customer")
      .join(broadcast(t(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t(s, d, "region")), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(count(lit(1)).as("n_cust"), round(sum(col("c_acctbal")), 2).as("sum_bal"))
      .orderBy(col("r_name")),
    Some("""SELECT r_name, count(*) AS n_cust, round(sum(c_acctbal), 2) AS sum_bal
            FROM customer JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            GROUP BY r_name ORDER BY r_name"""))

  private val q04 = QueryDef("q04_semi_join",
    (s, d) => t(s, d, "supplier")
      .join(t(s, d, "lineitem"), col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select(col("s_suppkey"), col("s_name"))
      .orderBy(col("s_suppkey")),
    Some("""SELECT s_suppkey, s_name FROM supplier
            WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_suppkey = s_suppkey)
            ORDER BY s_suppkey"""))

  // anti-join against a genuinely partial key set (customers with no
  // URGENT order — every customer has *some* order, which made the
  // unfiltered variant trivially empty)
  private val q05 = QueryDef("q05_anti_join",
    (s, d) => t(s, d, "customer")
      .join(t(s, d, "orders").filter(col("o_orderpriority") === "1-URGENT"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey")),
    Some("""SELECT c_custkey, c_name FROM customer
            WHERE NOT EXISTS (SELECT 1 FROM orders
              WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
            ORDER BY c_custkey"""))

  private val q06 = QueryDef("q06_window_topk",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(desc("o_totalprice"), col("o_orderkey"))
      t(s, d, "orders")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("o_custkey"), col("o_orderkey"), col("rn"))
        .orderBy(col("o_custkey"), col("rn"))
    },
    Some("""SELECT o_custkey, o_orderkey, rn FROM (
              SELECT o_custkey, o_orderkey,
                row_number() OVER (PARTITION BY o_custkey
                  ORDER BY o_totalprice DESC, o_orderkey) AS rn
              FROM orders) WHERE rn <= 3 ORDER BY o_custkey, rn"""))

  private val q07 = QueryDef("q07_running_sum",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, d, "events")
        .filter(col("user_id") < 50)
        .withColumn("running", round(sum(col("value")).over(w), 2))
        .select(col("user_id"), col("event_id"), col("running"))
        .orderBy(col("user_id"), col("event_id"))
    },
    Some("""SELECT user_id, event_id,
              round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running
            FROM events WHERE user_id < 50 ORDER BY user_id, event_id"""))

  private val q08 = QueryDef("q08_distinct",
    (s, d) => t(s, d, "orders")
      .select(col("o_orderstatus"), col("o_orderpriority"))
      .distinct()
      .orderBy(col("o_orderstatus"), col("o_orderpriority")),
    Some("""SELECT DISTINCT o_orderstatus, o_orderpriority
            FROM orders ORDER BY 1, 2"""))

  private val q09 = QueryDef("q09_conditional_agg",
    (s, d) => t(s, d, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n_total"),
        count(when(col("l_discount") > 0.05, 1)).as("n_disc"),
        round(sum(when(col("l_tax") > 0.04, col("l_extendedprice"))), 2).as("taxed_price"))
      .orderBy(col("l_returnflag")),
    Some("""SELECT l_returnflag, count(*) AS n_total,
              count(CASE WHEN l_discount > 0.05 THEN 1 END) AS n_disc,
              round(sum(CASE WHEN l_tax > 0.04 THEN l_extendedprice END), 2) AS taxed_price
            FROM lineitem GROUP BY 1 ORDER BY 1"""))

  // A5 histogram semantics: floor(x / step) clamped to bins-1
  private val q10 = QueryDef("q10_histogram",
    (s, d) => t(s, d, "lineitem")
      .select(SpanOps.binId(col("l_extendedprice") / 150.0).as("bin"))
      .groupBy(col("bin")).agg(count(lit(1)).as("n"))
      .orderBy(col("bin")),
    Some("""SELECT CAST(least(floor(l_extendedprice / 150.0 / 15), 4) AS INT) AS bin,
              count(*) AS n
            FROM lineitem GROUP BY 1 ORDER BY 1"""))

  private val q11 = QueryDef("q11_multi_join_revenue",
    (s, d) => t(s, d, "customer")
      .join(t(s, d, "orders"), col("c_custkey") === col("o_custkey"))
      .join(t(s, d, "lineitem"), col("o_orderkey") === col("l_orderkey"))
      .join(broadcast(t(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
        count(lit(1)).as("n"))
      .orderBy(col("n_name")),
    Some("""SELECT n_name,
              round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
              count(*) AS n
            FROM customer JOIN orders ON c_custkey = o_custkey
            JOIN lineitem ON o_orderkey = l_orderkey
            JOIN nation ON c_nationkey = n_nationkey
            GROUP BY n_name ORDER BY n_name"""))

  private val q12 = QueryDef("q12_time_window",
    (s, d) => t(s, d, "events")
      .select(unix_timestamp(date_trunc("hour", col("ts"))).as("hour_ts"),
        col("event_type"), col("value"))
      .groupBy(col("hour_ts"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_val"))
      .orderBy(col("hour_ts"), col("event_type")),
    Some("""SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_ts,
              event_type, count(*) AS n, round(sum(value), 2) AS sum_val
            FROM events GROUP BY 1, 2 ORDER BY 1, 2"""))

  private val q13 = QueryDef("q13_json_extract",
    (s, d) => t(s, d, "events")
      .select(get_json_object(col("props"), "$.k").as("k"))
      .groupBy(col("k")).agg(count(lit(1)).as("n"))
      .orderBy(col("k")),
    Some("""SELECT json_extract_string(props, '$.k') AS k, count(*) AS n
            FROM events GROUP BY 1 ORDER BY 1"""))

  private val q14 = QueryDef("q14_sessionize",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      t(s, d, "events")
        .withColumn("prev_ts", lag(col("ts"), 1).over(w))
        .withColumn("new_session",
          when(col("prev_ts").isNull ||
            col("ts").cast("timestamp").cast("double")
              - col("prev_ts").cast("timestamp").cast("double") > 1800, 1)
            .otherwise(0))
        .groupBy(col("user_id"))
        .agg(sum(col("new_session")).as("n_sessions"), count(lit(1)).as("n_events"))
        .orderBy(col("user_id"))
    },
    // CAST: DuckDB sum(int) is HUGEINT; the driver hashes it differently
    // from Spark's int64 even when values are equal
    Some("""SELECT user_id, CAST(sum(new_session) AS BIGINT) AS n_sessions,
              count(*) AS n_events
            FROM (
              SELECT user_id,
                CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       IS NULL
                     OR epoch(ts) - epoch(lag(ts) OVER (PARTITION BY user_id
                       ORDER BY ts, event_id)) > 1800
                     THEN 1 ELSE 0 END AS new_session
              FROM events)
            GROUP BY user_id ORDER BY user_id"""))

  // ===================================================================
  // Extraction / text analysis over `documents` (C/F/A ops + training
  // data pipeline operators)
  // ===================================================================

  /** Whitespace tokens of the trimmed text (Python str.split). */
  private def toks(c: Column): Column = split(trim(c), "\\s+")

  private val q15 = QueryDef("q15_sanitize_chars",
    (s, d) => t(s, d, "documents")
      .select(col("doc_id"), SpanOps.sanitizeCharsCol(col("text")).as("clean"))
      .orderBy(col("doc_id")),
    Some("""SELECT doc_id, array_to_string(list_filter(
              string_split_regex(trim(replace(translate(text,
                '0123456789“„"''?!*.;:-=[]()|', ''), 'ſ', 's')), '\s+'),
              x -> length(x) > 1), ' ') AS clean
            FROM documents ORDER BY doc_id"""))

  private val q16 = QueryDef("q16_token_count",
    (s, d) => t(s, d, "documents")
      .select(col("doc_id"),
        when(length(trim(col("text"))) === 0, 0)
          .otherwise(size(toks(col("text")))).as("n_tokens"),
        length(col("text")).as("len"))
      .orderBy(col("doc_id")),
    Some("""SELECT doc_id,
              CASE WHEN length(trim(text)) = 0 THEN 0
                   ELSE len(string_split_regex(trim(text), '\s+')) END AS n_tokens,
              length(text) AS len
            FROM documents ORDER BY doc_id"""))

  // A3 word/error ratio with a SQL-expressible deterministic oracle:
  // error := token of length ≤ 2 or containing a digit
  private val q17 = QueryDef("q17_word_error_ratio",
    (s, d) => t(s, d, "documents")
      .withColumn("tk", toks(col("text")))
      .withColumn("n_words", size(col("tk")))
      .withColumn("n_errs", size(filter(col("tk"),
        x => length(x) <= 2 || x.rlike("[0-9]"))))
      .select(col("doc_id"), col("n_words"), col("n_errs"),
        when(col("n_words") <= col("n_errs"), 0.0)
          .otherwise(round((col("n_words") - col("n_errs")).cast("double")
            / col("n_words") * 100, 3)).as("ratio"))
      .orderBy(col("doc_id")),
    Some("""SELECT doc_id, n_words, n_errs,
              CASE WHEN n_words <= n_errs THEN 0.0
                   ELSE round(CAST(n_words - n_errs AS DOUBLE) / n_words * 100, 3)
              END AS ratio
            FROM (
              SELECT doc_id,
                len(string_split_regex(trim(text), '\s+')) AS n_words,
                len(list_filter(string_split_regex(trim(text), '\s+'),
                  x -> length(x) <= 2 OR regexp_matches(x, '[0-9]'))) AS n_errs
              FROM documents)
            ORDER BY doc_id"""))

  // A4/A5/A7 corpus report over the q17 ratios
  private val q18 = QueryDef("q18_quality_report",
    (s, d) => {
      val ratios = q17.fn(s, d).select(col("ratio"))
      ratios.agg(
        round(avg(col("ratio")), 3).as("mean"),
        count(when(SpanOps.binId(col("ratio")) === 0, 1)).as("b1"),
        count(when(SpanOps.binId(col("ratio")) === 1, 1)).as("b2"),
        count(when(SpanOps.binId(col("ratio")) === 2, 1)).as("b3"),
        count(when(SpanOps.binId(col("ratio")) === 3, 1)).as("b4"),
        count(when(SpanOps.binId(col("ratio")) === 4, 1)).as("b5"),
        count(lit(1)).as("n_total"))
    },
    Some("""WITH r AS (
              SELECT CASE WHEN n_words <= n_errs THEN 0.0
                   ELSE round(CAST(n_words - n_errs AS DOUBLE) / n_words * 100, 3)
              END AS ratio FROM (
                SELECT len(string_split_regex(trim(text), '\s+')) AS n_words,
                  len(list_filter(string_split_regex(trim(text), '\s+'),
                    x -> length(x) <= 2 OR regexp_matches(x, '[0-9]'))) AS n_errs
                FROM documents))
            SELECT round(avg(ratio), 3) AS mean,
              count(CASE WHEN least(floor(ratio/15), 4) = 0 THEN 1 END) AS b1,
              count(CASE WHEN least(floor(ratio/15), 4) = 1 THEN 1 END) AS b2,
              count(CASE WHEN least(floor(ratio/15), 4) = 2 THEN 1 END) AS b3,
              count(CASE WHEN least(floor(ratio/15), 4) = 3 THEN 1 END) AS b4,
              count(CASE WHEN least(floor(ratio/15), 4) = 4 THEN 1 END) AS b5,
              count(*) AS n_total
            FROM r"""))

  // C1 ordered literal multi-replace (chain order is the semantics)
  private val q19 = QueryDef("q19_replace_chars",
    (s, d) => {
      val dict = Seq("dup" -> "dupl", "ic)" -> "ich", "s<" -> "sc", "<" -> "c")
      val replaced = dict.foldLeft(col("text")) { case (acc, (k, v)) =>
        replace(acc, lit(k), lit(v))
      }
      t(s, d, "documents")
        .select(col("doc_id"), md5(replaced).as("replaced_md5"))
        .orderBy(col("doc_id"))
    },
    Some("""SELECT doc_id,
              md5(replace(replace(replace(replace(text,
                'dup', 'dupl'), 'ic)', 'ich'), 's<', 'sc'), '<', 'c')) AS replaced_md5
            FROM documents ORDER BY doc_id"""))

  // ===================================================================
  // Deduplication family
  // ===================================================================

  // scale shape: group by the 128-bit digest, NOT the raw text — the
  // exchange then moves hash-width keys instead of the whole corpus
  private val q20 = QueryDef("q20_dedup_exact",
    (s, d) => t(s, d, "documents")
      .select(col("doc_id"), md5(col("text")).as("fp"))
      .groupBy(col("fp"))
      .agg(min(col("doc_id")).as("keeper"), count(lit(1)).as("n_copies"))
      .orderBy(col("keeper")),
    Some("""SELECT md5(text) AS fp, min(doc_id) AS keeper, count(*) AS n_copies
            FROM documents GROUP BY 1 ORDER BY keeper"""))

  // bag-of-words fingerprint dedup (order-insensitive near-dup)
  private val q21 = QueryDef("q21_dedup_fingerprint",
    (s, d) => t(s, d, "documents")
      .withColumn("fp", md5(array_join(array_sort(array_distinct(toks(col("text")))), " ")))
      .groupBy(col("fp"))
      .agg(min(col("doc_id")).as("keeper"), count(lit(1)).as("n_docs"))
      .orderBy(col("keeper")),
    Some("""SELECT md5(array_to_string(list_sort(list_distinct(
              string_split_regex(trim(text), '\s+'))), ' ')) AS fp,
              min(doc_id) AS keeper, count(*) AS n_docs
            FROM documents GROUP BY 1 ORDER BY keeper"""))

  /** q22 block-size cap: a block (same `n_chars`) with more than this
    * many docs is dropped instead of expanded quadratically — the exact
    * baseline stays exact on bounded blocks and never goes O(n²) on a
    * hot key (the unbounded scale path is LSH banding, q24). */
  private val JaccardBlockCap = 64
  // n-gram (token-set) Jaccard near-dup pairs, blocked by n_chars
  private val q22 = QueryDef("q22_ngram_jaccard",
    (s, d) => {
      val raw = t(s, d, "documents")
        .select(col("doc_id"), col("n_chars"),
          array_distinct(toks(col("text"))).as("tk"))
      // bounded blocks only: broadcast the (tiny) blocklist of key counts
      val okBlocks = raw.groupBy(col("n_chars"))
        .agg(count(lit(1)).as("_bn"))
        .filter(col("_bn") <= JaccardBlockCap)
        .select(col("n_chars"))
      val docs = raw.join(broadcast(okBlocks), Seq("n_chars"))
      val a = docs.select(col("doc_id").as("d1"), col("n_chars").as("nc"), col("tk").as("tk1"))
      val b = docs.select(col("doc_id").as("d2"), col("n_chars").as("nc"), col("tk").as("tk2"))
      a.join(b, Seq("nc")).filter(col("d1") < col("d2"))
        .select(col("d1"), col("d2"),
          round(size(array_intersect(col("tk1"), col("tk2"))).cast("double")
            / size(array_union(col("tk1"), col("tk2"))), 3).as("jaccard"))
        .filter(col("jaccard") >= 0.3)
        .orderBy(col("d1"), col("d2"))
    },
    Some("""WITH dd0 AS (
              SELECT doc_id, n_chars,
                list_distinct(string_split_regex(trim(text), '\s+')) AS tk
              FROM documents),
            ok AS (SELECT n_chars FROM dd0 GROUP BY 1 HAVING count(*) <= 64),
            dd AS (SELECT dd0.* FROM dd0 JOIN ok USING (n_chars))
            SELECT a.doc_id AS d1, b.doc_id AS d2,
              round(CAST(len(list_intersect(a.tk, b.tk)) AS DOUBLE) /
                len(list_distinct(list_concat(a.tk, b.tk))), 3) AS jaccard
            FROM dd a JOIN dd b ON a.n_chars = b.n_chars AND a.doc_id < b.doc_id
            WHERE CAST(len(list_intersect(a.tk, b.tk)) AS DOUBLE) /
                len(list_distinct(list_concat(a.tk, b.tk))) >= 0.2995
            ORDER BY d1, d2"""))

  /** SQL generators for 64-bit wrapping arithmetic in DuckDB — the
    * machinery that lets the oracle recompute the engine's ACTUAL
    * hashes (splitmix64 for q35's media synthesis, the Karp–Rabin
    * polynomial for q36's winnow) instead of settling for rows-only.
    * All values live in HUGEINT as unsigned [0, 2^64); multiplication
    * is split 32/32 so no intermediate exceeds 2^96 (a full 64×64
    * product can overflow signed-128 HUGEINT); signed comparisons cast
    * back via an explicit 2^63 pivot. Generic primitives live in
    * [[Wrap64]] (shared with [[XxHashOracleSql]]); prototyped
    * cell-by-cell against the JVM implementations
    * (graft.gen.CorpusGen.mix64, graft.text.Winnow.rollingHashes)
    * before wiring. */
  private object WrapSql {
    import Wrap64.{mulmod, xsh}
    val M: BigInt = Wrap64.M
    def signed(x: String): String = Wrap64.signed(x)
    private val MixAdd = BigInt("9e3779b97f4a7c15", 16)
    private val MixC1 = BigInt("bf58476d1ce4e5b9", 16)
    private val MixC2 = BigInt("94d049bb133111eb", 16)

    /** splitmix64 finalizer (graft.gen.CorpusGen.mix64) over an
      * unsigned-HUGEINT operand expression. Inlines its input ~32×,
      * so keep `z0` a short expression (a column ref or lambda var). */
    def mix64(z0: String): String = {
      val z1 = s"(($z0) + $MixAdd) % $M"
      val z2 = mulmod(xsh(z1, 30), MixC1)
      val z3 = mulmod(xsh(z2, 27), MixC2)
      xsh(z3, 31)
    }

    /** graft.multimodal.Media.hashStr over a `ref` column: fold
      * mix64(h ^ char) over the chars, seeded 0x9e3779b97f4a7c15. */
    def hashStrOfRef: String =
      s"""list_reduce(list_prepend(CAST($MixAdd AS HUGEINT),
            list_transform(range(1, len(ref) + 1),
              i -> CAST(ord(substring(ref, CAST(i AS INT), 1)) AS HUGEINT))),
            (a, c) -> ${mix64("xor(a, c)")})"""

    /** A stub-decoder payload byte as the sign-EXTENDED unsigned-64
      * value `(byte:Byte).toLong` wraps to (StubDecoder xors the Byte
      * after Scala's widening sign extension). */
    def sextByte(mexpr: String): String = {
      val b = s"(($mexpr) % 256)"
      s"CASE WHEN $b >= 128 THEN $b + 18446744073709551360 ELSE $b END"
    }

    /** Signed Karp–Rabin hash (graft.text.Winnow, base 1000003) of the
      * k-gram at 1-based position `i` of `text`: the rolling recurrence
      * is algebraically the plain polynomial mod 2^64, so the oracle
      * evaluates THAT (max intermediate ≈ 2^88, inside HUGEINT). */
    def krGram(i: String, k: Int): String = {
      val c0 = s"CAST(ord(substring(text, CAST($i AS INT), 1)) AS HUGEINT)"
      val poly = (1 until k).foldLeft(c0)((acc, o) =>
        s"(($acc) * 1000003 + ord(substring(text, CAST($i + $o AS INT), 1)))")
      signed(s"(($poly) % $M)")
    }
  }

  /** MinHash machinery shared by q23/q24 (md5-based hashes so the
    * DuckDB oracle computes identical signatures). Shingles are word
    * 3-grams of the token sequence. */
  private val MinhashK = 8
  // minhash value = lexicographic MIN of the md5 hex digests — avoids
  // a per-shingle hex→int conversion entirely; both engines order hex
  // strings identically
  private def minhashSqlExpr(i: Int): String =
    s"list_min(list_transform(sh, x -> md5(CONCAT('$i:', x))))"
  private val shingleSql =
    """CASE WHEN len(tk) >= 3 THEN list_distinct(list_transform(
         range(1, len(tk) - 1), i -> array_to_string(tk[i:i+2], ' ')))
       ELSE list_distinct([array_to_string(tk, ' ')]) END"""

  /** The md5-hex minhash signature (bit-identical to the DuckDB
    * oracle) via the library API — see [[graft.dedup.MinHashLsh]] and
    * [[graft.sql.Md5MinHash]]. */
  private def signatureDF(s: SparkSession, d: String): DataFrame =
    graft.dedup.MinHashLsh.md5Signature(
      t(s, d, "documents"), "doc_id", "text", MinhashK)

  private val q23 = QueryDef("q23_minhash_signature",
    (s, d) => signatureDF(s, d).orderBy(col("doc_id")),
    Some(s"""WITH tt AS (
               SELECT doc_id, string_split_regex(trim(text), '\\s+') AS tk
               FROM documents),
             ss AS (SELECT doc_id, $shingleSql AS sh FROM tt)
             SELECT doc_id, ${(0 until MinhashK).map(i =>
               s"${minhashSqlExpr(i)} AS h$i").mkString(", ")}
             FROM ss ORDER BY doc_id"""))

  // LSH banding: 4 bands × 2 rows; candidate pairs share ≥1 band.
  // maxBucket=0: the oracle has no bucket cap, so the exact twin
  // keeps none either (the capped production path is q43/MinHashLsh).
  private val q24 = QueryDef("q24_minhash_lsh_pairs",
    (s, d) => graft.dedup.MinHashLsh.bandPairs(signatureDF(s, d), MinhashK, 2,
      (a, b) => md5(concat_ws("_", a, b)), maxBucket = 0, ordered = true),
    Some(s"""WITH tt AS (
               SELECT doc_id, string_split_regex(trim(text), '\\s+') AS tk
               FROM documents),
             ss AS (SELECT doc_id, $shingleSql AS sh FROM tt),
             sig AS (SELECT doc_id, ${(0 until MinhashK).map(i =>
               s"${minhashSqlExpr(i)} AS h$i").mkString(", ")} FROM ss),
             bands AS (${(0 until MinhashK / 2).map(b =>
               s"""SELECT doc_id, $b AS band,
                   md5(CONCAT(h${2 * b}, '_', h${2 * b + 1})) AS bh FROM sig""")
               .mkString(" UNION ALL ")})
             SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS n_bands
             FROM bands a JOIN bands b
               ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id
             GROUP BY 1, 2 ORDER BY d1, d2"""))

  // SimHash (16-bit, md5-based bit votes over distinct tokens) — ONE
  // codegen'd expression (graft.sql.SimHash16), bit-identical to the
  // HOF chain it replaced (pinned by MinHashSigSpec); oracle untouched
  private val q25 = QueryDef("q25_simhash",
    (s, d) => t(s, d, "documents")
      .select(col("doc_id"), graft.sql.SimHash16.sim(col("text")).as("simhash"))
      .orderBy(col("doc_id")),
    Some {
      val bitSql = (0 until 16).map { j =>
        s"""CASE WHEN list_sum(list_transform(tk, x ->
            CASE WHEN (CAST(CONCAT('0x', substr(md5(x), 1, 4)) AS BIGINT) >> $j) & 1 = 1
            THEN 1 ELSE -1 END)) > 0 THEN ${1L << j} ELSE 0 END"""
      }.mkString(" + ")
      s"""SELECT doc_id, CAST($bitSql AS BIGINT) AS simhash FROM (
            SELECT doc_id, list_distinct(string_split_regex(trim(text), '\\s+')) AS tk
            FROM documents) ORDER BY doc_id"""
    })

  // ===================================================================
  // Similarity search over `embeddings`
  // ===================================================================

  /** Cosine similarity: the codegen'd custom expression (one fused
    * loop; see [[graft.sql.CosineSim]]). Mathematically identical to
    * the zip_with+aggregate HOF chain it replaced. */
  private def cosineCol(a: Column, b: Column): Column =
    graft.sql.CosineSim(a, b)

  private val q26 = QueryDef("q26_cosine_vs_query",
    (s, d) => {
      val emb = t(s, d, "embeddings")
        .select(col("vec_id"), col("label"), col("embedding").cast("array<double>").as("e"))
      val q = emb.filter(col("vec_id") === 0).select(col("e").as("qe"))
      emb.crossJoin(broadcast(q))
        .select(col("vec_id"), col("label"),
          (round(cosineCol(col("e"), col("qe")), 3) + lit(0.0)).as("cos"))
        .orderBy(col("vec_id"))
    },
    Some("""SELECT e.vec_id, e.label,
              round(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                    CAST(q.embedding AS DOUBLE[])) /
                (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                    CAST(e.embedding AS DOUBLE[]))) *
                 sqrt(list_dot_product(CAST(q.embedding AS DOUBLE[]),
                    CAST(q.embedding AS DOUBLE[])))), 3) + 0.0 AS cos
            FROM embeddings e, (SELECT embedding FROM embeddings WHERE vec_id = 0) q
            ORDER BY e.vec_id"""))

  // brute-force top-k neighbors of each of the first 5 vectors
  private val q27 = QueryDef("q27_knn_bruteforce",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val emb = t(s, d, "embeddings")
        .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
      val q = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("e").as("qe"))
      val w = Window.partitionBy(col("qid")).orderBy(desc("cos_exact"), col("vec_id"))
      emb.crossJoin(broadcast(q))
        .filter(col("vec_id") =!= col("qid"))
        .withColumn("cos_exact", cosineCol(col("e"), col("qe")))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 10)
        .select(col("qid"), col("vec_id"), col("rk"),
          (round(col("cos_exact"), 3) + lit(0.0)).as("cos"))
        .orderBy(col("qid"), col("rk"))
    },
    Some("""WITH pairs AS (
              SELECT q.vec_id AS qid, e.vec_id AS vec_id,
                list_dot_product(CAST(e.embedding AS DOUBLE[]),
                    CAST(q.embedding AS DOUBLE[])) /
                (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                    CAST(e.embedding AS DOUBLE[]))) *
                 sqrt(list_dot_product(CAST(q.embedding AS DOUBLE[]),
                    CAST(q.embedding AS DOUBLE[])))) AS cos_exact
              FROM embeddings e, embeddings q
              WHERE q.vec_id < 5 AND e.vec_id <> q.vec_id),
            ranked AS (
              SELECT qid, vec_id,
                row_number() OVER (PARTITION BY qid
                  ORDER BY cos_exact DESC, vec_id) AS rk,
                round(cos_exact, 3) + 0.0 AS cos
              FROM pairs)
            SELECT qid, vec_id, rk, cos FROM ranked WHERE rk <= 10
            ORDER BY qid, rk"""))

  // ===================================================================
  // Catalog join (J3 media-ref resolution analog)
  // ===================================================================

  private val q28 = QueryDef("q28_catalog_join",
    (s, d) => {
      val cat = t(s, d, "documents").select(col("source")).distinct()
        .select(col("source"), concat(lit("catalog://"), col("source")).as("resolved"))
      t(s, d, "documents")
        .join(broadcast(cat), Seq("source"))
        .groupBy(col("resolved"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
        .orderBy(col("resolved"))
    },
    // CAST: DuckDB sum(int) is HUGEINT; the driver hashes it differently
    // from Spark's int64 even when values are equal
    Some("""SELECT CONCAT('catalog://', source) AS resolved,
              count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars
            FROM documents GROUP BY source ORDER BY resolved"""))

  // ===================================================================
  // Rows-only queries (not SQL-expressible → weaker rows>0 check)
  // ===================================================================

  /** Synthesize the span table from `documents` deterministically
    * (Catalyst-only), run the full extraction pipeline over it. */
  def documentsAsSpans(s: SparkSession, d: String): DataFrame = {
    val tk = toks(col("text"))
    t(s, d, "documents").select(
      col("doc_id").cast("string").as("doc_id"),
      transform(tk, (x, i) => struct(
        lit("text").as("kind"),
        x.as("text"),
        concat(lit("line://b0/l"), floor(i / 8)).as("media_ref"),
        i.cast("int").as("offset"))).as("spans"))
  }

  private val q29 = QueryDef("q29_span_pipeline",
    (s, d) => {
      val spans = documentsAsSpans(s, d)
      graft.stages.Extraction.pipeline(spans)
        .select(col("doc_id"), size(col("spans")).as("n_spans"),
          col("n_words"), col("n_lines_in"), col("n_lines_out"), col("hit_ratio"))
        .orderBy(col("doc_id"))
    },
    // the full pipeline REPLAYED in DuckDB (replace chain → line
    // grouping → wrap-merge fold → sanitize → dense filter → error
    // lexicon → python-round hit ratio) — see [[PipelineOracleSql]]
    Some(PipelineOracleSql.q29Sql))

  /** Stopword profiles for the q30 language-id heuristic. */
  private val LangProfiles: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "und", "das", "ist"),
    "en" -> Seq("the", "and", "of", "to", "a"),
    "es" -> Seq("el", "la", "los", "de", "que"),
    "fr" -> Seq("le", "la", "et", "les", "des"))

  // stopword-profile language id: distinct-stopword overlap per
  // profile, argmax with the larger language code winning ties
  // (greatest over (score, lang) structs). Deterministic and
  // SQL-expressible → oracled.
  private val q30 = QueryDef("q30_lang_id",
    (s, d) => {
      val tk = array_distinct(toks(col("text")))
      val scores = LangProfiles.map { case (lang, words) =>
        struct(size(array_intersect(tk, lit(words.toArray))).as("score"),
          lit(lang).as("lang"))
      }
      t(s, d, "documents")
        .select(col("doc_id"), col("lang").as("lang_actual"),
          greatest(scores: _*).as("g"))
        .select(col("doc_id"), col("lang_actual"),
          col("g.lang").as("lang_pred"), col("g.score").as("score"))
        .orderBy(col("doc_id"))
    },
    Some {
      def litList(ws: Seq[String]) = ws.map(w => s"'$w'").mkString("[", ", ", "]")
      val prof = LangProfiles.toMap
      s"""SELECT doc_id, lang_actual,
            CASE WHEN s_fr >= s_en AND s_fr >= s_de AND s_fr >= s_es THEN 'fr'
                 WHEN s_es >= s_en AND s_es >= s_de THEN 'es'
                 WHEN s_en >= s_de THEN 'en'
                 ELSE 'de' END AS lang_pred,
            CAST(greatest(s_de, s_en, s_es, s_fr) AS INT) AS score
          FROM (
            SELECT doc_id, lang AS lang_actual,
              len(list_distinct(list_intersect(tk, ${litList(prof("en"))}))) AS s_en,
              len(list_distinct(list_intersect(tk, ${litList(prof("de"))}))) AS s_de,
              len(list_distinct(list_intersect(tk, ${litList(prof("fr"))}))) AS s_fr,
              len(list_distinct(list_intersect(tk, ${litList(prof("es"))}))) AS s_es
            FROM (
              SELECT doc_id, lang,
                list_distinct(string_split_regex(trim(text), '\\s+')) AS tk
              FROM documents))
          ORDER BY doc_id"""
    })

  /** Deterministic pseudo-random hyperplanes shared by q31/q34 — fixed
    * literals, so the LSH signature is SQL-expressible in the oracle. */
  private val AnnDims = 64
  private val AnnPlanes = 12
  private lazy val annPlanes: IndexedSeq[IndexedSeq[Double]] =
    (0 until AnnPlanes).map { p =>
      (0 until AnnDims).map { i =>
        graft.gen.CorpusGen.mix64(p.toLong * 1024 + i).toDouble / Long.MaxValue.toDouble
      }
    }
  private def annBucketCol(e: Column): Column =
    (0 until AnnPlanes).map { p =>
      val dot = aggregate(zip_with(e, typedLit(annPlanes(p)), (x, y) => x * y),
        lit(0.0), _ + _)
      when(dot > 0, lit(1L << p)).otherwise(0L)
    }.reduce(_ + _)
  /** The same 12 sign tests as DuckDB SQL over literal plane vectors
    * (17 significant digits round-trip a double exactly; Locale.ROOT
    * formatting — the f"" interpolator would emit comma decimals on
    * de/fr-locale JVMs and break the oracle SQL). */
  private lazy val annBucketSql: String =
    (0 until AnnPlanes).map { p =>
      val lits = annPlanes(p)
        .map(v => String.format(java.util.Locale.ROOT, "%.17g", Double.box(v)))
        .mkString("[", ", ", "]")
      s"(CASE WHEN list_dot_product(CAST(embedding AS DOUBLE[]), $lits) > 0 THEN ${1L << p} ELSE 0 END)"
    }.mkString(" + ")

  private val q31 = QueryDef("q31_ann_lsh_buckets",
    (s, d) => t(s, d, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
      .withColumn("bucket", annBucketCol(col("e")))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_vecs"), min(col("vec_id")).as("min_vec"))
      .orderBy(col("bucket")),
    Some(s"""SELECT CAST($annBucketSql AS BIGINT) AS bucket,
               count(*) AS n_vecs, min(vec_id) AS min_vec
             FROM embeddings GROUP BY 1 ORDER BY 1"""))

  private val q32 = QueryDef("q32_html_extract",
    (s, d) => {
      // deterministic HTML synthesized from documents (boilerplate nav +
      // paragraphs + an image), run through the HTML main-content
      // extractor and the span pipeline counters (rows-only)
      import s.implicits._
      val html = t(s, d, "documents").select(
        col("doc_id").cast("string").as("doc_id"),
        concat(
          lit("<html><body><nav><a href='/'>home</a> <a href='/a'>about</a>" +
            " <a href='/c'>contact</a></nav><article><p>"),
          replace(col("text"), lit(" merge "), lit("</p><p>")),
          lit("</p><img src='pic.png'/></article>" +
            "<footer>copyright junk imprint</footer></body></html>")).as("html"))
        .as[(String, String)]
      graft.parse.HtmlExtract.extractDocs(html).toDF()
        .select(col("doc_id"),
          size(col("spans")).as("n_spans"),
          size(filter(col("spans"), x => x.getField("kind") === "media")).as("n_media"))
        .orderBy(col("doc_id"))
    },
    // freestanding oracle: the template is fixed, so the extractor's
    // output is predictable from the raw text — nav/footer subtrees
    // drop, each ' merge '-separated segment is its own <p> block kept
    // iff ≥3 whitespace tokens (minWords, zero link density), the one
    // <img> is always a media span
    Some("""WITH segs AS (
              SELECT CAST(doc_id AS VARCHAR) AS doc_id,
                list_transform(string_split(text, ' merge '),
                  s -> len(list_filter(string_split_regex(trim(s), '\s+'),
                             w -> w <> ''))) AS cnts
              FROM documents)
            SELECT doc_id,
              CAST(coalesce(list_sum(list_filter(cnts, c -> c >= 3)), 0)
                   + 1 AS INT) AS n_spans,
              CAST(1 AS INT) AS n_media
            FROM segs ORDER BY doc_id"""))

  /** q33 block-size cap (the q22 pattern on the `label` key): a label
    * block larger than this is dropped instead of expanded
    * quadratically — bounded blocks stay exact, a hot label at 100×
    * never goes O(n²) (the unbounded scale path is LSH bucketing,
    * q31/q44). 256 keeps every block at sf0.01 (max 59) and sf0.1
    * (max 218) while bounding any block to ≤32k pairs. */
  private val NeardupLabelCap = 256
  // embedding-cosine near-dup pairs within a label block (exact,
  // oracle-checked; the LSH-bucketed scale path is q31/q34)
  private val q33 = QueryDef("q33_embed_neardup",
    (s, d) => {
      val emb = t(s, d, "embeddings")
        .select(col("vec_id"), col("label"), col("embedding").cast("array<double>").as("e"))
      // bounded blocks only: broadcast the (tiny) blocklist of key counts
      val okLabels = emb.groupBy(col("label"))
        .agg(count(lit(1)).as("_bn"))
        .filter(col("_bn") <= NeardupLabelCap)
        .select(col("label"))
      val capped = emb.join(broadcast(okLabels), Seq("label"))
      val a = capped.select(col("vec_id").as("v1"), col("label"), col("e").as("e1"))
      val b = capped.select(col("vec_id").as("v2"), col("label"), col("e").as("e2"))
      a.join(b, Seq("label")).filter(col("v1") < col("v2"))
        .withColumn("cos", cosineCol(col("e1"), col("e2")))
        .filter(col("cos") >= 0.3)
        .select(col("v1"), col("v2"), col("label"),
          (round(col("cos"), 3) + lit(0.0)).as("cos_r"))
        .orderBy(col("v1"), col("v2"))
    },
    Some(s"""WITH ok AS (
              SELECT label FROM embeddings GROUP BY 1
              HAVING count(*) <= $NeardupLabelCap),
            e AS (SELECT embeddings.* FROM embeddings JOIN ok USING (label))
            SELECT a.vec_id AS v1, b.vec_id AS v2, a.label AS label,
              round(list_dot_product(CAST(a.embedding AS DOUBLE[]),
                    CAST(b.embedding AS DOUBLE[])) /
                (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]),
                    CAST(a.embedding AS DOUBLE[]))) *
                 sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]),
                    CAST(b.embedding AS DOUBLE[])))), 3) + 0.0 AS cos_r
            FROM e a JOIN e b
              ON a.label = b.label AND a.vec_id < b.vec_id
            WHERE list_dot_product(CAST(a.embedding AS DOUBLE[]),
                    CAST(b.embedding AS DOUBLE[])) /
                (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]),
                    CAST(a.embedding AS DOUBLE[]))) *
                 sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]),
                    CAST(b.embedding AS DOUBLE[])))) >= 0.3
            ORDER BY v1, v2"""))

  // ANN query through the hyperplane-LSH buckets: query vector's
  // bucket → candidates → exact cosine top-5. The planes are fixed
  // literals and ranking uses the ROUNDED cosine with vec_id
  // tie-break, so the "approximate" search is bit-deterministic and
  // fully oracled (the single-bucket special case of q44's
  // multi-probe).
  private val q34 = QueryDef("q34_ann_query",
    (s, d) => {
      val emb = t(s, d, "embeddings")
        .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
        .withColumn("bucket", annBucketCol(col("e")))
      val q = emb.filter(col("vec_id") === 0)
        .select(col("bucket"), col("e").as("qe"))
      emb.join(broadcast(q), Seq("bucket"))
        .filter(col("vec_id") =!= 0)
        .withColumn("cos", round(cosineCol(col("e"), col("qe")), 3) + lit(0.0))
        .orderBy(desc("cos"), col("vec_id"))
        .select(col("vec_id"), col("cos"))
        .limit(5)
    },
    Some(s"""WITH b AS (
               SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
                 CAST($annBucketSql AS BIGINT) AS bucket
               FROM embeddings),
             q AS (SELECT bucket, e AS qe FROM b WHERE vec_id = 0)
             SELECT vec_id, cos FROM (
               SELECT b.vec_id,
                 round(list_dot_product(b.e, qe) /
                   (sqrt(list_dot_product(b.e, b.e)) * sqrt(list_dot_product(qe, qe))), 3)
                   + 0.0 AS cos,
                 row_number() OVER (ORDER BY
                   round(list_dot_product(b.e, qe) /
                     (sqrt(list_dot_product(b.e, b.e)) * sqrt(list_dot_product(qe, qe))), 3)
                     DESC, b.vec_id) AS rk
               FROM b JOIN q USING (bucket)
               WHERE b.vec_id <> 0) WHERE rk <= 5
             ORDER BY cos DESC, vec_id"""))

  // multimodal: media refs → synthetic binary payloads → pooled
  // decode → typed metadata aggregation. Image payloads are REAL
  // BMP/PNG/JPEG bytes whose dimensions come from the actual header
  // parse (Media.HeaderDecoder); only video/audio stay on the
  // documented stub path (rows-only: mixed stub content)
  private val q35 = QueryDef("q35_media_decode",
    (s, d) => {
      val refs = t(s, d, "documents")
        .select(concat(lit("media://doc"), col("doc_id"), lit("/0")).as("media_ref"))
      val meta = graft.multimodal.Media.decodeMeta(
        graft.multimodal.Media.synthMediaReal(s, refs))
      meta.toDF()
        .groupBy(col("mime"))
        .agg(count(lit(1)).as("n"),
          round(avg(col("width")), 1).as("avg_w"),
          sum(col("n_frames")).as("total_frames"))
        .orderBy(col("mime"))
    },
    // freestanding oracle: every byte of the synthetic media is a
    // deterministic splitmix64 function of the ref, and the decoded
    // dimensions are exactly the synthesized header fields — so DuckDB
    // recomputes the same hashes ([[WrapSql]]) instead of pinning
    // values. Image branch: header dims = 64 + floorMod(mix64(h+11),
    // 1984). Stub branch (video/audio): re-hash the 32 payload bytes
    // (sign-extended like Scala's Byte→Long) and derive w/frames the
    // way StubDecoder does.
    Some {
      import WrapSql._
      s"""WITH refs AS (
            SELECT 'media://doc' || CAST(doc_id AS VARCHAR) || '/0' AS ref
            FROM documents),
          hh AS (SELECT ref, $hashStrOfRef AS h FROM refs),
          kk AS (SELECT ref, h,
                   ((${signed("h")} % 5) + 5) % 5 AS kind FROM hh),
          img AS (
            SELECT CASE kind WHEN 0 THEN 'image/bmp' WHEN 1 THEN 'image/png'
                     ELSE 'image/jpeg' END AS mime,
              64 + ((${signed(mix64(s"(h + 11) % $M"))} % 1984) + 1984) % 1984
                AS width,
              1 AS n_frames
            FROM kk WHERE kind <= 2),
          stub0 AS (
            SELECT ref, kind,
              list_reduce(list_prepend(CAST(11400714819323198485 AS HUGEINT),
                list_transform(range(0, 32), j ->
                  CAST(${sextByte(mix64(
                    s"CASE WHEN kind = 3 THEN (h + j) % $M ELSE (h + ($M - j)) % $M END"))}
                    AS HUGEINT))),
                (a, b) -> ${mix64("xor(a, b)")}) AS h2
            FROM kk WHERE kind >= 3),
          stub AS (
            SELECT CASE WHEN kind = 3 THEN 'video/mp4' ELSE 'audio/wav' END
                AS mime,
              64 + abs(${signed("h2")}) % 1984 AS width,
              CASE WHEN kind = 3
                THEN 1 + CAST(abs(${signed(mix64(s"(h2 + 2) % $M"))}) % 300
                         AS INT)
                ELSE 1 END AS n_frames
            FROM stub0),
          uni AS (SELECT * FROM img UNION ALL SELECT * FROM stub)
          SELECT mime, CAST(count(*) AS BIGINT) AS n,
            round(avg(width), 1) AS avg_w,
            CAST(sum(n_frames) AS BIGINT) AS total_frames
          FROM uni GROUP BY mime ORDER BY mime"""
    })

  // winnowing rolling-hash fingerprints (Schleimer et al.): shared-
  // fingerprint near-dup candidates (rows-only: engine-defined hash)
  private val q36 = QueryDef("q36_winnow_fingerprint",
    (s, d) => {
      val fps = t(s, d, "documents")
        .select(col("doc_id"),
          graft.sql.WinnowFps.fps(col("text"), 5, 4).as("fps"))
      fps.select(col("doc_id"), explode(col("fps")).as("fp"))
        .groupBy(col("fp"))
        .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
        // stop-fingerprint cap: a fingerprint shared by hundreds of
        // docs carries no near-dup signal and would blow up the pair
        // generation quadratically — drop it (standard LSH hygiene)
        .filter(size(col("ids")) > 1 && size(col("ids")) <= 64)
        .select(graft.dedup.MinHashLsh.pairsOf(col("ids")).as("p"))
        .groupBy(col("p.d1").as("d1"), col("p.d2").as("d2"))
        .agg(count(lit(1)).as("shared_fps"))
        .filter(col("shared_fps") >= 2)
        .orderBy(desc("shared_fps"), col("d1"), col("d2"))
        .limit(200)
    },
    // freestanding oracle on the ENGINE's hash: the Karp–Rabin
    // recurrence is algebraically the plain base-1000003 polynomial
    // mod 2^64, which DuckDB evaluates exactly in HUGEINT
    // ([[WrapSql.krGram]]); window-min/dedup/pairing mirror q60's
    // relational winnow shape. The (shared DESC, d1, d2) sort is a
    // total order, so the LIMIT is deterministic on both engines.
    Some(s"""WITH base AS (
               SELECT doc_id, text, length(text) - 5 + 1 AS n
               FROM documents WHERE length(text) >= 5),
             g AS (SELECT doc_id, n, text, unnest(range(1, n + 1)) AS i
                   FROM base),
             h AS (SELECT doc_id, n, i, ${WrapSql.krGram("i", 5)} AS h
                   FROM g),
             w AS (SELECT doc_id, n, i,
                 min(h) OVER (PARTITION BY doc_id ORDER BY i
                   ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp
               FROM h),
             wf AS (SELECT DISTINCT doc_id, fp FROM w
                    WHERE i <= greatest(n - 4 + 1, 1)),
             byfp AS (SELECT fp, list_sort(list(doc_id)) AS ids
                      FROM wf GROUP BY fp),
             ok AS (SELECT ids FROM byfp
                    WHERE len(ids) > 1 AND len(ids) <= 64),
             e1 AS (SELECT ids, unnest(range(1, len(ids) + 1)) AS i
                    FROM ok),
             e2 AS (SELECT ids, i, unnest(range(1, len(ids) + 1)) AS j
                    FROM e1),
             p AS (SELECT ids[CAST(i AS INT)] AS d1,
                     ids[CAST(j AS INT)] AS d2
                   FROM e2 WHERE j > i),
             cnt AS (SELECT d1, d2, CAST(count(*) AS BIGINT) AS shared_fps
                     FROM p GROUP BY d1, d2 HAVING count(*) >= 2)
           SELECT d1, d2, shared_fps FROM cnt
           ORDER BY shared_fps DESC, d1, d2 LIMIT 200"""))

  // BPE-ish pretokenization (GPT-2-style regex) token counting — the
  // second tokenizer flavor next to whitespace counting (q16)
  private val BpePattern =
    """'s|'t|'re|'ve|'m|'ll|'d| ?[\p{L}]+| ?[\p{N}]+| ?[^\s\p{L}\p{N}]+|\s+"""
  private val q37 = QueryDef("q37_bpe_token_count",
    (s, d) => t(s, d, "documents")
      .select(col("doc_id"),
        size(regexp_extract_all(col("text"), lit(BpePattern), lit(0))).as("n_bpe"),
        size(toks(col("text"))).as("n_ws"))
      .orderBy(col("doc_id")),
    Some(s"""SELECT doc_id,
              len(regexp_extract_all(text, '${BpePattern.replace("'", "''")}')) AS n_bpe,
              len(string_split_regex(trim(text), '\\s+')) AS n_ws
            FROM documents ORDER BY doc_id"""))

  // IVF approximate nearest neighbor with a deterministic MEDOID coarse
  // quantizer (cells = the vectors with vec_id 1..8): assignment,
  // probing and search are pure Catalyst — no model fit and no driver
  // round-trip inside the query, which is what the 10^9-vector
  // lifecycle demands (the trained-and-persisted k-means variant of the
  // same architecture lives in graft.ml.IvfIndex). Fully oracled:
  // ranking uses the ROUNDED cosine with vec_id tie-break so both
  // engines agree bit-for-bit.
  private val IvfCells = 8
  private val IvfProbe = 3
  private val q38 = QueryDef("q38_ann_ivf",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val emb = t(s, d, "embeddings")
        .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
      val seeds = emb.filter(col("vec_id").between(1, IvfCells))
        .select(col("vec_id").as("cell"), col("e").as("ce"))
      // coarse assignment: argmax cosine over the k broadcast seeds,
      // ties to the smallest cell — one map-side-combined aggregate
      val scored = emb.crossJoin(broadcast(seeds))
        .withColumn("cs", cosineCol(col("e"), col("ce")))
      val assigned = scored
        .groupBy(col("vec_id"))
        .agg(max_by(col("cell"), struct(col("cs"), -col("cell"))).as("cell"),
          first(col("e")).as("e"))
      // the query (vec 0) probes its 3 nearest cells
      val probe = scored.filter(col("vec_id") === 0)
        .withColumn("rk", row_number().over(
          Window.partitionBy(col("vec_id")).orderBy(desc("cs"), col("cell"))))
        .filter(col("rk") <= IvfProbe)
        .select(col("cell"))
      val q = emb.filter(col("vec_id") === 0).select(col("e").as("qe"))
      assigned.join(broadcast(probe), Seq("cell"))
        .filter(col("vec_id") =!= 0)
        .crossJoin(broadcast(q))
        .withColumn("cos", round(cosineCol(col("e"), col("qe")), 3) + lit(0.0))
        .orderBy(desc("cos"), col("vec_id"))
        .select(col("vec_id"), col("cell"), col("cos"))
        .limit(10)
    },
    Some(s"""WITH emb AS (
               SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
             seeds AS (
               SELECT vec_id AS cell, e AS ce FROM emb
               WHERE vec_id BETWEEN 1 AND $IvfCells),
             scored AS (
               SELECT emb.vec_id, seeds.cell, emb.e,
                 list_dot_product(e, ce) /
                   (sqrt(list_dot_product(e, e)) * sqrt(list_dot_product(ce, ce))) AS cs
               FROM emb, seeds),
             assigned AS (
               SELECT vec_id, cell, e FROM (
                 SELECT vec_id, cell, e,
                   row_number() OVER (PARTITION BY vec_id ORDER BY cs DESC, cell) AS rk
                 FROM scored) WHERE rk = 1),
             probe AS (
               SELECT cell FROM (
                 SELECT cell,
                   row_number() OVER (ORDER BY cs DESC, cell) AS rk
                 FROM scored WHERE vec_id = 0) WHERE rk <= $IvfProbe),
             q AS (SELECT e AS qe FROM emb WHERE vec_id = 0)
             SELECT vec_id, cell, cos FROM (
               SELECT a.vec_id, a.cell,
                 round(list_dot_product(a.e, qe) /
                   (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(qe, qe))), 3)
                   + 0.0 AS cos,
                 row_number() OVER (ORDER BY
                   round(list_dot_product(a.e, qe) /
                     (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(qe, qe))), 3)
                     DESC, a.vec_id) AS rk
               FROM assigned a JOIN probe USING (cell), q
               WHERE a.vec_id <> 0) WHERE rk <= 10
             ORDER BY cos DESC, vec_id"""))

  // grouping sets / rollup (free from Catalyst; subtotal rows)
  private val q39 = QueryDef("q39_rollup",
    (s, d) => t(s, d, "lineitem")
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 2).as("sum_qty"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first),
    Some("""SELECT l_returnflag, l_linestatus, count(*) AS n,
              round(sum(l_quantity), 2) AS sum_qty
            FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
            ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST"""))

  // exact percentiles (linear interpolation on both engines)
  private val q40 = QueryDef("q40_percentiles",
    (s, d) => {
      // exact percentile WITHOUT the `percentile()` ImperativeAggregate:
      // that aggregate buffers an OpenHashMap of every distinct value
      // per group (~198k boxed doubles per flag here), serializes the
      // maps through the exchange, and sorts on merge — all outside
      // codegen. The same exact semantics relationally: one sort by
      // (flag, value) + row_number, per-flag n/min/max from an
      // unbounded window over the SAME exchange, then pick the 4
      // bracket rows and interpolate. The arithmetic replays
      // Percentile.getPercentile exactly — pos = p * (n-1) in double;
      // early return when floor==ceil OR equal bracket values; else
      // (ceil(pos)-pos)*lo + (pos-floor(pos))*hi, each product rounded
      // then summed, no FMA on either side — so results are
      // bit-identical (q40 oracle replays this same formula; rewrite
      // verified value-equal to the old aggregate at sf0.01/sf0.1).
      import org.apache.spark.sql.expressions.Window
      val wOrd = Window.partitionBy(col("l_returnflag"))
        .orderBy(col("l_extendedprice"))
      val li = t(s, d, "lineitem")
        .select(col("l_returnflag"), col("l_extendedprice"))
      // n/min/max from a tiny broadcast aggregate, NOT an
      // unbounded-frame window: the window frame would buffer every
      // partition's rows (the streaming row_number frame does not)
      val stats = li.groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          min(col("l_extendedprice")).as("vmin"),
          max(col("l_extendedprice")).as("vmax"))
      val ranked = li
        .select(col("l_returnflag"), col("l_extendedprice"),
          (row_number().over(wOrd).cast("bigint") - 1).as("i"))
        .join(broadcast(stats), Seq("l_returnflag"))
        .withColumn("pos50", lit(0.5) * (col("n") - 1).cast("double"))
        .withColumn("pos90", lit(0.9) * (col("n") - 1).cast("double"))
      def interp(posC: Column, lo: Column, hi: Column): Column =
        when((ceil(posC) === floor(posC)) || (lo === hi), lo)
          .otherwise((ceil(posC) - posC) * lo + (posC - floor(posC)) * hi)
      ranked
        .filter(col("i") === floor(col("pos50")) || col("i") === ceil(col("pos50")) ||
          col("i") === floor(col("pos90")) || col("i") === ceil(col("pos90")))
        .groupBy(col("l_returnflag"))
        .agg(first(col("pos50")).as("pos50"), first(col("pos90")).as("pos90"),
          first(col("vmin")).as("vmin"), first(col("vmax")).as("vmax"),
          max(when(col("i") === floor(col("pos50")), col("l_extendedprice"))).as("lo50"),
          max(when(col("i") === ceil(col("pos50")), col("l_extendedprice"))).as("hi50"),
          max(when(col("i") === floor(col("pos90")), col("l_extendedprice"))).as("lo90"),
          max(when(col("i") === ceil(col("pos90")), col("l_extendedprice"))).as("hi90"))
        .select(col("l_returnflag"),
          round(interp(col("pos50"), col("lo50"), col("hi50")), 2).as("p50"),
          round(interp(col("pos90"), col("lo90"), col("hi90")), 2).as("p90"),
          round(col("vmin"), 2).as("lo"),
          round(col("vmax"), 2).as("hi"))
        .orderBy(col("l_returnflag"))
    },
    // NOT quantile_cont: DuckDB's bare literals make the interpolation
    // run in DECIMAL — p50 of an even-count group of 2-decimal values
    // is an exact half-cent STRUCTURALLY (decimal 52724.245 → .25),
    // while Spark's PercentileBase computes the same point in double
    // (52724.244999999995 → .24). The oracle replays Spark's exact
    // arithmetic — pos = p*(n-1); (ceil(pos)-pos)*v_lo +
    // (pos-floor(pos))*v_hi; early return on equal brackets — with
    // every operand cast to DOUBLE, so both engines hold the SAME
    // double — and then emulates Spark's round, which HALF_UPs the
    // SHORTEST DECIMAL REPR (BigDecimal.valueOf: "95471.295" → .30 but
    // "52724.244999999995" → .24), where DuckDB's round multiplies by
    // 10^s in double first (the tie at x*100 breaks the other way).
    // CAST(double AS VARCHAR) is DuckDB's shortest repr; rounding that
    // as DECIMAL reproduces Spark bit-for-bit. Caught at sf0.001.
    Some("""WITH ranked AS (
              SELECT l_returnflag, l_extendedprice AS v,
                row_number() OVER (PARTITION BY l_returnflag
                  ORDER BY l_extendedprice) - 1 AS i,
                count(*) OVER (PARTITION BY l_returnflag) AS n
              FROM lineitem),
            pos AS (
              SELECT l_returnflag, p, p * CAST(n - 1 AS DOUBLE) AS pos
              FROM (SELECT DISTINCT l_returnflag, n FROM ranked)
              CROSS JOIN (SELECT unnest([0.5::DOUBLE, 0.9::DOUBLE]) AS p)),
            interp AS (
              SELECT pos.l_returnflag, pos.p,
                CASE WHEN ceil(pos.pos) = floor(pos.pos) OR hi.v = lo.v
                     THEN lo.v
                     ELSE (ceil(pos.pos) - pos.pos) * lo.v
                        + (pos.pos - floor(pos.pos)) * hi.v
                END AS val
              FROM pos
              JOIN ranked lo ON lo.l_returnflag = pos.l_returnflag
                AND lo.i = CAST(floor(pos.pos) AS BIGINT)
              JOIN ranked hi ON hi.l_returnflag = pos.l_returnflag
                AND hi.i = CAST(ceil(pos.pos) AS BIGINT)),
            pcts AS (
              SELECT l_returnflag,
                CAST(round(CAST(CAST(max(CASE WHEN p = 0.5 THEN val END)
                  AS VARCHAR) AS DECIMAL(38,18)), 2) AS DOUBLE) AS p50,
                CAST(round(CAST(CAST(max(CASE WHEN p = 0.9 THEN val END)
                  AS VARCHAR) AS DECIMAL(38,18)), 2) AS DOUBLE) AS p90
              FROM interp GROUP BY 1)
            SELECT r.l_returnflag, pcts.p50, pcts.p90,
              CAST(round(CAST(CAST(min(r.v) AS VARCHAR)
                AS DECIMAL(38,18)), 2) AS DOUBLE) AS lo,
              CAST(round(CAST(CAST(max(r.v) AS VARCHAR)
                AS DECIMAL(38,18)), 2) AS DOUBLE) AS hi
            FROM ranked r JOIN pcts USING (l_returnflag)
            GROUP BY r.l_returnflag, pcts.p50, pcts.p90
            ORDER BY r.l_returnflag"""))

  // the PRODUCTION minhash: one codegen'd expression computes the whole
  // signature (tokenize → 3-gram shingle → 8 seeded xxhash64 minima,
  // single pass — see graft.sql.MinHashSig; the interpreted HOF chain
  // this replaced measured 4.4 s at sf0.1). Engine-defined hash →
  // rows-only; correctness of the banding shape is carried by the
  // oracled md5 twin (q24).
  private val q43 = QueryDef("q43_minhash_xxhash_pairs",
    (s, d) => graft.dedup.MinHashLsh.bandPairs(
      graft.dedup.MinHashLsh.xxhashSignature(
        t(s, d, "documents"), "doc_id", "text", MinhashK),
      MinhashK, 2, (a, b) => xxhash64(a, b)),
    // the PRODUCTION hash path is oracled too: DuckDB recomputes the
    // full XXH64 (stripes/merges/tails/avalanche) in HUGEINT mod-2^64
    // arithmetic — see [[XxHashOracleSql]] — so the engine-defined
    // signature is no longer trust-me rows-only
    Some(XxHashOracleSql.q43Sql))

  // the SCALE path next to exact q40: approx_percentile keeps a bounded
  // sketch per group instead of buffering every value (exact percentile
  // is a per-task OOM at 10^8 values/group). The sketch value itself is
  // engine-defined (merge-order dependent), so instead of hashing it the
  // query VERIFIES ITS PUBLISHED CONTRACT: the returned element's rank
  // interval [count(<x)+1, count(<=x)] must intersect the target rank
  // ± ε·n (ε = 1/accuracy, +2 slack for the target-rank rounding
  // convention). The oracle recomputes group keys and exact counts and
  // pins the contract booleans TRUE — a broken sketch hash-mismatches.
  // The rank counts are a second scan-aggregate against the broadcast
  // group table (no sort, no per-group buffering): oracle scaffolding
  // with the same scale shape as the sketch pass itself.
  private val q42 = QueryDef("q42_percentiles_approx",
    (s, d) => {
      val acc = 10000
      val li = t(s, d, "lineitem")
        .select(col("l_returnflag"), col("l_extendedprice"))
      val sk = li.groupBy(col("l_returnflag"))
        .agg(expr(s"approx_percentile(l_extendedprice, 0.5, $acc)").as("ap50"),
          expr(s"approx_percentile(l_extendedprice, 0.9, $acc)").as("ap90"),
          count(lit(1)).as("n"))
      val eps = lit(1.0 / acc)
      def rankOk(p: Double, lt: Column, le: Column): Column = {
        val target = lit(p) * col("n")
        val margin = eps * col("n") + lit(2.0)
        (lt + lit(1.0) <= target + margin) && (le >= target - margin)
      }
      li.join(broadcast(sk), Seq("l_returnflag"))
        .groupBy(col("l_returnflag"))
        .agg(first(col("n")).as("n"),
          sum(when(col("l_extendedprice") < col("ap50"), 1L).otherwise(0L)).as("lt50"),
          sum(when(col("l_extendedprice") <= col("ap50"), 1L).otherwise(0L)).as("le50"),
          sum(when(col("l_extendedprice") < col("ap90"), 1L).otherwise(0L)).as("lt90"),
          sum(when(col("l_extendedprice") <= col("ap90"), 1L).otherwise(0L)).as("le90"))
        .select(col("l_returnflag"), col("n"),
          rankOk(0.5, col("lt50").cast("double"), col("le50").cast("double")).as("p50_ok"),
          rankOk(0.9, col("lt90").cast("double"), col("le90").cast("double")).as("p90_ok"))
        .orderBy(col("l_returnflag"))
    },
    Some("""SELECT l_returnflag, count(*) AS n, TRUE AS p50_ok, TRUE AS p90_ok
            FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  // scalar string-function battery (C5/C7-adjacent surface)
  private val q41 = QueryDef("q41_string_funcs",
    (s, d) => t(s, d, "part")
      .select(col("p_partkey"),
        upper(col("p_brand")).as("brand_u"),
        substring(col("p_name"), 1, 8).as("name8"),
        lpad(col("p_size").cast("string"), 4, "0").as("size_pad"),
        levenshtein(col("p_brand"), col("p_type")).as("lev"),
        length(col("p_name")).as("name_len"))
      .orderBy(col("p_partkey")),
    Some("""SELECT p_partkey, upper(p_brand) AS brand_u,
              substr(p_name, 1, 8) AS name8,
              lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_pad,
              levenshtein(p_brand, p_type) AS lev,
              length(p_name) AS name_len
            FROM part ORDER BY p_partkey"""))

  // multi-probe hyperplane ANN: probe the query's bucket plus every
  // neighbor within Hamming distance 2 (flip ≤2 hyperplane signs; 79
  // buckets of 4096) — the standard recall booster that keeps LSH
  // usable at low bucket occupancy without widening to all-pairs.
  // Deterministic planes → oracled.
  private lazy val ProbeMasks: Seq[Long] =
    0L +: ((0 until AnnPlanes).map(p => 1L << p) ++
      (for (i <- 0 until AnnPlanes; j <- i + 1 until AnnPlanes)
        yield (1L << i) | (1L << j)))
  private val q44 = QueryDef("q44_ann_multiprobe",
    (s, d) => {
      val emb = t(s, d, "embeddings")
        .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
        .withColumn("bucket", annBucketCol(col("e")))
      val masks = ProbeMasks
      val probes = emb.filter(col("vec_id") === 0)
        .select(explode(array(masks.map(m =>
          col("bucket").bitwiseXOR(lit(m))): _*)).as("bucket"))
        .distinct()
      val q = emb.filter(col("vec_id") === 0).select(col("e").as("qe"))
      emb.join(broadcast(probes), Seq("bucket"))
        .filter(col("vec_id") =!= 0)
        .crossJoin(broadcast(q))
        .withColumn("cos", round(cosineCol(col("e"), col("qe")), 3) + lit(0.0))
        .orderBy(desc("cos"), col("vec_id"))
        .select(col("vec_id"), col("bucket"), col("cos"))
        .limit(5)
    },
    Some(s"""WITH b AS (
               SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
                 CAST($annBucketSql AS BIGINT) AS bucket
               FROM embeddings),
             probes AS (
               SELECT DISTINCT xor(bucket, m.m) AS bucket
               FROM b, (SELECT unnest([${ProbeMasks
                 .mkString("CAST(", " AS BIGINT), CAST(", " AS BIGINT)")}]) AS m) m
               WHERE vec_id = 0),
             q AS (SELECT e AS qe FROM b WHERE vec_id = 0)
             SELECT vec_id, bucket, cos FROM (
               SELECT b.vec_id, b.bucket,
                 round(list_dot_product(b.e, qe) /
                   (sqrt(list_dot_product(b.e, b.e)) * sqrt(list_dot_product(qe, qe))), 3)
                   + 0.0 AS cos,
                 row_number() OVER (ORDER BY
                   round(list_dot_product(b.e, qe) /
                     (sqrt(list_dot_product(b.e, b.e)) * sqrt(list_dot_product(qe, qe))), 3)
                     DESC, b.vec_id) AS rk
               FROM b JOIN probes USING (bucket), q
               WHERE b.vec_id <> 0) WHERE rk <= 5
             ORDER BY cos DESC, vec_id"""))

  /** Stopword list for the q45 quality signals (subset of the German
    * function-word lexicon — fixed, engine-defined). */
  private val QualityStopwords = Seq("der", "die", "und", "das", "ist",
    "the", "and", "of", "le", "la", "el", "de")

  // text-quality signal battery (training-data curation: length,
  // token shape, stopword density, digit density) — all deterministic
  // column math → oracled
  private val q45 = QueryDef("q45_quality_signals",
    (s, d) => {
      val tk = toks(col("text"))
      val swLit = lit(QualityStopwords.toArray)
      t(s, d, "documents")
        .select(col("doc_id"), tk.as("tk"), length(col("text")).as("len"))
        .select(col("doc_id"), col("len"),
          size(col("tk")).as("n_tokens"),
          (round(aggregate(col("tk"), lit(0), (acc, x) => acc + length(x))
            .cast("double") / size(col("tk")), 3) + lit(0.0)).as("mean_tok_len"),
          (round(size(filter(col("tk"), x => array_contains(swLit, x)))
            .cast("double") / size(col("tk")), 3) + lit(0.0)).as("stopword_ratio"),
          (round(size(filter(col("tk"), x => x.rlike("[0-9]")))
            .cast("double") / size(col("tk")), 3) + lit(0.0)).as("digit_ratio"))
        .orderBy(col("doc_id"))
    },
    Some(s"""SELECT doc_id, len, n_tokens,
              round(CAST(list_sum(list_transform(tk, x -> length(x))) AS DOUBLE)
                / n_tokens, 3) + 0.0 AS mean_tok_len,
              round(CAST(len(list_filter(tk, x -> list_contains(
                [${QualityStopwords.map(w => s"'$w'").mkString(", ")}], x))) AS DOUBLE)
                / n_tokens, 3) + 0.0 AS stopword_ratio,
              round(CAST(len(list_filter(tk, x -> regexp_matches(x, '[0-9]'))) AS DOUBLE)
                / n_tokens, 3) + 0.0 AS digit_ratio
            FROM (
              SELECT doc_id, length(text) AS len,
                string_split_regex(trim(text), '\\s+') AS tk,
                len(string_split_regex(trim(text), '\\s+')) AS n_tokens
              FROM documents)
            ORDER BY doc_id"""))

  // benchmark decontamination: flag corpus docs sharing word 3-grams
  // with a benchmark set (docs 0-4 stand in for the eval set — derived
  // deterministically from the table itself). The benchmark shingle
  // set is SMALL by construction → broadcast semi-structure join, one
  // narrow aggregation; the corpus side never self-joins.
  private val q46 = QueryDef("q46_decontamination",
    (s, d) => {
      val docsSh = t(s, d, "documents")
        .select(col("doc_id"),
          explode(graft.sql.Shingles.of(col("text"), 3)).as("s"))
      val bench = docsSh.filter(col("doc_id") < 5).select(col("s")).distinct()
      docsSh.filter(col("doc_id") >= 5)
        .join(broadcast(bench), Seq("s"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_shared"))
        .withColumn("contaminated", (col("n_shared") >= 3).cast("int"))
        .orderBy(col("doc_id"))
    },
    Some("""WITH tk AS (
              SELECT doc_id, string_split_regex(trim(text), '\s+') AS tk
              FROM documents),
            sh AS (
              SELECT doc_id, unnest(CASE WHEN len(tk) >= 3
                THEN list_transform(range(1, len(tk) - 1),
                  i -> array_to_string(tk[i:i+2], ' '))
                ELSE [array_to_string(tk, ' ')] END) AS s
              FROM tk),
            bench AS (SELECT DISTINCT s FROM sh WHERE doc_id < 5)
            SELECT a.doc_id, count(DISTINCT a.s) AS n_shared,
              CAST(count(DISTINCT a.s) >= 3 AS INT) AS contaminated
            FROM sh a JOIN bench b USING (s)
            WHERE a.doc_id >= 5
            GROUP BY a.doc_id ORDER BY a.doc_id"""))

  // PII scrubbing: redact emails and long digit runs, report per-doc
  // redaction counts and the digest of the scrubbed text. The corpus
  // has no PII, so deterministic PII is appended from the table itself
  // — the redaction logic is what's under test, on both engines.
  private val EmailPat = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val DigitRunPat = "[0-9]{7,}"
  private val q47 = QueryDef("q47_pii_scrub",
    (s, d) => {
      val pii = concat(col("text"), lit(" contact: user"), col("doc_id"),
        lit("@mail.example tel "), lpad(col("doc_id").cast("string"), 9, "5"))
      t(s, d, "documents")
        .select(col("doc_id"), pii.as("pii"))
        .select(col("doc_id"),
          size(regexp_extract_all(col("pii"), lit(EmailPat), lit(0))).as("n_emails"),
          size(regexp_extract_all(col("pii"), lit(DigitRunPat), lit(0))).as("n_nums"),
          md5(regexp_replace(regexp_replace(col("pii"), EmailPat, "<EMAIL>"),
            DigitRunPat, "<NUM>")).as("scrubbed_md5"))
        .orderBy(col("doc_id"))
    },
    Some(s"""SELECT doc_id,
              len(regexp_extract_all(pii, '$EmailPat')) AS n_emails,
              len(regexp_extract_all(pii, '$DigitRunPat')) AS n_nums,
              md5(regexp_replace(regexp_replace(pii, '$EmailPat', '<EMAIL>', 'g'),
                '$DigitRunPat', '<NUM>', 'g')) AS scrubbed_md5
            FROM (
              SELECT doc_id, CONCAT(text, ' contact: user',
                CAST(doc_id AS VARCHAR), '@mail.example tel ',
                lpad(CAST(doc_id AS VARCHAR), 9, '5')) AS pii
              FROM documents)
            ORDER BY doc_id"""))

  // corpus vocabulary statistics per language: exact distinct-token
  // count (explode → distinct agg) + total token volume. Exact kept
  // because it is oracled; the 10^12-doc scale path is the
  // bounded-sketch twin q50 (an OCR-noise vocabulary is ~unbounded,
  // so the exact distinct's exchange grows with |vocab|).
  private val q48 = QueryDef("q48_vocab_stats",
    (s, d) => t(s, d, "documents")
      .select(col("lang"), explode(toks(col("text"))).as("tok"))
      .groupBy(col("lang"))
      .agg(countDistinct(col("tok")).as("vocab"),
        count(lit(1)).as("n_tokens"))
      .orderBy(col("lang")),
    Some("""SELECT lang, count(DISTINCT tok) AS vocab, count(*) AS n_tokens
            FROM (
              SELECT lang, unnest(string_split_regex(trim(text), '\s+')) AS tok
              FROM documents)
            GROUP BY lang ORDER BY lang"""))

  // top-k tokens by corpus frequency (deterministic tie-break on the
  // token) — the classic corpus-stats op; map-side partial aggregation
  // keeps the exchange at |vocab| not |tokens|
  private val q49 = QueryDef("q49_top_tokens",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val counted = t(s, d, "documents")
        .select(explode(toks(col("text"))).as("tok"))
        .groupBy(col("tok"))
        .agg(count(lit(1)).as("n"))
      // top-k via TakeOrderedAndProject (distributed partial top-k per
      // partition, merged on the driver) — the global rank window then
      // sees only the 20 survivors, never the whole vocabulary
      counted
        .orderBy(desc("n"), col("tok"))
        .limit(20)
        .withColumn("rk", row_number().over(
          Window.partitionBy(lit(1)).orderBy(desc("n"), col("tok"))))
        .select(col("rk"), col("tok"), col("n"))
        .orderBy(col("rk"))
    },
    Some("""SELECT rk, tok, n FROM (
              SELECT tok, count(*) AS n,
                row_number() OVER (ORDER BY count(*) DESC, tok) AS rk
              FROM (
                SELECT unnest(string_split_regex(trim(text), '\s+')) AS tok
                FROM documents)
              GROUP BY tok)
            WHERE rk <= 20 ORDER BY rk"""))

  // the SCALE twin of exact q48: HyperLogLog++ sketches keep the
  // per-group state bounded (a few KB) no matter how unbounded the
  // OCR-noise vocabulary gets — the exchange moves sketches, not the
  // full distinct token set. The estimate itself is engine-defined, so
  // the query VERIFIES THE SKETCH'S PUBLISHED ERROR instead of hashing
  // it: |estimate − exact| ≤ 3·rsd·exact (three standard deviations of
  // the rsd=5% sketch). The oracle recomputes the exact count and pins
  // the bound boolean TRUE. The exact distinct riding alongside is
  // oracle scaffolding — the production scale path is the sketch agg
  // alone (q48 is the exact twin where exactness is the semantics).
  private val q50 = QueryDef("q50_vocab_approx",
    (s, d) => t(s, d, "documents")
      .select(col("lang"), explode(toks(col("text"))).as("tok"))
      .groupBy(col("lang"))
      // default 5% rsd: the 2^9-register sketch updates ~3× faster than
      // a 1%-rsd 2^14-register one and already beats the exact distinct
      // at sf0.1 — precision beyond that buys nothing for corpus stats
      .agg(approx_count_distinct(col("tok"), 0.05).as("va"),
        countDistinct(col("tok")).as("vocab_exact"),
        count(lit(1)).as("n_tokens"))
      .select(col("lang"), col("vocab_exact"), col("n_tokens"),
        // 5σ, not 3σ (ADVICE r6): HLL++ error is a distribution with
        // ~0.3%/group tail beyond 3·rsd, so the pinned-TRUE oracle
        // could intermittently hash-mismatch on an unlucky corpus; at
        // 5·rsd the gate is deterministic in practice while a BROKEN
        // sketch (bias ≫ rsd) still flips it false. Output unchanged.
        (abs(col("va") - col("vocab_exact")).cast("double")
          <= lit(5 * 0.05) * col("vocab_exact").cast("double")).as("vocab_ok"))
      .orderBy(col("lang")),
    Some("""SELECT lang, count(DISTINCT tok) AS vocab_exact,
              count(*) AS n_tokens, TRUE AS vocab_ok
            FROM (
              SELECT lang, unnest(string_split_regex(trim(text), '\s+')) AS tok
              FROM documents)
            GROUP BY lang ORDER BY lang"""))

  // as-of join (an operator Spark lacks natively): each purchase event
  // matched to the user's latest click at-or-before it — via the
  // union+running-window rewrite in graft.ops.AsOfJoin (one exchange,
  // zero joins, never the quadratic range self-join). Tie rules
  // (<=; equal-ts clicks resolve to the largest payload) are mirrored
  // in the oracle's window formulation.
  private val q51 = QueryDef("q51_asof_join",
    (s, d) => {
      val ev = t(s, d, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id"))
      graft.ops.AsOfJoin.asOf(purchases, clicks,
          key = "user_id", leftTs = "ts", rightTs = "ts", carry = Seq("event_id"))
        .select(col("event_id"), col("user_id"),
          col("asof.event_id").as("click_event_id"),
          // floor of the seconds delta: Spark's double→long cast
          // truncates while DuckDB's rounds, so floor() on both sides
          floor(col("ts").cast("timestamp").cast("double")
            - col("asof.ts").cast("timestamp").cast("double")).cast("bigint").as("gap_s"))
        .orderBy(col("event_id"))
    },
    Some("""WITH u AS (
              SELECT user_id AS k, ts, 0 AS is_r, event_id,
                CAST(NULL AS BIGINT) AS r_eid, CAST(NULL AS TIMESTAMP) AS r_ts
              FROM events WHERE event_type = 'purchase'
              UNION ALL
              SELECT user_id, ts, 1, NULL, event_id, ts
              FROM events WHERE event_type = 'click'),
            w AS (
              SELECT *,
                last_value(r_eid IGNORE NULLS) OVER
                  (PARTITION BY k ORDER BY ts, is_r DESC, r_ts, r_eid
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS a_eid,
                last_value(r_ts IGNORE NULLS) OVER
                  (PARTITION BY k ORDER BY ts, is_r DESC, r_ts, r_eid
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS a_ts
              FROM u)
            SELECT event_id, k AS user_id, a_eid AS click_event_id,
              CAST(floor(epoch(ts) - epoch(a_ts)) AS BIGINT) AS gap_s
            FROM w WHERE is_r = 0 ORDER BY event_id"""))

  // range join via binning (graft.ops.RangeJoin): events against 60
  // overlapping 18-hour windows — the theta-join becomes an equi-join
  // on the 6-hour bin, so it hashes/broadcasts instead of
  // nested-looping; the oracle is the plain BETWEEN join.
  private val RjBase = 1704067200L // 2024-01-01 00:00:00 UTC (events' epoch)
  private val q52 = QueryDef("q52_range_join",
    (s, d) => {
      val wins = s.range(60).select(col("id").cast("int").as("w_id"),
        (lit(RjBase) + col("id") * 43200).cast("double").as("ws"),
        (lit(RjBase) + col("id") * 43200 + 64800).cast("double").as("we"))
      val ev = t(s, d, "events")
        .select(col("event_id"), col("value"),
          col("ts").cast("timestamp").cast("double").as("tse"))
      graft.ops.RangeJoin.pointInInterval(
          ev, "tse", broadcast(wins), "ws", "we", binWidth = 21600.0)
        .groupBy(col("w_id"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_val"))
        .orderBy(col("w_id"))
    },
    Some("""WITH w AS (
              SELECT CAST(i AS INT) AS w_id,
                TIMESTAMP '2024-01-01 00:00:00' + to_seconds(i * 43200) AS ws,
                TIMESTAMP '2024-01-01 00:00:00' + to_seconds(i * 43200 + 64800) AS we
              FROM (SELECT unnest(range(60)) AS i))
            SELECT w_id, count(*) AS n, round(sum(value), 2) AS sum_val
            FROM events e JOIN w ON e.ts >= w.ws AND e.ts < w.we
            GROUP BY 1 ORDER BY 1"""))

  // salted skew join (graft.sql.Skew.saltedJoin — north_rule "skew …
  // handled with salted repartitioning"): the fact side gets a
  // deterministic per-row salt, the dimension replicates salts×, the
  // exchange spreads a hot supplier over 8 partitions. The oracle is
  // the UNsalted join — values must be identical, salting is pure
  // physical redistribution.
  private val q53 = QueryDef("q53_skew_salted_join",
    (s, d) => {
      val li = t(s, d, "lineitem")
        .select(col("l_suppkey"), col("l_extendedprice"), col("l_discount"))
      val sup = t(s, d, "supplier")
        .select(col("s_suppkey").as("l_suppkey"), col("s_name"))
      graft.sql.Skew.saltedJoin(li, sup, "l_suppkey", salts = 8)
        .groupBy(col("s_name"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
          count(lit(1)).as("n"))
        .orderBy(col("s_name"))
    },
    Some("""SELECT s_name,
              round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
              count(*) AS n
            FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
            GROUP BY 1 ORDER BY 1"""))

  // int8 scalar quantization of the embedding column (the 4×
  // memory/bandwidth lever for 10^9-vector ANN serving): per-vector
  // scale = 127/max|x|, q = floor(x·scale + 0.5) — floor(+0.5) instead
  // of round() because Spark rounds half-up and DuckDB half-even —
  // plus the dequantization error that decides whether int8 recall is
  // acceptable.
  private val q54 = QueryDef("q54_embed_quantize",
    (s, d) => {
      def qz(x: Column, scale: Column): Column = floor(x * scale + 0.5)
      t(s, d, "embeddings")
        .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
        .withColumn("scale", lit(127.0) /
          greatest(aggregate(col("e"), lit(0.0), (acc, x) => greatest(acc, abs(x))),
            lit(1e-12)))
        .select(col("vec_id"),
          round(col("scale"), 6).as("scale_r"),
          array_min(transform(col("e"), x => qz(x, col("scale")))).cast("int").as("q_min"),
          array_max(transform(col("e"), x => qz(x, col("scale")))).cast("int").as("q_max"),
          (round(aggregate(col("e"), lit(0.0),
            (acc, x) => acc + abs(qz(x, col("scale")) / col("scale") - x))
            / size(col("e")), 6) + lit(0.0)).as("mean_abs_err"))
        .orderBy(col("vec_id"))
    },
    Some("""WITH s AS (
              SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
                127.0 / greatest(list_max(list_transform(
                  CAST(embedding AS DOUBLE[]), x -> abs(x))), 1e-12) AS scale
              FROM embeddings)
            SELECT vec_id, round(scale, 6) AS scale_r,
              CAST(list_min(list_transform(e, x -> floor(x * scale + 0.5))) AS INT) AS q_min,
              CAST(list_max(list_transform(e, x -> floor(x * scale + 0.5))) AS INT) AS q_max,
              round(list_sum(list_transform(e,
                x -> abs(floor(x * scale + 0.5) / scale - x))) / len(e), 6) + 0.0
                AS mean_abs_err
            FROM s ORDER BY vec_id"""))

  // tf-idf: corpus document frequencies + per-doc top-3 terms — the
  // classic relevance/keyword-extraction op. The df table is
  // token-keyed (|vocab| rows, map-side combined); the probe side is
  // filtered BEFORE the join so the exchange moves 50 docs' terms, not
  // the corpus. Ranking uses the ROUNDED score (+ token tie-break) so
  // both engines agree despite ln() being libm-dependent at the ulp.
  private val q55 = QueryDef("q55_tfidf",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val tk = t(s, d, "documents")
        .select(col("doc_id"), explode(toks(col("text"))).as("tok"))
      val tf = tk.groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf"))
      val dft = tk.select(col("doc_id"), col("tok")).distinct()
        .groupBy(col("tok")).agg(count(lit(1)).as("df"))
      val nDocs = t(s, d, "documents").agg(count(lit(1)).as("n_docs"))
      val w = Window.partitionBy(col("doc_id")).orderBy(desc("score"), col("tok"))
      tf.filter(col("doc_id") < 50)
        .join(dft, Seq("tok"))
        .crossJoin(broadcast(nDocs))
        .withColumn("score",
          round(col("tf") * log(col("n_docs").cast("double") / col("df")), 3) + lit(0.0))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .select(col("doc_id"), col("rk"), col("tok"), col("tf"), col("df"), col("score"))
        .orderBy(col("doc_id"), col("rk"))
    },
    Some("""WITH tk AS (
              SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS tok
              FROM documents),
            tf AS (SELECT doc_id, tok, count(*) AS tf FROM tk GROUP BY 1, 2),
            dft AS (SELECT tok, count(DISTINCT doc_id) AS df FROM tk GROUP BY 1),
            n AS (SELECT count(*) AS n_docs FROM documents),
            scored AS (
              SELECT tf.doc_id, tf.tok, tf.tf, dft.df,
                round(tf.tf * ln(CAST(n_docs AS DOUBLE) / df), 3) + 0.0 AS score
              FROM tf JOIN dft USING (tok), n
              WHERE tf.doc_id < 50),
            ranked AS (
              SELECT *, row_number() OVER (PARTITION BY doc_id
                ORDER BY score DESC, tok) AS rk
              FROM scored)
            SELECT doc_id, rk, tok, tf, df, score FROM ranked
            WHERE rk <= 3 ORDER BY doc_id, rk"""))

  // unigram-LM quality score: mean log-probability of each document
  // under the corpus's own unigram distribution — the deterministic
  // stand-in for the perplexity filter every LLM data pipeline runs
  // (CCNet-style; a real KenLM slots into the same join shape). Low
  // scores = repetitive/degenerate text, high = common fluent tokens.
  private val q56 = QueryDef("q56_unigram_quality",
    (s, d) => {
      val tk = t(s, d, "documents")
        .select(col("doc_id"), explode(toks(col("text"))).as("tok"))
      val freq = tk.groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
      val tot = tk.agg(count(lit(1)).as("total"))
      tk.join(freq, Seq("tok"))
        .crossJoin(broadcast(tot))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_tokens"),
          (round(sum(log(col("cnt").cast("double") / col("total")))
            / count(lit(1)), 3) + lit(0.0)).as("mean_lp"))
        .orderBy(col("doc_id"))
    },
    Some("""WITH tk AS (
              SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS tok
              FROM documents),
            f AS (SELECT tok, count(*) AS cnt FROM tk GROUP BY 1),
            t AS (SELECT count(*) AS total FROM tk)
            SELECT doc_id, count(*) AS n_tokens,
              round(sum(ln(CAST(cnt AS DOUBLE) / total)) / count(*), 3) + 0.0 AS mean_lp
            FROM tk JOIN f USING (tok), t
            GROUP BY doc_id ORDER BY doc_id"""))

  // PDF layout parse (north_rule), driven end-to-end: each document is
  // rendered to a REAL multi-line PDF (FlateDecode content stream + an
  // image XObject — graft.parse.PdfWriter), then parsed back through
  // the from-scratch extractor (graft.parse.PdfExtract). The oracle
  // encodes the round-trip invariant: every whitespace token survives
  // write→inflate→interpret→layout-sort as one text span, plus exactly
  // one media span for the image's Do.
  //
  // The two stages are public so the bench can pay synthesis ONCE
  // (production PDFs arrive, they aren't generated) and time only the
  // parse; the contract query composes both so the oracle invariant is
  // unchanged.

  /** q57 synthesis stage: documents → (doc_id, pdf bytes). */
  def pdfRender(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    t(s, d, "documents")
      .select(col("doc_id").cast("string").as("doc_id"), col("text"))
      .as[(String, String)]
      .mapPartitions { it =>
        it.map { case (id, text) =>
          val tk = text.trim.split("\\s+").filter(_.nonEmpty).toSeq
          (id, graft.parse.PdfWriter.render(
            Seq(graft.parse.PdfWriter.layoutTokens(tk)),
            flate = true, withImage = true))
        }
      }.toDF("doc_id", "pdf")
  }

  /** q57 parse stage over (doc_id, pdf bytes) rows. */
  def pdfParse(s: SparkSession, raw: DataFrame): DataFrame = {
    import s.implicits._
    graft.parse.PdfExtract.extractDocs(
        raw.select(col("doc_id"), col("pdf")).as[(String, Array[Byte])])
      .toDF()
      .select(col("doc_id"), size(col("spans")).as("n_spans"),
        size(filter(col("spans"), x => x.getField("kind") === "media")).as("n_media"))
      .orderBy(col("doc_id"))
  }

  private val q57 = QueryDef("q57_pdf_extract",
    (s, d) => pdfParse(s, pdfRender(s, d)),
    Some("""SELECT CAST(doc_id AS VARCHAR) AS doc_id,
              CAST(CASE WHEN length(trim(text)) = 0 THEN 1
                   ELSE len(string_split_regex(trim(text), '\s+')) + 1 END AS INT)
                AS n_spans,
              CAST(1 AS INT) AS n_media
            FROM documents ORDER BY doc_id"""))

  // repetition signals (the Gopher-rules repetition filter family):
  // duplicate-token fraction, most-frequent-bigram mass, and
  // adjacent-repeat fraction — the three cheapest detectors of
  // degenerate/boilerplate text. Bigram mass is computed relationally
  // (explode → count → max) so the exchange carries (doc, bigram)
  // partial counts, never per-doc quadratic HOF work.
  private val q58 = QueryDef("q58_repetition_signals",
    (s, d) => {
      val base = t(s, d, "documents")
        .select(col("doc_id"), toks(col("text")).as("tk"))
        .withColumn("n", size(col("tk")))
      // most-frequent-bigram stats in ONE codegen'd pass over the
      // token array ([[graft.sql.BigramTop]]) — value-identical to the
      // explode → (doc,bigram) count → max/sum chain it replaces
      // (spec-pinned), with no Generate blow-up and no per-bigram
      // exchange; NULL for sub-2-token docs = the left-join miss the
      // coalesce below already handles
      base.withColumn("bt", graft.sql.BigramTop.of(col("tk")))
        .select(col("doc_id"), col("n").as("n_tokens"),
          (round(lit(1.0) - size(array_distinct(col("tk"))).cast("double") / col("n"), 3)
            + lit(0.0)).as("dup_tok_frac"),
          coalesce(round(col("bt.top_cnt").cast("double") / col("bt.n_bg"), 3) + lit(0.0),
            lit(0.0)).as("top_bigram_frac"),
          when(col("n") >= 2,
            round(size(filter(sequence(lit(1), col("n") - 1),
              i => element_at(col("tk"), i) === element_at(col("tk"), i + 1)))
              .cast("double") / (col("n") - 1), 3) + lit(0.0))
            .otherwise(0.0).as("adjacent_rep_frac"))
        .orderBy(col("doc_id"))
    },
    Some("""WITH base AS (
              SELECT doc_id, string_split_regex(trim(text), '\s+') AS tk,
                len(string_split_regex(trim(text), '\s+')) AS n
              FROM documents),
            bg AS (
              SELECT doc_id,
                unnest(list_transform(range(1, n),
                  i -> tk[i] || ' ' || tk[i + 1])) AS bg
              FROM base WHERE n >= 2),
            agg AS (
              SELECT doc_id, max(cnt) AS top_cnt, CAST(sum(cnt) AS BIGINT) AS n_bg
              FROM (SELECT doc_id, bg, count(*) AS cnt FROM bg GROUP BY 1, 2)
              GROUP BY 1)
            SELECT base.doc_id, CAST(n AS INT) AS n_tokens,
              round(1.0 - CAST(len(list_distinct(tk)) AS DOUBLE) / n, 3) + 0.0
                AS dup_tok_frac,
              coalesce(round(CAST(top_cnt AS DOUBLE) / n_bg, 3) + 0.0, 0.0)
                AS top_bigram_frac,
              CASE WHEN n >= 2 THEN
                round(CAST(len(list_filter(range(1, n),
                  i -> tk[i] = tk[i + 1])) AS DOUBLE) / (n - 1), 3) + 0.0
              ELSE 0.0 END AS adjacent_rep_frac
            FROM base LEFT JOIN agg USING (doc_id)
            ORDER BY base.doc_id"""))

  // as-of join, nearest direction with a tolerance bound (the full
  // pandas merge_asof surface on top of the same union+window shape as
  // q51 — still one exchange, zero joins): each purchase matched to
  // the temporally CLOSEST click of the same user, backward winning
  // ties, matches farther than 24h nulled out
  private val AsofTolSecs = 86400
  private val q59 = QueryDef("q59_asof_nearest_tolerance",
    (s, d) => {
      val ev = t(s, d, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id"))
      graft.ops.AsOfJoin.asOf(purchases, clicks,
          key = "user_id", leftTs = "ts", rightTs = "ts",
          carry = Seq("event_id"), direction = "nearest",
          toleranceSecs = Some(AsofTolSecs.toDouble))
        .select(col("event_id"), col("user_id"),
          col("asof.event_id").as("click_event_id"),
          // floor(abs(...)): Spark's double→long cast truncates while
          // DuckDB's rounds — floor on both sides (same as q51)
          floor(abs(col("ts").cast("timestamp").cast("double")
            - col("asof.ts").cast("timestamp").cast("double")))
            .cast("bigint").as("gap_s"))
        .orderBy(col("event_id"))
    },
    Some(s"""WITH p AS (SELECT event_id, user_id, ts FROM events
                        WHERE event_type = 'purchase'),
             c AS (SELECT user_id, ts, event_id FROM events
                   WHERE event_type = 'click'),
             cand AS (
               SELECT p.event_id, p.user_id, p.ts,
                 (SELECT c.ts FROM c WHERE c.user_id = p.user_id AND c.ts <= p.ts
                    ORDER BY c.ts DESC, c.event_id DESC LIMIT 1) AS b_ts,
                 (SELECT c.event_id FROM c WHERE c.user_id = p.user_id AND c.ts <= p.ts
                    ORDER BY c.ts DESC, c.event_id DESC LIMIT 1) AS b_eid,
                 (SELECT c.ts FROM c WHERE c.user_id = p.user_id AND c.ts >= p.ts
                    ORDER BY c.ts ASC, c.event_id DESC LIMIT 1) AS f_ts,
                 (SELECT c.event_id FROM c WHERE c.user_id = p.user_id AND c.ts >= p.ts
                    ORDER BY c.ts ASC, c.event_id DESC LIMIT 1) AS f_eid
               FROM p),
             pick AS (
               SELECT event_id, user_id, ts,
                 CASE WHEN b_ts IS NULL AND f_ts IS NULL THEN NULL
                      WHEN f_ts IS NULL THEN b_eid
                      WHEN b_ts IS NULL THEN f_eid
                      WHEN epoch(ts) - epoch(b_ts) <= epoch(f_ts) - epoch(ts)
                        THEN b_eid ELSE f_eid END AS n_eid,
                 CASE WHEN b_ts IS NULL AND f_ts IS NULL THEN NULL
                      WHEN f_ts IS NULL THEN b_ts
                      WHEN b_ts IS NULL THEN f_ts
                      WHEN epoch(ts) - epoch(b_ts) <= epoch(f_ts) - epoch(ts)
                        THEN b_ts ELSE f_ts END AS n_ts
               FROM cand)
           SELECT event_id, user_id,
             CASE WHEN abs(epoch(ts) - epoch(n_ts)) <= $AsofTolSecs
                  THEN n_eid END AS click_event_id,
             CASE WHEN abs(epoch(ts) - epoch(n_ts)) <= $AsofTolSecs
                  THEN CAST(floor(abs(epoch(ts) - epoch(n_ts))) AS BIGINT)
                  END AS gap_s
           FROM pick ORDER BY event_id"""))

  // winnowing with an ORACLE-REPRODUCIBLE hash: the q23/q24 pattern
  // applied to the winnow family — same window semantics as the
  // production Karp–Rabin path (q36/q43, graft.text.Winnow) but with
  // md5-hex k-gram hashes both engines compute bit-identically, so the
  // rolling-min + dedup + sort machinery itself is oracled end-to-end.
  // Shape note: this is deliberately RELATIONAL (explode → window min
  // → group), not a per-doc HOF — a nested `transform(..., j =>
  // slice(grams, j, w))` re-inlines the md5 gram array into the lambda
  // and recomputes it per window (O(n²) interpreted md5 per doc; HOF
  // lambdas sit outside codegen CSE). The window form is one exchange
  // on doc_id, reused by the groupBy.
  private val WinnowMdK = 5
  private val WinnowMdW = 4
  private val q60 = QueryDef("q60_winnow_md5_oracle",
    (s, d) => {
      val k = WinnowMdK
      val w = WinnowMdW
      // ONE codegen'd pass per document ([[graft.sql.Md5WinnowFps]]):
      // gram md5s, clamped window minima, dedup+sort — bit-identical to
      // the posexplode → window-min → collect_set/array_sort chain it
      // replaces (pinned by Md5WinnowFpsSpec), but with no Generate
      // row blow-up (one row per GRAM), no exchange+sort for the
      // per-doc window and no ObjectHashAggregate pair for the set —
      // the only remaining exchange is the final presentation sort
      val base = t(s, d, "documents")
        .filter(length(col("text")) >= k)
      base.select(col("doc_id"),
          graft.sql.Md5WinnowFps.fps(col("text"), k, w).as("fps"))
        .select(col("doc_id"),
          size(col("fps")).cast("bigint").as("n_fps"),
          md5(array_join(col("fps"), ",")).as("fp_digest"))
        .orderBy(col("doc_id"))
    },
    Some(s"""WITH base AS (
               SELECT doc_id, text, length(text) - $WinnowMdK + 1 AS n
               FROM documents WHERE length(text) >= $WinnowMdK),
             g AS (
               SELECT doc_id, n, text, unnest(range(1, n + 1)) AS i
               FROM base),
             h AS (
               SELECT doc_id, n, i,
                 md5(substring(text, CAST(i AS INT), $WinnowMdK)) AS h
               FROM g),
             w AS (
               SELECT doc_id, n, i,
                 min(h) OVER (PARTITION BY doc_id ORDER BY i
                   ROWS BETWEEN CURRENT ROW AND ${WinnowMdW - 1} FOLLOWING) AS fp
               FROM h),
             wf AS (
               SELECT doc_id, fp FROM w
               WHERE i <= greatest(n - $WinnowMdW + 1, 1)),
             agg AS (
               SELECT doc_id,
                 list_sort(list_distinct(list(fp))) AS fps
               FROM wf GROUP BY doc_id)
           SELECT doc_id, CAST(len(fps) AS BIGINT) AS n_fps,
             md5(array_to_string(fps, ',')) AS fp_digest
           FROM agg ORDER BY doc_id"""))

  // the mixed-format ingestion surface (S3/J2/X1/T3) promoted to the
  // contract: a deterministic mini-corpus (ALTO, BOM'd ALTO, HTML, PDF,
  // junk) written to a temp dir, scanned ONCE via binaryFile +
  // magic-byte dispatch, per-doc span-kind counts checked against
  // literal expectations (content is fixed, so the oracle is a VALUES
  // table)
  private val q61 = QueryDef("q61_ingest_mixed_formats",
    (s, _) => {
      import graft.model.{Doc, Span}
      // ONE deterministic fixture dir, rewritten idempotently (same
      // bytes every call) — a fresh temp dir per invocation would leak
      // across bench/verify iterations. Driver-local /tmp is valid for
      // this harness's single-host runs; a cluster deployment would
      // point readFiles at shared storage instead.
      val tmp = "/tmp/graft_q61_fixture"
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(tmp))
      def put(name: String, bytes: Array[Byte]): Unit =
        java.nio.file.Files.write(java.nio.file.Paths.get(s"$tmp/$name"), bytes)
      val altoDoc = Doc("alto_a", Vector(
        Span(Span.KindText, "gedruckter", "line://b1/l1", 0),
        Span(Span.KindText, "inhalt", "line://b1/l1", 1),
        Span(Span.KindText, "kommt", "line://b1/l2", 2),
        Span(Span.KindText, "wieder", "line://b1/l2", 3),
        Span.media("media://alto_a/img0", 4)))
      put("alto_a.xml", graft.parse.AltoWriter.render(altoDoc))
      val bomDoc = Doc("bom_e", Vector(
        Span(Span.KindText, "nochmal", "line://b1/l1", 0),
        Span(Span.KindText, "inhalt", "line://b1/l1", 1)))
      put("bom_e.xml", Array[Byte](0xEF.toByte, 0xBB.toByte, 0xBF.toByte) ++
        graft.parse.AltoWriter.render(bomDoc))
      put("html_b.html",
        ("<html><body><nav><a href='/'>home</a> <a href='/a'>about</a>" +
          " <a href='/c'>impressum</a></nav>" +
          "<article><p>echter inhalt mit genug worten hier</p>" +
          "<img src='bild.png'/></article></body></html>").getBytes("UTF-8"))
      put("pdf_c.pdf", graft.parse.PdfWriter.render(
        Seq(Seq((72.0, 700.0, "gedruckter inhalt"), (72.0, 686.0, "zweite zeile"))),
        flate = true, withImage = true))
      put("junk_d.xml", Array[Byte](9, 9, 9))

      val docs = graft.run.IngestAny.parseDocs(
        graft.run.IngestAny.readFiles(s, Seq(tmp)))
      docs.toDF().select(col("doc_id"),
          size(filter(col("spans"), x => x.getField("kind") === Span.KindText)).as("n_text"),
          size(filter(col("spans"), x => x.getField("kind") === Span.KindMedia)).as("n_media"),
          size(filter(col("spans"), x => x.getField("kind") === graft.run.IngestXml.KindError)).as("n_err"))
        .orderBy(col("doc_id"))
    },
    Some("""SELECT * FROM (VALUES
              ('alto_a', 4, 1, 0),
              ('bom_e', 2, 0, 0),
              ('html_b', 6, 1, 0),
              ('junk_d', 0, 0, 1),
              ('pdf_c', 4, 1, 0)) AS t(doc_id, n_text, n_media, n_err)
            ORDER BY doc_id"""))

  // near-dup CLUSTERS: the step after candidate pairs that a real
  // dedup pipeline keeps — connected components over the q24-style
  // minhash-LSH edges (graft.ops.ConnectedComponents, min-label
  // propagation), every doc labeled with its component's min doc_id,
  // the canonical survivor flagged. Oracled end-to-end: DuckDB
  // computes the SAME clusters via a recursive reachability CTE over
  // the same md5-minhash edges.
  private val q62 = QueryDef("q62_neardup_clusters",
    (s, d) => {
      // star edges, not all-pairs: connectivity-identical per bucket
      // (OpsJoinSpec proves equal component maps) at O(|bucket|) rows —
      // the form that survives massive duplicate families
      val edges = graft.dedup.MinHashLsh.bandStarEdges(signatureDF(s, d), MinhashK, 2,
        (a, b) => md5(concat_ws("_", a, b)))
      val vertices = t(s, d, "documents").select(col("doc_id"))
      val cc = graft.ops.ConnectedComponents
        .run(vertices, "doc_id", edges, "d1", "d2")
      val sizes = cc.groupBy(col("lbl")).agg(count(lit(1)).as("cluster_size"))
      cc.join(sizes, "lbl")
        .select(col("node").as("doc_id"), col("lbl").as("cluster_id"),
          col("cluster_size"),
          (col("node") === col("lbl")).as("is_canonical"))
        .orderBy(col("doc_id"))
    },
    Some(s"""WITH RECURSIVE tt AS (
               SELECT doc_id, string_split_regex(trim(text), '\\s+') AS tk
               FROM documents),
             ss AS (SELECT doc_id, $shingleSql AS sh FROM tt),
             sig AS (SELECT doc_id, ${(0 until MinhashK).map(i =>
               s"${minhashSqlExpr(i)} AS h$i").mkString(", ")} FROM ss),
             bands AS (${(0 until MinhashK / 2).map(b =>
               s"""SELECT doc_id, $b AS band,
                   md5(CONCAT(h${2 * b}, '_', h${2 * b + 1})) AS bh FROM sig""")
               .mkString(" UNION ALL ")}),
             pairs AS (
               SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
               FROM bands a JOIN bands b
                 ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id),
             edges AS (SELECT d1 AS src, d2 AS dst FROM pairs
                       UNION ALL SELECT d2, d1 FROM pairs),
             reach(node, lbl) AS (
               SELECT doc_id, doc_id FROM documents
               UNION
               SELECT e.dst, r.lbl FROM reach r JOIN edges e ON r.node = e.src),
             cc AS (SELECT node AS doc_id, min(lbl) AS cluster_id
                    FROM reach GROUP BY node),
             sz AS (SELECT cluster_id, CAST(count(*) AS BIGINT) AS cluster_size
                    FROM cc GROUP BY 1)
           SELECT cc.doc_id, cc.cluster_id, sz.cluster_size,
             (cc.doc_id = cc.cluster_id) AS is_canonical
           FROM cc JOIN sz USING (cluster_id) ORDER BY cc.doc_id"""))

  // REAL BPE next to q37's pretokenizer: learn a merge table with the
  // distributed word-type reduction + driver-side Sennrich loop
  // (graft.text.Bpe — the IvfIndex collect-bounded pattern), broadcast
  // the ranks, encode narrowly. Fixed corpus (the paper's classic
  // low/lower/newest/widest frequencies plus an unseen-word doc), so
  // the oracle pins the LEARNED segmentation itself as literals —
  // expectations derived by tools/ref_bpe.py, an independent
  // implementation of the published algorithm (arXiv:1508.07909),
  // not a replay of the Scala code.
  private val q63 = QueryDef("q63_bpe_learn_encode",
    (s, _) => {
      import s.implicits._
      val docs = Seq(
        ("d1", "low low low low low"),
        ("d2", "lower lower"),
        ("d3", "newest newest newest newest newest newest"),
        ("d4", "widest widest widest"),
        ("d5", "low lower newest widest unseen")).toDF("doc_id", "text")
      val merges = graft.text.Bpe.learn(docs, "text", nMerges = 10)
      val counts = graft.text.Bpe.encodeCount(docs, "doc_id", "text", merges)
      val toks = graft.text.Bpe.encodeTokens(docs, "doc_id", "text", merges)
      counts.join(toks, "doc_id")
        .select(col("doc_id"), col("n_words"), col("n_bpe"),
          array_join(col("toks"), " ").as("toks"))
        .orderBy(col("doc_id"))
    },
    Some("""SELECT * FROM (VALUES
              ('d1', 5, 5, 'low</w> low</w> low</w> low</w> low</w>'),
              ('d2', 2, 8, 'low e r </w> low e r </w>'),
              ('d3', 6, 6, 'newest</w> newest</w> newest</w> newest</w> newest</w> newest</w>'),
              ('d4', 3, 9, 'w i dest</w> w i dest</w> w i dest</w>'),
              ('d5', 5, 16, 'low</w> low e r </w> newest</w> w i dest</w> u n s e e n </w>'))
            AS t(doc_id, n_words, n_bpe, toks)
            ORDER BY doc_id"""))

  // the END-TO-END curation pipeline a training-data run actually
  // ships, as ONE query: Gopher-style quality gate (token-count
  // bounds + stopword presence) → minhash-LSH near-dup clustering of
  // the survivors (star edges + converged connected components) →
  // canonical-survivor selection → per-doc decision rows from which
  // the corpus stats (kept docs, kept tokens) aggregate. Exercises
  // operator COMPOSITION the per-query contract never does; every
  // stage is replayed by the DuckDB oracle (q45's signal SQL + q62's
  // recursive-reachability clustering over the filtered subset).
  private val q64 = QueryDef("q64_curation_pipeline",
    (s, d) => {
      val docs = t(s, d, "documents")
      val tk = toks(col("text"))
      val swLit = lit(QualityStopwords.toArray)
      val quality = docs.select(col("doc_id"), col("text"),
          size(tk).as("n_tokens"),
          size(filter(tk, x => array_contains(swLit, x))).as("n_sw"))
        .withColumn("q_pass",
          col("n_tokens").between(25, 80) && col("n_sw") >= 1)
      val passed = quality.filter(col("q_pass"))
        .select(col("doc_id"), col("text"))
      val sig = graft.dedup.MinHashLsh.md5Signature(
        passed, "doc_id", "text", MinhashK)
      val edges = graft.dedup.MinHashLsh.bandStarEdges(sig, MinhashK, 2,
        (a, b) => md5(concat_ws("_", a, b)))
      val cc = graft.ops.ConnectedComponents.run(
        passed.select(col("doc_id")), "doc_id", edges, "d1", "d2")
      val sizes = cc.groupBy(col("lbl")).agg(count(lit(1)).as("cluster_size"))
      val clustered = cc.join(sizes, "lbl")
        .select(col("node").as("doc_id"), col("lbl").as("cluster_id"),
          col("cluster_size"))
      quality
        .select(col("doc_id"), col("n_tokens"),
          col("q_pass").cast("int").as("q_pass"))
        .join(clustered, Seq("doc_id"), "left")
        .select(col("doc_id"), col("q_pass"), col("cluster_id"),
          col("cluster_size"),
          coalesce((col("doc_id") === col("cluster_id")).cast("int"),
            lit(0)).as("kept"),
          when(col("doc_id") === col("cluster_id"), col("n_tokens"))
            .otherwise(lit(0)).as("kept_tokens"))
        .orderBy(col("doc_id"))
    },
    Some(s"""WITH RECURSIVE qual AS (
               SELECT doc_id, text,
                 CAST(len(string_split_regex(trim(text), '\\s+')) AS INT)
                   AS n_tokens,
                 len(list_filter(string_split_regex(trim(text), '\\s+'),
                   x -> list_contains([${QualityStopwords
                     .map(w => s"'$w'").mkString(", ")}], x))) AS n_sw
               FROM documents),
             q AS (SELECT doc_id, text, n_tokens,
                     (n_tokens BETWEEN 25 AND 80 AND n_sw >= 1) AS q_pass
                   FROM qual),
             passed AS (SELECT doc_id, text FROM q WHERE q_pass),
             tt AS (
               SELECT doc_id, string_split_regex(trim(text), '\\s+') AS tk
               FROM passed),
             ss AS (SELECT doc_id, $shingleSql AS sh FROM tt),
             sig AS (SELECT doc_id, ${(0 until MinhashK).map(i =>
               s"${minhashSqlExpr(i)} AS h$i").mkString(", ")} FROM ss),
             bands AS (${(0 until MinhashK / 2).map(b =>
               s"""SELECT doc_id, $b AS band,
                   md5(CONCAT(h${2 * b}, '_', h${2 * b + 1})) AS bh FROM sig""")
               .mkString(" UNION ALL ")}),
             pairs AS (
               SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
               FROM bands a JOIN bands b
                 ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id),
             edges AS (SELECT d1 AS src, d2 AS dst FROM pairs
                       UNION ALL SELECT d2, d1 FROM pairs),
             reach(node, lbl) AS (
               SELECT doc_id, doc_id FROM passed
               UNION
               SELECT e.dst, r.lbl FROM reach r JOIN edges e ON r.node = e.src),
             cc AS (SELECT node AS doc_id, min(lbl) AS cluster_id
                    FROM reach GROUP BY node),
             sz AS (SELECT cluster_id, CAST(count(*) AS BIGINT) AS cluster_size
                    FROM cc GROUP BY 1)
           SELECT q.doc_id, CAST(q.q_pass AS INT) AS q_pass,
             cc.cluster_id, sz.cluster_size,
             coalesce(CAST(q.doc_id = cc.cluster_id AS INT), 0) AS kept,
             CASE WHEN q.doc_id = cc.cluster_id THEN q.n_tokens
               ELSE 0 END AS kept_tokens
           FROM q
           LEFT JOIN cc ON q.doc_id = cc.doc_id
           LEFT JOIN sz ON cc.cluster_id = sz.cluster_id
           ORDER BY q.doc_id"""))

  // ExactSubstr-style repeated-span dedup (Lee et al., "Deduplicating
  // Training Data Makes Language Models Better", arXiv:2107.06499):
  // mark every token position covered by a W-token window whose text
  // occurs MORE THAN ONCE anywhere in the corpus (including twice in
  // the same document), report per-doc duplicated-token coverage and a
  // keep decision. The paper's suffix array is inherently single-node;
  // this windowed-hash formulation is the distributable equivalent:
  //   grams:   one (doc, start, xxhash64(gram)) row per window — the
  //            gram STRING never reaches a shuffle, only its 8-byte
  //            hash (partial aggregation makes the count map-side)
  //   dup set: hash-join of occurrences against hashes with count>1,
  //            both sides hash-partitioned on h — no broadcast needed,
  //            so the dup set may be arbitrarily large
  //   coverage: equal-length intervals [s, s+W-1] unioned per doc via
  //            gaps-and-islands (strict-overlap break at s-prev >= W;
  //            union size = max(s)-min(s)+W per island)
  // W=8 fits the 25–80-token synthetic docs; production would use the
  // paper's 50. Oracle recomputes on the raw gram string — equality of
  // 64-bit gram hashes and gram strings diverge only on collision
  // (deterministic corpus: observed parity, P~1e-7 at sf0.1).
  private val ExactSubstrW = 8
  private val q65 = QueryDef("q65_exact_substr_dedup",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val W = ExactSubstrW
      val base = t(s, d, "documents")
        .select(col("doc_id"),
          when(length(trim(col("text"))) === 0,
            array().cast("array<string>"))
            .otherwise(toks(col("text"))).as("tk"))
        .withColumn("n_tokens", size(col("tk")))
      val grams = base.filter(col("n_tokens") >= W)
        .select(col("doc_id"), posexplode(transform(
          sequence(lit(0), col("n_tokens") - W),
          i => xxhash64(concat_ws(" ", slice(col("tk"), i + lit(1), lit(W))))))
          .as(Seq("s", "h")))
      // duplicated-window detection as ONE exchange: a count window
      // over h keeps exactly the rows whose hash occurs more than once
      // — identical row set to the former groupBy(h)>1 + hash-join
      // back, but the gram Generate runs ONCE and the grams table
      // crosses the wire once (both sides of the old join re-derived
      // it). Same 100-TB shape: only 8-byte hashes shuffle.
      val win = Window.partitionBy(col("doc_id")).orderBy(col("s"))
      val wH = Window.partitionBy(col("h"))
      val covered = grams
        .withColumn("c", count(lit(1)).over(wH))
        .filter(col("c") > 1)
        .select(col("doc_id"), col("s"))
        .withColumn("brk",
          when(col("s") - lag(col("s"), 1).over(win) >= W, 1).otherwise(0))
        .withColumn("isl", sum(col("brk")).over(win))
        .groupBy(col("doc_id"), col("isl"))
        .agg((max(col("s")) - min(col("s")) + lit(W)).as("cov"))
        .groupBy(col("doc_id"))
        .agg(sum(col("cov")).cast("long").as("dup_tokens"))
      base.select(col("doc_id"), col("n_tokens"))
        .join(covered, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_tokens"),
          coalesce(col("dup_tokens"), lit(0L)).as("dup_tokens"))
        .withColumn("dup_ratio", when(col("n_tokens") === 0, lit(0.0))
          .otherwise(round(col("dup_tokens") / col("n_tokens"), 4)))
        .withColumn("kept", (col("dup_ratio") < 0.5).cast("int"))
        .orderBy(col("doc_id"))
    },
    Some(s"""WITH base AS (
               SELECT doc_id,
                 CASE WHEN length(trim(text)) = 0
                      THEN CAST([] AS VARCHAR[])
                      ELSE string_split_regex(trim(text), '\\s+') END AS tk
               FROM documents),
             sized AS (
               SELECT doc_id, tk, len(tk) AS n_tokens FROM base),
             grams AS (
               SELECT doc_id,
                 unnest(range(0, n_tokens - ${ExactSubstrW - 1})) AS s,
                 unnest(list_transform(range(0, n_tokens - ${ExactSubstrW - 1}),
                   i -> array_to_string(tk[i+1:i+$ExactSubstrW], ' '))) AS g
               FROM sized WHERE n_tokens >= $ExactSubstrW),
             dup AS (SELECT g FROM grams GROUP BY g HAVING count(*) > 1),
             ds AS (SELECT doc_id, s FROM grams JOIN dup USING (g)),
             brk AS (
               SELECT doc_id, s,
                 CASE WHEN s - lag(s) OVER (PARTITION BY doc_id ORDER BY s)
                        >= $ExactSubstrW THEN 1 ELSE 0 END AS brk
               FROM ds),
             isl AS (
               SELECT doc_id, s, sum(brk)
                 OVER (PARTITION BY doc_id ORDER BY s) AS isl
               FROM brk),
             cov AS (
               SELECT doc_id, isl,
                 max(s) - min(s) + $ExactSubstrW AS cov
               FROM isl GROUP BY 1, 2),
             dd AS (
               SELECT doc_id, CAST(sum(cov) AS BIGINT) AS dup_tokens
               FROM cov GROUP BY 1)
           SELECT b.doc_id, CAST(b.n_tokens AS INT) AS n_tokens,
             coalesce(dd.dup_tokens, 0) AS dup_tokens,
             CASE WHEN b.n_tokens = 0 THEN 0.0
                  ELSE round(coalesce(dd.dup_tokens, 0) / b.n_tokens, 4)
             END AS dup_ratio,
             CAST((CASE WHEN b.n_tokens = 0 THEN 0.0
                        ELSE round(coalesce(dd.dup_tokens, 0) / b.n_tokens, 4)
                   END) < 0.5 AS INT) AS kept
           FROM sized b LEFT JOIN dd USING (doc_id)
           ORDER BY doc_id"""))

  /** All queries, in stable order. */
  val all: Seq[QueryDef] = Seq(
    q01, q02, q03, q04, q05, q06, q07, q08, q09, q10,
    q11, q12, q13, q14, q15, q16, q17, q18, q19, q20,
    q21, q22, q23, q24, q25, q26, q27, q28, q29, q30,
    q31, q32, q33, q34, q35, q36, q37, q38, q39, q40, q41, q42, q43,
    q44, q45, q46, q47, q48, q49, q50, q51, q52, q53, q54, q55, q56, q57, q58,
    q59, q60, q61, q62, q63, q64, q65)
}
