package graft.queries

/** DuckDB SQL that REPLAYS the q29 span pipeline end-to-end — the
  * last formerly rows-only production query gets a freestanding
  * oracle. The replay mirrors each stage of
  * [[graft.stages.Extraction.pipeline]] over the synthetic span table
  * [[Queries.documentsAsSpans]] builds from `documents`:
  *
  *  - C1 ordered literal replace + F6 blank-span drop per token
  *    (lib/ocr_step.py:245-262 semantics, DefaultReplaceDict);
  *  - line grouping by the `line://b0/lN` parent ref with the
  *    min-line-length gate (lib/ocr_model.py:203-214);
  *  - W3 de-hyphenation wrap merge (lib/ocr_step.py:472-494) as a
  *    `list_reduce` fold — DuckDB 1.0 drops LIST fields from struct
  *    accumulators fed back into the lambda, so the emitted lines
  *    accumulate in a chr(1)-joined VARCHAR instead (the corpus text
  *    is whitespace-tokenized, so 0x01 cannot occur in a line); the
  *    fold carries the reference's in-place-rewrite quirk (the popped
  *    first token rewrites the NEXT line before its own visit) and
  *    the drop-on-empty-next quirk, fuzz-verified on 500 random
  *    hyphen-heavy line lists against an independent Python port;
  *  - C4 charset sanitize (BadChars delete, ſ→s, keep len>1 tokens);
  *  - dense-line filter, word count, E2 deterministic error lexicon
  *    (TextRules.Lexicon + the letters/vowel/len>=4 well-formedness
  *    heuristic — \pL mirrors Character.isLetter);
  *  - A3 hit ratio with PYTHON round-half-even replayed in exact
  *    integer arithmetic: scale by 10^5, divide with explicit
  *    tie-to-even on the remainder. Safe because a scale-3 tie of
  *    (n-e)*100/n forces the denominator (in lowest terms) to a
  *    power of two, which is binary-exact in double, and non-tie
  *    rationals sit >= 1/(2000n) from tie boundaries — far beyond
  *    the double's 1-ulp error — so half-even on the exact rational
  *    equals Python round() on the computed double for any n < 10^9.
  *
  * `array_to_string` returns NULL on empty lists in DuckDB 1.0 —
  * every join of a possibly-empty list is coalesced to ''.
  */
object PipelineOracleSql {

  val q29Sql: String = """
WITH base AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id,
         string_split_regex(trim(text), '\s+') AS tk
  FROM documents),
sp AS (
  SELECT doc_id,
    list_filter(
      list_transform(tk, (t, i) -> {'txt': replace(replace(replace(t, 'ic)', 'ich'), 's<', 'sc'), '<', 'c'),
        'ln': (i - 1) // 8}),
      s -> s.txt <> '') AS sp
  FROM base),
li AS (
  SELECT doc_id, len(sp) AS n_spans,
    CASE WHEN len(sp) = 0 THEN CAST([] AS VARCHAR[]) ELSE
      list_filter(
        list_transform(range(0, list_max(list_transform(sp, s -> s.ln)) + 1),
          b -> coalesce(array_to_string(
            list_transform(list_filter(sp, s -> s.ln = b), s -> s.txt), ' '), '')),
        c -> length(c) >= 2)
    END AS lc
  FROM sp),
fo AS (
  SELECT doc_id, n_spans, lc,
    CASE WHEN len(lc) <= 1 THEN NULL ELSE list_reduce(
      list_prepend({'o': '', 'c': lc[1]},
        list_transform(lc[2:], x -> {'o': x, 'c': ''})),
      (a, e) -> CASE
        WHEN a.c LIKE '%-' THEN
          CASE WHEN len(list_filter(string_split_regex(e.o, '\s+'), t -> t <> '')) = 0
            THEN {'o': a.o, 'c': e.o}
            ELSE {'o': a.o || chr(1) || substr(a.c, 1, length(a.c) - 1) || (list_filter(string_split_regex(e.o, '\s+'), t -> t <> ''))[1],
              'c': array_to_string((list_filter(string_split_regex(e.o, '\s+'), t -> t <> ''))[2:], ' ')}
          END
        ELSE {'o': a.o || chr(1) || a.c, 'c': e.o}
      END) END AS fd
  FROM li),
wr AS (
  SELECT doc_id, n_spans, len(lc) AS n_lines_in,
    CASE WHEN fd IS NULL THEN lc
         ELSE string_split(fd.o || chr(1) || fd.c, chr(1))[2:] END AS norm
  FROM fo),
sa AS (
  SELECT doc_id, n_spans, n_lines_in,
    list_filter(
      list_transform(norm, l -> coalesce(array_to_string(
        list_filter(
          string_split_regex(
            replace(regexp_replace(trim(l), '[0-9“„"''?!*.;:=\]\[()|-]', '', 'g'), 'ſ', 's'),
            '\s+'),
          t -> length(t) > 1), ' '), '')),
      l -> length(l) > 2) AS dense
  FROM wr),
fin AS (
  SELECT doc_id, n_spans, n_lines_in, len(dense) AS n_lines_out,
    coalesce(array_to_string(dense, ' '), '') AS ws
  FROM sa),
tok AS (
  SELECT doc_id, n_spans, n_lines_in, n_lines_out,
    CASE WHEN ws = '' THEN CAST([] AS VARCHAR[])
         ELSE list_filter(string_split_regex(ws, '\s+'), t -> t <> '') END AS wt
  FROM fin),
cnt AS (
  SELECT doc_id, n_spans, n_lines_in, n_lines_out, len(wt) AS nw,
    len(list_filter(wt, t ->
      NOT (lower(t) IN ('der','die','das','und','in','von','zu','mit','auf','ist','im','den','des','dem','ein','eine','einer','als','auch','an','es','sich','nach','bei','aus','am','um','so','wie','nicht','nur','vor','zum','zur','durch','man','war','sind','wird','noch','oder','aber','wenn','sie','er','wir','ich')
           OR (regexp_matches(lower(t), '^\pL+$')
               AND regexp_matches(lower(t), '[aeiouäöüy]')
               AND length(t) >= 4)))) AS ne
  FROM tok),
rt AS (
  SELECT doc_id, n_spans, nw, n_lines_in, n_lines_out,
    least(ne, nw) AS e,
    (nw - least(ne, nw)) * 100000 AS nn
  FROM cnt)
SELECT doc_id, n_spans,
  CASE WHEN nw = 0 THEN 0 ELSE nw END AS n_words,
  CASE WHEN nw = 0 THEN 0 ELSE n_lines_in END AS n_lines_in,
  CASE WHEN nw = 0 THEN 0 ELSE n_lines_out END AS n_lines_out,
  CASE WHEN nw = 0 THEN -1.0
       WHEN nw <= e THEN 0.0
       ELSE (nn // nw + CASE WHEN (nn % nw) * 2 > nw THEN 1
                             WHEN (nn % nw) * 2 = nw THEN (nn // nw) % 2
                             ELSE 0 END) / 1000.0
  END AS hit_ratio
FROM rt ORDER BY doc_id"""
}
