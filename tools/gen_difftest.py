#!/usr/bin/env python3
"""Cross-language differential fixtures for the wrap/sanitize chain.

Replicates the reference's textlines2data semantics
(/root/reference/lib/ocr_step.py:449-514) in Python — the same
in-place-mutation and drop quirks — over seeded random line lists, and
writes cases + expected outputs to
src/test/resources/difftest/textlines_cases.json. The Scala engine
(TextRules.textlinesToData) must reproduce every case byte-for-byte
(DiffTestSpec).
"""
import json
import random

BAD = set('0123456789“„"\'?!*.;:-=[]()|')

def sanitize_wraps(lines):
    normalized = []
    n = 0
    for i, line in enumerate(lines):
        if i < len(lines) - 1 and line.endswith('-'):
            nxt = lines[i + 1]
            if len(nxt.strip()) == 0:
                continue
            toks = nxt.split()
            first = toks.pop(0)
            lines[i + 1] = ' '.join(toks)
            line = line[:-1] + first
            n += 1
        normalized.append(line)
    return normalized, n

def sanitize_chars(lines):
    out = []
    for line in lines:
        text = ''.join(c for c in line.strip() if c not in BAD)
        if '..' in text:
            text = text.replace('..', '')
        if '  ' in text:
            text = text.replace('  ', ' ')
        if 'ſ' in text:
            text = text.replace('ſ', 's')
        out.append(' '.join(t for t in text.split() if len(t) > 1))
    return out

def textlines2data(lines, minlen=2):
    non_empty = [l for l in lines if len(l) > 0]
    normalized, n_norm = sanitize_wraps(non_empty)
    filtered = sanitize_chars(normalized)
    n_sparse = 0
    dense = []
    for f in filtered:
        if len(f) > minlen:
            dense.append(f)
        else:
            n_sparse += 1
    return (' '.join(dense), len(lines), n_norm, n_sparse, len(dense))

TOKENS = ['Die', 'Verſammlung', 'der', 'iſt.', 'a3"', '1849', '-', 'zu-',
          'Wort-', '..', 'x', 'ab', '  ', '', 'ic)', '(Amtlich)', '|.',
          'Stadt-', 'e3-"', 'ab-', 'ſ', 'N.', '—', 'I',
          # Unicode-whitespace carriers: Python str.split()/strip()
          # treat NBSP (U+00A0), figure space (U+2007), line separator
          # (U+2028) and NEL (U+0085) as whitespace -- Java regex s-class
          # does not, which round 3 fixed in TextRules.splitWs; these
          # tokens keep that parity pinned by actual Python execution
          'Wort\u00a0zwei', '\u00a0\u00a0', 'a\u0085b',
          'links\u2007rechts', 'ober\u2028unter', '\u00a0rand']

SEPS = [' ', ' ', ' ', ' ', '\u00a0', '\u2007']

def rand_line(rng):
    n = rng.randint(0, 6)
    return rng.choice(SEPS).join(rng.choice(TOKENS) for _ in range(n))

def main():
    rng = random.Random(4242)
    cases = []
    for ci in range(600):
        n_lines = rng.randint(0, 12)
        lines = [rand_line(rng) for _ in range(n_lines)]
        # bias: force hyphen-end + empty-next patterns into some cases
        if ci % 5 == 0 and n_lines >= 2:
            lines[0] = lines[0] + '-'
            lines[1] = '   ' if ci % 10 == 0 else lines[1]
        ws, n_in, n_wraps, n_shorts, n_out = textlines2data(list(lines))
        cases.append({
            'lines': lines,
            'word_string': ws,
            'n_lines_in': n_in,
            'n_wraps': n_wraps,
            'n_shorts': n_shorts,
            'n_lines_out': n_out,
        })
    out = 'src/test/resources/difftest/textlines_cases.json'
    import os
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, 'w', encoding='utf-8') as f:
        json.dump(cases, f, ensure_ascii=False)
    print(f'wrote {len(cases)} cases to {out}')

if __name__ == '__main__':
    main()
