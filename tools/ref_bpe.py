#!/usr/bin/env python3
"""Independent BPE reference used ONCE to derive q63's VALUES oracle.

Implements the same published algorithm graft.text.Bpe implements —
Sennrich et al. (arXiv:1508.07909) learning with an end-of-word
sentinel, GPT-2-convention apply (lowest-rank pair first, left-to-right
non-overlapping) — from the paper, not from the Scala code, so the
pinned expectations are a genuine cross-check rather than a replay.

Run: python3 tools/ref_bpe.py   # prints the merge table + per-doc rows
"""
from collections import Counter

EOW = "</w>"

DOCS = [
    ("d1", "low low low low low"),
    ("d2", "lower lower"),
    ("d3", "newest newest newest newest newest newest"),
    ("d4", "widest widest widest"),
    ("d5", "low lower newest widest unseen"),
]
N_MERGES = 10
MIN_COUNT = 2


def learn(docs, n_merges, min_count):
    types = Counter()
    for _, text in docs:
        types.update(text.split())
    vocab = Counter()
    for w, c in types.items():
        vocab[tuple(list(w) + [EOW])] += c
    merges = []
    for _ in range(n_merges):
        pairs = Counter()
        for syms, c in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += c
        if not pairs:
            break
        # max count, ties to lexicographically smallest pair
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_count:
            break
        a, b = best[0]
        merges.append((a, b))
        nv = Counter()
        for syms, c in vocab.items():
            nv[tuple(merge_pair(syms, a, b))] += c
        vocab = nv
    return merges


def merge_pair(syms, a, b):
    out, j = [], 0
    while j < len(syms):
        if j < len(syms) - 1 and syms[j] == a and syms[j + 1] == b:
            out.append(a + b)
            j += 2
        else:
            out.append(syms[j])
            j += 1
    return out


def encode(word, ranks):
    syms = list(word) + [EOW]
    while len(syms) > 1:
        cands = [(ranks[(x, y)], (x, y))
                 for x, y in zip(syms, syms[1:]) if (x, y) in ranks]
        if not cands:
            break
        _, (a, b) = min(cands)
        syms = merge_pair(syms, a, b)
    return syms


if __name__ == "__main__":
    merges = learn(DOCS, N_MERGES, MIN_COUNT)
    ranks = {p: i for i, p in enumerate(merges)}
    print("merges:", merges)
    for did, text in DOCS:
        words = text.split()
        toks = [t for w in words for t in encode(w, ranks)]
        print(f"('{did}', {len(words)}, {len(toks)}, '{' '.join(toks)}'),")
