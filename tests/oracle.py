"""Pure-numpy brute-force oracles — the ``ExhaustiveSearch`` analog the
reference tests compare against (/root/reference/test/invfiles.jl:21,127)."""

from __future__ import annotations

import math
from collections import Counter


def tokenize_ws(text: str) -> list[str]:
    return [t.lower() for t in text.split() if t]


def build_corpus_stats(texts: dict[int, str]):
    tfs = {d: Counter(tokenize_ws(t)) for d, t in texts.items()}
    df = Counter()
    for c in tfs.values():
        df.update(c.keys())
    n = len(texts)
    avgdl = sum(sum(c.values()) for c in tfs.values()) / max(n, 1)
    return tfs, df, n, avgdl


def bm25_scores(texts: dict[int, str], query: str, k1=1.2, b=0.75, t: int = 1):
    tfs, df, n, avgdl = build_corpus_stats(texts)
    q = Counter(tokenize_ws(query))
    scores: dict[int, float] = {}
    for doc, c in tfs.items():
        dl = sum(c.values())
        s = 0.0
        hits = 0
        for term, qtf in q.items():
            tf = c.get(term, 0)
            if tf == 0 or term not in df:
                continue
            hits += 1
            idf = math.log(1.0 + (n - df[term] + 0.5) / (df[term] + 0.5))
            sat = tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))
            s += qtf * idf * sat
        if hits >= max(t, 1):
            scores[doc] = s
    return scores


def cosine_dists(texts: dict[int, str], query: str):
    tfs, _, _, _ = build_corpus_stats(texts)
    q = Counter(tokenize_ws(query))
    qn = math.sqrt(sum(v * v for v in q.values()))
    out: dict[int, float] = {}
    for doc, c in tfs.items():
        dn = math.sqrt(sum(v * v for v in c.values()))
        dot = sum((q[t] / qn) * (c[t] / dn) for t in q if t in c)
        if dot > 0:
            out[doc] = 1.0 - dot
    return out


def set_dist(name: str, isize: int, s1: int, s2: int) -> float:
    # closed forms from /root/reference/src/binvfile.jl:41-44
    if name == "intersection":
        return 1.0 - isize / max(s1, s2)
    if name == "dice":
        return 1.0 - 2.0 * isize / (s1 + s2)
    if name == "jaccard":
        return 1.0 - isize / (s1 + s2 - isize)
    if name == "cosine_set":
        return 1.0 - isize / math.sqrt(s1 * s2)
    raise ValueError(name)


def set_dists(texts: dict[int, str], query: str, name: str, t: int = 1):
    q = set(tokenize_ws(query))
    out: dict[int, float] = {}
    for doc, txt in texts.items():
        d = set(tokenize_ws(txt))
        isize = len(q & d)
        if isize >= max(t, 1):
            out[doc] = set_dist(name, isize, len(q), len(d))
    return out


def topk_of(scores: dict[int, float], k: int, ascending: bool):
    items = sorted(scores.items(), key=lambda kv: (kv[1] if ascending else -kv[1], kv[0]))
    return items[:k]
