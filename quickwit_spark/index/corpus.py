"""Deterministic synthetic source-code corpus generator (FIXTURES.md F1).

Generates the Iceberg-shaped input table from BASELINE.json's input_hint:
    (repo:string, path:string, commit:string, lang:string, content:string)
plus a sha256(content) column used for the per-row fetch invariant.

Content derivation is a pure function of (seed, doc_index) via a
counter-based splitmix64 hash — fully deterministic regardless of Spark
partitioning, and vectorized (numpy) inside mapInPandas. Vocabulary term
frequencies follow a power law (log-uniform rank sampling ~ Zipf(1)), so
the term-df spectrum exercises skew handling (hot-term salting).
"""

from __future__ import annotations

import hashlib
import random

import numpy as np
import pandas as pd

LANGS = ["python", "rust", "java", "go", "js", "c", "cpp", "md"]
# zipf-ish language weights
_LANG_CUM = np.cumsum(np.array([1 / (i + 1) for i in range(len(LANGS))]))
_LANG_CUM = _LANG_CUM / _LANG_CUM[-1]

_MASK = np.uint64(0xFFFFFFFFFFFFFFFF)


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 over uint64 arrays (public-domain algorithm)."""
    with np.errstate(over="ignore"):
        z = (x + np.uint64(0x9E3779B97F4A7C15)) & _MASK
        z = ((z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & _MASK
        z = ((z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & _MASK
        return z ^ (z >> np.uint64(31))


_BASE_WORDS = [
    "get", "set", "run", "init", "load", "parse", "merge", "split", "index",
    "query", "score", "token", "batch", "shard", "block", "cache", "fetch",
    "write", "read", "sync", "async", "state", "config", "result", "error",
    "value", "count", "total", "offset", "limit", "buffer", "stream", "codec",
    "field", "term", "doc", "store", "meta", "plan", "exec", "sort", "hash",
    "key", "node", "tree", "list", "map", "queue", "stack", "heap", "graph",
    "edge", "path", "file", "line", "char", "byte", "word", "text", "data",
    "time", "date", "user", "group", "role", "perm", "auth", "token2",
    "session", "request", "response", "header", "body", "status", "retry",
    "backoff", "timeout", "worker", "thread", "pool", "task", "job", "stage",
    "phase", "step", "hook", "event", "signal", "handler", "filter", "reduce",
    "collect", "emit", "flush", "commit", "rollback", "snapshot", "version",
]


def build_vocab(seed: int, size: int = 4000) -> list[str]:
    """Deterministic vocabulary of pre-styled code identifiers."""
    rng = random.Random(seed)
    words = list(_BASE_WORDS)
    vocab: list[str] = []
    styles = ("camel", "snake", "upper", "plain", "pascal", "hexlit", "num")
    while len(vocab) < size:
        a = rng.choice(words)
        b = rng.choice(words)
        style = rng.choice(styles)
        if style == "camel":
            vocab.append(a + b.capitalize())
        elif style == "snake":
            vocab.append(f"{a}_{b}")
        elif style == "upper":
            vocab.append(f"{a.upper()}_{b.upper()}")
        elif style == "pascal":
            vocab.append(a.capitalize() + b.capitalize())
        elif style == "hexlit":
            vocab.append("0x%06x" % rng.getrandbits(24))
        elif style == "num":
            vocab.append(str(rng.randrange(10, 99999)))
        else:
            vocab.append(a + str(rng.randrange(0, 30)))
    # dedup preserving order, pad if needed
    seen = set()
    out = []
    for w in vocab:
        if w not in seen:
            seen.add(w)
            out.append(w)
    i = 0
    while len(out) < size:
        out.append(f"ident{i}Extra_{i}")
        i += 1
    return out[:size]


def generate_batch(ids: np.ndarray, seed: int, vocab: np.ndarray,
                   avg_tokens: int = 80, skew: bool = False) -> pd.DataFrame:
    """Generate corpus rows for the given doc indices, vectorized.

    skew=True produces the score-skewed variant that rewards block-max
    pruning (BM25 score variance across docs): log-normal doc lengths
    (median avg_tokens, sigma 1.0 — two orders of magnitude spread) and
    bursty in-doc term repetition (Markov repeat chains, geometric run
    lengths, mean ~2.5) so per-posting tf is Zipf-like instead of ~1.
    skew=False is byte-identical to the round-1 corpus.
    """
    ids = ids.astype(np.uint64)
    n = len(ids)
    V = len(vocab)
    h0 = splitmix64(ids ^ np.uint64(seed))
    h1 = splitmix64(h0)
    h2 = splitmix64(h1)

    lang_u = (h0 >> np.uint64(11)).astype(np.float64) / float(1 << 53)
    lang_idx = np.searchsorted(_LANG_CUM, lang_u, side="right").clip(0, len(LANGS) - 1)
    if skew:
        # log-normal lengths via Box-Muller on two counter-hash uniforms
        u1 = ((splitmix64(h1 ^ np.uint64(0xA5A5)) >> np.uint64(11))
              .astype(np.float64) / float(1 << 53)).clip(1e-12, 1.0)
        u2 = ((splitmix64(h1 ^ np.uint64(0x5A5A)) >> np.uint64(11))
              .astype(np.float64) / float(1 << 53))
        z = np.sqrt(-2.0 * np.log(u1)) * np.cos(2.0 * np.pi * u2)
        ntok = np.exp(np.log(float(avg_tokens)) + 1.0 * z)
        ntok = np.round(ntok).clip(8, 64 * avg_tokens).astype(np.int64)
    else:
        ntok = (avg_tokens // 2 + (h1 % np.uint64(avg_tokens))).astype(np.int64)

    # token ids: counter-based hashing, log-uniform rank => zipf-ish df
    total = int(ntok.sum())
    doc_rep = np.repeat(np.arange(n), ntok)
    pos_in_doc = np.arange(total) - np.repeat(
        np.concatenate([[0], np.cumsum(ntok)[:-1]]), ntok)
    ctr = splitmix64(
        (ids[doc_rep] * np.uint64(1_000_003)) ^
        (pos_in_doc.astype(np.uint64) + np.uint64(seed) * np.uint64(7919)))
    u = (ctr >> np.uint64(11)).astype(np.float64) / float(1 << 53)
    ranks = np.floor(np.power(float(V), u)).astype(np.int64) - 1
    ranks = ranks.clip(0, V - 1)
    if skew and total:
        # bursty repetition: position j repeats position j-1's term with
        # p=0.6 (forced fresh at doc starts). rank[j] = fresh rank at the
        # last non-repeat position in the same doc — a vectorized Markov
        # scan via maximum.accumulate over "last fresh index".
        ru = ((splitmix64(ctr ^ np.uint64(0xB0B0)) >> np.uint64(11))
              .astype(np.float64) / float(1 << 53))
        fresh = (ru >= 0.6) | (pos_in_doc == 0)
        idx = np.where(fresh, np.arange(total), -1)
        idx = np.maximum.accumulate(idx)
        ranks = ranks[idx]

    words = vocab[ranks]
    # assemble content per doc: one C-level join per doc
    contents = []
    bounds = np.concatenate([[0], np.cumsum(ntok)])
    wl = words.tolist()
    for i in range(n):
        toks = wl[bounds[i]:bounds[i + 1]]
        uid = "%08x-%04x-%04x-%04x-%012x" % (
            int(h2[i] & np.uint64(0xFFFFFFFF)),
            int((h2[i] >> np.uint64(32)) & np.uint64(0xFFFF)),
            int((h2[i] >> np.uint64(48)) & np.uint64(0xFFFF)),
            int(h1[i] & np.uint64(0xFFFF)),
            int(h1[i] >> np.uint64(16)) & 0xFFFFFFFFFFFF,
        )
        contents.append("// id " + uid + "\n" + " ".join(toks))

    repo = [f"org{int(i) % 37}/repo{int(i) % 101}" for i in ids]
    path = [f"src/{vocab[int(h % np.uint64(V))]}/f{int(i)}.{LANGS[li][:2]}"
            for i, h, li in zip(ids, h1, lang_idx)]
    commit = [hashlib.sha1(f"{r}:{p}:{seed}".encode()).hexdigest()
              for r, p in zip(repo, path)]
    sha = [hashlib.sha256(c.encode()).hexdigest() for c in contents]
    return pd.DataFrame({
        "repo": repo,
        "path": path,
        "commit": commit,
        "lang": [LANGS[i] for i in lang_idx],
        "content": contents,
        "sha256": sha,
    })


CORPUS_SCHEMA = ("repo string, path string, commit string, lang string, "
                 "content string, sha256 string")


def corpus_df(spark, n_docs: int, seed: int = 42, num_partitions: int | None = None,
              avg_tokens: int = 80, skew: bool = False):
    """Distributed deterministic corpus as a Spark DataFrame."""
    vocab = np.array(build_vocab(seed), dtype=object)
    parts = num_partitions or max(1, min(n_docs // 1000, 64))

    def gen(iterator):
        for pdf in iterator:
            ids = pdf["id"].to_numpy()
            if len(ids):
                yield generate_batch(ids, seed, vocab, avg_tokens, skew=skew)

    return (spark.range(0, n_docs, 1, parts)
            .mapInPandas(gen, schema=CORPUS_SCHEMA))


def corpus_pandas(n_docs: int, seed: int = 42, avg_tokens: int = 80,
                  skew: bool = False) -> pd.DataFrame:
    """Local (driver-side) corpus for unit tests and the pure-Python oracle."""
    vocab = np.array(build_vocab(seed), dtype=object)
    return generate_batch(np.arange(n_docs, dtype=np.uint64), seed, vocab,
                          avg_tokens, skew=skew)
