"""Deterministic distributed synthetic sequence generator.

Produces the canonical input table
    (doc_id string, tokens array<int>, n_tok int, source string)
with M4-like regimes (FIXTURES.md §1): seasonal groups H/D/W/M/Q/Y
(seasonality 24/7/52/12/4/1 — the reference's seas_dict at
fforma/utils/m4_data.py:14-25), a sparse intermittent group S, constant
and minimum-length edge cases, and a skewed (log-normal) n_tok
distribution with a few series ~100x the median to exercise the skew
path (north_rule; reference shuffle-balance analog at
fforma/base/trainer.py:88).

Determinism does NOT depend on partitioning: every doc's values come
from a counter-based RNG keyed on (seed, doc_index) (numpy Philox), so
the same doc_index yields the same series no matter which task builds
it. Generation is distributed via mapInPandas over spark.range — no
driver-side materialization, scales to any n_docs.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession

SCHEMA = "doc_id string, tokens array<int>, n_tok int, source string"

# group → (seasonality, horizon) as in the reference seas_dict
# (fforma/utils/m4_data.py:14-25)
GROUPS = {
    "H": (24, 48),
    "D": (7, 14),
    "W": (52, 13),
    "M": (12, 18),
    "Q": (4, 8),
    "Y": (1, 6),
    "S": (1, 8),  # sparse/intermittent extra group (FIXTURES.md)
}
_GROUP_LIST = list(GROUPS.items())


def _gen_one(seed: int, idx: int) -> tuple[str, np.ndarray, str]:
    """Generate one series deterministically from (seed, idx)."""
    rng = np.random.Generator(np.random.Philox(key=[seed, idx]))
    gname, (season, horizon) = _GROUP_LIST[idx % len(_GROUP_LIST)]
    doc_id = f"{gname}{idx}"

    # length: log-normal, floored at the min-length edge 3h+1;
    # every 97th series is a ~100x "whale" (skew path)
    base_len = int(np.exp(rng.normal(4.4, 0.6)))  # median ~81
    if idx % 97 == 3:
        base_len *= 100
    n = max(3 * horizon + 1 + (idx % 3) - 1, base_len)
    n = min(n, 200_000)

    if gname == "S":  # zero-inflated intermittent demand
        p = rng.uniform(0.05, 0.3)
        occur = rng.random(n) < p
        sizes = rng.poisson(20.0, n) + 1
        y = np.where(occur, sizes, 0).astype(np.float64)
        source = "synth-sparse"
    elif idx % 53 == 7:  # constant series edge case
        y = np.full(n, float(rng.integers(1, 500)))
        source = "synth-const"
    else:
        t = np.arange(n, dtype=np.float64)
        slope = rng.normal(0.0, 0.5)
        level = rng.uniform(100.0, 1000.0)
        seas_amp = rng.uniform(0.0, 0.3) * level
        seasonal = (
            seas_amp * np.sin(2 * np.pi * t / season) if season > 1 else 0.0
        )
        noise = rng.normal(0.0, 0.05 * level, n)
        y = level + slope * t + seasonal + noise
        source = f"synth-m4{gname.lower()}"

    tokens = np.clip(np.rint(y), 0, 2**31 - 1).astype(np.int32)
    return doc_id, tokens, source


def _batches(it: Iterator[pd.DataFrame], seed: int) -> Iterator[pd.DataFrame]:
    for pdf in it:
        rows = [_gen_one(seed, int(i)) for i in pdf["id"]]
        yield pd.DataFrame(
            {
                "doc_id": [r[0] for r in rows],
                "tokens": [r[1] for r in rows],
                "n_tok": np.array([len(r[1]) for r in rows], dtype=np.int32),
                "source": [r[2] for r in rows],
            }
        )


def synth_sequences(
    spark: SparkSession,
    n_docs: int = 256,
    seed: int = 42,
    partitions: int | None = None,
) -> DataFrame:
    """Distributed deterministic (doc_id, tokens, n_tok, source) table."""
    if partitions is None:
        partitions = max(spark.sparkContext.defaultParallelism, 1)
    base = spark.range(0, n_docs, 1, partitions)
    gen = lambda it: _batches(it, seed)  # noqa: E731
    return base.mapInPandas(gen, schema=SCHEMA)


def synth_sequences_pandas(n_docs: int = 256, seed: int = 42) -> pd.DataFrame:
    """Driver-side generator for numpy-oracle tests (identical values)."""
    rows = [_gen_one(seed, i) for i in range(n_docs)]
    return pd.DataFrame(
        {
            "doc_id": [r[0] for r in rows],
            "tokens": [r[1] for r in rows],
            "n_tok": np.array([len(r[1]) for r in rows], dtype=np.int32),
            "source": [r[2] for r in rows],
        }
    )


DOCS_SCHEMA = "doc_id string, text string, source string, n_chars int"

_DOC_VOCAB = 30_000
_DUP_EVERY = 5  # every 5th doc is a near-duplicate of its block head
_MUTATE_FRAC = 0.1


def _word(i: int) -> str:
    """Deterministic pseudo-word for vocab id i (letters only, so the
    whitespace tokenizer and shingle ops see a clean corpus)."""
    chars = []
    v = (i * 2654435761) % (26**5)
    for _ in range(5):
        chars.append(chr(97 + v % 26))
        v //= 26
    return "".join(chars)


def _draw_word_ids(rng: np.random.Generator) -> np.ndarray:
    """Topic-mixture word draw (the shape of real corpora): ~25% of
    positions come from a small global head pool (stopword-like
    sharing across ALL docs), the rest from a doc-specific topic
    window of the vocab. Pure-zipf draws make every doc majority-
    identical in its head words, which degenerates every signature
    scheme (minhash minima, simhash majority bits) to near-all-pairs —
    that benchmarks the corpus, not the operator."""
    n = max(20, int(np.exp(rng.normal(4.3, 0.5))))
    n = min(n, 2000)
    head = rng.zipf(1.7, n) % 200                      # global pool
    start = int(rng.integers(0, _DOC_VOCAB - 512))     # topic window
    topic = start + rng.integers(0, 512, n)
    use_head = rng.random(n) < 0.25
    return np.where(use_head, head, topic) % _DOC_VOCAB


def _gen_doc(seed: int, idx: int) -> tuple[str, str, str]:
    """One deterministic document from (seed, idx). Docs with
    idx % _DUP_EVERY == _DUP_EVERY-1 are near-duplicates of their block
    head (same draw, ~10% of word positions mutated) — a controlled dup
    rate for the dedup pipeline bench."""
    key_seed = seed + 1_000_003
    parent = idx - (idx % _DUP_EVERY)
    is_dup = idx % _DUP_EVERY == _DUP_EVERY - 1 and parent != idx
    rng = np.random.Generator(np.random.Philox(key=[key_seed, idx]))
    if is_dup:
        rng_p = np.random.Generator(np.random.Philox(key=[key_seed, parent]))
        ids = _draw_word_ids(rng_p)
        k = max(1, int(len(ids) * _MUTATE_FRAC))
        pos = rng.choice(len(ids), size=k, replace=False)
        ids = ids.copy()
        ids[pos] = rng.integers(0, _DOC_VOCAB, k)
        source = "synth-neardup"
    else:
        ids = _draw_word_ids(rng)
        source = "synth-base"
    text = " ".join(_word(int(i)) for i in ids)
    return str(idx), text, source


def _doc_batches(it: Iterator[pd.DataFrame], seed: int) -> Iterator[pd.DataFrame]:
    for pdf in it:
        rows = [_gen_doc(seed, int(i)) for i in pdf["id"]]
        yield pd.DataFrame(
            {
                "doc_id": [r[0] for r in rows],
                "text": [r[1] for r in rows],
                "source": [r[2] for r in rows],
                "n_chars": np.array([len(r[1]) for r in rows], dtype=np.int32),
            }
        )


def synth_documents(
    spark: SparkSession,
    n_docs: int = 256,
    seed: int = 42,
    partitions: int | None = None,
) -> DataFrame:
    """Distributed deterministic documents corpus with a controlled
    ~20% near-duplicate rate — the input for benching the dedup
    pipeline at scale (counter-based Philox per doc: partitioning-
    independent, no driver materialization)."""
    if partitions is None:
        partitions = max(spark.sparkContext.defaultParallelism, 1)
    base = spark.range(0, n_docs, 1, partitions)
    gen = lambda it: _doc_batches(it, seed)  # noqa: E731
    return base.mapInPandas(gen, schema=DOCS_SCHEMA)


EMB_SCHEMA = "vec_id long, embedding array<float>, label int"

_EMB_DIM = 64
_EMB_CLUSTERS = 64


def _emb_batches(it: Iterator[pd.DataFrame], seed: int) -> Iterator[pd.DataFrame]:
    for pdf in it:
        ids = pdf["id"].to_numpy()
        embs, labels = [], []
        for i in ids:
            rng = np.random.Generator(np.random.Philox(key=[seed + 7, int(i)]))
            c = int(i) % _EMB_CLUSTERS
            center_rng = np.random.Generator(
                np.random.Philox(key=[seed + 11, c])
            )
            center = center_rng.normal(0.0, 1.0, _EMB_DIM)
            v = center + rng.normal(0.0, 0.6, _EMB_DIM)
            embs.append(v.astype(np.float32))
            labels.append(c)
        yield pd.DataFrame(
            {
                "vec_id": ids.astype(np.int64),
                "embedding": embs,
                "label": np.array(labels, dtype=np.int32),
            }
        )


def synth_embeddings(
    spark: SparkSession,
    n_vecs: int = 1024,
    seed: int = 42,
    partitions: int | None = None,
) -> DataFrame:
    """Deterministic clustered embeddings (64 Gaussian clusters in
    R^64) for benching the ANN operators at scale: cluster structure
    gives LSH/IVF recall something real to find; counter-based Philox
    per vec keeps generation partitioning-independent."""
    if partitions is None:
        partitions = max(spark.sparkContext.defaultParallelism, 1)
    base = spark.range(0, n_vecs, 1, partitions)
    gen = lambda it: _emb_batches(it, seed)  # noqa: E731
    return base.mapInPandas(gen, schema=EMB_SCHEMA)
