"""Compressed block tier: delta-of-delta (integer tokens) and
Gorilla-style XOR (float64 tier values) codecs.

North_rule addition with no reference counterpart (SURVEY.md §2.12):
numpy bit-packing inside scalar pandas UDFs, array<int> → binary, with
the exact round-trip invariant decompress(compress(x)) == x — the
BASELINE per-row invariant.

Codec design (public formats: Facebook Gorilla VLDB'15 §4.1, Parquet
DELTA_BINARY_PACKED):
* ints  — store n, v0, v1 raw; zigzag(delta-of-delta) bit-packed in
  blocks of 256 with a per-block bit width byte. Fully vectorized via
  np.unpackbits/packbits (no per-value Python loop).
* floats — XOR with previous value; per value a control byte encodes
  (first nonzero byte, span length) and only the nonzero byte span is
  stored (byte-aligned simplification of Gorilla's bit-level window).

Everything is per-row (per series) — embarrassingly parallel, no
shuffle; Arrow moves the bytes.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F

_BLOCK = 256
_MAGIC_INT = 0xD0D1
_MAGIC_FLT = 0x60F1


def _zigzag(v: np.ndarray) -> np.ndarray:
    return ((v >> 63) ^ (v << 1)).astype(np.uint64)


def _unzigzag(u: np.ndarray) -> np.ndarray:
    u = u.astype(np.uint64)
    return ((u >> np.uint64(1)) ^ -(u & np.uint64(1)).astype(np.int64).astype(np.uint64)).astype(
        np.int64
    )


def _pack_bits(vals: np.ndarray, width: int) -> bytes:
    """Pack uint64 values into ``width``-bit big-endian fields."""
    if width == 0:
        return b""
    be = vals.astype(">u8").view(np.uint8).reshape(-1, 8)
    bits = np.unpackbits(be, axis=1)[:, 64 - width:]
    return np.packbits(bits.ravel()).tobytes()


def _unpack_bits(buf: np.ndarray, n: int, width: int) -> np.ndarray:
    """Inverse of _pack_bits for n values."""
    if width == 0:
        return np.zeros(n, dtype=np.uint64)
    bits = np.unpackbits(buf)[: n * width].reshape(n, width)
    full = np.zeros((n, 64), dtype=np.uint8)
    full[:, 64 - width:] = bits
    return np.packbits(full, axis=1).view(">u8").ravel().astype(np.uint64)


def dod_encode(arr: np.ndarray) -> bytes:
    """Delta-of-delta encode an int sequence to bytes."""
    v = np.asarray(arr, dtype=np.int64)
    n = len(v)
    head = [np.uint32(_MAGIC_INT).tobytes(), np.int64(n).tobytes()]
    if n == 0:
        return b"".join(head)
    head.append(v[0].tobytes())
    if n == 1:
        return b"".join(head)
    head.append(v[1].tobytes())
    if n == 2:
        return b"".join(head)
    d2 = np.diff(np.diff(v))
    z = _zigzag(d2)
    chunks = []
    for i in range(0, len(z), _BLOCK):
        blk = z[i : i + _BLOCK]
        width = int(blk.max()).bit_length() if blk.any() else 0
        chunks.append(np.uint8(width).tobytes())
        chunks.append(_pack_bits(blk, width))
    return b"".join(head + chunks)


def dod_decode(buf: bytes) -> np.ndarray:
    b = np.frombuffer(buf, dtype=np.uint8)
    magic = b[:4].view(np.uint32)[0]
    if magic != _MAGIC_INT:
        raise ValueError("not a dod block")
    n = int(b[4:12].view(np.int64)[0])
    if n == 0:
        return np.empty(0, dtype=np.int64)
    v0 = int(b[12:20].view(np.int64)[0])
    if n == 1:
        return np.array([v0], dtype=np.int64)
    v1 = int(b[20:28].view(np.int64)[0])
    if n == 2:
        return np.array([v0, v1], dtype=np.int64)
    off = 28
    z = np.empty(n - 2, dtype=np.uint64)
    got = 0
    while got < n - 2:
        cnt = min(_BLOCK, n - 2 - got)
        width = int(b[off]); off += 1
        nbytes = (cnt * width + 7) // 8
        z[got : got + cnt] = _unpack_bits(b[off : off + nbytes], cnt, width)
        off += nbytes
        got += cnt
    d2 = _unzigzag(z)
    d = np.empty(n - 1, dtype=np.int64)
    d[0] = v1 - v0
    d[1:] = d[0] + np.cumsum(d2)
    out = np.empty(n, dtype=np.int64)
    out[0] = v0
    out[1:] = v0 + np.cumsum(d)
    return out


def xor_encode(arr: np.ndarray) -> bytes:
    """Gorilla-style XOR encode a float64 sequence (byte-aligned)."""
    v = np.asarray(arr, dtype=np.float64)
    n = len(v)
    head = [np.uint32(_MAGIC_FLT).tobytes(), np.int64(n).tobytes()]
    if n == 0:
        return b"".join(head)
    u = v.view(np.uint64)
    x = u.copy()
    x[1:] = u[1:] ^ u[:-1]
    bz = x.view(np.uint8).reshape(n, 8)  # little-endian byte lanes
    nz = bz != 0
    any_nz = nz.any(axis=1)
    first = np.where(any_nz, nz.argmax(axis=1), 0).astype(np.uint8)
    last = np.where(
        any_nz, 7 - nz[:, ::-1].argmax(axis=1), 0
    ).astype(np.uint8)
    span = np.where(any_nz, last - first + 1, 0).astype(np.uint8)
    control = (first << np.uint8(4)) | span
    lane = np.arange(8, dtype=np.uint8)
    keep = (lane >= first[:, None]) & (lane <= last[:, None]) & any_nz[:, None]
    payload = bz[keep]  # row-major → per-value spans in order
    return b"".join(head + [control.tobytes(), payload.tobytes()])


def xor_decode(buf: bytes) -> np.ndarray:
    b = np.frombuffer(buf, dtype=np.uint8)
    magic = b[:4].view(np.uint32)[0]
    if magic != _MAGIC_FLT:
        raise ValueError("not an xor block")
    n = int(b[4:12].view(np.int64)[0])
    if n == 0:
        return np.empty(0, dtype=np.float64)
    control = b[12 : 12 + n]
    first = (control >> 4).astype(np.int64)
    span = (control & 0x0F).astype(np.int64)
    payload = b[12 + n :]
    lane = np.arange(8, dtype=np.int64)
    keep = (lane >= first[:, None]) & (lane < (first + span)[:, None])
    bz = np.zeros((n, 8), dtype=np.uint8)
    bz[keep] = payload[: keep.sum()]
    x = bz.view(np.uint64).ravel()
    u = np.empty(n, dtype=np.uint64)
    u[0] = x[0]
    for i in range(1, n):  # xor prefix is sequential; n per series is fine
        u[i] = u[i - 1] ^ x[i]
    # vectorized alternative for long series
    return u.view(np.float64).copy()


def _xor_prefix(x: np.ndarray) -> np.ndarray:
    """Vectorized XOR prefix scan (log-steps doubling)."""
    u = x.copy()
    shift = 1
    n = len(u)
    while shift < n:
        u[shift:] ^= u[:-shift]
        shift *= 2
    return u


def xor_decode_fast(buf: bytes) -> np.ndarray:
    """xor_decode with a log-step prefix scan instead of the loop."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if b[:4].view(np.uint32)[0] != _MAGIC_FLT:
        raise ValueError("not an xor block")
    n = int(b[4:12].view(np.int64)[0])
    if n == 0:
        return np.empty(0, dtype=np.float64)
    control = b[12 : 12 + n]
    first = (control >> 4).astype(np.int64)
    span = (control & 0x0F).astype(np.int64)
    payload = b[12 + n :]
    lane = np.arange(8, dtype=np.int64)
    keep = (lane >= first[:, None]) & (lane < (first + span)[:, None])
    bz = np.zeros((n, 8), dtype=np.uint8)
    bz[keep] = payload[: keep.sum()]
    return _xor_prefix(bz.view(np.uint64).ravel()).view(np.float64).copy()


# ---------------------------------------------------------------------------
# Spark bindings — scalar pandas UDFs (Arrow-batched, no per-row Python
# in the plan: one numpy call per series inside the batch loop)
# ---------------------------------------------------------------------------


def _compress_tokens(tokens: pd.Series) -> pd.Series:
    return tokens.map(lambda t: dod_encode(np.asarray(t, dtype=np.int64)))


def _decompress_tokens(blocks: pd.Series) -> pd.Series:
    return blocks.map(lambda b: dod_decode(b).astype(np.int32))


def _compress_floats(vals: pd.Series) -> pd.Series:
    return vals.map(lambda v: xor_encode(np.asarray(v, dtype=np.float64)))


def _decompress_floats(blocks: pd.Series) -> pd.Series:
    return blocks.map(lambda b: xor_decode_fast(b))


def compress_tokens_udf():
    """Scalar pandas UDF array<int> → binary (lazy: needs a session)."""
    return F.pandas_udf(_compress_tokens, "binary")


def decompress_tokens_udf():
    return F.pandas_udf(_decompress_tokens, "array<int>")


def compress_floats_udf():
    return F.pandas_udf(_compress_floats, "binary")


def decompress_floats_udf():
    return F.pandas_udf(_decompress_floats, "array<double>")


def compressed_blocks(seq_df: DataFrame) -> DataFrame:
    """Per-doc compressed block + stats (the CB tier of SURVEY §7.0)."""
    from fforma_spark.util import ensure_parallelism

    seq_df = ensure_parallelism(seq_df)
    return (
        seq_df.select(
            "doc_id",
            "n_tok",
            compress_tokens_udf()("tokens").alias("block"),
        )
        .withColumn("comp_bytes", F.length("block"))
        .withColumn("raw_bytes", (F.col("n_tok").cast("long") * 4))
    )


def dod_bytes_sql(seq_sql: str) -> str:
    """DuckDB oracle for the EXACT dod-codec compressed byte count.

    The codec's layout is deterministic: 12-byte header (+8 per stored
    raw head value, up to 2), then per 256-value block of zigzagged
    delta-of-deltas one width byte + ceil(cnt*width/8) payload bytes,
    width = bit_length(max(block)). All of that is pure integer math
    over the token list, so the oracle recomputes it in SQL and the
    driver value-hashes the codec's real output lengths against it."""
    d2 = (
        "CAST(tokens[i] AS BIGINT) + CAST(tokens[i+2] AS BIGINT)"
        " - 2 * CAST(tokens[i+1] AS BIGINT)"
    )
    zz = (
        f"CASE WHEN ({d2}) >= 0 THEN 2 * ({d2})"
        f" ELSE -2 * ({d2}) - 1 END"
    )
    wmax = "list_max(list_slice(z, b * 256 + 1, least((b + 1) * 256, nz)))"
    width = (
        f"len(list_filter(generate_series(0, 39), "
        f"p -> {wmax} >= CAST(pow(2, p) AS BIGINT)))"
    )
    blocks = (
        f"list_sum(list_transform(generate_series(0, (nz + 255) // 256 - 1), "
        f"b -> 1 + (least(256, nz - b * 256) * ({width}) + 7) // 8))"
    )
    return f"""
        SELECT doc_id, n_tok,
               CAST(n_tok AS BIGINT) * 4 AS raw_bytes,
               CAST(CASE WHEN n_tok = 0 THEN 12
                         WHEN n_tok = 1 THEN 20
                         WHEN n_tok = 2 THEN 28
                         ELSE 28 + {blocks} END AS BIGINT) AS comp_bytes
        FROM (
            SELECT doc_id, n_tok, len(z) AS nz, z FROM (
                SELECT doc_id, n_tok,
                       list_transform(
                           generate_series(1, greatest(n_tok - 2, 0)),
                           i -> CAST({zz} AS BIGINT)) AS z
                FROM ({seq_sql}) seqs
            ) zs
        ) b
    """


def roundtrip_check(seq_df: DataFrame) -> DataFrame:
    """decompress(compress(tokens)) == tokens, per doc — the BASELINE
    per-row invariant, evaluated distributed."""
    from fforma_spark.util import ensure_parallelism

    seq_df = ensure_parallelism(seq_df)
    cb = seq_df.select(
        "doc_id",
        "tokens",
        decompress_tokens_udf()(compress_tokens_udf()("tokens")).alias("_rt"),
    )
    return cb.select(
        "doc_id",
        (
            (F.size("tokens") == F.size("_rt"))
            & F.forall(
                F.zip_with("tokens", "_rt", lambda a, b: a.eqNullSafe(b)),
                lambda x: x,
            )
        ).alias("ok"),
    )
