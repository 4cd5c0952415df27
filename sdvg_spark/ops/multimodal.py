"""Multimodal columns: opaque binary payloads + typed metadata, with
Arrow-batched decode / feature-extract / resize / frame-sample stages.

Design for 100 TB (the brief's training-data-pipeline shape): media
ride as ``binary`` columns with a typed metadata struct; all per-item
work runs in ``mapInPandas`` (one Arrow batch of byte payloads at a
time, never a row-at-a-time Python UDF), and batch size is bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch`` so executor memory is
payload-bound, not row-count-bound.

The actual image/audio codecs are NOT in this container, so the decode
step is pluggable: ``set_decoder`` installs a real one (e.g. Pillow) if
available; the default is a documented deterministic fake (content-
hash-seeded pixels) that keeps every downstream stage — schema,
partitioning, batch shapes, feature math — real and testable. The
entry points raise ``NotImplementedError`` only when a real codec is
explicitly requested and missing.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from typing import Any

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_META_SCHEMA = (
    "struct<format:string,width:int,height:int,channels:int,"
    "duration_ms:bigint,sample_rate:int>"
)

_DECODERS: dict[str, Callable[[bytes, dict[str, Any]], np.ndarray]] = {}


def set_decoder(kind: str, fn: Callable[[bytes, dict[str, Any]], np.ndarray]) -> None:
    """Install a real decoder ('image' | 'audio' | 'video')."""
    _DECODERS[kind] = fn


def fake_image_decode(payload: bytes, meta: dict[str, Any]) -> np.ndarray:
    """Deterministic stand-in decoder: content-hash-seeded uint8 pixels
    of the metadata's declared shape. Same bytes -> same pixels, so
    every downstream assertion is exact."""
    h = int.from_bytes(payload[:8].ljust(8, b"\0"), "little") ^ len(payload)
    w = int(meta.get("width") or 16)
    ht = int(meta.get("height") or 16)
    ch = int(meta.get("channels") or 3)
    from sdvg_spark.core.rng import splitmix64_np

    n = w * ht * ch
    ks = np.arange(n, dtype=np.uint64) + np.uint64(h & ((1 << 64) - 1))
    return (splitmix64_np(ks) & np.uint64(0xFF)).astype(np.uint8).reshape(ht, w, ch)


def _resolve_decoder(
    kind: str, strict: bool
) -> Callable[[bytes, dict[str, Any]], np.ndarray]:
    """Resolve the decoder ON THE DRIVER so it rides the closure —
    executor processes re-import this module with an empty registry."""
    fn = _DECODERS.get(kind)
    if fn is not None:
        return fn
    if strict:
        raise NotImplementedError(
            f"no real {kind} decoder installed in this environment; "
            f"call set_decoder({kind!r}, fn) (e.g. a Pillow/libav wrapper)"
        )
    return fake_image_decode


def image_features(
    df: DataFrame,
    id_col: str = "media_id",
    bin_col: str = "payload",
    meta_col: str = "meta",
    strict_decode: bool = False,
) -> DataFrame:
    """Decode + per-image statistics in one Arrow pass.

    Output: (id, width, height, channels, mean_intensity, std_intensity,
    entropy) — the feature math is real; only the pixel source is the
    pluggable decoder.
    """
    out_schema = (
        f"{id_col} long, width int, height int, channels int, "
        "mean_intensity double, std_intensity double, entropy double"
    )
    decode = _resolve_decoder("image", strict_decode)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                meta = row[meta_col] if isinstance(row[meta_col], dict) else dict(row[meta_col] or {})
                px = decode(bytes(row[bin_col] or b""), meta)
                hist = np.bincount(px.ravel(), minlength=256) / max(px.size, 1)
                nz = hist[hist > 0]
                rows.append(
                    {
                        id_col: row[id_col],
                        "width": px.shape[1],
                        "height": px.shape[0],
                        "channels": px.shape[2] if px.ndim == 3 else 1,
                        "mean_intensity": float(px.mean()) if px.size else 0.0,
                        "std_intensity": float(px.std()) if px.size else 0.0,
                        "entropy": float(-(nz * np.log2(nz)).sum()) if px.size else 0.0,
                    }
                )
            yield pd.DataFrame(rows)

    return df.select(id_col, bin_col, meta_col).mapInPandas(run, out_schema)


def resize_images(
    df: DataFrame,
    width: int,
    height: int,
    id_col: str = "media_id",
    bin_col: str = "payload",
    meta_col: str = "meta",
    strict_decode: bool = False,
) -> DataFrame:
    """Decode -> nearest-neighbor resize -> re-emit raw bytes + updated
    metadata. The resize math is real numpy (no codec needed)."""
    out_schema = f"{id_col} long, payload binary, meta {MEDIA_META_SCHEMA}"
    decode = _resolve_decoder("image", strict_decode)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, payloads, metas = [], [], []
            for _, row in pdf.iterrows():
                meta = row[meta_col] if isinstance(row[meta_col], dict) else dict(row[meta_col] or {})
                px = decode(bytes(row[bin_col] or b""), meta)
                yi = (np.arange(height) * px.shape[0] // height).astype(np.int64)
                xi = (np.arange(width) * px.shape[1] // width).astype(np.int64)
                resized = px[yi][:, xi]
                ids.append(row[id_col])
                payloads.append(resized.tobytes())
                metas.append(
                    {
                        "format": "raw",
                        "width": width,
                        "height": height,
                        "channels": int(resized.shape[2] if resized.ndim == 3 else 1),
                        "duration_ms": 0,
                        "sample_rate": 0,
                    }
                )
            yield pd.DataFrame({id_col: ids, "payload": payloads, "meta": metas})

    return df.select(id_col, bin_col, meta_col).mapInPandas(run, out_schema)


def sample_frames(
    df: DataFrame,
    every_ms: int,
    id_col: str = "media_id",
    bin_col: str = "payload",
    meta_col: str = "meta",
) -> DataFrame:
    """Frame-sampling plumbing for video payloads: one output row per
    sampled timestamp (explode on the driver-free executor side). The
    frame *extraction* is the pluggable decoder; the default derives a
    deterministic frame payload per (video bytes, timestamp)."""
    out_schema = f"{id_col} long, frame_ms bigint, frame binary"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            ids, ts, frames = [], [], []
            for _, row in pdf.iterrows():
                meta = row[meta_col] if isinstance(row[meta_col], dict) else dict(row[meta_col] or {})
                dur = int(meta.get("duration_ms") or 0)
                payload = bytes(row[bin_col] or b"")
                for t in range(0, max(dur, 1), max(every_ms, 1)):
                    ids.append(row[id_col])
                    ts.append(t)
                    frames.append(
                        hashlib.blake2b(
                            payload + t.to_bytes(8, "little"), digest_size=32
                        ).digest()
                    )
            yield pd.DataFrame({id_col: ids, "frame_ms": ts, "frame": frames})

    return df.select(id_col, bin_col, meta_col).mapInPandas(run, out_schema)


def synth_media(
    df_ids: DataFrame,
    id_col: str = "id",
    width: int = 16,
    height: int = 16,
    channels: int = 3,
    payload_bytes: int = 256,
    duration_ms: int = 1000,
    sample_rate: int = 16000,
) -> DataFrame:
    """Deterministic synthetic media table (id -> payload+meta): the
    binary-column generator used by tests and demos; payload bytes are
    a pure function of the id (engine determinism rules apply)."""
    out_schema = f"media_id long, payload binary, meta {MEDIA_META_SCHEMA}"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from sdvg_spark.core.rng import splitmix64_np

        for pdf in batches:
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            payloads = []
            metas = []
            for i in ids:
                with np.errstate(over="ignore"):  # uint64 wrap intended
                    ks = np.arange(payload_bytes, dtype=np.uint64) + np.uint64(
                        i
                    ) * np.uint64(0x9E3779B97F4A7C15)
                payloads.append(
                    (splitmix64_np(ks) & np.uint64(0xFF)).astype(np.uint8).tobytes()
                )
                metas.append(
                    {
                        "format": "synthetic",
                        "width": width,
                        "height": height,
                        "channels": channels,
                        "duration_ms": duration_ms,
                        "sample_rate": sample_rate,
                    }
                )
            yield pd.DataFrame({"media_id": ids, "payload": payloads, "meta": metas})

    return df_ids.select(F.col(id_col)).mapInPandas(run, out_schema)


_SM_GAMMA = 0x9E3779B97F4A7C15
_U64 = 1 << 64


def _payload_hash_ctes(n_ids: int, payload_bytes: int) -> tuple[str, str]:
    """DuckDB CTE fragment computing, per synthetic media_id, the content
    hash ``h`` that the fake decoders seed from: the first 8 payload
    bytes little-endian, xor the payload length.

    Mirrors :func:`synth_media` (byte j = splitmix64(j + id*GAMMA) & 255)
    + the ``h`` derivation shared by :func:`fake_image_decode` /
    :func:`fake_audio_decode`. Returns (cte_sql, final_cte) where the
    final CTE has columns (media_id HUGEINT, h HUGEINT).
    """
    from sdvg_spark.core.rng import _sql_xor, splitmix64_cte_chain

    chain, fin = splitmix64_cte_chain(
        "__hdr", f"(j + media_id * {_SM_GAMMA}) % {_U64}", ["media_id", "j"], prefix="__hb"
    )
    pow_case = "CASE " + " ".join(f"WHEN j = {j} THEN {256**j}::HUGEINT" for j in range(8)) + " END"
    return (
        f"""__ids AS (SELECT range::HUGEINT AS media_id FROM range(0, {n_ids})),
__hdr AS (SELECT media_id, jj.range::HUGEINT AS j FROM __ids CROSS JOIN range(0, 8) jj),
{chain},
__h0 AS (SELECT media_id, sum((s % 256) * {pow_case})::HUGEINT AS h0 FROM {fin} GROUP BY media_id),
__h AS (SELECT media_id, {_sql_xor('h0', str(payload_bytes))} AS h FROM __h0)""",
        "__h",
    )


def image_features_oracle_sql(
    n_ids: int,
    width: int = 8,
    height: int = 8,
    channels: int = 3,
    payload_bytes: int = 256,
) -> str:
    """DuckDB SQL reproducing ``image_features(synth_media(range(n)))``
    value-for-value: the fake decoder's splitmix64-seeded pixels are
    re-derived in SQL, so mean_intensity is an exact integer-sum / n."""
    from sdvg_spark.core.rng import splitmix64_cte_chain

    n_px = width * height * channels
    hcte, hfin = _payload_hash_ctes(n_ids, payload_bytes)
    chain, fin = splitmix64_cte_chain(
        "__px", f"(k + h) % {_U64}", ["media_id"], prefix="__pv"
    )
    return f"""WITH {hcte},
__px AS (SELECT media_id, h, kk.range::HUGEINT AS k FROM {hfin} CROSS JOIN range(0, {n_px}) kk),
{chain}
SELECT media_id::BIGINT AS media_id, {width}::INTEGER AS width, {height}::INTEGER AS height,
  {channels}::INTEGER AS channels,
  round(sum(s % 256)::DOUBLE / {n_px}, 6) AS mean_intensity
FROM {fin} GROUP BY media_id"""


def audio_features_oracle_sql(
    n_ids: int,
    duration_ms: int = 1000,
    sample_rate: int = 16000,
    payload_bytes: int = 256,
) -> str:
    """DuckDB SQL reproducing ``audio_features(synth_media(range(n)))``:
    re-derives the fake int16 waveform and counts sign flips exactly."""
    from sdvg_spark.core.rng import splitmix64_cte_chain

    n = max(sample_rate * duration_ms // 1000, 1)
    out_dur = n * 1000 // max(sample_rate, 1)
    hcte, hfin = _payload_hash_ctes(n_ids, payload_bytes)
    chain, fin = splitmix64_cte_chain(
        "__smp", f"(k + h) % {_U64}", ["media_id", "k"], prefix="__wv"
    )
    return f"""WITH {hcte},
__smp AS (SELECT media_id, h, kk.range::HUGEINT AS k FROM {hfin} CROSS JOIN range(0, {n}) kk),
{chain},
__sgn AS (SELECT media_id, k, ((s % 65536) >= 32768)::INT AS sg FROM {fin}),
__lag AS (SELECT media_id, sg, lag(sg) OVER (PARTITION BY media_id ORDER BY k) AS pv FROM __sgn)
SELECT media_id::BIGINT AS media_id, {n}::BIGINT AS n_samples, {out_dur}::BIGINT AS duration_ms,
  round(sum(CASE WHEN pv IS NOT NULL AND pv != sg THEN 1 ELSE 0 END)::DOUBLE / {max(n - 1, 1)}, 6)
    AS zero_crossing_rate
FROM __lag GROUP BY media_id"""


def fake_audio_decode(payload: bytes, meta: dict[str, Any]) -> np.ndarray:
    """Deterministic stand-in audio decoder: content-hash-seeded int16
    waveform of the metadata's declared duration/sample_rate."""
    from sdvg_spark.core.rng import splitmix64_np

    h = int.from_bytes(payload[:8].ljust(8, b"\0"), "little") ^ len(payload)
    sr = int(meta.get("sample_rate") or 16000)
    dur = int(meta.get("duration_ms") or 1000)
    n = max(sr * dur // 1000, 1)
    ks = np.arange(n, dtype=np.uint64) + np.uint64(h & ((1 << 64) - 1))
    return (splitmix64_np(ks) & np.uint64(0xFFFF)).astype(np.int64).astype(
        np.int16
    )


def audio_features(
    df: DataFrame,
    id_col: str = "media_id",
    bin_col: str = "payload",
    meta_col: str = "meta",
    strict_decode: bool = False,
) -> DataFrame:
    """Decode + per-clip statistics in one Arrow pass: duration, RMS
    level, peak, zero-crossing rate. Feature math is real numpy; only
    the waveform source is the pluggable decoder (install one with
    ``set_decoder('audio', fn)``)."""
    out_schema = (
        f"{id_col} long, n_samples bigint, duration_ms bigint, "
        "rms double, peak double, zero_crossing_rate double"
    )
    if strict_decode and "audio" not in _DECODERS:
        raise NotImplementedError(
            "no real audio decoder installed; call set_decoder('audio', fn)"
        )
    decode = _DECODERS.get("audio", fake_audio_decode)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                meta = row[meta_col] if isinstance(row[meta_col], dict) else dict(row[meta_col] or {})
                wav = decode(bytes(row[bin_col] or b""), meta).astype(np.float64)
                sr = int(meta.get("sample_rate") or 16000)
                n = wav.size
                zc = (
                    float(np.count_nonzero(np.signbit(wav[1:]) != np.signbit(wav[:-1])))
                    / (n - 1)
                    if n > 1
                    else 0.0
                )
                rows.append(
                    {
                        id_col: row[id_col],
                        "n_samples": n,
                        "duration_ms": int(n * 1000 // max(sr, 1)),
                        "rms": float(np.sqrt((wav**2).mean())) if n else 0.0,
                        "peak": float(np.abs(wav).max()) if n else 0.0,
                        "zero_crossing_rate": zc,
                    }
                )
            yield pd.DataFrame(rows)

    return df.select(id_col, bin_col, meta_col).mapInPandas(run, out_schema)
