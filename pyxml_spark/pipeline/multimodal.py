"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns with a metadata struct; decode /
feature-extract / resize / frame-sample run as Arrow-batched kernels over
``mapInArrow``/``mapInPandas``. The decode step itself is STUBBED — the
sandbox has no image/audio libraries — behind ``DECODERS``: the default
deterministic fake derives stable pseudo-features from the bytes so the
Spark-side plumbing (schema, partitioning, UDF signature, batch shape) is
real and testable; a production deployment swaps in Pillow/torchaudio
decoders with the same signature.
"""
from __future__ import annotations

import hashlib
import struct
from typing import Callable, Dict, Iterator, List, Optional, Tuple

from pyspark.sql.types import (ArrayType, BinaryType, FloatType, IntegerType,
                               LongType, StringType, StructField, StructType)

__all__ = ['MEDIA_SCHEMA', 'MEDIA_FEATURES_SCHEMA', 'RESIZED_SCHEMA',
           'FRAMES_SCHEMA', 'DECODERS', 'RESIZERS', 'FRAME_SAMPLERS',
           'fake_decode', 'fake_resize', 'fake_frame_sample',
           'media_feature_batches', 'extract_media_features',
           'resize_media', 'sample_frames', 'synth_media_pdf']

#: input: one media object per row
MEDIA_SCHEMA = StructType([
    StructField('media_id', LongType(), False),
    StructField('doc_id', LongType(), True),
    StructField('kind', StringType(), False),      # image|audio|video
    StructField('mime', StringType(), True),
    StructField('payload', BinaryType(), True),    # opaque encoded bytes
    StructField('meta', StructType([               # typed metadata
        StructField('width', IntegerType(), True),
        StructField('height', IntegerType(), True),
        StructField('duration_ms', IntegerType(), True),
        StructField('sample_rate', IntegerType(), True),
    ]), True),
])

#: output: fixed-width feature vector + shape info per media object
MEDIA_FEATURES_SCHEMA = StructType([
    StructField('media_id', LongType(), False),
    StructField('kind', StringType(), False),
    StructField('n_bytes', LongType(), True),
    StructField('features', ArrayType(FloatType()), True),
    StructField('decode_error', StringType(), True),
])

FEATURE_DIM = 16


def fake_decode(kind: str, payload: bytes,
                meta: Optional[dict]) -> List[float]:
    """deterministic stand-in decoder: stable pseudo-features from a sha256
    stream over the payload. Replace via DECODERS[kind] in production.

    Raises ValueError on empty payloads the way a real decoder raises on
    corrupt media, so the per-row error containment path is exercised.
    """
    if not payload:
        raise ValueError('empty media payload')
    digest = hashlib.sha256(payload).digest()
    feats = []
    for k in range(FEATURE_DIM):
        chunk = digest[(k * 2) % 32:(k * 2) % 32 + 2]
        (v,) = struct.unpack('>H', chunk)
        feats.append(round(v / 65535.0, 6))
    return feats


#: kind -> decoder; swap entries for real implementations. A decoder gets
#: (kind, payload_bytes, meta_dict) and returns list[float] of FEATURE_DIM.
DECODERS: Dict[str, Callable[[str, bytes, Optional[dict]], List[float]]] = {
    'image': fake_decode,
    'audio': fake_decode,
    'video': fake_decode,
}


#: output of resize_media: payload re-encoded at the target geometry
RESIZED_SCHEMA = StructType([
    StructField('media_id', LongType(), False),
    StructField('kind', StringType(), False),
    StructField('payload', BinaryType(), True),
    StructField('meta', StructType([
        StructField('width', IntegerType(), True),
        StructField('height', IntegerType(), True),
        StructField('duration_ms', IntegerType(), True),
        StructField('sample_rate', IntegerType(), True),
    ]), True),
    StructField('resize_error', StringType(), True),
])

#: output of sample_frames: one row per sampled frame (exploding kernel)
FRAMES_SCHEMA = StructType([
    StructField('media_id', LongType(), False),
    StructField('frame_idx', IntegerType(), False),
    StructField('ts_ms', IntegerType(), False),
    StructField('frame', BinaryType(), True),
    StructField('sample_error', StringType(), True),
])


def fake_resize(payload: bytes, meta: Optional[dict],
                width: int, height: int) -> bytes:
    """deterministic stand-in for an image resize: output bytes are a stable
    function of (payload, target geometry) sized ~proportional to the target
    area, so batch-size/memory behavior downstream is realistic. Replace via
    RESIZERS['image'] with a Pillow implementation in production.

    The geometry seed is an ASCII suffix (``:WxH``), not packed binary, so
    the contract oracle can recompute the head block as
    ``sha256(payload || ':WxH')`` in DuckDB (whose sha256 takes VARCHAR —
    packed ints would smuggle NUL bytes into the string)."""
    if not payload:
        raise ValueError('empty media payload')
    n = max(16, min(width * height // 64, 4096))
    seed = hashlib.sha256(payload + f':{width}x{height}'.encode())
    out = bytearray()
    block = seed.digest()
    while len(out) < n:
        out.extend(block)
        block = hashlib.sha256(block).digest()
    return bytes(out[:n])


def fake_frame_sample(payload: bytes, meta: Optional[dict],
                      every_ms: int) -> List[bytes]:
    """deterministic stand-in for video frame sampling: one pseudo-frame per
    every_ms of metadata duration, each a stable function of
    (payload, frame index). Replace via FRAME_SAMPLERS['video'] with an
    ffmpeg/PyAV implementation in production."""
    if not payload:
        raise ValueError('empty media payload')
    duration = (meta or {}).get('duration_ms') or 0
    n_frames = max(1, duration // every_ms) if duration else 1
    # ASCII frame seed for the same DuckDB-twin reason as fake_resize
    return [hashlib.sha256(payload + f':frame:{k}'.encode()).digest()
            for k in range(min(n_frames, 64))]


#: kind -> resizer / frame sampler; swap for real implementations
RESIZERS: Dict[str, Callable] = {'image': fake_resize}
FRAME_SAMPLERS: Dict[str, Callable] = {'video': fake_frame_sample}


def media_feature_batches(batches) -> Iterator:
    """mapInArrow kernel over MEDIA_SCHEMA batches -> MEDIA_FEATURES_SCHEMA"""
    import pyarrow as pa
    for batch in batches:
        names = batch.schema.names
        ids = batch.column(names.index('media_id'))
        kinds = batch.column(names.index('kind')).to_pylist()
        payloads = batch.column(names.index('payload')).to_pylist()
        metas = (batch.column(names.index('meta')).to_pylist()
                 if 'meta' in names else [None] * len(kinds))
        n_bytes: List[Optional[int]] = []
        feats: List[Optional[List[float]]] = []
        errs: List[Optional[str]] = []
        for kind, payload, meta in zip(kinds, payloads, metas):
            n_bytes.append(len(payload) if payload is not None else None)
            decoder = DECODERS.get(kind)
            if decoder is None:
                feats.append(None)
                errs.append(f'no decoder for kind={kind!r}')
                continue
            try:
                feats.append(decoder(kind, payload, meta))
                errs.append(None)
            except NotImplementedError:
                feats.append(None)
                errs.append('decoder not implemented')
            except Exception as exc:  # noqa: BLE001 - per-row containment
                feats.append(None)
                errs.append(f'{type(exc).__name__}: {exc}')
        yield pa.RecordBatch.from_arrays(
            [ids,
             pa.array(kinds, pa.string()),
             pa.array(n_bytes, pa.int64()),
             pa.array(feats, pa.list_(pa.float32())),
             pa.array(errs, pa.string())],
            names=['media_id', 'kind', 'n_bytes', 'features', 'decode_error'])


def extract_media_features(df, partitions: Optional[int] = None):
    """media DataFrame -> features DataFrame; repartition by media_id so
    large blobs spread evenly (no conversation affinity needed)"""
    if partitions:
        df = df.repartition(partitions, 'media_id')
    return df.mapInArrow(media_feature_batches, schema=MEDIA_FEATURES_SCHEMA)


def resize_media(df, width: int = 32, height: int = 32,
                 partitions: Optional[int] = None):
    """image rows -> resized payloads (mapInArrow; per-row error capture).
    Non-image kinds pass through with a 'no resizer' marker, preserving the
    full table so callers can union downstream."""
    import pyarrow as pa

    def kernel(batches):
        for batch in batches:
            names = batch.schema.names
            ids = batch.column(names.index('media_id'))
            kinds = batch.column(names.index('kind')).to_pylist()
            payloads = batch.column(names.index('payload')).to_pylist()
            metas = (batch.column(names.index('meta')).to_pylist()
                     if 'meta' in names else [None] * len(kinds))
            out_p: list = []
            out_m: list = []
            errs: list = []
            for kind, payload, meta in zip(kinds, payloads, metas):
                fn = RESIZERS.get(kind)
                if fn is None:
                    out_p.append(payload)
                    out_m.append(meta)
                    errs.append(f'no resizer for kind={kind!r}')
                    continue
                try:
                    out_p.append(fn(payload, meta, width, height))
                    out_m.append({**(meta or {}), 'width': width,
                                  'height': height})
                    errs.append(None)
                except Exception as exc:  # noqa: BLE001 - per-row
                    out_p.append(None)
                    out_m.append(meta)
                    errs.append(f'{type(exc).__name__}: {exc}')
            meta_t = pa.struct([pa.field('width', pa.int32()),
                                pa.field('height', pa.int32()),
                                pa.field('duration_ms', pa.int32()),
                                pa.field('sample_rate', pa.int32())])
            yield pa.RecordBatch.from_arrays(
                [ids, pa.array(kinds, pa.string()),
                 pa.array(out_p, pa.binary()),
                 pa.array(out_m, meta_t),
                 pa.array(errs, pa.string())],
                names=['media_id', 'kind', 'payload', 'meta',
                       'resize_error'])

    if partitions:
        df = df.repartition(partitions, 'media_id')
    return df.mapInArrow(kernel, schema=RESIZED_SCHEMA)


def sample_frames(df, every_ms: int = 500,
                  partitions: Optional[int] = None):
    """video rows -> exploded frame rows (mapInArrow explode kernel)"""
    import pyarrow as pa

    def kernel(batches):
        for batch in batches:
            names = batch.schema.names
            ids = batch.column(names.index('media_id')).to_pylist()
            kinds = batch.column(names.index('kind')).to_pylist()
            payloads = batch.column(names.index('payload')).to_pylist()
            metas = (batch.column(names.index('meta')).to_pylist()
                     if 'meta' in names else [None] * len(kinds))
            o_id: list = []
            o_idx: list = []
            o_ts: list = []
            o_fr: list = []
            o_err: list = []
            for mid, kind, payload, meta in zip(ids, kinds, payloads, metas):
                fn = FRAME_SAMPLERS.get(kind)
                if fn is None:
                    continue  # only samplable kinds explode
                try:
                    frames = fn(payload, meta, every_ms)
                except Exception as exc:  # noqa: BLE001 - per-row
                    o_id.append(mid)
                    o_idx.append(-1)
                    o_ts.append(-1)
                    o_fr.append(None)
                    o_err.append(f'{type(exc).__name__}: {exc}')
                    continue
                for k, fr in enumerate(frames):
                    o_id.append(mid)
                    o_idx.append(k)
                    o_ts.append(k * every_ms)
                    o_fr.append(fr)
                    o_err.append(None)
            yield pa.RecordBatch.from_arrays(
                [pa.array(o_id, pa.int64()),
                 pa.array(o_idx, pa.int32()),
                 pa.array(o_ts, pa.int32()),
                 pa.array(o_fr, pa.binary()),
                 pa.array(o_err, pa.string())],
                names=['media_id', 'frame_idx', 'ts_ms', 'frame',
                       'sample_error'])

    if partitions:
        df = df.repartition(partitions, 'media_id')
    return df.mapInArrow(kernel, schema=FRAMES_SCHEMA)


def synth_media_pdf(n: int, seed: int = 42):
    """deterministic fake media table (payload = seeded bytes)"""
    import random

    import pandas as pd
    rng = random.Random(seed)
    kinds = ['image', 'audio', 'video']
    rows: List[Tuple] = []
    for i in range(n):
        kind = kinds[i % 3]
        payload = bytes(rng.randrange(256)
                        for _ in range(rng.randint(0, 512))) or None
        rows.append((i, i // 3, kind, f'{kind}/fake', payload,
                     {'width': 64, 'height': 64, 'duration_ms': 1000,
                      'sample_rate': 16000}))
    return pd.DataFrame(rows, columns=['media_id', 'doc_id', 'kind', 'mime',
                                       'payload', 'meta'])
