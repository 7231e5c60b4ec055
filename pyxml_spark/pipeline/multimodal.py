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

__all__ = ['MEDIA_SCHEMA', 'MEDIA_FEATURES_SCHEMA', 'DECODERS',
           'fake_decode', 'media_feature_batches', 'extract_media_features',
           'synth_media_pdf']

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
