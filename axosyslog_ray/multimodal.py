"""Multimodal columns: opaque binary payloads with typed metadata.

Images/audio/video travel as `binary` columns (exactly like the pages
`html` column); decode / feature-extract / resize / frame-sample are
actor-pool map_batches stages. The decode kernels themselves are
STUBBED — the image/audio libraries are not in this container — behind
`decoder="fake"` (deterministic synthetic decode for testing the
plumbing) or `decoder="real"` (raises NotImplementedError at the exact
point a PIL/ffmpeg call would go). The Ray-side contract — schema,
batch size, actor signature, output layout — is real and tested.

Scale notes: binary payloads dominate block size — run these stages
with small batch_size and keep payload columns OUT of shuffles (extract
features, drop bytes, aggregate features only).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        pa.field("media_id", pa.int64()),
        pa.field("media_type", pa.string()),  # image | audio | video
        pa.field("payload", pa.binary()),
        pa.field("meta_format", pa.string()),  # declared container format
    ]
)


class DecodeImage:
    """Actor-pool stage: binary image -> (width, height, n_pixels, phash).

    Real decode would be `PIL.Image.open(io.BytesIO(payload))` here —
    stubbed per the container constraints."""

    def __init__(self, decoder: str = "fake", payload_col: str = "payload"):
        if decoder not in ("fake", "real"):
            raise ValueError(decoder)
        self.decoder = decoder
        self.payload_col = payload_col

    def _decode_one(self, payload: bytes) -> tuple[int, int, str]:
        if self.decoder == "real":
            raise NotImplementedError(
                "image decode requires PIL/pillow, not available in this container; "
                "use decoder='fake' for plumbing tests"
            )
        # deterministic fake: dimensions derived from a digest of the bytes
        d = hashlib.sha256(payload or b"").digest()
        w = 64 + d[0] % 192
        h = 64 + d[1] % 192
        return w, h, d[:8].hex()

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column(self.payload_col).to_pylist()
        dims = [self._decode_one(p) for p in payloads]
        out = batch.drop_columns([self.payload_col])  # bytes never leave the stage
        out = out.append_column("width", pa.array([d[0] for d in dims], type=pa.int32()))
        out = out.append_column("height", pa.array([d[1] for d in dims], type=pa.int32()))
        out = out.append_column("n_pixels", pa.array([d[0] * d[1] for d in dims], type=pa.int64()))
        out = out.append_column("phash", pa.array([d[2] for d in dims], type=pa.string()))
        return out


class FrameSampler:
    """Video frame sampling stub: emits one row per sampled frame offset
    (flat_map-shaped: 1 video row -> n frame rows)."""

    def __init__(self, every_n_seconds: float = 1.0, decoder: str = "fake",
                 payload_col: str = "payload"):
        self.every = every_n_seconds
        self.decoder = decoder
        self.payload_col = payload_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.decoder == "real":
            raise NotImplementedError("video decode requires ffmpeg, not in this container")
        ids, offsets, frame_hashes = [], [], []
        for mid, payload in zip(batch.column("media_id").to_pylist(), batch.column(self.payload_col).to_pylist()):
            d = hashlib.sha256(payload or b"").digest()
            duration = 1 + d[2] % 30  # fake seconds
            for off in range(0, duration, max(1, int(self.every))):
                ids.append(mid)
                offsets.append(float(off))
                frame_hashes.append(hashlib.sha256(d + off.to_bytes(4, "little")).hexdigest()[:16])
        return pa.table(
            {
                "media_id": pa.array(ids, type=pa.int64()),
                "frame_offset_sec": pa.array(offsets, type=pa.float64()),
                "frame_hash": pa.array(frame_hashes, type=pa.string()),
            }
        )


class ResizeImage:
    """Resize stub: binary image -> binary image at (target_w, target_h).
    Real kernel would be `PIL.Image.resize` — stubbed; the fake variant
    produces a deterministic payload of the right nominal size class so
    downstream batch-size/memory plumbing is exercised for real. Unlike
    the feature stages the PAYLOAD flows through (resize is a
    transform), so run with small batch_size."""

    def __init__(self, target_w: int = 224, target_h: int = 224, decoder: str = "fake",
                 payload_col: str = "payload"):
        self.tw, self.th = target_w, target_h
        self.decoder = decoder
        self.payload_col = payload_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.decoder == "real":
            raise NotImplementedError("image resize requires PIL/pillow, not in this container")
        out_payloads = []
        for p in batch.column(self.payload_col).to_pylist():
            d = hashlib.sha256((p or b"") + f"{self.tw}x{self.th}".encode()).digest()
            # nominal resized size: 3 bytes/pixel of the target, content
            # deterministic from the source digest
            size = min(self.tw * self.th * 3, 4096)  # capped fake payload
            out_payloads.append((d * (size // len(d) + 1))[:size])
        idx = batch.column_names.index(self.payload_col)
        out = batch.set_column(idx, self.payload_col, pa.array(out_payloads, type=pa.binary()))
        out = out.append_column("resized_w", pa.array([self.tw] * batch.num_rows, type=pa.int32()))
        return out.append_column("resized_h", pa.array([self.th] * batch.num_rows, type=pa.int32()))


class ExtractFeatures:
    """Feature-extraction stub: binary payload -> fixed-dim float32
    embedding (the model-inference stage shape: model loaded once per
    actor in __init__, batched forward pass in __call__; the 'model'
    here is a deterministic digest expansion). Payload is DROPPED —
    embeddings are what shuffles downstream (ANN/dedup over them works
    for real: the output is a list<float> column like embeddings.parquet)."""

    def __init__(self, dim: int = 32, decoder: str = "fake", payload_col: str = "payload"):
        if decoder not in ("fake", "real"):
            raise ValueError(decoder)
        self.dim = dim
        self.decoder = decoder
        self.payload_col = payload_col
        # "model load" happens here, once per actor

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.decoder == "real":
            raise NotImplementedError("feature extraction requires an image model, not in this container")
        embs = []
        for p in batch.column(self.payload_col).to_pylist():
            d = hashlib.sha256(p or b"").digest()
            raw = (d * (self.dim * 4 // len(d) + 1))[: self.dim * 4]
            v = np.frombuffer(raw, dtype=np.uint32).astype(np.float32)
            v = (v / np.float32(2**32)) - np.float32(0.5)
            embs.append(v)
        out = batch.drop_columns([self.payload_col])
        return out.append_column("embedding", pa.array(
            [e.tolist() for e in embs], type=pa.list_(pa.float32())))


def gen_media_table(n: int, seed: int = 42) -> pa.Table:
    """Deterministic fake media corpus for plumbing tests."""
    from .hashutil import hash_idx

    idx = np.arange(n, dtype=np.uint64)
    h = hash_idx(idx, seed, 20)
    types = np.array(["image", "audio", "video"], dtype=object)[(h % np.uint64(3)).astype(int)]
    payloads = [bytes(np.frombuffer(hashlib.sha256(f"media{i}".encode()).digest(), dtype=np.uint8).repeat(4 + int(h[i] % np.uint64(8)))) for i in idx]
    fmts = np.array(["png", "wav", "mp4"], dtype=object)[(h % np.uint64(3)).astype(int)]
    return pa.Table.from_arrays(
        [
            pa.array(idx.astype(np.int64)),
            pa.array(types, type=pa.string()),
            pa.array(payloads, type=pa.binary()),
            pa.array(fmts, type=pa.string()),
        ],
        schema=MEDIA_SCHEMA,
    )


def decode_images(ds, concurrency=None, batch_size: int = 256):
    """Plumbing: small batches (binary payloads), actor pool, bytes dropped
    before anything downstream. The pool AUTOSCALES from 1 up to
    cpus - 1: a real decoder holds codec/model state (actor pool is the
    right shape), but a fixed pool sized to the machine spins every
    actor even for a 3-block input (measured: ~6 s of pure actor
    startup on a 600-row table at 32 CPUs). The max stays below the CPU
    count so the upstream read task always has a slot (a pool == CPUs
    deadlocks the streaming executor — observed at num_cpus=4)."""
    from .context import actor_pool_size

    # clamp EXPLICIT ints too: a caller passing concurrency >= num_cpus
    # reintroduces the pool==CPUs executor deadlock documented above
    conc = (actor_pool_size(concurrency) if isinstance(concurrency, int)
            else concurrency if concurrency is not None
            else (1, actor_pool_size(None)))
    return ds.map_batches(DecodeImage, batch_format="pyarrow", batch_size=batch_size,
                          concurrency=conc)
