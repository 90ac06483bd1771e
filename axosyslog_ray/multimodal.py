"""Multimodal columns: opaque binary payloads with typed metadata.

Images/audio/video travel as `binary` columns (exactly like the pages
`html` column); decode / feature-extract / resize / frame-sample are
actor-pool map_batches stages. Two decoder modes:

- `decoder="fake"` (the sandbox default): deterministic synthetic
  decode for testing the plumbing — schema, batch size, actor
  signature, output layout are real and tested.
- `decoder="real"`: actual kernels via PIL/Pillow (images) and PyAV
  (video), imported ONCE PER ACTOR in __init__ and raising a clear
  ImportError when the library is absent (this container has neither;
  the real-kernel tests are skipped-if-absent so they run wherever the
  libs exist — tests/test_multimodal_real.py).

Scale notes: binary payloads dominate block size — run these stages
with small batch_size and keep payload columns OUT of shuffles (extract
features, drop bytes, aggregate features only).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

def _import_pil():
    """Once-per-actor PIL import (called from stage __init__)."""
    try:
        from PIL import Image
    except ImportError as e:
        raise ImportError(
            "decoder='real' image kernels require PIL/pillow (not in the "
            "sandbox container); use decoder='fake' for plumbing tests"
        ) from e
    return Image


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

    decoder="real": PIL decode + 8x8 average-hash perceptual fingerprint
    (the classic aHash; 64-bit hex). PIL imports once per actor."""

    def __init__(self, decoder: str = "fake", payload_col: str = "payload"):
        if decoder not in ("fake", "real"):
            raise ValueError(decoder)
        self.decoder = decoder
        self.payload_col = payload_col
        self._pil = _import_pil() if decoder == "real" else None

    def _decode_one(self, payload: bytes) -> tuple[int, int, str]:
        if self.decoder == "real":
            import io

            img = self._pil.open(io.BytesIO(payload))
            w, h = img.size
            # average-hash: 8x8 grayscale, bit = pixel >= mean
            px = np.asarray(img.convert("L").resize((8, 8)), dtype=np.float64)
            bits = (px >= px.mean()).ravel()
            val = int("".join("1" if b else "0" for b in bits), 2)
            return w, h, f"{val:016x}"
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
        if decoder == "real":
            try:
                import av
            except ImportError as e:
                raise ImportError(
                    "decoder='real' video sampling requires PyAV (not in "
                    "the sandbox container); use decoder='fake' for "
                    "plumbing tests") from e
            self._av = av

    def _sample_real(self, mid: int, payload: bytes, ids, offsets, frame_hashes):
        import io

        with self._av.open(io.BytesIO(payload)) as container:
            stream = container.streams.video[0]
            next_t = 0.0
            for frame in container.decode(stream):
                t = float(frame.time or 0.0)
                if t + 1e-9 >= next_t:
                    arr = frame.to_ndarray(format="gray8")
                    ids.append(mid)
                    offsets.append(t)
                    frame_hashes.append(
                        hashlib.sha256(arr.tobytes()).hexdigest()[:16])
                    next_t = t + self.every

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, offsets, frame_hashes = [], [], []
        if self.decoder == "real":
            for mid, payload in zip(batch.column("media_id").to_pylist(),
                                    batch.column(self.payload_col).to_pylist()):
                self._sample_real(mid, payload, ids, offsets, frame_hashes)
            return pa.table(
                {
                    "media_id": pa.array(ids, type=pa.int64()),
                    "frame_offset_sec": pa.array(offsets, type=pa.float64()),
                    "frame_hash": pa.array(frame_hashes, type=pa.string()),
                }
            )
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
                 payload_col: str = "payload", out_format: str = "PNG"):
        self.tw, self.th = target_w, target_h
        self.decoder = decoder
        self.payload_col = payload_col
        self.out_format = out_format
        self._pil = _import_pil() if decoder == "real" else None

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_payloads = []
        if self.decoder == "real":
            import io

            for p in batch.column(self.payload_col).to_pylist():
                img = self._pil.open(io.BytesIO(p)).resize((self.tw, self.th))
                buf = io.BytesIO()
                img.save(buf, format=self.out_format)
                out_payloads.append(buf.getvalue())
            idx = batch.column_names.index(self.payload_col)
            out = batch.set_column(idx, self.payload_col,
                                   pa.array(out_payloads, type=pa.binary()))
            out = out.append_column("resized_w", pa.array([self.tw] * batch.num_rows, type=pa.int32()))
            return out.append_column("resized_h", pa.array([self.th] * batch.num_rows, type=pa.int32()))
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
        self._pil = _import_pil() if decoder == "real" else None

    def _real_features(self, payload: bytes) -> np.ndarray:
        """Real kernel: mean-centered downsampled grayscale pixels — an
        honest decode-based feature (not a learned model; swap in a real
        encoder here for production embeddings). dim must be w*h of a
        small grid; we use (dim, 1)."""
        import io

        img = self._pil.open(io.BytesIO(payload)).convert("L")
        px = np.asarray(img.resize((self.dim, 1)), dtype=np.float32).ravel()
        return (px / np.float32(255.0)) - np.float32(0.5)

    def __call__(self, batch: pa.Table) -> pa.Table:
        embs = []
        if self.decoder == "real":
            for p in batch.column(self.payload_col).to_pylist():
                embs.append(self._real_features(p))
            out = batch.drop_columns([self.payload_col])
            return out.append_column("embedding", pa.array(
                [e.tolist() for e in embs], type=pa.list_(pa.float32())))
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
