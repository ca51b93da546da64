"""Multimodal columns: opaque binary payloads + typed metadata.

The image/audio codec libraries are not available in this environment,
so the *decode* kernels are stubbed (deterministic fake features or
``NotImplementedError``), while all the Ray-side plumbing — schema,
actor-pool shape, batch sizing for large binary rows, output layout —
is real and tested (tests/test_multimodal.py).

Design notes for 100 TB of media:
* binary payloads ride Arrow ``large_binary`` columns; keep
  ``batch_size`` SMALL (64-512) so batch x concurrency fits worker
  heaps, and stay in ``batch_format="pyarrow"`` (pandas would copy into
  object dtype);
* decoders are actor pools: the (real) codec/model load happens once
  per actor in ``__init__``;
* outputs are feature columns (fixed-size list<float>) — far smaller
  than inputs — so downstream stages re-batch freely.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..hashing import hash128

IMAGE_META_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("payload", pa.large_binary()),
        ("mime", pa.string()),
        ("width", pa.int32()),
        ("height", pa.int32()),
    ]
)


class ImageDecode:
    """payload -> decoded dims + feature vector.

    STUB: real implementation would `import PIL.Image` here (once per
    actor) and decode in __call__.  The fake derives deterministic
    pseudo-features from the payload hash so downstream stages and
    tests exercise the full pipeline shape.
    """

    def __init__(self, feature_dim: int = 16, real_codec: bool = False):
        self.feature_dim = feature_dim
        if real_codec:
            raise NotImplementedError("image codecs are not available in this environment")

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"]
        if isinstance(payloads, pa.ChunkedArray):
            payloads = payloads.combine_chunks()
        h1, h2 = hash128(payloads, 23)
        rng_base = (h1 ^ h2).astype(np.uint64)
        feats = np.empty((len(h1), self.feature_dim), dtype=np.float32)
        with np.errstate(over="ignore"):
            for j in range(self.feature_dim):
                v = rng_base * np.uint64(2654435761) + np.uint64(j)
                v = (v ^ (v >> np.uint64(31))) * np.uint64(0x9E3779B97F4A7C15)
                feats[:, j] = (v >> np.uint64(11)).astype(np.float64) / float(1 << 53)
        return pa.table(
            {
                "media_id": batch["media_id"],
                "width": batch["width"],
                "height": batch["height"],
                "features": pa.array(list(feats)),
            }
        )


class FrameSample:
    """video payload -> every Nth frame reference (stub: synthesizes frame
    indices from declared duration; a real impl would use pyav here)."""

    def __init__(self, every_n: int = 30):
        self.every_n = every_n

    def __call__(self, batch: pa.Table) -> pa.Table:
        n_frames = batch["n_frames"].to_numpy(zero_copy_only=False).astype(np.int64)
        ids = batch["media_id"].to_numpy(zero_copy_only=False)
        # vectorized explode: counts per row, then a segmented arange
        counts = np.maximum((n_frames + self.every_n - 1) // self.every_n, 0)
        out_id = np.repeat(ids, counts)
        tot = int(counts.sum())
        seg_start = np.repeat(np.concatenate([[0], np.cumsum(counts)[:-1]]), counts)
        within = np.arange(tot, dtype=np.int64) - seg_start
        return pa.table(
            {
                "media_id": pa.array(out_id.astype(np.int64)),
                "frame_idx": pa.array((within * self.every_n).astype(np.int32)),
            }
        )


class AudioFeatures:
    """audio payload -> fixed-size feature frames (stub).

    A real implementation would load soundfile/librosa once per actor in
    ``__init__`` and compute e.g. log-mel frames in ``__call__``.  The
    deterministic fake derives per-frame pseudo-energies from the
    payload hash; frame count comes from the declared duration so the
    output layout (one row per frame) is exercised for real.
    """

    def __init__(self, frame_ms: int = 1000, real_codec: bool = False):
        self.frame_ms = frame_ms
        if real_codec:
            raise NotImplementedError("audio codecs are not available in this environment")

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"]
        if isinstance(payloads, pa.ChunkedArray):
            payloads = payloads.combine_chunks()
        h1, _ = hash128(payloads, 29)
        dur = batch["duration_ms"].to_numpy(zero_copy_only=False).astype(np.int64)
        ids = batch["media_id"].to_numpy(zero_copy_only=False)
        # vectorized frame explode (segmented arange, no per-row loop)
        counts = np.maximum(dur // self.frame_ms, 1)
        out_id = np.repeat(ids, counts)
        hrep = np.repeat(h1, counts)
        tot = int(counts.sum())
        seg_start = np.repeat(np.concatenate([[0], np.cumsum(counts)[:-1]]), counts)
        frames = np.arange(tot, dtype=np.int64) - seg_start
        shift = (frames % 53).astype(np.uint64)
        energy = ((hrep >> shift) & np.uint64(0xFFFF)).astype(np.float64) / 65535.0
        return pa.table(
            {
                "media_id": pa.array(out_id.astype(np.int64)),
                "frame_idx": pa.array(frames.astype(np.int32)),
                "energy": pa.array(energy.astype(np.float32)),
            }
        )


def decode_images(ds, *, feature_dim: int = 16, batch_size: int = 256,
                  real_codec: bool = False, concurrency=None):
    """Actor-pool decode stage sized for large binary rows.

    This is the one deliberately ACTOR-pool stage (a real codec/model
    loads once per actor in ``__init__``).  The pool must never reserve
    every CPU slot — an actor pool sized ~num_cpus starves upstream
    reads and can deadlock small clusters — so the default caps at
    half the cluster, minimum one."""
    import ray

    if concurrency is None:
        cpus = int(ray.cluster_resources().get("CPU", 4))
        concurrency = max(1, min(cpus - 2, cpus // 2))
    return ds.map_batches(
        ImageDecode,
        fn_constructor_args=(feature_dim, real_codec),
        batch_format="pyarrow",
        batch_size=batch_size,  # binary payloads: small batches, see module docstring
        zero_copy_batch=True,
        concurrency=concurrency,
    )
