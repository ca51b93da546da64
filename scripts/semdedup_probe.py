"""Linearity probe for semantic_dedup (SemDeDup scale path) + the exact
baseline's quadratic wall. Clustered synthetic unit vectors with planted
near-dups, cached parquet per size."""
import os
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, "/root/repo")

DIM = 64


def ensure(n: int) -> str:
    path = f"/tmp/gostatix_ray/semdedup_{n}"
    if os.path.exists(os.path.join(path, "_SUCCESS")):
        return path
    os.makedirs(path, exist_ok=True)
    rng = np.random.default_rng(13)
    n_centers = max(10, n // 2000)
    centers = rng.standard_normal((n_centers, DIM))
    centers /= np.linalg.norm(centers, axis=1)[:, None]
    shard = 50_000
    for s0 in range(0, n, shard):
        m = min(shard, n - s0)
        lab = rng.integers(0, n_centers, m)
        v = centers[lab] + 0.30 * rng.standard_normal((m, DIM))
        # plant 20% near-dups of in-shard rows
        k = m // 5
        src = rng.integers(0, m - k, k)
        v[m - k:] = v[src] + 1e-3 * rng.standard_normal((k, DIM))
        pq.write_table(pa.table({
            "vec_id": pa.array(np.arange(s0, s0 + m, dtype=np.int64)),
            "embedding": pa.array([r.tolist() for r in v.astype(np.float32)],
                                  type=pa.list_(pa.float32())),
        }), os.path.join(path, f"part-{s0:09d}.parquet"))
    open(os.path.join(path, "_SUCCESS"), "w").write("")
    return path


def main():
    import ray
    import ray.data as rd

    from gostatix_ray.stages.dedup import semantic_dedup, semantic_dedup_exact

    ray.init(address="local", num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", 32)),
             include_dashboard=False)
    # warm the workers
    rd.range(1000).map_batches(lambda b: b, batch_size=None).count()
    for n in (20_000, 60_000, 200_000):
        path = ensure(n)
        times = {}
        for name in ("sem", "exact"):
            if name == "exact" and n > 60_000:
                continue  # the documented quadratic wall; skip at 200k
            best = float("inf")
            for _ in range(2):
                ds = rd.read_parquet(path, columns=["vec_id", "embedding"])
                t0 = time.perf_counter()
                if name == "sem":
                    out = semantic_dedup(ds, id_col="vec_id", emb_col="embedding",
                                         dim=DIM, n_clusters=max(16, n // 1000),
                                         threshold=0.95, iters=2)
                else:
                    out = semantic_dedup_exact(ds, id_col="vec_id",
                                               emb_col="embedding", threshold=0.95)
                kept = out.count()
                best = min(best, time.perf_counter() - t0)
            times[name] = (best, kept)
        print(f"n={n}: " + "  ".join(
            f"{k}={v[0]:.2f}s kept={v[1]}" for k, v in times.items()), flush=True)
    ray.shutdown()


if __name__ == "__main__":
    main()
