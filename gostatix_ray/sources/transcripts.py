"""Deterministic synthetic conversation-transcript table.

Canonical input shape (BASELINE.json ``input_hint``):
    conv_id:string, turn_idx:int32, role:string, text:string,
    tool:string, ts:timestamp[us]

Fully vectorized generation (numpy + arrow), seeded — the same
(num_turns, seed) always produces byte-identical parquet, so tests and
the two-parallelism scaling bench run on identical input.  Properties
(FIXTURES.md §A):

* conv lengths are zipf-skewed (exercises salted repartitioning);
* role follows a fixed per-turn cycle user/assistant/tool/system;
* tool is drawn zipf from 50 names on tool turns, "" otherwise;
* text is a zipf-weighted token sequence over a 1000-token vocabulary;
* exact ground truths (distinct convs, tool counts, token counts) are
  recoverable with exact scans / DuckDB for oracle checks.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

ROLES = np.array(["user", "assistant", "tool", "system"])
NUM_TOOLS = 50
VOCAB_SIZE = 1000
_EPOCH_US = 1_700_000_000_000_000  # fixed epoch, microseconds


def _tool_names() -> np.ndarray:
    return np.array([f"tool-{i:02d}" for i in range(NUM_TOOLS)])


def _vocab() -> np.ndarray:
    return np.array([f"tok{i:04d}" for i in range(VOCAB_SIZE)])


def generate_transcripts_table(num_turns: int, seed: int = 42, conv_namespace: int = 0) -> pa.Table:
    """``conv_namespace`` prefixes conv ids so independently generated
    shards never collide (sharded generation keeps peak memory bounded)."""
    rng = np.random.default_rng(seed)

    # conversation lengths: zipf-skewed, capped
    est_convs = max(4, num_turns // 6)
    lengths = np.minimum(rng.zipf(1.7, est_convs * 2), 400)
    cum = np.cumsum(lengths)
    ncv = int(np.searchsorted(cum, num_turns)) + 1
    lengths = lengths[:ncv]
    lengths[-1] -= int(cum[ncv - 1] - num_turns) if cum[ncv - 1] > num_turns else 0
    lengths = lengths[lengths > 0]
    total = int(lengths.sum())

    conv_idx = np.repeat(np.arange(len(lengths)), lengths)
    starts = np.cumsum(lengths) - lengths
    turn_idx = (np.arange(total) - np.repeat(starts, lengths)).astype(np.int32)

    conv_ids = np.char.add(f"conv-{conv_namespace:03d}-", np.char.zfill(conv_idx.astype(str), 8))
    role = ROLES[turn_idx % 4]

    # tools: zipf over 50 names on tool turns
    tool = np.full(total, "", dtype=object)
    tool_turns = role == "tool"
    zipf_tool = np.minimum(rng.zipf(1.5, int(tool_turns.sum())), NUM_TOOLS) - 1
    tool[tool_turns] = _tool_names()[zipf_tool]

    # text: per-turn token sequence, zipf vocabulary
    n_tok = rng.integers(5, 30, total)
    flat_tok = (np.minimum(rng.zipf(1.3, int(n_tok.sum())), VOCAB_SIZE) - 1).astype(np.int64)
    words = pa.array(_vocab()[flat_tok])
    if isinstance(words, pa.ChunkedArray):  # large numpy U-dtype inputs chunk
        words = words.combine_chunks()
    offsets = np.zeros(total + 1, dtype=np.int32)
    np.cumsum(n_tok, out=offsets[1:])
    tok_lists = pa.ListArray.from_arrays(pa.array(offsets), words)
    import pyarrow.compute as pc

    text = pc.binary_join(tok_lists, " ")

    ts = pa.array(_EPOCH_US + np.arange(total, dtype=np.int64) * 1_000_000, type=pa.timestamp("us"))

    return pa.table(
        {
            "conv_id": pa.array(conv_ids.astype(str)),
            "turn_idx": pa.array(turn_idx, type=pa.int32()),
            "role": pa.array(role.astype(str)),
            "text": text,
            "tool": pa.array(tool.astype(str)),
            "ts": ts,
        }
    )


def generate_transcripts(
    path: str, num_turns: int, seed: int = 42, row_group_size: int = 65536, num_files: int | None = None
) -> str:
    """Write the table as parquet.

    Large tables are sharded into ``num_files`` part files (default: one
    file per ~250k turns) so ``ray.data.read_parquet`` parallelizes the
    read across tasks — a single monolithic file is read by ONE task and
    serializes the whole pipeline behind it.
    """
    if num_files is None:
        num_files = max(1, num_turns // 250_000)
    if num_files <= 1:
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        pq.write_table(generate_transcripts_table(num_turns, seed), path, row_group_size=row_group_size)
        return path
    # shard-at-a-time generation: peak memory is one shard, not the table
    os.makedirs(path, exist_ok=True)
    per = (num_turns + num_files - 1) // num_files
    for i in range(num_files):
        n_i = min(per, num_turns - i * per)
        if n_i <= 0:
            break
        shard = generate_transcripts_table(n_i, seed + i, conv_namespace=i)
        pq.write_table(shard, os.path.join(path, f"part-{i:05d}.parquet"), row_group_size=row_group_size)
    return path


def exact_ground_truth(table: pa.Table) -> dict:
    """Exact answers for oracle assertions (small scales only)."""
    import pyarrow.compute as pc

    conv = table["conv_id"]
    tools = table.filter(pc.not_equal(table["tool"], ""))["tool"]
    vc = tools.value_counts().to_pylist()
    tool_counts = sorted(((e["values"], e["counts"]) for e in vc), key=lambda t: (-t[1], t[0]))
    return {
        "num_rows": table.num_rows,
        "distinct_convs": len(pc.unique(conv)),
        "distinct_role_tool": len(
            set(zip(table["role"].to_pylist(), table["tool"].to_pylist()))
        ),
        "tool_counts": tool_counts,
    }
