"""Pure-NumPy mergeable sketch kernels (no Ray dependency).

Each module exposes a ``Spec`` (sizing), a ``State`` (numpy-backed),
``new / update / merge / to_bytes / from_bytes`` plus the structure's
query ops.  All merges are associative and commutative so any partition
order yields byte-identical state (north-rule requirement); validated in
``tests/test_merge_laws.py``.
"""

from . import bloom, cms, cuckoo, hll, kll, tdigest, topk  # noqa: F401
