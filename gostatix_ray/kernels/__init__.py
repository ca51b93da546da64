"""Pure-NumPy mergeable sketch kernels (no Ray dependency).

Each module exposes a ``Spec`` (sizing), a ``State`` (numpy-backed),
``new / update / merge / to_bytes / from_bytes`` plus the structure's
query ops.  All merges are associative and commutative; bloom, hll,
cms, topk, moments and ddsketch additionally merge BYTE-STABLY — any partition
order yields bit-identical state (north-rule requirement; see
``registry.BYTE_STABLE``) — while kll and tdigest document
value-equivalent-but-not-byte-identical merges (their own module
docstrings).  Validated in ``tests/test_merge_laws.py``.
"""

from . import bloom, cms, cuckoo, ddsketch, hll, kll, moments, spacesaving, tdigest, topk  # noqa: F401
