"""Per-file key-fingerprint sets — point-lookup file pruning.

The commit metadata already records each file's partition-key RANGE
(``rmin``/``rmax``, the Iceberg manifest column-bounds analogue). Range
bounds are weak exactly where CDC needs pruning most: a delta file holds
the handful of repos one epoch touched, scattered across the whole key
space, so its [min, max] spans nearly everything and a point lookup still
opens every delta generation.

``kfp`` closes that gap: the SET of distinct partition keys per file,
stored as 32-bit md5 fingerprints (the manifest bloom-filter analogue,
but exact-membership within fingerprint collisions). Semantics make it
unconditionally safe:

- a key present in the file ALWAYS matches its own fingerprint (the
  function is deterministic), so pruning never drops a file that holds a
  probed key — no false negatives;
- a fingerprint collision (2^-32 per probe/key pair) only KEEPS a file
  unnecessarily — a false positive costs one redundant read, never
  correctness;
- recording a SUPERSET of the file's keys (e.g. the whole bucket's key
  set stamped on each of the bucket's files) is likewise only
  conservative.

The set is capped at ``KFP_CAP`` distinct keys: past that the encoded
metadata stops paying for itself (compacted base files contain most of a
bucket's keys — range bounds already describe them) and commit-record
size must stay bounded (VERDICT r2 item 7). Over-cap files record no
fingerprint and are kept conservatively.

Fingerprints are md5-derived, computed in plain Python at WRITE time
(in-task over the Arrow table on the fused paths — no extra job, no
shuffle) and probed in plain Python on the DRIVER at read time: no engine
hash function is part of the on-disk contract, so a DuckDB/Iceberg reader
can re-derive them from the spec above.
"""

from __future__ import annotations

import hashlib

KFP_CAP = 64


def key_fingerprint(key: str) -> int:
    """32-bit fingerprint of a partition-key value (md5 leading bytes —
    stable across engines/processes, unlike hash randomization or
    engine-specific xxhash seeds)."""
    return int.from_bytes(hashlib.md5(key.encode("utf-8")).digest()[:4], "big")


def kfp_encode(keys, cap: int = KFP_CAP) -> str | None:
    """Encode an iterable of key values (need not be distinct) as the
    sorted-hex fingerprint set, or None when the distinct count exceeds
    `cap` or a key is null/non-string (conservative: file is kept)."""
    fps: set[int] = set()
    for k in keys:
        if not isinstance(k, str):
            return None
        fps.add(key_fingerprint(k))
        if len(fps) > cap:
            return None
    if not fps:
        return None
    return "".join(f"{v:08x}" for v in sorted(fps))


def kfp_probe(encoded: str, probe_fps: set[int]) -> bool:
    """True iff any probed fingerprint is in the encoded set. O(set) scan
    of an <=cap-sized hex string — driver-side, no I/O."""
    for i in range(0, len(encoded), 8):
        if int(encoded[i : i + 8], 16) in probe_fps:
            return True
    return False
