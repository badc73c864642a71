"""Process-stable seed derivation.

The reference seeds ``random`` with experiment-config strings like
"seed-ast-20h" (reference: nn.py:54, train_cfg.json "seed") and relies on
determinism in lieu of tests (SURVEY §4).  Deriving ints from strings via
``hash()`` would be PYTHONHASHSEED-randomized per process, breaking both
single-run reproducibility and the multi-host premise that every host
builds the identical batch stream from the same seed — so all derivations
go through a sha256 digest instead.
"""

import hashlib


def stable_seed(seed, bits=31):
    """Deterministically map any seed (int or str) to a non-negative int
    with ``bits`` bits, identically in every process."""
    if isinstance(seed, int):
        return seed % (2 ** bits)
    digest = hashlib.sha256(str(seed).encode("utf-8")).digest()
    return int.from_bytes(digest[:8], "big") % (2 ** bits)
