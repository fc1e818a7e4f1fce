"""Shared small utilities."""

import hashlib

__all__ = ["stable_fold"]


def stable_fold(name: str) -> int:
    """Deterministic 31-bit integer from a string, for
    ``jax.random.fold_in`` data. Python's built-in ``hash`` is per-process
    salted (PYTHONHASHSEED), so using it to fold PRNG keys makes streams
    irreproducible across restarts and hosts — the exact defect of the
    reference's validation-window hash (play_dataset.py:25-27 upstream)."""
    digest = hashlib.md5(name.encode()).digest()
    return int.from_bytes(digest[:4], "little") % (2**31)
