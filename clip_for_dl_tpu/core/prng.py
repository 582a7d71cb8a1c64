"""PRNG discipline.

The reference relies on global torch/numpy seeds. Here every source of
randomness flows from an explicit `jax.random.key`, split by name, so runs
are reproducible bit-for-bit and the deterministic-run flag (SURVEY.md §5.2)
is just "fix the root seed".
"""

from __future__ import annotations

from typing import Dict, Iterator

import jax


class KeyChain:
    """Named, counted key derivation from a single root seed.

    >>> kc = KeyChain(42)
    >>> k1 = kc.next("dropout")   # distinct every call
    >>> k2 = kc.fixed("init")     # same every call
    """

    def __init__(self, seed: int = 0):
        self._root = jax.random.key(seed)
        self._counters: Dict[str, int] = {}

    def fixed(self, name: str) -> jax.Array:
        return jax.random.fold_in(self._root, _stable_hash(name))

    def next(self, name: str) -> jax.Array:
        c = self._counters.get(name, 0)
        self._counters[name] = c + 1
        return jax.random.fold_in(self.fixed(name), c)

    def stream(self, name: str) -> Iterator[jax.Array]:
        while True:
            yield self.next(name)


def _stable_hash(name: str) -> int:
    # Python's hash() is salted per-process; use a stable FNV-1a instead.
    h = 2166136261
    for b in name.encode():
        h = ((h ^ b) * 16777619) & 0xFFFFFFFF
    return h
