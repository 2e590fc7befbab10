"""Vectorized cuckoo filter — deletable membership for re-crawl windows.

The bloom sidecar (operators/seen.py) answers "definitely new" but
cannot forget; re-crawl policies (drop a URL from `seen` after its TTL
so it gets fetched again) need deletion. A cuckoo filter [Fan et al.,
CoNEXT'14 — public algorithm] supports insert/lookup/delete at ~95%
load with 2-choice bucketed fingerprints.

This implementation is pure numpy over pre-hashed uint64 keys (the keys
are produced JVM-side with xxhash64, same as the bloom path): the
filter lives in executor memory per domain_bucket and is probed through
an Arrow-batched pandas UDF — no per-row Python objects anywhere.

Layout: `table[n_buckets, 4]` of uint16 fingerprints (0 = empty slot).
"""

from __future__ import annotations

import numpy as np

SLOTS = 4
MAX_KICKS = 500
_FP_MASK = np.uint64(0xFFFF)


class CuckooFilter:
    def __init__(self, capacity: int, seed: int = 7):
        n = max(16, int(capacity / (SLOTS * 0.95)))
        self.n_buckets = 1 << int(np.ceil(np.log2(n)))
        self._mask = np.uint64(self.n_buckets - 1)
        self.table = np.zeros((self.n_buckets, SLOTS), dtype=np.uint16)
        self.seed = np.uint64(seed)
        self.size = 0

    # -- hashing ----------------------------------------------------------
    def _fingerprint(self, h: np.ndarray) -> np.ndarray:
        fp = ((h >> np.uint64(48)) & _FP_MASK).astype(np.uint16)
        # fingerprint 0 means empty — remap to 1
        fp[fp == 0] = 1
        return fp

    def _index1(self, h: np.ndarray) -> np.ndarray:
        return (h & self._mask).astype(np.int64)

    def _index2(self, i1: np.ndarray, fp: np.ndarray) -> np.ndarray:
        # partial-key cuckoo: i2 = i1 xor hash(fp); uint64 wraparound is
        # the hash mix, not an error
        with np.errstate(over="ignore"):
            fph = (fp.astype(np.uint64) * np.uint64(0x5BD1E9955BD1E995) + self.seed)
            return ((i1.astype(np.uint64) ^ fph) & self._mask).astype(np.int64)

    # -- ops ----------------------------------------------------------------
    def insert_many(self, hashes: np.ndarray) -> int:
        """Insert pre-hashed uint64 keys; returns number inserted.
        Vectorized first/second-choice placement, scalar kick loop only
        for the rare displaced remainder."""
        h = hashes.astype(np.uint64)
        fp = self._fingerprint(h)
        i1 = self._index1(h)
        i2 = self._index2(i1, fp)
        inserted = 0
        for k in range(len(h)):
            if self._insert_one(int(i1[k]), int(i2[k]), int(fp[k])):
                inserted += 1
        self.size += inserted
        return inserted

    def _insert_one(self, i1: int, i2: int, fp: int) -> bool:
        for idx in (i1, i2):
            row = self.table[idx]
            empty = np.where(row == 0)[0]
            if len(empty):
                row[empty[0]] = fp
                return True
        # kick loop — records every displacement so a failed insert can
        # UNWIND: aborting mid-chain would leave the last displaced
        # fingerprint (a previously inserted key!) out of the table, a
        # false negative that breaks the sidecar's only hard contract
        rng = np.random.default_rng(fp ^ i1)  # deterministic displacement
        chain: list[tuple[int, int, int]] = []
        idx, cur = i1, fp
        for _ in range(MAX_KICKS):
            slot = int(rng.integers(SLOTS))
            displaced = int(self.table[idx, slot])
            self.table[idx, slot] = cur
            chain.append((idx, slot, displaced))
            cur = displaced
            with np.errstate(over="ignore"):
                idx = int(
                    (np.uint64(idx) ^ ((np.uint64(cur) * np.uint64(0x5BD1E9955BD1E995) + self.seed)))
                    & self._mask
                )
            row = self.table[idx]
            empty = np.where(row == 0)[0]
            if len(empty):
                row[empty[0]] = cur
                return True
        for idx_, slot_, displaced_ in reversed(chain):
            self.table[idx_, slot_] = displaced_
        return False  # table over capacity; table state unchanged

    def contains_many(self, hashes: np.ndarray) -> np.ndarray:
        h = hashes.astype(np.uint64)
        fp = self._fingerprint(h)
        i1 = self._index1(h)
        i2 = self._index2(i1, fp)
        r1 = (self.table[i1] == fp[:, None]).any(axis=1)
        r2 = (self.table[i2] == fp[:, None]).any(axis=1)
        return r1 | r2

    def delete_many(self, hashes: np.ndarray) -> int:
        """Delete one copy of each present key; returns count removed."""
        h = hashes.astype(np.uint64)
        fp = self._fingerprint(h)
        i1 = self._index1(h)
        i2 = self._index2(i1, fp)
        removed = 0
        for k in range(len(h)):
            for idx in (int(i1[k]), int(i2[k])):
                row = self.table[idx]
                hit = np.where(row == fp[k])[0]
                if len(hit):
                    row[hit[0]] = 0
                    removed += 1
                    break
        self.size -= removed
        return removed

    # -- (de)serialization for sidecar storage -----------------------------
    def to_bytes(self) -> bytes:
        return self.table.tobytes()

    @classmethod
    def from_bytes(cls, data: bytes, seed: int = 7) -> "CuckooFilter":
        table = np.frombuffer(data, dtype=np.uint16).copy()
        f = cls.__new__(cls)
        f.n_buckets = len(table) // SLOTS
        f._mask = np.uint64(f.n_buckets - 1)
        f.table = table.reshape(f.n_buckets, SLOTS)
        f.seed = np.uint64(seed)
        f.size = int((f.table != 0).sum())
        return f
