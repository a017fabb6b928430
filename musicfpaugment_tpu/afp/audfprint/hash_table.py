"""Fixed-array fingerprint hash table — vectorized store, device-side lookup.

Counterpart of the reference's ``HashTable``
(ref: afp/audfprint/hash_table.py:38-326): 2^20 buckets x depth 100 of uint32
values ``(id + 1) << maxtimebits | time``, attempted-insert counts per bucket,
reservoir sampling on overflow. Differences by design:

* ``store`` is a vectorized numpy scatter (sort hashes, within-bucket offsets
  by run position, one fancy-indexed write) instead of a per-hash Python loop
  — same insertion semantics including reservoir overflow (entries processed
  in submission order via a stable sort).
* ``get_hits`` has two paths: a vectorized numpy path, and a device path
  (:meth:`get_hits_dense`) returning dense (num_hashes, depth) gathers that
  feed the batched TPU matcher.
* persistence is ``np.savez_compressed`` instead of gzip-pickle of the whole
  object (safer, language-neutral); the on-disk name is configurable.
"""

from __future__ import annotations

import math
import os
from typing import Any, List, Optional, Union

import numpy as np

HT_VERSION = 20250816


def _bitsfor(maxval: int) -> int:
    """Bits for a power-of-two maxval (ref: hash_table.py:28-35)."""
    maxvalbits = int(round(math.log(maxval) / math.log(2)))
    if maxval != (1 << maxvalbits):
        raise ValueError("maxval must be a power of 2, not %d" % maxval)
    return maxvalbits


class HashTable:
    def __init__(
        self,
        filename: Optional[str] = None,
        hashbits: int = 20,
        depth: int = 100,
        maxtime: int = 16384,
        rng: Optional[np.random.Generator] = None,
    ):
        self._rng = rng or np.random.default_rng(0)
        if filename is not None:
            self.load(filename)
            return
        self.hashbits = hashbits
        self.depth = depth
        self.maxtimebits = _bitsfor(maxtime)
        size = 2**self.hashbits
        self.table = np.zeros((size, self.depth), dtype=np.uint32)
        self.counts = np.zeros(size, dtype=np.int32)
        self.names: List[Any] = []
        self.hashesperid = np.zeros(0, np.uint32)
        self.ht_version = HT_VERSION
        self._name_idx: Optional[dict] = None
        self._free_ids: List[int] = []
        self.dirty = True

    # --------------------------------------------------------------- store

    def _name_index(self) -> dict:
        """name -> id dict, lazily built and kept in sync by the mutators.
        The reference resolves names with ``list.index`` per call
        (hash_table.py:254-275) — O(corpus) per track, O(corpus^2) for a
        full ingest; at the 106k-track reference scale that alone is
        billions of comparisons, so lookups here are a dict."""
        idx = getattr(self, "_name_idx", None)
        if idx is None:  # invalidated by load()/reset()/remove()
            idx = {n: i for i, n in enumerate(self.names) if n is not None}
            self._name_idx = idx
        return idx

    def name_to_id(self, name: Union[int, str], add_if_missing: bool = False) -> int:
        """ref: hash_table.py:254-275."""
        if isinstance(name, (str, bytes)):
            idx = self._name_index()
            got = idx.get(name)
            if got is not None:
                return got
            if not add_if_missing:
                raise ValueError("name " + str(name) + " not found")
            free = getattr(self, "_free_ids", None)
            if free:
                id_ = free.pop()
                self.names[id_] = name
                self.hashesperid[id_] = 0
            else:
                id_ = len(self.names)
                self.names.append(name)
                self.hashesperid = np.append(self.hashesperid, [0])
            idx[name] = id_
            return id_
        if not isinstance(name, (int, np.integer)):
            raise TypeError(f"name must be str or int, got {type(name)}")
        return int(name)

    def store(self, name: Union[int, str], timehashpairs: np.ndarray) -> None:
        """Insert (time, hash) rows under ``name`` — vectorized equivalent of
        the reference's sequential loop (hash_table.py:70-116)."""
        id_ = self.name_to_id(name, add_if_missing=True)
        pairs = np.asarray(timehashpairs)
        if pairs.size == 0:
            self.hashesperid[id_] += 0
            self.dirty = True
            return
        hashmask = (1 << self.hashbits) - 1
        timemask = (1 << self.maxtimebits) - 1
        idval = np.uint32((id_ + 1) << self.maxtimebits)

        h = pairs[:, 1].astype(np.int64) & hashmask
        t = pairs[:, 0].astype(np.int64) & timemask
        vals = (idval + t).astype(np.uint32)

        order = np.argsort(h, kind="stable")
        hs, vs = h[order], vals[order]
        # position within each equal-hash run
        run_start = np.concatenate([[True], hs[1:] != hs[:-1]])
        run_ids = np.cumsum(run_start) - 1
        first_pos = np.nonzero(run_start)[0]
        within = np.arange(len(hs)) - first_pos[run_ids]
        eff_count = self.counts[hs] + within  # count at insertion time

        slot = eff_count.copy()
        over = eff_count >= self.depth
        if over.any():
            # reservoir: uniform slot in [0, eff_count]; keep if < depth
            rand_slots = (
                self._rng.random(over.sum()) * (eff_count[over] + 1)
            ).astype(np.int64)
            slot[over] = rand_slots
        keep = slot < self.depth
        self.table[hs[keep], slot[keep]] = vs[keep]
        np.add.at(self.counts, hs, 1)
        self.hashesperid[id_] += len(pairs)
        self.dirty = True

    # --------------------------------------------------------------- query

    def get_entry(self, hash_: int) -> np.ndarray:
        """[id, time] rows for one hash (ref: hash_table.py:210-218)."""
        vals = self.table[hash_, : min(self.depth, self.counts[hash_])]
        maxtimemask = (1 << self.maxtimebits) - 1
        ids = (vals >> self.maxtimebits).astype(np.int64) - 1
        return np.stack([ids, vals & maxtimemask], axis=1).astype(np.int32)

    def get_hits(self, hashes: np.ndarray) -> np.ndarray:
        """[id, delta_time, hash, time] rows for (time, hash) queries —
        vectorized version of the reference's per-hash loop
        (hash_table.py:220-246)."""
        hashes = np.asarray(hashes)
        if hashes.size == 0:
            return np.zeros((0, 4), np.int32)
        hashmask = (1 << self.hashbits) - 1
        maxtimemask = (1 << self.maxtimebits) - 1
        qt = hashes[:, 0].astype(np.int64)
        qh = hashes[:, 1].astype(np.int64) & hashmask
        nids = np.minimum(self.depth, self.counts[qh])  # (Q,)
        tabvals = self.table[qh]  # (Q, depth)
        cols = np.arange(self.depth)[None, :]
        valid = cols < nids[:, None]
        ids = (tabvals >> self.maxtimebits).astype(np.int64) - 1
        dts = (tabvals & maxtimemask).astype(np.int64) - qt[:, None]
        out = np.stack(
            [
                ids,
                dts,
                np.broadcast_to(qh[:, None], tabvals.shape),
                np.broadcast_to(qt[:, None], tabvals.shape),
            ],
            axis=-1,
        )
        return out[valid].astype(np.int32)

    def get_hits_dense(self, hashes: np.ndarray):
        """Dense (Q, depth) gather for device-side batched matching:
        returns (ids, dts, valid_mask)."""
        hashmask = (1 << self.hashbits) - 1
        maxtimemask = (1 << self.maxtimebits) - 1
        qt = hashes[:, 0].astype(np.int64)
        qh = hashes[:, 1].astype(np.int64) & hashmask
        nids = np.minimum(self.depth, self.counts[qh])
        tabvals = self.table[qh]
        valid = np.arange(self.depth)[None, :] < nids[:, None]
        ids = (tabvals >> self.maxtimebits).astype(np.int32) - 1
        dts = ((tabvals & maxtimemask).astype(np.int64) - qt[:, None]).astype(np.int32)
        return ids, dts, valid

    # --------------------------------------------------------------- admin

    def totalhashes(self) -> int:
        return int(np.sum(self.counts))

    def reset(self) -> None:
        self.table[:, :] = 0
        self.counts[:] = 0
        self.names = []
        self.hashesperid = np.zeros(0, np.uint32)
        self._name_idx = None
        self._free_ids: list = []
        self.dirty = True

    def remove(self, name: Union[str, int]) -> None:
        """Remove all entries for one id (ref: hash_table.py:277-295)."""
        id_ = self.name_to_id(name)
        id_in_table = (self.table >> self.maxtimebits) == id_ + 1
        hashes_removed = 0
        for hash_ in np.nonzero(np.max(id_in_table, axis=1))[0]:
            n = min(self.depth, self.counts[hash_])
            row = self.table[hash_, :n]
            keep = ~id_in_table[hash_, :n]
            kept = row[keep]
            self.table[hash_] = np.concatenate(
                [kept, np.zeros(self.depth - len(kept), np.uint32)]
            )
            self.counts[hash_] = len(kept)
            hashes_removed += int(np.sum(~keep))
        self.names[id_] = None
        self.hashesperid[id_] = 0
        self._name_idx = None
        if not hasattr(self, "_free_ids"):
            self._free_ids = []
        self._free_ids.append(id_)
        self.dirty = True

    def retrieve(self, name: Union[str, int]) -> np.ndarray:
        """All (time, hash) pairs stored for one id
        (ref: hash_table.py:297-316)."""
        id_ = self.name_to_id(name)
        maxtimemask = (1 << self.maxtimebits) - 1
        n = np.minimum(self.depth, self.counts)[:, None]
        valid = np.arange(self.depth)[None, :] < n
        match = valid & ((self.table >> self.maxtimebits) == id_ + 1)
        hash_idx, slot_idx = np.nonzero(match)
        times = self.table[hash_idx, slot_idx] & maxtimemask
        return np.stack([times, hash_idx], axis=1).astype(np.int32)

    def list(self, print_fn=None) -> None:
        if not print_fn:
            print_fn = print
        for name, count in zip(self.names, self.hashesperid):
            if name:
                print_fn(str(name) + " (" + str(int(count)) + " hashes)")

    # --------------------------------------------------------------- io

    def save(self, name: str, compress: bool = True) -> None:
        """``compress=False`` for large tables: a full 2^20 x 100 table is
        ~420 MB of near-random uint32 — deflate burns minutes for ~no
        ratio, and scale ingests checkpoint the table repeatedly."""
        writer = np.savez_compressed if compress else np.savez
        path = name if name.endswith(".npz") else name + ".npz"
        # atomic: a 420 MB write interrupted mid-flight must not destroy the
        # previous checkpoint (learned from a truncated scale-ingest save)
        tmp = path + ".tmp.npz"
        writer(
            tmp,
            table=self.table,
            counts=self.counts,
            names=np.asarray(
                ["" if n is None else str(n) for n in self.names], dtype=object
            ),
            hashesperid=self.hashesperid,
            meta=np.asarray(
                [self.hashbits, self.depth, self.maxtimebits, self.ht_version]
            ),
        )
        os.replace(tmp, path)
        self.dirty = False
        nhashes = self.totalhashes()
        dropped = nhashes - int(np.sum(np.minimum(self.depth, self.counts)))
        print(
            "Saved fprints for",
            sum(n is not None for n in self.names),
            "files (",
            nhashes,
            "hashes) to",
            name,
            "(%.2f%% dropped)" % (100.0 * dropped / max(1, nhashes)),
        )

    def load(self, name: str) -> None:
        path = name if os.path.exists(name) else name + ".npz"
        with np.load(path, allow_pickle=True) as z:
            self.table = z["table"]
            self.counts = z["counts"]
            self.names = [n if n != "" else None for n in z["names"].tolist()]
            self.hashesperid = z["hashesperid"]
            meta = z["meta"]
        self.hashbits, self.depth, self.maxtimebits, self.ht_version = (
            int(meta[0]),
            int(meta[1]),
            int(meta[2]),
            int(meta[3]),
        )
        self._name_idx = None
        self._free_ids = [i for i, n in enumerate(self.names) if n is None]
        self.dirty = False
