"""Batched device-side Dejavu matching (SURVEY.md hot loop: the dejavu
query path).

The reference recognizes one file at a time: SHA1 hashes are sent to SQL in
IN-batches, the (song_id, offset_diff) expansion and the offset-histogram
consensus run in Python (ref: afp/dejavu/database.py sketch in
postgres_database.py:182-229, dejavu.py:295-378). At FMA scale a single
query fans out to hundreds of thousands of rows through the DB driver.

TPU-native design — the whole query batch is matched by ONE XLA program:

* the corpus is a CSR index over the injective 26-bit packed key
  ``(f1 << 17) | (f2 << 8) | dt`` (a bijection of the (f1, f2, dt) triple
  the reference's truncated SHA1 encodes — match sets are identical):
  ``starts`` (nbuckets + 1,) int32 + ``rows`` (N,) uint32 packing
  ``(song_id << timebits) | stored_offset``. Unlike audfprint's
  fixed-depth bucket table there is no per-bucket padding, so index HBM is
  exactly 4 bytes/fingerprint + the key-space prefix array;
* query fingerprinting (PSD specgram -> peak mask -> packed hashes with
  per-song dedup, :func:`~musicfpaugment_tpu.afp.dejavu.fingerprint.
  pack_hashes_from_masks`) is fused into the same program;
* hits are the rows ``starts[key] : starts[key] + depth`` per query hash;
  every hit packs into ONE int key ``sid * T3 + (dt + mqf) + 1`` and the
  batch sorts once — counts per (sid, offset) cell are run lengths, with
  zero scatters (the audfprint matcher's measured TPU rule: colliding or
  even unique-index scatters serialize, sorts stream at HBM bandwidth);
* the verdict is one first-wins argmax over cell counts in (sid, dt)
  order, which reproduces the reference's tie-breaking exactly: highest
  count, then the smallest song_id (``sorted`` stability over the groupby
  in dejavu.py:318-325), then the smallest offset (``max`` first-wins over
  the ascending-offset group);
* ``dedup_hashes`` (one count per fetched DB row, regardless of how many
  query offsets share the key — database.py:164-167) rides the same sort
  as a 0/1 ``key_first`` payload and is summed for the winning song by a
  masked elementwise pass.

Documented divergence: ``max_rows_per_hash`` truncates pathological hot
keys (the reference fetches unboundedly many rows per hash; a key shared
by more songs than the cap keeps only the ``max_rows_per_hash`` smallest
(song_id, offset) rows, deterministically). The default cap (256) is far
above the collision depth real corpora produce at 26-bit keys; finalize()
reports how many rows were dropped so exotic corpora fail loud.

The host :meth:`Dejavu.align_matches` path over SQLite remains the oracle;
parity is asserted in tests/test_dejavu_device.py.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from musicfpaugment_tpu.afp.audfprint.matcher_device import _run_length
from musicfpaugment_tpu.afp.dejavu.fingerprint import (
    DEFAULT_SETTINGS,
    fingerprint_spectrogram_batch,
    pack_hashes_from_masks,
)
from musicfpaugment_tpu.afp.dejavu.variables import (
    FINGERPRINTED_CONFIDENCE,
    FINGERPRINTED_HASHES,
    HASHES_MATCHED,
    INPUT_CONFIDENCE,
    INPUT_CONFIDENCE_2,
    INPUT_HASHES,
    MIN_HASHES,
    OFFSET,
    OFFSET_SECS,
    SONG_ID,
    SONG_NAME,
)

Array = jnp.ndarray


def _pow2ceil(n: int) -> int:
    return 1 << max(0, int(np.ceil(np.log2(max(1, n)))))


class DejavuDeviceIndex:
    """Host-built, device-matchable fingerprint corpus.

    Songs are added as packed (key, t1) hash lists — from the host
    :func:`~musicfpaugment_tpu.afp.dejavu.fingerprint.pack_hashes`, or in
    device batches via :meth:`ingest_arrays` (one XLA program per batch:
    spectrogram + peaks + hashing + per-song dedup on chip, only the
    compacted hash lists come back). ``finalize()`` freezes the corpus into
    the CSR arrays the matcher uploads.

    ``timebits`` bounds stored offsets (2^14 frames = ~8.7 min tracks at
    hop 256 / 8 kHz); song ids use the remaining 32 - timebits bits.
    """

    def __init__(
        self, timebits: int = 14, max_rows_per_hash: int = 256
    ) -> None:
        self.timebits = timebits
        self.max_rows_per_hash = max_rows_per_hash
        self.names: List[str] = []
        self.total_hashes: List[int] = []
        self._keys: List[np.ndarray] = []
        self._offs: List[np.ndarray] = []
        self._frozen: Optional[Tuple[np.ndarray, np.ndarray, int, int]] = None
        self.rows_dropped = 0

    # ------------------------------------------------------------ build

    def add_song(
        self, name: str, packed_hashes: Sequence[Tuple[int, int]]
    ) -> int:
        """Add one song's (key, t1) list (``pack_hashes`` output). The list
        is deduplicated here — the reference ingests ``set(hashes)``
        (dejavu.py ``get_file_fingerprints``)."""
        arr = np.asarray(list(packed_hashes), np.int64).reshape(-1, 2)
        arr = np.unique(arr, axis=0)
        if arr.size and int(arr[:, 1].max()) >= (1 << self.timebits):
            raise ValueError(
                f"stored offset {int(arr[:, 1].max())} exceeds "
                f"2^{self.timebits}; raise timebits"
            )
        sid = len(self.names)
        if sid >= (1 << (32 - self.timebits)):
            raise ValueError("song id space exhausted; lower timebits")
        self.names.append(name)
        self.total_hashes.append(int(arr.shape[0]))
        self._keys.append(arr[:, 0].astype(np.int32))
        self._offs.append(arr[:, 1].astype(np.int32))
        self._frozen = None
        return sid

    def ingest_arrays(
        self,
        names: Sequence[str],
        waveforms: np.ndarray,
        settings: Optional[Dict[str, Any]] = None,
        max_peaks: Optional[int] = None,
    ) -> None:
        """Fingerprint a (B, T) waveform batch on device and add each row as
        a song. Mirrors :meth:`Dejavu.fingerprint_arrays`
        (afp/dejavu/dejavu.py) with hashing on chip."""
        st = dict(DEFAULT_SETTINGS)
        st.update(settings or {})
        wavs = jnp.asarray(np.asarray(waveforms, np.float32))
        B, T = wavs.shape
        names = [str(n) for n in names]
        if len(names) != B:
            raise ValueError(
                f"got {len(names)} names for {B} waveform rows"
            )
        n_frames = max(1, 1 + (T - st["n_fft"]) // st["n_hop"])
        mp = max_peaks or _pow2ceil(4 * n_frames)
        keys, t1, valid, _kf, n_distinct, n_over = jax.device_get(
            _ingest_program(
                wavs,
                float(st["samplerate"]),
                int(st["n_fft"]),
                int(st["n_hop"]),
                float(st["amp_min"]),
                mp,
                int(st["fan_value"]),
            )
        )
        if int(n_over):
            import warnings

            warnings.warn(
                f"{int(n_over)}/{B} tracks exceeded the {mp}-peak budget "
                "(truncated earliest-first); pass a larger max_peaks",
                stacklevel=2,
            )
        # Validate the whole batch before mutating the index: a mid-batch
        # ValueError must not leave earlier songs of this batch appended.
        if len(self.names) + B > (1 << (32 - self.timebits)):
            raise ValueError("song id space exhausted; lower timebits")
        batch_offs, batch_keys = [], []
        for i in range(B):
            # valid rows are compact nowhere — select on the host (per-song
            # hash counts are tiny next to the device work)
            v = valid[i]
            offs = t1[i][v].astype(np.int32)
            if offs.size and int(offs.max()) >= (1 << self.timebits):
                raise ValueError("stored offset exceeds timebits range")
            batch_offs.append(offs)
            batch_keys.append(keys[i][v].astype(np.int32))
        for i, name in enumerate(names):
            self.names.append(name)
            self.total_hashes.append(int(n_distinct[i]))
            self._keys.append(batch_keys[i])
            self._offs.append(batch_offs[i])
        self._frozen = None

    def finalize(self) -> Tuple[np.ndarray, np.ndarray, int, int]:
        """Freeze into (starts, rows, nbuckets, depth): rows sorted by
        (key, song_id, offset), per-key truncation at ``max_rows_per_hash``
        (keep-first = smallest song ids, deterministic), CSR prefix over a
        pow2 key space sized to the largest stored key."""
        if self._frozen is not None:
            return self._frozen
        if self._keys:
            keys = np.concatenate(self._keys)
            offs = np.concatenate(self._offs)
            sids = np.concatenate(
                [
                    np.full(k.shape, i, np.int64)
                    for i, k in enumerate(self._keys)
                ]
            )
        else:
            keys = np.zeros(0, np.int32)
            offs = np.zeros(0, np.int32)
            sids = np.zeros(0, np.int64)
        order = np.lexsort((offs, sids, keys))
        keys, offs, sids = keys[order], offs[order], sids[order]
        # rank within key run -> cap hot keys
        if keys.size:
            first = np.concatenate([[True], keys[1:] != keys[:-1]])
            run_start = np.maximum.accumulate(
                np.where(first, np.arange(keys.size), 0)
            )
            rank = np.arange(keys.size) - run_start
            keep = rank < self.max_rows_per_hash
            self.rows_dropped = int((~keep).sum())
            keys, offs, sids = keys[keep], offs[keep], sids[keep]
            depth = int(rank[keep].max()) + 1 if keys.size else 1
            nbuckets = _pow2ceil(int(keys.max()) + 2)
        else:
            depth = 1
            nbuckets = 2
        counts = np.bincount(keys, minlength=nbuckets).astype(np.int64)
        starts = np.zeros(nbuckets + 1, np.int64)
        np.cumsum(counts, out=starts[1:])
        if starts[-1] >= 2**31:
            raise ValueError("corpus exceeds int32 row space")
        rows = (
            (sids.astype(np.uint32) << np.uint32(self.timebits))
            | offs.astype(np.uint32)
        )
        self._frozen = (starts.astype(np.int32), rows, nbuckets, depth)
        return self._frozen

    # ------------------------------------------------------------ io

    def save(self, path: str) -> None:
        """Atomic raw-format save (pre-CSR): cheap to checkpoint mid-ingest
        — finalize() is deferred to the loader. A torn write never corrupts
        the previous checkpoint (tmp + os.replace)."""
        keys = (
            np.concatenate(self._keys) if self._keys else np.zeros(0, np.int32)
        )
        offs = (
            np.concatenate(self._offs) if self._offs else np.zeros(0, np.int32)
        )
        counts = np.asarray([k.size for k in self._keys], np.int64)
        tmp = str(path) + ".tmp.npz"
        np.savez(
            tmp[:-4],
            keys=keys,
            offs=offs,
            song_counts=counts,
            timebits=np.int64(self.timebits),
            max_rows_per_hash=np.int64(self.max_rows_per_hash),
            names=np.asarray(self.names, object),
            total_hashes=np.asarray(self.total_hashes, np.int64),
        )
        import os

        os.replace(tmp, str(path))

    @classmethod
    def load(cls, path: str) -> "DejavuDeviceIndex":
        with np.load(path, allow_pickle=True) as z:
            idx = cls(
                timebits=int(z["timebits"]),
                max_rows_per_hash=int(z["max_rows_per_hash"]),
            )
            idx.names = [str(n) for n in z["names"]]
            idx.total_hashes = [int(n) for n in z["total_hashes"]]
            splits = np.cumsum(z["song_counts"])[:-1]
            idx._keys = [a.astype(np.int32) for a in np.split(z["keys"], splits)]
            idx._offs = [a.astype(np.int32) for a in np.split(z["offs"], splits)]
        return idx


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4, 5, 6))
def _ingest_program(wavs, fs, n_fft, n_hop, amp_min, max_peaks, fan_value):
    _, masks, _ = fingerprint_spectrogram_batch(
        wavs, fs, n_fft, n_hop, amp_min
    )
    return pack_hashes_from_masks(masks, max_peaks, fan_value)


def _dejavu_match_impl(
    starts: Array,
    rows: Array,
    keys: Array,
    t1: Array,
    valid: Array,
    key_first: Array,
    *,
    depth: int,
    num_ids: int,
    timebits: int,
    mqf: int,
    max_store_time: int,
    nbuckets: int,
):
    """keys/t1/valid/key_first: (B, H) sorted deduped query hashes
    (``pack_hashes_from_masks`` layout). Returns per query
    (best_sid, best_count, best_offset, dedup_best); best_sid == -1 when no
    row matched.

    starts/rows are explicit arguments, NOT closure captures — a
    closed-over corpus would bake into the XLA program as a constant
    (the audfprint matcher's documented remote-compile failure mode).
    """
    B, H = keys.shape
    D = depth
    T = max_store_time + mqf
    T3 = T + 3
    K = H * D

    ok_key = valid & (keys >= 0) & (keys < nbuckets)
    k = jnp.clip(keys, 0, nbuckets - 1)
    s0 = starts[k]  # (B, H) — two small random gathers into the prefix
    s1 = starts[k + 1]
    cnt = jnp.minimum(s1 - s0, D)
    slot = jnp.arange(D, dtype=jnp.int32)[None, None, :]
    ridx = jnp.clip(s0[..., None] + slot, 0, max(int(rows.shape[0]) - 1, 0))
    r = rows[ridx]  # (B, H, D) uint32 — contiguous D-windows per hash
    hit_ok = (slot < cnt[..., None]) & ok_key[..., None]
    sid = (r >> timebits).astype(jnp.int32)
    off = (r & ((1 << timebits) - 1)).astype(jnp.int32)
    dt = jnp.clip(off - t1[..., None] + mqf, 0, T)

    key_dtype = jnp.int32 if (num_ids + 1) * T3 < 2**31 else jnp.int64
    sentinel = jnp.asarray(num_ids, key_dtype) * T3
    cell = jnp.where(
        hit_ok,
        sid.astype(key_dtype) * T3 + (dt + 1).astype(key_dtype),
        sentinel,
    ).reshape(B, K)
    isf = jnp.where(
        hit_ok & key_first[..., None], jnp.int32(1), jnp.int32(0)
    ).reshape(B, K)
    s, isf_s = jax.lax.sort((cell, isf), dimension=-1, num_keys=1)

    start, length = _run_length(s)
    in_corpus = s < sentinel
    count_at = jnp.where(start & in_corpus, length, 0)
    # first-wins argmax over ascending (sid, dt) cells == reference
    # tie-breaking: count desc, then sid asc (stable sort over the sid-
    # ascending groupby), then offset asc (max first-wins per song)
    best_pos = jnp.argmax(count_at, axis=-1)
    best_count = jnp.take_along_axis(count_at, best_pos[:, None], 1)[:, 0]
    bk = jnp.take_along_axis(s, best_pos[:, None], 1)[:, 0]
    best_sid = (bk // T3).astype(jnp.int32)
    best_dt = (
        (bk - best_sid.astype(key_dtype) * T3).astype(jnp.int32) - 1 - mqf
    )
    cid = (s // T3).astype(jnp.int32)
    dedup_best = jnp.sum(
        jnp.where(in_corpus & (cid == best_sid[:, None]), isf_s, 0), axis=-1
    )
    matched = best_count > 0
    return (
        jnp.where(matched, best_sid, -1),
        best_count,
        jnp.where(matched, best_dt, 0),
        jnp.where(matched, dedup_best, 0),
    )


class DejavuDeviceMatcher:
    """Batched recognizer over a device-resident :class:`DejavuDeviceIndex`.

    ``match_waveforms`` is the fused production path: (B, T) waveforms ->
    per-query top-1 result dicts in :meth:`Dejavu.align_matches` format
    (ref: dejavu.py:312-378) through two XLA programs; only five scalars
    per query (plus one lane-count scalar per batch) leave the device.
    Stage A fingerprints + packs the query hashes and reports the widest
    used lane count across the batch; stage B slices the hash arrays to
    the smallest power-of-two tier covering that count before gathering/
    sorting candidate rows. The padded hash capacity H = max_peaks *
    (fan_value - 1) is sized for the worst query, but real queries use a
    small fraction of it (amp_min prunes most peaks), and every unused
    lane would otherwise drag ``depth`` gathered cells through the
    (B, H*depth) sort — the matcher's dominant cost at corpus scale.
    Dropped lanes hold only sentinel cells that sort behind every real
    cell, so the tiered program is bit-identical to the full-width one
    (asserted in tests/test_dejavu_device.py). ``spec_denoiser`` hooks
    the UNet spectrogram denoiser exactly where the host pipeline applies
    it (fingerprint.py:70-75).

    ``mesh``: optional 1-D ``jax.sharding.Mesh`` for multi-chip serving —
    queries shard over the mesh's first axis, the CSR corpus replicates,
    and the per-query work partitions with no hot-path collectives (same
    layout as the audfprint :class:`~musicfpaugment_tpu.afp.audfprint.
    matcher_device.DeviceMatcher`). Batch size must divide by the mesh
    size; results are bit-identical to the single-device program.
    """

    def __init__(
        self,
        index: DejavuDeviceIndex,
        settings: Optional[Dict[str, Any]] = None,
        spec_denoiser: Optional[Callable[[Array], Array]] = None,
        max_query_frames: int = 512,
        mesh=None,
    ) -> None:
        self.index = index
        self.settings = dict(DEFAULT_SETTINGS)
        self.settings.update(settings or {})
        self.spec_denoiser = spec_denoiser
        self.max_query_frames = max_query_frames
        self.mesh = mesh
        self.refresh()

    def refresh(self) -> None:
        """(Re-)upload the CSR corpus after new songs; rebuild jit caches."""
        starts, rows, self.nbuckets, self.depth = self.index.finalize()
        self._starts = jnp.asarray(starts)
        self._rows = jnp.asarray(rows)
        self.num_ids = max(len(self.index.names), 1)
        offs = rows & np.uint32((1 << self.index.timebits) - 1)
        max_off = int(offs.max()) if rows.size else 0
        self.eff_maxtime = -(-(max_off + 1) // 128) * 128
        self._e2e_cache: dict = {}

    def _effective_mqf(self, n_frames: int) -> int:
        needed = n_frames + 1
        if needed <= self.max_query_frames:
            return self.max_query_frames
        return -(-needed // 128) * 128

    # ------------------------------------------------------------ fused path

    def match_waveforms(
        self,
        waveforms,
        max_peaks: Optional[int] = None,
    ) -> List[Dict[str, Any]]:
        """(B, T) waveforms -> per-query list of align_matches-format dicts
        (empty list = no matching row, the reference's ``results`` for a
        silent query). The ``match`` gate the FileRecognizer applies is
        ``nb_matches_with_offset > MIN_HASHES`` — see
        :meth:`recognize_waveforms`."""
        st = self.settings
        wavs = jnp.asarray(waveforms, jnp.float32)
        B, T = wavs.shape
        if int(self._rows.shape[0]) == 0:  # empty corpus -> no rows match
            return [{} for _ in range(B)]
        n_frames = max(1, 1 + (T - st["n_fft"]) // st["n_hop"])
        mp = max_peaks or _pow2ceil(4 * n_frames)
        mqf = self._effective_mqf(n_frames)
        if self.mesh is not None:
            from jax.sharding import NamedSharding
            from jax.sharding import PartitionSpec as P

            rep = NamedSharding(self.mesh, P())
            dat = NamedSharding(self.mesh, P(self.mesh.axis_names[0]))

        fp_key = ("fp", T, mp,
                  None if self.spec_denoiser is None
                  else id(self.spec_denoiser))
        if fp_key not in self._e2e_cache:
            fs, n_fft, n_hop = (
                float(st["samplerate"]),
                int(st["n_fft"]),
                int(st["n_hop"]),
            )
            amp_min, fan = float(st["amp_min"]), int(st["fan_value"])
            denoiser = self.spec_denoiser

            def prog_fp(w):
                _, masks, _ = fingerprint_spectrogram_batch(
                    w, fs, n_fft, n_hop, amp_min, denoiser=denoiser
                )
                keys, t1, valid, kf, n_distinct, n_over = (
                    pack_hashes_from_masks(masks, mp, fan)
                )
                # widest used lane across the batch: every in-range key
                # (valid or (key, t1)-duplicate) sorts before the 1 << 30
                # sentinels, so lanes >= this count hold sentinels only
                n_used = jnp.max(
                    jnp.sum(keys < (1 << 30), axis=-1)
                ).astype(jnp.int32)
                return keys, t1, valid, kf, n_distinct, n_over, n_used

            if self.mesh is not None:
                self._e2e_cache[fp_key] = jax.jit(
                    prog_fp,
                    in_shardings=(dat,),
                    out_shardings=(dat, dat, dat, dat, dat, rep, rep),
                )
            else:
                self._e2e_cache[fp_key] = jax.jit(prog_fp)

        keys, t1, valid, kf, n_distinct_d, n_over_d, n_used = (
            self._e2e_cache[fp_key](wavs)
        )
        # one scalar readback picks the static hash-lane tier; the packed
        # arrays themselves stay on device between the two programs
        h_tier = min(mp * (int(st["fan_value"]) - 1),
                     _pow2ceil(max(int(jax.device_get(n_used)), 128)))

        match_key = ("match", h_tier, keys.shape[1], mqf, self.num_ids,
                     self.depth, self.nbuckets, self.eff_maxtime)
        if match_key not in self._e2e_cache:
            match_kw = dict(
                depth=self.depth,
                num_ids=self.num_ids,
                timebits=self.index.timebits,
                mqf=mqf,
                max_store_time=self.eff_maxtime,
                nbuckets=self.nbuckets,
            )

            def prog_match(starts, rows, keys, t1, valid, kf):
                sl = lambda a: jax.lax.slice_in_dim(a, 0, h_tier, axis=1)
                return _dejavu_match_impl(
                    starts, rows, sl(keys), sl(t1), sl(valid), sl(kf),
                    **match_kw,
                )

            if self.mesh is not None:
                self._e2e_cache[match_key] = jax.jit(
                    prog_match,
                    in_shardings=(rep, rep, dat, dat, dat, dat),
                    out_shardings=(dat, dat, dat, dat),
                )
            else:
                self._e2e_cache[match_key] = jax.jit(prog_match)

        best_sid, best_count, best_dt, dedup_best = jax.device_get(
            self._e2e_cache[match_key](
                self._starts, self._rows, keys, t1, valid, kf
            )
        )
        n_distinct, n_over = jax.device_get((n_distinct_d, n_over_d))
        if int(n_over):
            import warnings

            warnings.warn(
                f"{int(n_over)}/{B} queries exceeded the {mp}-peak budget "
                "(truncated earliest-first); pass a larger max_peaks",
                stacklevel=2,
            )
        results: List[Dict[str, Any]] = []
        for i in range(B):
            if best_sid[i] < 0:
                results.append({})
                continue
            sid = int(best_sid[i])
            name = self.index.names[sid]
            song_hashes = self.index.total_hashes[sid]
            queried = max(int(n_distinct[i]), 1)
            hashes_matched = int(dedup_best[i])
            nseconds = round(
                float(best_dt[i]) / st["samplerate"] * st["n_hop"], 5
            )
            results.append(
                {
                    SONG_ID: sid,
                    SONG_NAME: name.encode("utf8"),
                    INPUT_HASHES: int(n_distinct[i]),
                    FINGERPRINTED_HASHES: song_hashes,
                    HASHES_MATCHED: hashes_matched,
                    INPUT_CONFIDENCE: round(hashes_matched / queried, 2),
                    INPUT_CONFIDENCE_2: round(int(best_count[i]) / queried, 2),
                    "nb_matches_with_offset": int(best_count[i]),
                    FINGERPRINTED_CONFIDENCE: round(
                        hashes_matched / max(song_hashes, 1), 2
                    ),
                    OFFSET: int(best_dt[i]),
                    OFFSET_SECS: nseconds,
                    "file_sha1": b"",
                }
            )
        return results

    def recognize_waveforms(
        self, waveforms, max_peaks: Optional[int] = None
    ) -> List[Dict[str, Any]]:
        """FileRecognizer-shaped verdicts (ref: file_recognizer.py:39-61):
        ``{"results": [top1...], "match": bool}`` per query, with the
        reference's ``nb_matches_with_offset > MIN_HASHES`` gate."""
        out = []
        for r in self.match_waveforms(waveforms, max_peaks=max_peaks):
            if r:
                out.append(
                    {
                        "results": [r],
                        "match": r["nb_matches_with_offset"] > MIN_HASHES,
                    }
                )
            else:
                out.append({"results": [], "match": False})
        return out
