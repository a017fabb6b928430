"""Batched device-side fingerprint matching (SURVEY.md hot loop #5).

The reference matches one query at a time: a Python loop over candidate ids,
``np.bincount`` per id, iterative mode extraction
(ref: afp/audfprint/audfprint_match.py:102-316). Its own ``get_hits`` is a
per-hash Python loop (ref: hash_table.py:220-246).

TPU-native design — the whole batch of queries is matched by ONE XLA program:

* the 2^20 x depth hash table lives in HBM (~420 MB at reference sizes);
  hits for all queries are one gather ``table[q_hashes]`` -> (B, H, depth);
* per-id raw counts are a scatter-add into a (B, num_ids) array — the
  reference's ``np.bincount(allids)``;
* candidate selection is ``top_k`` over hashesperid-weighted counts, gated on
  ``rawcount > threshcount`` (ref: ``_best_count_ids``, audfprint_match.py:102-129);
* per-candidate time-offset histograms are a second scatter-add into
  (B, C, T) with ``T = maxtime + max_query_frames``;
* mode extraction: the reference's iterative argmax/zero-out loop reduces,
  for the top-1 verdict, to "max over qualifying local maxima of the
  windowed count" — local-max mask + cumsum window + max, no loop
  (ref: ``_approx_match_counts``, audfprint_match.py:235-316). Documented
  divergence: the reference zeroes +-window around each extracted mode, so a
  *lower* local max exactly 2 bins from a higher one is never scored there;
  here it is. Both score the same set of ids; only the reported aligned-count
  can differ (by at most the mass difference inside overlapping windows) in
  that corner, which the parity test bounds.

The numpy :class:`~musicfpaugment_tpu.afp.audfprint.matcher.Matcher` remains
the oracle; parity is asserted in tests/test_matcher_device.py.
"""

from __future__ import annotations

import functools
from typing import Any, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from musicfpaugment_tpu.afp.audfprint.hash_table import HashTable

Array = jnp.ndarray


def _locmax_tail(v: Array) -> Array:
    """Local-max mask on the trailing axis with the reference's end-point
    semantics (ref: audfprint_match.py:24-41): nbr[0]=True, nbr[n]=False,
    mask = nbr[:-1] & ~nbr[1:]."""
    up = v[..., 1:] >= v[..., :-1]
    one = jnp.ones(v.shape[:-1] + (1,), bool)
    zero = jnp.zeros(v.shape[:-1] + (1,), bool)
    nbr_prev = jnp.concatenate([one, up], axis=-1)
    nbr_next = jnp.concatenate([up, zero], axis=-1)
    return nbr_prev & ~nbr_next


def _match_impl(
    table: Array,
    counts: Array,
    hashesperid: Array,
    qtimes: Array,
    qhashes: Array,
    qvalid: Array,
    *,
    depth: int,
    num_ids: int,
    max_candidates: int,
    window: int,
    threshcount: int,
    maxtimebits: int,
    max_query_frames: int,
):
    """qtimes/qhashes/qvalid: (B, H). Returns (best_id, best_count,
    best_mode) per query; best_id == -1 means NOMATCH.

    The table/counts/hashesperid arrays are explicit arguments (NOT closure
    captures): a closed-over array is baked into the XLA program as a
    constant, and at reference scale the 2^20 x 100 table is ~420 MB — far
    past what the remote-compile path accepts. As arguments they stay
    device-resident data.
    """
    B, H = qhashes.shape
    D = depth
    C = max_candidates
    T = (1 << maxtimebits) + max_query_frames
    timemask = (1 << maxtimebits) - 1

    tab = table[qhashes]  # (B, H, D) uint32
    nvalid = counts[qhashes]  # (B, H)
    slot_ok = jnp.arange(D)[None, None, :] < nvalid[..., None]
    hit_ok = slot_ok & qvalid[..., None]  # (B, H, D)
    ids = (tab >> maxtimebits).astype(jnp.int32) - 1
    dts = (tab & timemask).astype(jnp.int32) - qtimes[..., None]
    ids = jnp.where(hit_ok, ids, num_ids)  # sentinel -> dropped

    # raw per-id counts (ref: np.bincount(allids), audfprint_match.py:104-116)
    flat_ids = ids.reshape(B, H * D)
    raw = jnp.zeros((B, num_ids), jnp.int32)
    raw = raw.at[jnp.arange(B)[:, None], flat_ids].add(1, mode="drop")

    # candidate selection: top-C of raw/hashesperid with raw > threshcount
    wtd = raw.astype(jnp.float32) / hashesperid[None, :]
    wtd = jnp.where(raw > threshcount, wtd, -1.0)
    top_wtd, cand = jax.lax.top_k(wtd, C)  # (B, C)
    cand_ok = top_wtd > 0.0
    cand_sent = jnp.where(cand_ok, cand, -1_000_000)

    # rank of each hit's id within the query's candidate list
    order = jnp.argsort(cand_sent, axis=-1)
    cand_sorted = jnp.take_along_axis(cand_sent, order, axis=-1)
    pos = jax.vmap(jnp.searchsorted)(cand_sorted, flat_ids)  # (B, H*D)
    pos = jnp.clip(pos, 0, C - 1)
    rank = jnp.take_along_axis(order, pos, axis=-1)
    is_cand = jnp.take_along_axis(cand_sorted, pos, axis=-1) == flat_ids

    # per-candidate time-offset histograms: scatter into (B, C, T)
    dtq = dts.reshape(B, H * D) + max_query_frames
    dtq_ok = is_cand & (dtq >= 0) & (dtq < T)
    sidx = jnp.where(dtq_ok, rank * T + dtq, C * T)  # sentinel dropped
    hist = jnp.zeros((B, C * T), jnp.int32)
    hist = hist.at[jnp.arange(B)[:, None], sidx].add(1, mode="drop")
    hist = hist.reshape(B, C, T)

    # windowed counts around qualifying local-max modes
    w = window
    csum = jnp.cumsum(jnp.pad(hist, ((0, 0), (0, 0), (w + 1, w))), axis=-1)
    wcount = csum[..., 2 * w + 1 :] - csum[..., : T]  # sum over [t-w, t+w]
    modes = _locmax_tail(hist) & (hist > threshcount)
    scored = jnp.where(modes, wcount, 0)  # (B, C, T)
    best_per_cand = jnp.max(scored, axis=-1)  # (B, C)
    best_mode_per_cand = jnp.argmax(scored, axis=-1) - max_query_frames
    best_c = jnp.argmax(best_per_cand, axis=-1)  # (B,)
    best_count = jnp.take_along_axis(best_per_cand, best_c[:, None], 1)[:, 0]
    best_id = jnp.take_along_axis(cand, best_c[:, None], 1)[:, 0]
    best_mode = jnp.take_along_axis(best_mode_per_cand, best_c[:, None], 1)[:, 0]
    best_id = jnp.where(best_count > 0, best_id, -1)
    return best_id, best_count, best_mode


class DeviceMatcher:
    """Batched matcher over a device-resident hash table.

    Args mirror the reference Matcher defaults (window 2, threshcount 5,
    search depth; ref: audfprint_match.py:71-100). ``max_candidates`` bounds
    the per-query candidate set like the reference's ``search_depth`` — it is
    kept small (the rawcount > 5 gate rarely passes more than a handful of
    ids) and is configurable where corpora are pathological.
    """

    def __init__(
        self,
        hash_table: HashTable,
        max_candidates: int = 20,
        window: int = 2,
        threshcount: int = 5,
        max_query_frames: int = 512,
    ) -> None:
        self.ht = hash_table
        self.window = window
        self.threshcount = threshcount
        self.max_candidates = max_candidates
        self.max_query_frames = max_query_frames
        self.maxtimebits = hash_table.maxtimebits
        self.num_ids = max(len(hash_table.names), 1)
        # device-resident state (uploaded once; refresh() after new ingests)
        self.refresh()

    def refresh(self) -> None:
        """Re-upload the table after host-side ``store`` calls, and rebuild
        the jitted matcher (its static shape parameters — num_ids, depth —
        may have changed; a fresh jit object guarantees no stale trace)."""
        self._table = jnp.asarray(self.ht.table)
        self._counts = jnp.asarray(
            np.minimum(self.ht.counts, self.ht.depth).astype(np.int32)
        )
        hpi = np.maximum(np.asarray(self.ht.hashesperid, np.float32), 1.0)
        self.num_ids = max(len(self.ht.names), 1)
        self._hashesperid = jnp.asarray(
            np.pad(hpi, (0, self.num_ids - len(hpi)), constant_values=1.0)
        )
        self._match = jax.jit(
            functools.partial(
                _match_impl,
                depth=self.ht.depth,
                num_ids=self.num_ids,
                max_candidates=min(self.max_candidates, self.num_ids),
                window=self.window,
                threshcount=self.threshcount,
                maxtimebits=self.maxtimebits,
                max_query_frames=self.max_query_frames,
            )
        )

    # ------------------------------------------------------------ API

    def match_hashes_batch(
        self, hashes_list: Sequence[np.ndarray]
    ) -> List[Tuple[str, Any, int]]:
        """Match B queries' (time, hash) arrays in one device program.
        Returns per query ("MATCH"|"NOMATCH", name, aligned count) — the
        verdict triple of the reference's ``file_match_to_msgs``
        (ref: audfprint_match.py:373-435)."""
        B = len(hashes_list)
        if B == 0:
            return []
        lens = [len(h) for h in hashes_list]
        H = max(max(lens), 1)
        # bucket H to limit jit specializations across conditions
        Hpad = 1 << int(np.ceil(np.log2(max(H, 64))))
        qt = np.zeros((B, Hpad), np.int32)
        qh = np.zeros((B, Hpad), np.int32)
        qv = np.zeros((B, Hpad), bool)
        for i, h in enumerate(hashes_list):
            n = len(h)
            if n:
                arr = np.asarray(h)
                qt[i, :n] = arr[:, 0]
                qh[i, :n] = arr[:, 1] & ((1 << self.ht.hashbits) - 1)
                qv[i, :n] = True
        best_id, best_count, _ = jax.device_get(
            self._match(
                self._table,
                self._counts,
                self._hashesperid,
                jnp.asarray(qt),
                jnp.asarray(qh),
                jnp.asarray(qv),
            )
        )
        out: List[Tuple[str, Any, int]] = []
        for i in range(B):
            if best_id[i] < 0:
                out.append(("NOMATCH", "", 0))
            else:
                out.append(
                    ("MATCH", self.ht.names[int(best_id[i])], int(best_count[i]))
                )
        return out
