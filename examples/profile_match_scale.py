"""Stage profile of the fused matcher at reference scale (round-3 lead).

Loads the 106k-track scale-proof table (/tmp/scale_proof/table.npz — run
``examples/scale_proof.py ingest`` first) and times cumulative prefixes of
``_match_impl`` with the table passed as a jit ARGUMENT (never a closure
constant), so each marginal is one stage's real cost inside the fused
program at eff_depth=100 / num_ids=106,574:

  1 gather        table[qhashes] + counts[qhashes] + hpi_table[qhashes]
  2 sort          packed (id, dt) hit keys with the hpi payload, ONE lax.sort
  3 candidates    id-run lengths at run starts -> weighted top_k
  4 rank          candidate-rank assignment over the sorted rows
  5 compact       second sort keeping CANDIDATE cells in (rank, dt) order
  6 full          windowed counts + modes + verdict on the budget slice

History: the round-3 marker-merge design (one extra key per corpus id
carrying its weight) measured gather 6.9 / sort 71.6 / top_k 16.5 /
compact 10.1 / rank 4.3 / rest 42.5 = 151.7 ms at B=128 (844 q/s) — the
markers doubled the sort width at 106k ids. The slot-aligned hpi_table
design this file now profiles removes them.

Query hashes are uniform over the 20-bit space, which at a reservoir-full
table measures the true depth-100 gather/sort regime (average bucket depth
~96). Run: python examples/profile_match_scale.py [--batch 128]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update(
    "jax_compilation_cache_dir", os.environ.get("MFPA_JAX_CACHE", "/tmp/jaxcache")
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from musicfpaugment_tpu.afp.audfprint import DeviceMatcher, HashTable
from musicfpaugment_tpu.afp.audfprint import matcher_device as md


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--hashes", type=int, default=1024)
    ap.add_argument("--workdir", default="/tmp/scale_proof")
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()

    ht = HashTable(os.path.join(args.workdir, "table.npz"))
    t0 = time.perf_counter()
    dm = DeviceMatcher(ht)
    print(
        f"table: eff_depth={dm.eff_depth} num_ids={dm.num_ids} "
        f"upload {time.perf_counter() - t0:.1f}s",
        flush=True,
    )

    B, H = args.batch, args.hashes
    rng = np.random.default_rng(0)
    qhashes = jnp.asarray(rng.integers(0, 1 << 20, (B, H)).astype(np.int32))
    qtimes = jnp.asarray(rng.integers(0, 250, (B, H)).astype(np.int32))
    qvalid = jnp.ones((B, H), bool)
    kw = dm._match_kwargs(dm.max_query_frames)
    _ = float(jnp.sum(qtimes))

    def make_stage(stage):
        def prog(table, counts, hpi_table, qt, qh, qv):
            depth, num_ids, C = kw["depth"], kw["num_ids"], kw["max_candidates"]
            threshcount = kw["threshcount"]
            maxtimebits, mqf = kw["maxtimebits"], kw["max_query_frames"]
            T = kw["max_store_time"] + mqf
            T2 = T + 1
            timemask = (1 << maxtimebits) - 1
            K = H * depth
            tab = table[qh]
            nvalid = counts[qh]
            hpit = hpi_table[qh]
            if stage == 1:
                return (jnp.sum(tab, dtype=jnp.int32) + jnp.sum(nvalid)
                        + jnp.sum(hpit).astype(jnp.int32))
            slot_ok = jnp.arange(depth)[None, None, :] < nvalid[..., None]
            hit_ok = slot_ok & qv[..., None]
            ids = (tab >> maxtimebits).astype(jnp.int32) - 1
            dtq = jnp.clip(
                (tab & timemask).astype(jnp.int32) - qt[..., None] + mqf, 0, T
            )
            key_dtype = jnp.int32 if (num_ids + 1) * T2 < 2**31 else jnp.int64
            sentinel = jnp.asarray(num_ids, key_dtype) * T2
            hit_key = jnp.where(
                hit_ok, ids.astype(key_dtype) * T2 + dtq.astype(key_dtype),
                sentinel,
            ).reshape(B, K)
            payload = jnp.where(hit_ok, hpit, 0.0).reshape(B, K)
            s, hpi_at = jax.lax.sort((hit_key, payload), dimension=-1,
                                     num_keys=1)
            if stage == 2:
                return jnp.sum(s) + jnp.sum(hpi_at).astype(jnp.int32)
            pos = jnp.broadcast_to(jnp.arange(K)[None, :], (B, K))
            cell_id = (s // T2).astype(jnp.int32)
            in_corpus = cell_id < num_ids
            id_start = jnp.concatenate(
                [jnp.ones((B, 1), bool), cell_id[:, 1:] != cell_id[:, :-1]],
                axis=1)
            nxt_id = jnp.flip(jax.lax.cummin(
                jnp.flip(jnp.where(id_start, pos, K), -1), axis=1), -1)
            nxt_id_after = jnp.concatenate(
                [nxt_id[:, 1:], jnp.full((B, 1), K)], axis=1)
            raw_at = (nxt_id_after - pos).astype(jnp.int32)
            w_start = jnp.where(
                id_start & in_corpus & (raw_at > threshcount),
                raw_at.astype(jnp.float32) / jnp.maximum(hpi_at, 1.0), -1.0)
            top_w, top_pos = jax.lax.top_k(w_start, C)
            cand_ok = top_w > 0.0
            cand = jnp.take_along_axis(cell_id, top_pos, axis=1)
            cand_sent = jnp.where(cand_ok, cand, -1_000_000)
            if stage == 3:
                return jnp.sum(cand_sent)
            is_cand = jnp.zeros((B, K), bool)
            rank = jnp.zeros((B, K), jnp.int32)
            for c in range(C):
                m = cell_id == cand_sent[:, c][:, None]
                is_cand = is_cand | m
                rank = jnp.where(m, c, rank)
            if stage == 4:
                return jnp.sum(rank) + jnp.sum(is_cand)
            cell_start, cell_len = md._run_length(s)
            rem = (s - cell_id.astype(key_dtype) * T2).astype(jnp.int32)
            keep_cell = cell_start & in_corpus & is_cand
            big32 = jnp.iinfo(jnp.int32).max
            ckey = jnp.where(keep_cell, rank * T2 + rem, big32)
            S = min(kw["cell_budget"], K)
            k2, clen = jax.lax.sort((ckey, cell_len), dimension=-1,
                                    num_keys=1)
            k2, clen = k2[:, :S], clen[:, :S]
            if stage == 5:
                return jnp.sum(k2) + jnp.sum(clen)
            out = md._match_impl(table, counts, hpi_table, qt, qh, qv, **kw)
            return jnp.sum(out[0]) + jnp.sum(out[1])

        return jax.jit(prog)

    names = {1: "gather(+hpi)", 2: "+main sort", 3: "+candidates(top_k)",
             4: "+rank loop", 5: "+compact sort", 6: "FULL match"}
    prev = 0.0
    for stage in range(1, 7):
        f = make_stage(stage)
        t0 = time.perf_counter()
        _ = float(f(dm._table, dm._counts, dm._hpit, qtimes, qhashes, qvalid))
        print(f"stage {stage} compile {time.perf_counter() - t0:.1f}s",
              flush=True)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = f(dm._table, dm._counts, dm._hpit, qtimes, qhashes, qvalid)
        _ = float(out)
        dt = (time.perf_counter() - t0) / args.iters * 1000
        print(f"{names[stage]:22s} {dt:8.2f} ms  (marginal {dt - prev:+8.2f} ms"
              f", {B / dt * 1000:6.0f} q/s cumulative)", flush=True)
        prev = dt


if __name__ == "__main__":
    main()
