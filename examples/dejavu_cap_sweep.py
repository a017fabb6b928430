"""Dejavu hot-key row-cap sweep (VERDICT r3 #5).

``DejavuDeviceIndex.max_rows_per_hash`` truncates hot hash buckets (keep
the ``cap`` smallest song ids per key, matcher_device.py:196-233) — the
documented divergence from the reference's unbounded SQL fetch
(ref: afp/dejavu/postgres_database.py:180-229). The round-3 scale run
capped at 64 and dropped 54% of all rows with an unmeasured accuracy
cost; this sweep measures it: one ingested ~10k-track slice, refinalized
under each cap, with accuracy + q/s per condition.

Run:
  python examples/dejavu_cap_sweep.py ingest --tracks 10000 --minutes 8
  ... repeat until ingest completes ...
  python examples/dejavu_cap_sweep.py sweep --caps 64,256,1024,inf \
      --queries 512 --conditions cleans,default_parameters,bn_m10,full_hard
Writes examples/scale_out/dejavu_cap_sweep.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import dejavu_scale as djs


def stage_sweep(args):
    import jax

    from musicfpaugment_tpu.afp.dejavu import (
        DejavuDeviceIndex,
        DejavuDeviceMatcher,
    )
    from musicfpaugment_tpu.afp.dejavu.variables import MIN_HASHES
    from musicfpaugment_tpu.testing.parameters import test_pipelines_parameters

    state = djs._load_state(args.workdir)
    assert state.get("ingest_done"), "run ingest to completion first"
    n_tracks = state["tracks_target"]
    idx = DejavuDeviceIndex.load(djs._index_path(args.workdir))
    total_rows = int(sum(k.size for k in idx._keys))

    rng = np.random.default_rng(42)
    qidx = rng.integers(0, n_tracks, args.queries).astype(np.int32)
    offsets = rng.integers(
        0,
        (djs.TRACK_SECONDS - djs.QUERY_SECONDS) * djs.SR,
        args.queries,
    ).astype(np.int32)
    corpus_key = jax.random.PRNGKey(args.corpus_seed)

    conditions = {"cleans": None, **test_pipelines_parameters}
    if args.conditions != "all":
        keep = set(args.conditions.split(","))
        conditions = {k: v for k, v in conditions.items() if k in keep}

    sweep = state.get("cap_sweep", {})
    for cap_str in args.caps.split(","):
        if cap_str in sweep and not args.rerun:
            continue
        cap = (1 << 31) - 1 if cap_str == "inf" else int(cap_str)
        idx.max_rows_per_hash = cap
        idx._frozen = None
        t0 = time.perf_counter()
        starts, rows, _nb, depth = idx.finalize()
        finalize_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        dm = DejavuDeviceMatcher(idx)
        upload_s = time.perf_counter() - t0
        entry = {
            "cap": cap if cap_str != "inf" else "inf",
            "bucket_depth": int(depth),
            "rows_stored": int(rows.size),
            "rows_dropped": int(idx.rows_dropped),
            "rows_dropped_pct": round(100.0 * idx.rows_dropped / total_rows, 2),
            "index_mb": round((rows.nbytes + starts.nbytes) / 1e6, 1),
            "finalize_s": round(finalize_s, 1),
            "upload_s": round(upload_s, 1),
            "conditions": {},
        }
        warm = djs._make_queries(
            corpus_key, qidx[: args.batch], offsets[: args.batch]
        )
        dm.match_waveforms(warm)
        for cond, params in conditions.items():
            fp = (
                djs._condition_augmenter(cond, params)
                if params is not None else None
            )
            correct = n_done = 0
            match_s = 0.0
            for s in range(0, args.queries, args.batch):
                tids = qidx[s : s + args.batch]
                offs = offsets[s : s + args.batch]
                crops = djs._make_queries(corpus_key, tids, offs)
                if fp is not None:
                    crops = fp.batch_augment_indexed(
                        crops[:, None, :], np.arange(s, s + len(tids))
                    )[:, 0, :]
                crops.block_until_ready()
                t0 = time.perf_counter()
                res = dm.match_waveforms(crops)
                match_s += time.perf_counter() - t0
                for r, tid in zip(res, tids):
                    n_done += 1
                    if (
                        r
                        and r["nb_matches_with_offset"] > MIN_HASHES
                        and r["song_name"].decode() == f"t{tid:06d}"
                    ):
                        correct += 1
            entry["conditions"][cond] = {
                "accuracy": round(correct / max(n_done, 1), 4),
                "match_qps": round(n_done / match_s, 1),
            }
            print(f"cap={cap_str} {cond} {entry['conditions'][cond]}",
                  flush=True)
        sweep[cap_str] = entry
        state["cap_sweep"] = sweep
        state["sweep_queries"] = args.queries
        djs._save_state(args.workdir, state)
        # free the device index before the next cap re-uploads its own
        del dm

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "scale_out", "dejavu_cap_sweep.json")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        json.dump(
            {
                "tracks": n_tracks,
                "queries": args.queries,
                "total_rows_ingested": total_rows,
                "caps": sweep,
            },
            f,
            indent=2,
        )
        f.write("\n")
    print("wrote", out)


def main():
    try:
        import jax

        jax.config.update(
            "jax_compilation_cache_dir",
            os.environ.get("MFPA_JAX_CACHE", "/tmp/jaxcache"),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    p = argparse.ArgumentParser()
    p.add_argument("stage", choices=["ingest", "sweep"])
    p.add_argument("--workdir", default="/tmp/djv_cap")
    p.add_argument("--tracks", type=int, default=10000)
    p.add_argument("--queries", type=int, default=512)
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--minutes", type=float, default=8.0)
    p.add_argument("--caps", default="64,256,1024,inf")
    p.add_argument(
        "--conditions", default="cleans,default_parameters,bn_m10,full_hard"
    )
    p.add_argument("--corpus-seed", type=int, default=1234)
    p.add_argument("--hash-cap", dest="hash_cap", type=int, default=(1 << 31) - 1,
                   help="ingest-time cap: keep everything so the sweep can "
                        "re-finalize the same raw index under any cap")
    p.add_argument("--rerun", action="store_true")
    args = p.parse_args()
    if args.stage == "ingest":
        djs.stage_ingest(args)
    else:
        stage_sweep(args)


if __name__ == "__main__":
    main()
