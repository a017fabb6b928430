"""Stage profile of the denoiser-in-loop match path (VERDICT r4 #4).

The paper's denoised pipeline runs the UNet on every query spectrogram
inside the fused match program (ref: afp/audfprint/peak_extractor.py:265-269
applies the model per spectrogram; at shifts=4 that is four UNet inferences
per query). Round-4's scale artifact showed the denoised path at 57-71% of
the no-denoise rate without isolating where the time goes. This script
measures, on the real chip against the 106k-track table from
``scale_proof.py ingest``:

  1. no-denoise fused match        (baseline q/s)
  2. denoised fused match, f32     (the committed artifact's path)
  3. denoised fused match, bf16    (UNet compute in bfloat16, params f32)
  4. denoiser-only program         (spectrogram + UNet x shifts, no matcher)

for each requested batch size, plus verdict-agreement counts between the
f32 and bf16 denoised paths so the speedup's accuracy cost is observed,
not assumed.

Run (after scale_proof.py ingest + train):
  python examples/profile_denoised_match.py --batches 128,256 --shifts 4
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from examples.scale_proof import (  # noqa: E402
    QUERY_SECONDS,
    SR,
    TRACK_SECONDS,
    _load_denoiser,
    _load_state,
    _make_queries,
    _table_path,
)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--workdir", default="/tmp/scale_proof")
    p.add_argument("--batches", default="128,256")
    p.add_argument("--shifts", type=int, default=4)
    p.add_argument("--queries", type=int, default=1024)
    p.add_argument("--out", default=None,
                   help="write the profile JSON here as well as stdout")
    args = p.parse_args()

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("MFPA_JAX_CACHE", "/tmp/jaxcache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from musicfpaugment_tpu.afp.audfprint import DeviceMatcher, HashTable
    from musicfpaugment_tpu.afp.audfprint.peaks import spectrogram_frontend

    state = _load_state(args.workdir)
    assert state.get("ingest_done"), "run scale_proof.py ingest first"
    n_tracks = state["tracks_target"]
    ht = HashTable(_table_path(args.workdir))
    t0 = time.perf_counter()
    dm = DeviceMatcher(ht)
    print(f"table up in {time.perf_counter() - t0:.1f}s "
          f"({dm._table.size * 4 / 1e6:.0f}MB, {n_tracks} tracks)", flush=True)

    den_f32 = _load_denoiser(args.workdir, bf16=False)
    den_b16 = _load_denoiser(args.workdir, bf16=True)

    rng = np.random.default_rng(7)
    profile = {"shifts": args.shifts, "n_tracks": n_tracks,
               "n_queries": args.queries, "batches": {}}

    for batch in (int(b) for b in args.batches.split(",")):
        qidx = rng.integers(0, n_tracks, args.queries).astype(np.int32)
        offs = rng.integers(
            0, (TRACK_SECONDS - QUERY_SECONDS) * SR, args.queries
        ).astype(np.int32)
        corpus_key = jax.random.PRNGKey(1234)
        crops = [
            _make_queries(corpus_key, qidx[s : s + batch], offs[s : s + batch],
                          batch)
            for s in range(0, args.queries, batch)
        ]
        _ = [float(c[0, 0]) for c in crops]  # force them resident

        # denoiser-only program: the UNet share in isolation — the same
        # four shifted spectrograms the fused program denoises
        def denoise_only(wavs, hook=den_f32):
            outs = []
            for s in range(args.shifts):
                off = int(s / args.shifts * 256)
                outs.append(
                    jnp.sum(spectrogram_frontend(wavs[:, off:], 512, 256, hook))
                )
            return jnp.stack(outs).sum()

        variants = {
            "match_qps": lambda c: dm.match_waveforms(c, shifts=args.shifts),
            "match_den_qps": lambda c: dm.match_waveforms(
                c, shifts=args.shifts, denoiser=den_f32
            ),
            "match_den_bf16_qps": lambda c: dm.match_waveforms(
                c, shifts=args.shifts, denoiser=den_b16
            ),
            "denoiser_only_qps": None,  # handled below (needs readback sync)
        }
        row = {}
        verdicts = {}
        for name, fn in variants.items():
            if name == "denoiser_only_qps":
                prog = jax.jit(denoise_only)
                t0 = time.perf_counter()
                float(prog(crops[0]))
                row["denoiser_compile_s"] = round(time.perf_counter() - t0, 1)
                t0 = time.perf_counter()
                for c in crops:
                    float(prog(c))  # scalar readback = sync barrier
                row[name] = round(args.queries / (time.perf_counter() - t0), 1)
                continue
            t0 = time.perf_counter()
            fn(crops[0])
            row[name.replace("_qps", "_compile_s")] = round(
                time.perf_counter() - t0, 1
            )
            t0 = time.perf_counter()
            vs = []
            for c in crops:
                vs.extend(fn(c))
            row[name] = round(args.queries / (time.perf_counter() - t0), 1)
            verdicts[name] = vs

        agree = sum(
            a[0] == b[0] and (a[0] != "MATCH" or a[1] == b[1])
            for a, b in zip(verdicts["match_den_qps"],
                            verdicts["match_den_bf16_qps"])
        )
        row["bf16_verdict_agreement"] = f"{agree}/{args.queries}"
        # the denoiser's share of the fused denoised program, by subtraction
        if row["match_den_qps"] > 0 and row["match_qps"] > 0:
            row["denoiser_share_pct"] = round(
                100.0
                * (1.0 / row["match_den_qps"] - 1.0 / row["match_qps"])
                * row["match_den_qps"],
                1,
            )
        profile["batches"][str(batch)] = row
        print(json.dumps({str(batch): row}), flush=True)

    print("PROFILE " + json.dumps(profile), flush=True)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(profile, f, indent=2)
            f.write("\n")


if __name__ == "__main__":
    main()
