"""Dejavu evaluation CLI (ref: testing/dejavu_exps.py:16-254).

Same three actions as the audfprint harness against the Dejavu engine.
Fidelity note: the reference silently truncates peaks_metrics to the first 5
queries per condition (dejavu_exps.py:205-207) — a documented bug we do not
replicate (pass ``max_queries`` explicitly to bound work instead).
"""

from __future__ import annotations

import argparse
import json
import os
from typing import Dict, List, Optional

import numpy as np

from musicfpaugment_tpu.afp.dejavu import Dejavu, FileRecognizer
from musicfpaugment_tpu.testing.metrics import F1score, Precision, Recall, psnr
from musicfpaugment_tpu.testing.parameters import (
    afp_db_paths,
    afp_settings,
    queries_paths,
)

RESULTS_DIR = os.environ.get(
    "MFPA_RESULTS_DIR", os.path.join(os.path.dirname(__file__), "results")
)


def create_fp_database(files: List[str], djv: Optional[Dejavu] = None) -> None:
    """ref: dejavu_exps.py:16-18."""
    djv = djv or Dejavu(afp_db_paths["dejavu"], afp_settings["dejavu"], "set")
    djv.fingerprint_directory(files)


def compute_accuracy(audio_paths: List[str], djv: Dejavu, djv2: Dejavu) -> Dict[str, float]:
    """ref: dejavu_exps.py:21-79 — ground truth is the file's own stem, mix
    rule on nb_matches_with_offset."""
    recognizer1 = FileRecognizer(djv)
    recognizer2 = FileRecognizer(djv2)
    tp_no_denoising = 0
    tp_denoising = 0
    tp_mix = 0
    for path in audio_paths:
        gt = str(path).split("/")[-1].split(".")[0]
        results1 = recognizer1.recognize_file(path)
        results2 = recognizer2.recognize_file(path)

        if results1["match"]:
            retrieved_md51 = results1["results"][0]["song_name"].decode("utf-8")
            md51_nb_matches = results1["results"][0]["nb_matches_with_offset"]
            if str(retrieved_md51) == str(gt):
                tp_no_denoising += 1
        else:
            retrieved_md51, md51_nb_matches = "", 0

        if results2["match"]:
            retrieved_md52 = results2["results"][0]["song_name"].decode("utf-8")
            md52_nb_matches = results2["results"][0]["nb_matches_with_offset"]
            if str(retrieved_md52) == str(gt):
                tp_denoising += 1
        else:
            retrieved_md52, md52_nb_matches = "", 0

        if md51_nb_matches >= md52_nb_matches:
            pred_mix, message = retrieved_md51, (
                "MATCH" if results1["match"] else "NOMATCH"
            )
        else:
            pred_mix, message = retrieved_md52, (
                "MATCH" if results2["match"] else "NOMATCH"
            )
        if message == "MATCH" and str(gt) == str(pred_mix):
            tp_mix += 1
    n = len(audio_paths)
    return {
        "No Denoising": tp_no_denoising / n,
        "With Denoising": tp_denoising / n,
        "Mix Pipeline": tp_mix / n,
    }


def compute_accuracy_batched(
    audio_paths: List[str],
    matcher_no_den,
    matcher_den,
    batch_size: int = 64,
) -> Dict[str, float]:
    """Batched counterpart of :func:`compute_accuracy` through the fused
    :class:`~musicfpaugment_tpu.afp.dejavu.DejavuDeviceMatcher` path —
    whole query batches go waveform -> verdict in one XLA program per
    matcher (ref per-file flow: dejavu_exps.py:21-79, including the mix
    rule on ``nb_matches_with_offset``). Queries are loaded through the
    recognizer's own :func:`~musicfpaugment_tpu.afp.dejavu.dejavu.read`
    (wav/pkl/npy, mono downmix, int16 scaling)."""
    from musicfpaugment_tpu.afp.dejavu.dejavu import read as djv_read

    sr = matcher_no_den.settings["samplerate"]
    tp_no = tp_den = tp_mix = 0
    for start in range(0, len(audio_paths), batch_size):
        chunk = audio_paths[start : start + batch_size]
        loaded = [djv_read(p, sample_rate=sr)[0][0] for p in chunk]
        if len({w.shape[0] for w in loaded}) != 1:
            raise ValueError(
                "compute_accuracy_batched requires uniform query lengths "
                "within a chunk (all reference query sets are uniform); "
                "use compute_accuracy for mixed lengths"
            )
        wavs = np.stack(loaded)
        v1 = matcher_no_den.recognize_waveforms(wavs)
        v2 = matcher_den.recognize_waveforms(wavs)
        for path, r1, r2 in zip(chunk, v1, v2):
            gt = str(path).split("/")[-1].split(".")[0]
            name1 = (
                r1["results"][0]["song_name"].decode("utf-8")
                if r1["match"]
                else ""
            )
            n1 = (
                r1["results"][0]["nb_matches_with_offset"]
                if r1["match"]
                else 0
            )
            name2 = (
                r2["results"][0]["song_name"].decode("utf-8")
                if r2["match"]
                else ""
            )
            n2 = (
                r2["results"][0]["nb_matches_with_offset"]
                if r2["match"]
                else 0
            )
            tp_no += name1 == gt and r1["match"]
            tp_den += name2 == gt and r2["match"]
            if n1 >= n2:
                pred, matched = name1, r1["match"]
            else:
                pred, matched = name2, r2["match"]
            tp_mix += matched and pred == gt
    n = max(len(audio_paths), 1)
    return {
        "No Denoising": tp_no / n,
        "With Denoising": tp_den / n,
        "Mix Pipeline": tp_mix / n,
    }


def compute_peaks_metrics(
    queries_augmented: List[str],
    djv_no_den: Dejavu,
    djv_den: Dejavu,
    cleans_path: Optional[str] = None,
    max_queries: Optional[int] = None,
) -> Dict[str, float]:
    """ref: dejavu_exps.py:82-167 (without the silent 5-query truncation)."""
    cleans_path = cleans_path or queries_paths["cleans"]
    if max_queries is not None:
        queries_augmented = queries_augmented[:max_queries]
    precision = Precision()
    recall = Recall()
    f1_score = F1score()
    acc = {k: 0.0 for k in [
        "precision_no_den", "recall_no_den", "f1_score_no_den",
        "psnr_no_den_spec", "prec_den", "rec_den", "f1_den", "psnr_den_spec",
    ]}
    for qpath in queries_augmented:
        query = str(qpath).split("/")[-1]
        query_clean = os.path.join(cleans_path, query)
        m_clean, sgram_clean = djv_no_den.generate_fingerprints(
            query_clean, get_masks=True
        )
        m_aug, sgram_aug = djv_no_den.generate_fingerprints(qpath, get_masks=True)
        m_den, sgram_den = djv_den.generate_fingerprints(qpath, get_masks=True)
        mc = np.asarray(m_clean).T[None]
        ma = np.asarray(m_aug).T[None]
        md = np.asarray(m_den).T[None]
        acc["precision_no_den"] += precision(ma, mc)
        acc["prec_den"] += precision(md, mc)
        acc["recall_no_den"] += recall(ma, mc)
        acc["rec_den"] += recall(md, mc)
        acc["f1_score_no_den"] += f1_score(ma, mc)
        acc["f1_den"] += f1_score(md, mc)
        acc["psnr_no_den_spec"] += float(psnr(sgram_aug[None], sgram_clean[None]))
        acc["psnr_den_spec"] += float(psnr(sgram_den[None], sgram_clean[None]))
    n = len(queries_augmented)
    return {k: v / n for k, v in acc.items()}


def compute_peaks_metrics_batched(
    queries_augmented: List[str],
    djv_no_den: Dejavu,
    djv_den: Dejavu,
    cleans_path: Optional[str] = None,
    max_queries: Optional[int] = None,
    batch_size: int = 64,
    num_workers: int = 8,
) -> Dict[str, float]:
    """Batched counterpart of :func:`compute_peaks_metrics`: instead of
    three sequential ``generate_fingerprints`` device round-trips per query
    (the reference's per-file loop, ref: dejavu_exps.py:82-167), whole query
    batches run through ``fingerprint_spectrogram_batch`` in one XLA program
    per (engine, length) and the vectorized ``batch_peak_metrics`` /
    ``batch_psnr`` score every example at once. Queries are grouped by exact
    (query, clean) length — reference sets are uniform 8 s — so per-file
    results are bit-identical to the sequential path. Demucs waveform
    denoising applies batched to the raw (unscaled) audio, exactly where
    :func:`~musicfpaugment_tpu.afp.dejavu.dejavu.read` applies it per file
    (per-file ``read`` denoises before any resample; here loading resamples
    first — identical whenever queries are already at the target rate, as
    every reference query set is).
    """
    import collections
    import concurrent.futures as cf

    import jax
    import jax.numpy as jnp

    from musicfpaugment_tpu.afp.dejavu.dejavu import read as djv_read
    from musicfpaugment_tpu.afp.dejavu.fingerprint import (
        fingerprint_spectrogram_batch,
    )
    from musicfpaugment_tpu.testing.metrics import batch_peak_metrics, batch_psnr

    cleans_path = cleans_path or queries_paths["cleans"]
    if max_queries is not None:
        queries_augmented = queries_augmented[:max_queries]
    sr = djv_no_den.settings["samplerate"]

    def _load_pair(qpath):
        try:
            q = djv_read(qpath, sample_rate=sr, int16_scale=False)[0][0]
            c = djv_read(
                os.path.join(cleans_path, str(qpath).split("/")[-1]),
                sample_rate=sr,
                int16_scale=False,
            )[0][0]
            return q, c
        except Exception:
            print("error with ", qpath)
            return None

    with cf.ThreadPoolExecutor(max_workers=num_workers) as pool:
        pairs = [p for p in pool.map(_load_pair, queries_augmented) if p]

    jit_cache: Dict = {}

    def _masks_sgrams(djv, batch):
        """(B, T) raw waveforms -> (peak masks, PSD spectrograms) — the
        generate_fingerprints(get_masks=True) pipeline, one program per
        (engine, length)."""
        w = np.asarray(batch, np.float32)
        if djv.denoising and djv.denoising_model == "demucs":
            w = np.asarray(djv.wave_denoiser(w))
        st = djv.settings
        key = (id(djv), batch.shape[-1])
        if key not in jit_cache:
            hook = (
                djv.spec_denoiser
                if (djv.denoising and djv.denoising_model == "unet")
                else None
            )

            def fn(wv):
                _, mask, specgram = fingerprint_spectrogram_batch(
                    wv,
                    st["samplerate"],
                    st["n_fft"],
                    st["n_hop"],
                    st["amp_min"],
                    denoiser=hook,
                )
                return mask, specgram

            jit_cache[key] = jax.jit(fn)
        return jit_cache[key](jnp.asarray(w * 32767.0))

    groups = collections.defaultdict(list)
    for q, c in pairs:
        groups[(q.shape[0], c.shape[0])].append((q, c))

    sums = {k: 0.0 for k in [
        "precision_no_den", "recall_no_den", "f1_score_no_den",
        "psnr_no_den_spec", "prec_den", "rec_den", "f1_den", "psnr_den_spec",
    ]}
    n = 0
    for _, items in groups.items():
        for start in range(0, len(items), batch_size):
            chunk = items[start : start + batch_size]
            qb = np.stack([q for q, _ in chunk])
            cb = np.stack([c for _, c in chunk])
            m_clean, sg_clean = _masks_sgrams(djv_no_den, cb)
            m_aug, sg_aug = _masks_sgrams(djv_no_den, qb)
            m_den, sg_den = _masks_sgrams(djv_den, qb)
            pm_aug = batch_peak_metrics(m_aug, m_clean, reduce=False)
            pm_den = batch_peak_metrics(m_den, m_clean, reduce=False)
            sums["precision_no_den"] += float(jnp.sum(pm_aug["precision"]))
            sums["recall_no_den"] += float(jnp.sum(pm_aug["recall"]))
            sums["f1_score_no_den"] += float(jnp.sum(pm_aug["f1"]))
            sums["prec_den"] += float(jnp.sum(pm_den["precision"]))
            sums["rec_den"] += float(jnp.sum(pm_den["recall"]))
            sums["f1_den"] += float(jnp.sum(pm_den["f1"]))
            sums["psnr_no_den_spec"] += float(jnp.sum(batch_psnr(sg_aug, sg_clean)))
            sums["psnr_den_spec"] += float(jnp.sum(batch_psnr(sg_den, sg_clean)))
            n += len(chunk)
    return {k: v / max(n, 1) for k, v in sums.items()}


def identification_rate_results(
    denoising_model: str = "unet",
    spec_denoiser=None,
    wave_denoiser=None,
    query_paths: Optional[Dict[str, str]] = None,
    db=None,
) -> Dict[str, Dict[str, float]]:
    """ref: dejavu_exps.py:170-193."""
    results = {}
    query_paths = query_paths or queries_paths
    for augmentation, query_path in query_paths.items():
        print("augmentation:", augmentation)
        queries = [
            os.path.join(query_path, q) for q in sorted(os.listdir(query_path))
        ]
        djv = Dejavu(
            afp_db_paths["dejavu"], afp_settings["dejavu"], "set", db=db
        )
        djv_den = Dejavu(
            afp_db_paths["dejavu"],
            afp_settings["dejavu"],
            "set",
            denoising=True,
            denoising_model=denoising_model,
            spec_denoiser=spec_denoiser,
            wave_denoiser=wave_denoiser,
            db=db,
        )
        results[str(augmentation)] = compute_accuracy(queries, djv, djv_den)
        print(results[str(augmentation)])
    os.makedirs(RESULTS_DIR, exist_ok=True)
    with open(
        os.path.join(RESULTS_DIR, f"accuracy_dejavu_{denoising_model}.json"), "w"
    ) as json_file:
        json.dump(results, json_file, indent=4)
    return results


def peaks_metrics_results(
    denoising_model: str = "unet",
    spec_denoiser=None,
    wave_denoiser=None,
    query_paths: Optional[Dict[str, str]] = None,
    db=None,
    max_queries: Optional[int] = None,
    batched: bool = True,
) -> Dict[str, Dict[str, float]]:
    """ref: dejavu_exps.py:196-227. ``batched=True`` (default) scores whole
    query batches per XLA program (bit-identical per-file results);
    ``batched=False`` is the sequential per-file oracle path."""
    results = {}
    query_paths = query_paths or queries_paths
    for augmentation, query_path in query_paths.items():
        if augmentation == "cleans":
            continue
        print("augmentation:", augmentation)
        queries_augmented = [
            os.path.join(query_path, q) for q in sorted(os.listdir(query_path))
        ]
        djv = Dejavu(afp_db_paths["dejavu"], afp_settings["dejavu"], "set", db=db)
        djv_den = Dejavu(
            afp_db_paths["dejavu"],
            afp_settings["dejavu"],
            "set",
            denoising=True,
            denoising_model=denoising_model,
            spec_denoiser=spec_denoiser,
            wave_denoiser=wave_denoiser,
            db=db,
        )
        fn = compute_peaks_metrics_batched if batched else compute_peaks_metrics
        results[str(augmentation)] = fn(
            queries_augmented, djv, djv_den,
            cleans_path=query_paths.get("cleans"), max_queries=max_queries,
        )
        print(results[str(augmentation)])
    os.makedirs(RESULTS_DIR, exist_ok=True)
    with open(
        os.path.join(RESULTS_DIR, f"peaks_metrics_dejavu_{denoising_model}.json"),
        "w",
    ) as json_file:
        json.dump(results, json_file, indent=4)
    return results


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--action", default="identification_rate")
    parser.add_argument("--model", default="unet")
    args = parser.parse_args()

    if str(args.action) == "index":
        import pandas as pd

        from musicfpaugment_tpu.testing.fma_preprocessing import DATASET_DIR

        fma_large = pd.read_csv(
            os.path.join(DATASET_DIR, "fma_large_preprocessed.csv")
        )
        create_fp_database(list(fma_large["file_paths"]))
    if str(args.action) == "identification_rate":
        identification_rate_results(str(args.model))
    if str(args.action) == "peaks_metrics":
        peaks_metrics_results(str(args.model))


if __name__ == "__main__":
    main()
