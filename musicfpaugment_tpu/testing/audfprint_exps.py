"""Audfprint evaluation CLI (ref: testing/audfprint_exps.py:17-244).

Actions: ``index`` (ingest FMA into the hash table), ``identification_rate``
(accuracy over the 11 conditions with no-denoise / denoise / mix-pipeline
variants), ``peaks_metrics`` (peak P/R/F1 + PSNR of augmented and denoised
queries against clean peaks).

Analyzers/denoisers are injectable (no import-time checkpoint loads); results
go to ``testing/results/*.json`` like the reference.
"""

from __future__ import annotations

import argparse
import json
import os
from typing import Dict, List, Optional

import numpy as np

from musicfpaugment_tpu.afp.audfprint import AudfprintPeaks, HashTable, Matcher
from musicfpaugment_tpu.testing.metrics import F1score, Precision, Recall, psnr
from musicfpaugment_tpu.testing.parameters import (
    afp_db_paths,
    afp_settings,
    queries_paths,
)

RESULTS_DIR = os.environ.get(
    "MFPA_RESULTS_DIR", os.path.join(os.path.dirname(__file__), "results")
)


def create_fp_database(
    files: List[str], dbpath: str, analyzer: Optional[AudfprintPeaks] = None
) -> None:
    """ref: audfprint_exps.py:17-28."""
    hash_tab = HashTable()
    analyzer = analyzer or AudfprintPeaks(afp_settings["audfprint"])
    analyzer.shifts = 1
    for filename in files:
        try:
            analyzer.ingest(hash_tab, filename)
        except Exception:
            print("error with ", filename)
    hash_tab.save(dbpath)


def compute_accuracy(
    files: List[str],
    dbpath,
    analyzer1: AudfprintPeaks,
    analyzer2: AudfprintPeaks,
) -> Dict[str, float]:
    """No-denoise / denoise / mix-rule accuracy (ref: audfprint_exps.py:31-83).

    The mix pipeline picks whichever analyzer produced more aligned hashes.
    """
    hash_tab = dbpath if isinstance(dbpath, HashTable) else HashTable(dbpath)
    matcher = Matcher()
    acc_no_den = 0
    acc_den = 0
    acc_mix = 0
    for filename in files:
        gt = str(filename).split("/")[-1].split(".")[0]
        msgs1 = matcher.file_match_to_msgs(analyzer1, hash_tab, filename)
        msgs2 = matcher.file_match_to_msgs(analyzer2, hash_tab, filename)
        pred1 = msgs1[1].split("/")[-1].split(".")[0]
        if msgs1[0] == "MATCH" and str(gt) == str(pred1):
            acc_no_den += 1
        pred2 = msgs2[1].split("/")[-1].split(".")[0]
        if msgs2[0] == "MATCH" and str(gt) == str(pred2):
            acc_den += 1
        if msgs1[2] >= msgs2[2]:
            pred_mix, message = pred1, msgs1[0]
        else:
            pred_mix, message = pred2, msgs2[0]
        if message == "MATCH" and str(gt) == str(pred_mix):
            acc_mix += 1
    n = len(files)
    return {
        "No Denoising": acc_no_den / n,
        "With Denoising": acc_den / n,
        "Mix Pipeline": acc_mix / n,
    }


def compute_accuracy_batched(
    files: List[str],
    dbpath,
    analyzer1: AudfprintPeaks,
    analyzer2: Optional[AudfprintPeaks] = None,
    batch_size: int = 128,  # measured optimum for the fused matcher (bench r2)
    shifts: int = 4,
    use_device_matcher: bool = True,
    device_matcher=None,
) -> Dict[str, float]:
    """Batched counterpart of :func:`compute_accuracy`: query waveforms are
    stacked, peak extraction for the whole batch (x shifts) runs as one XLA
    program per shift, and matching runs through the batched
    :class:`DeviceMatcher` (one XLA program per batch; the vectorized-numpy
    ``Matcher`` oracle is available via ``use_device_matcher=False``). Same
    accuracy definition and mix rule as the reference
    (audfprint_exps.py:31-83)."""
    from musicfpaugment_tpu.afp.audfprint import DeviceMatcher

    hash_tab = dbpath if isinstance(dbpath, HashTable) else HashTable(dbpath)
    if use_device_matcher:
        # pass a prebuilt DeviceMatcher to reuse its HBM-resident table
        # across conditions (it is ~420 MB at reference scale)
        if device_matcher is None:
            device_matcher = DeviceMatcher(hash_tab)
        match_batch = device_matcher.match_hashes_batch
    else:
        # the flag rules: a prebuilt device_matcher is only consulted when
        # use_device_matcher is True (previously it silently won)
        device_matcher = None
        matcher = Matcher()
        match_batch = lambda hs: [
            matcher.hashes_match_to_msgs(hash_tab, qh) for qh in hs
        ]
    analyzers = [analyzer1] + ([analyzer2] if analyzer2 is not None else [])
    correct = [0 for _ in analyzers]
    acc_mix = 0
    n = 0
    for start in range(0, len(files), batch_size):
        chunk = files[start : start + batch_size]
        wavs, gts = [], []
        for f in chunk:
            try:
                wavs.append(analyzer1._load(f))
                gts.append(str(f).split("/")[-1].split(".")[0])
            except Exception:
                print("error with ", f)
        if not wavs:
            continue
        tmin = min(w.shape[0] for w in wavs)
        batch = np.stack([w[:tmin] for w in wavs])
        per_analyzer = []
        for a in analyzers:
            if device_matcher is not None:
                # fused single-program path: waveform -> verdict on device
                w = batch
                if a.denoising and a.denoising_model == "demucs":
                    w = np.asarray(a.wave_denoiser(w))
                per_analyzer.append(
                    device_matcher.match_waveforms(
                        w,
                        shifts=shifts,
                        density=a.density,
                        n_fft=a.n_fft,
                        n_hop=a.n_hop,
                        f_sd=a.f_sd,
                        maxpksperframe=a.maxpksperframe,
                        denoiser=a._spec_hook(),
                    )
                )
            else:
                hashes_list = a.hashes_batch(batch, shifts=shifts)
                per_analyzer.append(match_batch(hashes_list))
        for qi, gt in enumerate(gts):
            n += 1
            preds = []
            for ai, msgs in enumerate(per_analyzer):
                status, name, aligned = msgs[qi]
                pred = name.split("/")[-1].split(".")[0]
                preds.append((status, pred, aligned))
                if status == "MATCH" and pred == gt:
                    correct[ai] += 1
            if len(preds) == 2:
                best = preds[0] if preds[0][2] >= preds[1][2] else preds[1]
                if best[0] == "MATCH" and best[1] == gt:
                    acc_mix += 1
    out = {"No Denoising": correct[0] / max(n, 1)}
    if analyzer2 is not None:
        out["With Denoising"] = correct[1] / max(n, 1)
        out["Mix Pipeline"] = acc_mix / max(n, 1)
    return out


def compute_peaks_metrics(
    queries_augmented: List[str],
    analyzer_no_den: AudfprintPeaks,
    analyzer_den: AudfprintPeaks,
    cleans_path: Optional[str] = None,
) -> Dict[str, float]:
    """ref: audfprint_exps.py:86-157."""
    cleans_path = cleans_path or queries_paths["cleans"]
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

        m_clean, _, sgram_clean = analyzer_no_den.wavfile2peaks(
            query_clean, get_masks_waveforms=True
        )
        m_aug, _, sgram_aug = analyzer_no_den.wavfile2peaks(
            qpath, get_masks_waveforms=True
        )
        m_den, _, sgram_den = analyzer_den.wavfile2peaks(
            qpath, get_masks_waveforms=True
        )
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


def identification_rate_results(
    denoising_model: str = "unet",
    spec_denoiser=None,
    wave_denoiser=None,
    query_paths: Optional[Dict[str, str]] = None,
    dbpath=None,
    batched: bool = True,
) -> Dict[str, Dict[str, float]]:
    """ref: audfprint_exps.py:160-185. ``batched=True`` (default) runs the
    TPU path — batch peak extraction + one DeviceMatcher whose HBM table is
    reused across all 11 conditions; ``batched=False`` is the sequential
    per-file oracle path."""
    from musicfpaugment_tpu.afp.audfprint import DeviceMatcher

    results = {}
    query_paths = query_paths or queries_paths
    dbpath = dbpath if dbpath is not None else afp_db_paths["audfprint"]
    hash_tab = dbpath if isinstance(dbpath, HashTable) else HashTable(dbpath)
    device_matcher = DeviceMatcher(hash_tab) if batched else None
    for augmentation, query_path in query_paths.items():
        print("augmentation:", augmentation)
        queries = [
            os.path.join(query_path, query) for query in sorted(os.listdir(query_path))
        ]
        analyzer_no_den = AudfprintPeaks(afp_settings["audfprint"])
        analyzer_no_den.shifts = 4
        analyzer_den = AudfprintPeaks(
            afp_settings["audfprint"],
            denoising=True,
            denoising_model=denoising_model,
            spec_denoiser=spec_denoiser,
            wave_denoiser=wave_denoiser,
        )
        analyzer_den.shifts = 4
        if batched:
            results[str(augmentation)] = compute_accuracy_batched(
                queries, hash_tab, analyzer_no_den, analyzer_den,
                device_matcher=device_matcher,
            )
        else:
            results[str(augmentation)] = compute_accuracy(
                queries, hash_tab, analyzer_no_den, analyzer_den
            )
        print(results[str(augmentation)])
    os.makedirs(RESULTS_DIR, exist_ok=True)
    with open(
        os.path.join(RESULTS_DIR, f"accuracy_audfprint_{denoising_model}.json"), "w"
    ) as json_file:
        json.dump(results, json_file, indent=4)
    return results


def peaks_metrics_results(
    denoising_model: str = "unet",
    spec_denoiser=None,
    wave_denoiser=None,
    query_paths: Optional[Dict[str, str]] = None,
) -> Dict[str, Dict[str, float]]:
    """ref: audfprint_exps.py:188-215."""
    results = {}
    query_paths = query_paths or queries_paths
    for augmentation, query_path in query_paths.items():
        if augmentation == "cleans":
            continue
        print("augmentation:", augmentation)
        queries_augmented = [
            os.path.join(query_path, query) for query in sorted(os.listdir(query_path))
        ]
        analyzer_no_den = AudfprintPeaks(afp_settings["audfprint"])
        analyzer_den = AudfprintPeaks(
            afp_settings["audfprint"],
            denoising=True,
            denoising_model=denoising_model,
            spec_denoiser=spec_denoiser,
            wave_denoiser=wave_denoiser,
        )
        results[str(augmentation)] = compute_peaks_metrics(
            queries_augmented, analyzer_no_den, analyzer_den,
            cleans_path=query_paths.get("cleans"),
        )
        print(results[str(augmentation)])
    os.makedirs(RESULTS_DIR, exist_ok=True)
    with open(
        os.path.join(RESULTS_DIR, f"peaks_metrics_audfprint_{denoising_model}.json"),
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
        create_fp_database(
            list(fma_large["file_paths"]), afp_db_paths["audfprint"]
        )
    if str(args.action) == "identification_rate":
        identification_rate_results(str(args.model))
    if str(args.action) == "peaks_metrics":
        peaks_metrics_results(str(args.model))


if __name__ == "__main__":
    main()
