"""Interactive AugmentFP demo (ref: streamlit_app/app.py:16-188).

Parameter sliders (loudspeaker EQ, room reverb, background noise SNR,
recording-device gain/clipping/band-limits) -> jitted AugmentFP on device ->
playback of the degraded audio. Run with:

    streamlit run musicfpaugment_tpu/apps/streamlit_app.py

(streamlit is gated — not part of the baked image; the compute path is the
same batched AugmentFP used everywhere else.)
"""

from __future__ import annotations

import json
import os
import tempfile

import numpy as np

SAMPLE_RATE = 16000
EXAMPLES_DIR = os.environ.get(
    "MFPA_EXAMPLES_DIR", "/workspace/src/streamlit_app/examples"
)


def load_audio(st):
    """Example selection / upload (ref: app.py:16-71); wav + mp3 (mp3 via
    the native libmpg123 decoder)."""
    from musicfpaugment_tpu.data.audio_io import read_wav, resample

    examples = {
        f"Clean {i}": os.path.join(EXAMPLES_DIR, f"{i}_clean.wav")
        for i in range(1, 11)
        if os.path.exists(os.path.join(EXAMPLES_DIR, f"{i}_clean.wav"))
    }
    audio_arrays = []
    sample_rates = []
    if examples:
        selected = st.multiselect("Select from example(s)", list(examples))
        for name in selected:
            st.audio(examples[name], format="wav")
            data, sr = read_wav(examples[name])
            mono = data.mean(axis=0) if data.shape[0] > 1 else data[0]
            audio_arrays.append(resample(mono, sr, SAMPLE_RATE))
            sample_rates.append(SAMPLE_RATE)
    files = st.file_uploader(
        "Upload audio", type=["wav", "mp3"], accept_multiple_files=True
    )
    if files:
        for f in files:
            suffix = os.path.splitext(f.name)[1].lower() or ".wav"
            st.audio(f, format="audio/mpeg" if suffix == ".mp3" else "wav")
            # decode through the framework's own dispatch (wav native, mp3
            # via libmpg123) — the uploader hands us a bytes stream
            with tempfile.NamedTemporaryFile(suffix=suffix, delete=False) as tmp:
                tmp.write(f.read())
                path = tmp.name
            try:
                data, sr = read_wav(path)
            finally:
                os.unlink(path)
            mono = data.mean(axis=0) if data.shape[0] > 1 else data[0]
            audio_arrays.append(resample(mono, sr, SAMPLE_RATE))
            sample_rates.append(SAMPLE_RATE)
    if not audio_arrays:
        return None, None
    n = min(a.shape[0] for a in audio_arrays)
    return np.stack([a[:n] for a in audio_arrays])[:, None, :], sample_rates


def define_model(st):
    """Slider panel -> AugmentFP parameters (ref: app.py:94-188)."""
    st.markdown("<h4>Loudspeakers</h4>", unsafe_allow_html=True)
    min_c1, max_c1 = st.slider(
        "-3dB cutoff freq (Hz)", min_value=0, max_value=300, step=1, value=(0, 150)
    )
    st.markdown("<h4>Room</h4>", unsafe_allow_html=True)
    reverb = st.checkbox("Reverb", value=True)
    st.markdown("<h4>Background Noise</h4>", unsafe_allow_html=True)
    min_snr, max_snr = st.slider(
        "SNR (dB)", min_value=-20, max_value=20, step=1, value=(-10, 10)
    )
    st.markdown("<h4>Recording Device</h4>", unsafe_allow_html=True)
    min_gain, max_gain = st.slider(
        "Gain (dB)", min_value=-10, max_value=10, step=1, value=(-5, 5)
    )
    max_clip = st.slider(
        "Clipping", min_value=0.0, max_value=1.0, step=0.01, value=0.01
    )
    min_lpf, max_lpf = st.slider(
        "Low pass filter: -3dB cutoff frequency (Hz)",
        min_value=2000, max_value=3999, step=1, value=(3000, 3999),
    )
    min_hpf, max_hpf = st.slider(
        "High pass filter: -3dB cutoff frequency (Hz)",
        min_value=0, max_value=300, step=1, value=(30, 150),
    )
    parameters = {
        "proba_cutoff_freq1": 1.0,
        "proba_snr_in_db": 1.0,
        "proba_ir_response": int(reverb),
        "proba_gain_in_db": 1.0,
        "proba_percentile_threshold": 1.0,
        "proba_cutoff_freq2": 1.0,
        "proba_cutoff_freq3": 1.0,
        "min_cutoff_freq1": min_c1,
        "max_cutoff_freq1": max_c1,
        "min_snr_in_db": min_snr,
        "max_snr_in_db": max_snr,
        "min_gain_in_db": min_gain,
        "max_gain_in_db": max_gain,
        "max_percentile_threshold": max_clip,
        "min_cutoff_freq2": min_lpf,
        "max_cutoff_freq2": max_lpf,
        "min_cutoff_freq3": min_hpf,
        "max_cutoff_freq3": max_hpf,
    }
    from musicfpaugment_tpu.augment import AugmentFP, synthetic_banks

    split_path = os.environ.get(
        "MFPA_NOISE_SPLIT", "/workspace/src/training/splits/train.json"
    )
    if os.path.exists(split_path):
        with open(split_path) as f:
            noise_paths = json.load(f)
        return AugmentFP(noise_paths, SAMPLE_RATE, parameters)
    noise_bank, ir_bank = synthetic_banks(sample_rate=SAMPLE_RATE)
    return AugmentFP(
        noise_bank, SAMPLE_RATE, parameters, impulse_response_dir=ir_bank
    )


def process_audio(audios: np.ndarray, sample_rates, model):
    """Batched augmentation -> wav bytes (ref: app.py:74-91)."""
    import scipy.io.wavfile

    aug = np.asarray(model.batch_augment(audios))
    outputs = []
    for i, aug_audio in enumerate(aug):
        with tempfile.NamedTemporaryFile(suffix=".wav") as f:
            scipy.io.wavfile.write(
                f.name, sample_rates[i],
                (np.clip(aug_audio[0], -1, 1) * 32767).astype(np.int16),
            )
            outputs.append(open(f.name, "rb").read())
    return outputs


def main() -> None:
    import streamlit as st

    st.title("Music Augmentation for Audio Fingerprinting")
    audios, sample_rates = load_audio(st)
    model = define_model(st)
    if audios is not None and st.button("Augment"):
        outputs = process_audio(audios, sample_rates, model)
        st.markdown("<h4>Augmented</h4>", unsafe_allow_html=True)
        for out in outputs:
            st.audio(out, format="audio/wav")


if __name__ == "__main__":
    main()
