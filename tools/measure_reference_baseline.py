"""Measure the PyTorch reference's setting-1 training throughput on this host.

Replaces the round-1 REF_STEPS_PER_SEC *estimate* in bench.py with measured
numbers (VERDICT.md Missing #2). Two stages are timed independently and then
composed, because the reference pipeline is a producer/consumer:

1. **Per-sample synthesis** — the genuine reference `SynthDrum.__call__`
   (`/root/reference/modules/synthetiser.py:255-292`) run against a synthetic
   one-shot HDF5 with the exact on-disk layout its packer produces
   (`/root/reference/data_modules/convert_augmented_to_hdf5.py:70-138`).
   This is the hot loop the reference runs on every DataLoader worker per
   sample (SURVEY.md §3.1). pedalboard is absent in this image, so the FX
   chain is stubbed to identity — a *conservative* choice: with
   `use_fx_prob=0.3` the real JUCE reverb/compressor would only add cost,
   so the measured synthesis rate is an upper bound on the reference's.

2. **Model fwd/bwd step** at batch 64 — the genuine reference `ADTModel`
   (`/root/reference/model.py:193-258`) under the `ADTTrainer.compute_loss`
   teacher-forcing semantics (`/root/reference/train.py:40-78`). torch in
   this image is CPU-only and torchaudio is absent, so the mel frontend is
   replicated in pure torch (same STFT/mel math torchaudio implements in
   Python over torch.stft). The CPU step time is reported for the record;
   the *composed* baseline assumes the device step is infinitely fast and
   only the 16-worker synthesis pool bounds throughput — again the most
   generous reading for the reference:

       ref steps/s <= n_workers / (batch_size * t_synth_per_sample)

Usage: python tools/measure_reference_baseline.py [--samples N] [--out FILE]
Runs the reference code in-process with sys.path pointed at /root/reference
(and a pedalboard stub injected), so run it from its own interpreter, not
inside the adt_str_tpu test process.
"""

from __future__ import annotations

import argparse
import json
import math
import sys
import tempfile
import time
import types

import numpy as np

REFERENCE = "/root/reference"
SETTING1 = dict(  # configs/train/setting-1.yaml (synthetiser + shared + training)
    input_sec=2.56,
    time_res=0.01,
    win_length=2048,
    sample_rate=24000,
    similarity_threshold=0.8,
    max_hat_std_velocity=0.15,
    max_hat_mean_velocity=0.1,
    max_cymbals_std_velocity=0.15,
    max_cymbals_mean_velocity=0.65,
    ADTOF_mapping=False,
    mixup_range=0.8,
    use_fx_prob=0.3,
    use_reverb_prob=0.5,
    use_compression_prob=0.5,
    use_limiter_prob=0.5,
    batch_size=64,
    n_workers=16,
)
PITCHES = [35, 36, 38, 41, 42, 46, 48, 49]
BINS = ["gold", "100-90", "90-80"]  # the groups tau=0.8 admits
N_PER_BIN = 8
MAX_ONESHOT_SEC = 1.28


def _install_pedalboard_stub() -> None:
    """pedalboard (C++ JUCE) is not in this image; stub it to identity FX.

    This *removes* FX cost from the measurement, which can only make the
    reference look faster than it is — acceptable for a lower-bound divisor.
    """
    mod = types.ModuleType("pedalboard")

    class _FX:  # noqa: D401 - parameter sink
        def __init__(self, *a, **k):
            pass

    class Pedalboard(list):
        def __init__(self, plugins=None):
            super().__init__(plugins or [])

        def __call__(self, audio, sample_rate):
            return audio

    mod.Pedalboard = Pedalboard
    mod.Reverb = type("Reverb", (_FX,), {})
    mod.Compressor = type("Compressor", (_FX,), {})
    mod.Limiter = type("Limiter", (_FX,), {})
    sys.modules["pedalboard"] = mod


def _build_bank_hdf5(path: str, rng: np.random.Generator) -> None:
    """Synthetic one-shot library with the reference packer's layout:
    /<gm-pitch>/<bin>/<name> float32 gzip (convert_augmented_to_hdf5.py:70-138)."""
    import h5py

    sr = SETTING1["sample_rate"]
    max_len = int(MAX_ONESHOT_SEC * sr)
    with h5py.File(path, "w") as f:
        for pitch in PITCHES:
            for b in BINS:
                for i in range(N_PER_BIN):
                    n = int(rng.integers(max_len // 4, max_len))
                    t = np.arange(n, dtype=np.float32) / sr
                    freq = float(rng.uniform(60, 4000))
                    wav = (
                        np.sin(2 * np.pi * freq * t)
                        * np.exp(-t * float(rng.uniform(5, 60)))
                    ).astype(np.float32)
                    f.create_dataset(
                        f"{pitch}/{b}/shot_{i}.wav", data=wav, compression="gzip"
                    )


def _make_notes(rng: np.random.Generator, n_samples: int) -> list[np.ndarray]:
    """Same note distribution bench.py uses (3-40 notes per 2.56 s chunk)."""
    out = []
    for _ in range(n_samples):
        n = int(rng.integers(3, 40))
        onsets = np.sort(rng.uniform(0, 2.4, n))
        notes = np.stack(
            [
                onsets,
                onsets + 0.05,
                rng.choice(PITCHES, n).astype(np.float64),
                rng.integers(30, 127, n).astype(np.float64),
            ],
            axis=1,
        )
        out.append(notes)
    return out


def measure_synthesis(n_samples: int) -> dict:
    _install_pedalboard_stub()
    _install_torchaudio_stub()  # reference utils/utils.py imports it at module level
    sys.path.insert(0, REFERENCE)
    from modules.synthetiser import SynthDrum, SynthDrumConfig  # reference code

    rng = np.random.default_rng(0)
    with tempfile.TemporaryDirectory() as td:
        prefix = f"{td}/oneshot"
        _build_bank_hdf5(f"{prefix}@{SETTING1['sample_rate']}.hdf5", rng)
        cfg = SynthDrumConfig(
            input_sec=SETTING1["input_sec"],
            time_res=SETTING1["time_res"],
            win_length=SETTING1["win_length"],
            sample_rate=SETTING1["sample_rate"],
            oneshot_path=prefix,
            similarity_threshold=SETTING1["similarity_threshold"],
            max_hat_std_velocity=SETTING1["max_hat_std_velocity"],
            max_hat_mean_velocity=SETTING1["max_hat_mean_velocity"],
            max_cymbals_std_velocity=SETTING1["max_cymbals_std_velocity"],
            max_cymbals_mean_velocity=SETTING1["max_cymbals_mean_velocity"],
            ADTOF_mapping=SETTING1["ADTOF_mapping"],
            mixup_range=SETTING1["mixup_range"],
            use_fx_prob=SETTING1["use_fx_prob"],
            use_reverb_prob=SETTING1["use_reverb_prob"],
            use_compression_prob=SETTING1["use_compression_prob"],
            use_limiter_prob=SETTING1["use_limiter_prob"],
        )
        synth = SynthDrum(cfg)
        note_lists = _make_notes(rng, n_samples)
        # warmup (h5py/file-cache effects)
        for notes in note_lists[:8]:
            synth(notes)
        t0 = time.perf_counter()
        for notes in note_lists:
            wav = synth(notes)
        dt = time.perf_counter() - t0
        assert np.isfinite(float(wav.sum()))
    per_sample = dt / n_samples
    bs, nw = SETTING1["batch_size"], SETTING1["n_workers"]
    return {
        "t_synth_per_sample_s": per_sample,
        "synth_samples_per_sec_1worker": 1.0 / per_sample,
        "synth_bound_steps_per_sec_bs64_16workers": nw / (bs * per_sample),
    }


def measure_model_step(n_steps: int = 5) -> dict:
    """Reference ADTModel fwd/bwd at bs64 on CPU torch (for the record)."""
    import torch

    _install_torchaudio_stub()
    sys.path.insert(0, REFERENCE)
    from config import ADTModelConfig  # reference code
    from model import ADTModel

    cfg = ADTModelConfig(
        input_sec=SETTING1["input_sec"],
        time_res=SETTING1["time_res"],
        win_length=SETTING1["win_length"],
        sample_rate=SETTING1["sample_rate"],
        enc_layers=4,
        dec_layers=4,
        nhead=6,
        d_query=128,
        dropout=0.1,
        tgt_vocab_size=1400,
        enc_lr=1e-4,
        dec_lr=1e-4,
        plain=True,
        n_mels=128,
    )
    model = ADTModel(cfg)
    model.train()
    opt = torch.optim.AdamW(model.parameters(), lr=1e-4)

    bs, max_tokens = SETTING1["batch_size"], 256
    torch.manual_seed(0)
    wavs = torch.randn(bs, int(cfg.input_sec * cfg.sample_rate)) * 0.1
    tokens = torch.randint(4, 528, (bs, max_tokens))
    tokens[:, 0] = 2
    tokens[:, -1] = 3
    lengths = torch.full((bs,), max_tokens - 1)

    sys.path.insert(0, REFERENCE)
    from utils.utils import create_mask_plain  # reference code

    def step():
        tgt_input = tokens[:, :-1]
        labels = tokens[:, 1:]
        _, tgt_padding_mask = create_mask_plain(tgt_input.size(1), lengths, "cpu")
        loss = model(
            src=wavs,
            tgt=tgt_input,
            tgt_mask=None,
            tgt_padding_mask=tgt_padding_mask,
            labels=labels,
        )
        loss.backward()
        opt.step()
        opt.zero_grad()
        return float(loss)

    step()  # warmup
    t0 = time.perf_counter()
    for _ in range(n_steps):
        loss = step()
    dt = time.perf_counter() - t0
    assert math.isfinite(loss)
    return {
        "t_model_step_cpu_s_bs64": dt / n_steps,
        "model_steps_per_sec_cpu_bs64": n_steps / dt,
    }


def _install_torchaudio_stub() -> None:
    """torchaudio is absent; replicate MelSpectrogram in pure torch (same math
    torchaudio implements in Python over torch.stft) so model.py imports."""
    import torch

    def _hz_to_mel(f):
        return 2595.0 * math.log10(1.0 + f / 700.0)

    def _mel_to_hz(m):
        return 700.0 * (10.0 ** (m / 2595.0) - 1.0)

    class MelSpectrogram(torch.nn.Module):
        def __init__(
            self,
            sample_rate=16000,
            n_fft=400,
            win_length=None,
            hop_length=None,
            n_mels=128,
            f_min=0.0,
            power=2.0,
            **kw,
        ):
            super().__init__()
            win_length = win_length or n_fft
            hop_length = hop_length or win_length // 2
            self.n_fft, self.win_length, self.hop = n_fft, win_length, hop_length
            self.power = power
            window = torch.hann_window(win_length)
            self.register_buffer("window", window)
            n_freqs = n_fft // 2 + 1
            f_max = sample_rate / 2.0
            m_pts = torch.linspace(
                _hz_to_mel(f_min), _hz_to_mel(f_max), n_mels + 2
            )
            f_pts = torch.tensor([_mel_to_hz(float(m)) for m in m_pts])
            freqs = torch.linspace(0, f_max, n_freqs)
            fb = torch.zeros(n_freqs, n_mels)
            for i in range(n_mels):
                lower = (freqs - f_pts[i]) / (f_pts[i + 1] - f_pts[i])
                upper = (f_pts[i + 2] - freqs) / (f_pts[i + 2] - f_pts[i + 1])
                fb[:, i] = torch.clamp(torch.min(lower, upper), min=0)
            self.register_buffer("fb", fb)

        def forward(self, x):
            spec = torch.stft(
                x,
                n_fft=self.n_fft,
                hop_length=self.hop,
                win_length=self.win_length,
                window=self.window,
                center=True,
                pad_mode="reflect",
                return_complex=True,
            )
            spec = spec.abs() ** self.power
            return torch.matmul(spec.transpose(-1, -2), self.fb).transpose(-1, -2)

    import importlib.machinery

    ta = types.ModuleType("torchaudio")
    transforms = types.ModuleType("torchaudio.transforms")
    transforms.MelSpectrogram = MelSpectrogram
    ta.transforms = transforms
    ta.__version__ = "0.0-stub"
    # transformers' import_utils probes __spec__; a None spec raises ValueError
    for m in (ta, transforms):
        m.__spec__ = importlib.machinery.ModuleSpec(m.__name__, loader=None)
    sys.modules["torchaudio"] = ta
    sys.modules["torchaudio.transforms"] = transforms


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--samples", type=int, default=256)
    ap.add_argument("--model-steps", type=int, default=5)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    result = {"setting": "setting-1 bs64", "host": "this image (torch CPU)"}
    result.update(measure_synthesis(args.samples))
    result.update(measure_model_step(args.model_steps))
    # The composed baseline: generous to the reference — device step assumed
    # free, throughput bounded only by the 16-worker synthesis pool.
    result["ref_steps_per_sec_composed"] = result[
        "synth_bound_steps_per_sec_bs64_16workers"
    ]
    print(json.dumps(result, indent=2))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=2)


if __name__ == "__main__":
    main()
