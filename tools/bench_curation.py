"""CLAP curation throughput benchmark + 1M-library projection.

North-star axis 3 (BASELINE.json): curate a 1M-sample one-shot library "in
minutes". The reference's hot loop (`augment_data_with_CLAP.py:124-149`)
decodes WAVs serially on the host and encodes batch-by-batch on one GPU; this
benchmark measures our pipeline's stages separately on synthetic WAVs so the
end-to-end projection is composed of *measured* rates:

  1. host WAV decode + resample, serial (the reference's mode);
  2. host decode pipelined over a thread pool (our `encode_files` mode);
  3. device CLAP encode alone (pre-decoded batches, real full-size tower
     with synthetic weights — throughput does not depend on weight values);
  4. end-to-end pipelined `encode_files` (decode overlapped with encode);
  5. the class-assignment matmul at the full 1M x 512 size;
  6. bin+copy of the curated files (host filesystem).

Writes tools/curation_bench.json and prints a summary with the projected
wall-clock for a 1M-sample library.

Usage: python tools/bench_curation.py [--n-files 1024] [--batch-size 64]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time
import wave as wave_mod
from pathlib import Path

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SR = 48_000


def make_synthetic_library(root: Path, n_files: int, rng: np.random.Generator) -> list[str]:
    """Write n_files mono 16-bit WAV one-shots (0.2-1.0 s) at 48 kHz."""
    paths = []
    for i in range(n_files):
        n = int(rng.integers(int(0.2 * SR), int(1.0 * SR)))
        t = np.arange(n) / SR
        f0 = float(rng.uniform(60, 4000))
        sig = np.sin(2 * np.pi * f0 * t) * np.exp(-t * rng.uniform(3, 30))
        sig += rng.normal(0, 0.05, n)
        pcm = np.clip(sig / (np.abs(sig).max() + 1e-9), -1, 1)
        path = root / f"shot_{i:05d}.wav"
        with wave_mod.open(str(path), "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(SR)
            w.writeframes((pcm * 32767).astype(np.int16).tobytes())
        paths.append(str(path))
    return paths


def make_synthetic_clap_state_dict() -> dict[str, np.ndarray]:
    """Random full-size laion/clap-htsat-fused state dict via torch (shapes
    only matter for throughput)."""
    import torch
    from transformers import ClapAudioConfig, ClapConfig, ClapTextConfig

    audio_cfg = ClapAudioConfig(enable_fusion=True)
    text_cfg = ClapTextConfig()
    cfg = ClapConfig.from_text_audio_configs(text_cfg, audio_cfg, projection_dim=512)
    torch.manual_seed(0)
    model = ClapModelLazy(cfg)
    return {k: v.detach().numpy() for k, v in model.state_dict().items()}


def ClapModelLazy(cfg):
    from transformers import ClapModel

    return ClapModel(cfg)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-files", type=int, default=1024)
    ap.add_argument("--batch-size", type=int, default=64)
    ap.add_argument("--assign-size", type=int, default=1_000_000)
    args = ap.parse_args()

    from adt_str_tpu.clap.curation import assign_classes, encode_files
    from adt_str_tpu.clap.model import ClapWrapper
    from adt_str_tpu.utils.audio_io import load_and_resample, normalize

    rng = np.random.default_rng(0)
    results: dict = {"n_files": args.n_files, "batch_size": args.batch_size}

    with tempfile.TemporaryDirectory() as td:
        root = Path(td)
        t0 = time.perf_counter()
        files = make_synthetic_library(root, args.n_files, rng)
        print(f"built {len(files)} synthetic WAVs in {time.perf_counter()-t0:.1f}s")

        # --- stage 1: serial host decode (the reference's mode)
        sub = files[: min(256, len(files))]
        t0 = time.perf_counter()
        for f in sub:
            normalize(load_and_resample(f, SR))
        dt = time.perf_counter() - t0
        results["host_decode_serial_files_per_s"] = len(sub) / dt
        print(f"host decode serial:    {len(sub)/dt:9.1f} files/s")

        # --- stage 2: pooled host decode — resolved exactly like
        # encode_files' default: on a single-core host the pool path is
        # strictly worse than serial (measured 2.5x slower at workers=1 in
        # round 2), so encode_files degrades to the serial loop and this
        # stage is skipped rather than benchmarking a configuration the
        # library never uses.
        from concurrent.futures import ThreadPoolExecutor

        workers = min(16, os.cpu_count() or 1)
        results["host_decode_workers"] = workers
        if workers > 1:
            t0 = time.perf_counter()
            with ThreadPoolExecutor(workers) as pool:
                list(pool.map(lambda f: normalize(load_and_resample(f, SR)), files))
            dt = time.perf_counter() - t0
            results["host_decode_pool_files_per_s"] = len(files) / dt
            print(f"host decode pool({workers:2d}):  {len(files)/dt:9.1f} files/s")
        else:
            results["host_decode_pool_files_per_s"] = None
            results["host_decode_pool_note"] = (
                "single-core host: encode_files uses the serial path "
                "(num_workers<=1); pool stage not applicable"
            )
            print("host decode pool:      skipped (1 core; serial path is the default)")

        # --- stage 3: device encode alone (pre-decoded), decomposed into the
        # H2D upload of the repeat-padded 10 s batch vs the on-device compute
        # (Pallas dB-mel + HTSAT tower). On this host H2D crosses the axon
        # tunnel at a fluctuating 4-20 MB/s; a TPU VM moves the same batch
        # over PCIe in ~10 ms, so the projection uses the compute rate.
        print("building synthetic full-size CLAP weights (torch init)...")
        cache = Path(tempfile.gettempdir()) / "clap_synth_sd.npz"
        if cache.exists():
            sd = dict(np.load(cache))
        else:
            sd = make_synthetic_clap_state_dict()
            np.savez(cache, **sd)
        wrapper = ClapWrapper("<synthetic>", sample_rate=SR, state_dict=sd)
        waves = [normalize(load_and_resample(f, SR)) for f in files[: 4 * args.batch_size]]
        wrapper.get_audio_features(waves[: args.batch_size])  # compile
        t0 = time.perf_counter()
        for i in range(0, len(waves), args.batch_size):
            wrapper.get_audio_features(waves[i : i + args.batch_size])
        dt = time.perf_counter() - t0
        results["device_encode_files_per_s"] = len(waves) / dt
        print(f"device encode alone:   {len(waves)/dt:9.1f} files/s")

        import jax
        import jax.numpy as jnp

        from adt_str_tpu.clap.audio_model import get_audio_features as tower
        from adt_str_tpu.clap.features import _device_mel

        fx = wrapper.feature_extractor
        padded = np.stack([fx._pad_short(w) for w in waves[: args.batch_size]])
        t0 = time.perf_counter()
        wave_dev = jnp.asarray(np.asarray(padded, np.float32))
        jax.block_until_ready(wave_dev)
        h2d = time.perf_counter() - t0
        results["encode_h2d_s_per_batch"] = h2d
        results["encode_h2d_mb_per_s"] = padded.nbytes / 2**20 / h2d

        @jax.jit
        def encode_on_device(w):
            mel = _device_mel(w)  # (B, 1001, 64)
            mels = jnp.repeat(mel[:, None, :, :], 4, axis=1)
            longer = jnp.zeros((w.shape[0],), bool)
            return tower(wrapper.audio_params, mels, longer)

        out = encode_on_device(wave_dev)  # compile
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(3):
            out = encode_on_device(wave_dev)
        jax.block_until_ready(out)
        compute = (time.perf_counter() - t0) / 3
        rate = args.batch_size / compute
        results["device_encode_compute_files_per_s"] = rate
        print(
            f"  = H2D {h2d:5.2f} s/batch ({padded.nbytes/2**20/h2d:.0f} MB/s tunnel) "
            f"+ compute {compute*1e3:6.1f} ms/batch ({rate:.0f} files/s)"
        )

        # --- stage 4: end-to-end pipelined encode_files
        t0 = time.perf_counter()
        embeds, kept = encode_files(wrapper, files, SR, args.batch_size)
        dt = time.perf_counter() - t0
        results["e2e_encode_files_per_s"] = len(files) / dt
        print(f"e2e pipelined encode:  {len(files)/dt:9.1f} files/s")
        assert embeds.shape == (len(files), 512) and kept == list(files)

        # --- stage 5: assignment matmul at 1M. In production the U embeddings
        # are *produced* on device by the encode stage, so score them where
        # they live; the H2D upload is timed separately because on this host
        # it crosses the slow axon tunnel (a real TPU VM moves it over PCIe).
        import jax
        import jax.numpy as jnp

        # U is generated ON DEVICE (in production it lives there as the
        # encode stage's output); the tunnel rate is still recorded from a
        # 64 MB probe — round-3 change: uploading the full 2 GB synthetic U
        # through the 4-20 MB/s tunnel stalled the bench for tens of
        # minutes while measuring nothing the projection uses.
        means = rng.normal(size=(48, 512)).astype(np.float32)
        u_dev = jax.random.normal(
            jax.random.PRNGKey(0), (args.assign_size, 512), jnp.float32
        )
        jax.block_until_ready(u_dev)
        probe = np.ascontiguousarray(
            rng.normal(size=(32768, 512)).astype(np.float32)
        )
        t0 = time.perf_counter()
        jax.block_until_ready(jnp.asarray(probe))
        h2d = time.perf_counter() - t0
        results["assign_h2d_probe_mb"] = probe.nbytes / 2**20
        results["assign_h2d_mb_per_s"] = probe.nbytes / 2**20 / h2d
        # time DEVICE compute alone: the result D2H (8 MB of idx/score over
        # this host's flaky tunnel) is reported separately — the round-2 JSON
        # billed compilation + transfer to "assignment" (the per-call @jax.jit
        # closure also meant the warmups warmed nothing; fixed in curation.py)
        from adt_str_tpu.clap.curation import _score_classes

        means_dev = jnp.asarray(
            means / np.linalg.norm(means, axis=1, keepdims=True)
        )
        jax.block_until_ready(_score_classes(u_dev, means_dev))  # compile
        t0 = time.perf_counter()
        idx_dev, score_dev = _score_classes(u_dev, means_dev)
        jax.block_until_ready((idx_dev, score_dev))
        dt = time.perf_counter() - t0
        results["assign_1m_device_s"] = dt
        t0 = time.perf_counter()
        idx, score = np.asarray(idx_dev), np.asarray(score_dev)
        results["assign_1m_d2h_s"] = time.perf_counter() - t0
        print(
            f"assign {args.assign_size} x 48:  {dt:9.4f} s device compute + "
            f"{results['assign_1m_d2h_s']:.2f} s result D2H "
            f"(tunnel probe: {probe.nbytes/2**20/h2d:.0f} MB/s on this host)"
        )

        # --- stage 6: bin + copy rate
        import shutil

        dest_root = root / "copied"
        t0 = time.perf_counter()
        for i, f in enumerate(files[:256]):
            d = dest_root / str(i % 48) / "100-90"
            d.mkdir(parents=True, exist_ok=True)
            shutil.copy2(f, d / Path(f).name)
        dt = time.perf_counter() - t0
        results["copy_files_per_s"] = 256 / dt
        print(f"bin+copy:              {256/dt:9.1f} files/s")

    # --- projection: decode/encode overlap (pipelined); copy is post-pass.
    # Uses the device *compute* rate for the encode stage (H2D on a real TPU
    # VM is PCIe, ~10 ms/batch; this host's tunnel rate is reported alongside
    # in the JSON for the record).
    n = 1_000_000
    host_rate = (
        results["host_decode_pool_files_per_s"]
        if results.get("host_decode_pool_files_per_s")
        else results["host_decode_serial_files_per_s"]
    )
    pipeline_rate = min(host_rate, results["device_encode_compute_files_per_s"])
    t_encode = n / pipeline_rate
    t_assign = results.get("assign_1m_device_s", 0.0) + results.get("assign_1m_d2h_s", 0.0)
    t_total = t_encode + t_assign + n / results["copy_files_per_s"]
    results["projected_1m_encode_min"] = t_encode / 60
    results["projected_1m_total_min"] = t_total / 60
    # v5e-8 projection: the encode program is per-sample independent and the
    # batch dim is sharded over the mesh's data axis (encode_files(mesh=...),
    # round 4) — device compute scales /8; the host-decode stage scales with
    # worker count (a v5e-8 VM has 112 usable cores vs this 1-core host, so
    # the serial decode rate measured here is NOT the v5e-8 bottleneck:
    # 8 k files/s decode >> 7.9 k files/s encode). Correctness of the
    # sharded path is pinned on the virtual mesh in
    # tests/test_curation_sharded.py (mesh == single-device embeddings).
    v5e8_encode_rate = results["device_encode_compute_files_per_s"] * 8
    v5e8_pipeline = min(host_rate * 16, v5e8_encode_rate)
    t_encode_8 = n / v5e8_pipeline
    t_total_8 = t_encode_8 + t_assign + n / results["copy_files_per_s"]
    results["projected_1m_encode_min_v5e8"] = t_encode_8 / 60
    results["projected_1m_total_min_v5e8"] = t_total_8 / 60
    results["projection_note"] = (
        "single-chip projection using the measured device-compute encode rate "
        "(PCIe H2D assumed, this host's tunnel rate recorded separately); "
        "since round 3 the production get_audio_features short-clip path IS "
        "the device-resident mel+tower program this rate measures (one wave "
        "upload, no host mel round trip); v5e-8 numbers scale the encode rate "
        "x8 (data-axis batch sharding, encode_files(mesh=...), equality "
        "proven on the virtual mesh) and host decode x16 workers; "
        "assign_classes already shards U over the data axis"
    )
    print(
        f"\nprojected 1M library: encode {t_encode/60:.1f} min, "
        f"total {t_total/60:.1f} min (single chip); "
        f"v5e-8: encode {t_encode_8/60:.1f} min, total {t_total_8/60:.1f} min"
    )

    out = Path(__file__).parent / "curation_bench.json"
    out.write_text(json.dumps(results, indent=2) + "\n")
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
