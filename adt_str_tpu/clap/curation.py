"""CLAP-based one-shot library curation.

Pipeline parity with `data_modules/augment_data_with_CLAP.py:71-193` (plus the
gold consolidation of `copy_originals_to_augmented.py` and the HDF5 packer of
`convert_augmented_to_hdf5.py`), redesigned for TPU scale:

- reference set G: wavs grouped by parent-dir pitch name (35-81 and 421 for
  electric hi-hat), batched CLAP audio embedding, per-class mean pooling;
- unstructured library U: batched embedding (one XLA program per batch);
- assignment: the reference sorts every (class, sample) similarity globally
  descending and copies each sample at its first appearance — which is
  exactly `class = argmax_c sim(sample, mean_c)` with score
  `max_c sim` (proved by: the first sorted occurrence of a sample is its
  maximum-similarity class). Implemented as one (U, 512) x (512, C) matmul,
  optionally sharded over the device mesh's data axis so a 1M-sample library
  scores in a single pjit step per shard (SURVEY.md §2.4: the one explicit
  ICI-sharded collective pattern the port calls for);
- binning: cosine [-1, 1] -> percent, `upper-lower` labels ("100-90", ...),
  `num_bins` must divide 100 (`score_to_bin_label`);
- copy each sample once into `<reference_root>_clap_augmented/<class>/<bin>`.
"""

from __future__ import annotations

import logging
import shutil
from glob import glob
from pathlib import Path
from typing import Sequence

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from adt_str_tpu.utils.audio_io import load_and_resample, normalize

logger = logging.getLogger(__name__)

REFERENCE_CLASSES = list(range(35, 82)) + [421]  # 421 = electric hi-hat


def sort_paths_by_parent_folder(file_paths: Sequence[str]) -> list[str]:
    def sort_key(path):
        parent_name = Path(path).parent.name
        try:
            return (0, int(parent_name), Path(path).name.lower())
        except ValueError:
            return (1, parent_name, Path(path).name.lower())

    return sorted(file_paths, key=sort_key)


def validate_num_bins(num_bins: int) -> None:
    """Single home of the bin rule — the CLI calls it pre-flight so an
    invalid value fails before the CLAP model load, not after."""
    if num_bins <= 0 or 100 % num_bins != 0:
        raise ValueError("num_bins must be a positive integer that divides 100 evenly")


def _augmented_root_for(reference_root: str | Path) -> Path:
    """`<reference_root>_clap_augmented` as a SIBLING of the reference tree.
    Normalizing through Path first matters: a trailing slash on the CLI arg
    would otherwise nest the derived root (and curate_library's rmtree of
    it!) INSIDE the reference tree."""
    ref = Path(reference_root)
    return ref.with_name(ref.name + "_clap_augmented")


def score_to_bin_label(score_value: float, num_bins: int = 10) -> str:
    """cosine [-1,1] -> 'upper-lower' percentage bin (augment_data_with_CLAP.py:162-169)."""
    bin_size = 100 // num_bins
    pct = int(round((max(min(score_value, 1.0), -1.0) + 1.0) * 50.0))
    bin_idx = min(pct // bin_size, num_bins - 1)
    return f"{(bin_idx + 1) * bin_size}-{bin_idx * bin_size}"


def encode_files(
    wrapper,
    files: Sequence[str],
    sample_rate: int,
    batch_size: int,
    num_workers: int | None = None,
    skip_errors: bool = True,
    mesh=None,
) -> tuple[np.ndarray, list[str]]:
    """Batched CLAP embedding of audio files -> ((K, 512), kept_files).

    Replaces the reference's serial per-file loop
    (`augment_data_with_CLAP.py:124-137`). With more than one host core
    (`num_workers` defaults to min(16, cpu_count)), WAV decode+resample runs
    on a thread pool pipelined ahead of the device encode so the next batches
    decode while the current one runs on the TPU. On a single-core host the
    pool buys nothing and costs scheduler overhead (measured ~2.5x slower at
    workers=1, tools/curation_bench.json round 2), so `num_workers <= 1`
    degrades to the plain serial loop — which is also what the default
    resolves to there.

    Robustness/perf properties a 1M-sample curation run needs:
    - unreadable files are logged and skipped (K <= N, alignment carried by
      the returned `kept_files`) instead of aborting hours of encoding;
      `skip_errors=False` restores raise-on-first-error;
    - every device batch is padded with silence rows to exactly
      `batch_size`, so the Swin tower compiles ONCE — a ragged final (or
      post-skip) batch would otherwise trigger a multi-minute recompile.

    With `mesh`, each device batch is sharded over the mesh's data axis
    (ClapWrapper.get_audio_features mesh path); `batch_size` is rounded up to
    a multiple of the data-axis size so every device gets equal rows. For
    multi-HOST encoding use `encode_files_striped` (each host decodes and
    encodes its own file stripe).
    """
    import os
    from collections import deque
    from concurrent.futures import ThreadPoolExecutor

    if num_workers is None:
        num_workers = min(16, os.cpu_count() or 1)
    if mesh is not None:
        n_data = mesh.shape["data"]
        batch_size = -(-batch_size // n_data) * n_data

    def load(f):
        try:
            return normalize(load_and_resample(f, sample_rate))
        except Exception as e:  # noqa: BLE001 - corrupt wavs are expected at scale
            if not skip_errors:
                raise
            logger.warning("skipping unreadable %s: %s", f, e)
            return None

    out: list[np.ndarray] = []
    kept: list[str] = []
    n = len(files)

    def encode(waves: list[np.ndarray], names: list[str]) -> None:
        if not waves:
            return
        pad_rows = batch_size - len(waves)
        padded = list(waves) + [np.zeros(1024, np.float32)] * pad_rows
        if mesh is not None:
            emb = wrapper.get_audio_features(padded, mesh=mesh)
        else:
            emb = wrapper.get_audio_features(padded)
        out.append(np.asarray(emb)[: len(waves)])
        kept.extend(names)
        if (len(kept) // batch_size) % 50 == 0:
            logger.info("encoded %d/%d", len(kept), n)

    if num_workers <= 1:
        waves, names = [], []
        for f in files:
            w = load(f)
            if w is None:
                continue
            waves.append(w)
            names.append(f)
            if len(waves) == batch_size:
                encode(waves, names)
                waves, names = [], []
        encode(waves, names)
    else:
        prefetch = batch_size * 3  # decode up to 3 batches ahead of the device
        with ThreadPoolExecutor(num_workers) as pool:
            futs: deque = deque()
            idx = 0
            waves, names = [], []
            while idx < n or futs:
                while idx < n and len(futs) < prefetch:
                    futs.append((pool.submit(load, files[idx]), files[idx]))
                    idx += 1
                while futs and len(waves) < batch_size:
                    fut, name = futs.popleft()
                    w = fut.result()
                    if w is None:
                        continue
                    waves.append(w)
                    names.append(name)
                if len(waves) == batch_size or (not futs and idx >= n):
                    encode(waves, names)
                    waves, names = [], []
    if not out:
        return np.zeros((0, 512), np.float32), []
    return np.concatenate(out, axis=0), kept


def _allgather_ok(err: str | None, stage: str) -> None:
    """Failure-propagating barrier: every process contributes an ok/failed
    flag; if ANY host failed, ALL hosts raise. Without this, a host that
    raises before a DCN collective simply dies while every other host blocks
    in `process_allgather` forever (the collectives have no timeout) — a
    corrupt wav in one stripe, or an rmtree error on the single writer, must
    fail the whole cluster, not hang it. The gather doubles as the barrier."""
    from jax.experimental import multihost_utils

    flags = np.asarray(
        multihost_utils.process_allgather(
            np.array([0 if err is None else 1], np.int32)
        )
    ).reshape(-1)
    if flags.sum():
        bad = np.nonzero(flags)[0].tolist()
        raise RuntimeError(
            f"curation stage '{stage}' failed on process(es) {bad}"
            + (f": {err}" if err else " (see that host's log for the error)")
        )


def encode_files_striped(
    wrapper,
    files: Sequence[str],
    sample_rate: int,
    batch_size: int,
    num_workers: int | None = None,
    skip_errors: bool = True,
    mesh=None,
) -> tuple[np.ndarray, list[str]]:
    """Multi-host `encode_files`: stripe files across processes, encode each
    stripe on that host's devices, all-gather embeddings to every host.

    Each process p encodes `files[p::P]` with its OWN host decode pool and
    local devices (a process-local data mesh over its addressable slice of
    `mesh` when given, else its default device) — host wav decode and device
    encode both scale with the host count, the ICI/DCN story the 1M-library
    north star names. The gather pads each stripe's (rows, 512) result to the
    max stripe size, all-gathers across processes, and reassembles rows by
    their global file index, so every process returns the identical
    (embeddings, kept_files) — byte-equal to a single-process `encode_files`
    call over the same list (same per-file arithmetic: batches are padded to
    the same static size either way).

    Single-process calls degrade to plain `encode_files` (with `mesh` passed
    through), so the CLI can call this unconditionally.

    `files` must enumerate in the SAME order on every process (sort globs!):
    the stripes partition by position, and the gathered rows map back through
    this process's own copy of the list.
    """
    import jax

    P_count = jax.process_count()
    if P_count == 1:
        return encode_files(
            wrapper, files, sample_rate, batch_size,
            num_workers=num_workers, skip_errors=skip_errors, mesh=mesh,
        )
    from adt_str_tpu.parallel import mesh as mesh_lib

    pidx = jax.process_index()
    # process-local data mesh: this host's addressable slice, so the stripe
    # encode is a purely local computation (no cross-host collectives in the
    # hot loop — only the final gather crosses DCN)
    local_devices = (
        [d for d in mesh.devices.reshape(-1) if d.process_index == pidx]
        if mesh is not None
        else list(jax.local_devices())
    )
    local_mesh = (
        mesh_lib.make_mesh(n_data=len(local_devices), n_model=1, devices=local_devices)
        if len(local_devices) > 1
        else None
    )

    stripe = list(files[pidx::P_count])
    stripe_idx = np.arange(pidx, len(files), P_count, dtype=np.int64)
    err: str | None = None
    try:
        emb, kept = encode_files(
            wrapper, stripe, sample_rate, batch_size,
            num_workers=num_workers, skip_errors=skip_errors, mesh=local_mesh,
        )
        kept_set = {f: i for i, f in enumerate(stripe)}
        kept_global_idx = np.asarray(
            [stripe_idx[kept_set[f]] for f in kept], dtype=np.int64
        )
    except Exception as e:  # must still reach the gather: see _allgather_ok
        logger.exception("stripe encode failed on process %d", pidx)
        err = f"{type(e).__name__}: {e}"
        emb = np.zeros((0, 512), np.float32)
        kept_global_idx = np.zeros((0,), np.int64)
    _allgather_ok(err, "stripe encode")

    # pad every process to the same row count (stripe sizes differ by <=1
    # plus skips), then all-gather: process_allgather builds its own mesh
    # over all devices, so this works for ANY caller mesh shape (including
    # data axes not divisible by the process count)
    from jax.experimental import multihost_utils

    rows_max = -(-len(files) // P_count)
    emb_pad = np.zeros((rows_max, 512), np.float32)
    emb_pad[: len(emb)] = emb
    idx_pad = np.full((rows_max,), -1, np.int64)
    idx_pad[: len(kept_global_idx)] = kept_global_idx

    emb_all = np.asarray(multihost_utils.process_allgather(emb_pad))
    idx_all = np.asarray(multihost_utils.process_allgather(idx_pad))
    emb_all = emb_all.reshape(-1, emb_all.shape[-1])
    idx_all = idx_all.reshape(-1)
    keep = idx_all >= 0
    order = np.argsort(idx_all[keep], kind="stable")
    files_arr = list(files)
    kept_files = [files_arr[int(i)] for i in idx_all[keep][order]]
    return emb_all[keep][order], kept_files


def reference_class_means(
    wrapper, reference_root: str, sample_rate: int, batch_size: int, mesh=None
) -> tuple[np.ndarray, list[int]]:
    """-> (C, 512) per-class mean embeddings + class labels (non-empty only)."""
    all_files = sort_paths_by_parent_folder(
        glob(f"{reference_root}/**/*.[Ww][Aa][Vv]", recursive=True)
    )
    # keep only wavs whose parent dir is a known reference class BEFORE the
    # expensive embedding pass — stray files (docs/, 'extra/', unknown
    # numeric dirs) are warned about, not crashed on
    files = []
    for f in all_files:
        try:
            cls = int(Path(f).parent.name)
        except ValueError:
            cls = None
        if cls in REFERENCE_CLASSES:
            files.append(f)
        else:
            logger.warning("ignoring non-reference-class wav %s", f)
    if not files:
        raise RuntimeError("No reference embeddings found. Please check reference_root.")
    embeds, files = encode_files_striped(
        wrapper, files, sample_rate, batch_size, mesh=mesh
    )
    by_class: dict[int, list[np.ndarray]] = {k: [] for k in REFERENCE_CLASSES}
    for f, e in zip(files, embeds):
        by_class[int(Path(f).parent.name)].append(e)
    labels = [k for k in REFERENCE_CLASSES if by_class[k]]
    means = np.stack([np.mean(by_class[k], axis=0) for k in labels])
    return means.astype(np.float32), labels


@jax.jit
def _score_classes(u, m):
    # module-level jit: a per-call @jax.jit closure would re-trace and
    # re-compile the (U, 512) x (512, C) program on EVERY call (and made the
    # round-2 curation bench time compilation instead of compute)
    u_n = u / jnp.linalg.norm(u, axis=1, keepdims=True)
    # true fp32 dot: on TPU the default single-bf16-pass lowering adds ~2e-3
    # sim error, enough to flip argmax at near-ties. This removes the
    # final-matmul source of backend nondeterminism (the CLAP towers' own
    # fp32 einsums upstream still run at default precision, so embeddings —
    # and therefore genuinely tied scores — can differ across backends).
    # Cost at 1M x 48: still ~0.03 s.
    sims = jnp.matmul(u_n, m.T, precision="highest")  # (U, C)
    return jnp.argmax(sims, axis=1), jnp.max(sims, axis=1)


def assign_classes(
    sample_embeds: np.ndarray,
    class_means: np.ndarray,
    mesh=None,
) -> tuple[np.ndarray, np.ndarray]:
    """-> (best_class_idx (U,), best_score (U,)) via cosine similarity.

    With a mesh, U rows are sharded over the `data` axis; each device scores
    its shard locally (no cross-device traffic beyond the tiny replicated
    class-mean matrix) — the TPU equivalent of the reference's per-class
    python loop (augment_data_with_CLAP.py:139-151).

    A multi-host mesh is narrowed to this host's addressable slice: the
    inputs are replicated host numpy arrays (encode_files_striped gathers
    them everywhere), so scoring them host-locally yields the identical
    replicated result with zero DCN traffic — and `np.asarray` on an output
    sharded across non-addressable devices would raise.
    """
    means_n = class_means / np.linalg.norm(class_means, axis=1, keepdims=True)
    score = _score_classes

    if mesh is not None and any(
        d.process_index != jax.process_index() for d in mesh.devices.flat
    ):
        from adt_str_tpu.parallel import mesh as mesh_lib

        local = [
            d for d in mesh.devices.flat
            if d.process_index == jax.process_index()
        ]
        mesh = (
            mesh_lib.make_mesh(n_data=len(local), n_model=1, devices=local)
            if len(local) > 1
            else None
        )

    u = jnp.asarray(sample_embeds)
    m = jnp.asarray(means_n)
    if mesh is not None:
        pad = (-len(sample_embeds)) % mesh.shape["data"]
        u = jnp.pad(u, ((0, pad), (0, 0)))
        u = jax.device_put(u, NamedSharding(mesh, P("data", None)))
        m = jax.device_put(m, NamedSharding(mesh, P()))
        idx, val = score(u, m)
        idx, val = idx[: len(sample_embeds)], val[: len(sample_embeds)]
    else:
        idx, val = score(u, m)
    return np.asarray(idx), np.asarray(val)


def curate_library(
    wrapper,
    sample_pack_root: str,
    reference_root: str,
    sample_rate: int,
    batch_size: int = 32,
    num_bins: int = 10,
    mesh=None,
) -> Path:
    """Full curation: encode G + U, assign, bin, copy. Returns output root."""
    validate_num_bins(num_bins)

    # sorted: glob order is filesystem-dependent, and the multi-host stripe
    # partition + gathered-index mapping require the IDENTICAL file order on
    # every process
    wav_files = sorted(glob(f"{sample_pack_root}/**/*.[Ww][Aa][Vv]", recursive=True))
    logger.info("library: %d files", len(wav_files))
    class_means, labels = reference_class_means(
        wrapper, reference_root, sample_rate, batch_size, mesh=mesh
    )
    sample_embeds, wav_files = encode_files_striped(
        wrapper, wav_files, sample_rate, batch_size, mesh=mesh
    )
    best_idx, best_score = assign_classes(sample_embeds, class_means, mesh)

    augmented_root = _augmented_root_for(reference_root)
    multi = jax.process_count() > 1
    if multi and jax.process_index() != 0:
        # multi-host: every process holds the full gathered assignment (so
        # this return value is usable anywhere), but the filesystem copy is
        # single-writer — shared-FS rmtree/copy races otherwise. Block until
        # the writer finishes (and raise here if the writer failed), so
        # callers can read augmented_root immediately.
        _allgather_ok(None, "bin copy")
        return augmented_root
    copy_err: str | None = None
    try:
        if augmented_root.exists():
            shutil.rmtree(augmented_root)
        augmented_root.mkdir(parents=True, exist_ok=True)

        # bin+copy: I/O-bound, so a thread pool scales it with the
        # filesystem's parallelism (the 1M-library projection is
        # copy-dominated otherwise — tools/curation_bench.json). Destination
        # dirs are created up front; the per-file task is a single copy2.
        import os
        from concurrent.futures import ThreadPoolExecutor

        jobs: list[tuple[str, Path]] = []
        dest_dirs = set()
        for path, ci, score_value in zip(wav_files, best_idx, best_score):
            dest_dir = (
                augmented_root
                / str(labels[int(ci)])
                / score_to_bin_label(float(score_value), num_bins)
            )
            dest_dirs.add(dest_dir)
            jobs.append((path, dest_dir / Path(path).name))
        for d in dest_dirs:
            d.mkdir(parents=True, exist_ok=True)

        def _copy(job: tuple[str, Path]) -> int:
            src, dst = job
            try:
                shutil.copy2(src, dst)
                return 1
            except Exception as e:  # pragma: no cover
                logger.warning("Failed to copy %s: %s", src, e)
                return 0

        n_workers = min(16, os.cpu_count() or 1)
        if n_workers > 1:
            with ThreadPoolExecutor(n_workers) as pool:
                copied = sum(pool.map(_copy, jobs, chunksize=64))
        else:
            copied = sum(map(_copy, jobs))
        logger.info("Copied: %d", copied)
    except Exception as e:
        # the writer must still reach the barrier: raising here would leave
        # every non-writer blocked in the collective forever (_allgather_ok)
        if not multi:
            raise
        logger.exception("bin copy failed on the writer process")
        copy_err = f"{type(e).__name__}: {e}"
    if multi:
        _allgather_ok(copy_err, "bin copy")
    return augmented_root


def copy_originals_to_augmented(
    reference_root: str, augmented_root: str | Path | None = None
) -> Path:
    """Copy the hand-curated originals into `<class>/gold/` bins
    (`copy_originals_to_augmented.py:33-83`)."""
    augmented_root = (
        Path(augmented_root) if augmented_root else _augmented_root_for(reference_root)
    )
    files = glob(f"{reference_root}/**/*.[Ww][Aa][Vv]", recursive=True)
    for f in files:
        label = Path(f).parent.name
        dest = augmented_root / label / "gold"
        dest.mkdir(parents=True, exist_ok=True)
        shutil.copy2(f, dest / Path(f).name)
    return augmented_root


def convert_augmented_to_hdf5(
    input_root: str, output_prefix: str, sample_rate: int, overwrite: bool = False
) -> Path:
    """`<label>/<bin>/<name>.wav` tree -> `<prefix>@<sr>.hdf5` with gzip
    datasets and the flat `/index/*` tables
    (`convert_augmented_to_hdf5.py:29-147`)."""
    import h5py

    input_root = Path(input_root)
    output_path = Path(f"{output_prefix}@{sample_rate}.hdf5")
    if output_path.exists():
        if overwrite:
            output_path.unlink()
        else:
            raise FileExistsError(f"Output file exists: {output_path}")

    wav_files = sorted(glob(str(input_root / "**" / "*.[Ww][Aa][Vv]"), recursive=True))
    index = {"paths": [], "labels": [], "bins": [], "sample_rates": [], "lengths": []}
    with h5py.File(output_path, "w") as h5:
        for wav_path in wav_files:
            rel = Path(wav_path).relative_to(input_root)
            if len(rel.parts) < 3:
                continue
            label, bin_label = rel.parts[0], rel.parts[1]
            try:
                wave = normalize(load_and_resample(wav_path, sample_rate)).astype(
                    np.float32
                )
            except Exception as e:
                logger.warning("Failed to load %s: %s", wav_path, e)
                continue
            grp = h5.require_group(label).require_group(bin_label)
            name = Path(wav_path).stem
            suffix = 1
            ds_name = name
            while ds_name in grp:
                suffix += 1
                ds_name = f"{name}_{suffix}"
            ds = grp.create_dataset(ds_name, data=wave, dtype="float32", compression="gzip")
            ds.attrs["sample_rate"] = sample_rate
            ds.attrs["path"] = str(rel)
            ds.attrs["label"] = label
            ds.attrs["bin"] = bin_label
            ds.attrs["num_samples"] = int(wave.shape[0])
            index["paths"].append(str(rel))
            index["labels"].append(label)
            index["bins"].append(bin_label)
            index["sample_rates"].append(sample_rate)
            index["lengths"].append(int(wave.shape[0]))

        ig = h5.create_group("index")
        ig.create_dataset("paths", data=index["paths"], compression="gzip")
        ig.create_dataset("labels", data=index["labels"], compression="gzip")
        ig.create_dataset("bins", data=index["bins"], compression="gzip")
        ig.create_dataset(
            "sample_rates", data=np.asarray(index["sample_rates"], np.int32),
            compression="gzip",
        )
        ig.create_dataset(
            "lengths", data=np.asarray(index["lengths"], np.int64), compression="gzip"
        )
    logger.info("Wrote %d items to %s", len(index["paths"]), output_path)
    return output_path
