"""Mesh-sharded CLAP encoding (round-3 verdict missing #3 / next-steps #2).

The curation ASSIGNMENT matmul was already mesh-sharded; the dominant stage —
CLAP audio encoding — ran on one device. These tests pin the new scaling path:

- `ClapWrapper.get_audio_features(mesh=...)` shards the batch over the mesh's
  data axis with replicated tower params; embeddings must equal the
  single-device path on the virtual 8-device CPU mesh (both the device-
  resident mel branch and the host-extractor branch);
- `encode_files(mesh=...)` rounds the device batch up to a data-axis multiple
  (still ONE compiled batch shape) and produces identical embeddings;
- `encode_files_striped` stripes files across processes and all-gathers
  embeddings back to the canonical single-process order — proven in a genuine
  two-process `jax.distributed` cluster, including skip-alignment for a
  corrupt wav inside one stripe.

Reference to beat: the serial one-device encode loop at
`augment_data_with_CLAP.py:124-137`.
"""

import json
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from adt_str_tpu.clap.curation import encode_files, encode_files_striped
from adt_str_tpu.parallel.mesh import make_mesh
from adt_str_tpu.utils.audio_io import write_wav

SR = 8000


@pytest.fixture(scope="module")
def torch_clap():
    torch = pytest.importorskip("torch")
    from transformers.models.clap.configuration_clap import (
        ClapAudioConfig,
        ClapConfig,
        ClapTextConfig,
    )
    from transformers.models.clap.modeling_clap import ClapModel

    # REAL input geometry (64 mel bins, spec 256) so the wrapper's actual
    # feature pipeline feeds the tower; tiny depths/hidden keep it CPU-fast
    audio_cfg = ClapAudioConfig(
        window_size=4, num_mel_bins=64, spec_size=256, patch_size=4,
        patch_stride=[4, 4], hidden_size=16, projection_dim=32,
        depths=[2, 2], num_attention_heads=[2, 4], enable_fusion=True,
        patch_embeds_hidden_size=8, aff_block_r=4,
    )
    text_cfg = ClapTextConfig(
        vocab_size=120, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=64,
        max_position_embeddings=48, projection_dim=32,
    )
    cfg = ClapConfig.from_text_audio_configs(text_cfg, audio_cfg, projection_dim=32)
    torch.manual_seed(0)
    return ClapModel(cfg).eval(), audio_cfg, text_cfg


def _wrapper(torch_clap):
    from adt_str_tpu.clap.audio_model import ClapAudioArch
    from adt_str_tpu.clap.model import ClapWrapper
    from adt_str_tpu.clap.text_model import ClapTextArch

    model, audio_cfg, text_cfg = torch_clap
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    return ClapWrapper(
        "unused",
        state_dict=sd,
        audio_arch=ClapAudioArch(
            window_size=audio_cfg.window_size,
            num_mel_bins=audio_cfg.num_mel_bins,
            spec_size=audio_cfg.spec_size,
            patch_size=audio_cfg.patch_size,
            patch_stride=audio_cfg.patch_stride[0],
            hidden_size=audio_cfg.hidden_size,
            projection_dim=audio_cfg.projection_dim,
            depths=tuple(audio_cfg.depths),
            num_heads=tuple(audio_cfg.num_attention_heads),
            patch_embeds_hidden_size=audio_cfg.patch_embeds_hidden_size,
            enable_fusion=audio_cfg.enable_fusion,
            aff_block_r=audio_cfg.aff_block_r,
        ),
        text_arch=ClapTextArch(
            vocab_size=text_cfg.vocab_size,
            hidden_size=text_cfg.hidden_size,
            num_layers=text_cfg.num_hidden_layers,
            num_heads=text_cfg.num_attention_heads,
            intermediate_size=text_cfg.intermediate_size,
            max_positions=text_cfg.max_position_embeddings,
            projection_dim=text_cfg.projection_dim,
        ),
    )


def _clips(n, rng):
    return [(rng.normal(size=int(rng.integers(4000, 30000))) * 0.3).astype(np.float32)
            for _ in range(n)]


@pytest.mark.parametrize("device_resident", [False, True])
def test_mesh_encode_matches_single_device(torch_clap, device_resident):
    """(B, 512) embeddings from the data-sharded path == single-device path,
    for both wrapper branches (host extractor / device-resident mel)."""
    wrapper = _wrapper(torch_clap)
    wrapper.feature_extractor.use_device = device_resident
    rng = np.random.default_rng(3)
    clips = _clips(10, rng)  # 10 rows: mesh path must pad to 16 and slice back

    single = wrapper.get_audio_features(clips)
    mesh = make_mesh(n_data=8, n_model=1)
    sharded = wrapper.get_audio_features(clips, mesh=mesh)
    assert sharded.shape == single.shape == (10, 32)
    np.testing.assert_allclose(sharded, single, atol=2e-5, rtol=1e-5)
    # second call reuses the cached replicated params (no re-placement)
    cached = wrapper._mesh_audio_params
    wrapper.get_audio_features(clips, mesh=mesh)
    assert wrapper._mesh_audio_params is cached


def test_encode_files_mesh_rounds_batch_and_matches(torch_clap, tmp_path):
    wrapper = _wrapper(torch_clap)
    rng = np.random.default_rng(5)
    files = []
    for i in range(5):
        p = tmp_path / f"s{i}.wav"
        write_wav(str(p), (rng.normal(size=6000) * 0.3).astype(np.float32), SR)
        files.append(str(p))

    calls = []
    orig = wrapper.get_audio_features

    def spy(audios, mesh=None):
        calls.append((len(audios), mesh is not None))
        return orig(audios, mesh=mesh)

    wrapper.get_audio_features = spy
    mesh = make_mesh(n_data=8, n_model=1)
    emb_mesh, kept_mesh = encode_files(wrapper, files, SR, batch_size=3, mesh=mesh)
    emb_single, kept_single = encode_files(wrapper, files, SR, batch_size=3)

    assert kept_mesh == kept_single == files
    # batch_size=3 rounds to 8 on the 8-device data axis; single path keeps 3
    assert {c for c in calls if c[1]} == {(8, True)}
    assert {c for c in calls if not c[1]} == {(3, False)}
    np.testing.assert_allclose(emb_mesh, emb_single, atol=2e-5, rtol=1e-5)


def test_encode_files_striped_single_process_delegates(torch_clap, tmp_path):
    """process_count==1 degrades to plain encode_files (mesh passed through)."""
    wrapper = _wrapper(torch_clap)
    rng = np.random.default_rng(7)
    files = []
    for i in range(3):
        p = tmp_path / f"d{i}.wav"
        write_wav(str(p), (rng.normal(size=5000) * 0.3).astype(np.float32), SR)
        files.append(str(p))
    a, ka = encode_files_striped(wrapper, files, SR, batch_size=2)
    b, kb = encode_files(wrapper, files, SR, batch_size=2)
    assert ka == kb == files
    np.testing.assert_allclose(a, b, atol=1e-6)


STRIPED_WORKER = r"""
import json, os, sys
import numpy as np

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, "/root/repo")
from adt_str_tpu.parallel import mesh as mesh_lib
from adt_str_tpu.clap.curation import encode_files_striped

mesh_lib.maybe_initialize_distributed()
assert jax.process_count() == 2
pid = jax.process_index()
mesh = mesh_lib.make_mesh(n_data=4, n_model=1)

td = sys.argv[1]
files = json.loads(open(os.path.join(td, "files.json")).read())


class StubWrapper:
    # deterministic per-content embedding; batch-size independent
    def get_audio_features(self, audios, mesh=None):
        out = []
        for a in audios:
            a = np.asarray(a).reshape(-1)
            v = np.zeros(512, np.float32)
            v[0] = float(a.sum())
            v[1] = float((a * a).sum())
            v[2] = float(len(a))
            out.append(v)
        return np.stack(out)


emb, kept = encode_files_striped(
    StubWrapper(), files, 8000, batch_size=2, mesh=mesh
)
with open(os.path.join(td, f"striped_{pid}.json"), "w") as f:
    json.dump({"emb": emb.tolist(), "kept": kept}, f)
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_striped_encode(tmp_path):
    """Both processes of a genuine jax.distributed cluster must assemble the
    IDENTICAL (embeddings, kept_files) in canonical single-process order,
    with a corrupt wav inside process 1's stripe skipped and alignment kept."""
    rng = np.random.default_rng(0)
    files = []
    for i in range(7):
        p = tmp_path / f"w{i}.wav"
        write_wav(str(p), (rng.normal(size=3000 + 100 * i) * 0.3).astype(np.float32), SR)
        files.append(str(p))
    corrupt = tmp_path / "w7.wav"
    corrupt.write_text("not a wav")  # lands in files[7], stripe of process 1
    files.append(str(corrupt))
    (tmp_path / "files.json").write_text(json.dumps(files))

    port = _free_port()
    script = tmp_path / "worker.py"
    script.write_text(STRIPED_WORKER)
    procs = []
    import os

    for pid in range(2):
        env = dict(os.environ)
        env.update(
            COORDINATOR_ADDRESS=f"localhost:{port}",
            NUM_PROCESSES="2",
            PROCESS_ID=str(pid),
        )
        procs.append(
            subprocess.Popen(
                [sys.executable, str(script), str(tmp_path)],
                env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                text=True,
            )
        )
    for p in procs:
        try:
            _, err = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, err[-4000:]

    # ground truth: the same stub over the full list, single process
    def stub_embed(path):
        from adt_str_tpu.utils.audio_io import load_and_resample, normalize

        a = normalize(load_and_resample(path, SR))
        v = np.zeros(512, np.float32)
        v[0], v[1], v[2] = float(a.sum()), float((a * a).sum()), float(len(a))
        return v

    expect_kept = files[:7]  # corrupt skipped
    expect = np.stack([stub_embed(f) for f in expect_kept])

    for pid in range(2):
        out = json.loads((tmp_path / f"striped_{pid}.json").read_text())
        assert out["kept"] == expect_kept, pid
        np.testing.assert_allclose(np.asarray(out["emb"]), expect, atol=1e-5)


STRIPED_FAIL_WORKER = r"""
import json, os, sys
import numpy as np

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, "/root/repo")
from adt_str_tpu.parallel import mesh as mesh_lib
from adt_str_tpu.clap.curation import encode_files_striped

mesh_lib.maybe_initialize_distributed()
assert jax.process_count() == 2
mesh = mesh_lib.make_mesh(n_data=4, n_model=1)

td = sys.argv[1]
files = json.loads(open(os.path.join(td, "files.json")).read())


class StubWrapper:
    def get_audio_features(self, audios, mesh=None):
        return np.zeros((len(audios), 512), np.float32)


# skip_errors=False: the corrupt file in process 1's stripe must fail BOTH
# processes (RuntimeError from the failure-propagating barrier), not hang
# process 0 in the all-gather
encode_files_striped(StubWrapper(), files, 8000, batch_size=2, mesh=mesh,
                     skip_errors=False)
"""


@pytest.mark.slow
def test_two_process_striped_encode_failure_propagates(tmp_path):
    """With skip_errors=False and a corrupt wav in ONE stripe, the whole
    cluster must fail fast: the owning host's exception is caught, folded
    into the gather barrier, and re-raised on EVERY process. Before the fix
    the failing host died pre-collective and the other blocked in
    process_allgather forever (DCN collectives have no timeout)."""
    rng = np.random.default_rng(0)
    files = []
    for i in range(3):
        p = tmp_path / f"w{i}.wav"
        write_wav(str(p), (rng.normal(size=3000) * 0.3).astype(np.float32), SR)
        files.append(str(p))
    corrupt = tmp_path / "w3.wav"
    corrupt.write_text("not a wav")  # files[3]: stripe of process 1
    files.append(str(corrupt))
    (tmp_path / "files.json").write_text(json.dumps(files))

    port = _free_port()
    script = tmp_path / "worker.py"
    script.write_text(STRIPED_FAIL_WORKER)
    procs = []
    import os

    for pid in range(2):
        env = dict(os.environ)
        env.update(
            COORDINATOR_ADDRESS=f"localhost:{port}",
            NUM_PROCESSES="2",
            PROCESS_ID=str(pid),
        )
        procs.append(
            subprocess.Popen(
                [sys.executable, str(script), str(tmp_path)],
                env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                text=True,
            )
        )
    errs = []
    for p in procs:
        try:
            # the deadlock this guards against would hit this timeout
            _, err = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        errs.append(err)
        assert p.returncode != 0
    # both processes raise the coordinated error, naming the failing process
    for err in errs:
        assert "stripe encode" in err and "process(es) [1]" in err, err[-2000:]


CURATE_WORKER = r"""
import json, os, sys
import numpy as np
from pathlib import Path

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, "/root/repo")
from adt_str_tpu.parallel import mesh as mesh_lib
from adt_str_tpu.clap.curation import curate_library

mesh_lib.maybe_initialize_distributed()
assert jax.process_count() == 2
pid = jax.process_index()
mesh = mesh_lib.make_mesh(n_data=4, n_model=1)
td = sys.argv[1]


class StubWrapper:
    def get_audio_features(self, audios, mesh=None):
        out = []
        for a in audios:
            a = np.asarray(a).reshape(-1)
            v = np.zeros(512, np.float32)
            v[0] = float(a.sum())
            v[1] = float((a * a).sum())
            v[2] = float(len(a))
            out.append(v)
        return np.stack(out)


root = curate_library(
    StubWrapper(), os.path.join(td, "library"), os.path.join(td, "reference"),
    sample_rate=8000, batch_size=2, num_bins=10, mesh=mesh,
)
# snapshot IMMEDIATELY on return: the barrier contract is that the copied
# tree is complete for EVERY process at this point (a non-writer returning
# early would observe a partial tree here)
tree = sorted(str(p.relative_to(root)) for p in Path(root).rglob("*.wav"))
with open(os.path.join(td, f"curate_{pid}.json"), "w") as f:
    json.dump({"root": str(root), "tree": tree}, f)
"""


@pytest.mark.slow
def test_two_process_curate_library(tmp_path):
    """Full multi-host curation: a genuine two-process cluster must produce
    the identical augmented tree a single-process run produces, with the
    copy written once (single-writer) and COMPLETE before any process
    returns (the post-copy barrier). Exercises the multi-host branches of
    reference_class_means, encode_files_striped, assign_classes (host-local
    mesh narrowing), and curate_library's writer coordination."""
    import os
    import shutil

    rng = np.random.default_rng(11)

    def build(root: Path):
        for cls in (35, 38):
            d = root / "reference" / str(cls)
            d.mkdir(parents=True)
            for j in range(2):
                w = (rng.normal(size=4000 + 500 * j) * 0.3).astype(np.float32)
                write_wav(str(d / f"ref{cls}_{j}.wav"), w, SR)
        lib = root / "library"
        lib.mkdir()
        for i in range(5):
            w = (rng.normal(size=3000 + 200 * i) * 0.3).astype(np.float32)
            write_wav(str(lib / f"lib{i}.wav"), w, SR)

    build(tmp_path)
    # bit-identical second copy for the single-process ground truth (its
    # derived augmented root is a sibling, so the trees never collide)
    single_root = tmp_path / "single"
    single_root.mkdir()
    shutil.copytree(tmp_path / "reference", single_root / "reference")
    shutil.copytree(tmp_path / "library", single_root / "library")

    port = _free_port()
    script = tmp_path / "curate_worker.py"
    script.write_text(CURATE_WORKER)
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.update(
            COORDINATOR_ADDRESS=f"localhost:{port}",
            NUM_PROCESSES="2",
            PROCESS_ID=str(pid),
        )
        procs.append(
            subprocess.Popen(
                [sys.executable, str(script), str(tmp_path)],
                env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                text=True,
            )
        )
    for p in procs:
        try:
            _, err = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, err[-4000:]

    class _Stub:
        def get_audio_features(self, audios, mesh=None):
            out = []
            for a in audios:
                a = np.asarray(a).reshape(-1)
                v = np.zeros(512, np.float32)
                v[0] = float(a.sum())
                v[1] = float((a * a).sum())
                v[2] = float(len(a))
                out.append(v)
            return np.stack(out)

    from adt_str_tpu.clap.curation import curate_library

    expect_root = curate_library(
        _Stub(), str(single_root / "library"), str(single_root / "reference"),
        sample_rate=SR, batch_size=2, num_bins=10,
    )
    expect_tree = sorted(
        str(p.relative_to(expect_root)) for p in Path(expect_root).rglob("*.wav")
    )
    assert expect_tree, "single-process curation produced an empty tree"

    for pid in range(2):
        out = json.loads((tmp_path / f"curate_{pid}.json").read_text())
        assert out["tree"] == expect_tree, (pid, out["tree"], expect_tree)
