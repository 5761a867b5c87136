"""Training-step tests: loss decreases; DP/TP sharded step runs on the
virtual 8-device CPU mesh and matches the single-device result."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from adt_str_tpu.config import ModelConfig, TrainingConfig
from adt_str_tpu.models import adt
from adt_str_tpu.parallel import mesh as mesh_lib
from adt_str_tpu.parallel.train_step import init_train_state, make_train_step
from adt_str_tpu.training.optimizer import make_optimizer, warmup_cosine_schedule


def tiny_config(**kw):
    defaults = dict(
        sample_rate=4000,
        win_length=256,
        time_res=0.01,
        input_sec=0.64,
        enc_layers=1,
        dec_layers=1,
        nhead=2,
        d_query=16,
        dropout=0.0,
        tgt_vocab_size=64,
        n_mels=16,
        compute_dtype="float32",
        max_positions=64,
    )
    defaults.update(kw)
    return ModelConfig(**defaults)


def make_batch(cfg, B=8, T=12, seed=0):
    rng = np.random.default_rng(seed)
    wave = rng.normal(size=(B, cfg.chunk_samples)).astype(np.float32) * 0.1
    tokens = np.full((B, T), 1, dtype=np.int32)
    tokens[:, 0] = 2
    for i in range(B):
        n = rng.integers(2, T - 1)
        tokens[i, 1:n] = rng.integers(4, 40, n - 1)
        tokens[i, n] = 3
    lengths = (tokens != 1).sum(axis=1).astype(np.int32)
    return {
        "wavs": jnp.asarray(wave),
        "tokens": jnp.asarray(tokens),
        "token_lengths": jnp.asarray(adt.collate_token_lengths(jnp.asarray(lengths))),
    }


def test_loss_decreases():
    cfg = tiny_config()
    params = adt.init_params(jax.random.PRNGKey(0), cfg)
    tcfg = TrainingConfig(learning_rate=3e-3, warmup_ratio=0.0, max_grad_norm=1.0)
    tx, _ = make_optimizer(tcfg, total_steps=50, params=params)
    step = make_train_step(cfg, tx)
    state = init_train_state(params, tx)
    batch = make_batch(cfg)
    losses = []
    for i in range(30):
        state, metrics = step(state, batch, jax.random.PRNGKey(i))
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0] * 0.5, losses[:3] + losses[-3:]
    assert np.isfinite(losses).all()


@pytest.mark.slow
def test_sharded_step_matches_single_device():
    n_dev = len(jax.devices())
    assert n_dev == 8, "conftest must provide 8 virtual CPU devices"
    cfg = tiny_config()
    params = adt.init_params(jax.random.PRNGKey(0), cfg)
    tcfg = TrainingConfig(learning_rate=1e-3, warmup_ratio=0.0)
    tx, _ = make_optimizer(tcfg, total_steps=10, params=params)
    batch = make_batch(cfg, B=8)

    # 4x2 data x model mesh
    mesh = mesh_lib.make_mesh(n_data=4, n_model=2)
    sharded_params = mesh_lib.shard_params(mesh, adt.init_params(jax.random.PRNGKey(0), cfg))
    sharded_batch = mesh_lib.shard_batch(mesh, batch)

    # gradients agree across layouts to fp32 numerical noise (Adam's
    # sqrt-normalization amplifies that noise in the updated params, so the
    # grads — not post-update params — are the equivalence check)
    def grads_of(p, b):
        return jax.grad(
            lambda pp: adt.forward_loss(
                pp, b["wavs"], b["tokens"], b["token_lengths"], cfg,
                rng=jax.random.PRNGKey(7), train=True,
            )
        )(p)

    g1 = grads_of(params, batch)
    g2 = grads_of(sharded_params, sharded_batch)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-4)

    # full step runs under both layouts with identical loss (donates params)
    step = make_train_step(cfg, tx)
    state1, m1 = step(init_train_state(params, tx), batch, jax.random.PRNGKey(7))
    step2 = make_train_step(cfg, tx)
    state2, m2 = step2(
        init_train_state(sharded_params, tx), sharded_batch, jax.random.PRNGKey(7)
    )
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)
    np.testing.assert_allclose(
        float(m1["grad_norm"]), float(m2["grad_norm"]), rtol=1e-4
    )


@pytest.mark.slow
def test_shard_map_step_matches_single_device():
    """Round-5 data-manual shard_map path (`make_train_step(mesh=...)`):
    the DEFAULT reduction is the exact global token-weighted mean (shards
    psum nll sums + token counts), so with dropout off the sharded loss and
    grad_norm must match the single-device step to fp reduction noise at
    ANY token-length profile — uniform or ragged. Mesh-invariant training
    math: the torch-replay equivalence suite holds regardless of device
    count. `training.ddp_loss_weighting: true` opts into accelerate/DDP
    per-rank weighting (mean of per-shard masked means — the reference's
    own multi-GPU behavior), pinned at the bottom. This is the direct
    equivalence check for the shard_map program itself — the older sharded
    test exercises the plain-GSPMD (mesh=None, sharded-args) path."""
    cfg = tiny_config()  # dropout=0.0: the rng fold-in must then be inert
    params = adt.init_params(jax.random.PRNGKey(0), cfg)
    tcfg = TrainingConfig(learning_rate=1e-3, warmup_ratio=0.0)
    tx, _ = make_optimizer(tcfg, total_steps=10, params=params)
    batch = make_batch(cfg, B=8)
    # uniform lengths: every row gets the same token count (pad stays pad)
    tokens = np.array(batch["tokens"])  # writable copy
    T = tokens.shape[1]
    for i in range(tokens.shape[0]):
        row = tokens[i]
        n = int((row != 1).sum())
        row[row == 3] = 5  # old EOS position becomes a real token
        row[n:] = 5
        row[T - 1] = 3
        tokens[i] = row
    batch["tokens"] = jnp.asarray(tokens)
    lengths = np.full((tokens.shape[0],), T, np.int32)
    batch["token_lengths"] = jnp.asarray(
        adt.collate_token_lengths(jnp.asarray(lengths))
    )

    step1 = make_train_step(cfg, tx)
    state1, m1 = step1(init_train_state(params, tx), batch, jax.random.PRNGKey(7))

    mesh = mesh_lib.make_mesh(n_data=8, n_model=1)
    sharded_params = mesh_lib.shard_params(
        mesh, adt.init_params(jax.random.PRNGKey(0), cfg)
    )
    sharded_batch = mesh_lib.shard_batch(mesh, batch)
    step2 = make_train_step(cfg, tx, mesh=mesh)
    state2, m2 = step2(
        init_train_state(sharded_params, tx), sharded_batch, jax.random.PRNGKey(7)
    )
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)
    np.testing.assert_allclose(
        float(m1["grad_norm"]), float(m2["grad_norm"]), rtol=1e-4
    )
    # updated params agree leaf-for-leaf (same optimizer math on pmean'd
    # grads); Adam's sqrt amplifies fp noise, hence the loose atol
    for a, b in zip(
        jax.tree.leaves(state1.params), jax.tree.leaves(state2.params)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-4, rtol=1e-3
        )

    # and with a TP axis the shard_map (manual data, auto model) still
    # composes: loss matches the pure-DP run
    mesh42 = mesh_lib.make_mesh(n_data=4, n_model=2)
    p42 = mesh_lib.shard_params(mesh42, adt.init_params(jax.random.PRNGKey(0), cfg))
    b42 = mesh_lib.shard_batch(mesh42, batch)
    step3 = make_train_step(cfg, tx, mesh=mesh42)
    _, m3 = step3(init_train_state(p42, tx), b42, jax.random.PRNGKey(7))
    np.testing.assert_allclose(float(m1["loss"]), float(m3["loss"]), rtol=1e-5)

    # ragged lengths, DEFAULT weighting: the sharded loss equals the
    # single-program global token-weighted mean EXACTLY (to fp reduction
    # order) — the property the torch-replay equivalence rides on
    ragged = make_batch(cfg, B=8, seed=1)
    params_fresh = adt.init_params(jax.random.PRNGKey(0), cfg)  # step1 donated
    global_mean = float(adt.forward_loss(
        params_fresh, ragged["wavs"], ragged["tokens"],
        ragged["token_lengths"], cfg, rng=None, train=False,
    ))
    per_example = np.mean([
        float(adt.forward_loss(
            params_fresh,
            ragged["wavs"][i:i + 1],
            ragged["tokens"][i:i + 1],
            ragged["token_lengths"][i:i + 1],
            cfg, rng=None, train=False,
        ))
        for i in range(8)
    ])
    assert abs(global_mean - per_example) > 1e-3  # the two weightings differ
    mesh81 = mesh_lib.make_mesh(n_data=8, n_model=1)
    p81 = mesh_lib.shard_params(mesh81, adt.init_params(jax.random.PRNGKey(0), cfg))
    b81 = mesh_lib.shard_batch(mesh81, ragged)
    step4 = make_train_step(cfg, tx, mesh=mesh81)
    _, m4 = step4(init_train_state(p81, tx), b81, jax.random.PRNGKey(7))
    np.testing.assert_allclose(float(m4["loss"]), global_mean, rtol=1e-5)

    # ddp_loss_weighting=True: accelerate/DDP per-rank weighting — with one
    # example per shard, exactly the mean of per-example losses
    p81b = mesh_lib.shard_params(mesh81, adt.init_params(jax.random.PRNGKey(0), cfg))
    step5 = make_train_step(cfg, tx, mesh=mesh81, ddp_loss_weighting=True)
    _, m5 = step5(init_train_state(p81b, tx), b81, jax.random.PRNGKey(7))
    np.testing.assert_allclose(float(m5["loss"]), per_example, rtol=1e-5)


@pytest.mark.slow
def test_bf16_grad_allreduce():
    """`training.grad_allreduce_dtype: bf16` casts the DP gradient pmean to
    bf16 TRANSPORT only (params/optimizer stay fp32): the compiled program's
    all-reduce must actually operate on bf16 (half the collective bytes —
    the lever behind the improved v5e-8 projection, docs/BENCHMARKS.md), and
    the training trajectory must track the exact-fp32 default closely (the
    only error source is the ~0.4%-relative bf16 rounding of grad elements
    that already carry bf16 forward/backward noise)."""
    cfg = tiny_config()
    params = adt.init_params(jax.random.PRNGKey(0), cfg)
    tcfg = TrainingConfig(learning_rate=1e-3, warmup_ratio=0.0)
    tx, _ = make_optimizer(tcfg, total_steps=20, params=params)
    batch = make_batch(cfg, B=8)

    mesh = mesh_lib.make_mesh(n_data=8, n_model=1)
    sharded_batch = mesh_lib.shard_batch(mesh, batch)

    def run(comm_dtype, n_steps=8):
        p = mesh_lib.shard_params(mesh, adt.init_params(jax.random.PRNGKey(0), cfg))
        step = make_train_step(cfg, tx, mesh=mesh, comm_dtype=comm_dtype)
        state = init_train_state(p, tx)
        losses = []
        for i in range(n_steps):
            state, m = step(state, sharded_batch, jax.random.PRNGKey(i))
            losses.append(float(m["loss"]))
        return losses, state

    # The TRACED program's gradient all-reduces really are bf16 (the
    # compiled CPU HLO cannot evidence this: XLA:CPU's AllReducePromotion
    # rewrites bf16 all-reduces to f32 — the same pass that crashes outright
    # on partially-manual shard_map regions, see _shard_map_grads — while a
    # TPU backend keeps bf16 on the wire). Loss-scalar reductions stay f32
    # either way; only non-scalar (gradient) all-reduces are classified.
    import re

    def grad_allreduce_dtypes(comm_dtype):
        p = mesh_lib.shard_params(mesh, adt.init_params(jax.random.PRNGKey(0), cfg))
        step = make_train_step(cfg, tx, mesh=mesh, comm_dtype=comm_dtype)
        txt = (
            jax.jit(step)
            .lower(init_train_state(p, tx), sharded_batch, jax.random.PRNGKey(0))
            .as_text()
        )
        dts = set()
        for m in re.finditer(r'"stablehlo\.all_reduce"', txt):
            seg = txt[m.end(): m.end() + 40000]
            r = re.search(r"->\s*(\([^)]*\)|tensor<[^>]*>)", seg)
            assert r is not None
            for t in re.findall(r"tensor<([^>]*)>", r.group(1)):
                parts = t.split("x")
                if len(parts) > 1:  # non-scalar: a gradient leaf
                    dts.add(parts[-1])
        return dts

    assert grad_allreduce_dtypes("bf16") == {"bf16"}
    assert grad_allreduce_dtypes(None) == {"f32"}

    losses_f32, s_f32 = run(None)
    losses_bf16, s_bf16 = run("bf16")
    # trajectories track closely; identical would mean the cast was a no-op
    np.testing.assert_allclose(losses_bf16, losses_f32, rtol=5e-3)
    assert losses_bf16[-1] < losses_bf16[0], losses_bf16
    for a, b in zip(jax.tree.leaves(s_f32.params), jax.tree.leaves(s_bf16.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-3, rtol=0)

    # unknown dtype is rejected eagerly
    with pytest.raises(ValueError, match="grad_allreduce_dtype"):
        make_train_step(cfg, tx, mesh=mesh, comm_dtype="fp8")


@pytest.mark.slow
def test_fsdp_step_matches_single_device():
    """MeshConfig.fsdp shards every large param's free dim over the data axis
    (ZeRO-3): grads/losses must match the replicated layout, params and Adam
    moments must actually be data-sharded, and a multi-step run must track
    the single-device trajectory."""
    cfg = tiny_config(d_query=32)  # d_model=64: divisible by n_data=4
    params = adt.init_params(jax.random.PRNGKey(0), cfg)
    tcfg = TrainingConfig(learning_rate=1e-3, warmup_ratio=0.0)
    tx, _ = make_optimizer(tcfg, total_steps=10, params=params)
    batch = make_batch(cfg, B=8)

    mesh = mesh_lib.make_mesh(n_data=4, n_model=2)
    fsdp_params = mesh_lib.shard_params(
        mesh, adt.init_params(jax.random.PRNGKey(0), cfg), fsdp=True
    )
    sharded_batch = mesh_lib.shard_batch(mesh, batch)

    # the layout really is fully sharded: every >=1024-element leaf with a
    # dim divisible by 4 carries the data axis, and per-device bytes shrink
    n_data_sharded = sum(
        "data" in str(x.sharding.spec) for x in jax.tree.leaves(fsdp_params)
    )
    assert n_data_sharded >= 10, n_data_sharded
    total = sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(fsdp_params))
    dev0 = sum(
        x.addressable_shards[0].data.size * x.dtype.itemsize
        for x in jax.tree.leaves(fsdp_params)
    )
    assert total / dev0 > 3.0, (total, dev0)

    def grads_of(p, b):
        return jax.grad(
            lambda pp: adt.forward_loss(
                pp, b["wavs"], b["tokens"], b["token_lengths"], cfg,
                rng=jax.random.PRNGKey(7), train=True,
            )
        )(p)

    g1 = grads_of(params, batch)
    g2 = grads_of(fsdp_params, sharded_batch)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-4)

    # multi-step: the fsdp trajectory tracks single-device, moments stay sharded
    step1 = make_train_step(cfg, tx)
    step2 = make_train_step(cfg, tx)
    s1 = init_train_state(params, tx)
    s2 = init_train_state(fsdp_params, tx)
    for i in range(3):
        s1, m1 = step1(s1, batch, jax.random.PRNGKey(i))
        s2, m2 = step2(s2, sharded_batch, jax.random.PRNGKey(i))
        np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=2e-5)
    opt_leaves = [
        x for x in jax.tree.leaves(s2.opt_state) if hasattr(x, "sharding") and x.ndim >= 1
    ]
    n_opt_sharded = sum("data" in str(x.sharding.spec) for x in opt_leaves)
    assert n_opt_sharded >= 20, n_opt_sharded  # mu+nu per sharded param
    # Adam's sqrt-normalization amplifies collective-order fp noise in the
    # updated params (same caveat as the TP test above): the per-step loss
    # equality is the trajectory check, this is only a drift bound
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4, rtol=0.02)


def test_warmup_cosine_min_lr_schedule():
    sched = warmup_cosine_schedule(1e-3, total_steps=100, warmup_ratio=0.1, min_lr=1e-5)
    # warmup: step 0 -> 0, step 10 -> base
    assert float(sched(0)) == 0.0
    np.testing.assert_allclose(float(sched(10)), 1e-3, rtol=1e-6)
    # last step lands exactly on the floor (reference cosine_warmup_with_min_lr)
    np.testing.assert_allclose(float(sched(99)), 1e-5, rtol=1e-6)
    # monotone decreasing after warmup
    vals = [float(sched(s)) for s in range(10, 100)]
    assert all(a >= b for a, b in zip(vals, vals[1:]))


def test_schedule_without_min_lr_decays_to_zero():
    sched = warmup_cosine_schedule(1e-3, total_steps=100, warmup_ratio=0.1, min_lr=None)
    assert float(sched(99)) < 1e-6


def test_lr_scheduler_type_variants():
    """lr_scheduler_type resolves to the HF-type schedules the reference's
    _resolve_lr_scheduler_type supports (train.py:202-216)."""
    from adt_str_tpu.config import TrainingConfig
    from adt_str_tpu.training.optimizer import make_schedule

    base = dict(learning_rate=1e-3, warmup_ratio=0.1)
    lin = make_schedule(
        TrainingConfig(lr_scheduler_type="linear", **base), total_steps=100
    )
    np.testing.assert_allclose(float(lin(10)), 1e-3, rtol=1e-6)
    np.testing.assert_allclose(float(lin(55)), 1e-3 * 0.5, rtol=1e-6)
    assert float(lin(100)) == 0.0

    cw = make_schedule(
        TrainingConfig(lr_scheduler_type="constant_with_warmup", **base),
        total_steps=100,
    )
    assert float(cw(0)) == 0.0
    np.testing.assert_allclose(float(cw(10)), 1e-3, rtol=1e-6)
    np.testing.assert_allclose(float(cw(99)), 1e-3, rtol=1e-6)

    const = make_schedule(
        TrainingConfig(lr_scheduler_type="constant", **base), total_steps=100
    )
    np.testing.assert_allclose(float(const(0)), 1e-3, rtol=1e-6)

    cos_min = make_schedule(
        TrainingConfig(min_learning_rate=1e-5, **base), total_steps=100
    )
    np.testing.assert_allclose(float(cos_min(99)), 1e-5, rtol=1e-6)

    import pytest as _pytest

    with _pytest.raises(ValueError):
        make_schedule(
            TrainingConfig(lr_scheduler_type="polynomial", **base), total_steps=100
        )


def test_decay_mask_excludes_norm_and_bias():
    from adt_str_tpu.training.optimizer import decay_mask

    cfg = tiny_config()
    params = adt.init_params(jax.random.PRNGKey(0), cfg)
    mask = decay_mask(params)
    assert mask["project_to_mel"]["w"] is True
    assert mask["project_to_mel"]["b"] is False
    assert mask["encoder"]["final_ln"]["scale"] is False
    assert mask["decoder"]["embedding"] is True


def test_adamw_matches_torch_single_update():
    """One AdamW update parity vs torch.optim.AdamW with identical grads,
    including the HF no-decay rule for biases/LayerNorm params."""
    import torch

    from adt_str_tpu.training.optimizer import make_optimizer

    rng = np.random.default_rng(0)
    w = rng.normal(size=(4, 3)).astype(np.float32)
    b = rng.normal(size=(3,)).astype(np.float32)
    gw = rng.normal(size=(4, 3)).astype(np.float32)
    gb = rng.normal(size=(3,)).astype(np.float32)
    lr, wd = 1e-3, 0.1

    params = {"layer": {"w": jnp.asarray(w), "b": jnp.asarray(b)}}
    grads = {"layer": {"w": jnp.asarray(gw), "b": jnp.asarray(gb)}}
    tcfg = TrainingConfig(
        learning_rate=lr, weight_decay=wd, warmup_ratio=0.0, max_grad_norm=1e9
    )
    tx, _ = make_optimizer(tcfg, total_steps=10_000_000, params=params)
    state = tx.init(params)
    updates, _ = tx.update(grads, state, params)
    import optax

    new_params = optax.apply_updates(params, updates)

    tw = torch.nn.Parameter(torch.from_numpy(w.copy()))
    tb = torch.nn.Parameter(torch.from_numpy(b.copy()))
    opt = torch.optim.AdamW(
        [{"params": [tw], "weight_decay": wd}, {"params": [tb], "weight_decay": 0.0}],
        lr=lr, betas=(0.9, 0.999), eps=1e-8,
    )
    tw.grad = torch.from_numpy(gw.copy())
    tb.grad = torch.from_numpy(gb.copy())
    opt.step()

    np.testing.assert_allclose(
        np.asarray(new_params["layer"]["w"]), tw.detach().numpy(), atol=2e-6
    )
    np.testing.assert_allclose(
        np.asarray(new_params["layer"]["b"]), tb.detach().numpy(), atol=2e-6
    )


def make_uniform_batch(cfg, B=8, T=12, n_valid=10, seed=0):
    """Batch with identical per-row token counts, so microbatch CE means
    average exactly to the full-batch mean (needed for accumulation
    equivalence)."""
    rng = np.random.default_rng(seed)
    wave = rng.normal(size=(B, cfg.chunk_samples)).astype(np.float32) * 0.1
    tokens = np.full((B, T), 1, dtype=np.int32)
    tokens[:, 0] = 2
    tokens[:, 1 : n_valid - 1] = rng.integers(4, 40, (B, n_valid - 2))
    tokens[:, n_valid - 1] = 3
    lengths = np.full(B, n_valid, dtype=np.int32)
    return {
        "wavs": jnp.asarray(wave),
        "tokens": jnp.asarray(tokens),
        "token_lengths": jnp.asarray(adt.collate_token_lengths(jnp.asarray(lengths))),
    }


def _split(batch, lo, hi):
    return {k: v[lo:hi] for k, v in batch.items()}


@pytest.mark.slow
def test_gradient_accumulation_equivalence():
    """2 micro-steps at bs=B with gradient_accumulation_steps=2 produce the
    same parameters as 1 step at bs=2B (reference knob train.py:239)."""
    cfg = tiny_config()
    params = adt.init_params(jax.random.PRNGKey(0), cfg)
    full = make_uniform_batch(cfg, B=8)
    kw = dict(learning_rate=1e-3, warmup_ratio=0.0, weight_decay=1e-5, max_grad_norm=1.0)
    tcfg_acc = TrainingConfig(gradient_accumulation_steps=2, **kw)
    tcfg_big = TrainingConfig(**kw)
    tx_a, _ = make_optimizer(tcfg_acc, total_steps=10, params=params)
    tx_b, _ = make_optimizer(tcfg_big, total_steps=10, params=params)
    step_a = make_train_step(cfg, tx_a)
    step_b = make_train_step(cfg, tx_b)
    rng = jax.random.PRNGKey(1)

    # the train step donates its state, so give each path its own copy
    sa = init_train_state(jax.tree.map(jnp.copy, params), tx_a)
    sa, _ = step_a(sa, _split(full, 0, 4), rng)
    sa, _ = step_a(sa, _split(full, 4, 8), rng)

    sb = init_train_state(jax.tree.map(jnp.copy, params), tx_b)
    sb, _ = step_b(sb, full, rng)

    # Gradient-level equivalence is tight: mean of the two microbatch grads
    # equals the full-batch grad.
    def grads_of(batch):
        def loss_fn(p):
            return adt.forward_loss(
                p, batch["wavs"], batch["tokens"], batch["token_lengths"], cfg,
                rng=rng, train=True,
            )

        return jax.grad(loss_fn)(params)

    g_half = jax.tree.map(
        lambda x, y: (x + y) / 2, grads_of(_split(full, 0, 4)), grads_of(_split(full, 4, 8))
    )
    g_full = grads_of(full)
    for a, b in zip(jax.tree.leaves(g_half), jax.tree.leaves(g_full)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-7)

    # Post-Adam params: near-zero-grad elements amplify fp noise through
    # g/(sqrt(g^2)+eps), so compare at a tolerance that still separates
    # semantic errors (sum-vs-mean accumulation would differ by ~lr=1e-3).
    for a, b in zip(jax.tree.leaves(sa.params), jax.tree.leaves(sb.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4, rtol=0)


@pytest.mark.slow
def test_multisteps_opt_state_checkpoint_roundtrip(tmp_path):
    """Checkpoint save/restore mid-accumulation: the MultiSteps opt_state
    (incl. accumulated grads) survives orbax and training continues exactly
    as if uninterrupted."""
    from adt_str_tpu.training import checkpoint as ckpt_lib

    cfg = tiny_config()
    params = adt.init_params(jax.random.PRNGKey(0), cfg)
    full = make_uniform_batch(cfg, B=8)
    tcfg = TrainingConfig(
        learning_rate=1e-3, warmup_ratio=0.0, gradient_accumulation_steps=2
    )
    tx, _ = make_optimizer(tcfg, total_steps=10, params=params)
    step = make_train_step(cfg, tx)
    rng = jax.random.PRNGKey(1)

    # uninterrupted: 2 micro-steps (one real update); copy params — the
    # train step donates its state
    s_ref = init_train_state(jax.tree.map(jnp.copy, params), tx)
    s_ref, _ = step(s_ref, _split(full, 0, 4), rng)
    s_ref, _ = step(s_ref, _split(full, 4, 8), rng)

    # interrupted after micro-step 1: save (acc_grads hot), restore, continue
    s = init_train_state(jax.tree.map(jnp.copy, params), tx)
    s, _ = step(s, _split(full, 0, 4), rng)
    path = ckpt_lib.save_checkpoint(tmp_path / "ck", s.params, s.opt_state, step=1)
    tx2, _ = make_optimizer(tcfg, total_steps=10, params=params)
    template = init_train_state(params, tx2)
    rp, ro, step_no, _ = ckpt_lib.restore_checkpoint(
        path, {"params": template.params, "opt_state": template.opt_state}
    )
    assert step_no == 1
    from adt_str_tpu.parallel.train_step import TrainState

    s2 = TrainState(rp, ro, jnp.asarray(1, jnp.int32))
    s2, _ = step(s2, _split(full, 4, 8), rng)

    for a, b in zip(jax.tree.leaves(s_ref.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=0)


@pytest.mark.slow
def test_remat_grads_match_plain():
    """config.remat wraps each transformer layer in jax.checkpoint: identical
    math, activations recomputed in backward. Loss and every gradient leaf
    must match the non-remat step (same ops re-executed -> tight tolerance),
    with dropout active so the recomputed mask stream is exercised too."""
    batch = None
    grads = {}
    for remat in (False, True):
        cfg = tiny_config(enc_layers=2, dec_layers=2, dropout=0.2, remat=remat)
        params = adt.init_params(jax.random.PRNGKey(0), cfg)
        if batch is None:
            batch = make_batch(cfg)
        rng = jax.random.PRNGKey(42)

        def loss_fn(p):
            return adt.forward_loss(
                p, batch["wavs"], batch["tokens"], batch["token_lengths"],
                cfg, rng=rng, train=True,
            )

        loss, g = jax.jit(jax.value_and_grad(loss_fn))(params)
        grads[remat] = (float(loss), g)

    assert abs(grads[False][0] - grads[True][0]) < 1e-6
    flat_a = jax.tree.leaves(grads[False][1])
    flat_b = jax.tree.leaves(grads[True][1])
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_gradient_accumulation_under_mesh():
    """MultiSteps composes with the data-manual shard_map step: 2 sharded
    micro-steps at global bs 8 with accumulation=2 reproduce 1 sharded step
    at global bs 16 (pmean'd micro-grads accumulate exactly like
    single-device ones — uniform token lengths so shard means equal the
    global mean). Pins the production combination of
    `gradient_accumulation_steps` with a device mesh."""
    cfg = tiny_config()
    params = adt.init_params(jax.random.PRNGKey(0), cfg)
    full = make_uniform_batch(cfg, B=16)
    kw = dict(learning_rate=1e-3, warmup_ratio=0.0, weight_decay=1e-5,
              max_grad_norm=1.0)
    tx_a, _ = make_optimizer(
        TrainingConfig(gradient_accumulation_steps=2, **kw),
        total_steps=10, params=params,
    )
    tx_b, _ = make_optimizer(TrainingConfig(**kw), total_steps=10, params=params)
    mesh = mesh_lib.make_mesh(n_data=8, n_model=1)
    rng = jax.random.PRNGKey(1)

    step_a = make_train_step(cfg, tx_a, mesh=mesh)
    sa = init_train_state(
        mesh_lib.shard_params(mesh, adt.init_params(jax.random.PRNGKey(0), cfg)),
        tx_a,
    )
    sa, _ = step_a(sa, mesh_lib.shard_batch(mesh, _split(full, 0, 8)), rng)
    sa, _ = step_a(sa, mesh_lib.shard_batch(mesh, _split(full, 8, 16)), rng)

    step_b = make_train_step(cfg, tx_b, mesh=mesh)
    sb = init_train_state(
        mesh_lib.shard_params(mesh, adt.init_params(jax.random.PRNGKey(0), cfg)),
        tx_b,
    )
    sb, _ = step_b(sb, mesh_lib.shard_batch(mesh, full), rng)

    for a, b in zip(jax.tree.leaves(sa.params), jax.tree.leaves(sb.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4, rtol=0)


@pytest.mark.slow
def test_gradient_accumulation_schedule_in_update_space():
    """The LR schedule under MultiSteps must advance once per accumulation
    WINDOW (HF: scheduler steps per optimizer update, not per micro-batch).
    With a micro-step schedule, warmup ran k-times too long and decay covered
    1/k of its range (self-review round 3). 2k micro-steps at accum=k must
    reproduce k big-batch steps under a warming-up schedule, and the logged
    schedule must equal the applied one."""
    cfg = tiny_config()
    params = adt.init_params(jax.random.PRNGKey(0), cfg)
    full = make_uniform_batch(cfg, B=8)
    kw = dict(learning_rate=1e-3, warmup_ratio=0.5, weight_decay=1e-5,
              max_grad_norm=1.0, lr_scheduler_type="cosine")
    # accum path: 4 micro-steps == 2 updates; plain path: 2 updates
    tx_a, sched_a = make_optimizer(
        TrainingConfig(gradient_accumulation_steps=2, **kw),
        total_steps=4, params=params,
    )
    tx_b, sched_b = make_optimizer(TrainingConfig(**kw), total_steps=2, params=params)
    # the logged (micro-step) schedule equals the applied (update) one
    for micro in range(4):
        np.testing.assert_allclose(
            float(sched_a(micro)), float(sched_b(micro // 2)), rtol=1e-6
        )

    step_a = make_train_step(cfg, tx_a)
    step_b = make_train_step(cfg, tx_b)
    rng = jax.random.PRNGKey(1)
    sa = init_train_state(jax.tree.map(jnp.copy, params), tx_a)
    for lo, hi in [(0, 4), (4, 8), (0, 4), (4, 8)]:
        sa, _ = step_a(sa, _split(full, lo, hi), rng)
    sb = init_train_state(jax.tree.map(jnp.copy, params), tx_b)
    for _ in range(2):
        sb, _ = step_b(sb, full, rng)
    for a, b in zip(jax.tree.leaves(sa.params), jax.tree.leaves(sb.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4, rtol=0)


def test_skip_nonfinite_updates():
    """`training.skip_nonfinite_updates: N` (TPU addition): a step whose
    gradients are NaN/Inf must be a no-op on params AND Adam state (the
    reference has no such guard — one NaN batch poisons its run), recover
    on the next finite step, and pass the poison through once N
    consecutive bad steps exhaust the budget (visible failure, not a
    silent infinite skip-loop)."""
    import optax

    cfg = tiny_config()
    params = adt.init_params(jax.random.PRNGKey(0), cfg)
    tcfg = TrainingConfig(
        learning_rate=1e-3, warmup_ratio=0.0, skip_nonfinite_updates=2
    )
    tx, _ = make_optimizer(tcfg, total_steps=10, params=params)

    # the full train step still runs and trains under the wrapper (note: a
    # NaN in the INPUT audio cannot reach the grads at all — the
    # reference-parity nan_to_num on logits, model.py:233, zeroes its
    # gradient — so grad poison is injected at the optimizer boundary)
    step = make_train_step(cfg, tx)
    batch = make_batch(cfg)
    state = init_train_state(jax.tree.map(jnp.copy, params), tx)
    state, m0 = step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(m0["loss"]))
    assert int(m0["notfinite_total"]) == 0  # guard observability in metrics
    p1 = jax.tree.map(jnp.copy, state.params)
    opt1 = jax.tree.map(
        lambda x: jnp.copy(x) if hasattr(x, "dtype") else x, state.opt_state
    )

    nan_grads = jax.tree.map(lambda g: jnp.full_like(g, jnp.nan), p1)
    fine_grads = jax.tree.map(lambda g: jnp.ones_like(g) * 1e-3, p1)

    # poisoned step: updates must be exact zeros, inner Adam state untouched
    updates, opt2 = tx.update(nan_grads, opt1, p1)
    for u in jax.tree.leaves(updates):
        np.testing.assert_array_equal(np.asarray(u), 0.0)
    assert int(opt2.notfinite_count) == 1
    for a, b in zip(jax.tree.leaves(opt1.inner_state), jax.tree.leaves(opt2.inner_state)):
        if hasattr(a, "dtype"):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # recovery: a finite step applies normally and resets the counter
    updates, opt3 = tx.update(fine_grads, opt2, p1)
    assert int(opt3.notfinite_count) == 0
    assert any(float(jnp.abs(u).max()) > 0 for u in jax.tree.leaves(updates))

    # budget exhaustion: after N consecutive bad steps the poison passes
    # through (apply_if_finite semantics) so the failure is visible
    o = opt3
    last = None
    for _ in range(3):
        last, o = tx.update(nan_grads, o, p1)
    assert not np.isfinite(np.asarray(jax.tree.leaves(last)[0])).all()

    # default 0 keeps reference behavior: no ApplyIfFiniteState in the tree
    tx_off, _ = make_optimizer(
        TrainingConfig(learning_rate=1e-3, warmup_ratio=0.0),
        total_steps=10, params=params,
    )
    assert not isinstance(tx_off.init(params), optax.ApplyIfFiniteState)


def test_unsupported_optim_rejected():
    cfg = tiny_config()
    params = adt.init_params(jax.random.PRNGKey(0), cfg)
    with pytest.raises(ValueError, match="unsupported optim"):
        make_optimizer(
            TrainingConfig(optim="adafactor"), total_steps=10, params=params
        )
