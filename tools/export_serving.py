"""Serving export: compile-once StableHLO artifact of the transcription step.

Framework addition (no reference analogue — the reference serves by loading
torch weights into a Python process and re-running the full decoder prefix
per token, `model.py:260-324`). This tool exports the KV-cache greedy decode
(`adt_str_tpu/models/decode.py:greedy_decode`) as a self-contained
`jax.export` artifact: weights are baked in as constants, so a serving host
needs only the serialized bytes + `jax.export.deserialize` — no model code,
no checkpoint loader, no config system. The artifact is versioned StableHLO
with jax's cross-version compatibility guarantees.

Usage:
  python tools/export_serving.py <config.yaml> --out exports/
      [--batch 64]        fixed batch size (default)
      [--poly-batch]      symbolic batch dimension instead (any B at runtime)
      [--max-length N]    override inference.max_length
      [--check]           deserialize + run the artifact and compare against
                          a direct greedy_decode call on random audio

Writes `<out>/transcribe_greedy.jaxexport` (serialized Exported) and
`<out>/meta.json` (shapes, token ids, sample rate, platform, jax version).

Consumer sketch:
    import jax.export
    exp = jax.export.deserialize(open("transcribe_greedy.jaxexport", "rb").read())
    tokens = exp.call(wavs)   # (B, chunk_samples) f32 -> (B, max_length) i32
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from adt_str_tpu.utils.misc import pin_jax_platform_from_env

pin_jax_platform_from_env()


def build_exported(
    params,
    model_config,
    max_length: int,
    start_token: int = 2,
    end_token: int = 3,
    batch_size: int | None = 64,
    platforms: list[str] | None = None,
):
    """Export greedy transcription as a `jax.export.Exported`.

    `batch_size=None` exports with a symbolic batch dimension (the artifact
    then accepts any B >= 1 at call time; XLA still compiles per concrete B
    on the serving host). Weights travel as embedded constants: `params` is
    closed over, so the artifact is standalone."""
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    from adt_str_tpu.models import decode as decode_lib

    def fn(wavs):
        return decode_lib.greedy_decode(
            params,
            wavs,
            model_config,
            max_length=max_length,
            start_token=start_token,
            end_token=end_token,
        )

    chunk = model_config.chunk_samples
    if batch_size is None:
        (b,) = jexport.symbolic_shape("b")
        spec = jax.ShapeDtypeStruct((b, chunk), jnp.float32)
    else:
        spec = jax.ShapeDtypeStruct((int(batch_size), chunk), jnp.float32)
    kwargs = {"platforms": platforms} if platforms else {}
    return jexport.export(jax.jit(fn), **kwargs)(spec)


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__.split("\n", 1)[0])
    parser.add_argument("config_path", type=str)
    parser.add_argument("--out", type=str, default="exports/")
    parser.add_argument("--batch", type=int, default=64)
    parser.add_argument(
        "--poly-batch", action="store_true",
        help="symbolic batch dimension instead of a fixed --batch",
    )
    parser.add_argument("--max-length", type=int, default=None)
    parser.add_argument("--check", action="store_true")
    args = parser.parse_args()

    import jax
    from jax import export as jexport

    from adt_str_tpu.config import FrameworkConfig
    from adt_str_tpu.domain.tokenizer import MidiTokenizer
    from adt_str_tpu.training.checkpoint import load_params_from_reference_checkpoint

    cfg = FrameworkConfig.from_yaml(args.config_path)
    if cfg.inference is None or not cfg.inference.checkpoint_path:
        raise SystemExit("config needs `inference.checkpoint_path`")
    params = load_params_from_reference_checkpoint(cfg.inference.checkpoint_path)
    tokenizer = MidiTokenizer(cfg.tokenizer)
    max_length = int(args.max_length or cfg.inference.max_length)
    batch = None if args.poly_batch else args.batch

    exp = build_exported(
        params,
        cfg.model,
        max_length,
        start_token=tokenizer.BOS_token,
        end_token=tokenizer.EOS_token,
        batch_size=batch,
    )
    blob = exp.serialize()

    os.makedirs(args.out, exist_ok=True)
    art_path = os.path.join(args.out, "transcribe_greedy.jaxexport")
    with open(art_path, "wb") as f:
        f.write(blob)
    meta = {
        "artifact": os.path.basename(art_path),
        "input": {
            "shape": ["b" if batch is None else batch, cfg.model.chunk_samples],
            "dtype": "float32",
            "sample_rate": cfg.shared.sample_rate,
            "seconds_per_chunk": cfg.shared.input_sec,
        },
        "output": {
            "shape": ["b" if batch is None else batch, max_length],
            "dtype": "int32",
            "bos_token": tokenizer.BOS_token,
            "eos_token": tokenizer.EOS_token,
            "pad_token": tokenizer.pad_token,
            "vocab_size": cfg.model.tgt_vocab_size,
        },
        "platforms": list(exp.platforms),
        "jax_version": jax.__version__,
        "checkpoint": cfg.inference.checkpoint_path,
    }
    with open(os.path.join(args.out, "meta.json"), "w") as f:
        json.dump(meta, f, indent=2)
    print(
        f"exported {art_path} ({len(blob) / 1e6:.1f} MB, "
        f"platforms={list(exp.platforms)}, batch={'poly' if batch is None else batch}, "
        f"max_length={max_length})"
    )

    if args.check:
        from adt_str_tpu.models import decode as decode_lib

        rehydrated = jexport.deserialize(blob)
        b_check = 2 if batch is None else batch
        rng = np.random.default_rng(0)
        wavs = rng.normal(size=(b_check, cfg.model.chunk_samples)).astype(np.float32)
        got = np.asarray(rehydrated.call(wavs))
        want = np.asarray(
            decode_lib.greedy_decode(
                params, wavs, cfg.model, max_length=max_length,
                start_token=tokenizer.BOS_token, end_token=tokenizer.EOS_token,
            )
        )
        np.testing.assert_array_equal(got, want)
        print(f"check OK: artifact output matches direct decode at B={b_check}")


if __name__ == "__main__":
    main()
