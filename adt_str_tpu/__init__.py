"""adt_str_tpu — a TPU-native (JAX/XLA/Pallas) automatic drum transcription framework.

Re-implements the full capability surface of the ADT_STR reference pipeline
(reference: /root/reference, a PyTorch/HF research codebase) as an idiomatic
TPU-first framework:

- functional JAX transformer model (fp32 params, bf16 compute) with KV-cache
  greedy decoding and vectorized beam search,
- fused log-mel audio frontend (XLA reference path + Pallas matmul-DFT kernel),
- on-device drum synthesis (one-shot bank gather + scatter-add + JAX DSP FX),
- `jax.sharding.Mesh`-based data/tensor parallel training (pjit + collectives
  over ICI), optax AdamW with warmup-cosine-min-LR schedule,
- orbax checkpointing with auto-resume, safetensors export,
- hermetic evaluation harness (onset bipartite matching, per-class metrics,
  drum confusion matrix) with no external metric dependencies.

Layer map mirrors SURVEY.md §1; per-component reference citations live in each
module's docstring.
"""

__version__ = "0.1.0"
