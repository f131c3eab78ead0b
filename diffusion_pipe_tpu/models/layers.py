"""Shared Flax building blocks: LoRA-aware Dense, norms, embeddings, RoPE.

TPU-native replacements for the reference's model-layer idioms:
- LoRA here is a first-class parameter structure inside LoraDense (params
  named lora_a / lora_b, zero-init B, scale alpha/rank), replacing PEFT's
  runtime nn.Linear mutation (reference models/base.py:216-260). Trainable
  filtering is by parameter-path name ('lora_' prefix), so the optimizer
  mask and adapter serialization need no `original_name` bookkeeping
  (reference train.py:522-526, saver.py:58-85).
- Tensor-parallel sharding is attached as flax Partitioned metadata
  (kernel_axes), mapped onto the ('data','stage','tensor') mesh by
  parallel/sharding.py. The reference has no TP (SURVEY.md section 2.7).
"""

from __future__ import annotations

import math
from typing import Any, Callable, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any

default_kernel_init = nn.initializers.lecun_normal()


def _maybe_partition(init: Callable, axes: Optional[Tuple[Optional[str], ...]]):
    if axes is None:
        return init
    return nn.with_partitioning(init, axes)


@jax.custom_vjp
def int8_dot(x, w):
    """Dynamic W8A8 matmul for FROZEN kernels: per-token activation and
    per-output-channel weight absmax int8 quantization, int8 MXU dot
    (~2.25x bf16 on v5e), f32 rescale. Backward is straight-through in
    full precision (dx = g @ W^T; frozen base kernels need no wgrad)."""
    return _int8_dot_fwd_impl(x, w)


def _int8_dot_fwd_impl(x, w):
    xf = x.astype(jnp.float32)
    wf = w.astype(jnp.float32)
    w_scale = jnp.max(jnp.abs(wf), axis=0) / 127.0  # [out]
    x_scale = jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0
    w8 = jnp.clip(
        jnp.round(wf / jnp.maximum(w_scale, 1e-12)), -127, 127
    ).astype(jnp.int8)
    x8 = jnp.clip(
        jnp.round(xf / jnp.maximum(x_scale, 1e-12)), -127, 127
    ).astype(jnp.int8)
    y32 = jax.lax.dot_general(
        x8, w8, (((x8.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return y32.astype(jnp.float32) * x_scale * w_scale[None, :]


def _int8_dot_fwd(x, w):
    return _int8_dot_fwd_impl(x, w), (x, w)


def _int8_dot_bwd(res, g):
    x, w = res
    gf = g.astype(jnp.float32)
    dx = jnp.einsum("...o,io->...i", gf, w.astype(jnp.float32)).astype(x.dtype)
    dw = jnp.zeros_like(w)  # frozen base kernel
    return dx, dw


int8_dot.defvjp(_int8_dot_fwd, _int8_dot_bwd)


@jax.custom_vjp
def int8_dot_bwd8(x, w):
    """int8_dot variant that ALSO quantizes the backward dgrad matmul
    (per-token cotangent scales x per-input-channel weight scales).
    Extra quantization noise feeds adapter gradients — opt-in via
    model.int8_backward."""
    return _int8_dot_fwd_impl(x, w)


def _int8b_fwd(x, w):
    return _int8_dot_fwd_impl(x, w), (x, w)


def _int8b_bwd(res, g):
    x, w = res
    gf = g.astype(jnp.float32)
    wf = w.astype(jnp.float32)
    g_scale = jnp.max(jnp.abs(gf), axis=-1, keepdims=True) / 127.0
    w_scale = jnp.max(jnp.abs(wf), axis=1) / 127.0  # per input channel [in]
    g8 = jnp.clip(
        jnp.round(gf / jnp.maximum(g_scale, 1e-12)), -127, 127
    ).astype(jnp.int8)
    w8 = jnp.clip(
        jnp.round(wf / jnp.maximum(w_scale[:, None], 1e-12)), -127, 127
    ).astype(jnp.int8)
    dx32 = jax.lax.dot_general(
        g8, w8, (((g8.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    dx = (dx32.astype(jnp.float32) * g_scale * w_scale[None, :]).astype(x.dtype)
    return dx, jnp.zeros_like(w)


int8_dot_bwd8.defvjp(_int8b_fwd, _int8b_bwd)


# --- Pre-quantized int8 kernels -------------------------------------------
#
# Frozen base kernels never change during adapter training, so their int8
# image and per-output-channel scales are constants: quantizing them ONCE at
# state-init time (training/trainer.py init_train_state ->
# prequantize_int8_frozen) removes the per-use read-quantize-write pass over
# the whole kernel that the dynamic int8_dot path pays on every forward,
# remat recompute, and dgrad (the reference's analogue is fp8 weight STORAGE,
# models/flux.py:201-203 — storage-side quantization done once at load).
# Numerics are identical to the dynamic path: same absmax scales from the
# same frozen weights.


def _quant_rows(x):
    """Per-row (last-dim) absmax int8 quantization -> (x8, scale)."""
    xf = x.astype(jnp.float32)
    scale = jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0
    x8 = jnp.clip(
        jnp.round(xf / jnp.maximum(scale, 1e-12)), -127, 127
    ).astype(jnp.int8)
    return x8, scale


def quantize_kernel_int8(w):
    """Per-output-channel absmax int8 quantization of a [..., in, out] kernel
    (leading axes, e.g. an nn.scan layer-stack, are preserved).

    Returns (w8 int8 [..., in, out], scale f32 [..., out]). Matches the
    scales the dynamic int8_dot path computes, so swapping storage changes
    nothing numerically."""
    wf = w.astype(jnp.float32)
    scale = jnp.max(jnp.abs(wf), axis=-2) / 127.0
    w8 = jnp.clip(
        jnp.round(wf / jnp.maximum(scale[..., None, :], 1e-12)), -127, 127
    ).astype(jnp.int8)
    return w8, scale


def _int8pq_fwd_impl(x, w8, w_scale):
    x8, x_scale = _quant_rows(x)
    y32 = jax.lax.dot_general(
        x8, w8, (((x8.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return y32.astype(jnp.float32) * x_scale * w_scale[None, :]


def _int8pq_res(x, w8, w_scale):
    # dx needs only (w8, w_scale); a zero-size marker carries x.dtype.
    return w8, w_scale, jnp.zeros((0,), x.dtype)


def _int8pq_zero_cots(w8, w_scale):
    import numpy as _np

    return (
        _np.zeros(w8.shape, jax.dtypes.float0),
        jnp.zeros(w_scale.shape, w_scale.dtype),
    )


@jax.custom_vjp
def int8_pq_dot(x, w8, w_scale):
    """W8A8 matmul against a PRE-quantized frozen kernel (int8 storage +
    per-output-channel scales). Backward dgrad is a bf16 matmul over the
    dequantized kernel (the original full-precision weights no longer
    exist); only the weight-quantization noise enters, no cotangent
    quantization (contrast int8_pq_dot_bwd8)."""
    return _int8pq_fwd_impl(x, w8, w_scale)


def _int8pq_fwd(x, w8, w_scale):
    return _int8pq_fwd_impl(x, w8, w_scale), _int8pq_res(x, w8, w_scale)


def _int8pq_bwd(res, g):
    w8, w_scale, xmark = res
    # dx = g @ (w8 * s_o)^T == (g * s_o) @ w8^T; fold the column scales into
    # the cotangent so the kernel is read once, as int8.
    gs = g.astype(jnp.float32) * w_scale[None, :]
    dx = jax.lax.dot_general(
        gs.astype(jnp.bfloat16), w8.astype(jnp.bfloat16),
        (((gs.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(xmark.dtype)
    dw8, dscale = _int8pq_zero_cots(w8, w_scale)
    return dx, dw8, dscale


int8_pq_dot.defvjp(_int8pq_fwd, _int8pq_bwd)


@jax.custom_vjp
def int8_pq_dot_bwd8(x, w8, w_scale):
    """int8_pq_dot variant with an int8 dgrad: the column scales fold into
    the cotangent BEFORE its per-token quantization, so backward is a pure
    int8 MXU matmul over the stored kernel (no dequantize pass)."""
    return _int8pq_fwd_impl(x, w8, w_scale)


def _int8pqb_fwd(x, w8, w_scale):
    return _int8pq_fwd_impl(x, w8, w_scale), _int8pq_res(x, w8, w_scale)


def _int8pqb_bwd(res, g):
    w8, w_scale, xmark = res
    gs = g.astype(jnp.float32) * w_scale[None, :]
    g8, g_scale = _quant_rows(gs)
    dx32 = jax.lax.dot_general(
        g8, w8, (((g8.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    dx = (dx32.astype(jnp.float32) * g_scale).astype(xmark.dtype)
    dw8, dscale = _int8pq_zero_cots(w8, w_scale)
    return dx, dw8, dscale


int8_pq_dot_bwd8.defvjp(_int8pqb_fwd, _int8pqb_bwd)


def prequantize_int8_tree(tree):
    """Replace every (kernel, kernel_scale) pair in a nested params dict with
    int8 storage + real scales. kernel_scale params exist only on LoraDense
    layers built with int8_matmul enabled, so this is a no-op otherwise.
    Run on the FROZEN subtree only (trainable kernels need real wgrads)."""
    from flax import traverse_util
    from flax.core import meta

    def _unbox(v):
        return v.unbox() if isinstance(v, meta.AxisMetadata) else v

    def _rebox(box, new):
        return box.replace_boxed(new) if isinstance(box, meta.AxisMetadata) \
            else new

    flat = traverse_util.flatten_dict(tree)
    out = dict(flat)
    for k, v in flat.items():
        if k[-1] != "kernel_scale" or v is None:
            continue
        kk = k[:-1] + ("kernel",)
        w = flat.get(kk)
        if w is None:
            continue
        wv = _unbox(w)
        if not jnp.issubdtype(jnp.asarray(wv).dtype, jnp.floating):
            continue
        w8, scale = quantize_kernel_int8(wv)
        out[kk] = _rebox(w, w8)
        out[k] = _rebox(v, scale)
    return traverse_util.unflatten_dict(out)


def remat_spec(config) -> str:
    """Resolve `activation_checkpointing` to a remat-policy spec string.

    Reference semantics (train.py:578-589): the option is `false`, `true`
    (plain torch checkpoint) or `'unsloth'` (checkpoint with hidden states
    offloaded to CPU, utils/unsloth_utils.py:23-71). TPU mapping:
      false      -> ""            (no remat)
      true       -> "full"        (recompute everything; or the model-level
                                   `remat_policy` override, e.g. "dots")
      "unsloth"  -> "unsloth"     (remat, but matmul residuals are saved and
                                   offloaded to pinned host memory — XLA
                                   host-offload replaces CUDA pinned-RAM
                                   copies)
      "dots"/"offload_dots" also accepted directly.
    The returned string is falsy iff remat is off, so model configs can keep
    `if cfg.remat:` checks while storing the spec in the same field.
    """
    ac = config.get("activation_checkpointing", False)
    if not ac:
        return ""
    if ac is True:
        return str(config.get("remat_policy", "full"))
    return str(ac)


_REMAT_POLICIES: dict = {}


def _remat_policy(spec):
    if spec in ("full", True):
        return None
    if spec in _REMAT_POLICIES:
        return _REMAT_POLICIES[spec]
    if spec == "dots":
        pol = jax.checkpoint_policies.dots_with_no_batch_dims_saveable
    elif spec == "attn":
        # save only the flash-attention outputs (o, lse): the backward
        # replay recomputes the cheap linears but never re-runs the
        # attention forward kernel (the dominant recompute for long video
        # sequences). HBM cost: one [B, H, S, D] tensor per attention.
        pol = jax.checkpoint_policies.save_only_these_names("flash_out")
    elif spec == "offload_attn":
        # same, but the saved attention outputs live in pinned host RAM
        pol = jax.checkpoint_policies.save_and_offload_only_these_names(
            names_which_can_be_saved=[],
            names_which_can_be_offloaded=["flash_out"],
            offload_src="device", offload_dst="pinned_host",
        )
    elif spec in ("unsloth", "offload_dots"):
        # save matmul outputs (no recompute of the MXU work) but move the
        # saved residuals to pinned host RAM between fwd and bwd
        pol = jax.checkpoint_policies.offload_dot_with_no_batch_dims(
            "device", "pinned_host"
        )
    else:
        raise ValueError(f"unknown activation_checkpointing/remat spec {spec!r}")
    _REMAT_POLICIES[spec] = pol
    return pol


def remat_wrap(block_cls, spec):
    """nn.remat with the policy resolved from a remat_spec() string."""
    return nn.remat(block_cls, prevent_cse=False, policy=_remat_policy(spec))


def lokr_factorization(dim: int, factor: int = -1) -> Tuple[int, int]:
    """Balanced two-factor split of `dim`, LyCORIS semantics.

    Returns (m, n), m <= n, m * n == dim. With factor > 0 and
    factor | dim, the split is pinned to (factor, dim // factor); otherwise
    the most-square divisor pair with m <= factor (or unbounded for
    factor < 0). Mirrors the `decompose_factor` the reference exposes via
    peft.LoKrConfig (reference models/base.py:216-260 adapter injection).
    """
    if factor > 0 and dim % factor == 0:
        m, n = factor, dim // factor
        return (m, n) if m <= n else (n, m)
    cap = dim if factor < 0 else factor
    m, n = 1, dim
    cand = 1
    while cand * cand <= dim:
        if dim % cand == 0 and cand <= cap:
            m, n = cand, dim // cand
        cand += 1
    return m, n


class LoraDense(nn.Module):
    """Dense layer with optional fused LoRA path.

    y = x @ W + b + (alpha/rank) * dropout(x) @ A @ B

    A is kaiming-uniform initialized, B zeros (PEFT LoraLayer defaults, which
    the reference injects via peft.LoraConfig at models/base.py:236-246), so
    training starts exactly at the base model. rank=0 disables LoRA entirely.
    """

    features: int
    use_bias: bool = True
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32
    # Storage dtype for the base kernel only (e.g. float8_e4m3fn for the
    # reference's fp8 weight storage, models/flux.py:201-203); biases and
    # LoRA factors stay in param_dtype/lora_dtype (KEEP_IN_HIGH_PRECISION).
    kernel_dtype: Optional[Dtype] = None
    lora_rank: int = 0
    lora_alpha: float = 0.0
    lora_dropout: float = 0.0
    lora_dtype: Dtype = jnp.float32
    # 'lora' (default) or 'lokr' (LyCORIS Kronecker product, the reference's
    # peft.LoKrConfig path). lokr_factor == reference `decompose_factor`.
    lora_type: str = "lora"
    lokr_factor: int = -1
    lokr_rank_dropout: float = 0.0
    # Dynamic W8A8 int8 compute for the frozen base kernel (storage dtype
    # unchanged, e.g. fp8). Opt-in speed mode; LoRA path stays full
    # precision. True/'fwd' quantizes forward only; 'fwd_bwd' also
    # quantizes the backward dgrad matmul.
    int8_matmul: Any = False
    kernel_axes: Optional[Tuple[Optional[str], ...]] = None
    kernel_init: Callable = default_kernel_init

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        in_features = x.shape[-1]
        kdtype = self.kernel_dtype or self.param_dtype

        def kinit(key, shape, dtype):
            # fp8 dtypes aren't supported by random samplers; init in f32.
            return self.kernel_init(key, shape, jnp.float32).astype(dtype)

        kernel = self.param(
            "kernel",
            _maybe_partition(kinit, self.kernel_axes),
            (in_features, self.features),
            kdtype,
        )
        bias = None
        if self.use_bias:
            bias_axes = (self.kernel_axes[-1],) if self.kernel_axes else None
            bias = self.param(
                "bias",
                _maybe_partition(nn.initializers.zeros_init(), bias_axes),
                (self.features,),
                self.param_dtype,
            )
        delta = None
        if self.lora_rank > 0 and self.lora_type == "lokr":
            delta = self._lokr_delta(x, in_features, deterministic)
        elif self.lora_rank > 0:
            # Kaiming-uniform(a=sqrt(5)) over fan_in, like PEFT's reset.
            bound = math.sqrt(6.0 / in_features)
            lora_a = self.param(
                "lora_a",
                nn.initializers.uniform(scale=2 * bound),
                (in_features, self.lora_rank),
                self.lora_dtype,
            )
            lora_b = self.param(
                "lora_b",
                nn.initializers.zeros_init(),
                (self.lora_rank, self.features),
                self.lora_dtype,
            )
            # uniform init is [0, scale); shift to [-bound, bound)
            lora_a = lora_a - bound
            scaling = self.lora_alpha / self.lora_rank
            h = x.astype(self.dtype)
            if self.lora_dropout > 0.0 and not deterministic:
                h = nn.Dropout(rate=self.lora_dropout)(h, deterministic=False)
            delta = scaling * jnp.dot(
                jnp.dot(h, jnp.asarray(lora_a, self.dtype)),
                jnp.asarray(lora_b, self.dtype),
            )
        if self.int8_matmul:
            # Companion scale param: ones at init; replaced with the real
            # per-output-channel scales when the frozen kernel is
            # pre-quantized to int8 storage (prequantize_int8_tree).
            # Created LAST so the flax per-scope rng counters — and with
            # them every other param's init — match the non-int8 config.
            scale_axes = (self.kernel_axes[-1],) if self.kernel_axes else None
            kernel_scale = self.param(
                "kernel_scale",
                _maybe_partition(nn.initializers.ones_init(), scale_axes),
                (self.features,),
                jnp.float32,
            )
            if jnp.issubdtype(jnp.asarray(kernel).dtype, jnp.integer):
                fn = (int8_pq_dot_bwd8 if self.int8_matmul == "fwd_bwd"
                      else int8_pq_dot)
                y = fn(x.astype(self.dtype), kernel, kernel_scale).astype(
                    self.dtype
                )
            else:
                fn = (int8_dot_bwd8 if self.int8_matmul == "fwd_bwd"
                      else int8_dot)
                y = fn(x.astype(self.dtype), kernel).astype(self.dtype)
        else:
            y = jnp.dot(x.astype(self.dtype), jnp.asarray(kernel, self.dtype))
        if bias is not None:
            y = y + jnp.asarray(bias, self.dtype)
        if delta is not None:
            y = y + delta
        return y

    def _lokr_delta(self, x, in_features: int, deterministic: bool):
        """LoKr adapter delta: kernel-delta = kron(w1, w2), w2 low-rank.

        Matches the LyCORIS/PEFT LoKr layer the reference injects
        (models/base.py:216-260 with peft.LoKrConfig): w1 is the small
        Kronecker factor (zero-init so training starts at the base model),
        w2 is rank-factored as w2_a @ w2_b when rank < max(in_n, out_n).
        Never materializes kron(w1, w2): for x reshaped [..., in_m, in_n],
        x @ kron(w1, w2) == einsum('...ij,ik,jl->...kl', X, w1, w2) — two
        small MXU matmuls instead of an (in x out) buffer.
        """
        in_m, in_n = lokr_factorization(in_features, self.lokr_factor)
        out_m, out_n = lokr_factorization(self.features, self.lokr_factor)
        w1 = self.param(
            "lokr_w1", nn.initializers.zeros_init(), (in_m, out_m), self.lora_dtype
        )
        factored = self.lora_rank < max(in_n, out_n)
        if factored:
            bound_a = math.sqrt(6.0 / in_n)
            w2_a = self.param(
                "lokr_w2_a",
                nn.initializers.uniform(scale=2 * bound_a),
                (in_n, self.lora_rank),
                self.lora_dtype,
            )
            bound_b = math.sqrt(6.0 / self.lora_rank)
            w2_b = self.param(
                "lokr_w2_b",
                nn.initializers.uniform(scale=2 * bound_b),
                (self.lora_rank, out_n),
                self.lora_dtype,
            )
            w2_a = w2_a - bound_a
            w2_b = w2_b - bound_b
            if self.lokr_rank_dropout > 0.0 and not deterministic:
                rng = self.make_rng("dropout")
                keep = jax.random.bernoulli(
                    rng, 1.0 - self.lokr_rank_dropout, (self.lora_rank,)
                )
                w2_a = w2_a * (
                    keep.astype(w2_a.dtype) / (1.0 - self.lokr_rank_dropout)
                )
            w2 = jnp.dot(
                w2_a.astype(self.dtype), w2_b.astype(self.dtype)
            )
            # LyCORIS scales by alpha/rank only on the rank-factored path.
            scaling = self.lora_alpha / self.lora_rank
        else:
            bound = math.sqrt(6.0 / in_n)
            w2 = self.param(
                "lokr_w2",
                nn.initializers.uniform(scale=2 * bound),
                (in_n, out_n),
                self.lora_dtype,
            )
            w2 = (w2 - bound).astype(self.dtype)
            scaling = 1.0
        h = x.astype(self.dtype)
        if self.lora_dropout > 0.0 and not deterministic:
            h = nn.Dropout(rate=self.lora_dropout)(h, deterministic=False)
        xr = h.reshape(h.shape[:-1] + (in_m, in_n))
        delta = jnp.einsum(
            "...ij,ik,jl->...kl", xr, w1.astype(self.dtype), w2
        )
        return scaling * delta.reshape(h.shape[:-1] + (self.features,))


class RMSNorm(nn.Module):
    """RMSNorm over the last dim, computed in float32."""

    eps: float = 1e-6
    use_scale: bool = True
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        orig_dtype = x.dtype
        xf = x.astype(jnp.float32)
        var = jnp.mean(xf * xf, axis=-1, keepdims=True)
        y = xf * jax.lax.rsqrt(var + self.eps)
        if self.use_scale:
            scale = self.param(
                "scale", nn.initializers.ones_init(), (x.shape[-1],), self.param_dtype
            )
            y = y * scale.astype(jnp.float32)
        return y.astype(orig_dtype)


def layer_norm_no_affine(x, eps: float = 1e-6):
    """LayerNorm(elementwise_affine=False) in float32 (adaLN pre-norm)."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    return ((xf - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


def modulate(x, shift, scale):
    """adaLN modulation: x * (1 + scale) + shift, broadcasting [B, D] over seq."""
    return x * (1.0 + scale[:, None, :]) + shift[:, None, :]


def sinusoidal_timestep_embedding(
    t: jax.Array,
    dim: int,
    max_period: float = 10000.0,
    flip_sin_to_cos: bool = True,
    downscale_freq_shift: float = 0.0,
    scale: float = 1.0,
) -> jax.Array:
    """diffusers `Timesteps` sinusoidal projection (flux uses dim=256,
    flip_sin_to_cos=True, shift=0). t: [B] (already scaled, e.g. *1000)."""
    half = dim // 2
    exponent = -math.log(max_period) * jnp.arange(half, dtype=jnp.float32)
    exponent = exponent / (half - downscale_freq_shift)
    freqs = jnp.exp(exponent)
    args = t.astype(jnp.float32)[:, None] * freqs[None, :] * scale
    sin, cos = jnp.sin(args), jnp.cos(args)
    emb = jnp.concatenate([cos, sin] if flip_sin_to_cos else [sin, cos], axis=-1)
    if dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


class TimestepEmbedder(nn.Module):
    """sinusoidal -> Linear -> SiLU -> Linear (diffusers TimestepEmbedding)."""

    hidden_dim: int
    freq_dim: int = 256
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, t):
        emb = sinusoidal_timestep_embedding(t, self.freq_dim)
        emb = LoraDense(
            self.hidden_dim, dtype=self.dtype, param_dtype=self.param_dtype,
            name="linear_1",
        )(emb)
        emb = nn.silu(emb)
        emb = LoraDense(
            self.hidden_dim, dtype=self.dtype, param_dtype=self.param_dtype,
            name="linear_2",
        )(emb)
        return emb


class PixArtAlphaTextProjection(nn.Module):
    """pooled text -> Linear -> SiLU -> Linear (diffusers text_embedder)."""

    hidden_dim: int
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = LoraDense(
            self.hidden_dim, dtype=self.dtype, param_dtype=self.param_dtype,
            name="linear_1",
        )(x)
        x = nn.silu(x)
        x = LoraDense(
            self.hidden_dim, dtype=self.dtype, param_dtype=self.param_dtype,
            name="linear_2",
        )(x)
        return x


# --- Rotary position embeddings (multi-axis, flux/wan style) --------------


def rope_frequencies(
    ids: jax.Array, axes_dim: Sequence[int], theta: float = 10000.0
) -> Tuple[jax.Array, jax.Array]:
    """Multi-axis RoPE tables from integer position ids.

    ids: [S, n_axes] positions per token per axis (flux EmbedND semantics:
    axes_dim=[16,56,56] summing to head_dim/... *2? -> sum(axes_dim) == head_dim).
    Returns (cos, sin) of shape [S, sum(axes_dim)] where each axis contributes
    axes_dim[i] entries of interleaved-pair frequencies.
    """
    cos_parts, sin_parts = [], []
    for i, d in enumerate(axes_dim):
        half = d // 2
        freqs = 1.0 / (
            theta ** (jnp.arange(half, dtype=jnp.float32) * 2.0 / d)
        )  # [half]
        angles = ids[:, i].astype(jnp.float32)[:, None] * freqs[None, :]  # [S, half]
        cos_parts.append(jnp.cos(angles))
        sin_parts.append(jnp.sin(angles))
    return (
        jnp.concatenate(cos_parts, axis=-1),
        jnp.concatenate(sin_parts, axis=-1),
    )


def apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """Rotate pairs (even, odd interleaved as [..., 2i], [..., 2i+1]).

    x: [B, S, H, D]; cos/sin: [S, D//2]. Matches the BFL/diffusers flux
    convention x.reshape(..., D//2, 2) with rotation
    (x0*cos - x1*sin, x0*sin + x1*cos).
    """
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    x0 = xf[..., 0::2]
    x1 = xf[..., 1::2]
    c = cos[None, :, None, :]
    s = sin[None, :, None, :]
    out0 = x0 * c - x1 * s
    out1 = x0 * s + x1 * c
    out = jnp.stack([out0, out1], axis=-1).reshape(x.shape)
    return out.astype(orig_dtype)


class GELU(nn.Module):
    """Linear + GELU(tanh) (diffusers FeedForward act)."""

    features: int
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32
    lora: dict = None
    kernel_axes: Optional[Tuple[Optional[str], ...]] = None

    @nn.compact
    def __call__(self, x):
        x = LoraDense(
            self.features, dtype=self.dtype, param_dtype=self.param_dtype,
            kernel_axes=self.kernel_axes, name="proj", **(self.lora or {}),
        )(x)
        return nn.gelu(x, approximate=True)


def seq_shard(tokens, enabled: bool):
    """Sequence-parallel activation sharding: [B, S, D] token dim over the
    'tensor' mesh axis (GSPMD partitions per-token linears/norms and
    inserts the gathers attention needs). No-op when disabled or when no
    mesh is installed (single-chip init)."""
    if not enabled:
        return tokens
    from jax.sharding import PartitionSpec as P

    try:
        return jax.lax.with_sharding_constraint(
            tokens, P("data", "tensor", None)
        )
    except RuntimeError:
        return tokens
