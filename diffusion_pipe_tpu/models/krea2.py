"""Krea 2 model family.

Reference: models/krea2.py (297 LoC over the ComfyUI model). Structure
extracted from that wrapper:
  - single-stream flux-style blocks over [context, img] (reference
    :218-221), rope ids: text zeros, image (0, row, col) (:228-238),
    attention mask = text validity + image all-valid (:223-225)
  - text conditioning arrives as MULTIPLE Qwen3-VL-4B hidden-state layers
    packed (B, seq, txtlayers*txtdim), reshaped to (B, txtlayers, seq,
    txtdim), fused by a TextFusionTransformer, then projected by txtmlp
    (reference :209-217); LoRA targets blocks + TextFusionTransformer +
    txtmlp (reference :33-71, docstring note 38)
  - patchify linear `first`, timestep MLP `tmlp` + projection `tproj`
    feeding block modulation, final layer `last(combined, t)` (:196-207,
    :265-283); latent padded to patch multiples and cropped back
  - flow matching, raw t into the model, target noise - latents

TextFusionTransformer internals flagged for real-checkpoint verification
(implemented as learned layer mixing + self-attention refiner blocks);
dims checkpoint-configurable.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from . import register_model
from .base import BasePipeline
from .layers import (
    LoraDense,
    RMSNorm,
    apply_rope,
    layer_norm_no_affine,
    modulate,
    remat_spec,
    remat_wrap,
    rope_frequencies,
    sinusoidal_timestep_embedding,
)
from ..ops.attention import dot_product_attention
from ..training.flow import TimestepDistribution, sample_timesteps

Dtype = Any


@dataclasses.dataclass(frozen=True)
class Krea2Config:
    in_channels: int = 16
    out_channels: int = 16
    patch_size: int = 2
    hidden_size: int = 3072
    num_attention_heads: int = 24
    num_layers: int = 32
    mlp_ratio: float = 4.0
    text_dim: int = 2560          # Qwen3-VL-4B hidden
    text_layers: int = 4          # fused hidden-state layers
    fusion_layers: int = 2
    axes_dims_rope: Tuple[int, ...] = (16, 56, 56)
    rope_theta: float = 10000.0
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.bfloat16
    base_kernel_dtype: Any = None
    int8_matmul: bool = False
    lora_rank: int = 0
    lora_alpha: float = 0.0
    lora_dropout: float = 0.0
    lora_dtype: Any = jnp.float32
    lora_type: str = "lora"
    lokr_factor: int = -1
    lokr_rank_dropout: float = 0.0
    remat: bool = False
    # Exact-N blocks_to_swap (reference krea2.py:154-168 enable_block_swap
    # over the single `blocks` container)
    offload_tail: int = 0

    @property
    def swap_split(self):
        from ..parallel.offload import swap_split_of

        return swap_split_of(self.num_layers, self.offload_tail)

    @property
    def head_dim(self):
        return self.hidden_size // self.num_attention_heads

    @property
    def lora_kwargs(self):
        return dict(
            lora_rank=self.lora_rank, lora_alpha=self.lora_alpha,
            lora_dropout=self.lora_dropout, lora_dtype=self.lora_dtype,
            lora_type=self.lora_type, lokr_factor=self.lokr_factor,
            lokr_rank_dropout=self.lokr_rank_dropout,
        )

    @staticmethod
    def tiny(**kw):
        d = dict(
            in_channels=4, out_channels=4, hidden_size=32,
            num_attention_heads=4, num_layers=2, text_dim=12, text_layers=2,
            fusion_layers=1, axes_dims_rope=(4, 2, 2), dtype=jnp.float32,
            param_dtype=jnp.float32,
        )
        d.update(kw)
        return Krea2Config(**d)


class TextFusionTransformer(nn.Module):
    """Fuses per-layer LLM hidden states into one text stream.

    Internals are not public: implemented as a learned softmax mix over the
    layer axis followed by self-attention refiner blocks (LoRA-targeted,
    reference krea2.py:33-71)."""

    config: Krea2Config

    @nn.compact
    def __call__(self, ctx):
        cfg = self.config
        dd = dict(dtype=cfg.dtype, param_dtype=cfg.param_dtype)
        lora = cfg.lora_kwargs
        b, nl, s, d = ctx.shape
        w = self.param("layer_weights", nn.initializers.zeros_init(), (nl,),
                       cfg.param_dtype)
        mix = jax.nn.softmax(w.astype(jnp.float32))
        x = jnp.einsum("blsd,l->bsd", ctx.astype(jnp.float32), mix)
        x = x.astype(cfg.dtype)
        heads = max(1, d // 64)
        hd = d // heads
        for i in range(cfg.fusion_layers):
            y = RMSNorm(dtype=cfg.dtype, param_dtype=cfg.param_dtype,
                        name=f"norm1_{i}")(x)
            q = LoraDense(d, use_bias=False, name=f"q_{i}", **dd, **lora)(y)
            k = LoraDense(d, use_bias=False, name=f"k_{i}", **dd, **lora)(y)
            v = LoraDense(d, use_bias=False, name=f"v_{i}", **dd, **lora)(y)
            q = q.reshape(b, s, heads, hd)
            k = k.reshape(b, s, heads, hd)
            v = v.reshape(b, s, heads, hd)
            a = dot_product_attention(q, k, v).reshape(b, s, d)
            x = x + LoraDense(d, use_bias=False, name=f"o_{i}", **dd, **lora)(a)
            y = RMSNorm(dtype=cfg.dtype, param_dtype=cfg.param_dtype,
                        name=f"norm2_{i}")(x)
            y = LoraDense(4 * d, use_bias=False, name=f"mlp1_{i}", **dd,
                          **lora)(y)
            y = nn.gelu(y, approximate=True)
            x = x + LoraDense(d, use_bias=False, name=f"mlp2_{i}", **dd,
                              **lora)(y)
        return x


class Krea2Block(nn.Module):
    """flux-style single-stream block modulated by tvec."""

    config: Krea2Config

    @nn.compact
    def __call__(self, x, tvec, rope_cos, rope_sin, kv_mask):
        cfg = self.config
        dim = cfg.hidden_size
        heads, hd = cfg.num_attention_heads, cfg.head_dim
        mlp_dim = int(dim * cfg.mlp_ratio)
        dd = dict(dtype=cfg.dtype, param_dtype=cfg.param_dtype,
                  kernel_dtype=cfg.base_kernel_dtype,
                  int8_matmul=cfg.int8_matmul)
        lora = cfg.lora_kwargs
        b, s = x.shape[:2]

        mod = LoraDense(3 * dim, name="modulation", **dd, **lora)(
            nn.silu(tvec))
        shift, scale, gate = jnp.split(mod, 3, -1)
        x_n = modulate(layer_norm_no_affine(x), shift, scale)
        y = LoraDense(3 * dim + mlp_dim, use_bias=False, name="linear1",
                      kernel_axes=(None, "tensor"), **dd, **lora)(x_n)
        qkv, mlp = y[..., : 3 * dim], y[..., 3 * dim:]
        q, k, v = [u.reshape(b, s, heads, hd) for u in jnp.split(qkv, 3, -1)]
        rms = dict(dtype=cfg.dtype, param_dtype=cfg.param_dtype)
        q = RMSNorm(name="q_norm", **rms)(q)
        k = RMSNorm(name="k_norm", **rms)(k)
        q = apply_rope(q, rope_cos, rope_sin)
        k = apply_rope(k, rope_cos, rope_sin)
        attn = dot_product_attention(q, k, v, kv_mask).reshape(b, s, dim)
        y = LoraDense(dim, use_bias=False, name="linear2",
                      kernel_axes=("tensor", None), **dd, **lora)(
            jnp.concatenate([attn, nn.gelu(mlp, approximate=True)], -1)
        )
        return x + gate[:, None] * y, None


class Krea2Transformer(nn.Module):
    config: Krea2Config

    @nn.compact
    def __call__(self, x, t, context, text_mask):
        """x: [B, C, H, W]; t: [B] in [0,1]; context:
        [B, T, text_layers*text_dim] packed per-layer LLM states."""
        cfg = self.config
        dim = cfg.hidden_size
        p = cfg.patch_size
        dd = dict(dtype=cfg.dtype, param_dtype=cfg.param_dtype)
        b, c, hh, ww = x.shape
        gh, gw = hh // p, ww // p
        img_len = gh * gw
        tlen = context.shape[1]

        xi = x.reshape(b, c, gh, p, gw, p)
        xi = jnp.einsum("bchpwq->bhwcpq", xi).reshape(b, img_len, c * p * p)
        img = LoraDense(dim, name="first", **dd)(xi.astype(cfg.dtype))

        ctx = context.reshape(b, tlen, cfg.text_layers, cfg.text_dim)
        ctx = jnp.transpose(ctx, (0, 2, 1, 3))  # [B, layers, T, d]
        txt = TextFusionTransformer(cfg, name="txtfusion")(ctx)
        txt = LoraDense(dim, name="txtmlp_1", **dd,
                        **cfg.lora_kwargs)(txt)
        txt = LoraDense(dim, name="txtmlp_2", **dd,
                        **cfg.lora_kwargs)(nn.gelu(txt, approximate=True))

        temb = sinusoidal_timestep_embedding(
            t.astype(jnp.float32) * 1000.0, 256)
        tm = LoraDense(dim, name="tmlp_1", **dd)(temb.astype(cfg.dtype))
        tm = LoraDense(dim, name="tmlp_2", **dd)(nn.silu(tm))
        tvec = LoraDense(dim, name="tproj", **dd)(tm)

        combined = jnp.concatenate([txt, img], axis=1)
        kv_mask = jnp.concatenate(
            [text_mask.astype(jnp.int32), jnp.ones((b, img_len), jnp.int32)],
            axis=1,
        )

        txt_ids = np.zeros((tlen, 3), np.float32)
        img_ids = np.zeros((img_len, 3), np.float32)
        img_ids[:, 1] = np.repeat(np.arange(gh, dtype=np.float32), gw)
        img_ids[:, 2] = np.tile(np.arange(gw, dtype=np.float32), gh)
        ids = jnp.asarray(np.concatenate([txt_ids, img_ids], 0))
        rope_cos, rope_sin = rope_frequencies(
            ids, cfg.axes_dims_rope, cfg.rope_theta
        )

        from ..parallel.offload import apply_swap_split

        def apply_blocks(carry, length, name, streamed):
            b_cls = Krea2Block
            if streamed:
                from ..parallel.offload import stream_params_from_host

                b_cls = stream_params_from_host(b_cls)
            if cfg.remat:
                b_cls = remat_wrap(b_cls, cfg.remat)
            carry, _ = nn.scan(
                b_cls,
                variable_axes={"params": 0}, split_rngs={"params": True},
                in_axes=nn.broadcast, length=length,
                metadata_params={nn.PARTITION_NAME: "layers"},
            )(cfg, name=name)(carry, tvec, rope_cos, rope_sin, kv_mask)
            return carry

        combined = apply_swap_split(combined, cfg.swap_split, apply_blocks)

        # final layer `last(combined, t)`: adaLN from the raw time MLP
        mod = LoraDense(2 * dim, name="last_mod", **dd)(nn.silu(tm))
        shift, scale = jnp.split(mod, 2, -1)
        out = modulate(layer_norm_no_affine(combined), shift, scale)
        out = LoraDense(cfg.out_channels * p * p, name="last_linear",
                        dtype=jnp.float32, param_dtype=cfg.param_dtype)(out)
        out = out[:, tlen:tlen + img_len]
        out = out.reshape(b, gh, gw, cfg.out_channels, p, p)
        out = jnp.einsum("bhwcpq->bchpwq", out)
        return out.reshape(b, cfg.out_channels, hh, ww)


@register_model("krea2")
class Krea2Pipeline(BasePipeline):
    name = "krea2"
    cacheable_text_embeddings = ("text_embeds_0", "attention_mask_0")

    def __init__(self, config):
        super().__init__(config)
        mc = self.model_config
        self.tdist = TimestepDistribution.from_model_config(mc)
        self.krea_config = self._build_config()
        self.model = Krea2Transformer(self.krea_config)

    def _build_config(self) -> Krea2Config:
        from ..common import dtype_from_string

        mc = self.model_config
        adapter = self.config.get("adapter", {})
        kwargs: Dict[str, Any] = dict(
            dtype=dtype_from_string(mc.get("dtype", "bfloat16")),
            param_dtype=dtype_from_string(mc.get("dtype", "bfloat16")),
            base_kernel_dtype=(
                dtype_from_string(mc["transformer_dtype"])
                if mc.get("transformer_dtype") else None
            ),
            remat=remat_spec(self.config),
            int8_matmul=mc.get("int8_matmul", False),
            offload_tail=int(self.config.get("blocks_to_swap", 0) or 0),
        )
        for knob in ("hidden_size", "num_layers", "num_attention_heads",
                     "text_dim", "text_layers", "in_channels", "out_channels"):
            if mc.get(knob) is not None:
                kwargs[knob] = int(mc[knob])
        if adapter.get("type") in ("lora", "lokr"):
            kwargs.update(
                lora_rank=int(adapter["rank"]),
                lora_type=adapter["type"],
                lokr_factor=int(adapter.get("decompose_factor", -1)),
                lokr_rank_dropout=float(adapter.get("rank_dropout", 0.0)),
                lora_alpha=float(adapter["alpha"]),
                lora_dropout=float(adapter.get("dropout", 0.0)),
                lora_dtype=dtype_from_string(
                    adapter.get("dtype", mc.get("dtype", "bfloat16"))
                ),
            )
        if mc.get("_tiny", False):
            return Krea2Config.tiny(**kwargs)
        return Krea2Config(**kwargs)

    def init_params(self, rng):
        cfg = self.krea_config
        return jax.jit(self.model.init)(
            rng,
            jnp.zeros((1, cfg.in_channels, 8, 8)),
            jnp.zeros((1,)),
            jnp.zeros((1, 8, cfg.text_layers * cfg.text_dim)),
            jnp.ones((1, 8), jnp.int32),
        )

    def prepare_inputs(self, rng, batch, timestep_quantile=None):
        latents = batch["latents"].astype(jnp.float32)
        if latents.ndim == 5:
            latents = latents[:, :, 0]
        b, c, h, w = latents.shape
        mask = batch.get("mask")
        if mask is not None:
            mask = jax.image.resize(
                mask.astype(jnp.float32), (b, h, w), method="nearest"
            )[:, None]
        t_key, n_key = jax.random.split(rng)
        t = sample_timesteps(
            t_key, b, self.tdist, quantile=timestep_quantile,
            image_seq_len=(h // 2) * (w // 2),
        )
        noise = jax.random.normal(n_key, latents.shape, jnp.float32)
        t_exp = t.reshape(b, 1, 1, 1)
        x_t = (1 - t_exp) * latents + t_exp * noise
        target = noise - latents
        model_inputs = dict(
            x=x_t,
            t=t,
            context=batch["text_embeds_0"],
            text_mask=batch["attention_mask_0"].reshape(b, -1),
        )
        return model_inputs, target, mask

    def sample(self, params, width, height, key, num_steps=20,
               guidance_scale=1.0, **embeds):
        """Euler flow sampling through the training forward (reference
        CommonPipeline.sample, models/base.py:263-291). Returns latents
        [B, C, h, w] (Wan-arch image VAE, /8)."""
        from ..training.sampling import euler_flow_sample

        te = embeds["text_embeds_0"]
        b = te.shape[0]
        c = self.krea_config.in_channels
        h, w = height // 8, width // 8
        tmask = embeds["attention_mask_0"]

        def vel(x, t):
            return self.forward(params, dict(
                x=x.astype(self.krea_config.dtype),
                t=t,
                context=te,
                text_mask=tmask.reshape(b, -1),
            )).astype(jnp.float32)

        return euler_flow_sample(
            vel, (b, c, h, w), key, num_steps=num_steps,
            guidance_scale=guidance_scale,
            shift=self.model_config.get("shift"),
        )

    def make_pp_program(self):
        """Pipeline-parallel program (reference partitions any model via
        to_layers() + PipelineModule). See parallel/model_pp.py."""
        n_res, n_swap = self.krea_config.swap_split
        if 0 < n_swap < self.krea_config.num_layers:
            raise NotImplementedError(
                "partial blocks_to_swap (split block stacks) cannot be "
                "combined with pipeline_stages > 1; use blocks_to_swap >= "
                "num_layers or drop pipeline parallelism"
            )
        return _Krea2PPProgram(self)

    def host_stack_names(self):
        """Exact-N blocks_to_swap (reference krea2.py enable_block_swap)."""
        from ..parallel.offload import swap_stack_names

        return swap_stack_names((self.krea_config.swap_split,))

    def forward(self, params, model_inputs):
        return self.model.apply(params, **model_inputs)

    # --- weights ------------------------------------------------------------

    def _keymap_config(self):
        return self.krea_config

    def keymap(self):
        """Krea2 keys. Top-level module names are taken from the reference
        wrapper (models/krea2.py:22 keep_in_high_precision: first, last,
        tmlp, tproj, txtfusion, txtmlp; block container `blocks`, :84);
        blocks are ComfyUI flux SingleStreamBlocks (linear1/linear2/
        modulation.lin/norm.query_norm). TextFusionTransformer internals
        are not public — spellings flagged pending real-checkpoint
        verification. LoRA export uses the ComfyUI prefix."""
        from .keymaps import BlockGroup, KeyMap

        cfg = self.krea_config
        top_linears = {
            "first": "first",
            "tmlp_1": "tmlp.in_layer",
            "tmlp_2": "tmlp.out_layer",
            "tproj": "tproj",
            "txtmlp_1": "txtmlp.0",
            "txtmlp_2": "txtmlp.2",
            "last_mod": "last.adaLN_modulation.1",
            "last_linear": "last.linear",
        }
        top_norms = {}
        top_raw = {"txtfusion/layer_weights": "txtfusion.layer_weights"}
        for i in range(cfg.fusion_layers):
            base = f"txtfusion.blocks.{i}"
            top_linears.update({
                f"txtfusion/q_{i}": f"{base}.attn.q_proj",
                f"txtfusion/k_{i}": f"{base}.attn.k_proj",
                f"txtfusion/v_{i}": f"{base}.attn.v_proj",
                f"txtfusion/o_{i}": f"{base}.attn.o_proj",
                f"txtfusion/mlp1_{i}": f"{base}.mlp.fc1",
                f"txtfusion/mlp2_{i}": f"{base}.mlp.fc2",
            })
            top_norms.update({
                f"txtfusion/norm1_{i}": f"{base}.norm1",
                f"txtfusion/norm2_{i}": f"{base}.norm2",
            })
        from .keymaps import split_block_group

        n_res, n_swap = cfg.swap_split
        return KeyMap(
            blocks=[*split_block_group(BlockGroup(
                "blocks", "blocks", "num_layers",
                linears={
                    "modulation": "modulation.lin",
                    "linear1": "linear1",
                    "linear2": "linear2",
                },
                norms={"q_norm": "norm.query_norm",
                       "k_norm": "norm.key_norm"},
                norm_suffix="scale",
            ), n_res, n_swap)],
            top_linears=top_linears,
            top_norms=top_norms,
            top_raw=top_raw,
            lora_prefix="diffusion_model.",
        )

    def load_weights(self):
        from .keymaps import keymap_to_flax, load_sd_for_pipeline

        return keymap_to_flax(
            load_sd_for_pipeline(self), self.keymap(), self.krea_config
        )

    def get_call_vae_fn(self):
        """Krea2 uses the Qwen-Image (Wan-architecture) image VAE with
        frames=1 video-shaped latents (reference models/krea2.py:25-29,76
        is_video_vae). Tiny mode: small KL VAE, still video-shaped."""
        mc = self.model_config
        if mc.get("_tiny", False):
            return self._generic_image_vae_fn(
                tiny_latent_channels=4, video_latents=True
            )
        import jax
        import jax.numpy as jnp

        from .wan_vae_convert import load_wan_vae

        path = mc.get("vae_path") or mc.get("vae")
        vae, params = load_wan_vae(path)
        encode = jax.jit(
            lambda px: vae.apply(params, px, method=type(vae).encode)
        )

        def fn(pixels):
            if pixels.ndim == 4:
                pixels = pixels[:, :, None]  # [B,C,1,H,W]
            return {"latents": np.asarray(
                encode(jnp.asarray(pixels, jnp.float32))
            )}

        return fn

    def get_call_text_encoder_fns(self):
        mc = self.model_config
        if mc.get("_tiny", False):
            from ..data.bucketing import seed_from_hash

            cfg = self.krea_config

            def te(caps):
                embs, masks = [], []
                width = cfg.text_layers * cfg.text_dim
                for cap in caps:
                    r = np.random.default_rng(seed_from_hash(cap))
                    n = min(len(cap) + 1, 8)
                    e = np.zeros((8, width), np.float32)
                    e[:n] = r.standard_normal((n, width))
                    m = np.zeros((8,), np.int32)
                    m[:n] = 1
                    embs.append(e)
                    masks.append(m)
                return {"text_embeds_0": np.stack(embs),
                        "attention_mask_0": np.stack(masks)}

            return [te]

        # Qwen3-VL-4B: pack the LAST `text_layers` hidden-state layers
        # along the feature dim (reference krea2.py:209-216 unpack)
        from .llm_encoders import LLMTextEncoder

        cfg = self.krea_config
        enc = LLMTextEncoder(
            mc["text_encoder_path"],
            max_length=int(mc.get("max_sequence_length", 512)),
            hidden_layer=-1,
        )

        def fn(caps):
            enc._load()
            import jax.numpy as jnp_

            tok = enc._tokenizer(
                caps, padding="max_length", truncation=True,
                max_length=enc.max_length, return_tensors="np",
            )
            out, hiddens = enc._model.apply(
                enc._params, jnp_.asarray(tok["input_ids"]),
                jnp_.asarray(tok["attention_mask"]), collect_hidden=True,
            )
            sel = hiddens[-cfg.text_layers:]
            packed = np.concatenate([np.asarray(h) for h in sel], axis=-1)
            return {"text_embeds_0": packed,
                    "attention_mask_0": np.asarray(tok["attention_mask"],
                                                   np.int32)}

        return [fn]


class _Krea2PPProgram:
    """PPProgram for Krea2Transformer (see parallel/model_pp.py).
    The TextFusionTransformer + txtmlp run on stage 0.
    Payload: (combined [B,Lt+Li,D], tvec [B,D], tm [B,D] raw time MLP for
    the final layer, kv_mask)."""

    def __init__(self, pipeline):
        from ..parallel.model_pp import PPPhase

        self.pipeline = pipeline
        cfg = pipeline.krea_config
        self.cfg = cfg
        self.phases = [PPPhase("blocks", cfg.num_layers, self._apply_block)]

    def _apply_block(self, p_i, payload, ctx):
        combined, tvec, tm, kv_mask = payload
        combined, _ = Krea2Block(self.cfg).apply(
            {"params": p_i}, combined, tvec, ctx["rope_cos"],
            ctx["rope_sin"], kv_mask,
        )
        return (combined, tvec, tm, kv_mask)

    def make_ctx(self, p_rest, mi0):
        cfg = self.cfg
        p = cfg.patch_size
        _b, _c, hh, ww = mi0["x"].shape
        gh, gw = hh // p, ww // p
        img_len = gh * gw
        tlen = mi0["context"].shape[1]
        txt_ids = np.zeros((tlen, 3), np.float32)
        img_ids = np.zeros((img_len, 3), np.float32)
        img_ids[:, 1] = np.repeat(np.arange(gh, dtype=np.float32), gw)
        img_ids[:, 2] = np.tile(np.arange(gw, dtype=np.float32), gh)
        ids = jnp.asarray(np.concatenate([txt_ids, img_ids], 0))
        rope_cos, rope_sin = rope_frequencies(
            ids, cfg.axes_dims_rope, cfg.rope_theta
        )
        return {"rope_cos": rope_cos, "rope_sin": rope_sin,
                "grid": (gh, gw), "hw": (hh, ww), "tlen": tlen,
                "img_len": img_len}

    def embed(self, p_rest, mi, ctx):
        cfg = self.cfg
        dim = cfg.hidden_size
        p = cfg.patch_size
        dd = dict(dtype=cfg.dtype, param_dtype=cfg.param_dtype)
        lora = cfg.lora_kwargs
        x, context, text_mask = mi["x"], mi["context"], mi["text_mask"]
        b, c = x.shape[:2]
        gh, gw = ctx["grid"]
        img_len = ctx["img_len"]
        tlen = ctx["tlen"]

        xi = x.reshape(b, c, gh, p, gw, p)
        xi = jnp.einsum("bchpwq->bhwcpq", xi).reshape(b, img_len, c * p * p)
        img = LoraDense(dim, **dd).apply(
            {"params": p_rest["first"]}, xi.astype(cfg.dtype))

        cx = context.reshape(b, tlen, cfg.text_layers, cfg.text_dim)
        cx = jnp.transpose(cx, (0, 2, 1, 3))
        txt = TextFusionTransformer(cfg).apply(
            {"params": p_rest["txtfusion"]}, cx)
        txt = LoraDense(dim, **dd, **lora).apply(
            {"params": p_rest["txtmlp_1"]}, txt)
        txt = LoraDense(dim, **dd, **lora).apply(
            {"params": p_rest["txtmlp_2"]}, nn.gelu(txt, approximate=True))

        temb = sinusoidal_timestep_embedding(
            mi["t"].astype(jnp.float32) * 1000.0, 256)
        tm = LoraDense(dim, **dd).apply(
            {"params": p_rest["tmlp_1"]}, temb.astype(cfg.dtype))
        tm = LoraDense(dim, **dd).apply(
            {"params": p_rest["tmlp_2"]}, nn.silu(tm))
        tvec = LoraDense(dim, **dd).apply({"params": p_rest["tproj"]}, tm)

        combined = jnp.concatenate([txt, img], axis=1)
        kv_mask = jnp.concatenate(
            [text_mask.astype(jnp.int32), jnp.ones((b, img_len), jnp.int32)],
            axis=1,
        )
        return (combined, tvec, tm, kv_mask)

    def head_loss(self, p_rest, payload, target, mask, ctx):
        cfg = self.cfg
        dim = cfg.hidden_size
        p = cfg.patch_size
        dd = dict(dtype=cfg.dtype, param_dtype=cfg.param_dtype)
        gh, gw = ctx["grid"]
        hh, ww = ctx["hw"]
        combined, _tvec, tm, _kv = payload
        b = combined.shape[0]

        mod = LoraDense(2 * dim, **dd).apply(
            {"params": p_rest["last_mod"]}, nn.silu(tm))
        shift, scale = jnp.split(mod, 2, -1)
        out = modulate(layer_norm_no_affine(combined), shift, scale)
        out = LoraDense(cfg.out_channels * p * p, dtype=jnp.float32,
                        param_dtype=cfg.param_dtype).apply(
            {"params": p_rest["last_linear"]}, out)
        out = out[:, ctx["tlen"]: ctx["tlen"] + ctx["img_len"]]
        out = out.reshape(b, gh, gw, cfg.out_channels, p, p)
        out = jnp.einsum("bhwcpq->bchpwq", out).reshape(
            b, cfg.out_channels, hh, ww)
        return self.pipeline.loss_fn(out, target, mask)
