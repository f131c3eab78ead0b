"""Ideogram v4 model family.

Reference: models/ideogram4.py (351 LoC over the ComfyUI model;
fp8_scaled Comfy weights trainable per README.md:22). Structure extracted
from that wrapper:
  - single-stream transformer over [text, image] rows; image latents
    arrive pre-packed at 128 channels (16x-compression flux2 VAE,
    reference :28-29) and are tokenized per grid cell (reference :160-167)
  - text rows enter as ZEROS through input_proj, then the Qwen3-VL-8B
    features are added in place via llm_cond_norm + llm_cond_proj
    (reference :201-207); an embed_image_indicator embedding marks
    image rows (reference :209)
  - GLOBAL adaln_input = silu(adaln_proj(t_embedding(1 - t))) shared by
    all blocks (reference :196-199); per-block adaLN chunks inside blocks
  - Qwen3-VL INTERLEAVED MRoPE over 3 axes: text positions arange on all
    axes, image positions (0, h, w) + 65536 offset (reference :170-175,
    :211-216)
  - block-diagonal attention mask from segment ids == key-validity
    masking for valid rows (reference :177-183)
  - final adaLN layer, output NEGATED (reference :258-263), target
    noise - latents => effective prediction latents - noise

Block FFN layout is grounded in the reference keep-list: `mlp_in` appears
verbatim in keep_in_high_precision (reference :26), and keep-list strings
are substring-matched against real parameter names (reference base.py:539)
— so blocks carry a flat mlp_in/mlp_out pair (GLU-vs-plain and the hidden
width shape-discovered at load). Attention spellings (q/k/v/o + q/k RMS
norm) remain flagged for real-checkpoint verification; dims are
checkpoint-configurable.
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
    sinusoidal_timestep_embedding,
)
from ..ops.attention import dot_product_attention
from ..training.flow import TimestepDistribution, sample_timesteps

Dtype = Any

IMAGE_POSITION_OFFSET = 65536


def interleaved_mrope_frequencies(ids, sections: Tuple[int, ...],
                                  theta: float):
    """Qwen3-VL interleaved MRoPE tables.

    ids: [S, 3] positions per axis. Frequency pairs are assigned to axes
    round-robin (t, h, w, t, h, w, ...) until each axis's section budget is
    exhausted (comfy precompute_freqs_cis(interleaved_mrope=True)).
    Returns (cos, sin) of shape [S, sum(sections)] for apply_rope.
    """
    total = sum(sections)
    counts = [0, 0, 0]
    axis_of = []
    i = 0
    while len(axis_of) < total:
        ax = i % 3
        if counts[ax] < sections[ax]:
            axis_of.append(ax)
            counts[ax] += 1
        i += 1
    axis_of = np.asarray(axis_of)  # [total]
    freqs = 1.0 / (theta ** (np.arange(total, dtype=np.float32) * 2.0 / (2 * total)))
    pos = ids.astype(jnp.float32)[:, axis_of]  # [S, total]
    angles = pos * jnp.asarray(freqs)[None, :]
    return jnp.cos(angles), jnp.sin(angles)


@dataclasses.dataclass(frozen=True)
class Ideogram4Config:
    latent_dim: int = 128         # packed flux2-VAE channels
    hidden_size: int = 3072
    num_attention_heads: int = 24
    num_layers: int = 30
    mlp_ratio: float = 4.0
    # Block FFN: a flat mlp_in/mlp_out pair (the reference keep-list names
    # `mlp_in` verbatim, models/ideogram4.py:26 — keep-list strings are
    # substring-matched against real param names, base.py:539, so upstream
    # blocks carry a direct `mlp_in` child, not a nested mlp.gate_proj).
    # mlp_glu=True: mlp_in -> [gate|up] (2*mlp_hidden), silu(g)*u, mlp_out;
    # mlp_glu=False: mlp_in -> mlp_hidden, gelu, mlp_out. Both variants are
    # shape-discovered from the checkpoint at load (load_weights).
    mlp_glu: bool = True
    mlp_hidden: int = 0           # 0 -> hidden_size * mlp_ratio
    text_dim: int = 4096          # Qwen3-VL-8B hidden
    mrope_section: Tuple[int, ...] = (24, 20, 20)
    rope_theta: float = 5000000.0
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
    # Exact-N blocks_to_swap (reference ideogram4.py enable_block_swap
    # over the single `layers` container)
    offload_tail: int = 0

    @property
    def swap_split(self):
        from ..parallel.offload import swap_split_of

        return swap_split_of(self.num_layers, self.offload_tail)

    @property
    def head_dim(self):
        return self.hidden_size // self.num_attention_heads

    @property
    def mlp_dim(self):
        return self.mlp_hidden or int(self.hidden_size * self.mlp_ratio)

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
            latent_dim=16, hidden_size=32, num_attention_heads=4,
            num_layers=2, text_dim=24, mrope_section=(2, 1, 1),
            dtype=jnp.float32, param_dtype=jnp.float32,
        )
        d.update(kw)
        return Ideogram4Config(**d)


class Ideogram4Block(nn.Module):
    config: Ideogram4Config

    @nn.compact
    def __call__(self, x, adaln_input, rope_cos, rope_sin, kv_mask):
        cfg = self.config
        dim = cfg.hidden_size
        heads, hd = cfg.num_attention_heads, cfg.head_dim
        dd = dict(dtype=cfg.dtype, param_dtype=cfg.param_dtype,
                  kernel_dtype=cfg.base_kernel_dtype,
                  int8_matmul=cfg.int8_matmul)
        lora = cfg.lora_kwargs
        b, s = x.shape[:2]

        mods = LoraDense(6 * dim, name="adaLN_linear", **dd, **lora)(
            adaln_input)
        s_msa, sc_msa, g_msa, s_mlp, sc_mlp, g_mlp = jnp.split(mods, 6, -1)

        y = modulate(layer_norm_no_affine(x), s_msa, sc_msa)
        q = LoraDense(dim, use_bias=False, name="attn_q",
                      kernel_axes=(None, "tensor"), **dd, **lora)(y)
        k = LoraDense(dim, use_bias=False, name="attn_k",
                      kernel_axes=(None, "tensor"), **dd, **lora)(y)
        v = LoraDense(dim, use_bias=False, name="attn_v",
                      kernel_axes=(None, "tensor"), **dd, **lora)(y)
        q = q.reshape(b, s, heads, hd)
        k = k.reshape(b, s, heads, hd)
        v = v.reshape(b, s, heads, hd)
        rms = dict(dtype=cfg.dtype, param_dtype=cfg.param_dtype)
        q = RMSNorm(name="attn_q_norm", **rms)(q)
        k = RMSNorm(name="attn_k_norm", **rms)(k)
        q = apply_rope(q, rope_cos, rope_sin)
        k = apply_rope(k, rope_cos, rope_sin)
        attn = dot_product_attention(q, k, v, kv_mask).reshape(b, s, dim)
        attn = LoraDense(dim, use_bias=False, name="attn_out",
                         kernel_axes=("tensor", None), **dd, **lora)(attn)
        x = x + g_msa[:, None] * attn

        y = modulate(layer_norm_no_affine(x), s_mlp, sc_mlp)
        # mlp_in stays HIGH precision under fp8 storage: the reference
        # keep-list (models/ideogram4.py:26) excludes it from the fp8 cast
        # alongside the embedders/final layer.
        hp = dict(dtype=cfg.dtype, param_dtype=cfg.param_dtype)
        mlp_out_dim = cfg.mlp_dim * (2 if cfg.mlp_glu else 1)
        y = LoraDense(mlp_out_dim, use_bias=False, name="mlp_in",
                      kernel_axes=(None, "tensor"), **hp, **lora)(y)
        if cfg.mlp_glu:
            gate, up = jnp.split(y, 2, axis=-1)
            y = nn.silu(gate) * up
        else:
            y = nn.gelu(y)
        y = LoraDense(dim, use_bias=False, name="mlp_out",
                      kernel_axes=("tensor", None), **dd, **lora)(y)
        return x + g_mlp[:, None] * y, None


class Ideogram4Transformer(nn.Module):
    config: Ideogram4Config

    @nn.compact
    def __call__(self, x, t, text_embeds, text_mask):
        """x: [B, latent_dim, gh, gw] packed latents; t: [B] ALREADY the
        model time (1 - noise level); text_embeds: [B, T, text_dim]."""
        cfg = self.config
        dim = cfg.hidden_size
        dd = dict(dtype=cfg.dtype, param_dtype=cfg.param_dtype)
        b, c, gh, gw = x.shape
        img_len = gh * gw
        tlen = text_embeds.shape[1]

        img_tokens = jnp.transpose(x, (0, 2, 3, 1)).reshape(b, img_len, c)
        # text rows are zero through input_proj (reference :192-201)
        full = jnp.concatenate(
            [jnp.zeros((b, tlen, c), x.dtype), img_tokens], axis=1
        )
        h = LoraDense(dim, name="input_proj", **dd)(full.astype(cfg.dtype))

        llm = RMSNorm(dtype=cfg.dtype, param_dtype=cfg.param_dtype,
                      name="llm_cond_norm")(text_embeds.astype(cfg.dtype))
        llm = LoraDense(dim, name="llm_cond_proj", **dd)(llm)
        llm = llm * text_mask.astype(cfg.dtype)[..., None]
        h = h.at[:, :tlen].add(llm)

        is_image = jnp.concatenate(
            [jnp.zeros((b, tlen), jnp.int32), jnp.ones((b, img_len), jnp.int32)],
            axis=1,
        )
        h = h + nn.Embed(2, dim, name="embed_image_indicator",
                         param_dtype=cfg.param_dtype, dtype=cfg.dtype)(is_image)

        temb = sinusoidal_timestep_embedding(t.astype(jnp.float32) * 1000.0, 256)
        te = LoraDense(dim, name="t_embedding_1", **dd)(temb.astype(cfg.dtype))
        te = LoraDense(dim, name="t_embedding_2", **dd)(nn.silu(te))
        adaln_input = nn.silu(LoraDense(dim, name="adaln_proj", **dd)(te))

        # interleaved MRoPE ids (reference :170-175 + NativeWrapper comment)
        text_pos = np.tile(np.arange(tlen, dtype=np.float32)[:, None], (1, 3))
        hi = np.repeat(np.arange(gh, dtype=np.float32), gw)
        wi = np.tile(np.arange(gw, dtype=np.float32), gh)
        img_pos = np.stack([np.zeros_like(hi), hi, wi], -1) + IMAGE_POSITION_OFFSET
        ids = jnp.asarray(np.concatenate([text_pos, img_pos], axis=0))
        rope_cos, rope_sin = interleaved_mrope_frequencies(
            ids, cfg.mrope_section, cfg.rope_theta
        )

        kv_mask = jnp.concatenate(
            [text_mask.astype(jnp.int32), jnp.ones((b, img_len), jnp.int32)],
            axis=1,
        )

        from ..parallel.offload import apply_swap_split

        def apply_blocks(carry, length, name, streamed):
            b_cls = Ideogram4Block
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
            )(cfg, name=name)(carry, adaln_input, rope_cos, rope_sin,
                              kv_mask)
            return carry

        h = apply_swap_split(h, cfg.swap_split, apply_blocks, base="layers")

        mod = LoraDense(2 * dim, name="final_mod", **dd)(adaln_input)
        shift, scale = jnp.split(mod, 2, -1)
        h = modulate(layer_norm_no_affine(h), shift, scale)
        out = LoraDense(cfg.latent_dim, name="final_linear",
                        dtype=jnp.float32, param_dtype=cfg.param_dtype)(h)
        out = out[:, tlen:]
        # reference negates the model output (ideogram4.py:258-263)
        out = -out
        return jnp.transpose(out.reshape(b, gh, gw, c), (0, 3, 1, 2))


@register_model("ideogram4")
class Ideogram4Pipeline(BasePipeline):
    name = "ideogram4"
    cacheable_text_embeddings = ("text_embeds_0", "attention_mask_0")

    def __init__(self, config):
        super().__init__(config)
        mc = self.model_config
        self.tdist = TimestepDistribution.from_model_config(mc)
        self.ideo_config = self._build_config()
        self.model = Ideogram4Transformer(self.ideo_config)

    def _build_config(self) -> Ideogram4Config:
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
                     "text_dim", "latent_dim", "mlp_hidden"):
            if mc.get(knob) is not None:
                kwargs[knob] = int(mc[knob])
        if mc.get("mlp_glu") is not None:
            kwargs["mlp_glu"] = bool(mc["mlp_glu"])
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
            return Ideogram4Config.tiny(**kwargs)
        return Ideogram4Config(**kwargs)

    def init_params(self, rng):
        cfg = self.ideo_config
        return jax.jit(self.model.init)(
            rng,
            jnp.zeros((1, cfg.latent_dim, 4, 4)),
            jnp.zeros((1,)),
            jnp.zeros((1, 8, cfg.text_dim)),
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
            image_seq_len=h * w,
        )
        noise = jax.random.normal(n_key, latents.shape, jnp.float32)
        t_exp = t.reshape(b, 1, 1, 1)
        x_t = (1 - t_exp) * latents + t_exp * noise
        target = noise - latents
        model_inputs = dict(
            x=x_t,
            t=1.0 - t,  # reference ideogram4.py:155
            text_embeds=batch["text_embeds_0"],
            text_mask=batch["attention_mask_0"].reshape(b, -1),
        )
        return model_inputs, target, mask

    def sample(self, params, width, height, key, num_steps=20,
               guidance_scale=1.0, **embeds):
        """Euler flow sampling through the training forward (reference
        CommonPipeline.sample, models/base.py:263-291). Returns latents in
        the cached convention: [B, latent_dim, H/16, W/16] (flux2-VAE 32ch
        at /8, 2x2 channel-packed). Model time input is 1 - t (reference
        ideogram4.py:155)."""
        from ..training.sampling import euler_flow_sample

        te = embeds["text_embeds_0"]
        b = te.shape[0]
        c = self.ideo_config.latent_dim
        h, w = height // 16, width // 16
        tmask = embeds["attention_mask_0"]

        def vel(x, t):
            return self.forward(params, dict(
                x=x.astype(self.ideo_config.dtype),
                t=1.0 - t,
                text_embeds=te,
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
        n_res, n_swap = self.ideo_config.swap_split
        if 0 < n_swap < self.ideo_config.num_layers:
            raise NotImplementedError(
                "partial blocks_to_swap (split block stacks) cannot be "
                "combined with pipeline_stages > 1; use blocks_to_swap >= "
                "num_layers or drop pipeline parallelism"
            )
        return _Ideogram4PPProgram(self)

    def host_stack_names(self):
        """Exact-N blocks_to_swap (reference ideogram4 enable_block_swap)."""
        from ..parallel.offload import swap_stack_names

        return swap_stack_names((self.ideo_config.swap_split,),
                                ("layers",))

    def forward(self, params, model_inputs):
        return self.model.apply(params, **model_inputs)

    # --- weights ------------------------------------------------------------

    def _keymap_config(self):
        return self.ideo_config

    def keymap(self):
        """Ideogram4 DiT keys. Top-level module names are taken from the
        reference wrapper (models/ideogram4.py:26 keep_in_high_precision:
        input_proj, llm_cond_norm, llm_cond_proj, t_embedding, adaln_proj,
        embed_image_indicator, final_layer; block container `layers`, :38).
        The block FFN is a flat mlp_in/mlp_out pair — `mlp_in` appears
        verbatim in the keep-list, which is substring-matched against real
        param names (reference base.py:539), ruling out a nested
        mlp.gate_proj layout; mlp_out is the symmetric inverse projection.
        GLU-vs-plain and the hidden width are shape-discovered from the
        checkpoint at load (load_weights). Attention spellings follow the
        LLM q/k/v/o convention (the wrapper reuses Qwen3-VL MRoPE naming:
        head_dim/rope_theta/mrope_section, reference :219-222) and remain
        flagged pending real-checkpoint verification. LoRA export uses the
        ComfyUI prefix."""
        from .keymaps import BlockGroup, KeyMap, split_block_group

        n_res, n_swap = self.ideo_config.swap_split

        return KeyMap(
            blocks=[*split_block_group(BlockGroup(
                "layers", "layers", "num_layers",
                linears={
                    "adaLN_linear": "adaln_linear",
                    "attn_q": "attn.q_proj",
                    "attn_k": "attn.k_proj",
                    "attn_v": "attn.v_proj",
                    "attn_out": "attn.o_proj",
                    "mlp_in": "mlp_in",
                    "mlp_out": "mlp_out",
                },
                norms={"attn_q_norm": "attn.q_norm",
                       "attn_k_norm": "attn.k_norm"},
            ), n_res, n_swap)],
            top_linears={
                "input_proj": "input_proj",
                "llm_cond_proj": "llm_cond_proj",
                "t_embedding_1": "t_embedding.linear_1",
                "t_embedding_2": "t_embedding.linear_2",
                "adaln_proj": "adaln_proj",
                "final_mod": "final_layer.adaLN_modulation.1",
                "final_linear": "final_layer.linear",
            },
            top_norms={"llm_cond_norm": "llm_cond_norm"},
            top_raw={"embed_image_indicator/embedding":
                     "embed_image_indicator.weight"},
            lora_prefix="diffusion_model.",
        )

    def load_weights(self):
        from .keymaps import (
            keymap_to_flax,
            load_sd_for_pipeline,
            strip_known_prefixes,
        )

        sd = load_sd_for_pipeline(self)
        stripped = strip_known_prefixes(sd, self.keymap())
        # Shape-discover the FFN variant: torch mlp_in.weight is [O, I],
        # mlp_out.weight is [dim, mlp_hidden]. O == 2*mlp_hidden means a
        # fused-GLU mlp_in (gate|up halves); O == mlp_hidden means a plain
        # activation MLP.
        win = stripped.get("layers.0.mlp_in.weight")
        wout = stripped.get("layers.0.mlp_out.weight")
        if win is not None and wout is not None:
            mlp_hidden = int(wout.shape[1])
            mlp_glu = int(win.shape[0]) == 2 * mlp_hidden
            if not mlp_glu and int(win.shape[0]) != mlp_hidden:
                raise ValueError(
                    f"ideogram4 mlp_in/mlp_out shapes inconsistent: "
                    f"{win.shape} vs {wout.shape}"
                )
            if (mlp_glu != self.ideo_config.mlp_glu
                    or mlp_hidden != self.ideo_config.mlp_dim):
                self.ideo_config = dataclasses.replace(
                    self.ideo_config, mlp_glu=mlp_glu, mlp_hidden=mlp_hidden
                )
                self.model = Ideogram4Transformer(self.ideo_config)
        return keymap_to_flax(sd, self.keymap(), self.ideo_config)

    def get_call_vae_fn(self):
        """Ideogram4 uses the flux2 VAE (docs/supported_models.md:608);
        universal KL loader. Latents cache unpacked [B, 32, H, W]; packing
        happens in prepare_inputs."""
        return self._generic_image_vae_fn(tiny_latent_channels=4)

    def get_call_text_encoder_fns(self):
        mc = self.model_config
        if mc.get("_tiny", False):
            from ..data.bucketing import seed_from_hash

            cfg = self.ideo_config

            def te(caps):
                embs, masks = [], []
                for cap in caps:
                    r = np.random.default_rng(seed_from_hash(cap))
                    n = min(len(cap) + 1, 8)
                    e = np.zeros((8, cfg.text_dim), np.float32)
                    e[:n] = r.standard_normal((n, cfg.text_dim))
                    m = np.zeros((8,), np.int32)
                    m[:n] = 1
                    embs.append(e)
                    masks.append(m)
                return {"text_embeds_0": np.stack(embs),
                        "attention_mask_0": np.stack(masks)}

            return [te]

        # Qwen3-VL-8B text tower, final hidden states
        from .llm_encoders import LLMTextEncoder

        enc = LLMTextEncoder(
            mc["text_encoder_path"],
            max_length=int(mc.get("max_sequence_length", 512)),
            hidden_layer=-1,
        )

        def fn(caps):
            h, m = enc.encode(caps)
            return {"text_embeds_0": h, "attention_mask_0": m.astype(np.int32)}

        return [fn]


class _Ideogram4PPProgram:
    """PPProgram for Ideogram4Transformer (see parallel/model_pp.py).
    Payload: (h [B,Lt+Li,D], adaln_input [B,D], kv_mask)."""

    def __init__(self, pipeline):
        from ..parallel.model_pp import PPPhase

        self.pipeline = pipeline
        cfg = pipeline.ideo_config
        self.cfg = cfg
        self.phases = [PPPhase("layers", cfg.num_layers, self._apply_block)]

    def _apply_block(self, p_i, payload, ctx):
        h, adaln, kv_mask = payload
        h, _ = Ideogram4Block(self.cfg).apply(
            {"params": p_i}, h, adaln, ctx["rope_cos"], ctx["rope_sin"],
            kv_mask,
        )
        return (h, adaln, kv_mask)

    def make_ctx(self, p_rest, mi0):
        cfg = self.cfg
        _b, c, gh, gw = mi0["x"].shape
        tlen = mi0["text_embeds"].shape[1]
        text_pos = np.tile(
            np.arange(tlen, dtype=np.float32)[:, None], (1, 3))
        hi = np.repeat(np.arange(gh, dtype=np.float32), gw)
        wi = np.tile(np.arange(gw, dtype=np.float32), gh)
        img_pos = np.stack(
            [np.zeros_like(hi), hi, wi], -1) + IMAGE_POSITION_OFFSET
        ids = jnp.asarray(np.concatenate([text_pos, img_pos], axis=0))
        rope_cos, rope_sin = interleaved_mrope_frequencies(
            ids, cfg.mrope_section, cfg.rope_theta
        )
        return {"rope_cos": rope_cos, "rope_sin": rope_sin,
                "grid": (gh, gw), "tlen": tlen}

    def embed(self, p_rest, mi, ctx):
        cfg = self.cfg
        dim = cfg.hidden_size
        dd = dict(dtype=cfg.dtype, param_dtype=cfg.param_dtype)
        x, text_embeds, text_mask = mi["x"], mi["text_embeds"], mi["text_mask"]
        b, c, gh, gw = x.shape
        img_len = gh * gw
        tlen = ctx["tlen"]

        img_tokens = jnp.transpose(x, (0, 2, 3, 1)).reshape(b, img_len, c)
        full = jnp.concatenate(
            [jnp.zeros((b, tlen, c), x.dtype), img_tokens], axis=1)
        h = LoraDense(dim, **dd).apply(
            {"params": p_rest["input_proj"]}, full.astype(cfg.dtype))

        llm = RMSNorm(dtype=cfg.dtype, param_dtype=cfg.param_dtype).apply(
            {"params": p_rest["llm_cond_norm"]},
            text_embeds.astype(cfg.dtype))
        llm = LoraDense(dim, **dd).apply(
            {"params": p_rest["llm_cond_proj"]}, llm)
        llm = llm * text_mask.astype(cfg.dtype)[..., None]
        h = h.at[:, :tlen].add(llm)

        is_image = jnp.concatenate(
            [jnp.zeros((b, tlen), jnp.int32),
             jnp.ones((b, img_len), jnp.int32)], axis=1)
        ind = jnp.asarray(
            p_rest["embed_image_indicator"]["embedding"], cfg.dtype)
        h = h + ind[is_image]

        temb = sinusoidal_timestep_embedding(
            mi["t"].astype(jnp.float32) * 1000.0, 256)
        te = LoraDense(dim, **dd).apply(
            {"params": p_rest["t_embedding_1"]}, temb.astype(cfg.dtype))
        te = LoraDense(dim, **dd).apply(
            {"params": p_rest["t_embedding_2"]}, nn.silu(te))
        adaln = nn.silu(LoraDense(dim, **dd).apply(
            {"params": p_rest["adaln_proj"]}, te))

        kv_mask = jnp.concatenate(
            [text_mask.astype(jnp.int32), jnp.ones((b, img_len), jnp.int32)],
            axis=1,
        )
        return (h, adaln, kv_mask)

    def head_loss(self, p_rest, payload, target, mask, ctx):
        cfg = self.cfg
        dim = cfg.hidden_size
        dd = dict(dtype=cfg.dtype, param_dtype=cfg.param_dtype)
        gh, gw = ctx["grid"]
        h, adaln, _kv = payload
        b = h.shape[0]

        mod = LoraDense(2 * dim, **dd).apply(
            {"params": p_rest["final_mod"]}, adaln)
        shift, scale = jnp.split(mod, 2, -1)
        hn = modulate(layer_norm_no_affine(h), shift, scale)
        out = LoraDense(cfg.latent_dim, dtype=jnp.float32,
                        param_dtype=cfg.param_dtype).apply(
            {"params": p_rest["final_linear"]}, hn)
        out = -out[:, ctx["tlen"]:]
        out = jnp.transpose(
            out.reshape(b, gh, gw, cfg.latent_dim), (0, 3, 1, 2))
        return self.pipeline.loss_fn(out, target, mask)
