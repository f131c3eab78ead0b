"""Wan 2.1/2.2 pipeline adapter: training inputs, weights, caching encoders.

Re-implements the training semantics of reference models/wan/wan.py:
- prepare_inputs (wan.py:334-372): flow matching with the shifted-then-
  truncated t distribution (min_t/max_t for Wan2.2 dual-model ranges),
  t scaled to [0,1000] for the model, mask resized to latent spatial dims.
- i2v conditioning (wan.py:280-316 + 458-504): the VAE-encoded
  first-frame-only clip `y` plus a 4-channel first-frame mask concatenated
  to x_t (in_dim 36), CLIP-vision context through img_emb.
- variant dispatch (wan.py:112-176): t2v/i2v/flf2v/ti2v configs by
  dim/layers; framerate 16 (24 for ti2v/SkyReels).
- official checkpoint conversion (blocks.N.self_attn.q -> stacked scan
  params) in convert_wan_weights.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..training.flow import TimestepDistribution, sample_timesteps
from . import register_model
from .base import BasePipeline
from .wan_model import WanConfig, WanTransformer
from .weights import linear, norm_scale, stack_layers
from .layers import remat_spec

WAN_VARIANTS = {
    "t2v-1.3b": dict(dim=1536, ffn_dim=8960, num_heads=12, num_layers=30),
    "t2v-14b": dict(dim=5120, ffn_dim=13824, num_heads=40, num_layers=40),
    "i2v-14b": dict(dim=5120, ffn_dim=13824, num_heads=40, num_layers=40,
                    model_type="i2v", in_dim=36),
    "ti2v-5b": dict(dim=3072, ffn_dim=14336, num_heads=24, num_layers=30,
                    model_type="ti2v", in_dim=48, out_dim=48,
                    patch_size=(1, 2, 2)),
    # Wan2.2 I2V A14B (no CLIP k_img branch)
    "i2v-a14b": dict(dim=5120, ffn_dim=13824, num_heads=40, num_layers=40,
                     model_type="i2v_v2", in_dim=36),
}


def autodetect_wan_variant(ckpt_dir: str):
    """Variant autodetect from a checkpoint dir (reference
    models/wan/wan.py:95-176): reads config.json model_type+dim, sniffs
    weight keys for the Wan2.2 i2v split, and flags SkyReels (24 FPS) by
    directory name. Returns (variant_key, skyreels)."""
    import json as _json
    from pathlib import Path as _Path

    d = _Path(ckpt_dir)
    cfg_path = d / "config.json"
    if not cfg_path.exists() and (d / "low_noise_model" / "config.json").exists():
        cfg_path = d / "low_noise_model" / "config.json"
    with open(cfg_path) as f:
        jc = _json.load(f)
    model_type, dim = jc["model_type"], jc["dim"]
    skyreels = "skyreels" in d.name.lower()
    if model_type == "t2v":
        variant = "t2v-1.3b" if dim == 1536 else "t2v-14b"
    elif model_type == "i2v":
        has_k_img = True
        shards = sorted(d.glob("*.safetensors")) or sorted(
            d.glob("**/*.safetensors"))
        if shards:
            from safetensors import safe_open

            keys = set()
            for shard in shards:
                with safe_open(str(shard), framework="np") as f:
                    keys.update(f.keys())
            has_k_img = any("cross_attn.k_img." in k for k in keys)
        variant = "i2v-14b" if has_k_img else "i2v-a14b"
    elif model_type == "flf2v":
        variant = "i2v-14b"
    elif model_type == "ti2v":
        variant = "ti2v-5b"
    else:
        raise RuntimeError(f"Unknown wan model_type {model_type!r}")
    return variant, skyreels


@register_model("wan", "wan21", "wan22")
class WanPipeline(BasePipeline):
    name = "wan"
    cacheable_text_embeddings = ("text_embeddings",)

    def __init__(self, config):
        super().__init__(config)
        mc = self.model_config
        self.tdist = TimestepDistribution.from_model_config(mc)
        self._skyreels = False
        self.wan_config = self._build_wan_config()
        self.model = WanTransformer(self.wan_config)
        # reference wan.py: framerate 16; 24 for SkyReels V2 and ti2v
        self.framerate = (
            24 if (self.wan_config.model_type == "ti2v" or self._skyreels)
            else 16
        )
        if self._skyreels:
            # distinct cache name (reference wan.py:122-124, 142-143)
            self.name = ("skyreels_v2_i2v" if self.is_i2v else "skyreels_v2")
        elif self.wan_config.model_type == "ti2v":
            # ti2v caches through the Wan2.2 VAE (48ch, 16x): its latents
            # must not share a cache dir with the 2.1-VAE variants
            self.name = "wan_ti2v"
        # cache_text_embeddings=false (reference wan.py:77, 338-342, 442-447):
        # captions are NOT pre-encoded; the frozen UMT5 runs inside the train
        # step (the reference runs it in InitialLayer), enabling per-step
        # caption shuffling/dropout at the cost of keeping T5 resident.
        self.cache_text = bool(mc.get("cache_text_embeddings", True))
        if not self.cache_text:
            self.cacheable_text_embeddings = ()
            self.pass_captions_to_batch = True

    @property
    def is_i2v(self) -> bool:
        return self.wan_config.model_type in ("i2v", "flf2v", "i2v_v2")

    @property
    def uses_clip(self) -> bool:
        return self.wan_config.model_type in ("i2v", "flf2v")

    def _build_wan_config(self) -> WanConfig:
        from ..common import dtype_from_string

        mc = self.model_config
        adapter = self.config.get("adapter", {})
        kwargs: Dict[str, Any] = dict(
            dtype=dtype_from_string(mc.get("dtype", "bfloat16")),
            param_dtype=dtype_from_string(mc.get("dtype", "bfloat16")),
            base_kernel_dtype=(
                dtype_from_string(mc["transformer_dtype"])
                if mc.get("transformer_dtype")
                else None
            ),
            remat=remat_spec(self.config),
            int8_matmul=mc.get("int8_matmul", False),
            sequence_sharding=bool(
                self.config.get("sequence_sharding", False)),
        )
        # blocks_to_swap N: the deepest N blocks stream from host RAM
        # (reference utils/offloading.py:184 swaps exactly N); >= num_layers
        # streams the whole stack. Clamping happens in WanConfig.swap_split
        # once the variant's num_layers is known.
        kwargs["offload_tail"] = int(
            self.config.get("blocks_to_swap", 0) or 0)
        # Partial-swap saved-activation placement override
        # (swap_activation_checkpointing; see the offload_attn NOTE below)
        swap_remat = self.config.get("swap_activation_checkpointing")
        kwargs["stream_prefetch"] = self.config.get("stream_prefetch", False)
        if swap_remat is not None and kwargs["stream_prefetch"]:
            # the prefetch scan always full-recomputes with x-only
            # residuals, so a per-stack remat spec cannot apply there
            # (round-4 advisor). An explicit swap_activation_checkpointing
            # falls back to the nn.scan streaming path that honors it —
            # unless stream_prefetch is ALSO explicit, in which case
            # prefetch wins and the remat spec is declared ignored.
            import warnings

            if "stream_prefetch" in self.config:
                warnings.warn(
                    "swap_activation_checkpointing is ignored while "
                    "stream_prefetch = true: the prefetch scan uses its "
                    "own full-recompute schedule.", stacklevel=2,
                )
            else:
                warnings.warn(
                    "swap_activation_checkpointing is set: disabling "
                    "stream_prefetch for this run (the prefetch scan "
                    "uses its own full-recompute schedule). Set "
                    "stream_prefetch = true explicitly to keep prefetch "
                    "and ignore the remat spec instead.", stacklevel=2,
                )
                kwargs["stream_prefetch"] = False
        # NOTE: swap_remat used to auto-default to "offload_attn" under
        # remat="attn" (the round-3 fragmentation fix), but the XLA TPU
        # host-offload legalizer CRASHES on that program when the nn.scan
        # streaming path is active (host_offload_utils.cc Check failed:
        # operand_count() == 1 on a variadic reduce feeding the
        # host-saved attention buffers) — measured on fp8 swap=28 @480px.
        # The dial stays available explicitly (it works under
        # stream_prefetch=true, whose backward ignores it anyway); the
        # default keeps the main remat spec.
        kwargs["swap_remat"] = str(swap_remat) if swap_remat else ""
        if adapter.get("type") in ("lora", "lokr"):
            # only adapter factors are trainable in a streamed stack: the
            # prefetch backward skips real grads for frozen base leaves
            kwargs["stream_grad_leaves"] = (
                "lora_a", "lora_b", "lokr_w1", "lokr_w2",
                "lokr_w2_a", "lokr_w2_b",
            )
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
            vt = mc.get("variant_type", "t2v")
            # tiny ti2v matches the tiny Wan2.2 VAE (z_dim=8)
            in_dim = {"i2v": 36, "ti2v": 8}.get(vt, 16)
            return WanConfig.tiny(
                model_type=vt, in_dim=in_dim,
                out_dim=8 if vt == "ti2v" else 16,
                **kwargs,
            )
        variant = mc.get("variant")
        if variant is None and mc.get("ckpt_path"):
            variant, self._skyreels = autodetect_wan_variant(mc["ckpt_path"])
        elif variant is None:
            variant = "t2v-1.3b"
        if mc.get("skyreels"):
            self._skyreels = True
        if variant not in WAN_VARIANTS:
            raise NotImplementedError(f"wan variant {variant!r}")
        if mc.get("num_layers"):  # depth override (per-block microbenches)
            kwargs["num_layers"] = int(mc["num_layers"])
        return WanConfig(**{**WAN_VARIANTS[variant], **kwargs})

    def build_model(self):
        return self.model

    def init_params(self, rng):
        cfg = self.wan_config
        b, f, h, w = 1, 1, 8, 8
        x = jnp.zeros((b, cfg.in_dim, f, h, w), cfg.dtype)
        t = jnp.zeros((b,), jnp.float32)
        ctx = jnp.zeros((b, cfg.text_len, cfg.text_dim), cfg.dtype)
        clip_fea = (
            jnp.zeros((b, 257, 1280), cfg.dtype) if self.uses_clip else None
        )
        return jax.jit(self.model.init)(rng, x, t, ctx, clip_fea)

    # --- uncached text path (cache_text_embeddings = false) -----------------

    def _t5_encoder(self):
        """(UMT5Encoder, params) for the in-graph text path; params stay out
        of the train state (frozen by construction, like the reference's
        requires_grad=False T5 in InitialLayer, wan.py:442-447)."""
        if getattr(self, "_t5", None) is None:
            from .umt5 import UMT5Config, UMT5Encoder

            mc = self.model_config
            if mc.get("_tiny", False):
                cfg = UMT5Config.tiny()
                enc = UMT5Encoder(cfg)
                params = enc.init(
                    jax.random.PRNGKey(7),
                    jnp.zeros((1, 4), jnp.int32),
                    jnp.ones((1, 4), jnp.int32),
                )
            else:
                from .umt5 import convert_umt5_comfy
                from .weights import load_safetensors_dir

                cfg = UMT5Config.xxl()
                enc = UMT5Encoder(cfg)
                params = convert_umt5_comfy(
                    load_safetensors_dir(mc["llm_path"]), cfg
                )
                if mc.get("text_encoder_fp8"):
                    # reference wan/wan.py:188-191: 2-D T5 weights (except
                    # embeddings/relpos) stored float8_e4m3fn
                    from .text_encoders import cast_te_params_fp8

                    params = cast_te_params_fp8(params)
            self._t5 = (enc, params)
        return self._t5

    def _tokenize_t5(self, captions):
        mc = self.model_config
        n = self.wan_config.text_len
        if mc.get("_tiny", False):
            ids = np.zeros((len(captions), n), np.int32)
            mask = np.zeros((len(captions), n), np.int32)
            for i, c in enumerate(captions):
                toks = [ord(ch) % 128 for ch in str(c)[: n - 1]] + [1]
                ids[i, : len(toks)] = toks
                mask[i, : len(toks)] = 1
            return ids, mask
        if getattr(self, "_t5_tok", None) is None:
            from transformers import AutoTokenizer

            self._t5_tok = AutoTokenizer.from_pretrained(
                mc.get("llm_tokenizer_path", mc["llm_path"])
            )
        t = self._t5_tok(
            [str(c) for c in captions], padding="max_length",
            truncation=True, max_length=n, return_tensors="np",
        )
        return (t["input_ids"].astype(np.int32),
                t["attention_mask"].astype(np.int32))

    def host_prepare(self, batch):
        if "caption" in batch:
            ids, mask = self._tokenize_t5(list(batch["caption"]))
            batch = {k: v for k, v in batch.items() if k != "caption"}
            batch["t5_input_ids"] = ids
            batch["t5_mask"] = mask
        return batch

    def prepare_inputs(self, rng, batch, timestep_quantile=None):
        """batch: latents [B,C,F,H,W], text_embeddings [B,<=512,4096],
        seq_lens [B], optional mask [B,Hm,Wm], i2v: y [B,16,F,H,W],
        clip_context [B,257,1280]. Uncached-text mode instead carries
        t5_input_ids/t5_mask and runs UMT5 here, inside the jitted step."""
        if "text_embeddings" not in batch and "t5_input_ids" in batch:
            enc, te_params = self._t5_encoder()
            ids = batch["t5_input_ids"].astype(jnp.int32)
            mask = batch["t5_mask"].astype(jnp.int32)
            emb = enc.apply(te_params, ids, mask)
            batch = dict(batch)
            batch["text_embeddings"] = (
                emb.astype(jnp.float32) * mask[..., None]
            )
            batch["seq_lens"] = mask.sum(axis=1).astype(jnp.int32)
        latents = batch["latents"].astype(jnp.float32)
        b, c, f, h, w = latents.shape

        mask = batch.get("mask")
        if mask is not None:
            m = jax.image.resize(
                mask.astype(jnp.float32), (b, h, w), method="nearest"
            )
            mask = m[:, None, None]  # [B,1,1,h,w] broadcasts over C,F

        t_key, n_key = jax.random.split(rng)
        t = sample_timesteps(
            t_key, b, self.tdist, quantile=timestep_quantile,
            image_seq_len=(h // 2) * (w // 2),
        )
        noise = jax.random.normal(n_key, latents.shape, jnp.float32)
        t_exp = t.reshape(b, 1, 1, 1, 1)
        x_t = (1.0 - t_exp) * latents + t_exp * noise
        target = noise - latents

        # zero-pad text embeddings to text_len (reference wan.py:497-503
        # truncates per-sample by seq_lens then zero-pads; cached rows are
        # full-length with zeros beyond seq_lens already)
        ctx = batch["text_embeddings"].astype(jnp.float32)
        pad = self.wan_config.text_len - ctx.shape[1]
        if pad > 0:
            ctx = jnp.pad(ctx, ((0, 0), (0, pad), (0, 0)))
        if "seq_lens" in batch:
            sl = batch["seq_lens"].reshape(-1)  # [B] (cache rows may be [B,1])
            idx = jnp.arange(self.wan_config.text_len)[None, :]
            ctx = jnp.where(idx[..., None] < sl[:, None, None], ctx, 0.0)

        if self.is_i2v:
            y = batch["y"].astype(jnp.float32)
            # first-frame mask channels (reference wan.py:458-467)
            m4 = jnp.zeros((b, 4, f, h, w), jnp.float32)
            first = jnp.ones((b, 4, 1, h, w), jnp.float32)
            m4 = jnp.concatenate([first, m4[:, :, 1:]], axis=2)
            if self.wan_config.model_type == "flf2v":
                m4 = jnp.concatenate(
                    [m4[:, :, :-1], jnp.ones((b, 4, 1, h, w), jnp.float32)],
                    axis=2,
                )
            x_in = jnp.concatenate([x_t, m4, y], axis=1)
        else:
            x_in = x_t

        model_inputs = dict(
            x=x_in.astype(self.wan_config.dtype),
            t=t * 1000.0,
            context=ctx,
            clip_fea=(
                batch["clip_context"].astype(self.wan_config.dtype)
                if self.uses_clip
                else None
            ),
        )
        return model_inputs, target, mask

    def forward(self, params, model_inputs):
        return self.model.apply(params, **model_inputs)

    def make_pp_program(self):
        """Pipeline-parallel program: single 'blocks' phase with the patch/
        time/text embedding on stage 0 and the modulated head + loss on the
        last stage (reference: WanModel partitions via to_layers() +
        PipelineModule, models/base.py:294-391). See parallel/model_pp.py."""
        n_res, n_swap = self.wan_config.swap_split
        if 0 < n_swap < self.wan_config.num_layers:
            raise NotImplementedError(
                "partial blocks_to_swap (split block stacks) cannot be "
                "combined with pipeline_stages > 1; use blocks_to_swap >= "
                "num_layers or drop pipeline parallelism"
            )
        return _WanPPProgram(self)

    def host_stack_names(self):
        """Param-stack names the trainer should move to host RAM
        (blocks_to_swap; see parallel/offload.py)."""
        n_res, n_swap = self.wan_config.swap_split
        if n_swap == 0:
            return ()
        if n_swap == self.wan_config.num_layers:
            return ("blocks",)
        return ("blocks_swap",)

    # --- caching encoders ---------------------------------------------------

    def _load_vae(self):
        if getattr(self, "_vae", None) is None:
            from .wan_vae import WanVAEConfig, WanVideoVAE

            mc = self.model_config
            is_ti2v = self.wan_config.model_type == "ti2v"
            if mc.get("_tiny", False):
                if is_ti2v:
                    from .wan_vae22 import Wan22VAEConfig, WanVideoVAE22

                    cfg = Wan22VAEConfig.tiny()
                    self._vae = WanVideoVAE22(cfg)
                    self._vae_params = self._vae.init(
                        jax.random.PRNGKey(0), jnp.zeros((1, 3, 5, 32, 32))
                    )
                    return self._vae, self._vae_params
                cfg = WanVAEConfig(dim=8, z_dim=16, dim_mult=(1, 2, 4),
                                   num_res_blocks=1,
                                   temperal_downsample=(True, True))
                self._vae = WanVideoVAE(cfg)
                self._vae_params = self._vae.init(
                    jax.random.PRNGKey(0), jnp.zeros((1, 3, 5, 32, 32))
                )
            elif is_ti2v:
                # Wan2.2 16x16x4 VAE (reference models/wan/vae2_2.py),
                # golden-parity-tested port
                from .wan_vae22 import load_wan22_vae

                self._vae, self._vae_params = load_wan22_vae(mc["vae_path"])
            else:
                from .wan_vae_convert import load_wan_vae

                self._vae, self._vae_params = load_wan_vae(mc["vae_path"])
        return self._vae, self._vae_params

    def get_call_vae_fn(self):
        vae, params = self._load_vae()
        encode = jax.jit(
            lambda px: vae.apply(params, px, method=type(vae).encode)
        )

        def fn(pixels):
            """pixels [B,C,F,H,W] (or [B,C,H,W] image -> 1 frame); i2v also
            returns the first-frame-only conditioning clip `y`
            (reference wan.py:280-316)."""
            if pixels.ndim == 4:
                pixels = pixels[:, :, None]
            px = jnp.asarray(pixels, jnp.float32)
            ret = {"latents": np.asarray(encode(px))}
            if self.is_i2v:
                cond = jnp.concatenate(
                    [px[:, :, :1], jnp.zeros_like(px[:, :, 1:])], axis=2
                )
                if self.wan_config.model_type == "flf2v":
                    cond = jnp.concatenate(
                        [cond[:, :, :-1], px[:, :, -1:]], axis=2
                    )
                ret["y"] = np.asarray(encode(cond))
                if self.uses_clip:
                    ret["clip_context"] = np.asarray(
                        self._clip_visual(px[:, :, 0])
                    )
            return ret

        return fn

    def _clip_visual(self, first_frames):
        """CLIP-vision context for i2v via the native ViT-H/14 port
        (models/wan_clip.py; reference models/wan/clip.py). Tiny mode uses a
        deterministic projection so the path is exercisable."""
        if self.model_config.get("_tiny", False):
            b = first_frames.shape[0]
            pooled = jax.image.resize(first_frames, (b, 3, 16, 16), "linear")
            feat = pooled.reshape(b, -1)
            feat = jnp.tile(feat, (1, 1 + 1280 * 257 // feat.shape[1]))[:, : 257 * 1280]
            return feat.reshape(b, 257, 1280)
        if getattr(self, "_clip", None) is None:
            import torch

            from .wan_clip import (
                WanClipVision,
                WanClipVisionConfig,
                convert_wan_clip_visual,
            )

            cfg = WanClipVisionConfig()
            path = self.model_config["clip_path"]
            if str(path).endswith(".safetensors"):
                from .weights import load_safetensors_dir

                sd = load_safetensors_dir(path)
            else:
                sd = {
                    k: v.float().numpy()
                    for k, v in torch.load(path, map_location="cpu").items()
                }
            self._clip = WanClipVision(cfg)
            self._clip_params = convert_wan_clip_visual(sd, cfg)
            self._clip_run = jax.jit(
                lambda px: self._clip.apply(self._clip_params, px)
            )
        return self._clip_run(first_frames)

    def get_call_text_encoder_fns(self):
        mc = self.model_config
        if mc.get("_tiny", False):
            from ..data.bucketing import seed_from_hash

            cfg = self.wan_config

            def te(captions):
                embs, lens = [], []
                for c in captions:
                    r = np.random.default_rng(seed_from_hash(c))
                    n = min(len(c) + 1, cfg.text_len)
                    e = np.zeros((cfg.text_len, cfg.text_dim), np.float32)
                    e[:n] = r.standard_normal((n, cfg.text_dim))
                    embs.append(e)
                    lens.append(n)
                return {
                    "text_embeddings": np.stack(embs),
                    "seq_lens": np.asarray(lens, np.int32),
                }

            return [te]
        # native UMT5 encoder (reference vendors models/wan/t5.py; ours is
        # models/umt5.py), jitted for the caching phase
        from transformers import AutoTokenizer

        from .umt5 import UMT5Config, UMT5Encoder, convert_umt5_comfy
        from .weights import load_safetensors_dir

        cfg = UMT5Config.xxl()
        tok = AutoTokenizer.from_pretrained(
            mc.get("llm_tokenizer_path", mc["llm_path"])
        )
        enc = UMT5Encoder(cfg)
        params = convert_umt5_comfy(
            load_safetensors_dir(mc["llm_path"]), cfg
        )
        if mc.get("text_encoder_fp8"):
            # reference wan/wan.py:188-191
            from .text_encoders import cast_te_params_fp8

            params = cast_te_params_fp8(params)
        run = jax.jit(lambda ids, m: enc.apply(params, ids, m))

        def te(captions):
            t = tok(
                captions, padding="max_length", truncation=True,
                max_length=self.wan_config.text_len, return_tensors="np",
            )
            emb = np.asarray(run(t["input_ids"], t["attention_mask"]))
            mask = np.asarray(t["attention_mask"])
            # zero out padding rows like the reference (wan.py:497-503)
            emb = emb * mask[..., None]
            return {
                "text_embeddings": emb.astype(np.float32),
                "seq_lens": mask.sum(axis=1).astype(np.int32),
            }

        return [te]

    def sample(self, params, width, height, key, num_steps=20,
               guidance_scale=1.0, num_frames=1, **embeds):
        """Euler flow sampling through the training forward (t2v preview;
        reference CommonPipeline.sample, models/base.py:263-291). Returns
        latents [B, 16, F, h, w]."""
        from ..training.sampling import euler_flow_sample

        ctx = embeds["text_embeddings"].astype(jnp.float32)
        pad = self.wan_config.text_len - ctx.shape[1]
        if pad > 0:
            ctx = jnp.pad(ctx, ((0, 0), (0, pad), (0, 0)))
        b = ctx.shape[0]
        f = max(1, (int(num_frames) - 1) // 4 + 1)  # VAE 4x temporal
        h, w = height // 8, width // 8

        def vel(x, t):
            return self.forward(params, dict(
                x=x.astype(self.wan_config.dtype),
                t=t * 1000.0,
                context=ctx,
                clip_fea=None,
            ))

        return euler_flow_sample(
            vel, (b, 16, f, h, w), key, num_steps=num_steps,
            guidance_scale=guidance_scale,
            shift=self.model_config.get("shift", 3.0),
        )

    def load_weights(self):
        from .weights import load_safetensors_dir

        path = self.model_config.get(
            "ckpt_path", self.model_config.get("transformer_path")
        )
        sd = load_safetensors_dir(path)
        from .weights import merge_adapters_into_state_dict

        sd = merge_adapters_into_state_dict(
            sd, self.model_config.get("merge_adapters", [])
        )
        return convert_wan_weights(sd, self.wan_config)

    def save_adapter(self, out_dir, trainable):
        """ComfyUI format: diffusion_model.<official key>.lora_A/B
        (reference wan.py:258-262)."""
        from safetensors.numpy import save_file
        from flax import linen as nn

        sd = export_wan_lora_comfyui(nn.unbox(trainable), self.wan_config)
        save_file(sd, str(Path(out_dir) / "adapter_model.safetensors"))

    def save_model(self, path, params):
        """Full fine-tune export in the OFFICIAL Wan layout (blocks.N.*;
        the exact inverse of convert_wan_weights) — reference
        CommonPipeline.save_model writes the loadable state dict back
        (models/base.py save_model / utils/saver.py)."""
        from safetensors.numpy import save_file
        from flax import linen as nn

        from ..common import dtype_from_string

        sd = export_wan_model(nn.unbox(params), self.wan_config)
        if "save_dtype" in self.config:
            dt = dtype_from_string(self.config["save_dtype"])
            sd = {k: np.asarray(v).astype(dt) for k, v in sd.items()}
        out = Path(path)
        out.mkdir(parents=True, exist_ok=True)
        save_file(sd, str(out / "model.safetensors"),
                  metadata={"format": "pt"})
        print(f"saved {len(sd)} tensors to {out / 'model.safetensors'}")


# --- weight conversion ------------------------------------------------------

_BLOCK_LINEARS = {
    "self_attn_q": "self_attn.q",
    "self_attn_k": "self_attn.k",
    "self_attn_v": "self_attn.v",
    "self_attn_o": "self_attn.o",
    "cross_attn_q": "cross_attn.q",
    "cross_attn_k": "cross_attn.k",
    "cross_attn_v": "cross_attn.v",
    "cross_attn_o": "cross_attn.o",
    "ffn_in": "ffn.0",
    "ffn_out": "ffn.2",
}
_BLOCK_I2V_LINEARS = {
    "cross_attn_k_img": "cross_attn.k_img",
    "cross_attn_v_img": "cross_attn.v_img",
}
_BLOCK_RMS = {
    "self_attn_norm_q": "self_attn.norm_q",
    "self_attn_norm_k": "self_attn.norm_k",
    "cross_attn_norm_q": "cross_attn.norm_q",
    "cross_attn_norm_k": "cross_attn.norm_k",
}
_BLOCK_I2V_RMS = {"cross_attn_norm_k_img": "cross_attn.norm_k_img"}


def convert_wan_weights(sd: Dict[str, np.ndarray], cfg: WanConfig):
    """Official Wan checkpoint (blocks.N.* keys; also ComfyUI prefix
    'diffusion_model.' stripped) -> flax params."""
    sd = {
        (k[len("diffusion_model."):] if k.startswith("diffusion_model.") else k): v
        for k, v in sd.items()
    }

    def block(i):
        prefix = f"blocks.{i}"
        out = {}
        lin = dict(_BLOCK_LINEARS)
        rms = dict(_BLOCK_RMS)
        if cfg.model_type in ("i2v", "flf2v"):
            lin.update(_BLOCK_I2V_LINEARS)
            rms.update(_BLOCK_I2V_RMS)
        for ours, theirs in lin.items():
            out[ours] = linear(sd, f"{prefix}.{theirs}")
        for ours, theirs in rms.items():
            out[ours] = norm_scale(sd, f"{prefix}.{theirs}")
        if cfg.cross_attn_norm:
            out["norm3_scale"] = np.asarray(sd[f"{prefix}.norm3.weight"])
            out["norm3_bias"] = np.asarray(sd[f"{prefix}.norm3.bias"])
        out["modulation"] = np.asarray(sd[f"{prefix}.modulation"])
        return out

    n_res, n_swap = cfg.swap_split
    # a PARTIAL swap tail lives in its own "blocks_swap" stack (deepest
    # n_swap blocks); full-stream and no-offload keep the single stack
    split = 0 < n_swap < cfg.num_layers
    blocks = stack_layers(
        [block(i) for i in range(n_res if split else cfg.num_layers)])

    conv_w = np.asarray(sd["patch_embedding.weight"])  # [O, I, kt, kh, kw]
    params = {
        "patch_embedding": {
            "kernel": np.transpose(conv_w, (2, 3, 4, 1, 0)),
            "bias": np.asarray(sd["patch_embedding.bias"]),
        },
        "text_embedding_1": linear(sd, "text_embedding.0"),
        "text_embedding_2": linear(sd, "text_embedding.2"),
        "time_embedding_1": linear(sd, "time_embedding.0"),
        "time_embedding_2": linear(sd, "time_embedding.2"),
        "time_projection": linear(sd, "time_projection.1"),
        "head": linear(sd, "head.head"),
        "head_modulation": np.asarray(sd["head.modulation"]),
        "blocks": blocks,
    }
    if split:
        params["blocks_swap"] = stack_layers(
            [block(i) for i in range(n_res, cfg.num_layers)])
    if cfg.model_type in ("i2v", "flf2v"):
        params.update({
            "img_emb_norm1_scale": np.asarray(sd["img_emb.proj.0.weight"]),
            "img_emb_norm1_bias": np.asarray(sd["img_emb.proj.0.bias"]),
            "img_emb_1": linear(sd, "img_emb.proj.1"),
            "img_emb_2": linear(sd, "img_emb.proj.3"),
            "img_emb_norm2_scale": np.asarray(sd["img_emb.proj.4.weight"]),
            "img_emb_norm2_bias": np.asarray(sd["img_emb.proj.4.bias"]),
        })
    return {"params": params}


def export_wan_model(params, cfg: WanConfig) -> Dict[str, np.ndarray]:
    """Flax params -> OFFICIAL Wan state dict (exact inverse of
    convert_wan_weights, incl. a partial blocks_to_swap split layout,
    whose indices are offset back to the single-stack numbering)."""
    p = params["params"] if "params" in params else params
    sd: Dict[str, np.ndarray] = {}

    def put_linear(theirs, entry, i=None):
        k = np.asarray(entry["kernel"])
        b = entry.get("bias")
        if i is not None:
            k = k[i]
            b = None if b is None else np.asarray(b)[i]
        sd[f"{theirs}.weight"] = np.ascontiguousarray(k.T)
        if b is not None:
            sd[f"{theirs}.bias"] = np.asarray(b)

    lin = dict(_BLOCK_LINEARS)
    rms = dict(_BLOCK_RMS)
    if cfg.model_type in ("i2v", "flf2v"):
        lin.update(_BLOCK_I2V_LINEARS)
        rms.update(_BLOCK_I2V_RMS)

    n_res, n_swap = cfg.swap_split
    split = 0 < n_swap < cfg.num_layers
    stacks = [("blocks", 0)] + ([("blocks_swap", n_res)] if split else [])
    for stack_name, offset in stacks:
        blocks = p[stack_name]
        n = np.asarray(blocks[next(iter(lin))]["kernel"]).shape[0]
        for i in range(n):
            prefix = f"blocks.{offset + i}"
            for ours, theirs in lin.items():
                put_linear(f"{prefix}.{theirs}", blocks[ours], i)
            for ours, theirs in rms.items():
                sd[f"{prefix}.{theirs}.weight"] = np.asarray(
                    blocks[ours]["scale"])[i]
            if cfg.cross_attn_norm:
                sd[f"{prefix}.norm3.weight"] = np.asarray(
                    blocks["norm3_scale"])[i]
                sd[f"{prefix}.norm3.bias"] = np.asarray(
                    blocks["norm3_bias"])[i]
            sd[f"{prefix}.modulation"] = np.asarray(blocks["modulation"])[i]

    conv_k = np.asarray(p["patch_embedding"]["kernel"])  # [kt,kh,kw,I,O]
    sd["patch_embedding.weight"] = np.ascontiguousarray(
        np.transpose(conv_k, (4, 3, 0, 1, 2)))
    sd["patch_embedding.bias"] = np.asarray(p["patch_embedding"]["bias"])
    put_linear("text_embedding.0", p["text_embedding_1"])
    put_linear("text_embedding.2", p["text_embedding_2"])
    put_linear("time_embedding.0", p["time_embedding_1"])
    put_linear("time_embedding.2", p["time_embedding_2"])
    put_linear("time_projection.1", p["time_projection"])
    put_linear("head.head", p["head"])
    sd["head.modulation"] = np.asarray(p["head_modulation"])
    if cfg.model_type in ("i2v", "flf2v"):
        sd["img_emb.proj.0.weight"] = np.asarray(p["img_emb_norm1_scale"])
        sd["img_emb.proj.0.bias"] = np.asarray(p["img_emb_norm1_bias"])
        put_linear("img_emb.proj.1", p["img_emb_1"])
        put_linear("img_emb.proj.3", p["img_emb_2"])
        sd["img_emb.proj.4.weight"] = np.asarray(p["img_emb_norm2_scale"])
        sd["img_emb.proj.4.bias"] = np.asarray(p["img_emb_norm2_bias"])
    return sd


def export_wan_lora_comfyui(trainable, cfg: WanConfig) -> Dict[str, np.ndarray]:
    """LoRA factors -> ComfyUI keys diffusion_model.blocks.N.<mod>.lora_A/B.

    A partial blocks_to_swap layout stores the deepest blocks in a separate
    "blocks_swap" stack; exported indices are offset back so the checkpoint
    keys are identical to the single-stack layout."""
    out = {}
    lin = dict(_BLOCK_LINEARS)
    if cfg.model_type in ("i2v", "flf2v"):
        lin.update(_BLOCK_I2V_LINEARS)
    lokr_leaves = ("lokr_w1", "lokr_w2", "lokr_w2_a", "lokr_w2_b")
    stacks = [("blocks", 0)]
    n_res, n_swap = cfg.swap_split
    if 0 < n_swap < cfg.num_layers:
        stacks.append(("blocks_swap", n_res))
    for stack_name, offset in stacks:
        blocks = trainable["params"].get(stack_name, {})
        for ours, theirs in lin.items():
            leaf = blocks.get(ours)
            if leaf is None:
                continue
            if "lora_a" in leaf:
                a_all = np.asarray(leaf["lora_a"])
                b_all = np.asarray(leaf["lora_b"])
                for i in range(a_all.shape[0]):
                    j = offset + i
                    out[f"diffusion_model.blocks.{j}.{theirs}"
                        ".lora_A.weight"] = np.ascontiguousarray(
                            a_all[i].T.astype(np.float32))
                    out[f"diffusion_model.blocks.{j}.{theirs}"
                        ".lora_B.weight"] = np.ascontiguousarray(
                            b_all[i].T.astype(np.float32))
            # LoKr factors (PEFT LoKrLayer names, torch orientation)
            for name in lokr_leaves:
                if name in leaf:
                    w_all = np.asarray(leaf[name])
                    for i in range(w_all.shape[0]):
                        out[f"diffusion_model.blocks.{offset + i}.{theirs}"
                            f".{name}"] = np.ascontiguousarray(
                                w_all[i].T.astype(np.float32))
    return out


# --- pipeline parallelism ----------------------------------------------------


class _WanPPProgram:
    """PPProgram for WanTransformer (see parallel/model_pp.py).

    Raw-param re-expression of wan_model.py's __call__ split at the block
    scan: embed (patch conv + time/text embedding [+ i2v img_emb]) on stage
    0, WanAttentionBlock per slot, modulated head + unpatchify + loss on the
    last stage. Payload: (x [B,L,D], e0 [B,1,6,D], e [B,D], ctx [B,Lc,D]).
    """

    def __init__(self, pipeline):
        from ..parallel.model_pp import PPPhase

        self.pipeline = pipeline
        cfg = pipeline.wan_config
        self.cfg = cfg
        self.phases = [
            PPPhase("blocks", cfg.num_layers, self._apply_block)
        ]

    def _apply_block(self, p_i, payload, ctx):
        from .wan_model import WanAttentionBlock

        x, e0, e, ctx_emb = payload
        x, _ = WanAttentionBlock(self.cfg).apply(
            {"params": p_i}, x, e0, ctx["rope_cos"], ctx["rope_sin"], ctx_emb
        )
        return (x, e0, e, ctx_emb)

    def make_ctx(self, p_rest, mi0):
        from .layers import rope_frequencies

        cfg = self.cfg
        _b, _c, f, h, w = mi0["x"].shape
        pt, ph, pw = cfg.patch_size
        gf, gh, gw = f // pt, h // ph, w // pw
        fi = jnp.repeat(jnp.arange(gf), gh * gw)
        hi = jnp.tile(jnp.repeat(jnp.arange(gh), gw), gf)
        wi = jnp.tile(jnp.arange(gw), gf * gh)
        ids = jnp.stack([fi, hi, wi], axis=-1)
        rope_cos, rope_sin = rope_frequencies(ids, cfg.rope_axes_dim)
        return {"rope_cos": rope_cos, "rope_sin": rope_sin,
                "grid": (gf, gh, gw)}

    def embed(self, p_rest, mi, ctx):
        import math

        import flax.linen as nn

        from .layers import LoraDense, sinusoidal_timestep_embedding
        from .wan_model import _layer_norm

        cfg = self.cfg
        x, t, context = mi["x"], mi["t"], mi["context"]
        b = x.shape[0]
        gf, gh, gw = ctx["grid"]

        xe = jnp.transpose(x, (0, 2, 3, 4, 1)).astype(cfg.dtype)
        xe = nn.Conv(
            cfg.dim, kernel_size=cfg.patch_size, strides=cfg.patch_size,
            padding="VALID", dtype=cfg.dtype, param_dtype=cfg.param_dtype,
        ).apply({"params": p_rest["patch_embedding"]}, xe)
        xe = xe.reshape(b, gf * gh * gw, cfg.dim)

        def dense(key, feats, dtype):
            return LoraDense(feats, dtype=dtype, param_dtype=cfg.param_dtype)

        temb = sinusoidal_timestep_embedding(t, cfg.freq_dim)
        temb = dense("", cfg.dim, jnp.float32).apply(
            {"params": p_rest["time_embedding_1"]}, temb)
        temb = nn.silu(temb)
        e = dense("", cfg.dim, jnp.float32).apply(
            {"params": p_rest["time_embedding_2"]}, temb)
        e0 = dense("", 6 * cfg.dim, jnp.float32).apply(
            {"params": p_rest["time_projection"]}, nn.silu(e)
        ).reshape(b, 1, 6, cfg.dim)

        ctx_emb = dense("", cfg.dim, cfg.dtype).apply(
            {"params": p_rest["text_embedding_1"]},
            context.astype(cfg.dtype))
        ctx_emb = nn.gelu(ctx_emb, approximate=True)
        ctx_emb = dense("", cfg.dim, cfg.dtype).apply(
            {"params": p_rest["text_embedding_2"]}, ctx_emb)

        if cfg.model_type in ("i2v", "flf2v"):
            clip_fea = mi["clip_fea"]
            ci = _layer_norm(clip_fea.astype(cfg.dtype), 1e-5,
                             p_rest["img_emb_norm1_scale"],
                             p_rest["img_emb_norm1_bias"])
            ci = dense("", 1280, cfg.dtype).apply(
                {"params": p_rest["img_emb_1"]}, ci)
            ci = nn.gelu(ci)
            ci = dense("", cfg.dim, cfg.dtype).apply(
                {"params": p_rest["img_emb_2"]}, ci)
            ci = _layer_norm(ci, 1e-5, p_rest["img_emb_norm2_scale"],
                             p_rest["img_emb_norm2_bias"])
            ctx_emb = jnp.concatenate([ci, ctx_emb], axis=1)
        return (xe, e0, e, ctx_emb)

    def head_loss(self, p_rest, payload, target, mask, ctx):
        import math

        from .layers import LoraDense
        from .wan_model import _layer_norm

        cfg = self.cfg
        xe, _e0, e, _ctx_emb = payload
        b = xe.shape[0]
        gf, gh, gw = ctx["grid"]
        pt, ph, pw = cfg.patch_size

        head_mod = p_rest["head_modulation"]
        he = head_mod[None].astype(jnp.float32) + e[:, None, None, :]
        h1, h2 = he[:, :, 0], he[:, :, 1]
        xf = _layer_norm(xe, cfg.eps).astype(jnp.float32)
        xf = xf * (1 + h2) + h1
        out = LoraDense(
            math.prod(cfg.patch_size) * cfg.out_dim, dtype=jnp.float32,
            param_dtype=cfg.param_dtype,
        ).apply({"params": p_rest["head"]}, xf)
        out = out.reshape(b, gf, gh, gw, pt, ph, pw, cfg.out_dim)
        out = jnp.einsum("bfhwpqrc->bcfphqwr", out)
        out = out.reshape(b, cfg.out_dim, gf * pt, gh * ph, gw * pw)
        return self.pipeline.loss_fn(out, target, mask)
