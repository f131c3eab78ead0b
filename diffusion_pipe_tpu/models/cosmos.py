"""Cosmos-1 pipeline: EDM training over the Cosmos DiT (reference
models/cosmos.py).

The reference's vendored MiniTrainDIT "can load and reproduce the training
results of the original DIT model in (cosmos 1)"
(cosmos_predict2_modeling.py:1147), so this pipeline reuses
CosmosPredict2Transformer with the EDM objective: log-normal sigma,
preconditioned input c_in * x_t with c_noise timesteps, prediction
x0_pred = c_skip*x_t + c_out*net_out against clean latents with per-sigma
weights (cosmos.py:239-296, 420-435). Cosmos enforces a fixed resolution
set via explicit size_buckets (cosmos.py:174-185) — configure the dataset
accordingly.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..training.edm import edm_noise, edm_scalings, per_sigma_loss_weights
from . import register_model
from .base import BasePipeline
from .cosmos_predict2_model import CosmosPredict2Config, CosmosPredict2Transformer
from .layers import remat_spec


# --- Cosmos-1 GeneralDIT -> Predict2 (MiniTrainDIT) key conversion ----------
#
# GeneralDIT (the original Cosmos-1 serialization the reference loads
# directly, models/cosmos.py:165-172) nests each transformer block as an
# nn.ModuleDict entry "blockN" holding a ModuleList of three
# DITBuildingBlocks in Text2World's "FA-CA-MLP" order (full attention,
# cross attention, feed-forward — the wrapper's adapter_target_modules
# names GeneralDITTransformerBlock, ref cosmos.py:139). Inside:
#   attention sub-blocks wrap to_q/to_k/to_v as Sequential(Linear, RMSNorm)
#   and to_out as Sequential(Linear, Dropout) -> ".0" linear / ".1" norm;
#   each sub-block carries adaLN_modulation.{1,2} (SiLU, Linear, Linear);
#   the MLP sub-block is GPT2FeedForward layer1/layer2;
#   top level: affline_norm (the Predict2 t_embedding_norm), x_embedder /
#   t_embedder / final_layer names shared with Predict2 except the
#   adaLN_modulation capitalization.
_GD_ATTN = {
    "to_q.0": "q_proj", "to_q.1": "q_norm",
    "to_k.0": "k_proj", "to_k.1": "k_norm",
    "to_v.0": "v_proj", "to_out.0": "output_proj",
}
_GD_SUBBLOCK = {
    "0": ("self_attn", "adaln_modulation_self_attn"),
    "1": ("cross_attn", "adaln_modulation_cross_attn"),
    "2": ("mlp", "adaln_modulation_mlp"),
}


def convert_general_dit_sd(sd):
    """GeneralDIT-serialized state dict -> Predict2/MiniTrainDIT naming.

    Returns (converted_sd, dropped_keys). `_extra_state` entries (TE
    transformer-engine blobs the reference also filters, cosmos.py:170-172)
    are dropped silently; any other unmappable key is reported in
    dropped_keys so the caller can decide how loud to be.
    """
    import re

    out: Dict[str, Any] = {}
    dropped = []
    for k, v in sd.items():
        kk = k
        for p in ("model.diffusion_model.", "diffusion_model.", "net."):
            if kk.startswith(p):
                kk = kk[len(p):]
        if kk.endswith("_extra_state"):
            continue
        m = re.match(r"blocks\.block(\d+)\.blocks\.(\d+)\.(.+)$", kk)
        if m:
            i, j, rest = m.group(1), m.group(2), m.group(3)
            names = _GD_SUBBLOCK.get(j)
            if names is None:
                dropped.append(k)
                continue
            mod, ada = names
            if rest.startswith("adaLN_modulation."):
                out[f"blocks.{i}.{ada}."
                    f"{rest[len('adaLN_modulation.'):]}"] = v
                continue
            if j in ("0", "1"):
                m2 = re.match(r"block\.attn\.(to_\w+\.\d)\.(.+)$", rest)
                if m2 and m2.group(1) in _GD_ATTN:
                    out[f"blocks.{i}.{mod}."
                        f"{_GD_ATTN[m2.group(1)]}.{m2.group(2)}"] = v
                    continue
            else:
                m2 = re.match(r"block\.(layer\d)\.(.+)$", rest)
                if m2:
                    out[f"blocks.{i}.mlp.{m2.group(1)}.{m2.group(2)}"] = v
                    continue
            dropped.append(k)
            continue
        if kk.startswith("affline_norm."):
            out["t_embedding_norm." + kk[len("affline_norm."):]] = v
            continue
        if kk.startswith("final_layer.adaLN_modulation."):
            out["final_layer.adaln_modulation."
                + kk[len("final_layer.adaLN_modulation."):]] = v
            continue
        # x_embedder.proj.1, t_embedder.1.linear_{1,2}, final_layer.linear
        # share Predict2 names; anything else passes through and is simply
        # unused by the keymap (the reference ignores unexpected keys via
        # load_state_dict(strict=False) as well)
        out[kk] = v
    return out, dropped


@register_model("cosmos")
class CosmosPipeline(BasePipeline):
    name = "cosmos"
    framerate = 24
    cacheable_text_embeddings = ("prompt_embeds",)

    def __init__(self, config):
        super().__init__(config)
        self.cp_config = self._build_config()
        self.model = CosmosPredict2Transformer(self.cp_config)

    def _build_config(self) -> CosmosPredict2Config:
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
            # cosmos-1 7B: 4096 channels, 28 blocks, 32 heads; old-T5 1024
            model_channels=int(mc.get("model_channels", 4096)),
            num_blocks=int(mc.get("num_blocks", 28)),
            num_heads=int(mc.get("num_heads", 32)),
            use_adaln_lora=True,
        )
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
            return CosmosPredict2Config.tiny(**{
                k: v for k, v in kwargs.items()
                if k not in ("model_channels", "num_blocks", "num_heads")
            })
        return CosmosPredict2Config(**kwargs)

    # --- weights ------------------------------------------------------------
    # The DiT here shares the MiniTrainDIT block modules, so Predict2-layout
    # checkpoints load/export through the same keymap. The original
    # Cosmos-1 GeneralDIT dialect (nested FA/CA/MLP sub-block triples,
    # reference models/cosmos.py:166-176 via the Cosmos submodule) is a
    # different serialization; convert such checkpoints to the Predict2
    # layout offline before loading.

    def _keymap_config(self):
        return self.cp_config

    def keymap(self):
        from .cosmos_predict2 import cosmos_predict2_keymap

        return cosmos_predict2_keymap()

    def load_weights(self):
        from .keymaps import keymap_to_flax, load_sd_for_pipeline

        sd = load_sd_for_pipeline(self)
        # The original Cosmos-1 GeneralDIT serialization is detectable from
        # the names the reference wrapper itself exposes: blocks is an
        # nn.ModuleDict keyed "block0", "block1", ... (reference
        # models/cosmos.py:273 iterates transformer.blocks.items()) and
        # checkpoints carry "_extra_state" entries (cosmos.py:170-172
        # filters them via strict=False). ALL released Cosmos-1
        # transformers ship in that dialect, so it is converted in-process
        # to the Predict2 naming (the reference's own vendored MiniTrainDIT
        # states it "can load and reproduce the training results of the
        # original DIT model", cosmos_predict2_modeling.py:1147 — the
        # block internals map 1:1; see convert_general_dit_sd).
        if any("blocks.block0." in k for k in sd):
            sd, dropped = convert_general_dit_sd(sd)
            if not any(k.startswith("blocks.0.") for k in sd):
                raise ValueError(
                    "cosmos: checkpoint looked like the Cosmos-1 "
                    "GeneralDIT serialization but no transformer block "
                    "converted — unknown layout; first dropped keys: "
                    f"{dropped[:5]}"
                )
            if dropped:
                import warnings

                warnings.warn(
                    f"cosmos: {len(dropped)} GeneralDIT keys have no "
                    "Predict2-layout analogue and were ignored (the "
                    "reference ignores unexpected keys too, "
                    f"load_state_dict(strict=False)): {dropped[:5]}...",
                    stacklevel=2,
                )
        return keymap_to_flax(sd, self.keymap(), self.cp_config)

    def init_params(self, rng):
        cfg = self.cp_config
        return jax.jit(self.model.init)(
            rng,
            jnp.zeros((1, cfg.in_channels, 1, 8, 8)),
            jnp.zeros((1,)),
            jnp.zeros((1, 8, cfg.crossattn_emb_channels)),
        )

    def prepare_inputs(self, rng, batch, timestep_quantile=None):
        latents = batch["latents"].astype(jnp.float32)
        b, c, f, h, w = latents.shape

        mask = batch.get("mask")
        if mask is not None:
            m = jax.image.resize(
                mask.astype(jnp.float32), (b, h, w), method="nearest"
            )
            mask = m[:, None, None]

        net_in, x_t, c_noise, sigma = edm_noise(
            rng, latents, quantile=timestep_quantile
        )
        model_inputs = dict(
            x=net_in.astype(self.cp_config.dtype),
            t=c_noise,
            context=batch["prompt_embeds"],
            _x_t=x_t,
            _sigma=sigma,
        )
        return model_inputs, latents, mask  # target = clean latents

    def sample(self, params, width, height, key, num_steps=20,
               guidance_scale=1.0, num_frames=1, **embeds):
        """EDM Euler sampling over the Karras sigma schedule through the
        training forward (the training graph validated as the inference
        graph; reference CommonPipeline.sample, models/base.py:263-291,
        EDM preconditioning models/cosmos.py:21-45). Returns latents
        [B, C, F, h, w]."""
        from ..training.edm import edm_scalings

        ctx = embeds["prompt_embeds"]
        b = ctx.shape[0]
        c = self.cp_config.in_channels
        h, w = height // 8, width // 8
        f = max(1, (int(num_frames) - 1) // 8 + 1)

        # Karras schedule (EDM paper defaults)
        rho, s_min, s_max = 7.0, 0.002, 80.0
        i = jnp.arange(num_steps)
        sigmas = (s_max ** (1 / rho) + i / max(num_steps - 1, 1)
                  * (s_min ** (1 / rho) - s_max ** (1 / rho))) ** rho
        sigmas = jnp.concatenate([sigmas, jnp.zeros((1,))])

        def x0_pred(x, sigma):
            sig = jnp.full((b,), sigma)
            c_skip, c_out, c_in, c_noise = edm_scalings(sig)
            exp = (b,) + (1,) * (x.ndim - 1)
            net_out = self.model.apply(params, **dict(
                x=(x * c_in.reshape(exp)).astype(self.cp_config.dtype),
                t=c_noise,
                context=ctx,
            ))
            return (c_skip.reshape(exp) * x
                    + c_out.reshape(exp) * net_out.astype(jnp.float32))

        x = jax.random.normal(key, (b, c, f, h, w), jnp.float32) * sigmas[0]

        def body(i, x):
            sig = sigmas[i]
            d = (x - x0_pred(x, sig)) / sig
            return x + (sigmas[i + 1] - sig) * d

        return jax.lax.fori_loop(0, num_steps, body, x)

    def make_pp_program(self):
        """EDM variant of the Predict2 pipeline program: (x_t, sigma) travel
        in the payload so the last stage can apply the c_skip/c_out
        preconditioning before the per-sigma weighted loss (reference
        models/cosmos.py:239-296). See parallel/model_pp.py."""
        return _CosmosEDMPPProgram(self)

    def forward(self, params, model_inputs):
        x_t = model_inputs.pop("_x_t")
        sigma = model_inputs.pop("_sigma")
        net_out = self.model.apply(params, **model_inputs)
        exp = (sigma.shape[0],) + (1,) * (x_t.ndim - 1)
        c_skip, c_out, _, _ = edm_scalings(sigma)
        x0_pred = (c_skip.reshape(exp) * x_t
                   + c_out.reshape(exp) * net_out.astype(jnp.float32))
        return x0_pred, sigma

    def loss_fn(self, output, target, mask):
        """MSE(x0_pred, latents) * per-sigma weights (cosmos.py:278-296)."""
        x0_pred, sigma = output
        loss = (x0_pred.astype(jnp.float32) - target.astype(jnp.float32)) ** 2
        if mask is not None and mask.size > 0:
            loss = loss * jnp.broadcast_to(mask.astype(jnp.float32), loss.shape)
        w = per_sigma_loss_weights(sigma)
        loss = loss * w.reshape((sigma.shape[0],) + (1,) * (loss.ndim - 1))
        return jnp.mean(loss)

    def get_call_vae_fn(self):
        mc = self.model_config
        if mc.get("_tiny", False):
            from .wan_vae import WanVAEConfig, WanVideoVAE

            cfg = WanVAEConfig(dim=8, z_dim=16, dim_mult=(1, 2, 4),
                               num_res_blocks=1,
                               temperal_downsample=(True, True))
            vae = WanVideoVAE(cfg)
            params = vae.init(jax.random.PRNGKey(0), jnp.zeros((1, 3, 5, 32, 32)))
            encode = jax.jit(
                lambda px: vae.apply(params, px, method=type(vae).encode)
            )

            def fn(pixels):
                if pixels.ndim == 4:
                    pixels = pixels[:, :, None]
                return {"latents": np.asarray(
                    encode(jnp.asarray(pixels, jnp.float32))
                )}

            return fn

        # Cosmos continuous video tokenizer (cosmos_tokenizer.py): the
        # factorized CausalContinuousVideoTokenizer architecture, converted
        # directly from the checkpoint at model.vae_path (reference
        # cosmos.py:111 load_custom_video_vae). model.vae_params_path
        # (flax msgpack) remains as an override.
        from .cosmos_tokenizer import (
            CosmosTokenizerConfig,
            CosmosVideoTokenizer,
            convert_cosmos_tokenizer,
        )

        if mc.get("vae_params_path"):
            import flax.serialization

            cfg = CosmosTokenizerConfig()
            with open(mc["vae_params_path"], "rb") as f:
                params = flax.serialization.msgpack_restore(f.read())
        else:
            from .weights import load_state_dict_any

            cfg, params = convert_cosmos_tokenizer(
                load_state_dict_any(mc["vae_path"]))
        tok = CosmosVideoTokenizer(cfg)
        encode = jax.jit(
            lambda px: tok.apply(params, px, method=type(tok).encode)
        )

        def fn(pixels):
            if pixels.ndim == 4:
                pixels = pixels[:, :, None]
            return {"latents": np.asarray(
                encode(jnp.asarray(pixels, jnp.float32))
            )}

        return fn

    def get_call_text_encoder_fns(self):
        mc = self.model_config
        if mc.get("_tiny", False):
            from ..data.bucketing import seed_from_hash

            cfg = self.cp_config

            def te(caps):
                return {"prompt_embeds": np.stack([
                    np.random.default_rng(seed_from_hash(c))
                    .standard_normal((8, cfg.crossattn_emb_channels))
                    .astype(np.float32) for c in caps
                ])}

            return [te]

        # old T5-XXL, max_length 512, padded positions zeroed (reference
        # cosmos.py text-embedding path mirrors cosmos_predict2.py:155-172)
        from .text_encoders import HFTextEncoder

        enc = HFTextEncoder("t5", mc["t5_path"], max_length=512)

        def fn(caps):
            h, m = enc.encode(caps, return_mask=True)
            return {"prompt_embeds": h * m[..., None].astype(h.dtype)}

        return [fn]


class _CosmosEDMPPProgram:
    """EDM PPProgram for the cosmos pipeline: subclasses the Predict2
    program lazily (import at construction) and threads (x_t, sigma)
    through the payload to the head (see cosmos.py forward/loss_fn)."""

    def __new__(cls, pipeline):
        from .cosmos_predict2 import _CosmosPredict2PPProgram

        class _Impl(_CosmosPredict2PPProgram):
            def _extras(self, mi):
                return (mi["_x_t"], mi["_sigma"])

            def _finalize(self, net_out, extras, target, mask):
                x_t, sigma = extras
                exp = (sigma.shape[0],) + (1,) * (x_t.ndim - 1)
                c_skip, c_out, _, _ = edm_scalings(sigma)
                x0_pred = (c_skip.reshape(exp) * x_t
                           + c_out.reshape(exp)
                           * net_out.astype(jnp.float32))
                return self.pipeline.loss_fn((x0_pred, sigma), target, mask)

        return _Impl(pipeline)
