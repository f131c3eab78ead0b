"""Composed loss-CURVE parity for the DDPM and EDM objective families.

test_loss_curve_parity.py covers the two FLOW families (wan,
cosmos_predict2); this file closes the other two reference objectives:

- DDPM (SDXL): scaled_linear betas -> uniform integer t -> add_noise ->
  eps/v-pred target -> per-example MSE -> min-SNR-gamma / debiased /
  zero-terminal-SNR weighting -> global-norm clip -> AdamW(wd split),
  torch (reference math, models/sdxl.py:281-356 + 536-648 + diffusers
  DDPMScheduler add_noise/get_velocity formulas it calls) vs our trainer
  (models/sdxl.py prepare_inputs + loss_fn + training/ddpm.py +
  training/trainer.py), with shared numpy randomness. The UNet is replaced
  by an identical tiny stand-in on BOTH sides (the SDXL UNet itself is
  golden-tested elsewhere; what this test composes is the objective math).

- EDM (Cosmos-1): log-normal sigma -> x_t = x + sigma*n -> EDM
  preconditioning c_in/c_noise -> vendored torch MiniTrainDIT forward ->
  x0_pred = c_skip*x_t + c_out*F(.) -> MSE vs clean latents * per-sigma
  weights -> clip -> AdamW, torch (reference models/cosmos.py:21-45,
  239-296, 420-435 math over the reference's own vendored
  cosmos_predict2_modeling.MiniTrainDIT) vs our trainer
  (models/cosmos.py + training/edm.py).
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow


# --------------------------------------------------------------------------
# DDPM (SDXL)
# --------------------------------------------------------------------------

def _torch_sdxl_schedule(v_pred: bool, zero_terminal_snr: bool):
    """Reference scheduler tables: diffusers DDPMScheduler(scaled_linear,
    0.00085..0.012, 1000) + the kohya zero-terminal-SNR rescale
    (sdxl.py:295-330) + all_snr (sdxl.py:281-292)."""
    import torch

    betas = torch.linspace(0.00085**0.5, 0.012**0.5, 1000,
                           dtype=torch.float64) ** 2
    if zero_terminal_snr:
        alphas = 1 - betas
        alphas_bar = alphas.cumprod(0)
        abs_sqrt = alphas_bar.sqrt()
        a0, aT = abs_sqrt[0].clone(), abs_sqrt[-1].clone()
        abs_sqrt -= aT
        abs_sqrt *= a0 / (a0 - aT)
        alphas_bar = abs_sqrt**2
        alphas = torch.cat([alphas_bar[:1], alphas_bar[1:] / alphas_bar[:-1]])
        betas = 1 - alphas
    ac = torch.cumprod(1.0 - betas, dim=0).to(torch.float32)
    sqrt_ac = ac.sqrt()
    sqrt_om = (1.0 - ac).sqrt()
    all_snr = (sqrt_ac / sqrt_om) ** 2  # sdxl.py:285-292
    return ac, sqrt_ac, sqrt_om, all_snr


def _standin_params(rng):
    """Tiny UNet stand-in: two 1x1 'convs' (channel matmuls) + a timestep
    linear, expressed identically in torch and jax so weights are shared
    as raw numpy arrays."""
    return {
        "w1": rng.standard_normal((4, 32)).astype(np.float32) * 0.3,
        "b1": np.zeros((32,), np.float32),
        "wt": rng.standard_normal((1, 32)).astype(np.float32) * 0.3,
        "w2": rng.standard_normal((32, 4)).astype(np.float32) * 0.3,
        "b2": np.zeros((4,), np.float32),
    }


@pytest.mark.parametrize("objective", [
    dict(),                                               # plain eps
    dict(min_snr_gamma=5.0),                              # min-SNR
    dict(min_snr_gamma=5.0, debiased_estimation_loss=True),
    dict(v_pred=True, zero_terminal_snr=True,             # full v-pred stack
         min_snr_gamma=5.0, debiased_estimation_loss=True),
], ids=["eps", "min_snr", "min_snr_debiased", "vpred_ztsnr_full"])
def test_sdxl_ddpm_loss_curve_matches_reference(objective):
    import torch
    import torch.nn.functional as F

    import jax
    import jax.numpy as jnp

    from diffusion_pipe_tpu.models.sdxl import SDXLPipeline
    from diffusion_pipe_tpu.training.optimizers import get_optimizer
    from diffusion_pipe_tpu.training.train_state import full_ft_predicate
    from diffusion_pipe_tpu.training.trainer import (
        init_train_state,
        make_train_step,
    )

    v_pred = bool(objective.get("v_pred", False))
    ztsnr = bool(objective.get("zero_terminal_snr", False))
    gamma = objective.get("min_snr_gamma")
    debiased = bool(objective.get("debiased_estimation_loss", False))

    # --- shared randomness --------------------------------------------------
    steps = 12
    bs = 2
    rng = np.random.default_rng(23)
    latents = rng.standard_normal((bs, 4, 8, 8)).astype(np.float32) * 0.3
    sp = _standin_params(rng)
    # avoid t=999 under ztsnr: snr=0 there makes the eps-mode reference
    # weight infinite (the reference only ever pairs ztsnr with v_pred,
    # sdxl.py:401-402, where the weight is finite — but keep the curves
    # comparable across all parametrizations)
    t_steps = [rng.integers(0, 999, (bs,)).astype(np.int64)
               for _ in range(steps)]
    noise_steps = [rng.standard_normal(latents.shape).astype(np.float32)
                   for _ in range(steps)]

    # --- torch side (reference math, sdxl.py:536-648) ------------------------
    lr, wd = 2e-2, 0.01
    tp = {k: torch.nn.Parameter(torch.from_numpy(v.copy()))
          for k, v in sp.items()}
    _, sqrt_ac, sqrt_om, all_snr = _torch_sdxl_schedule(v_pred, ztsnr)
    opt_t = torch.optim.AdamW(
        [{"params": [p for p in tp.values() if p.ndim > 1],
          "weight_decay": wd},
         {"params": [p for p in tp.values() if p.ndim == 1],
          "weight_decay": 0.0}],
        lr=lr, betas=(0.9, 0.999), eps=1e-8)

    def torch_standin(x, t):
        h = torch.einsum("bchw,cd->bdhw", x, tp["w1"])
        h = h + tp["b1"][None, :, None, None]
        h = h + ((t[:, None].float() / 1000.0) @ tp["wt"])[:, :, None, None]
        h = F.silu(h)
        return (torch.einsum("bdhw,dc->bchw", h, tp["w2"])
                + tp["b2"][None, :, None, None])

    losses_ref = []
    for s in range(steps):
        t = torch.from_numpy(t_steps[s])
        noise = torch.from_numpy(noise_steps[s])
        x1 = torch.from_numpy(latents)
        a = sqrt_ac[t].view(-1, 1, 1, 1)
        o = sqrt_om[t].view(-1, 1, 1, 1)
        noisy = a * x1 + o * noise                      # add_noise
        target = a * noise - o * x1 if v_pred else noise  # get_velocity
        out = torch_standin(noisy, t)
        loss = F.mse_loss(out.float(), target.float(), reduction="none")
        loss = loss.mean([1, 2, 3])                     # sdxl.py:641
        if gamma is not None:                           # apply_snr_weight
            snr = all_snr[t]
            min_snr = torch.minimum(snr, torch.full_like(snr, gamma))
            loss = loss * (min_snr / (snr + 1) if v_pred else min_snr / snr)
        if debiased:                                    # apply_debiased_est.
            snr_t = torch.minimum(all_snr[t], torch.full_like(all_snr[t], 1000))
            loss = loss * (1 / (snr_t + 1) if v_pred else 1 / snr_t.sqrt())
        loss = loss.mean()
        opt_t.zero_grad()
        loss.backward()
        torch.nn.utils.clip_grad_norm_(tp.values(), 1.0)
        opt_t.step()
        losses_ref.append(float(loss))

    # --- our side -------------------------------------------------------------
    class _InjectedSDXL(SDXLPipeline):
        """Swaps ONLY the UNet forward (tiny stand-in) and the RNG source
        (injected t/noise); schedule, target construction, SNR weighting,
        clip and optimizer run the genuine trainer path."""

        def init_params(self, _rng):
            return {"params": {k: jnp.asarray(v) for k, v in sp.items()}}

        def prepare_inputs(self, rng_, batch, timestep_quantile=None):
            batch = dict(batch)
            t = batch.pop("fixed_t")
            noise = batch.pop("fixed_noise").astype(jnp.float32)
            lat = batch["latents"].astype(jnp.float32)
            noisy = self.schedule.add_noise(lat, noise, t)
            target = (self.schedule.get_velocity(lat, noise, t)
                      if self.v_pred else noise)
            return dict(sample=noisy, timesteps=t), target, None

        def forward(self, params, mi):
            p = params["params"]
            x = mi["sample"].astype(jnp.float32)
            t = mi["timesteps"].astype(jnp.float32) / 1000.0
            h = jnp.einsum("bchw,cd->bdhw", x, p["w1"])
            h = h + p["b1"][None, :, None, None]
            h = h + (t[:, None] @ p["wt"])[:, :, None, None]
            h = jax.nn.silu(h)
            return (jnp.einsum("bdhw,dc->bchw", h, p["w2"])
                    + p["b2"][None, :, None, None]), mi["timesteps"]

    cfg = {
        "save_every_n_epochs": 1,
        "model": {"type": "sdxl", "dtype": "float32", "_tiny": True,
                  **objective},
        "optimizer": {"type": "adamw", "lr": lr, "betas": [0.9, 0.999],
                      "eps": 1e-8, "weight_decay": wd},
    }
    pipe = _InjectedSDXL(cfg)
    opt = get_optimizer(cfg)
    state = init_train_state(pipe, opt, jax.random.PRNGKey(0),
                             full_ft_predicate)
    step = jax.jit(make_train_step(pipe, opt, gradient_clipping=1.0))

    losses_ours = []
    for s in range(steps):
        batch = {
            "latents": jnp.asarray(latents),
            "fixed_t": jnp.asarray(t_steps[s], jnp.int32),
            "fixed_noise": jnp.asarray(noise_steps[s]),
        }
        state, metrics = step(state, batch, jax.random.PRNGKey(s))
        losses_ours.append(float(metrics["loss"]))

    np.testing.assert_allclose(
        losses_ours, losses_ref, rtol=2e-3, atol=2e-4,
        err_msg=f"ours={losses_ours}\nref={losses_ref}")
    assert losses_ref[-1] != losses_ref[0]


# --------------------------------------------------------------------------
# EDM (Cosmos-1)
# --------------------------------------------------------------------------

def test_cosmos_edm_loss_curve_matches_reference():
    """EDM objective composed over the reference's own vendored torch DiT:
    shared log-normal sigmas/noise, preconditioned input, x0 prediction,
    per-sigma-weighted MSE vs clean latents, clip, AdamW(wd split)."""
    import torch
    import torch.nn.functional as F

    import jax
    import jax.numpy as jnp

    from test_golden_parity import _stub_torchvision
    from test_loss_curve_parity import _ref_path

    from diffusion_pipe_tpu.models.cosmos import CosmosPipeline
    from diffusion_pipe_tpu.models.keymaps import keymap_to_flax
    from diffusion_pipe_tpu.training.optimizers import get_optimizer
    from diffusion_pipe_tpu.training.train_state import predicate_from_config
    from diffusion_pipe_tpu.training.trainer import (
        init_train_state,
        make_train_step,
    )

    _ref_path()
    _stub_torchvision()
    from models.cosmos_predict2_modeling import MiniTrainDIT

    torch.manual_seed(0)
    m = MiniTrainDIT(
        max_img_h=64, max_img_w=64, max_frames=8, in_channels=16,
        out_channels=16, patch_spatial=2, patch_temporal=1,
        concat_padding_mask=True, model_channels=64, num_blocks=2,
        num_heads=4, mlp_ratio=4.0, crossattn_emb_channels=32,
        pos_emb_cls="rope3d", pos_emb_learnable=False,
        pos_emb_interpolation="crop", min_fps=1, max_fps=30,
        use_adaln_lora=True, adaln_lora_dim=16,
        rope_h_extrapolation_ratio=1.0, rope_w_extrapolation_ratio=1.0,
        rope_t_extrapolation_ratio=1.0, extra_per_block_abs_pos_emb=False,
        rope_enable_fps_modulation=False,
    )
    m = m.float().train()
    sd = {k: v.detach().numpy().copy() for k, v in m.state_dict().items()}

    # --- shared randomness --------------------------------------------------
    steps = 12
    bs = 2
    sigma_data = 0.5
    rng = np.random.default_rng(31)
    latents = (rng.standard_normal((bs, 16, 2, 16, 16)).astype(np.float32)
               * sigma_data)
    ctx = rng.standard_normal((bs, 24, 32)).astype(np.float32)
    # sigma = exp(N(0,1)) (reference cosmos.py:254-262)
    sigma_steps = [np.exp(rng.standard_normal(bs).astype(np.float32))
                   for _ in range(steps)]
    noise_steps = [rng.standard_normal(latents.shape).astype(np.float32)
                   for _ in range(steps)]

    # --- torch side (reference math, cosmos.py:21-45, 239-296, 420-435) -----
    lr, wd = 1e-3, 0.01
    opt_t = torch.optim.AdamW(
        [{"params": [p for p in m.parameters() if p.ndim > 1],
          "weight_decay": wd},
         {"params": [p for p in m.parameters() if p.ndim == 1],
          "weight_decay": 0.0}],
        lr=lr, betas=(0.9, 0.999), eps=1e-8)
    pad = torch.zeros((bs, 1, 16, 16))

    losses_ref = []
    for s in range(steps):
        sigma = torch.from_numpy(sigma_steps[s])
        noise = torch.from_numpy(noise_steps[s])
        x1 = torch.from_numpy(latents)
        se = sigma.view(-1, 1, 1, 1, 1)
        x_t = x1 + se * noise
        denom = (sigma**2 + sigma_data**2).sqrt()
        c_skip = (sigma_data**2 / (sigma**2 + sigma_data**2)).view(
            -1, 1, 1, 1, 1)
        c_out = (sigma * sigma_data / denom).view(-1, 1, 1, 1, 1)
        c_in = (1.0 / denom).view(-1, 1, 1, 1, 1)
        c_noise = sigma.log() / 4.0
        net_out = m(x_t * c_in, c_noise, torch.from_numpy(ctx),
                    padding_mask=pad)
        x0_pred = c_skip * x_t + c_out * net_out
        w = ((se**2 + sigma_data**2) / (se * sigma_data) ** 2)
        loss = F.mse_loss(x0_pred.float(), x1.float(), reduction="none")
        loss = (loss * w).mean()
        opt_t.zero_grad()
        loss.backward()
        torch.nn.utils.clip_grad_norm_(m.parameters(), 1.0)
        opt_t.step()
        losses_ref.append(float(loss))

    # --- our side -------------------------------------------------------------
    class _InjectedCosmos(CosmosPipeline):
        """RNG injection only: sigma/noise come from the shared numpy
        stream; preconditioning, x0 head, per-sigma weights and the
        optimizer path are the genuine pipeline/trainer code."""

        def prepare_inputs(self, rng_, batch, timestep_quantile=None):
            from diffusion_pipe_tpu.training.edm import edm_scalings

            batch = dict(batch)
            sigma = batch.pop("fixed_sigma").astype(jnp.float32)
            noise = batch.pop("fixed_noise").astype(jnp.float32)
            lat = batch["latents"].astype(jnp.float32)
            exp = (lat.shape[0],) + (1,) * (lat.ndim - 1)
            x_t = lat + sigma.reshape(exp) * noise
            _, _, c_in, c_noise = edm_scalings(sigma)
            mi = dict(
                x=(x_t * c_in.reshape(exp)).astype(self.cp_config.dtype),
                t=c_noise,
                context=batch["prompt_embeds"],
                _x_t=x_t,
                _sigma=sigma,
            )
            return mi, lat, None

    cfg = {
        "save_every_n_epochs": 1,
        "model": {"type": "cosmos", "dtype": "float32", "_tiny": True},
        "optimizer": {"type": "adamw", "lr": lr, "betas": [0.9, 0.999],
                      "eps": 1e-8, "weight_decay": wd},
    }
    pipe = _InjectedCosmos(cfg)
    params = jax.tree.map(
        np.asarray, keymap_to_flax(sd, pipe.keymap(), pipe.cp_config))

    opt = get_optimizer(cfg)
    state = init_train_state(pipe, opt, jax.random.PRNGKey(0),
                             predicate_from_config(cfg), params=params)
    step = jax.jit(make_train_step(pipe, opt, gradient_clipping=1.0))

    losses_ours = []
    for s in range(steps):
        batch = {
            "latents": jnp.asarray(latents),
            "prompt_embeds": jnp.asarray(ctx),
            "fixed_sigma": jnp.asarray(sigma_steps[s]),
            "fixed_noise": jnp.asarray(noise_steps[s]),
        }
        state, metrics = step(state, batch, jax.random.PRNGKey(s))
        losses_ours.append(float(metrics["loss"]))

    np.testing.assert_allclose(
        losses_ours, losses_ref, rtol=2e-3, atol=2e-4,
        err_msg=f"ours={losses_ours}\nref={losses_ref}")
    assert losses_ref[-1] != losses_ref[0]
