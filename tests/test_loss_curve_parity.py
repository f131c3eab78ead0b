"""End-to-end loss-CURVE parity vs the reference (BASELINE.md criterion).

Module goldens prove forwards match; this test proves the COMPOSED system
matches: t-distribution table -> flow-matching noising -> Wan DiT forward
-> MSE loss -> global-norm grad clip -> AdamW(wd split) for many seeded
full-fine-tune steps, torch (reference math, vendored WanModel +
utils/common.py t-table + models/base.py loss + train.py wd-split) vs our
trainer (training/trainer.py make_train_step + training/flow.py +
models/wan.py), with shared numpy randomness so every stochastic choice is
identical on both sides.

Reference composition cited per stage:
  - t table: utils/common.py:124-160 (logit-normal icdf buckets, sample_t)
  - noising: models/wan/wan.py:362-369 (x_t=(1-t)x1+t*x0, target x0-x1,
    t*1000 into the model)
  - loss: models/base.py:364-382 (f32 MSE, empty mask = no masking)
  - wd split: train.py:779-803 (ndim==1 -> no weight decay)
  - clip: global-norm 1.0 (utils/patches.py:175-246 Megatron-style)
"""

import sys

import numpy as np
import pytest

REF = "/root/reference"

pytestmark = pytest.mark.slow


def _ref_path():
    if REF not in sys.path:
        sys.path.insert(0, REF)
    # utils/common.py imports deepspeed at module scope; only its dist
    # helpers (unused here) touch it, so an empty stub suffices. Each stub
    # must carry a real ModuleSpec: transformers/diffusers availability
    # probes call importlib.util.find_spec("deepspeed") later in the same
    # process, which raises ValueError on a module whose __spec__ is None.
    if "deepspeed" not in sys.modules:
        import importlib.machinery
        import types

        def _stub(name):
            mod = types.ModuleType(name)
            mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
            sys.modules[name] = mod
            return mod

        ds = _stub("deepspeed")
        comm = _stub("deepspeed.comm")
        comm_comm = _stub("deepspeed.comm.comm")
        comm.comm = comm_comm
        ds.comm = comm


def _build_ref_model():
    import torch

    from test_golden_parity import _sdpa_flash, _stub_modules

    _ref_path()
    _stub_modules()
    import models.wan.model as ref_model_mod
    from models.wan.model import WanModel

    ref_model_mod.flash_attention = _sdpa_flash
    torch.manual_seed(0)
    m = WanModel(model_type="t2v", patch_size=(1, 2, 2), text_len=16,
                 in_dim=16, dim=64, ffn_dim=128, freq_dim=32, text_dim=32,
                 out_dim=16, num_heads=4, num_layers=2)
    return m.float().train()


def _ref_forward(m, x_t, t_scaled, ctx_t):
    """Compose the reference layer stack exactly as wan.py to_layers drives
    model.py (InitialLayer embeddings -> blocks -> head -> unpatchify)."""
    import torch

    from models.wan.model import sinusoidal_embedding_1d

    e = m.time_embedding(
        sinusoidal_embedding_1d(m.freq_dim, t_scaled).float())
    e0 = m.time_projection(e).unflatten(1, (6, m.dim)).unsqueeze(1)
    context = m.text_embedding(ctx_t)
    h = m.patch_embedding(x_t)
    grid_sizes = torch.tensor([list(h.shape[2:])] * x_t.shape[0],
                              dtype=torch.long)
    h = h.flatten(2).transpose(1, 2)
    seq_lens = torch.tensor([h.shape[1]] * x_t.shape[0], dtype=torch.long)
    for block in m.blocks:
        h = block(h, e=e0, seq_lens=seq_lens, grid_sizes=grid_sizes,
                  freqs=m.freqs, context=context, context_lens=None)
    h = m.head(h, e.unsqueeze(1))
    out = m.unpatchify(h, grid_sizes)
    return torch.stack([o for o in out], dim=0)


def test_t_distribution_table_matches_reference():
    """Our analytic icdf sampling == the reference's 10k-bucket table
    (utils/common.py get_t_distribution) at matching quantiles, with and
    without the wan `shift` transform."""
    import torch

    _ref_path()
    from utils.common import get_t_distribution

    import jax.numpy as jnp

    from diffusion_pipe_tpu.training.flow import (
        TimestepDistribution,
        sample_timesteps,
    )

    from utils.common import slice_t_distribution

    from diffusion_pipe_tpu.training.flow import (
        _base_cdf,
        _inverse_time_shift,
    )

    n_buckets = 10_000
    delta = 1.0 / n_buckets
    for mc in ({}, {"sigmoid_scale": 1.6}, {"shift": 3.0},
               {"shift": 5.0, "min_t": 0.3, "max_t": 0.9}):
        full = get_t_distribution(mc)
        if shift := mc.get("shift"):
            full = (full * shift) / (1 + (shift - 1) * full)
        min_t = mc.get("min_t", 0.0)
        max_t = mc.get("max_t", 1.0)
        start = int(torch.searchsorted(full, min_t))
        table = slice_t_distribution(full, min_t, max_t)
        tdist = TimestepDistribution.from_model_config(mc)

        # our truncation bounds in base-quantile space (what the `quantile`
        # arg interpolates between)
        qmin = (float(_base_cdf(tdist, _inverse_time_shift(
            tdist, jnp.asarray(min_t)))) if min_t > 0.0 else 0.0)
        qmax = (float(_base_cdf(tdist, _inverse_time_shift(
            tdist, jnp.asarray(max_t)))) if max_t < 1.0 else 1.0)

        n = len(table)
        for idx in (0, n // 7, n // 3, n // 2, (5 * n) // 6, n - 1):
            # reference table entry idx sits at this quantile of the FULL
            # distribution (linspace(delta, 1-delta, n_buckets))
            q_ref = delta + (start + idx) * (1 - 2 * delta) / (n_buckets - 1)
            u = (q_ref - qmin) / (qmax - qmin)
            ours = float(np.asarray(sample_timesteps(
                None, 1, tdist, quantile=u))[0])
            ref = float(table[idx])
            assert abs(ours - ref) < 2e-3, (mc, idx, ours, ref)


def test_wan_fullft_loss_curve_matches_reference():
    import torch
    import torch.nn.functional as F

    import jax
    import jax.numpy as jnp

    from diffusion_pipe_tpu.models.wan import (
        WanPipeline,
        convert_wan_weights,
    )
    from diffusion_pipe_tpu.training.optimizers import get_optimizer
    from diffusion_pipe_tpu.training.train_state import predicate_from_config
    from diffusion_pipe_tpu.training.trainer import (
        init_train_state,
        make_train_step,
    )

    m = _build_ref_model()

    # --- shared randomness ------------------------------------------------
    steps = 12
    bs = 2
    rng = np.random.default_rng(7)
    latents = rng.standard_normal((bs, 16, 1, 8, 8)).astype(np.float32)
    ctx = np.zeros((bs, 16, 32), np.float32)
    ctx[:, :5] = rng.standard_normal((bs, 5, 32)).astype(np.float32)
    seq_lens = np.array([5, 5], np.int32)

    _ref_path()
    from utils.common import get_t_distribution

    # sample_t draws torch.randint indices; share numpy indices instead so
    # both frameworks see the exact same t values from the reference table
    table = get_t_distribution({})
    t_steps = [
        table[torch.from_numpy(
            rng.integers(0, len(table), (bs,)).astype(np.int64))].numpy()
        for _ in range(steps)
    ]
    noise_steps = [
        rng.standard_normal(latents.shape).astype(np.float32)
        for _ in range(steps)
    ]

    # --- torch side (reference math) ---------------------------------------
    lr, wd = 1e-3, 0.01
    params_wd = [p for p in m.parameters() if p.ndim > 1]
    params_no_wd = [p for p in m.parameters() if p.ndim == 1]
    opt_t = torch.optim.AdamW(
        [{"params": params_wd, "weight_decay": wd},
         {"params": params_no_wd, "weight_decay": 0.0}],
        lr=lr, betas=(0.9, 0.999), eps=1e-8)

    losses_ref = []
    for s in range(steps):
        t = torch.from_numpy(t_steps[s]).float()
        x0 = torch.from_numpy(noise_steps[s])
        x1 = torch.from_numpy(latents)
        te = t.view(-1, 1, 1, 1, 1)
        x_t = (1 - te) * x1 + te * x0
        target = x0 - x1
        out = _ref_forward(m, x_t, t * 1000.0, torch.from_numpy(ctx))
        loss = F.mse_loss(out.float(), target.float())
        opt_t.zero_grad()
        loss.backward()
        torch.nn.utils.clip_grad_norm_(m.parameters(), 1.0)
        opt_t.step()
        losses_ref.append(float(loss))

    # --- our side -----------------------------------------------------------
    class _InjectedWan(WanPipeline):
        """prepare_inputs with externally injected (t, noise): the ONLY
        part of the composition swapped (RNG source), so the trainer's
        noising/forward/loss/clip/optimizer path stays genuine."""

        def prepare_inputs(self, rng_, batch, timestep_quantile=None):
            batch = dict(batch)
            t = batch.pop("fixed_t").astype(jnp.float32)
            noise = batch.pop("fixed_noise").astype(jnp.float32)
            mi, _, mask = super().prepare_inputs(
                rng_, batch, timestep_quantile=timestep_quantile)
            lat = batch["latents"].astype(jnp.float32)
            te = t.reshape(-1, 1, 1, 1, 1)
            mi["x"] = ((1 - te) * lat + te * noise).astype(
                self.wan_config.dtype)
            mi["t"] = t * 1000.0
            return mi, noise - lat, mask

    cfg = {
        "save_every_n_epochs": 1,
        "model": {"type": "wan", "dtype": "float32", "_tiny": True},
        "optimizer": {"type": "adamw", "lr": lr, "betas": [0.9, 0.999],
                      "eps": 1e-8, "weight_decay": wd},
    }
    pipe = _InjectedWan(cfg)
    sd = {k: v.detach().numpy()
          for k, v in _build_ref_model().state_dict().items()}
    params = jax.tree.map(np.asarray,
                          convert_wan_weights(sd, pipe.wan_config))

    opt = get_optimizer(cfg)
    state = init_train_state(pipe, opt, jax.random.PRNGKey(0),
                             predicate_from_config(cfg), params=params)
    step = jax.jit(make_train_step(pipe, opt, gradient_clipping=1.0))

    losses_ours = []
    for s in range(steps):
        batch = {
            "latents": jnp.asarray(latents),
            "text_embeddings": jnp.asarray(ctx),
            "seq_lens": jnp.asarray(seq_lens),
            "fixed_t": jnp.asarray(t_steps[s]),
            "fixed_noise": jnp.asarray(noise_steps[s]),
        }
        state, metrics = step(state, batch, jax.random.PRNGKey(s))
        losses_ours.append(float(metrics["loss"]))

    np.testing.assert_allclose(
        losses_ours, losses_ref, rtol=2e-3, atol=2e-4,
        err_msg=f"ours={losses_ours}\nref={losses_ref}")
    # the curve must actually move (both sides training)
    assert losses_ref[-1] != losses_ref[0]


def test_cosmos_predict2_fullft_loss_curve_matches_reference():
    """Second family composed-system parity: logit-normal t -> flow
    noising -> vendored torch MiniTrainDIT forward -> MSE -> global-norm
    clip -> AdamW(wd split), torch (reference math,
    models/cosmos_predict2.py:357-406 prepare_inputs + vendored
    cosmos_predict2_modeling.py) vs our trainer, shared numpy randomness
    on both sides."""
    import torch
    import torch.nn.functional as F

    import jax
    import jax.numpy as jnp

    from test_golden_parity import _stub_torchvision

    from diffusion_pipe_tpu.models.cosmos_predict2 import (
        CosmosPredict2Pipeline,
    )
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
    # .copy(): detach().numpy() aliases torch storage, and the torch
    # optimizer below updates it in place
    sd = {k: v.detach().numpy().copy() for k, v in m.state_dict().items()}

    # --- shared randomness --------------------------------------------------
    steps = 12
    bs = 2
    rng = np.random.default_rng(11)
    latents = rng.standard_normal((bs, 16, 2, 16, 16)).astype(np.float32)
    ctx = rng.standard_normal((bs, 24, 32)).astype(np.float32)
    # reference t: sigmoid of N(0,1) (cosmos_predict2.py:378-393, no shift)
    t_steps = [
        1.0 / (1.0 + np.exp(-rng.standard_normal(bs).astype(np.float32)))
        for _ in range(steps)
    ]
    noise_steps = [
        rng.standard_normal(latents.shape).astype(np.float32)
        for _ in range(steps)
    ]

    # --- torch side (reference math) -----------------------------------------
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
        t = torch.from_numpy(t_steps[s])
        x0 = torch.from_numpy(noise_steps[s])
        x1 = torch.from_numpy(latents)
        te = t.view(-1, 1, 1, 1, 1)
        x_t = (1 - te) * x1 + te * x0
        target = x0 - x1
        out = m(x_t, t, torch.from_numpy(ctx), padding_mask=pad)
        loss = F.mse_loss(out.float(), target.float())
        opt_t.zero_grad()
        loss.backward()
        torch.nn.utils.clip_grad_norm_(m.parameters(), 1.0)
        opt_t.step()
        losses_ref.append(float(loss))

    # --- our side -------------------------------------------------------------
    class _InjectedCP2(CosmosPredict2Pipeline):
        def prepare_inputs(self, rng_, batch, timestep_quantile=None):
            batch = dict(batch)
            t = batch.pop("fixed_t").astype(jnp.float32)
            noise = batch.pop("fixed_noise").astype(jnp.float32)
            mi, _, mask = super().prepare_inputs(
                rng_, batch, timestep_quantile=timestep_quantile)
            lat = batch["latents"].astype(jnp.float32)
            te = t.reshape(-1, 1, 1, 1, 1)
            mi["x"] = ((1 - te) * lat + te * noise).astype(
                self.cp_config.dtype)
            mi["t"] = t
            return mi, noise - lat, mask

    cfg = {
        "save_every_n_epochs": 1,
        "model": {"type": "cosmos_predict2", "dtype": "float32",
                  "_tiny": True},
        "optimizer": {"type": "adamw", "lr": lr, "betas": [0.9, 0.999],
                      "eps": 1e-8, "weight_decay": wd},
    }
    pipe = _InjectedCP2(cfg)
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
            "t5_embed": jnp.asarray(ctx),
            "fixed_t": jnp.asarray(t_steps[s]),
            "fixed_noise": jnp.asarray(noise_steps[s]),
        }
        state, metrics = step(state, batch, jax.random.PRNGKey(s))
        losses_ours.append(float(metrics["loss"]))

    np.testing.assert_allclose(
        losses_ours, losses_ref, rtol=2e-3, atol=2e-4,
        err_msg=f"ours={losses_ours}\nref={losses_ref}")
    assert losses_ref[-1] != losses_ref[0]
