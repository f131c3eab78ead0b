"""VAE round-trip check: encode a media file and decode it back.

Parity tool for reference tools/wan_vae_test.py / hunyuan_video_vae_test.py /
cosmos_vae_test.py (manual numerical-correctness checks for latent caching).

Usage:
  python tools/vae_roundtrip.py --vae flux --weights /models/FLUX.1-dev/vae \
      --input img.png --output roundtrip.png
  python tools/vae_roundtrip.py --vae wan --weights /models/Wan-VAE.pth \
      --input clip.gif --output roundtrip.gif --framerate 16
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--vae", choices=["flux", "sdxl", "sd", "wan"], required=True)
    p.add_argument("--weights", required=True)
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--framerate", type=float, default=16)
    args = p.parse_args()

    from diffusion_pipe_tpu.data.preprocess import PreprocessMediaFile

    is_video = args.vae == "wan"
    pre = PreprocessMediaFile(
        support_video=is_video, framerate=args.framerate if is_video else None
    )
    items = pre((None, args.input), None, None)
    pixels, _ = items[0]

    if args.vae == "wan":
        from diffusion_pipe_tpu.models.wan_vae_convert import load_wan_vae

        vae, params = load_wan_vae(args.weights)
        x = jnp.asarray(pixels)[None]  # [1, C, F, H, W]
        z = vae.apply(params, x, method=type(vae).encode)
        rec = np.asarray(vae.apply(params, z, method=type(vae).decode))[0]
        frames = np.clip((rec.transpose(1, 2, 3, 0) + 1) * 127.5, 0, 255)
        import imageio.v3 as iio

        iio.imwrite(args.output, frames.astype(np.uint8))
    else:
        from diffusion_pipe_tpu.models.autoencoder_kl import (
            AutoencoderKL,
            VAEConfig,
            convert_diffusers_vae,
        )
        from diffusion_pipe_tpu.models.weights import load_safetensors_dir

        cfg = {"flux": VAEConfig.flux, "sdxl": VAEConfig.sdxl,
               "sd": VAEConfig.sd}[args.vae]()
        vae = AutoencoderKL(cfg)
        params = convert_diffusers_vae(load_safetensors_dir(args.weights), cfg)
        x = jnp.asarray(pixels)[None]  # [1, C, H, W]
        z = vae.apply(params, x, method=AutoencoderKL.encode)
        rec = np.asarray(vae.apply(params, z, method=AutoencoderKL.decode))[0]
        from PIL import Image

        arr = np.clip((rec.transpose(1, 2, 0) + 1) * 127.5, 0, 255)
        Image.fromarray(arr.astype(np.uint8)).save(args.output)

    err = float(np.mean((np.asarray(pixels) - rec[: pixels.shape[0]]) ** 2))
    print(f"roundtrip written to {args.output}; pixel MSE vs input: {err:.5f}")


if __name__ == "__main__":
    main()
