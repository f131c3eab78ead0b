"""Apply the training crop/resize transform to a directory for eyeballing.

Parity tool for reference tools/image_resize_test.py.

Usage: python tools/image_resize_test.py INPUT_DIR OUTPUT_DIR WIDTH HEIGHT
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np
from PIL import Image


def main():
    in_dir, out_dir, w, h = (
        Path(sys.argv[1]), Path(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4])
    )
    from diffusion_pipe_tpu.data.preprocess import PreprocessMediaFile

    pre = PreprocessMediaFile()
    out_dir.mkdir(parents=True, exist_ok=True)
    from diffusion_pipe_tpu.common import IMAGE_EXTENSIONS

    for p in sorted(in_dir.iterdir()):
        if p.suffix.lower() not in IMAGE_EXTENSIONS:
            continue
        px, _ = pre((None, str(p)), None, (w, h, 1))[0]
        arr = np.clip((px.transpose(1, 2, 0) + 1) * 127.5, 0, 255)
        Image.fromarray(arr.astype(np.uint8)).save(out_dir / p.name)
        print(p.name, "->", arr.shape[:2])


if __name__ == "__main__":
    main()
