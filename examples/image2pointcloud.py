"""Image -> point cloud with the Point-E stack (notebook equivalent).

Mirrors ``/root/reference/examples/image2pointcloud.ipynb``: base40M (CLIP
token-grid conditioned) + upsampler stages.
"""

import argparse

import jax
import numpy as np


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--image", required=True, help="RGB image path")
    parser.add_argument("--base-checkpoint", required=True)
    parser.add_argument("--upsample-checkpoint", required=True)
    parser.add_argument("--clip-checkpoint", required=True)
    parser.add_argument("--output", default="image2pc.ply")
    args = parser.parse_args()

    import torch
    from PIL import Image

    from pcdiff.core.point_e_import import import_point_e_torch_state
    from pcdiff.diffusion.configs import DIFFUSION_CONFIGS, diffusion_from_config
    from pcdiff.diffusion.sampler import PointCloudSampler
    from pcdiff.models.clip import ImageCLIP, import_clip_torch_state, preprocess_image
    from pcdiff.models.configs import MODEL_CONFIGS, model_from_config

    base = model_from_config(MODEL_CONFIGS["base40M"])
    upsampler = model_from_config(MODEL_CONFIGS["upsample"])
    base_vars = import_point_e_torch_state(
        torch.load(args.base_checkpoint, map_location="cpu", weights_only=True)
    )
    up_vars = import_point_e_torch_state(
        torch.load(args.upsample_checkpoint, map_location="cpu", weights_only=True)
    )
    clip = ImageCLIP(
        import_clip_torch_state(
            torch.load(args.clip_checkpoint, map_location="cpu", weights_only=True)
        )
    )

    img = np.asarray(Image.open(args.image).convert("RGB"))
    pixels = preprocess_image(img)[None]
    grid = clip.embed_images_grid(pixels)  # [1, grid**2, width]

    def base_fn(x, t, embeddings=None, **kw):
        return base.apply(base_vars, x, t, embeddings=embeddings)

    def up_fn(x, t, low_res=None, embeddings=None, **kw):
        return upsampler.apply(up_vars, x, t, low_res=low_res,
                               embeddings=embeddings)

    sampler = PointCloudSampler(
        models=[base_fn, up_fn],
        diffusions=[
            diffusion_from_config(DIFFUSION_CONFIGS["base40M"]),
            diffusion_from_config(DIFFUSION_CONFIGS["upsample"]),
        ],
        num_points=[1024, 4096 - 1024],
        aux_channels=["R", "G", "B"],
        guidance_scale=[3.0, 0.0],
        use_karras=[True, True], karras_steps=[64, 64],
        sigma_min=[1e-3, 1e-3], sigma_max=[120, 160], s_churn=[3, 0],
    )
    out = sampler.sample_batch(1, {"embeddings": grid}, jax.random.PRNGKey(0))
    pc = sampler.output_to_point_clouds(out)[0]
    with open(args.output, "wb") as f:
        pc.write_ply(f)
    print(f"wrote {args.output} ({len(pc)} points)")


if __name__ == "__main__":
    main()
