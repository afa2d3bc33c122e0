"""Text -> point cloud with the Point-E stack (notebook equivalent).

Mirrors ``/root/reference/examples/text2pointcloud.ipynb``: base40M-textvec
conditioned on a CLIP text embedding, then the upsampler stage, sampled with
the same per-stage guidance and sigma settings as the reference registries.

Requires the published Point-E + CLIP checkpoints (downloaded via
``pcdiff.models.download`` or supplied locally).
"""

import argparse

import jax
import jax.numpy as jnp
import numpy as np


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--prompt", default="a red motorcycle")
    parser.add_argument("--base-checkpoint", required=True,
                        help="base40M-textvec .pt checkpoint path")
    parser.add_argument("--upsample-checkpoint", required=True)
    parser.add_argument("--clip-checkpoint", required=True,
                        help="OpenAI CLIP ViT-L/14 state_dict path")
    parser.add_argument("--tokens", default=None,
                        help="npy file of pre-tokenized prompt ids [1, 77]")
    parser.add_argument("--output", default="text2pc.ply")
    args = parser.parse_args()

    import torch

    from pcdiff.core.point_e_import import import_point_e_torch_state
    from pcdiff.diffusion.configs import DIFFUSION_CONFIGS, diffusion_from_config
    from pcdiff.diffusion.sampler import PointCloudSampler
    from pcdiff.models.clip import ImageCLIP, import_clip_torch_state
    from pcdiff.models.configs import MODEL_CONFIGS, model_from_config

    base = model_from_config(MODEL_CONFIGS["base40M-textvec"])
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

    if args.tokens:
        tokens = np.load(args.tokens)
    else:
        tokens = clip._tokenize([args.prompt])  # needs a BPE tokenizer
    text_emb = clip.embed_text(np.asarray(tokens))

    def base_fn(x, t, embeddings=None, **kw):
        return base.apply(base_vars, x, t, embeddings=embeddings)

    def up_fn(x, t, low_res=None, embeddings=None, **kw):
        return upsampler.apply(up_vars, x, t, low_res=low_res)

    sampler = PointCloudSampler(
        models=[base_fn, up_fn],
        diffusions=[
            diffusion_from_config(DIFFUSION_CONFIGS["base40M-textvec"]),
            diffusion_from_config(DIFFUSION_CONFIGS["upsample"]),
        ],
        num_points=[1024, 4096 - 1024],
        aux_channels=["R", "G", "B"],
        guidance_scale=[3.0, 0.0],
        model_kwargs_key_filter=["embeddings", ""],
        use_karras=[True, True], karras_steps=[64, 64],
        sigma_min=[1e-3, 1e-3], sigma_max=[120, 160], s_churn=[3, 0],
    )
    out = sampler.sample_batch(1, {"embeddings": text_emb},
                               jax.random.PRNGKey(0))
    pc = sampler.output_to_point_clouds(out)[0]
    with open(args.output, "wb") as f:
        pc.write_ply(f)
    print(f"wrote {args.output} ({len(pc)} points)")


if __name__ == "__main__":
    main()
