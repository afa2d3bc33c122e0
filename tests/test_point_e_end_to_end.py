"""The text2pointcloud notebook flow end-to-end on synthesized checkpoints.

The published Point-E checkpoints are unreachable in this environment, so
tiny random checkpoints are synthesized IN THE TORCH SCHEMA (reference
``models/transformer.py`` state_dict key layout incl. the CLIP conditioning
heads), converted through :func:`import_point_e_torch_state`, and driven
through the identical multi-stage pipeline the example uses: textvec base
stage with CFG -> ``low_res`` handoff (reference ``diffusion/sampler.py:127-128``)
-> grid upsampler stage -> RGB split -> PLY.
"""

import io

import numpy as np
import pytest
import torch

from .reference_import import ref_module

ref_tx = ref_module("models.transformer")

import jax
import jax.numpy as jnp

from pcdiff.core.point_e_import import import_point_e_torch_state
from pcdiff.diffusion.configs import DIFFUSION_CONFIGS, diffusion_from_config
from pcdiff.diffusion.sampler import PointCloudSampler
from pcdiff.models.point_e import (
    CLIPImageGridUpsamplePointDiffusionTransformer,
    CLIPImagePointDiffusionTransformer,
)

DEV = torch.device("cpu")
CLIP_DIM = 16
WIDTH = 32
N_BASE, N_UP = 16, 32
SCALES = [2.0, 2.0, 2.0, 0.007843137255, 0.007843137255, 0.007843137255]
BIASES = [0.0, 0.0, 0.0, -1.0, -1.0, -1.0]


def _synth_base_checkpoint():
    """Random torch checkpoint in the base40M-textvec schema (vector CLIP
    conditioning head on top of the plain denoiser keys)."""
    torch.manual_seed(0)
    m = ref_tx.PointDiffusionTransformer(
        device=DEV, dtype=torch.float32, input_channels=6, output_channels=12,
        n_ctx=N_BASE, width=WIDTH, layers=2, heads=4, time_token_cond=True,
    )
    with torch.no_grad():
        m.output_proj.weight.normal_(std=0.05)
        m.output_proj.bias.normal_(std=0.05)
    sd = m.state_dict()
    sd["clip_embed.weight"] = torch.randn(WIDTH, CLIP_DIM) * 0.1
    sd["clip_embed.bias"] = torch.randn(WIDTH) * 0.1
    return sd


def _synth_upsample_checkpoint():
    """Random torch checkpoint in the 'upsample' schema (grid CLIP head =
    Sequential(LayerNorm, Linear) on top of the upsampler keys)."""
    torch.manual_seed(1)
    m = ref_tx.UpsamplePointDiffusionTransformer(
        device=DEV, dtype=torch.float32, input_channels=6, output_channels=12,
        n_ctx=N_UP, cond_ctx=N_BASE, width=WIDTH, layers=1, heads=4,
        time_token_cond=True, channel_scales=SCALES, channel_biases=BIASES,
    )
    with torch.no_grad():
        m.output_proj.weight.normal_(std=0.05)
        m.output_proj.bias.normal_(std=0.05)
    sd = m.state_dict()
    sd["clip_embed.0.weight"] = torch.randn(CLIP_DIM)
    sd["clip_embed.0.bias"] = torch.randn(CLIP_DIM) * 0.1
    sd["clip_embed.1.weight"] = torch.randn(WIDTH, CLIP_DIM) * 0.1
    sd["clip_embed.1.bias"] = torch.randn(WIDTH) * 0.1
    return sd


@pytest.fixture(scope="module")
def pipeline():
    base = CLIPImagePointDiffusionTransformer(
        input_channels=6, output_channels=12, n_ctx=N_BASE, width=WIDTH,
        layers=2, heads=4, time_token_cond=True, token_cond=True,
        clip_feature_dim=CLIP_DIM, cond_drop_prob=0.1,
    )
    upsampler = CLIPImageGridUpsamplePointDiffusionTransformer(
        input_channels=6, output_channels=12, n_ctx=N_UP, cond_ctx=N_BASE,
        width=WIDTH, layers=1, heads=4, time_token_cond=True,
        grid_size=4, grid_feature_dim=CLIP_DIM,
        channel_scales=tuple(SCALES), channel_biases=tuple(BIASES),
        cond_drop_prob=0.1,
    )
    base_vars = import_point_e_torch_state(_synth_base_checkpoint())
    up_vars = import_point_e_torch_state(_synth_upsample_checkpoint())

    def base_fn(x, t, embeddings=None, **kw):
        return base.apply(base_vars, x, t, embeddings=embeddings)

    def up_fn(x, t, low_res=None, **kw):
        return upsampler.apply(up_vars, x, t, low_res=low_res)

    sampler = PointCloudSampler(
        models=[base_fn, up_fn],
        diffusions=[
            diffusion_from_config(DIFFUSION_CONFIGS["base40M-textvec"]),
            diffusion_from_config(DIFFUSION_CONFIGS["upsample"]),
        ],
        num_points=[N_BASE, N_UP],
        aux_channels=["R", "G", "B"],
        guidance_scale=[3.0, 0.0],
        model_kwargs_key_filter=["embeddings", ""],
        use_karras=[True, True], karras_steps=[8, 8],
        sigma_min=[1e-3, 1e-3], sigma_max=[120, 160], s_churn=[3, 0],
    )
    return sampler


def test_text2pointcloud_flow_with_low_res_handoff(pipeline, rng):
    sampler = pipeline
    text_emb = jnp.asarray(rng.standard_normal((1, CLIP_DIM)), jnp.float32)
    key = jax.random.PRNGKey(0)
    stages = list(
        sampler.sample_batch_progressive(1, {"embeddings": text_emb}, key)
    )
    assert len(stages) == 2
    stage1, final = np.asarray(stages[0]), np.asarray(stages[1])
    assert stage1.shape == (1, N_BASE, 6)
    assert final.shape == (1, N_BASE + N_UP, 6)
    assert np.isfinite(final).all()
    # the upsampler stage received stage 1's output as low_res; the final
    # cloud is [stage1 | new points] (reference sampler.py:165-171)
    np.testing.assert_array_equal(final[:, :N_BASE], stage1)

    # same flow through the non-progressive API must agree
    out = np.asarray(sampler.sample_batch(1, {"embeddings": text_emb}, key))
    np.testing.assert_allclose(out, final, rtol=1e-5, atol=1e-6)


def test_output_to_point_clouds_and_ply(pipeline, rng):
    sampler = pipeline
    text_emb = jnp.asarray(rng.standard_normal((1, CLIP_DIM)), jnp.float32)
    out = sampler.sample_batch(1, {"embeddings": text_emb}, jax.random.PRNGKey(1))
    pcs = sampler.output_to_point_clouds(out)
    assert len(pcs) == 1
    pc = pcs[0]
    assert pc.coords.shape == (N_BASE + N_UP, 3)
    assert set(pc.channels) == {"R", "G", "B"}
    for v in pc.channels.values():
        assert (v >= 0).all() and (v <= 1).all()
    buf = io.BytesIO()
    pc.write_ply(buf)
    assert buf.getbuffer().nbytes > 100
