"""Point-E model family, perceiver, SDF, marching tetrahedra, rotary encoder."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pcdiff.diffusion.configs import DIFFUSION_CONFIGS, diffusion_from_config
from pcdiff.models.configs import MODEL_CONFIGS, model_from_config
from pcdiff.models.point_e import (
    CLIPImageGridUpsamplePointDiffusionTransformer,
    CLIPImagePointDiffusionTransformer,
    PointDiffusionTransformer,
)
from pcdiff.models.rotary import RotaryPartialPointCloudEncoder
from pcdiff.models.sdf import CrossAttentionPointCloudSDFModel

B = 2


def test_point_diffusion_transformer_shapes():
    model = PointDiffusionTransformer(
        n_ctx=16, width=32, layers=2, heads=2, time_token_cond=True
    )
    x = jnp.zeros((B, 16, 3))
    t = jnp.zeros((B,), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), x, t)
    out = model.apply(params, x, t)
    assert out.shape == (B, 16, 3)
    # zero-init output projection: output must be exactly zero at init
    assert float(jnp.abs(out).max()) == 0.0


def test_clip_vec_model_with_embeddings():
    model = CLIPImagePointDiffusionTransformer(
        n_ctx=16, width=32, layers=1, heads=2, time_token_cond=True,
        token_cond=True, cond_drop_prob=0.1, clip_feature_dim=8,
    )
    x = jnp.zeros((B, 16, 3))
    t = jnp.zeros((B,), jnp.int32)
    emb = jnp.ones((B, 8))
    params = model.init(jax.random.PRNGKey(0), x, t, embeddings=emb)
    out = model.apply(params, x, t, embeddings=emb)
    assert out.shape == (B, 16, 3)
    # training-time cond dropout needs the cond_drop rng
    out_train = model.apply(
        params, x, t, embeddings=emb, train=True,
        rngs={"cond_drop": jax.random.PRNGKey(1)},
    )
    assert out_train.shape == (B, 16, 3)


def test_grid_upsampler_unconditional_fallback():
    model = CLIPImageGridUpsamplePointDiffusionTransformer(
        n_ctx=16, cond_ctx=8, width=32, layers=1, heads=2,
        time_token_cond=True, grid_size=2, grid_feature_dim=8,
        channel_scales=(2.0, 2.0, 2.0), channel_biases=(0.0, 0.0, 0.0),
    )
    x = jnp.zeros((B, 16, 3))
    t = jnp.zeros((B,), jnp.int32)
    low_res = jnp.ones((B, 8, 3))
    params = model.init(jax.random.PRNGKey(0), x, t, low_res=low_res)
    out = model.apply(params, x, t, low_res=low_res)  # embeddings=None OK
    assert out.shape == (B, 16, 3)


def test_model_registry_instantiates_all():
    for name, cfg in MODEL_CONFIGS.items():
        small = dict(cfg)
        # shrink for test speed, keep structure
        for k, v in (("width", 32), ("layers", 1), ("heads", 2),
                     ("encoder_layers", 1), ("decoder_layers", 1),
                     ("encoder_heads", 2), ("decoder_heads", 2)):
            if k in small:
                small[k] = v
        model = model_from_config(small)
        assert model is not None, name


def test_diffusion_registry():
    for name, cfg in DIFFUSION_CONFIGS.items():
        d = diffusion_from_config(cfg)
        assert d.num_timesteps == 1024
        assert d.model_var_type == "learned_range"
    spaced = diffusion_from_config({**DIFFUSION_CONFIGS["base40M"],
                                    "respacing": "64"})
    assert spaced.num_timesteps == 64


def test_sdf_model_encode_predict_split():
    model = CrossAttentionPointCloudSDFModel(
        n_ctx=32, width=32, encoder_layers=1, encoder_heads=2,
        decoder_layers=1, decoder_heads=2,
    )
    clouds = jnp.asarray(np.random.default_rng(0).standard_normal((1, 32, 3)),
                         dtype=jnp.float32)
    queries = jnp.zeros((1, 8, 3))
    params = model.init(jax.random.PRNGKey(0), queries, point_clouds=clouds)
    sdf_joint = model.apply(params, queries, point_clouds=clouds)
    encoded = model.apply(
        params, clouds, method=CrossAttentionPointCloudSDFModel.encode_point_clouds
    )
    sdf_split = model.apply(
        params, queries, encoded=encoded,
        method=CrossAttentionPointCloudSDFModel.predict_sdf,
    )
    assert sdf_joint.shape == (1, 8)
    np.testing.assert_allclose(np.asarray(sdf_joint), np.asarray(sdf_split),
                               atol=1e-6)


def test_marching_tetrahedra_sphere():
    from pcdiff.utils.marching import marching_tetrahedra

    n = 24
    grid = np.stack(
        np.meshgrid(*([np.linspace(-1, 1, n)] * 3), indexing="ij"), axis=-1
    )
    volume = np.linalg.norm(grid, axis=-1) - 0.6  # sphere SDF, radius 0.6
    verts, faces = marching_tetrahedra(volume, level=0.0)
    assert len(verts) > 100 and len(faces) > 100
    # vertices lie on the 0.6-radius sphere (in index coords scaled to [-1,1])
    coords = verts / (n - 1) * 2.0 - 1.0
    radii = np.linalg.norm(coords, axis=1)
    assert abs(radii.mean() - 0.6) < 0.02
    assert radii.std() < 0.03
    # all face indices valid
    assert faces.max() < len(verts) and faces.min() >= 0


def test_rotary_encoder_shapes():
    enc = RotaryPartialPointCloudEncoder(
        embed_dim=32, num_tokens=8, num_layers=2, num_heads=4
    )
    pcd = jnp.asarray(
        np.random.default_rng(0).uniform(-0.5, 0.5, (B, 16, 3)),
        dtype=jnp.float32,
    )
    params = enc.init(jax.random.PRNGKey(0), pcd)
    out = enc.apply(params, pcd)
    assert out.shape == (B, 8, 32)
    assert np.isfinite(np.asarray(out)).all()
