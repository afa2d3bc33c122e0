"""Weight-port parity for the Point-E transformer family and SDF model:
instantiate the reference torch modules, import their state_dicts, compare
eval-mode outputs."""

import numpy as np
import pytest
import torch

from .reference_import import ref_module

ref_tx = ref_module("models.transformer")
ref_sdf = ref_module("models.sdf")

import jax
import jax.numpy as jnp

from pcdiff.core.point_e_import import (
    import_point_e_torch_state,
    import_sdf_torch_state,
)
from pcdiff.models.point_e import (
    PointDiffusionTransformer,
    UpsamplePointDiffusionTransformer,
)
from pcdiff.models.sdf import CrossAttentionPointCloudSDFModel

DEV = torch.device("cpu")
B = 2


def test_point_diffusion_transformer_parity(rng):
    torch.manual_seed(0)
    ref = ref_tx.PointDiffusionTransformer(
        device=DEV, dtype=torch.float32, input_channels=3, output_channels=3,
        n_ctx=16, width=32, layers=2, heads=4, time_token_cond=True,
    )
    ref.eval()
    # randomize the zero-initialized output projection so parity is nontrivial
    with torch.no_grad():
        ref.output_proj.weight.normal_(std=0.1)
        ref.output_proj.bias.normal_(std=0.1)

    ours = PointDiffusionTransformer(
        input_channels=3, output_channels=3, n_ctx=16, width=32, layers=2,
        heads=4, time_token_cond=True,
    )
    variables = import_point_e_torch_state(ref.state_dict())

    x = rng.standard_normal((B, 16, 3)).astype(np.float32)
    t = np.array([3, 700], dtype=np.int64)
    with torch.no_grad():
        want = ref(torch.from_numpy(x).permute(0, 2, 1), torch.from_numpy(t))
    got = ours.apply(variables, jnp.asarray(x), jnp.asarray(t))
    np.testing.assert_allclose(
        np.asarray(got), want.permute(0, 2, 1).numpy(), rtol=1e-4, atol=1e-5
    )


def test_upsampler_parity(rng):
    torch.manual_seed(1)
    ref = ref_tx.UpsamplePointDiffusionTransformer(
        device=DEV, dtype=torch.float32, input_channels=3, output_channels=3,
        n_ctx=16, cond_ctx=8, width=32, layers=1, heads=4,
        time_token_cond=True,
        channel_scales=[2.0, 2.0, 2.0], channel_biases=[0.1, 0.0, -0.1],
    )
    ref.eval()
    with torch.no_grad():
        ref.output_proj.weight.normal_(std=0.1)
        ref.output_proj.bias.normal_(std=0.1)

    ours = UpsamplePointDiffusionTransformer(
        input_channels=3, output_channels=3, n_ctx=16, cond_ctx=8, width=32,
        layers=1, heads=4, time_token_cond=True,
        channel_scales=(2.0, 2.0, 2.0), channel_biases=(0.1, 0.0, -0.1),
    )
    variables = import_point_e_torch_state(ref.state_dict())

    x = rng.standard_normal((B, 16, 3)).astype(np.float32)
    low_res = rng.standard_normal((B, 8, 3)).astype(np.float32)
    t = np.array([3, 700], dtype=np.int64)
    with torch.no_grad():
        want = ref(
            torch.from_numpy(x).permute(0, 2, 1), torch.from_numpy(t),
            low_res=torch.from_numpy(low_res).permute(0, 2, 1),
        )
    got = ours.apply(
        variables, jnp.asarray(x), jnp.asarray(t), low_res=jnp.asarray(low_res)
    )
    np.testing.assert_allclose(
        np.asarray(got), want.permute(0, 2, 1).numpy(), rtol=1e-4, atol=1e-5
    )


def test_sdf_parity(rng):
    torch.manual_seed(2)
    ref = ref_sdf.CrossAttentionPointCloudSDFModel(
        device=DEV, dtype=torch.float32, n_ctx=32, width=32,
        encoder_layers=2, encoder_heads=4, decoder_layers=2, decoder_heads=4,
    )
    ref.eval()
    ours = CrossAttentionPointCloudSDFModel(
        n_ctx=32, width=32, encoder_layers=2, encoder_heads=4,
        decoder_layers=2, decoder_heads=4,
    )
    variables = import_sdf_torch_state(ref.state_dict())

    clouds = rng.standard_normal((B, 32, 3)).astype(np.float32)
    queries = rng.standard_normal((B, 8, 3)).astype(np.float32)
    with torch.no_grad():
        want = ref(
            torch.from_numpy(queries).permute(0, 2, 1),
            point_clouds=torch.from_numpy(clouds).permute(0, 2, 1),
        )
    got = ours.apply(
        variables, jnp.asarray(queries), point_clouds=jnp.asarray(clouds)
    )
    np.testing.assert_allclose(np.asarray(got), want.numpy(), rtol=1e-4, atol=1e-5)
