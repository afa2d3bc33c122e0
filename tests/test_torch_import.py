"""End-to-end weight-port parity: load a reference TwoStreamDenoiser's torch
state_dict into the flax model and compare eval-mode outputs numerically.

This exercises every layer of the model stack (RIN backbone, all four
modality encoders, token-type embeddings) against the actual reference
implementation running under torch.
"""

import numpy as np
import pytest
import torch

from .reference_import import ref_module  # installs timm stub before torch import

ref_model_mod = ref_module("models.model")

import jax
import jax.numpy as jnp

from pcdiff.core.checkpoint import import_two_stream_torch_state
from pcdiff.models import TwoStreamDenoiser

CFG = dict(
    num_points=64,
    num_latents=8,
    cond_drop_prob=0.1,
    input_channels=3,
    output_channels=3,
    latent_dim=32,
    x_dim=32,
    num_blocks=2,
    num_compute_layers=2,
    num_classes=10,
    num_heads=4,
    num_tokens_ppcd=4,
    num_tokens_depth=4,
)


@pytest.fixture(scope="module")
def models_and_inputs():
    torch.manual_seed(0)
    ref = ref_model_mod.TwoStreamDenoiser(**CFG)
    ref.eval()

    ours = TwoStreamDenoiser(**CFG, depth_image_size=512, depth_patch=32)
    variables = import_two_stream_torch_state(ref.state_dict())

    rng = np.random.default_rng(0)
    B = 2
    inputs = dict(
        x=rng.standard_normal((B, 64, 3)).astype(np.float32),
        t=np.array([5, 250], dtype=np.int64),
        class_labels=np.array([1, 7], dtype=np.int64),
        viewpoints=rng.standard_normal((B, 3)).astype(np.float32),
        partial_pcd=rng.uniform(-0.5, 0.5, (B, 64, 3)).astype(np.float32),
        depth_maps=rng.random((B, 512, 512, 1)).astype(np.float32),
    )
    return ref, ours, variables, inputs


def test_param_tree_covers_model(models_and_inputs):
    ref, ours, variables, inputs = models_and_inputs
    init_vars = ours.init(
        jax.random.PRNGKey(0),
        jnp.asarray(inputs["x"]), jnp.asarray(inputs["t"]),
        class_labels=jnp.asarray(inputs["class_labels"]),
        viewpoints=jnp.asarray(inputs["viewpoints"]),
        partial_pcd=jnp.asarray(inputs["partial_pcd"]),
        depth_maps=jnp.asarray(inputs["depth_maps"]),
    )
    want = jax.tree.structure(init_vars["params"])
    got = jax.tree.structure(variables["params"])
    assert got == want, "imported param tree structure differs from init tree"
    # shapes must agree leaf-by-leaf
    for (kp, a), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(init_vars["params"])[0][:10000],
        jax.tree_util.tree_flatten_with_path(variables["params"])[0],
    ):
        assert np.shape(a) == np.shape(b), f"{kp}: {np.shape(a)} vs {np.shape(b)}"


def test_forward_parity_with_reference(models_and_inputs):
    ref, ours, variables, inputs = models_and_inputs

    with torch.no_grad():
        ref_eps, ref_latent = ref(
            torch.from_numpy(inputs["x"]).permute(0, 2, 1),  # [B, 3, N]
            torch.from_numpy(inputs["t"]),
            class_labels=torch.from_numpy(inputs["class_labels"]),
            viewpoints=torch.from_numpy(inputs["viewpoints"]),
            partial_pcd=torch.from_numpy(inputs["partial_pcd"]),
            depth_maps=torch.from_numpy(
                inputs["depth_maps"][..., 0][:, None]  # [B, 1, H, W]
            ),
        )

    eps, latent = ours.apply(
        variables,
        jnp.asarray(inputs["x"]), jnp.asarray(inputs["t"]),
        class_labels=jnp.asarray(inputs["class_labels"]),
        viewpoints=jnp.asarray(inputs["viewpoints"]),
        partial_pcd=jnp.asarray(inputs["partial_pcd"]),
        depth_maps=jnp.asarray(inputs["depth_maps"]),
    )

    np.testing.assert_allclose(
        np.asarray(eps),
        ref_eps.permute(0, 2, 1).numpy(),
        rtol=1e-3, atol=2e-4,
    )
    np.testing.assert_allclose(
        np.asarray(latent), ref_latent.numpy(), rtol=1e-3, atol=2e-4
    )


def test_forward_parity_with_self_conditioning(models_and_inputs):
    ref, ours, variables, inputs = models_and_inputs
    with torch.no_grad():
        _, ref_latent = ref(
            torch.from_numpy(inputs["x"]).permute(0, 2, 1),
            torch.from_numpy(inputs["t"]),
            class_labels=torch.from_numpy(inputs["class_labels"]),
            viewpoints=torch.from_numpy(inputs["viewpoints"]),
            partial_pcd=torch.from_numpy(inputs["partial_pcd"]),
            depth_maps=torch.from_numpy(inputs["depth_maps"][..., 0][:, None]),
        )
        ref_eps2, _ = ref(
            torch.from_numpy(inputs["x"]).permute(0, 2, 1),
            torch.from_numpy(inputs["t"]),
            class_labels=torch.from_numpy(inputs["class_labels"]),
            viewpoints=torch.from_numpy(inputs["viewpoints"]),
            partial_pcd=torch.from_numpy(inputs["partial_pcd"]),
            depth_maps=torch.from_numpy(inputs["depth_maps"][..., 0][:, None]),
            prev_latent=ref_latent,
        )

    _, latent = ours.apply(
        variables,
        jnp.asarray(inputs["x"]), jnp.asarray(inputs["t"]),
        class_labels=jnp.asarray(inputs["class_labels"]),
        viewpoints=jnp.asarray(inputs["viewpoints"]),
        partial_pcd=jnp.asarray(inputs["partial_pcd"]),
        depth_maps=jnp.asarray(inputs["depth_maps"]),
    )
    eps2, _ = ours.apply(
        variables,
        jnp.asarray(inputs["x"]), jnp.asarray(inputs["t"]),
        class_labels=jnp.asarray(inputs["class_labels"]),
        viewpoints=jnp.asarray(inputs["viewpoints"]),
        partial_pcd=jnp.asarray(inputs["partial_pcd"]),
        depth_maps=jnp.asarray(inputs["depth_maps"]),
        prev_latent=latent,
    )
    np.testing.assert_allclose(
        np.asarray(eps2), ref_eps2.permute(0, 2, 1).numpy(), rtol=1e-3, atol=5e-4
    )


def test_export_roundtrip(models_and_inputs):
    """export(import(sd)) reproduces every learnable tensor of the torch
    state_dict (recomputed buffers excluded)."""
    from pcdiff.core.checkpoint import export_two_stream_torch_state

    ref, ours, variables, inputs = models_and_inputs
    exported = export_two_stream_torch_state(variables)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    skipped = {"token_types_template", "pos_embed"}
    for k, v in sd.items():
        if any(s in k for s in skipped):
            continue
        assert k in exported, f"missing exported key: {k}"
        np.testing.assert_allclose(exported[k], v, rtol=1e-6, atol=1e-7,
                                   err_msg=k)
    extra = set(exported) - set(sd)
    assert not extra, f"unexpected exported keys: {sorted(extra)[:5]}"
