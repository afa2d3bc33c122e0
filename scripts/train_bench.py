"""Training-step throughput on the flagship config (one chip).

Measures the full jitted train step (self-conditioning bootstrap prob 1.0,
chamfer curriculum ON — the most expensive configuration, matching
docs/performance.md "Training throughput") and reports ms/step, optionally
with the Pallas attention-backward kernel disabled to isolate its
contribution.

Inputs are drawn from os.urandom-seeded RNG and each step's metrics are
host-fetched: both required to defeat the axon runtime's cross-process
execution cache (CLAUDE.md).

Usage: python scripts/train_bench.py [--xla-bwd | --xla-attn]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _entropy_seed(bits: int = 31) -> int:
    return int.from_bytes(os.urandom(8), "little") % (2**bits)


def main() -> None:
    import numpy as np
    import jax
    import jax.numpy as jnp

    from pcdiff import ops
    from pcdiff.data import synthetic_batch
    from pcdiff.diffusion import diffusion_from_betas
    from pcdiff.models import TwoStreamDenoiser
    from pcdiff.train import create_train_state, make_train_step

    mode = "default"
    if "--xla-bwd" in sys.argv:
        ops.flash_attention._use_pallas_mh_bwd = lambda *a: False
        mode = "xla-bwd"
    if "--xla-attn" in sys.argv:
        ops.flash_attention.set_attention_backend("xla")
        mode = "xla-attn"
    if "--lndense-off" in sys.argv:
        from pcdiff.models.attention import set_ln_dense_fusion

        set_ln_dense_fusion("off")
        mode = "lndense-off"
    if "--lnmlp-on" in sys.argv:  # whole-MLP fusion (opt-in A/B)
        from pcdiff.models.attention import set_ln_mlp_fusion

        set_ln_mlp_fusion("on")
        mode = "lnmlp-on"
    if "--lndense-bwd" in sys.argv:  # kept for reproducing old logs
        from pcdiff.ops.ln_dense import set_lndense_bwd_backend

        set_lndense_bwd_backend("auto")
        mode = "lndense-bwd"
    if "--xla-lndense-bwd" in sys.argv:
        # ablation: the autodiff recompute through the fused forward —
        # OOMs the flagship step on a 16 GB chip (docs/performance.md)
        from pcdiff.ops.ln_dense import set_lndense_bwd_backend

        set_lndense_bwd_backend("xla")
        mode = "xla-lndense-bwd"
    dtype = jnp.float32
    if "--bf16" in sys.argv:
        # bf16 activations in the train step (params/optimizer stay fp32):
        # targets the elementwise backward chains (128 ms of 393 in the
        # fp32 trace, VPU-byte-bound) by halving their bytes and dropping
        # the f32<->bf16 converts XLA threads through them
        dtype = jnp.bfloat16
        mode = f"{mode}+bf16" if mode != "default" else "bf16"
    profile_dir = next(
        (a.split("=", 1)[1] for a in sys.argv if a.startswith("--profile=")),
        None,
    )

    B, N = 32, 1024
    model = TwoStreamDenoiser(
        num_points=N, num_latents=256, latent_dim=256, x_dim=256,
        num_blocks=6, num_compute_layers=4, num_heads=8, num_classes=10,
        num_tokens_ppcd=256, num_tokens_depth=128, depth_image_size=512,
        depth_patch=32, dtype=dtype,
    )
    rng = np.random.default_rng(_entropy_seed())
    raw = synthetic_batch(rng, batch_size=B, num_points=N, num_partial=N,
                          depth_size=512)
    batch = {k: jnp.asarray(v) for k, v in raw.items()}
    params = model.init(
        jax.random.PRNGKey(_entropy_seed()), batch["target"],
        jnp.zeros((B,), jnp.int32),
        class_labels=batch["class_labels"], viewpoints=batch["viewpoints"],
        partial_pcd=batch["partial_pcd"], depth_maps=batch["depth_maps"],
    )
    state = create_train_state(model, params, lr=3e-4, total_steps=100)
    diffusion = diffusion_from_betas("linear", 1000)
    step = make_train_step(model, diffusion, self_conditioning_prob=1.0)

    key = jax.random.PRNGKey(_entropy_seed())
    state, metrics = step(state, batch, jax.random.fold_in(key, 0),
                          jnp.asarray(True))
    float(metrics["loss"])  # compile + completion barrier

    iters = 5
    t0 = time.perf_counter()
    for i in range(iters):
        state, metrics = step(state, batch, jax.random.fold_in(key, i + 1),
                              jnp.asarray(True))
        float(metrics["loss"])  # host fetch: the only real barrier on axon
    dt = (time.perf_counter() - t0) / iters
    print(f"train_step[{mode}]: {dt * 1e3:.1f} ms/step "
          f"({B / dt:.1f} samples/s)")

    if profile_dir:  # device trace of 2 steady-state steps (xplane+chrome)
        from pcdiff.core.logging import profile_trace

        with profile_trace(profile_dir, enabled=True):
            for i in range(2):
                state, metrics = step(
                    state, batch, jax.random.fold_in(key, 100 + i),
                    jnp.asarray(True))
                float(metrics["loss"])
        print(f"trace written to {profile_dir}")


if __name__ == "__main__":
    main()
