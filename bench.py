"""Benchmark: sampling throughput of the flagship completion model.

Matches the reference's headline benchmark setting (BASELINE.md): 1024-point
clouds, 64-step Karras Heun sampling, classifier-free guidance (2x batched
forwards), batch 32, one chip. Reference: ~0.116 point-clouds/sec on one
CUDA GPU (evaluation_log1.txt timestamps).

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import time

import numpy as np

BASELINE_CLOUDS_PER_SEC = 32.0 / 276.0  # reference GPU sampling throughput


def _entropy_seed(bits: int = 31) -> int:
    # The axon runtime caches executions whose program and (large) inputs
    # repeat — across processes. Every benchmark tensor must be unique.
    return int.from_bytes(os.urandom(8), "little") % (2**bits)


def main():
    import jax

    # Persist compiled executables across processes (the full 64-step
    # sampler is a ~25 min cold compile on the axon backend); harmless
    # no-op if the backend does not support serialization.
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/pcdiff_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
    except Exception:
        pass

    import jax.numpy as jnp

    from pcdiff.diffusion import diffusion_from_betas
    from pcdiff.diffusion.sampler import PointCloudSampler
    from pcdiff.models import TwoStreamDenoiser
    from pcdiff.models.wrapper import BoundTwoStream

    B = 32
    NUM_POINTS = 1024
    # The official headline metric is the reference's 64-step setting; the
    # env knob measures the validated fast preset (configs/modelnet_fast.
    # yaml, docs/trained_gates.json) without changing the recorded metric
    # name when it differs from 64.
    STEPS = int(os.environ.get("PCDIFF_BENCH_STEPS", "64"))

    # bf16 activations are the default: quality-gated neutral on a trained
    # checkpoint (docs/trained_gates.json "bf16": CD 0.004817 vs fp32
    # 0.004831 on held-out instances) and +12% throughput (3.52 vs 3.14
    # clouds/s). PCDIFF_BENCH_DTYPE=float32 reproduces the fp32 parity
    # configuration of the earlier recorded baselines.
    dtype = (
        jnp.float32
        if os.environ.get("PCDIFF_BENCH_DTYPE") == "float32"
        else jnp.bfloat16
    )
    model = TwoStreamDenoiser(
        num_points=NUM_POINTS, num_latents=256, latent_dim=256, x_dim=256,
        num_blocks=6, num_compute_layers=4, num_heads=8, num_classes=10,
        num_tokens_ppcd=256, num_tokens_depth=128, depth_image_size=512,
        depth_patch=32, dtype=dtype,
    )
    rng = np.random.default_rng(_entropy_seed())
    batch = dict(
        class_labels=jnp.asarray(rng.integers(0, 10, (B,)), dtype=jnp.int32),
        viewpoints=jnp.asarray(rng.standard_normal((B, 3)), dtype=jnp.float32),
        partial_pcd=jnp.asarray(
            rng.uniform(-0.5, 0.5, (B, NUM_POINTS, 3)), dtype=jnp.float32
        ),
        depth_maps=jnp.asarray(rng.random((B, 512, 512, 1)), dtype=jnp.float32),
    )
    params = model.init(
        jax.random.PRNGKey(_entropy_seed()),
        jnp.zeros((B, NUM_POINTS, 3)), jnp.zeros((B,), jnp.int32),
        **batch,
    )
    bound = BoundTwoStream(model, params)

    sampler = PointCloudSampler(
        models=[bound],
        diffusions=[diffusion_from_betas("linear", 1000)],
        num_points=[NUM_POINTS], aux_channels=[], guidance_scale=[3.0],
        clip_denoised=True, use_karras=[True], karras_steps=[STEPS],
        sigma_min=[1e-3], sigma_max=[120.0], s_churn=[0.0],
    )

    run = jax.jit(
        lambda key: sampler.sample_batch(B, batch, key)
    )

    base_key = jax.random.PRNGKey(_entropy_seed())

    # warmup / compile (materialize to be safe against async elision)
    out = run(jax.random.fold_in(base_key, 0))
    float(jnp.sum(out))

    iters = 3
    t0 = time.perf_counter()
    for i in range(iters):
        out = run(jax.random.fold_in(base_key, i + 1))
        # block_until_ready does NOT wait under the axon tunnel; a host
        # fetch is the only reliable completion barrier (CLAUDE.md).
        float(jnp.sum(out))
    dt = (time.perf_counter() - t0) / iters

    clouds_per_sec = B / dt
    print(
        json.dumps(
            {
                "metric": f"sampling_throughput_1024pt_{STEPS}step_cfg",
                "value": round(clouds_per_sec, 4),
                "unit": "clouds/sec",
                "vs_baseline": round(clouds_per_sec / BASELINE_CLOUDS_PER_SEC, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
