"""Measure where the sampler's (server-side) compile wall comes from.

VERDICT r3 #8: cold-compile of the full sampler costs ~450 s (default
program) to ~680 s (guidance-interval program) of SERVER-side XLA time the
jax persistent cache cannot help with. This script quantifies the two
inputs the builder controls:

1. ``sizes`` (CPU, fast): traces each program variant and reports its
   unique-equation count — every jaxpr equation, descending into scan/pjit
   /cond bodies ONCE (no trip-count multiplication), i.e. the amount of
   graph XLA must optimize. The flagship denoiser is ~20k equations; the
   table shows how many *copies* of it each sampler program inlines:
   plain heun = step-0 pair + scan body + final Euler; the
   guidance-interval program adds an unrolled step-0 pair + scan body PER
   SEGMENT (3 segments at the default [0.1, 10] interval).

2. ``cold`` (real TPU, ~10 min per variant): times first-execution wall
   (compile + one batch) for a program variant at a FRESH batch size
   (the axon server caches compiled programs across processes, so a fresh
   shape is the only way to force a cold compile).

Usage:
    python scripts/compile_wall.py sizes
    python scripts/compile_wall.py cold heun_reuse_gi 34   # fresh batch!
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

VARIANTS = {
    # name -> (sampler, guidance_interval, scan_blocks)
    "heun": ("heun", None, False),
    "heun_reuse": ("heun_reuse", None, False),
    "heun_reuse_gi": ("heun_reuse", (0.1, 10.0), False),
    # scan-over-blocks lever (model.scan_blocks): the 6 RCW rounds ride ONE
    # lax.scan body per denoiser copy instead of 6 inlined copies
    "heun_scan": ("heun", None, True),
    "heun_reuse_gi_scan": ("heun_reuse", (0.1, 10.0), True),
}

NUM_POINTS = 1024
STEPS = 64


def _build(sampler_name: str, guidance_interval, batch: int, dtype,
           scan_blocks: bool = False):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pcdiff.diffusion import diffusion_from_betas
    from pcdiff.diffusion.sampler import PointCloudSampler
    from pcdiff.models import TwoStreamDenoiser
    from pcdiff.models.wrapper import BoundTwoStream

    model = TwoStreamDenoiser(
        num_points=NUM_POINTS, num_latents=256, latent_dim=256, x_dim=256,
        num_blocks=6, num_compute_layers=4, num_heads=8, num_classes=10,
        num_tokens_ppcd=256, num_tokens_depth=128, depth_image_size=512,
        depth_patch=32, dtype=dtype, scan_blocks=scan_blocks,
    )
    rng = np.random.default_rng(int.from_bytes(os.urandom(4), "little"))
    batch_kwargs = dict(
        class_labels=jnp.asarray(rng.integers(0, 10, (batch,)), jnp.int32),
        viewpoints=jnp.asarray(rng.standard_normal((batch, 3)), jnp.float32),
        partial_pcd=jnp.asarray(
            rng.uniform(-0.5, 0.5, (batch, NUM_POINTS, 3)), jnp.float32),
        depth_maps=jnp.asarray(rng.random((batch, 512, 512, 1)), jnp.float32),
    )
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0),
        jnp.zeros((batch, NUM_POINTS, 3)), jnp.zeros((batch,), jnp.int32),
        **batch_kwargs,
    )
    sampler = PointCloudSampler(
        models=[BoundTwoStream(model, params)],
        diffusions=[diffusion_from_betas("linear", 1000)],
        num_points=[NUM_POINTS], aux_channels=[], guidance_scale=[3.0],
        clip_denoised=True, use_karras=[True], karras_steps=[STEPS],
        sigma_min=[1e-3], sigma_max=[120.0], s_churn=[0.0],
        sampler=sampler_name, guidance_interval=guidance_interval,
    )

    def run(key, b):
        return sampler.sample_batch(batch, b, key)

    return run, batch_kwargs


def _count_eqns(jaxpr) -> int:
    """Unique equations: nested bodies counted ONCE (compile-cost proxy,
    unlike pcdiff.utils.flops which multiplies scans out for FLOPs)."""
    if hasattr(jaxpr, "jaxpr"):
        jaxpr = jaxpr.jaxpr
    total = 0
    for eqn in jaxpr.eqns:
        total += 1
        for key in ("jaxpr", "call_jaxpr", "fun_jaxpr", "branches", "cond_jaxpr",
                    "body_jaxpr"):
            sub = eqn.params.get(key)
            if sub is None:
                continue
            subs = sub if isinstance(sub, (tuple, list)) else (sub,)
            for s in subs:
                if hasattr(s, "eqns") or hasattr(s, "jaxpr"):
                    total += _count_eqns(s)
    return total


def sizes():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    for name, (sampler_name, gi, scan) in VARIANTS.items():
        t0 = time.perf_counter()
        run, batch = _build(sampler_name, gi, batch=32, dtype=jnp.bfloat16,
                            scan_blocks=scan)
        jaxpr = jax.make_jaxpr(run)(jax.random.PRNGKey(0), batch)
        n = _count_eqns(jaxpr)
        print(f"{name:16s} eqns={n:8d}  trace_s={time.perf_counter()-t0:6.1f}",
              flush=True)


def cold(variant: str, batch: int):
    import jax
    import numpy as np
    import jax.numpy as jnp

    sampler_name, gi, scan = VARIANTS[variant]
    print(f"devices={jax.devices()}", flush=True)
    run, batch_kwargs = _build(sampler_name, gi, batch, jnp.bfloat16,
                               scan_blocks=scan)
    jrun = jax.jit(run)
    key = jax.random.PRNGKey(int.from_bytes(os.urandom(4), "little"))
    t0 = time.perf_counter()
    out = jrun(key, batch_kwargs)
    first = float(np.asarray(out).sum())  # host fetch = real completion
    t_first = time.perf_counter() - t0
    t0 = time.perf_counter()
    out = jrun(jax.random.PRNGKey(int.from_bytes(os.urandom(4), "little")),
               batch_kwargs)
    _ = float(np.asarray(out).sum()) + first
    t_warm = time.perf_counter() - t0
    print(f"{variant} batch={batch}: first_call_s={t_first:.1f} "
          f"warm_call_s={t_warm:.1f} compile_s~={t_first - t_warm:.1f}",
          flush=True)


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "sizes"
    if mode == "sizes":
        sizes()
    elif mode == "cold":
        cold(sys.argv[2], int(sys.argv[3]))
    else:
        raise SystemExit(f"unknown mode {mode!r}")
