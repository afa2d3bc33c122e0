"""Real multi-PROCESS distributed execution on a virtual CPU cluster.

The 8-device single-process dryrun (``__graft_entry__.dryrun_multichip``)
validates the SPMD shardings but never exercises the multi-host surfaces.
This script runs a genuine 2-process x 4-device cluster
(``jax.distributed.initialize`` over a local coordinator, gloo collectives)
and checks, for real:

1. cluster formation — ``process_count()==2``, 8 global / 4 local devices;
2. per-process ``BatchLoader`` shards — disjoint halves of one epoch-seeded
   global permutation (the ``DistributedSampler`` contract,
   ``/root/reference/train.py:39-49,155-156``);
3. per-process RNG streams — ``fold_in_process`` yields distinct keys
   (the reference's seed+rank offset, ``train.py:119``);
4. gradient agreement — one SPMD train step over the 2-process mesh
   produces the SAME loss / grad-norm / updated-params fingerprint as a
   single-process 8-device run on the identical global batch (the DDP
   all-reduce equivalence, ``train.py:84-90,243-247``);
5. cross-process orbax save/restore — all processes participate in one
   checkpoint save; restore round-trips the updated state.

Run (the launcher spawns both workers and the single-process comparator)::

    python scripts/multiprocess_dryrun.py

Exit code 0 + the final ``MULTIPROCESS DRYRUN: all phases ok`` line is the
pass criterion; tee stdout to docs/evidence/ for the record.
"""

from __future__ import annotations

import json
import os
import socket
import subprocess
import sys
import tempfile

import numpy as np

NPROC = 2
LOCAL_DEVICES = 4
GLOBAL_DEVICES = NPROC * LOCAL_DEVICES
GLOBAL_BATCH = 8
DATASET_N = 32
SEED = 7

_RANK_ENV = "PCDIFF_MP_RANK"
_MODE_ENV = "PCDIFF_MP_MODE"  # "worker" | "single"
_COORD_ENV = "PCDIFF_MP_COORD"
_CKPT_ENV = "PCDIFF_MP_CKPT"


class _SynthDataset:
    """Map-style dataset with per-index deterministic items, so any sharding
    of the same indices reconstructs the same global batch bit-exactly."""

    def __init__(self, n: int, num_points: int = 32, depth_size: int = 32):
        self.n = n
        self.num_points = num_points
        self.depth_size = depth_size

    def __len__(self):
        return self.n

    def __getitem__(self, idx: int, rng=None):
        from pcdiff.data import synthetic_batch

        item_rng = np.random.default_rng(1_000_003 + idx)
        b = synthetic_batch(
            item_rng, batch_size=1, num_points=self.num_points,
            num_partial=self.num_points // 2, depth_size=self.depth_size,
        )
        return {k: v[0] for k, v in b.items()}


def _setup_jax_cpu():
    import jax

    jax.config.update("jax_platforms", "cpu")
    return jax


def _model_and_state(jax):
    import jax.numpy as jnp

    from pcdiff.diffusion import diffusion_from_betas
    from pcdiff.models import TwoStreamDenoiser
    from pcdiff.train import create_train_state

    cfg = dict(
        num_points=32, num_latents=8, latent_dim=16, x_dim=16, num_blocks=1,
        num_compute_layers=1, num_heads=2, num_classes=10, num_tokens_ppcd=4,
        num_tokens_depth=2, depth_image_size=32, depth_patch=16,
    )
    model = TwoStreamDenoiser(**cfg)
    ds = _SynthDataset(DATASET_N, cfg["num_points"], cfg["depth_image_size"])
    probe = ds.__getitem__(0)
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.asarray(probe["target"])[None],
        jnp.zeros((1,), jnp.int32),
        class_labels=jnp.asarray(probe["class_labels"])[None],
        viewpoints=jnp.asarray(probe["viewpoints"])[None],
        partial_pcd=jnp.asarray(probe["partial_pcd"])[None],
        depth_maps=jnp.asarray(probe["depth_maps"])[None],
    )
    diffusion = diffusion_from_betas("linear", 100)
    state = create_train_state(model, params, lr=1e-3, total_steps=10)
    return model, diffusion, state, ds


def _local_shard(ds, process_index: int, process_count: int):
    """(sorted global indices, stacked local batch) for one process."""
    from pcdiff.data import BatchLoader

    loader = BatchLoader(
        ds, batch_size=GLOBAL_BATCH // process_count, seed=SEED,
        process_index=process_index, process_count=process_count,
        prefetch=0,
    )
    loader.set_epoch(0)
    order = loader._index_order()
    batch = next(iter(loader))
    return order, batch


def _fingerprint(tree) -> float:
    """Order-independent scalar over a pytree (float64 on host)."""
    total = 0.0
    for leaf in __import__("jax").tree.leaves(tree):
        a = np.asarray(leaf, dtype=np.float64)
        total += float(np.abs(a).sum()) + float(a.sum())
    return total


def _run_step(jax, mesh, model, diffusion, state, global_batch_arrays):
    from pcdiff.parallel import replicate
    from pcdiff.train import make_train_step

    state = replicate(mesh, state)
    step = make_train_step(model, diffusion, self_conditioning_prob=1.0,
                           donate=False)
    key = jax.random.PRNGKey(42)  # ONE global key: the step is SPMD
    import jax.numpy as jnp

    new_state, metrics = step(state, global_batch_arrays, key,
                              jnp.asarray(True))
    return new_state, {
        "loss": float(metrics["loss"]),
        "grad_norm": float(metrics["grad_norm"]),
        "params_fp": _fingerprint(new_state.params),
    }


def _worker(rank: int):
    jax = _setup_jax_cpu()
    jax.distributed.initialize(
        coordinator_address=os.environ[_COORD_ENV],
        num_processes=NPROC, process_id=rank,
    )
    import jax.numpy as jnp  # noqa: F401

    from pcdiff.core.checkpoint import restore_checkpoint, save_checkpoint
    from pcdiff.parallel import batch_sharding, fold_in_process, make_mesh

    assert jax.process_count() == NPROC, jax.process_count()
    assert len(jax.devices()) == GLOBAL_DEVICES
    assert len(jax.local_devices()) == LOCAL_DEVICES
    report = {"rank": rank, "phase1": "ok"}

    model, diffusion, state, ds = _model_and_state(jax)
    order, local = _local_shard(ds, rank, NPROC)
    report["shard_indices"] = [int(i) for i in order]

    # Per-process data stream -> ONE global array per leaf. Device order in
    # the mesh is jax.devices() order (process-major), so rank r's
    # contiguous permutation shard IS rows [r*4, (r+1)*4) of the global
    # batch — exactly the shards this process's devices own under P("data").
    mesh = make_mesh(jax.devices())
    sharding = batch_sharding(mesh)
    gbatch = {
        k: jax.make_array_from_process_local_data(
            sharding, v, (GLOBAL_BATCH,) + v.shape[1:]
        )
        for k, v in local.items()
    }

    folded = jax.random.fold_in(jax.random.PRNGKey(SEED), jax.process_index())
    assert np.array_equal(
        np.asarray(folded), np.asarray(fold_in_process(jax.random.PRNGKey(SEED)))
    )
    report["folded_key"] = np.asarray(jax.random.key_data(folded)).tolist()

    new_state, metrics = _run_step(jax, mesh, model, diffusion, state, gbatch)
    report.update(metrics)

    # Cross-process orbax round-trip (all processes participate).
    ckpt_dir = os.environ[_CKPT_ENV]
    save_checkpoint(ckpt_dir, 1, new_state)
    restored, step_no = restore_checkpoint(ckpt_dir, new_state)
    assert step_no == 1
    np.testing.assert_allclose(
        _fingerprint(restored.params), report["params_fp"], rtol=0
    )
    report["orbax"] = "ok"
    print("MPREPORT " + json.dumps(report), flush=True)


def _single():
    """The comparator: same global batch, same step, ONE process x 8 devices."""
    jax = _setup_jax_cpu()
    from pcdiff.parallel import make_mesh, shard_batch

    assert len(jax.devices()) == GLOBAL_DEVICES
    model, diffusion, state, ds = _model_and_state(jax)
    shards = [_local_shard(ds, r, NPROC) for r in range(NPROC)]
    gbatch = {
        k: np.concatenate([b[k] for _, b in shards], axis=0)
        for k in shards[0][1]
    }
    mesh = make_mesh(jax.devices())
    _, metrics = _run_step(jax, mesh, model, diffusion, state,
                           shard_batch(mesh, gbatch))
    metrics["shard_indices"] = [[int(i) for i in o] for o, _ in shards]
    print("SPREPORT " + json.dumps(metrics), flush=True)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _spawn(mode: str, rank: int, coord: str, ckpt: str):
    env = dict(os.environ)
    flags = " ".join(
        f for f in env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f
    )
    env["XLA_FLAGS"] = (
        flags + f" --xla_force_host_platform_device_count="
        f"{LOCAL_DEVICES if mode == 'worker' else GLOBAL_DEVICES}"
    ).strip()
    env[_MODE_ENV] = mode
    env[_RANK_ENV] = str(rank)
    env[_COORD_ENV] = coord
    env[_CKPT_ENV] = ckpt
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    return subprocess.Popen(
        [sys.executable, os.path.abspath(__file__)], env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )


def _launcher():
    coord = f"localhost:{_free_port()}"
    ckpt = tempfile.mkdtemp(prefix="pcdiff_mp_ckpt_")
    print(f"launching {NPROC} workers x {LOCAL_DEVICES} devices, "
          f"coordinator {coord}")
    workers = [_spawn("worker", r, coord, ckpt) for r in range(NPROC)]
    outs = []
    for r, p in enumerate(workers):
        out, _ = p.communicate(timeout=900)
        outs.append(out)
        sys.stdout.write(out)
        if p.returncode != 0:
            raise SystemExit(f"worker {r} failed (exit {p.returncode})")
    reports = {}
    for out in outs:
        for line in out.splitlines():
            if line.startswith("MPREPORT "):
                rep = json.loads(line[len("MPREPORT "):])
                reports[rep["rank"]] = rep
    assert sorted(reports) == list(range(NPROC)), reports.keys()

    single = _spawn("single", 0, coord, ckpt)
    out, _ = single.communicate(timeout=900)
    sys.stdout.write(out)
    if single.returncode != 0:
        raise SystemExit(f"single-process comparator failed")
    sp = json.loads(
        next(l for l in out.splitlines() if l.startswith("SPREPORT "))[9:]
    )

    # phase 2: disjoint shards covering one permutation, agreeing with the
    # single-process loader's view of the same epoch.
    shard0, shard1 = reports[0]["shard_indices"], reports[1]["shard_indices"]
    assert not set(shard0) & set(shard1), "overlapping shards"
    assert shard0 == sp["shard_indices"][0] and shard1 == sp["shard_indices"][1]
    print(f"phase2 loader shards: disjoint, match single-process "
          f"({len(shard0)}+{len(shard1)} of {DATASET_N} indices) ok")

    # phase 3: distinct per-process RNG streams.
    assert reports[0]["folded_key"] != reports[1]["folded_key"]
    print("phase3 fold_in_process: distinct per-rank keys ok")

    # phase 4: gradient agreement. Same global program on the same global
    # batch — multi-process and single-process must agree to float tolerance
    # (CPU, identical GSPMD partitioning; tolerance covers gloo reduction
    # order).
    for rank, rep in reports.items():
        for k in ("loss", "grad_norm", "params_fp"):
            np.testing.assert_allclose(
                rep[k], sp[k], rtol=1e-6,
                err_msg=f"rank {rank} {k}: {rep[k]} vs single {sp[k]}",
            )
    assert reports[0]["params_fp"] == reports[1]["params_fp"], (
        "ranks disagree on the updated params — the all-reduce is broken"
    )
    print(f"phase4 gradient agreement: loss={sp['loss']:.6f} "
          f"grad_norm={sp['grad_norm']:.6f} 2-proc == 1-proc ok")

    # phase 5: both workers completed the orbax round-trip.
    assert all(rep["orbax"] == "ok" for rep in reports.values())
    print("phase5 cross-process orbax save/restore ok")
    print("MULTIPROCESS DRYRUN: all phases ok "
          f"({NPROC} processes x {LOCAL_DEVICES} devices)")


if __name__ == "__main__":
    mode = os.environ.get(_MODE_ENV)
    if mode == "worker":
        _worker(int(os.environ[_RANK_ENV]))
    elif mode == "single":
        _single()
    else:
        _launcher()
