"""Measure the P-FID / P-IS north star on a TRAINED checkpoint.

VERDICT round-2 Missing #2: metric-pipeline parity existed (CLI golden vs
the torch reference pipeline on random npz) but no P-FID/P-IS number had
ever been produced for an actual trained model's samples. This script
closes that: it samples the trained shapes checkpoint over the held-out
test set, writes the sample/GT/partial batches as npz, measures P-FID and
P-IS through the pcdiff CLIs, and cross-checks the SAME npz files through
the torch reference pipeline (``/root/reference/evals/scripts/
evaluate_pfid.py:16-36`` / ``evaluate_pis.py:16-27`` math: reference
PointNet++ forward + reference FID/IS code) with identical extractor
weights. Output: ``docs/pfid_evidence.json``.

The real pretrained ModelNet40 extractor checkpoint is network-blocked
here (zero egress, see README), so the extractor weights are SYNTHESIZED
deterministically (seeded torch init + perturbed batchnorm stats — the
same scheme the CLI golden test uses). P-FID/P-IS are therefore relative
measures under a fixed random projection, not comparable to published
absolute numbers; the jax↔torch agreement and the sample-vs-baseline
ordering are the evidence.

Phases (separate processes — sampling needs the TPU, the extractor
cross-check needs CPU float32 matmuls for a tight jax/torch comparison):

  python scripts/pfid_evidence.py sample  [run_dir] [config] [test_h5]
  python scripts/pfid_evidence.py measure
"""

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

WORK = "/tmp/pcdiff_pfid"
EXTRACTOR_SEED = 0


def _synth_extractor(path: str):
    """Deterministic torch-schema PointNet++ checkpoint (width_mult=2,
    40 classes — the reference extractor's architecture)."""
    import torch

    from tests.reference_import import ref_module

    ref_cls = ref_module("evals.pointnet2_cls_ssg")
    torch.manual_seed(EXTRACTOR_SEED)
    model = ref_cls.get_model(num_class=40, normal_channel=False, width_mult=2)
    model.eval()
    for m in model.modules():
        if isinstance(m, (torch.nn.BatchNorm1d, torch.nn.BatchNorm2d)):
            m.running_mean.uniform_(-0.2, 0.2)
            m.running_var.uniform_(0.8, 1.2)
    torch.save({"model_state_dict": model.state_dict()}, path)
    return model


def sample(run_dir: str, config_path: str, test_h5: str,
           n_seeds: int = 2) -> None:
    """Sample every held-out test instance with the trained checkpoint and
    write samples/GT/partial npz batches (mirrors cli/evaluate.py's loop).

    ``n_seeds`` passes over the test set with independent PRNG streams
    multiply the sample count (VERDICT r3 #7: n=120 makes the 512-dim
    Frechet statistics jittery); GT/partial stay one copy each."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pcdiff.cli.sample import load_params
    from pcdiff.cli.train import build_model
    from pcdiff.core.config import apply_overrides, load_config
    from pcdiff.data import BatchLoader, ModelNetCompletion
    from pcdiff.diffusion import diffusion_from_betas
    from pcdiff.diffusion.sampler import PointCloudSampler
    from pcdiff.models.wrapper import BoundTwoStream

    cfg = apply_overrides(load_config(config_path, []), [
        f"data.h5_path={test_h5}",
        f"sample.load_checkpoint_path={os.path.join(run_dir, 'checkpoints')}",
    ])
    key = jax.random.PRNGKey(cfg.train.seed)
    model = build_model(cfg)
    key, load_key = jax.random.split(key)
    bound = BoundTwoStream(model, load_params(cfg, model, load_key))
    diffusion = diffusion_from_betas(cfg.diffusion.schedule, cfg.diffusion.timesteps)
    sampler = PointCloudSampler(
        models=[bound], diffusions=[diffusion],
        num_points=[cfg.model.num_points], aux_channels=[],
        guidance_scale=[cfg.sample.guidance_scale], clip_denoised=True,
        use_karras=[cfg.sample.use_karras], karras_steps=[cfg.sample.karras_steps],
        sigma_min=[cfg.sample.sigma_min], sigma_max=[cfg.sample.sigma_max],
        s_churn=[cfg.sample.s_churn],
    )
    dataset = ModelNetCompletion(cfg.data.h5_path, split="test")
    loader = BatchLoader(dataset, cfg.sample.num_samples, shuffle=False,
                         seed=cfg.train.seed, drop_last=False)
    preds, targets, partials = [], [], []
    run_cache: dict = {}  # jit per batch size (see cli/evaluate.py)
    for pass_i in range(n_seeds):
        for bi, batch in enumerate(loader):
            kwargs = dict(
                class_labels=jnp.asarray(batch["class_labels"]),
                viewpoints=jnp.asarray(batch["viewpoints"]),
                partial_pcd=jnp.asarray(batch["partial_pcd"]),
                depth_maps=jnp.asarray(batch["depth_maps"]),
            )
            key, sub = jax.random.split(key)
            n = len(batch["target"])
            run = run_cache.get(n)
            if run is None:
                run = run_cache[n] = jax.jit(
                    lambda kw, k, n=n: sampler.sample_batch(n, kw, k))
            out = run(kwargs, sub)
            preds.append(np.clip(np.asarray(out), -0.5, 0.5))
            if pass_i == 0:
                targets.append(np.asarray(batch["target"]))
                partials.append(np.asarray(batch["partial_pcd"]))
            print(f"pass {pass_i} sampled batch {bi} "
                  f"({len(batch['target'])})", flush=True)

    os.makedirs(WORK, exist_ok=True)
    np.savez(os.path.join(WORK, "samples.npz"),
             arr_0=np.concatenate(preds).astype(np.float32))
    np.savez(os.path.join(WORK, "gt.npz"),
             arr_0=np.concatenate(targets).astype(np.float32))
    np.savez(os.path.join(WORK, "partial.npz"),
             arr_0=np.concatenate(partials).astype(np.float32))
    print(f"wrote {WORK}/{{samples,gt,partial}}.npz", flush=True)


def train_extractor(train_h5: str, path: str, epochs: int = 8) -> None:
    """Train OUR jax PointNet++ on the shapes classes, export to torch schema.

    The real pretrained ModelNet40 extractor is network-blocked; a randomly
    initialized one is pipeline-valid but degenerate (near-constant class
    probabilities make P-IS exactly 1.0). A few jitted epochs of 5-way
    classification on the TRAIN-split ground-truth clouds give the feature
    space real discriminative structure. Architecture is unchanged
    (width_mult=2, 40-class head; classes 5..39 simply stay unused), and
    the checkpoint is exported to the reference's torch ``state_dict``
    schema so BOTH pipelines (pcdiff CLI and the torch reference) load the
    exact same weights. BatchNorm runs with frozen (0, 1) running stats —
    a fixed affine — identically in training and both eval pipelines.

    (A torch-side training loop was tried first: the reference model on
    this 1-core host runs ~2 min/optimizer-step; the jitted jax CPU loop
    is ~100x faster end-to-end.)"""
    import h5py
    import numpy as np

    import jax

    jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import optax

    from pcdiff.evals.feature_extractor import normalize_point_clouds
    from pcdiff.evals.pointnet2 import (
        PointNet2ClassifierSSG,
        export_pointnet2_torch_state,
    )

    clouds, labels = [], []
    with h5py.File(train_h5, "r") as f:
        for ci, cls in enumerate(sorted(f.keys())):
            for inst in f[cls].values():
                clouds.append(inst["ground_truth"][...])
                labels.append(ci)
    x = jnp.asarray(normalize_point_clouds(np.stack(clouds)))
    y = jnp.asarray(np.asarray(labels, dtype=np.int32))
    print(f"extractor training set: {len(x)} clouds, "
          f"{int(y.max()) + 1} classes", flush=True)

    model = PointNet2ClassifierSSG(num_class=40, normal_channel=False,
                                   width_mult=2)
    variables = jax.jit(model.init)(jax.random.PRNGKey(EXTRACTOR_SEED), x[:2])
    params, batch_stats = variables["params"], variables["batch_stats"]
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, xb, yb):
        def loss_fn(p):
            log_probs, _ = model.apply(
                {"params": p, "batch_stats": batch_stats}, xb)
            nll = -jnp.take_along_axis(log_probs, yb[:, None], axis=1)
            return jnp.mean(nll), log_probs
        (loss, log_probs), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = opt.update(grads, opt_state)
        acc = jnp.mean((jnp.argmax(log_probs, -1) == yb).astype(jnp.float32))
        return optax.apply_updates(params, updates), opt_state, loss, acc

    bsz = 16
    rng = np.random.default_rng(EXTRACTOR_SEED)
    n_full = (len(x) // bsz) * bsz  # jit-stable batch shape
    for epoch in range(epochs):
        perm = rng.permutation(len(x))[:n_full]
        losses, accs = [], []
        for i in range(0, n_full, bsz):
            idx = perm[i : i + bsz]
            params, opt_state, loss, acc = step(params, opt_state, x[idx], y[idx])
            losses.append(float(loss))
            accs.append(float(acc))
        print(f"extractor epoch {epoch}: loss={np.mean(losses):.4f} "
              f"acc={np.mean(accs):.3f}", flush=True)

    import torch

    sd = export_pointnet2_torch_state(
        {"params": params, "batch_stats": batch_stats})
    torch.save(
        {"model_state_dict": {k: torch.from_numpy(np.ascontiguousarray(v))
                              for k, v in sd.items()}},
        path,
    )
    print(f"wrote {path}")


def measure() -> None:
    """P-FID / P-IS through the pcdiff CLIs on the sampled npz batches,
    cross-checked against the torch reference pipeline on identical data.

    Both extractor forwards run in FLOAT64 (VERDICT r4 task 5): in fp32,
    GEMM reduction order alone (full-batch vs chunked evaluation of
    identical weights+inputs in the SAME torch pipeline) moved P-FID by
    ~5.1% at n=240 through the ill-conditioned 512-dim Frechet sqrtm,
    which made a <=1% cross-implementation bar unfalsifiable. In f64 the
    order-jitter bound collapses to ~1e-9 and the jax-vs-torch delta
    measures actual pipeline math, not accumulation noise."""
    import numpy as np

    # CPU + f64: the cross-check target is the torch reference in double.
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_default_matmul_precision", "highest")

    import torch

    from pcdiff.evals.feature_extractor import PointNetClassifier, \
        normalize_point_clouds
    from pcdiff.evals.fid_is import compute_inception_score, compute_statistics
    from tests.reference_import import ref_module

    batches = {
        name: np.load(os.path.join(WORK, f"{name}.npz"))["arr_0"]
        .astype(np.float64)
        for name in ("samples", "gt", "partial")
    }

    synth_ckpt = os.path.join(WORK, "pointnet_synth.pt")
    _synth_extractor(synth_ckpt)
    extractors = {"synth_extractor": synth_ckpt}
    trained_ckpt = os.path.join(WORK, "pointnet_trained.pt")
    if os.path.exists(trained_ckpt):
        extractors["trained_extractor"] = trained_ckpt

    ref_cls = ref_module("evals.pointnet2_cls_ssg")

    def one_extractor(ckpt_path):
        clf = PointNetClassifier(torch_checkpoint_path=ckpt_path,
                                 dtype=np.float64)
        ref_model = ref_cls.get_model(num_class=40, normal_channel=False,
                                      width_mult=2)
        sd = torch.load(ckpt_path, map_location="cpu", weights_only=True)
        ref_model.load_state_dict(sd["model_state_dict"])
        ref_model.double().eval()

        jax_out = {k: clf.features_and_preds(v) for k, v in batches.items()}

        def ref_feats_preds(batch, torch_dtype=torch.float64):
            pc = normalize_point_clouds(batch)
            # the reference's farthest_point_sample allocates its distance
            # table via torch.ones (pointnet2_utils.py:106) — factory-default
            # dtype — so the double path needs the default flipped too
            prev_default = torch.get_default_dtype()
            torch.set_default_dtype(torch_dtype)
            try:
                with torch.no_grad():
                    log_probs, _, feats = ref_model.to(torch_dtype)(
                        torch.from_numpy(pc).permute(0, 2, 1).to(torch_dtype),
                        features=True,
                    )
            finally:
                torch.set_default_dtype(prev_default)
            return (feats.double().numpy(), np.exp(log_probs.double().numpy()))

        # CANONICAL comparison (VERDICT r4 task 5): the reference's
        # deterministic FPS seeds batch element b at point index b
        # (evals/pointnet2_utils.py:107-108), so features depend on each
        # cloud's POSITION within its evaluation chunk — semantically, not
        # as noise. Round 4 compared jax (chunk=64) against torch
        # (full-batch), so rows >= 64 ran different FPS trajectories and
        # the 5.1% "jitter bound" was mostly this position effect plus
        # fp32 GEMM order noise. Canonical form: BOTH pipelines chunk at
        # 64 (row i of every chunk starts FPS at point i in both) and both
        # run in float64 (order noise ~1e-12). The remaining delta is pure
        # pipeline math, so the <=1% bar is falsifiable.
        def ref_feats_chunked(batch, chunk=64, torch_dtype=torch.float64):
            parts = [ref_feats_preds(batch[i:i + chunk], torch_dtype)
                     for i in range(0, len(batch), chunk)]
            return (np.concatenate([p[0] for p in parts]),
                    np.concatenate([p[1] for p in parts]))

        ref_out = {k: ref_feats_chunked(v) for k, v in batches.items()}

        # Documentation rows: (a) full-batch vs chunk=64 in f64 isolates
        # the pure FPS position effect; (b) fp32 vs f64 at identical
        # chunking isolates the accumulation-order noise the old bound
        # conflated with it.
        ref_fullbatch = {k: ref_feats_preds(v) for k, v in batches.items()}
        ref_f32 = {k: ref_feats_chunked(v, torch_dtype=torch.float32)
                   for k, v in batches.items()}

        # Raw pipeline agreement on identical inputs+weights: the FID
        # deltas below amplify these through an ill-conditioned sqrtm of
        # 512-dim covariances from only 120 samples.
        feat_absdiff = max(
            float(np.max(np.abs(jax_out[k][0] - ref_out[k][0])))
            for k in batches
        )
        feat_scale = float(np.max(np.abs(ref_out["gt"][0])))

        def pfid(out, a, b):
            # float64 features: the means/covariances and sqrtm all run in
            # f64 so the Frechet arithmetic adds no jitter of its own on
            # top of the (fp32) extractor forward.
            return compute_statistics(
                out[a][0].astype(np.float64)
            ).frechet_distance(compute_statistics(
                out[b][0].astype(np.float64)))

        def pis(out, a):
            return compute_inception_score(out[a][1])

        # Same-distribution floor: a SHUFFLED half-split of the GT batch
        # (contiguous halves would compare different classes — the loader
        # walks classes in order).
        perm = np.random.default_rng(EXTRACTOR_SEED).permutation(
            len(batches["gt"]))
        half = len(perm) // 2

        def gt_floor(out):
            f = out["gt"][0][perm].astype(np.float64)
            return compute_statistics(f[:half]).frechet_distance(
                compute_statistics(f[half:]))

        block = {
            "feature_max_absdiff": feat_absdiff,
            "feature_scale": feat_scale,
            # pure FPS-start position effect (semantic, not noise):
            "fps_position_sensitivity": {
                "feature_max_absdiff": max(
                    float(np.max(np.abs(ref_fullbatch[k][0] - ref_out[k][0])))
                    for k in batches
                ),
                "pfid_samples_vs_gt_full": pfid(ref_fullbatch, "samples",
                                                "gt"),
                "pfid_samples_vs_gt_chunked": pfid(ref_out, "samples", "gt"),
            },
            # fp32 accumulation-order noise at identical chunking — the
            # scale of what the f64 canonicalization removed:
            "fp32_noise_scale": {
                "feature_max_absdiff": max(
                    float(np.max(np.abs(ref_f32[k][0] - ref_out[k][0])))
                    for k in batches
                ),
                "pfid_samples_vs_gt_f32": pfid(ref_f32, "samples", "gt"),
                "pfid_samples_vs_gt_f64": pfid(ref_out, "samples", "gt"),
            },
            "pfid_samples_vs_gt": {"jax": pfid(jax_out, "samples", "gt"),
                                   "torch_ref": pfid(ref_out, "samples", "gt")},
            "pfid_partial_vs_gt": {"jax": pfid(jax_out, "partial", "gt"),
                                   "torch_ref": pfid(ref_out, "partial", "gt")},
            "pfid_gt_shuffled_split_floor": {"jax": gt_floor(jax_out),
                                             "torch_ref": gt_floor(ref_out)},
            "pis_samples": {"jax": pis(jax_out, "samples"),
                            "torch_ref": pis(ref_out, "samples")},
            "pis_gt": {"jax": pis(jax_out, "gt"),
                       "torch_ref": pis(ref_out, "gt")},
        }
        for v in block.values():
            if isinstance(v, dict) and "jax" in v:
                v["rel_delta"] = abs(v["jax"] - v["torch_ref"]) / max(
                    abs(v["torch_ref"]), 1e-12)
        ps = block["fps_position_sensitivity"]
        ps["rel_delta"] = abs(
            ps["pfid_samples_vs_gt_full"] - ps["pfid_samples_vs_gt_chunked"]
        ) / max(abs(ps["pfid_samples_vs_gt_chunked"]), 1e-12)
        nz = block["fp32_noise_scale"]
        nz["rel_delta"] = abs(
            nz["pfid_samples_vs_gt_f32"] - nz["pfid_samples_vs_gt_f64"]
        ) / max(abs(nz["pfid_samples_vs_gt_f64"]), 1e-12)
        return block

    results = {
        "n_samples": int(len(batches["samples"])),
        "note": "real pretrained ModelNet40 extractor network-blocked (README);"
                " synth = seeded random init (pipeline parity only),"
                " trained = briefly CPU-trained on the 5 shapes classes"
                " (discriminative relative measure). Architecture is the"
                " reference's width_mult=2 40-class PointNet++ in both.",
    }
    for tag, ckpt_path in extractors.items():
        results[tag] = one_extractor(ckpt_path)

    dest = os.path.join(REPO, "docs", "pfid_evidence.json")
    with open(dest, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results, indent=2))
    print(f"wrote {dest}")


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "measure"
    if mode == "sample":
        run = sys.argv[2] if len(sys.argv) > 2 else \
            "/tmp/pcdiff_shapes_runs/run_19-08-2026_04-57"
        cfg_path = sys.argv[3] if len(sys.argv) > 3 else os.path.join(
            REPO, "configs", "synthetic_shapes.yaml")
        h5 = sys.argv[4] if len(sys.argv) > 4 else "/tmp/pcdiff_shapes_test.h5"
        sample(run, cfg_path, h5)
    elif mode == "train-extractor":
        h5 = sys.argv[2] if len(sys.argv) > 2 else "/tmp/pcdiff_shapes_train.h5"
        epochs = int(sys.argv[3]) if len(sys.argv) > 3 else 8
        os.makedirs(WORK, exist_ok=True)
        train_extractor(h5, os.path.join(WORK, "pointnet_trained.pt"),
                        epochs=epochs)
    elif mode == "measure":
        measure()
    else:
        raise SystemExit(f"unknown mode {mode!r}")
