"""Outage-resilient supervisor for the round-5 TPU pipeline.

The axon tunnel died twice in 70 minutes on 2026-08-20 (mode 1: every
device op hangs forever; a process that was mid-RPC never recovers even
after the tunnel returns). A naive sequential queue therefore deadlocks on
the first outage. This supervisor:

  1. drives the flagship training to its final checkpoint (step 19800),
     auto-resuming from the newest on-disk checkpoint whenever the trainer
     goes quiet for >5 min while the tunnel itself probes healthy (the
     signature of a stale-RPC hang);
  2. runs each measurement stage as a subprocess with the same
     quiet-while-healthy hang detection, retrying a bounded number of
     times (the gate stage is incremental via --skip-done, so a retry
     only redoes the in-flight row).

Tunnel probes run a tiny jit in a SHORT-TIMEOUT subprocess: during an
outage the probe itself would hang, so hang-kill decisions are only made
when a probe succeeds while the stage log is stale.

Usage: python scripts/round5_supervisor.py [--skip-train]
Logs:  /tmp/sup_*.log (stages), /tmp/flagship_sup_train_N.log (trainer)
"""

import glob
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RUNS = "/tmp/pcdiff_flagship_runs"
FINAL_STEP = 19800
PROBE_SRC = ("import jax, jax.numpy as jnp; "
             "print(float(jax.jit(lambda x: (x*2.).sum())(jnp.ones((8, 8)))))")


def log(msg: str) -> None:
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def tunnel_ok(timeout: int = 150) -> bool:
    try:
        r = subprocess.run([sys.executable, "-c", PROBE_SRC],
                           timeout=timeout, capture_output=True)
        return r.returncode == 0 and b"128.0" in r.stdout
    except subprocess.TimeoutExpired:
        return False


def wait_tunnel() -> None:
    while not tunnel_ok():
        log("tunnel down; re-probing in 90s")
        time.sleep(90)


def latest_ckpt():
    """(checkpoints_dir, step) with the highest step across all run dirs."""
    best = (None, -1)
    for d in glob.glob(os.path.join(RUNS, "run_*", "checkpoints")):
        for s in glob.glob(os.path.join(d, "*")):
            base = os.path.basename(s.rstrip("/"))
            if base.isdigit() and int(base) > best[1]:
                best = (d, int(base))
    return best


def newest_run_dir():
    dirs = sorted(glob.glob(os.path.join(RUNS, "run_*")), key=os.path.getmtime)
    return dirs[-1] if dirs else None


def _mtime(path: str) -> float:
    try:
        return os.path.getmtime(path)
    except OSError:
        return 0.0


def drive_training() -> None:
    """Run the trainer (resuming as needed) until FINAL_STEP is on disk."""
    attempt = 0
    proc, logf = None, None
    while True:
        ckpt_dir, step = latest_ckpt()
        if step >= FINAL_STEP:
            log(f"training complete: step {step} at {ckpt_dir}")
            if proc and proc.poll() is None:
                proc.kill()
            return
        if proc is None or proc.poll() is not None:
            if proc is not None and proc.poll() == 0:
                # trainer exited cleanly but final step not on disk — the
                # config/save cadence is wrong; bail loudly
                raise SystemExit("trainer exited rc=0 without final ckpt")
            wait_tunnel()
            attempt += 1
            logf = f"/tmp/flagship_sup_train_{attempt}.log"
            cmd = [sys.executable, "-m", "pcdiff.cli.train",
                   "--config", "configs/flagship_shapes.yaml"]
            if ckpt_dir is not None:
                cmd += ["train.continue_training=true",
                        f"train.load_checkpoint_path={ckpt_dir}"]
            log(f"starting trainer (attempt {attempt}, resume step {step}) "
                f"-> {logf}")
            proc = subprocess.Popen(cmd, cwd=REPO,
                                    stdout=open(logf, "w"),
                                    stderr=subprocess.STDOUT)
            time.sleep(60)
            continue
        quiet = time.time() - _mtime(logf)
        # legitimate silences: the post-restore train-step compile ran ~6
        # min under host contention, the bulk checkpoint fetch ~90 s; only
        # call it a hang if the tunnel answers a probe while the trainer
        # stays mute well past those
        if quiet > 700 and tunnel_ok():
            time.sleep(30)
            if time.time() - _mtime(logf) > 700:
                log(f"trainer quiet {quiet:.0f}s with healthy tunnel; "
                    "killing for resume")
                proc.kill()
                proc.wait()
                proc = None
                continue
        time.sleep(45)


def run_stage(name: str, cmd, budget_s: int, quiet_s: int = 1500,
              retries: int = 3) -> bool:
    for attempt in range(1, retries + 1):
        wait_tunnel()
        logf = f"/tmp/sup_{name}_{attempt}.log"
        log(f"stage {name} attempt {attempt} -> {logf}")
        proc = subprocess.Popen(cmd, cwd=REPO, stdout=open(logf, "w"),
                                stderr=subprocess.STDOUT)
        t0 = time.time()
        while True:
            rc = proc.poll()
            if rc is not None:
                if rc == 0:
                    log(f"stage {name} done (attempt {attempt})")
                    return True
                log(f"stage {name} rc={rc}; retrying")
                break
            if time.time() - t0 > budget_s:
                log(f"stage {name} over budget {budget_s}s; killing")
                proc.kill()
                proc.wait()
                break
            quiet = time.time() - _mtime(logf)
            if quiet > quiet_s and tunnel_ok():
                time.sleep(30)
                if time.time() - _mtime(logf) > quiet_s:
                    log(f"stage {name} quiet {quiet:.0f}s with healthy "
                        "tunnel; killing for retry")
                    proc.kill()
                    proc.wait()
                    break
            time.sleep(45)
    log(f"stage {name} FAILED after {retries} attempts")
    return False


def main() -> None:
    if "--skip-train" not in sys.argv:
        drive_training()
    run_dir = newest_run_dir()
    log(f"gating run dir: {run_dir}")

    def gate_stage(rows):
        return [sys.executable, "scripts/trained_gates.py", run_dir,
                "configs/flagship_shapes.yaml",
                "/tmp/pcdiff_flagship_test.h5", f"--only={rows}",
                "--dest=docs/trained_gates_flagship.json", "--skip-done"]

    # priority order under outage pressure: the decision anchors first
    # (baseline, the default fast stack, the two unmeasured levers), the
    # throughput A/B next, breadth after
    # remaining work after gates_core + bench_gelutanh completed 02:03;
    # re-prioritized: the A/B control run and the segcompile cold-wall
    # measurement (VERDICT task 3 done-criterion) before breadth rows
    stages = [
        ("gates_core", gate_stage(
            "baseline,bf16-gi-reuse,bf16-gi-reuse-gelutanh,"
            "ema-baseline,ema-bf16-gi-reuse"), 5400),
        ("bench_default", [sys.executable, "bench.py"], 1800),
        ("bench_segcompile", [sys.executable, "bench.py"], 1800),
        ("gates_rest", gate_stage(
            "bf16,reuse-32,gi-reuse,bf16-gi-reuse-32,bf16-gi-reuse-scan"),
         5400),
        ("trace", [sys.executable, "scripts/train_bench.py",
                   "--profile=/tmp/trace_r5"], 2400),
    ]
    env_overrides = {
        "bench_gelutanh": {"PCDIFF_BENCH_GELU": "tanh"},
        "bench_segcompile": {"PCDIFF_BENCH_SEGCOMPILE": "1"},
    }
    for name, cmd, budget in stages:
        env = dict(os.environ)
        env.update(env_overrides.get(name, {}))
        # run_stage uses Popen without env plumbing; inline it here
        os.environ.update(env_overrides.get(name, {}))
        ok = run_stage(name, cmd, budget)
        for k in env_overrides.get(name, {}):
            os.environ.pop(k, None)
        if not ok and name == "gates":
            log("gates failed; continuing to benches anyway")
    log("SUPERVISOR DONE")


if __name__ == "__main__":
    main()
