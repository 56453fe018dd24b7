"""Health-gated TPU job queue.

The remote TPU backend alternates healthy windows with degradation
phases (readback stalls of 3-30 min, size-dependent RESOURCE_EXHAUSTED;
see CLAUDE.md "Environment quirks"). Queueing a long measurement blind
wastes the window and can wedge the only allowed TPU process. This tool
gates each job on a bounded health probe:

    probe = fresh subprocess doing one tiny compile + device->host
    readback under `timeout`; healthy iff it completes in time.

Usage:
    python tools/tpu_queue.py --jobs jobs.json [--probe-timeout 180]
        [--sleep 240] [--max-retries 4]

jobs.json: list of {"name": str, "cmd": str, "timeout": int_seconds,
"fail_pattern": str?}. Each job runs as a shell command in its own
subprocess (so a faulted TPU client never wedges the queue),
stdout/stderr teed to /tmp/tpu_queue_<name>.log. A job that exits 0 but
whose log contains `fail_pattern` counts as FAILED — run_configs.py
deliberately catches exceptions and emits `"metric": "error"` JSON with
rc 0 so the driver still gets a line; pass that string here. The queue re-probes between jobs and after
any failure, and emits one status JSON line per event on stdout.

Only ONE process may use the TPU at a time -- never run this
concurrently with another TPU workload.
"""

import argparse
import json
import os
import subprocess
import sys
import time

PROBE_SRC = r"""
import time
t0 = time.time()
import jax, jax.numpy as jnp
x = jnp.ones((256, 256), jnp.bfloat16)
v = float((x @ x).sum())
print(f"PROBE_OK {time.time()-t0:.1f}s val={v}", flush=True)
"""


def emit(**kw):
    kw["ts"] = round(time.time(), 1)
    print(json.dumps(kw), flush=True)


def probe(timeout_s):
    """One bounded tiny compile+readback in a fresh process."""
    t0 = time.time()
    try:
        r = subprocess.run(
            [sys.executable, "-c", PROBE_SRC], timeout=timeout_s,
            capture_output=True, text=True)
        ok = r.returncode == 0 and "PROBE_OK" in r.stdout
    except subprocess.TimeoutExpired:
        ok = False
    return ok, time.time() - t0


def run_job(job, repo_root):
    name = job["name"]
    log_path = f"/tmp/tpu_queue_{name}.log"
    t0 = time.time()
    with open(log_path, "a") as log:
        log.write(f"\n=== {name} @ {time.ctime()} ===\n{job['cmd']}\n")
        log.flush()
        try:
            r = subprocess.run(
                job["cmd"], shell=True, timeout=job.get("timeout", 3600),
                stdout=log, stderr=subprocess.STDOUT, cwd=repo_root)
            rc = r.returncode
        except subprocess.TimeoutExpired:
            rc = -9
    pat = job.get("fail_pattern")
    if rc == 0 and pat:
        with open(log_path) as f:
            if pat in f.read():
                rc = -2
    return rc, time.time() - t0, log_path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--jobs", required=True, help="path to jobs.json")
    ap.add_argument("--probe-timeout", type=int, default=180)
    ap.add_argument("--sleep", type=int, default=240,
                    help="seconds between probes while unhealthy")
    ap.add_argument("--max-retries", type=int, default=4)
    args = ap.parse_args()

    with open(args.jobs) as f:
        jobs = json.load(f)
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    retries = {j["name"]: 0 for j in jobs}
    queue = list(jobs)

    while queue:
        ok, dt = probe(args.probe_timeout)
        emit(event="probe", healthy=ok, seconds=round(dt, 1),
             pending=[j["name"] for j in queue])
        if not ok:
            time.sleep(args.sleep)
            continue
        job = queue[0]
        rc, dt, log_path = run_job(job, repo_root)
        emit(event="job", name=job["name"], rc=rc, seconds=round(dt, 1),
             log=log_path)
        if rc == 0:
            queue.pop(0)
        else:
            retries[job["name"]] += 1
            if retries[job["name"]] > args.max_retries:
                emit(event="giveup", name=job["name"])
                queue.pop(0)
            time.sleep(args.sleep)
    emit(event="done")


if __name__ == "__main__":
    main()
