"""Unit tests for tools/tpu_queue.py job semantics (no TPU, no jax)."""

import importlib.util
import os
import sys

_spec = importlib.util.spec_from_file_location(
    "tpu_queue",
    os.path.join(os.path.dirname(__file__), "..", "tools", "tpu_queue.py"))
tpu_queue = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(tpu_queue)


def test_run_job_success(tmp_path):
    job = {"name": "ok_job_t1", "cmd": f"{sys.executable} -c 'print(42)'",
           "timeout": 30}
    rc, dt, log = tpu_queue.run_job(job, str(tmp_path))
    assert rc == 0
    with open(log) as f:
        assert "42" in f.read()


def test_run_job_nonzero_rc(tmp_path):
    job = {"name": "bad_job_t1", "cmd": "exit 3", "timeout": 30}
    rc, _, _ = tpu_queue.run_job(job, str(tmp_path))
    assert rc == 3


def test_fail_pattern_turns_rc0_into_failure(tmp_path):
    """run_configs.py catches exceptions and emits '"metric": "error"' with
    rc 0 so the driver still gets a JSON line; the queue must not count
    that as success."""
    cmd = f"""{sys.executable} -c 'print(chr(34)+"metric"+chr(34)+": "+chr(34)+"error"+chr(34))'"""
    job = {"name": "masked_fail_t1", "cmd": cmd, "timeout": 30,
           "fail_pattern": '"metric": "error"'}
    rc, _, _ = tpu_queue.run_job(job, str(tmp_path))
    assert rc == -2


def test_fail_pattern_absent_is_success(tmp_path):
    job = {"name": "clean_job_t1", "cmd": "echo all good", "timeout": 30,
           "fail_pattern": '"metric": "error"'}
    rc, _, _ = tpu_queue.run_job(job, str(tmp_path))
    assert rc == 0


def test_timeout_reports_negative_rc(tmp_path):
    job = {"name": "slow_job_t1", "cmd": "sleep 30", "timeout": 1}
    rc, dt, _ = tpu_queue.run_job(job, str(tmp_path))
    assert rc == -9
    assert dt < 10
