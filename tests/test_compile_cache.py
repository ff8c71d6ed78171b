"""The persistent-compile-cache gate (round-4 driver-budget fix).

BENCH_r03 timed out (rc=124) on tunnel compiles; the fix relies on
hamer_yolo_tpu enabling jax_compilation_cache_dir at import. These
tests protect that contract — if the cache enable is ever dropped, the
driver benchmark regresses to multi-minute cold compiles every run.
Run in subprocesses: the config must be set by IMPORT alone, and the
kill-switch must work before any backend initialization.
"""
import os
import subprocess
import sys

import pytest


def _probe(env_extra):
    env = dict(os.environ, JAX_PLATFORMS="cpu", **env_extra)
    out = subprocess.run(
        [sys.executable, "-c",
         "import hamer_yolo_tpu, jax;"
         "print(repr(jax.config.jax_compilation_cache_dir))"],
        capture_output=True, text=True, env=env, timeout=120)
    assert out.returncode == 0, out.stderr
    return out.stdout.strip().splitlines()[-1]


def test_cache_enabled_by_import():
    got = _probe({})
    assert "jax_cache" in got and got != "None"


def test_cache_dir_override():
    got = _probe({"HYT_JAX_CACHE": "/tmp/hyt_cache_probe"})
    assert got == "'/tmp/hyt_cache_probe'"


def test_kill_switch():
    got = _probe({"HYT_JAX_CACHE": "0"})
    assert got == "None"
