"""Actual multi-PROCESS multi-host run (SURVEY.md §2.4): 2 local processes
x 2 virtual CPU devices each form a 4-device global mesh over a localhost
coordinator, exercising jax.distributed.initialize +
shard_examples_per_host + make_array_from_process_local_data end to end —
the code path a TPU pod runs over DCN.  The resulting DP losses must equal
a single-process 4-device run on the same global batch."""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from speechmix_tpu.config import (SEQ2SEQ_PRESETS, SPEECH_ENCODER_PRESETS,
                                  SpeechMixConfig)
from speechmix_tpu.parallel import mesh as mesh_lib
from speechmix_tpu.training import trainer as trainer_lib
from speechmix_tpu.training.trainer import TrainConfig, TrainState


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _single_process_losses():
    """The same two DP steps on the same global batch, one process."""
    cfg = SpeechMixConfig(encoder=SPEECH_ENCODER_PRESETS["tiny-speech"],
                          decoder=SEQ2SEQ_PRESETS["tiny-bart-bytes"],
                          down_scale=4)
    tc = TrainConfig(learning_rate=1e-3, warmup_steps=0, grad_accum=1,
                     output_dir="", dropout=False)
    rng = np.random.RandomState(0)
    b, t, label_len = 4, 8000, 6
    labels = rng.randint(130, 200, size=(b, label_len)).astype(np.int64)
    labels[:, -1] = cfg.decoder.eos_token_id
    batch = {
        "input_values": jnp.asarray(rng.randn(b, t).astype(np.float32) * 0.1),
        "lengths": jnp.asarray(np.full((b,), t, np.int32)),
        "labels": jnp.asarray(labels),
    }
    mesh = mesh_lib.make_mesh(n_data=4)
    state = trainer_lib.create_train_state(jax.random.PRNGKey(0), cfg, tc)
    state = TrainState(params=mesh_lib.shard_params(mesh, state.params),
                       opt_state=state.opt_state, step=state.step)
    step_fn = trainer_lib.make_train_step(cfg, tc, state.params)
    losses = []
    for _ in range(2):
        state, metrics = step_fn(state, mesh_lib.shard_batch(mesh, batch),
                                 jnp.float32(1.0))
        losses.append(float(metrics["loss"]))
    return losses


def test_two_process_multihost_matches_single(tmp_path):
    port = _free_port()
    worker = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    procs = [subprocess.Popen(
        [sys.executable, worker, str(i), str(port), str(tmp_path)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for i in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=480)
        outs.append(out.decode(errors="replace"))
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out}"

    multi = [np.loadtxt(tmp_path / f"loss_{i}.txt") for i in range(2)]
    # both processes see identical (replicated) global metrics
    np.testing.assert_allclose(multi[0], multi[1], rtol=0, atol=0)
    single = _single_process_losses()
    # per-host round-robin sharding permutes batch rows; the mean loss is
    # permutation-invariant, so the runs must agree numerically
    np.testing.assert_allclose(multi[0], single, rtol=1e-5)

    # the REAL data pipeline emits an IDENTICAL bucket schedule on every
    # host (mixed-length corpus; shapes and batch count in lockstep)
    scheds = [(tmp_path / f"sched_{i}.txt").read_text() for i in range(2)]
    assert scheds[0] == scheds[1]
    assert len(scheds[0].splitlines()) > 1
    # evaluate plumbing: local_rows + allgather_rows give every host the
    # same global prediction set and (replicated) loss
    evals = [(tmp_path / f"eval_{i}.txt").read_text() for i in range(2)]
    assert evals[0] == evals[1], evals


def _spawn_workers(tmp_path, mode):
    port = _free_port()
    worker = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    procs = [subprocess.Popen(
        [sys.executable, worker, str(i), str(port), str(tmp_path), mode],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for i in range(2)]
    for p in procs:
        out, _ = p.communicate(timeout=480)
        assert p.returncode == 0, \
            f"worker({mode}) failed:\n{out.decode(errors='replace')}"


def test_two_process_checkpoint_resume_matches_uninterrupted(tmp_path):
    """Multi-host checkpoint/resume (VERDICT r3 #7): 2 processes save an
    orbax checkpoint after step 2 and exit; a FRESH pair of processes
    restores (params + opt state + step, every process participating) and
    runs steps 2-3 — the post-resume losses must equal an uninterrupted
    4-step run exactly.  Reference semantics: HF Trainer
    resume_from_checkpoint (train.py:300-308)."""
    pytest.importorskip("orbax.checkpoint")
    _spawn_workers(tmp_path, "ckpt_full")
    _spawn_workers(tmp_path, "ckpt_a")
    _spawn_workers(tmp_path, "ckpt_b")

    full = [np.loadtxt(tmp_path / f"full_{i}.txt") for i in range(2)]
    resumed = [np.loadtxt(tmp_path / f"resumed_{i}.txt") for i in range(2)]
    np.testing.assert_allclose(full[0], full[1], rtol=0, atol=0)
    np.testing.assert_allclose(resumed[0], resumed[1], rtol=0, atol=0)
    # steps 2-3 after resume == steps 2-3 of the uninterrupted run
    np.testing.assert_allclose(resumed[0], full[0][2:], rtol=1e-6)
