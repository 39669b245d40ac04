"""Two-process multi-host worker (spawned by test_multihost.py).

Each process owns 2 virtual CPU devices; jax.distributed.initialize over a
localhost coordinator forms a 4-device global mesh across 2 processes — the
same code path a TPU pod runs over DCN (SURVEY.md §2.4 multi-host).  The
worker drives the REAL multi-host pipeline: shard_examples_per_host ->
per-host collation -> shard_batch's make_array_from_process_local_data ->
two DP train steps, and writes the step losses for the parent to compare
against a single-process run.

Usage: python multihost_worker.py <process_id> <coordinator_port> <out_dir>
       [mode]

mode "main" (default) runs the pipeline checks above.  The "ckpt_*" modes
exercise multi-host checkpoint/resume with the orbax backend (every process
participates in save and restore — SURVEY.md §5; reference resume semantics
are HF Trainer's train(resume_from_checkpoint), train.py:300-308):
  ckpt_full — 4 deterministic DP steps straight through; losses to
              full_<pid>.txt
  ckpt_a    — 2 steps, CheckpointManager(backend="orbax").save, exit (the
              "killed after a save" half of a resume cycle)
  ckpt_b    — fresh process: restore latest, run steps 2-3, losses to
              resumed_<pid>.txt (must equal ckpt_full's last two)
"""

import os
import sys


def _init_distributed(pid, port):
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")

    from speechmix_tpu.parallel import mesh as mesh_lib
    mesh_lib.initialize_distributed(
        coordinator_address=f"localhost:{port}", num_processes=2,
        process_id=pid)
    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 4, jax.device_count()
    assert len(jax.local_devices()) == 2
    return jax


def _ckpt_setup():
    import jax
    import numpy as np

    from speechmix_tpu.config import (SEQ2SEQ_PRESETS,
                                      SPEECH_ENCODER_PRESETS,
                                      SpeechMixConfig)
    from speechmix_tpu.parallel import mesh as mesh_lib
    from speechmix_tpu.training import trainer as trainer_lib
    from speechmix_tpu.training.trainer import TrainConfig, TrainState

    cfg = SpeechMixConfig(encoder=SPEECH_ENCODER_PRESETS["tiny-speech"],
                          decoder=SEQ2SEQ_PRESETS["tiny-bart-bytes"],
                          down_scale=4)
    tc = TrainConfig(learning_rate=1e-3, warmup_steps=0, grad_accum=1,
                     output_dir="", dropout=False)
    mesh = mesh_lib.make_mesh()  # 4 x 1 x 1 over the global devices

    def global_batch(step):
        rng = np.random.RandomState(100 + step)
        b, t, label_len = 4, 8000, 6
        labels = rng.randint(130, 200, size=(b, label_len)).astype(np.int64)
        labels[:, -1] = cfg.decoder.eos_token_id
        return {"input_values": rng.randn(b, t).astype(np.float32) * 0.1,
                "lengths": np.full((b,), t, np.int32),
                "labels": labels}

    state = trainer_lib.create_train_state(jax.random.PRNGKey(0), cfg, tc)
    state = TrainState(params=mesh_lib.shard_params(mesh, state.params),
                       opt_state=state.opt_state, step=state.step)
    step_fn = trainer_lib.make_train_step(cfg, tc, state.params)
    return cfg, tc, mesh, state, step_fn, global_batch


def _ckpt_steps(mesh, state, step_fn, global_batch, start, n):
    import jax.numpy as jnp

    from speechmix_tpu.parallel import mesh as mesh_lib
    losses = []
    for i in range(n):
        batch = mesh_lib.shard_batch(mesh, global_batch(start + i))
        state, m = step_fn(state, batch, jnp.float32(1.0))
        losses.append(float(m["loss"]))
    return state, losses


def ckpt_mode(pid, out_dir, mode):
    import jax

    from speechmix_tpu.parallel import mesh as mesh_lib
    from speechmix_tpu.training import trainer as trainer_lib
    from speechmix_tpu.training.checkpoint import CheckpointManager
    from speechmix_tpu.training.trainer import TrainState

    cfg, tc, mesh, state, step_fn, global_batch = _ckpt_setup()
    ckpt_dir = os.path.join(out_dir, "orbax_ckpt")
    if mode == "ckpt_full":
        _, losses = _ckpt_steps(mesh, state, step_fn, global_batch, 0, 4)
        with open(os.path.join(out_dir, f"full_{pid}.txt"), "w") as f:
            f.write(" ".join(f"{x:.8f}" for x in losses))
    elif mode == "ckpt_a":
        mgr = CheckpointManager(ckpt_dir, backend="orbax")
        state, _ = _ckpt_steps(mesh, state, step_fn, global_batch, 0, 2)
        mgr.save(int(state.step), {"params": state.params,
                                   "opt_state": state.opt_state,
                                   "step": state.step})
    elif mode == "ckpt_b":
        from jax.sharding import NamedSharding, PartitionSpec as P
        mgr = CheckpointManager(ckpt_dir, backend="orbax")
        # `like` must carry the LIVE mesh placements: orbax restores onto
        # the like-tree's shardings, and in multi-process every jit input
        # must be a global array (host-local leaves fail with
        # "incompatible devices").  params keep their TP/DP sharding;
        # optimizer state and step are replicated.
        rep = NamedSharding(mesh, P())
        put_rep = lambda t: jax.tree_util.tree_map(
            lambda x: jax.device_put(x, rep), t)
        like = {"params": state.params,
                "opt_state": put_rep(state.opt_state),
                "step": jax.device_put(state.step, rep)}
        restored, _ = mgr.restore(like)
        assert restored is not None
        state = TrainState(params=restored["params"],
                           opt_state=restored["opt_state"],
                           step=restored["step"])
        assert int(state.step) == 2, int(state.step)
        _, losses = _ckpt_steps(mesh, state, step_fn, global_batch, 2, 2)
        with open(os.path.join(out_dir, f"resumed_{pid}.txt"), "w") as f:
            f.write(" ".join(f"{x:.8f}" for x in losses))
    else:
        raise ValueError(mode)
    jax.distributed.shutdown()


def main():
    pid, port, out_dir = int(sys.argv[1]), sys.argv[2], sys.argv[3]
    mode = sys.argv[4] if len(sys.argv) > 4 else "main"
    jax = _init_distributed(pid, port)
    if mode != "main":
        return ckpt_mode(pid, out_dir, mode)
    from speechmix_tpu.parallel import mesh as mesh_lib

    import jax.numpy as jnp
    import numpy as np
    from speechmix_tpu.config import (SEQ2SEQ_PRESETS,
                                      SPEECH_ENCODER_PRESETS,
                                      SpeechMixConfig)
    from speechmix_tpu.training import trainer as trainer_lib
    from speechmix_tpu.training.trainer import TrainConfig, TrainState

    cfg = SpeechMixConfig(encoder=SPEECH_ENCODER_PRESETS["tiny-speech"],
                          decoder=SEQ2SEQ_PRESETS["tiny-bart-bytes"],
                          down_scale=4)
    tc = TrainConfig(learning_rate=1e-3, warmup_steps=0, grad_accum=1,
                     output_dir="", dropout=False)

    # the SAME deterministic global example set on every host
    rng = np.random.RandomState(0)
    b, t, label_len = 4, 8000, 6
    labels = rng.randint(130, 200, size=(b, label_len)).astype(np.int64)
    labels[:, -1] = cfg.decoder.eos_token_id
    wavs = rng.randn(b, t).astype(np.float32) * 0.1
    examples = [{"input_values": wavs[i], "labels": labels[i]}
                for i in range(b)]

    # per-host dataset sharding (round-robin) + local collation
    local = mesh_lib.shard_examples_per_host(examples)
    local_batch = {
        "input_values": np.stack([e["input_values"] for e in local]),
        "lengths": np.full((len(local),), t, np.int32),
        "labels": np.stack([e["labels"] for e in local]),
    }

    mesh = mesh_lib.make_mesh()  # 4 x 1 x 1 over the global devices
    state = trainer_lib.create_train_state(jax.random.PRNGKey(0), cfg, tc)
    state = TrainState(params=mesh_lib.shard_params(mesh, state.params),
                       opt_state=state.opt_state, step=state.step)
    step_fn = trainer_lib.make_train_step(cfg, tc, state.params)

    losses = []
    for _ in range(2):
        batch = mesh_lib.shard_batch(mesh, local_batch)
        state, metrics = step_fn(state, batch, jnp.float32(1.0))
        losses.append(float(metrics["loss"]))

    with open(os.path.join(out_dir, f"loss_{pid}.txt"), "w") as f:
        f.write(" ".join(f"{x:.8f}" for x in losses))

    # --- the REAL data pipeline in lockstep: every host batches the FULL
    # synthetic corpus (mixed lengths -> multiple buckets) with the same
    # seed and keeps its per-host rows; the bucket schedule (shapes AND
    # count) must be identical across processes, or the SPMD program
    # desyncs at the first collective.
    from types import SimpleNamespace

    from speechmix_tpu import api as api_lib
    from speechmix_tpu.data import datasets as ds_lib

    model = api_lib.HFSpeechMixEED("tiny-speech", "tiny-bart-bytes",
                                   down_scale=4)
    args = SimpleNamespace(batch=2, grad_accum=1, seed=0, prompt=None,
                           synthetic=True, dataset=None, custom_set=None,
                           field=None, train_split=None, test_split=None,
                           multihost=True, cache=False,
                           max_input_length_in_sec=30, worker=1,
                           group_by_length=True)
    train_fac, eval_fac = ds_lib.build_datasets(args, model)
    sched = [";".join(f"{k}:{np.asarray(v).shape}"
                      for k, v in sorted(b.items()))
             for b in train_fac()]
    with open(os.path.join(out_dir, f"sched_{pid}.txt"), "w") as f:
        f.write("\n".join(sched))

    # --- multihost evaluate plumbing: global predictions -> this host's
    # rows (local_rows) -> the identical global row set on every host
    # (allgather_rows)
    eval_fn = trainer_lib.make_eval_step(model.config, tc)
    batch0 = next(iter(eval_fac()))
    sharded_params = mesh_lib.shard_params(mesh, model.params)
    placed = mesh_lib.shard_batch(
        mesh, {k: np.asarray(v) for k, v in batch0.items()})
    out = eval_fn(sharded_params, placed)
    preds = mesh_lib.allgather_rows(
        mesh_lib.local_rows(out["predictions"]))
    with open(os.path.join(out_dir, f"eval_{pid}.txt"), "w") as f:
        f.write(f"{preds.shape} {int(np.asarray(preds).sum())} "
                f"{float(out['loss']):.8f}")
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
