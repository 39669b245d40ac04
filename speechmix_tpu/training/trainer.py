"""Training loop: optax Adafactor + warmup, lax.scan gradient accumulation,
mesh-sharded jitted train step, eval with WER/CER, early stopping, gradual
unfreezing, and checkpointing.

This is the TPU-native equivalent of the reference's L4/L5 harness
(train.py:291-330): the reference outsources its loop to HF Trainer; here the
loop is explicit and every step is one jitted, mesh-aware function:

  * optimizer: Adafactor (reference: optim="adafactor", train.py:298) with
    linear warmup (warmup_steps, train.py:307) and global-norm clipping
    (max_grad_norm, train.py:164)
  * gradient accumulation: lax.scan over the microbatch axis inside the
    jitted step (reference: gradient_accumulation_steps, train.py:295)
  * data parallel: batch sharded over the mesh `data` axis; XLA inserts the
    gradient all-reduce over ICI (reference relied on implicit Trainer DDP)
  * freezing: variant masks + fixed_parameters policy + FreezingCallback-
    style gradual unfreeze, all as gradient multiplier pytrees
    (training/freezing.py)
  * GAN alternation: step-indexed generator/discriminator masks
    (fixes SURVEY.md §2.5.7)
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field
from functools import partial
from typing import Any, Callable, Iterable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import SpeechMixConfig
from ..models import speechmix as smx
from ..parallel import mesh as mesh_lib
from ..utils.platform import resolve_use_flash
from . import freezing
from .checkpoint import CheckpointManager


@dataclass
class TrainConfig:
    learning_rate: float = 4e-5
    warmup_steps: int = 500
    # LR decay after warmup.  The reference's HF Trainer defaults to linear
    # decay to 0 over the full run (TrainingArguments lr_scheduler_type
    # "linear"; train.py:291-311 never overrides it) — mirrored here when the
    # total step count is known (max_steps > 0), else constant.
    lr_schedule: str = "linear"  # "linear" | "cosine" | "constant"
    max_grad_norm: float = 10.0
    grad_accum: int = 1
    num_epochs: int = 10
    eval_steps: int = 700
    logging_steps: int = 10
    save_total_limit: int = 2
    early_stopping_patience: int = 20
    # restore the best-eval_loss checkpoint when training ends (reference:
    # TrainingArguments load_best_model_at_end=True, train.py:300)
    load_best_model_at_end: bool = True
    # FreezingCallback window in epochs (train.py:327 passes 500 *steps* to a
    # parameter the callback treats as epochs; we keep epochs semantics)
    freeze_epochs: int = 0
    # "tensor" replicates the reference FreezingCallback exactly (individual
    # tensors released in reverse registration order, epoch-0 fully
    # trainable — freezing.reference_unfreeze_scale); "layer" is the coarser
    # stacked-layer schedule (freezing.gradual_unfreeze_scale)
    unfreeze_granularity: str = "tensor"
    max_steps: int = 0  # 0 = no cap
    # also run free-running generate() + WER/CER at each eval (the real ASR
    # metric; teacher-forced eval alone mirrors the reference Trainer)
    predict_with_generate: bool = False
    num_beams: int = 1  # beams for predict_with_generate decoding
    output_dir: str = "./checkpoints"
    # "npz" (flat single-host files) or "orbax" (sharding-aware,
    # multi-host-safe) — training/checkpoint.py
    checkpoint_backend: str = "npz"
    seed: int = 0
    bf16: bool = False  # compute dtype (reference --fp16 equivalent)
    # training-mode dropout at the HF placements (the reference trains with
    # the backbones' default ~0.1 rates, hf_model.py:216-219); rates come
    # from the model configs, this flag gates rng threading.  Deterministic
    # given (seed, step).  Off for exact-equivalence tests.
    dropout: bool = True
    # single-pass Pallas attention in the train step (custom-VJP backward
    # recomputes scores in VMEM instead of storing (B, H, T, T) probs;
    # in-kernel PRNG dropout, so it composes with the dropout-on
    # reference-fidelity recipe).  None = AUTO: on.  With
    # sequence_parallel > 1 the seq-sharded speech-encoder self-attention
    # dispatches to ring attention over the `seq` axis (ops/ring_attention;
    # XLA can't partition a Pallas call over the time axis) while flash
    # kernels keep serving the unsharded decoder/text attention.
    # Measured dropout-ON, flagship B=16 no-remat: flash 239 ms/step vs XLA
    # remat 464 ms (no-remat XLA OOMs) — PERF.md round-3 table.  On CPU the
    # flash path falls back to XLA attention automatically.
    use_flash: Optional[bool] = None

    def resolved_use_flash(self) -> bool:
        return True if self.use_flash is None else self.use_flash
    model_parallel: int = 1
    sequence_parallel: int = 1  # mesh `seq` axis size (long-audio scaling)
    # optimizer family: "adafactor" is the reference recipe (HF Trainer
    # adafactor=True, train.py:298); "adamw" is HF's default when that flag
    # is off — exposed because its 2x-f32-moment state is where ZeRO-1
    # sharding pays (725M-param large pair: 5.8 GB of moments per chip
    # replicated vs /n_data sharded)
    optimizer: str = "adafactor"
    # ZeRO-1: shard optimizer state over the mesh `data` axis
    # (parallel.mesh.opt_state_sharding).  Step math is unchanged — pinned
    # equal to the replicated step by tests/test_training.py
    zero1: bool = False
    wandb: bool = False  # mirror metrics to wandb when installed
    fixed_speech: bool = False
    fixed_nlp: bool = True
    # failure detection: abort (exit 98) if no train-loop heartbeat for this
    # many seconds — a wedged device call otherwise blocks forever; a
    # supervisor relaunch resumes from the latest checkpoint.  0 = disabled.
    stall_timeout_s: float = 0.0
    # async input pipeline: batches sharded+staged to device this many steps
    # ahead by a host thread (data/prefetch.py).  0 = synchronous.
    prefetch_depth: int = 2


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


def make_lr_schedule(tc: TrainConfig):
    decay_steps = max(tc.max_steps - tc.warmup_steps, 1)
    if tc.lr_schedule == "linear" and tc.max_steps > 0:
        tail = optax.linear_schedule(tc.learning_rate, 0.0, decay_steps)
    elif tc.lr_schedule == "cosine" and tc.max_steps > 0:
        tail = optax.cosine_decay_schedule(tc.learning_rate, decay_steps)
    else:  # "constant", or unbounded runs where the horizon is unknown
        tail = optax.constant_schedule(tc.learning_rate)
    return optax.join_schedules(
        [optax.linear_schedule(0.0, tc.learning_rate, tc.warmup_steps),
         tail],
        [tc.warmup_steps])


def make_optimizer(tc: TrainConfig):
    schedule = make_lr_schedule(tc)
    if tc.optimizer == "adamw":
        # HF Trainer AdamW kwargs: betas (0.9, 0.999), eps 1e-8,
        # weight_decay = TrainingArguments default 0.0 (optax's own default
        # is 1e-4 — a recipe divergence the reference never opted into)
        inner = optax.adamw(learning_rate=schedule, weight_decay=0.0)
    elif tc.optimizer == "adafactor":
        # HF Trainer builds Adafactor(scale_parameter=False,
        # relative_step=False) for the reference's adafactor=True recipe
        # (train.py:298); optax's multiply_by_parameter_scale=True default
        # is the Adafactor-paper variant HF turns OFF.  Matching it keeps
        # the update rule identical: lr * clip_rms(ĝ / sqrt(v̂)).
        # Curve agreement vs the reference's executed HF Trainer loop is
        # pinned by experiments/recipe_parity.py / tests/test_recipe_parity.
        # min_dim_size_to_factor=0: HF's Adafactor factors the second moment
        # for EVERY >=2-D param; optax's 128 cutoff silently switches small
        # matrices to unfactored stats (measured 300-step drift on the tiny
        # parity model; identical behavior at real model dims >=128).
        inner = optax.adafactor(learning_rate=schedule,
                                multiply_by_parameter_scale=False,
                                min_dim_size_to_factor=0)
    else:
        raise ValueError(f"unknown optimizer {tc.optimizer!r} "
                         f"(expected 'adafactor' or 'adamw')")
    return optax.chain(
        optax.clip_by_global_norm(tc.max_grad_norm),
        inner,
    )


def create_train_state(rng, cfg: SpeechMixConfig, tc: TrainConfig):
    params = smx.init_speechmix(rng, cfg)
    optimizer = make_optimizer(tc)
    opt_state = optimizer.init(params)
    return TrainState(params=params, opt_state=opt_state,
                      step=jnp.zeros((), jnp.int32))


def make_train_step(cfg: SpeechMixConfig, tc: TrainConfig, params_example,
                    mesh=None):
    """Build the jitted train step.

    Signature: step_fn(state, batch, unfreeze_progress) -> (state, metrics)
    batch leaves are (accum * micro_b, ...); the step reshapes to
    (accum, micro_b, ...) and lax.scan-accumulates gradients.

    mesh: required when tc.sequence_parallel > 1 — encoder activations are
    annotated time-sharded over the mesh's `seq` axis while tracing, and
    the seq-sharded self-attention runs as ring attention over the `seq`
    ring (ops/ring_attention.py: ppermute K/V rotation + online-softmax
    block merge) instead of XLA all-gathering K/V around every layer.
    """
    optimizer = make_optimizer(tc)
    dtype = jnp.bfloat16 if tc.bf16 else jnp.float32
    static_mask = freezing.variant_trainable_mask(
        params_example, cfg, tc.fixed_speech, tc.fixed_nlp)
    use_flash = tc.resolved_use_flash()
    seq_mesh = mesh if (mesh is not None and tc.sequence_parallel > 1) \
        else None
    opt_shardings = None
    if tc.zero1 and mesh is not None:
        opt_shardings = mesh_lib.opt_state_sharding(
            mesh, jax.eval_shape(optimizer.init, params_example))

    # dropout rng: deterministic chain keyed on (seed, step, microbatch) —
    # resumable runs replay identical masks
    base_rng = jax.random.PRNGKey(tc.seed + 0x5EED)

    def loss_fn(params, micro, dropout_rng):
        labels = micro["labels"]
        if "example_mask" in micro:
            # partial final batches are filled by repeating examples
            # (data/collator.py); mask the filler rows out of the loss
            labels = jnp.where(micro["example_mask"][:, None], labels, -100)
        with mesh_lib.seq_sharding(seq_mesh), mesh_lib.tp_sharding(mesh):
            out = smx.speechmix_forward(
                params, cfg, micro["input_values"],
                lengths=micro.get("lengths"), labels=labels,
                text_input_ids=micro.get("text_input_ids"),
                prompt_ids=micro.get("prompt_ids"),
                use_flash=use_flash, dtype=dtype,
                dropout_rng=dropout_rng)
        return out["loss"], out

    def step_fn(state: TrainState, batch, unfreeze_progress):
        accum = tc.grad_accum

        def micro_batches(x):
            return x.reshape(accum, x.shape[0] // accum, *x.shape[1:])

        micro = jax.tree_util.tree_map(micro_batches, batch)
        micro_rngs = jax.random.split(
            jax.random.fold_in(base_rng, state.step), accum)

        def accum_body(carry, xs):
            mb, rng = xs
            g_sum, l_sum = carry
            (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params, mb, rng if tc.dropout else None)
            g_sum = jax.tree_util.tree_map(jnp.add, g_sum, grads)
            return (g_sum, l_sum + loss), None

        zero_grads = jax.tree_util.tree_map(
            lambda p: jnp.zeros(p.shape, jnp.float32), state.params)
        (grads, loss_sum), _ = jax.lax.scan(
            accum_body, (zero_grads, jnp.zeros((), jnp.float32)),
            (micro, micro_rngs))
        grads = jax.tree_util.tree_map(lambda g: g / accum, grads)
        loss = loss_sum / accum

        # freezing stack: static variant mask * gradual unfreeze * GAN parity
        masks = [static_mask]
        if tc.freeze_epochs > 0:
            if tc.unfreeze_granularity == "tensor":
                masks.append(freezing.reference_unfreeze_scale(
                    state.params, unfreeze_progress * tc.freeze_epochs,
                    tc.freeze_epochs))
            else:
                masks.append(freezing.gradual_unfreeze_scale(
                    state.params, unfreeze_progress))
        if cfg.variant == "gan":
            masks.append(freezing.gan_alternating_masks(
                state.params, state.step, cfg.gan_discriminator_update_every))
        grads = freezing.apply_grad_mask(grads, *masks)

        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        if opt_shardings is not None:
            # ZeRO-1: pin the fresh state to its data-sharded layout so the
            # whole update computation partitions over `data`
            opt_state = mesh_lib.constrain_opt_state(opt_state,
                                                     opt_shardings)
        params = optax.apply_updates(state.params, updates)
        metrics = {"loss": loss,
                   "grad_norm": optax.global_norm(grads)}
        return TrainState(params=params, opt_state=opt_state,
                          step=state.step + 1), metrics

    return jax.jit(step_fn, donate_argnums=(0,))



def _placed_like(restored, like):
    """Re-place a restored state tree with the live tree's shardings (the
    npz backend loads host arrays with no NamedSharding; a resumed
    model-parallel run must put params back on the mesh layout the step
    was compiled against)."""
    def place(r, l):
        sh = getattr(l, "sharding", None)
        return jax.device_put(r, sh) if sh is not None else r
    return jax.tree_util.tree_map(place, restored, like)

def make_eval_step(cfg: SpeechMixConfig, tc: TrainConfig, mesh=None):
    dtype = jnp.bfloat16 if tc.bf16 else jnp.float32

    def eval_fn(params, batch):
        labels = batch["labels"]
        if "example_mask" in batch:
            labels = jnp.where(batch["example_mask"][:, None], labels, -100)
        with mesh_lib.tp_sharding(mesh):
            out = smx.speechmix_forward(
                params, cfg, batch["input_values"],
                lengths=batch.get("lengths"), labels=labels,
                text_input_ids=batch.get("text_input_ids"),
                prompt_ids=batch.get("prompt_ids"), dtype=dtype)
        preds = jnp.argmax(out["logits"], axis=-1)
        # example count weights evaluate()'s per-batch mean losses the way
        # HF Trainer does (loss.repeat(batch_size) then a flat mean —
        # example-weighted, not token-weighted); n_tokens lets evaluate()
        # drop all-padding batches whose mean CE is NaN.  eval_loss drives
        # early stopping and best-checkpoint selection, so the weighting
        # must match the reference's.
        n_ex = (jnp.sum(batch["example_mask"]) if "example_mask" in batch
                else jnp.asarray(labels.shape[0]))
        return {"loss": out["loss"], "predictions": preds,
                "n_tokens": jnp.sum(labels != -100), "n_examples": n_ex}

    return jax.jit(eval_fn)


class JSONLLogger:
    """Minimal metrics logger (reference reported to wandb via Trainer,
    train.py:310; this writes wandb-compatible JSONL and echoes to stdout).

    use_wandb=True additionally mirrors records to wandb when the package is
    installed (project from WANDB_PROJECT, reference README.md:28-29);
    silently degrades to JSONL-only otherwise — this image has no wandb."""

    def __init__(self, path: Optional[str], use_wandb: bool = False):
        self.path = path
        if path:
            os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
            self._f = open(path, "a")
        else:
            self._f = None
        self._wandb = None
        if use_wandb:
            try:
                import wandb
                self._wandb = wandb
                if wandb.run is None:
                    wandb.init(project=os.environ.get("WANDB_PROJECT",
                                                      "speechmix_tpu"))
            except Exception:  # no package / no auth / offline: JSONL-only
                self._wandb = None

    def log(self, record: dict):
        record = {k: (float(v) if hasattr(v, "item") else v)
                  for k, v in record.items()}
        if self._f:
            self._f.write(json.dumps(record) + "\n")
            self._f.flush()
        if self._wandb is not None:
            step = record.get("step")
            self._wandb.log(record,
                            step=int(step) if step is not None else None)
        print(json.dumps(record))

    def close(self):
        if self._f:
            self._f.close()


class Trainer:
    """Host-side training orchestration (epochs, eval, early stopping,
    checkpoints) around the jitted step functions."""

    def __init__(self, cfg: SpeechMixConfig, tc: TrainConfig, tokenizer=None,
                 mesh=None):
        self.cfg = cfg
        self.tc = tc
        self.tokenizer = tokenizer
        self.mesh = mesh or mesh_lib.make_mesh(
            n_model=tc.model_parallel, n_seq=tc.sequence_parallel)
        self.logger = JSONLLogger(os.path.join(tc.output_dir, "metrics.jsonl")
                                  if tc.output_dir else None,
                                  use_wandb=tc.wandb)
        self.ckpt = CheckpointManager(tc.output_dir, tc.save_total_limit,
                                      backend=tc.checkpoint_backend) \
            if tc.output_dir else None
        # predict() jit cache, persistent across calls so the per-bucket
        # generate functions trace/compile once per run, not once per eval
        # round — keyed on (batch shape, decode options)
        self._predict_fns = {}

    def init_state(self, rng=None):
        rng = rng if rng is not None else jax.random.PRNGKey(self.tc.seed)
        state = create_train_state(rng, self.cfg, self.tc)
        opt_state = state.opt_state
        if self.tc.zero1:
            opt_state = mesh_lib.shard_opt_state(self.mesh, opt_state)
        state = TrainState(
            params=mesh_lib.shard_params(self.mesh, state.params),
            opt_state=opt_state, step=state.step)
        return state

    def fit(self, state: TrainState, train_batches: Callable[[], Iterable],
            eval_batches: Optional[Callable[[], Iterable]] = None,
            resume: bool = True):
        """train_batches/eval_batches: zero-arg callables returning a fresh
        iterator of batch dicts per epoch (static shapes per bucket).
        resume=True restores the latest checkpoint (params + optimizer state
        + step) from output_dir if one exists."""
        if resume and self.ckpt is not None and \
                self.ckpt.latest_step() is not None:
            like = {"params": state.params, "opt_state": state.opt_state,
                    "step": state.step}
            restored, meta = self.ckpt.restore(like)
            if restored is not None:
                if self.mesh is not None:
                    restored = _placed_like(restored, like)
                state = TrainState(params=restored["params"],
                                   opt_state=restored["opt_state"],
                                   step=restored["step"])
                self.logger.log({"resumed_from_step": int(state.step)})
        step_fn = make_train_step(self.cfg, self.tc, state.params,
                                  mesh=self.mesh)
        eval_fn = make_eval_step(self.cfg, self.tc, mesh=self.mesh)

        best_metric = float("inf")
        best_step = 0
        patience_left = self.tc.early_stopping_patience
        t0 = time.time()
        # host-side step counter: reading state.step would force a
        # device->host sync on every step
        step = int(state.step)

        watchdog = None
        if self.tc.stall_timeout_s > 0:
            from ..utils.watchdog import StallWatchdog
            watchdog = StallWatchdog(self.tc.stall_timeout_s)
            watchdog.log_path = self.logger.path
            watchdog.start()
        try:
            state = self._fit_loop(state, train_batches, eval_batches,
                                   step_fn, eval_fn, best_metric, best_step,
                                   patience_left, t0, step, watchdog)
        finally:
            if watchdog is not None:
                watchdog.stop()
        if self.tc.load_best_model_at_end and self.ckpt is not None:
            best = self.ckpt.best_step()
            if best is not None and best != int(state.step):
                like = {"params": state.params,
                        "opt_state": state.opt_state, "step": state.step}
                restored, _ = self.ckpt.restore(like, step=best)
                if restored is not None:
                    if self.mesh is not None:
                        restored = _placed_like(restored, like)
                    state = TrainState(params=restored["params"],
                                       opt_state=restored["opt_state"],
                                       step=restored["step"])
                    self.logger.log({"loaded_best_model_from_step": best})
        return state

    def _fit_loop(self, state, train_batches, eval_batches, step_fn, eval_fn,
                  best_metric, best_step, patience_left, t0, step, watchdog):
        for epoch in range(self.tc.num_epochs):
            progress = (epoch / self.tc.freeze_epochs
                        if self.tc.freeze_epochs > 0 else 1.0)
            if self.tc.prefetch_depth > 0:
                from ..data.prefetch import prefetch_to_device
                epoch_batches = prefetch_to_device(
                    train_batches(), self.mesh, self.tc.prefetch_depth)
            else:
                epoch_batches = (mesh_lib.shard_batch(self.mesh, b)
                                 for b in train_batches())
            for batch in epoch_batches:
                if watchdog is not None:
                    watchdog.beat()
                state, metrics = step_fn(state, batch,
                                         jnp.float32(progress))
                step += 1
                # NOTE: the max_steps exit comes AFTER the eval/save block —
                # HF Trainer order: a step that is both an eval step and the
                # last step still evaluates and checkpoints before stopping
                # (otherwise load_best_model_at_end compares the final params
                # against nothing and silently restores an older step)
                if step % self.tc.logging_steps == 0:
                    self.logger.log({"step": step, "epoch": epoch,
                                     "loss": metrics["loss"],
                                     "grad_norm": metrics["grad_norm"],
                                     "elapsed": time.time() - t0})
                if eval_batches and step % self.tc.eval_steps == 0:
                    beat = watchdog.beat if watchdog is not None else None
                    eval_metrics = self.evaluate(state.params, eval_fn,
                                                 eval_batches,
                                                 heartbeat=beat)
                    if self.tc.predict_with_generate:
                        eval_metrics.update(self.predict(
                            state.params, eval_batches,
                            num_beams=self.tc.num_beams, heartbeat=beat))
                    self.logger.log({"step": step, **eval_metrics})
                    score = eval_metrics.get("eval_loss", float("inf"))
                    if self.ckpt:
                        self.ckpt.save(step,
                                       {"params": state.params,
                                        "opt_state": state.opt_state,
                                        "step": state.step},
                                       eval_metrics)
                    if score < best_metric:
                        best_metric, best_step = score, step
                        patience_left = self.tc.early_stopping_patience
                    else:
                        patience_left -= 1
                        if patience_left <= 0:
                            self.logger.log({"early_stop": True,
                                             "best_step": best_step})
                            return state
                if self.tc.max_steps and step >= self.tc.max_steps:
                    self.logger.log({"step": step, "loss": metrics["loss"],
                                     "max_steps_reached": True})
                    return state
        return state

    def predict(self, params, eval_batches, max_length=None, num_beams=1,
                heartbeat=None, kv_int8=False):
        """Free-running ASR eval: greedy/beam generate() per batch + WER/CER
        against the label transcripts.  This is the real decoding metric (the
        teacher-forced eval in `evaluate` mirrors the reference's Trainer
        semantics, train.py:76-88)."""
        from .. import generation as gen_lib
        from ..metrics import cer, wer
        max_length = max_length or self.cfg.decoder.max_length
        fns = self._predict_fns
        refs, hyps = [], []
        for batch in eval_batches():
            if heartbeat is not None:
                heartbeat()
            shape = (batch["input_values"].shape, max_length, num_beams,
                     kv_int8)
            fn = fns.get(shape)
            if fn is None:
                def raw(params, wav, lengths):
                    with mesh_lib.tp_sharding(self.mesh):
                        return gen_lib.generate(
                            params, self.cfg, wav, lengths,
                            max_length=max_length, num_beams=num_beams,
                            # inference-only: the single-pass flash kernel
                            # wins on TPU (PERF.md); training keeps XLA
                            # attention (no custom VJP needed)
                            use_flash=resolve_use_flash(None),
                            kv_int8=kv_int8,
                            dtype=jnp.bfloat16 if self.tc.bf16
                            else jnp.float32)
                fn = jax.jit(raw)
                fns[shape] = fn
            audio_in = {"input_values": np.asarray(batch["input_values"]),
                        "lengths": np.asarray(batch["lengths"])}
            rows = len(audio_in["lengths"])
            if jax.process_count() > 1 or \
                    rows % self.mesh.shape[mesh_lib.DATA_AXIS] == 0:
                # multihost REQUIRES global assembly (host-local arrays
                # can't mix with mesh-sharded params); single-host shards
                # over `data` when the batch divides evenly
                placed = mesh_lib.shard_batch(self.mesh, audio_in)
            else:
                placed = {k: jnp.asarray(v) for k, v in audio_in.items()}
            tokens, _ = fn(params, placed["input_values"],
                           placed["lengths"])
            tokens = mesh_lib.allgather_rows(mesh_lib.local_rows(tokens))
            labels = mesh_lib.allgather_rows(np.asarray(batch["labels"]))
            real = batch.get("example_mask")
            real = (np.ones(len(tokens), bool) if real is None
                    else mesh_lib.allgather_rows(np.asarray(real)))
            for i in range(len(tokens)):
                if not real[i]:
                    continue
                hyps.append(self.tokenizer.decode(
                    tokens[i], skip_special_tokens=True))
                lab = labels[i]
                refs.append(self.tokenizer.decode(
                    lab[lab != -100], skip_special_tokens=True))
        return {"predict_wer": wer(refs, hyps),
                "predict_cer": cer(refs, hyps),
                "n_examples": len(refs)}

    def evaluate(self, params, eval_fn, eval_batches, heartbeat=None):
        losses, weights, all_preds, all_labels = [], [], [], []
        for batch in eval_batches():
            if heartbeat is not None:
                heartbeat()
            batch_dev = mesh_lib.shard_batch(self.mesh, batch)
            out = eval_fn(params, batch_dev)
            if float(out.get("n_tokens", 1.0)) > 0:
                # a batch with zero valid tokens has NaN mean CE — exclude
                # it (zero weight would still poison np.dot with NaN)
                losses.append(float(out["loss"]))
                weights.append(float(out.get("n_examples", 1.0)))
            # this host's rows of the (global) predictions, then the global
            # row set on every host — metrics must agree across processes
            preds = mesh_lib.allgather_rows(
                mesh_lib.local_rows(out["predictions"]))
            labels = mesh_lib.allgather_rows(np.asarray(batch["labels"]))
            real = batch.get("example_mask")
            real = (np.ones(len(labels), bool) if real is None
                    else mesh_lib.allgather_rows(np.asarray(real)))
            preds, labels = preds[real], labels[real]
            all_preds.append(preds)
            all_labels.append(labels)
        # example-weighted mean of per-batch mean losses — exactly HF
        # Trainer's eval_loss (evaluation_loop repeats each batch's mean
        # loss per example and takes one flat mean), so early stopping and
        # best-checkpoint selection see the reference's statistic
        total_w = sum(weights)
        metrics = {"eval_loss": (
            float(np.dot(losses, weights) / total_w) if total_w > 0
            else float("nan"))}
        if self.tokenizer is not None:
            from ..metrics import compute_metrics
            preds = [p for arr in all_preds for p in arr]
            labels = [l for arr in all_labels for l in arr]
            metrics.update(compute_metrics(preds, labels, self.tokenizer))
        return metrics
