"""CLI training entry point — reference-compatible flag surface
(/root/reference/train.py:136-186) on top of the TPU-native stack.

    python train.py --SpeechMixEED --speech_model_config wav2vec2 \
        --nlp_model_config facebook/bart-base --dataset librispeech_asr \
        --field clean --train_split train.100 --test_split validation \
        --batch 3 --grad_accum 20 --epoch 30 --lr 4e-5 --warmup_steps 500 \
        --share_layer_ratio 0 --down_scale 2

Differences from the reference (documented fixes, SURVEY.md §2.5):
  * one --worker flag used consistently (the reference crashes on the
    undefined num_proc key, §2.5.1)
  * audio zero-padded with masks; static-shape bucketing (§2.5.2)
  * seeded single split for --custom_set (§2.5.3)
  * teacher-target generation is one batched jitted decode, not a per-token
    python loop (train.py:18-34)
  * --bf16 replaces --fp16 (TPU-preferred numerics); --fp16 is accepted as
    an alias
"""

import argparse
import os
import sys

import numpy as np

MODEL_FLAGS = [
    "SpeechMixEED", "SpeechMixED", "SpeechMixSelf", "SpeechMixAdapter",
    "SpeechMixGAN", "SpeechMixFixed", "HFSpeechMixEED", "HFSpeechMixED",
    "HFSpeechMixSelf", "HFSpeechMixAdapter", "HFSpeechMixGAN",
    "HFSpeechMixFixed",
]


def parse_args(args):
    parser = argparse.ArgumentParser()
    parser.add_argument("--speech_model_config", type=str)
    parser.add_argument("--nlp_model_config", type=str)
    for flag in MODEL_FLAGS:
        parser.add_argument(f"--{flag}", action="store_true")
    parser.add_argument("--cache", action="store_true")
    parser.add_argument("--dataset", type=str)
    parser.add_argument("--prompt", type=str)
    parser.add_argument("--field", type=str)
    parser.add_argument("--train_split", type=str)
    parser.add_argument("--test_split", type=str)
    parser.add_argument("--notes", type=str)
    parser.add_argument("--grad_accum", default=3, type=int)
    parser.add_argument("--logging_steps", default=10, type=int)
    parser.add_argument("--warmup_steps", default=500, type=int)
    parser.add_argument("--unfreeze_warmup_steps", default=None, type=int,
                        help="reference-quirk alias: /root/reference/"
                             "train.py:327 passes this value as "
                             "FreezingCallback's freeze_epoch, so when given "
                             "explicitly it OVERRIDES --freeze_epochs (the "
                             "gradual-unfreeze window, in epochs)")
    parser.add_argument("--save_total_limit", default=2, type=int)
    parser.add_argument("--checkpoint_backend", default="npz",
                        choices=["npz", "orbax"],
                        help="npz: flat single-host files; orbax: "
                        "sharding-aware, multi-host-safe")
    parser.add_argument("--max_grad_norm", default=10, type=float)
    parser.add_argument("--worker", default=10, type=int,
                        help="host-side data-prep thread count (CSV/audio "
                             "load + resample, tokenize) — the reference's "
                             "num_proc/dataloader_num_workers role")
    parser.add_argument("--batch", type=int, default=3)
    parser.add_argument("--epoch", default=1000, type=int)
    parser.add_argument("--lr", type=float, default=4e-5)
    parser.add_argument("--lr_scheduler", default="linear",
                        choices=["linear", "cosine", "constant"],
                        help="post-warmup LR decay (linear = HF Trainer "
                             "default; decaying schedules need --max_steps)")
    parser.add_argument("--eval_step", default=700, type=int)
    parser.add_argument("--share_layer_ratio", default=0, type=float)
    parser.add_argument("--down_scale", default=8, type=int)
    parser.add_argument("--weighted_sum", action="store_true")
    parser.add_argument("--fixed_parameters", action="store_true")
    parser.add_argument("--custom_set", type=str)
    parser.add_argument("--max_input_length_in_sec", default=20, type=int)
    # the reference hard-codes group_by_length=True in TrainingArguments
    # (train.py:306); True = bucketed static-shape padding, False pads every
    # batch to the largest bucket (HF-without-length-sampler behavior)
    parser.add_argument("--group_by_length", default=True,
                        action=argparse.BooleanOptionalAction)
    parser.add_argument("--dropout", default=True,
                        action=argparse.BooleanOptionalAction,
                        help="training-mode dropout at the HF placements "
                             "(rates from the model configs; the reference "
                             "trains with backbone-default ~0.1)")
    parser.add_argument("--multihost", action="store_true",
                        help="multi-host TPU pod: jax.distributed.initialize "
                             "over DCN + per-host dataset sharding")
    parser.add_argument("--fixed_except", nargs="+",
                        default=["layer_norm", "encoder_attn",
                                 "enc_to_dec_proj", "length_adapter",
                                 "layernorm_embedding", "attention",
                                 "encoder"])
    parser.add_argument("--fp16", action="store_true")
    parser.add_argument("--bf16", action="store_true")
    parser.add_argument("--wandb", action="store_true")
    parser.add_argument("--output_dir", type=str, default=None)
    parser.add_argument("--model_parallel", default=1, type=int)
    parser.add_argument("--sequence_parallel", default=1, type=int,
                        help="mesh `seq` axis: shard encoder activations "
                             "over time for long audio")
    parser.add_argument("--optimizer", default="adafactor",
                        choices=("adafactor", "adamw"),
                        help="adafactor is the reference recipe "
                             "(train.py:298); adamw is HF Trainer's "
                             "default when that flag is off")
    parser.add_argument("--zero1", action="store_true",
                        help="ZeRO-1: shard optimizer state over the mesh "
                             "data axis (per-chip state memory / n_data); "
                             "step math unchanged")
    parser.add_argument("--seed", default=0, type=int)
    parser.add_argument("--freeze_epochs", default=3, type=int)
    parser.add_argument("--synthetic", action="store_true",
                        help="train on synthetic data (offline smoke runs)")
    parser.add_argument("--max_steps", default=0, type=int)
    parser.add_argument("--flash_attention", default=None,
                        action=argparse.BooleanOptionalAction,
                        help="single-pass Pallas attention in the train "
                             "step (custom-VJP backward recomputes scores "
                             "in VMEM — fits 2x the batch; in-kernel PRNG "
                             "dropout so it composes with --dropout).  "
                             "Default: ON; composes with "
                             "--sequence_parallel via ring attention "
                             "(--no-flash_attention forces the XLA path)")
    parser.add_argument("--stall_timeout", default=0.0, type=float,
                        help="failure detection: exit 98 if no train-loop "
                             "heartbeat for this many seconds (restart "
                             "resumes from the latest checkpoint); set well "
                             "above worst-case XLA compile time (~600s on "
                             "tunneled TPU). 0 disables")
    parser.add_argument("--load_best_model_at_end", default=True,
                        action=argparse.BooleanOptionalAction,
                        help="restore the best-eval_loss checkpoint when "
                             "training ends (reference TrainingArguments, "
                             "train.py:300); only evaluated steps are "
                             "candidates — align --eval_step with the run "
                             "length or pass --no-load_best_model_at_end")
    parser.add_argument("--num_beams", default=1, type=int,
                        help="beam width for --predict_with_generate "
                             "decoding (HF-semantics beam search)")
    parser.add_argument("--predict_with_generate", action="store_true",
                        help="also run free-running generate() + WER/CER at "
                             "each eval (the real ASR metric; teacher-forced "
                             "eval alone mirrors the reference Trainer)")
    parser.add_argument("--platform", default=None,
                        choices=["cpu", "tpu"],
                        help="force a JAX platform (the environment may "
                             "override JAX_PLATFORMS; this flag wins)")

    input_args, model_arg = parser.parse_known_args(args)
    other = {k.replace("--", ""): _coerce(v)
             for k, v in zip(model_arg[:-1:2], model_arg[1::2])}
    return input_args, other


def _coerce(v):
    """Pass-through kwargs arrive as strings; interpret the obvious literals
    (the reference forwards raw strings, so --fixed_speech False was truthy —
    SURVEY.md §5 config-system note)."""
    low = v.lower()
    if low in ("true", "false"):
        return low == "true"
    for cast in (int, float):
        try:
            return cast(v)
        except ValueError:
            pass
    return v


def pick_model(input_args, other):
    import speechmix_tpu as smx_api

    name = next((f for f in MODEL_FLAGS if getattr(input_args, f)),
                "SpeechMixEED")
    cls = getattr(smx_api, name)
    kwargs = dict(
        speech_model_config=input_args.speech_model_config or "wav2vec2",
        nlp_model_config=input_args.nlp_model_config or "facebook/bart-base",
        share_layer_ratio=input_args.share_layer_ratio,
        down_scale=input_args.down_scale,
        weighted_sum=input_args.weighted_sum,
        fixed_parameters=input_args.fixed_parameters,
        fixed_except=input_args.fixed_except,
        seed=input_args.seed,
        dtype="bfloat16" if (input_args.bf16 or input_args.fp16)
        else "float32",
    )
    kwargs.update(other)
    return name, cls(**kwargs)


def main(arg=None):
    input_args, other = parse_args(sys.argv[1:] if arg is None else arg)
    import jax
    if input_args.platform:
        jax.config.update("jax_platforms", input_args.platform)
    if input_args.multihost:
        # must run before any other jax call on TPU pods (SURVEY.md §2.4
        # multi-host requirement); autodetects the pod topology
        from speechmix_tpu.parallel import mesh as _mesh_early
        _mesh_early.initialize_distributed()
    # persistent compile cache (first compiles through tunneled TPU
    # transports take minutes; cached runs start in seconds)
    from speechmix_tpu.utils.compile_cache import setup_compile_cache
    setup_compile_cache(os.path.join(
        os.path.dirname(os.path.abspath(__file__)), ".jax_cache_tpu"))
    model_type, model = pick_model(input_args, other)
    print(f"model: {model_type} "
          f"speech_layers={model.speech_encoder_layer} "
          f"nlp_layers={model.nlp_encoder_layer} "
          f"trainable={len(model.list_grad)} frozen={len(model.list_no_grad)}")

    from speechmix_tpu.data.datasets import build_datasets
    from speechmix_tpu.training.trainer import TrainConfig, Trainer, \
        TrainState, make_train_step
    from speechmix_tpu.parallel import mesh as mesh_lib
    from speechmix_tpu.training import trainer as trainer_lib

    train_iter, eval_iter = build_datasets(input_args, model)

    out_dir = input_args.output_dir or (
        f"./{(input_args.speech_model_config or 'wav2vec2').replace('/', '_')}"
        f"_{(input_args.nlp_model_config or 'bart').replace('/', '_')}"
        f"_{model_type}_{input_args.notes or ''}")

    tc = TrainConfig(
        learning_rate=input_args.lr,
        lr_schedule=input_args.lr_scheduler,
        warmup_steps=input_args.warmup_steps,
        max_grad_norm=input_args.max_grad_norm,
        grad_accum=input_args.grad_accum,
        num_epochs=input_args.epoch,
        eval_steps=input_args.eval_step,
        logging_steps=input_args.logging_steps,
        save_total_limit=input_args.save_total_limit,
        freeze_epochs=(input_args.unfreeze_warmup_steps
                       if input_args.unfreeze_warmup_steps is not None
                       else input_args.freeze_epochs),
        max_steps=input_args.max_steps,
        output_dir=out_dir,
        seed=input_args.seed,
        bf16=input_args.bf16 or input_args.fp16,
        use_flash=input_args.flash_attention,
        optimizer=input_args.optimizer,
        zero1=input_args.zero1,
        model_parallel=input_args.model_parallel,
        sequence_parallel=input_args.sequence_parallel,
        wandb=input_args.wandb,
        # keep the optimizer's trainable mask in lockstep with the model's
        # freezing bookkeeping (SpeechMixFixed fixed_speech/fixed_nlp kwargs)
        fixed_speech=bool(other.get("fixed_speech", False)),
        fixed_nlp=bool(other.get("fixed_nlp", True)),
        predict_with_generate=input_args.predict_with_generate,
        num_beams=input_args.num_beams,
        load_best_model_at_end=input_args.load_best_model_at_end,
        stall_timeout_s=input_args.stall_timeout,
        dropout=input_args.dropout,
        checkpoint_backend=input_args.checkpoint_backend,
    )

    trainer = Trainer(model.config, tc, tokenizer=model.tokenizer)
    # seed the trainer state from the constructed model params
    import jax
    import jax.numpy as jnp
    optimizer = trainer_lib.make_optimizer(tc)
    params = mesh_lib.shard_params(trainer.mesh, model.params)
    state = TrainState(params=params, opt_state=optimizer.init(params),
                       step=jnp.zeros((), jnp.int32))
    state = trainer.fit(state, train_iter, eval_iter)
    model.params = jax.device_get(state.params)
    model.save_weights(os.path.join(out_dir, "final_weights.npz"))
    print(f"saved final weights to {out_dir}/final_weights.npz")


if __name__ == "__main__":
    main()
