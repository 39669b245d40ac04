"""Recipe-level training parity vs the reference trainer (VERDICT r3 #3).

The last named WER-risk in BASELINE.md is recipe-level: forward/grad/12-step
dynamics are already execution-pinned against the reference's torch code
(tests/test_reference_parity.py), but the full *training recipe* — HF Trainer
with optim="adafactor", linear warmup+decay schedule, grad clipping at HF's
default max_grad_norm=1.0 (the reference PARSES --max_grad_norm at
/root/reference/train.py:164 but never forwards it to TrainingArguments at
train.py:291-311, so the effective reference value is HF's 1.0) — had never
been run side by side for a few hundred steps.

This experiment runs BOTH trainers from the IDENTICAL converted init on the
identical synthetic corpus in the identical batch order:

  * reference side: the reference's own `HFSpeechMixEED`
    (/root/reference/speechmix/hf_model.py:185-447) inside a genuine
    `transformers.Trainer` configured exactly as the reference's
    TrainingArguments block (train.py:291-311) — the reference writes no
    training loop of its own (SURVEY.md §1 L4), so HF Trainer IS its loop.
    Only the sampler is pinned to sequential order (the thing under test is
    the optimization recipe, not torch's shuffle RNG).
  * our side: speechmix_tpu.training.trainer.make_train_step with
    TrainConfig(optimizer="adafactor", lr_schedule="linear") — optax
    Adafactor with multiply_by_parameter_scale=False, matching HF Trainer's
    Adafactor(scale_parameter=False, relative_step=False).

Batches are pre-shaped (equal-length audio and labels inside each batch) so
both sides consume bit-identical tensors; collator semantics are covered
separately (tests/test_data.py).

Outputs: a per-step loss-curve table, curve agreement stats, and end-of-run
greedy-decode token error rates on the training set from both models.

Round-5 extensions (VERDICT r4 #5):
  * --eval_every N: free-running greedy-decode token error rate on a HELD-OUT
    synthetic set (seed-disjoint from training), measured every N steps on
    BOTH stacks — generalization trajectory, not just train-set fit.
  * --dropout P: dropout-ON arm. Both stacks train with all dropout sites at
    rate P (hidden/attention/activation/feat-proj).  Torch and JAX draw from
    different RNGs, so per-step losses are stochastic — the pinned statistics
    for this arm are the final loss window and the held-out TER trajectory.
  * the torch side's SpecAugment is explicitly DISABLED
    (mask_time_prob=0.0): the 300-step round-4 run left the Wav2Vec2Config
    default (0.05) active in train mode on the reference side only, a small
    uncontrolled divergence; isolating the optimization recipe requires both
    sides augmentation-free (SpecAugment parity is pinned separately in
    tests/test_hf_parity.py).

Usage: python experiments/recipe_parity.py [--steps 300] [--platform cpu]
       [--eval_every 250] [--dropout 0.1]
"""

import argparse
import importlib.util
import json
import os
import sys
import tempfile

import numpy as np

VOCAB = 128
HID = 32
EOS = 2
PAD = 1


def load_reference_hf_model():
    spec = importlib.util.spec_from_file_location(
        "reference_hf_model", "/root/reference/speechmix/hf_model.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules["reference_hf_model"] = mod
    spec.loader.exec_module(mod)
    return mod


def build_checkpoints(root, dropout=0.0):
    """Tiny offline wav2vec2 + BART checkpoints, same shapes as
    tests/test_reference_parity.py.  `dropout` sets every dropout site;
    SpecAugment is always off (see module docstring)."""
    import torch
    import transformers
    torch.manual_seed(0)
    sp_dir = os.path.join(root, "w2v2")
    bart_dir = os.path.join(root, "bart")
    w2v_cfg = transformers.Wav2Vec2Config(
        vocab_size=32, hidden_size=HID, num_hidden_layers=4,
        num_attention_heads=2, intermediate_size=64,
        conv_dim=(16, 16, 16), conv_kernel=(10, 3, 3), conv_stride=(5, 2, 2),
        num_conv_pos_embeddings=16, num_conv_pos_embedding_groups=2,
        do_stable_layer_norm=False, feat_extract_norm="group",
        hidden_dropout=dropout, attention_dropout=dropout,
        activation_dropout=dropout, feat_proj_dropout=dropout, layerdrop=0.0,
        apply_spec_augment=False, mask_time_prob=0.0)
    transformers.Wav2Vec2Model(w2v_cfg).save_pretrained(sp_dir)
    transformers.Wav2Vec2FeatureExtractor().save_pretrained(sp_dir)
    bart_cfg = transformers.BartConfig(
        vocab_size=VOCAB, d_model=HID, encoder_layers=2, decoder_layers=2,
        encoder_attention_heads=2, decoder_attention_heads=2,
        encoder_ffn_dim=64, decoder_ffn_dim=64, max_position_embeddings=512,
        dropout=dropout, attention_dropout=dropout,
        activation_dropout=dropout,
        pad_token_id=PAD, bos_token_id=0, eos_token_id=EOS,
        decoder_start_token_id=EOS, scale_embedding=False,
        activation_function="gelu", forced_eos_token_id=None)
    transformers.BartForConditionalGeneration(bart_cfg).save_pretrained(
        bart_dir)
    vocab = {"<s>": 0, "<pad>": 1, "</s>": 2, "<unk>": 3, "<mask>": 4}
    for i, ch in enumerate("abcdefghijklmnopqrstuvwxyz"):
        vocab[ch] = 5 + i
    i = len(vocab)
    while i < VOCAB:
        vocab[f"[x{i}]"] = i
        i += 1
    vocab_file = os.path.join(bart_dir, "vocab.json")
    merges_file = os.path.join(bart_dir, "merges.txt")
    with open(vocab_file, "w") as f:
        json.dump(vocab, f)
    with open(merges_file, "w") as f:
        f.write("#version: 0.2\n")
    transformers.BartTokenizer(vocab_file, merges_file).save_pretrained(
        bart_dir)
    return {"speech": sp_dir, "bart": bart_dir}


def make_examples(n=8, t=4000, label_len=8, seed=0):
    """Fixed-shape synthetic corpus: identical tensors on both sides (no
    padding inside a batch, so the collators can't diverge)."""
    rng = np.random.RandomState(seed)
    wavs = (rng.randn(n, t) * 0.1).astype(np.float32)
    labels = rng.randint(5, 31, size=(n, label_len)).astype(np.int64)
    labels[:, -1] = EOS
    return wavs, labels


def our_cfg(down_scale=4, dropout=0.0):
    from speechmix_tpu.config import (Seq2SeqConfig, SpeechEncoderConfig,
                                      SpeechMixConfig)
    enc = SpeechEncoderConfig(
        name="parity-speech", conv_dims=(16, 16, 16), conv_kernels=(10, 3, 3),
        conv_strides=(5, 2, 2), conv_bias=False, feat_extract_norm="group",
        hidden_size=HID, num_layers=4, num_heads=2, ffn_dim=64,
        pos_conv_kernel=16, pos_conv_groups=2,
        dropout=dropout, attention_dropout=dropout,
        activation_dropout=dropout, feat_proj_dropout=dropout)
    dec = Seq2SeqConfig(
        name="parity-bart", arch="bart", vocab_size=VOCAB, hidden_size=HID,
        encoder_layers=2, decoder_layers=2, num_heads=2, ffn_dim=64,
        max_positions=512, pad_token_id=PAD, bos_token_id=0, eos_token_id=EOS,
        decoder_start_token_id=EOS,
        dropout=dropout, attention_dropout=dropout,
        activation_dropout=dropout)
    return SpeechMixConfig(encoder=enc, decoder=dec, down_scale=down_scale)


RECIPE = dict(lr=1e-3, warmup=20, batch=4, max_grad_norm=1.0)


def run_reference(ref_model, wavs, labels, steps, heldout=None,
                  eval_every=0, eval_max_len=12):
    """The reference recipe, literally: transformers.Trainer +
    TrainingArguments mirroring /root/reference/train.py:291-311 (adafactor,
    linear schedule, warmup; fp16 off on CPU), sequential batch order.

    With eval_every > 0 and a heldout (wavs, refs) pair, greedy-decodes the
    held-out set every eval_every steps (free-running TER trajectory)."""
    import torch
    import transformers
    from torch.utils.data import SequentialSampler

    class ListDataset(torch.utils.data.Dataset):
        def __len__(self):
            return len(wavs)

        def __getitem__(self, i):
            return {"input_values": wavs[i], "labels": labels[i]}

    def collate(features):
        return {
            "input_values": torch.tensor(
                np.stack([f["input_values"] for f in features])),
            "labels": torch.tensor(
                np.stack([f["labels"] for f in features])),
        }

    class SequentialTrainer(transformers.Trainer):
        def _get_train_sampler(self, train_dataset=None):
            return SequentialSampler(
                train_dataset if train_dataset is not None
                else self.train_dataset)

    losses = []
    ter_curve = []

    class LossTap(transformers.TrainerCallback):
        def on_log(self, args, state, control, logs=None, **kw):
            if logs and "loss" in logs:
                losses.append(float(logs["loss"]))

    class HeldoutTER(transformers.TrainerCallback):
        def on_step_end(self, args, state, control, **kw):
            if eval_every and state.global_step % eval_every == 0:
                hw, hrefs = heldout
                hyps = ref_greedy_decode(ref_model, hw, eval_max_len)
                ter = token_error_rate([strip_eos(h) for h in hyps], hrefs)
                ter_curve.append((int(state.global_step), float(ter)))
                ref_model.train()

    callbacks = [LossTap()]
    if eval_every and heldout is not None:
        callbacks.append(HeldoutTER())

    with tempfile.TemporaryDirectory() as out:
        args = transformers.TrainingArguments(
            output_dir=out,
            per_device_train_batch_size=RECIPE["batch"],
            gradient_accumulation_steps=1,
            optim="adafactor",
            eval_strategy="no", save_strategy="no",
            max_steps=steps,
            logging_steps=1,
            learning_rate=RECIPE["lr"],
            warmup_steps=RECIPE["warmup"],
            lr_scheduler_type="linear",
            max_grad_norm=RECIPE["max_grad_norm"],
            seed=0, dataloader_num_workers=0,
            group_by_length=False,
            remove_unused_columns=False,
            report_to=[],
            use_cpu=True,
        )
        trainer = SequentialTrainer(model=ref_model, args=args,
                                    train_dataset=ListDataset(),
                                    data_collator=collate,
                                    callbacks=callbacks)
        ref_model.train()
        trainer.train()
    return losses[:steps], ter_curve


def run_ours(params, cfg, wavs, labels, steps, dropout=False, heldout=None,
             eval_every=0, eval_max_len=12):
    import jax
    import jax.numpy as jnp

    from speechmix_tpu import generation
    from speechmix_tpu.training import trainer as trainer_lib
    from speechmix_tpu.training.trainer import TrainConfig, TrainState

    tc = TrainConfig(learning_rate=RECIPE["lr"],
                     warmup_steps=RECIPE["warmup"],
                     lr_schedule="linear", max_steps=steps,
                     max_grad_norm=RECIPE["max_grad_norm"],
                     grad_accum=1, output_dir="", dropout=dropout,
                     use_flash=False, optimizer="adafactor",
                     fixed_nlp=False)
    optimizer = trainer_lib.make_optimizer(tc)
    state = TrainState(params=params, opt_state=optimizer.init(params),
                       step=jnp.zeros((), jnp.int32))
    step_fn = trainer_lib.make_train_step(cfg, tc, params)

    b, t = RECIPE["batch"], wavs.shape[1]
    n_batches = len(wavs) // b
    losses = []
    ter_curve = []
    for s in range(steps):
        i = (s % n_batches) * b
        batch = {
            "input_values": jnp.asarray(wavs[i:i + b]),
            "lengths": jnp.asarray(np.full((b,), t, np.int32)),
            "labels": jnp.asarray(labels[i:i + b]),
        }
        state, m = step_fn(state, batch, jnp.float32(1.0))
        losses.append(float(m["loss"]))
        if eval_every and heldout is not None and (s + 1) % eval_every == 0:
            hw, hrefs = heldout
            tokens, _ = generation.generate(
                state.params, cfg, jnp.asarray(hw),
                max_length=eval_max_len + 1)
            hyps = [strip_eos(row) for row in np.asarray(tokens)]
            ter_curve.append((s + 1, float(token_error_rate(hyps, hrefs))))
    return losses, state.params, ter_curve


def ref_greedy_decode(ref_model, wavs, max_len):
    """Manual greedy loop from the reference eval.ipynb (the forward's argmax
    quirk makes outputs['logits'][:, -1] the greedy next token)."""
    import torch
    ref_model.eval()
    outs = []
    start = ref_model.decoder_model.config.decoder_start_token_id
    for i in range(len(wavs)):
        ids = [start]
        with torch.no_grad():
            for _ in range(max_len):
                out = ref_model(
                    input_values=torch.tensor(wavs[i:i + 1]),
                    decoder_input_ids=torch.tensor([ids]))
                nxt = int(out["logits"][0, -1])
                ids.append(nxt)
                if nxt == EOS:
                    break
        outs.append(ids[1:])
    return outs


def token_error_rate(hyps, refs):
    """Corpus-level token error rate (levenshtein over token id sequences —
    the same WER definition as speechmix_tpu.metrics on word tokens)."""
    from speechmix_tpu.metrics import _edit_distance
    errs = sum(_edit_distance([str(t) for t in h], [str(t) for t in r])
               for h, r in zip(hyps, refs))
    total = sum(len(r) for r in refs)
    return errs / max(total, 1)


def strip_eos(seq):
    out = []
    for t in seq:
        if t == EOS:
            break
        out.append(int(t))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--platform", default="cpu")
    ap.add_argument("--eval_every", type=int, default=0,
                    help="free-running held-out TER every N steps (0 = off)")
    ap.add_argument("--heldout_n", type=int, default=8)
    ap.add_argument("--dropout", type=float, default=0.0,
                    help="dropout rate for BOTH stacks (dropout-ON arm)")
    args = ap.parse_args()

    os.environ.setdefault("HF_HUB_OFFLINE", "1")
    os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")
    if args.platform == "cpu":
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")
    import jax.numpy as jnp

    from speechmix_tpu import convert, generation

    REF = load_reference_hf_model()
    with tempfile.TemporaryDirectory() as root:
        ckpts = build_checkpoints(root, dropout=args.dropout)
        ref_model = REF.HFSpeechMixEED(ckpts["speech"], ckpts["bart"],
                                       down_scale=4)
    cfg = our_cfg(down_scale=4, dropout=args.dropout)
    params = convert.load_speechmix(ref_model.state_dict(), cfg)

    wavs, labels = make_examples()
    steps = args.steps
    hw, hlabels = make_examples(n=args.heldout_n, seed=1)
    hrefs = [strip_eos(row) for row in hlabels]
    heldout = (hw, hrefs)
    eval_max_len = labels.shape[1] + 4

    ref_losses, ref_ter_curve = run_reference(
        ref_model, wavs, labels, steps, heldout=heldout,
        eval_every=args.eval_every, eval_max_len=eval_max_len)
    our_losses, final_params, our_ter_curve = run_ours(
        params, cfg, wavs, labels, steps, dropout=args.dropout > 0,
        heldout=heldout, eval_every=args.eval_every,
        eval_max_len=eval_max_len)

    n = min(len(ref_losses), len(our_losses))
    ref_a, our_a = np.array(ref_losses[:n]), np.array(our_losses[:n])
    print(f"\nstep     reference      ours        |diff|")
    marks = sorted(set([0, 1, 2, 5, 10, 20, 50, 100, 200, n - 1]))
    for s in marks:
        if s < n:
            print(f"{s:5d}   {ref_a[s]:9.5f}   {our_a[s]:9.5f}   "
                  f"{abs(ref_a[s] - our_a[s]):.5f}")
    # smoothed tail agreement (10-step windows)
    w = max(n // 10, 1)
    ref_s = ref_a[-w:].mean()
    our_s = our_a[-w:].mean()
    print(f"\nmean abs diff        : {np.abs(ref_a - our_a).mean():.5f}")
    print(f"max abs diff         : {np.abs(ref_a - our_a).max():.5f}")
    print(f"final-{w}-step mean   : ref {ref_s:.5f}  ours {our_s:.5f}  "
          f"rel {abs(ref_s - our_s) / ref_s:.4f}")

    # end-of-run greedy decode TER on the training set, both sides
    max_len = labels.shape[1] + 4
    ref_hyps = ref_greedy_decode(ref_model, wavs, max_len)
    tokens, _ = generation.generate(final_params, cfg, jnp.asarray(wavs),
                                    max_length=max_len + 1)
    our_hyps = [strip_eos(row) for row in np.asarray(tokens)]
    refs = [strip_eos(row) for row in labels]
    ter_ref = token_error_rate([strip_eos(h) for h in ref_hyps], refs)
    ter_ours = token_error_rate(our_hyps, refs)
    print(f"greedy train-set TER : ref {ter_ref:.4f}  ours {ter_ours:.4f}")
    if args.eval_every:
        print("\nheld-out free-running TER (step, ref, ours):")
        ours_at = dict(our_ter_curve)
        for s, t_ref in ref_ter_curve:
            t_ours = ours_at.get(s, float("nan"))
            print(f"{s:6d}   {t_ref:.4f}   {t_ours:.4f}")
    print(json.dumps({"steps": n, "dropout": args.dropout,
                      "ref_final": float(ref_s),
                      "ours_final": float(our_s),
                      "mean_abs_diff": float(np.abs(ref_a - our_a).mean()),
                      "ter_ref": float(ter_ref),
                      "ter_ours": float(ter_ours),
                      "heldout_ter_ref": ref_ter_curve,
                      "heldout_ter_ours": our_ter_curve}))


if __name__ == "__main__":
    main()
