"""Recipe-level training parity vs the reference trainer (VERDICT r3 #3).

The reference outsources its training loop to HF Trainer with
optim="adafactor" + linear warmup/decay (/root/reference/train.py:291-311).
experiments/recipe_parity.py runs that literal loop (transformers.Trainer on
the reference's own HFSpeechMixEED) and this repo's trainer from the
IDENTICAL converted init on identical batches; here we pin that the loss
curves track.  Covers the optimizer stack end-to-end: optax Adafactor
(multiply_by_parameter_scale=False == HF scale_parameter=False), linear
warmup+decay schedule, and global-norm clipping at HF's effective default
1.0 (the reference parses --max_grad_norm but never forwards it).

300-step curve + end-of-run TER table lives in BASELINE.md ("Recipe-level
training parity"); this test runs 60 steps to keep suite time sane.
"""

import os
import sys
import tempfile

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                "experiments"))
import recipe_parity as rp  # noqa: E402


@pytest.mark.slow
def test_recipe_loss_curves_track_reference():
    import jax.numpy as jnp

    from speechmix_tpu import convert

    REF = rp.load_reference_hf_model()
    with tempfile.TemporaryDirectory() as root:
        ckpts = rp.build_checkpoints(root)
        ref_model = REF.HFSpeechMixEED(ckpts["speech"], ckpts["bart"],
                                       down_scale=4)
    cfg = rp.our_cfg(down_scale=4)
    params = convert.load_speechmix(ref_model.state_dict(), cfg)

    wavs, labels = rp.make_examples()
    steps = 60
    ref_losses, _ = rp.run_reference(ref_model, wavs, labels, steps)
    ref_losses = np.array(ref_losses)
    our_losses, _, _ = rp.run_ours(params, cfg, wavs, labels, steps)
    our_losses = np.array(our_losses)

    assert len(ref_losses) == steps
    # step 0: identical input + identical init -> identical loss (the
    # forward itself is parity-pinned elsewhere at 2e-3; this is one batch)
    np.testing.assert_allclose(our_losses[0], ref_losses[0], rtol=1e-4)
    # whole-curve agreement: Adafactor math matches; drift is f32 summation
    # order (measured 60-step max |diff| 0.021 on loss ~3.6-4.9)
    np.testing.assert_allclose(our_losses, ref_losses, atol=0.08)
    # both actually train
    assert our_losses[-6:].mean() < our_losses[0] - 1.0
    # final-window agreement within 2%
    ref_tail, our_tail = ref_losses[-6:].mean(), our_losses[-6:].mean()
    assert abs(ref_tail - our_tail) / ref_tail < 0.02, (ref_tail, our_tail)
