"""CPU smoke for the experiments/ measurement harnesses (VERDICT r4 #7).

The harnesses are the repo's TPU measurement record; they have no other CI
coverage, and a harness bug can ship a wrong perf conclusion (round 4's
ffn_fused_ab device_get-swamps-compute bug).  Each harness supports
SMX_SMOKE=1 (experiments/_smoke.py): tiny presets, 1-rep bench loops, CPU
platform forced.  This test executes every harness end-to-end as a
subprocess and asserts exit 0 plus its table marker in stdout — logic
coverage, not numbers.

Tiered slow (subprocess + fresh XLA compiles per harness).
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# (script, extra argv, required stdout markers)
HARNESSES = [
    ("attn_epilogue_ab.py", [], ["encoder attn_epi=", "generate attn_epi="]),
    ("beam_serving.py", [], ["tiled vs shared rows_token_exact = 1.000",
                             "group-beam"]),
    ("bwd_roofline.py", [], ["bwd recompute", "jax.vjp dense+res+LN",
                             "B XLA everything"]),
    ("extractor_ab.py", [], ["XLA conv chain:", "speech_encoder["]),
    ("extractor_taps_ab.py", [], ["chain[", "generate["]),
    ("ffn_ab.py", [], ["barrier win:", "generate barrier="]),
    ("ffn_dropout_ab.py", [], ["[tier1]", "in-kernel dropout win:"]),
    ("ffn_dropout_ab.py", ["--converge"], ["A curve:", "B curve:"]),
    ("ffn_bwd_ab.py", [], ["Pallas bwd", "step dropout-ON, hand bwd"]),
    ("ffn_fused_ab.py", [], ["XLA chain :", "generate fused="]),
    ("headline.py", [], ["kv_int8=0:", "kv_int8=1:"]),
    ("large_pair_train.py", [], ["large B=2  no-remat", "large B=2  remat"]),
    ("recipe_step.py", [], ["ms/opt-step"]),
    ("reorder_probe.py", [], ["all formulations identical"]),
    ("int8_gemm_probe.py", [], ["w8a8 chain"]),
    ("topk_probe.py", [], ["two-stage == flat top_k: exact"]),
    ("train_breakdown.py", [], ["value_and_grad", "full train step"]),
    ("train_breakdown.py", ["--step-only"], ["full train step"]),
    ("train_step_ab.py", [], ["loss agreement A vs B:", "bwd-kernel win:"]),
    ("recipe_parity.py", ["--steps", "4", "--eval_every", "2",
                          "--heldout_n", "2"],
     ["greedy train-set TER", "held-out free-running TER"]),
    ("recipe_parity.py", ["--steps", "3", "--dropout", "0.1"],
     ["greedy train-set TER"]),
]


@pytest.mark.slow
@pytest.mark.parametrize("script,argv,markers",
                         HARNESSES,
                         ids=[f"{h[0]}{'-' + h[1][0].lstrip('-') if h[1] else ''}"
                              for h in HARNESSES])
def test_harness_smoke(script, argv, markers):
    env = dict(os.environ, SMX_SMOKE="1", PYTHONPATH=REPO,
               HF_HUB_OFFLINE="1", TRANSFORMERS_OFFLINE="1")
    # recipe_parity drives its own platform/shape knobs via CLI (it has no
    # TPU-sized defaults); everything else reads SMX_SMOKE
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "experiments", script)] + argv,
        capture_output=True, text=True, timeout=1500, env=env, cwd=REPO)
    out = proc.stdout + proc.stderr
    assert proc.returncode == 0, f"{script} failed:\n{out[-4000:]}"
    for m in markers:
        assert m in proc.stdout, (
            f"{script}: marker {m!r} missing from stdout:\n"
            f"{proc.stdout[-4000:]}")
