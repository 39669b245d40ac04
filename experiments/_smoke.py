"""Smoke mode for the measurement harnesses (VERDICT r4 #7).

`SMX_SMOKE=1` shrinks every harness to tiny shapes and forces the CPU
platform so `tests/test_experiments_smoke.py` can execute each harness
end-to-end per commit.  The harness *logic* — pairing, dispatch toggles,
bench loops, table emission — is what rots between TPU sessions, and a tiny
CPU run catches that (round 4's `ffn_fused_ab` device_get-swamps-compute bug
is exactly the class this would have caught).  Numbers printed in smoke mode
are meaningless by construction: the Pallas kernels dispatch to their XLA
fallbacks (or interpret mode) on CPU, and the shapes are tiny.

Usage in a harness:

    import _smoke                      # sibling import; harnesses run as
                                       # scripts, so experiments/ is sys.path[0]
    def main():
        _smoke.init()                  # BEFORE anything touches a backend
        B = _smoke.pick(128, 2)
        enc = SPEECH_ENCODER_PRESETS[_smoke.enc_preset("wav2vec2-base")]
"""

import os

ON = os.environ.get("SMX_SMOKE") == "1"


def init():
    """Force the CPU platform in smoke mode.  Must run before the first
    backend-touching call (setup_compile_cache inspects the backend): the
    environment force-registers the axon TPU plugin and overrides the
    JAX_PLATFORMS env var, so the post-import config update is the only
    authoritative override."""
    if ON:
        import jax
        try:
            jax.config.update("jax_platforms", "cpu")
        except RuntimeError:
            pass  # backend already initialized; trust the caller's setup


def pick(normal, tiny):
    return tiny if ON else normal


def enc_preset(normal="wav2vec2-base"):
    return "tiny-speech" if ON else normal


def dec_preset(normal="bart-base"):
    return "tiny-bart-bytes" if ON else normal
