"""Test configuration: force an 8-virtual-device CPU platform BEFORE jax
initializes, so multi-chip sharding paths are exercised without TPU hardware
(the "fake backend" the reference never had — SURVEY.md §4)."""

import os

# hard override: the surrounding environment may pin JAX_PLATFORMS to a TPU
# transport (e.g. axon); tests must run on the virtual-device CPU platform
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
if "xla_backend_optimization_level" not in flags:
    # the suite compiles everything fresh (CPU persistent cache disabled —
    # utils/compile_cache.py); level 0 cuts compile-dominated wall time
    # ~30% with identical test outcomes (tolerance-pinned numerics)
    flags = (flags + " --xla_backend_optimization_level=0").strip()
os.environ["XLA_FLAGS"] = flags
os.environ.setdefault("HF_HUB_OFFLINE", "1")
os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")

import numpy as np
import pytest

# Full-precision matmuls for exactness assertions (the backend default is a
# fast low-precision mode with ~1e-3 error, which breaks cached-vs-full
# decode equivalence checks).
import jax
jax.config.update("jax_default_matmul_precision", "highest")

# The surrounding environment may force-register a TPU transport plugin and
# override JAX_PLATFORMS (observed: jax.config.jax_platforms == "axon,cpu"
# regardless of the env var).  Post-import config update is authoritative.
jax.config.update("jax_platforms", "cpu")

# Persistent compile cache: a no-op here — jax 0.9.0's XLA:CPU AOT cache
# reload path is broken (cross-host entries SIGABRT in ThunkExecutor;
# same-host reloads of the sharded train step abort too — measured, see
# utils/compile_cache.py).  The helper enables caching only on TPU.
from speechmix_tpu.utils.compile_cache import setup_compile_cache

setup_compile_cache(os.path.join(os.path.dirname(__file__), "..",
                                 ".jax_cache"))


@pytest.fixture(scope="session")
def rng():
    return np.random.RandomState(0)


def synth_speech(rng, seconds, sr=16000):
    """Deterministic pseudo-speech: sum of chirps + noise bursts.  Stands in
    for librispeech_asr_dummy (the reference's test fixture) since this
    environment has no network egress."""
    t = np.arange(int(seconds * sr)) / sr
    f0 = 110 + 30 * np.sin(2 * np.pi * 0.7 * t)
    sig = 0.3 * np.sin(2 * np.pi * f0 * t)
    sig += 0.1 * np.sin(2 * np.pi * 3 * f0 * t)
    env = 0.5 * (1 + np.sin(2 * np.pi * 2.1 * t))
    sig = sig * env + 0.01 * rng.randn(len(t))
    return sig.astype(np.float32)


@pytest.fixture(scope="session")
def tiny_cfg():
    from speechmix_tpu.config import (SpeechMixConfig, SPEECH_ENCODER_PRESETS,
                                      SEQ2SEQ_PRESETS)
    return SpeechMixConfig(
        encoder=SPEECH_ENCODER_PRESETS["tiny-speech"],
        decoder=SEQ2SEQ_PRESETS["tiny-bart-bytes"],
        down_scale=2,
    )


# ---------------------------------------------------------------------------
# Test tiering (VERDICT r3 #8): `-m quick` runs the fast tier for the
# per-commit loop; the full suite stays the pre-push/pre-round gate.
# Files are tiered centrally here (module durations from a --durations=0
# full-suite run, 2026-08-19) instead of per-file pytestmark lines.
# ---------------------------------------------------------------------------

_SLOW_FILES = {
    # multi-minute files: subprocess spawns, torch reference execution,
    # HF Trainer loops, many-compile training paths
    "test_training.py",
    "test_multihost.py",
    "test_reference_parity.py",
    "test_hf_parity.py",
    "test_beam_hf.py",
    "test_constrained_beam.py",
    "test_recipe_parity.py",
    "test_generation.py",
    "test_pipeline.py",
    "test_ring_attention.py",
    "test_flash_dropout.py",
    "test_trainer_predict.py",
    "test_early_stop.py",
}


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: multi-minute test (subprocesses, reference torch "
                   "execution, many-compile training paths)")
    config.addinivalue_line(
        "markers", "quick: fast tier alias — select with -m quick")


def pytest_collection_modifyitems(config, items):
    for item in items:
        fname = os.path.basename(str(item.fspath))
        if fname in _SLOW_FILES or item.get_closest_marker("slow"):
            item.add_marker(pytest.mark.slow)
        else:
            item.add_marker(pytest.mark.quick)
