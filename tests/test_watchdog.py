"""Stall watchdog (failure detection — SURVEY.md §5 lists the subsystem as
absent in the reference; here: detect + exit + resume-from-checkpoint)."""

import time

from speechmix_tpu.utils.watchdog import StallWatchdog


def test_fires_on_stall():
    hits = []
    wd = StallWatchdog(timeout_s=0.2, on_stall=hits.append, poll_s=0.05)
    wd.start()
    time.sleep(0.6)
    wd.stop()
    assert wd.fired
    assert hits and hits[0] >= 0.2


def test_quiet_under_heartbeat():
    hits = []
    wd = StallWatchdog(timeout_s=0.3, on_stall=hits.append, poll_s=0.05)
    wd.start()
    for _ in range(10):
        wd.beat()
        time.sleep(0.05)
    wd.stop()
    assert not wd.fired and not hits


def test_trainer_wires_watchdog(tmp_path, monkeypatch):
    """fit() with stall_timeout_s>0 starts a watchdog, beats it per batch,
    and stops it on return."""
    import jax
    import jax.numpy as jnp
    from speechmix_tpu.config import (SEQ2SEQ_PRESETS,
                                      SPEECH_ENCODER_PRESETS, SpeechMixConfig)
    from speechmix_tpu.training import trainer as trainer_lib
    import numpy as np

    cfg = SpeechMixConfig(encoder=SPEECH_ENCODER_PRESETS["tiny-speech"],
                          decoder=SEQ2SEQ_PRESETS["tiny-bart-bytes"],
                          down_scale=4)
    tc = trainer_lib.TrainConfig(learning_rate=1e-3, warmup_steps=1,
                                 grad_accum=1, num_epochs=1, max_steps=2,
                                 logging_steps=1, eval_steps=1000,
                                 output_dir=str(tmp_path),
                                 stall_timeout_s=120.0)
    tr = trainer_lib.Trainer(cfg, tc)
    state = tr.init_state()

    b = jax.device_count()  # default mesh shards the batch over all devices
    rng = np.random.RandomState(0)
    labels = rng.randint(130, 200, size=(b, 6)).astype(np.int64)
    batch = {"input_values": jnp.asarray(
        rng.randn(b, 8000).astype(np.float32) * 0.1),
        "lengths": jnp.full((b,), 8000, jnp.int32),
        "labels": jnp.asarray(labels)}

    created = []
    from speechmix_tpu.utils import watchdog as wd_mod
    orig_init = wd_mod.StallWatchdog.__init__

    def spy_init(self, *a, **k):
        orig_init(self, *a, **k)
        created.append(self)
    monkeypatch.setattr(wd_mod.StallWatchdog, "__init__", spy_init)

    tr.fit(state, lambda: iter([batch, batch, batch]), resume=False)
    assert len(created) == 1
    wd = created[0]
    assert wd.timeout_s == 120.0
    assert not wd.fired
    assert wd._stop.is_set()  # stopped on the way out
