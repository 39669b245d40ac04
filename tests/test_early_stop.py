"""early_stop while_loop decode must match the fixed-length scan decode."""

import jax
import jax.numpy as jnp
import numpy as np

from speechmix_tpu.config import (SEQ2SEQ_PRESETS, SPEECH_ENCODER_PRESETS,
                                  SpeechMixConfig)
from speechmix_tpu.models import speechmix as smx
from speechmix_tpu import generation as gen_lib

CFG = SpeechMixConfig(encoder=SPEECH_ENCODER_PRESETS["tiny-speech"],
                      decoder=SEQ2SEQ_PRESETS["tiny-bart-bytes"],
                      down_scale=4)


def test_early_stop_matches_scan():
    params = smx.init_speechmix(jax.random.PRNGKey(3), CFG)
    wav = jnp.asarray(
        np.random.RandomState(0).randn(3, 16000).astype(np.float32) * 0.1)
    t_scan, l_scan = gen_lib.generate(params, CFG, wav, max_length=10)
    t_ws, l_ws = gen_lib.generate(params, CFG, wav, max_length=10,
                                  early_stop=True)
    np.testing.assert_array_equal(np.asarray(t_scan), np.asarray(t_ws))
    np.testing.assert_array_equal(np.asarray(l_scan), np.asarray(l_ws))
