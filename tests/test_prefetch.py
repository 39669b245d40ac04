"""Async device prefetch (data/prefetch.py): ordering, error propagation,
early-exit shutdown."""

import threading
import time

import jax
import numpy as np
import pytest

from speechmix_tpu.data.prefetch import prefetch_to_device
from speechmix_tpu.parallel import mesh as mesh_lib


@pytest.fixture(scope="module")
def mesh():
    return mesh_lib.make_mesh()


def make_batches(n, b=8):
    for i in range(n):
        yield {"input_values": np.full((b, 16), float(i), np.float32),
               "lengths": np.full((b,), 16, np.int32)}


def test_order_and_values(mesh):
    out = list(prefetch_to_device(make_batches(5), mesh, depth=2))
    assert len(out) == 5
    for i, batch in enumerate(out):
        assert float(np.asarray(batch["input_values"])[0, 0]) == float(i)


def test_error_propagates(mesh):
    def bad():
        yield {"input_values": np.zeros((8, 16), np.float32)}
        raise RuntimeError("boom")

    it = prefetch_to_device(bad(), mesh, depth=2)
    next(it)
    with pytest.raises(RuntimeError, match="boom"):
        list(it)


def test_early_exit_stops_worker(mesh):
    started = threading.active_count()
    it = prefetch_to_device(make_batches(100), mesh, depth=1)
    next(it)
    it.close()
    deadline = time.time() + 5
    while threading.active_count() > started and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= started
