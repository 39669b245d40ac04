"""Device mesh + sharding rules.

The reference has no in-repo parallelism (SURVEY.md §2.4) — scaling came
implicitly from HF Trainer's DDP.  Here the mesh is first-class from day one:

  axes: ("data", "model", "seq")
    data  — batch sharding (DP); gradient all-reduce rides ICI via jit's
            automatic psum insertion
    model — reserved tensor-parallel axis: attention heads / FFN hidden are
            sharded over it when model_parallel > 1
    seq   — sequence-parallel axis (long audio): encoder activations shard
            their time dimension over it; XLA inserts the K/V all-gathers
            the attention contraction needs.  The reference's only answer
            to long input was filtering it out (SURVEY.md §5 long-context).

Entry points:
  make_mesh(n_data, n_model, n_seq)  -> jax.sharding.Mesh
  param_sharding(mesh, params)       -> pytree of NamedSharding for params
  batch_sharding(mesh)               -> NamedSharding for (B, ...) arrays
  shard_params / shard_batch         -> device_put helpers
  seq_sharding(spec) / constrain_time_sharded(x) -> sequence-parallel
      activation annotations (applied while tracing the train step)
"""

from __future__ import annotations

import contextlib
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..utils.pytree import keypath_str


DATA_AXIS = "data"
MODEL_AXIS = "model"
SEQ_AXIS = "seq"


def make_mesh(n_data: Optional[int] = None, n_model: int = 1,
              n_seq: int = 1, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n_total = len(devices)
    if n_data is None:
        n_data = n_total // (n_model * n_seq)
    assert n_data >= 1, (
        f"mesh needs n_model*n_seq={n_model * n_seq} <= {n_total} devices "
        f"(model_parallel x sequence_parallel exceeds the device count)")
    used = n_data * n_model * n_seq
    assert used <= n_total, \
        f"mesh {n_data}x{n_model}x{n_seq} needs {used} devices, have {n_total}"
    dev_array = np.asarray(devices[:used]).reshape(n_data, n_model, n_seq)
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS, SEQ_AXIS))


def batch_spec() -> P:
    return P(DATA_AXIS)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(DATA_AXIS))


def _param_spec_for(path: str, leaf) -> P:
    """Tensor-parallel layout rules over the `model` axis.

    Heuristics keyed on parameter role (path names are stable across the
    framework):
      * attention q/k/v projection kernels (in, H*D): shard output dim ->
        heads split over `model`
      * attention out_proj (H*D, out): shard input dim (row-parallel,
        psum'd by XLA at the consumer)
      * FFN in kernels (d, ffn): shard ffn dim; FFN out (ffn, d): shard input
      * embeddings / norms / biases / convs: replicated
    Stacked layer params carry a leading layer axis -> shift specs right.
    """
    ndim = getattr(leaf, "ndim", 0)
    stacked = (("/layers/" in path or path.endswith("layers")) and ndim >= 2)
    lead = (None,) if stacked else ()

    def spec(*rest):
        return P(*(lead + rest))

    if ndim == 0 or ndim == 1:
        return P()
    if "q_proj/kernel" in path or "k_proj/kernel" in path or \
            "v_proj/kernel" in path:
        return spec(None, MODEL_AXIS)
    if "out_proj/kernel" in path:
        return spec(MODEL_AXIS, None)
    if ("ffn_in/kernel" in path or "fc1/kernel" in path or
            "fc_gate/kernel" in path):
        return spec(None, MODEL_AXIS)
    if "ffn_out/kernel" in path or "fc2/kernel" in path:
        return spec(MODEL_AXIS, None)
    return P()


def param_sharding(mesh: Mesh, params):
    """NamedSharding pytree for params: replicated over `data`, tensor-
    sharded over `model` per _param_spec_for."""
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    out = []
    model_size = mesh.shape[MODEL_AXIS]
    for keypath, leaf in flat:
        path = keypath_str(keypath)
        spec = _param_spec_for(path, leaf) if model_size > 1 else P()
        # verify divisibility; fall back to replication
        ok = True
        for axis_i, axis_name in enumerate(spec):
            if axis_name == MODEL_AXIS and \
                    leaf.shape[axis_i] % model_size != 0:
                ok = False
        out.append(NamedSharding(mesh, spec if ok else P()))
    return jax.tree_util.tree_unflatten(treedef, out)


def shard_params(mesh: Mesh, params):
    return jax.device_put(params, param_sharding(mesh, params))


def opt_state_sharding(mesh: Mesh, opt_state):
    """ZeRO-1: optimizer-state sharding over the `data` axis.

    The reference scaled via HF Trainer's DDP, which replicates optimizer
    state per device (SURVEY.md §2.4); here each array leaf of the optax
    state shards a data-divisible dimension over `data` so per-chip state
    memory drops ~linearly with the DP degree.  XLA's SPMD partitioner
    then reduce-scatters the gradient consumption inside optimizer.update
    and all-gathers the (small) updates at apply_updates — the classic
    ZeRO-1 comm pattern, derived automatically from the output sharding.

    Composition with tensor parallelism (model axis > 1): param-shaped
    state leaves (AdamW mu/nu — optax preserves the param keypaths under
    the state NamedTuples) first inherit the matching param's `model` spec
    via the same path-keyed rules (_param_spec_for), then the `data` shard
    lands on the first divisible dimension the param layout leaves free.
    Keeping the state's model layout congruent with the param's avoids
    XLA inserting a per-step resharding of every moment tensor between
    the param layout and a conflicting ZeRO layout.  Leaves without a
    param-rule match (counts, Adafactor factored rows/cols) shard their
    first data-divisible dimension as before."""
    n_data = mesh.shape[DATA_AXIS]
    model_size = mesh.shape[MODEL_AXIS]
    flat, treedef = jax.tree_util.tree_flatten_with_path(opt_state)
    out = []
    for keypath, leaf in flat:
        ndim = getattr(leaf, "ndim", 0)
        shape = getattr(leaf, "shape", ())
        spec = [None] * ndim
        if model_size > 1 and ndim >= 2:
            mspec = _param_spec_for(keypath_str(keypath), leaf)
            if len(mspec) <= ndim and all(
                    shape[i] % model_size == 0
                    for i, ax in enumerate(mspec) if ax == MODEL_AXIS):
                for i, ax in enumerate(mspec):
                    spec[i] = ax
        for i in range(ndim):
            if spec[i] is None and shape[i] >= n_data \
                    and shape[i] % n_data == 0:
                spec[i] = DATA_AXIS
                break
        out.append(NamedSharding(mesh, P(*spec)))
    return jax.tree_util.tree_unflatten(treedef, out)


def shard_opt_state(mesh: Mesh, opt_state):
    return jax.device_put(opt_state, opt_state_sharding(mesh, opt_state))


def constrain_opt_state(opt_state, shardings):
    """Trace-time sharding constraint tying a freshly-updated optimizer
    state to its ZeRO-1 layout (shardings from opt_state_sharding on an
    eval_shape of the state)."""
    return jax.tree_util.tree_map(
        lambda x, s: jax.lax.with_sharding_constraint(x, s),
        opt_state, shardings)


def shard_batch(mesh: Mesh, batch):
    """Place a host batch onto the mesh, sharded over `data`.

    Single-host: plain device_put.  Multi-host (jax.process_count() > 1):
    each host holds only its per-host slice of the global batch (see
    shard_examples_per_host), assembled into one global array via
    make_array_from_process_local_data."""
    sh = batch_sharding(mesh)
    if jax.process_count() > 1:
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(
                sh, np.asarray(x)), batch)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())


# ----------------------------------------------------------------------------
# sequence parallelism (activation time-axis sharding)
# ----------------------------------------------------------------------------

# (mesh, PartitionSpec) applied to (B, T, C) activations while tracing under
# seq_sharding(); None outside.  Set during trace-time only: the constraint
# ops are baked into the jaxpr, so executions need no global state.
_SEQ_SHARDING = None


@contextlib.contextmanager
def seq_sharding(mesh: Optional[Mesh],
                 spec: P = P(DATA_AXIS, SEQ_AXIS, None)):
    """Enable constrain_time_sharded() for the enclosed trace.  Wrap the BODY
    of the jitted step (runs at trace time), not the jit call site.  Pass
    mesh=None to disable (identity)."""
    global _SEQ_SHARDING
    prev = _SEQ_SHARDING
    _SEQ_SHARDING = (mesh, spec) if mesh is not None else None
    try:
        yield
    finally:
        _SEQ_SHARDING = prev


def active_seq_mesh() -> Optional[Mesh]:
    """The mesh of the active seq_sharding() trace, when its `seq` axis is
    actually parallel (size > 1); None otherwise.  Lets ops (attention)
    dispatch sequence-parallel implementations (ring attention) without
    threading the mesh through every model signature."""
    if _SEQ_SHARDING is None:
        return None
    mesh, _ = _SEQ_SHARDING
    return mesh if mesh.shape.get(SEQ_AXIS, 1) > 1 else None


def active_tp_mesh() -> Optional[Mesh]:
    """The mesh of the active tp_sharding() trace, when its `model` axis is
    actually parallel (size > 1); None otherwise.  Lets ops whose Pallas
    custom calls cannot be GSPMD-partitioned over a contracted weight dim
    (the fused FFN kernel: fc1 P(None,'model') / fc2 P('model',None)) fall
    back to the XLA chain instead of forcing a per-layer weight
    all-gather."""
    if _TP_SHARDING is None:
        return None
    return _TP_SHARDING if _TP_SHARDING.shape.get(MODEL_AXIS, 1) > 1 \
        else None


_TP_SHARDING = None


@contextlib.contextmanager
def tp_sharding(mesh: Optional[Mesh]):
    """Mark the enclosed TRACE as tensor-parallel (see active_tp_mesh).
    Wrap the body of the jitted fn, like seq_sharding.  Identity (but still
    cheap to enter) when mesh is None or its model axis is 1."""
    global _TP_SHARDING
    prev = _TP_SHARDING
    _TP_SHARDING = mesh
    try:
        yield
    finally:
        _TP_SHARDING = prev


def constrain_time_sharded(x):
    """Annotate a (B, T, C) activation (or a (B, T) mask) as sequence-
    sharded.  Identity when no seq_sharding() trace is active."""
    if _SEQ_SHARDING is None:
        return x
    mesh, spec = _SEQ_SHARDING
    ndim = getattr(x, "ndim", 0)
    if ndim == 3:
        return jax.lax.with_sharding_constraint(
            x, NamedSharding(mesh, spec))
    if ndim == 2:
        return jax.lax.with_sharding_constraint(
            x, NamedSharding(mesh, P(*tuple(spec)[:2])))
    return x


def initialize_distributed(coordinator_address=None, num_processes=None,
                           process_id=None):
    """Multi-host initialization over DCN (jax.distributed).  The reference
    has no multi-host story (SURVEY.md §2.4); on TPU pods call this once per
    host before building the mesh — with no arguments, JAX autodetects the
    TPU pod topology."""
    import jax
    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(coordinator_address=coordinator_address,
                      num_processes=num_processes, process_id=process_id)
    jax.distributed.initialize(**kwargs)


def per_host_batch_slice(global_batch: int) -> slice:
    """Each host feeds only its shard of the global batch (dataset sharding
    per host)."""
    import jax
    n = jax.process_count()
    i = jax.process_index()
    per = global_batch // n
    return slice(i * per, (i + 1) * per)


def shard_examples_per_host(examples, process_index=None, process_count=None):
    """Per-host DATASET sharding: host i keeps examples[i::n] (round-robin,
    so length buckets stay balanced across hosts).  Identity on a single
    host.  NOTE: the training pipeline does NOT shard examples — every host
    batches the full list identically and slices each global batch
    (datasets._per_host_slice_factory), which keeps the bucket schedule in
    lockstep across processes; this helper serves offline/preprocessing
    work-splitting."""
    import jax
    n = process_count if process_count is not None else jax.process_count()
    i = process_index if process_index is not None else jax.process_index()
    if n <= 1:
        return list(examples)
    return list(examples)[i::n]

def local_rows(arr):
    """Host-local rows (leading batch axis) of a global data-sharded array
    — the inverse of shard_batch's per-process assembly.  np.asarray on a
    multi-process global array raises (not fully addressable); this
    concatenates the addressable shards in row order instead, deduping
    replicas from model/seq axes.  Single process: the whole array."""
    import jax
    import numpy as np
    if jax.process_count() <= 1:
        return np.asarray(arr)
    seen = {}
    for s in arr.addressable_shards:
        start = s.index[0].start or 0
        if start not in seen:
            seen[start] = np.asarray(s.data)
    return np.concatenate([seen[k] for k in sorted(seen)], axis=0)


def allgather_rows(x):
    """Gather per-host (rows, ...) numpy arrays into the global row set,
    identical on every host — metrics (WER/CER, early stopping) must agree
    across processes.  Requires equal shapes across hosts, which the
    lockstep batch schedule guarantees.  Identity on one process."""
    import jax
    import numpy as np
    x = np.asarray(x)
    if jax.process_count() <= 1:
        return x
    from jax.experimental import multihost_utils
    g = np.asarray(multihost_utils.process_allgather(x))
    return g.reshape((-1,) + g.shape[2:])
