"""Parameter freezing as pytree masks — the functional re-design of the
reference's three freezing mechanisms:

  1. `fixed_parameters` + `fixed_except` name-substring policy
     (model.py:104-113): a parameter stays trainable iff its path contains
     any of the fixed_except substrings.
  2. Variant freezing policies (Fixed/Adapter/Self/GAN custom_modules,
     model.py:180-233, 269-282).
  3. `FreezingCallback` gradual unfreezing (module/utility.py:6-34): before
     epoch e < freeze_epoch, only the LAST e/freeze_epoch fraction of the
     speech encoder's parameter list is trainable.

All three produce float multiplier pytrees applied to gradients inside the
jitted train step (`apply_grad_mask`) — no module mutation, no optimizer
surgery.  Gradual unfreezing DEFAULTS to `reference_unfreeze_scale`:
tensor granularity in the reference's parameter registration order, pinned
against the executed reference callback (tests/test_freezing.py;
trainer.py selects it via TrainConfig.unfreeze_granularity="tensor").
`gradual_unfreeze_scale` remains as the opt-in "layer" granularity: because
transformer layers are stored stacked (leading layer axis), its mask is a
per-layer broadcast along that axis — same top-down release order, coarser
steps, marginally cheaper mask tree.
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp

from ..config import SpeechMixConfig


SEP = "/"


from ..utils.pytree import keypath_str, tree_paths  # noqa: F401
# (tree_paths re-exported: freezing masks, checkpoint keys, and sharding
# rules must derive parameter paths identically — utils/pytree.py)


def mask_from_predicate(params, predicate: Callable[[str], bool]):
    """Build a {0.0, 1.0} float mask pytree from a path predicate."""
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    leaves = [jnp.asarray(1.0 if predicate(keypath_str(kp)) else 0.0,
                          jnp.float32) for kp, _ in flat]
    return jax.tree_util.tree_unflatten(treedef, leaves)


def fixed_parameters_mask(params, fixed_except: Sequence[str]):
    """Reference `fixed_parameters=True` policy (model.py:104-113): within
    the speech encoder and NLP subtrees, trainable iff the path contains a
    fixed_except substring.  Bridge params (weights_sum / length_adapter /
    enc_to_dec_proj) sit outside those subtrees in the reference loop and
    stay trainable (they also match fixed_except by name)."""
    def pred(path):
        if not (path.startswith("speech_encoder") or path.startswith("nlp")):
            return True
        return any(s in path for s in fixed_except)
    return mask_from_predicate(params, pred)


def variant_trainable_mask(params, cfg: SpeechMixConfig, fixed_speech=False,
                           fixed_nlp=True):
    """Static trainable mask for each variant:

    eed:     everything trainable (model.py:57-177)
    ed:      everything except the conv feature extractor — the reference ED
             constructor calls model.freeze_feature_encoder()
             (model.py:37, hf_model.py:112), which freezes exactly the conv
             extractor (HF Wav2Vec2FeatureEncoder._freeze_parameters)
    fixed:   speech and/or NLP frozen per flags (model.py:182-193)
    adapter: NLP enc/dec layers frozen; adapters + bridge + speech trainable
             (model.py:198-222 freezes only the layer stacks)
    self:    all NLP frozen; speech + bridge trainable (model.py:227-233)
    gan:     all NLP frozen; discriminator + speech + bridge trainable
             (model.py:271-282) — see gan_alternating_masks for the
             generator/discriminator step scheduling
    """
    v = cfg.variant

    def pred(path):
        if v == "ed":
            # reference ED freezes the conv feature extractor permanently
            return not path.startswith(
                f"speech_encoder{SEP}feature_extractor")
        if v == "eed":
            return True
        if v == "fixed":
            if path.startswith("speech_encoder") and fixed_speech:
                return False
            if path.startswith("nlp") and fixed_nlp:
                return False
            return True
        if v == "adapter":
            # freeze only the NLP layer stacks; embeddings/norms outside the
            # stacks stay trainable as in the reference
            if (path.startswith(f"nlp{SEP}encoder{SEP}layers") or
                    path.startswith(f"nlp{SEP}decoder{SEP}layers")):
                return False
            return True
        if v in ("self", "gan"):
            return not path.startswith("nlp")
        return True

    mask = mask_from_predicate(params, pred)
    if cfg.fixed_parameters:
        fixed = fixed_parameters_mask(params, cfg.fixed_except)
        mask = jax.tree_util.tree_map(lambda a, b: a * b, mask, fixed)
    return mask


def gan_alternating_masks(params, step, des_update: int):
    """GAN alternating updates, functional form of the reference's
    grad-surgery-in-forward (model.py:291-305, SURVEY.md §2.5.7): in block
    `step // des_update`, even blocks update the generator (everything except
    the discriminator), odd blocks update only the discriminator.
    Returns a float mask pytree; multiply into grads."""
    is_disc_block = ((step // des_update) % 2 == 1)

    def leaf_mask(path):
        is_disc = path.startswith("discriminator")
        return jnp.where(is_disc_block,
                         jnp.float32(1.0 if is_disc else 0.0),
                         jnp.float32(0.0 if is_disc else 1.0))

    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    leaves = [leaf_mask(keypath_str(kp)) for kp, _ in flat]
    return jax.tree_util.tree_unflatten(treedef, leaves)


def gradual_unfreeze_scale(params, progress):
    """Functional FreezingCallback (module/utility.py:19-30).

    progress: traced scalar in [0, 1] = epoch / freeze_epoch (>=1 after the
    freeze window).  Applies to the `speech_encoder` subtree only (the
    reference callback wraps model.encoder_model, train.py:327):

      * stacked transformer layers release top-first: layer l (of L) is
        trainable when progress >= (l_rank_from_top+1)/(L+1)
      * pre-transformer params (conv extractor, projection, pos conv, norms)
        sit at the START of the registration order, so they release last
        (only when progress >= 1).

    Returns a float multiplier pytree (1.0 everywhere outside the encoder).
    """
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    # number of stacked layers, from any layers leaf
    num_layers = 0
    for keypath, leaf in flat:
        path = keypath_str(keypath)
        if path.startswith(f"speech_encoder{SEP}layers") and hasattr(leaf, "shape"):
            num_layers = leaf.shape[0]
            break

    leaves = []
    for keypath, leaf in flat:
        path = keypath_str(keypath)
        if not path.startswith("speech_encoder"):
            leaves.append(jnp.float32(1.0))
        elif path.startswith(f"speech_encoder{SEP}layers") and num_layers > 0:
            # layer l releases when progress > (L - l) / (L + 1)
            l_idx = jnp.arange(num_layers, dtype=jnp.float32)
            thresh = (num_layers - l_idx) / (num_layers + 1)
            layer_mask = (progress > thresh).astype(jnp.float32)
            shape = (num_layers,) + (1,) * (leaf.ndim - 1)
            leaves.append(layer_mask.reshape(shape))
        else:
            # non-layer encoder params: released only at full unfreeze
            leaves.append((progress >= 1.0).astype(jnp.float32))
    return jax.tree_util.tree_unflatten(treedef, leaves)


# HF Wav2Vec2EncoderLayer parameter registration order (torch
# named_parameters, verified by enumeration on transformers 4.57): the
# in-layer tensor sequence the reference FreezingCallback's name_list walks.
_INLAYER_ORDER = (
    "attention/k_proj/kernel", "attention/k_proj/bias",
    "attention/v_proj/kernel", "attention/v_proj/bias",
    "attention/q_proj/kernel", "attention/q_proj/bias",
    "attention/out_proj/kernel", "attention/out_proj/bias",
    "attention_layer_norm/scale", "attention_layer_norm/bias",
    "ffn_in/kernel", "ffn_in/bias",
    "ffn_out/kernel", "ffn_out/bias",
    "final_layer_norm/scale", "final_layer_norm/bias",
)

# Pre-transformer groups in Wav2Vec2Model registration order.  pos_conv is
# a single merged kernel here vs torch's weight-norm (g, v) pair, so the
# release boundary inside the pos-conv group lands one tensor earlier — the
# only divergence from the reference's tensor sequence.
_PRE_GROUPS = (
    ("masked_spec_embed",),
    # feature_extractor conv layers, ascending (conv kernel, bias, norm)
    None,  # placeholder expanded at runtime
    ("feature_projection/layer_norm/scale", "feature_projection/layer_norm/bias",
     "feature_projection/projection/kernel", "feature_projection/projection/bias"),
    ("pos_conv/bias", "pos_conv/kernel"),
    ("encoder_layer_norm/scale", "encoder_layer_norm/bias"),
)


def _encoder_tensor_ranks(enc_params):
    """Registration rank of every speech-encoder leaf, replicating torch's
    named_parameters order (module/utility.py name_list).  Returns
    ({path: scalar-rank or (L,) rank vector}, n_total) where stacked
    transformer-layer leaves get one rank per layer slice."""
    paths = dict(tree_paths(enc_params))
    order = []
    if "masked_spec_embed" in paths:
        order.append("masked_spec_embed")
    i = 0
    while f"feature_extractor/layers/{i}/conv/kernel" in paths:
        for t in (f"feature_extractor/layers/{i}/conv/kernel",
                  f"feature_extractor/layers/{i}/conv/bias",
                  f"feature_extractor/layers/{i}/norm/scale",
                  f"feature_extractor/layers/{i}/norm/bias"):
            if t in paths:
                order.append(t)
        i += 1
    for group in _PRE_GROUPS[2:]:
        for t in group:
            if t in paths:
                order.append(t)
    base = len(order)
    ranks = {p: float(r) for r, p in enumerate(order)}
    num_layers = 0
    for p, leaf in paths.items():
        if p.startswith(f"layers{SEP}") and hasattr(leaf, "shape"):
            num_layers = leaf.shape[0]
            break
    for t_idx, name in enumerate(_INLAYER_ORDER):
        p = f"layers{SEP}{name}"
        if p in paths:
            ranks[p] = base + jnp.arange(num_layers, dtype=jnp.float32) \
                * len(_INLAYER_ORDER) + t_idx
    n_total = base + num_layers * len(_INLAYER_ORDER)
    return ranks, n_total


def reference_unfreeze_scale(params, epoch, freeze_epoch: int):
    """Tensor-granularity FreezingCallback replica (module/utility.py:19-30).

    The reference releases the LAST ``int(n/freeze_epoch) * epoch`` tensors
    of the speech encoder's named_parameters list at each epoch begin —
    i.e. individual tensors, top layer first, in reverse registration
    order.  Quirk preserved: at epoch 0 the slice ``name_list[-0:]`` is the
    WHOLE list, so epoch 0 trains fully; freezing starts at epoch 1.

    epoch: traced scalar (fractional epochs floor to the callback's
    integer-epoch behavior via the released-count formula).  Returns a
    float multiplier pytree (1.0 outside the speech encoder).  The coarser
    layer-granularity alternative is gradual_unfreeze_scale."""
    epoch = jnp.asarray(epoch, jnp.float32)
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    enc = params.get("speech_encoder") if isinstance(params, dict) else None
    if enc is None:
        return jax.tree_util.tree_unflatten(
            treedef, [jnp.float32(1.0)] * len(flat))
    ranks, n_total = _encoder_tensor_ranks(enc)
    freeze_layers = int(n_total / freeze_epoch) if freeze_epoch > 0 else 0
    # the callback acts at epoch BEGIN: fractional progress within an epoch
    # must not move the boundary (floor the epoch, not the product)
    k = freeze_layers * jnp.floor(epoch)
    release_all = (epoch >= freeze_epoch) | (k < 1)

    leaves = []
    prefix = f"speech_encoder{SEP}"
    for keypath, leaf in flat:
        path = keypath_str(keypath)
        if not path.startswith(prefix) or path[len(prefix):] not in ranks:
            leaves.append(jnp.float32(1.0))
            continue
        rank = ranks[path[len(prefix):]]
        trainable = release_all | (rank >= n_total - k)
        m = trainable.astype(jnp.float32)
        if hasattr(rank, "shape") and rank.ndim == 1:
            m = m.reshape((rank.shape[0],) + (1,) * (leaf.ndim - 1))
        leaves.append(m)
    return jax.tree_util.tree_unflatten(treedef, leaves)


def apply_grad_mask(grads, *masks):
    """Multiply one or more float mask pytrees into a gradient pytree."""
    out = grads
    for m in masks:
        out = jax.tree_util.tree_map(lambda g, s: g * s, out, m)
    return out


def count_trainable(params, mask):
    """(n_trainable, n_frozen) leaf counts + lists of paths, mirroring the
    reference's list_grad / list_no_grad bookkeeping (model.py:115-127)."""
    grad_list, no_grad_list = [], []
    for (path, leaf), (_, m) in zip(tree_paths(params), tree_paths(mask)):
        scalar = float(jnp.max(m)) if hasattr(m, "shape") else float(m)
        (grad_list if scalar > 0 else no_grad_list).append(path)
    return grad_list, no_grad_list
