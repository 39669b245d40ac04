"""Shared pytree keypath helpers.

Freezing masks, checkpoint archive keys, and tensor-parallel sharding rules
all address parameters by the same '/'-joined path string; deriving it must
live in ONE place — a divergence (e.g. a new jax keypath entry type) would
otherwise silently change checkpoint keys or freeze masks in only some call
sites.
"""

import jax


def key_part(k) -> str:
    """One keypath entry -> its string form (DictKey .key, SequenceKey
    .idx, anything else via str)."""
    if hasattr(k, "key"):
        return str(k.key)
    return str(getattr(k, "idx", k))


def keypath_str(keypath) -> str:
    """Full keypath -> 'a/b/0/c'."""
    return "/".join(key_part(k) for k in keypath)


def tree_paths(tree):
    """Flatten to a list of (path_string, leaf)."""
    return [(keypath_str(kp), leaf)
            for kp, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]]
