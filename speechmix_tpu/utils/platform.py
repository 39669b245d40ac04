"""Shared platform-policy helpers.

The use_flash=None -> "auto-on when the backend is TPU" rule and the
config-dtype-string -> jnp dtype mapping are policy decisions used by the
api, pipeline, trainer, and bench surfaces; keeping them here means a
future change (e.g. enabling flash on another backend) edits ONE place
instead of silently diverging per surface.
"""


def resolve_use_flash(use_flash=None) -> bool:
    """None -> auto: the Pallas flash kernels are measured faster in situ
    on TPU (PERF.md) and unavailable elsewhere; explicit True/False wins."""
    if use_flash is None:
        import jax
        return jax.default_backend() == "tpu"
    return bool(use_flash)


def jnp_dtype(name: str):
    """Config dtype string ("bfloat16" | anything else) -> jnp dtype."""
    import jax.numpy as jnp
    return jnp.bfloat16 if name == "bfloat16" else jnp.float32
