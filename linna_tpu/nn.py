"""Emulator network definitions as pure JAX pytrees.

The production emulator mirrors the reference's ``ChtoModelv2`` topology and
initialization exactly (reference linna/nn.py:59-133: input linear -> three
width-halving residual blocks with narrow inner channels -> two linear layers
with ReLU -> output linear; Xavier-uniform weights everywhere incl. the
residual skip projections — see ``_init_resblock`` for why the reference's
apparent zero-skip init is overwritten — and all biases 1e-2), because the
training dynamics (init scheme, 0.1 residual scaling) are part of the
behavior contract.  The implementation is a plain parameter-dict pytree
with a pure ``apply`` — no module framework — so it composes freely with
``jit``/``vmap``/``grad``/``shard_map`` and the whole forward pass is one
fused XLA computation on the MXU (batched matmuls, f32 accumulation).

Variants (reference linna/nn.py):
- ``chto_v2``      — channels (16, 32, 64)  (ChtoModelv2, production)
- ``chto_simple``  — channels (4, 8, 16)    (ChtoModelsimple)
- ``chto_v2_linear`` — v2 + ``1e-3 * Linear(in, out)`` bypass (ChtoModelv2_linear)
"""

from __future__ import annotations

import math
from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "ModelSpec",
    "make_model_spec",
    "init_model",
    "apply_model",
    "hidden_size_for",
    "MODEL_NAMES",
]

MODEL_NAMES = ("chto_v2", "chto_simple", "chto_v2_linear")

Params = Dict[str, Any]


class ModelSpec(NamedTuple):
    """Static (hashable) description of an emulator network."""

    name: str
    in_size: int
    out_size: int
    hidden: int
    channel: int
    linear_bypass: bool

    @property
    def widths(self):
        """(h, h/2, h/4, h/8) trunk widths."""
        h = self.hidden
        return (h, h // 2, h // 4, h // 8)


def hidden_size_for(out_size: int) -> int:
    """Reference width rule: ``max(32, 32*out)`` capped at 1000 for out>30
    (linna/nn.py:74-76)."""
    if out_size > 30:
        return 1000
    return max(32, int(out_size * 32))


def make_model_spec(name: str, in_size: int, out_size: int) -> ModelSpec:
    if name == "chto_v2":
        return ModelSpec(name, in_size, out_size, hidden_size_for(out_size), 16, False)
    if name == "chto_simple":
        return ModelSpec(name, in_size, out_size, hidden_size_for(out_size), 4, False)
    if name == "chto_v2_linear":
        return ModelSpec(name, in_size, out_size, hidden_size_for(out_size), 16, True)
    raise ValueError(f"unknown model {name!r}; options: {MODEL_NAMES}")


def _xavier_uniform(key, fan_in: int, fan_out: int) -> jax.Array:
    """Xavier/Glorot uniform, matching torch.nn.init.xavier_uniform_
    (reference linna/nn.py:40).  Stored as (in, out) for ``x @ W``."""
    limit = math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(
        key, (fan_in, fan_out), minval=-limit, maxval=limit, dtype=jnp.float32
    )


def _init_linear(key, fan_in: int, fan_out: int, bias: bool = True) -> Params:
    w = _xavier_uniform(key, fan_in, fan_out)
    p = {"w": w}
    if bias:
        # All biases initialized to 1e-2 (reference linna/nn.py:42,99).
        p["b"] = jnp.full((fan_out,), 1e-2, dtype=jnp.float32)
    return p


def _init_resblock(key, in_size: int, channel: int, out_size: int) -> Params:
    """Residual block params (reference linna/nn.py:11-43): two biased linears
    plus a bias-free skip projection.

    Skip init: the reference's ResBlock zeroes the skip
    (linna/nn.py:43), but ``ChtoModelv2.init_weight`` then walks
    ``self.modules()`` in pre-order and re-initializes every ``nn.Linear`` —
    including each block's ``skip_layer`` — to Xavier-uniform
    (linna/nn.py:91-99 visits the parent ResBlock first, its children
    after).  The effective production init is therefore **Xavier** skips;
    zero-init skips leave each ReLU-capped block near-dead and the trunk
    untrainable (measured: MSE plateau at 30% unexplained variance on a
    purely linear 33->33 target)."""
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "lin1": _init_linear(k1, in_size, channel),
        "lin2": _init_linear(k2, channel, out_size),
        "skip_w": _xavier_uniform(k3, in_size, out_size),
    }


def init_model(key: jax.Array, spec: ModelSpec) -> Params:
    """Initialize parameters for ``spec`` (reference linna/nn.py:77-99)."""
    keys = jax.random.split(key, 8)
    h, h2, h4, h8 = spec.widths
    c = spec.channel
    params: Params = {
        "layer1": _init_linear(keys[0], spec.in_size, h),
        "rb1": _init_resblock(keys[1], h, c, h2),
        "rb2": _init_resblock(keys[2], h2, 2 * c, h4),
        "rb3": _init_resblock(keys[3], h4, 4 * c, h8),
        # layer6 maps h/8 -> (h/8)*4 == h/2 for chto_v2 (linna/nn.py:84) but
        # h/8 -> h/8 for chto_simple (linna/nn.py:325).
        "layer6": _init_linear(
            keys[4], h8, h8 * 4 if spec.name != "chto_simple" else h8
        ),
        "layer7": _init_linear(
            keys[5], h8 * 4 if spec.name != "chto_simple" else h8, spec.out_size
        ),
        "layer8": _init_linear(keys[6], spec.out_size, spec.out_size),
    }
    if spec.linear_bypass:
        # ChtoModelv2_linear: Linear(in, out) with zero bias and 1e-5 weights
        # (reference linna/nn.py:160-163), applied scaled by 1e-3.
        params["linear_bypass"] = {
            "w": jnp.full((spec.in_size, spec.out_size), 1e-5, dtype=jnp.float32),
            "b": jnp.zeros((spec.out_size,), dtype=jnp.float32),
        }
    return params


def _linear(p: Params, x: jax.Array) -> jax.Array:
    # Matmul accumulation is always float32; the output follows the weight
    # dtype so a bf16-cast parameter tree keeps bf16 activations flowing
    # between layers (native MXU rate) while sums stay exact per layer.
    y = jnp.dot(x, p["w"], preferred_element_type=jnp.float32)
    if "b" in p:
        y = y + p["b"]
    return y.astype(p["w"].dtype)


def _resblock(p: Params, x: jax.Array) -> jax.Array:
    """y = relu(0.1 * lin2(relu(lin1(x))) + skip(x)) (reference linna/nn.py:45-56)."""
    hcur = jax.nn.relu(_linear(p["lin1"], x))
    skip = jnp.dot(x, p["skip_w"], preferred_element_type=jnp.float32)
    y = jax.nn.relu(_linear(p["lin2"], hcur) * 0.1 + skip)
    return y.astype(p["skip_w"].dtype)


def apply_model(
    spec: ModelSpec,
    params: Params,
    x: jax.Array,
    linearmodel: Optional[Any] = None,
) -> jax.Array:
    """Forward pass, batch-native over leading axes
    (reference linna/nn.py:110-133).

    ``linearmodel`` is an optional callable pre-model added to the output
    (the reference's pluggable ``LinearModel``; see :mod:`linna_tpu.linear_model`).
    The ``chto_v2_linear`` variant ignores it, exactly like the reference
    (ChtoModelv2_linear.forward never calls self.linearmodel,
    reference linna/nn.py:220-232 — only the 1e-3 bypass applies).
    """
    s = jax.nn.relu(_linear(params["layer1"], x))
    s = _resblock(params["rb1"], s)
    s = _resblock(params["rb2"], s)
    s = _resblock(params["rb3"], s)
    s = jax.nn.relu(_linear(params["layer6"], s))
    s = jax.nn.relu(_linear(params["layer7"], s))
    out = _linear(params["layer8"], s)
    if spec.linear_bypass:
        out = out + 1e-3 * _linear(params["linear_bypass"], x)
    elif linearmodel is not None:
        out = out + linearmodel(x)
    return out


def count_params(params: Params) -> int:
    return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))
