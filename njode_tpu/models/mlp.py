"""Feed-forward network primitives as pure functions over param pytrees.

Mirrors the reference network builders (``/root/reference/NJODE/models.py``):
- :func:`ffnn_init`/:func:`ffnn_apply` = ``get_ffnn`` (``models.py:140-166``):
  ``Linear [act, Dropout, Linear]*`` with activations {tanh, relu} and
  Xavier-uniform weights / zero bias (``models.py:21-26``),
- :func:`wrapped_ffnn_apply` = class ``FFNN`` (``models.py:220-276``): tanh on
  inputs, optional mask concat (doubles input), optional residual skip
  (identity tiled when out >= in, mean of chunks when in > out),
- :func:`gru_cell_init`/:func:`gru_cell_apply` = ``torch.nn.GRUCell`` with
  torch's default uniform init (the reference's Xavier init only touches
  ``nn.Linear``, ``models.py:21-26``, so the GRU keeps torch defaults).

Pure-pytree + explicit apply keeps every parameter trivially shardable under
``jax.sharding`` and lets the same code run inside ``lax.scan``.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

Activation = {"tanh": jnp.tanh, "relu": jax.nn.relu}


def _xavier_linear(key, in_size, out_size, bias=True):
    a = math.sqrt(6.0 / (in_size + out_size))
    w = jax.random.uniform(key, (in_size, out_size), jnp.float32, -a, a)
    p = {"w": w}
    if bias:
        p["b"] = jnp.zeros((out_size,), jnp.float32)
    return p


def _linear(p, x, dot_dtype=None):
    y = _mm(x, p["w"], dot_dtype)
    if "b" in p:
        y = y + p["b"]
    return y


def _mm(x, w, dot_dtype=None):
    """Matmul with an optional reduced-precision MXU path.

    ``dot_dtype=jnp.bfloat16`` casts BOTH operands to bf16 and contracts
    with ``preferred_element_type=float32`` — the TPU mixed-precision
    recipe: the MXU runs at its native bf16 rate while the systolic
    accumulation and everything downstream (bias, activations, carries,
    optimizer state) stay float32. Only the matmul INPUTS are rounded;
    this is what `compute_dtype='bfloat16'` means framework-wide."""
    if dot_dtype is None:
        return x @ w
    return jax.lax.dot_general(
        x.astype(dot_dtype), w.astype(dot_dtype),
        (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def _dropout(x, rate, key, train):
    if not train or rate <= 0.0 or key is None:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(key, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0)


def _dropout_u(x, rate, u):
    """Dropout from a precomputed uniform tensor ``u`` (sliced to x's width).

    Scan bodies use this instead of per-step PRNG calls: one fused
    ``jax.random.uniform`` for the whole scan replaces hundreds of tiny
    threefry invocations, which otherwise dominate the step time on TPU
    (measured 4x on the demo-parity config)."""
    keep = 1.0 - rate
    # compare in f32: a bf16 `u` would weak-promote the python-float
    # threshold down to bf16 (0.9 -> 0.8984...), which must not depend on
    # the storage dtype of the mask bits
    mask = u[..., :x.shape[-1]].astype(jnp.float32) < jnp.float32(keep)
    return jnp.where(mask, x / keep, 0.0)


def ffnn_init(key, input_size: int, output_size: int,
              nn_desc: Optional[Sequence[Tuple[int, str]]], bias=True):
    """Initialize params for a ``get_ffnn``-style MLP."""
    if nn_desc is None:
        return [_xavier_linear(key, input_size, output_size, bias)]
    widths = [input_size] + [int(d[0]) for d in nn_desc] + [output_size]
    keys = jax.random.split(key, len(widths) - 1)
    return [_xavier_linear(k, i, o, bias)
            for k, i, o in zip(keys, widths[:-1], widths[1:])]


def ffnn_apply(params, x, nn_desc, dropout_rate=0.0, rng=None, train=False,
               drop_u=None, dot_dtype=None):
    """Apply the MLP: Linear, then per hidden layer [act, dropout, Linear].

    ``drop_u``: optional ``[n_hidden, ..., W>=width]`` precomputed uniforms
    (see :func:`_dropout_u`); takes precedence over ``rng``.
    ``dot_dtype``: reduced-precision matmul operand dtype (:func:`_mm`).
    """
    y = _linear(params[0], x, dot_dtype)
    if nn_desc is None:
        return y
    n_hidden = len(nn_desc)
    use_u = drop_u is not None and train and dropout_rate > 0.0
    keys = (jax.random.split(rng, n_hidden)
            if (train and dropout_rate > 0.0 and rng is not None
                and not use_u) else [None] * n_hidden)
    for i in range(n_hidden):
        y = Activation[nn_desc[i][1]](y)
        if use_u:
            y = _dropout_u(y, dropout_rate, drop_u[i])
        else:
            y = _dropout(y, dropout_rate, keys[i], train)
        y = _linear(params[i + 1], y, dot_dtype)
    return y


def residual_case(input_size: int, output_size: int, residual: bool):
    """Residual wiring of class FFNN (``models.py:240-259``): returns
    (case, mult) with case 0=no skip, 1=tile input, 2=mean chunks."""
    if not residual:
        return 0, 1
    if input_size <= output_size:
        if output_size % input_size != 0:
            raise ValueError(
                "for residual: output_size needs to be multiple of input_size")
        return 1, output_size // input_size
    if input_size % output_size != 0:
        raise ValueError(
            "for residual: input_size needs to be multiple of output_size")
    return 2, input_size // output_size


def wrapped_ffnn_init(key, input_size, output_size, nn_desc, bias=True,
                      masked=False):
    in_size = 2 * input_size if masked else input_size
    return ffnn_init(key, in_size, output_size, nn_desc, bias)


def wrapped_ffnn_apply(params, x, nn_desc, *, case, mult, masked=False,
                       mask=None, dropout_rate=0.0, rng=None, train=False,
                       drop_u=None, dot_dtype=None):
    """Apply class-FFNN semantics: tanh(input) [concat mask], MLP, skip."""
    if masked:
        assert mask is not None
        inp = jnp.concatenate([jnp.tanh(x), mask], axis=-1)
    else:
        inp = jnp.tanh(x)
    out = ffnn_apply(params, inp, nn_desc, dropout_rate, rng, train, drop_u,
                     dot_dtype)
    if case == 0:
        return out
    if case == 1:
        identity = jnp.tile(x, (1,) * (x.ndim - 1) + (mult,))
        return identity + out
    # case 2: mean of `mult` chunks of the raw input
    chunks = jnp.split(x, mult, axis=-1)
    identity = jnp.mean(jnp.stack(chunks, axis=0), axis=0)
    return identity + out


def gru_cell_init(key, input_size: int, hidden_size: int, bias=True):
    """torch.nn.GRUCell default init: U(-1/sqrt(H), 1/sqrt(H)) everywhere."""
    k = 1.0 / math.sqrt(hidden_size)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    p = {
        "w_ih": jax.random.uniform(k1, (input_size, 3 * hidden_size),
                                   jnp.float32, -k, k),
        "w_hh": jax.random.uniform(k2, (hidden_size, 3 * hidden_size),
                                   jnp.float32, -k, k),
    }
    if bias:
        p["b_ih"] = jax.random.uniform(k3, (3 * hidden_size,), jnp.float32,
                                       -k, k)
        p["b_hh"] = jax.random.uniform(k4, (3 * hidden_size,), jnp.float32,
                                       -k, k)
    return p


def gru_cell_apply(p, x, h, dot_dtype=None):
    """torch GRUCell forward (gate order r, z, n)."""
    H = h.shape[-1]
    gi = _mm(x, p["w_ih"], dot_dtype) + p.get("b_ih", 0.0)
    gh = _mm(h, p["w_hh"], dot_dtype) + p.get("b_hh", 0.0)
    i_r, i_z, i_n = gi[..., :H], gi[..., H:2 * H], gi[..., 2 * H:]
    h_r, h_z, h_n = gh[..., :H], gh[..., H:2 * H], gh[..., 2 * H:]
    r = jax.nn.sigmoid(i_r + h_r)
    z = jax.nn.sigmoid(i_z + h_z)
    n = jnp.tanh(i_n + r * h_n)
    return (1.0 - z) * n + z * h


def count_params(tree) -> int:
    return sum(int(x.size) for x in jax.tree_util.tree_leaves(tree))
