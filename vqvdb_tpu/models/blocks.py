"""Neural building blocks in channels-last (NDHWC) JAX, as pure functions.

Re-implements the torch blocks of the reference (python/VQVAE_v2.py:159-228)
TPU-first: channels-last layout so the feature dim maps to TPU lanes, explicit
pytree params, f32 statistics for normalization, and everything shaped for XLA
fusion under jit. No torch semantics are copied beyond the published math.

Weight layouts:
  conv3d kernel: DHWIO  (kd, kh, kw, in_ch, out_ch)
  linear kernel: (in, out)

Parity with torch (validated in tests/test_torch_parity.py):
  * conv3d == torch.nn.functional.conv3d (weights transposed OIDHW->DHWIO)
  * group_norm == torch.nn.functional.group_norm (eps 1e-5, channels-last)
  * pixel_shuffle_3d splits the channel dim exactly like the reference's
    view/permute chain (python/VQVAE_v2.py:172-187), so ported torch weights
    reproduce identical voxel ordering.
"""

from __future__ import annotations

import math
from typing import Dict

import jax
import jax.numpy as jnp

Params = Dict[str, jnp.ndarray]


# ---------------------------------------------------------------------------
# Initializers (torch-default-compatible so training dynamics match reference)
# ---------------------------------------------------------------------------

def _kaiming_uniform(key, shape, fan_in, a=math.sqrt(5.0), dtype=jnp.float32):
    """torch.nn.init.kaiming_uniform_(a=sqrt(5)) — torch's Conv/Linear default."""
    gain = math.sqrt(2.0 / (1.0 + a * a))
    bound = gain * math.sqrt(3.0 / fan_in)
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def _bias_uniform(key, shape, fan_in, dtype=jnp.float32):
    bound = 1.0 / math.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def init_conv3d(
    key,
    in_ch: int,
    out_ch: int,
    kernel: int,
    *,
    bias: bool = True,
    dtype=jnp.float32,
) -> Params:
    kw, kb = jax.random.split(key)
    fan_in = in_ch * kernel**3
    p = {"w": _kaiming_uniform(kw, (kernel, kernel, kernel, in_ch, out_ch), fan_in, dtype=dtype)}
    if bias:
        p["b"] = _bias_uniform(kb, (out_ch,), fan_in, dtype=dtype)
    return p


def init_conv3d_near_zero(key, in_ch: int, out_ch: int, kernel: int, std: float = 1e-3,
                          dtype=jnp.float32) -> Params:
    """Residual-branch closer conv: N(0, 1e-3) weights, zero bias
    (ref: python/VQVAE_v2.py:201-202)."""
    w = std * jax.random.normal(key, (kernel, kernel, kernel, in_ch, out_ch), dtype)
    return {"w": w, "b": jnp.zeros((out_ch,), dtype)}


def init_conv3d_icnr(key, in_ch: int, out_ch: int, kernel: int, upscale: int = 2,
                     dtype=jnp.float32) -> Params:
    """ICNR init for the pre-pixel-shuffle conv (ref: python/VQVAE_v2.py:159-169):
    initialize out_ch // r^3 filters (kaiming-normal, fan_in mode) and repeat
    each r^3 times consecutively along the output-channel axis so that the
    shuffled output starts as nearest-neighbour upsampling."""
    r3 = upscale**3
    sub = out_ch // r3
    if sub == 0:
        raise ValueError("ICNR: out_channels too small.")
    fan_in = in_ch * kernel**3
    std = math.sqrt(2.0 / fan_in)  # kaiming_normal_ default (fan_in, relu... a=0)
    temp = std * jax.random.normal(key, (kernel, kernel, kernel, in_ch, sub), dtype)
    w = jnp.repeat(temp, r3, axis=-1)
    kb = jax.random.fold_in(key, 1)
    return {"w": w, "b": _bias_uniform(kb, (out_ch,), fan_in, dtype=dtype)}


def init_group_norm(num_ch: int, dtype=jnp.float32) -> Params:
    return {"scale": jnp.ones((num_ch,), dtype), "bias": jnp.zeros((num_ch,), dtype)}


def init_linear(key, in_f: int, out_f: int, *, bias: bool = True, dtype=jnp.float32) -> Params:
    kw, kb = jax.random.split(key)
    p = {"w": _kaiming_uniform(kw, (in_f, out_f), in_f, dtype=dtype)}
    if bias:
        p["b"] = _bias_uniform(kb, (out_f,), in_f, dtype=dtype)
    return p


# ---------------------------------------------------------------------------
# Forward ops
# ---------------------------------------------------------------------------

_CONV_DN = ("NDHWC", "DHWIO", "NDHWC")


def conv3d(
    params: Params,
    x: jnp.ndarray,
    *,
    stride: int = 1,
    padding: int = 0,
    split_in: int = 0,
) -> jnp.ndarray:
    """3D convolution, NDHWC x DHWIO -> NDHWC.

    split_in > 0 computes the conv as a sum over input-channel slabs of at
    most that width — exact up to fp reassociation (conv is linear in
    channels). Measured on v5e: XLA's strategy for >64-input-channel 3D
    convs at these tiny spatial sizes runs at ~half the FLOP rate of its
    64-input strategy (benchmarks/experiment_stem.py: the decoder's 128->64
    stem conv drops 1.74 -> 0.84 ms/4096 leaves when split) — so inference
    paths split wide convs; training keeps the canonical single conv.
    """
    cin = x.shape[-1]
    if split_in and cin > split_in:
        w = params["w"]
        y = None
        for lo in range(0, cin, split_in):
            sl = slice(lo, min(lo + split_in, cin))
            piece = conv3d({"w": w[..., sl, :]}, x[..., sl],
                           stride=stride, padding=padding)
            y = piece if y is None else y + piece
        if "b" in params:
            y = y + params["b"].astype(y.dtype)
        return y
    w = params["w"].astype(x.dtype)
    y = jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride, stride, stride),
        padding=[(padding, padding)] * 3,
        dimension_numbers=_CONV_DN,
    )
    if "b" in params:
        y = y + params["b"].astype(y.dtype)
    return y


def group_norm(params: Params, x: jnp.ndarray, num_groups: int, eps: float = 1e-5) -> jnp.ndarray:
    """GroupNorm over channels-last input; statistics in f32 for TPU stability."""
    b, d, h, w, c = x.shape
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32).reshape(b, d, h, w, num_groups, c // num_groups)
    mean = jnp.mean(xf, axis=(1, 2, 3, 5), keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=(1, 2, 3, 5), keepdims=True)
    xf = (xf - mean) * jax.lax.rsqrt(var + eps)
    xf = xf.reshape(b, d, h, w, c)
    y = xf * params["scale"].astype(jnp.float32) + params["bias"].astype(jnp.float32)
    return y.astype(orig_dtype)


def pixel_shuffle_3d(x: jnp.ndarray, r: int = 2) -> jnp.ndarray:
    """Voxel shuffle (B,D,H,W,C) -> (B,D*r,H*r,W*r,C/r^3).

    The channel dim is split as (oc, rd, rh, rw) with oc outermost — the same
    ordering as the reference's view(b, oc, r, r, r, d, h, w) (VQVAE_v2.py:185),
    so torch-ported weights line up exactly.
    """
    b, d, h, w, c = x.shape
    r3 = r * r * r
    if c % r3 != 0:
        raise ValueError("Channels not divisible by r^3.")
    oc = c // r3
    x = x.reshape(b, d, h, w, oc, r, r, r)
    # (b, d, rd, h, rh, w, rw, oc)
    x = x.transpose(0, 1, 5, 2, 6, 3, 7, 4)
    return x.reshape(b, d * r, h * r, w * r, oc)


def residual_block(params: Params, x: jnp.ndarray, *, groups: int = 8, scale: float = 0.1,
                   split_in: int = 0) -> jnp.ndarray:
    """Pre-activation GN residual block with scaled residual
    (ref: python/VQVAE_v2.py:190-210). SAME padding is derived from each
    conv's kernel size, so blocks with non-k3 convs (the packed_lite
    encoder's pointwise closer) reuse this unchanged."""
    h = jax.nn.relu(group_norm(params["gn1"], x, groups))
    h = conv3d(params["conv1"], h, stride=1,
               padding=(params["conv1"]["w"].shape[0] - 1) // 2,
               split_in=split_in)
    h = jax.nn.relu(group_norm(params["gn2"], h, groups))
    h = conv3d(params["conv2"], h, stride=1,
               padding=(params["conv2"]["w"].shape[0] - 1) // 2,
               split_in=split_in)
    return x + jnp.asarray(scale, x.dtype) * h


def init_residual_block(key, channels: int, dtype=jnp.float32,
                        kernel2: int = 3) -> Params:
    k1, k2 = jax.random.split(key)
    return {
        "gn1": init_group_norm(channels, dtype),
        "conv1": init_conv3d(k1, channels, channels, 3, dtype=dtype),
        "gn2": init_group_norm(channels, dtype),
        "conv2": init_conv3d_near_zero(k2, channels, channels, kernel2,
                                       dtype=dtype),
    }


def channel_attention(params: Params, x: jnp.ndarray) -> jnp.ndarray:
    """Squeeze-excite channel gating (ref: python/VQVAE_v2.py:213-228)."""
    y = jnp.mean(x.astype(jnp.float32), axis=(1, 2, 3))  # (B, C)
    y = jax.nn.relu(y @ params["fc1"]["w"].astype(jnp.float32))
    y = jax.nn.sigmoid(y @ params["fc2"]["w"].astype(jnp.float32))
    return x * y[:, None, None, None, :].astype(x.dtype)


def init_channel_attention(key, channels: int, reduction: int = 4, dtype=jnp.float32) -> Params:
    k1, k2 = jax.random.split(key)
    return {
        "fc1": init_linear(k1, channels, channels // reduction, bias=False, dtype=dtype),
        "fc2": init_linear(k2, channels // reduction, channels, bias=False, dtype=dtype),
    }
