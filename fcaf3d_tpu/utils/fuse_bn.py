"""Fold BatchNorm multiplies into the preceding sparse-conv kernels.

Equivalent of the reference's `tools/misc/fuse_conv_bn.py` (+ mmcv
`fuse_conv_bn`), redesigned for the functional parameter tree: inference
BatchNorm is `(x - mean) * scale/sqrt(var+eps) + bias`; the multiply is
folded into the conv kernel's output channels and the BN is rewritten into
a pure bias-add (scale=1, mean=0, var=1-eps), which is numerically
identical through the unchanged model definition. On TPU, XLA already
fuses the BN affine into the conv's epilogue, so this is a
checkpoint-level parity feature rather than a runtime win — the fused tree
is what `publish_model`-style deployment artifacts should carry.
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

BN_EPS = 1e-5

# BN module name -> producing conv module name, within the same scope
_PAIR_RULES: Tuple[Tuple[str, str], ...] = (
    ("norm1", "conv1"),
    ("norm2", "conv2"),
    ("downsample_norm", "downsample_conv"),
    ("_bn1", "_tr"),
    ("_bn2", "_conv"),
    ("_bn", "_conv"),
)


def _conv_name_for(bn_name: str):
    for suffix, conv_suffix in _PAIR_RULES:
        if bn_name.endswith(suffix):
            return bn_name[: -len(suffix)] + conv_suffix
    return None


def fuse_conv_bn(variables: dict) -> Tuple[dict, int]:
    """Return (fused_variables, n_fused). `variables` must hold 'params' and
    'batch_stats' collections; the input dict is not mutated."""
    def to_plain(d):
        return {
            k: to_plain(v) if isinstance(v, (dict,)) or hasattr(v, "items")
            else v
            for k, v in dict(d).items()
        }

    params = to_plain(variables["params"])
    stats = to_plain(variables.get("batch_stats", {}))
    n = [0]

    def walk(pscope: dict, sscope: dict):
        for name in list(pscope.keys()):
            sub = pscope[name]
            if not isinstance(sub, dict):
                continue
            if set(sub.keys()) >= {"scale", "bias"} and name in sscope and \
                    set(sscope[name].keys()) >= {"mean", "var"}:
                conv_name = _conv_name_for(name)
                if conv_name is None or conv_name not in pscope:
                    continue
                conv = pscope[conv_name]
                if "kernel" not in conv:
                    continue
                mean = sscope[name]["mean"]
                var = sscope[name]["var"]
                inv = sub["scale"] / jnp.sqrt(var + BN_EPS)
                kernel = conv["kernel"]
                if kernel.shape[-1] != inv.shape[0]:
                    continue
                conv["kernel"] = (
                    kernel.astype(jnp.float32) * inv[None, None, :]
                ).astype(kernel.dtype)
                sub["bias"] = sub["bias"] - mean * inv
                sub["scale"] = jnp.ones_like(sub["scale"])
                sscope[name]["mean"] = jnp.zeros_like(mean)
                sscope[name]["var"] = jnp.full_like(var, 1.0 - BN_EPS)
                n[0] += 1
            else:
                walk(sub, sscope.get(name, {}))

    walk(params, stats)
    out = dict(variables)
    out["params"] = params
    out["batch_stats"] = stats
    return out, n[0]
