"""Flax linen building blocks over the sparse engine.

Mirrors the MinkowskiEngine modules the reference composes
(`MinkowskiConvolution`, `MinkowskiBatchNorm`, `MinkowskiInstanceNorm`,
`ME.modules.resnet_block.BasicBlock`) as linen modules operating on
`SparseTensor`. BatchNorm statistics are computed over *valid* voxel rows
across the whole (global) batch — under pjit data parallelism XLA reduces
them across devices automatically, which subsumes the reference's
`NaiveSyncBatchNorm` (`/root/reference/mmdet3d/ops/norm.py`).
"""
from __future__ import annotations

from typing import Callable, Optional

import jax.numpy as jnp
from flax import linen as nn

from ..ops.sparse.conv import (
    gen_gather_gemm,
    generative_transpose_conv2x2,
    sparse_conv,
    sparse_max_pool,
)
from ..ops.sparse.tensor import SparseTensor


def maybe_remat(target, static_argnums=()):
    """`nn.remat` only when FCAF3D_REMAT=1 (default OFF since r5).

    Rematerialization trades compute for activation memory in the backward
    pass. Measured on 1x v5e (16GB): batch-16 ScanNet training fits WITHOUT
    remat, and remat costs ~150 ms/step of recomputed sparse convs at batch
    8 (1082 -> 930 ms, loss bit-identical) — so it is now opt-in for
    memory-constrained setups (larger batches / bigger models). Remat also
    TRACES its body even under `jax.disable_jit()`, which breaks eager
    introspection (`tools/autotune_tiles.py` map capture).
    FCAF3D_NO_REMAT=1 keeps forcing it off (back-compat with r4 tooling).
    """
    import os

    if os.environ.get("FCAF3D_NO_REMAT", "0") == "1":
        return target
    if os.environ.get("FCAF3D_REMAT", "0") == "1":
        return nn.remat(target, static_argnums=static_argnums)
    return target


def _kaiming_kernel_init(key, shape, dtype=jnp.float32):
    """He-normal (fan_out, relu) over a [K, Cin, Cout] sparse kernel —
    the reference's `ME.utils.kaiming_normal_` init (`me_resnet.py:46`)."""
    k, _, cout = shape
    std = (2.0 / (k * cout)) ** 0.5
    import jax

    return jax.random.normal(key, shape, dtype) * std


class SparseConv(nn.Module):
    """MinkowskiConvolution equivalent."""

    out_channels: int
    kernel_size: int = 3
    stride: int = 1
    use_bias: bool = False
    out_budget: Optional[int] = None
    kernel_init: Callable = _kaiming_kernel_init
    bias_init: Callable = nn.initializers.zeros
    n_chunks: int = 3

    @nn.compact
    def __call__(self, st: SparseTensor, plan=None, epilogue=None) -> SparseTensor:
        k = self.kernel_size ** 3
        w = self.param(
            "kernel",
            self.kernel_init,
            (k, st.num_channels, self.out_channels),
        )
        b = (
            self.param("bias", self.bias_init, (self.out_channels,))
            if self.use_bias
            else None
        )
        w = w.astype(st.feats.dtype)
        b = b.astype(st.feats.dtype) if b is not None else None
        return sparse_conv(
            st,
            w,
            self.kernel_size,
            stride=self.stride,
            bias=b,
            out_budget=self.out_budget,
            n_chunks=self.n_chunks,
            plan=plan,
            epilogue=epilogue,
        )


class SparseGenerativeTranspose(nn.Module):
    """MinkowskiGenerativeConvolutionTranspose(kernel=2, stride=2).

    With `sort_output=False` the child map stays parent-major so consumers
    can use the analytic `gen_conv_plan` kernel map (no binary search)."""

    out_channels: int
    sort_output: bool = True
    kernel_init: Callable = _kaiming_kernel_init

    @nn.compact
    def __call__(self, st: SparseTensor, raw: bool = False):
        """With raw=True, returns (coords, keys, feats) parent-major without
        building a SparseTensor (prune-early neck path)."""
        w = self.param(
            "kernel", self.kernel_init, (8, st.num_channels, self.out_channels)
        )
        if raw:
            from ..ops.sparse.neck_ops import gen_children

            return gen_children(st, w.astype(st.feats.dtype))
        return generative_transpose_conv2x2(
            st, w.astype(st.feats.dtype), sort_output=self.sort_output
        )


class SparseBatchNorm(nn.Module):
    """Masked BatchNorm over valid voxel rows (MinkowskiBatchNorm).

    Uses torch-style momentum 0.1 (running = 0.9*old + 0.1*batch) and
    eps 1e-5 to stay checkpoint-compatible with the reference.
    """

    momentum: float = 0.1
    eps: float = 1e-5

    @nn.compact
    def __call__(self, st: Optional[SparseTensor], train: bool = False,
                 features: Optional[int] = None):
        """Standard mode (st given): return the normalized SparseTensor.
        Affine mode (st=None, `features` given, inference only): return the
        folded running-stats affine `(inv, shift)` f32 pair with
        `bn(x) == x * inv + shift`, for fusing into the producing conv's
        epilogue (`ConvEpilogue`). Parameter shapes/names are identical in
        both modes, so checkpoints are unaffected."""
        c = st.num_channels if st is not None else features
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        if st is None:
            assert not train
            ra_mean = self.variable(
                "batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32)
            )
            ra_var = self.variable(
                "batch_stats", "var", lambda: jnp.ones((c,), jnp.float32)
            )
            inv = scale.astype(jnp.float32) / jnp.sqrt(ra_var.value + self.eps)
            return inv, bias.astype(jnp.float32) - ra_mean.value * inv
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((c,), jnp.float32)
        )

        feats32 = st.feats.astype(jnp.float32)
        if train:
            mask = st.valid[..., None].astype(jnp.float32)
            count = jnp.maximum(jnp.sum(mask), 1.0)
            # NOTE r5: the one-pass E[x^2]-mean^2 form was tried and made
            # the batch-8 train step WORSE (930 -> 1314 ms traced) — the
            # fused two-reduction forward lost more in backward fusion than
            # it saved; keeping the two-pass form.
            mean = jnp.sum(feats32 * mask, axis=(0, 1)) / count
            var = jnp.sum(((feats32 - mean) ** 2) * mask, axis=(0, 1)) / count
            if not self.is_initializing():
                ra_mean.value = (
                    (1 - self.momentum) * ra_mean.value + self.momentum * mean
                )
                ra_var.value = (1 - self.momentum) * ra_var.value + self.momentum * var
        else:
            mean, var = ra_mean.value, ra_var.value

        inv = scale / jnp.sqrt(var + self.eps)
        out = (feats32 - mean) * inv + bias
        out = jnp.where(st.valid[..., None], out, 0.0).astype(st.feats.dtype)
        return st.with_feats(out)


class SparseInstanceNorm(nn.Module):
    """Per-sample masked InstanceNorm (MinkowskiInstanceNorm, stem of the
    backbone, `me_resnet.py:22`)."""

    eps: float = 1e-5

    @nn.compact
    def __call__(self, st: SparseTensor) -> SparseTensor:
        c = st.num_channels
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        feats32 = st.feats.astype(jnp.float32)
        mask = st.valid[..., None].astype(jnp.float32)
        count = jnp.maximum(jnp.sum(mask, axis=1, keepdims=True), 1.0)  # [B,1,1]
        mean = jnp.sum(feats32 * mask, axis=1, keepdims=True) / count
        var = jnp.sum(((feats32 - mean) ** 2) * mask, axis=1, keepdims=True) / count
        out = (feats32 - mean) / jnp.sqrt(var + self.eps) * scale + bias
        out = jnp.where(st.valid[..., None], out, 0.0).astype(st.feats.dtype)
        return st.with_feats(out)


def fold_bn_inference() -> bool:
    """Inference-time BN folding into the conv kernels' fused epilogue
    (default ON; FCAF3D_FOLD_BN=0 reverts to separate BN/activation passes,
    e.g. for A/B or numerics triage). Training always uses separate BN."""
    import os

    return os.environ.get("FCAF3D_FOLD_BN", "1") != "0"


def sparse_relu(st: SparseTensor) -> SparseTensor:
    return st.with_feats(jnp.maximum(st.feats, 0.0))


def sparse_elu(st: SparseTensor) -> SparseTensor:
    out = jnp.where(st.feats > 0, st.feats, jnp.expm1(st.feats))
    out = jnp.where(st.valid[..., None], out, 0.0)
    return st.with_feats(out)


def sparse_pool2x2(st: SparseTensor, out_budget: Optional[int] = None) -> SparseTensor:
    return sparse_max_pool(st, kernel_size=2, stride=2, out_budget=out_budget)


class SparseBasicBlock(nn.Module):
    """ME `resnet_block.BasicBlock`: conv3(stride)-BN-ReLU-conv3-BN (+skip).

    When `stride != 1` or channels change, the skip is conv1(stride)+BN —
    the `downsample` branch of `me_resnet.py:52-64`.
    """

    planes: int
    stride: int = 1
    out_budget: Optional[int] = None

    @nn.compact
    def __call__(
        self,
        st: SparseTensor,
        train: bool = False,
        plans=None,
    ) -> SparseTensor:
        """`plans` is an optional (plan_conv1, plan_conv2, plan_downsample)
        triple of precomputed `conv_plan`s (see me_resnet stage sharing)."""
        from ..ops.sparse.conv import ConvEpilogue

        p1, p2, pds = plans if plans is not None else (None, None, None)
        conv1 = SparseConv(
            self.planes, 3, stride=self.stride, out_budget=self.out_budget,
            name="conv1",
        )
        bn1 = SparseBatchNorm(name="norm1")
        conv2 = SparseConv(self.planes, 3, name="conv2")
        bn2 = SparseBatchNorm(name="norm2")
        has_ds = self.stride != 1 or st.num_channels != self.planes
        if has_ds:
            conv_ds = SparseConv(
                self.planes, 1, stride=self.stride,
                out_budget=self.out_budget, name="downsample_conv",
            )
            bn_ds = SparseBatchNorm(name="downsample_norm")

        if not train and fold_bn_inference():
            # inference: BN affines + activations (+ the residual add) run
            # in the conv kernels' fused epilogue — zero separate
            # elementwise HBM passes for the whole block
            inv1, sh1 = bn1(None, features=self.planes)
            inv2, sh2 = bn2(None, features=self.planes)
            out = conv1(st, plan=p1, epilogue=ConvEpilogue(inv1, sh1, "relu"))
            if has_ds:
                invd, shd = bn_ds(None, features=self.planes)
                residual = conv_ds(
                    st, plan=pds, epilogue=ConvEpilogue(invd, shd, None))
            else:
                residual = st
            return conv2(
                out, plan=p2,
                epilogue=ConvEpilogue(inv2, sh2, "relu", add=residual.feats),
            )

        residual = st
        out = conv1(st, plan=p1)
        out = bn1(out, train)
        out = sparse_relu(out)
        out = conv2(out, plan=p2)
        out = bn2(out, train)

        if has_ds:
            residual = conv_ds(st, plan=pds)
            residual = bn_ds(residual, train)

        # strided main/skip paths produce the identical (sorted) coord map
        out = out.with_feats(out.feats + residual.feats)
        return sparse_relu(out)


class SparseBottleneck(nn.Module):
    """ME `resnet_block.Bottleneck` (expansion 4): conv1x1-BN-ReLU ->
    conv3(stride)-BN-ReLU -> conv1x1(4*planes)-BN (+skip), used by the
    reference's depth-50/101 backbones (`me_resnet.py:113-118`)."""

    planes: int
    stride: int = 1
    out_budget: Optional[int] = None
    expansion: int = 4

    @nn.compact
    def __call__(
        self,
        st: SparseTensor,
        train: bool = False,
        plans=None,
    ) -> SparseTensor:
        """`plans` = (plan_conv2, _, plan_downsample); conv1/conv3 are k1
        on unchanged maps and need no plan."""
        from ..ops.sparse.conv import ConvEpilogue

        p2, _, pds = plans if plans is not None else (None, None, None)
        out_ch = self.planes * self.expansion
        conv1 = SparseConv(self.planes, 1, name="conv1")
        bn1 = SparseBatchNorm(name="norm1")
        conv2 = SparseConv(
            self.planes, 3, stride=self.stride, out_budget=self.out_budget,
            name="conv2",
        )
        bn2 = SparseBatchNorm(name="norm2")
        conv3 = SparseConv(out_ch, 1, name="conv3")
        bn3 = SparseBatchNorm(name="norm3")
        has_ds = self.stride != 1 or st.num_channels != out_ch
        if has_ds:
            conv_ds = SparseConv(
                out_ch, 1, stride=self.stride, out_budget=self.out_budget,
                name="downsample_conv",
            )
            bn_ds = SparseBatchNorm(name="downsample_norm")

        if not train and fold_bn_inference():
            inv1, sh1 = bn1(None, features=self.planes)
            inv2, sh2 = bn2(None, features=self.planes)
            inv3, sh3 = bn3(None, features=out_ch)
            out = conv1(st, epilogue=ConvEpilogue(inv1, sh1, "relu"))
            out = conv2(out, plan=p2, epilogue=ConvEpilogue(inv2, sh2, "relu"))
            if has_ds:
                invd, shd = bn_ds(None, features=out_ch)
                residual = conv_ds(
                    st, plan=pds, epilogue=ConvEpilogue(invd, shd, None))
            else:
                residual = st
            return conv3(
                out, epilogue=ConvEpilogue(inv3, sh3, "relu",
                                           add=residual.feats))

        residual = st
        out = conv1(st)
        out = bn1(out, train)
        out = sparse_relu(out)
        out = conv2(out, plan=p2)
        out = bn2(out, train)
        out = sparse_relu(out)
        out = conv3(out)
        out = bn3(out, train)

        if has_ds:
            residual = conv_ds(st, plan=pds)
            residual = bn_ds(residual, train)

        out = out.with_feats(out.feats + residual.feats)
        return sparse_relu(out)


class SparseGenConv3(nn.Module):
    """k3 s1 conv on a parent-major generated child map via block gathers
    (`gen_gather_gemm`) — same math as SparseConv with the analytic plan,
    ~8x fewer gather transactions. Param layout matches SparseConv."""

    out_channels: int
    kernel_init: Callable = _kaiming_kernel_init

    @nn.compact
    def __call__(self, child: SparseTensor, parent_kmap) -> SparseTensor:
        w = self.param(
            "kernel", self.kernel_init, (27, child.num_channels, self.out_channels)
        ).astype(child.feats.dtype)
        out = gen_gather_gemm(child.feats, parent_kmap, w)
        out = jnp.where(child.valid[..., None], out, 0.0)
        return child.with_feats(out)
