"""Sparse 3D ResNet backbone (HDResNet), TPU-native.

Equivalent of the reference's `MEResNet3D`
(`/root/reference/mmdet3d/models/backbones/me_resnet.py`): stem =
conv3x3 s2 -> InstanceNorm -> ReLU -> maxpool2x2 s2, then up to four
BasicBlock stages, each opening with stride 2. `n_outs` truncates stages for
the 2-/3-scale fast variants. Output tensor strides: 8, 16, 32, 64.

Row budgets: XLA needs static shapes, so each downsampling level carries a
configured voxel capacity (`budgets`, one per stride 2/4/8/16/32/64 map).
"""
from __future__ import annotations

from typing import Sequence, Tuple

from flax import linen as nn

from ..ops.sparse.conv import (
    build_kernel_map,
    build_kernel_map_self,
    conv_plan,
    kernel_offsets,
)
from ..ops.sparse.tensor import SparseTensor
from .blocks import (
    SparseBasicBlock,
    maybe_remat,
    SparseBatchNorm,
    SparseBottleneck,
    SparseConv,
    SparseInstanceNorm,
    sparse_pool2x2,
    sparse_relu,
)

# depth -> (block layers, bottleneck?) (reference `me_resnet.py:104-121`)
DEPTH_LAYERS = {
    14: ((1, 1, 1, 1), False),
    18: ((2, 2, 2, 2), False),
    34: ((3, 4, 6, 3), False),
    50: ((4, 3, 6, 3), True),
    101: ((3, 4, 23, 3), True),
}
PLANES = (64, 128, 256, 512)
INIT_DIM = 64


class MEResNet3D(nn.Module):
    """HDResNet backbone over the sparse engine.

    Attributes:
        depth: 14/18/34 (BasicBlock) or 50/101 (Bottleneck, expansion 4).
        n_outs: number of output scales (1-4).
        budgets: row capacity per downsample level, ordered by stride
            (2, 4, 8, 16, 32, 64) — six entries regardless of n_outs.
    """

    depth: int = 34
    n_outs: int = 4
    budgets: Sequence[int] = (65536, 32768, 24576, 8192, 3072, 1024)

    @nn.compact
    def __call__(
        self, st: SparseTensor, train: bool = False
    ) -> Tuple[SparseTensor, ...]:
        layers, bottleneck = DEPTH_LAYERS[self.depth]
        block_cls = SparseBottleneck if bottleneck else SparseBasicBlock
        b2, b4, b8, b16, b32, b64 = self.budgets
        x = SparseConv(INIT_DIM, 3, stride=2, out_budget=b2, name="conv1")(st)
        x = SparseInstanceNorm(name="norm1")(x)
        x = sparse_relu(x)
        x = sparse_pool2x2(x, out_budget=b4)

        outs = []
        stage_budgets = (b8, b16, b32, b64)
        for i in range(self.n_outs):
            # one kernel map per coordinate map, shared by every conv of the
            # stage (kernel-map building dominates sparse-conv cost on TPU)
            plan_s2 = conv_plan(x, 3, 2, stage_budgets[i])
            out_coords, out_keys, _, drop = plan_s2
            plan_ds = (out_coords, out_keys, build_kernel_map(
                x.keys, out_coords, kernel_offsets(1, x.stride)), drop)
            # self kernel map: offset symmetry halves the binary searches
            plan_s1 = (out_coords, out_keys, build_kernel_map_self(
                out_keys, out_coords, x.stride * 2), drop)
            # remat each block: recompute activations in the backward pass
            block0 = maybe_remat(block_cls, static_argnums=(2,))(
                PLANES[i], stride=2, out_budget=stage_budgets[i],
                name=f"layer{i + 1}_0")
            x = block0(x, train, (plan_s2, plan_s1, plan_ds))
            for j in range(1, layers[i]):
                blk = maybe_remat(block_cls, static_argnums=(2,))(
                    PLANES[i], name=f"layer{i + 1}_{j}")
                x = blk(x, train, (plan_s1, plan_s1, None))
            outs.append(x)
        return tuple(outs)
