"""PointNet++ set-abstraction / feature-propagation modules + SASSG backbone.

Clean-room equivalents of the reference's `BasePointSAModule`/`PointSAModule`
(`/root/reference/mmdet3d/ops/pointnet_modules/point_sa_module.py`),
`PointFPModule` (`point_fp_module.py`) and `PointNet2SASSG`
(`models/backbones/pointnet2_sa_ssg.py`), channel-last layout [B, N, C].
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..ops.pointnet import (
    ball_query,
    furthest_point_sample,
    gather_points,
    group_points,
    three_interpolate,
    three_nn,
)


class DenseBNReLU(nn.Module):
    """1x1 conv (dense over last dim) + BN + ReLU — the reference's
    ConvModule(Conv2d/1d 1x1, BN, ReLU)."""

    features: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Dense(self.features, use_bias=True)(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5
        )(x)
        return nn.relu(x)


class PointSAModule(nn.Module):
    """Single-scale-grouping set abstraction: FPS -> ball query -> shared
    MLP -> max pool. `use_xyz` concatenates radius-normalized relative xyz."""

    num_point: int
    radius: float
    num_sample: int
    mlp_channels: Sequence[int]
    use_xyz: bool = True
    normalize_xyz: bool = True

    @nn.compact
    def __call__(
        self,
        xyz: jnp.ndarray,  # [B, N, 3]
        features: Optional[jnp.ndarray],  # [B, N, C] or None
        valid: Optional[jnp.ndarray] = None,  # [B, N]
        indices: Optional[jnp.ndarray] = None,  # [B, M] pre-sampled
        target_xyz: Optional[jnp.ndarray] = None,  # [B, M, 3]
        train: bool = False,
    ):
        if target_xyz is not None:
            new_xyz = target_xyz
            indices = jnp.zeros(target_xyz.shape[:2], jnp.int32)
        else:
            if indices is None:
                indices = furthest_point_sample(xyz, self.num_point, valid)
            new_xyz = gather_points(xyz, indices)

        idx = ball_query(new_xyz, xyz, self.radius, self.num_sample, valid)
        grouped_xyz = group_points(xyz, idx) - new_xyz[:, :, None, :]
        if self.normalize_xyz:
            grouped_xyz = grouped_xyz / self.radius
        if features is not None:
            grouped = group_points(features, idx)
            if self.use_xyz:
                grouped = jnp.concatenate([grouped_xyz, grouped], axis=-1)
        else:
            grouped = grouped_xyz

        x = grouped
        for i, ch in enumerate(self.mlp_channels):
            x = DenseBNReLU(ch, name=f"mlp{i}")(x, train)
        new_features = jnp.max(x, axis=2)  # [B, M, C']
        return new_xyz, new_features, indices


class PointFPModule(nn.Module):
    """Feature propagation: 3-NN inverse-distance interpolation + MLP."""

    mlp_channels: Sequence[int]

    @nn.compact
    def __call__(
        self,
        target_xyz: jnp.ndarray,  # [B, M, 3]
        source_xyz: jnp.ndarray,  # [B, S, 3]
        target_feats: Optional[jnp.ndarray],  # [B, M, C1]
        source_feats: jnp.ndarray,  # [B, S, C2]
        train: bool = False,
    ) -> jnp.ndarray:
        dist, idx = three_nn(target_xyz, source_xyz)
        interp = three_interpolate(source_feats, idx, dist)  # [B, M, C2]
        if target_feats is not None:
            x = jnp.concatenate([interp, target_feats], axis=-1)
        else:
            x = interp
        for i, ch in enumerate(self.mlp_channels):
            x = DenseBNReLU(ch, name=f"mlp{i}")(x, train)
        return x


class PointNet2SASSG(nn.Module):
    """PointNet++ SSG backbone (reference `pointnet2_sa_ssg.py:10-142`).

    Input: points [B, N, 3 + in_feat_dims]. Returns a dict with fp_xyz /
    fp_features / fp_indices lists (deepest first), matching the reference.
    """

    num_points: Sequence[int] = (2048, 1024, 512, 256)
    radius: Sequence[float] = (0.2, 0.4, 0.8, 1.2)
    num_samples: Sequence[int] = (64, 32, 16, 16)
    sa_channels: Sequence[Sequence[int]] = (
        (64, 64, 128), (128, 128, 256), (128, 128, 256), (128, 128, 256))
    fp_channels: Sequence[Sequence[int]] = ((256, 256), (256, 256))

    @nn.compact
    def __call__(self, points: jnp.ndarray, valid=None, train: bool = False):
        xyz = points[..., :3]
        features = points[..., 3:] if points.shape[-1] > 3 else None
        b, n = xyz.shape[:2]
        indices = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[None], (b, n))

        sa_xyz, sa_features, sa_indices = [xyz], [features], [indices]
        sa_valid = valid
        for i in range(len(self.sa_channels)):
            cur_xyz, cur_features, cur_indices = PointSAModule(
                num_point=self.num_points[i],
                radius=self.radius[i],
                num_sample=self.num_samples[i],
                mlp_channels=self.sa_channels[i],
                name=f"sa{i}",
            )(sa_xyz[i], sa_features[i], valid=sa_valid, train=train)
            sa_xyz.append(cur_xyz)
            sa_features.append(cur_features)
            sa_indices.append(
                jnp.take_along_axis(sa_indices[-1], cur_indices, axis=1)
            )
            sa_valid = None  # sampled levels are fully valid

        num_sa = len(self.sa_channels)
        fp_xyz = [sa_xyz[-1]]
        fp_features = [sa_features[-1]]
        fp_indices = [sa_indices[-1]]
        for i in range(len(self.fp_channels)):
            fp_features.append(
                PointFPModule(self.fp_channels[i], name=f"fp{i}")(
                    sa_xyz[num_sa - i - 1],
                    sa_xyz[num_sa - i],
                    sa_features[num_sa - i - 1],
                    fp_features[-1],
                    train=train,
                )
            )
            fp_xyz.append(sa_xyz[num_sa - i - 1])
            fp_indices.append(sa_indices[num_sa - i - 1])

        return dict(
            fp_xyz=fp_xyz,
            fp_features=fp_features,
            fp_indices=fp_indices,
            sa_xyz=sa_xyz,
            sa_features=sa_features,
            sa_indices=sa_indices,
        )
