"""Inference BN-folding equivalence: the fused conv-epilogue path
(FCAF3D_FOLD_BN=1, default) must match separate BN/activation passes
(FCAF3D_FOLD_BN=0) on the full FCAF3D eval forward.

The fold rewrites `(x - mean) * inv + bias` as `x * inv + (bias - mean*inv)`
and runs it (plus ReLU/ELU and the residual add) inside the conv kernel's
output write, so only float-associativity noise is allowed.
"""
import os

import jax
import numpy as np
import pytest

from fcaf3d_tpu.configs import fcaf3d_tiny
from fcaf3d_tpu.models import FCAF3D

from test_fcaf3d_model import synth_batch

pytestmark = pytest.mark.slow


def _forward(fold: bool, variables, pts, colors, valid):
    os.environ["FCAF3D_FOLD_BN"] = "1" if fold else "0"
    try:
        model = FCAF3D(fcaf3d_tiny())

        def fwd(v, p, c, m):
            return model.apply(v, p, c, m, train=False)

        return jax.jit(fwd)(variables, pts, colors, valid)
    finally:
        os.environ.pop("FCAF3D_FOLD_BN", None)


def test_folded_inference_matches_unfolded():
    rng = np.random.RandomState(3)
    pts, colors, valid, *_ = synth_batch(rng)
    os.environ["FCAF3D_FOLD_BN"] = "0"
    try:
        model = FCAF3D(fcaf3d_tiny())
        variables = jax.jit(model.init)(jax.random.PRNGKey(0), pts, colors, valid)
    finally:
        os.environ.pop("FCAF3D_FOLD_BN", None)
    # make running stats non-trivial so the fold actually moves values
    import jax.numpy as jnp

    def perturb(path, x):
        name = "/".join(str(p) for p in path)
        if name.endswith("mean"):
            return x + 0.1 * jnp.arange(x.shape[0], dtype=x.dtype) / x.shape[0]
        if name.endswith("var"):
            return x * (1.0 + 0.05 * jnp.arange(x.shape[0], dtype=x.dtype) / x.shape[0])
        return x

    from flax.traverse_util import flatten_dict, unflatten_dict

    stats = flatten_dict(variables["batch_stats"])
    stats = {k: perturb(k, v) for k, v in stats.items()}
    variables = dict(variables, batch_stats=unflatten_dict(stats))

    ref = _forward(False, variables, pts, colors, valid)
    got = _forward(True, variables, pts, colors, valid)
    assert len(ref) == len(got)
    for i, (r, g) in enumerate(zip(ref, got)):
        assert np.array_equal(np.asarray(r.valid), np.asarray(g.valid)), i
        for field in ("centerness", "bbox_pred", "cls_scores"):
            a = np.asarray(getattr(r, field))
            b = np.asarray(getattr(g, field))
            np.testing.assert_allclose(a, b, rtol=2e-2, atol=2e-3,
                                       err_msg=f"level {i} {field}")
