"""Train-step tests: single-device step, loss decrease, and 8-way data
parallelism on the virtual CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fcaf3d_tpu.configs import fcaf3d_tiny
from fcaf3d_tpu.parallel import data_mesh
from fcaf3d_tpu.train import create_train_state, make_optimizer, make_train_step
from tests.test_fcaf3d_model import synth_batch

pytestmark = pytest.mark.slow


def make_batch(b=2):
    rng = np.random.RandomState(42)
    pts, colors, valid, boxes, labels, gt_valid = synth_batch(rng, b=b)
    return {
        "points": pts,
        "colors": colors,
        "valid": valid,
        "gt_boxes": boxes,
        "gt_labels": labels,
        "gt_valid": gt_valid,
    }


def test_single_device_train_step_decreases_loss():
    cfg = fcaf3d_tiny()
    tx = make_optimizer(lr=1e-3, steps_per_epoch=100)
    model, state = create_train_state(cfg, jax.random.PRNGKey(0), tx)
    step = make_train_step(model, cfg, tx)
    batch = make_batch()
    state, m0 = step(state, batch)
    losses = [float(m0["loss"])]
    for _ in range(5):
        state, m = step(state, batch)
        losses.append(float(m["loss"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0], losses
    assert int(state.step) == 6
    assert float(m["grad_norm"]) > 0


def test_data_parallel_train_step_runs():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from fcaf3d_tpu.configs import fcaf3d_nano

    # nano model: CPU-mesh collective rendezvous is preemptively scheduled,
    # so this runs even on a single-core host with all 8 device threads
    # oversubscribing one CPU (slow but sound; verified on 1 core)
    cfg = fcaf3d_nano()
    tx = make_optimizer()
    model, state = create_train_state(cfg, jax.random.PRNGKey(0), tx)
    mesh = data_mesh(jax.devices()[:8])
    step = make_train_step(model, cfg, tx, mesh=mesh)
    rng = np.random.RandomState(42)
    pts, colors, valid, boxes, labels, gt_valid = synth_batch(
        rng, b=8, p=cfg.num_points, n_classes=cfg.n_classes, g=cfg.max_gt_boxes
    )
    batch = {
        "points": pts, "colors": colors, "valid": valid,
        "gt_boxes": boxes, "gt_labels": labels, "gt_valid": gt_valid,
    }
    state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    state, metrics2 = step(state, batch)
    assert np.isfinite(float(metrics2["loss"]))


def test_lr_schedule_steps():
    from fcaf3d_tpu.train import step_lr_schedule

    sched = step_lr_schedule(1e-3, steps_per_epoch=10, lr_steps=(8, 11))
    np.testing.assert_allclose(float(sched(0)), 1e-3)
    np.testing.assert_allclose(float(sched(79)), 1e-3)
    np.testing.assert_allclose(float(sched(80)), 1e-4, rtol=1e-5)
    np.testing.assert_allclose(float(sched(110)), 1e-5, rtol=1e-5)
