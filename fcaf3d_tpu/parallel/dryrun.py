"""Multi-chip dry-run worker: one full data-parallel train step on an
`n_devices` mesh of virtual CPU devices.

This is the subprocess target of `__graft_entry__.dryrun_multichip`. The
virtual-device XLA flag must be set before the first jax backend
initialization, and the parent process has typically already imported jax
(often with a real TPU plugin attached), so the dry run executes in a
fresh interpreter whose environment the parent controls. Validates the
exact production code path: `make_train_step` over `data_mesh`
(psum'd gradients/statistics — the TPU-native analog of the reference's
NCCL DDP, `/root/reference/tools/dist_train.sh`, SURVEY.md §2.3).

Verified to run on a single-core host (8 device threads oversubscribing
one CPU): XLA CPU collective rendezvous is preemptively scheduled, not
spin-locked, so oversubscription is slow (~minutes of compile) but sound.
"""
from __future__ import annotations

import os
import subprocess
import sys


def run(n_devices: int) -> None:
    """Body of the dry run. Requires `n_devices` jax devices to exist.

    Phases, in order of importance: (1) FCAF3D DP train step — REQUIRED;
    (2) mesh-sharded eval forward; (3) VoteNet-v2 DP train step. XLA-CPU
    compile of the sparse model dominates wall time (minutes cold on a
    1-core host), so phases 2-3 only start while inside the time budget
    (`FCAF3D_DRYRUN_BUDGET` seconds, default 360): a slow host degrades to
    fewer phases instead of an rc=124 timeout that validates nothing.
    """
    import time

    t_start = time.time()
    budget = float(os.environ.get("FCAF3D_DRYRUN_BUDGET", "300"))
    import jax

    # Belt and braces: if a TPU plugin is attached in this interpreter,
    # force the host platform (env JAX_PLATFORMS alone is not honored once
    # a plugin registers itself).
    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass

    import jax.numpy as jnp
    import numpy as np

    from fcaf3d_tpu.utils import setup_compilation_cache

    setup_compilation_cache()

    from fcaf3d_tpu.configs import fcaf3d_nano
    from fcaf3d_tpu.parallel import data_mesh
    from fcaf3d_tpu.train import create_train_state, make_optimizer, make_train_step

    devices = jax.devices()[:n_devices]
    assert len(devices) == n_devices, (
        f"need {n_devices} devices, have {jax.devices()} "
        "(xla_force_host_platform_device_count not applied?)"
    )
    mesh = data_mesh(devices)

    cfg = fcaf3d_nano()
    tx = make_optimizer(lr=cfg.lr, weight_decay=cfg.weight_decay,
                        grad_clip=cfg.grad_clip, steps_per_epoch=10,
                        lr_steps=cfg.lr_steps)
    model, state = create_train_state(cfg, jax.random.PRNGKey(0), tx)
    step = make_train_step(model, cfg, tx, mesh=mesh)

    rng = np.random.RandomState(0)
    b, p, g = n_devices, cfg.num_points, cfg.max_gt_boxes
    boxes = np.zeros((b, g, 7), np.float32)
    boxes[..., :3] = rng.uniform(0.5, 1.5, (b, g, 3))
    boxes[..., 2] = 0.0
    boxes[..., 3:6] = rng.uniform(0.3, 0.8, (b, g, 3))
    batch = {
        "points": jnp.asarray(rng.uniform(0, 2.0, (b, p, 3)).astype(np.float32)),
        "colors": jnp.asarray(rng.uniform(0, 255.0, (b, p, 3)).astype(np.float32)),
        "valid": jnp.ones((b, p), bool),
        "gt_boxes": jnp.asarray(boxes),
        "gt_labels": jnp.asarray(rng.randint(0, cfg.n_classes, (b, g)).astype(np.int32)),
        "gt_valid": jnp.ones((b, g), bool),
    }
    state, metrics = step(state, batch)
    loss = float(metrics["loss"])
    assert np.isfinite(loss), metrics
    print(f"dryrun_multichip({n_devices}): fcaf3d DP step ok, loss={loss:.4f}",
          flush=True)

    if time.time() - t_start > budget:
        print(f"dryrun_multichip({n_devices}): eval/votenet phases skipped "
              f"(over {budget:.0f}s budget)", flush=True)
        return

    # --- sharded evaluation path (multi_gpu_test analog): the jitted
    # inference forward with batch sharded over the data mesh
    from ..models.detector import infer_config
    from ..models.fcaf3d_head import fcaf3d_get_bboxes
    from ..parallel.mesh import replicate, shard_batch

    tcfg = infer_config(cfg)
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    def infer_fn(variables, points, colors, valid):
        outs = model.apply(variables, points, colors, valid, train=False)
        return fcaf3d_get_bboxes(outs, tcfg)

    infer = jax.jit(
        infer_fn,
        in_shardings=(replicate(mesh), shard_batch(mesh), shard_batch(mesh),
                      shard_batch(mesh)),
        out_shardings=replicate(mesh),
    )
    dets = infer(variables, batch["points"], batch["colors"], batch["valid"])
    assert np.all(np.isfinite(np.asarray(dets.scores))), "sharded eval NaN"
    print(f"dryrun_multichip({n_devices}): sharded eval ok, "
          f"{int(np.asarray(dets.valid).sum())} detections", flush=True)

    if time.time() - t_start > budget:
        print(f"dryrun_multichip({n_devices}): votenet phase skipped "
              f"(over {budget:.0f}s budget)", flush=True)
        return

    # --- VoteNet-v2 DP step (PointNet++ backbone + Mobius vote head)
    from ..configs.votenet import votenet_tiny
    from ..models.votenet import VoteNet
    from ..train.trainer import TrainState, make_votenet_train_step

    vcfg = votenet_tiny()
    vmodel = VoteNet(
        n_classes=vcfg.n_classes, num_proposal=vcfg.num_proposal,
        backbone_num_points=vcfg.backbone_num_points,
    )
    vpts = jnp.asarray(
        rng.uniform(0, 2.0, (n_devices, vcfg.num_points, 4)).astype(np.float32))
    vvars = jax.jit(lambda k, p: vmodel.init(k, p, train=False))(
        jax.random.PRNGKey(0), vpts)
    vtx = make_optimizer(lr=1e-3)
    vstate = TrainState(
        step=jnp.zeros((), jnp.int32), params=vvars["params"],
        batch_stats=vvars.get("batch_stats", {}),
        opt_state=vtx.init(vvars["params"]),
    )
    vstep = make_votenet_train_step(vmodel, vcfg, vtx, mesh=mesh)
    g = vcfg.max_gt_boxes
    vboxes = np.zeros((n_devices, g, 7), np.float32)
    vboxes[..., :3] = rng.uniform(0.5, 1.5, (n_devices, g, 3))
    vboxes[..., 2] = 0.0
    vboxes[..., 3:6] = rng.uniform(0.3, 0.8, (n_devices, g, 3))
    vbatch = {
        "points": vpts,
        "gt_boxes": jnp.asarray(vboxes),
        "gt_labels": jnp.asarray(
            rng.randint(0, vcfg.n_classes, (n_devices, g)).astype(np.int32)),
        "gt_valid": jnp.ones((n_devices, g), bool),
    }
    vstate, vmetrics = vstep(vstate, vbatch)
    vloss = float(vmetrics["loss"])
    assert np.isfinite(vloss), vmetrics
    print(f"dryrun_multichip({n_devices}): votenet DP step ok, "
          f"loss={vloss:.4f}", flush=True)


def spawn(n_devices: int) -> None:
    """Run `run(n_devices)` in a fresh interpreter with the virtual CPU
    mesh provisioned via environment, regardless of the parent's jax state."""
    repo_root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    env = dict(os.environ)
    flags = env.get("XLA_FLAGS", "")
    # Replace any existing device-count flag with ours.
    flags = " ".join(f for f in flags.split()
                     if "xla_force_host_platform_device_count" not in f)
    env["XLA_FLAGS"] = (flags + f" --xla_force_host_platform_device_count={n_devices}").strip()
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [sys.executable, "-m", "fcaf3d_tpu.parallel.dryrun", str(n_devices)],
        env=env, cwd=repo_root,
    )
    if proc.returncode != 0:
        raise RuntimeError(f"dryrun_multichip worker failed (rc={proc.returncode})")


if __name__ == "__main__":
    run(int(sys.argv[1]) if len(sys.argv) > 1 else 8)
