"""ImVoteNet stage-2 smoke tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fcaf3d_tpu.models.imvotenet import (
    ImVoteNet,
    imvotenet_loss,
    sample_valid_seeds,
    vote_fusion,
)

pytestmark = pytest.mark.slow  # model/engine compile-heavy (two-lane suite)


def test_sample_valid_seeds_cycles():
    mask = jnp.asarray([False, True, False, True, False])
    idx = np.asarray(sample_valid_seeds(mask, 6))
    # valid indices are 1, 3; first two picks are them, rest cycle
    assert idx[0] == 1 and idx[1] == 3
    assert all(i in (1, 3) for i in idx[2:])


def test_vote_fusion_cues():
    rng = np.random.RandomState(0)
    h, w, c = 32, 48, 4
    image = jnp.asarray(rng.uniform(0, 255, (h, w, 3)).astype(np.float32))
    # K @ axis-permutation (depth y = camera forward), SUN RGB-D convention
    k_mat = np.array([[20.0, 0, 24.0], [0, 20.0, 16.0], [0, 0, 1.0]], np.float32)
    perm = np.array([[1, 0, 0], [0, 0, -1], [0, 1, 0]], np.float32)
    depth2img = jnp.asarray(k_mat @ perm)
    seeds = jnp.asarray(
        np.stack([rng.uniform(-0.5, 0.5, 8), np.full(8, 2.0),
                  rng.uniform(-0.3, 0.3, 8)], 1).astype(np.float32)
    )
    # NOTE seeds projected with z = row2 . xyz; build a box covering the image
    boxes = jnp.asarray(
        np.array([[0, 0, 48, 32, 0.9, 2], [0, 0, 0, 0, 0, 0]], np.float32)
    )
    bvalid = jnp.asarray([True, False])
    cues, mask = vote_fusion(image, boxes, bvalid, seeds, depth2img, c, 3)
    assert cues.shape == (8 * 3, 5 + c + 3)
    assert mask.shape == (24,)
    m = np.asarray(mask).reshape(8, 3)
    # every seed projects inside the full-image box -> first vote valid
    assert m[:, 0].all()
    # semantic cue concentrated on class 2 with conf 0.9 for valid votes
    sem = np.asarray(cues).reshape(8, 3, -1)[:, 0, 5:9]
    np.testing.assert_allclose(sem[:, 2], 0.9, atol=1e-5)
    assert np.allclose(sem[:, [0, 1, 3]], 0)


@pytest.mark.parametrize("towers", [("joint",), ("joint", "pts", "img")])
def test_imvotenet_forward_and_loss(towers):
    rng = np.random.RandomState(0)
    b, n, s = 2, 256, 16
    model = ImVoteNet(
        n_classes=4, num_proposal=16, num_sampled_seed=32,
        backbone_num_points=(64, 32, 16, 8),
    )
    pts = jnp.asarray(rng.uniform(0, 3, (b, n, 4)).astype(np.float32))
    imgs = jnp.asarray(rng.uniform(0, 255, (b, 16, 24, 3)).astype(np.float32))
    boxes2d = jnp.asarray(
        np.tile(np.array([[0, 0, 24, 16, 0.8, 1]], np.float32), (b, 4, 1))
    )
    b2v = jnp.ones((b, 4), bool)
    d2i = jnp.broadcast_to(
        jnp.asarray(np.array([[10.0, 0, 12], [0, 10.0, 8], [0, 0, 1]], np.float32)),
        (b, 3, 3),
    )
    variables = jax.jit(
        lambda k: model.init(k, pts, imgs, boxes2d, b2v, None, d2i,
                             train=False, towers=towers)
    )(jax.random.PRNGKey(0))
    outs = jax.jit(
        lambda v: model.apply(v, pts, imgs, boxes2d, b2v, None, d2i,
                              train=False, towers=towers)
    )(variables)
    assert set(outs) == set(towers)
    for o in outs.values():
        assert o["bbox_preds"].shape == (b, 16, 7)
        assert np.all(np.isfinite(np.asarray(o["bbox_preds"])))

    if len(towers) == 3:
        g = 4
        gt = np.zeros((b, g, 7), np.float32)
        gt[..., :3] = rng.uniform(0.5, 2.5, (b, g, 3))
        gt[..., 3:6] = rng.uniform(0.3, 0.8, (b, g, 3))
        losses = imvotenet_loss(
            outs, pts, jnp.asarray(gt),
            jnp.asarray(rng.randint(0, 4, (b, g)).astype(np.int32)),
            jnp.ones((b, g), bool), n_classes=4,
        )
        assert any(k.startswith("joint_") for k in losses)
        for k, v in losses.items():
            assert np.isfinite(float(v)), k


def test_inference_imvotenet_api():
    """Multi-modality inference analog (`inference_multi_modality_detector`):
    raw cloud + image + 2D boxes + calib -> stripped detections."""
    import jax

    from fcaf3d_tpu.apis.inference import inference_imvotenet

    rng = np.random.RandomState(1)
    model = ImVoteNet(
        n_classes=4, num_proposal=16, num_sampled_seed=32,
        backbone_num_points=(64, 32, 16, 8),
    )
    n = 256
    pts1 = jnp.asarray(rng.uniform(0, 3, (1, n, 4)).astype(np.float32))
    img1 = jnp.asarray(rng.uniform(0, 255, (1, 16, 24, 3)).astype(np.float32))
    bx1 = jnp.asarray(np.array([[[0, 0, 24, 16, 0.8, 1]]], np.float32))
    bv1 = jnp.ones((1, 1), bool)
    d2i = jnp.asarray(
        np.array([[[10.0, 0, 12], [0, 10.0, 8], [0, 0, 1]]], np.float32))
    variables = jax.jit(
        lambda k: model.init(k, pts1, img1, bx1, bv1, None, d2i, train=False)
    )(jax.random.PRNGKey(0))

    cloud = rng.uniform(0, 3, (500, 6)).astype(np.float32)
    out = inference_imvotenet(
        model, variables, cloud, np.asarray(img1[0]),
        np.array([[0, 0, 24, 16, 0.8, 1]], np.float32),
        np.asarray(d2i[0]), num_points=n, n_classes=4,
    )
    assert set(out) == {"boxes_3d", "scores_3d", "labels_3d"}
    assert out["boxes_3d"].shape[1] == 7
    assert np.all(np.isfinite(out["boxes_3d"]))
    # empty 2D boxes also run (zero-imvote fallback path)
    out2 = inference_imvotenet(
        model, variables, cloud, np.asarray(img1[0]),
        np.zeros((0, 6), np.float32), np.asarray(d2i[0]),
        num_points=n, n_classes=4,
    )
    assert set(out2) == {"boxes_3d", "scores_3d", "labels_3d"}
