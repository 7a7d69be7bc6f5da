"""Checkpoint converter: reference-named state_dict -> framework trees."""
import sys

import jax
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # model/engine compile-heavy (two-lane suite)

sys.path.insert(0, "tools")

from convert_checkpoint import convert, me_offset_permutation  # noqa: E402

from fcaf3d_tpu.configs import fcaf3d_tiny  # noqa: E402


def make_reference_state_dict(n_classes=4, n_reg=6, layers=(3, 4, 6, 3)):
    """Synthesize a state_dict with the reference's exact module names and
    MinkowskiEngine tensor shapes (kernels [K^3, Cin, Cout])."""
    rng = np.random.RandomState(0)
    sd = {}

    def conv(name, k, cin, cout):
        sd[name] = rng.randn(k, cin, cout).astype(np.float32)

    def bn(prefix, c):
        sd[f"{prefix}.weight"] = np.ones(c, np.float32)
        sd[f"{prefix}.bias"] = np.zeros(c, np.float32)
        sd[f"{prefix}.running_mean"] = np.zeros(c, np.float32)
        sd[f"{prefix}.running_var"] = np.ones(c, np.float32)

    conv("backbone.conv1.0.kernel", 27, 3, 64)
    sd["backbone.conv1.1.weight"] = np.ones(64, np.float32)
    sd["backbone.conv1.1.bias"] = np.zeros(64, np.float32)

    planes = (64, 128, 256, 512)
    inplanes = 64
    for i, n_blocks in enumerate(layers):
        for j in range(n_blocks):
            cin = inplanes if j == 0 else planes[i]
            src = f"backbone.layer{i + 1}.{j}"
            conv(f"{src}.conv1.kernel", 27, cin, planes[i])
            bn(f"{src}.norm1", planes[i])
            conv(f"{src}.conv2.kernel", 27, planes[i], planes[i])
            bn(f"{src}.norm2", planes[i])
            if j == 0:
                conv(f"{src}.downsample.0.kernel", 1, cin, planes[i])
                bn(f"{src}.downsample.1.bn", planes[i])
        inplanes = planes[i]

    h = "neck_with_head"
    in_ch = (64, 128, 256, 512)
    for i in range(1, 4):
        conv(f"{h}.up_block_{i}.0.kernel", 8, in_ch[i], in_ch[i - 1])
        bn(f"{h}.up_block_{i}.1.bn", in_ch[i - 1])
        conv(f"{h}.up_block_{i}.3.kernel", 27, in_ch[i - 1], in_ch[i - 1])
        bn(f"{h}.up_block_{i}.4.bn", in_ch[i - 1])
    for i in range(4):
        conv(f"{h}.out_block_{i}.0.kernel", 27, in_ch[i], 128)
        bn(f"{h}.out_block_{i}.1.bn", 128)
    conv(f"{h}.centerness_conv.kernel", 1, 128, 1)
    conv(f"{h}.reg_conv.kernel", 1, 128, n_reg)
    conv(f"{h}.cls_conv.kernel", 1, 128, n_classes)
    sd[f"{h}.cls_conv.bias"] = np.zeros(n_classes, np.float32)
    for i in range(4):
        sd[f"{h}.scales.{i}.scale"] = np.ones(1, np.float32)
    return sd


def test_offset_permutation_roundtrip():
    p = me_offset_permutation(3, "x_fastest")
    assert sorted(p.tolist()) == list(range(27))
    # center offset maps to center
    assert p[13] == 13
    # x-slowest order is identity
    np.testing.assert_array_equal(me_offset_permutation(3, "x_slowest"), np.arange(27))


def test_convert_matches_model_tree():
    import jax.numpy as jnp

    from fcaf3d_tpu.models import FCAF3D

    cfg = fcaf3d_tiny()  # depth 34, 4 classes, full channel widths
    model = FCAF3D(cfg)
    b, p = 1, cfg.num_points
    zeros = jnp.zeros((b, p, 3), jnp.float32)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), zeros, zeros, jnp.ones((b, p), bool)
    )

    sd = make_reference_state_dict(n_classes=cfg.n_classes, n_reg=cfg.n_reg_outs)
    out = convert(sd)

    expect_p = jax.tree_util.tree_map(lambda x: x.shape, variables["params"])
    got_p = jax.tree_util.tree_map(lambda x: x.shape, out["params"])
    assert expect_p == got_p
    expect_s = jax.tree_util.tree_map(lambda x: x.shape, variables["batch_stats"])
    got_s = jax.tree_util.tree_map(lambda x: x.shape, out["batch_stats"])
    assert expect_s == got_s

    # converted params run through the model
    outs = jax.jit(lambda v, a, c, m: model.apply(v, a, c, m))(
        {"params": jax.tree_util.tree_map(jnp.asarray, out["params"]),
         "batch_stats": jax.tree_util.tree_map(jnp.asarray, out["batch_stats"])},
        zeros + 1.0, zeros + 100.0, jnp.ones((b, p), bool),
    )
    assert np.all(np.isfinite(np.asarray(outs[0].cls_scores)))


def test_me_offset_order_impulse():
    """The converter's ME->ours kernel permutation, verified end to end by
    an impulse: ME convolution semantics are defined INDEPENDENTLY here as
    a dense conv whose kernel is assembled with ME's region enumeration
    (first coordinate fastest: k_me = (dx+1) + 3*(dy+1) + 9*(dz+1)), and the
    permuted weights through our sparse conv must reproduce it exactly.
    A wrong permutation (e.g. identity) must FAIL this test."""
    import jax
    import jax.numpy as jnp

    from fcaf3d_tpu.ops.sparse.conv import sparse_conv
    from fcaf3d_tpu.ops.sparse.tensor import SparseTensor, encode_coords, sort_rows

    rng = np.random.RandomState(0)
    # ME-layout weights [27, 1, 1]: value k at ME offset index k
    w_me = np.arange(27, dtype=np.float32).reshape(27, 1, 1) + 1.0

    # independent ME-semantics oracle: dense 3x3x3 kernel, x fastest
    w_dense = np.zeros((3, 3, 3, 1, 1), np.float32)  # [dx, dy, dz, ci, co]
    for dz in range(3):
        for dy in range(3):
            for dx in range(3):
                k_me = dx + 3 * dy + 9 * dz
                w_dense[dx, dy, dz, 0, 0] = w_me[k_me, 0, 0]

    # sparse occupancy with an impulse + random neighbors
    size = 6
    grid = rng.rand(size, size, size) < 0.5
    grid[2, 3, 1] = True
    coords = np.argwhere(grid).astype(np.int32)
    dense_in = np.zeros((1, size, size, size, 1), np.float32)
    feats = rng.randn(len(coords), 1).astype(np.float32)
    dense_in[0, coords[:, 0], coords[:, 1], coords[:, 2], 0] = feats[:, 0]

    # dense oracle: out(u) = sum_i w_dense[i] * in(u + offset_i), which as a
    # cross-correlation needs the kernel REVERSED for lax.conv semantics
    out_dense = jax.lax.conv_general_dilated(
        jnp.asarray(dense_in),
        jnp.asarray(w_dense),
        window_strides=(1, 1, 1),
        padding=((1, 1),) * 3,
        dimension_numbers=("NHWDC", "HWDIO", "NHWDC"),
    )

    # our sparse conv with the converter-permuted weights
    perm = me_offset_permutation(3, "x_fastest")
    w_ours = jnp.asarray(w_me[perm])
    cap = len(coords)
    cj = jnp.asarray(coords[None])
    keys = encode_coords(cj)
    cj, fj, keys = sort_rows(cj, jnp.asarray(feats[None]), keys)
    st = SparseTensor(coords=cj, feats=fj, keys=keys,
                      shift=jnp.zeros((1, 3), jnp.int32), stride=1)
    out = sparse_conv(st, w_ours, 3, 1)

    oc = np.asarray(out.coords[0])
    of = np.asarray(out.feats[0])
    expect = np.asarray(out_dense[0])
    for c, f in zip(oc, of):
        np.testing.assert_allclose(f[0], expect[c[0], c[1], c[2], 0],
                                   rtol=1e-5, atol=1e-5)

    # discriminating power: the identity (un-permuted) layout must NOT match
    out_wrong = sparse_conv(st, jnp.asarray(w_me), 3, 1)
    diffs = np.abs(np.asarray(out_wrong.feats[0]) - of)
    assert diffs.max() > 1.0


def test_cli_converts_real_torch_pth(tmp_path):
    """End-to-end through a REAL torch-serialized .pth: torch.save a
    reference-shaped checkpoint (state_dict + mmcv-style meta), run the
    tools/convert_checkpoint.py CLI, compare every leaf against the
    in-process convert(). Pins torch.load handling + tensor->numpy."""
    torch = pytest.importorskip("torch")
    import pickle
    import subprocess

    sd_np = make_reference_state_dict()
    sd_t = {k: torch.from_numpy(v.copy()) for k, v in sd_np.items()}
    pth = tmp_path / "epoch_12.pth"
    torch.save(
        {"state_dict": sd_t,
         "meta": {"CLASSES": ("a", "b", "c", "d"), "config": "cfg-text"}},
        str(pth),
    )
    out = tmp_path / "params.pkl"
    r = subprocess.run(
        [sys.executable, "tools/convert_checkpoint.py", "--pth", str(pth),
         "--out", str(out)],
        capture_output=True, text=True, cwd=".",
    )
    assert r.returncode == 0, r.stderr
    with open(out, "rb") as f:
        got = pickle.load(f)
    want = convert(sd_np)

    def leaves(tree, prefix=""):
        for k in sorted(tree):
            v = tree[k]
            if isinstance(v, dict):
                yield from leaves(v, f"{prefix}/{k}")
            else:
                yield f"{prefix}/{k}", v

    for (kp, a), (kq, b) in zip(leaves(got["params"]), leaves(want["params"])):
        assert kp == kq
        np.testing.assert_array_equal(a, b, err_msg=kp)
    for (kp, a), (kq, b) in zip(
        leaves(got["batch_stats"]), leaves(want["batch_stats"])
    ):
        assert kp == kq
        np.testing.assert_array_equal(a, b, err_msg=kp)


def _leaf_paths(tree, prefix=""):
    out = []
    for k in sorted(tree):
        v = tree[k]
        if isinstance(v, dict) or hasattr(v, "items"):
            out += _leaf_paths(dict(v), f"{prefix}/{k}")
        else:
            out.append((f"{prefix}/{k}", tuple(np.shape(v))))
    return out


def make_votenet_state_dict(rng, head_prefix="bbox_head",
                            backbone_prefix="backbone", in_feat=1,
                            n_classes=10, n_reg=7):
    """Reference-named VoteNet-v2 state_dict (`pointnet2_sa_ssg.py`,
    `vote_head_v2.py` module names; SUN RGB-D channel plan)."""
    sd = {}

    def convmod(name, cin, cout, conv_ndim=4):
        shape = (cout, cin) + (1,) * (conv_ndim - 2)
        sd[f"{name}.conv.weight"] = rng.randn(*shape).astype(np.float32) * 0.05
        sd[f"{name}.bn.weight"] = np.ones(cout, np.float32)
        sd[f"{name}.bn.bias"] = np.zeros(cout, np.float32)
        sd[f"{name}.bn.running_mean"] = np.zeros(cout, np.float32)
        sd[f"{name}.bn.running_var"] = np.ones(cout, np.float32)

    bb, hd = backbone_prefix, head_prefix
    sa_channels = ((64, 64, 128), (128, 128, 256), (128, 128, 256),
                   (128, 128, 256))
    cin = in_feat
    for i, chs in enumerate(sa_channels):
        c = cin + 3  # use_xyz
        for j, ch in enumerate(chs):
            convmod(f"{bb}.SA_modules.{i}.mlps.0.layer{j}", c, ch)
            c = ch
        cin = chs[-1]
    fp_channels = ((256, 256), (256, 256))
    fp_in = (256 + 256, 256 + 256)  # skip + prev
    for i, chs in enumerate(fp_channels):
        c = fp_in[i]
        for j, ch in enumerate(chs):
            convmod(f"{bb}.FP_modules.{i}.mlps.layer{j}", c, ch)
            c = ch
    for i, ch in enumerate((256, 256)):
        convmod(f"{hd}.vote_module.vote_conv.{i}", 256, ch, conv_ndim=3)
    sd[f"{hd}.vote_module.conv_out.weight"] = (
        rng.randn(3 + 256, 256, 1).astype(np.float32) * 0.05)
    sd[f"{hd}.vote_module.conv_out.bias"] = np.zeros(3 + 256, np.float32)
    c = 256 + 3
    for j, ch in enumerate((128, 128, 128)):
        convmod(f"{hd}.vote_aggregation.mlps.0.layer{j}", c, ch)
        c = ch
    for i, ch in enumerate((128, 128)):
        convmod(f"{hd}.conv_pred.shared_convs.layer{i}", c, ch, conv_ndim=3)
        c = ch
    sd[f"{hd}.conv_pred.conv_cls.weight"] = (
        rng.randn(n_classes + 2, 128, 1).astype(np.float32) * 0.05)
    sd[f"{hd}.conv_pred.conv_cls.bias"] = np.zeros(n_classes + 2, np.float32)
    sd[f"{hd}.conv_pred.conv_reg.weight"] = (
        rng.randn(n_reg, 128, 1).astype(np.float32) * 0.05)
    sd[f"{hd}.conv_pred.conv_reg.bias"] = np.zeros(n_reg, np.float32)
    return sd


def test_convert_votenet_tree_matches_and_runs():
    """convert_votenet output == VoteNet.init tree structure exactly, the
    kernel transpose is right, and the model runs with converted params."""
    import jax.numpy as jnp
    from flax.core import unfreeze

    from convert_checkpoint import convert_votenet

    from fcaf3d_tpu.models.votenet import VoteNet

    rng = np.random.RandomState(0)
    sd = make_votenet_state_dict(rng)
    out = convert_votenet(sd)

    model = VoteNet(n_classes=10, n_reg_outs=7, num_proposal=32,
                    backbone_num_points=(512, 256, 128, 64))
    pts = jnp.asarray(rng.randn(1, 2048, 4).astype(np.float32))
    variables = jax.jit(lambda k, x: model.init(k, x, train=False))(
        jax.random.PRNGKey(0), pts)

    want_p = _leaf_paths(unfreeze(variables)["params"])
    got_p = _leaf_paths(out["params"])
    assert got_p == want_p
    want_s = _leaf_paths(unfreeze(variables)["batch_stats"])
    got_s = _leaf_paths(out["batch_stats"])
    assert got_s == want_s

    # transpose pinned: torch [out, in, 1, 1] -> flax [in, out]
    np.testing.assert_array_equal(
        out["params"]["backbone"]["sa0"]["mlp0"]["Dense_0"]["kernel"],
        sd["backbone.SA_modules.0.mlps.0.layer0.conv.weight"][:, :, 0, 0].T)

    conv = {"params": jax.tree_util.tree_map(jnp.asarray, out["params"]),
            "batch_stats": jax.tree_util.tree_map(jnp.asarray,
                                                  out["batch_stats"])}
    preds = jax.jit(lambda v, x: model.apply(v, x, train=False))(conv, pts)
    assert np.all(np.isfinite(np.asarray(preds["bbox_preds"])))


def test_convert_imvotenet_tree_matches():
    """convert_imvotenet maps pts_backbone + joint tower + img_mlp onto the
    ImVoteNet tree (structure equality; the 2D branch is a documented
    non-convert, detector2d.py redesign)."""
    from flax.core import unfreeze
    import jax.numpy as jnp

    from convert_checkpoint import convert_imvotenet

    from fcaf3d_tpu.models.imvotenet import ImVoteNet

    rng = np.random.RandomState(1)
    sd = make_votenet_state_dict(rng, head_prefix="pts_bbox_head_joint",
                                 backbone_prefix="pts_backbone")
    # joint tower consumes seed(256) + img(256) features
    sd["pts_bbox_head_joint.vote_module.vote_conv.0.conv.weight"] = (
        rng.randn(256, 512, 1).astype(np.float32) * 0.05)
    for j, (cin, ch) in enumerate(((512 + 3, 128), (128, 128), (128, 128))):
        sd[f"pts_bbox_head_joint.vote_aggregation.mlps.0.layer{j}"
           ".conv.weight"] = rng.randn(ch, cin, 1, 1).astype(np.float32) * 0.05
    sd["pts_bbox_head_joint.vote_module.conv_out.weight"] = (
        rng.randn(3 + 512, 256, 1).astype(np.float32) * 0.05)
    sd["pts_bbox_head_joint.vote_module.conv_out.bias"] = np.zeros(
        3 + 512, np.float32)
    for i, (cin, ch) in enumerate(((18, 256), (256, 256))):
        sd[f"img_mlp.mlp.layer{i}.conv.weight"] = (
            rng.randn(ch, cin, 1).astype(np.float32) * 0.05)
        sd[f"img_mlp.mlp.layer{i}.bn.weight"] = np.ones(ch, np.float32)
        sd[f"img_mlp.mlp.layer{i}.bn.bias"] = np.zeros(ch, np.float32)
        sd[f"img_mlp.mlp.layer{i}.bn.running_mean"] = np.zeros(ch, np.float32)
        sd[f"img_mlp.mlp.layer{i}.bn.running_var"] = np.ones(ch, np.float32)
    out = convert_imvotenet(sd)

    net = ImVoteNet(n_classes=10, num_proposal=32,
                    backbone_num_points=(512, 256, 128, 64),
                    num_sampled_seed=128)
    b, p, h, w, d = 1, 2048, 60, 80, 4
    k = np.array([[52.9, 0, 36.5], [0, 52.9, 26.5], [0, 0, 1]], np.float32)
    variables = jax.jit(
        lambda key, pp, im, bx, bv, c: net.init(
            key, pp, im, bx, bv, depth2img=c, train=False,
            towers=("joint",)))(
        jax.random.PRNGKey(0),
        jnp.asarray(rng.randn(b, p, 4).astype(np.float32)),
        jnp.asarray(rng.rand(b, h, w, 3).astype(np.float32) * 255),
        jnp.asarray(np.array([[[1, 1, 30, 30, 0.9, 2]] * d], np.float32)),
        jnp.ones((b, d), bool),
        jnp.asarray(np.tile(k[None], (b, 1, 1))),
    )
    from flax.core import unfreeze as _uf
    want_p = _leaf_paths(_uf(variables)["params"])
    got_p = _leaf_paths(out["params"])
    assert got_p == want_p
