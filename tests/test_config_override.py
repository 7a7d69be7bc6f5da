"""`--set key=value` deep-override tests (reference `--cfg-options` analog,
`/root/reference/tools/train.py:58-67`)."""
import argparse
import dataclasses

import pytest

from fcaf3d_tpu.configs import (
    add_set_argument,
    apply_overrides,
    fcaf3d_scannet,
)


def test_scalar_overrides_with_type_coercion():
    cfg = fcaf3d_scannet()
    out = apply_overrides(cfg, ["voxel_size=0.02", "lr=1", "batch_size=8"])
    assert out.voxel_size == 0.02
    assert out.lr == 1.0 and isinstance(out.lr, float)
    assert out.batch_size == 8
    # original untouched (frozen dataclass replace semantics)
    assert cfg.voxel_size == 0.01


def test_tuple_bool_str_overrides():
    cfg = fcaf3d_scannet()
    out = apply_overrides(
        cfg, ["lr_steps=9,11", "with_yaw=true", "neck_mode=reference"])
    assert out.lr_steps == (9, 11)
    assert out.with_yaw is True
    assert out.neck_mode == "reference"
    # bare single value for a tuple field becomes a 1-tuple
    assert apply_overrides(cfg, ["lr_steps=(10,)"]).lr_steps == (10,)


def test_unknown_key_and_malformed():
    cfg = fcaf3d_scannet()
    with pytest.raises(KeyError):
        apply_overrides(cfg, ["not_a_field=3"])
    with pytest.raises(ValueError):
        apply_overrides(cfg, ["voxel_size"])


def test_nested_dataclass_path():
    @dataclasses.dataclass(frozen=True)
    class Inner:
        k: int = 1

    @dataclasses.dataclass(frozen=True)
    class Outer:
        inner: Inner = Inner()
        name: str = "x"

    out = apply_overrides(Outer(), ["inner.k=5", "name=y"])
    assert out.inner.k == 5 and out.name == "y"


def test_add_set_argument_parses():
    ap = argparse.ArgumentParser()
    add_set_argument(ap)
    ns = ap.parse_args(["--set", "lr=0.01", "lr_steps=8,11"])
    cfg = apply_overrides(fcaf3d_scannet(), ns.overrides)
    assert cfg.lr == 0.01 and cfg.lr_steps == (8, 11)
