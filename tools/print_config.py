#!/usr/bin/env python
"""Print a resolved config (reference `tools/misc/print_config.py`)."""
import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config", choices=[
        "fcaf3d_scannet", "fcaf3d_sunrgbd", "fcaf3d_s3dis", "fcaf3d_tiny",
        "fcaf3d_nano", "votenet_sunrgbd"])
    args = ap.parse_args()

    from fcaf3d_tpu import configs as C
    from fcaf3d_tpu.configs.votenet import votenet_sunrgbd

    fns = {
        "fcaf3d_scannet": C.fcaf3d_scannet, "fcaf3d_sunrgbd": C.fcaf3d_sunrgbd,
        "fcaf3d_s3dis": C.fcaf3d_s3dis, "fcaf3d_tiny": C.fcaf3d_tiny,
        "fcaf3d_nano": C.fcaf3d_nano, "votenet_sunrgbd": votenet_sunrgbd,
    }
    print(json.dumps(dataclasses.asdict(fns[args.config]()), indent=2))


if __name__ == "__main__":
    main()
