"""Generate the shipped run configs under configs/.

Each config is the MINIMAL flat override set for one experiment: only the
fields that differ from fluidnexus_tpu.core.config defaults (which mirror the
reference's argparse defaults, FluidDynamics/arguments/__init__.py). Values
follow the reference's configs/fluid_nexus_*.json / scalar_real*.json
hyperparameters; the file layout (flat, sorted, minimal) is this repo's own.

Run:  python tools/make_configs.py [ref_configs_dir]
With a reference configs dir it derives the overrides by diffing each file
against the defaults; without one it refuses (configs are committed, so this
is a maintainer tool, not a runtime dependency).
"""
from __future__ import annotations

import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from fluidnexus_tpu.core.config import Config, load_config  # noqa: E402

# reference name -> shipped name (our own, shorter naming scheme)
NAME_MAP = {
    "fluid_nexus_smoke_background.json": "smoke_background.json",
    "fluid_nexus_smoke_dynamics.json": "smoke_dynamics.json",
    "fluid_nexus_smoke_dynamics_future.json": "smoke_dynamics_future.json",
    "fluid_nexus_smoke_dynamics_future_simulation.json": "smoke_future_simulation.json",
    "fluid_nexus_smoke_dynamics_wind.json": "smoke_dynamics_wind.json",
    "fluid_nexus_smoke_dynamics_wind_simulation.json": "smoke_wind_simulation.json",
    "fluid_nexus_ball_background.json": "ball_background.json",
    "fluid_nexus_ball_dynamics.json": "ball_dynamics.json",
    "fluid_nexus_ball_dynamics_future.json": "ball_dynamics_future.json",
    "fluid_nexus_ball_dynamics_future_simulation.json": "ball_future_simulation.json",
    "fluid_nexus_object.json": "object.json",
    "scalar_real.json": "scalar_dynamics.json",
    "scalar_real_future.json": "scalar_dynamics_future.json",
    "scalar_real_future_simulation.json": "scalar_future_simulation.json",
}


def config_diff(cfg: Config, base: Config) -> dict:
    out = {}
    for section in ("model", "optim", "pipe"):
        a, b = getattr(cfg, section), getattr(base, section)
        for f in dataclasses.fields(a):
            va, vb = getattr(a, f.name), getattr(b, f.name)
            if va != vb:
                out[f.name] = list(va) if isinstance(va, tuple) else va
    return out


def main():
    ref_dir = sys.argv[1] if len(sys.argv) > 1 else ""
    assert ref_dir and os.path.isdir(ref_dir), "usage: make_configs.py <ref_configs_dir>"
    out_dir = os.path.join(os.path.dirname(__file__), "..", "configs")
    os.makedirs(out_dir, exist_ok=True)
    base = Config()
    for ref_name, ours in sorted(NAME_MAP.items()):
        src = os.path.join(ref_dir, ref_name)
        if not os.path.exists(src):
            print("skip (absent):", ref_name)
            continue
        cfg = load_config(src)
        diff = config_diff(cfg, base)
        dst = os.path.join(out_dir, ours)
        with open(dst, "w") as f:
            json.dump(diff, f, indent=2, sort_keys=True)
            f.write("\n")
        print(f"{ours}: {len(diff)} overrides")


if __name__ == "__main__":
    main()
