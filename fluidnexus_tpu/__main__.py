"""Unified runner: ``python -m fluidnexus_tpu <stage> [args...]``.

One CLI over the whole pipeline (the reference spreads 20+ entry scripts over
four subprojects — SURVEY §1)."""
from __future__ import annotations

import sys

STAGES = {
    "train_background": "fluidnexus_tpu.pipelines.train_background",
    "train_physical_particle": "fluidnexus_tpu.pipelines.train_physical_particle",
    "train_visual_particle": "fluidnexus_tpu.pipelines.train_visual_particle",
    "future_simulation": "fluidnexus_tpu.pipelines.future_simulation",
    "train_novel_view": "fluidnexus_tpu.pipelines.train_novel_view",
    "infer_novel_view": "fluidnexus_tpu.pipelines.infer_novel_view",
    "train_video": "fluidnexus_tpu.pipelines.train_video",
    "sample_video": "fluidnexus_tpu.pipelines.sample_video",
    "gen_refine_video": "fluidnexus_tpu.pipelines.gen_refine_video",
    "gen_future_video": "fluidnexus_tpu.pipelines.gen_future_video",
    "convert": "fluidnexus_tpu.data.conversions",
    "port": "fluidnexus_tpu.pipelines.port_drill",
    "evaluate_adm": "fluidnexus_tpu.utils.adm_metrics",
    "bench": None,
}


def main():
    if len(sys.argv) < 2 or sys.argv[1] in ("-h", "--help") or sys.argv[1] not in STAGES:
        print("usage: python -m fluidnexus_tpu <stage> [args...]\nstages:")
        for s in STAGES:
            print(f"  {s}")
        sys.exit(0 if len(sys.argv) >= 2 and sys.argv[1] in ("-h", "--help") else 1)
    stage = sys.argv[1]
    argv = sys.argv[2:]
    if stage == "bench":
        import runpy

        sys.argv = ["bench.py"]
        runpy.run_path("bench.py", run_name="__main__")
        return
    import importlib

    mod = importlib.import_module(STAGES[stage])
    mod.main(argv)


if __name__ == "__main__":
    main()
