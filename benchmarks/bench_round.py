"""Steady-state acquisition-round wall-clock on the chip.

Times ``region_selection`` (the production fused fwd+upsample+score+
select sweep, region_selection.py) over a synthetic full-res target set:
round 1 pays the program compiles, round 2 is the steady state a real
5-round run sees. The reference's round is a rank-0-only batch-1 loop
with ~2.3k serial GPU argmax host round-trips per image (SURVEY.md §3C).

Usage: build the dataset with the production-drive recipe first
(HALO docs: tests/conftest.py:mini_root layout at 1024x2048), then
  python benchmarks/bench_round.py /tmp/prod_ds/drive.yaml
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from halo_tpu.config import cfg
from halo_tpu.active.region_selection import region_selection
from halo_tpu.engine import build_learner


def main(cfg_path):
    cfg.merge_from_file(cfg_path)
    # parse_args normally derives SAVE_DIR (reference misc.py:158)
    cfg.SAVE_DIR = os.path.join(cfg.OUTPUT_DIR, cfg.NAME)
    cfg.ACTIVE.SELECT_ITER = [2, 4]  # two rounds' budget split
    learner = build_learner(cfg)

    times = []
    for rnd in (1, 2):
        t0 = time.perf_counter()
        stats = region_selection(cfg, learner.model, learner.state,
                                 learner.active_loader, rnd,
                                 mesh=learner.mesh)
        times.append(time.perf_counter() - t0)
        print(f"round {rnd}: {times[-1]:.2f}s — {stats['picked']} regions "
              f"/ {stats['labeled_px']} px over {stats['images']} images")
    n = stats["images"]
    print(f"steady round: {times[-1]:.2f}s total, "
          f"{times[-1] / n * 1e3:.0f} ms/image at 1024x2048 "
          f"(fwd+upsample+score+select+persist)")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/prod_ds/drive.yaml")
