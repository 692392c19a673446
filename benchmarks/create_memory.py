"""Batch memory pre-build across a dataset (reference
create_memory_for_dataset.py:54-137): per episode, derive scene +
navmesh island, size the exploration budget by island area
(random_move_num = area/2 + 1, :93), build by random-walk exploration,
and cache the bundle per scene+island.

  python -m benchmarks.create_memory --env fake --episodes 2
"""

from __future__ import annotations

import argparse
import dataclasses
import os

from benchmarks import common as C
from benchmarks import setup as S


def main(argv=None):
    p = argparse.ArgumentParser()
    S.add_common_args(p)
    p.add_argument("--task", type=str, default="objectnav")
    args = p.parse_args(argv)

    cfg, bench, memory, extras = S.build_world(args, task="objnav")

    built = set()
    for i in range(args.episodes):
        bench.reset()
        ep = bench.current_episode
        island, area = S.island_stats(bench)
        path = C.memory_cache_path(args.memory_root, args.task,
                                   args.benchmark_dataset, ep.scene_id,
                                   island)
        if path in built or os.path.exists(path):
            print(f"memory exists: {path}")
            continue
        n_moves = int(area / 2) + 1
        print(f"building {path} (random_move_num={n_moves})")
        memory.cfg = memory.cfg.replace(
            agent=dataclasses.replace(memory.cfg.agent,
                                      random_move_num=n_moves))
        state = bench.sim.agents[0].get_state()
        memory.load_memory(init_state=state, build_map=True)
        memory.exploring_create_memory(save=False)
        memory.save(path)
        built.add(path)
        print(f"saved {int(memory.state.num_voxels)} voxels, "
              f"{len(memory.long_memory_dict)} instances -> {path}")
    return built


if __name__ == "__main__":
    main()
