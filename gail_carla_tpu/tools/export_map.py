"""Town map exporter — the ``carla_gym/utils/birdview_map.py`` equivalent.

The reference's offline tool boots CARLA per town and writes
``maps/TownXX.h5`` packs (road / lane_marking_all / lane_marking_white_broken
uint8 layers + ``pixels_per_meter`` / ``world_offset_in_meters`` attrs) that
``chauffeurnet.py:72-85`` loads. This tool bakes the same pack from a
procedural town so reference-side tooling can consume our maps. The runtime
sim never reads these (it uses segment tables; DESIGN.md §2) — this is an
interop/debug artifact, like scene/raster.py itself.

Usage: python -m gail_carla_tpu.tools.export_map --out maps/GridTown.h5
"""
from __future__ import annotations

import argparse


def export_map(
    out_path: str, nx: int = 4, ny: int = 4, block: float = 100.0,
    seed: int = 2021, ppm: float = 5.0,
):
    import h5py
    import numpy as np

    from gail_carla_tpu.scene.raster import rasterize_town
    from gail_carla_tpu.scene.town import make_grid_town

    graph = make_grid_town(nx=nx, ny=ny, block=block, seed=seed)
    raster = rasterize_town(graph, ppm=ppm)

    lane_all = (raster.lane > 0).astype(np.uint8) * 255
    lane_broken = (raster.lane == 120).astype(np.uint8) * 255

    with h5py.File(out_path, "w") as hf:
        hf.create_dataset("road", data=raster.road, compression="gzip")
        hf.create_dataset("lane_marking_all", data=lane_all,
                          compression="gzip")
        hf.create_dataset("lane_marking_white_broken", data=lane_broken,
                          compression="gzip")
        hf.attrs["pixels_per_meter"] = float(ppm)
        hf.attrs["world_offset_in_meters"] = raster.world_offset
    return out_path


def check_h5_map(path: str, pixels_per_meter: float = 5.0) -> bool:
    """config_utils.check_h5_maps (config_utils.py:11-48): verify the pack
    exists and its pixels_per_meter matches."""
    import h5py
    import numpy as np

    with h5py.File(path, "r") as hf:
        ok = np.isclose(float(hf.attrs["pixels_per_meter"]),
                        pixels_per_meter)
        for key in ("road", "lane_marking_all",
                    "lane_marking_white_broken"):
            ok = ok and key in hf
    return bool(ok)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="maps/GridTown.h5")
    p.add_argument("--nx", type=int, default=4)
    p.add_argument("--ny", type=int, default=4)
    p.add_argument("--block", type=float, default=100.0)
    args = p.parse_args(argv)
    import os

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    print(export_map(args.out, args.nx, args.ny, args.block))


if __name__ == "__main__":
    main()
