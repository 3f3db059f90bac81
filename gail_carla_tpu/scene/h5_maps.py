"""Ground-truth town geometry from the reference's shipped H5 mask packs.

The reference ships all six towns pre-rendered at
``/root/reference/carla_gym/core/obs_manager/birdview/maps/Town0{1..6}.h5``
(10 uint8 layers at 5 px/m + ``world_offset_in_meters`` attrs — written by
``carla_gym/utils/birdview_map.py:20-143``, loaded by
``chauffeurnet.py:72-85``, checked by ``config_utils.py:11-48``). The layers
actually populated are: road, sidewalk, shoulder, parking (Town03/05),
lane_marking_all, and the four typed marking layers; the ``stopline`` layer
is **empty in every town** (verified), so traffic-light stop lines cannot
come from here — they are synthesized at junction entries like before
(the reference gets them from live server queries,
``traffic_light.py:79-199``).

This module compiles each pack into the analytic geometry the on-device
rasterizer consumes (scene/mask_geo.py):

- road boundary edges + interior depth (exact mask reproduction);
- lane-marking capsules with per-segment half-width and the reference's
  channel values: ``lane_marking_all`` renders 255 and
  ``lane_marking_white_broken`` overrides to 120 (chauffeurnet.py:188-189)
  — reproduced by giving broken-marking capsules value 120 and carving
  them out of the 255 set;
- sidewalk centreline paths (walker navigation — the nav-mesh stand-in);
- sidewalk boundary edges (walker containment / hazard geometry).

Results are cached as npz under ``<repo>/.cache/h5maps`` (extraction is
~3-20 s per town).
"""
from __future__ import annotations

import dataclasses
import os
from typing import List, Optional

import numpy as np

from gail_carla_tpu.scene import mask_geo

MAPS_DIR = (
    "/root/reference/carla_gym/core/obs_manager/birdview/maps"
)
CACHE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(__file__))), ".cache",
    "h5maps",
)
PPM = 5.0
_VERSION = 5  # bump to invalidate caches


def _close_hard_union(road: np.ndarray, sidewalk: np.ndarray, hf):
    """The hard (curb-to-wall) collision surface: the
    road|shoulder|parking|sidewalk union with narrow gaps CLOSED
    (morphological closing, 8 px ~ 1.6 m radius: bridges voids up to
    ~3.2 m across). Painted medians, channelization seams and grass
    median strips between opposing carriageways render as voids in the
    H5 layers, but CARLA's collision sensor fires on physical MESHES
    only (criteria/collision.py:49-112) and such strips carry none — a
    vehicle legally crosses them (costing OutsideRouteLane, not a
    collision). Anything wide enough to survive the closing (city
    blocks, building footprints, large park interiors) stays a
    collision surface. Without the closing, benchmark routes that
    legally cross a divided-road median (Town03) measured ~1-2 m
    "inside the wall" and fired phantom layout collisions."""
    from scipy import ndimage

    hard = road | sidewalk
    for layer in ("shoulder", "parking"):
        if layer in hf:
            hard |= np.asarray(hf[layer]) > 0
    return ndimage.binary_closing(
        hard, structure=ndimage.generate_binary_structure(2, 1),
        iterations=8,
    )


@dataclasses.dataclass
class TownGeometry:
    town: str
    world_offset: np.ndarray        # (2,)
    # road surface (the policy's BEV channel 0 and the off-road test)
    bnd_ab: np.ndarray              # (B, 4) oriented boundary edges
    bnd_dmax: float                 # max interior depth, metres
    # lane markings (BEV channel 2)
    lane_ab: np.ndarray             # (S, 4)
    lane_val: np.ndarray            # (S,) 255 / 120
    lane_hw: np.ndarray             # (S,) half width, metres
    # sidewalks (walker navigation)
    sidewalk_paths: List[np.ndarray]   # [(K, 2) world metres]
    sidewalk_ab: np.ndarray         # (Bs, 4) oriented sidewalk boundary
    sidewalk_dmax: float
    # hard (curb-to-wall) surface: road|shoulder|parking|sidewalk union.
    # CARLA's collision sensor fires on physical mesh contact only
    # (criteria/collision.py:49-112) — mounting a curb onto the sidewalk
    # is NOT a collision there (it costs OutsideRouteLane instead), so the
    # layout-collision test must run against this union, not the road
    # alone. Beyond it lie the buildings/fences/poles that do collide.
    hard_ab: Optional[np.ndarray] = None    # (Bh, 4)
    hard_dmax: float = 0.0


def _h5_path(town: str) -> str:
    return os.path.join(MAPS_DIR, f"{town}.h5")


def available_towns(root: str = MAPS_DIR) -> List[str]:
    if not os.path.isdir(root):
        return []
    return sorted(
        f[:-3] for f in os.listdir(root) if f.endswith(".h5")
    )


def _extract(town: str, max_err_px: float) -> TownGeometry:
    import h5py
    from scipy import ndimage

    with h5py.File(_h5_path(town), "r") as hf:
        off = np.asarray(hf.attrs["world_offset_in_meters"], np.float64)
        assert float(hf.attrs["pixels_per_meter"]) == PPM
        road = np.asarray(hf["road"]) > 0
        lane_all = np.asarray(hf["lane_marking_all"]) > 0
        white_broken = np.asarray(hf["lane_marking_white_broken"]) > 0
        sidewalk = np.asarray(hf["sidewalk"]) > 0
        hard = _close_hard_union(road, sidewalk, hf)

    bnd_ab, bnd_dmax = mask_geo.mask_boundary_edges(
        road, off, PPM, max_err_px=max_err_px
    )
    hard_ab, hard_dmax = mask_geo.mask_boundary_edges(
        hard, off, PPM, max_err_px=max_err_px
    )

    # chauffeurnet.py:186-189: c_lane = 255*all, then 120 where
    # white_broken — carve a 1-px halo so max-accumulation reproduces
    # the override
    if white_broken.any():
        solid = lane_all & ~ndimage.binary_dilation(
            white_broken, iterations=1
        )
    else:
        solid = lane_all
    ab_s, val_s, hw_s = mask_geo.mask_stroke_capsules(
        solid, off, PPM, 255.0
    )
    ab_b, val_b, hw_b = mask_geo.mask_stroke_capsules(
        white_broken, off, PPM, 120.0
    )
    lane_ab = np.concatenate([ab_s, ab_b], axis=0)
    lane_val = np.concatenate([val_s, val_b], axis=0)
    lane_hw = np.concatenate([hw_s, hw_b], axis=0)

    sidewalk_paths = mask_geo.mask_ribbon_paths(sidewalk, off, PPM)
    if sidewalk.any():
        sw_ab, sw_dmax = mask_geo.mask_boundary_edges(
            sidewalk, off, PPM, max_err_px=max_err_px
        )
    else:
        sw_ab, sw_dmax = np.zeros((0, 4), np.float32), 0.0

    return TownGeometry(
        town=town, world_offset=off.astype(np.float32),
        bnd_ab=bnd_ab, bnd_dmax=bnd_dmax,
        lane_ab=lane_ab, lane_val=lane_val, lane_hw=lane_hw,
        sidewalk_paths=sidewalk_paths,
        sidewalk_ab=sw_ab, sidewalk_dmax=sw_dmax,
        hard_ab=hard_ab, hard_dmax=hard_dmax,
    )


_ROAD_MASK_CACHE = {}


def road_mask(town: str):
    """Raw ``road`` layer (bool) + world offset, for the mask-grid fallback
    planner (``mask_geo.plan_on_mask``). None if the pack is absent."""
    if town not in _ROAD_MASK_CACHE:
        if not os.path.exists(_h5_path(town)):
            _ROAD_MASK_CACHE[town] = None
        else:
            import h5py

            with h5py.File(_h5_path(town), "r") as hf:
                _ROAD_MASK_CACHE[town] = (
                    np.asarray(hf["road"]) > 0,
                    np.asarray(
                        hf.attrs["world_offset_in_meters"], np.float64
                    ),
                )
    return _ROAD_MASK_CACHE[town]


_PLAN_MASK_CACHE = {}


def hard_plan_mask(town: str, clearance_m: float = 0.8,
                   road_slack_m: float = 2.0):
    """(mask, world_offset) for splicing route spans that cross the hard
    (curb-to-wall) surface boundary: the road|shoulder|parking|sidewalk
    union ERODED by ``clearance_m`` — so any path planned on it keeps
    layout-collision clearance by construction (collision.py:49-112 fires
    on physical meshes past the pavement) — intersected with a
    ``road_slack_m`` DILATION of the road layer, so the planned path also
    cannot drift off the ROAD mask beyond the benchmark's off-road
    tolerance. Falls back to the bare eroded union where the intersection
    is empty. None if the pack is absent."""
    key = (town, clearance_m, road_slack_m)
    if key not in _PLAN_MASK_CACHE:
        if not os.path.exists(_h5_path(town)):
            _PLAN_MASK_CACHE[key] = None
        else:
            import math

            import h5py
            from scipy import ndimage

            with h5py.File(_h5_path(town), "r") as hf:
                off = np.asarray(
                    hf.attrs["world_offset_in_meters"], np.float64
                )
                road = np.asarray(hf["road"]) > 0
                # the SAME closed union the collision surface scores
                # against — an unclosed planning mask would treat legal
                # narrow-median crossings as impassable and detour
                hard = _close_hard_union(
                    road, np.asarray(hf["sidewalk"]) > 0, hf
                )
            er = ndimage.binary_erosion(
                hard, iterations=int(math.ceil(clearance_m * PPM))
            )
            if road_slack_m * PPM < hard.shape[0]:
                rd = ndimage.binary_dilation(
                    road, iterations=int(round(road_slack_m * PPM))
                )
                m = er & rd
            else:               # unbounded slack: the bare eroded union
                m = er
            if not m.any():
                m = er
            _PLAN_MASK_CACHE[key] = (m, off)
    return _PLAN_MASK_CACHE[key]


_MEM_CACHE = {}


def load_town_geometry(
    town: str, max_err_px: float = 0.49, cache: bool = True
) -> Optional[TownGeometry]:
    """TownGeometry for ``town`` ('Town01'..'Town06'), or None if the H5
    pack is absent. Disk-cached npz + in-process cache.

    ``max_err_px`` 0.49 is the largest contour-simplification error that
    keeps the boundary inside-test pixel-center faithful (4 differing px
    per 300k measured on Town01; 0.35 is bit-exact) while cutting ~35% of
    the boundary edges — the dominant per-pixel loop of the BEV kernels
    (docs/results/r4 kernel notes)."""
    key = (town, max_err_px)
    if key in _MEM_CACHE:
        return _MEM_CACHE[key]
    if not os.path.exists(_h5_path(town)):
        return None
    path = os.path.join(
        CACHE_DIR, f"{town}_v{_VERSION}_e{max_err_px:g}.npz"
    )
    if cache and os.path.exists(path):
        z = np.load(path)
        geo = TownGeometry(
            town=town, world_offset=z["world_offset"],
            bnd_ab=z["bnd_ab"], bnd_dmax=float(z["bnd_dmax"]),
            lane_ab=z["lane_ab"], lane_val=z["lane_val"],
            lane_hw=z["lane_hw"],
            sidewalk_paths=[
                z[f"sw_{i}"] for i in range(int(z["n_sw"]))
            ],
            sidewalk_ab=z["sidewalk_ab"],
            sidewalk_dmax=float(z["sidewalk_dmax"]),
            hard_ab=z["hard_ab"], hard_dmax=float(z["hard_dmax"]),
        )
        _MEM_CACHE[key] = geo
        return geo
    geo = _extract(town, max_err_px)
    if cache:
        os.makedirs(CACHE_DIR, exist_ok=True)
        # write-then-rename so an interrupted process can't leave a
        # truncated npz behind for the next reader
        tmp = f"{path}.tmp.{os.getpid()}"
        np.savez_compressed(
            tmp,
            world_offset=geo.world_offset,
            bnd_ab=geo.bnd_ab, bnd_dmax=geo.bnd_dmax,
            lane_ab=geo.lane_ab, lane_val=geo.lane_val,
            lane_hw=geo.lane_hw,
            n_sw=len(geo.sidewalk_paths),
            sidewalk_ab=geo.sidewalk_ab, sidewalk_dmax=geo.sidewalk_dmax,
            hard_ab=geo.hard_ab, hard_dmax=geo.hard_dmax,
            **{
                f"sw_{i}": p for i, p in enumerate(geo.sidewalk_paths)
            },
        )
        os.replace(tmp + ".npz", path)
    _MEM_CACHE[key] = geo
    return geo
