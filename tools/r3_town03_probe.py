"""Probe which Town03 benchmark routes keep deep off-road spans after
projection repair, and whether/why the graph re-plan fallback fails
(RESULTS.md "Round 3: Town03 expert ceiling").

Usage: env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python tools/r3_town03_probe.py [Town03]
"""
import sys

import numpy as np

from gail_carla_tpu.scene import mask_geo
from gail_carla_tpu.scene.h5_maps import load_town_geometry
from gail_carla_tpu.scene.town_import import (
    benchmark_routes, build_town_graph, collect_town_routes,
    densify_route, repair_dense_route, repair_graph_to_mask,
)
from gail_carla_tpu.scene.trace import trace_route

town = sys.argv[1] if len(sys.argv) > 1 else "Town03"
geo = load_town_geometry(town)
graph = repair_graph_to_mask(
    build_town_graph(collect_town_routes(town), geometry=geo,
                     crossing_junctions=town in ("Town01", "Town02")),
    geo,
)

for r in benchmark_routes(town):
    d0 = repair_dense_route(densify_route(r.waypoints), geo)
    sd = mask_geo.boundary_signed_distance(geo.bnd_ab, d0.xy)
    depth = -float(sd.min())
    if depth <= 3.0:
        continue
    # which span is off-road, and does the per-leg re-plan work?
    bad = np.where(sd < -3.0)[0]
    print(f"route {r.route_id}: off-road depth {depth:.1f} m, "
          f"{len(bad)} pts, span s={d0.s[bad[0]]:.0f}..{d0.s[bad[-1]]:.0f} "
          f"of {d0.s[-1]:.0f} m")
    # try whole-route graph re-plan
    try:
        dr = repair_dense_route(
            trace_route(graph, r.waypoints, use_yaw=True), geo)
        sd2 = mask_geo.boundary_signed_distance(geo.bnd_ab, dr.xy)
        print(f"  re-plan ok: residual depth {-float(sd2.min()):.1f} m")
    except RuntimeError as e:
        print(f"  re-plan FAILED: {e}")
        # find the failing waypoint leg
        for i in range(len(r.waypoints) - 1):
            try:
                trace_route(graph, r.waypoints[i:i + 2], use_yaw=True)
            except RuntimeError:
                a, b = r.waypoints[i, :2], r.waypoints[i + 1, :2]
                print(f"    leg {i}: {a} -> {b}  "
                      f"({np.linalg.norm(b - a):.0f} m)")
