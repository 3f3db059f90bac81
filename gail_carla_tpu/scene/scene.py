"""StaticScene: the per-town constants pytree consumed by the jitted sim.

The reference splits static world knowledge between the CARLA server (map,
waypoints), pre-rendered H5 masks (``chauffeurnet.py:72-85``), and per-reset
route traces (``task_vehicle.py:42-48``). Here it is all compiled once on
host; every env step is then pure device math. One StaticScene serves all
vmapped envs (it is closed over, not batched).

TPU-first layout decision: the map is stored as *capsule segments bucketed
into a spatial grid* (scene/segments.py), not textures — texture sampling
needs per-pixel gathers, which this TPU stack compiles catastrophically
(measured in round 1; see segments.py docstring). Textures remain available
offline via scene/raster.py for PNG export and debugging.
"""
from __future__ import annotations

from typing import Sequence

import numpy as np
import jax.numpy as jnp
from flax import struct

from gail_carla_tpu.scene import segments as seg_mod
from gail_carla_tpu.scene import trace as trace_mod
from gail_carla_tpu.scene.routes import RouteDef, generate_routes
from gail_carla_tpu.scene.town import LaneGraph, make_grid_town
from gail_carla_tpu.sim.transforms import location_to_gps


def _pad_to(n: int, mult: int) -> int:
    return ((max(n, 1) + mult - 1) // mult) * mult


@struct.dataclass
class StaticScene:
    # --- dense routes (1 m resolution), padded to route_pts ---
    route_xy: jnp.ndarray      # (R, L, 2) f32
    route_yaw: jnp.ndarray     # (R, L) f32
    route_cmd: jnp.ndarray     # (R, L) i32 RoadOption
    route_s: jnp.ndarray       # (R, L) f32 cumulative metres (pad: last value)
    route_n: jnp.ndarray       # (R,) i32 valid point count
    route_len_m: jnp.ndarray   # (R,) f32

    # --- downsampled leaderboard plan (task_vehicle.py:60-65) ---
    plan_gps: jnp.ndarray      # (R, P, 2) f32 lat/lon
    plan_xy: jnp.ndarray       # (R, P, 2) f32
    plan_cmd: jnp.ndarray      # (R, P) i32
    plan_n: jnp.ndarray        # (R,) i32

    # --- spatial-hash segment tables (the "map" at runtime) ---
    cell_grid_lo: jnp.ndarray  # (2,) f32
    cell_road: jnp.ndarray     # (Gy, Gx, Mr, 4) f32
    cell_road_flag: jnp.ndarray  # (Gy, Gx, Mr) f32, 1 = junction connector
    cell_lane: jnp.ndarray     # (Gy, Gx, Ml, 4) f32
    cell_lane_val: jnp.ndarray  # (Gy, Gx, Ml) f32 (255 solid / 120 broken)

    # --- signal fixtures ---
    tl_stop: jnp.ndarray       # (T, 2, 2) f32 stop-line endpoints
    tl_yaw: jnp.ndarray        # (T,) f32
    tl_junction: jnp.ndarray   # (T,) i32
    tl_group: jnp.ndarray      # (T,) i32 phase group within junction

    cell_size: float = struct.field(pytree_node=False, default=32.0)
    half_lane: float = struct.field(pytree_node=False, default=1.75)
    tl_n: int = struct.field(pytree_node=False, default=0)
    ss_center: jnp.ndarray = None   # (S, 2) f32 stop signs
    ss_yaw: jnp.ndarray = None      # (S,) f32
    ss_extent: jnp.ndarray = None   # (S, 2) f32
    ss_n: int = struct.field(pytree_node=False, default=0)

    # --- spawn points for traffic ---
    spawn: jnp.ndarray = None       # (Q, 3) f32 x, y, yaw

    # --- NPC patrol routes (zombie-vehicle lanes; see sim/traffic.py) ---
    patrol_xy: jnp.ndarray = None   # (P, Lp, 2) f32
    patrol_yaw: jnp.ndarray = None  # (P, Lp) f32
    patrol_cmd: jnp.ndarray = None  # (P, Lp) i32
    patrol_n: jnp.ndarray = None    # (P,) i32

    # --- endless-route chaining: when EnvConfig.endless_extension is on
    #     and the ego nears the end of its route row, it seamlessly
    #     continues onto endless_next[route] (the on-device equivalent of
    #     task_vehicle.py:67-82,143-145 appending random 1000 m targets
    #     during the episode) ---
    endless_next: jnp.ndarray = None   # (R,) i32

    # --- static obstacles: building/pole OBBs the ego can hit (the
    #     reference's collision sensor fires on any static actor,
    #     criteria/collision.py:49-112; penalty 0.65) ---
    ob_pose: jnp.ndarray = None     # (O, 3) x, y, yaw
    ob_extent: jnp.ndarray = None   # (O, 2) half sizes
    ob_n: int = struct.field(pytree_node=False, default=0)

    # --- per-cell live (non-sentinel) segment counts: dynamic trip counts
    #     for the Pallas rasterizer loops (mean live/pad is ~25-35%) ---
    cell_road_n: jnp.ndarray = None   # (Gy, Gx) i32
    cell_lane_n: jnp.ndarray = None   # (Gy, Gx) i32

    # --- per-cell traffic-light stop lines (bev6 kernel cull; see
    #     segments.py::build_tl_cells) ---
    cell_tl: jnp.ndarray = None       # (Gy, Gx, Mt, 4) f32
    cell_tl_idx: jnp.ndarray = None   # (Gy, Gx, Mt) i32 source light id
    cell_tl_n: jnp.ndarray = None     # (Gy, Gx) i32

    # --- oriented road-boundary edges (exact drivable-surface geometry:
    #     marching-squares contours of the town's road mask — the
    #     reference's H5 ``road`` layer for imported towns, the rasterized
    #     lane corridors for procedural ones; scene/mask_geo.py). The BEV
    #     road channel and the off-road collision test are
    #     nearest-edge-sign lookups into these tables. ---
    cell_bnd: jnp.ndarray = None      # (Gy, Gx, Mb, 4) f32
    cell_bnd_n: jnp.ndarray = None    # (Gy, Gx) i32
    bnd_dmax: float = struct.field(pytree_node=False, default=40.0)

    # --- hard (curb-to-wall) boundary: road|shoulder|parking|sidewalk
    #     union for imported towns; aliases cell_bnd for procedural ones.
    #     CARLA's collision sensor fires on mesh contact only
    #     (criteria/collision.py:49-112) — curb overruns onto the pavement
    #     are not collisions there, so the layout-collision test
    #     (sim/collisions.py::static_collision) runs against THIS surface
    #     while the BEV road channel keeps the road-only contour. ---
    cell_hard: jnp.ndarray = None     # (Gy, Gx, Mh, 4) f32
    cell_hard_n: jnp.ndarray = None   # (Gy, Gx) i32
    hard_dmax: float = struct.field(pytree_node=False, default=40.0)
    cell_lane_w: jnp.ndarray = None   # (Gy, Gx, Ml) f32 marking half width

    # --- sidewalk centreline paths (walker navigation; H5 ``sidewalk``
    #     skeletons for imported towns, None -> lateral-band fallback) ---
    walk_xy: jnp.ndarray = None       # (Wp, Lw, 2) f32
    walk_yaw: jnp.ndarray = None      # (Wp, Lw) f32
    walk_n: jnp.ndarray = None        # (Wp,) i32
    walk_cross: jnp.ndarray = None    # (Wp,) f32 signed lateral offset of a
    #   road crossing from this path (sign = which side the road is on)

    # --- scenario actors: per-task scripted vehicles with their own routes
    #     (ScenarioActorHandler, scenario_actor_handler.py:6-50; the
    #     actors.json counterpart). Their polylines live in the patrol
    #     arrays; these tables say which rows each ego route activates. ---
    sa_patrol: jnp.ndarray = None   # (R, A) i32 patrol row, -1 = none
    sa_speed: jnp.ndarray = None    # (R, A) f32 target speed
    sa_max: int = struct.field(pytree_node=False, default=0)

    @property
    def n_routes(self) -> int:
        return self.route_xy.shape[0]

    @property
    def n_patrols(self) -> int:
        return self.patrol_xy.shape[0]


def _pad_polyline_set(patrols, pad: int = 128):
    """Pad a list of (xy, yaw, cmd) polylines into dense patrol arrays."""
    L = _pad_to(max(len(p[0]) for p in patrols) + 32, pad)
    P = len(patrols)
    patrol_xy = np.zeros((P, L, 2), np.float32)
    patrol_yaw = np.zeros((P, L), np.float32)
    patrol_cmd = np.full((P, L), 4, np.int32)
    patrol_n = np.zeros((P,), np.int32)
    for i, (xy, yaw, cmd) in enumerate(patrols):
        n = len(xy)
        if len(yaw) < n:
            # a degenerate single-point patrol (walk started at a dead
            # end's last waypoint) has no segment to take a yaw from
            yaw = np.concatenate([yaw, np.zeros(n - len(yaw))])
        patrol_xy[i, :n] = xy
        patrol_xy[i, n:] = xy[-1]
        patrol_yaw[i, :n] = yaw
        patrol_yaw[i, n:] = yaw[-1]
        patrol_cmd[i, :n] = cmd
        patrol_n[i] = n
    return patrol_xy, patrol_yaw, patrol_cmd, patrol_n


def _polyline_with_yaw(xy: np.ndarray):
    xy = np.asarray(xy, np.float64).reshape(-1, 2)
    d = np.diff(xy, axis=0)
    yaw = np.arctan2(d[:, 1], d[:, 0])
    yaw = np.concatenate([yaw, yaw[-1:]]) if len(yaw) else np.zeros(1)
    cmd = np.full(len(xy), 4, np.int32)
    return xy, yaw, cmd


def _build_patrols(
    graph: LaneGraph,
    n_patrols: int,
    length_m: float = 400.0,
    seed: int = 99,
    pad: int = 128,
):
    """Random lane-graph walks for zombie-vehicle traffic — the behavioural
    stand-in for CARLA's TrafficManager autopilot routes
    (zombie_vehicle_handler.py:8-83 just hands vehicles to the TM)."""
    rng = np.random.default_rng(seed)
    spawns = graph.spawn_points(spacing=35.0)
    patrols = []
    for i in range(n_patrols):
        start = spawns[int(rng.integers(len(spawns)))]
        from gail_carla_tpu.scene.town import nearest_edge_point

        ek, idx = nearest_edge_point(graph, start[:2])
        pts = [graph.edges[ek].pts[idx:]]
        cmds = [np.full(len(pts[0]), int(graph.edges[ek].option), np.int32)]
        total = 0.0
        node = graph.edges[ek].dst
        while total < length_m:
            outs = graph.adjacency.get(node, [])
            if not outs:
                break
            ek = int(rng.choice(outs))
            e = graph.edges[ek]
            pts.append(e.pts[1:])
            cmds.append(np.full(len(e.pts) - 1, int(e.option), np.int32))
            total += e.length
            node = e.dst
        xy = np.concatenate(pts, axis=0)
        cmd = np.concatenate(cmds, axis=0)
        d = np.diff(xy, axis=0)
        yaw = np.arctan2(d[:, 1], d[:, 0])
        yaw = np.concatenate([yaw, yaw[-1:]])
        patrols.append((xy, yaw, cmd))
    return patrols


def build_scene(
    graph: LaneGraph,
    route_defs: Sequence[RouteDef],
    route_pts_pad: int = 256,
    plan_pts_pad: int = 32,
    cell_size: float = 32.0,
    n_patrols: int = 32,
    dense=None,
    scenario_actors=None,
    obstacles=None,
    geometry=None,
) -> StaticScene:
    """``dense`` optionally supplies precomputed DenseRoutes (imported
    reference towns densify from the route's own legs, scene/town_import.py,
    instead of re-tracing through the merged graph).

    ``geometry`` optionally supplies ground-truth mask geometry
    (scene/h5_maps.py::TownGeometry: road boundary edges + interior depth,
    lane-marking capsules with per-segment value/half-width, sidewalk
    paths). When absent, the boundary is extracted from the graph's own
    rasterized road mask (scene/raster.py -> scene/mask_geo.py) so the BEV
    road channel uses one code path for every town.

    ``scenario_actors`` maps route_id -> [(polyline_xy, target_speed), ...]
    — per-task scripted vehicles (the actors.json counterpart,
    scenario_actor_handler.py:6-50). Their polylines are appended to the
    patrol arrays and activated per ego route by sim/traffic.py.

    ``obstacles`` is a list of (x, y, yaw, half_x, half_y) static OBBs
    (buildings, poles); colliding with one scores a layout collision
    (criteria/collision.py semantics, penalty 0.65)."""
    if dense is None:
        dense = [trace_mod.trace_route(graph, r.waypoints)
                 for r in route_defs]

    R = len(dense)
    # +96 headroom keeps dynamic_slice windows at the route tail from
    # clamping their start index (they'd silently shift otherwise)
    L = _pad_to(max(len(d.xy) for d in dense) + 96, route_pts_pad)
    P = _pad_to(max(len(d.plan_xy) for d in dense), plan_pts_pad)

    route_xy = np.zeros((R, L, 2), np.float32)
    route_yaw = np.zeros((R, L), np.float32)
    route_cmd = np.full((R, L), 4, np.int32)
    route_s = np.zeros((R, L), np.float32)
    route_n = np.zeros((R,), np.int32)
    route_len = np.zeros((R,), np.float32)
    plan_xy = np.zeros((R, P, 2), np.float32)
    plan_cmd = np.full((R, P), 4, np.int32)
    plan_n = np.zeros((R,), np.int32)

    for r, d in enumerate(dense):
        n = len(d.xy)
        route_xy[r, :n] = d.xy
        route_xy[r, n:] = d.xy[-1]
        route_yaw[r, :n] = d.yaw
        route_yaw[r, n:] = d.yaw[-1]
        route_cmd[r, :n] = d.cmd
        route_cmd[r, n:] = d.cmd[-1]
        route_s[r, :n] = d.s
        route_s[r, n:] = d.s[-1]
        route_n[r] = n
        route_len[r] = d.length_m
        p = len(d.plan_xy)
        plan_xy[r, :p] = d.plan_xy
        plan_xy[r, p:] = d.plan_xy[-1]
        plan_cmd[r, :p] = d.plan_cmd
        plan_cmd[r, p:] = d.plan_cmd[-1]
        plan_n[r] = p

    plan_gps = np.asarray(
        location_to_gps(jnp.asarray(plan_xy.reshape(-1, 2)))
    ).reshape(R, P, 2)

    # spatial-hash segment tables
    soup = seg_mod.extract_segments(graph)
    if geometry is not None:
        # ground-truth lane markings replace the graph-derived ones
        soup = seg_mod.SegmentSoup(
            road_ab=soup.road_ab, road_junction=soup.road_junction,
            lane_ab=np.asarray(geometry.lane_ab, np.float32).reshape(-1, 4),
            lane_val=np.asarray(geometry.lane_val, np.float32),
            lane_hw=np.asarray(geometry.lane_hw, np.float32),
        )
    all_pts = np.concatenate([e.pts for e in graph.edges], axis=0)
    table = seg_mod.build_cell_table(
        soup, all_pts.min(axis=0), all_pts.max(axis=0), cell_size=cell_size
    )

    # oriented road-boundary edges: ground truth when supplied, else from
    # the graph's own rasterized road mask (one render path for all towns)
    if geometry is not None:
        bnd_ab = np.asarray(geometry.bnd_ab, np.float32).reshape(-1, 4)
        bnd_dmax = float(geometry.bnd_dmax)
    else:
        from gail_carla_tpu.scene import mask_geo
        from gail_carla_tpu.scene.raster import rasterize_town

        tex = rasterize_town(graph)
        # 0.49 px: the largest simplification error that keeps the inside
        # test pixel-center faithful (<=1.3e-5 differing px measured on
        # Town01 at 0.49 vs 0 at 0.35) — ~35% fewer boundary edges, the
        # dominant per-pixel loop of the BEV kernels
        bnd_ab, bnd_dmax = mask_geo.mask_boundary_edges(
            tex.road > 0, tex.world_offset.astype(np.float64), tex.ppm,
            max_err_px=0.49,
        )
    gy_, gx_ = table.road.shape[:2]
    cell_bnd, cell_bnd_n = seg_mod.build_bnd_cells(
        bnd_ab, table.grid_lo, gy_, gx_, table.cell_size, bnd_dmax
    )
    if geometry is not None and getattr(geometry, "hard_ab", None) is not None \
            and len(geometry.hard_ab):
        hard_ab = np.asarray(geometry.hard_ab, np.float32).reshape(-1, 4)
        hard_dmax = float(geometry.hard_dmax)
        cell_hard, cell_hard_n = seg_mod.build_bnd_cells(
            hard_ab, table.grid_lo, gy_, gx_, table.cell_size, hard_dmax
        )
    else:
        # procedural towns: the rasterized road corridor IS the whole
        # drivable world — off it is a wall
        cell_hard, cell_hard_n, hard_dmax = cell_bnd, cell_bnd_n, bnd_dmax

    # sidewalk walker paths + per-path road-crossing offsets (the signed
    # lateral displacement that carries a walker from this pavement across
    # the adjacent road — sign from which side the road boundary lies)
    walk_xy = walk_yaw = walk_n = walk_cross = None
    if geometry is not None and getattr(geometry, "sidewalk_paths", None):
        from gail_carla_tpu.scene import mask_geo

        wps = [_polyline_with_yaw(p) for p in geometry.sidewalk_paths]
        walk_xy, walk_yaw, _, walk_n = _pad_polyline_set(wps)
        crosses = []
        for p in geometry.sidewalk_paths:
            mid = np.asarray(p[:: max(len(p) // 8, 1)], np.float64)
            closest, sd, _ = mask_geo.boundary_project(bnd_ab, mid)
            d = closest - mid
            tang = np.gradient(np.asarray(p, np.float64), axis=0)[
                :: max(len(p) // 8, 1)
            ][: len(mid)]
            tang /= np.linalg.norm(tang, axis=1, keepdims=True) + 1e-9
            nrm = np.stack([-tang[:, 1], tang[:, 0]], axis=1)
            side = np.sign(np.sum(np.sum(d * nrm, axis=1)))
            side = side if side != 0 else 1.0
            # pavement-to-pavement: across the gap to the road plus a
            # typical 7 m carriageway plus the far pavement inset
            dist = 2.0 * float(np.mean(np.abs(sd))) + 7.0
            crosses.append(side * dist)
        walk_xy = jnp.asarray(walk_xy)
        walk_yaw = jnp.asarray(walk_yaw)
        walk_n = jnp.asarray(walk_n)
        walk_cross = jnp.asarray(np.asarray(crosses, np.float32))

    tls = graph.traffic_lights
    sss = graph.stop_signs
    T = max(len(tls), 1)
    S = max(len(sss), 1)
    tl_stop = np.zeros((T, 2, 2), np.float32)
    tl_yaw = np.zeros((T,), np.float32)
    tl_junction = np.zeros((T,), np.int32)
    tl_group = np.zeros((T,), np.int32)
    for i, t in enumerate(tls):
        tl_stop[i, 0] = t.stop_a
        tl_stop[i, 1] = t.stop_b
        tl_yaw[i] = t.yaw
        tl_junction[i] = t.junction
        tl_group[i] = t.group
    ss_center = np.zeros((S, 2), np.float32)
    ss_yaw = np.zeros((S,), np.float32)
    ss_extent = np.ones((S, 2), np.float32)
    for i, s in enumerate(sss):
        ss_center[i] = s.center
        ss_yaw[i] = s.yaw
        ss_extent[i] = s.extent

    cell_tl, cell_tl_idx, cell_tl_n = seg_mod.build_tl_cells(
        tl_stop, table.grid_lo, gy_, gx_, table.cell_size
    )

    spawn = graph.spawn_points().astype(np.float32)
    if len(spawn) == 0:
        spawn = np.zeros((1, 3), np.float32)

    polylines = _build_patrols(graph, n_patrols)
    sa_max = max(
        (len(v) for v in (scenario_actors or {}).values()), default=0
    )
    R_total = len(route_defs)
    sa_patrol = np.full((R_total, max(sa_max, 1)), -1, np.int32)
    sa_speed = np.zeros((R_total, max(sa_max, 1)), np.float32)
    for rid, actors in (scenario_actors or {}).items():
        for j, (poly, speed) in enumerate(actors):
            sa_patrol[rid, j] = len(polylines)
            sa_speed[rid, j] = speed
            polylines.append(_polyline_with_yaw(poly))
    patrol_xy, patrol_yaw, patrol_cmd, patrol_n = _pad_polyline_set(
        polylines
    )

    obs_list = list(obstacles or ())
    O = max(len(obs_list), 1)
    ob_pose = np.zeros((O, 3), np.float32)
    ob_extent = np.ones((O, 2), np.float32) * 0.01
    ob_pose[:, 0] = 1.0e6   # empty slots live far away
    for i, (x, y, yaw, hx, hy) in enumerate(obs_list):
        ob_pose[i] = (x, y, yaw)
        ob_extent[i] = (hx, hy)

    return StaticScene(
        route_xy=jnp.asarray(route_xy),
        route_yaw=jnp.asarray(route_yaw),
        route_cmd=jnp.asarray(route_cmd),
        route_s=jnp.asarray(route_s),
        route_n=jnp.asarray(route_n),
        route_len_m=jnp.asarray(route_len),
        plan_gps=jnp.asarray(plan_gps.astype(np.float32)),
        plan_xy=jnp.asarray(plan_xy),
        plan_cmd=jnp.asarray(plan_cmd),
        plan_n=jnp.asarray(plan_n),
        cell_grid_lo=jnp.asarray(table.grid_lo),
        cell_road=jnp.asarray(table.road),
        cell_road_flag=jnp.asarray(table.road_flag),
        cell_road_n=jnp.asarray(table.road_n),
        cell_tl=jnp.asarray(cell_tl),
        cell_tl_idx=jnp.asarray(cell_tl_idx),
        cell_tl_n=jnp.asarray(cell_tl_n),
        cell_lane=jnp.asarray(table.lane),
        cell_lane_val=jnp.asarray(table.lane_val),
        cell_lane_w=jnp.asarray(table.lane_w),
        cell_lane_n=jnp.asarray(table.lane_n),
        cell_bnd=jnp.asarray(cell_bnd),
        cell_bnd_n=jnp.asarray(cell_bnd_n),
        bnd_dmax=bnd_dmax,
        cell_hard=jnp.asarray(cell_hard),
        cell_hard_n=jnp.asarray(cell_hard_n),
        hard_dmax=hard_dmax,
        walk_xy=walk_xy,
        walk_yaw=walk_yaw,
        walk_n=walk_n,
        walk_cross=walk_cross,
        cell_size=table.cell_size,
        half_lane=float(graph.lane_width / 2.0),
        tl_stop=jnp.asarray(tl_stop),
        tl_yaw=jnp.asarray(tl_yaw),
        tl_junction=jnp.asarray(tl_junction),
        tl_group=jnp.asarray(tl_group),
        tl_n=len(tls),
        ss_center=jnp.asarray(ss_center),
        ss_yaw=jnp.asarray(ss_yaw),
        ss_extent=jnp.asarray(ss_extent),
        ss_n=len(sss),
        spawn=jnp.asarray(spawn),
        patrol_xy=jnp.asarray(patrol_xy),
        patrol_yaw=jnp.asarray(patrol_yaw),
        patrol_cmd=jnp.asarray(patrol_cmd),
        patrol_n=jnp.asarray(patrol_n),
        sa_patrol=jnp.asarray(sa_patrol),
        sa_speed=jnp.asarray(sa_speed),
        sa_max=sa_max,
        ob_pose=jnp.asarray(ob_pose),
        ob_extent=jnp.asarray(ob_extent),
        ob_n=len(obstacles or ()),
    )


_SCENE_CACHE = {}


def make_benchmark_scene(
    n_routes: int = 10,
    nx: int = 4,
    ny: int = 4,
    block: float = 100.0,
    seed: int = 2021,
    min_length: float = 400.0,
) -> StaticScene:
    """The framework's stand-in for Town01 + routes_training.xml routes 0-9
    (``params_variable.json:10-13``): a deterministic grid town with
    ``n_routes`` generated routes. Cached per arg tuple."""
    key = (n_routes, nx, ny, block, seed, min_length)
    if key not in _SCENE_CACHE:
        graph = make_grid_town(nx=nx, ny=ny, block=block, seed=seed)
        routes = generate_routes(
            graph, n_routes=n_routes, min_length=min_length, seed=seed
        )
        _SCENE_CACHE[key] = build_scene(graph, routes)
    return _SCENE_CACHE[key]
