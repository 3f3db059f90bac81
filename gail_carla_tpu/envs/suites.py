"""Task suites — ports of ``carla_gym/envs/suites/*``.

Each suite builds (StaticScene, EnvConfig, task list). A task is a dict
{weather, route_id, n_npc_vehicles, n_npc_walkers} like the reference's task
dicts (``nocrash_env.py:60-76``); weather is metadata only (the reference's
WeatherHandler instantiation is commented out, carla_multi_agent_env.py:36,
71-72 — presets never change physics there either).

Since towns here are procedural, route *shape* filtering replaces the
per-town XML route packs: CoRL2017's straight / one_curve / navigation
classes are selected by turn count of the traced route.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, List, Tuple

import numpy as np

from gail_carla_tpu.config import EnvConfig
from gail_carla_tpu.scene.road_option import RoadOption
from gail_carla_tpu.scene.routes import RouteDef, generate_routes
from gail_carla_tpu.scene.scene import StaticScene, build_scene
from gail_carla_tpu.scene.town import make_grid_town

WEATHER_GROUPS = {
    "new": ["SoftRainSunset", "WetSunset"],
    "train": ["ClearNoon", "WetNoon", "HardRainNoon", "ClearSunset"],
    "train_eval": ["WetNoon", "ClearSunset"],
}

# nocrash_env.py:29-55 (Town01 column)
NOCRASH_TRAFFIC = {
    "empty": (0, 0),
    "regular": (20, 50),
    "dense": (100, 250),
    "leaderboard": (120, 120),
}


def _tasks(weathers, route_ids, n_veh, n_wal) -> List[Dict]:
    return [
        {
            "weather": w,
            "route_id": int(r),
            "n_npc_vehicles": n_veh,
            "n_npc_walkers": n_wal,
        }
        for w in weathers
        for r in route_ids
    ]


def leaderboard_suite(
    n_routes: int = 10, weather_group: str = "train", seed: int = 2021,
    nx: int = 4, ny: int = 4, block: float = 100.0,
) -> Tuple[StaticScene, EnvConfig, List[Dict]]:
    """leaderboard_env.py: LeaderBoard routes, zombie counts zeroed
    (leaderboard_env.py:34-49)."""
    graph = make_grid_town(nx=nx, ny=ny, block=block, seed=seed)
    routes = generate_routes(graph, n_routes=n_routes, min_length=400.0,
                             seed=seed)
    scene = build_scene(graph, routes)
    cfg = EnvConfig(train=True, terminal_mode="leaderboard")
    tasks = _tasks(
        WEATHER_GROUPS[weather_group], range(n_routes), 0, 0
    )
    return scene, cfg, tasks


def nocrash_suite(
    background_traffic: str = "regular", weather_group: str = "train",
    n_routes: int = 10, seed: int = 2021,
) -> Tuple[StaticScene, EnvConfig, List[Dict]]:
    graph = make_grid_town(nx=3, ny=3, block=90.0, seed=seed)
    routes = generate_routes(graph, n_routes=n_routes, min_length=300.0,
                             seed=seed)
    scene = build_scene(graph, routes)
    n_veh, n_wal = NOCRASH_TRAFFIC[background_traffic]
    # our per-world NPC arrays are dense; cap to keep vmapped worlds cheap
    n_veh, n_wal = min(n_veh, 32), min(n_wal, 32)
    cfg = EnvConfig(
        train=True, terminal_mode="leaderboard",
        n_npc_vehicles=n_veh, n_npc_walkers=n_wal,
    )
    tasks = _tasks(
        WEATHER_GROUPS[weather_group], range(n_routes), n_veh, n_wal
    )
    return scene, cfg, tasks


def _walk_shaped_route(graph, rng, n_turns: int, min_len: float):
    """Walk the lane graph taking exactly ``n_turns`` LEFT/RIGHT junction
    connectors (STRAIGHT otherwise); waypoints pin every turn so the A*
    retrace reproduces the intended shape."""
    turn_opts = (int(RoadOption.LEFT), int(RoadOption.RIGHT))
    for _ in range(200):
        ek = int(rng.integers(len(graph.edges)))
        e = graph.edges[ek]
        if e.is_junction:
            continue
        waypoints = [
            [e.pts[0][0], e.pts[0][1], 0.0]
        ]
        length = e.length
        turns = 0
        cur = e
        ok = True
        while length < min_len or turns < n_turns:
            outs = graph.adjacency.get(cur.dst, [])
            if not outs:
                ok = False
                break
            cand_turn = [
                k for k in outs if int(graph.edges[k].option) in turn_opts
            ]
            cand_straight = [
                k for k in outs
                if int(graph.edges[k].option) not in turn_opts
            ]
            if turns < n_turns and cand_turn and length > 40.0:
                k = int(rng.choice(cand_turn))
                turns += 1
                cur = graph.edges[k]
                waypoints.append([cur.pts[-1][0], cur.pts[-1][1], 0.0])
            elif cand_straight:
                k = int(rng.choice(cand_straight))
                cur = graph.edges[k]
            elif cand_turn and turns < n_turns:
                k = int(rng.choice(cand_turn))
                turns += 1
                cur = graph.edges[k]
                waypoints.append([cur.pts[-1][0], cur.pts[-1][1], 0.0])
            else:
                ok = False
                break
            length += cur.length
            if length > min_len * 3:
                ok = turns >= n_turns
                break
        if not ok or turns != n_turns or length < min_len:
            continue
        waypoints.append([cur.pts[-1][0], cur.pts[-1][1], 0.0])
        return np.asarray(waypoints)
    return None


def corl2017_suite(
    task_type: str = "straight", weather_group: str = "train",
    seed: int = 2021,
) -> Tuple[StaticScene, EnvConfig, List[Dict]]:
    """corl2017_env.py: straight / one_curve / navigation[_dynamic] tasks,
    selected by route shape (the reference ships per-shape routes.xml packs;
    procedural towns build them by graph walks with a turn budget)."""
    assert task_type in (
        "straight", "one_curve", "navigation", "navigation_dynamic"
    )
    graph = make_grid_town(nx=4, ny=4, block=100.0, seed=seed)
    rng = np.random.default_rng(seed)
    n_turns = {"straight": 0, "one_curve": 1}.get(task_type, 4)
    picked: List[RouteDef] = []
    while len(picked) < 6:
        wps = _walk_shaped_route(graph, rng, n_turns, min_len=150.0)
        if wps is None:
            break
        picked.append(
            RouteDef(route_id=len(picked), town="GridTown", waypoints=wps)
        )
    if not picked:
        raise RuntimeError(f"no {task_type} routes found in the town")
    for i, r in enumerate(picked):
        picked[i] = dataclasses.replace(r, route_id=i)
    scene = build_scene(graph, picked)
    dyn = task_type == "navigation_dynamic"
    n_veh, n_wal = (20, 16) if dyn else (0, 0)
    n_veh, n_wal = min(n_veh, 32), min(n_wal, 32)
    cfg = EnvConfig(
        train=True, terminal_mode="leaderboard",
        n_npc_vehicles=n_veh, n_npc_walkers=n_wal,
    )
    tasks = _tasks(
        WEATHER_GROUPS[weather_group], range(len(picked)), n_veh, n_wal
    )
    return scene, cfg, tasks


def endless_suite(
    n_npc_vehicles: int = 16, n_npc_walkers: int = 16,
    weather_group: str = "train", seed: int = 2021, n_routes: int = 8,
) -> Tuple[StaticScene, EnvConfig, List[Dict]]:
    """endless_env.py: no fixed route — random >=1000 m targets
    (task_vehicle.py:67-82 keeps extending). Here: long random-walk routes
    with the valeo terminal (timeout = success, valeo.py:92-96)."""
    graph = make_grid_town(nx=4, ny=4, block=100.0, seed=seed)
    rng = np.random.default_rng(seed)
    routes = []
    spawns = graph.spawn_points(spacing=40.0)
    from gail_carla_tpu.scene.town import astar, nearest_edge_point

    while len(routes) < n_routes:
        wps = [spawns[rng.integers(len(spawns))]]
        total = 0.0
        while total < 1000.0 and len(wps) < 12:
            cand = spawns[rng.integers(len(spawns))]
            if np.linalg.norm(cand[:2] - wps[-1][:2]) < 60.0:
                continue
            ek_a, _ = nearest_edge_point(graph, wps[-1][:2])
            ek_b, _ = nearest_edge_point(graph, cand[:2])
            path = astar(graph, graph.edges[ek_a].dst, graph.edges[ek_b].src)
            if path is None:
                break
            total += sum(graph.edges[k].length for k in path)
            wps.append(cand)
        if total >= 1000.0:
            routes.append(
                RouteDef(route_id=len(routes), town="GridTown",
                         waypoints=np.asarray(wps)),
            )
    scene = build_scene(graph, routes, route_pts_pad=512)
    n_veh, n_wal = min(n_npc_vehicles, 32), min(n_npc_walkers, 32)
    cfg = EnvConfig(
        train=True, terminal_mode="valeo", max_time=1200.0,
        n_npc_vehicles=n_veh, n_npc_walkers=n_wal,
    )
    tasks = _tasks(
        WEATHER_GROUPS[weather_group], range(len(routes)), n_veh, n_wal
    )
    return scene, cfg, tasks
