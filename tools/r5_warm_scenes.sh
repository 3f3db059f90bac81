#!/bin/bash
# Warm the on-disk scene cache (.scene_cache) for every town/pack the
# round-5 eval queue and the pytest slow gates need, at low CPU priority
# so a concurrent TPU training's host thread keeps the core. The cache
# key folds scene-code mtimes, so this must run AFTER the last scene-code
# edit of the round (VERDICT r4: certify on the scene HEAD builds).
set -u
cd /root/repo
nice -n 19 env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python - <<'PY'
from gail_carla_tpu.scene.town_import import make_town_scene
from gail_carla_tpu.envs.suites import (
    corl2017_suite, nocrash_suite, NOCRASH_TRAFFIC,
)

for town, pack in [
    ("Town01", "routes_training.xml"), ("Town02", "routes_testing.xml"),
    ("Town03", "routes_training.xml"), ("Town04", "routes_training.xml"),
    ("Town05", "routes_testing.xml"), ("Town06", "routes_training.xml"),
]:
    print("warming", town, pack, flush=True)
    make_town_scene(town, pack)
for town in ["Town01", "Town02"]:
    for tier in NOCRASH_TRAFFIC[town]:
        print("warming nocrash", town, tier, flush=True)
        nocrash_suite(town=town, background_traffic=tier,
                      weather_group="train")
    for task in ["straight", "one_curve", "navigation",
                 "navigation_dynamic"]:
        print("warming corl", town, task, flush=True)
        corl2017_suite(task_type=task, town=town, weather_group="train")
print("scene cache warm", flush=True)
PY
