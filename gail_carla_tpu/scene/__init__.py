from gail_carla_tpu.scene.road_option import RoadOption
from gail_carla_tpu.scene.scene import StaticScene, build_scene
from gail_carla_tpu.scene.town import LaneGraph, make_grid_town
