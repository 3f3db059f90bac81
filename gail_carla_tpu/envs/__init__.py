from gail_carla_tpu.envs.gym_env import DrivingEnv
from gail_carla_tpu.envs.registry import available_envs, make
from gail_carla_tpu.envs.suites import (
    corl2017_suite, endless_suite, leaderboard_suite, nocrash_suite,
)
from gail_carla_tpu.envs.vec_env import TpuVecEnv
