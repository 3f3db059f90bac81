import json

import jax.numpy as jnp
import numpy as np


def test_metrics_writer_jsonl(tmp_path):
    from gail_carla_tpu.utils.logging import MetricsWriter

    w = MetricsWriter(str(tmp_path), use_tensorboard=False)
    w.write(1, {"ppo/value_loss": jnp.asarray(0.5), "ep_reward_mean": 1.25})
    w.write(2, {"ppo/value_loss": 0.25})
    w.close()
    rows = [json.loads(l) for l in open(tmp_path / "metrics.jsonl")]
    assert rows[0]["step"] == 1
    assert abs(rows[0]["ppo/value_loss"] - 0.5) < 1e-9
    assert abs(rows[1]["ppo/value_loss"] - 0.25) < 1e-9


def test_env_monitor_csv(tmp_path):
    from gail_carla_tpu.utils.monitor import EnvEpoch, EnvMonitor

    EnvEpoch.set_epoch(7)
    mon = EnvMonitor(str(tmp_path), num_envs=2)
    infos = [
        {"route_id": 0, "episode_reward": 0.9, "episode_length": 120,
         "route_completed": True, "collision": False, "blocked": False,
         "route_deviation": False, "timeout": False,
         "score_composed": 90.0},
        {"route_id": 1, "episode_reward": 0.2, "episode_length": 60,
         "route_completed": False, "collision": True, "blocked": False,
         "route_deviation": False, "timeout": False,
         "score_composed": 13.0},
    ]
    mon.record_step([True, False], infos)
    mon.record_step([True, True], infos)
    mon.close()
    lines0 = open(tmp_path / "env_info" / "0.csv").read().strip().split("\n")
    lines1 = open(tmp_path / "env_info" / "1.csv").read().strip().split("\n")
    assert len(lines0) == 3   # header + 2 episodes
    assert len(lines1) == 2   # header + 1 episode
    assert lines0[1].startswith("1,7,0,")  # ep_count, epoch, route_id


def test_running_mean_std_matches_numpy():
    from gail_carla_tpu.utils.running_mean_std import make_rms, update_rms

    rng = np.random.default_rng(0)
    rms = make_rms(())
    all_data = []
    for _ in range(5):
        batch = rng.normal(3.0, 2.0, size=(64,)).astype(np.float32)
        all_data.append(batch)
        rms = update_rms(rms, jnp.asarray(batch))
    data = np.concatenate(all_data)
    assert abs(float(rms.mean) - data.mean()) < 1e-3
    assert abs(float(rms.std) - data.std()) < 1e-2


def test_checkpoint_roundtrip(tmp_path):
    from gail_carla_tpu.utils import checkpoint as ck

    state = {
        "a": jnp.arange(4, dtype=jnp.float32),
        "empty": jnp.zeros((0, 2)),          # zero-size leaf (traffic K=0)
        "nested": {"b": jnp.ones((2, 2))},
    }
    ck.save_checkpoint(str(tmp_path / "update_3"), state, elapsed=12.5)
    restored, elapsed = ck.restore_checkpoint(
        str(tmp_path / "update_3"), state
    )
    assert elapsed == 12.5
    np.testing.assert_array_equal(np.asarray(restored["a"]), [0, 1, 2, 3])
    assert restored["empty"].shape == (0, 2)
    assert ck.latest_checkpoint(str(tmp_path)).endswith("update_3")


def test_export_map_h5_roundtrip(tmp_path):
    from gail_carla_tpu.tools.export_map import check_h5_map, export_map

    path = export_map(str(tmp_path / "GridTown.h5"), nx=3, ny=3,
                      block=80.0)
    assert check_h5_map(path)
    import h5py

    with h5py.File(path) as hf:
        road = hf["road"][:]
        assert road.max() == 255 and (road > 0).mean() > 0.02
        assert hf["lane_marking_white_broken"][:].max() == 255
