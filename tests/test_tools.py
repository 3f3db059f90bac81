import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gail_carla_tpu.config import EnvConfig
from gail_carla_tpu.scene.scene import make_benchmark_scene


@pytest.fixture(scope="module")
def scene():
    return make_benchmark_scene(n_routes=2, nx=3, ny=3, block=80.0,
                                min_length=150.0)


def test_full_bev_masks_and_collision_px(scene):
    from gail_carla_tpu.ops.bev_full import render_bev_full
    from gail_carla_tpu.sim.env import reset_batch, step_batch

    cfg = EnvConfig(train=False, full_bev=True, n_npc_vehicles=6,
                    n_npc_walkers=3)
    states, _, render = reset_batch(
        scene, cfg, jax.random.PRNGKey(0), jnp.zeros((1,), jnp.int32)
    )
    # tick a few times so history fills and NPCs move
    for _ in range(20):
        states, out = step_batch(
            scene, cfg, states, jnp.tile(jnp.array([0.0, 0.5]), (1, 1))
        )
    r0 = jax.tree.map(lambda a: a[0], out.render)
    h0 = jax.tree.map(lambda a: a[0], states.history)
    masks, rendered, col_px = render_bev_full(
        scene, cfg, r0.xy, r0.yaw, r0.route_id, r0.head, h0
    )
    masks = np.asarray(masks)
    assert masks.shape == (15, 192, 192)
    assert masks.dtype == np.uint8
    road, route, lane = masks[0], masks[1], masks[2]
    assert road.max() == 255 and route.max() == 255
    assert set(np.unique(lane)) <= {0, 120, 255}
    rendered = np.asarray(rendered)
    assert rendered.shape == (192, 192, 3)
    # ego painted white at its pixel position (row 152 center col)
    assert (rendered[148:156, 92:100] == 255).any()
    assert isinstance(bool(col_px), bool)


def test_bev_full_current_planes_match_bev6(scene):
    """The 15-channel stack's current-frame planes (veh ch6, walker ch10,
    light ch14 — history tap -1) equal render_bev6's signal/vehicle/walker
    channels on the same state. load_expert_tree(n_channels=6) relies on
    this mapping to assemble bev6 expert obs from exported PNG trees."""
    from gail_carla_tpu.ops.bev6 import render_bev6
    from gail_carla_tpu.ops.bev_full import render_bev_full
    from gail_carla_tpu.sim.env import reset_batch, step_batch

    cfg = EnvConfig(train=False, full_bev=True, obs_mode="bev6",
                    n_npc_vehicles=6, n_npc_walkers=3)
    states, _, render = reset_batch(
        scene, cfg, jax.random.PRNGKey(3), jnp.zeros((1,), jnp.int32)
    )
    for _ in range(20):
        states, out = step_batch(
            scene, cfg, states, jnp.tile(jnp.array([0.0, 0.5]), (1, 1))
        )
    r0 = jax.tree.map(lambda a: a[0], out.render)
    h0 = jax.tree.map(lambda a: a[0], states.history)
    masks, _, _ = render_bev_full(
        scene, cfg, r0.xy, r0.yaw, r0.route_id, r0.head, h0
    )
    obs6 = np.asarray(render_bev6(scene, cfg, r0) * 255.0).astype(np.uint8)
    masks = np.asarray(masks)
    assert (obs6[4] == masks[6]).all(), "vehicle plane mismatch"
    assert (obs6[5] == masks[10]).all(), "walker plane mismatch"
    assert (obs6[3] == masks[14]).all(), "signal plane mismatch"
    # the base triple is mask 0 by construction
    assert (obs6[:3] == masks[:3]).all()


def test_camera_renders(scene):
    from gail_carla_tpu.ops.camera import render_camera

    xy = scene.route_xy[0, 5]
    yaw = scene.route_yaw[0, 5]
    img = np.asarray(render_camera(scene, xy, yaw))
    assert img.shape == (216, 384, 3)
    # sky gradient: zenith blue at the top fading to the horizon tint
    assert np.abs(img[0, 0].astype(int) - [70, 120, 215]).max() <= 2
    assert np.abs(img[106, 0].astype(int) - [135, 180, 235]).max() <= 3
    lower = img[140:]
    assert (lower == np.array([46, 52, 54])).all(axis=-1).any(), \
        "no road visible ahead"


def test_camera_renders_actor_boxes(scene):
    """Ray-traced 3D boxes: a vehicle 12 m ahead paints the BEV vehicle
    colour; a walker off to the side paints walker colour; both occlude
    the ground behind them (obs_manager/camera/rgb.py is UE4-rendered;
    this is the geometric stand-in)."""
    import jax.numpy as jnp

    from gail_carla_tpu.ops.camera import render_camera

    xy = scene.route_xy[0, 5]
    yaw = scene.route_yaw[0, 5]
    fwd = np.array([np.cos(float(yaw)), np.sin(float(yaw))])
    right = np.array([-fwd[1], fwd[0]])
    veh = jnp.asarray(
        [[*(np.asarray(xy) + 12.0 * fwd), float(yaw)]]
    )
    wkr = jnp.asarray(
        [[*(np.asarray(xy) + 8.0 * fwd + 2.5 * right), float(yaw)]]
    )
    img = np.asarray(
        render_camera(scene, xy, yaw, 0.0, veh_pose=veh, walker_pose=wkr)
    )
    # Lambert shading scales the pure BEV hues, so detect by hue: vehicle
    # (0, 0, b), walker (0, g, g) with the face shade >= 0.45 floor
    is_veh = (img[..., 0] == 0) & (img[..., 1] == 0) & (img[..., 2] > 100)
    is_wkr = (
        (img[..., 0] == 0) & (img[..., 1] > 100)
        & (np.abs(img[..., 1].astype(int) - img[..., 2]) <= 1)
    )
    assert is_veh.any(), "no vehicle"
    assert is_wkr.any(), "no walker"
    # vehicle box must sit around the image centre row (roofline above
    # the horizon at 12 m: atan((1.5-1.3)/12) ~ 1deg above centre)
    ys, xs = np.where(is_veh)
    assert abs(ys.mean() - 108) < 40 and abs(xs.mean() - 192) < 60


def test_camera_shading_and_fog(scene):
    """Sun-direction Lambert shading lights a box's sun-facing side more
    than its back face, and distance fog pulls far ground toward the
    horizon tint (rgb.py renders UE4 sun + atmospheric fog; this is the
    geometric stand-in's equivalent cue set)."""
    import jax.numpy as jnp

    from gail_carla_tpu.ops.camera import render_camera

    xy = scene.route_xy[0, 5]
    yaw = scene.route_yaw[0, 5]
    fwd = np.array([np.cos(float(yaw)), np.sin(float(yaw))])
    veh = jnp.asarray([[*(np.asarray(xy) + 12.0 * fwd), float(yaw)]])

    def veh_blue(sun_az_deg):
        img = np.asarray(render_camera(
            scene, xy, yaw, 0.0, veh_pose=veh,
            sun_altitude=10.0, sun_azimuth=sun_az_deg,
        ))
        m = (img[..., 0] == 0) & (img[..., 1] == 0) & (img[..., 2] > 50)
        assert m.any()
        return img[..., 2][m].max()

    # low sun behind the camera lights the box's near face; sun ahead
    # leaves the near face in ambient shadow
    behind = veh_blue(np.degrees(float(yaw)) + 180.0)
    ahead = veh_blue(np.degrees(float(yaw)))
    assert behind > ahead + 40, (behind, ahead)

    clear = np.asarray(render_camera(scene, xy, yaw))
    foggy = np.asarray(render_camera(scene, xy, yaw, fog_density=60.0))
    # near the horizon the foggy ground converges to the fog tint
    row = 112  # just below the horizon -> tens of meters of depth
    d_clear = np.abs(clear[row].astype(int) - [135, 180, 235]).mean()
    d_foggy = np.abs(foggy[row].astype(int) - [135, 180, 235]).mean()
    assert d_foggy < d_clear - 10, (d_clear, d_foggy)
    # but the nearby road right in front of the ego stays recognisable
    assert np.abs(foggy[-1].astype(int) - clear[-1].astype(int)).max() < 40


def test_exporter_and_loader_roundtrip(scene, tmp_path, monkeypatch):
    from gail_carla_tpu.tools.gen_trajectories import gen_trajectories
    from gail_carla_tpu.tools.expert_dataset import (
        expert_buffer_from_tree, load_expert_tree,
    )

    gen_trajectories(
        out_dir=str(tmp_path), traj_name="t", n_routes=1, n_eps=1,
        max_steps=25, with_cameras=True,
        scene_kwargs=dict(n_routes=2, nx=3, ny=3, block=80.0,
                          min_length=150.0),
    )
    ep = tmp_path / "t" / "route_00" / "ep_00"
    assert (ep / "episode.json").exists()
    assert (ep / "birdview_masks" / "0000_00.png").exists()
    assert (ep / "birdview" / "0000.png").exists()
    assert (ep / "rgb" / "0000.png").exists()

    obs, metrics, actions = load_expert_tree(str(tmp_path / "t"), [0])
    assert obs.shape[1:] == (3, 192, 192)
    assert metrics.shape[1:] == (4,)
    assert actions.shape[1:] == (2,)
    assert obs.shape[0] == 25

    # the gen_trajectories --out dir (trajectory-name parent) also loads:
    # the loader descends into the sole trajectory subdir
    obs2, _, _ = load_expert_tree(str(tmp_path), [0])
    assert obs2.shape == obs.shape
    assert (obs2 == obs).all()

    buf = expert_buffer_from_tree(str(tmp_path / "t"), [0])
    assert buf.size == 25
    assert buf.obs is not None

    # episode.json matches the reference's pandas orient: columns of dicts
    payload = json.loads((ep / "episode.json").read_text())
    assert set(payload) == {"actions", "metrics"}
    assert "0" in payload["actions"]


def test_bc_loss_decreases(scene):
    from gail_carla_tpu.algo.bc import learn_bc
    from gail_carla_tpu.algo.buffers import build_expert_buffer
    from gail_carla_tpu.algo.expert import generate_demos
    from gail_carla_tpu.config import ModelConfig
    from gail_carla_tpu.models.policy import init_policy

    env_cfg = EnvConfig(train=False, bev_width=64)
    demos = generate_demos(
        scene, env_cfg, jax.random.PRNGKey(0),
        jnp.zeros((1,), jnp.int32), 900, with_noise=False,
    )
    buf = build_expert_buffer(scene, env_cfg, demos, size=256)
    net, params = init_policy(
        jax.random.PRNGKey(1),
        ModelConfig(conv_channels=(8, 16), hidden_size=32, head_size=16,
                    dtype="float32"),
        (3, 64, 64),
    )
    losses = []
    best, best_loss = learn_bc(
        scene, env_cfg, net, params, buf, buf, jax.random.PRNGKey(2),
        epochs=8, log_fn=lambda e, tr, ev: losses.append(tr),
    )
    assert losses[-1] < losses[0], losses
    assert np.isfinite(best_loss)


def test_pallas_bev_kernel_matches_xla_interpret(scene):
    """The TPU kernel (ops/bev_pallas.py) must agree with the XLA reference
    renderer; on CPU we run it in interpreter mode (small batch)."""
    import jax
    import jax.numpy as jnp
    from gail_carla_tpu.ops.bev import render_bev_batch
    from gail_carla_tpu.ops.bev_pallas import render_bev_pallas_batch
    from gail_carla_tpu.sim.env import reset_batch

    cfg = EnvConfig(train=False)
    _, _, render = reset_batch(scene, cfg, jax.random.PRNGKey(4),
                               jnp.arange(2, dtype=jnp.int32))
    a = np.asarray(render_bev_batch(scene, cfg, render))
    b = np.asarray(render_bev_pallas_batch(scene, cfg, render,
                                           interpret=True))
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_pallas_renderer_fallback_odd_width(scene):
    """Widths whose pixel count doesn't tile (8,128) exactly fall back to
    the XLA renderer instead of the flat-layout kernel."""
    import dataclasses as dc

    import jax
    import jax.numpy as jnp
    from gail_carla_tpu.ops.bev import render_bev_batch
    from gail_carla_tpu.ops.bev_pallas import render_bev_pallas_batch
    from gail_carla_tpu.sim.env import reset_batch

    cfg = dc.replace(EnvConfig(train=False), bev_width=100)  # 10000 % 128
    _, _, render = reset_batch(scene, cfg, jax.random.PRNGKey(4),
                               jnp.arange(2, dtype=jnp.int32))
    a = np.asarray(render_bev_batch(scene, cfg, render))
    b = np.asarray(render_bev_pallas_batch(scene, cfg, render,
                                           interpret=True))
    assert a.shape == (2, 3, 100, 100)
    np.testing.assert_array_equal(a, b)


@pytest.mark.slow
def test_train_from_exported_files(scene, tmp_path):
    """Full interop loop: export PNG demos (reference format) -> load them
    -> run a WDGAIL update on the file-backed expert buffer."""
    import dataclasses as dc

    from gail_carla_tpu.algo.learner import WDGAILLearner
    from gail_carla_tpu.config import ModelConfig, TrainConfig
    from gail_carla_tpu.tools.expert_dataset import expert_buffer_from_tree
    from gail_carla_tpu.tools.gen_trajectories import gen_trajectories

    gen_trajectories(
        out_dir=str(tmp_path), traj_name="t", n_routes=1, n_eps=1,
        max_steps=80, with_cameras=False,
        scene_kwargs=dict(n_routes=2, nx=3, ny=3, block=80.0,
                          min_length=150.0),
    )
    expert = expert_buffer_from_tree(str(tmp_path / "t"), [0])
    assert expert.size == 80

    env_cfg = EnvConfig(train=True)  # 192px obs matches the PNGs
    model_cfg = ModelConfig(conv_channels=(8, 16), hidden_size=32,
                            head_size=16, disc_hidden=16, dtype="float32")
    tcfg = TrainConfig(
        n_envs=2, num_steps=32, mini_batch_size=8, ppo_epoch=1,
        gail_batch_size=8, gail_pre_epoch=1, gail_epoch=1, gail_thre=1,
        routes=(0, 1),
    )
    learner = WDGAILLearner(scene, env_cfg, model_cfg, tcfg, expert)
    state = learner.init_state()
    state, metrics = learner.update(state)
    assert np.isfinite(float(metrics["disc/dis_loss"]))

    # bev6 interop: 6-channel expert obs assembled from the full mask
    # stack (current-frame signal/vehicle/walker planes) feed a bev6
    # learner end to end
    expert6 = expert_buffer_from_tree(str(tmp_path / "t"), [0],
                                      n_channels=6)
    assert expert6.obs.shape[1] == 6
    env_cfg6 = dc.replace(env_cfg, obs_mode="bev6")
    learner6 = WDGAILLearner(scene, env_cfg6, model_cfg, tcfg, expert6)
    state6 = learner6.init_state()
    state6, metrics6 = learner6.update(state6)
    assert np.isfinite(float(metrics6["disc/dis_loss"]))
    assert float(metrics["gail_reward_mean"]) > 0.0


def test_bev6_pallas_kernel_matches_xla_interpret(scene):
    import jax
    import jax.numpy as jnp
    from gail_carla_tpu.ops.bev6 import render_bev6_batch
    from gail_carla_tpu.ops.bev6_pallas import render_bev6_pallas_batch
    from gail_carla_tpu.sim.env import reset_batch, step_batch

    cfg = EnvConfig(train=False, obs_mode="bev6", n_npc_vehicles=3,
                    n_npc_walkers=2)
    states, _, render = reset_batch(scene, cfg, jax.random.PRNGKey(5),
                                    jnp.arange(2, dtype=jnp.int32))
    for _ in range(10):
        states, out = step_batch(
            scene, cfg, states, jnp.tile(jnp.array([0.0, 0.6]), (2, 1))
        )
    a = np.asarray(render_bev6_batch(scene, cfg, out.render))
    b = np.asarray(render_bev6_pallas_batch(scene, cfg, out.render,
                                            interpret=True))
    np.testing.assert_allclose(a, b, atol=1e-5)
