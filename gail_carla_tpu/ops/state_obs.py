"""State-vector observation — the BEV-free fast path (SURVEY §7 step 4's
"minimum end-to-end slice": metrics + route.py-style features, skip
rasterization; BASELINE config #2).

Feature layout (D = 2*K + 4):
- next K route waypoints in the ego frame (K=10, 2 m spacing)  [2K]
- heading error to the route transform                          [1]
- lateral distance (signed)                                     [1]
- speed                                                         [1]
- command / 4                                                   [1]
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from gail_carla_tpu.config import EnvConfig
from gail_carla_tpu.scene.scene import StaticScene
from gail_carla_tpu.sim.transforms import cast_angle, vec_global_to_ref

K_WAYPOINTS = 10
STATE_OBS_DIM = 2 * K_WAYPOINTS + 4


def state_observation(scene: StaticScene, cfg: EnvConfig, render, metrics):
    """(D,) float obs from a RenderState + the metrics 4-vector. Pure
    function of the same inputs as the BEV renderer, so rollouts reuse the
    identical storage machinery."""
    rid, head = render.route_id, render.head
    pts = jax.lax.dynamic_slice(
        scene.route_xy, (rid, head, 0), (1, 2 * K_WAYPOINTS, 2)
    )[0][::2]                                            # (K, 2), 2 m apart
    local = jax.vmap(
        lambda p: vec_global_to_ref(p - render.xy, render.yaw)
    )(pts)

    yaw0 = scene.route_yaw[rid, head]
    heading_err = cast_angle(render.yaw - yaw0)
    d = render.xy - scene.route_xy[rid, head]
    right = jnp.stack([-jnp.sin(yaw0), jnp.cos(yaw0)])
    lateral = jnp.sum(right * d)

    return jnp.concatenate(
        [
            local.reshape(-1) * 0.05,        # ~[-1, 1] over the 20 m window
            heading_err[None],
            lateral[None],
            metrics[2][None] * 0.1,          # speed scale (model.py:202)
            metrics[3][None] / 4.0,          # command
        ]
    )


def state_observation_batch(scene, cfg, render_state, metrics):
    from gail_carla_tpu.ops.bev import _flatten_lead

    lead = render_state.yaw.shape
    flat_r = _flatten_lead(render_state, lead)
    flat_m = metrics.reshape((-1, 4))
    obs = jax.vmap(
        lambda r, m: state_observation(scene, cfg, r, m)
    )(flat_r, flat_m)
    return obs.reshape(lead + (STATE_OBS_DIM,))
