"""Expert demonstration generation, fully on device.

The reference generates demos by driving BasicAgent + ExpertNoiser through a
live CARLA server and writing PNGs + episode.json (``carla_exp.py:23-80``),
then re-reads them via ``ExpertDataset`` (``algo/wdgail.py:192-241``). Here
the expert runs vmapped inside one ``lax.scan``; demos are kept as compact
(RenderState, metrics, action) tuples and observations are re-rendered on
demand — no files, no host round trips. A file-compatible exporter for
interop lives in ``tools/gen_trajectories.py``.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from gail_carla_tpu.agents.autopilot import (
    autopilot_act, make_autopilot, reset_autopilot_where,
)
from gail_carla_tpu.agents.noiser import (
    apply_steer_noise, apply_throttle_noise, make_noiser, noiser_step,
)
from gail_carla_tpu.config import EnvConfig
from gail_carla_tpu.scene.scene import StaticScene
from gail_carla_tpu.sim.env import RenderState, reset_batch, step_batch


@struct.dataclass
class DemoBatch:
    """(T, N, ...) expert transitions; obs re-renderable from ``render``."""

    render: RenderState     # leaves (T, N, ...)
    metrics: jnp.ndarray    # (T, N, 4)
    actions: jnp.ndarray    # (T, N, 2)
    valid: jnp.ndarray      # (T, N) bool — inside a successful episode

    def flatten(self):
        t, n = self.actions.shape[:2]
        flat_render = jax.tree.map(
            lambda a: a.reshape((t * n,) + a.shape[2:]), self.render
        )
        return (
            flat_render,
            self.metrics.reshape(-1, 4),
            self.actions.reshape(-1, 2),
            self.valid.reshape(-1),
        )


def _broadcast_tree(tree, n: int):
    return jax.tree.map(
        lambda a: jnp.broadcast_to(a, (n,) + a.shape), tree
    )


def generate_demos(
    scene: StaticScene,
    cfg: EnvConfig,
    rng: jax.Array,
    route_ids: jnp.ndarray,
    n_steps: int,
    target_speed: float = 6.0,
    with_noise: bool = True,
    obey_signals: bool = False,
) -> DemoBatch:
    """Drive the scripted expert for ``n_steps`` ticks on each route
    (carla_exp caps at 6000). Marks steps of episodes that did not complete
    the route as invalid so they can be filtered/masked out downstream."""
    n = route_ids.shape[0]
    rng, k_reset, k_n1, k_n2 = jax.random.split(rng, 4)
    states, metrics, render = reset_batch(scene, cfg, k_reset, route_ids)

    ap = _broadcast_tree(make_autopilot(), n)
    thr_noise = jax.vmap(lambda k: make_noiser(k, 10.0, 2.0))(
        jax.random.split(k_n1, n)
    )
    steer_noise = jax.vmap(lambda k: make_noiser(k, 4.0, 0.5))(
        jax.random.split(k_n2, n)
    )

    def body(carry, step_rng):
        states, ap, thr_ns, st_ns, metrics, render = carry
        ap, actions = jax.vmap(
            lambda a, w: autopilot_act(
                scene, a, w, target_speed, obey_signals
            )
        )(ap, states)

        if with_noise:
            t = states.step.astype(jnp.float32) * cfg.dt
            speed_kmh = metrics[:, 2] * 3.6  # carla_exp.py:52-53
            k1, k2 = jax.random.split(step_rng)
            thr_ns, ap_thr, nz_thr = jax.vmap(
                lambda s, k, tt: noiser_step(s, k, tt, 15.0, 2.0, cfg.dt)
            )(thr_ns, jax.random.split(k1, n), t)
            st_ns, ap_st, nz_st = jax.vmap(
                lambda s, k, tt: noiser_step(s, k, tt, 25.0, 0.5, cfg.dt)
            )(st_ns, jax.random.split(k2, n), t)
            actions = jax.vmap(apply_throttle_noise)(actions, ap_thr, nz_thr)
            actions = jax.vmap(apply_steer_noise)(
                actions, ap_st, nz_st, speed_kmh
            )

        new_states, out = step_batch(scene, cfg, states, actions)
        ap = jax.vmap(reset_autopilot_where)(out.done, ap)
        emit = (
            render, metrics, actions, out.done, out.info["route_completed"]
        )
        return (
            new_states, ap, thr_ns, st_ns, out.metrics, out.render
        ), emit

    keys = jax.random.split(rng, n_steps)
    _, (render_t, metrics_t, actions_t, done_t, completed_t) = jax.lax.scan(
        body,
        (states, ap, thr_noise, steer_noise, metrics, render),
        keys,
    )

    # A step is a valid demo iff the episode it belongs to ends with
    # route_completed (the reference only records full successful episodes —
    # its expert loop runs until env.route_completed, carla_exp.py:50).
    # Scan backwards: valid = outcome of the next episode boundary at or
    # after this step.
    def back(carry, inp):
        done, completed = inp
        ep_ok = jnp.where(done, completed, carry)
        return ep_ok, ep_ok

    _, valid = jax.lax.scan(
        back,
        jnp.zeros(done_t.shape[1:], bool),  # trailing partial episode: drop
        (done_t, completed_t),
        reverse=True,
    )

    return DemoBatch(
        render=render_t, metrics=metrics_t, actions=actions_t, valid=valid
    )
