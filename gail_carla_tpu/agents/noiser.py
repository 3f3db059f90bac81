"""Expert action noise injection, as branchless jittable state updates.

Port of ``carla_gym/utils/expert_noiser.py`` (the only *intentional* fault
injection in the reference — it widens the expert distribution for GAIL; see
SURVEY.md §5). The reference schedules noise on wall-clock ``time.time()``;
here the schedule runs on sim time (10 Hz), which is what it effectively
measured when the sim ran at real time.

Usage (carla_exp.py:33-34,52-53):
    throttle noiser: frequency=15/min, intensity=10, min_amount=2.0 s
    steer ("Spike"): frequency=25/min, intensity=4,  min_amount=0.5 s
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class NoiserState:
    active: jnp.ndarray     # () bool — noise_being_set
    removing: jnp.ndarray   # () bool
    start_t: jnp.ndarray    # () f32 sim seconds
    end_t: jnp.ndarray      # () f32
    mean: jnp.ndarray       # () f32 ±0.001
    intensity: jnp.ndarray  # () f32
    amount: jnp.ndarray     # () f32 current noise_time_amount (s)
    sec_count: jnp.ndarray  # () i32 steps since last 1 s boundary


def make_noiser(rng, intensity: float, min_amount: float) -> NoiserState:
    k1, k2 = jax.random.split(rng)
    return NoiserState(
        active=jnp.zeros((), bool),
        removing=jnp.zeros((), bool),
        start_t=jnp.zeros(()),
        end_t=jnp.ones(()),
        mean=jnp.zeros(()),
        intensity=intensity + jax.random.randint(k1, (), -2, 3).astype(
            jnp.float32
        ),
        amount=min_amount
        + jax.random.randint(k2, (), 50, 201).astype(jnp.float32) / 100.0,
        sec_count=jnp.zeros((), jnp.int32),
    )


def _noise_value(ns: NoiserState, t):
    """get_noise / get_noise_removing (expert_noiser.py:37-61)."""
    grow = ns.mean + jnp.sign(ns.mean) * (t - ns.start_t) * 0.03 * ns.intensity
    grow = jnp.clip(grow, -0.55, 0.55)
    added = (ns.end_t - ns.start_t) * 0.02 * ns.intensity
    peak = jnp.clip(
        ns.mean + jnp.sign(ns.mean) * added, -0.55, 0.55
    )
    shrink = peak - jnp.sign(ns.mean) * (t - ns.end_t) * 0.03 * ns.intensity
    return jnp.where(ns.removing, shrink, grow)


def noiser_step(
    ns: NoiserState,
    rng,
    t,
    frequency: float,
    min_amount: float,
    dt: float = 0.1,
):
    """Advance the schedule one tick; returns (state', apply?, noise)."""
    k_coin, k_seed, k_amount = jax.random.split(rng, 3)

    sec_count = ns.sec_count + 1
    second_passed = sec_count >= jnp.int32(round(1.0 / dt))
    sec_count = jnp.where(second_passed, 0, sec_count)

    # active -> removing transition (expert_noiser.py:71-74)
    to_removing = ns.active & ((t - ns.start_t) >= ns.amount) & (~ns.removing)
    active = ns.active & (~to_removing)
    removing = ns.removing | to_removing
    end_t = jnp.where(to_removing, t, ns.end_t)

    # removing -> idle (expert_noiser.py:79-88)
    rm_done = removing & ((t - end_t) > ns.amount)
    removing = removing & (~rm_done)
    amount = jnp.where(
        rm_done,
        min_amount
        + jax.random.randint(k_amount, (), 50, 201).astype(jnp.float32)
        / 100.0,
        ns.amount,
    )

    # idle + second boundary -> maybe start (expert_noiser.py:90-102)
    seed = jax.random.randint(k_seed, (), 0, 61).astype(jnp.float32)
    start_now = second_passed & (~active) & (~removing) & (seed < frequency)
    coin = jax.random.randint(k_coin, (), 0, 2)
    mean = jnp.where(
        start_now, jnp.where(coin == 0, 0.001, -0.001), ns.mean
    )
    start_t = jnp.where(start_now, t, ns.start_t)
    active = active | start_now

    new = NoiserState(
        active=active, removing=removing, start_t=start_t, end_t=end_t,
        mean=mean, intensity=ns.intensity, amount=amount,
        sec_count=sec_count,
    )
    apply = active | removing
    return new, apply, _noise_value(new, t)


def apply_throttle_noise(action, apply, noise):
    """expert_noiser.py:138-157."""
    throttle = jnp.where(
        apply, jnp.clip(action[1] + noise, -1.0, 1.0), action[1]
    )
    return action.at[1].set(throttle)


def apply_steer_noise(action, apply, noise, speed_kmh):
    """'Spike' branch (expert_noiser.py:116-136): steer noise scaled down
    with speed."""
    scale = 25.0 / (2.3 * speed_kmh + 5.0)
    steer = jnp.where(
        apply, jnp.clip(action[0] + noise * scale, -1.0, 1.0), action[0]
    )
    return action.at[0].set(steer)
