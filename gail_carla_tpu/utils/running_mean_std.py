"""Welford parallel-moments running statistics.

Port of ``common/running_mean_std.py:3-30`` as a functional jnp pytree (the
reference constructs one for discriminator reward normalisation at
``algo/wdgail.py:38`` but ``predict_reward`` bypasses it — kept for API
parity and for users who enable reward normalisation).
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import struct


@struct.dataclass
class RunningMeanStd:
    mean: jnp.ndarray
    var: jnp.ndarray
    count: jnp.ndarray

    @property
    def std(self):
        return jnp.sqrt(self.var)


def make_rms(shape=()) -> RunningMeanStd:
    return RunningMeanStd(
        mean=jnp.zeros(shape),
        var=jnp.ones(shape),
        count=jnp.asarray(1e-4),
    )


def _batch_moments(batch: jnp.ndarray, axis_name=None):
    import jax

    batch_mean = jnp.mean(batch, axis=0)
    batch_count = batch.shape[0]
    if axis_name is not None:
        sq_mean = jax.lax.pmean(jnp.mean(batch**2, axis=0), axis_name)
        batch_mean = jax.lax.pmean(batch_mean, axis_name)
        batch_var = sq_mean - batch_mean**2
        batch_count = batch_count * jax.lax.psum(1, axis_name)
    else:
        batch_var = jnp.var(batch, axis=0)
    return batch_mean, batch_var, batch_count


def update_rms(
    rms: RunningMeanStd, batch: jnp.ndarray, axis_name=None
) -> RunningMeanStd:
    """Chan et al. parallel update, exactly the reference's
    update_from_moments. With ``axis_name`` (shard_map data parallelism)
    the batch moments are pmean'd first so every replica folds in the
    GLOBAL batch — the replicated-state invariant (parallel/mesh.py)
    holds without a separate sync."""
    batch_mean, batch_var, batch_count = _batch_moments(batch, axis_name)

    delta = batch_mean - rms.mean
    tot = rms.count + batch_count
    new_mean = rms.mean + delta * batch_count / tot
    m_a = rms.var * rms.count
    m_b = batch_var * batch_count
    m2 = m_a + m_b + delta**2 * rms.count * batch_count / tot
    return RunningMeanStd(mean=new_mean, var=m2 / tot, count=tot)


def update_scale(
    rms: RunningMeanStd, batch: jnp.ndarray, axis_name=None,
    ema: float = 0.8, max_ratio: float = 1.25,
) -> RunningMeanStd:
    """Robust scale tracker for reward normalisation — NOT the reference's
    cumulative update. EMA of the batch std, with each step's move clamped
    to a geometric trust region ``[std/max_ratio, std*max_ratio]``.

    Why ``update_rms`` is wrong for GAIL reward scaling: cumulative
    moments never forget. During the discriminator warm-up phase D's
    absolute level is unconstrained (the WD objective only pins the
    expert−policy GAP) and drifts to ~+7 on policy samples, so
    softplus(D) returns spike to std ~300 vs ~3 at steady state — a
    1e4× variance outlier that keeps the cumulative normaliser 10×
    too large for hundreds of updates, silently dividing the learning
    signal to zero (measured: runs/r3b_s0_stage1 sat at
    gail_reward_mean ≈ 0.001 / flat eval for 100+ updates). The clamp
    bounds any single batch's influence and recovery from a K-fold
    outlier takes ~log_max_ratio(K) updates (~26 for K=300 at 1.25),
    most of which overlap the warm-up itself.

    Moments are pmean'd across ``axis_name`` like ``update_rms`` so the
    replicated-state invariant holds; ``count`` keeps accumulating for
    logging/parity."""
    batch_mean, batch_var, batch_count = _batch_moments(batch, axis_name)
    std = rms.std
    target = ema * std + (1.0 - ema) * jnp.sqrt(
        jnp.maximum(batch_var, 0.0)
    )
    new_std = jnp.clip(target, std / max_ratio, std * max_ratio)
    new_mean = ema * rms.mean + (1.0 - ema) * batch_mean
    return RunningMeanStd(
        mean=new_mean, var=new_std**2, count=rms.count + batch_count
    )
