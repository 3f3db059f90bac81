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


def update_rms(rms: RunningMeanStd, batch: jnp.ndarray) -> RunningMeanStd:
    """Chan et al. parallel update, exactly the reference's
    update_from_moments."""
    batch_mean = jnp.mean(batch, axis=0)
    batch_var = jnp.var(batch, axis=0)
    batch_count = batch.shape[0]

    delta = batch_mean - rms.mean
    tot = rms.count + batch_count
    new_mean = rms.mean + delta * batch_count / tot
    m_a = rms.var * rms.count
    m_b = batch_var * batch_count
    m2 = m_a + m_b + delta**2 * rms.count * batch_count / tot
    return RunningMeanStd(mean=new_mean, var=m2 / tot, count=tot)
