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


def update_rms(
    rms: RunningMeanStd, batch: jnp.ndarray, axis_name=None
) -> RunningMeanStd:
    """Chan et al. parallel update, exactly the reference's
    update_from_moments. With ``axis_name`` (shard_map data parallelism)
    the batch moments are pmean'd first so every replica folds in the
    GLOBAL batch — the replicated-state invariant (parallel/mesh.py)
    holds without a separate sync."""
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

    delta = batch_mean - rms.mean
    tot = rms.count + batch_count
    new_mean = rms.mean + delta * batch_count / tot
    m_a = rms.var * rms.count
    m_b = batch_var * batch_count
    m2 = m_a + m_b + delta**2 * rms.count * batch_count / tot
    return RunningMeanStd(mean=new_mean, var=m2 / tot, count=tot)
