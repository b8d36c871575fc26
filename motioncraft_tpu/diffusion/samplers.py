"""Timestep schedule samplers (uniform / loss-second-moment).

Mirrors gaussian_diffusion.py:15-162.  The reference syncs loss history across
ranks with ``dist.all_gather`` (:86-106); under JAX's single-controller SPMD
the full batch of (t, loss) pairs is already visible on the host after the
jitted step, so ``update_with_local_losses`` just folds them in directly —
the cross-host case is covered because every process computes the identical
update from the globally-reduced per-timestep losses it receives.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def create_named_schedule_sampler(name: str, num_timesteps: int):
    if name == "uniform":
        return UniformSampler(num_timesteps)
    if name == "loss-second-moment":
        return LossSecondMomentResampler(num_timesteps)
    raise NotImplementedError(f"unknown schedule sampler: {name}")


class ScheduleSampler:
    num_timesteps: int

    def weights(self) -> np.ndarray:
        raise NotImplementedError

    def sample(self, rng: jax.Array, batch_size: int):
        """Importance-sample timesteps; returns (t[int32 B], weights[f32 B])."""
        w = np.asarray(self.weights(), dtype=np.float64)
        p = w / w.sum()
        t = jax.random.choice(rng, self.num_timesteps, shape=(batch_size,),
                              p=jnp.asarray(p, dtype=jnp.float32))
        weights = 1.0 / (len(p) * jnp.asarray(p, dtype=jnp.float32)[t])
        return t.astype(jnp.int32), weights


class UniformSampler(ScheduleSampler):
    def __init__(self, num_timesteps: int):
        self.num_timesteps = num_timesteps
        self._weights = np.ones([num_timesteps])

    def weights(self):
        return self._weights

    def sample(self, rng: jax.Array, batch_size: int):
        t = jax.random.randint(rng, (batch_size,), 0, self.num_timesteps, dtype=jnp.int32)
        return t, jnp.ones((batch_size,), jnp.float32)


class LossAwareSampler(ScheduleSampler):
    def update_with_local_losses(self, local_ts, local_losses):
        ts = np.asarray(jax.device_get(local_ts)).reshape(-1)
        losses = np.asarray(jax.device_get(local_losses)).reshape(-1)
        self.update_with_all_losses(ts.tolist(), losses.tolist())

    def update_with_all_losses(self, ts, losses):
        raise NotImplementedError


class LossSecondMomentResampler(LossAwareSampler):
    def __init__(self, num_timesteps: int, history_per_term: int = 10, uniform_prob: float = 0.001):
        self.num_timesteps = num_timesteps
        self.history_per_term = history_per_term
        self.uniform_prob = uniform_prob
        self._loss_history = np.zeros([num_timesteps, history_per_term], dtype=np.float64)
        self._loss_counts = np.zeros([num_timesteps], dtype=np.int64)

    def weights(self):
        if not self._warmed_up():
            return np.ones([self.num_timesteps], dtype=np.float64)
        weights = np.sqrt(np.mean(self._loss_history ** 2, axis=-1))
        weights /= weights.sum()
        weights *= 1 - self.uniform_prob
        weights += self.uniform_prob / len(weights)
        return weights

    def update_with_all_losses(self, ts, losses):
        for t, loss in zip(ts, losses):
            if self._loss_counts[t] == self.history_per_term:
                self._loss_history[t, :-1] = self._loss_history[t, 1:]
                self._loss_history[t, -1] = loss
            else:
                self._loss_history[t, self._loss_counts[t]] = loss
                self._loss_counts[t] += 1

    def _warmed_up(self):
        return (self._loss_counts == self.history_per_term).all()
