"""Progressive LR- and batch-size-doubling schedules.

Reference parity (SURVEY.md 2 item 13 / 3.1): every ``step`` epochs the LR is
multiplied by ``gamma`` until ``max`` (and analogously the batch size, which
rebuilds the host pipeline; each batch-size phase is a fresh static shape, so
the jitted step recompiles once per phase and is cached thereafter).
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class DoublingSchedule:
    """value(epoch) = min(base * gamma^((epoch-1)//step), max) (epochs 1-based)."""

    base: float
    gamma: float = 2.0
    step: int = 20
    max: float | None = None

    def value(self, epoch: int) -> float:
        if self.step <= 0 or self.gamma == 1.0:
            v = self.base
        else:
            v = self.base * (self.gamma ** ((max(epoch, 1) - 1) // self.step))
        if self.max is not None:
            v = min(v, self.max)
        return v

    def int_value(self, epoch: int) -> int:
        return int(round(self.value(epoch)))


def lr_schedule_fn(sched: DoublingSchedule, steps_per_epoch: int):
    """optax-compatible step->lr schedule (piecewise-constant per epoch).

    Built host-side as a closure over python ints; the returned fn uses only
    jnp ops so it can live inside the jitted optimizer.
    """
    import jax.numpy as jnp

    base, gamma, step_e, vmax = sched.base, sched.gamma, sched.step, sched.max

    def fn(count):
        epoch = count // max(steps_per_epoch, 1)  # 0-based epoch index
        if step_e <= 0 or gamma == 1.0:
            lr = jnp.asarray(base, jnp.float32)
        else:
            lr = base * (gamma ** (epoch // step_e)).astype(jnp.float32)
        if vmax is not None:
            lr = jnp.minimum(lr, vmax)
        return lr

    return fn
