"""Multi-cycle LR schedulers vs a literal NumPy port of the reference
classes (sgm/lr_scheduler.py:51-135)."""

import numpy as np
import pytest

from vidseg_diffusion_tpu.utils.ema import (
    lambda_linear,
    lambda_warmup_cosine2,
)


class _OracleCosine2:
    # literal port of LambdaWarmUpCosineScheduler2
    def __init__(self, warm_up_steps, f_min, f_max, f_start, cycle_lengths):
        self.lr_warm_up_steps = warm_up_steps
        self.f_start = f_start
        self.f_min = f_min
        self.f_max = f_max
        self.cycle_lengths = cycle_lengths
        self.cum_cycles = np.cumsum([0] + list(cycle_lengths))

    def find_in_interval(self, n):
        interval = 0
        for cl in self.cum_cycles[1:]:
            if n <= cl:
                return interval
            interval += 1

    def __call__(self, n):
        cycle = self.find_in_interval(n)
        n = n - self.cum_cycles[cycle]
        if n < self.lr_warm_up_steps[cycle]:
            return (
                self.f_max[cycle] - self.f_start[cycle]
            ) / self.lr_warm_up_steps[cycle] * n + self.f_start[cycle]
        t = (n - self.lr_warm_up_steps[cycle]) / (
            self.cycle_lengths[cycle] - self.lr_warm_up_steps[cycle]
        )
        t = min(t, 1.0)
        return self.f_min[cycle] + 0.5 * (
            self.f_max[cycle] - self.f_min[cycle]
        ) * (1 + np.cos(t * np.pi))


class _OracleLinear(_OracleCosine2):
    # literal port of LambdaLinearScheduler
    def __call__(self, n):
        cycle = self.find_in_interval(n)
        n = n - self.cum_cycles[cycle]
        if n < self.lr_warm_up_steps[cycle]:
            return (
                self.f_max[cycle] - self.f_start[cycle]
            ) / self.lr_warm_up_steps[cycle] * n + self.f_start[cycle]
        return self.f_min[cycle] + (self.f_max[cycle] - self.f_min[cycle]) * (
            self.cycle_lengths[cycle] - n
        ) / (self.cycle_lengths[cycle])


ARGS = dict(
    warm_up_steps=[10, 5, 0],
    f_min=[0.1, 0.05, 0.01],
    f_max=[1.0, 0.8, 0.5],
    f_start=[1e-3, 1e-3, 1e-3],
    cycle_lengths=[50, 30, 40],
)


@pytest.mark.parametrize(
    "ours,oracle",
    [(lambda_warmup_cosine2, _OracleCosine2), (lambda_linear, _OracleLinear)],
)
def test_multi_cycle_matches_reference(ours, oracle):
    sched = ours(**ARGS)
    ref = oracle(**ARGS)
    # cover warmups, decays, and both cycle boundaries (incl. the n == cum
    # boundary that belongs to the EARLIER cycle in the reference)
    for n in list(range(0, 120)) + [49, 50, 51, 79, 80, 81]:
        got = float(sched(n))
        want = float(ref(n))
        assert got == pytest.approx(want, rel=1e-5, abs=1e-6), f"step {n}"


def test_stays_traceable():
    import jax

    sched = lambda_warmup_cosine2(**ARGS)
    vals = jax.jit(jax.vmap(sched))(np.arange(100))
    assert np.isfinite(np.asarray(vals)).all()
