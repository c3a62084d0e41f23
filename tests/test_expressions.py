"""Expression system tests: values, domains, intervals, sampling protocol."""

import math

import numpy as np
import pytest

from canopy_tpu.errors import DomainError, ValidityError
from canopy_tpu.mef.expression import Interval, ensure_probability
from canopy_tpu.mef.expr import (Add, BetaDeviate, ConstantExpression, Div,
                                 Exponential, GammaDeviate, Glm, Histogram,
                                 Ite, Log, LognormalDeviate, Mod, Mul, Neg,
                                 NormalDeviate, PeriodicTest, Pow, Sqrt, Sub,
                                 Switch, UniformDeviate, Weibull, ONE, PI,
                                 ZERO)

C = ConstantExpression


class TestInterval:
    def test_contains(self):
        iv = Interval.open(0.0, 1.0)
        assert iv.contains(0.5)
        assert not iv.contains(0.0)
        assert not iv.contains(1.0)

    def test_within(self):
        assert Interval.closed(0.2, 0.8).within(Interval.closed(0, 1))
        assert not Interval.closed(-0.1, 0.5).within(Interval.closed(0, 1))
        assert not Interval.closed(0.0, 1.0).within(Interval.open(0, 1))


class TestNumerical:
    def test_values(self):
        assert Add([C(1), C(2), C(3)]).value() == 6
        assert Sub([C(10), C(2), C(3)]).value() == 5
        assert Mul([C(2), C(3), C(4)]).value() == 24
        assert Div([C(12), C(3), C(2)]).value() == 2
        assert Neg([C(5)]).value() == -5
        assert Pow([C(2), C(10)]).value() == 1024
        assert Mod([C(7), C(3)]).value() == 1
        assert abs(Log([C(math.e)]).value() - 1) < 1e-12
        assert PI.value() == math.pi

    def test_div_by_zero_domain(self):
        with pytest.raises(DomainError):
            Div([C(1), C(0)]).validate()

    def test_div_interval_containing_zero(self):
        div = Div([C(1.0), UniformDeviate(C(-1.0), C(1.0))])
        with pytest.raises(DomainError):
            div.validate()

    def test_log_needs_positive(self):
        with pytest.raises(DomainError):
            Log([C(0)]).validate()

    def test_sqrt_needs_non_negative(self):
        with pytest.raises(DomainError):
            Sqrt([C(-1)]).validate()

    def test_pow_zero_base_non_positive_exponent(self):
        with pytest.raises(DomainError):
            Pow([C(0), C(-1)]).validate()
        Pow([C(0), C(2)]).validate()

    def test_interval_propagation(self):
        expr = Add([UniformDeviate(C(0.0), C(1.0)),
                    UniformDeviate(C(1.0), C(2.0))])
        iv = expr.interval()
        assert iv.lower == 1.0 and iv.upper == 3.0

    def test_ensure_probability(self):
        ensure_probability(C(0.5))
        with pytest.raises(DomainError):
            ensure_probability(C(1.5))
        with pytest.raises(DomainError):
            ensure_probability(UniformDeviate(C(0.5), C(1.5)))


class TestConditional:
    def test_ite(self):
        assert Ite(C(1), C(10), C(20)).value() == 10
        assert Ite(C(0), C(10), C(20)).value() == 20

    def test_switch(self):
        sw = Switch([(C(0), C(1)), (C(1), C(2))], C(3))
        assert sw.value() == 2
        assert Switch([(C(0), C(1))], C(3)).value() == 3


class TestLifeDistributions:
    def test_exponential(self):
        assert abs(Exponential(C(1e-3), C(100)).value()
                   - (1 - math.exp(-0.1))) < 1e-12

    def test_glm_limits(self):
        # At t=0 -> gamma; as t -> inf -> lambda/(lambda+mu).
        glm0 = Glm(C(0.3), C(1e-2), C(1e-1), C(0.0))
        assert abs(glm0.value() - 0.3) < 1e-12
        glm_inf = Glm(C(0.3), C(1e-2), C(1e-1), C(1e9))
        assert abs(glm_inf.value() - (1e-2 / 1.1e-1)) < 1e-9

    def test_weibull(self):
        w = Weibull(C(100.0), C(2.0), C(10.0), C(60.0))
        assert abs(w.value() - (1 - math.exp(-0.25))) < 1e-12
        assert Weibull(C(100.0), C(2.0), C(10.0), C(5.0)).value() == 0.0

    def test_weibull_validation(self):
        with pytest.raises(DomainError):
            Weibull(C(0.0), C(2.0), C(0.0), C(10.0)).validate()

    def test_periodic_test_instant_repair(self):
        # After a test, the clock resets: q(theta + d) == 1 - exp(-l*d).
        pt = PeriodicTest(C(1e-3), C(100.0), C(50.0), C(130.0))
        assert abs(pt.value() - (1 - math.exp(-1e-3 * 80.0))) < 1e-12
        before = PeriodicTest(C(1e-3), C(100.0), C(50.0), C(30.0))
        assert abs(before.value() - (1 - math.exp(-1e-3 * 30.0))) < 1e-12

    def test_periodic_test_instant_test_brackets(self):
        # With infinite repair rate the 5-arg flavor approaches the 4-arg.
        q5 = PeriodicTest(C(1e-3), C(1e9), C(100.0), C(50.0), C(130.0)).value()
        q4 = PeriodicTest(C(1e-3), C(100.0), C(50.0), C(130.0)).value()
        assert abs(q5 - q4) < 1e-6
        # With zero repair rate it approaches plain exponential.
        q5z = PeriodicTest(C(1e-3), C(0.0), C(100.0), C(50.0), C(130.0)).value()
        assert abs(q5z - (1 - math.exp(-1e-3 * 130.0))) < 1e-9

    def test_periodic_test_arity(self):
        with pytest.raises(ValidityError):
            PeriodicTest(C(1), C(2), C(3))


class TestDeviates:
    def test_uniform(self):
        u = UniformDeviate(C(2.0), C(4.0))
        assert u.value() == 3.0
        assert u.is_deviate()
        with pytest.raises(ValidityError):
            UniformDeviate(C(4.0), C(2.0)).validate()

    def test_normal(self):
        n = NormalDeviate(C(5.0), C(1.0))
        assert n.value() == 5.0
        iv = n.interval()
        assert iv.lower == -1.0 and iv.upper == 11.0
        with pytest.raises(DomainError):
            NormalDeviate(C(5.0), C(0.0)).validate()

    def test_lognormal_ef_flavor(self):
        ln = LognormalDeviate(C(1e-3), C(3.0), C(0.95))
        ln.validate()
        assert abs(ln.value() - 1e-3) < 1e-15
        # sigma = ln(EF)/z_{0.975}
        sigma = math.log(3.0) / 1.959963984540054
        assert abs(ln._scale() - sigma) < 1e-9
        with pytest.raises(ValidityError):
            LognormalDeviate(C(1e-3), C(0.9), C(0.95)).validate()
        with pytest.raises(ValidityError):
            LognormalDeviate(C(1e-3), C(3.0), C(1.5)).validate()

    def test_lognormal_mu_sigma_flavor(self):
        ln = LognormalDeviate(C(-7.0), C(1.4))
        assert abs(ln.value() - math.exp(-7.0 + 1.4 ** 2 / 2)) < 1e-12

    def test_gamma_beta(self):
        assert GammaDeviate(C(2.0), C(3.0)).value() == 6.0
        assert abs(BetaDeviate(C(2.0), C(6.0)).value() - 0.25) < 1e-12

    def test_histogram(self):
        h = Histogram([C(0.0), C(1.0), C(3.0)], [C(1.0), C(1.0)])
        # mean = (0.5*1 + 2.0*1)/2 = 1.25
        assert abs(h.value() - 1.25) < 1e-12
        with pytest.raises(ValidityError):
            Histogram([C(0.0), C(0.0)], [C(1.0)]).validate()
        with pytest.raises(ValidityError):
            Histogram([C(0.0), C(1.0)], [C(-1.0)]).validate()

    def test_memoize_reset_protocol(self):
        """Shared deviates sample once per trial (expression.h:98-117)."""
        rng = np.random.default_rng(42)
        shared = UniformDeviate(C(0.0), C(1.0))
        total = Add([shared, shared])
        s1 = total.sample(rng)
        assert s1 == 2 * shared.sample(rng)
        # Without reset the value is memoized.
        assert total.sample(rng) == s1
        total.reset()
        s2 = total.sample(rng)
        assert s2 != s1

    def test_seeded_reproducibility(self):
        expr = LognormalDeviate(C(1e-3), C(3.0), C(0.95))
        a = [expr.sample(np.random.default_rng(7)) or expr.reset()
             for _ in range(1)]
        expr.reset()
        s1 = expr.sample(np.random.default_rng(7))
        expr.reset()
        s2 = expr.sample(np.random.default_rng(7))
        assert s1 == s2

    def test_distribution_moments(self):
        rng = np.random.default_rng(0)
        g = GammaDeviate(C(4.0), C(0.5))
        samples = []
        for _ in range(20000):
            samples.append(g.sample(rng))
            g.reset()
        assert abs(np.mean(samples) - 2.0) < 0.05
        assert abs(np.var(samples) - 4.0 * 0.25) < 0.1
