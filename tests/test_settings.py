"""Settings constraint tests (mirror of the reference setter semantics)."""

import pytest

from canopy_tpu.errors import SettingsError
from canopy_tpu.settings import Algorithm, Approximation, Settings


class TestAlgorithm:
    def test_defaults(self):
        s = Settings()
        assert s.algorithm() == Algorithm.BDD
        assert s.approximation() == Approximation.NONE
        assert s.limit_order() == 20
        assert s.cut_off() == 1e-8
        assert s.num_trials() == 1000
        assert s.mission_time() == 8760.0

    def test_mocus_defaults_to_rare_event(self):
        s = Settings().algorithm("mocus")
        assert s.approximation() == Approximation.RARE_EVENT

    def test_bdd_resets_to_exact(self):
        s = Settings().algorithm("mocus").algorithm("bdd")
        assert s.approximation() == Approximation.NONE

    def test_unknown_name(self):
        with pytest.raises(SettingsError):
            Settings().algorithm("magic")


class TestPrimeImplicants:
    def test_requires_bdd(self):
        with pytest.raises(SettingsError):
            Settings().algorithm("mocus").prime_implicants(True)

    def test_cancels_approximation(self):
        s = Settings().approximation("rare-event").prime_implicants(True)
        assert s.approximation() == Approximation.NONE

    def test_approximation_conflicts(self):
        s = Settings().prime_implicants(True)
        with pytest.raises(SettingsError):
            s.approximation("mcub")


class TestNumericBounds:
    @pytest.mark.parametrize("setter,bad", [
        ("limit_order", -1), ("cut_off", -0.1), ("cut_off", 1.5),
        ("num_trials", 0), ("batch_size", 0), ("sample_size", 0),
        ("num_quantiles", 0), ("num_bins", 0), ("seed", -1),
        ("mission_time", -1.0), ("time_step", -2.0),
    ])
    def test_rejects(self, setter, bad):
        with pytest.raises(SettingsError):
            getattr(Settings(), setter)(bad)


class TestImplications:
    def test_importance_implies_probability(self):
        s = Settings().importance_analysis(True)
        assert s.probability_analysis()
        # Cannot be switched off while importance is on.
        s.probability_analysis(False)
        assert s.probability_analysis()

    def test_uncertainty_implies_probability(self):
        assert Settings().uncertainty_analysis(True).probability_analysis()

    def test_sil_requires_time_step(self):
        with pytest.raises(SettingsError):
            Settings().safety_integrity_levels(True)
        s = Settings().time_step(10.0).safety_integrity_levels(True)
        assert s.probability_analysis()
        with pytest.raises(SettingsError):
            s.time_step(0.0)
