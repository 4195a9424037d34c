"""Schedule parity vs the reference oracle (reference: diffusions/schedule.py)."""
import numpy as np
import pytest

from dmtpu.diffusions.schedule import get_beta_schedule, get_respaced_seq
from tests.conftest import require_reference


@pytest.mark.parametrize("kind", ["linear", "quad", "const", "cosine"])
def test_beta_schedule_matches_reference(kind):
    require_reference()
    from diffusions.schedule import get_beta_schedule as ref_get

    ours = get_beta_schedule(1000, kind, 0.0001, 0.02)
    ref = ref_get(1000, kind, 0.0001, 0.02).numpy()
    # reference's cosine branch builds a default-dtype (f32) tensor; ours stays f64
    tol = 1e-7 if kind == "cosine" else 1e-12
    np.testing.assert_allclose(ours, ref, rtol=tol, atol=tol)


@pytest.mark.parametrize("kind,steps", [
    ("uniform", 100), ("uniform-leading", 10), ("uniform-linspace", 10),
    ("uniform-trailing", 10), ("quad", 10), ("none", 1000), (None, 1000),
    ("uniform", 37),  # non-divisible respacing
])
def test_respaced_seq_matches_reference(kind, steps):
    require_reference()
    from diffusions.schedule import get_respaced_seq as ref_get

    ours = get_respaced_seq(1000, kind, steps)
    ref = ref_get(1000, kind, steps).numpy()
    np.testing.assert_array_equal(ours, ref)


def test_beta_schedule_shapes_and_ranges():
    for kind in ["linear", "quad", "const", "cosine"]:
        b = get_beta_schedule(1000, kind)
        assert b.shape == (1000,)
        assert b.dtype == np.float64
        assert np.all(b > 0) and np.all(b < 1)


def test_invalid_args_raise():
    with pytest.raises(ValueError):
        get_beta_schedule(10, "bogus")
    with pytest.raises(ValueError):
        get_respaced_seq(10, "bogus", 5)
