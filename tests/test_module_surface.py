"""Module-surface test — the analog of the reference's
tests/test_rust_mods.py:9-70: every expected kernel and class exists and
every query has a callable; every oracle key maps to a query."""

import tsdownsample_ray as tsr
from tsdownsample_ray.kernels import KERNELS

EXPECTED_KERNELS = {
    "everynth", "minmax", "nanminmax", "m4", "nanm4",
    "lttb", "minmaxlttb", "nanminmaxlttb",
}

EXPECTED_CLASSES = [
    "MinMaxDownsampler", "NaNMinMaxDownsampler", "M4Downsampler",
    "NaNM4Downsampler", "LTTBDownsampler", "MinMaxLTTBDownsampler",
    "NaNMinMaxLTTBDownsampler", "EveryNthDownsampler",
]


def test_all_kernels_registered():
    assert EXPECTED_KERNELS <= set(KERNELS)
    for fn in KERNELS.values():
        assert callable(fn)


def test_all_classes_exported():
    for name in EXPECTED_CLASSES:
        cls = getattr(tsr, name)
        assert hasattr(cls(), "downsample")
    assert set(EXPECTED_CLASSES) <= set(tsr.__all__)


def test_driver_contract_consistent():
    import sys

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as em

    qs = em.queries()
    oracles = em.oracle_sql()
    assert len(qs) >= 25
    assert set(oracles) <= set(qs)  # every oracle belongs to a query
    for name, fn in qs.items():
        assert callable(fn), name
    # SQL-checked coverage should dominate
    assert len(oracles) >= 18
