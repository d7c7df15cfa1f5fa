"""Pins for the reference's exact validation surface (round-5 review batch).

Each behavior here was verified against the reference source before being
matched (file:line cited per test); the previous engine behavior diverged.
"""

import numpy as np
import pytest

from tsdownsample_ray import (
    EveryNthDownsampler,
    LTTBDownsampler,
    M4Downsampler,
    MinMaxDownsampler,
    MinMaxLTTBDownsampler,
    NaNMinMaxLTTBDownsampler,
)
from tsdownsample_ray.kernels.lttb import lttb
from tsdownsample_ray.kernels.minmax import minmax_pairs
from tsdownsample_ray.kernels.minmaxlttb import minmaxlttb


def test_list_and_tuple_inputs_coerced_like_reference():
    # downsampling_interface.py:69-72 coerces non-ndarray via np.array
    idx = MinMaxDownsampler().downsample(
        [1.0, 5.0, 2.0, 4.0, 3.0, 6.0, 0.0, 7.0], n_out=4)
    assert len(idx) >= 2
    idx2 = LTTBDownsampler().downsample(
        (0, 1, 2, 3, 4, 5), [1.0, 9.0, 2.0, 8.0, 3.0, 7.0], n_out=3)
    assert idx2[0] == 0 and idx2[-1] == 5


@pytest.mark.parametrize("cls", [MinMaxDownsampler, M4Downsampler,
                                 LTTBDownsampler])
def test_unknown_kwargs_raise_for_rust_forwarding_classes(cls):
    # the reference forwards **kwargs to the Rust fn, which raises
    # TypeError on unknown keywords (downsampling_interface.py:368)
    y = np.arange(100, dtype=np.float64)
    with pytest.raises(TypeError, match="unexpected keyword"):
        cls().downsample(y, n_out=4, bogus=1)


def test_unknown_kwargs_swallowed_where_reference_swallows():
    # MinMaxLTTB / EveryNth declare `**_` (downsamplers.py:111/:149)
    y = np.arange(1000, dtype=np.float64)
    assert len(MinMaxLTTBDownsampler().downsample(y, n_out=10, bogus=1)) == 10
    assert len(EveryNthDownsampler().downsample(y, n_out=10, bogus=1)) == 10


def test_everynth_accepts_any_dtype_and_float_n_out():
    # reference EveryNthDownsampler has no dtype gate and _check_valid_n_out
    # only tests n_out <= 0 (downsamplers.py:142-158)
    out = EveryNthDownsampler().downsample(
        np.array(["a", "b", "c", "d"]), n_out=2)
    np.testing.assert_array_equal(out, [0, 2])
    out = EveryNthDownsampler().downsample(
        np.arange(10, dtype=np.float64), n_out=4.0)
    np.testing.assert_array_equal(out, [0, 2, 5, 7])
    with pytest.raises(ValueError):
        EveryNthDownsampler().downsample(np.arange(10.0), n_out=0)


def test_minmax_ratio_one_rejected_like_rust_layer():
    # downsamplers.py:113 asserts > 0 (passes), minmaxlttb.rs:134 asserts
    # > 1 (panics) — the kernel replays the Rust rejection as ValueError
    y = np.random.default_rng(0).standard_normal(10_000).astype(np.float32)
    with pytest.raises(ValueError, match="greater than 1"):
        MinMaxLTTBDownsampler().downsample(y, n_out=100, minmax_ratio=1)
    with pytest.raises(AssertionError):
        MinMaxLTTBDownsampler().downsample(y, n_out=100, minmax_ratio=0)


def _rust_pipeline_model(y, n_out, ratio):
    """The shipped Rust minmaxlttb dataflow (minmaxlttb.rs:176-207, no-x):
    interior MinMax preselection, preselected indices as x, midpoint-x
    LTTB over the selected points."""
    n = len(y)
    index = minmax_pairs(None, y[1:n - 1], n_out * ratio,
                         nan_policy_return=False) + 1
    index = np.concatenate(([0], index, [n - 1]))
    pos = lttb(index, y[index], n_out, bucket_x="midpoint")
    return index[pos.astype(np.intp)].astype(np.uint64)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_minmaxlttb_midpoint_matches_rust_pipeline_model(seed):
    rng = np.random.default_rng(seed)
    y = rng.standard_normal(50_000).astype(np.float64)
    got = minmaxlttb(None, y, 200, 4, bucket_x="midpoint")
    want = _rust_pipeline_model(y, 200, 4)
    np.testing.assert_array_equal(got, want)
    # the class surface exposes the same option (not silently swallowed)
    got_cls = MinMaxLTTBDownsampler().downsample(
        y, n_out=200, bucket_x="midpoint")
    np.testing.assert_array_equal(got_cls, want)


def test_minmaxlttb_mean_vs_midpoint_differ_when_preselecting():
    # preselected x is irregular whenever phase 1 is active, so the two
    # conventions genuinely diverge even on equidistant input
    diverged = False
    for seed in range(5):
        y = np.random.default_rng(seed).standard_normal(50_000)
        if not np.array_equal(minmaxlttb(None, y, 200, 4, bucket_x="mean"),
                              minmaxlttb(None, y, 200, 4,
                                         bucket_x="midpoint")):
            diverged = True
            break
    assert diverged


def test_nan_variant_threads_bucket_x():
    y = np.random.default_rng(3).standard_normal(20_000).astype(np.float32)
    a = NaNMinMaxLTTBDownsampler().downsample(y, n_out=100,
                                              bucket_x="midpoint")
    assert len(a) == 100
