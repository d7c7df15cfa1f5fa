"""Multimodal feature stages (stages/multimodal.py): frame features and
brightness histograms vs literal per-sample replays."""

import numpy as np
import pyarrow as pa
import pytest

from tsdownsample_ray.stages.multimodal import (audio_frame_features,
                                                image_brightness_hist)

ray = pytest.importorskip("ray")
import ray.data as rd  # noqa: E402


def test_audio_frame_features_matches_brute(ray_session):
    rng = np.random.default_rng(4)
    lens = [0, 1, 5, 17, 40]
    samples = [rng.integers(-2000, 2000, size=n).astype(np.int64)
               for n in lens]
    t = pa.table({
        "media_id": pa.array(range(len(lens)), pa.int64()),
        "samples": pa.array([(s / 32768.0).tolist() for s in samples],
                            pa.list_(pa.float64()))})
    frame, center = 8, 0
    got = audio_frame_features(rd.from_arrow(t).repartition(2),
                               frame=frame, center=center).to_pandas()
    exp = {}
    for mid, s in enumerate(samples):
        for f in range(-(-len(s) // frame)):
            w = s[f * frame:(f + 1) * frame] - center
            zcr = int(((w[1:] * w[:-1]) < 0).sum())
            exp[(mid, f)] = (len(w), int((w * w).sum()), zcr,
                             int(np.abs(w).max()))
    assert len(got) == len(exp)
    for _, r in got.iterrows():
        assert (r["n"], r["energy"], r["zcr"], r["peak"]) == \
            exp[(r["media_id"], r["frame"])]


def test_image_brightness_hist_matches_brute(ray_session):
    rng = np.random.default_rng(8)
    lens = [0, 3, 24, 100]
    pix = [rng.integers(0, 256, size=n).astype(np.uint8) for n in lens]
    t = pa.table({
        "media_id": pa.array(range(len(lens)), pa.int64()),
        "pixels": pa.array([p.tolist() for p in pix],
                           pa.list_(pa.uint8()))})
    got = image_brightness_hist(rd.from_arrow(t).repartition(2),
                                bins=4).to_pandas()
    assert len(got) == len(lens)
    for _, r in got.iterrows():
        p = pix[int(r["media_id"])]
        assert r["n_bytes"] == len(p)
        for j in range(4):
            assert r[f"b{j}"] == int((p >> 6 == j).sum())


def test_image_hist_bins_validation(ray_session):
    with pytest.raises(ValueError, match="power of two"):
        image_brightness_hist(None, bins=3)
