"""Multimodal byte-level kernels vs driver-side numpy oracles."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest

from ocr_redaction_engine_spark.analytics.multimodal import (
    byte_features, sample_frames_bytes, synthesize_binary, window_energy)


@pytest.fixture(scope="module")
def media(spark):
    return synthesize_binary(spark, 40, seed=42, partitions=4)


@pytest.fixture(scope="module")
def payloads(media):
    return {r.media_id: bytes(r.content) for r in media.collect()}


def test_synthesize_deterministic(spark, payloads):
    again = {r.media_id: bytes(r.content)
             for r in synthesize_binary(spark, 40, seed=42, partitions=2).collect()}
    assert again == payloads  # partitioning must not change content


def test_byte_features_match_numpy(media, payloads):
    got = {r.media_id: (r.n_bytes, r.mean_byte, list(r.hist))
           for r in byte_features(media).collect()}
    assert set(got) == set(payloads)
    for mid, buf in payloads.items():
        arr = np.frombuffer(buf, dtype=np.uint8)
        hist = np.bincount(arr >> 4, minlength=16)
        assert got[mid] == (arr.size, float(round(arr.mean(), 6)), [int(x) for x in hist])


def test_frame_sampling_matches_oracle(media, payloads):
    fs, every = 128, 3
    got = {}
    for r in sample_frames_bytes(media, frame_size=fs, every_n=every).collect():
        got.setdefault(r.media_id, []).append((r.frame_idx, r.frame_md5, r.mean_byte))
    for mid, buf in payloads.items():
        n_frames = len(buf) // fs
        exp = []
        for fi in range(0, n_frames, every):
            frame = buf[fi * fs:(fi + 1) * fs]
            arr = np.frombuffer(frame, dtype=np.uint8)
            exp.append((fi, hashlib.md5(frame).hexdigest(), float(round(arr.mean(), 6))))
        assert sorted(got.get(mid, [])) == sorted(exp), f"media {mid}"


def test_window_energy_matches_oracle(media, payloads):
    win = 50
    got = {r.media_id: (r.n_windows, list(r.energy))
           for r in window_energy(media, window=win).collect()}
    for mid, buf in payloads.items():
        arr = np.frombuffer(buf, dtype=np.uint8).astype(np.float64)
        n = (len(arr) + win - 1) // win
        pad = np.zeros(n * win)
        pad[:len(arr)] = arr
        rms = [float(round(x, 6)) for x in np.sqrt((pad.reshape(n, win) ** 2).mean(axis=1))]
        assert got[mid] == (n, rms)


def test_codec_stubs_raise(media):
    from ocr_redaction_engine_spark.analytics.multimodal import decode_image, sample_frames
    with pytest.raises(NotImplementedError):
        decode_image(media)
    with pytest.raises(NotImplementedError):
        sample_frames(media)
