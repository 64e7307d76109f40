"""Native ffmpeg decode shim (native/video_decoder.cpp) vs cv2 oracle
(SURVEY.md N1/N7: the media layer owns demux+decode natively)."""

import numpy as np
import pytest

from strongsort_yolo_tpu.media.native_decoder import NativeVideoReader, available
from strongsort_yolo_tpu.media.video import SyntheticSource, VideoReader


@pytest.fixture(scope="module")
def mp4(tmp_path_factory):
    import cv2

    path = str(tmp_path_factory.mktemp("vid") / "clip.mp4")
    src = SyntheticSource(num_frames=9, size=(240, 320), num_objects=3, seed=2)
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 15, (320, 240))
    for f in src:
        w.write(f)
    w.release()
    return path


@pytest.mark.skipif(not available(), reason="libav shim not built")
def test_native_decoder_matches_cv2(mp4):
    nr = NativeVideoReader(mp4)
    cr = VideoReader(mp4)
    assert nr.ok and cr.ok
    assert (nr.width, nr.height) == (cr.width, cr.height) == (320, 240)
    assert nr.fps == pytest.approx(cr.fps)
    nf, cf = list(nr), list(cr)
    nr.release(), cr.release()
    assert len(nf) == len(cf) == 9
    for a, b in zip(nf, cf):
        np.testing.assert_array_equal(a, b)  # same libav -> bit-equal


@pytest.mark.skipif(not available(), reason="libav shim not built")
def test_native_decoder_bad_path():
    r = NativeVideoReader("/nonexistent/file.mp4")
    assert not r.ok
    assert list(r) == []


@pytest.mark.skipif(not available(), reason="libav shim not built")
def test_app_uses_native_decoder_for_files(mp4, tmp_path):
    from strongsort_yolo_tpu.app import AppConfig, open_source, run

    reader, w, h = open_source(mp4)
    assert isinstance(reader, NativeVideoReader) and (w, h) == (320, 240)
    reader.release()
    cfg = AppConfig(
        track=True, weights="yolov8n", imgsz=160, max_det=16, half=False,
        output_dir=str(tmp_path), max_frames=4,
    )
    stats = run(cfg, sources=[mp4])
    assert stats[0].frames == 4 and stats[0].failed is None


@pytest.mark.skipif(not available(), reason="libav shim not built")
def test_native_encoder_roundtrip(tmp_path):
    from strongsort_yolo_tpu.media.native_decoder import (
        NativeVideoWriter, encoder_available,
    )

    if not encoder_available():
        pytest.skip("encoder shim not built")
    path = str(tmp_path / "out.mp4")
    w = NativeVideoWriter(path, 320, 240, 15.0)
    assert w.ok
    frames = []
    for t in range(10):
        f = np.full((240, 320, 3), 30, np.uint8)
        f[40:120, 40 + 10 * t : 140 + 10 * t] = (0, 200, 255)
        frames.append(f)
        w.write(f)
    w.release()
    r = NativeVideoReader(path)
    got = list(r)
    r.release()
    assert len(got) == 10  # no dropped final frame (mp4 sample duration)
    err = np.mean(
        [np.abs(a.astype(int) - b.astype(int)).mean() for a, b in zip(frames, got)]
    )
    assert err < 6.0  # lossy mpeg4 but recognizable


@pytest.mark.skipif(not available(), reason="libav shim not built")
def test_app_video_output_via_native_encoder(tmp_path):
    from strongsort_yolo_tpu.app import AppConfig, run

    src = SyntheticSource(num_frames=5, size=(240, 320), num_objects=2)
    cfg = AppConfig(
        track=True, weights="yolov8n", imgsz=160, max_det=16, half=False,
        output_dir=str(tmp_path),
    )
    stats = run(cfg, sources=[src])
    out = stats[0].output_video
    r = NativeVideoReader(out)
    assert r.ok and len(list(r)) == 5
    r.release()
