"""Tests for the L6 harness: dataset loaders (on generated fixtures),
profiling monitor, checkpoint/resume."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from android_svo_tpu.config import SVOConfig
from android_svo_tpu.core import state as st
from android_svo_tpu.data.euroc import load_euroc
from android_svo_tpu.data.tum import load_tum
from android_svo_tpu.utils.checkpoint import save_state, load_state
from android_svo_tpu.utils.profiling import PerformanceMonitor, REFERENCE_TIMERS


def _write_png(path, arr):
    from PIL import Image
    Image.fromarray(arr.astype(np.uint8), mode="L").save(path)


@pytest.fixture
def euroc_fixture(tmp_path):
    root = tmp_path / "seq"
    cam = root / "mav0" / "cam0"
    (cam / "data").mkdir(parents=True)
    gt = root / "mav0" / "state_groundtruth_estimate0"
    gt.mkdir(parents=True)
    rng = np.random.RandomState(0)
    rows = []
    for i in range(3):
        ts = 1403636579763555584 + i * 50_000_000
        fn = f"{ts}.png"
        _write_png(cam / "data" / fn, rng.randint(0, 255, (48, 64)))
        rows.append(f"{ts},{fn}")
    (cam / "data.csv").write_text("#ts,filename\n" + "\n".join(rows) + "\n")
    (cam / "sensor.yaml").write_text(
        "sensor_type: camera\n"
        "resolution: [64, 48]\n"
        "intrinsics: [458.654, 457.296, 367.215, 248.375]\n"
        "distortion_coefficients: [-0.2834, 0.0739, 0.0002, 0.00002]\n")
    (gt / "data.csv").write_text(
        "#ts,x,y,z,qw,qx,qy,qz\n"
        f"{1403636579763555584},1.0,2.0,3.0,1.0,0.0,0.0,0.0\n")
    return str(root)


class TestEuroc:
    def test_load(self, euroc_fixture):
        seq = load_euroc(euroc_fixture)
        assert len(seq) == 3
        assert seq.camera is not None
        assert seq.camera.width == 64
        np.testing.assert_allclose(float(seq.camera.fx), 458.654)
        frames = list(seq.frames())
        assert frames[0][1].shape == (48, 64)
        assert abs(frames[1][0] - frames[0][0] - 0.05) < 1e-6
        np.testing.assert_allclose(seq.gt_at(frames[0][0]), [1.0, 2.0, 3.0])


class TestTum:
    def test_load(self, tmp_path):
        root = tmp_path / "tum"
        (root / "rgb").mkdir(parents=True)
        rng = np.random.RandomState(0)
        lines = []
        for i in range(2):
            fn = f"rgb/{i}.png"
            _write_png(root / fn, rng.randint(0, 255, (32, 40)))
            lines.append(f"{i * 0.1:.4f} {fn}")
        (root / "rgb.txt").write_text("\n".join(lines) + "\n")
        (root / "camera.txt").write_text("300 300 20 16\n40 32\n")
        seq = load_tum(str(root))
        assert len(seq) == 2
        assert seq.camera.width == 40
        assert next(iter(seq.frames()))[1].shape == (32, 40)


class TestProfiling:
    def test_timers_and_trace(self, tmp_path):
        trace = tmp_path / "trace.jsonl"
        mon = PerformanceMonitor(str(trace))
        assert set(REFERENCE_TIMERS) <= set(mon.timers)
        with mon.timer("sparse_img_align"):
            pass
        mon.log("n_matches", 42)
        mon.write_frame()
        mon.close()
        rec = json.loads(trace.read_text().splitlines()[0])
        assert "t_sparse_img_align" in rec
        assert rec["n_matches"] == 42
        assert mon.summary()["sparse_img_align"]["count"] == 1


class TestCheckpoint:
    def test_roundtrip(self, tmp_path):
        cfg = SVOConfig(max_n_kfs=2, max_points=64, max_seeds=64)
        vo = st.init_state(cfg, 64, 48)
        vo = vo.replace(frame_id=jnp.asarray(7, jnp.int32))
        vo = vo.replace(points=vo.points.replace(
            pos=vo.points.pos.at[3].set(jnp.array([1.0, 2.0, 3.0]))))
        save_state(str(tmp_path / "ckpt"), vo, extra={"stage": 3})
        vo2, extra = load_state(str(tmp_path / "ckpt"),
                                st.init_state(cfg, 64, 48))
        assert int(vo2.frame_id) == 7
        np.testing.assert_allclose(vo2.points.pos[3], [1.0, 2.0, 3.0])
        assert extra["stage"] == 3
