"""Checkpoint/resume + CLI smoke tests."""

import os
import subprocess
import sys

import numpy as np
import pytest

from densemonoslam_tpu.config import EngineConfig
from densemonoslam_tpu.engine import Engine
from densemonoslam_tpu.io.synthetic import SyntheticSequence
from densemonoslam_tpu.utils.checkpoint import load_frontend, save_frontend


@pytest.fixture(scope="module")
def seq():
    return SyntheticSequence(num_frames=24, radius=0.35, max_angle=0.3)


def _cfg():
    return EngineConfig(
        max_surfels=1 << 17, depth_cutoff=8.0, depth_factor=1.0,
        nid_keyframing=False, open_loop=True,
    )


def test_checkpoint_resume_bit_exact(seq, tmp_path):
    """A resumed session must continue exactly like the uninterrupted one."""
    def run(eng, lo, hi):
        for i in range(lo, hi):
            rgb, depth = seq.frame(i)
            eng.process_frame("cam0", rgb, depth, float(i))

    # uninterrupted run
    eng_a = Engine(seq.camera, _cfg())
    eng_a.frontend("cam0")
    eng_a.frontends["cam0"].pose = seq.gt_pose(0).astype(np.float32)
    run(eng_a, 0, 16)

    # interrupted at frame 8, checkpointed, resumed in a fresh engine
    eng_b = Engine(seq.camera, _cfg())
    eng_b.frontend("cam0")
    eng_b.frontends["cam0"].pose = seq.gt_pose(0).astype(np.float32)
    run(eng_b, 0, 8)
    ckpt = str(tmp_path / "state.npz")
    eng_b.save_checkpoint("cam0", ckpt)

    eng_c = Engine(seq.camera, _cfg())
    eng_c.frontend("cam0")
    eng_c.load_checkpoint("cam0", ckpt)
    assert eng_c.frontends["cam0"].tick == 8
    run(eng_c, 8, 16)

    pose_a = np.asarray(eng_a.frontends["cam0"].state.pose)
    pose_c = np.asarray(eng_c.frontends["cam0"].state.pose)
    np.testing.assert_allclose(pose_a, pose_c, atol=1e-6)
    assert eng_a.surfel_count("cam0") == eng_c.surfel_count("cam0")
    assert len(eng_c.frontends["cam0"].trajectory) == 16


def test_cli_synthetic_run(tmp_path):
    """The CLI replays the synthetic dataset headlessly and exports the same
    artefact set as the reference's `--q` run."""
    out = tmp_path / "run"
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    proc = subprocess.run(
        [
            sys.executable, "-m", "densemonoslam_tpu.cli",
            "--dataset", "synthetic", "--frames", "8", "--platform", "cpu",
            "--no-nid", "--open-loop", "--max-surfels", str(1 << 17),
            "--out", str(out),
        ],
        capture_output=True, text=True, timeout=400,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "ATE RMSE" in proc.stdout
    for f in ["trajectory.freiburg", "map.ply", "run.stats", "timings.csv"]:
        assert (out / f).exists(), f
    ate_mm = float(proc.stdout.split("ATE RMSE vs analytic GT:")[1].split("mm")[0])
    assert ate_mm < 20.0
