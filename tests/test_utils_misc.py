import json

import numpy as np


def test_metrics_sink_jsonl(tmp_path):
    from tacorl_tpu.core.logging import MetricsSink

    sink = MetricsSink(tmp_path, console_every=0)
    sink.log({"loss": np.float32(1.5)}, step=3, prefix="train")
    sink.log({"acc": 0.25}, step=4)
    sink.close()
    lines = [json.loads(l) for l in open(tmp_path / "metrics.jsonl")]
    assert lines[0]["train/loss"] == 1.5 and lines[0]["step"] == 3
    assert lines[1]["acc"] == 0.25


def test_step_timer():
    from tacorl_tpu.utils.profiling import StepTimer

    timer = StepTimer(window=3)
    assert timer.tick() is None  # first tick initializes
    rates = [timer.tick() for _ in range(5)]
    assert any(r is not None and r > 0 for r in rates)


def test_visualize_frames(tmp_path):
    from tacorl_tpu.data.synthetic import generate_synthetic_calvin
    from tacorl_tpu.utils.visualize_frames import dump_episode_video

    generate_synthetic_calvin(tmp_path, 1, 0, episode_len=20, image_hw=24)
    out = dump_episode_video(
        tmp_path / "training", tmp_path / "ep.gif", start=0, end=10
    )
    assert out.is_file() and out.stat().st_size > 0


def test_cluster_launch_script_generation(tmp_path):
    import subprocess
    import sys

    result = subprocess.run(
        [
            sys.executable, "cluster/launch.py", "--backend", "slurm",
            "--no-submit", "--run-root", str(tmp_path),
            "experiment=play_lmp_for_rl", "data_dir=/data/calvin",
        ],
        capture_output=True, text=True, cwd=".",
    )
    assert result.returncode == 0, result.stderr
    run_dirs = list(tmp_path.iterdir())
    assert len(run_dirs) == 1
    job = (run_dirs[0] / "job.sh").read_text()
    assert "experiment=play_lmp_for_rl" in job and "sbatch" not in job
    assert (run_dirs[0] / "resume_script.sh").is_file()
    assert (run_dirs[0] / "code" / "scripts" / "train.py").is_file()
