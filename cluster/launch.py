#!/usr/bin/env python
"""Cluster launcher: reproducible training submissions
(reference: cluster/run_in_slurm.py:13-188 — clone-at-submit, script
templating, resume script).

Two backends:
  * slurm   — writes + submits an sbatch script (TPU or GPU partitions)
  * tpu-pod — writes a gcloud TPU-VM command that clones the repo on every
              worker and runs the training module under
              ``jax.distributed.initialize`` (multi-host DCN)

Both snapshot the repo at submit time (``git clone <repo> <run_dir>/code``)
so later edits don't change a queued run, and write ``resume_script.sh`` for
manual resubmission (the reference's resume flow).
"""

from __future__ import annotations

import argparse
import subprocess
import sys
from datetime import datetime
from pathlib import Path

SLURM_TEMPLATE = """#!/bin/bash
#SBATCH --job-name={job_name}
#SBATCH --output={run_dir}/slurm_%j.out
#SBATCH --time={time}
{extra_directives}

cd {run_dir}/code
export JAX_COMPILATION_CACHE_DIR={run_dir}/jax_cache
python scripts/train.py {overrides} run_dir={run_dir}
"""

TPU_POD_TEMPLATE = """#!/bin/bash
# Launch on every worker of a TPU pod slice; JAX discovers peers itself.
gcloud compute tpus tpu-vm ssh {tpu_name} --zone={zone} --worker=all \\
  --command='
    set -e
    rm -rf ~/run_{stamp} && git clone {repo_url} ~/run_{stamp}
    cd ~/run_{stamp}
    export JAX_COMPILATION_CACHE_DIR=~/jax_cache
    python scripts/train.py {overrides} run_dir={run_dir}
  '
"""


def snapshot_repo(repo_root: Path, run_dir: Path) -> Path:
    code_dir = run_dir / "code"
    if not code_dir.exists():
        subprocess.run(
            ["git", "clone", "--depth", "1", f"file://{repo_root}", str(code_dir)],
            check=True,
            capture_output=True,
        )
    return code_dir


def main(argv=None) -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--backend", choices=["slurm", "tpu-pod"], default="slurm")
    parser.add_argument("--job-name", default="tacorl_tpu")
    parser.add_argument("--run-root", default="~/tacorl_tpu_runs")
    parser.add_argument("--time", default="24:00:00")
    parser.add_argument("--partition", default=None)
    parser.add_argument("--tpu-name", default=None)
    parser.add_argument("--zone", default="us-central2-b")
    parser.add_argument("--repo-url", default=None)
    parser.add_argument("--no-submit", action="store_true")
    parser.add_argument("overrides", nargs="*", help="train.py overrides")
    args = parser.parse_args(argv)

    repo_root = Path(__file__).resolve().parent.parent
    stamp = datetime.now().strftime("%Y%m%d_%H%M%S")
    run_dir = Path(args.run_root).expanduser() / f"{args.job_name}_{stamp}"
    run_dir.mkdir(parents=True, exist_ok=True)
    overrides = " ".join(args.overrides)

    if args.backend == "slurm":
        snapshot_repo(repo_root, run_dir)
        extra = f"#SBATCH --partition={args.partition}" if args.partition else ""
        script = SLURM_TEMPLATE.format(
            job_name=args.job_name, run_dir=run_dir, time=args.time,
            extra_directives=extra, overrides=overrides,
        )
        launch_cmd = ["sbatch", str(run_dir / "job.sh")]
    else:
        assert args.tpu_name and args.repo_url, "--tpu-name/--repo-url required"
        script = TPU_POD_TEMPLATE.format(
            tpu_name=args.tpu_name, zone=args.zone, repo_url=args.repo_url,
            stamp=stamp, overrides=overrides, run_dir=run_dir,
        )
        launch_cmd = ["bash", str(run_dir / "job.sh")]

    (run_dir / "job.sh").write_text(script)
    (run_dir / "job.sh").chmod(0o755)
    # resume = resubmit the same job script (auto-resume picks up last ckpt)
    resume = f"#!/bin/bash\n{' '.join(launch_cmd)}\n"
    (run_dir / "resume_script.sh").write_text(resume)
    (run_dir / "resume_script.sh").chmod(0o755)
    print(f"run dir: {run_dir}")
    if args.no_submit:
        print("submission skipped (--no-submit)")
        return
    subprocess.run(launch_cmd, check=True)


if __name__ == "__main__":
    main()
